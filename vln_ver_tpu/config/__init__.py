from .api import (Config, build_train_config, build_ver_config,  # noqa: F401
                  load_config)
