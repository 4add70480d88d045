from .api import (Config, apply_cfg_options,  # noqa: F401
                  build_train_config, build_ver_config, load_config)
