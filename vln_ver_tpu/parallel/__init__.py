from .mesh import (batch_pspecs, make_mesh,  # noqa: F401
                   make_multislice_mesh, replicate, shard_batch)
