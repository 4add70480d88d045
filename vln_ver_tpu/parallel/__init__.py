from .mesh import (batch_pspecs, make_mesh, shard_batch,  # noqa: F401
                   replicate)
