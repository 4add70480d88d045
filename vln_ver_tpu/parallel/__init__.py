from .mesh import (batch_pspecs, make_mesh,  # noqa: F401
                   make_multislice_mesh, replicate, shard_batch)
from .pipeline import (make_pp_mesh, pipeline_apply,  # noqa: F401
                       sequential_apply, stack_layer_params)
from .tensor import (make_tp_mesh, shard_params,  # noqa: F401
                     shard_state, tp_fraction)
