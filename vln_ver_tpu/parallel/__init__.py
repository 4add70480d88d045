from .mesh import (batch_pspecs, data_axis_size,  # noqa: F401
                   make_mesh, make_multislice_mesh, pad_and_shard,
                   params_on_mesh, parse_eval_mesh, replicate,
                   shard_batch)
from .pipeline import (make_pp_mesh, pipeline_apply,  # noqa: F401
                       sequential_apply, stack_layer_params)
from .tensor import (make_tp_mesh, shard_params,  # noqa: F401
                     shard_state, tp_fraction)
