from .voxelformer import (convert_state_dict, export_state_dict,
                          load_torch_checkpoint)

__all__ = ["convert_state_dict", "export_state_dict",
           "load_torch_checkpoint"]
