from .feed import staged_batches  # noqa: F401
from .objective import compute_losses  # noqa: F401
from .state import TrainConfig, create_train_state, make_lr_schedule  # noqa: F401
from .step import make_train_step  # noqa: F401
