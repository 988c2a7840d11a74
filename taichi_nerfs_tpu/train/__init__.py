from .loop import Trainer  # noqa: F401
from .metrics import psnr, ssim  # noqa: F401
from .state import TrainState, create_train_state, make_optimizer  # noqa: F401
from .step import Batch, density_grid_step, train_step  # noqa: F401
