from .schedulers import ReduceLROnPlateauWithWarmup, CosineAnnealingLRWithWarmup
from .clip_grad import ClipGradNorm
from .ema import ema_update
from .optimizers import build_optimizer, decay_mask
from .train_state import DiffusionTrainState
from .solver import Solver
