from .schedules import make_lr_schedule
from .trainer import Trainer, TrainState, make_loss_bundle
from .checkpoint import save_checkpoint, load_checkpoint
