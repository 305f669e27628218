from .natsort import natsorted
from .split import train_test_split
from .meters import AverageMeter
from .logger import make_logger, Logger
from .seed import setup_seed
