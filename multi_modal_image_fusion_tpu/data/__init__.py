from .transform import norm, denorm, transform
from .io import imread_gray, imwrite
from .patches import patchify
from .dataset import FusionDataset, AEDataset, FusionPatches
from .pipeline import Feeder
