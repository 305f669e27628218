from . import fusion
from .layers import ConvLayer
