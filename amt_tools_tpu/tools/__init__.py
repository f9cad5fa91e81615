"""Foundation layer: constants, instrument profiles, conversions, and I/O."""

from .constants import *
from .instrument import *
from .utils import *
from .io import *
from .visualize import *
