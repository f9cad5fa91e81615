"""amt_tools_tpu — a TPU-native automatic music transcription framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
``cwitkowitz/amt-tools``: feature extraction, transcription models, output
estimation, evaluation, training, and offline/online inference — built for
TPU hardware (MXU-friendly feature kernels, scan-based recurrence, pjit data
parallelism) rather than translated from the reference's PyTorch patterns.
"""

__version__ = '0.1.0'

from . import tools
from . import ops
from . import features
from . import models
from . import datasets
from . import metrics
from . import transcribe
from . import evaluate
from . import inference
from . import train
from . import parallel
from . import serving

__all__ = ['tools', 'ops', 'features', 'models', 'datasets', 'metrics',
           'transcribe', 'evaluate', 'inference', 'train', 'parallel',
           'serving']
