"""amt_tools_tpu — a TPU-native automatic music transcription framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
``cwitkowitz/amt-tools``: feature extraction, transcription models, output
estimation, evaluation, training, and offline/online inference — built for
TPU hardware (MXU-friendly feature kernels, scan-based recurrence, pjit data
parallelism) rather than translated from the reference's PyTorch patterns.
"""

__version__ = '0.1.0'

import os as _os

if _os.environ.get('AMT_TOOLS_TPU_PLATFORM'):
    # Robust platform pinning for subprocesses (example scripts in CI,
    # dataset workers): some TPU plugin environments re-export
    # ``JAX_PLATFORMS`` from an interpreter-startup hook, so the standard
    # env var silently loses. ``jax.config`` wins over both.
    import jax as _jax

    _jax.config.update('jax_platforms',
                       _os.environ['AMT_TOOLS_TPU_PLATFORM'])

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
from . import export
from . import compat

__all__ = ['tools', 'ops', 'features', 'models', 'datasets', 'metrics',
           'transcribe', 'evaluate', 'inference', 'train', 'parallel',
           'serving', 'export', 'compat']
