"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

All tests run hermetically on CPU; multi-chip sharding tests use the 8
virtual host devices (`xla_force_host_platform_device_count=8`).
"""

import os

# Must be set before jax is imported anywhere. Unconditional: the machine
# environment pins JAX_PLATFORMS=axon (the real TPU), but tests are hermetic.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

# The env var alone does not keep the axon TPU plugin from claiming the
# backend; the config update does.
jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: XLA compiles are slow on this CPU (~1-4 s per
# unique op); caching makes repeat test runs cheap.
jax.config.update('jax_compilation_cache_dir', os.path.expanduser('~/.cache/jax-cpu'))
# 0.5 s floor: only cache the compiles worth caching. (Also shrinks the
# cache-WRITE surface — one full-suite run observed a segfault inside
# jax's put_executable_and_time zstd write path; cheap entries aren't
# worth that exposure.)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
