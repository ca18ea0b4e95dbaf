"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX answer to "test multi-chip without a cluster"
(SURVEY.md §4): XLA_FLAGS forces 8 host devices so pjit/shard_map paths
execute for real, just slowly. Must run before jax initializes.
"""

import os

# Force, don't setdefault: the harness environment pre-sets
# JAX_PLATFORMS to the TPU plugin; tests must run on the virtual CPU
# mesh regardless. This executes before any jax backend initialization,
# so the override wins.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
