"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX answer to "test multi-chip without a cluster"
(SURVEY.md §4): XLA_FLAGS forces 8 host devices so pjit/shard_map paths
execute for real, just slowly. Must run before jax initializes.
"""

import os

# Force, don't setdefault: the harness environment pre-sets
# JAX_PLATFORMS to the TPU plugin; tests must run on the virtual CPU
# mesh regardless.
os.environ['JAX_PLATFORMS'] = 'cpu'
# Keep child processes (if any) from re-registering the axon plugin.
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# The env var alone is NOT enough here: the terminal's sitecustomize.py
# registers the axon TPU plugin at interpreter startup and calls
# jax.config.update('jax_platforms', 'axon,cpu'), which takes precedence
# over JAX_PLATFORMS. Re-update the config before any backend
# initializes so the suite really runs on the virtual CPU mesh (tests
# sharing the single-client TPU tunnel deadlock otherwise).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache for the suite (separate from the
# committed TPU cache in .jax_cache/ — this one is gitignored). The
# 1-core host spends most of the suite wall-clock recompiling the same
# programs across test files; warm runs cut that to disk reads.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_tests')
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
