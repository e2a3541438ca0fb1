"""Test harness: force an 8-device virtual CPU mesh before any backend use.

The reference has no test suite (SURVEY.md §4); we test multi-device sharding
logic on virtual CPU devices — the standard XLA fake-backend trick — so the
whole suite runs without TPU hardware.

NB: this image's sitecustomize registers the tunneled-TPU ("axon") PJRT
plugin at interpreter start and pins JAX_PLATFORMS=axon, so plain env-var
overrides in conftest are too late; ``jax.config.update`` is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs skip identical XLA compiles
# (the renderer's first CPU jit takes minutes); per-uid dir (ADVICE r04)
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gens_tpu.utils.cache import compile_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", compile_cache_dir("_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
