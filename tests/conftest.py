"""Test configuration.

Tests run on CPU with a faked 8-device mesh (the TPU-native analogue of
"test multi-node without a real cluster") and with x64 enabled so that
numerical parity can be asserted at f64 tolerances.  Environment variables
must be set before jax initializes its backends, hence at module import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in _flags:
    # XLA:CPU's LLVM backend at opt > 0 contracts/reassociates across the
    # double-float error-free transformations, corrupting df32 chains
    # (1.1e-8 -> 5.4e-4 on the beta=8 rebuild — NOTES.md round-4 log);
    # opt 0 restores true df numerics AND cuts suite wall time ~2.5x on
    # this 1-core host (compile-dominated).  TPU is unaffected either way.
    _flags = (_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# The environment pre-registers an 'axon' TPU platform plugin that overrides
# JAX_PLATFORMS; the programmatic config wins, so force CPU here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite is compile-dominated on this
# 1-core host, and cache keys include backend + flags so the CPU/x64/opt-0
# programs never collide with production TPU entries
from dqmc_tpu import compile_cache  # noqa: E402

compile_cache.enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
