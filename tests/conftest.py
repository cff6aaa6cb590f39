"""Test configuration.

Tests run on an 8-device virtual CPU mesh with x64 enabled:
* CPU      -- so the suite runs anywhere and compiles fast; the
              multi-chip sharding tests use the 8 virtual devices.
* x64      -- enables the framework's exact mode (int64 containers,
              float64 scale intermediates) which is bit-exact vs the
              NumPy reference. TPU-mode (f32/int32) numerics are
              covered by dedicated tolerance tests.

The environment's sitecustomize force-registers the axon TPU platform
via jax.config, so plain JAX_PLATFORMS=cpu is not enough -- we re-update
the config here before any backend initializes.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
