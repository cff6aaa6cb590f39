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

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers (the reference's fast/long_running split, one level finer:
# reference README.md:61-72). Running everything is the default;
#
#   pytest tests -m core        # parity core, ~2.5 min on this host
#   pytest tests -m "not slow"  # same thing
#
# CORE = the reference-parity surface (quant math, executors, ops,
# graph/ONNX io, MLP e2e incl. the bit-width sweep, conv) -- measured
# per-file wall times sum to ~2.5 min combined (BENCH_HISTORY round 4
# sweep). Everything else is SLOW: each model-zoo family test compiles
# real transformer programs, the serving/decode tests compile whole
# generation loops, and the PTQ-accuracy passes run optimizer loops --
# 56 files measured at ~71 min serial on this host.
# tests/long_running/ additionally gates on NQ_RUN_SLOW=1 (unchanged).
# ---------------------------------------------------------------------------
_CORE_FILES = {
    "test_activation_ops.py", "test_analyzer.py", "test_batchnorm.py",
    "test_cnn.py", "test_conformance_vectors.py", "test_control_flow.py",
    "test_conv2d.py", "test_convtranspose.py", "test_extra_ops.py",
    "test_gnn.py", "test_indices_ops.py", "test_inference.py",
    "test_mlp.py", "test_more_ops.py", "test_more_ops2.py",
    "test_onnx_io.py", "test_optional_inputs.py",
    "test_qdq_conformance.py", "test_quant_properties.py",
    "test_quantization.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _CORE_FILES:
            item.add_marker(pytest.mark.core)
        else:
            item.add_marker(pytest.mark.slow)
