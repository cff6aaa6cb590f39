"""Global knobs for the framework."""
from __future__ import annotations

import jax

# Matmul/conv precision for the float path. HIGHEST gives true-f32 MXU
# passes and is required to hold the reference parity tolerances
# (BASELINE.md: ViT float e2e atol 1e-4). Set to DEFAULT to trade
# parity margin for speed on the float path; the int8 path is unaffected.
float_matmul_precision = jax.lax.Precision.HIGHEST


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)
