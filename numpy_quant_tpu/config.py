"""Global knobs for the framework."""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Matmul/conv precision for the float path. HIGHEST gives true-f32 MXU
# passes and is required to hold the reference parity tolerances
# (BASELINE.md: ViT float e2e atol 1e-4). Set to DEFAULT to trade
# parity margin for speed on the float path; the int8 path is unaffected.
float_matmul_precision = jax.lax.Precision.HIGHEST

# Dtype of the float data plane (FTensor). float32 (default) holds the
# reference parity tolerances. bfloat16 halves HBM traffic of the float
# segments between int8 matmuls (LayerNorm/Softmax/GELU/residuals) --
# a serving speed mode whose extra error is below int8 quantization
# noise on the tested models. Quant math (quantize/dequantize kernels)
# always computes in float32 or wider.
float_dtype = jnp.float32


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


class low_precision_floats:
    """Context manager: run the float data plane in bfloat16."""

    def __enter__(self):
        global float_dtype, float_matmul_precision
        self._prev = (float_dtype, float_matmul_precision)
        float_dtype = jnp.bfloat16
        float_matmul_precision = jax.lax.Precision.DEFAULT
        return self

    def __exit__(self, *exc):
        global float_dtype, float_matmul_precision
        float_dtype, float_matmul_precision = self._prev
        return False
