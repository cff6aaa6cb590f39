"""Elementwise quantize/dequantize Pallas kernels.

The "TinyqQuant"/"TinyqDequant" hot paths
(reference: numpy_quant/model.py:509-535) as standalone TPU kernels.
On the fused fast path these live inside the matmul kernel epilogues
(kernels/qmatmul.py); the standalone versions serve boundary
conversions that are not adjacent to a matmul.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quantize_kernel(x_ref, o_ref, *, scale, zero_point, bit_width):
    min_q, max_q = -2.0 ** (bit_width - 1), 2.0 ** (bit_width - 1) - 1.0
    # divide, matching quantize() bit-for-bit (reciprocal-multiply can
    # differ by 1 ulp before rint)
    q = x_ref[:] / scale
    if zero_point is not None:
        q = q + np.float32(zero_point)
    o_ref[:] = jnp.rint(jnp.clip(q, min_q, max_q)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bit_width", "scale",
                                             "zero_point", "interpret"))
def quantize_pallas(x, *, bit_width: int, scale: float,
                    zero_point: int | None, interpret: bool = False):
    """float32 [..., N] -> int8 (b<=8) / int32 quantized values."""
    out_dtype = jnp.int8 if bit_width <= 8 else jnp.int32
    x2 = x.reshape(-1, x.shape[-1]) if x.ndim != 2 else x
    kernel = functools.partial(_quantize_kernel, scale=np.float32(scale),
                               zero_point=zero_point, bit_width=bit_width)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, out_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2)
    return y.reshape(x.shape)


def _dequantize_kernel(q_ref, o_ref, *, scale, zero_point):
    v = q_ref[:].astype(jnp.float32)
    if zero_point is not None:
        v = v - np.float32(zero_point)
    o_ref[:] = v * np.float32(scale)


@functools.partial(jax.jit, static_argnames=("scale", "zero_point",
                                             "interpret"))
def dequantize_pallas(q, *, scale: float, zero_point: int | None,
                      interpret: bool = False):
    """quantized values -> float32."""
    q2 = q.reshape(-1, q.shape[-1]) if q.ndim != 2 else q
    kernel = functools.partial(_dequantize_kernel, scale=np.float32(scale),
                               zero_point=zero_point)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q2.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q2)
    return y.reshape(q.shape)
