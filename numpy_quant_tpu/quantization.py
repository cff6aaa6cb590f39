"""Quantization math core (JAX).

Semantics mirror the reference implementation
(reference: numpy_quant/numpy_quantization.py:7-72) including its quirks:

* signed integer range [-2^(b-1), 2^(b-1)-1]
* asymmetric scale uses (max-min)/(qmax-qmin); symmetric scale is
  2*max(max_val, min_val)/(qmax-qmin) -- i.e. it keys off the POSITIVE
  max only, because calibration clamps min<=0<=max
  (reference: numpy_quant/numpy_quantization.py:15, tensor.py:232-236)
* rounding is rint = round-half-to-even everywhere
* quantize clips BEFORE rounding; requantize rounds BEFORE clipping
  (reference: numpy_quant/numpy_quantization.py:31-32, 69-71)
* q_matmul zero-point correction is a tensor built from row/col sums
  (reference: numpy_quant/numpy_quantization.py:49-61)

Dtype strategy (TPU-first):

* Integer data plane is int32 (the reference carries int64 containers;
  int32 is the widest TPU-native integer and holds any b<=16 value).
* bit_width <= 8 matmuls run as int8 x int8 -> int32 on the MXU --
  bit-exact, since |q|<=128 makes int32 accumulation exact.
* 8 < bit_width <= 16 matmuls need up to 4*16=64-bit accumulation,
  which has no native TPU dtype. When x64 is enabled (CPU parity mode)
  they run exact in int64; on TPU this compatibility path runs in
  float32 (integer-valued, correctly rounded to ~2^-24 relative) and
  the accumulator QTensor carries float32 data.
* Scale arithmetic follows numpy promotion: with x64 enabled,
  float64 intermediates reproduce numpy bit-for-bit; without it,
  everything runs in float32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def container_int_dtype():
    """Integer dtype carrying quantized values (int64 only in exact mode)."""
    return jnp.int64 if x64_enabled() else jnp.int32


def wide_float_dtype():
    """Float dtype mirroring numpy's int64*float32 -> float64 promotion."""
    return jnp.float64 if x64_enabled() else jnp.float32


def qrange(bit_width: int) -> tuple[float, float]:
    return -2.0 ** (bit_width - 1), 2.0 ** (bit_width - 1) - 1.0


def quant_parameters(min_val, max_val, bit_width: int, asymmetric: bool):
    """Scale/zero-point from calibration stats. Host-side numpy float32
    arithmetic, replicating reference: numpy_quant/numpy_quantization.py:7-21."""
    min_qval, max_qval = qrange(bit_width)
    min_val = np.float32(min_val)
    max_val = np.float32(max_val)

    if asymmetric:
        # errstate: constant-valued tensors (e.g. int shape constants the
        # PTQ pass sweeps over, same as the reference) yield scale == 0;
        # the resulting qparams are never used.
        with np.errstate(divide="ignore", invalid="ignore"):
            scale = (max_val - min_val) / np.float32(max_qval - min_qval)
            zero_point0 = min_qval - min_val / scale
            zero_point = np.rint(np.nan_to_num(zero_point0)).astype(np.int64)
    else:
        scale = (np.float32(2.0) * max(max_val, min_val)) / np.float32(max_qval - min_qval)
        zero_point = None

    scale = np.array(scale, dtype=np.float32)
    return scale, zero_point


def per_channel_scales(data, bit_width: int, axis: int) -> np.ndarray:
    """Symmetric per-channel scales over ``axis`` (the output-channel
    axis of a weight). Parity-plus (the reference is per-tensor only;
    BASELINE.md config #4 names per-channel), so this uses the CORRECT
    abs-max symmetric formula rather than the reference's positive-max
    quirk (SURVEY.md §5.1) -- an all-negative channel would otherwise
    get scale 0."""
    min_qval, max_qval = qrange(bit_width)
    arr = np.asarray(data, dtype=np.float32)
    reduce_axes = tuple(i for i in range(arr.ndim) if i != axis)
    absmax = np.abs(arr).max(axis=reduce_axes, keepdims=True)
    absmax = np.maximum(absmax, np.float32(1e-12))
    scale = (np.float32(2.0) * absmax) / np.float32(max_qval - min_qval)
    return scale.astype(np.float32)


def quantize(data, bit_width: int, scale, zero_point):
    """f32 tensor -> integer container tensor.
    reference: numpy_quant/numpy_quantization.py:24-34."""
    compute = wide_float_dtype()
    q = jnp.asarray(data, jnp.float32) / jnp.asarray(scale, jnp.float32)
    if zero_point is not None:
        # numpy promotes int64 + float32 -> float64; mirrored in exact mode.
        q = jnp.asarray(zero_point, compute) + q.astype(compute)
    min_qval, max_qval = qrange(bit_width)
    q = jnp.clip(q, min_qval, max_qval)
    return jnp.rint(q).astype(container_int_dtype())


def dequantize(arr, scale, zero_point) -> jax.Array:
    """Integer container tensor -> f32.
    reference: numpy_quant/numpy_quantization.py:37-41."""
    compute = wide_float_dtype()
    arr = jnp.asarray(arr)
    if arr.dtype in (jnp.int8, jnp.uint8, jnp.int16):
        # narrow physical storage (int8 HBM layout): widen before the
        # zero-point subtract so it cannot wrap; values are identical
        arr = arr.astype(jnp.int32)
    if zero_point is not None:
        zp = jnp.asarray(zero_point, arr.dtype)
        return ((arr - zp).astype(compute) * jnp.asarray(scale, compute)).astype(jnp.float32)
    return (arr.astype(compute) * jnp.asarray(scale, compute)).astype(jnp.float32)


def accumulator_dtype(bit_width: int):
    """Dtype carrying the 4*bit_width matmul accumulator."""
    if x64_enabled():
        return jnp.int64
    return jnp.int32 if bit_width <= 8 else jnp.float32


def _int_matmul(a, b, bit_width: int):
    """Integer matmul of quantized containers.

    bit_width is the operand bit width (values in [-2^(b-1), 2^(b-1)-1]).
    Fast path casts to int8 and accumulates exactly on the MXU in int32.
    """
    if x64_enabled():
        return jnp.matmul(a.astype(jnp.int64), b.astype(jnp.int64),
                          preferred_element_type=jnp.int64)
    if bit_width <= 8:
        return jnp.matmul(a.astype(jnp.int8), b.astype(jnp.int8),
                          preferred_element_type=jnp.int32)
    # TPU compatibility path for 9..16-bit operands: float32 carrier.
    return jnp.matmul(a.astype(jnp.float32), b.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def q_matmul(arr_a, scale_a, zero_point_a, arr_b, scale_b, zero_point_b,
             bit_width: int = 8, b_colsum=None):
    """Integer matmul with tensor zero-point correction.
    reference: numpy_quant/numpy_quantization.py:44-61.

    Returns (acc, scale, zero_point) where zero_point is None or a tensor
    of per-output corrections such that real = (acc - zero_point) * scale.

    ``b_colsum``: optional precomputed column sums of arr_b (weights are
    constants, so their correction sums are computed once at quantize
    time rather than re-reduced every forward -- identical integers).
    """
    adt = accumulator_dtype(bit_width)
    k = arr_a.shape[-1]
    acc = _int_matmul(arr_a, arr_b, bit_width).astype(adt)
    # scales may be scalars or per-channel vectors (broadcast over the
    # matmul output)
    scale = (np.asarray(scale_a, np.float32) * np.asarray(scale_b, np.float32))
    if scale.ndim == 0:
        scale = np.float32(scale)
    if zero_point_a is None and zero_point_b is None:
        return acc, scale, None
    if zero_point_a is not None and b_colsum is None:
        b_colsum = jnp.sum(jnp.asarray(arr_b, adt), axis=-2, keepdims=True)
    if zero_point_a is None:
        a_rowsum = jnp.sum(jnp.asarray(arr_a, adt), axis=-1, keepdims=True)
        zero_point = a_rowsum * jnp.asarray(zero_point_b, adt)
    elif zero_point_b is None:
        zero_point = jnp.asarray(b_colsum, adt) * jnp.asarray(zero_point_a, adt)
    else:
        a_rowsum = jnp.sum(jnp.asarray(arr_a, adt), axis=-1, keepdims=True)
        zpa = jnp.asarray(zero_point_a, adt)
        zpb = jnp.asarray(zero_point_b, adt)
        zero_point = a_rowsum * zpb + jnp.asarray(b_colsum, adt) * zpa \
            - zpa * zpb * k
    return acc, scale, zero_point


def requantize(arr, arr_scale, arr_zero_points, res_scale, res_zero_point,
               bit_width: int):
    """Requantize to new (scale, zero_point, bit_width) via the float path.
    reference: numpy_quant/numpy_quantization.py:64-72."""
    compute = wide_float_dtype()
    min_qval, max_qval = qrange(bit_width)
    dequant = dequantize(arr, arr_scale, arr_zero_points)
    inv_scale = np.float32(1.0) / np.asarray(res_scale, np.float32)
    scaled = inv_scale * dequant
    if res_zero_point is not None:
        # numpy promotes int64 + float32 -> float64; mirrored in exact mode.
        scaled = jnp.asarray(res_zero_point, compute) + scaled.astype(compute)
    q = jnp.clip(jnp.rint(scaled), min_qval, max_qval)
    return q.astype(container_int_dtype())


def weight_only_scales(arr: "np.ndarray", bit_width: int, ch_axis: int,
                       per_channel: bool = True, group_size: int = None,
                       groupable: bool = False):
    """The symmetric scale choice of Model.quantize_weights for a 2-D
    weight, shared with awq.py so AWQ's grid search optimizes EXACTLY
    the quantizer that will be applied. Returns (full_scale,
    store_scale): ``full_scale`` broadcasts against ``arr``;
    ``store_scale`` is the compact grouped [K/g, N] array when the
    grouped path applies, else None. ``groupable`` must be the callers'
    consumer-based decision (all-MatMul rhs with ch_axis == 1)."""
    min_q, max_q = qrange(bit_width)
    if groupable and group_size and arr.shape[0] % int(group_size) == 0:
        g = int(group_size)
        grp = arr.reshape(arr.shape[0] // g, g, arr.shape[1])
        absmax = np.maximum(np.abs(grp).max(axis=1), np.float32(1e-12))
        store_scale = (np.float32(2.0) * absmax
                       / np.float32(max_q - min_q)).astype(np.float32)
        return np.repeat(store_scale, g, axis=0), store_scale
    if per_channel:
        return per_channel_scales(arr, bit_width, ch_axis), None
    absmax = max(float(np.abs(arr).max()), 1e-12)
    return np.float32(2.0 * absmax / (max_q - min_q)), None
