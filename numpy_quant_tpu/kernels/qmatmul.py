"""Fused quantized matmul Pallas kernels.

The QModel linear pattern (reference: numpy_quant/model.py:503-548) is
    quantize(x) -> int matmul -> zero-point correction -> dequantize
with float32 boundaries on both sides. The XLA path materializes the
int32 accumulator and correction tensors; this kernel fuses the whole
chain on-chip:

  * activation tile quantized to int8 in VMEM (VPU)
  * weights stream from HBM as PACKED BIT-PLANES (b/8 bytes/value,
    kernels/pack.py) and unpack to int8 in VMEM
  * int8 x int8 -> int32 on the MXU
  * epilogue: zero-point correction (precomputed weight column sums),
    dequantize, optional bias add -- all in registers/VMEM

Weights are symmetric-quantized per the reference's PTQ strategy
(model.py:357-365), so the only zp-correction term is
colsum(W) * x_zero_point (reference: numpy_quantization.py:55).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack import unpack_bitplanes


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _quantize_tile(x, scale, zero_point, bit_width):
    min_q, max_q = -2.0 ** (bit_width - 1), 2.0 ** (bit_width - 1) - 1.0
    # divide (not reciprocal-multiply): the core quantize() and the
    # reference divide by scale, and a 1-ulp difference before rint can
    # flip a quantized value
    q = x / scale
    if zero_point is not None:
        q = q + zero_point
    return jnp.rint(jnp.clip(q, min_q, max_q)).astype(jnp.int8)


def _packed_matmul_kernel(x_ref, planes_ref, colsum_ref, scale_ref, bias_ref,
                          o_ref, acc_ref, *, bits, block_k, x_scale, x_zp,
                          bit_width, has_bias, quantize_x, out_requant):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if quantize_x:
        xq = _quantize_tile(x_ref[:], x_scale, x_zp, bit_width)
    else:
        xq = x_ref[:].astype(jnp.int8)
    w = unpack_bitplanes(planes_ref[:], bits, block_k)
    acc_ref[:] += jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        acc = acc_ref[:]
        if x_zp is not None:
            acc = acc - colsum_ref[:] * np.int32(x_zp)
        # combined dequant scale sx*sw as a [1, block_n] row: supports
        # per-OUTPUT-CHANNEL weight scales (BASELINE.md config #4) at no
        # extra cost -- the per-tensor case is just a constant row
        y = acc.astype(jnp.float32) * scale_ref[:]
        if has_bias:
            y = y + bias_ref[:]
        if out_requant is not None:
            # fused requantize epilogue (reference float-path semantics:
            # rint then clip, numpy_quantization.py:69-71)
            res_scale, res_zp, res_bits = out_requant
            min_q = -2.0 ** (res_bits - 1)
            max_q = 2.0 ** (res_bits - 1) - 1.0
            q = y * np.float32(1.0 / np.float32(res_scale))
            if res_zp is not None:
                q = q + np.float32(res_zp)
            o_ref[:] = jnp.clip(jnp.rint(q), min_q, max_q).astype(o_ref.dtype)
        else:
            o_ref[:] = y


def _splitk_matmul_kernel(x_ref, packed_ref, colsum_ref, scale_ref, bias_ref,
                          o_ref, *, bits, kr, x_scale, x_zp, bit_width,
                          has_bias, quantize_x, out_requant):
    """Split-K packed matmul: sub-dot j contracts x's contiguous column
    block [j*KR, (j+1)*KR) against bit field j of the packed bytes --
    the [K, N] weight is never materialized and unpacking is 3 VPU ops
    (shift, mask, offset-subtract) per sub-dot."""
    if quantize_x:
        xq = _quantize_tile(x_ref[:], x_scale, x_zp, bit_width)
    else:
        xq = x_ref[:].astype(jnp.int8)
    p = packed_ref[:]
    r = 8 // bits
    mask = (1 << bits) - 1
    offset = 1 << (bits - 1)
    acc = None
    for j in range(r):
        if bits == 8:
            w = p  # native int8, no transform
        else:
            w = (((p.astype(jnp.int32) >> np.int32(j * bits))
                  & np.int32(mask)) - np.int32(offset)).astype(jnp.int8)
        xs = jax.lax.slice_in_dim(xq, j * kr, (j + 1) * kr, axis=1)
        d = jax.lax.dot_general(xs, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    if x_zp is not None:
        acc = acc - colsum_ref[:] * np.int32(x_zp)
    y = acc.astype(jnp.float32) * scale_ref[:]
    if has_bias:
        y = y + bias_ref[:]
    if out_requant is not None:
        res_scale, res_zp, res_bits = out_requant
        min_q = -2.0 ** (res_bits - 1)
        max_q = 2.0 ** (res_bits - 1) - 1.0
        q = y * np.float32(1.0 / np.float32(res_scale))
        if res_zp is not None:
            q = q + np.float32(res_zp)
        o_ref[:] = jnp.clip(jnp.rint(q), min_q, max_q).astype(o_ref.dtype)
    else:
        o_ref[:] = y


def _splitk_pad_byte(bits: int) -> int:
    """Packed byte whose every bit field decodes to weight VALUE 0
    (offset-binary 2^(bits-1))."""
    if bits == 8:
        return 0
    r = 8 // bits
    offset = 1 << (bits - 1)
    return sum(offset << (j * bits) for j in range(r))


@functools.partial(
    jax.jit,
    static_argnames=("bits", "bit_width", "x_scale", "x_zp", "w_scale",
                     "block_m", "block_n", "interpret", "quantize_x",
                     "out_requant"))
def splitk_qmatmul(x, packed, colsum, bias=None, w_scale_vec=None, *,
                   bits: int, bit_width: int, x_scale: float,
                   x_zp: int | None, w_scale: float | None = None,
                   block_m: int = 512, block_n: int = 1024,
                   interpret: bool = False, quantize_x: bool = True,
                   out_requant: tuple | None = None):
    """y = dequant( quant(x) @ unpack_splitk(packed) ) + bias.

    x: [M, K] float32 (or already-quantized integers when
    ``quantize_x=False``). packed: uint8[KR, N] (pack_splitk; int8[K, N]
    raw for bits == 8). colsum: int32[1, N] column sums of the quantized
    weight. Same epilogue surface as packed_qmatmul (scalar or
    per-channel scales, bias, fused requantize). K is kept whole per
    grid step (no k-grid): ViT-class K (<= ~8K) fits VMEM comfortably
    and Mosaic pipelines the HBM fetches across the (M, N) grid.
    """
    m, k = x.shape
    n = packed.shape[1]
    r = 8 // bits
    kr = packed.shape[0]
    assert kr * r >= k, (packed.shape, bits, k)
    if w_scale_vec is None:
        assert w_scale is not None
        w_scale_vec = jnp.full((1, n), np.float32(x_scale)
                               * np.float32(w_scale), jnp.float32)
    else:
        w_scale_vec = (np.float32(x_scale)
                       * jnp.asarray(w_scale_vec, jnp.float32)).reshape(1, n)

    block_m = min(block_m, _round_up(m, 8))
    block_n = min(block_n, _round_up(n, 128))
    krp = _round_up(kr, 128)  # sub-dot contraction dim: MXU-tile aligned
    # scoped-vmem cap: the unpack materializes an int32 [krp, block_n]
    # intermediate per sub-dot (plus the x block and packed block); at
    # large K the default block_n blows the ~16 MB scoped limit
    # (measured: K=8192 -> 24.7 MB). Halve block_n until the dominant
    # intermediates fit a conservative budget.
    r_fields = 8 // bits
    while block_n > 128 and (krp * block_n * 5          # i32 unpack + u8
                             + block_m * r_fields * krp * 4   # x block
                             + block_m * block_n * 8) > 12 * 1024 * 1024:
        block_n //= 2
    mp, np_ = _round_up(m, block_m), _round_up(n, block_n)
    if (kr, n) != (krp, np_):
        packed = jnp.pad(packed, ((0, krp - kr), (0, np_ - n)),
                         constant_values=_splitk_pad_byte(bits))
    kp = r * krp
    if (m, k) != (mp, kp):
        # x columns follow the segment layout: column j*KR+i contracts
        # against bit field j of packed row i; zero-padding is exact
        # (0 * anything) -- but note the LAST segment's real columns
        # must land at j*KRp, so re-split when KR != KRp
        if kr != krp and k > kr:
            segs = [x[:, j * kr:(j + 1) * kr] for j in range(r)]
            segs = [jnp.pad(s, ((0, mp - m), (0, krp - s.shape[1])))
                    for s in segs]
            x = jnp.concatenate(segs, axis=1)
        else:
            x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if colsum.shape[1] != np_:
        colsum = jnp.pad(colsum, ((0, 0), (0, np_ - n)))
    if w_scale_vec.shape[1] != np_:
        w_scale_vec = jnp.pad(w_scale_vec, ((0, 0), (0, np_ - n)))
    has_bias = bias is not None
    if has_bias and bias.shape[1] != np_:
        bias = jnp.pad(bias, ((0, 0), (0, np_ - bias.shape[1])))

    grid = (mp // block_m, np_ // block_n)
    kernel = functools.partial(
        _splitk_matmul_kernel, bits=bits, kr=krp,
        x_scale=np.float32(x_scale),
        x_zp=None if x_zp is None else int(x_zp),
        bit_width=bit_width, has_bias=has_bias,
        quantize_x=quantize_x, out_requant=out_requant)

    in_specs = [
        pl.BlockSpec((block_m, kp), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((krp, block_n), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [x, packed, colsum, w_scale_vec]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(bias)
    else:
        in_specs.append(pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.zeros((1, 128), jnp.float32))

    out_dtype = jnp.float32 if out_requant is None else jnp.int8
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + krp * np_ + mp * np_ * 4,
            transcendentals=0),
        interpret=interpret,
    )(*inputs)
    if (mp, np_) != (m, n):
        y = y[:m, :n]
    return y


def _splitk_wo_kernel(x_ref, packed_ref, scale_ref, o_ref, *, bits, kr,
                      gsz):
    """Weight-only split-K matmul: FLOAT compute, sub-byte weights
    dequantized IN VMEM. Per bit field j: unpack to int8, multiply by
    the per-(group, output-channel) scale rows (broadcast gsz-fold),
    cast to the activation dtype, one MXU dot over the field's K
    block. The f32/bf16 weight copy exists only per-tile in VMEM --
    HBM streams the PACKED payload (bits/8 bytes per value), the fix
    for the grouped-scale decode gap (VERDICT round-4 weak #8: g
    sequential group-batched dots; this runs r=8/bits full-KR dots
    with the scale fused into the operand)."""
    x = x_ref[:]
    p = packed_ref[:]
    s = scale_ref[:]                      # [r * gpf, block_n] f32
    r = 8 // bits
    mask = (1 << bits) - 1
    offset = 1 << (bits - 1)
    gpf = kr // gsz                       # scale rows per bit field
    acc = None
    for j in range(r):
        if bits == 8:
            w = p.astype(jnp.float32)
        else:
            w = (((p.astype(jnp.int32) >> np.int32(j * bits))
                  & np.int32(mask)) - np.int32(offset)).astype(jnp.float32)
        sj = jax.lax.slice_in_dim(s, j * gpf, (j + 1) * gpf, axis=0)
        sexp = jnp.broadcast_to(
            sj[:, None, :], (gpf, gsz, sj.shape[-1])).reshape(kr, -1)
        wf = (w * sexp).astype(x.dtype)
        xs = jax.lax.slice_in_dim(x, j * kr, (j + 1) * kr, axis=1)
        # f32 operands: HIGHEST, or the TPU dot demotes them to bf16
        # passes (~1e-2 relative error vs the dequantize-then-dot
        # oracle). bf16 operands keep the default -- their products
        # are already exact in the f32 accumulator, and HIGHEST on
        # bf16 inputs crashes the remote Mosaic compile helper.
        prec = jax.lax.Precision.HIGHEST \
            if x.dtype == jnp.float32 else None
        d = jax.lax.dot_general(xs, wf, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        acc = d if acc is None else acc + d
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_m", "block_n",
                     "interpret"))
def splitk_wo_matmul(x, packed, scale, *, bits: int,
                     group_size: int | None = None,
                     block_m: int = 512, block_n: int = 512,
                     interpret: bool = False):
    """y = x @ (unpack_splitk(packed) * expand(scale)) -- weight-only
    (float-compute) packed matmul with the dequantize fused into the
    weight tile load.

    x: [M, K] float32/bfloat16. packed: uint8[KR, N] split-K payload
    (int8[K, N] raw for bits == 8). scale: f32 scalar (per-tensor),
    [1, N]/[N] (per-output-channel), or [K/group_size, N] grouped --
    the quantize_weights(group_size=) layout. Returns [M, N] in
    x.dtype with the same numbers as ``x @ dequantize(W)`` up to dot
    tiling (the scales multiply the WEIGHT before the dot, the
    dequantize-then-dot semantics; cf. the group-batched einsum path
    in ops/registry.py, which scales after each group's dot).
    """
    m, k = x.shape
    n = packed.shape[1]
    r = 8 // bits
    kr = packed.shape[0]
    assert kr * r >= k, (packed.shape, bits, k)

    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim < 2 or scale.shape[0] == 1:
        # per-tensor / per-channel: ONE group spanning each bit field
        scale = jnp.broadcast_to(scale.reshape(1, -1)
                                 if scale.ndim else scale.reshape(1, 1),
                                 (1, n))
        g = 1
        gsz_flat = k
    else:
        g = int(scale.shape[0])
        gsz_flat = k // g
        if group_size is not None:
            assert group_size == gsz_flat, (group_size, gsz_flat)
        if gsz_flat >= kr:
            # a group spans whole bit fields: field j's rows all belong
            # to group (j*KR)//gsz -- collapse to one scale row/field
            if gsz_flat % kr != 0:
                raise ValueError(
                    f"group_size {gsz_flat} must divide or be a "
                    f"multiple of the split-K field height {kr}")
            scale = jnp.stack([scale[(j * kr) // gsz_flat]
                               for j in range(r)])
            g = 1            # pre-resolved per field below
            gsz_flat = k
        elif kr % gsz_flat != 0:
            raise ValueError(
                f"group_size {gsz_flat} must divide the split-K field "
                f"height {kr}")

    block_m = min(block_m, _round_up(m, 8))
    block_n = min(block_n, _round_up(n, 128))
    # field height padded to the MXU tile AND a whole number of groups
    align = 128 if g == 1 else int(np.lcm(128, gsz_flat))
    krp = _round_up(kr, align)
    # vmem guard: packed u8 + unpacked/scaled f32 intermediates
    while block_n > 128 and (krp * block_n * 9
                             + block_m * r * krp * 4
                             + block_m * block_n * 8) > 12 * 1024 * 1024:
        block_n //= 2
    mp, np_ = _round_up(m, block_m), _round_up(n, block_n)
    if (kr, n) != (krp, np_):
        packed = jnp.pad(packed, ((0, krp - kr), (0, np_ - n)),
                         constant_values=_splitk_pad_byte(bits))
    kp = r * krp
    if (m, k) != (mp, kp):
        if kr != krp and k > kr:
            segs = [x[:, j * kr:(j + 1) * kr] for j in range(r)]
            segs = [jnp.pad(s_, ((0, mp - m), (0, krp - s_.shape[1])))
                    for s_ in segs]
            x = jnp.concatenate(segs, axis=1)
        else:
            x = jnp.pad(x, ((0, mp - m), (0, kp - k)))

    if g == 1:
        gsz = krp
        gpf = 1
        srows = jnp.broadcast_to(scale, (r, n))   # one row per field
    else:
        gsz = gsz_flat
        gpf = krp // gsz
        # field j's scale rows are s[j*g/r : (j+1)*g/r] (split-K field
        # j holds flat-K rows [j*KR, (j+1)*KR)); pad each field's rows
        # to gpf (padding decodes to weight 0, scale value irrelevant)
        gpf_real = kr // gsz
        fields = [scale[j * gpf_real:(j + 1) * gpf_real] for j in range(r)]
        fields = [jnp.pad(f, ((0, gpf - f.shape[0]), (0, 0)))
                  for f in fields]
        srows = jnp.concatenate(fields, axis=0)
    if srows.shape[1] != np_:
        srows = jnp.pad(srows, ((0, 0), (0, np_ - srows.shape[1])))

    grid = (mp // block_m, np_ // block_n)
    kernel = functools.partial(_splitk_wo_kernel, bits=bits, kr=krp,
                               gsz=gsz)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((krp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r * gpf, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * x.dtype.itemsize + krp * np_
            + mp * np_ * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, packed, srows)
    if (mp, np_) != (m, n):
        y = y[:m, :n]
    return y


@functools.partial(
    jax.jit,
    static_argnames=("bits", "bit_width", "x_scale", "x_zp", "w_scale",
                     "block_m", "block_n", "block_k", "interpret",
                     "quantize_x", "out_requant"))
def packed_qmatmul(x, planes, colsum, bias=None, w_scale_vec=None, *,
                   bits: int, bit_width: int, x_scale: float,
                   x_zp: int | None, w_scale: float | None = None,
                   block_m: int = 256, block_n: int = 256,
                   block_k: int = 512, interpret: bool = False,
                   quantize_x: bool = True,
                   out_requant: tuple | None = None):
    """y = dequant( quant(x) @ unpack(planes) ) + bias.

    x: [M, K] float32 (or already-quantized integers when
    ``quantize_x=False``). planes: uint8[bits, K/8, N] (pack_bitplanes
    of the symmetric-quantized weight). colsum: int32[1, N] column sums
    of the quantized weight. bias: optional float32[1, N].
    Weight scale: either the static scalar ``w_scale`` (per-tensor) or
    ``w_scale_vec`` float32[1, N] (per-output-channel, parity-plus --
    BASELINE.md config #4). Returns float32[M, N].
    """
    m, k = x.shape
    n = planes.shape[2]
    assert planes.shape[1] * 8 >= k, (planes.shape, k)
    if w_scale_vec is None:
        assert w_scale is not None
        w_scale_vec = jnp.full((1, n), np.float32(x_scale)
                               * np.float32(w_scale), jnp.float32)
    else:
        # combined host-side f32 product, same rounding as the unpacked
        # q_matmul scale (scale_a * scale_b in float32)
        w_scale_vec = (np.float32(x_scale)
                       * jnp.asarray(w_scale_vec, jnp.float32)).reshape(1, n)

    block_m = min(block_m, _round_up(m, 8))
    block_n = min(block_n, _round_up(n, 128))
    block_k = min(block_k, _round_up(k, 128))

    # pad to block multiples (XLA pads are fused, weights pre-padded)
    mp, kp, np_ = _round_up(m, block_m), _round_up(k, block_k), _round_up(n, block_n)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if planes.shape[1] * 8 != kp or planes.shape[2] != np_:
        # Padding must decode to weight value 0, which is offset-binary
        # 2^(bits-1): only bit-plane (bits-1) set -> pad that plane with
        # 0xFF, the others with 0. (A zero pad decodes to -2^(bits-1)
        # and corrupts K-padded accumulation.)
        k8_orig, n_orig = planes.shape[1], planes.shape[2]
        planes = jnp.pad(planes, ((0, 0), (0, kp // 8 - k8_orig),
                                  (0, np_ - n_orig)))
        if kp // 8 > k8_orig:
            planes = planes.at[bits - 1, k8_orig:, :].set(np.uint8(0xFF))
        if np_ > n_orig:
            planes = planes.at[bits - 1, :, n_orig:].set(np.uint8(0xFF))
    if colsum.shape[1] != np_:
        colsum = jnp.pad(colsum, ((0, 0), (0, np_ - n)))
    if w_scale_vec.shape[1] != np_:
        w_scale_vec = jnp.pad(w_scale_vec, ((0, 0), (0, np_ - n)))
    has_bias = bias is not None
    if has_bias and bias.shape[1] != np_:
        bias = jnp.pad(bias, ((0, 0), (0, np_ - bias.shape[1])))

    grid = (mp // block_m, np_ // block_n, kp // block_k)

    kernel = functools.partial(
        _packed_matmul_kernel, bits=bits, block_k=block_k,
        x_scale=np.float32(x_scale),
        x_zp=None if x_zp is None else int(x_zp),
        bit_width=bit_width, has_bias=has_bias,
        quantize_x=quantize_x, out_requant=out_requant)

    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bits, block_k // 8, block_n),
                     lambda i, j, kk: (0, kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [x, planes, colsum, w_scale_vec]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(bias)
    else:
        in_specs.append(pl.BlockSpec((1, 128), lambda i, j, kk: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.zeros((1, 128), jnp.float32))

    flops = 2 * mp * np_ * kp
    out_dtype = jnp.float32 if out_requant is None else jnp.int8
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=mp * kp * 4 + bits * kp * np_ // 8 + mp * np_ * 4,
            transcendentals=0),
        interpret=interpret,
    )(*inputs)
    if (mp, np_) != (m, n):
        y = y[:m, :n]
    return y
