"""Fused int8 attention Pallas kernel.

The quantized attention block executes as graph nodes
MatMul -> Mul(scale) -> Softmax -> MatMul with quantize/dequantize at
every boundary (reference semantics, SURVEY.md §3.4), which materializes
the [B, H, N, N] score and probability tensors in HBM -- the dominant
HBM traffic of quantized ViT inference. This kernel keeps the whole
block resident in VMEM per (batch, head):

    scores  = q_i8 @ k_i8^T            (int32, MXU)
    s       = dequant(scores) * scaling
    probs   = softmax(s)               (f32, VPU; padded cols masked)
    probs_q = quantize(probs)          (int8, the calibrated qparams)
    ctx     = probs_q @ v_i8           (int32, MXU)
    out     = dequant(ctx)             (f32)

Zero-point corrections use the exact q_matmul formulas
(reference: numpy_quantization.py:49-61) with row/col sums computed
in-kernel. Sequence padding: pad columns are masked to -inf before
softmax; padded v rows are filled with the v zero point so the
correction formula stays exact over the padded contraction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attention_kernel(q_ref, kt_ref, v_ref, o_ref, *, n_real, scaling,
                      sq, zq, sk, zk, sv, zv, sp, zp_p, bit_width):
    d = q_ref.shape[-1]
    n_pad = q_ref.shape[-2]
    q = q_ref[0]    # [N, D] int8
    kt = kt_ref[0]  # [D, N] int8
    v = v_ref[0]    # [N, D] int8 (pad rows = zv)

    scores = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
    corr = jnp.zeros((), jnp.int32)
    if zk != 0:
        corr = corr + jnp.sum(q.astype(jnp.int32), axis=1,
                              keepdims=True) * np.int32(zk)
    if zq != 0:
        corr = corr + jnp.sum(kt.astype(jnp.int32), axis=0,
                              keepdims=True) * np.int32(zq)
    if zq != 0 and zk != 0:
        corr = corr - np.int32(zq) * np.int32(zk) * np.int32(d)
    s = (scores - corr).astype(jnp.float32) * np.float32(sq * sk)
    s = s * np.float32(scaling)

    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    s = jnp.where(col < n_real, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    min_q = -2.0 ** (bit_width - 1)
    max_q = 2.0 ** (bit_width - 1) - 1.0
    pq = jnp.rint(jnp.clip(probs * np.float32(1.0 / sp) + np.float32(zp_p),
                           min_q, max_q)).astype(jnp.int8)

    ctx = jax.lax.dot_general(pq, v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    corr2 = jnp.zeros((), jnp.int32)
    if zv != 0:
        corr2 = corr2 + jnp.sum(pq.astype(jnp.int32), axis=1,
                                keepdims=True) * np.int32(zv)
    if zp_p != 0:
        corr2 = corr2 + jnp.sum(v.astype(jnp.int32), axis=0,
                                keepdims=True) * np.int32(zp_p)
    if zp_p != 0 and zv != 0:
        corr2 = corr2 - np.int32(zp_p) * np.int32(zv) * np.int32(n_pad)
    o_ref[0] = (ctx - corr2).astype(jnp.float32) * np.float32(sp * sv)


@functools.partial(
    jax.jit,
    static_argnames=("scaling", "sq", "zq", "sk", "zk", "sv", "zv",
                     "sp", "zp_p", "bit_width", "interpret"))
def fused_attention(q, kt, v, *, scaling: float, sq: float, zq: int,
                    sk: float, zk: int, sv: float, zv: int, sp: float,
                    zp_p: int, bit_width: int = 8,
                    interpret: bool = False):
    """q: [BH, N, D] int8; kt: [BH, D, N] int8; v: [BH, N, D] int8.
    Returns float32 [BH, N, D] = dequantized attention context.
    zq/zk/zv/zp_p of 0 mean symmetric (no correction term)."""
    bh, n, d = q.shape
    n_pad = _round_up(n, 128)
    d_pad = _round_up(d, 128)
    if (n_pad, d_pad) != (n, d):
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
        kt = jnp.pad(kt, ((0, 0), (0, d_pad - d), (0, n_pad - n)))
        # v pad rows hold the zero point so the padded contraction is a
        # no-op under the correction formula
        v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
        if zv != 0:
            row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            v = jnp.where(row < n, v, np.int8(zv) if v.dtype == jnp.int8
                          else np.int32(zv))

    kernel = functools.partial(
        _attention_kernel, n_real=n, scaling=np.float32(scaling),
        sq=np.float32(sq), zq=int(zq), sk=np.float32(sk), zk=int(zk),
        sv=np.float32(sv), zv=int(zv), sp=np.float32(sp), zp_p=int(zp_p),
        bit_width=bit_width)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), jnp.float32),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (n_pad * n_pad * d_pad) * 2,
            bytes_accessed=bh * (3 * n_pad * d_pad + n_pad * d_pad * 4),
            transcendentals=bh * n_pad * n_pad),
        interpret=interpret,
    )(q, kt, v)
    if (n_pad, d_pad) != (n, d):
        out = out[:, :n, :d]
    return out
