"""Fused int8 attention Pallas kernel.

The quantized attention block executes as graph nodes
MatMul -> Mul(scale) -> Softmax -> MatMul with quantize/dequantize at
every boundary (reference semantics, SURVEY.md §3.4), which materializes
the [B, H, N, N] score and probability tensors in HBM -- the dominant
HBM traffic of quantized ViT inference. This kernel keeps the whole
block resident in VMEM, processing G heads per grid step (bigger
batched dots feed the MXU far better than one head at a time):

    scores  = q_i8 @ k_i8^T            (int32, MXU, G-batched)
    s       = dequant(scores) * scaling
    probs   = softmax(s)               (f32, VPU; padded cols masked)
    probs_q = quantize(probs)          (int8, the calibrated qparams)
    ctx     = probs_q @ v_i8           (int32, MXU)
    out     = dequant(ctx)             (f32, or int8 via out_requant)

Zero-point corrections use the exact q_matmul formulas with in-VMEM
row/col sums (reference: numpy_quantization.py:49-61). Sequence
padding: pad score columns are masked to -inf before softmax; padded v
rows hold the v zero point so the padded contraction is exact under
the correction formula (bit-identical to the unfused path, asserted in
tests/test_kernels.py).

``out_requant=(scale, zero_point)`` fuses the consumer's quantize()
(clip zp+x/s then rint, reference: numpy_quantization.py:31-32) into
the kernel epilogue and returns int8 -- used by the int8_dataflow pass
when every consumer of the attention output quantizes it anyway.
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


# batch rows per grid step of the head-split kernel (tuned on v5e at
# ViT-Base shapes; overridable for experiments)
_ATTN_G = 4


def _largest_divisor(n: int, cap: int) -> int:
    for g in range(min(cap, n), 0, -1):
        if n % g == 0:
            return g
    return 1


def _attention_kernel(q_ref, kt_ref, v_ref, o_ref, *, n_real, d_real,
                      scaling, sq, zq, sk, zk, sv, zv, sp, zp_p, bit_width,
                      out_requant, causal_val=None, causal_axis=None,
                      causal_window=None):
    n_lane = kt_ref.shape[-1]
    q = q_ref[...]    # [G, n_pad, d_pad] int8
    kt = kt_ref[...]  # [G, d_pad, n_lane] int8
    v = v_ref[...]    # [G, n_lane, d_pad] int8 (pad rows = zv)

    scores = jax.lax.dot_general(q, kt, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.int32)
    # zero-point correction tensor (reference: numpy_quantization.py:58-60),
    # subtracted in int32 before the float dequantize -- exactly like the
    # unfused q_matmul path
    corr = None
    if zk != 0:
        corr = jnp.sum(q.astype(jnp.int32), axis=2,
                       keepdims=True) * np.int32(zk)
    if zq != 0:
        t = jnp.sum(kt.astype(jnp.int32), axis=1,
                    keepdims=True) * np.int32(zq)
        corr = t if corr is None else corr + t
    if zq != 0 and zk != 0:
        # the REAL head dim: q cols / kt rows are zero-padded, so only
        # d_real terms carry the zq*zk offset
        corr = corr - np.int32(zq) * np.int32(zk) * np.int32(d_real)
    if corr is not None:
        scores = scores - corr
    s = scores.astype(jnp.float32) * np.float32(sq * sk)
    s = s * np.float32(scaling)
    if causal_val is not None:
        # decoder causal mask: the same f32 add the unfused graph's
        # Add(mask) performs, applied in VMEM (q-row tile offset from
        # the grid under the blockwise q split, as in the HS kernel).
        # ``causal_window`` bands the visible region (Mistral-style
        # sliding-window attention): only the last `window` positions
        # at or before the query row stay unmasked.
        off = 0 if causal_axis is None \
            else pl.program_id(causal_axis) * q.shape[1]
        rowc = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + off
        colc = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        visible = colc <= rowc
        if causal_window is not None:
            visible = jnp.logical_and(
                visible, colc > rowc - np.int32(causal_window))
        s = s + jnp.where(visible, np.float32(0.0),
                          np.float32(causal_val))

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_real, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    min_q = -2.0 ** (bit_width - 1)
    max_q = 2.0 ** (bit_width - 1) - 1.0
    # quantize(): clip(zp + x/s) then rint (numpy_quantization.py:31-32)
    pq = jnp.rint(jnp.clip(probs / np.float32(sp) + np.float32(zp_p),
                           min_q, max_q)).astype(jnp.int8)

    ctx = jax.lax.dot_general(pq, v, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    corr2 = None
    if zv != 0:
        corr2 = jnp.sum(pq.astype(jnp.int32), axis=2,
                        keepdims=True) * np.int32(zv)
    if zp_p != 0:
        t = jnp.sum(v.astype(jnp.int32), axis=1,
                    keepdims=True) * np.int32(zp_p)
        corr2 = t if corr2 is None else corr2 + t
    if zp_p != 0 and zv != 0:
        corr2 = corr2 - np.int32(zp_p) * np.int32(zv) * np.int32(n_lane)
    if corr2 is not None:
        ctx = ctx - corr2
    y = ctx.astype(jnp.float32) * np.float32(sp * sv)
    if out_requant is not None:
        res_scale, res_zp = out_requant
        yq = y / np.float32(res_scale)
        if res_zp is not None:
            yq = yq + np.float32(res_zp)
        o_ref[...] = jnp.rint(jnp.clip(yq, min_q, max_q)).astype(jnp.int8)
    else:
        o_ref[...] = y


def _attention_hs_kernel(q_ref, k_ref, v_ref, *rest, n_real, num_heads,
                         d, scaling, sq, zq, sk, zk, sv, zv, sp, zp_p,
                         bit_width, out_requant, hijack, fast,
                         score_max=None, nq_real=None, causal_val=None,
                         causal_axis=None, causal_window=None,
                         has_bias=False):
    """Head-splitting kernel body: G batch rows per grid step, heads
    unrolled, NT score dots on 64-lane head slices -- no XLA-side head
    reshuffles or d-padding at all.

    ``nq_real`` is the real QUERY row count (and thus the planted
    q-ones-row index under ``hijack``); it defaults to ``n_real`` (the
    real KEY count) but differs on the narrow-q path, where dead-token
    elimination feeds a single gathered query row against full K/V.

    ``has_bias`` prepends a bias operand to ``rest``: a per-head
    additive score tensor [num_heads, q_rows, k_rows] f32 (T5 relative
    position bias, ALiBi slopes, sliding-window/document masks -- any
    constant the graph Adds to the scaled scores before Softmax). It is
    added at exactly the graph Add's position in the float op order, so
    the exact path stays bit-identical to the unfused executor. On the
    fast path the wrapper pre-scales it by log2(e) (exp2 domain).

    ``fast=False`` replicates the unfused float op sequence bit-for-bit.
    ``fast=True`` (used only under the fp-tolerance bfloat16 serving
    mode) computes the same math with fewer VPU passes over the [N, N]
    score tensors that dominate the kernel:
      * the score dots accumulate directly in float32 on the MXU --
        exact (|score| < 2^24), saves the int32->f32 convert pass;
      * exp2 with log2(e) folded into the dequant constant (exp lowers
        to exp2 + multiply anyway; the multiply is pre-folded);
      * the -inf column mask and the per-column zero-point correction
        merge into ONE tiny [1, n_lane] additive row, applied in a
        single broadcast add;
      * the softmax division folds into the probs-quantize multiply;
      * the probs clip bounds are elided when the calibrated
        (scale, zp) provably cannot exceed them (probs are in [0, 1]).
    Same values up to f32 rounding; roughly a third fewer VPU passes.
    """
    bias_ref = rest[0] if has_bias else None
    o_ref = rest[-1]
    if nq_real is None:
        nq_real = n_real
    n_sub = q_ref.shape[-2]   # query rows (round_up(nq+1, 8), NOT 128)
    n_lane = k_ref.shape[-2]  # key rows = score lanes (round_up(n, 128))

    def causal_add(s, mask_val):
        """Decoder causal mask: add ``mask_val`` (the graph's additive
        mask constant, dequantized) above the diagonal -- the same f32
        add the unfused graph's Add(mask) performs, applied in VMEM
        instead of materializing [B,H,N,N] in HBM. Under the blockwise
        grid the q-row tile's absolute offset comes from the grid.
        ``causal_window`` bands the visible region (Mistral-style
        sliding-window attention)."""
        off = 0 if causal_axis is None \
            else pl.program_id(causal_axis) * n_sub
        rowc = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + off
        colc = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        visible = colc <= rowc
        if causal_window is not None:
            visible = jnp.logical_and(
                visible, colc > rowc - np.int32(causal_window))
        return s + jnp.where(visible, np.float32(0.0), mask_val)
    qa = q_ref[...]   # [G, n_sub, H*D] int8 (row nq_real = ones when zq)
    ka = k_ref[...]   # [G, n_lane, H*D] int8 (row n_real = ones when zk)
    va = v_ref[...]   # [G, n_lane, H*D] int8 (pad rows = zv)
    g = qa.shape[0]
    min_q = -2.0 ** (bit_width - 1)
    max_q = 2.0 ** (bit_width - 1) - 1.0

    if fast:
        # clip elision: probs are exactly in [0, 1], so the quantized
        # value lies in [zp, 1/sp + zp]; drop each clip bound the
        # calibrated params provably cannot cross (0.3 margin covers
        # the few-ulp float error of e * r)
        need_lo = zp_p < min_q
        need_hi = 1.0 / sp + zp_p > max_q - 0.3
        col1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_lane), 2)
        c2 = np.float32(np.float32(sq * sk) * np.float32(scaling)
                        * np.float32(np.log2(np.e)))
        # STATIC exp2 shift from the calibrated score max: softmax is
        # shift-invariant, so subtracting a constant (folded into the
        # percol broadcast row that is added anyway) replaces the
        # per-row max REDUCE pass over every [rows, n_lane] score tile.
        # A clamp at +80 keeps e finite (sum <= n * 2^80 << f32 max)
        # even for scores far beyond the calibrated range, so the only
        # distortion on pathological data is saturation, never NaN.
        static_shift = None
        if score_max is not None:
            static_shift = np.float32(score_max * np.float32(np.log2(np.e)))

    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh = qa[:, :, sl], ka[:, :, sl], va[:, :, sl]
        # scores = q @ k^T (batched NT dot over the head lanes; the MXU
        # int8 path accumulates int32 -- Mosaic rejects a float acc,
        # and bf16 operands with f32 accumulation (exact for these
        # values) measured 1% SLOWER end-to-end: the int32->f32 convert
        # is already fused into the dequant multiply, so the bf16 dot's
        # halved MXU rate buys nothing (BENCH_HISTORY.md round 3)
        raw = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.int32)
        if fast:
            # percol = -inf mask + column zero-point correction, one
            # tiny [G, 1, n_lane] row added in a single broadcast pass:
            #   s = (raw - cs*zq) * c + mask  ==  raw*c + (mask - cs*zq*c)
            # (the zk per-ROW term is a row shift -- softmax-invariant,
            # dropped entirely on this fp-tolerance path)
            base = np.float32(0.0) if static_shift is None \
                else -static_shift
            if zq != 0:
                cs = jax.lax.slice_in_dim(raw, nq_real, nq_real + 1, axis=1) \
                    if hijack else \
                    jnp.sum(kh.astype(jnp.int32), axis=2, keepdims=True) \
                    .transpose(0, 2, 1)
                percol = jnp.where(col1 < n_real,
                                   cs.astype(jnp.float32)
                                   * np.float32(-zq * c2) + base, -jnp.inf)
            else:
                percol = jnp.where(col1 < n_real, base, -jnp.inf)
                percol = jnp.broadcast_to(percol, (g, 1, n_lane))
            s = raw.astype(jnp.float32) * c2 + percol
            if bias_ref is not None:
                # per-head additive score bias (pre-scaled by log2(e)
                # in the wrapper -- this path works in the exp2 domain)
                s = s + bias_ref[h][None]
            if causal_val is not None:
                # fp-tolerance path works in the exp2 domain: scale the
                # additive mask by log2(e) to match
                s = causal_add(s, np.float32(causal_val
                                             * np.float32(np.log2(np.e))))
            if static_shift is not None:
                # no per-row max reduce: the static shift already
                # centers calibrated-range scores at <= 0 bits. Clamp
                # keeps every row NaN-free: +80 bounds overflow for
                # scores beyond calibration, -120 stops a whole row of
                # far-below-max scores underflowing its exp-sum to 0.
                # Mask columns clamp to 2^-120, which quantizes to
                # prob 0 for any non-degenerate row.
                e = jnp.exp2(jnp.clip(s, np.float32(-120.0),
                                      np.float32(80.0)))
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp2(s - m)
            r = 1.0 / (jnp.sum(e, axis=-1, keepdims=True) * np.float32(sp))
            pq = e * r + np.float32(zp_p)
            if need_lo or need_hi:
                pq = jnp.clip(pq, min_q if need_lo else None,
                              max_q if need_hi else None)
            pq = jnp.rint(pq).astype(jnp.int8)
        else:
            scores = raw
            # zero-point correction (reference: numpy_quantization.py:
            # 58-60). The row/col sums fall out of the SAME dot: the
            # ones planted in q/k's pad row n_real turn score col/row
            # n_real into the exact integer sums (pad region is
            # discarded/masked afterwards).
            if zk != 0:
                rs = jax.lax.slice_in_dim(raw, n_real, n_real + 1, axis=2) \
                    if hijack else \
                    jnp.sum(qh.astype(jnp.int32), 2, keepdims=True)
                scores = scores - rs * np.int32(zk)
            if zq != 0:
                # k col sums [G, 1, n_lane]: one per key token, summed
                # over the head lanes
                cs = jax.lax.slice_in_dim(raw, nq_real, nq_real + 1, axis=1) \
                    if hijack else \
                    jnp.sum(kh.astype(jnp.int32), axis=2, keepdims=True) \
                    .transpose(0, 2, 1)
                scores = scores - cs * np.int32(zq)
            if zq != 0 and zk != 0:
                scores = scores + np.int32(zq) * np.int32(zk) * np.int32(d)
            s = scores.astype(jnp.float32) * np.float32(sq * sk)
            s = s * np.float32(scaling)
            if bias_ref is not None:
                # the graph's Add(scaled scores, bias const), same f32
                # op position -> bit-identical to the unfused executor
                s = s + bias_ref[h][None]
            if causal_val is not None:
                s = causal_add(s, np.float32(causal_val))
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < n_real, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            # quantize(): clip(zp + x/s), rint (numpy_quantization.py:31-32)
            pq = jnp.rint(jnp.clip(probs / np.float32(sp) + np.float32(zp_p),
                                   min_q, max_q)).astype(jnp.int8)

        pq2 = pq
        if zp_p != 0 and hijack:
            # ones row -> ctx row nq_real = v column sums
            row = jax.lax.broadcasted_iota(jnp.int32, pq.shape, 1)
            pq2 = jnp.where(row == nq_real, np.int8(1), pq)
        vh2 = vh
        if zv != 0:
            # ones column in the lane tail -> ctx lane d = pq row sums
            vh2 = jnp.concatenate(
                [vh, jnp.ones((g, n_lane, 1), jnp.int8)], axis=2)
        ctx_ext = jax.lax.dot_general(pq2, vh2, (((2,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.int32)
        ctx = jax.lax.slice_in_dim(ctx_ext, 0, d, axis=2) if zv != 0 \
            else ctx_ext
        if zv != 0:
            pq_rowsum = jax.lax.slice_in_dim(ctx_ext, d, d + 1, axis=2)
            ctx = ctx - pq_rowsum * np.int32(zv)
        if zp_p != 0:
            vcol = jax.lax.slice_in_dim(ctx_ext, nq_real, nq_real + 1, axis=1) \
                if hijack else \
                jax.lax.dot_general(
                    jnp.ones((g, 1, n_lane), jnp.int8), vh2,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)
            ctx = ctx - jax.lax.slice_in_dim(vcol, 0, d, axis=2) \
                * np.int32(zp_p)
        if zp_p != 0 and zv != 0:
            ctx = ctx + np.int32(zp_p) * np.int32(zv) * np.int32(n_lane)
        if out_requant is not None:
            res_scale, res_zp = out_requant
            if fast:
                yq = ctx.astype(jnp.float32) * np.float32(
                    np.float32(sp * sv) / np.float32(res_scale))
            else:
                y = ctx.astype(jnp.float32) * np.float32(sp * sv)
                yq = y / np.float32(res_scale)
            if res_zp is not None:
                yq = yq + np.float32(res_zp)
            o_ref[:, :, sl] = jnp.rint(jnp.clip(yq, min_q, max_q)) \
                .astype(jnp.int8)
        else:
            o_ref[:, :, sl] = ctx.astype(jnp.float32) * np.float32(sp * sv)


# auto-switch to the q-row-blocked grid once the monolithic kernel's
# [rows, n_lane] f32 score temps would crowd VMEM (n_lane >= this)
_BLOCKWISE_N = 1024


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scaling", "sq", "zq", "sk", "zk", "sv",
                     "zv", "sp", "zp_p", "bit_width", "out_requant",
                     "fast", "score_max", "block_q", "causal_mask_val",
                     "causal_window", "interpret"))
def fused_attention_hs(xq, xk, xv, score_bias=None, *, num_heads: int,
                       scaling: float,
                       sq: float, zq: int, sk: float, zk: int, sv: float,
                       zv: int, sp: float, zp_p: int, bit_width: int = 8,
                       out_requant: tuple | None = None, fast: bool = False,
                       score_max: float | None = None,
                       block_q: int | None = None,
                       causal_mask_val: float | None = None,
                       causal_window: int | None = None,
                       interpret: bool = False):
    """Head-splitting fused attention: xq/xk/xv are [B, N, H*D] int8 --
    the raw Q/K/V projection outputs. Head split, transposes, scores,
    softmax, probs quantize, context and head merge all happen inside
    the kernel; nothing but the [B, N, H*D] tensors ever touches HBM.
    Returns [B, N, H*D] float32 (or int8 with ``out_requant``).

    Long sequences (n >= _BLOCKWISE_N, or ``block_q`` forced) run the
    BLOCKWISE grid: q rows stream in ``block_q``-row tiles while K/V
    stay VMEM-resident per batch row, so the f32 score temps scale as
    block_q*N instead of N*N (SURVEY.md §5 long-context disposition).
    Each output row sees the identical full-row reductions either way,
    so blockwise results are bit-identical to the monolithic kernel
    (asserted in tests/test_kernels.py).

    ``score_bias`` is an optional per-head additive score tensor
    [num_heads, nq, n] f32 (a traced operand, NOT static): the graph's
    Add(scaled scores, constant) before Softmax -- T5 relative position
    bias, ALiBi slopes, sliding-window or document masks. Added at the
    graph Add's exact float op position, so the exact path stays
    bit-identical to the unfused executor.

    NARROW Q: xq may carry FEWER tokens than xk/xv (down to one row --
    the dead-token-eliminated last ViT layer, where only the CLS row's
    attention output is consumed). Each output row depends on its own
    q row and all of K/V, so row i of the narrow call is bit-identical
    to row i of the full call (asserted in tests/test_kernels.py)."""
    b, nq, hd = xq.shape
    n = xk.shape[1]              # real KEY/VALUE token count
    assert xv.shape[1] == n, (xv.shape, xk.shape)
    assert nq <= n, (nq, n)
    # causal masking / score bias index q rows by absolute position --
    # narrow (gathered) q would mask/bias the wrong rows
    assert causal_mask_val is None or nq == n, (nq, n)
    assert score_bias is None or nq == n, (nq, n)
    d = hd // num_heads
    assert d * num_heads == hd, (hd, num_heads)
    n_lane = _round_up(n, 128)   # key rows = score lane dim
    # a whole [H, N, N] bias block would crowd VMEM next to the score
    # temps -- stream q-row tiles (bias rows tile along) past ~2 MB
    bias_big = score_bias is not None \
        and score_bias.shape[0] * _round_up(nq, 8) * n_lane * 4 \
        > 2 * 1024 * 1024
    if block_q is not None or n_lane >= _BLOCKWISE_N or bias_big:
        return _fused_attention_hs_blockq(
            xq, xk, xv, score_bias,
            num_heads=num_heads, scaling=scaling, sq=sq, zq=zq,
            sk=sk, zk=zk, sv=sv, zv=zv, sp=sp, zp_p=zp_p,
            bit_width=bit_width, out_requant=out_requant, fast=fast,
            score_max=score_max, block_q=block_q or 256,
            causal_mask_val=causal_mask_val, causal_window=causal_window,
            interpret=interpret)
    # Both paths keep the ones-row hijack: the planted rows make the
    # correction sums fall out of the SAME MXU dots. Computing the
    # k-col-sums in-kernel instead (fast path, hijack off, q rows 200
    # instead of 208) measured 10% SLOWER end-to-end -- the per-head
    # reduces outweigh the saved select pass and rows
    # (BENCH_HISTORY.md round 3; matches round 2's unpadded dead end).
    hijack = n_lane > n
    # query rows only need sublane alignment (8), not 128 -- ~22% less
    # VPU work on the [rows, n_lane] score tensors for ViT's N=197
    n_sub = _round_up(nq + 1, 8) if hijack else _round_up(nq, 8)
    # The planted rows (hijack ones, v zero point) are written with
    # CONSTANT-VALUE pads, not pad + iota/where: identical bits, but a
    # Pad writes the constant once while a select re-reads and
    # re-writes the whole padded tensor -- the selects were ~0.33 ms of
    # the 17.4 ms ViT-Base forward (BENCH_HISTORY.md round-3 profile)
    if hijack and zq != 0:
        # q pad row n of ones -> score row n = k col sums
        xq = jnp.pad(xq, ((0, 0), (0, 1), (0, 0)), constant_values=1)
    if n_sub != xq.shape[1]:
        xq = jnp.pad(xq, ((0, 0), (0, n_sub - xq.shape[1]), (0, 0)))
    # fast path: k/v ride UNPADDED -- Mosaic masks the short lane dim
    # (score cols / v rows) in-register, so no score-column -inf mask is
    # even needed and the correction constants use the true row count.
    # The HBM pads were 24 standalone pad kernels, ~0.38 ms of the
    # 17.0 ms ViT-Base forward (BENCH_HISTORY.md round-3 profile). The
    # bit-exact path keeps the padded layout: its hijack slices read
    # score col n (k ones row), which must physically exist.
    if not fast and n_lane != n:
        if hijack and zk != 0:
            # k pad row n of ones -> score col n = q row sums (the zk
            # term is a per-row constant, softmax-invariant, so the
            # fast path skips it entirely)
            xk = jnp.pad(xk, ((0, 0), (0, 1), (0, 0)), constant_values=1)
        xk = jnp.pad(xk, ((0, 0), (0, n_lane - xk.shape[1]), (0, 0)))
        # v pad rows hold the zero point so the padded contraction is a
        # no-op under the correction formula
        xv = jnp.pad(xv, ((0, 0), (0, n_lane - n), (0, 0)),
                     constant_values=zv)
    n_kv = xk.shape[1]

    kernel = functools.partial(
        _attention_hs_kernel, n_real=n, nq_real=nq, num_heads=num_heads,
        d=d,
        scaling=np.float32(scaling), sq=np.float32(sq), zq=int(zq),
        sk=np.float32(sk), zk=int(zk), sv=np.float32(sv), zv=int(zv),
        sp=np.float32(sp), zp_p=int(zp_p), bit_width=bit_width,
        out_requant=None if out_requant is None else
        (np.float32(out_requant[0]),
         None if out_requant[1] is None else np.float32(out_requant[1])),
        hijack=hijack, fast=fast,
        score_max=None if score_max is None else np.float32(score_max),
        causal_val=None if causal_mask_val is None
        else np.float32(causal_mask_val), causal_axis=None,
        causal_window=None if causal_window is None else int(causal_window),
        has_bias=score_bias is not None)

    operands = [xq, xk, xv]
    extra_specs = []
    if score_bias is not None:
        sb = jnp.asarray(score_bias, jnp.float32)
        sb = jnp.pad(sb, ((0, 0), (0, n_sub - sb.shape[1]),
                          (0, n_kv - sb.shape[2])))
        if fast:
            # the fast path works in the exp2 domain
            sb = sb * np.float32(np.log2(np.e))
        operands.append(sb)
        extra_specs.append(pl.BlockSpec((num_heads, n_sub, n_kv),
                                        lambda i: (0, 0, 0),
                                        memory_space=pltpu.VMEM))

    # G batch rows per grid step amortizes the per-step fixed cost
    # (mask/iota builds, op dispatch) over G images; per-head VPU score
    # temps are [G, n_sub, n_lane] f32, so cap G to keep them plus the
    # int8 in/out blocks comfortably VMEM-resident.
    if nq == n:
        g = _largest_divisor(b, _ATTN_G)
    else:
        # narrow q: per-step work is tiny (few score rows), so raise G
        # until the K/V blocks and score temps fill the VMEM budget
        per_g = 2 * xk.shape[1] * hd + n_sub * hd * 5 + n_sub * n_lane * 12
        g = _largest_divisor(
            b, max(1, min(32, (10 * 1024 * 1024) // max(per_g, 1))))
    out_dtype = jnp.float32 if out_requant is None else jnp.int8
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_sub, hd), out_dtype),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, n_sub, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_kv, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_kv, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((g, n_sub, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_heads * (n_sub * n_lane * d) * 2,
            bytes_accessed=b * (2 * n_kv * hd + n_sub * hd * (1 + 4)),
            transcendentals=b * num_heads * n_sub * n_lane),
        interpret=interpret,
    )(*operands)
    if n_sub != nq:
        out = out[:, :nq, :]
    return out


def _fused_attention_hs_blockq(xq, xk, xv, score_bias=None, *, num_heads,
                               scaling, sq, zq,
                               sk, zk, sv, zv, sp, zp_p, bit_width,
                               out_requant, fast, score_max, block_q,
                               causal_mask_val=None, causal_window=None,
                               interpret=False):
    """Blockwise (flash-style) grid for long sequences: q rows stream
    in block_q tiles, K/V stay whole in VMEM per batch row. The kernel
    BODY is the same ``_attention_hs_kernel`` with hijack=False -- its
    zero-point corrections are row-local sums or full-K reductions, so
    a q-row tile computes exactly what the monolithic kernel computes
    for those rows (softmax max/sum reduce over the full key axis
    either way -> bit-identical outputs). ``xq`` may carry fewer tokens
    than xk/xv (narrow q), exactly as in the monolithic wrapper."""
    b, nq, hd = xq.shape
    n = xk.shape[1]
    d = hd // num_heads
    n_lane = _round_up(n, 128)
    bq = min(int(block_q), _round_up(nq, 8))
    bq = _round_up(bq, 8)
    n_subq = _round_up(nq, bq)
    if n_subq != nq:
        xq = jnp.pad(xq, ((0, 0), (0, n_subq - nq), (0, 0)))
    # fast path: k/v ride unpadded (Mosaic masks the short lane dim),
    # exactly as in the monolithic wrapper above
    if not fast and n_lane != n:
        xk = jnp.pad(xk, ((0, 0), (0, n_lane - n), (0, 0)))
        # v pad rows hold the zero point (constant-value pad -- no
        # select pass) so the padded contraction is a no-op under the
        # correction formula
        xv = jnp.pad(xv, ((0, 0), (0, n_lane - n), (0, 0)),
                     constant_values=zv)
    n_kv = xk.shape[1]

    kernel = functools.partial(
        _attention_hs_kernel, n_real=n, nq_real=nq, num_heads=num_heads,
        d=d,
        scaling=np.float32(scaling), sq=np.float32(sq), zq=int(zq),
        sk=np.float32(sk), zk=int(zk), sv=np.float32(sv), zv=int(zv),
        sp=np.float32(sp), zp_p=int(zp_p), bit_width=bit_width,
        out_requant=None if out_requant is None else
        (np.float32(out_requant[0]),
         None if out_requant[1] is None else np.float32(out_requant[1])),
        hijack=False, fast=fast,
        score_max=None if score_max is None else np.float32(score_max),
        causal_val=None if causal_mask_val is None
        else np.float32(causal_mask_val),
        # q rows stream in bq tiles: the tile's absolute row offset is
        # grid axis 1 (program_id * tile rows) inside the kernel
        causal_axis=None if causal_mask_val is None else 1,
        causal_window=None if causal_window is None else int(causal_window),
        has_bias=score_bias is not None)

    operands = [xq, xk, xv]
    extra_specs = []
    bias_bytes = 0
    if score_bias is not None:
        # bias q rows tile along grid axis 1 with the q tiles (the
        # BlockSpec slice IS the absolute-row offset)
        sb = jnp.asarray(score_bias, jnp.float32)
        sb = jnp.pad(sb, ((0, 0), (0, n_subq - sb.shape[1]),
                          (0, n_kv - sb.shape[2])))
        if fast:
            sb = sb * np.float32(np.log2(np.e))
        operands.append(sb)
        extra_specs.append(pl.BlockSpec((num_heads, bq, n_kv),
                                        lambda i, j: (0, j, 0),
                                        memory_space=pltpu.VMEM))
        bias_bytes = num_heads * bq * n_kv * 4

    # VMEM per grid step: K+V whole (g*n_lane*hd int8 each), the q/out
    # tiles, ~3 f32 [bq, n_lane] score temps per unrolled head, plus
    # the per-step bias tile when present
    vmem_cap = 10 * 1024 * 1024 - bias_bytes
    per_g = 2 * n_lane * hd + bq * hd * 5 + bq * n_lane * 12
    g = _largest_divisor(b, max(1, min(_ATTN_G, vmem_cap // max(per_g, 1))))
    out_dtype = jnp.float32 if out_requant is None else jnp.int8
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_subq, hd), out_dtype),
        grid=(b // g, n_subq // bq),
        in_specs=[
            pl.BlockSpec((g, bq, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_kv, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_kv, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((g, bq, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_heads * (n_subq * n_lane * d) * 2,
            bytes_accessed=b * n_lane * hd * 2 * (n_subq // bq)
            + b * n_subq * hd * 5,
            transcendentals=b * num_heads * n_subq * n_lane),
        interpret=interpret,
    )(*operands)
    if n_subq != nq:
        out = out[:, :nq, :]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("scaling", "sq", "zq", "sk", "zk", "sv", "zv",
                     "sp", "zp_p", "bit_width", "out_requant",
                     "causal_mask_val", "causal_window", "interpret"))
def fused_attention(q, kt, v, *, scaling: float, sq: float, zq: int,
                    sk: float, zk: int, sv: float, zv: int, sp: float,
                    zp_p: int, bit_width: int = 8,
                    out_requant: tuple | None = None,
                    causal_mask_val: float | None = None,
                    causal_window: int | None = None,
                    interpret: bool = False):
    """q: [BH, N, D] int8; kt: [BH, D, N] int8; v: [BH, N, D] int8.
    Returns float32 [BH, N, D] (dequantized attention context), or int8
    when ``out_requant=(scale, zero_point)`` fuses the consumer quantize.
    zq/zk/zv/zp_p of 0 mean symmetric (no correction term).

    ``causal_mask_val`` adds the decoder graphs' additive triangular
    mask constant above the diagonal in VMEM (executor-exact, as in
    fused_attention_hs) -- used when a causal graph's head-split chains
    do not match the HS pattern (e.g. RoPE between split and scores,
    models/llama.py).

    Long sequences stream q rows blockwise (same rule as
    fused_attention_hs): the kernel body's reductions are row-local or
    full-K, so blockwise output rows are bit-identical."""
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
            v = jnp.where(row < n, v, np.int8(zv))

    blockwise = n_pad >= _BLOCKWISE_N
    bq = min(256, n_pad) if blockwise else n_pad

    # G heads per grid step: big enough batched dots to feed the MXU,
    # small enough that the score tensors stay VMEM-resident
    vmem_cap = 10 * 1024 * 1024
    per_head = bq * n_pad * 12 + 2 * n_pad * d_pad + 2 * bq * d_pad * 4
    g = _largest_divisor(bh, max(1, min(16, vmem_cap // max(per_head, 1))))

    kernel = functools.partial(
        _attention_kernel, n_real=n, d_real=d, scaling=np.float32(scaling),
        sq=np.float32(sq), zq=int(zq), sk=np.float32(sk), zk=int(zk),
        sv=np.float32(sv), zv=int(zv), sp=np.float32(sp), zp_p=int(zp_p),
        bit_width=bit_width,
        out_requant=None if out_requant is None else
        (np.float32(out_requant[0]),
         None if out_requant[1] is None else np.float32(out_requant[1])),
        causal_val=None if causal_mask_val is None
        else np.float32(causal_mask_val),
        causal_axis=None if causal_mask_val is None else 1,
        causal_window=None if causal_window is None else int(causal_window))

    out_dtype = jnp.float32 if out_requant is None else jnp.int8
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), out_dtype),
        grid=(bh // g, n_pad // bq),
        in_specs=[
            pl.BlockSpec((g, bq, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, d_pad, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, bq, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (n_pad * n_pad * d_pad) * 2,
            bytes_accessed=bh * (3 * n_pad * d_pad + n_pad * d_pad * 4),
            transcendentals=bh * n_pad * n_pad),
        interpret=interpret,
    )(q, kt, v)
    if (n_pad, d_pad) != (n, d):
        out = out[:, :n, :d]
    return out
