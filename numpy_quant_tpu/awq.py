"""AWQ-style activation-aware weight scaling (Lin et al.,
arXiv:2306.00978).

Weight-only quantization (``Model.quantize_weights``) rounds every
weight channel with equal care, but the channels multiplying LARGE
activations matter far more for the layer's output. AWQ protects those
salient channels with the same exact reparameterization SmoothQuant
uses (smoothquant.py: LN emits x / s, consumer weights absorb s) --
but chooses s per group by a GRID SEARCH over

    s_j = amax_x(j)^alpha,   alpha in {0, 1/n, ..., 1}

minimizing the group's actual reconstruction error
``|| (x / s) @ fakequant(W * s) - x @ W ||^2`` on calibration
activations, with the fake-quant replicating quantize_weights'
symmetric per-channel (or grouped) scale choice exactly. alpha = 0 is
in the grid, so a group is never made worse than leaving it alone.

Run on the FLOAT model BEFORE ``quantize_weights`` (the intended
pairing: AWQ is a weight-only method) -- or before ``quantize`` for
full-integer PTQ. The float function is unchanged up to rounding, so
no recalibration of earlier layers is needed.

Parity-plus: the reference has only min/max PTQ (reference
model.py:328-442). Completes the accuracy-pass suite next to
``adaround`` / ``gptq`` / ``smooth_outliers`` / ``correct_biases``.
"""
from __future__ import annotations

import numpy as np

from .quantization import qrange, weight_only_scales
from .smoothquant import apply_channel_scale, ln_matmul_groups


def _fake_quant_kn(W: np.ndarray, bit_width: int, per_channel: bool,
                   group_size: int | None, groupable: bool) -> np.ndarray:
    """Symmetric fake-quant of a [K, N]-oriented weight with EXACTLY
    quantize_weights' scale choice (quantization.weight_only_scales --
    shared code, so the search objective cannot drift from the applied
    quantizer). ``groupable`` carries the caller's consumer-based
    decision; the channel axis in this orientation is always 1."""
    min_q, max_q = qrange(bit_width)
    scale, _ = weight_only_scales(W, bit_width, 1,
                                  per_channel=per_channel,
                                  group_size=group_size,
                                  groupable=groupable)
    q = np.rint(np.clip(W / scale, min_q, max_q))
    return (q * scale).astype(np.float32)


def _groupable(w_const, axis: int, group_size: int | None) -> bool:
    """quantize_weights' grouping eligibility for this weight: grouped
    scales apply only when EVERY consumer is a MatMul reading it as the
    rhs (stored [K, N], which is ``axis == 0`` in ln_matmul_groups'
    convention)."""
    return bool(group_size) and axis == 0 and all(
        nd.op == "MatMul" and len(nd.inputs) > 1
        and nd.inputs[1] is w_const for nd in w_const.outputs)


def awq_scale_weights(model, inputs, bit_width: int = 4,
                      group_size: int = None, per_channel: bool = True,
                      n_grid: int = 20, max_tokens: int = 512,
                      rng: np.random.Generator = None) -> dict:
    """Grid-search the activation-aware scaling exponent per LN group
    and apply the winning reparameterization in place. ``inputs`` is a
    calibration batch; ``bit_width``/``group_size`` must match the
    ``quantize_weights`` call that follows (the search quantizes with
    exactly those parameters). ``max_tokens`` caps the number of
    activation rows used per group (uniform subsample, deterministic
    unless ``rng`` is given). Returns {ln_node_name: best_alpha};
    groups whose best alpha is 0 are left untouched."""
    from .utils.parity import record_all_values

    acts = record_all_values(model, inputs)
    if rng is None:
        rng = np.random.default_rng(0)
    chosen: dict[str, float] = {}
    changed = 0
    for node, gamma, beta, out, ws in ln_matmul_groups(model):
        x = acts.get(out.name)
        g = np.asarray(gamma.data.data, np.float32)
        k = g.shape[-1]
        if x is None or g.ndim != 1 or x.shape[-1] != k:
            continue
        x = np.asarray(x, np.float32).reshape(-1, k)
        if x.shape[0] > max_tokens:
            x = x[rng.choice(x.shape[0], max_tokens, replace=False)]
        amax_x = np.abs(x).max(axis=0).astype(np.float64)
        if not np.any(amax_x > 0):
            continue
        # [K, N] orientation for every consumer; the LN channel axis is
        # always K there, the quant channel axis always N. Grouping
        # eligibility is per weight, mirroring quantize_weights.
        Ws, grp = [], []
        for w, axis in ws:
            W = np.asarray(w.data.data, np.float32)
            Ws.append(W if axis == 0 else W.T)
            grp.append(_groupable(w, axis, group_size))
        refs = [x @ W for W in Ws]

        best_alpha, best_err = 0.0, None
        for i in range(n_grid + 1):
            alpha = i / n_grid
            s = amax_x ** alpha
            s = np.where(amax_x > 0, s, 1.0)
            # balance magnitudes (AWQ reference impl): keeps the scaled
            # weights and activations in comparable float ranges
            s = s / np.sqrt(max(s.max() * s.min(), 1e-12))
            s = np.clip(s, 1e-5, None).astype(np.float32)
            err = 0.0
            xs = x / s
            for W, ref, g_ok in zip(Ws, refs, grp):
                Wq = _fake_quant_kn(W * s[:, None], bit_width,
                                    per_channel, group_size, g_ok)
                err += float(((xs @ Wq - ref) ** 2).sum())
            if best_err is None or err < best_err:
                best_alpha, best_err, best_s = alpha, err, s
        chosen[node.name] = best_alpha
        if best_alpha > 0:
            apply_channel_scale(gamma, beta, ws, best_s)
            changed += 1

    if changed:
        model._dp_cache = None
        model._sharded_param_cache = None
        model._jit_cache.clear()
    return chosen
