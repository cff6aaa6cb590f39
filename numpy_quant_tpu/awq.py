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

from .quantization import qrange
from .smoothquant import apply_channel_scale, ln_matmul_groups


def _fake_quant_kn(W: np.ndarray, bit_width: int,
                   group_size: int | None) -> np.ndarray:
    """Symmetric fake-quant of a [K, N] weight with quantize_weights'
    scale choice: per output channel (abs-max over K), or grouped
    [K/g, N] when ``group_size`` divides K."""
    min_q, max_q = qrange(bit_width)
    if group_size and W.shape[0] % group_size == 0:
        g = int(group_size)
        grp = W.reshape(W.shape[0] // g, g, W.shape[1])
        absmax = np.maximum(np.abs(grp).max(axis=1), np.float32(1e-12))
        scale = (np.float32(2.0) * absmax
                 / np.float32(max_q - min_q)).astype(np.float32)
        scale = np.repeat(scale, g, axis=0)                  # [K, N]
    else:
        absmax = np.maximum(np.abs(W).max(axis=0, keepdims=True),
                            np.float32(1e-12))
        scale = (np.float32(2.0) * absmax
                 / np.float32(max_q - min_q)).astype(np.float32)
    q = np.rint(np.clip(W / scale, min_q, max_q))
    return (q * scale).astype(np.float32)


def awq_scale_weights(model, inputs, bit_width: int = 4,
                      group_size: int = None, n_grid: int = 20,
                      max_tokens: int = 512,
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
        # always K there, the quant channel axis always N
        Ws = []
        for w, axis in ws:
            W = np.asarray(w.data.data, np.float32)
            Ws.append(W if axis == 0 else W.T)
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
            for W, ref in zip(Ws, refs):
                Wq = _fake_quant_kn(W * s[:, None], bit_width, group_size)
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
