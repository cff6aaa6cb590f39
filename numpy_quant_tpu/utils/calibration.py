"""MSE-optimal clipped calibration.

Min/max calibration spends quantization levels on the rarest outlier;
percentile clipping (calibration_stats(percentile=...)) cuts a fixed
tail. The MSE search instead picks, per activation, the clip range that
minimizes the actual quantization error on the calibration data -- the
"MSE" calibrator of mainstream toolchains (ORT/AIMET/TensorRT).

Returns a standard ``{value name: (min, max)}`` stats dict: feed it to
``Model.quantize(stats=...)``, persist it with save_calibration_stats,
merge it with merge_calibration_stats. Constants (weights) keep exact
min/max -- clipping weights would change the stored model.
Parity-plus: the reference knows only min/max (reference
model.py:329-336).
"""
from __future__ import annotations

import numpy as np

from ..graph import Constant
from ..quantization import qrange, quant_parameters


def _mse_for_range(x, mn, mx, bit_width, asymmetric):
    scale, zp = quant_parameters(np.float32(mn), np.float32(mx),
                                 bit_width=bit_width,
                                 asymmetric=asymmetric)
    lo, hi = qrange(bit_width)
    s = np.float32(scale)
    if s == 0:
        return np.inf
    z = 0.0 if zp is None else float(zp)
    q = np.rint(np.clip(x / s + z, lo, hi))
    return float(np.mean(((q - z) * s - x) ** 2))


def mse_clipped_stats(model, inputs, bit_width: int = 8, grid: int = 24,
                      shrink: float = 0.02, max_elems: int = 20000,
                      sweeps: int = 2) -> dict:
    """Per-value MSE-optimal clip ranges on the calibration ``inputs``:
    each ACTIVATION's min and max shrink by per-side factors (searched
    coordinate-wise over ``grid`` geometric points in [shrink, 1],
    ``sweeps`` alternating rounds -- one-sided outliers need the sides
    decoupled) minimizing its quantization MSE at ``bit_width``.
    Activations are subsampled to ``max_elems`` elements for the search
    (the returned range, not the sample, is what quantize consumes)."""
    from .parity import record_all_values

    acts = record_all_values(model, inputs)
    const_names = {v.name for v in model.values if isinstance(v, Constant)}
    # graph inputs quantize asymmetric, like every activation
    factors = np.geomspace(max(shrink, 1e-4), 1.0, int(grid))

    stats: dict = {}
    for name, arr in acts.items():
        a = np.asarray(arr)
        if a.dtype not in (np.float32, np.float64):
            stats[name] = (np.float32(a.min()), np.float32(a.max()))
            continue
        mn, mx = np.float32(a.min()), np.float32(a.max())
        if name in const_names or mn == mx:
            stats[name] = (mn, mx)
            continue
        x = a.reshape(-1).astype(np.float32)
        if x.size > max_elems:
            x = x[:: x.size // max_elems + 1]
        f_lo, f_hi = 1.0, 1.0
        best = _mse_for_range(x, mn, mx, bit_width, asymmetric=True)
        for _ in range(max(1, int(sweeps))):
            for f in factors:
                mse = _mse_for_range(x, mn * f, mx * f_hi, bit_width,
                                     asymmetric=True)
                if mse < best:
                    best, f_lo = mse, float(f)
            for f in factors:
                mse = _mse_for_range(x, mn * f_lo, mx * f, bit_width,
                                     asymmetric=True)
                if mse < best:
                    best, f_hi = mse, float(f)
        stats[name] = (np.float32(mn * f_lo), np.float32(mx * f_hi))
    return stats


def _kl_divergence(p: np.ndarray, q: np.ndarray) -> float:
    mask = p > 0
    qm = np.where(q > 0, q, 1e-12)
    return float(np.sum(p[mask] * np.log(p[mask] / qm[mask])))


def kl_calibrated_stats(model, inputs, bit_width: int = 8,
                        n_bins: int = 512, max_elems: int = 20000) -> dict:
    """Entropy (KL-divergence) calibration, the TensorRT method: per
    activation, build a |x| histogram and pick the clip threshold whose
    quantized distribution (histogram folded into 2^bit_width levels,
    clipped tail mass added to the edge bin) loses the least
    information vs the original. Symmetric thresholds (the method is
    magnitude-based); the returned range is ``(-T, T)`` intersected
    with the observed min/max, as a standard stats dict for
    ``Model.quantize(stats=...)``. Constants keep exact min/max.
    Completes the calibrator family next to min/max, percentile
    (calibration_stats(percentile=)) and :func:`mse_clipped_stats`.
    Parity-plus: the reference knows only min/max."""
    from ..graph import Constant
    from .parity import record_all_values

    acts = record_all_values(model, inputs)
    const_names = {v.name for v in model.values if isinstance(v, Constant)}
    n_levels = int(2 ** bit_width)

    stats: dict = {}
    for name, arr in acts.items():
        a = np.asarray(arr)
        if a.dtype not in (np.float32, np.float64):
            stats[name] = (np.float32(a.min()), np.float32(a.max()))
            continue
        mn, mx = np.float32(a.min()), np.float32(a.max())
        if name in const_names or mn == mx:
            stats[name] = (mn, mx)
            continue
        x = np.abs(a.reshape(-1).astype(np.float32))
        if x.size > max_elems:
            x = x[:: x.size // max_elems + 1]
        amax = float(x.max())
        hist, edges = np.histogram(x, bins=n_bins, range=(0.0, amax))
        hist = hist.astype(np.float64)

        best_t, best_kl = amax, np.inf
        # candidate thresholds: every bin edge from n_levels bins up
        for i in range(max(n_levels, n_bins // 8), n_bins + 1):
            ref = hist[:i].copy()
            ref[i - 1] += hist[i:].sum()      # clipped tail -> edge
            if ref.sum() == 0:
                continue
            # fold i bins into n_levels quantization levels, then
            # expand back (TensorRT's smoothing of the quantized dist)
            idx = (np.arange(i) * n_levels // i)
            q = np.zeros(n_levels)
            np.add.at(q, idx, ref)
            counts = np.bincount(idx, minlength=n_levels)
            expanded = np.where(counts[idx] > 0, q[idx] / counts[idx], 0)
            p = ref / ref.sum()
            e = expanded / max(expanded.sum(), 1e-12)
            kl = _kl_divergence(p, e)
            if kl < best_kl:
                best_kl, best_t = kl, float(edges[i])
        stats[name] = (np.float32(max(mn, -best_t)),
                       np.float32(min(mx, best_t)))
    return stats
