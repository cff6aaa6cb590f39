"""Sensitivity-based mixed weight precision (AMP-style, as in AIMET's
mixed-precision workflow -- arXiv:2201.08442 §V).

Dropping EVERY weight to a low bit width costs accuracy set by the most
sensitive layer; most layers tolerate it. The planner measures each
weight's output sensitivity to the low width in isolation, then assigns
the low width to the least-sensitive weights until a parameter-count
budget is met. Feed the returned ``{weight name: bits}`` dict straight
to ``Model.quantize(weight_bit_width=...)``; ``pack_weights`` then
stores each weight at exactly its assigned width.
"""
from __future__ import annotations

import numpy as np

from ..graph import Constant


def _matmul_weights(model) -> list:
    """Constants consumed exclusively as MatMul/Gemm weights (the same
    rule Model.quantize applies weight_bit_width with)."""
    out = []
    for v in model.values:
        if not isinstance(v, Constant) or not hasattr(v.data, "data"):
            continue
        arr = np.asarray(v.data.data)
        if arr.dtype != np.float32 or arr.ndim != 2:
            continue
        if v.outputs and all(n.op in ("MatMul", "Gemm")
                             and len(n.inputs) > 1 and n.inputs[1] is v
                             for n in v.outputs):
            out.append(v)
    return out


def weight_sensitivity(model, inputs, bit_width: int = 8,
                       low_bits: int = 4, stats: dict = None,
                       **quantize_kw) -> dict:
    """{weight name: mean |output delta|} when quantizing ONLY that
    weight at ``low_bits`` (everything else at ``bit_width``), measured
    against the all-``bit_width`` QModel on the calibration inputs --
    averaged over EVERY graph output, so multi-output models rank
    weights that feed any output. One quantize+forward per weight: a
    calibration-time search, not a serving path."""
    if stats is None:
        stats = model.calibration_stats(inputs)
    base = model.quantize(bit_width=bit_width, stats=stats, **quantize_kw)
    refs = [np.asarray(r) for r in base(inputs)]
    sens = {}
    for w in _matmul_weights(model):
        q = model.quantize(bit_width=bit_width, stats=stats,
                           weight_bit_width={w.name: low_bits},
                           **quantize_kw)
        outs = q(inputs)
        sens[w.name] = float(np.mean([
            np.abs(np.asarray(o) - r).mean()
            for o, r in zip(outs, refs)]))
    return sens


def plan_mixed_precision(model, inputs, low_frac: float = 0.5,
                         bit_width: int = 8, low_bits: int = 4,
                         stats: dict = None, **quantize_kw) -> dict:
    """A ``{weight name: low_bits}`` assignment covering the least-
    sensitive weights until ``low_frac`` of the total matmul-weight
    PARAMETER COUNT runs at ``low_bits`` (remaining weights keep
    ``bit_width``). Pass the result to
    ``Model.quantize(weight_bit_width=plan)``."""
    sens = weight_sensitivity(model, inputs, bit_width=bit_width,
                              low_bits=low_bits, stats=stats,
                              **quantize_kw)
    sizes = {w.name: int(np.asarray(w.data.data).size)
             for w in _matmul_weights(model)}
    total = sum(sizes.values())
    budget = low_frac * total
    plan: dict = {}
    covered = 0
    for name in sorted(sens, key=sens.get):
        if covered >= budget:
            break
        plan[name] = low_bits
        covered += sizes[name]
    return plan
