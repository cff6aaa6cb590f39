"""Per-weight mixed precision: dict-valued weight_bit_width +
sensitivity-planned assignment (utils.sensitivity, AMP-style).
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq

RNG = np.random.default_rng(47)


def test_weight_bit_width_dict_per_weight():
    """A dict assigns widths per weight; unlisted weights keep the
    activation bit width; pack_weights stores each at its own width."""
    from numpy_quant_tpu.models import fixtures as F
    from numpy_quant_tpu.graph import Constant

    m = F.trained_vit_onnx(batch_size=8)
    model = nq.Model.from_onnx(m)
    calib, _ = F.make_batch(np.random.default_rng(11), 8)
    names = [v.name for v in model.values
             if isinstance(v, Constant) and hasattr(v.data, "data")
             and np.asarray(v.data.data).ndim == 2
             and v.outputs and all(n.op in ("MatMul", "Gemm")
                                   for n in v.outputs)][:3]
    assert len(names) == 3
    plan = {names[0]: 4, names[1]: 2}
    q = model.quantize([calib], bit_width=8, weight_bit_width=plan)
    widths = {v.name: v.data.bit_width for v in q.values
              if v.name in names}
    assert widths[names[0]] == 4 and widths[names[1]] == 2 \
        and widths[names[2]] == 8
    out = q([calib])[0]
    assert np.all(np.isfinite(out))
    expected = q([calib])[0]
    assert q.pack_weights() > 0
    np.testing.assert_array_equal(q([calib])[0], expected)


def test_mixed_widths_save_load_roundtrip(tmp_path):
    """A per-weight mixed QModel survives the native save/load
    round trip bit-exactly, each payload at its own width."""
    from numpy_quant_tpu.models import fixtures as F
    from numpy_quant_tpu.graph import Constant
    from numpy_quant_tpu.utils import load_qmodel, save_qmodel

    m = F.trained_vit_onnx(batch_size=8)
    model = nq.Model.from_onnx(m)
    calib, _ = F.make_batch(np.random.default_rng(16), 8)
    names = [v.name for v in model.values
             if isinstance(v, Constant) and hasattr(v.data, "data")
             and np.asarray(v.data.data).ndim == 2
             and v.outputs and all(n.op in ("MatMul", "Gemm")
                                   for n in v.outputs)][:2]
    plan = {names[0]: 4, names[1]: 3}
    q = model.quantize([calib], bit_width=8, weight_bit_width=plan)
    expected = q([calib])[0]
    path = tmp_path / "mixed.onnx"
    save_qmodel(q, path, m)
    loaded = load_qmodel(path)
    widths = {v.name: v.data.bit_width for v in loaded.values
              if v.name in plan}
    assert widths == plan
    np.testing.assert_array_equal(loaded([calib])[0], expected)


def test_plan_mixed_precision_beats_uniform_low():
    """The sensitivity plan puts the low width on the least-sensitive
    half of the parameters: accuracy is at least uniform-low's, the
    planned widths really are mixed, and the plan covers ~the requested
    parameter fraction."""
    from numpy_quant_tpu.models import fixtures as F
    from numpy_quant_tpu.utils import plan_mixed_precision

    m = F.trained_vit_onnx(batch_size=32)
    model = nq.Model.from_onnx(m)
    x, labels = F.make_batch(np.random.default_rng(12), 32)
    calib, _ = F.make_batch(np.random.default_rng(13), 8)
    stats = model.calibration_stats([calib])

    low = 2  # aggressive enough that uniform-low visibly hurts
    q_uniform = model.quantize(bit_width=8, stats=stats,
                               weight_bit_width=low)
    acc_uniform = (q_uniform([x])[0].argmax(-1) == labels).mean()

    plan = plan_mixed_precision(model, [calib], low_frac=0.5,
                                bit_width=8, low_bits=low, stats=stats)
    assert plan and all(b == low for b in plan.values())
    q_mixed = model.quantize(bit_width=8, stats=stats,
                             weight_bit_width=plan)
    acc_mixed = (q_mixed([x])[0].argmax(-1) == labels).mean()
    assert acc_mixed >= acc_uniform - 1e-9, (acc_mixed, acc_uniform)

    # the planned fraction of parameters really runs low-bit
    from numpy_quant_tpu.utils.sensitivity import _matmul_weights
    sizes = {w.name: int(np.asarray(w.data.data).size)
             for w in _matmul_weights(model)}
    frac = sum(sizes[n] for n in plan) / sum(sizes.values())
    assert 0.4 <= frac <= 0.8, frac
