"""QModel.adaround: learned weight rounding (arXiv:2004.10568).

Rounding-to-nearest is optimal per weight, not per layer output;
AdaRound optimizes each element's floor/ceil decision against the
layer's output reconstruction error on calibration data. The win shows
at low weight bit widths (W4), where rounding error dominates.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq

RNG = np.random.default_rng(23)


def test_adaround_w4_mlp_reduces_error():
    """W4A8 MLP (Gemm transB layout): AdaRound changes only ROUNDING
    (every tuned integer within one step of rint) and shrinks the
    end-to-end error vs the float oracle on the calibration batch."""
    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = nq.Model.from_onnx(mlp)
    X = RNG.normal(size=(256, 2)).astype(np.float32)
    f_out = model([X])[0]

    q = model.quantize([X], bit_width=8, weight_bit_width=4)
    before = np.abs(q([X])[0] - f_out).mean()
    baseline = {v.name: np.asarray(v.data.data).copy()
                for v in q.values
                if getattr(v, "data", None) is not None
                and hasattr(v.data, "bit_width")
                and getattr(v.data, "zero_point", 0) is None
                and np.asarray(v.data.data).ndim == 2}
    n = q.adaround(model, [X], iters=300)
    assert n >= 2  # both Gemm weights tuned
    for name, base_arr in baseline.items():
        tuned = np.asarray(
            next(v for v in q.values if v.name == name).data.data)
        assert np.abs(tuned - base_arr).max() <= 1  # rounding only
    after = np.abs(q([X])[0] - f_out).mean()
    assert after <= before + 1e-9, (after, before)


def test_adaround_trained_fixture_w4_improves_reconstruction():
    """On the trained ViT fixture at W4, AdaRound improves its actual
    objective -- per-layer output reconstruction MSE vs the float
    weights on the calibration activations -- for nearly every tuned
    layer (measured run: 24/25 improved, median ratio ~0.73), and task
    accuracy never degrades with bias correction composed on top."""
    from numpy_quant_tpu.graph import Constant
    from numpy_quant_tpu.models import fixtures as F
    from numpy_quant_tpu.utils.parity import record_all_values

    m = F.trained_vit_onnx(batch_size=32)
    model = nq.Model.from_onnx(m)
    x, labels = F.make_batch(np.random.default_rng(5), 32)
    calib, _ = F.make_batch(np.random.default_rng(6), 16)

    q = model.quantize([calib], bit_width=8, weight_bit_width=4)
    base_acc = (q([x])[0].argmax(-1) == labels).mean()

    f_acts = record_all_values(model, [calib])
    f_consts = {v.name: v for v in model.values if isinstance(v, Constant)}

    def layer_errs():
        errs = {}
        for node in q.nodes:
            if node.op not in ("MatMul", "Gemm") or len(node.inputs) < 2:
                continue
            w = node.inputs[1]
            if not isinstance(w, Constant) \
                    or not hasattr(w.data, "bit_width") \
                    or w.data.zero_point is not None:
                continue
            W = np.asarray(f_consts[w.name].data.data, np.float32)
            if W.ndim != 2:
                continue
            transb = node.op == "Gemm" and bool(node.attrs.get("transB"))
            k = W.shape[1] if transb else W.shape[0]
            X = np.asarray(f_acts[node.inputs[0].name],
                           np.float32).reshape(-1, k)
            s = np.asarray(w.data.scale, np.float32)
            if s.ndim:
                s = s.reshape((1, -1) if not transb else (-1, 1))
            wq = np.asarray(w.data.data) * s
            if transb:
                W, wq = W.T, wq.T
            errs[w.name] = float(np.mean((X @ W - X @ wq) ** 2))
        return errs

    before = layer_errs()
    assert q.adaround(model, [calib], iters=300) == len(before) > 0
    after = layer_errs()
    ratios = np.array([after[k] / before[k] for k in before if before[k]])
    assert (ratios <= 1.0 + 1e-3).mean() >= 0.8, ratios
    assert np.median(ratios) < 0.9, ratios

    q.correct_biases(model, [calib])
    acc = (q([x])[0].argmax(-1) == labels).mean()
    assert acc >= base_acc - 1e-9, (acc, base_acc)


def test_adaround_then_pack_roundtrip():
    """pack_weights after adaround packs the TUNED integers (payload
    rebuild, not a stale cache)."""
    from numpy_quant_tpu.models import fixtures as F
    from numpy_quant_tpu.tensor import PackedQTensor

    m = F.trained_vit_onnx(batch_size=8)
    model = nq.Model.from_onnx(m)
    calib, _ = F.make_batch(np.random.default_rng(7), 8)
    q = model.quantize([calib], bit_width=8, weight_bit_width=4)
    assert q.adaround(model, [calib], iters=50) > 0
    expected = q([calib])[0]
    assert q.pack_weights() > 0
    assert any(isinstance(getattr(v, "data", None), PackedQTensor)
               for v in q.values)
    np.testing.assert_array_equal(q([calib])[0], expected)
