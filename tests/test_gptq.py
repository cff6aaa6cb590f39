"""QModel.gptq: Hessian-guided sequential weight quantization
(arXiv:2210.17323). Same quantization grid as the PTQ pass, integers
chosen to minimize layer output reconstruction error.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.graph import Constant

RNG = np.random.default_rng(31)


def _layer_recon_errs(q, float_model, f_acts):
    f_consts = {v.name: v for v in float_model.values
                if isinstance(v, Constant)}
    errs = {}
    for node in q.nodes:
        if node.op not in ("MatMul", "Gemm") or len(node.inputs) < 2:
            continue
        w = node.inputs[1]
        if not isinstance(w, Constant) or not hasattr(w.data, "bit_width") \
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


def test_gptq_w4_improves_reconstruction():
    """On the trained ViT fixture at W4, GPTQ reduces per-layer output
    reconstruction MSE vs plain rint for nearly every weight, task
    accuracy holds, and pack_weights packs the requantized integers."""
    from numpy_quant_tpu.models import fixtures as F
    from numpy_quant_tpu.utils.parity import record_all_values

    m = F.trained_vit_onnx(batch_size=32)
    model = nq.Model.from_onnx(m)
    x, labels = F.make_batch(np.random.default_rng(8), 32)
    calib, _ = F.make_batch(np.random.default_rng(9), 16)

    q = model.quantize([calib], bit_width=8, weight_bit_width=4)
    base_acc = (q([x])[0].argmax(-1) == labels).mean()
    f_acts = record_all_values(model, [calib])

    before = _layer_recon_errs(q, model, f_acts)
    assert q.gptq(model, [calib]) == len(before) > 0
    after = _layer_recon_errs(q, model, f_acts)
    ratios = np.array([after[k] / before[k] for k in before if before[k]])
    assert (ratios <= 1.0 + 1e-3).mean() >= 0.8, ratios
    assert np.median(ratios) < 0.9, ratios

    acc = (q([x])[0].argmax(-1) == labels).mean()
    assert acc >= base_acc - 1e-9, (acc, base_acc)

    expected = q([calib])[0]
    assert q.pack_weights() > 0
    np.testing.assert_array_equal(q([calib])[0], expected)


def test_gptq_single_matmul_beats_rint():
    """One MatMul layer with a correlated-input Hessian: GPTQ's
    sequential error absorption strictly beats round-to-nearest on the
    layer output MSE (the paper's core claim, checkable exactly)."""
    from numpy_quant_tpu import onnx as O

    k, n, m_ = 24, 12, 400
    W = RNG.normal(size=(k, n)).astype(np.float32)
    # correlated inputs: off-diagonal Hessian, where rint is suboptimal
    base = RNG.normal(size=(m_, 6)).astype(np.float32)
    X = (base @ RNG.normal(size=(6, k)).astype(np.float32)
         + 0.1 * RNG.normal(size=(m_, k)).astype(np.float32))

    g = O.make_graph(
        [O.make_node("MatMul", ["x", "w"], ["y"], name="mm")], "g",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [m_, k])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(W, "w")])
    model = nq.Model.from_onnx(O.make_model(g))
    y_ref = model([X])[0]

    q = model.quantize([X], bit_width=8, weight_bit_width=4)
    err_rint = float(np.mean((q([X])[0] - y_ref) ** 2))
    assert q.gptq(model, [X]) == 1
    err_gptq = float(np.mean((q([X])[0] - y_ref) ** 2))
    assert err_gptq < err_rint, (err_gptq, err_rint)
