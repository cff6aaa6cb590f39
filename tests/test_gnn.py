"""GNN quantization config (BASELINE.md config #5): gather/scatter
message passing + quantized matmul."""
import numpy as np

import numpy_quant_tpu as nq
from numpy_quant_tpu.models import gnn

RNG = np.random.default_rng(0)


def test_gcn_dense_float_and_quantized():
    n, e, f, h, c = 40, 120, 16, 32, 4
    m = gnn.gcn_dense(n, e, f, h, c, seed=0)
    w = m._weights
    x = RNG.standard_normal((n, f)).astype(np.float32)

    model = nq.Model.from_onnx(m)
    logits = model([x])[0]

    # closed-form numpy oracle
    h1 = np.maximum((w["a_hat"] @ x) @ w["w1"] + w["b1"], 0.0)
    desired = (w["a_hat"] @ h1) @ w["w2"] + w["b2"]
    np.testing.assert_allclose(logits, desired, atol=1e-5)

    qmodel = model.quantize([x], bit_width=8)
    qlogits = qmodel([x])[0]
    denom = desired.max() - desired.min()
    assert np.mean(np.abs(qlogits - logits)) / denom < 0.05
    assert (qlogits.argmax(1) == logits.argmax(1)).mean() >= 0.9


def test_gcn_scatter_float_and_quantized():
    n, e, f, c = 30, 90, 12, 5
    m = gnn.gcn_scatter(n, e, f, c, seed=0)
    w = m._weights
    x = RNG.standard_normal((n, f)).astype(np.float32)

    model = nq.Model.from_onnx(m)
    logits = model([x, w["src"]])[0]

    msgs = x[w["src"]]
    agg = np.zeros((n, f), dtype=np.float32)
    np.add.at(agg, w["dst"], msgs)
    desired = (agg + x) @ w["w"] + w["b"]
    np.testing.assert_allclose(logits, desired, atol=1e-5)

    qmodel = model.quantize([x, w["src"]], bit_width=8)
    qlogits = qmodel([x, w["src"]])[0]
    denom = desired.max() - desired.min()
    assert np.mean(np.abs(qlogits - logits)) / denom < 0.05


def test_scatter_elements_set_and_add():
    from numpy_quant_tpu.ops.registry import onnx_operator_implementation
    from numpy_quant_tpu.tensor import FTensor, ITensor

    data = FTensor(np.zeros((4, 3), dtype=np.float32))
    idx = ITensor(np.array([[0, 1, 2], [1, 2, 3]], dtype=np.int64))
    upd = FTensor(np.ones((2, 3), dtype=np.float32))
    out = onnx_operator_implementation(
        "ScatterElements", [data, idx, upd], {"axis": 0, "reduction": "add"})[0]
    expected = np.zeros((4, 3), dtype=np.float32)
    np.add.at(expected, (np.array([[0, 1, 2], [1, 2, 3]]),
                         np.tile(np.arange(3), (2, 1))), 1.0)
    np.testing.assert_array_equal(np.asarray(out.data), expected)

    out2 = onnx_operator_implementation(
        "GatherElements", [out, idx], {"axis": 0})[0]
    np.testing.assert_array_equal(np.asarray(out2.data),
                                  np.asarray(out.data)[
                                      (np.array([[0, 1, 2], [1, 2, 3]]),
                                       np.tile(np.arange(3), (2, 1)))])
