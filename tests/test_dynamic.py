"""Dynamic quantization (dynamic.py): runtime activation scales inside
the jitted program, no calibration data. Exactness is pinned against a
numpy mirror of the traced math; accuracy against the float model.
Parity-plus: the reference has static PTQ only (reference
model.py:328-442); this mirrors onnxruntime's dynamic mode.
"""
import pathlib

import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O
from numpy_quant_tpu.graph import Constant
from numpy_quant_tpu.models import testgen
from numpy_quant_tpu.quantization import qrange
from numpy_quant_tpu.tensor import QTensor

MLP_PATH = pathlib.Path(__file__).parent.parent / "numpy_quant_tpu" \
    / "models" / "mlp.onnx"
RNG = np.random.default_rng(23)


def _matmul_const_graph(k=24, m=16, n=32, seed=5):
    rng = np.random.default_rng(seed)
    inp = O.make_tensor_value_info("input", O.TensorProto.FLOAT, [k, m])
    out = O.make_tensor_value_info("output", O.TensorProto.FLOAT, [k, n])
    w = O.from_array(rng.normal(size=(m, n)).astype(np.float32), "weight")
    node = O.make_node("MatMul", ["input", "weight"], ["output"],
                       name="MatMul")
    g = O.make_graph([node], "MM", [inp], [out], initializer=[w])
    return O.make_model(g, opset_imports=[O.make_opsetid("", 13)])


def _dyn_ref(x, wq, w_scale, bit_width, granularity):
    """Numpy mirror of the DynamicMatMul registry op."""
    lo, hi = qrange(bit_width)
    xd = x.astype(np.float32)
    if granularity == "row":
        mn = np.minimum(xd.min(-1, keepdims=True), np.float32(0))
        mx = np.maximum(xd.max(-1, keepdims=True), np.float32(0))
    else:
        mn = np.minimum(xd.min(), np.float32(0))
        mx = np.maximum(xd.max(), np.float32(0))
    scale = ((mx - mn) / np.float32(hi - lo)).astype(np.float32)
    scale = np.where(scale > 0, scale, np.float32(1)).astype(np.float32)
    zp = np.rint(np.float32(lo) - mn / scale)
    xq = np.rint(np.clip(xd / scale + zp, lo, hi)).astype(np.int64)
    wq = wq.astype(np.int64)
    acc = xq @ wq
    corr = zp.astype(np.int64) * wq.sum(0, keepdims=True)
    return (acc - corr).astype(np.float32) \
        * (scale * np.asarray(w_scale, np.float32))


@pytest.mark.parametrize("granularity,per_channel",
                         [("row", False), ("tensor", False), ("row", True)])
def test_dynamic_matmul_matches_numpy_mirror(granularity, per_channel):
    model = nq.Model.from_onnx(_matmul_const_graph())
    x = RNG.normal(size=(24, 16)).astype(np.float32) * 3
    dyn = model.quantize_dynamic(granularity=granularity,
                                 per_channel_weights=per_channel)
    assert [n.op for n in dyn.nodes] == ["DynamicMatMul"]
    got = dyn([x])[0]

    (wq,) = [v.data for v in dyn.values
             if isinstance(v, Constant) and isinstance(v.data, QTensor)]
    want = _dyn_ref(x, np.asarray(wq.data), wq.scale, 8, granularity)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # sanity: tracks the float product (the mirror above is the real
    # check; this catches gross scale errors only)
    f_out = model([x])[0]
    assert np.abs(got - f_out).mean() < 0.1 * np.abs(f_out).mean()


def test_dynamic_gemm_folds_alpha_beta():
    m = testgen.gemm(16, 12, 10, random_seed=9, alpha=1.5, beta=0.5)
    model = nq.Model.from_onnx(m)
    x = RNG.normal(size=(16, 12)).astype(np.float32)
    f_out = model([x])[0]

    dyn = model.quantize_dynamic()
    assert [n.op for n in dyn.nodes] == ["DynamicMatMul", "Add"]
    np.testing.assert_allclose(dyn([x])[0], f_out, atol=0.15)

    names = {v.name for v in dyn.values}
    # alpha folded into the quantized weight, beta into the float bias,
    # original initializers pruned (no dead HBM uploads)
    assert "Gemm/dyn_w" in names and "Gemm/dyn_bias" in names
    assert "weight" not in names and "bias" not in names
    consts = {v.name: v.data for v in dyn.values if isinstance(v, Constant)}
    assert isinstance(consts["Gemm/dyn_w"], QTensor)
    b = np.asarray(consts["Gemm/dyn_bias"].data)
    ref_bias = np.asarray(
        {v.name: v for v in model.values}["bias"].data.data) * 0.5
    np.testing.assert_allclose(b, ref_bias, rtol=1e-6)


def test_dynamic_mlp_no_calibration_data():
    model = nq.Model.from_onnx(nq.onnx.load(MLP_PATH))
    from sklearn.datasets import make_circles
    X, Y = make_circles(n_samples=500, noise=0.03, random_state=3)
    X = X.astype(np.float32)

    f_lab = model([X])[0][:, 0] > 0.5
    dyn = model.quantize_dynamic()          # <- no data anywhere
    d_lab = dyn([X])[0][:, 0] > 0.5
    assert (d_lab == f_lab).mean() >= 0.99

    # W4A8-style: 4-bit weights, 8-bit runtime activations
    dyn4 = model.quantize_dynamic(weight_bit_width=4,
                                  per_channel_weights=True)
    d4_lab = dyn4([X])[0][:, 0] > 0.5
    assert (d4_lab == f_lab).mean() >= 0.9


def test_dynamic_transformer_weights_only():
    """BERT text graph: every parameter matmul goes dynamic-int8, the
    activation x activation attention matmuls stay float (ORT dynamic
    semantics), and the results track the float model."""
    from numpy_quant_tpu.models.text import bert_text_classifier

    m = bert_text_classifier(batch_size=4, seq_len=8, seed=2)
    ids = RNG.integers(0, 96, size=(4, 8)).astype(np.int64)
    model = nq.Model.from_onnx(m)
    f_out = model([ids])[0]

    dyn = model.quantize_dynamic()
    ops = [n.op for n in dyn.nodes]
    # 6 weights/layer x 2 layers via MatMul + pooler/classifier Gemms
    assert ops.count("DynamicMatMul") == 14
    # QK^T and probs@V remain float MatMuls (2 per layer)
    assert ops.count("MatMul") == 4

    out = dyn([ids])[0]
    assert np.array_equal(out.argmax(-1), f_out.argmax(-1))
    np.testing.assert_allclose(out, f_out, atol=0.1)


def _dql_ref(x):
    """Numpy mirror of the ONNX DynamicQuantizeLinear spec."""
    mn = min(np.float32(0), np.float32(x.min()))
    mx = max(np.float32(0), np.float32(x.max()))
    scale = np.float32((mx - mn) / np.float32(255.0))
    scale = np.float32(1.0) if scale == 0 else scale
    zp = np.clip(np.rint(-mn / scale), 0, 255).astype(np.float32)
    y = np.clip(np.rint(x / scale) + zp, 0, 255).astype(np.float32)
    return y, scale, zp


def test_dynamic_quantize_linear_spec():
    """The opset-11 DynamicQuantizeLinear op (what onnxruntime's
    quantize_dynamic emits) executes per spec: uint8 range, zero point
    from the zero-including min/max, round-half-even."""
    x = np.array([[0, 2, -3, -2.5, 1.34, 0.5],
                  [1, 7, 0.25, -0.1, 0, 3.5]], np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [2, 6])
    node = O.make_node("DynamicQuantizeLinear", ["x"],
                       ["y", "ys", "yzp"], name="dql")
    outs = [O.make_tensor_value_info("y", O.TensorProto.FLOAT, [2, 6]),
            O.make_tensor_value_info("ys", O.TensorProto.FLOAT, []),
            O.make_tensor_value_info("yzp", O.TensorProto.FLOAT, [])]
    g = O.make_graph([node], "DQL", [inp], outs)
    model = nq.Model.from_onnx(
        O.make_model(g, opset_imports=[O.make_opsetid("", 13)]))
    y, ys, yzp = model([x])
    ry, rs, rzp = _dql_ref(x)
    np.testing.assert_array_equal(y, ry)
    np.testing.assert_allclose(ys, rs, rtol=1e-7)
    np.testing.assert_array_equal(np.asarray(yzp).reshape(()), rzp)
    # the round trip bounds: |dequant - x| <= scale/2 inside the range
    assert (np.abs((y - rzp) * rs - x) <= rs / 2 + 1e-7).all()


def _ort_dynamic_layer(g, x, W, b, name):
    """The node pattern onnxruntime's quantize_dynamic emits per
    MatMul: DynamicQuantizeLinear -> MatMulInteger -> Cast -> Mul
    (combined scale) -> Add (float bias)."""
    ws = np.float32(2.0 * np.abs(W).max() / 254.0)
    wq = np.clip(np.rint(W / ws), -127, 127).astype(np.int8)
    xq, xs, xzp = g.node("DynamicQuantizeLinear", [x],
                         out=f"{name}/dql", n_outputs=3)
    wqi = g.init(f"{name}/wq", wq)
    wzp = g.init(f"{name}/wzp", np.int8(0))
    mm = g.node("MatMulInteger", [xq, wqi, xzp, wzp], out=f"{name}/mmi")
    c = g.node("Cast", [mm], out=f"{name}/cast", to=1)
    sc = g.node("Mul", [xs, g.init(f"{name}/ws", ws)], out=f"{name}/scale")
    y = g.node("Mul", [c, sc], out=f"{name}/scaled")
    return g.node("Add", [y, g.init(f"{name}/b", b)], out=f"{name}/out")


def test_ort_dynamic_format_graph_executes():
    """A quantize_dynamic-format ONNX graph (DynamicQuantizeLinear +
    MatMulInteger, uint8 activations x int8 weights) imports and tracks
    the float math end-to-end -- onnxruntime's dynamic models serve
    from this framework directly."""
    from numpy_quant_tpu.onnx.builder import GraphBuilder

    rng = np.random.default_rng(11)
    W1 = rng.normal(size=(12, 20)).astype(np.float32)
    b1 = rng.normal(size=20).astype(np.float32)
    W2 = rng.normal(size=(20, 5)).astype(np.float32)
    b2 = rng.normal(size=5).astype(np.float32)

    g = GraphBuilder("ort_dynamic_mlp")
    x = g.input("x", [16, 12])
    h = _ort_dynamic_layer(g, x, W1, b1, "l1")
    h = g.node("Relu", [h], out="relu")
    h = _ort_dynamic_layer(g, h, W2, b2, "l2")
    g.node("Identity", [h], out="out", name="out_id")
    g.output("out", [16, 5])
    model = nq.Model.from_onnx(g.model())

    xv = rng.normal(size=(16, 12)).astype(np.float32) * 2
    got = model([xv])[0]
    want = np.maximum(xv @ W1 + b1, 0) @ W2 + b2
    assert np.abs(got - want).mean() < 0.05 * np.abs(want).mean()
    assert np.array_equal(got.argmax(-1), want.argmax(-1)) or \
        (got.argmax(-1) == want.argmax(-1)).mean() >= 0.8
