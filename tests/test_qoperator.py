"""QOperator-format interop: QLinearMatMul / QLinearConv.

Two directions, mirroring the QDQ interop tests:

* IMPORT/EXECUTE -- hand-built QOperator graphs (the format other
  tools' quantizers emit) run on this framework's registry ops and
  match a from-the-spec numpy oracle bit-for-bit
  (y = saturate(rint(acc * s_a*s_b / s_y) + zp_y), ONNX Operators.md);
* EXPORT -- export_qoperator turns a QModel's quantized MatMuls/Convs
  into explicit QLinear nodes (Gemm keeps the QDQ form: the standard
  opset has no quantized Gemm), and the exported model re-imported into
  this framework matches the integer executor statistically (the format
  requantizes each converted op's output; the executor carries the
  exact int32 accumulator into the consumer).
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(42)


def _np_quantize(x, s, zp, info):
    return np.clip(np.rint(x / np.float32(s)) + zp, info.min, info.max)


def _qlinearmatmul_oracle(x, a_s, a_z, wq, w_s, w_z, y_s, y_z, a_info,
                          y_info):
    """From-the-spec integer chain in numpy (float64 staging exact for
    these magnitudes)."""
    aq = _np_quantize(x.astype(np.float64), a_s, a_z, a_info)
    acc = (aq - a_z) @ (wq.astype(np.float64) - w_z)
    yq = np.clip(np.rint(acc * a_s * w_s / np.float32(y_s)) + y_z,
                 y_info.min, y_info.max)
    return (yq - y_z) * np.float32(y_s)


@pytest.mark.parametrize("storage", ["int8", "uint8"])
def test_qlinearmatmul_executes_spec(storage):
    """A hand-built QOperator graph (QuantizeLinear -> QLinearMatMul ->
    DequantizeLinear) executes bit-exactly vs the spec chain, for both
    int8 and uint8 activation storage."""
    m_, k, n = 6, 8, 5
    if storage == "int8":
        a_z, a_dt = -3, np.int8
    else:
        a_z, a_dt = 131, np.uint8
    a_info = np.iinfo(a_dt)
    # power-of-two scales: every product/division in the chain is exact
    # in f32 AND f64, so the rint decision points are identical in the
    # executor (f32 divides) and this f64 oracle -- the equality below
    # is bit-exact, not tolerance-hidden
    a_s, w_s, y_s, y_z = 0.0625, 0.03125, 0.25, 7
    wq = RNG.integers(-100, 100, size=(k, n)).astype(np.int8)

    nodes = [
        O.make_node("QuantizeLinear", ["x", "a_s", "a_z"], ["xq"],
                    name="qx"),
        O.make_node("QLinearMatMul",
                    ["xq", "a_s", "a_z", "w", "w_s", "w_z", "y_s", "y_z"],
                    ["yq"], name="qmm"),
        O.make_node("DequantizeLinear", ["yq", "y_s", "y_z"], ["y"],
                    name="dq"),
    ]
    init = [
        O.from_array(np.float32(a_s), "a_s"),
        O.from_array(a_dt(a_z), "a_z"),
        O.from_array(wq, "w"),
        O.from_array(np.float32(w_s), "w_s"),
        O.from_array(np.int8(0), "w_z"),
        O.from_array(np.float32(y_s), "y_s"),
        O.from_array(np.int8(y_z), "y_z"),
    ]
    g = O.make_graph(
        nodes, "qlmm",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [m_, k])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=init)
    model = nq.Model.from_onnx(O.make_model(g))

    x = RNG.normal(size=(m_, k)).astype(np.float32)
    got = model([x])[0]
    want = _qlinearmatmul_oracle(x, a_s, a_z, wq, w_s, 0, y_s, y_z,
                                 a_info, np.iinfo(np.int8))
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_qlinearconv_executes_spec():
    """QLinearConv with int32 bias and PER-CHANNEL weight scales matches
    the spec chain bit-for-bit (stride 1, no padding; exactness comes
    from the integer accumulator, not the conv config)."""
    b, c, o, h, w_, kh, kw = 2, 3, 4, 5, 5, 2, 2
    # power-of-two scales: see test_qlinearmatmul_executes_spec
    a_s, a_z = 0.0625, 10
    w_s = np.asarray([0.03125, 0.0625, 0.015625, 0.125], np.float32)
    y_s, y_z = 0.5, -5
    wq = RNG.integers(-100, 100, size=(o, c, kh, kw)).astype(np.int8)
    bias = RNG.integers(-2000, 2000, size=(o,)).astype(np.int32)

    nodes = [
        O.make_node("QuantizeLinear", ["x", "a_s", "a_z"], ["xq"],
                    name="qx"),
        O.make_node("QLinearConv",
                    ["xq", "a_s", "a_z", "w", "w_s", "w_z", "y_s", "y_z",
                     "bias"],
                    ["yq"], name="qlc",
                    kernel_shape=[kh, kw], pads=[0, 0, 0, 0],
                    strides=[1, 1]),
        O.make_node("DequantizeLinear", ["yq", "y_s", "y_z"], ["y"],
                    name="dq"),
    ]
    init = [
        O.from_array(np.float32(a_s), "a_s"),
        O.from_array(np.int8(a_z), "a_z"),
        O.from_array(wq, "w"),
        O.from_array(w_s, "w_s"),
        O.from_array(np.zeros(o, np.int8), "w_z"),
        O.from_array(np.float32(y_s), "y_s"),
        O.from_array(np.int8(y_z), "y_z"),
        O.from_array(bias, "bias"),
    ]
    g = O.make_graph(
        nodes, "qlconv",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [b, c, h, w_])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=init)
    model = nq.Model.from_onnx(O.make_model(g))

    x = RNG.normal(size=(b, c, h, w_)).astype(np.float32)
    got = model([x])[0]

    # numpy oracle: integer conv accumulator + per-channel requantize
    info = np.iinfo(np.int8)
    xq = _np_quantize(x.astype(np.float64), a_s, a_z, info) - a_z
    oh, ow = h - kh + 1, w_ - kw + 1
    acc = np.zeros((b, o, oh, ow))
    for i in range(oh):
        for j in range(ow):
            patch = xq[:, :, i:i + kh, j:j + kw]  # [B, C, KH, KW]
            acc[:, :, i, j] = np.einsum("bckl,ockl->bo", patch,
                                        wq.astype(np.float64))
    acc += bias.astype(np.float64)[None, :, None, None]
    scale = (np.float32(a_s) * w_s).astype(np.float64)
    yq = np.clip(np.rint(acc * scale[None, :, None, None]
                         / np.float32(y_s)) + y_z, info.min, info.max)
    want = ((yq - y_z) * np.float32(y_s)).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_export_qoperator_vit_roundtrip():
    """export_qoperator on a small ViT: every quantized MatMul becomes a
    QLinearMatMul (incl. the two-activation attention matmuls); the
    re-imported model matches the integer executor statistically (the
    format adds one output-quantization rounding per converted node)."""
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from numpy_quant_tpu.utils import export_qoperator
    from transformers import ViTConfig

    cfg = ViTConfig(image_size=16, patch_size=4, hidden_size=16,
                    num_attention_heads=2, intermediate_size=32,
                    num_hidden_layers=1, num_labels=4)
    mv = vit_image_classifier(config=cfg, batch_size=2, seed=0)
    vmodel = nq.Model.from_onnx(mv)
    xv = RNG.normal(size=(2, 3, 16, 16)).astype(np.float32)
    qv = vmodel.quantize([xv], bit_width=8)

    exported = export_qoperator(qv, mv)
    ops = [n.op_type for n in exported.graph.node]
    n_matmul_src = sum(1 for n in mv.graph.node if n.op_type == "MatMul")
    # every MatMul converts except probs @ v: the softmax-probs
    # calibrated zero point lies outside int8 (the executor's wide-zp
    # accumulator semantics), which no QLinear form can store -- that
    # node keeps the float MatMul, exactly like the QDQ export
    assert ops.count("QLinearMatMul") == n_matmul_src - 1
    assert ops.count("MatMul") == 1

    loaded = nq.Model.from_onnx(exported)
    a, b = qv([xv])[0], loaded([xv])[0]
    assert np.abs(a - b).mean() < 0.05, np.abs(a - b).mean()
    assert np.array_equal(a.argmax(1), b.argmax(1))


def test_export_qoperator_after_optimize_and_pack(tmp_path):
    """QOperator export composes with the serving transforms: a W4A8,
    optimize()d (fused attention + early-int8 + narrow_gather),
    pack_weights()ed QModel exports from the SOURCE graph structure
    with unpacked per-initializer payloads; per-channel weights keep
    the QDQ form (QLinearMatMul requires scalar operand scales) so the
    result is a legal mixed model matching the integer path."""
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from numpy_quant_tpu.utils import save_qmodel_qoperator
    from transformers import ViTConfig

    rng = np.random.default_rng(2)
    cfg = ViTConfig(image_size=16, patch_size=4, hidden_size=16,
                    num_attention_heads=2, intermediate_size=32,
                    num_hidden_layers=1, num_labels=4)
    mv = vit_image_classifier(config=cfg, batch_size=2, seed=0)
    model = nq.Model.from_onnx(mv)
    xv = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    q = model.quantize([xv], bit_width=8, weight_bit_width=4,
                       per_channel_weights=True)
    q.optimize()
    assert q.pack_weights() > 0
    expected = q([xv])[0]
    path = tmp_path / "vit_w4a8_qop.onnx"
    save_qmodel_qoperator(q, path, mv)
    loaded_proto = nq.onnx.load(path)
    ops = [n.op_type for n in loaded_proto.graph.node]
    # the attention's two-activation matmuls convert (scalar scales);
    # per-channel-weight matmuls stay QDQ
    assert "QLinearMatMul" in ops
    loaded = nq.Model.from_onnx(loaded_proto)
    a, b = expected, loaded([xv])[0]
    assert np.abs(a - b).mean() < 0.05, np.abs(a - b).mean()
    assert np.array_equal(a.argmax(1), b.argmax(1))


def test_export_qoperator_square_per_channel_axis():
    """A SQUARE per-channel MatMul weight cannot convert to
    QLinearMatMul (scalar operand scales required) and falls back to a
    weight DequantizeLinear -- whose channel axis must come from the
    CONSUMER (MatMul rhs -> axis 1), not naive shape matching, which is
    ambiguous for square weights (code-review regression)."""
    from numpy_quant_tpu.utils import export_qoperator

    d = 6
    w = RNG.normal(size=(d, d)).astype(np.float32) * 0.3
    g = O.make_graph(
        [O.make_node("MatMul", ["x", "w"], ["y"], name="mm")], "sq",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [8, d])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(w, "w")])
    src = O.make_model(g)
    model = nq.Model.from_onnx(src)
    x = RNG.normal(size=(8, d)).astype(np.float32)
    q = model.quantize([x], bit_width=8, per_channel_weights=True)
    exported = export_qoperator(q, src)
    dqw = next(n for n in exported.graph.node if n.name == "DQ_w")
    assert O.get_attribute_value(
        next(a for a in dqw.attribute if a.name == "axis")) == 1
    loaded = nq.Model.from_onnx(exported)
    np.testing.assert_allclose(loaded([x])[0], q([x])[0], atol=1e-4)


def test_export_chained_gemm_no_duplicate_names(tmp_path):
    """Gemm -> Gemm: the first output is producer-wrapped AND consumed
    by a quantized op; both exporters must emit each qdq initializer /
    node name once (duplicates break conformant runtimes'
    single-definition rule; code-review regression)."""
    from numpy_quant_tpu.utils import export_qdq, export_qoperator

    w1 = RNG.normal(size=(5, 8)).astype(np.float32)
    b1 = RNG.normal(size=5).astype(np.float32)
    w2 = RNG.normal(size=(3, 5)).astype(np.float32)
    nodes = [
        O.make_node("Gemm", ["x", "w1", "b1"], ["h"], name="g1",
                    transB=1),
        O.make_node("Gemm", ["h", "w2"], ["y"], name="g2", transB=1),
    ]
    g = O.make_graph(
        nodes, "gg",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [16, 8])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(w1, "w1"), O.from_array(b1, "b1"),
                     O.from_array(w2, "w2")])
    src = O.make_model(g)
    model = nq.Model.from_onnx(src)
    x = RNG.normal(size=(16, 8)).astype(np.float32)
    q = model.quantize([x], bit_width=8)
    for export in (export_qdq, export_qoperator):
        exported = export(q, src)
        init_names = [i.name for i in exported.graph.initializer]
        assert len(init_names) == len(set(init_names)), export.__name__
        node_names = [n.name for n in exported.graph.node]
        assert len(node_names) == len(set(node_names)), export.__name__
        loaded = nq.Model.from_onnx(exported)
        np.testing.assert_allclose(loaded([x])[0], q([x])[0], atol=1e-3)


def test_export_qoperator_mlp_gemm_stays_qdq(tmp_path):
    """Gemm has no standard QOperator form (QGemm is a com.microsoft
    extension): the MLP exports as a legal mixed model whose Gemms keep
    the QDQ wrapping, and still round-trips through the importer."""
    from numpy_quant_tpu.utils import save_qmodel_qoperator

    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = nq.Model.from_onnx(mlp)
    X = RNG.normal(size=(64, 2)).astype(np.float32)
    q = model.quantize([X], bit_width=8)
    path = tmp_path / "mlp_qop.onnx"
    save_qmodel_qoperator(q, path, mlp)
    loaded_proto = nq.onnx.load(path)
    ops = [n.op_type for n in loaded_proto.graph.node]
    assert "Gemm" in ops and "QuantizeLinear" in ops
    assert "QLinearMatMul" not in ops  # nothing to convert in the MLP
    loaded = nq.Model.from_onnx(loaded_proto)
    np.testing.assert_allclose(loaded([X])[0], q([X])[0], atol=1e-4)


def test_export_qoperator_conv():
    """quantize_conv=True exports the Conv as QLinearConv with its int32
    bias riding along; re-imported outputs match the integer executor up
    to the format's single output requantize step."""
    from numpy_quant_tpu.models import testgen
    from numpy_quant_tpu.utils import export_qoperator

    src = testgen.conv(2, 3, (8, 8), 4, (3, 3), (1, 1, 1, 1), (1, 1), 0)
    model = nq.Model.from_onnx(src)
    x = RNG.normal(size=(2, 3, 8, 8)).astype(np.float32)
    q = model.quantize([x], bit_width=8, quantize_conv=True)

    exported = export_qoperator(q, src)
    ops = [n.op_type for n in exported.graph.node]
    assert "QLinearConv" in ops and "Conv" not in ops
    qlc = next(n for n in exported.graph.node if n.op_type == "QLinearConv")
    assert len(qlc.input) == 9  # bias included

    loaded = nq.Model.from_onnx(exported)
    a, b = q([x])[0], loaded([x])[0]
    # differs by the format's single output-requantize rounding
    assert np.abs(a - b).max() < 0.2, np.abs(a - b).max()
    assert np.abs(a - b).mean() < 0.05
