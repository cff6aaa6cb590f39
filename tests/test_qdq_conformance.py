"""Third-party conformance for the standard-ONNX QDQ interop.

The reference validates against onnxruntime as ground truth
(reference: test/test_inference.py:87-101); no ORT exists in this
environment. The nearest independent implementations available are:

* torch.fake_quantize_per_tensor_affine / _per_channel_affine --
  PyTorch's implementation of exactly the QuantizeLinear->
  DequantizeLinear composition (saturating round-half-even affine
  quantization). Our executor's QDQ pairs must match it bitwise.
* a ~40-line spec-derived numpy evaluator (below, written straight
  from the ONNX operator definitions, sharing NOTHING with the
  executor) that runs export_qdq's output graph.

Together these pin that export_qdq emits graphs ANY conformant
runtime computes the same way -- not just our own executor.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(0)


def _run_qdq_graph(nodes, in_infos, out_infos, inits, inputs):
    g = O.make_graph(nodes, "g", in_infos, out_infos, initializer=inits)
    return nq.Model.from_onnx(O.make_model(g))(inputs)


@pytest.mark.parametrize("signed,zp", [(False, 128), (False, 0),
                                       (True, 0), (True, -10)])
def test_qdq_pair_matches_torch_fake_quantize(signed, zp):
    """QuantizeLinear -> DequantizeLinear == torch fake-quantize,
    bit-for-bit, for int8 and uint8 storage."""
    torch = pytest.importorskip("torch")
    x = (RNG.normal(size=(7, 33)) * 3).astype(np.float32)
    scale = np.float32(0.037)
    zdt = np.int8 if signed else np.uint8
    lo, hi = (-128, 127) if signed else (0, 255)

    nodes = [
        O.make_node("QuantizeLinear", ["x", "s", "z"], ["q"], name="q"),
        O.make_node("DequantizeLinear", ["q", "s", "z"], ["y"], name="dq"),
    ]
    y = _run_qdq_graph(
        nodes,
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, list(x.shape))],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        [O.from_array(scale, "s"), O.from_array(zdt(zp), "z")], [x])[0]

    desired = torch.fake_quantize_per_tensor_affine(
        torch.from_numpy(x), float(scale), int(zp), lo, hi).numpy()
    np.testing.assert_array_equal(y, desired)


def test_qdq_per_channel_matches_torch():
    torch = pytest.importorskip("torch")
    x = (RNG.normal(size=(5, 12)) * 2).astype(np.float32)
    scales = (0.01 + RNG.random(12) * 0.05).astype(np.float32)
    zps = RNG.integers(-20, 20, size=12).astype(np.int8)

    nodes = [
        O.make_node("QuantizeLinear", ["x", "s", "z"], ["q"], name="q",
                    axis=1),
        O.make_node("DequantizeLinear", ["q", "s", "z"], ["y"], name="dq",
                    axis=1),
    ]
    y = _run_qdq_graph(
        nodes,
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, list(x.shape))],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        [O.from_array(scales, "s"), O.from_array(zps, "z")], [x])[0]

    desired = torch.fake_quantize_per_channel_affine(
        torch.from_numpy(x), torch.from_numpy(scales.astype(np.float64))
        .float(), torch.from_numpy(zps.astype(np.int32)), 1,
        -128, 127).numpy()
    np.testing.assert_array_equal(y, desired)


# ------------------------------------------------------------------
# Spec-derived evaluator: written from the ONNX operator definitions,
# independent of numpy_quant_tpu's executor/tensor layer.
# ------------------------------------------------------------------


def _spec_eval(model_proto, inputs: dict) -> dict:
    vals = dict(inputs)
    for init in model_proto.graph.initializer:
        vals[init.name] = O.to_array(init)
    for node in model_proto.graph.node:
        a = {at.name: O.get_attribute_value(at) for at in node.attribute}
        ins = [vals[n] if n else None for n in node.input]
        op = node.op_type
        if op == "QuantizeLinear":
            x, s = ins[0], ins[1]
            z = ins[2] if len(ins) > 2 else np.uint8(0)
            info = np.iinfo(z.dtype)
            axis = int(a.get("axis", 1)) % max(x.ndim, 1)
            sh = [1] * x.ndim
            if np.ndim(s) and np.size(s) > 1:
                sh[axis] = -1
            sb = np.asarray(s, np.float32).reshape(sh) if x.ndim else s
            zb = np.asarray(z, np.int64).reshape(sh) if x.ndim else z
            q = np.rint(x.astype(np.float32) / sb) + zb
            out = np.clip(q, info.min, info.max).astype(z.dtype)
        elif op == "DequantizeLinear":
            x, s = ins[0], ins[1]
            z = ins[2] if len(ins) > 2 else np.zeros((), x.dtype)
            axis = int(a.get("axis", 1)) % max(x.ndim, 1)
            sh = [1] * x.ndim
            if np.ndim(s) and np.size(s) > 1:
                sh[axis] = -1
            sb = np.asarray(s, np.float32).reshape(sh) if x.ndim else s
            zb = np.asarray(z, np.int64).reshape(sh) if x.ndim else z
            out = (x.astype(np.int64) - zb).astype(np.float32) * sb
        elif op == "Gemm":
            x, w = ins[0], ins[1]
            b = ins[2] if len(ins) > 2 else 0.0
            if a.get("transA"):
                x = x.T
            if a.get("transB"):
                w = w.T
            out = (float(a.get("alpha", 1.0)) * (x @ w)
                   + float(a.get("beta", 1.0)) * b).astype(np.float32)
        elif op == "MatMul":
            out = (ins[0] @ ins[1]).astype(np.float32)
        elif op == "Relu":
            out = np.maximum(ins[0], 0)
        elif op == "Sigmoid":
            out = (1.0 / (1.0 + np.exp(-ins[0]))).astype(np.float32)
        elif op == "QLinearMatMul":
            aq, a_s, a_z, bq, b_s, b_z, y_s, y_z = ins[:8]
            acc = ((aq.astype(np.int64) - int(a_z))
                   @ (bq.astype(np.int64) - int(b_z)))
            info = np.iinfo(y_z.dtype)
            q = np.rint(acc.astype(np.float64)
                        * (np.float32(a_s) * np.float32(b_s))
                        / np.float32(y_s)) + int(y_z)
            out = np.clip(q, info.min, info.max).astype(y_z.dtype)
        else:
            raise NotImplementedError(op)
        vals[node.output[0]] = out
    return {o.name: vals[o.name] for o in model_proto.graph.output}


def test_export_qdq_runs_on_spec_evaluator():
    """export_qdq's output computes the same answers on the
    spec-derived evaluator as on our executor -- conformance evidence
    that the emitted graph is standard ONNX, not executor-specific."""
    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = nq.Model.from_onnx(mlp)
    X = RNG.normal(size=(32, 2)).astype(np.float32)
    q = model.quantize([X], bit_width=8)
    ours = q([X])[0]

    from numpy_quant_tpu.utils.serialization import export_qdq
    qdq = export_qdq(q, mlp)
    out_name = qdq.graph.output[0].name
    init_names = {i.name for i in qdq.graph.initializer}
    in_name = next(i.name for i in qdq.graph.input
                   if i.name not in init_names)
    spec = _spec_eval(qdq, {in_name: X})[out_name]

    # fake-quant f32 vs the exact integer path: accumulator rounding
    np.testing.assert_allclose(spec, ours, atol=1e-4)
    # and the spec evaluator agrees with OUR executor on the SAME graph
    ours_qdq = nq.Model.from_onnx(qdq)([X])[0]
    np.testing.assert_allclose(spec, ours_qdq, atol=1e-5)


def test_export_qoperator_runs_on_spec_evaluator():
    """export_qoperator's output computes the same answers on the
    spec-derived evaluator (its QLinearMatMul written straight from
    Operators.md, int64 accumulator) as on our executor -- conformance
    evidence for the QOperator form, mirroring the QDQ test. The only
    admissible difference is the output-requantize rint evaluated in
    f64 (spec) vs f32 (executor): at most ONE quantization step on a
    vanishing fraction of elements."""
    w1 = (RNG.normal(size=(8, 16)) * 0.5).astype(np.float32)
    w2 = (RNG.normal(size=(16, 4)) * 0.5).astype(np.float32)
    nodes = [
        O.make_node("MatMul", ["x", "w1"], ["h"], name="mm1"),
        O.make_node("Relu", ["h"], ["r"], name="act"),
        O.make_node("MatMul", ["r", "w2"], ["y"], name="mm2"),
    ]
    g = O.make_graph(
        nodes, "qop",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [32, 8])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(w1, "w1"), O.from_array(w2, "w2")])
    src = O.make_model(g)
    model = nq.Model.from_onnx(src)
    X = RNG.normal(size=(32, 8)).astype(np.float32)
    q = model.quantize([X], bit_width=8)

    from numpy_quant_tpu.utils.serialization import export_qoperator
    qop = export_qoperator(q, src)
    ops = [n.op_type for n in qop.graph.node]
    assert ops.count("QLinearMatMul") == 2 and "MatMul" not in ops

    out_name = qop.graph.output[0].name
    init_names = {i.name for i in qop.graph.initializer}
    in_name = next(i.name for i in qop.graph.input
                   if i.name not in init_names)
    spec = _spec_eval(qop, {in_name: X})[out_name]
    ours = nq.Model.from_onnx(qop)([X])[0]
    y_scale = float(q.quant_params["y"].scale)
    diff = np.abs(spec - ours)
    assert diff.max() <= y_scale * 1.01, (diff.max(), y_scale)
    assert (diff > 0).mean() < 0.02, (diff > 0).mean()
