#!/usr/bin/env python
"""Generate the committed conformance vectors under conformance/.

Each vector is a standard-ONNX model this framework EXPORTED (QDQ,
QOperator, or the onnxruntime dynamic format), a fixed input batch,
and the expected outputs computed by re-importing the exported graph
into our own executor -- whose per-op semantics are themselves pinned
to torch fake-quantize and spec-derived numpy oracles
(tests/test_qdq_conformance.py, tests/test_qoperator.py,
tests/test_dynamic.py).

The reference validates its quantized graphs against onnxruntime as
ground truth (reference: test/test_inference.py:87-101). No
third-party ONNX runtime exists in this environment, so the vectors
make the conformance claim PORTABLE: run

    python extras/run_conformance.py

on any machine with onnxruntime installed and every committed vector
replays there (ROADMAP item 8). tests/test_conformance_vectors.py
keeps the committed files in sync with this generator.

Deterministic: fixed seeds, fixed shapes; re-running must reproduce
the committed files bit-for-bit.
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_DIR = os.path.join(REPO, "conformance")


def _build_vectors():
    """Return [(name, exported ModelProto, {input: array}, atol, note)].

    atol is the replay tolerance for a conformant third-party runtime:
    0 where the graph's output is produced by integer ops with one
    fully-specified rounding (bit-exact across runtimes), else one
    output-quantization step to absorb the requantize rint evaluated at
    a different float width (the only freedom the spec leaves).
    """
    import numpy_quant_tpu as nq
    from numpy_quant_tpu import onnx as O
    from numpy_quant_tpu.models import testgen
    from numpy_quant_tpu.onnx.builder import GraphBuilder
    from numpy_quant_tpu.utils.serialization import (export_qdq,
                                                     export_qoperator)

    rng = np.random.default_rng(1234)
    vectors = []

    # -- 1/2: the committed MLP through export_qdq, int8 and W4A8 ------
    mlp = nq.onnx.load(os.path.join(
        REPO, "numpy_quant_tpu", "models", "mlp.onnx"))
    nq.onnx.make_dim_param_fixed(mlp.graph, "batch_size", 32)
    x_mlp = rng.normal(size=(32, 2)).astype(np.float32)
    model = nq.Model.from_onnx(mlp)
    q8 = model.quantize([x_mlp], bit_width=8)
    vectors.append(("mlp_int8_qdq", export_qdq(q8, mlp),
                    {"input": x_mlp}, 1e-5,
                    "int8 QDQ export of the committed 3-layer MLP"))
    q4 = model.quantize([x_mlp], bit_width=8, weight_bit_width=4,
                        per_channel_weights=True)
    vectors.append(("mlp_w4_perchannel_qdq", export_qdq(q4, mlp),
                    {"input": x_mlp}, 1e-5,
                    "W4A8 per-channel QDQ export (axis-1 scales on "
                    "the weight DequantizeLinear)"))

    # -- 3: QLinearMatMul chain through export_qoperator ---------------
    w1 = (rng.normal(size=(8, 16)) * 0.5).astype(np.float32)
    w2 = (rng.normal(size=(16, 4)) * 0.5).astype(np.float32)
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
    x_qop = rng.normal(size=(32, 8)).astype(np.float32)
    qm = nq.Model.from_onnx(src).quantize([x_qop], bit_width=8)
    exported = export_qoperator(qm, src)
    # one output-requantize step of the LAST QLinearMatMul: its rint
    # may legally be evaluated at any float width >= f32
    y_scale = _qop_output_step(exported)
    vectors.append(("matmul_relu_int8_qoperator", exported,
                    {"x": x_qop}, float(y_scale) + 1e-6,
                    "QLinearMatMul x2 + Relu (QOperator form)"))

    # -- 4: QLinearConv through export_qoperator -----------------------
    src_c = testgen.conv(2, 3, (8, 8), 4, (3, 3), (1, 1, 1, 1), (1, 1), 0)
    x_conv = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    qc = nq.Model.from_onnx(src_c).quantize([x_conv], bit_width=8,
                                            quantize_conv=True)
    exported_c = export_qoperator(qc, src_c)
    vectors.append(("conv_int8_qoperator", exported_c,
                    {"input": x_conv}, _qop_output_step(exported_c) + 1e-6,
                    "QLinearConv with int32 bias (QOperator form)"))

    # -- 5: the onnxruntime quantize_dynamic format ---------------------
    gb = GraphBuilder("ort_dynamic_mlp")
    xin = gb.input("x", [16, 12])
    W1 = rng.normal(size=(12, 20)).astype(np.float32)
    b1 = rng.normal(size=20).astype(np.float32)
    W2 = rng.normal(size=(20, 5)).astype(np.float32)
    b2 = rng.normal(size=5).astype(np.float32)
    h = _dynamic_layer(gb, xin, W1, b1, "l1")
    h = gb.node("Relu", [h], out="relu")
    h = _dynamic_layer(gb, h, W2, b2, "l2")
    gb.node("Identity", [h], out="out", name="out_id")
    gb.output("out", [16, 5])
    x_dyn = (rng.normal(size=(16, 12)) * 2).astype(np.float32)
    vectors.append(("dynamic_mlp", gb.model(), {"x": x_dyn}, 1e-4,
                    "DynamicQuantizeLinear + MatMulInteger (the "
                    "onnxruntime quantize_dynamic node pattern)"))
    return vectors


def _qop_output_step(exported):
    """Scale of the graph-output DequantizeLinear (one requantize
    step), read off the exported proto."""
    from numpy_quant_tpu import onnx as O

    out_name = exported.graph.output[0].name
    dq = next(n for n in exported.graph.node if n.output[0] == out_name)
    assert dq.op_type == "DequantizeLinear", dq.op_type
    inits = {i.name: O.to_array(i) for i in exported.graph.initializer}
    return float(np.asarray(inits[dq.input[1]]).reshape(-1)[0])


def _dynamic_layer(g, x, W, b, name):
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


def generate(out_dir: str = OUT_DIR) -> list:
    """Write <name>.onnx / <name>.npz per vector + manifest.json;
    returns the manifest list."""
    import numpy_quant_tpu as nq

    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    for name, proto, inputs, atol, note in _build_vectors():
        replay = nq.Model.from_onnx(proto)
        in_names = [v.name for v in replay.inputs]
        outs = replay([inputs[n] for n in in_names])
        out_names = [v.name for v in replay.outputs]
        nq.onnx.save(proto, os.path.join(out_dir, f"{name}.onnx"))
        payload = dict(inputs)
        for oname, arr in zip(out_names, outs):
            payload[f"expected::{oname}"] = np.asarray(arr, np.float32)
        np.savez(os.path.join(out_dir, f"{name}.npz"), **payload)
        manifest.append({
            "name": name,
            "model": f"{name}.onnx",
            "arrays": f"{name}.npz",
            "inputs": in_names,
            "outputs": out_names,
            "atol": atol,
            "note": note,
        })
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
        f.write("\n")
    return manifest


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=OUT_DIR)
    entries = generate(ap.parse_args().out)
    for e in entries:
        print(f"wrote {e['name']}: atol={e['atol']:.3g} -- {e['note']}")
