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

    def named_inputs(src_proto, *arrays):
        names = [v.name for v in nq.Model.from_onnx(src_proto).inputs]
        assert len(names) == len(arrays), (names, len(arrays))
        return dict(zip(names, arrays))

    # -- 6: ViT self-attention subgraph, int8 QDQ ----------------------
    from numpy_quant_tpu.models import vit as V
    attn_src = V.vit_self_attention(2, 13, 32, 4, seed=5)
    x_attn = rng.normal(size=(2, 13, 32)).astype(np.float32) * 0.5
    qa = nq.Model.from_onnx(attn_src).quantize([x_attn], bit_width=8)
    vectors.append(("vit_self_attention_int8_qdq",
                    export_qdq(qa, attn_src),
                    named_inputs(attn_src, x_attn), 1e-4,
                    "multi-head self-attention (QKV matmuls int8 QDQ, "
                    "softmax float) -- the reference's "
                    "vit_self_attention piece"))

    # -- 7: full small ViT, int8 QDQ -----------------------------------
    vit_src = V.vit(2, 32, 8, 24, 16, 2, num_hidden_layers=2, seed=6)
    x_vit = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
    qv = nq.Model.from_onnx(vit_src).quantize([x_vit], bit_width=8)
    vectors.append(("vit_small_int8_qdq", export_qdq(qv, vit_src),
                    named_inputs(vit_src, x_vit), 2e-3,
                    "full 2-layer ViT encoder int8 QDQ (conv patch "
                    "embed + LN/GELU float, matmuls int8) -- the "
                    "reference's end-to-end small-ViT oracle shape"))

    # -- 8: broadcast-batched MatMul, int8 QDQ -------------------------
    bm_src = testgen.matmul((2, 3, 6, 8), (1, 1, 8, 5))
    a_bm = rng.normal(size=(2, 3, 6, 8)).astype(np.float32)
    b_bm = rng.normal(size=(1, 1, 8, 5)).astype(np.float32)
    qb = nq.Model.from_onnx(bm_src).quantize([a_bm, b_bm], bit_width=8)
    vectors.append(("matmul_batched_int8_qdq", export_qdq(qb, bm_src),
                    {"input_a": a_bm, "input_b": b_bm}, 1e-4,
                    "broadcast-batched MatMul with both operands "
                    "quantized (reference models/test.py:60-96 shape)"))

    # -- 9: grouped + dilated Conv (float semantics) -------------------
    gc = GraphBuilder("grouped_conv")
    gc.input("input", [2, 4, 9, 9])
    wg = gc.init("weight",
                 rng.normal(size=(6, 2, 3, 3)).astype(np.float32))
    bg = gc.init("bias", rng.normal(size=6).astype(np.float32))
    gc.node("Conv", ["input", "weight", "bias"], out="output",
            name="conv", kernel_shape=[3, 3], pads=[1, 0, 0, 1],
            strides=[2, 1], dilations=[2, 2], group=2)
    gc.output("output", [2, 6, 3, 6])
    x_gc = rng.normal(size=(2, 4, 9, 9)).astype(np.float32)
    vectors.append(("conv_grouped_dilated", gc.model(),
                    {"input": x_gc}, 1e-4,
                    "grouped (g=2) dilated conv with asymmetric pads "
                    "and mixed strides -- the exact-im2col edge cases"))

    # -- 10/11: LSTM and GRU recurrences (float semantics) -------------
    def rnn_graph(op, gates, bgates, extra_attrs=None):
        g2 = GraphBuilder(f"{op.lower()}_vector")
        g2.input("input", [5, 3, 8])
        bound = 1.0 / np.sqrt(12)
        g2.init(f"{op}.W", rng.uniform(
            -bound, bound, size=(1, gates * 12, 8)).astype(np.float32))
        g2.init(f"{op}.R", rng.uniform(
            -bound, bound, size=(1, gates * 12, 12)).astype(np.float32))
        g2.init(f"{op}.B", rng.uniform(
            -bound, bound, size=(1, bgates * 12)).astype(np.float32))
        outs = g2.node(op, ["input", f"{op}.W", f"{op}.R", f"{op}.B"],
                       out="/rnn", n_outputs=3, hidden_size=12,
                       **(extra_attrs or {}))
        g2.node("Identity", [outs[0]], out="y_all", name="all_id")
        g2.node("Identity", [outs[1]], out="y_h", name="h_id")
        g2.output("y_all", [5, 1, 3, 12])
        g2.output("y_h", [1, 3, 12])
        return g2.model()

    x_rnn = rng.normal(size=(5, 3, 8)).astype(np.float32)
    vectors.append(("lstm_float", rnn_graph("LSTM", 4, 8),
                    {"input": x_rnn}, 1e-4,
                    "ONNX LSTM (iofc gates), full sequence + final "
                    "state outputs"))
    vectors.append(("gru_float",
                    rnn_graph("GRU", 3, 6,
                              {"linear_before_reset": 1}),
                    {"input": x_rnn}, 1e-4,
                    "ONNX GRU (zrh gates, linear_before_reset=1, the "
                    "torch export form)"))

    # -- 12: Gemm with alpha/beta (spec-correct vs reference quirk) ----
    gemm_src = testgen.gemm(6, 10, 4, 7, alpha=0.5, beta=1.5)
    x_gm = rng.normal(size=(6, 10)).astype(np.float32)
    vectors.append(("gemm_alpha_beta_float", gemm_src, {"input": x_gm},
                    1e-5,
                    "Gemm honoring alpha/beta attributes (the "
                    "reference ignores them, reference "
                    "model.py:122-131; spec-correct here)"))

    # -- 13: GPT KV-decode step graph (float semantics) ----------------
    from numpy_quant_tpu.models.gpt import gpt_decode_step
    dec = gpt_decode_step(batch_size=2, max_len=6, seed=3)
    dec_inputs = {"x_step": rng.normal(size=(2, 1, 32))
                  .astype(np.float32) * 0.3,
                  "attn_mask": np.concatenate(
                      [np.zeros((1, 1, 1, 3), np.float32),
                       np.full((1, 1, 1, 3), -1e9, np.float32),
                       np.zeros((1, 1, 1, 1), np.float32)], axis=-1)}
    for i in range(2):
        dec_inputs[f"past_k.{i}"] = rng.normal(
            size=(2, 2, 6, 16)).astype(np.float32) * 0.3
        dec_inputs[f"past_v.{i}"] = rng.normal(
            size=(2, 2, 6, 16)).astype(np.float32) * 0.3
    vectors.append(("gpt_decode_step_float", dec, dec_inputs,
                    1e-4,
                    "one KV-cache decode step (Concat-score attention "
                    "over [cache|current], Slice/context) -- the exact "
                    "subgraph DecodeAttention fuses"))
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
