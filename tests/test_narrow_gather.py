"""QModel.narrow_gather: dead-token elimination.

Hoists a scalar token-axis Gather (the ViT CLS pick, reference
models/vit.py:40-66 exports ``hidden[:, 0]``) backward through
per-token ops so the last encoder layer's MLP/out-projection and the
final LayerNorm compute one token instead of all of them. The pass is
value-preserving: the surviving token sees the same op sequence on the
same numbers, so quantized outputs are BIT-equal with/without it.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O
from numpy_quant_tpu.models import vit as V

RNG = np.random.default_rng(7)


def _small_classifier():
    from transformers import ViTConfig
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=24,
                    num_attention_heads=4, intermediate_size=64,
                    num_hidden_layers=2, num_labels=10)
    m = V.vit_image_classifier(config=cfg, batch_size=None)
    nq.onnx.make_dim_param_fixed(m.graph, "B", 8)
    return m


def test_narrow_gather_bit_exact_vit_classifier():
    m = _small_classifier()
    model = nq.Model.from_onnx(m)
    x = RNG.normal(size=(8, 3, 32, 32)).astype(np.float32)
    qmodel = model.quantize([x], bit_width=8)
    base = qmodel([x])[0]

    report = qmodel.optimize()
    # the whole per-token tail hoists: final LN, residual2, fc2(+bias),
    # FusedGelu, fc1(+bias), ln_after, residual1, out-proj(+bias) = 11
    assert report["narrow_gather"] >= 10
    opt = qmodel([x])[0]
    np.testing.assert_array_equal(opt, base)

    # the classifier tail really is narrow now: no Gather remains
    # between the final LayerNorm and the Gemm head
    tail_ops = [n.op for n in qmodel.nodes[-3:]]
    assert tail_ops == ["LayerNormalization", "Gemm", "Identity"]


def test_narrow_gather_through_fused_attention():
    """The hoist passes the LAST layer's FusedAttentionHS via its q
    input (each output row depends on its own q row and all of K/V) and
    continues up the q-projection chain, so the last layer's
    score/context kernel and q projection run ONE query row. Bit-exact
    vs the unoptimized executor."""
    m = _small_classifier()
    model = nq.Model.from_onnx(m)
    x = RNG.normal(size=(8, 3, 32, 32)).astype(np.float32)
    qmodel = model.quantize([x], bit_width=8)
    base = qmodel([x])[0]

    report = qmodel.optimize()
    # ... the previous 11 hoists + attention + q-proj Add + q-proj MatMul
    assert report["narrow_gather"] >= 14
    att_q = [nd.inputs[0] for nd in qmodel.nodes
             if nd.op == "FusedAttentionHS"]
    narrow = [v for v in att_q if v.name.endswith("/narrowed")]
    assert len(narrow) == 1  # exactly the last layer's attention
    np.testing.assert_array_equal(qmodel([x])[0], base)


def test_narrow_gather_batch_shape_generic():
    """The narrowed graph was traced at a pinned batch; other batch
    sizes still run and agree with the unoptimized executor."""
    m = _small_classifier()
    x8 = RNG.normal(size=(8, 3, 32, 32)).astype(np.float32)
    x3 = RNG.normal(size=(3, 3, 32, 32)).astype(np.float32)

    q_plain = nq.Model.from_onnx(m).quantize([x8], bit_width=8)
    base = q_plain([x3])[0]

    q_opt = nq.Model.from_onnx(m).quantize([x8], bit_width=8)
    q_opt.optimize()
    np.testing.assert_array_equal(q_opt([x3])[0], base)


def _gather_head_model(full_output: bool):
    """x[4,6,8] -> MatMul(w) -> Add(b) -> h; head = Gather(h, 0, axis=1)
    -> Gemm. ``full_output=True`` additionally exposes h as a graph
    output, which must stop the hoist (h is consumed full-width)."""
    x = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [4, 6, 8])
    w = O.from_array(RNG.normal(size=(8, 8)).astype(np.float32), "w")
    b = O.from_array(RNG.normal(size=8).astype(np.float32), "b")
    cw = O.from_array(RNG.normal(size=(8, 5)).astype(np.float32), "cw")
    cb = O.from_array(RNG.normal(size=5).astype(np.float32), "cb")
    i0 = O.from_array(np.array(0, dtype=np.int64), "i0")
    nodes = [
        O.make_node("MatMul", ["x", "w"], ["mm"], name="mm"),
        O.make_node("Add", ["mm", "b"], ["h"], name="add"),
        O.make_node("Gather", ["h", "i0"], ["cls"], name="pick", axis=1),
        O.make_node("Gemm", ["cls", "cw", "cb"], ["logits"], name="head"),
    ]
    outs = [O.make_tensor_value_info("logits", O.TensorProto.FLOAT, [4, 5])]
    if full_output:
        outs.append(O.make_tensor_value_info("h", O.TensorProto.FLOAT,
                                             [4, 6, 8]))
    graph = O.make_graph(nodes, "g", [x], outs,
                         initializer=[w, b, cw, cb, i0])
    return O.make_model(graph)


def test_narrow_gather_hoists_plain_chain():
    m = _gather_head_model(full_output=False)
    x = RNG.normal(size=(4, 6, 8)).astype(np.float32)
    qmodel = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    base = qmodel([x])[0]
    # hoists through Add(bias) then MatMul; the Gather lands on x itself
    assert qmodel.narrow_gather() == 2
    assert [n.op for n in qmodel.nodes] == \
        ["Gather", "MatMul", "Add", "Gemm"]
    np.testing.assert_array_equal(qmodel([x])[0], base)


def test_narrow_gather_stops_at_full_width_consumer():
    m = _gather_head_model(full_output=True)
    x = RNG.normal(size=(4, 6, 8)).astype(np.float32)
    qmodel = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    base = qmodel([x])
    # h is a graph output: consumed full-width, nothing may hoist
    assert qmodel.narrow_gather() == 0
    opt = qmodel([x])
    for o, bs in zip(opt, base):
        np.testing.assert_array_equal(o, bs)


def test_narrow_gather_requires_shape_hints():
    """Models whose inputs carry no ValueInfo shapes skip the pass
    instead of guessing ranks."""
    m = _gather_head_model(full_output=False)
    x = RNG.normal(size=(4, 6, 8)).astype(np.float32)
    qmodel = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    for v in qmodel.inputs:
        v.shape_hint = None
    assert qmodel.narrow_gather() == 0
