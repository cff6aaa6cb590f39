"""ArgMax/ArgMin/TopK and the DITensor (device integer) domain.

Data-dependent indices cannot live in the host ITensor shape domain
(their values are unknown at trace time), so these ops return device
int32 tensors -- a third domain the reference's single int64 tensor
class conflates (reference numpy_quant/tensor.py:12-44).
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(3)


def _run(nodes, inputs, inits=(), outs=(), x=None, feeds=None):
    in_infos = [O.make_tensor_value_info(n, O.TensorProto.FLOAT, list(a.shape))
                for n, a in (feeds or {"x": x}).items()]
    out_infos = [O.make_tensor_value_info(n, O.TensorProto.FLOAT, None)
                 for n in outs]
    g = O.make_graph(list(nodes), "g", in_infos, out_infos,
                     initializer=list(inits))
    model = nq.Model.from_onnx(O.make_model(g))
    return model(list((feeds or {"x": x}).values()))


@pytest.mark.parametrize("keepdims", [0, 1])
@pytest.mark.parametrize("axis", [0, 1, -1])
def test_argmax_argmin_vs_numpy(axis, keepdims):
    x = RNG.standard_normal((4, 5, 6)).astype(np.float32)
    amax, amin = _run(
        [O.make_node("ArgMax", ["x"], ["amax"], axis=axis,
                     keepdims=keepdims),
         O.make_node("ArgMin", ["x"], ["amin"], axis=axis,
                     keepdims=keepdims)],
        None, outs=["amax", "amin"], x=x)
    dmax = np.argmax(x, axis)
    dmin = np.argmin(x, axis)
    if keepdims:
        dmax, dmin = (np.expand_dims(d, axis) for d in (dmax, dmin))
    np.testing.assert_array_equal(np.asarray(amax), dmax)
    np.testing.assert_array_equal(np.asarray(amin), dmin)


def test_argmax_select_last_index():
    x = np.array([[1.0, 3.0, 3.0, 0.0],
                  [2.0, 2.0, 1.0, 2.0]], np.float32)
    first, last = _run(
        [O.make_node("ArgMax", ["x"], ["first"], axis=1, keepdims=0),
         O.make_node("ArgMax", ["x"], ["last"], axis=1, keepdims=0,
                     select_last_index=1)],
        None, outs=["first", "last"], x=x)
    np.testing.assert_array_equal(np.asarray(first), [1, 0])
    np.testing.assert_array_equal(np.asarray(last), [2, 3])


@pytest.mark.parametrize("largest", [0, 1])
def test_topk_vs_torch(largest):
    torch = pytest.importorskip("torch")
    x = RNG.standard_normal((3, 8)).astype(np.float32)
    vals, idx = _run(
        [O.make_node("TopK", ["x", "k"], ["vals", "idx"], axis=-1,
                     largest=largest)],
        None, inits=[O.from_array(np.array([4], np.int64), "k")],
        outs=["vals", "idx"], x=x)
    tv, ti = torch.topk(torch.tensor(x), 4, dim=-1, largest=bool(largest))
    np.testing.assert_allclose(np.asarray(vals), tv.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), ti.numpy())


def test_topk_axis0_and_gather_composition():
    """TopK over axis 0, then Gather rows of a second tensor by the
    resulting DEVICE indices -- the select-then-fetch idiom."""
    x = RNG.standard_normal((6, 4)).astype(np.float32)
    table = RNG.standard_normal((6, 3)).astype(np.float32)
    vals, idx, picked = _run(
        [O.make_node("TopK", ["x", "k"], ["vals", "idx"], axis=0),
         O.make_node("Squeeze", ["idx", "one"], ["rows"]),
         O.make_node("Gather", ["x2", "rows"], ["picked"], axis=0)],
        None,
        inits=[O.from_array(np.array([1], np.int64), "k"),
               O.from_array(np.array([0], np.int64), "one")],
        outs=["vals", "idx", "picked"],
        feeds={"x": x, "x2": table})
    np.testing.assert_array_equal(np.asarray(idx)[0], np.argmax(x, 0))
    np.testing.assert_allclose(np.asarray(picked),
                               table[np.argmax(x, 0)], atol=1e-6)


def test_argmax_host_domain_stays_host():
    """Int64 (shape-domain) data through ArgMax keeps trace-time
    foldability: the result is a host ITensor, usable as Gather index
    of a host table."""
    from numpy_quant_tpu.ops.registry import onnx_operator_implementation
    from numpy_quant_tpu.tensor import ITensor

    t = ITensor(np.array([[4, 1], [2, 9]]))
    out, = onnx_operator_implementation(
        "ArgMax", [t], {"axis": 1, "keepdims": 0})
    assert isinstance(out, ITensor)
    np.testing.assert_array_equal(out.data, [0, 1])
    out, = onnx_operator_implementation(
        "ArgMin", [t], {"axis": 0, "keepdims": 1, "select_last_index": 1})
    assert isinstance(out, ITensor)
    np.testing.assert_array_equal(out.data, [[1, 0]])


def test_topk_traced_k_rejected():
    from numpy_quant_tpu.ops.registry import onnx_operator_implementation
    from numpy_quant_tpu.tensor import FTensor

    with pytest.raises(ValueError, match="graph constant"):
        onnx_operator_implementation(
            "TopK", [FTensor(np.zeros((2, 3), np.float32)),
                     FTensor(np.array([2.0], np.float32))], {})


def test_classifier_with_argmax_head_quantized():
    """End-to-end: ResNet + ArgMax label head, float AND int8 executor
    (the DITensor output must flow through QModel finalization)."""
    from numpy_quant_tpu.models import cnn

    m = cnn.resnet_classifier(batch=8, image_size=16, widths=(8,))
    # append an ArgMax head onto the exported graph
    m.graph.node.append(O.make_node("ArgMax", ["logits"], ["label"],
                                    axis=1, keepdims=0))
    m.graph.output.append(
        O.make_tensor_value_info("label", O.TensorProto.INT64, None))
    x = RNG.standard_normal((8, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    logits, labels = model([x])
    np.testing.assert_array_equal(np.asarray(labels),
                                  np.asarray(logits).argmax(1))

    model.fold_batchnorm()
    q = model.quantize([x], bit_width=8)
    qlogits, qlabels = q([x])
    np.testing.assert_array_equal(np.asarray(qlabels),
                                  np.asarray(qlogits).argmax(1))
