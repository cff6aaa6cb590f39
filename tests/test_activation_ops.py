"""Activation op batch (LeakyRelu/Elu/Selu/Softplus/Softsign/
HardSigmoid/HardSwish/Mish/PRelu) and utility ops (Tile/Range/CumSum/
Trilu/OneHot/Einsum) against torch/numpy oracles, in both tensor
domains where applicable."""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(11)


def _model(nodes, feeds, inits=(), outs=()):
    in_infos = [O.make_tensor_value_info(
        n, O.TensorProto.FLOAT if a.dtype == np.float32
        else O.TensorProto.INT64, list(a.shape))
        for n, a in feeds.items()]
    out_infos = [O.make_tensor_value_info(n, O.TensorProto.FLOAT, None)
                 for n in outs]
    g = O.make_graph(list(nodes), "g", in_infos, out_infos,
                     initializer=list(inits))
    return nq.Model.from_onnx(O.make_model(g))


def test_activations_vs_torch():
    torch = pytest.importorskip("torch")
    x = (RNG.standard_normal((3, 7)) * 2).astype(np.float32)
    slope = np.abs(RNG.standard_normal(7)).astype(np.float32)
    nodes = [
        O.make_node("LeakyRelu", ["x"], ["leaky"], alpha=0.05),
        O.make_node("Elu", ["x"], ["elu"], alpha=0.7),
        O.make_node("Selu", ["x"], ["selu"]),
        O.make_node("Softplus", ["x"], ["softplus"]),
        O.make_node("Softsign", ["x"], ["softsign"]),
        O.make_node("HardSigmoid", ["x"], ["hardsig"],
                    alpha=1 / 6, beta=0.5),
        O.make_node("HardSwish", ["x"], ["hardswish"]),
        O.make_node("Mish", ["x"], ["mish"]),
        O.make_node("PRelu", ["x", "slope"], ["prelu"]),
    ]
    names = ["leaky", "elu", "selu", "softplus", "softsign", "hardsig",
             "hardswish", "mish", "prelu"]
    model = _model(nodes, {"x": x},
                   inits=[O.from_array(slope, "slope")], outs=names)
    got = dict(zip(names, model([x])))

    t = torch.tensor(x)
    F = torch.nn.functional
    want = {
        "leaky": F.leaky_relu(t, 0.05),
        "elu": F.elu(t, 0.7),
        "selu": F.selu(t),
        "softplus": F.softplus(t),
        "softsign": F.softsign(t),
        "hardsig": F.hardsigmoid(t),
        "hardswish": F.hardswish(t),
        "mish": F.mish(t),
        "prelu": F.prelu(t, torch.tensor(slope)),
    }
    for name in names:
        np.testing.assert_allclose(np.asarray(got[name]),
                                   want[name].numpy(), atol=1e-5,
                                   err_msg=name)


def test_tile_range_cumsum_float():
    x = RNG.standard_normal((2, 3)).astype(np.float32)
    nodes = [
        O.make_node("Tile", ["x", "reps"], ["tiled"]),
        O.make_node("CumSum", ["x", "ax1"], ["csum"]),
        O.make_node("CumSum", ["x", "ax1"], ["csum_er"], exclusive=1,
                    reverse=1),
        O.make_node("Range", ["r0", "r1", "r2"], ["rng"]),
    ]
    inits = [O.from_array(np.array([2, 3], np.int64), "reps"),
             O.from_array(np.array(1, np.int64), "ax1"),
             O.from_array(np.array(1.0, np.float32), "r0"),
             O.from_array(np.array(5.5, np.float32), "r1"),
             O.from_array(np.array(1.5, np.float32), "r2")]
    model = _model(nodes, {"x": x}, inits=inits,
                   outs=["tiled", "csum", "csum_er", "rng"])
    tiled, csum, csum_er, rng = model([x])
    np.testing.assert_array_equal(np.asarray(tiled), np.tile(x, (2, 3)))
    np.testing.assert_allclose(np.asarray(csum), np.cumsum(x, 1),
                               rtol=1e-6)
    # exclusive+reverse: y_i = sum_{j>i} x_j
    want = np.flip(np.cumsum(np.flip(x, 1), 1), 1) - x
    np.testing.assert_allclose(np.asarray(csum_er), want, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(rng),
                               np.arange(1.0, 5.5, 1.5, dtype=np.float32))


def test_host_domain_tile_range_cumsum_trilu_onehot():
    """Shape-domain (int64) data stays host/foldable through the new
    utility ops."""
    from numpy_quant_tpu.ops.registry import onnx_operator_implementation
    from numpy_quant_tpu.tensor import FTensor, ITensor

    it = ITensor(np.array([[1, 2], [3, 4]]))
    out, = onnx_operator_implementation(
        "Tile", [it, ITensor(np.array([2, 1]))], {})
    assert isinstance(out, ITensor)
    np.testing.assert_array_equal(out.data, np.tile(it.data, (2, 1)))

    out, = onnx_operator_implementation(
        "Range", [ITensor(np.array(2)), ITensor(np.array(9)),
                  ITensor(np.array(3))], {})
    assert isinstance(out, ITensor)
    np.testing.assert_array_equal(out.data, [2, 5, 8])

    out, = onnx_operator_implementation(
        "CumSum", [it, ITensor(np.array(0))], {})
    assert isinstance(out, ITensor)
    np.testing.assert_array_equal(out.data, [[1, 2], [4, 6]])

    out, = onnx_operator_implementation(
        "Trilu", [it, ITensor(np.array(0))], {"upper": 1})
    assert isinstance(out, ITensor)
    np.testing.assert_array_equal(out.data, np.triu(it.data))

    out, = onnx_operator_implementation(
        "OneHot", [ITensor(np.array([0, 2, -1])), ITensor(np.array(3)),
                   ITensor(np.array([0, 1]))], {"axis": -1})
    assert isinstance(out, ITensor)
    np.testing.assert_array_equal(out.data, np.eye(3, dtype=np.int64)
                                  [[0, 2, 2]])

    # float values -> FTensor even for host indices
    out, = onnx_operator_implementation(
        "OneHot", [ITensor(np.array([1])), ITensor(np.array(2)),
                   FTensor(np.array([-1.0, 7.0], np.float32))], {})
    assert isinstance(out, FTensor)
    np.testing.assert_allclose(np.asarray(out.data), [[-1.0, 7.0]])


def test_trilu_float_and_onehot_device_axis0():
    x = RNG.standard_normal((4, 4)).astype(np.float32)
    nodes = [
        O.make_node("Trilu", ["x"], ["up"], upper=1),
        O.make_node("Trilu", ["x", "km1"], ["lo"], upper=0),
        O.make_node("ArgMax", ["x"], ["ids"], axis=1, keepdims=0),
        O.make_node("OneHot", ["ids", "depth", "vals"], ["oh"], axis=0),
    ]
    inits = [O.from_array(np.array(-1, np.int64), "km1"),
             O.from_array(np.array(4, np.int64), "depth"),
             O.from_array(np.array([0.0, 1.0], np.float32), "vals")]
    model = _model(nodes, {"x": x}, inits=inits, outs=["up", "lo", "oh"])
    up, lo, oh = model([x])
    np.testing.assert_array_equal(np.asarray(up), np.triu(x))
    np.testing.assert_array_equal(np.asarray(lo), np.tril(x, -1))
    ids = x.argmax(1)
    want = np.zeros((4, 4), np.float32)
    want[ids, np.arange(4)] = 1.0  # axis=0: one-hot axis moved to front
    np.testing.assert_array_equal(np.asarray(oh), want)


def test_einsum_vs_numpy():
    a = RNG.standard_normal((3, 4, 5)).astype(np.float32)
    b = RNG.standard_normal((5, 6)).astype(np.float32)
    nodes = [O.make_node("Einsum", ["a", "b"], ["y"],
                         equation="bij,jk->bik"),
             O.make_node("Einsum", ["a"], ["tr"], equation="bij->bji")]
    model = _model(nodes, {"a": a, "b": b}, outs=["y", "tr"])
    y, tr = model([a, b])
    np.testing.assert_allclose(np.asarray(y),
                               np.einsum("bij,jk->bik", a, b),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(tr), a.transpose(0, 2, 1),
                               atol=1e-6)
