"""Elementwise math, comparison/logical, extra reductions, GatherND/
ScatterND and DepthToSpace/SpaceToDepth against numpy/torch oracles.

These widen the op registry beyond the reference's 26-op set
(reference: numpy_quant/model.py:65-213); each op follows the same
domain rules as the core set: host ITensor folds at trace time,
device data stays FTensor/DITensor.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(23)


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


def _run(nodes, feeds, inits=(), outs=()):
    model = _model(nodes, feeds, inits=inits, outs=outs)
    return dict(zip(outs, model(list(feeds.values()))))


def test_unary_float_math_vs_numpy():
    # clip into (-1, 1) so Asin/Acos/Atanh stay in-domain
    x = np.clip(RNG.standard_normal((3, 5)) * 0.8, -0.95, 0.95) \
        .astype(np.float32)
    xp = np.abs(x) + 0.1  # strictly positive for Log/Reciprocal
    names_x = ["Exp", "Sin", "Cos", "Tan", "Asin", "Acos", "Atan",
               "Sinh", "Cosh", "Asinh", "Atanh", "Floor", "Ceil",
               "Round", "Sign"]
    names_xp = ["Log", "Reciprocal"]
    nodes = [O.make_node(op, ["x"], [op.lower()]) for op in names_x]
    nodes += [O.make_node(op, ["xp"], [op.lower()]) for op in names_xp]
    outs = [op.lower() for op in names_x + names_xp]
    got = _run(nodes, {"x": x, "xp": xp}, outs=outs)
    want = {
        "exp": np.exp(x), "sin": np.sin(x), "cos": np.cos(x),
        "tan": np.tan(x), "asin": np.arcsin(x), "acos": np.arccos(x),
        "atan": np.arctan(x), "sinh": np.sinh(x), "cosh": np.cosh(x),
        "asinh": np.arcsinh(x), "atanh": np.arctanh(x),
        "floor": np.floor(x), "ceil": np.ceil(x),
        "round": np.round(x),  # numpy round = half-to-even, like ONNX
        "sign": np.sign(x),
        "log": np.log(xp), "reciprocal": 1.0 / xp,
    }
    for name in outs:
        np.testing.assert_allclose(np.asarray(got[name]), want[name],
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_acosh_domain():
    x = (np.abs(RNG.standard_normal((4,))) + 1.0).astype(np.float32)
    got = _run([O.make_node("Acosh", ["x"], ["y"])], {"x": x}, outs=["y"])
    np.testing.assert_allclose(np.asarray(got["y"]), np.arccosh(x),
                               rtol=1e-5, atol=1e-6)


def test_round_half_to_even():
    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5, 2.675], np.float32)
    got = _run([O.make_node("Round", ["x"], ["y"])], {"x": x}, outs=["y"])
    np.testing.assert_array_equal(np.asarray(got["y"]),
                                  [0.0, 2.0, 2.0, -0.0, -2.0, 3.0])


def test_comparisons_device_float():
    a = RNG.standard_normal((4, 5)).astype(np.float32)
    b = RNG.standard_normal((4, 5)).astype(np.float32)
    b[1, :] = a[1, :]  # exercise the equality boundary
    nodes = [
        O.make_node("Greater", ["a", "b"], ["gt"]),
        O.make_node("Less", ["a", "b"], ["lt"]),
        O.make_node("GreaterOrEqual", ["a", "b"], ["ge"]),
        O.make_node("LessOrEqual", ["a", "b"], ["le"]),
    ]
    got = _run(nodes, {"a": a, "b": b}, outs=["gt", "lt", "ge", "le"])
    np.testing.assert_array_equal(np.asarray(got["gt"]), (a > b).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(got["lt"]), (a < b).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(got["ge"]), (a >= b).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(got["le"]), (a <= b).astype(np.int32))


def test_comparisons_host_fold():
    """int64 graph inputs live in the host shape domain; comparisons on
    them must stay host so downstream Reshape/Expand can fold."""
    a = np.array([1, 5, 3], np.int64)
    b = np.array([2, 5, 1], np.int64)
    got = _run([O.make_node("Greater", ["a", "b"], ["gt"]),
                O.make_node("LessOrEqual", ["a", "b"], ["le"])],
               {"a": a, "b": b}, outs=["gt", "le"])
    np.testing.assert_array_equal(np.asarray(got["gt"]), [0, 0, 1])
    np.testing.assert_array_equal(np.asarray(got["le"]), [1, 1, 0])


def test_logical_ops_both_domains():
    a = np.array([0, 1, 1, 0], np.int64)
    b = np.array([0, 0, 1, 1], np.int64)
    nodes = [
        O.make_node("And", ["a", "b"], ["and_"]),
        O.make_node("Or", ["a", "b"], ["or_"]),
        O.make_node("Xor", ["a", "b"], ["xor_"]),
        O.make_node("Not", ["a"], ["not_"]),
    ]
    got = _run(nodes, {"a": a, "b": b},
               outs=["and_", "or_", "xor_", "not_"])
    np.testing.assert_array_equal(np.asarray(got["and_"]), [0, 0, 1, 0])
    np.testing.assert_array_equal(np.asarray(got["or_"]), [0, 1, 1, 1])
    np.testing.assert_array_equal(np.asarray(got["xor_"]), [0, 1, 0, 1])
    np.testing.assert_array_equal(np.asarray(got["not_"]), [1, 0, 0, 1])


def test_comparison_feeds_where():
    """Greater (device DITensor) as the Where condition -- the composed
    masking idiom (e.g. thresholded outputs)."""
    x = RNG.standard_normal((3, 4)).astype(np.float32)
    zeros = np.zeros((3, 4), np.float32)
    nodes = [
        O.make_node("Greater", ["x", "zero"], ["mask"]),
        O.make_node("Where", ["mask", "x", "zero"], ["y"]),
    ]
    got = _run(nodes, {"x": x},
               inits=[O.from_array(zeros, "zero")], outs=["y"])
    np.testing.assert_allclose(np.asarray(got["y"]), np.maximum(x, 0.0))


def test_isnan_isinf():
    x = np.array([1.0, np.nan, np.inf, -np.inf, 0.0], np.float32)
    nodes = [
        O.make_node("IsNaN", ["x"], ["nan"]),
        O.make_node("IsInf", ["x"], ["inf"]),
        O.make_node("IsInf", ["x"], ["posinf"], detect_negative=0),
        O.make_node("IsInf", ["x"], ["neginf"], detect_positive=0),
    ]
    got = _run(nodes, {"x": x}, outs=["nan", "inf", "posinf", "neginf"])
    np.testing.assert_array_equal(np.asarray(got["nan"]), [0, 1, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(got["inf"]), [0, 0, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(got["posinf"]), [0, 0, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(got["neginf"]), [0, 0, 0, 1, 0])


def test_mod_int_and_fmod_float():
    a = np.array([5, -5, 7, -7], np.int64)
    b = np.array([3, 3, -4, -4], np.int64)
    got = _run([O.make_node("Mod", ["a", "b"], ["m"])],
               {"a": a, "b": b}, outs=["m"])
    np.testing.assert_array_equal(np.asarray(got["m"]), np.mod(a, b))

    af = np.array([5.1, -5.1, 7.5], np.float32)
    bf = np.array([3.0, 3.0, -4.0], np.float32)
    got = _run([O.make_node("Mod", ["a", "b"], ["m"], fmod=1)],
               {"a": af, "b": bf}, outs=["m"])
    np.testing.assert_allclose(np.asarray(got["m"]), np.fmod(af, bf),
                               rtol=1e-6)


def test_logsoftmax_vs_torch():
    torch = pytest.importorskip("torch")
    x = RNG.standard_normal((4, 9)).astype(np.float32)
    got = _run([O.make_node("LogSoftmax", ["x"], ["y"], axis=-1)],
               {"x": x}, outs=["y"])
    want = torch.nn.functional.log_softmax(torch.tensor(x), dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(got["y"]), want,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("keepdims", [0, 1])
def test_extra_reductions_vs_numpy(keepdims):
    x = (np.abs(RNG.standard_normal((3, 4, 5))) + 0.1).astype(np.float32)
    ops = ["ReduceProd", "ReduceL1", "ReduceL2", "ReduceSumSquare",
           "ReduceLogSum", "ReduceLogSumExp"]
    nodes = [O.make_node(op, ["x"], [op.lower()], axes=[1],
                         keepdims=keepdims) for op in ops]
    got = _run(nodes, {"x": x}, outs=[op.lower() for op in ops])
    kd = bool(keepdims)
    want = {
        "reduceprod": np.prod(x, axis=1, keepdims=kd),
        "reducel1": np.sum(np.abs(x), axis=1, keepdims=kd),
        "reducel2": np.sqrt(np.sum(x * x, axis=1, keepdims=kd)),
        "reducesumsquare": np.sum(x * x, axis=1, keepdims=kd),
        "reducelogsum": np.log(np.sum(x, axis=1, keepdims=kd)),
        "reducelogsumexp": np.log(np.sum(np.exp(x.astype(np.float64)),
                                         axis=1, keepdims=kd)),
    }
    for name, w in want.items():
        np.testing.assert_allclose(np.asarray(got[name]), w,
                                   rtol=2e-4, atol=1e-5, err_msg=name)


def test_extra_reductions_axes_input():
    """Opset 18 form: axes as a second input instead of an attribute."""
    x = (np.abs(RNG.standard_normal((2, 3, 4))) + 0.1).astype(np.float32)
    axes = np.array([0, 2], np.int64)
    got = _run([O.make_node("ReduceL2", ["x", "axes"], ["y"], keepdims=0)],
               {"x": x}, inits=[O.from_array(axes, "axes")], outs=["y"])
    np.testing.assert_allclose(
        np.asarray(got["y"]), np.sqrt(np.sum(x * x, axis=(0, 2))),
        rtol=1e-5)


def test_reduceprod_host_fold():
    """ReduceProd over an int64 Shape output = element count -- a real
    shape-domain chain that must stay host for trace-time folding."""
    x = RNG.standard_normal((2, 3, 4)).astype(np.float32)
    nodes = [
        O.make_node("Shape", ["x"], ["shape"]),
        O.make_node("ReduceProd", ["shape"], ["numel"], axes=[0],
                    keepdims=1),
        O.make_node("Reshape", ["x", "numel"], ["flat"]),
    ]
    got = _run(nodes, {"x": x}, outs=["flat"])
    np.testing.assert_allclose(np.asarray(got["flat"]), x.reshape(-1))


def test_gather_nd_spec_examples():
    """The four examples from the ONNX GatherND spec."""
    # Example 1: batch_dims=0, scalar-per-tuple output
    data = np.array([[0, 1], [2, 3]], np.int64)
    idx = np.array([[0, 0], [1, 1]], np.int64)
    got = _run([O.make_node("GatherND", ["d", "i"], ["y"])],
               {"d": data, "i": idx}, outs=["y"])
    np.testing.assert_array_equal(np.asarray(got["y"]), [0, 3])

    # Example 2: slices
    idx = np.array([[1], [0]], np.int64)
    got = _run([O.make_node("GatherND", ["d", "i"], ["y"])],
               {"d": data, "i": idx}, outs=["y"])
    np.testing.assert_array_equal(np.asarray(got["y"]), [[2, 3], [0, 1]])

    # Example 3: 3-D data
    data3 = np.array([[[0, 1], [2, 3]], [[4, 5], [6, 7]]], np.int64)
    idx = np.array([[0, 1], [1, 0]], np.int64)
    got = _run([O.make_node("GatherND", ["d", "i"], ["y"])],
               {"d": data3, "i": idx}, outs=["y"])
    np.testing.assert_array_equal(np.asarray(got["y"]), [[2, 3], [4, 5]])

    # Example 5: batch_dims=1
    idx = np.array([[1], [0]], np.int64)
    got = _run([O.make_node("GatherND", ["d", "i"], ["y"], batch_dims=1)],
               {"d": data3, "i": idx}, outs=["y"])
    np.testing.assert_array_equal(np.asarray(got["y"]), [[2, 3], [4, 5]])


def test_gather_nd_float_device():
    data = RNG.standard_normal((4, 5, 6)).astype(np.float32)
    idx = np.array([[0, 1], [3, 4], [2, 0]], np.int64)
    got = _run([O.make_node("GatherND", ["d", "i"], ["y"])],
               {"d": data, "i": idx},
               outs=["y"])
    np.testing.assert_allclose(np.asarray(got["y"]),
                               data[idx[:, 0], idx[:, 1]])


def test_scatter_nd_set_and_add():
    data = np.zeros((4, 3), np.float32)
    idx = np.array([[1], [3]], np.int64)
    upd = RNG.standard_normal((2, 3)).astype(np.float32)
    got = _run([O.make_node("ScatterND", ["d", "i", "u"], ["y"])],
               {"d": data, "u": upd},
               inits=[O.from_array(idx, "i")], outs=["y"])
    want = data.copy()
    want[[1, 3]] = upd
    np.testing.assert_allclose(np.asarray(got["y"]), want)

    base = np.ones((4, 3), np.float32)
    got = _run([O.make_node("ScatterND", ["d", "i", "u"], ["y"],
                            reduction="add")],
               {"d": base, "u": upd},
               inits=[O.from_array(idx, "i")], outs=["y"])
    want = base.copy()
    want[[1, 3]] += upd
    np.testing.assert_allclose(np.asarray(got["y"]), want, rtol=1e-6)


def test_scatter_nd_host_int():
    data = np.arange(8, dtype=np.int64)
    idx = np.array([[4], [3], [1], [7]], np.int64)
    upd = np.array([9, 10, 11, 12], np.int64)
    got = _run([O.make_node("ScatterND", ["d", "i", "u"], ["y"])],
               {"d": data, "i": idx, "u": upd}, outs=["y"])
    np.testing.assert_array_equal(np.asarray(got["y"]),
                                  [0, 11, 2, 10, 9, 5, 6, 12])


def test_depth_to_space_crd_matches_torch_pixel_shuffle():
    torch = pytest.importorskip("torch")
    x = RNG.standard_normal((2, 12, 3, 5)).astype(np.float32)
    got = _run([O.make_node("DepthToSpace", ["x"], ["y"], blocksize=2,
                            mode="CRD")], {"x": x}, outs=["y"])
    want = torch.pixel_shuffle(torch.tensor(x), 2).numpy()
    np.testing.assert_allclose(np.asarray(got["y"]), want)


def test_depth_to_space_dcr_and_space_to_depth_roundtrip():
    x = RNG.standard_normal((2, 8, 4, 6)).astype(np.float32)
    got = _run([O.make_node("DepthToSpace", ["x"], ["y"], blocksize=2)],
               {"x": x}, outs=["y"])
    n, c, h, w = x.shape
    want = x.reshape(n, 2, 2, c // 4, h, w).transpose(0, 3, 4, 1, 5, 2) \
        .reshape(n, c // 4, h * 2, w * 2)
    np.testing.assert_allclose(np.asarray(got["y"]), want)

    # SpaceToDepth inverts DepthToSpace(DCR)
    rt = _run([O.make_node("DepthToSpace", ["x"], ["y"], blocksize=2),
               O.make_node("SpaceToDepth", ["y"], ["z"], blocksize=2)],
              {"x": x}, outs=["z"])
    np.testing.assert_allclose(np.asarray(rt["z"]), x)


def test_new_ops_fold_under_jit():
    """The host-domain paths must fold at trace time: a jitted forward
    over a graph whose shape math uses the new ops compiles and runs."""
    x = RNG.standard_normal((2, 3, 4)).astype(np.float32)
    nodes = [
        O.make_node("Shape", ["x"], ["shape"]),
        O.make_node("ReduceProd", ["shape"], ["numel"], axes=[0],
                    keepdims=1),
        O.make_node("Reshape", ["x", "numel"], ["flat"]),
        O.make_node("Exp", ["flat"], ["y"]),
    ]
    model = _model(nodes, {"x": x}, outs=["y"])
    out1 = model([x])[0]
    out2 = model([x])[0]  # second call hits the jit cache
    np.testing.assert_allclose(np.asarray(out1), np.exp(x.reshape(-1)),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
