"""Second op-widening batch: variadic Sum/Mean, GlobalMaxPool, Hardmax,
Shrink/ThresholdedRelu/Celu, EyeLike/CastLike, host-domain
NonZero/Compress/Unique, Bit ops, LpNormalization, ReverseSequence.
Same domain rules as the core set (host ITensor folds at trace time).
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(47)
F = O.TensorProto.FLOAT
I64 = O.TensorProto.INT64


def _run(nodes, feeds, inits=(), outs=()):
    in_infos = [O.make_tensor_value_info(
        n, F if a.dtype == np.float32 else I64, list(a.shape))
        for n, a in feeds.items()]
    out_infos = [O.make_tensor_value_info(n, F, None) for n in outs]
    g = O.make_graph(list(nodes), "g", in_infos, out_infos,
                     initializer=list(inits))
    model = nq.Model.from_onnx(O.make_model(g))
    return dict(zip(outs, model(list(feeds.values()))))


def test_sum_mean_variadic():
    a = RNG.normal(size=(3, 4)).astype(np.float32)
    b = RNG.normal(size=(3, 4)).astype(np.float32)
    c = RNG.normal(size=(1, 4)).astype(np.float32)  # broadcasts
    got = _run([O.make_node("Sum", ["a", "b", "c"], ["s"]),
                O.make_node("Mean", ["a", "b", "c"], ["m"])],
               {"a": a, "b": b, "c": c}, outs=["s", "m"])
    np.testing.assert_allclose(np.asarray(got["s"]), a + b + c, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["m"]), (a + b + c) / 3,
                               rtol=1e-6)


def test_global_max_pool():
    x = RNG.normal(size=(2, 3, 5, 7)).astype(np.float32)
    got = _run([O.make_node("GlobalMaxPool", ["x"], ["y"])], {"x": x},
               outs=["y"])
    np.testing.assert_allclose(np.asarray(got["y"]),
                               x.max(axis=(2, 3), keepdims=True))


def test_hardmax():
    x = RNG.normal(size=(4, 6)).astype(np.float32)
    got = _run([O.make_node("Hardmax", ["x"], ["y"], axis=-1)], {"x": x},
               outs=["y"])
    want = np.zeros_like(x)
    want[np.arange(4), x.argmax(-1)] = 1.0
    np.testing.assert_array_equal(np.asarray(got["y"]), want)


def test_shrink_thresholded_celu_vs_torch():
    torch = pytest.importorskip("torch")
    x = (RNG.normal(size=(3, 7)) * 2).astype(np.float32)
    nodes = [
        O.make_node("Shrink", ["x"], ["hard"], lambd=0.5, bias=0.0),
        O.make_node("Shrink", ["x"], ["soft"], lambd=0.5, bias=0.5),
        O.make_node("ThresholdedRelu", ["x"], ["thr"], alpha=1.0),
        O.make_node("Celu", ["x"], ["celu"], alpha=1.3),
    ]
    got = _run(nodes, {"x": x}, outs=["hard", "soft", "thr", "celu"])
    tx = torch.tensor(x)
    np.testing.assert_allclose(np.asarray(got["hard"]),
                               torch.nn.functional.hardshrink(tx, 0.5))
    np.testing.assert_allclose(np.asarray(got["soft"]),
                               torch.nn.functional.softshrink(tx, 0.5))
    np.testing.assert_allclose(np.asarray(got["thr"]),
                               torch.nn.functional.threshold(tx, 1.0, 0.0))
    np.testing.assert_allclose(np.asarray(got["celu"]),
                               torch.nn.functional.celu(tx, 1.3),
                               rtol=1e-5, atol=1e-6)


def test_eyelike_and_castlike():
    x = RNG.normal(size=(3, 5)).astype(np.float32)
    ref_i = np.array([1, 2], np.int64)
    nodes = [
        O.make_node("EyeLike", ["x"], ["eye"]),
        O.make_node("EyeLike", ["x"], ["eye_k"], k=1),
        O.make_node("CastLike", ["xi", "x"], ["as_f"]),
    ]
    got = _run(nodes, {"x": x, "xi": ref_i}, outs=["eye", "eye_k", "as_f"])
    np.testing.assert_array_equal(np.asarray(got["eye"]), np.eye(3, 5))
    np.testing.assert_array_equal(np.asarray(got["eye_k"]),
                                  np.eye(3, 5, k=1))
    as_f = np.asarray(got["as_f"])
    assert as_f.dtype == np.float32
    np.testing.assert_array_equal(as_f, [1.0, 2.0])


def test_nonzero_compress_host_chain():
    """NonZero/Compress fold on the host so downstream shape math (and
    a static device gather) still trace."""
    xi = np.array([0, 3, 0, 5, 7, 0], np.int64)
    x = RNG.normal(size=(6, 4)).astype(np.float32)
    nodes = [
        O.make_node("NonZero", ["xi"], ["nz"]),
        O.make_node("Compress", ["x", "cond"], ["picked"], axis=0),
    ]
    got = _run(nodes, {"xi": xi, "x": x},
               inits=[O.from_array((xi != 0).astype(np.int64), "cond")],
               outs=["nz", "picked"])
    np.testing.assert_array_equal(np.asarray(got["nz"]), [[1, 3, 4]])
    np.testing.assert_allclose(np.asarray(got["picked"]), x[[1, 3, 4]])


def test_unique_sorted_and_first_occurrence():
    xi = np.array([2, 1, 1, 3, 4, 3], np.int64)
    got = _run([O.make_node("Unique", ["xi"], ["y", "idx", "inv", "cnt"],
                            sorted=1)],
               {"xi": xi}, outs=["y", "idx", "inv", "cnt"])
    y, idx, inv, cnt = (np.asarray(got[k]) for k in
                        ("y", "idx", "inv", "cnt"))
    np.testing.assert_array_equal(y, [1, 2, 3, 4])
    np.testing.assert_array_equal(cnt, [2, 1, 2, 1])
    np.testing.assert_array_equal(y[inv], xi)
    np.testing.assert_array_equal(xi[idx], y)

    got = _run([O.make_node("Unique", ["xi"], ["y", "idx", "inv", "cnt"],
                            sorted=0)],
               {"xi": xi}, outs=["y", "idx", "inv", "cnt"])
    y, idx, inv, cnt = (np.asarray(got[k]) for k in
                        ("y", "idx", "inv", "cnt"))
    np.testing.assert_array_equal(y, [2, 1, 3, 4])  # first occurrence
    np.testing.assert_array_equal(cnt, [1, 2, 2, 1])
    np.testing.assert_array_equal(y[inv], xi)


def test_bit_ops_host():
    a = np.array([0b1100, 0b1010, 7], np.int64)
    b = np.array([0b1010, 0b0110, 2], np.int64)
    nodes = [
        O.make_node("BitwiseAnd", ["a", "b"], ["and_"]),
        O.make_node("BitwiseOr", ["a", "b"], ["or_"]),
        O.make_node("BitwiseXor", ["a", "b"], ["xor_"]),
        O.make_node("BitwiseNot", ["a"], ["not_"]),
        O.make_node("BitShift", ["a", "b"], ["shl"], direction="LEFT"),
        O.make_node("BitShift", ["a", "b"], ["shr"], direction="RIGHT"),
    ]
    got = _run(nodes, {"a": a, "b": b},
               outs=["and_", "or_", "xor_", "not_", "shl", "shr"])
    np.testing.assert_array_equal(np.asarray(got["and_"]), a & b)
    np.testing.assert_array_equal(np.asarray(got["or_"]), a | b)
    np.testing.assert_array_equal(np.asarray(got["xor_"]), a ^ b)
    np.testing.assert_array_equal(np.asarray(got["not_"]), ~a)
    np.testing.assert_array_equal(np.asarray(got["shl"]), a << b)
    np.testing.assert_array_equal(np.asarray(got["shr"]), a >> b)


def test_lp_normalization():
    x = RNG.normal(size=(4, 6)).astype(np.float32)
    got = _run([O.make_node("LpNormalization", ["x"], ["l2"], axis=-1),
                O.make_node("LpNormalization", ["x"], ["l1"], axis=-1,
                            p=1)],
               {"x": x}, outs=["l2", "l1"])
    np.testing.assert_allclose(
        np.asarray(got["l2"]),
        x / np.linalg.norm(x, axis=-1, keepdims=True), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["l1"]),
        x / np.abs(x).sum(-1, keepdims=True), rtol=1e-5)


def test_reverse_sequence_both_layouts():
    # time-major [T, B, D] (the spec default axes)
    x = RNG.normal(size=(5, 3, 2)).astype(np.float32)
    lens = np.array([5, 3, 1], np.int64)
    got = _run([O.make_node("ReverseSequence", ["x", "lens"], ["y"],
                            time_axis=0, batch_axis=1)],
               {"x": x, "lens": lens}, outs=["y"])
    want = x.copy()
    for b, ln in enumerate(lens):
        want[:ln, b] = x[:ln, b][::-1]
    np.testing.assert_array_equal(np.asarray(got["y"]), want)

    # batch-major [B, T, D]
    xb = RNG.normal(size=(3, 5, 2)).astype(np.float32)
    got = _run([O.make_node("ReverseSequence", ["x", "lens"], ["y"],
                            time_axis=1, batch_axis=0)],
               {"x": xb, "lens": lens}, outs=["y"])
    want = xb.copy()
    for b, ln in enumerate(lens):
        want[b, :ln] = xb[b, :ln][::-1]
    np.testing.assert_array_equal(np.asarray(got["y"]), want)


def test_dynamic_shape_ops_reject_traced_data():
    x = RNG.normal(size=(4,)).astype(np.float32)
    with pytest.raises(ValueError, match="host-resident"):
        _run([O.make_node("NonZero", ["x"], ["y"])], {"x": x}, outs=["y"])
