"""ONNX If / Loop control flow by trace-time folding: conditions and
trip counts live in the host shape domain, so the branch choice /
unroll happens while tracing and the result is ONE static XLA program.
The reference supports neither op (ValueError at
/root/reference/numpy_quant/model.py:213); this is parity-plus.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(43)
F = O.TensorProto.FLOAT
I64 = O.TensorProto.INT64


def _model(nodes, in_infos, outs, inits=()):
    g = O.make_graph(list(nodes), "g", in_infos,
                     [O.make_tensor_value_info(n, F, None) for n in outs],
                     initializer=list(inits))
    return nq.Model.from_onnx(O.make_model(g))


def _if_graph(batch):
    """y = x*2 if x.shape[0] == 2 else x+10 -- the branch picks off
    host shape math; both branches capture outer x by name."""
    then_g = O.make_graph(
        [O.make_node("Mul", ["x", "two"], ["then_y"], name="tmul")],
        "then_g", [], [O.make_tensor_value_info("then_y", F, None)])
    else_g = O.make_graph(
        [O.make_node("Add", ["x", "ten"], ["else_y"], name="eadd")],
        "else_g", [], [O.make_tensor_value_info("else_y", F, None)])
    nodes = [
        O.make_node("Shape", ["x"], ["shape"]),
        O.make_node("Gather", ["shape", "zero"], ["b"], axis=0),
        O.make_node("Equal", ["b", "two_i"], ["cond"]),
        O.make_node("If", ["cond"], ["y"], name="if0",
                    then_branch=then_g, else_branch=else_g),
    ]
    inits = [O.from_array(np.array(0, np.int64), "zero"),
             O.from_array(np.array(2, np.int64), "two_i"),
             O.from_array(np.float32(2.0), "two"),
             O.from_array(np.float32(10.0), "ten")]
    return _model(nodes, [O.make_tensor_value_info("x", F, [batch, 3])],
                  ["y"], inits)


def test_if_folds_on_host_shape_math():
    x2 = RNG.normal(size=(2, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(_if_graph(2)([x2])[0]), x2 * 2)
    x3 = RNG.normal(size=(3, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(_if_graph(3)([x3])[0]), x3 + 10)


def test_if_jit_cache_stable():
    model = _if_graph(2)
    x = RNG.normal(size=(2, 3)).astype(np.float32)
    a = np.asarray(model([x])[0])
    b = np.asarray(model([x])[0])  # second call hits the jit cache
    np.testing.assert_array_equal(a, b)


def test_if_data_dependent_cond_rejected():
    then_g = O.make_graph(
        [O.make_node("Identity", ["x"], ["ty"], name="ti")], "then_g",
        [], [O.make_tensor_value_info("ty", F, None)])
    else_g = O.make_graph(
        [O.make_node("Neg", ["x"], ["ey"], name="en")], "else_g",
        [], [O.make_tensor_value_info("ey", F, None)])
    nodes = [
        # Greater on float data -> a traced device value, not shape math
        O.make_node("Greater", ["s", "zero_f"], ["cond"]),
        O.make_node("If", ["cond"], ["y"], then_branch=then_g,
                    else_branch=else_g),
    ]
    model = _model(nodes,
                   [O.make_tensor_value_info("x", F, [2, 2]),
                    O.make_tensor_value_info("s", F, [])],
                   ["y"], [O.from_array(np.float32(0.0), "zero_f")])
    with pytest.raises(ValueError, match="host-resident"):
        model([RNG.normal(size=(2, 2)).astype(np.float32),
               np.float32(1.5)])


def _loop_model(trip):
    """Loop body: v <- v + x (captured), scan output = v after the
    step. Runs ``trip`` iterations (host constant)."""
    body = O.make_graph(
        [O.make_node("Identity", ["cond_in"], ["cond_out"], name="ci"),
         O.make_node("Add", ["v_in", "x"], ["v_out"], name="acc"),
         O.make_node("Identity", ["v_out"], ["scan"], name="sc")],
        "body",
        [O.make_tensor_value_info("it", I64, []),
         O.make_tensor_value_info("cond_in", O.TensorProto.BOOL, []),
         O.make_tensor_value_info("v_in", F, [2, 2])],
        [O.make_tensor_value_info("cond_out", O.TensorProto.BOOL, []),
         O.make_tensor_value_info("v_out", F, [2, 2]),
         O.make_tensor_value_info("scan", F, [2, 2])])
    nodes = [O.make_node("Loop", ["m", "", "v0"], ["v_final", "v_all"],
                         name="loop0", body=body)]
    inits = [O.from_array(np.array(trip, np.int64), "m"),
             O.from_array(np.zeros((2, 2), np.float32), "v0")]
    g = O.make_graph(
        nodes, "g", [O.make_tensor_value_info("x", F, [2, 2])],
        [O.make_tensor_value_info("v_final", F, None),
         O.make_tensor_value_info("v_all", F, None)],
        initializer=inits)
    return nq.Model.from_onnx(O.make_model(g))


def test_loop_static_trip_count_unrolls():
    x = RNG.normal(size=(2, 2)).astype(np.float32)
    v_final, v_all = _loop_model(4)([x])
    np.testing.assert_allclose(np.asarray(v_final), 4 * x, rtol=1e-6)
    want = np.stack([x, 2 * x, 3 * x, 4 * x])
    np.testing.assert_allclose(np.asarray(v_all), want, rtol=1e-6)


def test_loop_host_condition_terminates():
    """cond-driven Loop: body flips cond_out to false once the HOST
    iteration counter reaches 3 (all shape-domain math)."""
    body = O.make_graph(
        [O.make_node("Less", ["it", "limit"], ["cond_out"], name="lt"),
         O.make_node("Add", ["v_in", "x"], ["v_out"], name="acc")],
        "body",
        [O.make_tensor_value_info("it", I64, []),
         O.make_tensor_value_info("cond_in", O.TensorProto.BOOL, []),
         O.make_tensor_value_info("v_in", F, [2])],
        [O.make_tensor_value_info("cond_out", O.TensorProto.BOOL, []),
         O.make_tensor_value_info("v_out", F, [2])])
    nodes = [O.make_node("Loop", ["", "cond0", "v0"], ["v_final"],
                         name="loop0", body=body)]
    inits = [O.from_array(np.array(True), "cond0"),
             O.from_array(np.zeros(2, np.float32), "v0"),
             O.from_array(np.array(3, np.int64), "limit")]
    g = O.make_graph(
        nodes, "g", [O.make_tensor_value_info("x", F, [2])],
        [O.make_tensor_value_info("v_final", F, None)],
        initializer=inits)
    model = nq.Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(2,)).astype(np.float32)
    # iterations run at it=0,1,2,3: cond_out = it<3 stops AFTER the
    # it=3 body executed (ONNX do-while-with-precheck semantics)
    np.testing.assert_allclose(np.asarray(model([x])[0]), 4 * x,
                               rtol=1e-6)


def test_loop_in_quantized_model():
    """A QModel whose graph tail is a Loop: the captured MatMul output
    is a QTensor and dequantizes at the subgraph boundary."""
    w = RNG.normal(size=(3, 3)).astype(np.float32)
    body = O.make_graph(
        [O.make_node("Identity", ["cond_in"], ["cond_out"], name="ci"),
         O.make_node("Add", ["v_in", "h"], ["v_out"], name="acc")],
        "body",
        [O.make_tensor_value_info("it", I64, []),
         O.make_tensor_value_info("cond_in", O.TensorProto.BOOL, []),
         O.make_tensor_value_info("v_in", F, [2, 3])],
        [O.make_tensor_value_info("cond_out", O.TensorProto.BOOL, []),
         O.make_tensor_value_info("v_out", F, [2, 3])])
    nodes = [
        O.make_node("MatMul", ["x", "w"], ["h"], name="mm"),
        O.make_node("Loop", ["m", "", "v0"], ["y"], name="loop0",
                    body=body),
    ]
    inits = [O.from_array(w, "w"),
             O.from_array(np.array(3, np.int64), "m"),
             O.from_array(np.zeros((2, 3), np.float32), "v0")]
    g = O.make_graph(
        nodes, "g", [O.make_tensor_value_info("x", F, [2, 3])],
        [O.make_tensor_value_info("y", F, None)], initializer=inits)
    model = nq.Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(2, 3)).astype(np.float32)
    want = 3 * (x @ w)
    np.testing.assert_allclose(np.asarray(model([x])[0]), want,
                               rtol=1e-5, atol=1e-6)
    q = model.quantize([x], bit_width=8)
    got = np.asarray(q([x])[0])
    assert np.abs(got - want).mean() < 0.2  # int8 matmul tolerance
