"""Optional-input POSITION preservation at import.

ONNX passes absent optional inputs as empty-name slots (""); the
importer keeps them as positional None slots (graph.import_onnx), so
ops address optionals by position instead of classifying tensors by
dtype/shape. These tests pin every optional position for the ops that
previously used heuristics (Pad/Resize/LSTM/GRU) plus the generic
executor paths, with closed-form numpy oracles.
"""
import numpy as np
import pytest

from numpy_quant_tpu import onnx as O
from numpy_quant_tpu.model import Model

RNG = np.random.default_rng(7)


def _run(nodes, in_infos, out_infos, inits, inputs):
    g = O.make_graph(nodes, "g", in_infos, out_infos, initializer=inits)
    model = Model.from_onnx(O.make_model(g))
    return model(inputs)


def _info(name, dt, shape):
    return O.make_tensor_value_info(name, dt, shape)


# ------------------------------------------------------------------ Pad


def test_pad_int_scalar_value_and_axes():
    """The previously-ambiguous case: int64 x, scalar constant_value AND
    a size-1 axes input (the old dtype/width heuristic misclassified the
    value as axes). Positional slots make it exact."""
    x = np.arange(12, dtype=np.int64).reshape(3, 4)
    pads = np.array([1, 1], np.int64)   # one axis: begin 1, end 1
    axes = np.array([1], np.int64)
    node = O.make_node("Pad", ["x", "p", "v", "ax"], ["y"], name="p",
                       mode="constant")
    actual = _run([node], [_info("x", O.TensorProto.INT64, [3, 4])],
                  [_info("y", O.TensorProto.INT64, None)],
                  [O.from_array(pads, "p"),
                   O.from_array(np.int64(7), "v"),
                   O.from_array(axes, "ax")], [x])[0]
    desired = np.pad(x, ((0, 0), (1, 1)), constant_values=7)
    np.testing.assert_array_equal(actual, desired)
    assert actual.dtype == np.int64


def test_pad_empty_value_slot_with_axes():
    """[x, pads, "", axes]: the constant_value slot is absent but axes
    still lands in position 3."""
    x = RNG.normal(size=(2, 3, 4)).astype(np.float32)
    pads = np.array([1, 2], np.int64)
    axes = np.array([2], np.int64)
    node = O.make_node("Pad", ["x", "p", "", "ax"], ["y"], name="p",
                       mode="constant")
    actual = _run([node], [_info("x", O.TensorProto.FLOAT, [2, 3, 4])],
                  [_info("y", O.TensorProto.FLOAT, None)],
                  [O.from_array(pads, "p"), O.from_array(axes, "ax")], [x])[0]
    np.testing.assert_array_equal(actual, np.pad(x, ((0, 0), (0, 0), (1, 2))))


def test_pad_unknown_mode_raises_value_error():
    x = RNG.normal(size=(2, 2)).astype(np.float32)
    node = O.make_node("Pad", ["x", "p"], ["y"], name="p", mode="nonsense")
    with pytest.raises(ValueError, match="Pad mode"):
        _run([node], [_info("x", O.TensorProto.FLOAT, [2, 2])],
             [_info("y", O.TensorProto.FLOAT, None)],
             [O.from_array(np.array([1, 0, 0, 0], np.int64), "p")], [x])


# --------------------------------------------------------------- Resize


def test_resize_sizes_with_empty_roi_and_scales():
    """[x, "", "", sizes]: sizes is addressed purely by position."""
    x = RNG.normal(size=(1, 2, 4, 4)).astype(np.float32)
    sizes = np.array([1, 2, 8, 8], np.int64)
    node = O.make_node("Resize", ["x", "", "", "sz"], ["y"], name="r",
                       mode="nearest",
                       coordinate_transformation_mode="asymmetric",
                       nearest_mode="floor")
    actual = _run([node], [_info("x", O.TensorProto.FLOAT, list(x.shape))],
                  [_info("y", O.TensorProto.FLOAT, None)],
                  [O.from_array(sizes, "sz")], [x])[0]
    desired = np.repeat(np.repeat(x, 2, axis=2), 2, axis=3)
    np.testing.assert_array_equal(actual, desired)


def test_resize_scales_with_empty_roi():
    """[x, "", scales]: scales in position 2."""
    x = RNG.normal(size=(1, 1, 3, 3)).astype(np.float32)
    scales = np.array([1, 1, 2, 2], np.float32)
    node = O.make_node("Resize", ["x", "", "s"], ["y"], name="r",
                       mode="nearest",
                       coordinate_transformation_mode="asymmetric",
                       nearest_mode="floor")
    actual = _run([node], [_info("x", O.TensorProto.FLOAT, list(x.shape))],
                  [_info("y", O.TensorProto.FLOAT, None)],
                  [O.from_array(scales, "s")], [x])[0]
    desired = np.repeat(np.repeat(x, 2, axis=2), 2, axis=3)
    np.testing.assert_array_equal(actual, desired)


# ------------------------------------------------------------- LSTM/GRU


def _lstm_nodes(in_names, h):
    return O.make_node("LSTM", in_names, ["y"], name="l", hidden_size=h)


def _run_lstm(in_names, inits, x, h):
    node = _lstm_nodes(in_names, h)
    return _run([node], [_info("x", O.TensorProto.FLOAT, list(x.shape))],
                [_info("y", O.TensorProto.FLOAT, None)], inits, [x])[0]


def test_lstm_lone_initial_h_positional():
    """[x, w, r, "", "", h0]: a lone initial_h equals passing (h0, 0)."""
    seq, batch, isz, h = 3, 2, 4, 4
    x = RNG.normal(size=(seq, batch, isz)).astype(np.float32)
    W = RNG.normal(size=(1, 4 * h, isz)).astype(np.float32)
    R = RNG.normal(size=(1, 4 * h, h)).astype(np.float32)
    h0 = RNG.normal(size=(1, batch, h)).astype(np.float32)
    zeros = np.zeros_like(h0)
    base = [O.from_array(W, "w"), O.from_array(R, "r")]
    lone = _run_lstm(["x", "w", "r", "", "", "h0"],
                     base + [O.from_array(h0, "h0")], x, h)
    both = _run_lstm(["x", "w", "r", "", "", "h0", "c0"],
                     base + [O.from_array(h0, "h0"),
                             O.from_array(zeros, "c0")], x, h)
    np.testing.assert_array_equal(lone, both)


def test_lstm_lone_initial_c_positional():
    """[x, w, r, "", "", "", c0]: a lone initial_c equals (0, c0) --
    the case the import-time name-dropping made inherently ambiguous."""
    seq, batch, isz, h = 3, 2, 4, 4
    x = RNG.normal(size=(seq, batch, isz)).astype(np.float32)
    W = RNG.normal(size=(1, 4 * h, isz)).astype(np.float32)
    R = RNG.normal(size=(1, 4 * h, h)).astype(np.float32)
    c0 = RNG.normal(size=(1, batch, h)).astype(np.float32)
    zeros = np.zeros_like(c0)
    base = [O.from_array(W, "w"), O.from_array(R, "r")]
    lone = _run_lstm(["x", "w", "r", "", "", "", "c0"],
                     base + [O.from_array(c0, "c0")], x, h)
    both = _run_lstm(["x", "w", "r", "", "", "h0", "c0"],
                     base + [O.from_array(zeros, "h0"),
                             O.from_array(c0, "c0")], x, h)
    np.testing.assert_array_equal(lone, both)


def test_lstm_peephole_rejected():
    seq, batch, isz, h = 2, 1, 3, 3
    x = RNG.normal(size=(seq, batch, isz)).astype(np.float32)
    W = RNG.normal(size=(1, 4 * h, isz)).astype(np.float32)
    R = RNG.normal(size=(1, 4 * h, h)).astype(np.float32)
    P = RNG.normal(size=(1, 3 * h)).astype(np.float32)
    node = _lstm_nodes(["x", "w", "r", "", "", "", "", "p"], h)
    with pytest.raises(ValueError, match="peephole"):
        _run([node], [_info("x", O.TensorProto.FLOAT, list(x.shape))],
             [_info("y", O.TensorProto.FLOAT, None)],
             [O.from_array(W, "w"), O.from_array(R, "r"),
              O.from_array(P, "p")], [x])


def test_gru_initial_h_without_bias():
    """GRU [x, w, r, "", "", h0]: h0 lands in position 5."""
    seq, batch, isz, h = 3, 2, 4, 4
    x = RNG.normal(size=(seq, batch, isz)).astype(np.float32)
    W = RNG.normal(size=(1, 3 * h, isz)).astype(np.float32)
    R = RNG.normal(size=(1, 3 * h, h)).astype(np.float32)
    h0 = RNG.normal(size=(1, batch, h)).astype(np.float32)
    zero_b = np.zeros((1, 6 * h), np.float32)

    def run(in_names, inits):
        node = O.make_node("GRU", in_names, ["y"], name="g", hidden_size=h)
        return _run([node],
                    [_info("x", O.TensorProto.FLOAT, list(x.shape))],
                    [_info("y", O.TensorProto.FLOAT, None)], inits, [x])[0]

    base = [O.from_array(W, "w"), O.from_array(R, "r")]
    lone = run(["x", "w", "r", "", "", "h0"],
               base + [O.from_array(h0, "h0")])
    with_b = run(["x", "w", "r", "b", "", "h0"],
                 base + [O.from_array(zero_b, "b"),
                         O.from_array(h0, "h0")])
    np.testing.assert_allclose(lone, with_b, atol=1e-6)


# --------------------------------------- generic executor / other ops


def test_clip_empty_min_slot():
    """Clip [x, "", max]: the max input lands in position 2."""
    x = np.array([[-3.0, 0.5, 4.0]], np.float32)
    node = O.make_node("Clip", ["x", "", "mx"], ["y"], name="c")
    actual = _run([node], [_info("x", O.TensorProto.FLOAT, [1, 3])],
                  [_info("y", O.TensorProto.FLOAT, None)],
                  [O.from_array(np.float32(1.0), "mx")], [x])[0]
    np.testing.assert_array_equal(actual, np.minimum(x, 1.0))


def test_quantized_model_with_optional_slots():
    """A quantized graph containing a None-slot node executes (both the
    TinyqDequant walk and the jitted path handle absent optionals)."""
    x = RNG.normal(size=(4, 6)).astype(np.float32)
    w = RNG.normal(size=(6, 5)).astype(np.float32)
    pads = np.array([0, 1, 0, 1], np.int64)
    nodes = [
        O.make_node("MatMul", ["x", "w"], ["mm"], name="mm"),
        O.make_node("Pad", ["mm", "p", "", ""], ["y"], name="p",
                    mode="constant"),
    ]
    g = O.make_graph(nodes, "g", [_info("x", O.TensorProto.FLOAT, [4, 6])],
                     [_info("y", O.TensorProto.FLOAT, None)],
                     initializer=[O.from_array(w, "w"),
                                  O.from_array(pads, "p")])
    model = Model.from_onnx(O.make_model(g))
    float_out = model([x])[0]
    qmodel = model.quantize([x], bit_width=8)
    qout = qmodel([x])[0]
    assert qout.shape == float_out.shape
    assert np.mean(np.abs(qout - float_out)) < 0.1
    # trailing empty slots trim away entirely
    pad_node = [n for n in model.nodes if n.op == "Pad"][0]
    assert len(pad_node.inputs) == 2


def test_summary_skips_none_slots():
    from numpy_quant_tpu.utils.summary import summarize
    x = RNG.normal(size=(2, 2)).astype(np.float32)
    node = O.make_node("Pad", ["x", "p", "", "ax"], ["y"], name="pd",
                       mode="constant")
    g = O.make_graph([node], "g", [_info("x", O.TensorProto.FLOAT, [2, 2])],
                     [_info("y", O.TensorProto.FLOAT, None)],
                     initializer=[O.from_array(np.array([1, 1], np.int64), "p"),
                                  O.from_array(np.array([0], np.int64), "ax")])
    model = Model.from_onnx(O.make_model(g))
    text = summarize(model)
    assert "pd" in text and "ax" in text


# ------------------------------------- host-domain class preservation


def test_int_data_through_clip_pow_reducesum():
    """int64 (shape-domain) data stays ITensor through the extras ops,
    so downstream shape consumers still constant-fold under jit."""
    x = np.array([[1, 2, 3], [4, 5, 6]], np.int64)
    nodes = [
        O.make_node("Clip", ["x", "lo", "hi"], ["c"], name="c"),
        O.make_node("Pow", ["c", "e"], ["pw"], name="pw"),
        O.make_node("ReduceSum", ["pw"], ["rs"], name="rs", keepdims=0,
                    axes=[0]),
        O.make_node("ReduceMax", ["rs"], ["y"], name="rm", keepdims=1),
    ]
    actual = _run(
        nodes, [_info("x", O.TensorProto.INT64, [2, 3])],
        [_info("y", O.TensorProto.INT64, None)],
        [O.from_array(np.int64(2), "lo"), O.from_array(np.int64(5), "hi"),
         O.from_array(np.int64(2), "e")], [x])[0]
    c = np.clip(x, 2, 5)
    desired = np.max((c ** 2).sum(axis=0), keepdims=True)
    np.testing.assert_array_equal(actual, desired)
    assert actual.dtype == np.int64


def test_int_reducesum_as_reshape_target():
    """The real risk: an int64 reduction feeding a Reshape target shape
    must constant-fold (ITensor) or jit cannot trace the graph."""
    x = RNG.normal(size=(2, 6)).astype(np.float32)
    shp = np.array([[3], [4]], np.int64)
    nodes = [
        O.make_node("ReduceSum", ["shp"], ["flat"], name="rs", keepdims=0,
                    axes=[1]),
        O.make_node("Reshape", ["x", "flat"], ["y"], name="r"),
    ]
    actual = _run(nodes, [_info("x", O.TensorProto.FLOAT, [2, 6])],
                  [_info("y", O.TensorProto.FLOAT, None)],
                  [O.from_array(shp, "shp")], [x])[0]
    np.testing.assert_array_equal(actual, x.reshape(3, 4))
