"""Extended op set: grouped/dilated Conv, Pad, Resize, Gelu,
InstanceNormalization, Min/Max/ReduceMin.

These ops are beyond the reference's 26-op set (reference:
numpy_quant/model.py:65-213), so torch/numpy closed forms are the
oracles (the reference interpreter cannot run these graphs).
"""
import numpy as np
import pytest

from numpy_quant_tpu import onnx as O
from numpy_quant_tpu.model import Model

RNG = np.random.default_rng(0)


def _run(nodes, in_infos, out_infos, inits, inputs):
    g = O.make_graph(nodes, "g", in_infos, out_infos, initializer=inits)
    model = Model.from_onnx(O.make_model(g))
    return model(inputs)


# ---------------------------------------------------------------- Conv


@pytest.mark.parametrize("group,dils", [(2, (1, 1)), (1, (2, 3)),
                                        (4, (2, 1)), (8, (1, 1))])
def test_conv_grouped_dilated_vs_torch(group, dils):
    torch = pytest.importorskip("torch")
    b, c, o = 2, 8, 8
    kh, kw = 3, 2
    pads, strides = (1, 0, 2, 1), (2, 1)
    x = RNG.normal(size=(b, c, 11, 9)).astype(np.float32)
    w = RNG.normal(size=(o, c // group, kh, kw)).astype(np.float32)
    bias = RNG.normal(size=o).astype(np.float32)

    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, list(x.shape))
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("Conv", ["x", "w", "b"], ["y"], name="c",
                       pads=list(pads), strides=list(strides),
                       dilations=list(dils), group=group,
                       kernel_shape=[kh, kw])
    actual = _run([node], [inp], [out],
                  [O.from_array(w, "w"), O.from_array(bias, "b")], [x])[0]

    tx = torch.nn.functional.pad(torch.tensor(x),
                                 (pads[1], pads[3], pads[0], pads[2]))
    desired = torch.nn.functional.conv2d(
        tx, torch.tensor(w), torch.tensor(bias), stride=strides,
        dilation=dils, groups=group).numpy()
    np.testing.assert_allclose(actual, desired, atol=1e-4)


@pytest.mark.parametrize("group,dils", [(2, (1, 1)), (1, (2, 2)),
                                        (4, (2, 1))])
def test_qconv2d_grouped_dilated_integer_exact(group, dils):
    """Integer grouped/dilated conv accumulators match an exact f64
    conv oracle on the zero-point-corrected integers."""
    torch = pytest.importorskip("torch")
    from numpy_quant_tpu.tensor import QTensor, qconv2d

    b, c, o = 2, 8, 8
    kh, kw = 3, 3
    pads, strides = (1, 1, 1, 1), (2, 2)
    xq = RNG.integers(-128, 128, size=(b, c, 9, 9)).astype(np.int32)
    wq = RNG.integers(-64, 64, size=(o, c // group, kh, kw)).astype(np.int32)
    zp_x = 7
    sx, sw = np.float32(0.02), np.float32(0.005)

    x = QTensor(xq, 8, sx, np.int64(zp_x))
    w = QTensor(wq, 8, sw, None)
    out = qconv2d(x, w, None, pads, strides, dils, group)

    # oracle: conv((xq - zp_x), wq) in f64 (exact for these magnitudes)
    tx = torch.tensor((xq - zp_x).astype(np.float64))
    tx = torch.nn.functional.pad(tx, (pads[1], pads[3], pads[0], pads[2]))
    desired = torch.nn.functional.conv2d(
        tx, torch.tensor(wq.astype(np.float64)), None, stride=strides,
        dilation=dils, groups=group).numpy()

    acc = np.asarray(out.data, np.int64)
    zp = out.zero_point
    corrected = acc - (np.asarray(zp, np.int64) if zp is not None else 0)
    np.testing.assert_array_equal(corrected, desired.astype(np.int64))
    assert out.bit_width == 32


# ----------------------------------------------------------------- Pad


def test_pad_constant_with_value():
    x = RNG.normal(size=(2, 3)).astype(np.float32)
    pads = np.array([1, 0, 0, 2], np.int64)  # (b0, b1, e0, e1)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [2, 3])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("Pad", ["x", "p", "v"], ["y"], name="p", mode="constant")
    actual = _run([node], [inp], [out],
                  [O.from_array(pads, "p"),
                   O.from_array(np.float32(2.5), "v")], [x])[0]
    desired = np.pad(x, ((1, 0), (0, 2)), constant_values=2.5)
    np.testing.assert_array_equal(actual, desired)


@pytest.mark.parametrize("mode", ["reflect", "edge", "wrap"])
def test_pad_modes(mode):
    x = RNG.normal(size=(3, 4)).astype(np.float32)
    pads = np.array([1, 2, 1, 1], np.int64)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [3, 4])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("Pad", ["x", "p"], ["y"], name="p", mode=mode)
    actual = _run([node], [inp], [out], [O.from_array(pads, "p")], [x])[0]
    desired = np.pad(x, ((1, 1), (2, 1)), mode=mode)
    np.testing.assert_array_equal(actual, desired)


def test_pad_negative_crops():
    x = RNG.normal(size=(4, 5)).astype(np.float32)
    pads = np.array([-1, 1, 0, -2], np.int64)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [4, 5])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("Pad", ["x", "p"], ["y"], name="p", mode="constant")
    actual = _run([node], [inp], [out], [O.from_array(pads, "p")], [x])[0]
    desired = np.pad(x, ((0, 0), (1, 0)))[1:, :-2]
    np.testing.assert_array_equal(actual, desired)


def test_pad_axes_subset():
    x = RNG.normal(size=(2, 3, 4)).astype(np.float32)
    pads = np.array([1, 2], np.int64)  # axis 2 only: begin 1, end 2
    axes = np.array([2], np.int64)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [2, 3, 4])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    # constant_value omitted (empty input name dropped at import)
    node = O.make_node("Pad", ["x", "p", "", "ax"], ["y"], name="p",
                       mode="constant")
    actual = _run([node], [inp], [out],
                  [O.from_array(pads, "p"), O.from_array(axes, "ax")], [x])[0]
    desired = np.pad(x, ((0, 0), (0, 0), (1, 2)))
    np.testing.assert_array_equal(actual, desired)


# -------------------------------------------------------------- Resize


def test_resize_nearest_vs_torch():
    torch = pytest.importorskip("torch")
    x = RNG.normal(size=(1, 3, 5, 7)).astype(np.float32)
    scales = np.array([1.0, 1.0, 2.0, 3.0], np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, list(x.shape))
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    # torch interpolate(nearest) == asymmetric + floor
    node = O.make_node("Resize", ["x", "", "s"], ["y"], name="r",
                       mode="nearest",
                       coordinate_transformation_mode="asymmetric",
                       nearest_mode="floor")
    actual = _run([node], [inp], [out], [O.from_array(scales, "s")], [x])[0]
    desired = torch.nn.functional.interpolate(
        torch.tensor(x), scale_factor=(2.0, 3.0), mode="nearest").numpy()
    np.testing.assert_array_equal(actual, desired)


def test_resize_linear_vs_torch():
    torch = pytest.importorskip("torch")
    x = RNG.normal(size=(2, 3, 6, 5)).astype(np.float32)
    scales = np.array([1.0, 1.0, 2.0, 1.6], np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, list(x.shape))
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    # torch interpolate(bilinear, align_corners=False) == pytorch_half_pixel
    node = O.make_node("Resize", ["x", "", "s"], ["y"], name="r",
                       mode="linear",
                       coordinate_transformation_mode="pytorch_half_pixel")
    actual = _run([node], [inp], [out], [O.from_array(scales, "s")], [x])[0]
    desired = torch.nn.functional.interpolate(
        torch.tensor(x), scale_factor=(2.0, 1.6), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(actual, desired, atol=1e-6)


def test_resize_sizes_align_corners():
    torch = pytest.importorskip("torch")
    x = RNG.normal(size=(1, 2, 4, 4)).astype(np.float32)
    sizes = np.array([1, 2, 7, 9], np.int64)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, list(x.shape))
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("Resize", ["x", "", "", "sz"], ["y"], name="r",
                       mode="linear",
                       coordinate_transformation_mode="align_corners")
    actual = _run([node], [inp], [out], [O.from_array(sizes, "sz")], [x])[0]
    desired = torch.nn.functional.interpolate(
        torch.tensor(x), size=(7, 9), mode="bilinear",
        align_corners=True).numpy()
    np.testing.assert_allclose(actual, desired, atol=1e-6)


# ---------------------------------------------------- Gelu / InstanceNorm


@pytest.mark.parametrize("approximate", ["none", "tanh"])
def test_gelu_vs_torch(approximate):
    torch = pytest.importorskip("torch")
    x = RNG.normal(size=(3, 17)).astype(np.float32) * 3
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [3, 17])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("Gelu", ["x"], ["y"], name="g",
                       approximate=approximate)
    actual = _run([node], [inp], [out], [], [x])[0]
    desired = torch.nn.functional.gelu(
        torch.tensor(x), approximate="tanh" if approximate == "tanh"
        else "none").numpy()
    np.testing.assert_allclose(actual, desired, atol=2e-5)


def test_instance_normalization_vs_torch():
    torch = pytest.importorskip("torch")
    x = RNG.normal(size=(2, 4, 5, 6)).astype(np.float32)
    scale = RNG.normal(size=4).astype(np.float32)
    bias = RNG.normal(size=4).astype(np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, list(x.shape))
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("InstanceNormalization", ["x", "s", "b"], ["y"],
                       name="in", epsilon=1e-5)
    actual = _run([node], [inp], [out],
                  [O.from_array(scale, "s"), O.from_array(bias, "b")], [x])[0]
    desired = torch.nn.functional.instance_norm(
        torch.tensor(x), weight=torch.tensor(scale),
        bias=torch.tensor(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(actual, desired, atol=1e-5)


# ------------------------------------------------- Min / Max / ReduceMin


def test_min_max_nary():
    a = RNG.normal(size=(2, 3)).astype(np.float32)
    b = RNG.normal(size=(2, 3)).astype(np.float32)
    c = RNG.normal(size=(1, 3)).astype(np.float32)  # broadcast
    infos = [O.make_tensor_value_info(n, O.TensorProto.FLOAT, list(t.shape))
             for n, t in (("a", a), ("b", b), ("c", c))]
    outs = [O.make_tensor_value_info("lo", O.TensorProto.FLOAT, None),
            O.make_tensor_value_info("hi", O.TensorProto.FLOAT, None)]
    nodes = [O.make_node("Min", ["a", "b", "c"], ["lo"], name="mn"),
             O.make_node("Max", ["a", "b", "c"], ["hi"], name="mx")]
    lo, hi = _run(nodes, infos, outs, [], [a, b, c])
    np.testing.assert_array_equal(lo, np.minimum(np.minimum(a, b), c))
    np.testing.assert_array_equal(hi, np.maximum(np.maximum(a, b), c))


def test_reduce_min():
    x = RNG.normal(size=(3, 4, 5)).astype(np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [3, 4, 5])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("ReduceMin", ["x"], ["y"], name="rm",
                       axes=[1], keepdims=0)
    actual = _run([node], [inp], [out], [], [x])[0]
    np.testing.assert_allclose(actual, x.min(axis=1), atol=0)


# ------------------------------------------- model families (new ops e2e)


def test_mobilenet_classifier_float_and_quantized():
    """Depthwise-separable CNN: float parity vs the torch oracle, then
    the full PTQ path (grouped convs run integer with
    quantize_conv=True)."""
    pytest.importorskip("torch")
    from numpy_quant_tpu.models.cnn import mobilenet_classifier

    m = mobilenet_classifier(batch=4, image_size=16, widths=(8, 16),
                             n_classes=5, seed=0)
    x = RNG.normal(size=(4, 3, 16, 16)).astype(np.float32)
    model = Model.from_onnx(m)
    yf = model([x])[0]
    np.testing.assert_allclose(yf, m._torch_forward(x), atol=1e-4)

    q = model.quantize([x], bit_width=8)
    yq = q([x])[0]
    assert np.abs(yq - yf).mean() < 0.1
    q2 = model.quantize([x], bit_width=8, quantize_conv=True)
    yq2 = q2([x])[0]
    assert np.abs(yq2 - yf).mean() < 0.1


def test_unet_segmenter_float_and_quantized():
    """Encoder-decoder segmentation net with an in-graph Resize: float
    parity vs torch, quantized output within PTQ noise, and the Resize
    scales constant survives quantization unquantized."""
    pytest.importorskip("torch")
    from numpy_quant_tpu.models.cnn import unet_segmenter
    from numpy_quant_tpu.tensor import FTensor

    m = unet_segmenter(batch=2, image_size=16, width=6, n_classes=3,
                       seed=0)
    x = RNG.normal(size=(2, 3, 16, 16)).astype(np.float32)
    model = Model.from_onnx(m)
    yf = model([x])[0]
    assert yf.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(yf, m._torch_forward(x), atol=1e-4)

    q = model.quantize([x], bit_width=8)
    scales_const = next(v for v in q.values if v.name == "up.scales")
    assert isinstance(scales_const.data, FTensor)  # shape-domain: float
    yq = q([x])[0]
    assert np.abs(yq - yf).mean() < 0.15


# -------------------------------------------------------- LSTM / GRU


def _onnx_lstm_weights(torch_lstm, layer=0, suffix=""):
    """torch LSTM (ifgo gate order) -> ONNX W/R/B slabs (iofc order)."""
    import torch
    h = torch_lstm.hidden_size
    perm = np.concatenate([np.arange(0, h),          # i
                           np.arange(3 * h, 4 * h),  # o <- torch o
                           np.arange(h, 2 * h),      # f
                           np.arange(2 * h, 3 * h)]) # c <- torch g
    wi = getattr(torch_lstm, f"weight_ih_l{layer}{suffix}").detach().numpy()
    wh = getattr(torch_lstm, f"weight_hh_l{layer}{suffix}").detach().numpy()
    bi = getattr(torch_lstm, f"bias_ih_l{layer}{suffix}").detach().numpy()
    bh = getattr(torch_lstm, f"bias_hh_l{layer}{suffix}").detach().numpy()
    return wi[perm], wh[perm], np.concatenate([bi[perm], bh[perm]])


@pytest.mark.parametrize("direction", ["forward", "reverse",
                                       "bidirectional"])
def test_lstm_vs_torch(direction):
    torch = pytest.importorskip("torch")
    seq, batch, inp_sz, h = 7, 3, 5, 4
    torch.manual_seed(0)
    bidir = direction == "bidirectional"
    lstm = torch.nn.LSTM(inp_sz, h, bidirectional=bidir)
    x = RNG.normal(size=(seq, batch, inp_sz)).astype(np.float32)

    slabs = [_onnx_lstm_weights(lstm)]
    if bidir:
        slabs.append(_onnx_lstm_weights(lstm, suffix="_reverse"))
    if direction == "reverse":
        # torch has no pure-reverse mode: flip the input as the oracle
        tx = torch.tensor(x[::-1].copy())
    else:
        tx = torch.tensor(x)
    out_t, (h_t, c_t) = lstm(tx)
    desired = out_t.detach().numpy().reshape(seq, batch, len(slabs), h) \
        .transpose(0, 2, 1, 3)
    if direction == "reverse":
        desired = desired[::-1]

    W = np.stack([s[0] for s in slabs])
    R = np.stack([s[1] for s in slabs])
    B = np.stack([s[2] for s in slabs])
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT,
                                   [seq, batch, inp_sz])
    outs = [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None),
            O.make_tensor_value_info("yh", O.TensorProto.FLOAT, None),
            O.make_tensor_value_info("yc", O.TensorProto.FLOAT, None)]
    node = O.make_node("LSTM", ["x", "w", "r", "b"], ["y", "yh", "yc"],
                       name="l", hidden_size=h, direction=direction)
    y, yh, yc = _run([node], [inp], outs,
                     [O.from_array(W.astype(np.float32), "w"),
                      O.from_array(R.astype(np.float32), "r"),
                      O.from_array(B.astype(np.float32), "b")], [x])
    np.testing.assert_allclose(y, desired, atol=2e-6)
    np.testing.assert_allclose(yh, h_t.detach().numpy(), atol=2e-6)
    np.testing.assert_allclose(yc, c_t.detach().numpy(), atol=2e-6)


def test_gru_vs_torch():
    torch = pytest.importorskip("torch")
    seq, batch, inp_sz, h = 6, 2, 4, 5
    torch.manual_seed(1)
    gru = torch.nn.GRU(inp_sz, h)
    x = RNG.normal(size=(seq, batch, inp_sz)).astype(np.float32)
    h0 = RNG.normal(size=(1, batch, h)).astype(np.float32)
    out_t, h_t = gru(torch.tensor(x), torch.tensor(h0))

    # torch rzn -> ONNX zrh
    perm = np.concatenate([np.arange(h, 2 * h),      # z <- torch z
                           np.arange(0, h),          # r <- torch r
                           np.arange(2 * h, 3 * h)]) # h <- torch n
    wi = gru.weight_ih_l0.detach().numpy()[perm]
    wh = gru.weight_hh_l0.detach().numpy()[perm]
    bi = gru.bias_ih_l0.detach().numpy()[perm]
    bh = gru.bias_hh_l0.detach().numpy()[perm]
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT,
                                   [seq, batch, inp_sz])
    outs = [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None),
            O.make_tensor_value_info("yh", O.TensorProto.FLOAT, None)]
    # initial_h with the bias present and sequence_lens omitted
    node = O.make_node("GRU", ["x", "w", "r", "b", "", "h0"], ["y", "yh"],
                       name="g", hidden_size=h,
                       linear_before_reset=1)  # torch semantics
    y, yh = _run([node], [inp], outs,
                 [O.from_array(wi[None], "w"), O.from_array(wh[None], "r"),
                  O.from_array(np.concatenate([bi, bh])[None], "b"),
                  O.from_array(h0, "h0")], [x])
    np.testing.assert_allclose(y[:, 0], out_t.detach().numpy(), atol=2e-6)
    np.testing.assert_allclose(yh, h_t.detach().numpy(), atol=2e-6)


def test_lstm_classifier_float_and_quantized():
    """LSTM zoo config: float parity vs torch, quantized head within
    PTQ noise (the recurrence itself runs float, like every non-matmul
    op in the reference's quantized executor)."""
    pytest.importorskip("torch")
    from numpy_quant_tpu.models.cnn import lstm_classifier

    m = lstm_classifier(seq=9, batch=5, input_size=6, hidden=8,
                        n_classes=3, seed=0)
    x = RNG.normal(size=(9, 5, 6)).astype(np.float32)
    model = Model.from_onnx(m)
    yf = model([x])[0]
    np.testing.assert_allclose(yf, m._torch_forward(x), atol=1e-5)
    q = model.quantize([x], bit_width=8)
    yq = q([x])[0]
    assert np.abs(yq - yf).mean() < 0.05


# ------------------------------------------- review regression fixes


def test_pad_int_data_with_axes():
    """Pad on int64 data with an axes input (both optionals are int
    tensors -- classified by the pads width)."""
    x = np.arange(12, dtype=np.int64).reshape(3, 4)
    pads = np.array([1, 1], np.int64)  # one axis: begin 1, end 1
    axes = np.array([1], np.int64)
    inp = O.make_tensor_value_info("x", O.TensorProto.INT64, [3, 4])
    out = O.make_tensor_value_info("y", O.TensorProto.INT64, None)
    node = O.make_node("Pad", ["x", "p", "", "ax"], ["y"], name="p",
                       mode="constant")
    actual = _run([node], [inp], [out],
                  [O.from_array(pads, "p"), O.from_array(axes, "ax")], [x])[0]
    np.testing.assert_array_equal(actual, np.pad(x, ((0, 0), (1, 1))))


def test_reduce_min_max_axes_input():
    """opset-18 form: axes arrive as a second INPUT, not an attr."""
    x = RNG.normal(size=(3, 4, 5)).astype(np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [3, 4, 5])
    outs = [O.make_tensor_value_info("lo", O.TensorProto.FLOAT, None),
            O.make_tensor_value_info("hi", O.TensorProto.FLOAT, None)]
    nodes = [O.make_node("ReduceMin", ["x", "ax"], ["lo"], name="rmn",
                         keepdims=0),
             O.make_node("ReduceMax", ["x", "ax"], ["hi"], name="rmx",
                         keepdims=0)]
    lo, hi = _run(nodes, [inp], outs,
                  [O.from_array(np.array([2], np.int64), "ax")], [x])
    np.testing.assert_allclose(lo, x.min(axis=2), atol=0)
    np.testing.assert_allclose(hi, x.max(axis=2), atol=0)


def test_resize_antialias_rejected():
    x = RNG.normal(size=(1, 1, 4, 4)).astype(np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, list(x.shape))
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("Resize", ["x", "", "s"], ["y"], name="r",
                       mode="linear", antialias=1,
                       coordinate_transformation_mode="half_pixel")
    with pytest.raises(ValueError, match="antialias"):
        _run([node], [inp], [out],
             [O.from_array(np.array([1, 1, 0.5, 0.5], np.float32), "s")], [x])


# (a lone LSTM initial state is no longer ambiguous: the importer
# preserves optional-input positions -- see tests/test_optional_inputs.py)


# ---------------------------------------------------- QDQ interop


def test_qdq_format_model_executes():
    """Standard ONNX QDQ quantized models (QuantizeLinear /
    DequantizeLinear, int8 weight initializers, per-axis weight scales)
    execute directly -- interop with models quantized by OTHER tools."""
    rng = np.random.default_rng(0)
    M, K, Nc = 6, 8, 5
    x = rng.normal(size=(M, K)).astype(np.float32)
    wq = rng.integers(-127, 128, size=(K, Nc)).astype(np.int8)
    w_scale = (0.01 + rng.random(Nc) * 0.05).astype(np.float32)
    x_scale, x_zp = np.float32(0.05), np.uint8(120)

    nodes = [
        O.make_node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"], name="q"),
        O.make_node("DequantizeLinear", ["xq", "xs", "xzp"], ["xdq"],
                    name="dq"),
        O.make_node("DequantizeLinear", ["w", "ws"], ["wdq"], name="dqw",
                    axis=1),
        O.make_node("MatMul", ["xdq", "wdq"], ["y"], name="mm"),
    ]
    inits = [O.from_array(np.array(x_scale, np.float32), "xs"),
             O.from_array(np.array(x_zp, np.uint8), "xzp"),
             O.from_array(wq, "w"),
             O.from_array(w_scale, "ws")]
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [M, K])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    actual = _run(nodes, [inp], [out], inits, [x])[0]

    # ONNX semantics oracle: saturate(round(x/s) + zp) to uint8
    xq = np.clip(np.rint(x / x_scale) + int(x_zp), 0, 255)
    xdq = (xq - np.float32(x_zp)) * x_scale
    wdq = wq.astype(np.float32) * w_scale.reshape(1, Nc)
    desired = xdq.astype(np.float32) @ wdq
    np.testing.assert_allclose(actual, desired, atol=1e-5)


def test_qdq_int8_zero_point_range():
    """int8 zero point selects the signed saturation range."""
    x = np.array([[-10.0, 0.0, 10.0]], np.float32)
    nodes = [O.make_node("QuantizeLinear", ["x", "s", "zp"], ["q"], name="q"),
             O.make_node("DequantizeLinear", ["q", "s", "zp"], ["y"],
                         name="dq")]
    inits = [O.from_array(np.array(0.1, np.float32), "s"),
             O.from_array(np.array(0, np.int8), "zp")]
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [1, 3])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    actual = _run(nodes, [inp], [out], inits, [x])[0]
    # -10/0.1 = -100 (fits int8; would clip to 0 under uint8 rules)
    np.testing.assert_allclose(actual, [[-10.0, 0.0, 10.0]], atol=1e-6)
