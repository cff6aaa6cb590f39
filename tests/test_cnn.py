"""CNN config (BASELINE.md config #2): conv + bias + relu chain, float
parity vs torch and int8 with quantized convolutions."""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models import cnn

RNG = np.random.default_rng(0)


def test_cnn_float_vs_torch():
    pytest.importorskip("torch")
    m = cnn.cnn_classifier(batch=4, image_size=32)
    x = RNG.standard_normal((4, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    actual = model([x])[0]
    desired = m._torch_forward(x)
    np.testing.assert_allclose(actual, desired, atol=1e-5)


def test_cnn_quantized():
    m = cnn.cnn_classifier(batch=8, image_size=32)
    x = RNG.standard_normal((8, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    f = model([x])[0]
    denom = f.max() - f.min()

    # parity mode: conv stays float (reference behavior)
    q = model.quantize([x], bit_width=8)
    out = q([x])[0]
    assert np.mean(np.abs(out - f)) / denom < 0.05
    assert (out.argmax(1) == f.argmax(1)).mean() >= 0.8

    # integer conv mode
    qi = model.quantize([x], bit_width=8, quantize_conv=True)
    outi = qi([x])[0]
    assert np.mean(np.abs(outi - f)) / denom < 0.08
    assert (outi.argmax(1) == f.argmax(1)).mean() >= 0.7


def test_new_ops_vs_oracles():
    """Cast/Flatten/Squeeze/Pow/Clip/ReduceSum/Split against numpy."""
    from numpy_quant_tpu import onnx as O
    from numpy_quant_tpu.model import Model

    x = RNG.standard_normal((2, 3, 4)).astype(np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [2, 3, 4])
    nodes = [
        O.make_node("Flatten", ["x"], ["flat"], axis=1),
        O.make_node("Pow", ["x", "two"], ["pow"]),
        O.make_node("Clip", ["x", "lo", "hi"], ["clip"]),
        O.make_node("ReduceSum", ["x", "rax"], ["rsum"], keepdims=1),
        O.make_node("Abs", ["x"], ["abs"]),
        O.make_node("Neg", ["x"], ["neg"]),
        O.make_node("Split", ["x"], ["s0", "s1"], axis=2, split=[1, 3]),
        O.make_node("Unsqueeze", ["x", "uax"], ["unsq"]),
        O.make_node("Squeeze", ["unsq", "uax"], ["sq"]),
    ]
    inits = [O.from_array(np.array(2.0, np.float32), "two"),
             O.from_array(np.array(-0.5, np.float32), "lo"),
             O.from_array(np.array(0.5, np.float32), "hi"),
             O.from_array(np.array([1], np.int64), "rax"),
             O.from_array(np.array([0], np.int64), "uax")]
    outs = [O.make_tensor_value_info(n, O.TensorProto.FLOAT, None)
            for n in ("flat", "pow", "clip", "rsum", "abs", "neg",
                      "s0", "s1", "sq")]
    g = O.make_graph(nodes, "g", [inp], outs, initializer=inits)
    model = Model.from_onnx(O.make_model(g))
    flat, pw, cl, rs, ab, ng, s0, s1, sq = model([x])

    np.testing.assert_array_equal(flat, x.reshape(2, 12))
    np.testing.assert_allclose(pw, x ** 2, rtol=1e-6)
    np.testing.assert_array_equal(cl, np.clip(x, -0.5, 0.5))
    np.testing.assert_allclose(rs, x.sum(axis=1, keepdims=True), rtol=1e-6)
    np.testing.assert_array_equal(ab, np.abs(x))
    np.testing.assert_array_equal(ng, -x)
    np.testing.assert_array_equal(s0, x[:, :, :1])
    np.testing.assert_array_equal(s1, x[:, :, 1:])
    np.testing.assert_array_equal(sq, x)


def test_pool_ops_vs_torch():
    torch = pytest.importorskip("torch")
    from numpy_quant_tpu import onnx as O
    from numpy_quant_tpu.model import Model

    x = RNG.standard_normal((2, 3, 9, 9)).astype(np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [2, 3, 9, 9])
    nodes = [
        O.make_node("MaxPool", ["x"], ["mp"], kernel_shape=[3, 3],
                    strides=[2, 2], pads=[1, 1, 1, 1]),
        O.make_node("AveragePool", ["x"], ["ap"], kernel_shape=[2, 2],
                    strides=[2, 2]),
        O.make_node("GlobalAveragePool", ["x"], ["gap"]),
    ]
    outs = [O.make_tensor_value_info(n, O.TensorProto.FLOAT, None)
            for n in ("mp", "ap", "gap")]
    g = O.make_graph(nodes, "g", [inp], outs)
    model = Model.from_onnx(O.make_model(g))
    mp, ap, gap = model([x])

    tx = torch.tensor(x)
    np.testing.assert_allclose(
        mp, torch.nn.functional.max_pool2d(tx, 3, 2, padding=1).numpy(),
        atol=1e-6)
    np.testing.assert_allclose(
        ap, torch.nn.functional.avg_pool2d(tx, 2, 2).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        gap, tx.mean(dim=(2, 3), keepdim=True).numpy(), atol=1e-6)
