"""BatchNormalization op + fold_batchnorm pass + ResNet zoo entry.

Parity-plus vs the reference (its op registry has no BatchNormalization,
reference model.py:65-213); oracles are torch.nn.functional and exact
before/after-fold equivalence on the same float model.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O
from numpy_quant_tpu.models import cnn

RNG = np.random.default_rng(7)


def _bn_graph(shape, eps=1e-3):
    c = shape[1]
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, list(shape))
    node = O.make_node("BatchNormalization",
                       ["x", "gamma", "beta", "mean", "var"], ["y"],
                       epsilon=eps)
    inits = [O.from_array(RNG.uniform(0.5, 1.5, c).astype(np.float32),
                          "gamma"),
             O.from_array(RNG.standard_normal(c).astype(np.float32), "beta"),
             O.from_array(RNG.standard_normal(c).astype(np.float32), "mean"),
             O.from_array(RNG.uniform(0.2, 2.0, c).astype(np.float32),
                          "var")]
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    g = O.make_graph([node], "g", [inp], [out], initializer=inits)
    return O.make_model(g)


@pytest.mark.parametrize("shape", [(2, 5, 4, 3), (6, 5)])
def test_batchnorm_op_vs_torch(shape):
    torch = pytest.importorskip("torch")
    m = _bn_graph(shape)
    x = RNG.standard_normal(shape).astype(np.float32)
    model = nq.Model.from_onnx(m)
    actual = model([x])[0]

    inits = {i.name: torch.tensor(O.to_array(i))
             for i in m.graph.initializer}
    desired = torch.nn.functional.batch_norm(
        torch.tensor(x), inits["mean"], inits["var"],
        weight=inits["gamma"], bias=inits["beta"], eps=1e-3).numpy()
    np.testing.assert_allclose(actual, desired, atol=1e-5)


def test_batchnorm_training_mode_rejected():
    m = _bn_graph((2, 3, 4, 4))
    m.graph.node[0].attribute.append(
        O.make_attribute("training_mode", 1))
    model = nq.Model.from_onnx(m)
    x = RNG.standard_normal((2, 3, 4, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="training_mode"):
        model([x])


def test_resnet_float_vs_torch():
    pytest.importorskip("torch")
    m = cnn.resnet_classifier(batch=4, image_size=16, widths=(8, 16))
    x = RNG.standard_normal((4, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    np.testing.assert_allclose(model([x])[0], m._torch_forward(x),
                               atol=1e-4)


def test_fold_batchnorm_exact_on_resnet():
    m = cnn.resnet_classifier(batch=4, image_size=16, widths=(8, 16))
    x = RNG.standard_normal((4, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    before = model([x])[0]

    n_bn = sum(n.op == "BatchNormalization" for n in model.nodes)
    assert n_bn == 6  # stem + 2x(conv1, conv2) + 1 projection
    folded = model.fold_batchnorm()
    assert folded == n_bn
    assert not any(n.op == "BatchNormalization" for n in model.nodes)
    # every conv gained the folded bias
    for node in model.nodes:
        if node.op == "Conv":
            assert len(node.inputs) == 3

    after = model([x])[0]
    np.testing.assert_allclose(after, before, rtol=1e-4, atol=1e-5)


def test_fold_batchnorm_gemm_and_guards():
    """Gemm(transB)/Gemm(beta=0) fold exactly; a BN whose input has a
    second consumer, and one fed by MatMul (no bias slot), stay."""
    k, n, c = 6, 5, 5
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [3, k])
    rnd = lambda *s: RNG.standard_normal(s).astype(np.float32)
    inits = [O.from_array(rnd(n, k), "w1"), O.from_array(rnd(n), "b1"),
             O.from_array(rnd(k, n), "w2"), O.from_array(rnd(n), "b2"),
             O.from_array(rnd(k, n), "w3")]
    for tag in ("p", "q", "r"):
        inits += [O.from_array(RNG.uniform(0.5, 1.5, c).astype(np.float32),
                               f"gamma_{tag}"),
                  O.from_array(rnd(c), f"beta_{tag}"),
                  O.from_array(rnd(c), f"mean_{tag}"),
                  O.from_array(RNG.uniform(0.2, 2.0, c)
                               .astype(np.float32), f"var_{tag}")]
    bn = lambda tag, src, out: O.make_node(
        "BatchNormalization",
        [src, f"gamma_{tag}", f"beta_{tag}", f"mean_{tag}", f"var_{tag}"],
        [out], epsilon=1e-4)
    nodes = [
        O.make_node("Gemm", ["x", "w1", "b1"], ["g1"], transB=1,
                    alpha=1.0, beta=1.0),
        bn("p", "g1", "y1"),
        O.make_node("Gemm", ["x", "w2", "b2"], ["g2"], beta=0.0),
        bn("q", "g2", "y2"),
        O.make_node("MatMul", ["x", "w3"], ["m3"]),
        bn("r", "m3", "y3"),
        # second consumer of g1's pre-BN value: folding p would change
        # what this Relu sees, so p must stay
        O.make_node("Relu", ["g1"], ["relu_g1"]),
    ]
    outs = [O.make_tensor_value_info(o, O.TensorProto.FLOAT, None)
            for o in ("y1", "y2", "y3", "relu_g1")]
    g = O.make_graph(nodes, "g", [inp], outs, initializer=inits)
    model = nq.Model.from_onnx(O.make_model(g))
    x = RNG.standard_normal((3, k)).astype(np.float32)
    before = model([x])

    folded = model.fold_batchnorm()
    # only the beta=0 Gemm folds: p is blocked by the Relu consumer of
    # its pre-BN value, r by MatMul having no bias slot
    assert folded == 1
    remaining = [n for n in model.nodes if n.op == "BatchNormalization"]
    assert len(remaining) == 2
    g2 = [n for n in model.nodes if n.op == "Gemm"][1]
    assert float(g2.attrs["beta"]) == 1.0 and len(g2.inputs) == 3

    after = model([x])
    for a, b in zip(after, before):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fold_batchnorm_conv_no_bias_single():
    """Bias-free Conv + BN folds into Conv + created bias constant."""
    m = cnn.resnet_classifier(batch=2, image_size=8, widths=(4,))
    model = nq.Model.from_onnx(m)
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
    before = model([x])[0]
    assert model.fold_batchnorm() == 3
    conv = next(n for n in model.nodes if n.op == "Conv")
    assert conv.inputs[2].name.endswith("/folded_bias")
    np.testing.assert_allclose(model([x])[0], before, rtol=1e-4,
                               atol=1e-5)


def test_resnet_folded_quantized():
    """The capstone recipe: fold -> calibrate -> int8 with integer conv."""
    m = cnn.resnet_classifier(batch=16, image_size=16, widths=(8, 16))
    x = RNG.standard_normal((16, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    f = model([x])[0]
    model.fold_batchnorm()

    q = model.quantize([x], bit_width=8, quantize_conv=True)
    out = q([x])[0]
    denom = f.max() - f.min()
    assert np.mean(np.abs(out - f)) / denom < 0.08
    assert (out.argmax(1) == f.argmax(1)).mean() >= 0.7
