"""Model.equalize: cross-layer equalization (arXiv:1906.04721).

Data-free: an exact per-channel rescaling across ReLU/MaxPool-joined
layer pairs that balances weight ranges, so per-tensor weight
quantization stops being set by one wide channel.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(41)


def _imbalanced_mlp(k=16, h=24, n=6):
    """x -> MatMul(W1 with wildly-scaled output channels) -> Add ->
    Relu -> MatMul(W2). The channel imbalance is the regime CLE fixes:
    one channel sets the whole per-tensor weight scale."""
    W1 = RNG.normal(size=(k, h)).astype(np.float32)
    W1 *= np.logspace(-2, 2, h, dtype=np.float32)[None, :]
    b1 = RNG.normal(size=h).astype(np.float32) \
        * np.logspace(-2, 2, h, dtype=np.float32)
    W2 = RNG.normal(size=(h, n)).astype(np.float32)
    nodes = [
        O.make_node("MatMul", ["x", "w1"], ["h0"], name="mm1"),
        O.make_node("Add", ["h0", "b1"], ["h1"], name="add1"),
        O.make_node("Relu", ["h1"], ["h2"], name="act"),
        O.make_node("MatMul", ["h2", "w2"], ["y"], name="mm2"),
    ]
    g = O.make_graph(
        nodes, "cle",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [64, k])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(W1, "w1"), O.from_array(b1, "b1"),
                     O.from_array(W2, "w2")])
    return O.make_model(g)


def test_equalize_exact_float_and_better_int8():
    m = _imbalanced_mlp()
    x = RNG.normal(size=(64, 16)).astype(np.float32)

    plain = nq.Model.from_onnx(m)
    y_ref = plain([x])[0]
    q_plain = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    err_plain = np.abs(q_plain([x])[0] - y_ref).mean()

    eq = nq.Model.from_onnx(m)
    assert eq.equalize() == 1
    np.testing.assert_allclose(eq([x])[0], y_ref, rtol=1e-4, atol=1e-4)
    # channel ranges really balanced: the paired weights' per-channel
    # amax now agree (the CLE fixed point)
    w1 = np.asarray(next(v for v in eq.values if v.name == "w1").data.data)
    w2 = np.asarray(next(v for v in eq.values if v.name == "w2").data.data)
    np.testing.assert_allclose(np.abs(w1).max(0), np.abs(w2).max(1),
                               rtol=1e-4)

    # the producer chain's quantized fidelity is what CLE buys: the
    # intermediate activation error shrinks by an order of magnitude
    # (the imbalanced channels no longer set W1's and h's per-tensor
    # scales); the END-to-end error is then bounded by the consumer,
    # so assert big intermediate wins + strict no-regress end-to-end
    # (single-pair toys cannot show the deep-net compounding the paper
    # measures)
    from numpy_quant_tpu.utils.parity import record_all_values
    q_eq = eq.quantize([x], bit_width=8)
    qp_acts = record_all_values(q_plain, [x])
    p_acts = record_all_values(plain, [x])
    qe_acts = record_all_values(q_eq, [x])
    e_acts = record_all_values(eq, [x])
    mid_plain = np.abs(qp_acts["h2"] - p_acts["h2"]).mean()
    mid_eq = np.abs(qe_acts["h2"] - e_acts["h2"]).mean()
    assert mid_eq < mid_plain / 3, (mid_eq, mid_plain)
    err_eq = np.abs(q_eq([x])[0] - y_ref).mean()
    assert err_eq <= err_plain * 1.02, (err_eq, err_plain)


def test_equalize_cnn_zoo_conv_chain():
    """The CNN zoo's Conv -> Relu -> MaxPool -> Conv chain equalizes
    through the pooling op (positively homogeneous per channel); float
    outputs unchanged, int8 error does not regress."""
    from numpy_quant_tpu.models.cnn import cnn_classifier

    m = cnn_classifier(batch=4, image_size=16, n_classes=5, seed=0)
    model = nq.Model.from_onnx(m)
    x = RNG.normal(size=(4, 3, 16, 16)).astype(np.float32)
    y_ref = model([x])[0]
    assert model.equalize() >= 1
    np.testing.assert_allclose(model([x])[0], y_ref, rtol=1e-3, atol=1e-4)

    q_plain = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    base = np.abs(q_plain([x])[0] - y_ref).mean()
    q_eq = model.quantize([x], bit_width=8)
    eq_err = np.abs(q_eq([x])[0] - y_ref).mean()
    assert eq_err <= base * 1.2, (eq_err, base)


def test_equalize_skips_exposed_intermediate():
    """Any value between the pair that is ALSO a graph output must stop
    the rescale -- equalizing would change observable outputs
    (code-review regression)."""
    W1 = RNG.normal(size=(8, 8)).astype(np.float32) \
        * np.logspace(-1, 1, 8, dtype=np.float32)[None, :]
    W2 = RNG.normal(size=(8, 4)).astype(np.float32)
    nodes = [
        O.make_node("MatMul", ["x", "w1"], ["h0"], name="mm1"),
        O.make_node("Relu", ["h0"], ["h1"], name="act"),
        O.make_node("MatMul", ["h1", "w2"], ["y"], name="mm2"),
    ]
    g = O.make_graph(
        nodes, "cle3",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [4, 8])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None),
         O.make_tensor_value_info("h1", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(W1, "w1"), O.from_array(W2, "w2")])
    model = nq.Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(4, 8)).astype(np.float32)
    base = model([x])
    assert model.equalize() == 0
    for got, want in zip(model([x]), base):
        np.testing.assert_array_equal(got, want)


def test_equalize_requires_homogeneous_link():
    """A Sigmoid between the layers does NOT commute with per-channel
    scaling: the pair must be left untouched."""
    W1 = RNG.normal(size=(8, 8)).astype(np.float32)
    W2 = RNG.normal(size=(8, 4)).astype(np.float32)
    nodes = [
        O.make_node("MatMul", ["x", "w1"], ["h0"], name="mm1"),
        O.make_node("Sigmoid", ["h0"], ["h1"], name="act"),
        O.make_node("MatMul", ["h1", "w2"], ["y"], name="mm2"),
    ]
    g = O.make_graph(
        nodes, "cle2",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [4, 8])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(W1, "w1"), O.from_array(W2, "w2")])
    model = nq.Model.from_onnx(O.make_model(g))
    assert model.equalize() == 0
