"""Model.smooth_outliers: SmoothQuant-style activation-outlier
migration (arXiv:2211.10438). An exact float reparameterization that
flattens LN-output channel ranges before per-tensor quantization.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(37)


def _ln_matmul_model(k=32, n=8, outlier_gain=150.0):
    """x -> LayerNormalization(gamma with OUTLIER channels) -> MatMul.
    The gamma spikes recreate the outlier-channel regime SmoothQuant
    targets: a few channels dominate the per-tensor activation range
    while the downstream weights read them only weakly (the LLM
    "attention-sink channel" shape) -- so per-tensor activation
    quantization destroys the small-channel signal the output actually
    depends on."""
    gamma = np.ones(k, np.float32)
    gamma[::11] = outlier_gain
    beta = RNG.normal(size=k).astype(np.float32) * 0.1
    W = RNG.normal(size=(k, n)).astype(np.float32)
    W[::11] *= 1e-3  # outlier channels barely feed the output
    nodes = [
        O.make_node("LayerNormalization", ["x", "gamma", "beta"], ["h"],
                    name="ln", axis=-1),
        O.make_node("MatMul", ["h", "w"], ["y"], name="mm"),
    ]
    g = O.make_graph(
        nodes, "sq",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [64, k])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(gamma, "gamma"),
                     O.from_array(beta, "beta"), O.from_array(W, "w")])
    return O.make_model(g)


def test_smooth_outliers_exact_float_and_better_int8():
    """Smoothing leaves the float function unchanged (up to
    reparameterization rounding) and shrinks int8 quantization error in
    the outlier-channel regime it targets."""
    m = _ln_matmul_model()
    x = RNG.normal(size=(64, 32)).astype(np.float32)

    plain = nq.Model.from_onnx(m)
    y_ref = plain([x])[0]
    q_plain = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    err_plain = np.abs(q_plain([x])[0] - y_ref).mean()

    smoothed = nq.Model.from_onnx(m)
    assert smoothed.smooth_outliers([x]) == 1
    np.testing.assert_allclose(smoothed([x])[0], y_ref,
                               rtol=1e-4, atol=1e-4)
    q_smooth = smoothed.quantize([x], bit_width=8)
    err_smooth = np.abs(q_smooth([x])[0] - y_ref).mean()
    assert err_smooth < err_plain * 0.7, (err_smooth, err_plain)


def test_smooth_outliers_skips_unabsorbable_consumers():
    """An LN whose output also feeds a non-MatMul consumer must be left
    untouched -- the 1/s migration would change that consumer's
    values."""
    gamma = np.ones(8, np.float32)
    nodes = [
        O.make_node("LayerNormalization", ["x", "gamma"], ["h"],
                    name="ln", axis=-1),
        O.make_node("MatMul", ["h", "w"], ["y0"], name="mm"),
        O.make_node("Relu", ["h"], ["y1"], name="act"),
    ]
    g = O.make_graph(
        nodes, "sq2",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [4, 8])],
        [O.make_tensor_value_info("y0", O.TensorProto.FLOAT, None),
         O.make_tensor_value_info("y1", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(gamma, "gamma"),
                     O.from_array(RNG.normal(size=(8, 4))
                                  .astype(np.float32), "w")])
    model = nq.Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(4, 8)).astype(np.float32)
    assert model.smooth_outliers([x]) == 0


def test_smooth_outliers_skips_exposed_ln_output():
    """An LN output that is ALSO a graph output must not rescale --
    smoothing would change observable outputs (code-review
    regression)."""
    gamma = np.ones(8, np.float32)
    gamma[0] = 50.0
    nodes = [
        O.make_node("LayerNormalization", ["x", "gamma"], ["h"],
                    name="ln", axis=-1),
        O.make_node("MatMul", ["h", "w"], ["y"], name="mm"),
    ]
    g = O.make_graph(
        nodes, "sq3",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [4, 8])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None),
         O.make_tensor_value_info("h", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(gamma, "gamma"),
                     O.from_array(RNG.normal(size=(8, 4))
                                  .astype(np.float32), "w")])
    model = nq.Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(4, 8)).astype(np.float32)
    assert model.smooth_outliers([x]) == 0


def test_smooth_outliers_vit_fixture_composes():
    """On the trained ViT fixture: smoothing covers the encoder LNs
    whose outputs feed only projections, float outputs stay put, and
    int8 quantization after smoothing keeps task accuracy."""
    from numpy_quant_tpu.models import fixtures as F

    m = F.trained_vit_onnx(batch_size=16)
    x, labels = F.make_batch(np.random.default_rng(10), 16)

    model = nq.Model.from_onnx(m)
    y_ref = model([x])[0]
    n = model.smooth_outliers([x])
    # each encoder layer's first LN feeds q/k/v, the second feeds fc1
    assert n >= 8, n
    np.testing.assert_allclose(model([x])[0], y_ref, rtol=1e-3, atol=1e-3)

    q = model.quantize([x], bit_width=8)
    acc = (q([x])[0].argmax(-1) == labels).mean()
    f_acc = (y_ref.argmax(-1) == labels).mean()
    assert acc >= f_acc - 1e-9, (acc, f_acc)
