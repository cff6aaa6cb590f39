"""Model.awq_scale_weights: AWQ-style activation-aware weight scaling
(arXiv:2306.00978). Grid-searched exact reparameterization that
protects the weight channels multiplying salient activations before
weight-only quantization.
"""
import numpy as np

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(41)


def _ln_matmul_model(k=32, n=16, salient_gain=80.0):
    """x -> LayerNormalization(gamma with SALIENT channels) -> MatMul.
    A few activation channels are far larger than the rest while the
    weight rows reading them are ordinary -- the regime where uniform
    weight rounding wastes output accuracy on the channels that matter
    most (the AWQ paper's motivating observation)."""
    gamma = np.ones(k, np.float32)
    gamma[::7] = salient_gain
    beta = RNG.normal(size=k).astype(np.float32) * 0.1
    W = RNG.normal(size=(k, n)).astype(np.float32)
    nodes = [
        O.make_node("LayerNormalization", ["x", "gamma", "beta"], ["h"],
                    name="ln", axis=-1),
        O.make_node("MatMul", ["h", "w"], ["y"], name="mm"),
    ]
    g = O.make_graph(
        nodes, "awq",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [64, k])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(gamma, "gamma"),
                     O.from_array(beta, "beta"), O.from_array(W, "w")])
    return O.make_model(g)


def _w4_error(model_proto, x, awq=False, **qw):
    model = nq.Model.from_onnx(model_proto)
    y_ref = model([x])[0]
    chosen = None
    if awq:
        chosen = model.awq_scale_weights(
            [x], bit_width=qw.get("bit_width", 4),
            group_size=qw.get("group_size"))
        # the reparameterization is exact in float
        np.testing.assert_allclose(model([x])[0], y_ref,
                                   rtol=1e-4, atol=1e-4)
    assert model.quantize_weights(**qw) == 1
    err = np.abs(np.asarray(model([x])[0]) - y_ref).mean()
    return err, chosen


def test_awq_beats_plain_w4():
    """With salient activation channels, the grid-searched scaling
    strictly reduces W4 weight-only reconstruction error, and the float
    function is unchanged up to rounding."""
    m = _ln_matmul_model()
    x = RNG.normal(size=(64, 32)).astype(np.float32)

    err_plain, _ = _w4_error(m, x, awq=False, bit_width=4)
    err_awq, chosen = _w4_error(m, x, awq=True, bit_width=4)
    assert chosen and chosen.get("ln", 0) > 0, chosen
    assert err_awq < err_plain * 0.9, (err_awq, err_plain)


def test_awq_grouped_scales():
    """The search replicates quantize_weights' GROUPED scale choice
    when group_size is passed, and still helps in the salient regime."""
    m = _ln_matmul_model()
    x = RNG.normal(size=(64, 32)).astype(np.float32)

    err_plain, _ = _w4_error(m, x, awq=False, bit_width=4, group_size=8)
    err_awq, chosen = _w4_error(m, x, awq=True, bit_width=4,
                                group_size=8)
    assert chosen and isinstance(chosen.get("ln"), float)
    assert err_awq < err_plain, (err_awq, err_plain)


def test_awq_alpha_zero_leaves_weights_alone():
    """Uniform activation magnitudes give an exactly-flat grid (every
    s normalizes to 1), so alpha 0 wins the tie and nothing changes."""
    gamma = np.ones(8, np.float32)
    nodes = [
        O.make_node("LayerNormalization", ["x", "gamma"], ["h"],
                    name="ln", axis=-1),
        O.make_node("MatMul", ["h", "w"], ["y"], name="mm"),
    ]
    W = RNG.normal(size=(8, 4)).astype(np.float32)
    g = O.make_graph(
        nodes, "awq0",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [16, 8])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(gamma, "gamma"),
                     O.from_array(W, "w")])
    model = nq.Model.from_onnx(O.make_model(g))
    # balanced +/-1 rows: LN (mean 0, var 1) rescales uniformly, so the
    # RECORDED LN output has exactly-equal channel maxima -> flat grid
    base = np.array([1, -1] * 4, np.float32)
    x = np.stack([RNG.permutation(base) for _ in range(16)])
    chosen = model.awq_scale_weights([x], bit_width=4)
    assert chosen == {"ln": 0.0}, chosen
    w = next(v for v in model.values if v.name == "w")
    np.testing.assert_array_equal(np.asarray(w.data.data), W)


def test_awq_vit_fixture_composes():
    """On the trained ViT fixture: AWQ before W4 weight-only keeps task
    accuracy at least as good as plain W4, with float outputs intact."""
    from numpy_quant_tpu.models import fixtures as F

    m = F.trained_vit_onnx(batch_size=16)
    x, labels = F.make_batch(np.random.default_rng(10), 16)

    plain = nq.Model.from_onnx(m)
    y_ref = plain([x])[0]
    plain.quantize_weights(bit_width=4)
    acc_plain = (np.asarray(plain([x])[0]).argmax(-1) == labels).mean()

    model = nq.Model.from_onnx(m)
    chosen = model.awq_scale_weights([x], bit_width=4)
    assert len(chosen) >= 8, chosen
    np.testing.assert_allclose(model([x])[0], y_ref, rtol=1e-3,
                               atol=1e-3)
    model.quantize_weights(bit_width=4)
    acc_awq = (np.asarray(model([x])[0]).argmax(-1) == labels).mean()
    assert acc_awq >= acc_plain - 1e-9, (acc_awq, acc_plain)


def test_awq_covers_rmsnorm_models():
    """The group matcher recognizes the decomposed RMSNorm idiom
    (LLaMA/T5/Mamba), so AWQ/SmoothQuant apply to modern-LLM graphs:
    the float function stays put and W4 grouped error does not get
    worse."""
    from numpy_quant_tpu.models.llama import llama_causal_lm
    from numpy_quant_tpu.smoothquant import ln_matmul_groups

    proto = llama_causal_lm(batch_size=2, seq_len=12, seed=0)
    model = nq.Model.from_onnx(proto)
    groups = ln_matmul_groups(model)
    # 2 layers x (input_norm -> q/k/v, post_norm -> gate/up); the final
    # norm feeds the lm head
    assert len(groups) >= 4, len(groups)

    x = proto._wte[np.random.default_rng(5).integers(
        0, 96, size=(2, 12))].astype(np.float32)
    y_ref = np.asarray(model([x])[0])
    chosen = model.awq_scale_weights([x], bit_width=4, group_size=8)
    assert len(chosen) >= 4
    np.testing.assert_allclose(np.asarray(model([x])[0]), y_ref,
                               rtol=1e-3, atol=1e-3)

    err_awq_model = model
    err_awq_model.quantize_weights(bit_width=4, group_size=8)
    err_awq = np.abs(np.asarray(err_awq_model([x])[0]) - y_ref).mean()
    plain = nq.Model.from_onnx(proto)
    plain.quantize_weights(bit_width=4, group_size=8)
    err_plain = np.abs(np.asarray(plain([x])[0]) - y_ref).mean()
    assert err_awq <= err_plain * 1.02, (err_awq, err_plain)


def test_awq_gemm_consumer_ignores_group_size():
    """quantize_weights only groups all-MatMul-consumed weights; the
    search must replicate that eligibility, so on a Gemm-consumed
    weight group_size= changes nothing (regression: the search used to
    optimize a grouped quantizer that would never be applied)."""
    gamma = np.ones(32, np.float32)
    gamma[::7] = 50.0
    W = RNG.normal(size=(16, 32)).astype(np.float32)  # transB [N, K]
    nodes = [
        O.make_node("LayerNormalization", ["x", "gamma"], ["h"],
                    name="ln", axis=-1),
        O.make_node("Gemm", ["h", "w"], ["y"], name="gm", transB=1),
    ]
    g = O.make_graph(
        nodes, "awqg",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [64, 32])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(gamma, "gamma"), O.from_array(W, "w")])
    m = O.make_model(g)
    x = RNG.normal(size=(64, 32)).astype(np.float32)

    m1 = nq.Model.from_onnx(m)
    c1 = m1.awq_scale_weights([x], bit_width=4, group_size=8)
    m2 = nq.Model.from_onnx(m)
    c2 = m2.awq_scale_weights([x], bit_width=4)
    assert c1 == c2, (c1, c2)
