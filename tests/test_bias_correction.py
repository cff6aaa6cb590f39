"""QModel.correct_biases: empirical bias correction (PTQ accuracy
pass, AIMET-style -- arXiv:2201.08442 §IV).

Quantization shifts each weight layer's expected output; the per-
output-channel mean error over the calibration batch folds exactly into
the layer's additive bias. Most useful at low weight bit widths (W4A8),
where weight rounding error is the dominant quantization noise.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq

RNG = np.random.default_rng(13)


def test_correct_biases_gemm_w4():
    """W4A8 MLP (Gemm biases are 4x-bit-width integer payloads): the
    correction zeroes the per-channel mean error at each corrected
    layer up to bias-scale rounding, and shrinks the end-to-end error
    vs the float oracle on the calibration batch."""
    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = nq.Model.from_onnx(mlp)
    X = RNG.normal(size=(128, 2)).astype(np.float32)
    f_out = model([X])[0]

    q = model.quantize([X], bit_width=8, weight_bit_width=4)
    before = np.abs(q([X])[0] - f_out).mean()
    n = q.correct_biases(model, [X])
    assert n >= 2  # both Gemm layers corrected
    after_out = q([X])[0]
    after = np.abs(after_out - f_out).mean()
    assert after <= before + 1e-6, (after, before)
    # the OUTPUT layer's per-channel mean shift is near zero now:
    # bounded by half a bias-scale step plus the output requantize step
    shift = np.abs((after_out - f_out).mean(axis=0)).max()
    base_shift = np.abs((q([X])[0] - f_out).mean(axis=0)).max()
    assert shift <= max(base_shift, 0.05) + 1e-6


def test_correct_biases_matmul_add_form():
    """The exporter's linear form (MatMul + rank-1 constant Add, e.g.
    every ViT projection): the float bias absorbs the correction,
    measured at the Add output. Corrections apply, outputs improve, and
    a second pass is stable (returns and applies without error)."""
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from transformers import ViTConfig

    cfg = ViTConfig(image_size=16, patch_size=4, hidden_size=16,
                    num_attention_heads=2, intermediate_size=32,
                    num_hidden_layers=1, num_labels=4)
    mv = vit_image_classifier(config=cfg, batch_size=4, seed=0)
    model = nq.Model.from_onnx(mv)
    x = RNG.normal(size=(4, 3, 16, 16)).astype(np.float32)
    f_out = model([x])[0]

    q = model.quantize([x], bit_width=8, weight_bit_width=4)
    before = np.abs(q([x])[0] - f_out).mean()
    n = q.correct_biases(model, [x], passes=2)
    assert n >= 2 * 6  # qkv/out/fc1/fc2 Adds per layer, both passes
    after = np.abs(q([x])[0] - f_out).mean()
    assert after <= before + 1e-6, (after, before)


def test_correct_biases_trained_fixture_not_worse():
    """On the trained ViT fixture, W4A8 + bias correction keeps (or
    improves) task accuracy -- the pass must never break a working
    quantized model."""
    from numpy_quant_tpu.models import fixtures as F

    m = F.trained_vit_onnx(batch_size=32)
    model = nq.Model.from_onnx(m)
    rng = np.random.default_rng(3)
    x, labels = F.make_batch(rng, 32)
    calib, _ = F.make_batch(np.random.default_rng(4), 16)

    f_acc = (model([x])[0].argmax(-1) == labels).mean()
    q = model.quantize([calib], bit_width=8, weight_bit_width=4)
    base_acc = (q([x])[0].argmax(-1) == labels).mean()
    assert q.correct_biases(model, [calib]) > 0
    acc = (q([x])[0].argmax(-1) == labels).mean()
    assert acc >= base_acc - 1e-9, (acc, base_acc, f_acc)
