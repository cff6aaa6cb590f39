"""ViT family: float parity vs torch, quantized error bounds, per-value
parity harness. Mirrors reference: test/test_inference.py:103-214,
test/test_quantization.py:190-244, test/long_running/test_vit.py:27-78
(torch forward replaces onnxruntime as the float oracle)."""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models import vit as V
from numpy_quant_tpu.utils import compare_all_values, record_all_values

from .oracle import onnx_shim, requires_reference

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(0)


def _torch_out(model_proto, x, attr=None):
    with torch.no_grad():
        out = model_proto._torch_module(torch.tensor(x))
    if attr is not None:
        out = getattr(out, attr)
    if isinstance(out, tuple):
        out = out[0]
    return out.numpy()


def test_vit_self_attention_float():
    # reference: test/test_inference.py:103-123 (atol 1e-6)
    m = V.vit_self_attention(1, 10, 16, 4)
    x = RNG.normal(size=(1, 10, 16)).astype(np.float32)
    actual = nq.Model.from_onnx(m)([x])[0]
    np.testing.assert_allclose(actual, _torch_out(m, x), atol=1e-6)


def test_vit_embedding_float():
    # reference: test/test_inference.py:125-144
    m = V.vit_embedding(1, 16, 4, 8)
    x = RNG.normal(size=(1, 3, 16, 16)).astype(np.float32)
    actual = nq.Model.from_onnx(m)([x])[0]
    np.testing.assert_allclose(actual, _torch_out(m, x), atol=1e-6)


def test_vit_layer_float():
    # reference: test/test_inference.py:146-168
    m = V.vit_layer(1, 16, 4, 22, 8, 2)
    x = RNG.normal(size=(1, 17, 8)).astype(np.float32)
    actual = nq.Model.from_onnx(m)([x])[0]
    np.testing.assert_allclose(actual, _torch_out(m, x), atol=1e-6)


def test_vit_pooler_float():
    # reference: test/test_inference.py:170-189
    m = V.vit_pooler(1, 16, 4, 8)
    x = RNG.normal(size=(1, 17, 8)).astype(np.float32)
    actual = nq.Model.from_onnx(m)([x])[0]
    np.testing.assert_allclose(actual, _torch_out(m, x), atol=1e-6)


def test_vit_full_float():
    # reference: test/test_inference.py:191-214 (atol 1e-4 e2e)
    m = V.vit(2, 16, 4, 22, 8, 2)
    x = RNG.normal(size=(2, 3, 16, 16)).astype(np.float32)
    actual = nq.Model.from_onnx(m)([x])[0]
    np.testing.assert_allclose(actual, _torch_out(m, x, "last_hidden_state"),
                               atol=1e-4)


def test_vit_self_attention_quantized():
    # reference: test/test_quantization.py:190-209 (mean err <= 0.01)
    m = V.vit_self_attention(1, 10, 16, 4)
    x = RNG.normal(size=(1, 10, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    actual = qmodel([x])[0]
    desired = model([x])[0]
    assert np.mean(np.abs(actual - desired)) <= 0.01


def test_vit_quantized_small():
    # reference: test/test_quantization.py:211-239 (mean err <= 0.1)
    m = V.vit(8, 96, 16, 156, 120, 4)
    x = RNG.normal(size=(8, 3, 96, 96)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    outputs, profile_results = model([x], profile=True)
    qoutputs, q_profile_results = qmodel([x], profile=True)
    mean_err = np.mean(np.abs(qoutputs[0] - outputs[0]))
    assert mean_err <= 0.1
    assert "TinyqQuant" in q_profile_results
    assert q_profile_results["MatMul"] >= 0.0


def test_vit_image_classifier():
    from transformers import ViTConfig
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=24,
                    num_attention_heads=4, intermediate_size=64,
                    num_hidden_layers=2, num_labels=10)
    m = V.vit_image_classifier(config=cfg, batch_size=None)
    # dynamic batch axis 'B' pinned like the reference does
    # (test/long_running/test_vit.py:117)
    nq.onnx.make_dim_param_fixed(m.graph, "B", 8)
    model = nq.Model.from_onnx(m)
    x = RNG.normal(size=(8, 3, 32, 32)).astype(np.float32)
    logits = model([x])[0]
    np.testing.assert_allclose(logits, _torch_out(m, x, "logits"), atol=1e-5)

    qmodel = model.quantize([x], bit_width=8)
    qlogits = qmodel([x])[0]
    # int8 label parity vs float (reference: test_vit.py:167)
    assert (qlogits.argmax(1) == logits.argmax(1)).mean() >= 0.8


@requires_reference
def test_vit_all_values_vs_reference():
    """Per-value parity harness on the small ViT: every intermediate
    tensor matches the reference interpreter at 4 decimals
    (reference: test_vit.py:27-58 'compare_all_nodes')."""
    ref_model_mod = onnx_shim()
    m = V.vit(1, 16, 4, 22, 8, 2)
    x = RNG.normal(size=(1, 3, 16, 16)).astype(np.float32)

    model = nq.Model.from_onnx(m)
    actual = record_all_values(model, [x])

    ref_model = ref_model_mod.Model.from_onnx(m)
    ref_model([x])
    desired = {}
    for v in ref_model.values:
        if v.data is not None:
            desired[v.name] = np.asarray(v.data.data)

    compare_all_values(actual, desired, decimal=4)


@requires_reference
def test_vit_quantized_all_values_vs_reference():
    """QModel per-value parity vs the reference quantized interpreter,
    with identical qparams injected (bit-exact integer tensors)."""
    ref_model_mod = onnx_shim()
    m = V.vit_self_attention(1, 10, 16, 4)
    x = RNG.normal(size=(1, 10, 16)).astype(np.float32)

    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    ref_qmodel = ref_model_mod.Model.from_onnx(m).quantize([x], bit_width=8)

    # inject the reference's qparams (calibration stats can differ by
    # 1 ulp of f32 -- FP-accumulation-order effects)
    qmodel.quant_params = {
        name: nq.QuantizationParams(np.float32(qp.scale), qp.zero_point)
        for name, qp in ref_qmodel.quant_params.items()}
    qmodel._jit_cache.clear()
    orig = {v.name: v for v in model.values}
    for v in qmodel.values:
        if isinstance(v, nq.Constant) and isinstance(v.data, nq.QTensor):
            ref_qt = {rv.name: rv for rv in ref_qmodel.values}[v.name].data
            v.data = nq.quantize_tensor(orig[v.name].data, ref_qt.bit_width,
                                        np.float32(ref_qt.scale),
                                        ref_qt.zero_point)

    qmodel([x], record=True)
    ref_qmodel([x])
    our_vals = {v.name: v for v in qmodel.values}
    n_int_checked = 0
    for ref_v in ref_qmodel.values:
        our_v = our_vals.get(ref_v.name)
        if our_v is None or our_v.data is None or ref_v.data is None:
            continue
        ours_d = np.asarray(our_v.data.data)
        refs_d = np.asarray(ref_v.data.data)
        if isinstance(our_v.data, nq.QTensor):
            np.testing.assert_array_equal(ours_d, refs_d, err_msg=ref_v.name)
            n_int_checked += 1
        else:
            np.testing.assert_allclose(ours_d, refs_d, atol=1e-5,
                                       err_msg=ref_v.name)
    assert n_int_checked >= 5  # the integer path was actually exercised
