"""Model.rotate_vo: QuaRot-style orthogonal V/O rotation
(arXiv:2404.00456 R2). Exact float reparameterization that spreads
V-channel outliers before per-tensor weight quantization.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.graph import Constant
from numpy_quant_tpu.models.vit import vit_layer

RNG = np.random.default_rng(43)


def _spike_value_weight(model, name_part: str, col: int, gain: float):
    """Multiply one output column of the matched weight constant -- the
    outlier-channel regime per-tensor quantization collapses under."""
    for v in model.values:
        if isinstance(v, Constant) and name_part in v.name \
                and getattr(v.data, "data", None) is not None \
                and np.asarray(v.data.data).ndim == 2:
            arr = np.asarray(v.data.data, np.float32).copy()
            arr[:, col] *= gain
            v.data = nq.FTensor(arr)
            return v.name
    raise AssertionError(f"no 2-D constant matching {name_part!r}")


def _w4_per_tensor_relerr(model, name_part: str) -> float:
    """Relative Frobenius fake-quant error of the matched weight under
    per-tensor symmetric 4-bit -- the quantity rotation provably
    shrinks (~sqrt(head_dim) for a single-channel outlier)."""
    from numpy_quant_tpu.quantization import qrange

    for v in model.values:
        if isinstance(v, Constant) and name_part in v.name \
                and getattr(v.data, "data", None) is not None \
                and np.asarray(v.data.data).ndim == 2:
            W = np.asarray(v.data.data, np.float32)
            min_q, max_q = qrange(4)
            scale = 2.0 * np.abs(W).max() / (max_q - min_q)
            Wq = np.rint(np.clip(W / scale, min_q, max_q)) * scale
            return float(np.linalg.norm(Wq - W) / np.linalg.norm(W))
    raise AssertionError(name_part)


def _incoherence(model, name_part: str) -> float:
    """mu = max|W| * sqrt(numel) / ||W||_F (QuaRot's incoherence
    measure) of the matched weight -- the quantity the Hadamard
    rotation provably shrinks."""
    for v in model.values:
        if isinstance(v, Constant) and name_part in v.name \
                and getattr(v.data, "data", None) is not None \
                and np.asarray(v.data.data).ndim == 2:
            W = np.asarray(v.data.data, np.float32)
            return float(np.abs(W).max() * np.sqrt(W.size)
                         / np.linalg.norm(W))
    raise AssertionError(name_part)


def test_rotation_exact_and_better_w4_per_tensor():
    """On a ViT layer with a spiked V channel: rotation leaves the
    float function unchanged (up to orthogonal-matmul rounding),
    halves the V weight's incoherence mu, and shrinks both its own
    per-tensor 4-bit error and the end-to-end per-tensor W4 error."""
    proto = vit_layer(1, 12, 4, 24, 16, 2, seed=0)
    x = RNG.normal(size=(1, 10, 16)).astype(np.float32)

    plain = nq.Model.from_onnx(proto)
    _spike_value_weight(plain, "value", col=3, gain=40.0)
    y_ref = np.asarray(plain([x])[0])
    mu_plain = _incoherence(plain, "value")
    snr_plain = _w4_per_tensor_relerr(plain, "value")

    rot = nq.Model.from_onnx(proto)
    _spike_value_weight(rot, "value", col=3, gain=40.0)
    assert rot.rotate_vo() == 1
    np.testing.assert_allclose(np.asarray(rot([x])[0]), y_ref,
                               rtol=2e-3, atol=2e-3)
    assert _incoherence(rot, "value") < mu_plain / 2
    snr_rot = _w4_per_tensor_relerr(rot, "value")
    assert snr_rot < snr_plain * 0.85, (snr_rot, snr_plain)

    plain.quantize_weights(bit_width=4, per_channel=False)
    err_plain = np.abs(np.asarray(plain([x])[0]) - y_ref).mean()
    rot.quantize_weights(bit_width=4, per_channel=False)
    err_rot = np.abs(np.asarray(rot([x])[0]) - y_ref).mean()
    assert err_rot < err_plain, (err_rot, err_plain)


def test_rotation_matches_gpt_split_qkv():
    """The merged-QKV Split idiom (GPT-2): only the v column block of
    c_attn rotates; greedy generation tokens are unchanged."""
    from numpy_quant_tpu.models.gpt import gpt_causal_lm
    from numpy_quant_tpu.utils import generate

    proto = gpt_causal_lm(batch_size=2, seq_len=12, seed=0)
    model = nq.Model.from_onnx(proto)
    prompt = RNG.integers(0, 96, size=(2, 4)).astype(np.int32)
    want = generate(model, prompt, proto._wte, max_new_tokens=6)

    rot = nq.Model.from_onnx(proto)
    assert rot.rotate_vo() == 2  # both layers
    got = generate(rot, prompt, proto._wte, max_new_tokens=6)
    np.testing.assert_array_equal(got, want)


def test_rotation_skips_unmatchable_graphs():
    """Decode-step graphs (cache-split attention) and GQA repeat_kv
    chains must be left untouched."""
    from numpy_quant_tpu.models.gpt import gpt_decode_step
    from numpy_quant_tpu.models.llama import llama_causal_lm

    step = nq.Model.from_onnx(gpt_decode_step(batch_size=2, max_len=8,
                                              seed=0))
    assert step.rotate_vo() == 0

    llama = nq.Model.from_onnx(llama_causal_lm(batch_size=1, seq_len=8,
                                               seed=0))
    # GQA expands k/v through repeat_kv; exactness cannot hold -> skip
    assert llama.rotate_vo() == 0


def test_rotation_composes_with_int8_ptq():
    """rotate_vo before full int8 PTQ on the trained ViT fixture keeps
    task accuracy (calibration happens after the rotation, so the new
    V ranges are measured)."""
    from numpy_quant_tpu.models import fixtures as F

    m = F.trained_vit_onnx(batch_size=16)
    x, labels = F.make_batch(np.random.default_rng(10), 16)

    model = nq.Model.from_onnx(m)
    y_ref = np.asarray(model([x])[0])
    n = model.rotate_vo()
    assert n >= 4, n
    np.testing.assert_allclose(np.asarray(model([x])[0]), y_ref,
                               rtol=2e-3, atol=2e-3)
    q = model.quantize([x], bit_width=8)
    acc = (np.asarray(q([x])[0]).argmax(-1) == labels).mean()
    f_acc = (y_ref.argmax(-1) == labels).mean()
    assert acc >= f_acc - 1e-9, (acc, f_acc)
