"""LLaMA-style decoder (models/llama.py): RMSNorm + RoPE + SwiGLU +
grouped-query attention, verified against the live transformers module
(reference test strategy, SURVEY.md §4), plus the RoPE input layout of
generate_kv/decode_calibration and the quantized decode paths.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.llama import llama_causal_lm, llama_decode_step
from numpy_quant_tpu.utils import (decode_calibration, generate,
                                   generate_kv, merge_calibration_stats)

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def llama():
    m = llama_causal_lm(batch_size=2, seq_len=16, seed=0)
    return m, nq.Model.from_onnx(m)


def _torch_logits(module, embeds):
    import torch

    with torch.no_grad():
        return module(inputs_embeds=torch.from_numpy(embeds)).logits.numpy()


def _torch_greedy(module, prompt, n_new):
    import torch

    ids = prompt.copy()
    for _ in range(n_new):
        with torch.no_grad():
            logits = module(
                input_ids=torch.from_numpy(ids.astype(np.int64))).logits
        nxt = logits[:, -1, :].argmax(-1).numpy().astype(prompt.dtype)
        ids = np.concatenate([ids, nxt[:, None]], axis=1)
    return ids


def test_llama_logits_match_torch(llama):
    """RMSNorm/RoPE/SwiGLU/GQA graph vs the module's own forward."""
    proto, model = llama
    embeds = RNG.normal(size=(2, 16, 32)).astype(np.float32)
    got = model([embeds])[0]
    want = _torch_logits(proto._torch_module, embeds)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_llama_is_gqa(llama):
    """The fixture must actually exercise grouped-query attention."""
    proto, _ = llama
    cfg = proto._torch_module.config
    assert cfg.num_key_value_heads < cfg.num_attention_heads


def test_llama_causality(llama):
    proto, model = llama
    embeds = RNG.normal(size=(2, 16, 32)).astype(np.float32)
    base = np.asarray(model([embeds])[0])
    pert = embeds.copy()
    pert[:, 9:, :] += 1.0
    out = np.asarray(model([pert])[0])
    np.testing.assert_array_equal(out[:, :9], base[:, :9])
    assert not np.allclose(out[:, 9:], base[:, 9:])


def test_generate_greedy_matches_torch(llama):
    proto, model = llama
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    want = _torch_greedy(proto._torch_module, prompt, 8)
    got = generate(model, prompt, proto._wte, max_new_tokens=8)
    np.testing.assert_array_equal(got, want)


def test_decode_step_matches_full_form(llama):
    """The RoPE KV-cache step graph (wpe=None, cos/sin rows as inputs)
    decodes the same greedy tokens as the full graph and torch."""
    proto, _ = llama
    step_proto = llama_decode_step(batch_size=2, max_len=16, seed=0)
    step = nq.Model.from_onnx(step_proto)

    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    want = _torch_greedy(proto._torch_module, prompt, 8)
    got = generate_kv(step, prompt, step_proto._wte, None,
                      max_new_tokens=8, rope=step_proto._rope_tables)
    np.testing.assert_array_equal(got, want)

    with pytest.raises(ValueError):
        generate_kv(step, prompt, step_proto._wte, None,
                    max_new_tokens=14, rope=step_proto._rope_tables)


def test_decode_step_quantized():
    """int8 PTQ of the RoPE step graph: rope-aware decode_calibration,
    merged per-step stats, the one-program loop, and the int8 KV cache
    staying bit-identical to the float-carry run."""
    step_proto = llama_decode_step(batch_size=2, max_len=16, seed=0)
    step = nq.Model.from_onnx(step_proto)
    wte, rope = step_proto._wte, step_proto._rope_tables

    prompt = RNG.integers(0, 96, size=(2, 8)).astype(np.int32)
    f_seq = generate_kv(step, prompt, wte, None, max_new_tokens=6,
                        rope=rope)

    batches = decode_calibration(step, prompt, wte, None, rope=rope)
    stats = merge_calibration_stats(
        *[step.calibration_stats(b) for b in batches])
    qstep = step.quantize(stats=stats, bit_width=8)
    q_seq = generate_kv(qstep, prompt, wte, None, max_new_tokens=6,
                        rope=rope)
    assert q_seq.shape == f_seq.shape
    np.testing.assert_array_equal(q_seq[:, :8], prompt)
    assert (q_seq == f_seq).mean() >= 0.6

    q8_seq = generate_kv(qstep, prompt, wte, None, max_new_tokens=6,
                         rope=rope, kv_cache_dtype="int8")
    np.testing.assert_array_equal(q8_seq, q_seq)


def test_quantized_full_form(llama):
    """int8 PTQ of the full graph drives the same decode loop."""
    proto, model = llama
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    f_seq = generate(model, prompt, proto._wte, max_new_tokens=8)

    calib = np.take(proto._wte, RNG.integers(0, 96, size=(2, 16)), axis=0)
    q = model.quantize([calib.astype(np.float32)], bit_width=8)
    q_seq = generate(q, prompt, proto._wte, max_new_tokens=8)
    assert q_seq.shape == f_seq.shape
    assert (q_seq == f_seq).mean() >= 0.6


def test_causal_attention_fuses_bit_identical(llama):
    """RoPE/repeat_kv sit between head-split and scores, so the HS
    pattern cannot match -- the causal PLAIN fusion applies the
    additive mask in-kernel instead, bit-identically, and generation
    through the fused executor returns the same tokens."""
    proto, model = llama
    embeds = RNG.normal(size=(2, 16, 32)).astype(np.float32)
    q = model.quantize([embeds], bit_width=8)
    base = np.asarray(q([embeds])[0])
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    seq = generate(q, prompt, proto._wte, max_new_tokens=6)

    rep = q.optimize()
    assert rep["fuse_attention"] == 2, rep
    assert rep["fusion_failures"] == []
    assert len(q.fusion_report.get("plain_fusions", [])) == 2
    fnodes = [n for n in q.nodes if n.op == "FusedAttention"]
    assert len(fnodes) == 2
    assert all(n.attrs["causal_mask_val"] < -1e4 for n in fnodes)

    np.testing.assert_array_equal(np.asarray(q([embeds])[0]), base)
    np.testing.assert_array_equal(
        generate(q, prompt, proto._wte, max_new_tokens=6), seq)


def test_mistral_sliding_window_matches_torch():
    """Mistral-style banded causal mask: the llama emitter with a
    sliding window, verified against the live MistralForCausalLM."""
    import torch

    from numpy_quant_tpu.models.llama import mistral_causal_lm

    proto = mistral_causal_lm(batch_size=2, seq_len=16, seed=0)
    model = nq.Model.from_onnx(proto)
    assert proto._torch_module.config.sliding_window == 6
    embeds = RNG.normal(size=(2, 16, 32)).astype(np.float32)
    got = model([embeds])[0]
    with torch.no_grad():
        want = proto._torch_module(
            inputs_embeds=torch.from_numpy(embeds)).logits.numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_mistral_window_fuses_bit_identical():
    """The banded mask constant folds into the fused kernels'
    causal_window; fused == unfused bit-for-bit."""
    from numpy_quant_tpu.models.llama import mistral_causal_lm

    proto = mistral_causal_lm(batch_size=2, seq_len=16, seed=0)
    model = nq.Model.from_onnx(proto)
    embeds = RNG.normal(size=(2, 16, 32)).astype(np.float32)
    q = model.quantize([embeds], bit_width=8)
    base = np.asarray(q([embeds])[0])

    rep = q.optimize()
    assert rep["fuse_attention"] == 2, rep
    assert rep["fusion_failures"] == []
    fnodes = [n for n in q.nodes
              if n.op in ("FusedAttention", "FusedAttentionHS")]
    assert len(fnodes) == 2
    assert all(n.attrs.get("causal_window") == 6 for n in fnodes), \
        [n.attrs for n in fnodes]

    np.testing.assert_array_equal(np.asarray(q([embeds])[0]), base)
