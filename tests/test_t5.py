"""T5-style encoder-decoder (models/t5.py): relative position bias,
unscaled attention, T5LayerNorm, tied lm head -- verified against the
live transformers module (reference test strategy, SURVEY.md §4), plus
the score-bias attention fusion: the per-head bias constant rides into
the fused kernel as a VMEM operand (kernels/attention.py score_bias)
bit-identically to the unfused graph.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.t5 import (t5_conditional_generation,
                                       t5_encoder)

RNG = np.random.default_rng(47)


@pytest.fixture(scope="module")
def t5enc():
    m = t5_encoder(batch_size=2, seq_len=12, seed=0)
    return m, nq.Model.from_onnx(m)


@pytest.fixture(scope="module")
def t5full():
    m = t5_conditional_generation(batch_size=2, src_len=12, tgt_len=8,
                                  seed=0)
    return m, nq.Model.from_onnx(m)


def test_t5_encoder_matches_torch(t5enc):
    """Relative-bias attention + T5LayerNorm graph vs the module's own
    forward."""
    import torch

    proto, model = t5enc
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    got = model([embeds])[0]
    with torch.no_grad():
        want = proto._torch_module(
            inputs_embeds=torch.from_numpy(embeds)).last_hidden_state
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_t5_full_matches_torch(t5full):
    """Encoder + causal-biased decoder + bias-free cross-attention +
    tied scaled lm head, in one graph, vs the module."""
    import torch

    proto, model = t5full
    src = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    tgt = RNG.normal(size=(2, 8, 32)).astype(np.float32)
    got = model([src, tgt])[0]
    with torch.no_grad():
        want = proto._torch_module(
            inputs_embeds=torch.from_numpy(src),
            decoder_inputs_embeds=torch.from_numpy(tgt)).logits
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_t5_decoder_causality(t5full):
    """The combined bias+mask constant really masks future positions."""
    proto, model = t5full
    src = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    tgt = RNG.normal(size=(2, 8, 32)).astype(np.float32)
    base = np.asarray(model([src, tgt])[0])
    pert = tgt.copy()
    pert[:, 5:, :] += 1.0
    out = np.asarray(model([src, pert])[0])
    np.testing.assert_array_equal(out[:, :5], base[:, :5])
    assert not np.allclose(out[:, 5:], base[:, 5:])


def test_relative_bias_fuses_bit_identical(t5enc):
    """Every encoder Softmax fuses through the head-split pattern WITH
    the bias constant as a kernel operand; the fused executor is
    bit-identical to the unfused quantized graph."""
    _, model = t5enc
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    q = model.quantize([embeds], bit_width=8)
    base = np.asarray(q([embeds])[0])

    rep = q.optimize()
    assert rep["fuse_attention"] == 2, rep
    assert rep["fusion_failures"] == []
    assert q.fusion_report.get("plain_fusions", []) == []
    fnodes = [n for n in q.nodes if n.op == "FusedAttentionHS"]
    assert len(fnodes) == 2
    # the bias constant rides as the 4th input
    assert all(len(n.inputs) == 4 for n in fnodes)

    np.testing.assert_array_equal(np.asarray(q([embeds])[0]), base)


def test_t5_full_fuses_bit_identical(t5full):
    """Decoder self-attention (combined bias+causal constant), encoder
    self-attention (pure bias) and cross-attention (pre-scaled, no
    bias) ALL fuse head-split; fused == unfused bit-for-bit."""
    _, model = t5full
    src = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    tgt = RNG.normal(size=(2, 8, 32)).astype(np.float32)
    q = model.quantize([src, tgt], bit_width=8)
    base = np.asarray(q([src, tgt])[0])

    rep = q.optimize()
    # 2 encoder self + 2 decoder self + 2 cross
    assert rep["fuse_attention"] == 6, rep
    assert rep["fusion_failures"] == []
    fnodes = [n for n in q.nodes if n.op == "FusedAttentionHS"]
    assert len(fnodes) == 6
    biased = [n for n in fnodes if len(n.inputs) == 4]
    assert len(biased) == 4  # encoder self + decoder self carry bias

    np.testing.assert_array_equal(np.asarray(q([src, tgt])[0]), base)


def test_t5_quantized_accuracy(t5enc):
    """int8 encoder tracks the float encoder (self-consistency bound,
    reference test_quantization.py idiom)."""
    _, model = t5enc
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    f = np.asarray(model([embeds])[0])
    q = model.quantize([embeds], bit_width=8)
    q.optimize()
    got = np.asarray(q([embeds])[0])
    assert np.abs(got - f).mean() <= 0.1


def _t5_torch_greedy(module, src_emb, start_id, n_new):
    """Token-by-token full re-forward greedy loop (the oracle)."""
    import torch

    ids = np.full((src_emb.shape[0], 1), start_id, dtype=np.int64)
    for _ in range(n_new):
        with torch.no_grad():
            logits = module(
                inputs_embeds=torch.from_numpy(src_emb),
                decoder_input_ids=torch.from_numpy(ids)).logits
        nxt = logits[:, -1, :].argmax(-1).numpy()
        ids = np.concatenate([ids, nxt[:, None]], axis=1)
    return ids.astype(np.int32)


def test_t5_kv_decode_matches_torch():
    """The T5 KV-cache step graph decodes the same greedy tokens as
    torch's full re-forward loop. The query-position-dependent relative
    bias enters per step through generate_kv's score_bias= table row
    (the self column is relative distance 0)."""
    import torch

    from numpy_quant_tpu.models.t5 import t5_decode_step
    from numpy_quant_tpu.utils import generate_kv

    step_proto = t5_decode_step(batch_size=2, max_len=8, src_len=12,
                                seed=0)
    step = nq.Model.from_onnx(step_proto)
    module = step_proto._torch_module
    wte = step_proto._wte
    src = RNG.integers(4, 96, size=(2, 12)).astype(np.int64)
    src_emb = wte[src].astype(np.float32)
    start = int(module.config.pad_token_id)  # T5 decoder_start = pad
    want = _t5_torch_greedy(module, src_emb, start, 6)

    with torch.no_grad():
        memory = module.encoder(
            inputs_embeds=torch.from_numpy(src_emb)
        ).last_hidden_state.numpy()
    prompt = np.full((2, 1), start, np.int32)
    got = generate_kv(step, prompt, wte, None, max_new_tokens=6,
                      score_bias=step_proto._decode_bias, memory=memory)
    np.testing.assert_array_equal(got, want)


def test_t5_kv_decode_quantized():
    """int8 PTQ of the T5 step graph via score-bias-aware
    decode_calibration; the int8 KV cache stays bit-identical to the
    float-carry run."""
    import torch

    from numpy_quant_tpu.models.t5 import t5_decode_step
    from numpy_quant_tpu.utils import (decode_calibration, generate_kv,
                                       merge_calibration_stats)

    step_proto = t5_decode_step(batch_size=2, max_len=8, src_len=12,
                                seed=0)
    step = nq.Model.from_onnx(step_proto)
    module = step_proto._torch_module
    wte = step_proto._wte
    bias = step_proto._decode_bias
    start = int(module.config.pad_token_id)  # T5 decoder_start = pad
    src = RNG.integers(4, 96, size=(2, 12)).astype(np.int64)
    src_emb = wte[src].astype(np.float32)
    with torch.no_grad():
        memory = module.encoder(
            inputs_embeds=torch.from_numpy(src_emb)
        ).last_hidden_state.numpy()
    prompt = np.concatenate(
        [np.full((2, 1), start, np.int32),
         RNG.integers(4, 96, size=(2, 2)).astype(np.int32)], axis=1)

    f_seq = generate_kv(step, prompt, wte, None, max_new_tokens=4,
                        score_bias=bias, memory=memory)

    batches = decode_calibration(step, prompt, wte, None,
                                 score_bias=bias, memory=memory)
    stats = merge_calibration_stats(
        *[step.calibration_stats(b) for b in batches])
    qstep = step.quantize(stats=stats, bit_width=8)
    q_seq = generate_kv(qstep, prompt, wte, None, max_new_tokens=4,
                        score_bias=bias, memory=memory)
    assert q_seq.shape == f_seq.shape
    np.testing.assert_array_equal(q_seq[:, :3], prompt)
    assert (q_seq == f_seq).mean() >= 0.6

    q8 = generate_kv(qstep, prompt, wte, None, max_new_tokens=4,
                     score_bias=bias, memory=memory,
                     kv_cache_dtype="int8")
    np.testing.assert_array_equal(q8, q_seq)
