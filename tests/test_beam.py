"""One-program beam search (utils/generate.py::beam_search) against an
independent token-by-token torch beam oracle, plus degenerate-case and
EOS-freezing properties. The reference framework has no generation
surface (SURVEY.md §5); this is parity-plus.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.gpt import gpt_causal_lm
from numpy_quant_tpu.models.llama import llama_causal_lm
from numpy_quant_tpu.utils import beam_search, generate

RNG = np.random.default_rng(37)


def _torch_beam(module, prompt, n_new, w, eos_id=None):
    """Same algorithm, independent implementation: full re-forward per
    step through the torch module, numpy candidate expansion."""
    import torch

    batch, t0 = prompt.shape
    vocab = module.config.vocab_size
    ids = np.repeat(prompt[:, None, :], w, axis=1).astype(np.int64)
    scores = np.full((batch, w), -1e30, np.float32)
    scores[:, 0] = 0.0
    done = np.zeros((batch, w), bool)
    for _ in range(n_new):
        flat = ids.reshape(batch * w, -1)
        with torch.no_grad():
            logits = module(input_ids=torch.from_numpy(flat)).logits
        logp = torch.log_softmax(logits[:, -1, :].float(), -1) \
            .numpy().reshape(batch, w, vocab)
        cand = scores[:, :, None] + logp
        if eos_id is not None:
            frozen = np.full((batch, w, vocab), -1e30, np.float32)
            frozen[:, :, eos_id] = scores
            cand = np.where(done[:, :, None], frozen, cand)
        flatc = cand.reshape(batch, w * vocab)
        top = np.argsort(-flatc, axis=1, kind="stable")[:, :w]
        scores = np.take_along_axis(flatc, top, axis=1)
        beam_idx, tok = top // vocab, top % vocab
        b = np.arange(batch)[:, None]
        ids = np.concatenate([ids[b, beam_idx], tok[:, :, None]], axis=2)
        if eos_id is not None:
            done = done[b, beam_idx] | (tok == eos_id)
    return ids.astype(np.int32), scores


def test_beam_matches_torch_oracle():
    """B=2 prompts x W=2 beams over a batch-4 GPT graph."""
    proto = gpt_causal_lm(batch_size=4, seq_len=16, seed=0)
    model = nq.Model.from_onnx(proto)
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    ids, scores = beam_search(model, prompt, proto._wte,
                              max_new_tokens=7, num_beams=2)
    want_ids, want_scores = _torch_beam(proto._torch_module, prompt, 7, 2)
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_allclose(scores, want_scores, atol=1e-4)
    # best-first ordering
    assert (np.diff(scores, axis=1) <= 0).all()


def test_beam_matches_torch_oracle_llama_eos():
    """W=3 beams, single prompt, EOS freezing, on the LLaMA graph."""
    proto = llama_causal_lm(batch_size=3, seq_len=16, seed=0)
    model = nq.Model.from_onnx(proto)
    prompt = RNG.integers(0, 96, size=(1, 4)).astype(np.int32)
    eos = 7
    ids, scores = beam_search(model, prompt, proto._wte,
                              max_new_tokens=8, num_beams=3, eos_id=eos)
    want_ids, want_scores = _torch_beam(proto._torch_module, prompt, 8, 3,
                                        eos_id=eos)
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_allclose(scores, want_scores, atol=1e-4)
    # once EOS appears in a beam, everything after it is EOS
    for bm in range(3):
        row = ids[0, bm, 4:]
        hits = np.flatnonzero(row == eos)
        if hits.size:
            assert (row[hits[0]:] == eos).all()


def test_beam_width_one_is_greedy():
    proto = gpt_causal_lm(batch_size=2, seq_len=16, seed=1)
    model = nq.Model.from_onnx(proto)
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    greedy = generate(model, prompt, proto._wte, max_new_tokens=6)
    ids, _ = beam_search(model, prompt, proto._wte,
                         max_new_tokens=6, num_beams=1)
    np.testing.assert_array_equal(ids[:, 0, :], greedy)


def test_beam_batch_and_bounds_validation():
    proto = gpt_causal_lm(batch_size=4, seq_len=16, seed=0)
    model = nq.Model.from_onnx(proto)
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    with pytest.raises(ValueError):  # 2 prompts x 3 beams != batch 4
        beam_search(model, prompt, proto._wte, 4, num_beams=3)
    with pytest.raises(ValueError):  # 5 + 12 > 16
        beam_search(model, prompt, proto._wte, 12, num_beams=2)


def test_beam_quantized():
    """Beam search drives the int8 executor; tokens broadly agree with
    the float search (random-weight logits make exact parity brittle)."""
    proto = gpt_causal_lm(batch_size=4, seq_len=16, seed=0)
    model = nq.Model.from_onnx(proto)
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    f_ids, _ = beam_search(model, prompt, proto._wte, 6, num_beams=2)

    calib = np.take(proto._wte, RNG.integers(0, 96, size=(4, 16)), axis=0)
    q = model.quantize([calib.astype(np.float32)], bit_width=8)
    q_ids, q_scores = beam_search(q, prompt, proto._wte, 6, num_beams=2)
    assert q_ids.shape == f_ids.shape
    np.testing.assert_array_equal(q_ids[:, :, :5],
                                  np.repeat(prompt[:, None], 2, axis=1))
    assert (np.diff(q_scores, axis=1) <= 0).all()
    assert (q_ids == f_ids).mean() >= 0.5
