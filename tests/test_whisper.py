"""Whisper-style speech encoder-decoder (models/whisper.py): Conv1d
mel frontend (the rank-3 ONNX Conv path), sinusoidal positions, pre-LN
layers, pre-scaled attention -- verified against the live transformers
module (reference test strategy, SURVEY.md §4), plus audio-input
generation through generate_seq2seq.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.whisper import (whisper_decoder,
                                            whisper_encoder,
                                            whisper_seq2seq)
from numpy_quant_tpu.utils import generate_seq2seq

RNG = np.random.default_rng(53)


@pytest.fixture(scope="module")
def whisper():
    m = whisper_seq2seq(batch_size=2, tgt_len=8, seed=0)
    return m, nq.Model.from_onnx(m)


def _feats(batch=2):
    return RNG.normal(size=(batch, 8, 30)).astype(np.float32) * 0.5


def test_conv1d_matches_torch():
    """Rank-3 ONNX Conv (the Whisper frontend op) vs torch conv1d,
    including stride 2 and grouping."""
    import torch

    x = RNG.normal(size=(2, 6, 20)).astype(np.float32)
    w = RNG.normal(size=(8, 3, 3)).astype(np.float32)
    b = RNG.normal(size=(8,)).astype(np.float32)
    from numpy_quant_tpu.onnx.builder import GraphBuilder

    g = GraphBuilder("conv1d")
    g.input("x", [2, 6, 20])
    wi, bi = g.init("w", w), g.init("b", b)
    g.node("Conv", ["x", wi, bi], out="y", pads=[1, 1], strides=[2],
           dilations=[1], group=2)
    g.output("y", [2, 8, 10])
    model = nq.Model.from_onnx(g.model())
    got = np.asarray(model([x])[0])
    with torch.no_grad():
        want = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=2, padding=1, groups=2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_whisper_encoder_matches_torch():
    """Conv1d frontend + GELU + sinusoidal positions + pre-LN layers."""
    import torch

    proto = whisper_encoder(batch_size=2, seed=0)
    model = nq.Model.from_onnx(proto)
    feats = _feats()
    got = model([feats])[0]
    with torch.no_grad():
        want = proto._torch_module.model.encoder(
            torch.from_numpy(feats)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_whisper_full_matches_torch(whisper):
    import torch

    proto, model = whisper
    feats = _feats()
    dtgt = RNG.normal(size=(2, 8, 32)).astype(np.float32)
    got = model([feats, dtgt])[0]
    with torch.no_grad():
        want = proto._torch_module(
            input_features=torch.from_numpy(feats),
            decoder_inputs_embeds=torch.from_numpy(dtgt)).logits.numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_whisper_generation_matches_torch_greedy():
    """Audio-conditioned generation: generate_seq2seq takes the FLOAT
    feature array as the encoder input; greedy ids match the
    token-by-token torch loop."""
    import torch

    enc_proto = whisper_encoder(batch_size=2, seed=0)
    dec_proto = whisper_decoder(batch_size=2, tgt_len=8, seed=0)
    enc = nq.Model.from_onnx(enc_proto)
    dec = nq.Model.from_onnx(dec_proto)
    module = enc_proto._torch_module
    start = module.config.decoder_start_token_id
    feats = _feats()

    ids = np.full((2, 1), start, np.int64)
    with torch.no_grad():
        for _ in range(6):
            logits = module(input_features=torch.from_numpy(feats),
                            decoder_input_ids=torch.from_numpy(ids)).logits
            nxt = logits[:, -1, :].argmax(-1).numpy()
            ids = np.concatenate([ids, nxt[:, None]], axis=1)

    got = generate_seq2seq(enc, dec, feats, enc_proto._wte,
                           max_new_tokens=6, decoder_start_id=start)
    np.testing.assert_array_equal(got, ids)


def test_whisper_fuses_bit_identical(whisper):
    """Encoder self (pre-scaled), decoder self (pre-scaled + causal)
    and cross attention all fuse head-split, bit-identically."""
    _, model = whisper
    feats = _feats()
    dtgt = RNG.normal(size=(2, 8, 32)).astype(np.float32)
    q = model.quantize([feats, dtgt], bit_width=8)
    base = np.asarray(q([feats, dtgt])[0])

    rep = q.optimize()
    assert rep["fuse_attention"] == 6, rep
    assert rep["fusion_failures"] == []
    np.testing.assert_array_equal(np.asarray(q([feats, dtgt])[0]), base)


def test_whisper_quantized_accuracy(whisper):
    _, model = whisper
    feats = _feats()
    dtgt = RNG.normal(size=(2, 8, 32)).astype(np.float32)
    f = np.asarray(model([feats, dtgt])[0])
    q = model.quantize([feats, dtgt], bit_width=8)
    q.optimize()
    got = np.asarray(q([feats, dtgt])[0])
    assert np.abs(got - f).mean() <= 0.1


def test_whisper_kv_decode_matches_full_form():
    """The seq2seq KV-cache step graph (cross-attention over the
    loop-invariant encoder memory, self-attention against the cache)
    decodes the same greedy tokens as the full-form loop and torch."""
    import torch

    from numpy_quant_tpu.models.whisper import whisper_decode_step
    from numpy_quant_tpu.utils import generate_kv

    enc_proto = whisper_encoder(batch_size=2, seed=0)
    enc = nq.Model.from_onnx(enc_proto)
    step_proto = whisper_decode_step(batch_size=2, max_len=8, seed=0)
    step = nq.Model.from_onnx(step_proto)
    module = enc_proto._torch_module
    start = module.config.decoder_start_token_id
    feats = _feats()

    ids = np.full((2, 1), start, np.int64)
    with torch.no_grad():
        for _ in range(6):
            logits = module(input_features=torch.from_numpy(feats),
                            decoder_input_ids=torch.from_numpy(ids)).logits
            nxt = logits[:, -1, :].argmax(-1).numpy()
            ids = np.concatenate([ids, nxt[:, None]], axis=1)

    memory = np.asarray(enc([feats])[0])
    prompt = np.full((2, 1), start, np.int32)
    got = generate_kv(step, prompt, step_proto._wte, step_proto._wpe,
                      max_new_tokens=6, memory=memory)
    np.testing.assert_array_equal(got, ids)


def test_whisper_kv_decode_quantized():
    """int8 PTQ of the step graph via memory-aware decode_calibration;
    the int8 KV cache stays bit-identical to the float-carry run."""
    from numpy_quant_tpu.models.whisper import whisper_decode_step
    from numpy_quant_tpu.utils import (decode_calibration, generate_kv,
                                       merge_calibration_stats)

    enc_proto = whisper_encoder(batch_size=2, seed=0)
    enc = nq.Model.from_onnx(enc_proto)
    step_proto = whisper_decode_step(batch_size=2, max_len=8, seed=0)
    step = nq.Model.from_onnx(step_proto)
    start = enc_proto._torch_module.config.decoder_start_token_id
    feats = _feats()
    memory = np.asarray(enc([feats])[0])
    prompt = np.concatenate(
        [np.full((2, 1), start, np.int32),
         RNG.integers(0, 96, size=(2, 2)).astype(np.int32)], axis=1)

    f_seq = generate_kv(step, prompt, step_proto._wte, step_proto._wpe,
                        max_new_tokens=4, memory=memory)

    batches = decode_calibration(step, prompt, step_proto._wte,
                                 step_proto._wpe, memory=memory)
    stats = merge_calibration_stats(
        *[step.calibration_stats(b) for b in batches])
    qstep = step.quantize(stats=stats, bit_width=8)
    q_seq = generate_kv(qstep, prompt, step_proto._wte, step_proto._wpe,
                        max_new_tokens=4, memory=memory)
    assert q_seq.shape == f_seq.shape
    np.testing.assert_array_equal(q_seq[:, :3], prompt)
    assert (q_seq == f_seq).mean() >= 0.6

    q8 = generate_kv(qstep, prompt, step_proto._wte, step_proto._wpe,
                     max_new_tokens=4, memory=memory,
                     kv_cache_dtype="int8")
    np.testing.assert_array_equal(q8, q_seq)
