"""BART-style encoder-decoder (models/seq2seq.py): graph parity against
the live transformers module, decoder causality + cross-attention
sensitivity, int8 quantization with ALL attentions fused bit-identically
(including cross-attention, the nq != nkv kernel case), and greedy
seq2seq generation parity against a token-by-token torch loop.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.seq2seq import (bart_decoder, bart_encoder,
                                            bart_seq2seq, bart_tiny_module)
from numpy_quant_tpu.utils import generate_seq2seq

RNG = np.random.default_rng(31)
B, S, T, H, V = 2, 12, 8, 32, 96


@pytest.fixture(scope="module")
def bart():
    m = bart_seq2seq(batch_size=B, src_len=S, tgt_len=T, seed=0)
    return m, nq.Model.from_onnx(m)


def _torch_logits(module, enc_embeds, dec_embeds):
    import torch

    with torch.no_grad():
        return module(
            inputs_embeds=torch.from_numpy(enc_embeds),
            decoder_inputs_embeds=torch.from_numpy(dec_embeds),
        ).logits.numpy()


def _inputs():
    xe = RNG.normal(size=(B, S, H)).astype(np.float32)
    xd = RNG.normal(size=(B, T, H)).astype(np.float32)
    return xe, xd


def test_seq2seq_logits_match_torch(bart):
    proto, model = bart
    xe, xd = _inputs()
    got = model([xe, xd])[0]
    want = _torch_logits(proto._torch_module, xe, xd)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_decoder_causality(bart):
    """Perturbing decoder position j must not change logits < j."""
    proto, model = bart
    xe, xd = _inputs()
    base = model([xe, xd])[0]
    pert = xd.copy()
    pert[:, 5:, :] += 1.0
    out = model([xe, pert])[0]
    np.testing.assert_array_equal(out[:, :5], base[:, :5])
    assert not np.allclose(out[:, 5:], base[:, 5:])


def test_cross_attention_sensitivity(bart):
    """Every decoder position reads the encoder via cross-attention:
    changing the encoder input changes the logits at ALL decoder
    positions (in a decoder-only graph they would be untouched)."""
    proto, model = bart
    xe, xd = _inputs()
    base = model([xe, xd])[0]
    pert = RNG.normal(size=xe.shape).astype(np.float32) * 3.0
    out = model([pert, xd])[0]
    assert np.abs(out - base).max(axis=-1).min() > 1e-3


def test_quantized_fuses_all_attentions(bart):
    """int8 PTQ + optimize(): all 6 attentions fuse (2 encoder self,
    2 decoder causal self, 2 decoder CROSS with nq=8 != nkv=12) with
    zero failures, bit-identical logits, and exact argmax agreement
    with the float model on the calibration-like distribution."""
    proto, model = bart
    xe, xd = _inputs()
    qmodel = model.quantize([xe, xd], bit_width=8,
                            calibration_mode="eager")
    base = qmodel([xe, xd])[0]
    report = qmodel.optimize()
    n_layers = proto._torch_module.config.encoder_layers
    assert report["fuse_attention"] == 3 * n_layers
    assert qmodel.fusion_report["failures"] == []
    fused = qmodel([xe, xd])[0]
    np.testing.assert_array_equal(base, fused)
    f = model([xe, xd])[0]
    assert (base.argmax(-1) == f.argmax(-1)).mean() == 1.0


def test_split_forms_match_combined(bart):
    """bart_encoder + bart_decoder over the shared module compose to
    the combined graph's logits exactly (same ops, same order)."""
    proto, model = bart
    module = proto._torch_module
    enc = nq.Model.from_onnx(bart_encoder(batch_size=B, src_len=S,
                                          module=module))
    dec = nq.Model.from_onnx(bart_decoder(batch_size=B, src_len=S,
                                          tgt_len=T, module=module))
    xe, xd = _inputs()
    memory = enc([xe])[0]
    got = dec([xd, memory])[0]
    want = model([xe, xd])[0]
    np.testing.assert_array_equal(got, want)


def _torch_greedy_seq2seq(module, src, start_id, n_new):
    """Token-by-token full re-forward greedy loop (the oracle)."""
    import torch

    ids = np.full((src.shape[0], 1), start_id, dtype=np.int64)
    for _ in range(n_new):
        with torch.no_grad():
            logits = module(
                input_ids=torch.from_numpy(src.astype(np.int64)),
                decoder_input_ids=torch.from_numpy(ids)).logits
        nxt = logits[:, -1, :].argmax(-1).numpy()
        ids = np.concatenate([ids, nxt[:, None]], axis=1)
    return ids.astype(np.int32)


def test_generate_seq2seq_matches_torch(bart):
    proto, _ = bart
    module = proto._torch_module
    enc = nq.Model.from_onnx(bart_encoder(batch_size=B, src_len=S,
                                          module=module))
    dec = nq.Model.from_onnx(bart_decoder(batch_size=B, src_len=S,
                                          tgt_len=T, module=module))
    src = RNG.integers(4, V, size=(B, S)).astype(np.int32)
    start = int(module.config.decoder_start_token_id)
    want = _torch_greedy_seq2seq(module, src, start, 6)
    got = generate_seq2seq(enc, dec, src, proto._wte, max_new_tokens=6,
                           decoder_start_id=start)
    np.testing.assert_array_equal(got, want)

    with pytest.raises(ValueError):
        generate_seq2seq(enc, dec, src, proto._wte, max_new_tokens=T,
                         decoder_start_id=start)


def test_generate_seq2seq_quantized(bart):
    """The same loop drives independently-quantized encoder/decoder
    models (optimized + fused); tokens match the quantized full-graph
    argmax path on the same prompts."""
    proto, _ = bart
    module = proto._torch_module
    enc = nq.Model.from_onnx(bart_encoder(batch_size=B, src_len=S,
                                          module=module))
    dec = nq.Model.from_onnx(bart_decoder(batch_size=B, src_len=S,
                                          tgt_len=T, module=module))
    src = RNG.integers(4, V, size=(B, S)).astype(np.int32)
    start = int(module.config.decoder_start_token_id)
    wte = proto._wte

    xe = wte[src]
    qenc = enc.quantize([xe], bit_width=8, calibration_mode="eager")
    qenc.optimize()
    memory = np.asarray(enc([xe])[0])
    xd = wte[np.full((B, T), start)].astype(np.float32)
    qdec = dec.quantize([xd, memory], bit_width=8,
                        calibration_mode="eager")
    qdec.optimize()
    assert qdec.fusion_report["failures"] == []

    got = generate_seq2seq(qenc, qdec, src, wte, max_new_tokens=6,
                           decoder_start_id=start)
    assert got.shape == (B, 7)
    assert (got[:, 0] == start).all()
    # the float loop and the int8 loop agree on these prompts
    want = generate_seq2seq(enc, dec, src, wte, max_new_tokens=6,
                            decoder_start_id=start)
    np.testing.assert_array_equal(got, want)


def test_bart_kv_decode_matches_full_form():
    """The BART KV-cache step graph (post-LN, layernorm_embedding in
    the step graph, cross-attention over the loop-invariant encoder
    memory) decodes the same greedy tokens as torch's full re-forward
    loop."""
    from numpy_quant_tpu.models.seq2seq import bart_decode_step
    from numpy_quant_tpu.utils import generate_kv

    module = bart_tiny_module(seed=0)
    enc_proto = bart_encoder(batch_size=B, src_len=S, module=module)
    enc = nq.Model.from_onnx(enc_proto)
    step_proto = bart_decode_step(batch_size=B, max_len=T, src_len=S,
                                  module=module)
    step = nq.Model.from_onnx(step_proto)
    src = RNG.integers(4, V, size=(B, S)).astype(np.int32)
    start = int(module.config.decoder_start_token_id)
    want = _torch_greedy_seq2seq(module, src, start, 6)

    memory = np.asarray(enc([enc_proto._wte[src]])[0])
    prompt = np.full((B, 1), start, np.int32)
    got = generate_kv(step, prompt, step_proto._wte, step_proto._dec_pos,
                      max_new_tokens=6, memory=memory)
    np.testing.assert_array_equal(got, want)


def test_bart_kv_decode_quantized():
    """int8 PTQ of the BART step graph via memory-aware
    decode_calibration; the int8 KV cache stays bit-identical to the
    float-carry run of the same quantized model."""
    from numpy_quant_tpu.models.seq2seq import bart_decode_step
    from numpy_quant_tpu.utils import (decode_calibration, generate_kv,
                                       merge_calibration_stats)

    module = bart_tiny_module(seed=0)
    enc_proto = bart_encoder(batch_size=B, src_len=S, module=module)
    enc = nq.Model.from_onnx(enc_proto)
    step_proto = bart_decode_step(batch_size=B, max_len=T, src_len=S,
                                  module=module)
    step = nq.Model.from_onnx(step_proto)
    start = int(module.config.decoder_start_token_id)
    src = RNG.integers(4, V, size=(B, S)).astype(np.int32)
    memory = np.asarray(enc([enc_proto._wte[src]])[0])
    prompt = np.concatenate(
        [np.full((B, 1), start, np.int32),
         RNG.integers(4, V, size=(B, 2)).astype(np.int32)], axis=1)

    f_seq = generate_kv(step, prompt, step_proto._wte,
                        step_proto._dec_pos, max_new_tokens=4,
                        memory=memory)

    batches = decode_calibration(step, prompt, step_proto._wte,
                                 step_proto._dec_pos, memory=memory)
    stats = merge_calibration_stats(
        *[step.calibration_stats(b) for b in batches])
    qstep = step.quantize(stats=stats, bit_width=8)
    q_seq = generate_kv(qstep, prompt, step_proto._wte,
                        step_proto._dec_pos, max_new_tokens=4,
                        memory=memory)
    assert q_seq.shape == f_seq.shape
    np.testing.assert_array_equal(q_seq[:, :3], prompt)
    assert (q_seq == f_seq).mean() >= 0.6

    q8 = generate_kv(qstep, prompt, step_proto._wte,
                     step_proto._dec_pos, max_new_tokens=4,
                     memory=memory, kv_cache_dtype="int8")
    np.testing.assert_array_equal(q8, q_seq)
