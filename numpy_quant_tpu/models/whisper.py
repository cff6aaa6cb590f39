"""Whisper-style speech encoder-decoder graph generator.

Eighth model domain and the first AUDIO one: the encoder consumes mel
spectrogram features [B, n_mels, 2*S] through a Conv1d frontend
(kernel 3 / pad 1, then kernel 3 / stride 2 / pad 1 -- the rank-3 ONNX
Conv path, ops/conv.py::conv1d_ncl) with exact-erf GELUs, adds the
module's sinusoidal position table as a baked initializer, and runs
pre-LN transformer layers. The decoder is a pre-LN causal stack with
cross-attention over the encoder memory, learned positions and a
weight-tied head.

Attention is HF Whisper's PRE-SCALED form: q is multiplied by
1/sqrt(d) after its projection, so the scores MatMul feeds Softmax
with no Mul in between (the fuse_attention matcher's "pre-scaled"
idiom; decoder self-attention adds the causal initializer on top).

Like models/seq2seq.py (BART), graphs lower from a LIVE
WhisperForConditionalGeneration module, which rides along as the float
oracle (reference test strategy, SURVEY.md §4). Three forms share one
module: the full graph (parity/quantization tests), and encoder /
decoder halves for utils.generate.generate_seq2seq -- whose encoder
input is the raw float feature array (no token gather on the audio
side). The reference framework has no audio surface at all; this
family is parity-plus.
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .llama import _matmul_w
from .vit import _ViTEmitter, _np


def whisper_tiny_module(config=None, seed: int = 0):
    """The live torch module all three graph forms lower from."""
    import torch
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import (
        WhisperForConditionalGeneration)

    torch.manual_seed(seed)
    if config is None:
        config = WhisperConfig(
            vocab_size=96, num_mel_bins=8, d_model=32,
            encoder_layers=2, encoder_attention_heads=2,
            decoder_layers=2, decoder_attention_heads=2,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            max_source_positions=15, max_target_positions=16,
            activation_function="gelu",
            # the defaults point at the real Whisper vocabulary
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1)
    config.attn_implementation = "eager"
    assert config.activation_function == "gelu", config.activation_function
    return WhisperForConditionalGeneration(config).eval()


def _w_attention(e: _ViTEmitter, q_src: str, kv_src: str, attn,
                 name: str, causal_len: int | None = None) -> str:
    """WhisperAttention (eager): q scaled by 1/sqrt(d) right after its
    projection (HF order -- NOT a post-scores Mul), bias-free k_proj,
    optional additive causal initializer, softmax, context, out_proj."""
    g = e.g
    num_heads = attn.num_heads
    head_size = attn.head_dim

    q = e.linear3d(q_src, attn.q_proj, f"{name}.q_proj")
    scal = g.const(np.array(np.float32(attn.scaling), dtype=np.float32),
                   "wscaling")
    q = g.node("Mul", [q, scal], out=f"{name}/q_scaled")
    k = _matmul_w(e, kv_src, attn.k_proj, f"{name}.k_proj")  # bias=False
    v = e.linear3d(kv_src, attn.v_proj, f"{name}.v_proj")

    b_dim = e.batch_dim(q_src, f"{name}/bdim")
    tail = g.const(np.array([-1, num_heads, head_size], dtype=np.int64),
                   "headshape")
    new_shape = g.node("Concat", [b_dim, tail], out=f"{name}/Concat_shape",
                       axis=0)

    def split_heads(t: str, which: str) -> str:
        r = g.node("Reshape", [t, new_shape], out=f"{name}/{which}_Reshape")
        return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                      perm=[0, 2, 1, 3])

    qh, kh, vh = split_heads(q, "q"), split_heads(k, "k"), split_heads(v, "v")
    kt = g.node("Transpose", [kh], out=f"{name}/k_T", perm=[0, 1, 3, 2])
    h = g.node("MatMul", [qh, kt], out=f"{name}/scores")
    if causal_len is not None:
        mask = np.triu(np.full((causal_len, causal_len), np.float32(-1e9)),
                       k=1)[None, None].astype(np.float32)
        mc = g.init(f"{name}.causal_mask", mask)
        h = g.node("Add", [h, mc], out=f"{name}/masked")
    probs = g.node("Softmax", [h], out=f"{name}/probs", axis=-1)
    ctx = g.node("MatMul", [probs, vh], out=f"{name}/context")
    ctx = g.node("Transpose", [ctx], out=f"{name}/context_T",
                 perm=[0, 2, 1, 3])
    merge_tail = g.const(np.array([-1, num_heads * head_size],
                                  dtype=np.int64), "mergeshape")
    merge_shape = g.node("Concat", [b_dim, merge_tail],
                         out=f"{name}/Concat_merge", axis=0)
    merged = g.node("Reshape", [ctx, merge_shape], out=f"{name}/merged")
    return e.linear3d(merged, attn.out_proj, f"{name}.out_proj")


def _ffn(e: _ViTEmitter, x: str, layer, name: str) -> str:
    fc = e.linear3d(x, layer.fc1, f"{name}.fc1")
    act = e.gelu(fc, f"{name}.gelu")
    return e.linear3d(act, layer.fc2, f"{name}.fc2")


def _enc_layer(e: _ViTEmitter, x: str, layer, name: str) -> str:
    """WhisperEncoderLayer (pre-LN): residual + attn(LN(x))."""
    g = e.g
    ln = e.layernorm(x, layer.self_attn_layer_norm, f"{name}.self_attn_ln")
    att = _w_attention(e, ln, ln, layer.self_attn, f"{name}.self_attn")
    x = g.node("Add", [x, att], out=f"{name}/residual1")
    ln2 = e.layernorm(x, layer.final_layer_norm, f"{name}.final_ln")
    f = _ffn(e, ln2, layer, f"{name}")
    return g.node("Add", [x, f], out=f"{name}/residual2")


def _dec_layer(e: _ViTEmitter, x: str, memory: str, layer, tgt_len: int,
               name: str) -> str:
    """WhisperDecoderLayer (pre-LN): causal self-attention,
    cross-attention over the encoder memory, FFN."""
    g = e.g
    ln = e.layernorm(x, layer.self_attn_layer_norm, f"{name}.self_attn_ln")
    att = _w_attention(e, ln, ln, layer.self_attn, f"{name}.self_attn",
                       causal_len=tgt_len)
    x = g.node("Add", [x, att], out=f"{name}/residual1")
    ln = e.layernorm(x, layer.encoder_attn_layer_norm,
                     f"{name}.encoder_attn_ln")
    xa = _w_attention(e, ln, memory, layer.encoder_attn,
                      f"{name}.encoder_attn")
    x = g.node("Add", [x, xa], out=f"{name}/residual2")
    ln = e.layernorm(x, layer.final_layer_norm, f"{name}.final_ln")
    f = _ffn(e, ln, layer, f"{name}")
    return g.node("Add", [x, f], out=f"{name}/residual3")


def _emit_encoder(e: _ViTEmitter, module, x: str, src_len: int) -> str:
    """Conv1d frontend (k3/p1 then k3/s2/p1) + GELUs + sinusoidal
    positions + pre-LN layers + final LN. ``src_len`` is the
    post-conv2 sequence length (= max_source_positions)."""
    g = e.g
    enc = module.model.encoder
    c1w = g.init("conv1.weight", _np(enc.conv1.weight))
    c1b = g.init("conv1.bias", _np(enc.conv1.bias))
    h = g.node("Conv", [x, c1w, c1b], out="enc/conv1", pads=[1, 1],
               strides=[1], dilations=[1], group=1)
    h = e.gelu(h, "enc.gelu1")
    c2w = g.init("conv2.weight", _np(enc.conv2.weight))
    c2b = g.init("conv2.bias", _np(enc.conv2.bias))
    h = g.node("Conv", [h, c2w, c2b], out="enc/conv2", pads=[1, 1],
               strides=[2], dilations=[1], group=1)
    h = e.gelu(h, "enc.gelu2")
    h = g.node("Transpose", [h], out="enc/permute", perm=[0, 2, 1])
    pos = g.init("encoder.pos", _np(enc.embed_positions.weight)[:src_len])
    h = g.node("Add", [h, pos], out="enc/pos_add")
    for i, layer in enumerate(enc.layers):
        h = _enc_layer(e, h, layer, f"encoder.{i}")
    return e.layernorm(h, enc.layer_norm, "encoder.final_norm")


def _emit_decoder(e: _ViTEmitter, module, x: str, memory: str,
                  tgt_len: int) -> str:
    g = e.g
    dec = module.model.decoder
    pos = g.init("decoder.pos", _np(dec.embed_positions.weight)[:tgt_len])
    h = g.node("Add", [x, pos], out="dec/pos_add")
    for i, layer in enumerate(dec.layers):
        h = _dec_layer(e, h, memory, layer, tgt_len, f"decoder.{i}")
    h = e.layernorm(h, dec.layer_norm, "decoder.final_norm")
    # weight-tied head (proj_out shares embed_tokens.weight, no bias)
    head = g.init("proj_out.weight_t", _np(module.proj_out.weight).T)
    g.node("MatMul", [h, head], out="logits", name="proj_out")
    return "logits"


def _attach(model, module):
    model._torch_module = module
    model._wte = _np(module.model.decoder.embed_tokens.weight)
    return model


def whisper_seq2seq(config=None, batch_size: int = 2, tgt_len: int = 8,
                    seed: int = 0, module=None):
    """Full graph: ``input_features`` [B, n_mels, 2*S] +
    ``decoder_embeds`` [B, T, d] -> ``logits`` [B, T, V]."""
    if module is None:
        module = whisper_tiny_module(config, seed)
    config = module.config
    src_len = config.max_source_positions

    g = GraphBuilder("whisper_seq2seq")
    e = _ViTEmitter(g)
    x = g.input("input_features",
                [batch_size, config.num_mel_bins, 2 * src_len])
    xd = g.input("decoder_embeds", [batch_size, tgt_len, config.d_model])
    memory = _emit_encoder(e, module, x, src_len)
    _emit_decoder(e, module, xd, memory, tgt_len)
    g.output("logits", [batch_size, tgt_len, config.vocab_size])
    return _attach(g.model(), module)


def whisper_encoder(config=None, batch_size: int = 2, seed: int = 0,
                    module=None):
    """Encoder-only graph: ``input_features`` -> ``encoder_memory``
    [B, S, d]. Run once per utterance."""
    if module is None:
        module = whisper_tiny_module(config, seed)
    config = module.config
    src_len = config.max_source_positions

    g = GraphBuilder("whisper_encoder")
    e = _ViTEmitter(g)
    x = g.input("input_features",
                [batch_size, config.num_mel_bins, 2 * src_len])
    memory = _emit_encoder(e, module, x, src_len)
    g.node("Identity", [memory], out="encoder_memory", name="memory_id")
    g.output("encoder_memory", [batch_size, src_len, config.d_model])
    return _attach(g.model(), module)


def _w_decode_self_attention(e: _ViTEmitter, x: str, attn, layer_idx: int,
                             max_len: int, name: str):
    """One-token Whisper self-attention against a fixed-length cache
    (models/gpt.py _decode_attention structure with the pre-scaled-q
    idiom): scores over [cache | current], additive mask input
    invalidates the cache tail. Returns (context, k_step, v_step)."""
    g = e.g
    num_heads, head_size = attn.num_heads, attn.head_dim

    q = e.linear3d(x, attn.q_proj, f"{name}.q_proj")
    scal = g.const(np.array(np.float32(attn.scaling), dtype=np.float32),
                   "wscaling")
    q = g.node("Mul", [q, scal], out=f"{name}/q_scaled")
    k = _matmul_w(e, x, attn.k_proj, f"{name}.k_proj")
    v = e.linear3d(x, attn.v_proj, f"{name}.v_proj")

    def split_heads(t: str, which: str) -> str:
        shape = g.const(np.array([0, 1, num_heads, head_size],
                                 dtype=np.int64), "wdheadshape")
        r = g.node("Reshape", [t, shape], out=f"{name}/{which}_Reshape")
        return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                      perm=[0, 2, 1, 3])

    qh = split_heads(q, "q")
    kh = split_heads(k, "k")
    vh = split_heads(v, "v")

    kt_cache = g.node("Transpose", [f"past_k.{layer_idx}"],
                      out=f"{name}/cache_k_T", perm=[0, 1, 3, 2])
    s_past = g.node("MatMul", [qh, kt_cache], out=f"{name}/scores_past")
    kt_step = g.node("Transpose", [kh], out=f"{name}/k_T",
                     perm=[0, 1, 3, 2])
    s_self = g.node("MatMul", [qh, kt_step], out=f"{name}/scores_self")
    s = g.node("Concat", [s_past, s_self], out=f"{name}/scores", axis=-1)
    masked = g.node("Add", [s, "attn_mask"], out=f"{name}/masked")
    probs = g.node("Softmax", [masked], out=f"{name}/probs", axis=-1)

    z = g.const(np.array([0], dtype=np.int64), "zero")
    ll = g.const(np.array([max_len], dtype=np.int64), "maxlen")
    lp1 = g.const(np.array([max_len + 1], dtype=np.int64), "maxlenp1")
    ax = g.const(np.array([-1], dtype=np.int64), "lastaxis")
    p_past = g.node("Slice", [probs, z, ll, ax], out=f"{name}/p_past")
    p_self = g.node("Slice", [probs, ll, lp1, ax], out=f"{name}/p_self")
    ctx = g.node("MatMul", [p_past, f"past_v.{layer_idx}"],
                 out=f"{name}/ctx_past")
    self_ctx = g.node("Mul", [p_self, vh], out=f"{name}/ctx_self")
    ctx = g.node("Add", [ctx, self_ctx], out=f"{name}/context")

    ctx = g.node("Transpose", [ctx], out=f"{name}/context_T",
                 perm=[0, 2, 1, 3])
    merge = g.const(np.array([0, 1, num_heads * head_size],
                             dtype=np.int64), "wdmergeshape")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return (e.linear3d(merged, attn.out_proj, f"{name}.out_proj"),
            kh, vh)


def _w_decode_cross_attention(e: _ViTEmitter, x: str, attn, memory: str,
                              src_len: int, name: str) -> str:
    """One-token cross-attention over the full encoder memory. The
    memory is loop-invariant inside the decode while-loop, so XLA
    hoists the K/V projections out of the body -- they compute once
    per generate_kv call, not once per token."""
    g = e.g
    num_heads, head_size = attn.num_heads, attn.head_dim

    q = e.linear3d(x, attn.q_proj, f"{name}.q_proj")
    scal = g.const(np.array(np.float32(attn.scaling), dtype=np.float32),
                   "wscaling")
    q = g.node("Mul", [q, scal], out=f"{name}/q_scaled")
    k = _matmul_w(e, memory, attn.k_proj, f"{name}.k_proj")
    v = e.linear3d(memory, attn.v_proj, f"{name}.v_proj")

    def split_heads(t: str, seq: int, which: str) -> str:
        shape = g.const(np.array([0, seq, num_heads, head_size],
                                 dtype=np.int64), f"wxheadshape{seq}")
        r = g.node("Reshape", [t, shape], out=f"{name}/{which}_Reshape")
        return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                      perm=[0, 2, 1, 3])

    qh = split_heads(q, 1, "q")
    kh = split_heads(k, src_len, "k")
    vh = split_heads(v, src_len, "v")
    kt = g.node("Transpose", [kh], out=f"{name}/k_T", perm=[0, 1, 3, 2])
    scores = g.node("MatMul", [qh, kt], out=f"{name}/scores")
    probs = g.node("Softmax", [scores], out=f"{name}/probs", axis=-1)
    ctx = g.node("MatMul", [probs, vh], out=f"{name}/context")
    ctx = g.node("Transpose", [ctx], out=f"{name}/context_T",
                 perm=[0, 2, 1, 3])
    merge = g.const(np.array([0, 1, num_heads * head_size],
                             dtype=np.int64), "wdmergeshape")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return e.linear3d(merged, attn.out_proj, f"{name}.out_proj")


def whisper_decode_step(config=None, batch_size: int = 2,
                        max_len: int = 8, seed: int = 0, module=None):
    """The KV-cache decode form of the Whisper decoder (one token per
    call, O(L)/token -- the seq2seq analogue of models/gpt.py
    gpt_decode_step). Inputs, in order: ``x_step`` [B, 1, d] (token
    embed + position, added by utils.generate.generate_kv),
    ``attn_mask`` [1, 1, 1, L+1] additive, ``encoder_memory``
    [B, S, d] (one-shot whisper_encoder output, fed via
    ``generate_kv(..., memory=...)``), then ``past_k.i``/``past_v.i``
    [B, H, L, D] per layer. Outputs: ``logits`` [B, 1, V], then per
    layer ``present_k.i``/``present_v.i`` [B, H, 1, D].

    Same ``seed``/``config`` builds the SAME torch module as the other
    whisper forms, so all graphs share weights."""
    if module is None:
        module = whisper_tiny_module(config, seed)
    config = module.config
    src_len = config.max_source_positions
    n_heads = config.decoder_attention_heads
    head_dim = config.d_model // n_heads

    g = GraphBuilder("whisper_decode_step")
    e = _ViTEmitter(g)
    h = g.input("x_step", [batch_size, 1, config.d_model])
    g.input("attn_mask", [1, 1, 1, max_len + 1])
    memory = g.input("encoder_memory",
                     [batch_size, src_len, config.d_model])
    for i in range(config.decoder_layers):
        g.input(f"past_k.{i}", [batch_size, n_heads, max_len, head_dim])
        g.input(f"past_v.{i}", [batch_size, n_heads, max_len, head_dim])

    dec = module.model.decoder
    presents = []
    for i, layer in enumerate(dec.layers):
        name = f"decoder.{i}"
        ln = e.layernorm(h, layer.self_attn_layer_norm,
                         f"{name}.self_attn_ln")
        att, kh, vh = _w_decode_self_attention(e, ln, layer.self_attn, i,
                                               max_len, f"{name}.self_attn")
        presents.append((kh, vh))
        h = g.node("Add", [h, att], out=f"{name}/residual1")
        ln = e.layernorm(h, layer.encoder_attn_layer_norm,
                         f"{name}.encoder_attn_ln")
        xa = _w_decode_cross_attention(e, ln, layer.encoder_attn, memory,
                                       src_len, f"{name}.encoder_attn")
        h = g.node("Add", [h, xa], out=f"{name}/residual2")
        ln = e.layernorm(h, layer.final_layer_norm, f"{name}.final_ln")
        f = _ffn(e, ln, layer, f"{name}")
        h = g.node("Add", [h, f], out=f"{name}/residual3")

    h = e.layernorm(h, dec.layer_norm, "decoder.final_norm")
    head = g.init("proj_out.weight_t", _np(module.proj_out.weight).T)
    g.node("MatMul", [h, head], out="logits", name="proj_out")

    g.output("logits", [batch_size, 1, config.vocab_size])
    for i, (kh, vh) in enumerate(presents):
        g.node("Identity", [kh], out=f"present_k.{i}",
               name=f"present_k_id.{i}")
        g.node("Identity", [vh], out=f"present_v.{i}",
               name=f"present_v_id.{i}")
        g.output(f"present_k.{i}", [batch_size, n_heads, 1, head_dim])
        g.output(f"present_v.{i}", [batch_size, n_heads, 1, head_dim])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.model.decoder.embed_tokens.weight)
    model._wpe = _np(module.model.decoder.embed_positions.weight)
    return model


def whisper_decoder(config=None, batch_size: int = 2, tgt_len: int = 8,
                    seed: int = 0, module=None):
    """Decoder-only graph: ``decoder_embeds`` [B, T, d] +
    ``encoder_memory`` [B, S, d] -> ``logits``. The generation loop
    (utils.generate.generate_seq2seq with float encoder input) re-runs
    this per token against the one-shot encoder memory."""
    if module is None:
        module = whisper_tiny_module(config, seed)
    config = module.config
    src_len = config.max_source_positions

    g = GraphBuilder("whisper_decoder")
    e = _ViTEmitter(g)
    xd = g.input("decoder_embeds", [batch_size, tgt_len, config.d_model])
    memory = g.input("encoder_memory",
                     [batch_size, src_len, config.d_model])
    _emit_decoder(e, module, xd, memory, tgt_len)
    g.output("logits", [batch_size, tgt_len, config.vocab_size])
    return _attach(g.model(), module)
