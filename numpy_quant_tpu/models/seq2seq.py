"""BART-style encoder-decoder (seq2seq) ONNX graph generator.

Fourth transformer domain beside ViT/BERT/GPT, and the first with
CROSS-attention: the decoder's second attention block reads its
queries from the decoder stream and its keys/values from the encoder
memory, so the fused attention kernel runs with nq != nkv on a real
model graph (kernels/attention.py supports rectangular q/kv natively
-- the same capability narrow-q dead-token elimination uses on ViT).

Architecture follows transformers' BartForConditionalGeneration
(post-LN blocks, learned positions with the BART +2 offset,
layernorm_embedding, exact-erf GELU, weight-tied LM head). Graphs
take float ``*_embeds`` inputs (token embedding is a host/raw-JAX
gather, exactly like models/gpt.py) and are lowered from a LIVE torch
module with this package's builder; the module rides on the returned
proto as the float oracle (reference test strategy, SURVEY.md §4 --
the reference validates its generators against live torch modules the
same way, /root/reference/test/models/vit.py).

Three graph forms share one module (same ``seed``/``config`` or an
explicit ``module=``):

* :func:`bart_seq2seq`  -- encoder+decoder in ONE graph (parity and
  quantization tests).
* :func:`bart_encoder`  -- encoder only: embeds -> memory. Run ONCE
  per sequence when generating.
* :func:`bart_decoder`  -- decoder only: (decoder embeds, memory) ->
  logits. Re-run per generated token (utils/generate.generate_seq2seq
  compiles the whole loop into one XLA program).

Attention idioms are the ones every matcher path covers bit-exactly:
scores -> Mul(const scaling) -> [Add(causal initializer)] -> Softmax,
with the Concat(batch_dim, [-1, H, D]) head-split Reshape chains.
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .vit import _ViTEmitter, _np


def bart_tiny_module(config=None, seed: int = 0):
    """The live torch module all three graph forms lower from."""
    import torch
    from transformers import BartConfig
    from transformers.models.bart.modeling_bart import (
        BartForConditionalGeneration)

    torch.manual_seed(seed)
    if config is None:
        config = BartConfig(
            vocab_size=96, d_model=32, encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            max_position_embeddings=32, activation_function="gelu",
            scale_embedding=False)
    config.attn_implementation = "eager"
    assert config.activation_function == "gelu", config.activation_function
    assert not config.scale_embedding  # embeds enter the graph unscaled
    return BartForConditionalGeneration(config).eval()


def _bart_attention(e: _ViTEmitter, q_src: str, kv_src: str, attn,
                    name: str, causal_len: int | None = None) -> str:
    """BartAttention: separate q/k/v Linears, q-side scaling emitted as
    the classic post-scores Mul(1/sqrt(d)) idiom, optional additive
    causal mask (initializer, the onnxruntime exporter idiom), softmax,
    context, out projection. ``q_src`` and ``kv_src`` differ for
    cross-attention."""
    g = e.g
    num_heads = attn.num_heads
    head_size = attn.head_dim

    q = e.linear3d(q_src, attn.q_proj, f"{name}.q_proj")
    k = e.linear3d(kv_src, attn.k_proj, f"{name}.k_proj")
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
    scores = g.node("MatMul", [qh, kt], out=f"{name}/scores")
    scal = g.const(np.array(np.float32(1.0 / np.sqrt(head_size)),
                            dtype=np.float32), "scaling")
    h = g.node("Mul", [scores, scal], out=f"{name}/scaled")
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


def _encoder_layer(e: _ViTEmitter, x: str, layer, name: str) -> str:
    """BartEncoderLayer (post-LN): LN AFTER each residual add."""
    g = e.g
    att = _bart_attention(e, x, x, layer.self_attn, f"{name}.self_attn")
    x = g.node("Add", [att, x], out=f"{name}/residual1")
    x = e.layernorm(x, layer.self_attn_layer_norm, f"{name}.self_attn_ln")
    f = _ffn(e, x, layer, f"{name}")
    x = g.node("Add", [f, x], out=f"{name}/residual2")
    return e.layernorm(x, layer.final_layer_norm, f"{name}.final_ln")


def _decoder_layer(e: _ViTEmitter, x: str, memory: str, layer,
                   tgt_len: int, name: str) -> str:
    """BartDecoderLayer: causal self-attention, CROSS-attention over
    the encoder memory (q from the decoder stream, k/v from ``memory``
    -- nq=tgt_len, nkv=src_len in the fused kernel), FFN; post-LN."""
    g = e.g
    att = _bart_attention(e, x, x, layer.self_attn, f"{name}.self_attn",
                          causal_len=tgt_len)
    x = g.node("Add", [att, x], out=f"{name}/residual1")
    x = e.layernorm(x, layer.self_attn_layer_norm, f"{name}.self_attn_ln")
    xa = _bart_attention(e, x, memory, layer.encoder_attn,
                         f"{name}.encoder_attn")
    x = g.node("Add", [xa, x], out=f"{name}/residual2")
    x = e.layernorm(x, layer.encoder_attn_layer_norm,
                    f"{name}.encoder_attn_ln")
    f = _ffn(e, x, layer, f"{name}")
    x = g.node("Add", [f, x], out=f"{name}/residual3")
    return e.layernorm(x, layer.final_layer_norm, f"{name}.final_ln")


def _embed(e: _ViTEmitter, x: str, stack, length: int, name: str) -> str:
    """embeds + learned positions (BART's +2 table offset) ->
    layernorm_embedding."""
    g = e.g
    off = stack.embed_positions.offset
    pos = g.init(f"{name}.pos.slice",
                 _np(stack.embed_positions.weight)[off:off + length])
    h = g.node("Add", [x, pos], out=f"{name}/pos_add")
    return e.layernorm(h, stack.layernorm_embedding, f"{name}.ln_embed")


def _emit_encoder(e: _ViTEmitter, module, x: str, src_len: int) -> str:
    enc = module.model.encoder
    h = _embed(e, x, enc, src_len, "encoder")
    for i, layer in enumerate(enc.layers):
        h = _encoder_layer(e, h, layer, f"encoder.{i}")
    return h


def _emit_decoder(e: _ViTEmitter, module, x: str, memory: str,
                  tgt_len: int) -> str:
    dec = module.model.decoder
    h = _embed(e, x, dec, tgt_len, "decoder")
    for i, layer in enumerate(dec.layers):
        h = _decoder_layer(e, h, memory, layer, tgt_len, f"decoder.{i}")
    # weight-tied LM head (final_logits_bias is a zeros buffer in
    # transformers' BART and is omitted)
    head = e.g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    e.g.node("MatMul", [h, head], out="logits", name="lm_head")
    return "logits"


def _attach(model, module):
    model._torch_module = module
    model._wte = _np(module.model.shared.weight)          # [vocab, hidden]
    enc_pos, dec_pos = (module.model.encoder.embed_positions,
                        module.model.decoder.embed_positions)
    model._enc_pos = _np(enc_pos.weight)[enc_pos.offset:]  # [n_pos, hidden]
    model._dec_pos = _np(dec_pos.weight)[dec_pos.offset:]
    return model


def bart_seq2seq(config=None, batch_size: int = 2, src_len: int = 12,
                 tgt_len: int = 8, seed: int = 0, module=None):
    """Full encoder+decoder graph: ``encoder_embeds`` [B,S,H] +
    ``decoder_embeds`` [B,T,H] -> ``logits`` [B,T,V]."""
    if module is None:
        module = bart_tiny_module(config, seed)
    config = module.config

    g = GraphBuilder("bart_seq2seq")
    e = _ViTEmitter(g)
    xe = g.input("encoder_embeds", [batch_size, src_len, config.d_model])
    xd = g.input("decoder_embeds", [batch_size, tgt_len, config.d_model])
    memory = _emit_encoder(e, module, xe, src_len)
    _emit_decoder(e, module, xd, memory, tgt_len)
    g.output("logits", [batch_size, tgt_len, config.vocab_size])
    return _attach(g.model(), module)


def bart_encoder(config=None, batch_size: int = 2, src_len: int = 12,
                 seed: int = 0, module=None):
    """Encoder-only graph: ``encoder_embeds`` [B,S,H] ->
    ``encoder_memory`` [B,S,H]. Run once per sequence."""
    if module is None:
        module = bart_tiny_module(config, seed)
    config = module.config

    g = GraphBuilder("bart_encoder")
    e = _ViTEmitter(g)
    x = g.input("encoder_embeds", [batch_size, src_len, config.d_model])
    memory = _emit_encoder(e, module, x, src_len)
    g.node("Identity", [memory], out="encoder_memory", name="memory_id")
    g.output("encoder_memory", [batch_size, src_len, config.d_model])
    return _attach(g.model(), module)


def _b_decode_self_attention(e: _ViTEmitter, x: str, attn, layer_idx: int,
                             max_len: int, name: str):
    """One-token BART self-attention against a fixed-length cache
    (models/whisper.py _w_decode_self_attention structure, but with
    HF BartAttention's biased k_proj and the pre-scaled q that
    transformers actually computes). Returns (context, k_step, v_step)."""
    g = e.g
    num_heads, head_size = attn.num_heads, attn.head_dim

    q = e.linear3d(x, attn.q_proj, f"{name}.q_proj")
    scal = g.const(np.array(np.float32(attn.scaling), dtype=np.float32),
                   "bscaling")
    q = g.node("Mul", [q, scal], out=f"{name}/q_scaled")
    k = e.linear3d(x, attn.k_proj, f"{name}.k_proj")
    v = e.linear3d(x, attn.v_proj, f"{name}.v_proj")

    def split_heads(t: str, which: str) -> str:
        shape = g.const(np.array([0, 1, num_heads, head_size],
                                 dtype=np.int64), "bdheadshape")
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
                             dtype=np.int64), "bdmergeshape")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return (e.linear3d(merged, attn.out_proj, f"{name}.out_proj"),
            kh, vh)


def _b_decode_cross_attention(e: _ViTEmitter, x: str, attn, memory: str,
                              src_len: int, name: str) -> str:
    """One-token cross-attention over the full encoder memory (loop
    invariant -- XLA hoists the K/V projections out of the decode while
    body, models/whisper.py _w_decode_cross_attention)."""
    g = e.g
    num_heads, head_size = attn.num_heads, attn.head_dim

    q = e.linear3d(x, attn.q_proj, f"{name}.q_proj")
    scal = g.const(np.array(np.float32(attn.scaling), dtype=np.float32),
                   "bscaling")
    q = g.node("Mul", [q, scal], out=f"{name}/q_scaled")
    k = e.linear3d(memory, attn.k_proj, f"{name}.k_proj")
    v = e.linear3d(memory, attn.v_proj, f"{name}.v_proj")

    def split_heads(t: str, seq: int, which: str) -> str:
        shape = g.const(np.array([0, seq, num_heads, head_size],
                                 dtype=np.int64), f"bxheadshape{seq}")
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
                             dtype=np.int64), "bdmergeshape")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return e.linear3d(merged, attn.out_proj, f"{name}.out_proj")


def bart_decode_step(config=None, batch_size: int = 2, max_len: int = 8,
                     src_len: int = 12, seed: int = 0, module=None):
    """The KV-cache decode form of the BART decoder (one token per
    call, O(L)/token -- post-LN counterpart of models/whisper.py
    whisper_decode_step). Inputs, in order: ``x_step`` [B, 1, d]
    (token embed + learned position, added by
    utils.generate.generate_kv with ``wpe=proto._dec_pos`` -- the +2
    BART offset is pre-stripped by _attach), ``attn_mask``
    [1, 1, 1, L+1] additive, ``encoder_memory`` [B, S, d]
    (one-shot bart_encoder output, fed via ``generate_kv(...,
    memory=...)``), then ``past_k.i``/``past_v.i`` [B, H, L, D] per
    layer. Outputs: ``logits`` [B, 1, V], then per layer
    ``present_k.i``/``present_v.i`` [B, H, 1, D].

    The graph opens with layernorm_embedding (BART applies it to
    embeds+positions), so generate_kv's raw embed-add feeds it
    directly. Same ``seed``/``config`` builds the SAME torch module as
    the other BART forms, so all graphs share weights."""
    if module is None:
        module = bart_tiny_module(config, seed)
    config = module.config
    n_heads = config.decoder_attention_heads
    head_dim = config.d_model // n_heads

    g = GraphBuilder("bart_decode_step")
    e = _ViTEmitter(g)
    h = g.input("x_step", [batch_size, 1, config.d_model])
    g.input("attn_mask", [1, 1, 1, max_len + 1])
    dec = module.model.decoder
    memory = g.input("encoder_memory",
                     [batch_size, src_len, config.d_model])
    for i in range(config.decoder_layers):
        g.input(f"past_k.{i}", [batch_size, n_heads, max_len, head_dim])
        g.input(f"past_v.{i}", [batch_size, n_heads, max_len, head_dim])

    h = e.layernorm(h, dec.layernorm_embedding, "decoder.ln_embed")
    presents = []
    for i, layer in enumerate(dec.layers):
        name = f"decoder.{i}"
        att, kh, vh = _b_decode_self_attention(e, h, layer.self_attn, i,
                                               max_len, f"{name}.self_attn")
        presents.append((kh, vh))
        h = g.node("Add", [att, h], out=f"{name}/residual1")
        h = e.layernorm(h, layer.self_attn_layer_norm,
                        f"{name}.self_attn_ln")
        xa = _b_decode_cross_attention(e, h, layer.encoder_attn, memory,
                                       src_len, f"{name}.encoder_attn")
        h = g.node("Add", [xa, h], out=f"{name}/residual2")
        h = e.layernorm(h, layer.encoder_attn_layer_norm,
                        f"{name}.encoder_attn_ln")
        f = _ffn(e, h, layer, f"{name}")
        h = g.node("Add", [f, h], out=f"{name}/residual3")
        h = e.layernorm(h, layer.final_layer_norm, f"{name}.final_ln")

    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")

    g.output("logits", [batch_size, 1, config.vocab_size])
    for i, (kh, vh) in enumerate(presents):
        g.node("Identity", [kh], out=f"present_k.{i}",
               name=f"present_k_id.{i}")
        g.node("Identity", [vh], out=f"present_v.{i}",
               name=f"present_v_id.{i}")
        g.output(f"present_k.{i}", [batch_size, n_heads, 1, head_dim])
        g.output(f"present_v.{i}", [batch_size, n_heads, 1, head_dim])

    return _attach(g.model(), module)


def bart_decoder(config=None, batch_size: int = 2, src_len: int = 12,
                 tgt_len: int = 8, seed: int = 0, module=None):
    """Decoder-only graph: ``decoder_embeds`` [B,T,H] +
    ``encoder_memory`` [B,S,H] -> ``logits`` [B,T,V]. The generation
    loop re-runs this per token against the one-shot encoder memory."""
    if module is None:
        module = bart_tiny_module(config, seed)
    config = module.config

    g = GraphBuilder("bart_decoder")
    e = _ViTEmitter(g)
    xd = g.input("decoder_embeds", [batch_size, tgt_len, config.d_model])
    memory = g.input("encoder_memory", [batch_size, src_len, config.d_model])
    _emit_decoder(e, module, xd, memory, tgt_len)
    g.output("logits", [batch_size, tgt_len, config.vocab_size])
    return _attach(g.model(), module)
