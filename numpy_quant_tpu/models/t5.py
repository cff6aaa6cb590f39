"""T5-style encoder-decoder (relative position bias) graph generator.

Seventh transformer domain. What it adds over BART (models/seq2seq.py)
and LLaMA (models/llama.py):

- **relative position bias**: T5 has no position embeddings at all;
  every attention layer Adds a learned per-head [1, H, N, N] bias to
  the raw scores before Softmax. At a fixed sequence length the bias is
  a constant, so the graph bakes the live module's ``compute_bias``
  output as an initializer -- and ``QModel.fuse_attention`` folds it
  into the fused kernel as a per-head VMEM operand
  (kernels/attention.py ``score_bias``), keeping the whole biased
  attention block HBM-free and bit-identical to the unfused graph.
- **unscaled attention**: T5 folds the 1/sqrt(d) into the weight init,
  so scores feed the bias Add directly from the MatMul (the matcher's
  "pre-scaled" form combined with a bias).
- **combined bias+mask decoder constant**: HF adds the causal mask into
  the position bias (one tensor); the score-bias matcher fuses that
  combined constant as-is -- no separate causal pattern needed.
- **T5LayerNorm**: RMS-style (no mean subtract, no bias), shared with
  the LLaMA emitter.
- **tied lm head**: logits = (h * d_model**-0.5) @ shared_embedding^T.

Like models/llama.py, graph inputs are float ``inputs_embeds`` /
``decoder_inputs_embeds``; graphs lower from LIVE transformers modules
and tests assert parity against the module's torch forward
(reference test strategy, SURVEY.md §4). The reference framework has
no text model surface at all; this family is parity-plus.
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .llama import _matmul_w, _rms_norm
from .vit import _ViTEmitter, _np


def _rel_bias(attn, qlen: int, klen: int) -> np.ndarray:
    """The live module's relative position bias [1, H, qlen, klen]
    (T5Attention.compute_bias: bucketed relative positions gathered
    from the learned per-head embedding)."""
    import torch

    with torch.no_grad():
        return _np(attn.compute_bias(qlen, klen))


def _t5_attention(e: _ViTEmitter, x: str, kv: str, attn, q_len: int,
                  kv_len: int, bias: str | None, name: str) -> str:
    """T5Attention: bias-free q/k/v/o projections, NO score scaling
    (folded into init), optional additive position bias, softmax,
    context, o. ``kv`` is the key/value source (cross-attention reads
    the encoder output and carries no bias)."""
    g = e.g
    n_heads = attn.n_heads
    d_kv = attn.key_value_proj_dim

    q = _matmul_w(e, x, attn.q, f"{name}.q")
    k = _matmul_w(e, kv, attn.k, f"{name}.k")
    v = _matmul_w(e, kv, attn.v, f"{name}.v")

    def split_heads(t: str, seq: int, which: str) -> str:
        shape = g.const(np.array([0, seq, n_heads, d_kv], dtype=np.int64),
                        f"t5headshape{seq}")
        r = g.node("Reshape", [t, shape], out=f"{name}/{which}_Reshape")
        return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                      perm=[0, 2, 1, 3])

    qh = split_heads(q, q_len, "q")
    kh = split_heads(k, kv_len, "k")
    vh = split_heads(v, kv_len, "v")

    kt = g.node("Transpose", [kh], out=f"{name}/k_T", perm=[0, 1, 3, 2])
    scores = g.node("MatMul", [qh, kt], out=f"{name}/scores")
    if bias is not None:
        scores = g.node("Add", [scores, bias], out=f"{name}/biased")
    probs = g.node("Softmax", [scores], out=f"{name}/probs", axis=-1)
    ctx = g.node("MatMul", [probs, vh], out=f"{name}/context")
    ctx = g.node("Transpose", [ctx], out=f"{name}/context_T",
                 perm=[0, 2, 1, 3])
    merge = g.const(np.array([0, q_len, n_heads * d_kv], dtype=np.int64),
                    f"t5merge{q_len}")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return _matmul_w(e, merged, attn.o, f"{name}.o")


def _t5_ff(e: _ViTEmitter, x: str, ff, name: str) -> str:
    """T5LayerFF body: wo(act(wi(x))) (relu default) or the gated
    variant wo(act(wi_0(x)) * wi_1(x))."""
    g = e.g
    dense = ff.DenseReluDense
    if hasattr(dense, "wi"):
        h = _matmul_w(e, x, dense.wi, f"{name}.wi")
        h = g.node("Relu", [h], out=f"{name}/act")
    else:  # DenseGatedActDense (gelu_new gate)
        h0 = _matmul_w(e, x, dense.wi_0, f"{name}.wi_0")
        # transformers NewGELUActivation: tanh approximation
        c0 = g.const(np.array(np.float32(np.sqrt(2.0 / np.pi)),
                              dtype=np.float32), "gelu_c0")
        c1 = g.const(np.array(np.float32(0.044715), dtype=np.float32),
                     "gelu_c1")
        half = g.const(np.array(np.float32(0.5), dtype=np.float32),
                       "gelu_half")
        one = g.const(np.array(np.float32(1.0), dtype=np.float32),
                      "gelu_one")
        cube = g.node("Mul", [h0, h0], out=f"{name}/sq")
        cube = g.node("Mul", [cube, h0], out=f"{name}/cube")
        inner = g.node("Mul", [cube, c1], out=f"{name}/cube_c")
        inner = g.node("Add", [h0, inner], out=f"{name}/inner")
        inner = g.node("Mul", [inner, c0], out=f"{name}/scaled")
        t = g.node("Tanh", [inner], out=f"{name}/tanh")
        t = g.node("Add", [t, one], out=f"{name}/tanh1")
        h = g.node("Mul", [h0, t], out=f"{name}/gelu_x")
        h = g.node("Mul", [h, half], out=f"{name}/gelu")
        h1 = _matmul_w(e, x, dense.wi_1, f"{name}.wi_1")
        h = g.node("Mul", [h, h1], out=f"{name}/gated")
    return _matmul_w(e, h, dense.wo, f"{name}.wo")


def default_config(seq_len: int = 12):
    from transformers import T5Config

    return T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=48,
                    num_layers=2, num_heads=4,
                    relative_attention_num_buckets=8,
                    relative_attention_max_distance=seq_len,
                    dropout_rate=0.0)


def t5_encoder(config=None, batch_size: int = 2, seq_len: int = 12,
               seed: int = 0, module=None):
    """T5 encoder stack over float ``inputs_embeds`` [B, N, d_model]
    -> ``hidden`` [B, N, d_model]. The layer-0 relative position bias
    is shared by every layer (HF semantics) and bakes as ONE
    initializer all blocks Add."""
    import torch
    from transformers import T5EncoderModel

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = default_config(seq_len)
        module = T5EncoderModel(config).eval()
    config = module.config

    g = GraphBuilder("t5_encoder")
    e = _ViTEmitter(g)
    h = g.input("inputs_embeds", [batch_size, seq_len, config.d_model])

    enc = module.encoder
    bias = g.init("encoder.rel_bias",
                  _rel_bias(enc.block[0].layer[0].SelfAttention,
                            seq_len, seq_len))
    for i, block in enumerate(enc.block):
        name = f"encoder.block.{i}"
        ln = _rms_norm(e, h, block.layer[0].layer_norm, f"{name}.ln0")
        att = _t5_attention(e, ln, ln, block.layer[0].SelfAttention,
                            seq_len, seq_len, bias, f"{name}.attn")
        h = g.node("Add", [h, att], out=f"{name}/residual0")
        ln = _rms_norm(e, h, block.layer[1].layer_norm, f"{name}.ln1")
        ff = _t5_ff(e, ln, block.layer[1], f"{name}.ff")
        h = g.node("Add", [h, ff], out=f"{name}/residual1")
    h = _rms_norm(e, h, enc.final_layer_norm, "encoder.final_norm")

    g.node("Identity", [h], out="hidden", name="hidden_id")
    g.output("hidden", [batch_size, seq_len, config.d_model])
    model = g.model()
    model._torch_module = module
    model._wte = _np(module.shared.weight)
    return model


def t5_conditional_generation(config=None, batch_size: int = 2,
                              src_len: int = 12, tgt_len: int = 8,
                              seed: int = 0, module=None):
    """Full T5ForConditionalGeneration forward in ONE graph:
    ``inputs_embeds`` [B, S, d] + ``decoder_inputs_embeds`` [B, T, d]
    -> ``logits`` [B, T, vocab]. Decoder self-attention Adds the
    COMBINED constant HF builds (causal-masked relative bias: bias +
    finfo.min above the diagonal); cross-attention is bias-free and
    unscaled (the matcher's pre-scaled form)."""
    import torch
    from transformers import T5ForConditionalGeneration

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = default_config(max(src_len, tgt_len))
        module = T5ForConditionalGeneration(config).eval()
    config = module.config

    g = GraphBuilder("t5_conditional_generation")
    e = _ViTEmitter(g)
    h = g.input("inputs_embeds", [batch_size, src_len, config.d_model])
    hd = g.input("decoder_inputs_embeds",
                 [batch_size, tgt_len, config.d_model])

    enc = module.encoder
    ebias = g.init("encoder.rel_bias",
                   _rel_bias(enc.block[0].layer[0].SelfAttention,
                             src_len, src_len))
    for i, block in enumerate(enc.block):
        name = f"encoder.block.{i}"
        ln = _rms_norm(e, h, block.layer[0].layer_norm, f"{name}.ln0")
        att = _t5_attention(e, ln, ln, block.layer[0].SelfAttention,
                            src_len, src_len, ebias, f"{name}.attn")
        h = g.node("Add", [h, att], out=f"{name}/residual0")
        ln = _rms_norm(e, h, block.layer[1].layer_norm, f"{name}.ln1")
        ff = _t5_ff(e, ln, block.layer[1], f"{name}.ff")
        h = g.node("Add", [h, ff], out=f"{name}/residual1")
    h = _rms_norm(e, h, enc.final_layer_norm, "encoder.final_norm")

    dec = module.decoder
    # HF folds the causal mask INTO the relative bias: one combined
    # [1, H, T, T] constant every decoder layer adds (T5Stack:
    # position_bias + extended_attention_mask of finfo.min)
    dbias_arr = _rel_bias(dec.block[0].layer[0].SelfAttention,
                          tgt_len, tgt_len)
    mask = np.triu(np.full((tgt_len, tgt_len),
                           np.finfo(np.float32).min, dtype=np.float32),
                   k=1)
    dbias = g.init("decoder.rel_bias_masked",
                   dbias_arr + mask[None, None])
    for i, block in enumerate(dec.block):
        name = f"decoder.block.{i}"
        ln = _rms_norm(e, hd, block.layer[0].layer_norm, f"{name}.ln0")
        att = _t5_attention(e, ln, ln, block.layer[0].SelfAttention,
                            tgt_len, tgt_len, dbias, f"{name}.self")
        hd = g.node("Add", [hd, att], out=f"{name}/residual0")
        ln = _rms_norm(e, hd, block.layer[1].layer_norm, f"{name}.ln1")
        att = _t5_attention(e, ln, h, block.layer[1].EncDecAttention,
                            tgt_len, src_len, None, f"{name}.cross")
        hd = g.node("Add", [hd, att], out=f"{name}/residual1")
        ln = _rms_norm(e, hd, block.layer[2].layer_norm, f"{name}.ln2")
        ff = _t5_ff(e, ln, block.layer[2], f"{name}.ff")
        hd = g.node("Add", [hd, ff], out=f"{name}/residual2")
    hd = _rms_norm(e, hd, dec.final_layer_norm, "decoder.final_norm")

    if config.tie_word_embeddings:
        # HF rescales tied logits by d_model**-0.5
        sc = g.const(np.array(np.float32(config.d_model ** -0.5),
                              dtype=np.float32), "logit_scale")
        hd = g.node("Mul", [hd, sc], out="logits_scaled")
    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [hd, head], out="logits", name="lm_head")
    g.output("logits", [batch_size, tgt_len, config.vocab_size])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.shared.weight)
    return model


def _decode_bias_table(attn, max_len: int) -> np.ndarray:
    """Per-step relative-bias rows for the KV-cache layout: row t is
    the live module's bias at query position t over key positions
    [0..max_len-1] plus a SELF column (relative distance 0) --
    [max_len, H, max_len+1], the ``score_bias=`` table
    utils.generate.generate_kv slices per step. Future slots (j > t)
    carry the module's non-causal values; the decode mask Adds -1e9 to
    them before the bias, so they never reach Softmax unmasked."""
    full = _rel_bias(attn, max_len, max_len)[0]          # [H, L, L]
    n_heads = full.shape[0]
    table = np.empty((max_len, n_heads, max_len + 1), np.float32)
    for t in range(max_len):
        table[t, :, :max_len] = full[:, t, :]
        table[t, :, max_len] = full[:, t, t]             # self column
    return table


def _t5_decode_self_attention(e: _ViTEmitter, x: str, attn,
                              layer_idx: int, max_len: int, name: str):
    """One-token T5 self-attention against a fixed-length cache:
    unscaled bias-free projections, scores over [cache | current],
    additive mask input, then the per-step relative-bias input
    (``score_bias``). Returns (context, k_step, v_step)."""
    g = e.g
    n_heads = attn.n_heads
    d_kv = attn.key_value_proj_dim

    q = _matmul_w(e, x, attn.q, f"{name}.q")
    k = _matmul_w(e, x, attn.k, f"{name}.k")
    v = _matmul_w(e, x, attn.v, f"{name}.v")

    def split_heads(t: str, which: str) -> str:
        shape = g.const(np.array([0, 1, n_heads, d_kv], dtype=np.int64),
                        "t5dheadshape")
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
    biased = g.node("Add", [masked, "score_bias"], out=f"{name}/biased")
    probs = g.node("Softmax", [biased], out=f"{name}/probs", axis=-1)

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
    merge = g.const(np.array([0, 1, n_heads * d_kv], dtype=np.int64),
                    "t5dmergeshape")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return _matmul_w(e, merged, attn.o, f"{name}.o"), kh, vh


def _t5_decode_cross_attention(e: _ViTEmitter, x: str, attn, memory: str,
                               src_len: int, name: str) -> str:
    """One-token unscaled bias-free cross-attention over the full
    encoder memory (loop-invariant: XLA hoists the K/V projections out
    of the decode while body)."""
    g = e.g
    n_heads = attn.n_heads
    d_kv = attn.key_value_proj_dim

    q = _matmul_w(e, x, attn.q, f"{name}.q")
    k = _matmul_w(e, memory, attn.k, f"{name}.k")
    v = _matmul_w(e, memory, attn.v, f"{name}.v")

    def split_heads(t: str, seq: int, which: str) -> str:
        shape = g.const(np.array([0, seq, n_heads, d_kv], dtype=np.int64),
                        f"t5xheadshape{seq}")
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
    merge = g.const(np.array([0, 1, n_heads * d_kv], dtype=np.int64),
                    "t5dmergeshape")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return _matmul_w(e, merged, attn.o, f"{name}.o")


def t5_decode_step(config=None, batch_size: int = 2, max_len: int = 8,
                   src_len: int = 12, seed: int = 0, module=None):
    """The KV-cache decode form of the T5 decoder (one token per call,
    O(L)/token). Inputs, in order: ``x_step`` [B, 1, d] (token embed,
    T5 has no positions -- call utils.generate.generate_kv with
    ``wpe=None``), ``attn_mask`` [1, 1, 1, L+1] additive,
    ``score_bias`` [1, H, 1, L+1] (row t of the attached
    ``_decode_bias`` table, fed via ``generate_kv(...,
    score_bias=proto._decode_bias)`` -- T5's relative position bias is
    query-position-dependent, so it must enter per step), then
    ``encoder_memory`` [B, S, d] and ``past_k.i``/``past_v.i``
    [B, H, L, D] per layer. Outputs: ``logits`` [B, 1, V], then per
    layer ``present_k.i``/``present_v.i`` [B, H, 1, D].

    Every decoder layer Adds the SAME score_bias input (HF shares the
    block-0 bias across layers). Same ``seed``/``config`` builds the
    same torch module as t5_conditional_generation, so the graphs
    share weights."""
    import torch
    from transformers import T5ForConditionalGeneration

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = default_config(max(src_len, max_len))
        module = T5ForConditionalGeneration(config).eval()
    config = module.config
    n_heads = config.num_heads
    d_kv = config.d_kv

    g = GraphBuilder("t5_decode_step")
    e = _ViTEmitter(g)
    h = g.input("x_step", [batch_size, 1, config.d_model])
    g.input("attn_mask", [1, 1, 1, max_len + 1])
    g.input("score_bias", [1, n_heads, 1, max_len + 1])
    memory = g.input("encoder_memory",
                     [batch_size, src_len, config.d_model])
    for i in range(config.num_decoder_layers):
        g.input(f"past_k.{i}", [batch_size, n_heads, max_len, d_kv])
        g.input(f"past_v.{i}", [batch_size, n_heads, max_len, d_kv])

    dec = module.decoder
    presents = []
    for i, block in enumerate(dec.block):
        name = f"decoder.block.{i}"
        ln = _rms_norm(e, h, block.layer[0].layer_norm, f"{name}.ln0")
        att, kh, vh = _t5_decode_self_attention(
            e, ln, block.layer[0].SelfAttention, i, max_len,
            f"{name}.self")
        presents.append((kh, vh))
        h = g.node("Add", [h, att], out=f"{name}/residual0")
        ln = _rms_norm(e, h, block.layer[1].layer_norm, f"{name}.ln1")
        att = _t5_decode_cross_attention(
            e, ln, block.layer[1].EncDecAttention, memory, src_len,
            f"{name}.cross")
        h = g.node("Add", [h, att], out=f"{name}/residual1")
        ln = _rms_norm(e, h, block.layer[2].layer_norm, f"{name}.ln2")
        ff = _t5_ff(e, ln, block.layer[2], f"{name}.ff")
        h = g.node("Add", [h, ff], out=f"{name}/residual2")
    h = _rms_norm(e, h, dec.final_layer_norm, "decoder.final_norm")

    if config.tie_word_embeddings:
        sc = g.const(np.array(np.float32(config.d_model ** -0.5),
                              dtype=np.float32), "logit_scale")
        h = g.node("Mul", [h, sc], out="logits_scaled")
    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")

    g.output("logits", [batch_size, 1, config.vocab_size])
    for i, (kh, vh) in enumerate(presents):
        g.node("Identity", [kh], out=f"present_k.{i}",
               name=f"present_k_id.{i}")
        g.node("Identity", [vh], out=f"present_v.{i}",
               name=f"present_v_id.{i}")
        g.output(f"present_k.{i}", [batch_size, n_heads, 1, d_kv])
        g.output(f"present_v.{i}", [batch_size, n_heads, 1, d_kv])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.shared.weight)
    model._decode_bias = _decode_bias_table(
        dec.block[0].layer[0].SelfAttention, max_len)
    return model
