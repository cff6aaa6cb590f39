"""LLaMA-style causal decoder (RMSNorm + RoPE + SwiGLU + GQA) graph
generator.

Fourth transformer domain beside ViT/BERT/GPT, covering the modern-LLM
block structure the GPT-2 layout lacks:

- **RMSNorm** instead of LayerNorm, decomposed into
  Mul/ReduceMean/Add/Sqrt/Div graph nodes (no bias, no mean-subtract);
- **rotary position embeddings** on q/k instead of additive positions:
  cos/sin tables are baked as initializers at the graph's fixed
  sequence length (static shapes under jit), applied with the
  Slice/Neg/Concat "rotate_half" idiom exporters emit;
- **SwiGLU MLP**: down(silu(gate(x)) * up(x)) with Sigmoid*x for SiLU;
- **grouped-query attention**: num_key_value_heads < num_attention
  heads, k/v repeated per group via the Unsqueeze/Expand/Reshape
  repeat_kv idiom.

Like models/gpt.py, the graph input is float ``inputs_embeds``
[batch, seq, hidden]; token embedding is a host gather done by
utils/generate.py, keeping the traced graph purely float. Graphs are
lowered from LIVE transformers modules and verified against the
module's torch forward in tests (reference test strategy,
SURVEY.md §4). The reference framework has no LLM surface at all;
this family is parity-plus.
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .vit import _ViTEmitter, _np


def _rms_norm(e: _ViTEmitter, x: str, norm, name: str) -> str:
    """LlamaRMSNorm: x / sqrt(mean(x^2, -1) + eps) * weight,
    decomposed into graph nodes (ONNX has no standard RMSNorm below
    opset 23)."""
    g = e.g
    sq = g.node("Mul", [x, x], out=f"{name}/Sq_out")
    var = g.node("ReduceMean", [sq], out=f"{name}/Var_out", axes=[-1],
                 keepdims=1)
    eps = g.const(np.array(np.float32(norm.variance_epsilon),
                           dtype=np.float32), "rmseps")
    ve = g.node("Add", [var, eps], out=f"{name}/AddEps_out")
    std = g.node("Sqrt", [ve], out=f"{name}/Sqrt_out")
    normed = g.node("Div", [x, std], out=f"{name}/Div_out")
    w = g.init(f"{name}.weight", _np(norm.weight))
    return g.node("Mul", [normed, w], out=f"{name}/Mul_out")


def _matmul_w(e: _ViTEmitter, x: str, linear, name: str) -> str:
    """torch Linear without bias (the LLaMA projections): one MatMul
    against the transposed weight."""
    g = e.g
    w = g.init(f"{name}.weight_t", _np(linear.weight).T)
    return g.node("MatMul", [x, w], out=f"{name}/MatMul_out")


def _rotate_half(g: GraphBuilder, t: str, head_dim: int, name: str) -> str:
    """rotate_half(x) = concat(-x[..., d/2:], x[..., :d/2])."""
    z = g.const(np.array([0], dtype=np.int64), "rh_zero")
    h = g.const(np.array([head_dim // 2], dtype=np.int64), "rh_half")
    d = g.const(np.array([head_dim], dtype=np.int64), "rh_full")
    ax = g.const(np.array([-1], dtype=np.int64), "rh_axis")
    lo = g.node("Slice", [t, z, h, ax], out=f"{name}/lo")
    hi = g.node("Slice", [t, h, d, ax], out=f"{name}/hi")
    neg = g.node("Neg", [hi], out=f"{name}/neg_hi")
    return g.node("Concat", [neg, lo], out=f"{name}/rotated", axis=-1)


def _apply_rope(g: GraphBuilder, t: str, cos: str, sin: str,
                head_dim: int, name: str) -> str:
    """q*cos + rotate_half(q)*sin on a [B, heads, N, head_dim] tensor
    (cos/sin broadcast from [1, 1, N, head_dim])."""
    tc = g.node("Mul", [t, cos], out=f"{name}/cos_mul")
    rot = _rotate_half(g, t, head_dim, name)
    ts = g.node("Mul", [rot, sin], out=f"{name}/sin_mul")
    return g.node("Add", [tc, ts], out=f"{name}/roped")


def _repeat_kv(e: _ViTEmitter, t: str, n_kv: int, n_rep: int, seq: int,
               head_dim: int, name: str) -> str:
    """HF repeat_kv: [B, n_kv, N, D] -> [B, n_kv*n_rep, N, D] by
    interleaved repetition (Unsqueeze + Expand + Reshape)."""
    if n_rep == 1:
        return t
    g = e.g
    ax2 = g.const(np.array([2], dtype=np.int64), "rkv_axes2")
    u = g.node("Unsqueeze", [t, ax2], out=f"{name}/unsq")
    target = g.const(np.array([1, n_kv, n_rep, seq, head_dim],
                              dtype=np.int64), "rkv_target")
    x = g.node("Expand", [u, target], out=f"{name}/expanded")
    merged = g.const(np.array([0, n_kv * n_rep, seq, head_dim],
                              dtype=np.int64), "rkv_merged")
    return g.node("Reshape", [x, merged], out=f"{name}/merged")


def _rope_tables(module, seq_len: int):
    """cos/sin [1, 1, seq, head_dim] from the live module's rotary
    embedding (covers rope scaling variants the module configures)."""
    import torch

    pos = torch.arange(seq_len)[None]
    dummy = torch.zeros(1, seq_len, module.config.hidden_size)
    cos, sin = module.model.rotary_emb(dummy, pos)
    return (_np(cos)[None], _np(sin)[None])  # [1, 1, N, D]


def _llama_attention(e: _ViTEmitter, x: str, attn, seq_len: int,
                     cos: str, sin: str, name: str,
                     window: int | None = None,
                     presents: list = None) -> str:
    """LlamaAttention (eager): separate q/k/v projections, RoPE on q/k,
    grouped-query repeat of k/v, causal additive mask, softmax,
    context, o_proj. ``window`` bands the causal mask (Mistral-style
    sliding-window attention: only the last ``window`` positions at or
    before each query stay visible)."""
    g = e.g
    cfg = attn.config
    n_heads = cfg.num_attention_heads
    n_kv = cfg.num_key_value_heads
    head_dim = attn.head_dim
    n_rep = n_heads // n_kv

    q = _matmul_w(e, x, attn.q_proj, f"{name}.q_proj")
    k = _matmul_w(e, x, attn.k_proj, f"{name}.k_proj")
    v = _matmul_w(e, x, attn.v_proj, f"{name}.v_proj")

    def split_heads(t: str, n: int, which: str) -> str:
        shape = g.const(np.array([0, seq_len, n, head_dim],
                                 dtype=np.int64), f"headshape{n}")
        r = g.node("Reshape", [t, shape], out=f"{name}/{which}_Reshape")
        return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                      perm=[0, 2, 1, 3])

    qh = split_heads(q, n_heads, "q")
    kh = split_heads(k, n_kv, "k")
    vh = split_heads(v, n_kv, "v")

    qh = _apply_rope(g, qh, cos, sin, head_dim, f"{name}/q_rope")
    kh = _apply_rope(g, kh, cos, sin, head_dim, f"{name}/k_rope")

    if presents is not None:
        # the decode cache layout: post-RoPE k, PRE-repeat kv heads
        presents.append((kh, vh))
    kh = _repeat_kv(e, kh, n_kv, n_rep, seq_len, head_dim, f"{name}/k_rep")
    vh = _repeat_kv(e, vh, n_kv, n_rep, seq_len, head_dim, f"{name}/v_rep")

    kt = g.node("Transpose", [kh], out=f"{name}/k_T", perm=[0, 1, 3, 2])
    scores = g.node("MatMul", [qh, kt], out=f"{name}/scores")
    scal = g.const(np.array(np.float32(attn.scaling), dtype=np.float32),
                   "scaling")
    scaled = g.node("Mul", [scores, scal], out=f"{name}/scaled")

    i, j = np.indices((seq_len, seq_len))
    visible = (j <= i) if window is None \
        else (j <= i) & (j > i - int(window))
    mask = np.where(visible, np.float32(0), np.float32(-1e9))
    mc = g.init(f"{name}.causal_mask", mask[None, None].astype(np.float32))
    masked = g.node("Add", [scaled, mc], out=f"{name}/masked")

    probs = g.node("Softmax", [masked], out=f"{name}/probs", axis=-1)
    ctx = g.node("MatMul", [probs, vh], out=f"{name}/context")
    ctx = g.node("Transpose", [ctx], out=f"{name}/context_T",
                 perm=[0, 2, 1, 3])
    merge = g.const(np.array([0, seq_len, n_heads * head_dim],
                             dtype=np.int64), "mergeshape")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return _matmul_w(e, merged, attn.o_proj, f"{name}.o_proj")


def _swiglu_mlp(e: _ViTEmitter, x: str, mlp, name: str) -> str:
    """LlamaMLP: down_proj(silu(gate_proj(x)) * up_proj(x)); SiLU is
    emitted as Sigmoid*x (the torch exporter decomposition)."""
    g = e.g
    gate = _matmul_w(e, x, mlp.gate_proj, f"{name}.gate_proj")
    sig = g.node("Sigmoid", [gate], out=f"{name}/Sigmoid_out")
    silu = g.node("Mul", [gate, sig], out=f"{name}/SiLU_out")
    up = _matmul_w(e, x, mlp.up_proj, f"{name}.up_proj")
    h = g.node("Mul", [silu, up], out=f"{name}/Gate_out")
    return _matmul_w(e, h, mlp.down_proj, f"{name}.down_proj")


def _llama_block(e: _ViTEmitter, x: str, layer, seq_len: int,
                 cos: str, sin: str, name: str,
                 window: int | None = None, presents: list = None) -> str:
    """LlamaDecoderLayer: pre-RMSNorm attention + residual,
    pre-RMSNorm SwiGLU MLP + residual."""
    g = e.g
    ln1 = _rms_norm(e, x, layer.input_layernorm, f"{name}.input_norm")
    att = _llama_attention(e, ln1, layer.self_attn, seq_len, cos, sin,
                           f"{name}.self_attn", window=window,
                           presents=presents)
    x1 = g.node("Add", [att, x], out=f"{name}/residual1")
    ln2 = _rms_norm(e, x1, layer.post_attention_layernorm,
                    f"{name}.post_norm")
    mlp = _swiglu_mlp(e, ln2, layer.mlp, f"{name}.mlp")
    return g.node("Add", [mlp, x1], out=f"{name}/residual2")


def default_config(seq_len: int = 16):
    from transformers import LlamaConfig

    return LlamaConfig(vocab_size=96, hidden_size=32,
                       intermediate_size=48, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=seq_len,
                       attn_implementation="eager")


def llama_causal_lm(config=None, batch_size: int = 2, seq_len: int = 16,
                    seed: int = 0, module=None):
    """LlamaForCausalLM over float ``inputs_embeds`` [batch, seq,
    hidden] -> ``logits`` [batch, seq, vocab]. RoPE cos/sin tables
    bake as initializers at this fixed seq_len. ``_torch_module`` is
    the live float oracle; ``_wte`` rides along for utils.generate."""
    import torch
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = default_config(seq_len)
        module = LlamaForCausalLM(config).eval()
    config = module.config
    head_dim = module.model.layers[0].self_attn.head_dim

    g = GraphBuilder("llama_causal_lm")
    e = _ViTEmitter(g)
    h = g.input("inputs_embeds", [batch_size, seq_len, config.hidden_size])

    cos_np, sin_np = _rope_tables(module, seq_len)
    cos = g.init("rope.cos", cos_np)
    sin = g.init("rope.sin", sin_np)

    # Mistral-style configs band the causal mask to the last
    # `sliding_window` positions; the fused-attention matcher folds the
    # banded constant into the kernel (causal_window)
    window = getattr(config, "sliding_window", None)
    for i, layer in enumerate(module.model.layers):
        h = _llama_block(e, h, layer, seq_len, cos, sin, f"layers.{i}",
                         window=window)
    h = _rms_norm(e, h, module.model.norm, "norm")

    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")
    g.output("logits", [batch_size, seq_len, config.vocab_size])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.model.embed_tokens.weight)  # [vocab, hidden]
    model._head_dim = head_dim
    return model


def mistral_default_config(seq_len: int = 16, sliding_window: int = 6):
    from transformers import MistralConfig

    return MistralConfig(vocab_size=96, hidden_size=32,
                         intermediate_size=48, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         sliding_window=sliding_window,
                         max_position_embeddings=seq_len,
                         attn_implementation="eager")


def mistral_causal_lm(config=None, batch_size: int = 2, seq_len: int = 16,
                      seed: int = 0):
    """Mistral-style causal LM: the LLaMA block structure (RMSNorm +
    RoPE + SwiGLU + GQA) with SLIDING-WINDOW attention -- the banded
    causal mask constant that the fused-attention matcher folds into
    the kernels' ``causal_window``. Lowered from a live
    MistralForCausalLM module (same emitter: the module is
    llama-shaped), verified against its torch forward in tests."""
    import torch
    from transformers.models.mistral.modeling_mistral import (
        MistralForCausalLM)

    torch.manual_seed(seed)
    if config is None:
        config = mistral_default_config(seq_len)
    module = MistralForCausalLM(config).eval()
    return llama_causal_lm(batch_size=batch_size, seq_len=seq_len,
                           module=module)


def _llama_decode_attention(e: _ViTEmitter, x: str, attn, layer_idx: int,
                            max_len: int, name: str):
    """One-token LLaMA attention against a fixed-length rotated-k
    cache (models/gpt.py _decode_attention structure, with RoPE on the
    current q/k from the ``cos_step``/``sin_step`` graph inputs and
    GQA repeat of the cache). Returns (context, k_step, v_step) --
    k_step already rotated, so cached keys need no position fixup."""
    g = e.g
    cfg = attn.config
    n_heads = cfg.num_attention_heads
    n_kv = cfg.num_key_value_heads
    head_dim = attn.head_dim
    n_rep = n_heads // n_kv

    q = _matmul_w(e, x, attn.q_proj, f"{name}.q_proj")
    k = _matmul_w(e, x, attn.k_proj, f"{name}.k_proj")
    v = _matmul_w(e, x, attn.v_proj, f"{name}.v_proj")

    def split_heads(t: str, n: int, which: str) -> str:
        shape = g.const(np.array([0, 1, n, head_dim], dtype=np.int64),
                        f"dheadshape{n}")
        r = g.node("Reshape", [t, shape], out=f"{name}/{which}_Reshape")
        return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                      perm=[0, 2, 1, 3])

    qh = split_heads(q, n_heads, "q")
    kh = split_heads(k, n_kv, "k")
    vh = split_heads(v, n_kv, "v")

    qh = _apply_rope(g, qh, "cos_step", "sin_step", head_dim,
                     f"{name}/q_rope")
    kh = _apply_rope(g, kh, "cos_step", "sin_step", head_dim,
                     f"{name}/k_rope")

    # grouped-query: repeat the CACHE and the step k/v to full heads
    k_cache = _repeat_kv(e, f"past_k.{layer_idx}", n_kv, n_rep, max_len,
                         head_dim, f"{name}/kc_rep")
    v_cache = _repeat_kv(e, f"past_v.{layer_idx}", n_kv, n_rep, max_len,
                         head_dim, f"{name}/vc_rep")
    kh_full = _repeat_kv(e, kh, n_kv, n_rep, 1, head_dim, f"{name}/k_rep")
    vh_full = _repeat_kv(e, vh, n_kv, n_rep, 1, head_dim, f"{name}/v_rep")

    kt_cache = g.node("Transpose", [k_cache], out=f"{name}/cache_k_T",
                      perm=[0, 1, 3, 2])
    s_past = g.node("MatMul", [qh, kt_cache], out=f"{name}/scores_past")
    kt_step = g.node("Transpose", [kh_full], out=f"{name}/k_T",
                     perm=[0, 1, 3, 2])
    s_self = g.node("MatMul", [qh, kt_step], out=f"{name}/scores_self")
    s = g.node("Concat", [s_past, s_self], out=f"{name}/scores", axis=-1)
    scal = g.const(np.array(np.float32(attn.scaling), dtype=np.float32),
                   "scaling")
    scaled = g.node("Mul", [s, scal], out=f"{name}/scaled")
    masked = g.node("Add", [scaled, "attn_mask"], out=f"{name}/masked")
    probs = g.node("Softmax", [masked], out=f"{name}/probs", axis=-1)

    z = g.const(np.array([0], dtype=np.int64), "zero")
    ll = g.const(np.array([max_len], dtype=np.int64), "maxlen")
    lp1 = g.const(np.array([max_len + 1], dtype=np.int64), "maxlenp1")
    ax = g.const(np.array([-1], dtype=np.int64), "lastaxis")
    p_past = g.node("Slice", [probs, z, ll, ax], out=f"{name}/p_past")
    p_self = g.node("Slice", [probs, ll, lp1, ax], out=f"{name}/p_self")
    ctx = g.node("MatMul", [p_past, v_cache], out=f"{name}/ctx_past")
    self_ctx = g.node("Mul", [p_self, vh_full], out=f"{name}/ctx_self")
    ctx = g.node("Add", [ctx, self_ctx], out=f"{name}/context")

    ctx = g.node("Transpose", [ctx], out=f"{name}/context_T",
                 perm=[0, 2, 1, 3])
    merge = g.const(np.array([0, 1, n_heads * head_dim], dtype=np.int64),
                    "dmergeshape")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return _matmul_w(e, merged, attn.o_proj, f"{name}.o_proj"), kh, vh


def llama_decode_step(config=None, batch_size: int = 2, max_len: int = 16,
                      seed: int = 0, module=None):
    """The KV-cache decode form of :func:`llama_causal_lm` (one token
    per call, O(L)/token). Inputs, in order: ``x_step`` [B,1,H],
    ``attn_mask`` [1,1,1,L+1] additive, ``cos_step``/``sin_step``
    [1,1,1,head_dim] (the RoPE row at the current position, gathered
    by the caller -- utils.generate.generate_kv with rope=...), then
    ``past_k.i``/``past_v.i`` [B, n_kv_heads, L, head_dim] per layer.
    Outputs: ``logits`` [B,1,V], then per layer ``present_k.i``/
    ``present_v.i`` [B, n_kv_heads, 1, head_dim] (k already rotated).

    Same ``seed``/``config`` builds the SAME torch module as
    llama_causal_lm, so both forms share weights."""
    import torch
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = default_config(max_len)
        module = LlamaForCausalLM(config).eval()
    config = module.config
    n_kv = config.num_key_value_heads
    head_dim = module.model.layers[0].self_attn.head_dim

    g = GraphBuilder("llama_decode_step")
    e = _ViTEmitter(g)
    h = g.input("x_step", [batch_size, 1, config.hidden_size])
    g.input("attn_mask", [1, 1, 1, max_len + 1])
    g.input("cos_step", [1, 1, 1, head_dim])
    g.input("sin_step", [1, 1, 1, head_dim])
    for i in range(config.num_hidden_layers):
        g.input(f"past_k.{i}", [batch_size, n_kv, max_len, head_dim])
        g.input(f"past_v.{i}", [batch_size, n_kv, max_len, head_dim])

    presents = []
    for i, layer in enumerate(module.model.layers):
        name = f"layers.{i}"
        ln1 = _rms_norm(e, h, layer.input_layernorm, f"{name}.input_norm")
        att, kh, vh = _llama_decode_attention(e, ln1, layer.self_attn, i,
                                              max_len, f"{name}.self_attn")
        presents.append((kh, vh))
        x1 = g.node("Add", [att, h], out=f"{name}/residual1")
        ln2 = _rms_norm(e, x1, layer.post_attention_layernorm,
                        f"{name}.post_norm")
        mlp = _swiglu_mlp(e, ln2, layer.mlp, f"{name}.mlp")
        h = g.node("Add", [mlp, x1], out=f"{name}/residual2")

    h = _rms_norm(e, h, module.model.norm, "norm")
    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")

    g.output("logits", [batch_size, 1, config.vocab_size])
    for i, (kh, vh) in enumerate(presents):
        g.node("Identity", [kh], out=f"present_k.{i}",
               name=f"present_k_id.{i}")
        g.node("Identity", [vh], out=f"present_v.{i}",
               name=f"present_v_id.{i}")
        g.output(f"present_k.{i}", [batch_size, n_kv, 1, head_dim])
        g.output(f"present_v.{i}", [batch_size, n_kv, 1, head_dim])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.model.embed_tokens.weight)
    model._rope_tables = _rope_tables(module, max_len)  # [1,1,L,D] each
    model._head_dim = head_dim
    return model


def llama_prefill(config=None, prefill_len: int = 8, seed: int = 0,
                  module=None):
    """The PREFILL form of :func:`llama_causal_lm`: one request's
    prompt in one call, exposing every layer's cache-layout K/V --
    ``inputs_embeds`` [1, P, H] -> ``logits`` [1, P, V] plus
    ``present_k.i``/``present_v.i`` [1, n_kv_heads, P, head_dim]
    (post-RoPE k, PRE-repeat kv heads: exactly what llama_decode_step's
    cache inputs expect). RoPE tables bake at positions 0..P-1, which
    is always right for admission-time prefill.

    utils.serving.ContinuousBatcher uses it to admit a request with ONE
    MXU-shaped call; prompts shorter than P pad on the right (the
    static causal mask keeps padded positions out of live rows)."""
    import torch
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = default_config(prefill_len)
        module = LlamaForCausalLM(config).eval()
    config = module.config
    n_kv = config.num_key_value_heads
    head_dim = module.model.layers[0].self_attn.head_dim

    g = GraphBuilder("llama_prefill")
    e = _ViTEmitter(g)
    h = g.input("inputs_embeds", [1, prefill_len, config.hidden_size])
    cos_np, sin_np = _rope_tables(module, prefill_len)
    cos = g.init("rope.cos", cos_np)
    sin = g.init("rope.sin", sin_np)
    window = getattr(config, "sliding_window", None)
    presents = []
    for i, layer in enumerate(module.model.layers):
        h = _llama_block(e, h, layer, prefill_len, cos, sin,
                         f"layers.{i}", window=window, presents=presents)
    h = _rms_norm(e, h, module.model.norm, "norm")
    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")

    g.output("logits", [1, prefill_len, config.vocab_size])
    for i, (kh, vh) in enumerate(presents):
        g.node("Identity", [kh], out=f"present_k.{i}",
               name=f"present_k_id.{i}")
        g.node("Identity", [vh], out=f"present_v.{i}",
               name=f"present_v_id.{i}")
        g.output(f"present_k.{i}", [1, n_kv, prefill_len, head_dim])
        g.output(f"present_v.{i}", [1, n_kv, prefill_len, head_dim])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.model.embed_tokens.weight)
    model._head_dim = head_dim
    model._rope_tables = _rope_tables(module,
                                      config.max_position_embeddings)
    return model
