"""GPT-style causal decoder (autoregressive LM) ONNX graph generator.

Third transformer domain beside ViT/BERT: causal (masked) self-attention
with merged-QKV Conv1D projections (the GPT-2 layout), pre-LN blocks,
and a weight-tied LM head. The graph's input is ``inputs_embeds``
[batch, seq, hidden] rather than token ids: token embedding is a host
gather the generation loop does in raw JAX (utils/generate.py), which
keeps the traced graph purely float and lets the WHOLE decode loop
compile into one XLA program with this framework's jitted forward
inside (ids stay traced int32 in the loop, never crossing the host
int64 shape domain).

The causal mask is an additive [1,1,T,T] constant (0 below the
diagonal, -1e9 above) between the score scaling and the Softmax --
the idiom onnxruntime's transformer exporters emit.

Like models/vit.py, graphs are lowered from LIVE transformers modules
with this package's builder, and verified against the module's torch
forward in tests (reference test strategy, SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .vit import _ViTEmitter, _np


def _conv1d(e: _ViTEmitter, x: str, conv1d, name: str) -> str:
    """GPT-2 Conv1D: y = x @ W + b with W stored [in, out] (NOT the
    torch Linear transpose)."""
    g = e.g
    w = g.init(f"{name}.weight", _np(conv1d.weight))
    y = g.node("MatMul", [x, w], out=f"{name}/MatMul_out")
    b = g.init(f"{name}.bias", _np(conv1d.bias))
    return g.node("Add", [y, b], out=f"{name}/Add_out")


def _causal_attention(e: _ViTEmitter, x: str, attn, seq_len: int,
                      name: str, presents: list = None) -> str:
    """GPT2Attention: merged c_attn -> Split(q,k,v) -> head split ->
    scaled scores + causal mask -> softmax -> context -> c_proj.
    When ``presents`` is given, the per-head K/V tensors are appended
    to it (the prefill form exposes them as graph outputs)."""
    g = e.g
    num_heads = attn.num_heads
    head_size = attn.head_dim

    qkv = _conv1d(e, x, attn.c_attn, f"{name}.c_attn")
    q, k, v = g.node("Split", [qkv], out=f"{name}/qkv_split", n_outputs=3,
                     axis=-1, num_outputs=3)

    b_dim = e.batch_dim(x, f"{name}/bdim")
    tail = g.const(np.array([-1, num_heads, head_size], dtype=np.int64),
                   "headshape")
    new_shape = g.node("Concat", [b_dim, tail], out=f"{name}/Concat_shape",
                       axis=0)

    def split_heads(t: str, which: str) -> str:
        r = g.node("Reshape", [t, new_shape], out=f"{name}/{which}_Reshape")
        return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                      perm=[0, 2, 1, 3])

    qh, kh, vh = split_heads(q, "q"), split_heads(k, "k"), split_heads(v, "v")
    if presents is not None:
        presents.append((kh, vh))
    kt = g.node("Transpose", [kh], out=f"{name}/k_T", perm=[0, 1, 3, 2])
    scores = g.node("MatMul", [qh, kt], out=f"{name}/scores")
    scal = g.const(np.array(np.float32(1.0 / np.sqrt(head_size)),
                            dtype=np.float32), "scaling")
    scaled = g.node("Mul", [scores, scal], out=f"{name}/scaled")

    mask = np.triu(np.full((seq_len, seq_len), np.float32(-1e9)), k=1)
    mask = mask[None, None].astype(np.float32)
    mc = g.init(f"{name}.causal_mask", mask)
    masked = g.node("Add", [scaled, mc], out=f"{name}/masked")

    probs = g.node("Softmax", [masked], out=f"{name}/probs", axis=-1)
    ctx = g.node("MatMul", [probs, vh], out=f"{name}/context")
    ctx = g.node("Transpose", [ctx], out=f"{name}/context_T",
                 perm=[0, 2, 1, 3])
    merge_tail = g.const(np.array([-1, num_heads * head_size],
                                  dtype=np.int64), "mergeshape")
    merge_shape = g.node("Concat", [b_dim, merge_tail],
                         out=f"{name}/Concat_merge", axis=0)
    merged = g.node("Reshape", [ctx, merge_shape], out=f"{name}/merged")
    return _conv1d(e, merged, attn.c_proj, f"{name}.c_proj")


def _gpt_block(e: _ViTEmitter, x: str, block, seq_len: int,
               name: str, presents: list = None) -> str:
    """GPT2Block: pre-LN causal attention + residual, pre-LN MLP +
    residual (gelu activation)."""
    g = e.g
    ln1 = e.layernorm(x, block.ln_1, f"{name}.ln_1")
    att = _causal_attention(e, ln1, block.attn, seq_len, f"{name}.attn",
                            presents)
    x1 = g.node("Add", [att, x], out=f"{name}/residual1")
    ln2 = e.layernorm(x1, block.ln_2, f"{name}.ln_2")
    fc = _conv1d(e, ln2, block.mlp.c_fc, f"{name}.mlp.c_fc")
    act = e.gelu(fc, f"{name}.mlp.gelu")
    proj = _conv1d(e, act, block.mlp.c_proj, f"{name}.mlp.c_proj")
    return g.node("Add", [proj, x1], out=f"{name}/residual2")


def gpt_causal_lm(config=None, batch_size: int = 2, seq_len: int = 16,
                  seed: int = 0, module=None):
    """GPT2LMHeadModel over float ``inputs_embeds`` [batch, seq, hidden]
    -> ``logits`` [batch, seq, vocab]. Position embeddings add inside
    the graph; token embedding happens OUTSIDE (the ``_wte`` table rides
    on the returned proto for utils.generate). ``_torch_module`` is the
    live float oracle. Pass ``module=`` to lower existing weights (the
    trained text fixture, models/text_fixture.py)."""
    import torch
    from transformers import GPT2Config
    from transformers.models.gpt2.modeling_gpt2 import GPT2LMHeadModel

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = GPT2Config(vocab_size=96, n_positions=seq_len,
                                n_embd=32, n_layer=2, n_head=2,
                                activation_function="gelu")
        config.attn_implementation = "eager"
        module = GPT2LMHeadModel(config).eval()
    config = module.config
    assert config.activation_function == "gelu", config.activation_function

    g = GraphBuilder("gpt_causal_lm")
    e = _ViTEmitter(g)
    x = g.input("inputs_embeds", [batch_size, seq_len, config.n_embd])

    wpe = g.init("wpe.slice", _np(module.transformer.wpe.weight)[:seq_len])
    h = g.node("Add", [x, wpe], out="/pos_add")
    for i, block in enumerate(module.transformer.h):
        h = _gpt_block(e, h, block, seq_len, f"h.{i}")
    h = e.layernorm(h, module.transformer.ln_f, "ln_f")

    # weight-tied LM head: logits = h @ wte^T
    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")
    g.output("logits", [batch_size, seq_len, config.vocab_size])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.transformer.wte.weight)  # [vocab, hidden]
    model._wpe = _np(module.transformer.wpe.weight)  # [n_pos, hidden]
    return model


def _decode_attention(e: _ViTEmitter, x: str, attn, layer_idx: int,
                      max_len: int, name: str):
    """One-token causal attention against a fixed-length cache: scores
    over [cache | current] (static L+1 lane), additive mask input
    invalidates the cache tail, probabilities split back into a cache
    matmul plus a self term. Returns (context, k_step, v_step)."""
    g = e.g
    num_heads, head_size = attn.num_heads, attn.head_dim

    qkv = _conv1d(e, x, attn.c_attn, f"{name}.c_attn")
    q, k, v = g.node("Split", [qkv], out=f"{name}/qkv_split", n_outputs=3,
                     axis=-1, num_outputs=3)
    b_dim = e.batch_dim(x, f"{name}/bdim")
    tail = g.const(np.array([-1, num_heads, head_size], dtype=np.int64),
                   "headshape")
    new_shape = g.node("Concat", [b_dim, tail], out=f"{name}/Concat_shape",
                       axis=0)

    def split_heads(t: str, which: str) -> str:
        r = g.node("Reshape", [t, new_shape], out=f"{name}/{which}_Reshape")
        return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                      perm=[0, 2, 1, 3])

    qh, kh, vh = split_heads(q, "q"), split_heads(k, "k"), split_heads(v, "v")

    kt_cache = g.node("Transpose", [f"past_k.{layer_idx}"],
                      out=f"{name}/cache_k_T", perm=[0, 1, 3, 2])
    s_past = g.node("MatMul", [qh, kt_cache], out=f"{name}/scores_past")
    kt_step = g.node("Transpose", [kh], out=f"{name}/k_T", perm=[0, 1, 3, 2])
    s_self = g.node("MatMul", [qh, kt_step], out=f"{name}/scores_self")
    s = g.node("Concat", [s_past, s_self], out=f"{name}/scores", axis=-1)
    scal = g.const(np.array(np.float32(1.0 / np.sqrt(head_size)),
                            dtype=np.float32), "scaling")
    scaled = g.node("Mul", [s, scal], out=f"{name}/scaled")
    masked = g.node("Add", [scaled, "attn_mask"], out=f"{name}/masked")
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
    merge_tail = g.const(np.array([-1, num_heads * head_size],
                                  dtype=np.int64), "mergeshape")
    merge_shape = g.node("Concat", [b_dim, merge_tail],
                         out=f"{name}/Concat_merge", axis=0)
    merged = g.node("Reshape", [ctx, merge_shape], out=f"{name}/merged")
    return _conv1d(e, merged, attn.c_proj, f"{name}.c_proj"), kh, vh


def gpt_decode_step(config=None, batch_size: int = 2, max_len: int = 16,
                    seed: int = 0, module=None):
    """The KV-cache decode form of :func:`gpt_causal_lm`: ONE token per
    call at O(L) cost instead of re-running the full O(L^2) sequence.

    Inputs, in order: ``x_step`` [B,1,H] (wte+wpe added by the caller,
    utils.generate.generate_kv), ``attn_mask`` [1,1,1,L+1] additive
    (-1e9 on cache slots >= t, 0 elsewhere; the last lane -- the current
    token -- is always live), then ``past_k.i``/``past_v.i``
    [B,heads,L,head] per layer. Outputs: ``logits`` [B,1,V], then
    ``present_k.i``/``present_v.i`` [B,heads,1,head] per layer, which
    the caller writes into its cache buffers at position t (a raw-JAX
    dynamic_update_slice -- the graph itself stays static).

    Same ``seed``/``config`` as gpt_causal_lm builds the SAME torch
    module, so both forms share weights; or pass ``module=`` directly.
    """
    import torch
    from transformers import GPT2Config
    from transformers.models.gpt2.modeling_gpt2 import GPT2LMHeadModel

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = GPT2Config(vocab_size=96, n_positions=max_len,
                                n_embd=32, n_layer=2, n_head=2,
                                activation_function="gelu")
        config.attn_implementation = "eager"
        module = GPT2LMHeadModel(config).eval()
    config = module.config
    nh = config.n_head
    hd = config.n_embd // nh

    g = GraphBuilder("gpt_decode_step")
    e = _ViTEmitter(g)
    h = g.input("x_step", [batch_size, 1, config.n_embd])
    g.input("attn_mask", [1, 1, 1, max_len + 1])
    presents = []
    for i in range(config.n_layer):
        g.input(f"past_k.{i}", [batch_size, nh, max_len, hd])
        g.input(f"past_v.{i}", [batch_size, nh, max_len, hd])
    for i, block in enumerate(module.transformer.h):
        name = f"h.{i}"
        ln1 = e.layernorm(h, block.ln_1, f"{name}.ln_1")
        att, kh, vh = _decode_attention(e, ln1, block.attn, i, max_len,
                                        f"{name}.attn")
        presents.append((kh, vh))
        x1 = g.node("Add", [att, h], out=f"{name}/residual1")
        ln2 = e.layernorm(x1, block.ln_2, f"{name}.ln_2")
        fc = _conv1d(e, ln2, block.mlp.c_fc, f"{name}.mlp.c_fc")
        act = e.gelu(fc, f"{name}.mlp.gelu")
        proj = _conv1d(e, act, block.mlp.c_proj, f"{name}.mlp.c_proj")
        h = g.node("Add", [proj, x1], out=f"{name}/residual2")
    h = e.layernorm(h, module.transformer.ln_f, "ln_f")
    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")

    g.output("logits", [batch_size, 1, config.vocab_size])
    for i, (kh, vh) in enumerate(presents):
        g.node("Identity", [kh], out=f"present_k.{i}",
               name=f"present_k_id.{i}")
        g.node("Identity", [vh], out=f"present_v.{i}",
               name=f"present_v_id.{i}")
        g.output(f"present_k.{i}", [batch_size, nh, 1, hd])
        g.output(f"present_v.{i}", [batch_size, nh, 1, hd])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.transformer.wte.weight)
    model._wpe = _np(module.transformer.wpe.weight)
    return model


def gpt_prefill(config=None, prefill_len: int = 8, seed: int = 0,
                module=None):
    """The PREFILL form: the full-sequence causal graph over one
    request's prompt, additionally exposing every layer's K/V heads --
    ``inputs_embeds`` [1, P, H] -> ``logits`` [1, P, V] plus
    ``present_k.i``/``present_v.i`` [1, heads, P, head] per layer.

    utils.serving.ContinuousBatcher uses it to admit a request with ONE
    MXU-shaped call (all prompt tokens at once) instead of O(plen)
    latency-bound teacher-forced steps: the presents are written into
    the slot's cache rows, and row plen-1's logits give the first
    generated token. Prompts shorter than P pad on the right -- the
    static causal mask keeps padded positions out of every live row,
    and the padded cache tail is overwritten by decode steps before any
    mask ever validates it.

    Same ``seed``/``config`` as the other GPT forms builds the SAME
    torch module, so all graphs share weights."""
    import torch
    from transformers import GPT2Config
    from transformers.models.gpt2.modeling_gpt2 import GPT2LMHeadModel

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = GPT2Config(vocab_size=96, n_positions=prefill_len,
                                n_embd=32, n_layer=2, n_head=2,
                                activation_function="gelu")
        config.attn_implementation = "eager"
        module = GPT2LMHeadModel(config).eval()
    config = module.config
    nh = config.n_head
    hd = config.n_embd // nh

    g = GraphBuilder("gpt_prefill")
    e = _ViTEmitter(g)
    x = g.input("inputs_embeds", [1, prefill_len, config.n_embd])
    wpe = g.init("wpe.slice",
                 _np(module.transformer.wpe.weight)[:prefill_len])
    h = g.node("Add", [x, wpe], out="/pos_add")
    presents = []
    for i, block in enumerate(module.transformer.h):
        h = _gpt_block(e, h, block, prefill_len, f"h.{i}", presents)
    h = e.layernorm(h, module.transformer.ln_f, "ln_f")
    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")

    g.output("logits", [1, prefill_len, config.vocab_size])
    for i, (kh, vh) in enumerate(presents):
        g.node("Identity", [kh], out=f"present_k.{i}",
               name=f"present_k_id.{i}")
        g.node("Identity", [vh], out=f"present_v.{i}",
               name=f"present_v_id.{i}")
        g.output(f"present_k.{i}", [1, nh, prefill_len, hd])
        g.output(f"present_v.{i}", [1, nh, prefill_len, hd])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.transformer.wte.weight)
    model._wpe = _np(module.transformer.wpe.weight)
    return model
