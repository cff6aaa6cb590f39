"""Mixtral-style sparse-MoE causal decoder graph generator.

Fifth transformer domain: the LLaMA block (RMSNorm + RoPE + GQA,
reused from models/llama.py) with the dense MLP swapped for a
top-k-routed mixture of SwiGLU experts. Routing lowers as pure graph
ops -- Softmax over router logits, TopK, renormalize, OneHot ->
per-expert weights -- and execution is DENSE dispatch: every expert
runs on every token and the one-hot routing weights zero the unselected
ones. That is the TPU-idiomatic shape at zoo scale: static shapes, no
gather/scatter of ragged token groups, bit-matches HF's sparse
index_add dispatch because unselected contributions multiply by
exactly 0.0.

Expert parallelism stays out of scope (SURVEY.md §2.3); experts here
are graph-level subcomputations that XLA fuses per chip. The reference
framework has no LLM surface at all; parity-plus.
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .llama import (_llama_attention, _llama_decode_attention, _rms_norm,
                    _rope_tables)
from .vit import _ViTEmitter, _np


def _expert_swiglu(e: _ViTEmitter, x: str, expert, name: str) -> str:
    """MixtralBlockSparseTop2MLP: w2(silu(w1(x)) * w3(x)), all
    bias-free Linears."""
    g = e.g

    def matw(t, linear, nm):
        w = g.init(f"{nm}.weight_t", _np(linear.weight).T)
        return g.node("MatMul", [t, w], out=f"{nm}/MatMul_out")

    gate = matw(x, expert.w1, f"{name}.w1")
    sig = g.node("Sigmoid", [gate], out=f"{name}/Sigmoid_out")
    silu = g.node("Mul", [gate, sig], out=f"{name}/SiLU_out")
    up = matw(x, expert.w3, f"{name}.w3")
    h = g.node("Mul", [silu, up], out=f"{name}/Gate_out")
    return matw(h, expert.w2, f"{name}.w2")


def _moe_block(e: _ViTEmitter, x: str, moe, name: str) -> str:
    """MixtralSparseMoeBlock as dense graph ops: router softmax over
    ALL experts, TopK, renormalize among the selected, OneHot ->
    [*, E] per-expert weights, weighted sum of every expert's output
    (HF forward: modeling_mixtral.py MixtralSparseMoeBlock.forward)."""
    g = e.g
    n_exp = moe.num_experts
    top_k = moe.top_k

    rw = g.init(f"{name}.gate.weight_t", _np(moe.gate.weight).T)
    logits = g.node("MatMul", [x, rw], out=f"{name}/router_logits")
    probs = g.node("Softmax", [logits], out=f"{name}/router_probs",
                   axis=-1)
    kc = g.const(np.array([top_k], dtype=np.int64), "moe_k")
    topv, topi = g.node("TopK", [probs, kc], out=f"{name}/TopK",
                        n_outputs=2, axis=-1)
    ssum = g.node("ReduceSum", [topv], out=f"{name}/top_sum", axes=[-1],
                  keepdims=1)
    norm = g.node("Div", [topv, ssum], out=f"{name}/top_norm")

    depth = g.const(np.array(n_exp, dtype=np.int64), "moe_depth")
    onoff = g.const(np.array([0.0, 1.0], dtype=np.float32), "moe_onoff")
    oh = g.node("OneHot", [topi, depth, onoff], out=f"{name}/onehot",
                axis=-1)                                  # [*, k, E]
    ax_last = g.const(np.array([-1], dtype=np.int64), "moe_last_axis")
    normu = g.node("Unsqueeze", [norm, ax_last], out=f"{name}/norm_u")
    wmask = g.node("Mul", [oh, normu], out=f"{name}/weighted_mask")
    # sum over the k slots -> per-expert weight [*, E]
    w = g.node("ReduceSum", [wmask], out=f"{name}/expert_w", axes=[-2],
               keepdims=0)

    acc = None
    for ei, expert in enumerate(moe.experts):
        y = _expert_swiglu(e, x, expert, f"{name}.experts.{ei}")
        s0 = g.const(np.array([ei], dtype=np.int64), "moe_s0")
        s1 = g.const(np.array([ei + 1], dtype=np.int64), "moe_s1")
        we = g.node("Slice", [w, s0, s1, ax_last],
                    out=f"{name}/w_{ei}")                 # [*, 1]
        term = g.node("Mul", [y, we], out=f"{name}/scaled_{ei}")
        acc = term if acc is None else \
            g.node("Add", [acc, term], out=f"{name}/acc_{ei}")
    return acc


def default_config(seq_len: int = 16):
    from transformers import MixtralConfig

    return MixtralConfig(vocab_size=96, hidden_size=32,
                         intermediate_size=48, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         num_local_experts=4, num_experts_per_tok=2,
                         max_position_embeddings=seq_len,
                         attn_implementation="eager")


def mixtral_causal_lm(config=None, batch_size: int = 2, seq_len: int = 16,
                      seed: int = 0, module=None):
    """MixtralForCausalLM over float ``inputs_embeds`` [batch, seq,
    hidden] -> ``logits`` [batch, seq, vocab]. Attention/RoPE emission
    is shared with models/llama.py (Mixtral uses the LLaMA attention);
    each decoder layer's MLP is the routed expert mixture."""
    import torch
    from transformers.models.mixtral.modeling_mixtral import (
        MixtralForCausalLM)

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = default_config(seq_len)
        module = MixtralForCausalLM(config).eval()
    config = module.config

    g = GraphBuilder("mixtral_causal_lm")
    e = _ViTEmitter(g)
    h = g.input("inputs_embeds", [batch_size, seq_len, config.hidden_size])

    cos_np, sin_np = _rope_tables(module, seq_len)
    cos = g.init("rope.cos", cos_np)
    sin = g.init("rope.sin", sin_np)

    for i, layer in enumerate(module.model.layers):
        name = f"layers.{i}"
        ln1 = _rms_norm(e, h, layer.input_layernorm, f"{name}.input_norm")
        att = _llama_attention(e, ln1, layer.self_attn, seq_len, cos, sin,
                               f"{name}.self_attn")
        x1 = g.node("Add", [att, h], out=f"{name}/residual1")
        ln2 = _rms_norm(e, x1, layer.post_attention_layernorm,
                        f"{name}.post_norm")
        moe = _moe_block(e, ln2, layer.block_sparse_moe, f"{name}.moe")
        h = g.node("Add", [moe, x1], out=f"{name}/residual2")

    h = _rms_norm(e, h, module.model.norm, "norm")
    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")
    g.output("logits", [batch_size, seq_len, config.vocab_size])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.model.embed_tokens.weight)
    return model


def mixtral_decode_step(config=None, batch_size: int = 2,
                        max_len: int = 16, seed: int = 0, module=None):
    """The KV-cache decode form of :func:`mixtral_causal_lm` (one token
    per call, O(L)/token): the llama RoPE/GQA decode attention
    (models/llama.py input contract -- x_step, attn_mask,
    cos_step/sin_step, per-layer past_k/past_v) with the routed expert
    mixture as the MLP. Same ``seed``/``config`` builds the SAME torch
    module as mixtral_causal_lm, so both forms share weights; drive it
    with utils.generate_kv(..., rope=model._rope_tables, wpe=None)."""
    import torch
    from transformers.models.mixtral.modeling_mixtral import (
        MixtralForCausalLM)

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = default_config(max_len)
        module = MixtralForCausalLM(config).eval()
    config = module.config
    n_kv = config.num_key_value_heads
    head_dim = module.model.layers[0].self_attn.head_dim

    g = GraphBuilder("mixtral_decode_step")
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
        moe = _moe_block(e, ln2, layer.block_sparse_moe, f"{name}.moe")
        h = g.node("Add", [moe, x1], out=f"{name}/residual2")

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
    model._rope_tables = _rope_tables(module, max_len)
    return model
