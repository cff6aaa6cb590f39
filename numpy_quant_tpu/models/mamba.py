"""Mamba-style selective state-space (SSM) graph generator.

Tenth model domain and the first NON-ATTENTION sequence architecture:
no softmax, no KV cache -- each layer mixes tokens through a causal
depthwise Conv1d and a selective state-space recurrence

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
    y_t = C_t . h_t + D * x_t

whose (dt, B, C) are INPUT-DEPENDENT projections (the "selective"
part, Gu & Dao arXiv:2312.00752). At the graph's fixed sequence length
the recurrence unrolls into L static steps of elementwise ops + one
[B, d_inner, state] x [B, state, 1] matmul each -- exactly the
framework's lowering doctrine (static shapes, trace-time structure,
XLA fuses the elementwise chains), mirroring transformers'
MambaMixer.slow_forward math op for op.

The causal conv is the rank-3 ONNX Conv path (ops/conv.py::conv1d_ncl)
with LEFT-only padding [k-1, 0] -- identical to HF's pad-both-sides
then slice-to-L. The projections (in/x/dt/out) are MatMuls, so int8
PTQ quantizes them while the recurrence stays float (the same
"matmuls integer, rest float" split the reference applies to
attention, reference model.py:503-538).

Like the other families, the graph lowers from a LIVE
MambaForCausalLM module that rides along as the float oracle
(reference test strategy, SURVEY.md §4). The reference framework has
no SSM surface; parity-plus.
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .llama import _matmul_w
from .vit import _ViTEmitter, _np


def mamba_tiny_module(config=None, seed: int = 0):
    import torch
    from transformers import MambaConfig
    from transformers.models.mamba.modeling_mamba import MambaForCausalLM

    torch.manual_seed(seed)
    if config is None:
        config = MambaConfig(vocab_size=96, hidden_size=32, state_size=4,
                             num_hidden_layers=2, conv_kernel=4, expand=2,
                             time_step_rank=8, use_cache=False)
    return MambaForCausalLM(config).eval()


def _silu(g: GraphBuilder, x: str, name: str) -> str:
    sig = g.node("Sigmoid", [x], out=f"{name}/Sigmoid_out")
    return g.node("Mul", [x, sig], out=f"{name}/SiLU_out")


def _mamba_mixer(e: _ViTEmitter, x: str, mixer, seq_len: int,
                 name: str) -> str:
    """MambaMixer.slow_forward: in_proj -> (states | gate), causal
    depthwise conv + SiLU, x_proj -> (dt | B | C), softplus(dt_proj),
    L-step unrolled selective scan, D skip, SiLU gate, out_proj."""
    g = e.g
    d_inner = mixer.intermediate_size
    d_state = mixer.ssm_state_size
    dt_rank = mixer.time_step_rank
    k = mixer.conv_kernel_size

    # in_proj emits [B, L, 2*d_inner]; work in the channel-first layout
    proj = _matmul_w(e, x, mixer.in_proj, f"{name}.in_proj")
    proj = g.node("Transpose", [proj], out=f"{name}/proj_T",
                  perm=[0, 2, 1])                       # [B, 2*di, L]
    z0 = g.const(np.array([0], dtype=np.int64), "mb_zero")
    di = g.const(np.array([d_inner], dtype=np.int64), f"mb_di{d_inner}")
    di2 = g.const(np.array([2 * d_inner], dtype=np.int64),
                  f"mb_di2{d_inner}")
    ax1 = g.const(np.array([1], dtype=np.int64), "mb_ax1")
    hs = g.node("Slice", [proj, z0, di, ax1], out=f"{name}/states")
    gate = g.node("Slice", [proj, di, di2, ax1], out=f"{name}/gate")

    # causal depthwise conv: left-pad k-1 (== HF pad-both + [:L] slice)
    cw = g.init(f"{name}.conv1d.weight", _np(mixer.conv1d.weight))
    cb = g.init(f"{name}.conv1d.bias", _np(mixer.conv1d.bias))
    conv = g.node("Conv", [hs, cw, cb], out=f"{name}/conv",
                  pads=[k - 1, 0], strides=[1], dilations=[1],
                  group=d_inner)
    hs = _silu(g, conv, f"{name}/conv_act")             # [B, di, L]

    # input-dependent SSM parameters from the conv output
    hs_t = g.node("Transpose", [hs], out=f"{name}/hs_T", perm=[0, 2, 1])
    ssm = _matmul_w(e, hs_t, mixer.x_proj, f"{name}.x_proj")
    dtr = g.const(np.array([dt_rank], dtype=np.int64), f"mb_dtr{dt_rank}")
    dbs = g.const(np.array([dt_rank + d_state], dtype=np.int64),
                  f"mb_dbs{dt_rank + d_state}")
    dbc = g.const(np.array([dt_rank + 2 * d_state], dtype=np.int64),
                  f"mb_dbc{dt_rank + 2 * d_state}")
    ax2 = g.const(np.array([2], dtype=np.int64), "mb_ax2")
    dt_in = g.node("Slice", [ssm, z0, dtr, ax2], out=f"{name}/dt_in")
    Bm = g.node("Slice", [ssm, dtr, dbs, ax2], out=f"{name}/B")   # [B,L,S]
    Cm = g.node("Slice", [ssm, dbs, dbc, ax2], out=f"{name}/C")   # [B,L,S]

    # dt_proj has a bias; softplus discretizes
    dt = _matmul_w(e, dt_in, mixer.dt_proj, f"{name}.dt_proj")
    dtb = g.init(f"{name}.dt_proj.bias", _np(mixer.dt_proj.bias))
    dt = g.node("Add", [dt, dtb], out=f"{name}/dt_bias")
    dt = g.node("Softplus", [dt], out=f"{name}/dt")     # [B, L, di]
    dt = g.node("Transpose", [dt], out=f"{name}/dt_T",
                perm=[0, 2, 1])                          # [B, di, L]

    # discrete_A = exp(A * dt): A = -exp(A_log) [di, S]
    A = -np.exp(_np(mixer.A_log).astype(np.float32))
    Ac = g.init(f"{name}.A", A[None, :, None, :])        # [1, di, 1, S]
    sh4 = g.const(np.array([0, d_inner, seq_len, 1], dtype=np.int64),
                  f"mb_dt4{d_inner}x{seq_len}")
    dt4 = g.node("Reshape", [dt, sh4], out=f"{name}/dt4")  # [B,di,L,1]
    dA = g.node("Mul", [dt4, Ac], out=f"{name}/dtA")
    dA = g.node("Exp", [dA], out=f"{name}/discrete_A")   # [B,di,L,S]
    # discrete_B * u = dt * B * x
    shB = g.const(np.array([0, 1, seq_len, d_state], dtype=np.int64),
                  f"mb_B4{seq_len}x{d_state}")
    B4 = g.node("Reshape", [Bm, shB], out=f"{name}/B4")  # [B,1,L,S]
    dB = g.node("Mul", [dt4, B4], out=f"{name}/discrete_B")
    shu = g.const(np.array([0, d_inner, seq_len, 1], dtype=np.int64),
                  f"mb_u4{d_inner}x{seq_len}")
    u4 = g.node("Reshape", [hs, shu], out=f"{name}/u4")  # [B,di,L,1]
    dBu = g.node("Mul", [dB, u4], out=f"{name}/deltaB_u")  # [B,di,L,S]

    # the selective recurrence, unrolled over the static L
    outs = []
    h = None
    for t in range(seq_len):
        t0 = g.const(np.array([t], dtype=np.int64), f"mb_t{t}")
        t1 = g.const(np.array([t + 1], dtype=np.int64), f"mb_t{t + 1}")
        dA_t = g.node("Slice", [dA, t0, t1, ax2],
                      out=f"{name}/dA_{t}")              # [B,di,1,S]
        dBu_t = g.node("Slice", [dBu, t0, t1, ax2],
                       out=f"{name}/dBu_{t}")
        if h is None:
            h = dBu_t                                    # h_0 = dBu_0
        else:
            decayed = g.node("Mul", [dA_t, h], out=f"{name}/decay_{t}")
            h = g.node("Add", [decayed, dBu_t], out=f"{name}/h_{t}")
        # y_t = h_t . C_t : [B,di,S] @ [B,S,1]
        sh3 = g.const(np.array([0, d_inner, d_state], dtype=np.int64),
                      f"mb_h3{d_inner}x{d_state}")
        h3 = g.node("Reshape", [h, sh3], out=f"{name}/h3_{t}")
        C_t = g.node("Slice", [Cm, t0, t1, ax1], out=f"{name}/C_{t}")
        shc = g.const(np.array([0, d_state, 1], dtype=np.int64),
                      f"mb_c3{d_state}")
        C3 = g.node("Reshape", [C_t, shc], out=f"{name}/C3_{t}")
        y = g.node("MatMul", [h3, C3], out=f"{name}/y_{t}")  # [B,di,1]
        outs.append(y)
    scan = outs[0] if len(outs) == 1 else g.node(
        "Concat", outs, out=f"{name}/scan", axis=-1)     # [B,di,L]

    # D skip + gate + out_proj
    D = g.init(f"{name}.D", _np(mixer.D)[None, :, None])  # [1,di,1]
    skip = g.node("Mul", [hs, D], out=f"{name}/D_skip")
    scan = g.node("Add", [scan, skip], out=f"{name}/scan_skip")
    zact = _silu(g, gate, f"{name}/gate_act")
    gated = g.node("Mul", [scan, zact], out=f"{name}/gated")
    gated = g.node("Transpose", [gated], out=f"{name}/gated_T",
                   perm=[0, 2, 1])                        # [B,L,di]
    return _matmul_w(e, gated, mixer.out_proj, f"{name}.out_proj")


def _mamba_rms_norm(e: _ViTEmitter, x: str, norm, name: str) -> str:
    """MambaRMSNorm == LlamaRMSNorm math; reuse the llama emitter."""
    from .llama import _rms_norm
    return _rms_norm(e, x, norm, name)


def mamba_causal_lm(config=None, batch_size: int = 2, seq_len: int = 8,
                    seed: int = 0, module=None):
    """MambaForCausalLM over float ``inputs_embeds`` [B, L, H] ->
    ``logits`` [B, L, V]. No positions of any kind (the conv + scan
    carry order); the lm head ties to the embedding. Generation runs
    through utils.generate (full re-forward per token -- the SSM
    recurrence replaces the KV cache; a dedicated O(1)/token step form
    would carry (conv window, h state) instead, not implemented)."""
    if module is None:
        module = mamba_tiny_module(config, seed)
    config = module.config

    g = GraphBuilder("mamba_causal_lm")
    e = _ViTEmitter(g)
    h = g.input("inputs_embeds", [batch_size, seq_len, config.hidden_size])

    for i, layer in enumerate(module.backbone.layers):
        name = f"layers.{i}"
        ln = _mamba_rms_norm(e, h, layer.norm, f"{name}.norm")
        mix = _mamba_mixer(e, ln, layer.mixer, seq_len, f"{name}.mixer")
        h = g.node("Add", [h, mix], out=f"{name}/residual")
    h = _mamba_rms_norm(e, h, module.backbone.norm_f, "norm_f")

    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")
    g.output("logits", [batch_size, seq_len, config.vocab_size])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.backbone.embeddings.weight)
    return model


def mamba_decode_step(config=None, batch_size: int = 2, seed: int = 0,
                      module=None):
    """The O(1)/token decode form: the recurrence REPLACES the KV
    cache, so the carry is constant-size regardless of history --
    per layer a conv window [B, d_inner, k-1] and an SSM state
    [B, d_inner, state]. Inputs, in order: ``x_step`` [B, 1, H], then
    ``conv_state.i``/``ssm_state.i`` per layer. Outputs: ``logits``
    [B, 1, V], then ``conv_state_out.i``/``ssm_state_out.i`` (the
    caller swaps them in wholesale -- no positions, no masks, no
    dynamic_update_slice; utils.generate.generate_mamba).

    Same ``seed``/``config`` builds the same module as
    mamba_causal_lm, so both forms share weights."""
    if module is None:
        module = mamba_tiny_module(config, seed)
    config = module.config

    g = GraphBuilder("mamba_decode_step")
    e = _ViTEmitter(g)
    h = g.input("x_step", [batch_size, 1, config.hidden_size])
    mixers = [layer.mixer for layer in module.backbone.layers]
    for i, mx in enumerate(mixers):
        g.input(f"conv_state.{i}",
                [batch_size, mx.intermediate_size, mx.conv_kernel_size - 1])
        g.input(f"ssm_state.{i}",
                [batch_size, mx.intermediate_size, mx.ssm_state_size])

    states = []
    for i, layer in enumerate(module.backbone.layers):
        name = f"layers.{i}"
        ln = _mamba_rms_norm(e, h, layer.norm, f"{name}.norm")
        mix, cs, ss = _mamba_mixer_step(e, ln, layer.mixer, i,
                                        f"{name}.mixer")
        states.append((cs, ss))
        h = g.node("Add", [h, mix], out=f"{name}/residual")
    h = _mamba_rms_norm(e, h, module.backbone.norm_f, "norm_f")

    head = g.init("lm_head.weight_t", _np(module.lm_head.weight).T)
    g.node("MatMul", [h, head], out="logits", name="lm_head")
    g.output("logits", [batch_size, 1, config.vocab_size])
    for i, (cs, ss) in enumerate(states):
        mx = mixers[i]
        g.node("Identity", [cs], out=f"conv_state_out.{i}",
               name=f"conv_out_id.{i}")
        g.node("Identity", [ss], out=f"ssm_state_out.{i}",
               name=f"ssm_out_id.{i}")
        g.output(f"conv_state_out.{i}",
                 [batch_size, mx.intermediate_size,
                  mx.conv_kernel_size - 1])
        g.output(f"ssm_state_out.{i}",
                 [batch_size, mx.intermediate_size, mx.ssm_state_size])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.backbone.embeddings.weight)
    return model


def _mamba_mixer_step(e: _ViTEmitter, x: str, mixer, layer_idx: int,
                      name: str):
    """One-token MambaMixer against the carried (conv window, SSM
    state). Returns (mixed, new_conv_state, new_ssm_state)."""
    g = e.g
    d_inner = mixer.intermediate_size
    d_state = mixer.ssm_state_size
    dt_rank = mixer.time_step_rank
    k = mixer.conv_kernel_size

    proj = _matmul_w(e, x, mixer.in_proj, f"{name}.in_proj")
    proj = g.node("Transpose", [proj], out=f"{name}/proj_T",
                  perm=[0, 2, 1])                        # [B, 2di, 1]
    z0 = g.const(np.array([0], dtype=np.int64), "mb_zero")
    di = g.const(np.array([d_inner], dtype=np.int64), f"mb_di{d_inner}")
    di2 = g.const(np.array([2 * d_inner], dtype=np.int64),
                  f"mb_di2{d_inner}")
    ax1 = g.const(np.array([1], dtype=np.int64), "mb_ax1")
    ax2 = g.const(np.array([2], dtype=np.int64), "mb_ax2")
    hs = g.node("Slice", [proj, z0, di, ax1], out=f"{name}/states")
    gate = g.node("Slice", [proj, di, di2, ax1], out=f"{name}/gate")

    # slide the conv window: [prev k-1 | current] -> conv over k taps
    window = g.node("Concat", [f"conv_state.{layer_idx}", hs],
                    out=f"{name}/window", axis=-1)       # [B, di, k]
    one = g.const(np.array([1], dtype=np.int64), "mb_one")
    kk = g.const(np.array([k], dtype=np.int64), f"mb_k{k}")
    new_conv = g.node("Slice", [window, one, kk, ax2],
                      out=f"{name}/new_conv_state")      # [B, di, k-1]
    cw = g.init(f"{name}.conv1d.weight", _np(mixer.conv1d.weight))
    cb = g.init(f"{name}.conv1d.bias", _np(mixer.conv1d.bias))
    conv = g.node("Conv", [window, cw, cb], out=f"{name}/conv",
                  pads=[0, 0], strides=[1], dilations=[1],
                  group=d_inner)                         # [B, di, 1]
    hs = _silu(g, conv, f"{name}/conv_act")

    hs_t = g.node("Transpose", [hs], out=f"{name}/hs_T", perm=[0, 2, 1])
    ssm = _matmul_w(e, hs_t, mixer.x_proj, f"{name}.x_proj")  # [B,1,·]
    dtr = g.const(np.array([dt_rank], dtype=np.int64), f"mb_dtr{dt_rank}")
    dbs = g.const(np.array([dt_rank + d_state], dtype=np.int64),
                  f"mb_dbs{dt_rank + d_state}")
    dbc = g.const(np.array([dt_rank + 2 * d_state], dtype=np.int64),
                  f"mb_dbc{dt_rank + 2 * d_state}")
    dt_in = g.node("Slice", [ssm, z0, dtr, ax2], out=f"{name}/dt_in")
    Bm = g.node("Slice", [ssm, dtr, dbs, ax2], out=f"{name}/B")  # [B,1,S]
    Cm = g.node("Slice", [ssm, dbs, dbc, ax2], out=f"{name}/C")  # [B,1,S]

    dt = _matmul_w(e, dt_in, mixer.dt_proj, f"{name}.dt_proj")
    dtb = g.init(f"{name}.dt_proj.bias", _np(mixer.dt_proj.bias))
    dt = g.node("Add", [dt, dtb], out=f"{name}/dt_bias")
    dt = g.node("Softplus", [dt], out=f"{name}/dt")      # [B, 1, di]
    dt = g.node("Transpose", [dt], out=f"{name}/dt_T",
                perm=[0, 2, 1])                           # [B, di, 1]

    A = -np.exp(_np(mixer.A_log).astype(np.float32))
    Ac = g.init(f"{name}.A", A[None])                     # [1, di, S]
    dA = g.node("Mul", [dt, Ac], out=f"{name}/dtA")       # [B, di, S]
    dA = g.node("Exp", [dA], out=f"{name}/discrete_A")
    dB = g.node("Mul", [dt, Bm], out=f"{name}/discrete_B")  # [B, di, S]
    dBu = g.node("Mul", [dB, hs], out=f"{name}/deltaB_u")   # hs [B,di,1]

    decayed = g.node("Mul", [dA, f"ssm_state.{layer_idx}"],
                     out=f"{name}/decayed")
    new_ssm = g.node("Add", [decayed, dBu], out=f"{name}/new_ssm_state")

    shc = g.const(np.array([0, d_state, 1], dtype=np.int64),
                  f"mb_c3{d_state}")
    C3 = g.node("Reshape", [Cm, shc], out=f"{name}/C3")   # [B, S, 1]
    y = g.node("MatMul", [new_ssm, C3], out=f"{name}/y")  # [B, di, 1]
    D = g.init(f"{name}.D", _np(mixer.D)[None, :, None])
    skip = g.node("Mul", [hs, D], out=f"{name}/D_skip")
    y = g.node("Add", [y, skip], out=f"{name}/y_skip")
    zact = _silu(g, gate, f"{name}/gate_act")
    gated = g.node("Mul", [y, zact], out=f"{name}/gated")
    gated = g.node("Transpose", [gated], out=f"{name}/gated_T",
                   perm=[0, 2, 1])                         # [B, 1, di]
    return (_matmul_w(e, gated, mixer.out_proj, f"{name}.out_proj"),
            new_conv, new_ssm)
