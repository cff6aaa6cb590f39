"""SmoothQuant-style activation-outlier migration
(Xiao et al., arXiv:2211.10438).

Per-tensor activation quantization is dominated by a few outlier
channels; weights are easy to quantize. The pass migrates difficulty
from activations to weights BEFORE quantization with a mathematically
exact reparameterization: for a LayerNormalization whose output feeds
only constant-weight MatMul/Gemm nodes,

    s_j   = amax_x(j)^alpha / amax_w(j)^(1-alpha)
    gamma' = gamma / s,  beta' = beta / s          (LN emits x / s)
    W'[j] = s_j * W[j]                             (consumers absorb s)

so every consumer computes exactly the same float function while the
LN output's per-channel dynamic range flattens -- the calibrated
per-tensor activation scale then wastes far fewer quantization levels
on outlier channels. Run on the FLOAT model before ``quantize``.

Parity-plus: the reference has only min/max PTQ (reference
model.py:328-442). Completes the accuracy-pass suite next to
``adaround`` / ``gptq`` / ``correct_biases``.
"""
from __future__ import annotations

import numpy as np

from .graph import Constant
from .tensor import FTensor


def _rms_norm_tail(node) -> "Constant | None":
    """Match the decomposed RMSNorm idiom's final node (models/llama.py
    _rms_norm: Mul(Div(x, Sqrt(...)), weight)): returns the 1-D weight
    Constant, or None. The weight plays gamma's role exactly (the norm
    emits (x/std) * w, so w/s rescales the output per channel)."""
    if node.op != "Mul" or len(node.inputs) != 2:
        return None
    w = node.inputs[1]
    if not isinstance(w, Constant) or not isinstance(w.data, FTensor) \
            or np.asarray(w.data.data).ndim != 1:
        return None
    div_val = node.inputs[0]
    prods = getattr(div_val, "inputs", None)
    if not prods or len(prods) != 1 or prods[0].op != "Div":
        return None
    std_val = prods[0].inputs[1]
    sprods = getattr(std_val, "inputs", None)
    if not sprods or len(sprods) != 1 or sprods[0].op != "Sqrt":
        return None
    return w


def ln_matmul_groups(model) -> list:
    """Discover every exactly-reparameterizable group: a
    LayerNormalization (last-axis, constant gamma/beta) OR a decomposed
    RMSNorm (the LLaMA/T5/Mamba idiom, matched by its
    Mul(Div(x, Sqrt(...)), w) tail) whose output is not a graph output
    and feeds ONLY constant-weight MatMul/Gemm nodes. Returns
    [(norm_node, gamma, beta, out_value, ws)] where ``ws`` is
    [(weight_constant, axis)] and ``axis`` says which weight axis runs
    over the norm's channels (0 = rows of [K, N], 1 = columns of a
    transB [N, K]). Shared by :func:`smooth_outliers` and
    awq.awq_scale_weights."""
    groups = []
    for node in model.nodes:
        if node.op == "LayerNormalization" and len(node.inputs) >= 2:
            if int(node.attrs.get("axis", -1)) != -1:
                continue
            gamma = node.inputs[1]
            beta = node.inputs[2] if len(node.inputs) > 2 else None
        else:
            gamma = _rms_norm_tail(node)
            if gamma is None:
                continue
            beta = None
        if not isinstance(gamma, Constant) \
                or not isinstance(gamma.data, FTensor):
            continue
        if beta is not None and (not isinstance(beta, Constant)
                                 or not isinstance(beta.data, FTensor)):
            continue
        out = node.outputs[0]
        if any(out.name == o.name for o in model.outputs):
            continue  # a graph output must not rescale
        consumers = [n for n in model.nodes if out in n.inputs]
        if not consumers:
            continue
        ws = []
        ok = True
        for c in consumers:
            if c.op == "Shape":
                continue  # metadata-only: reads dims, never data
            w = c.inputs[1] if len(c.inputs) > 1 else None
            w_ok = isinstance(w, Constant) \
                and isinstance(getattr(w, "data", None), FTensor) \
                and np.asarray(w.data.data).ndim == 2
            if c.op == "MatMul" and c.inputs[0] is out and w_ok:
                ws.append((w, 0))  # y = x @ W[K, N]: scale rows
            elif c.op == "Gemm" and c.inputs[0] is out and w_ok \
                    and not c.attrs.get("transA"):
                ws.append((w, 1 if c.attrs.get("transB") else 0))
            else:
                ok = False  # some consumer cannot absorb 1/s: skip LN
                break
        if ok and ws:
            groups.append((node, gamma, beta, out, ws))
    return groups


def apply_channel_scale(gamma, beta, ws, s: np.ndarray) -> None:
    """The exact reparameterization both passes share: the LN emits
    x / s (gamma' = gamma / s, beta' = beta / s) and every consumer
    weight absorbs s on its LN-channel axis."""
    gamma.data = FTensor(
        np.asarray(gamma.data.data, np.float32) / s)
    if beta is not None:
        beta.data = FTensor(np.asarray(beta.data.data, np.float32) / s)
    for w, axis in ws:
        W = np.asarray(w.data.data, np.float32)
        w.data = FTensor(W * (s[:, None] if axis == 0 else s[None, :]))


def smooth_outliers(model, inputs, alpha: float = 0.5) -> int:
    """Migrate activation outliers into weights for every
    LayerNormalization whose output feeds only constant-weight
    MatMul/Gemm nodes. ``inputs`` is a calibration batch (per-channel
    activation maxima come from an eager record pass). Mutates the
    float model in place; quantize afterwards. Returns the number of
    smoothed LN groups."""
    from .utils.parity import record_all_values

    acts = record_all_values(model, inputs)
    smoothed = 0
    for _node, gamma, beta, out, ws in ln_matmul_groups(model):
        x = acts.get(out.name)
        g = np.asarray(gamma.data.data, np.float32)
        k = g.shape[-1]
        if x is None or g.ndim != 1 or x.shape[-1] != k:
            continue
        amax_x = np.abs(x).reshape(-1, k).max(axis=0).astype(np.float64)
        amax_w = np.zeros(k, np.float64)
        for w, axis in ws:
            W = np.abs(np.asarray(w.data.data, np.float64))
            amax_w = np.maximum(amax_w, W.max(axis=1 - axis))
        s = amax_x ** alpha / np.maximum(amax_w, 1e-12) ** (1.0 - alpha)
        s = np.where((amax_x <= 0) | (amax_w <= 0), 1.0, s)
        s = np.clip(s, 1e-5, None).astype(np.float32)

        apply_channel_scale(gamma, beta, ws, s)
        smoothed += 1

    if smoothed:
        model._dp_cache = None
        model._sharded_param_cache = None
        model._jit_cache.clear()
    return smoothed
