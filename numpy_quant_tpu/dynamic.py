"""Dynamic quantization: integer matmuls with RUNTIME activation scales.

Static PTQ (Model.quantize) needs a calibration batch to fix every
activation's scale ahead of time. Dynamic quantization needs NO
calibration data: weights quantize symmetrically at build time, and each
matmul's float input quantizes on the fly with scales computed from the
actual batch INSIDE the jitted program -- a per-tensor (or per-row)
min/max reduce, a rint, one int8 MXU dot, and the zero-point-corrected
dequantize, all fused by XLA into the surrounding program. Scales are
traced scalars/vectors, not static shapes, so there is nothing
jit-hostile about them.

This mirrors onnxruntime's dynamic-quantization mode (the reference
validates against ORT but implements static PTQ only --
reference model.py:328-442), with one accuracy upgrade: ``granularity=
"row"`` quantizes each row of the activation (last-axis slice, e.g. per
token) with its own scale, which per-batch outliers then cannot poison.

Build-time rewrite (quantize_dynamic):

- ``MatMul`` whose rhs is a float 2-D weight -> ``DynamicMatMul`` with a
  symmetric QTensor weight (per-tensor, or per-channel with
  ``per_channel_weights``),
- ``Gemm`` -> ``DynamicMatMul`` + float-bias ``Add``: alpha and transB
  fold into the stored weight, beta into the stored bias (integer Gemm
  needs bias at scale s_x*s_w, which does not exist until runtime --
  exactly why ORT's dynamic mode also keeps biases float),
- activation x activation matmuls (attention scores) stay float, as in
  ORT's dynamic mode.

Everything else about the executor is unchanged -- the rewrite is pure
graph surgery plus one registry op (ops/registry.py DynamicMatMul).
"""
from __future__ import annotations

import numpy as np

from .graph import Constant, Node, Variable
from .model import Model
from .quantization import quant_parameters
from .tensor import FTensor, ITensor, QTensor
from .tensor import quantize_tensor, tensor_min_max


class DynamicQModel(Model):
    """Executor for dynamically-quantized graphs. Same float executor;
    the integer work lives in the DynamicMatMul registry op."""

    def __init__(self, nodes, values, inputs, outputs, bit_width: int,
                 granularity: str):
        super().__init__(nodes, values, inputs, outputs)
        self.bit_width = bit_width
        self.granularity = granularity


def _quantize_weight(data, bit_width: int, per_channel: bool) -> QTensor:
    arr = np.asarray(data.data, np.float32)
    if per_channel and arr.ndim == 2:
        from .quantization import per_channel_scales
        scale = per_channel_scales(arr, bit_width, axis=1)  # [1, N]
    else:
        mn, mx = tensor_min_max(FTensor(arr))
        scale, _ = quant_parameters(mn, mx, bit_width, asymmetric=False)
    return quantize_tensor(FTensor(arr), bit_width, scale, None)


def quantize_dynamic(model: Model, bit_width: int = 8,
                     weight_bit_width: int = None,
                     per_channel_weights: bool = False,
                     granularity: str = "row") -> DynamicQModel:
    """Rewrite ``model`` for dynamic quantization (no calibration data).

    ``granularity``: "row" (default) computes one scale per last-axis
    slice of each matmul input; "tensor" one scale for the whole input.
    ``weight_bit_width``: quantize weights below the activation width
    (W4A8-style); ``per_channel_weights``: per-output-channel symmetric
    weight scales.
    """
    if granularity not in ("row", "tensor"):
        raise ValueError(f"granularity {granularity!r} not in (row, tensor)")
    wbw = weight_bit_width if weight_bit_width is not None else bit_width

    def is_dyn_weight(value) -> bool:
        """Float constant consumed ONLY as matmul weight (MatMul rhs /
        Gemm B) -- the same exclusivity rule as static quantize()."""
        if not isinstance(value, Constant) \
                or not isinstance(value.data, FTensor):
            return False
        if np.asarray(value.data.data).ndim != 2:
            return False
        return bool(value.outputs) and all(
            n.op in ("MatMul", "Gemm") and len(n.inputs) > 1
            and n.inputs[1] is value for n in value.outputs)

    # clone values
    new_values: dict[str, object] = {}
    for value in model.values:
        if isinstance(value, Constant):
            if is_dyn_weight(value) and any(
                    n.op == "MatMul" for n in value.outputs):
                data = _quantize_weight(value.data, wbw, per_channel_weights)
            else:
                data = value.data.copy()
            new_values[value.name] = Constant(value.name, [], data)
        else:
            v = Variable(value.name, [], [], None)
            v.shape_hint = getattr(value, "shape_hint", None)
            v.dtype_hint = getattr(value, "dtype_hint", None)
            new_values[value.name] = v

    dyn_attrs = {"bit_width": bit_width, "granularity": granularity}
    new_nodes: list[Node] = []
    for node in model.nodes:
        ins = [None if v is None else new_values[v.name] for v in node.inputs]
        outs = [new_values[o.name] for o in node.outputs]
        if node.op == "MatMul" and is_dyn_weight(node.inputs[1]):
            new_nodes.append(Node(node.name, "DynamicMatMul",
                                  dict(dyn_attrs), ins, outs))
        elif node.op == "Gemm" and is_dyn_weight(node.inputs[1]) \
                and not node.attrs.get("transA"):
            # fold alpha/transB into a fresh weight, beta into the bias
            W = np.asarray(node.inputs[1].data.data, np.float32)
            if node.attrs.get("transB"):
                W = W.T
            alpha = np.float32(node.attrs.get("alpha", 1.0))
            if float(alpha) != 1.0:
                W = W * alpha
            w_const = Constant(f"{node.name}/dyn_w", [],
                               _quantize_weight(FTensor(W), wbw,
                                                per_channel_weights))
            new_values[w_const.name] = w_const
            bias = node.inputs[2] if len(node.inputs) > 2 else None
            beta = np.float32(node.attrs.get("beta", 1.0))
            if bias is None or float(beta) == 0.0:
                new_nodes.append(Node(node.name, "DynamicMatMul",
                                      dict(dyn_attrs), [ins[0], w_const],
                                      outs))
                continue
            mm_out = Variable(f"{node.name}/dyn_mm_out", [], [], None)
            new_values[mm_out.name] = mm_out
            if isinstance(bias, Constant) and float(beta) != 1.0:
                b_const = Constant(
                    f"{node.name}/dyn_bias", [],
                    FTensor(np.asarray(bias.data.data, np.float32) * beta))
                new_values[b_const.name] = b_const
                b_in = b_const
            else:
                b_in = new_values[bias.name]
                # non-constant bias with beta != 1 keeps a float Mul --
                # not emitted here because no exporter produces it; the
                # constant case covers the zoo. beta==1 passes through.
                if float(beta) != 1.0:
                    raise NotImplementedError(
                        "dynamic Gemm with non-constant bias and beta != 1")
            new_nodes.append(Node(node.name, "DynamicMatMul",
                                  dict(dyn_attrs), [ins[0], w_const],
                                  [mm_out]))
            new_nodes.append(Node(f"{node.name}/dyn_add", "Add", {},
                                  [mm_out, b_in], outs))
        else:
            new_nodes.append(Node(node.name, node.op, dict(node.attrs),
                                  ins, outs))

    # relink
    for node in new_nodes:
        for v in node.inputs:
            if v is not None:
                v.outputs.append(node)
        for o in node.outputs:
            o.inputs.append(node)

    # prune constants orphaned by the Gemm folding (their payloads would
    # otherwise still upload to HBM every compile)
    keep = {o.name for o in model.outputs} | {i.name for i in model.inputs}
    values = [v for v in new_values.values()
              if v.outputs or getattr(v, "inputs", None) or v.name in keep]
    inputs = [new_values[v.name] for v in model.inputs]
    outputs = [new_values[v.name] for v in model.outputs]
    return DynamicQModel(new_nodes, values, inputs, outputs, bit_width,
                         granularity)
