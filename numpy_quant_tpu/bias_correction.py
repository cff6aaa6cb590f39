"""Empirical bias correction (PTQ accuracy pass; the empirical variant
of AIMET's bias correction, arXiv:2201.08442 section IV).

Quantization shifts each weight layer's expected output --
E[y_q] != E[y_f] -- and a per-output-channel shift folds exactly into
the layer's additive bias. Parity-plus like per-channel/percentile
calibration: the reference has no accuracy passes beyond min/max PTQ
(reference numpy_quant/model.py:328-442). Most useful for low-bit
weights (W4A8), where weight rounding error is largest.
"""
from __future__ import annotations

import numpy as np

from .graph import Constant
from .passes.weights import shift_q_bias
from .tensor import FTensor, PackedQTensor, QTensor


def correct_biases_qmodel(qmodel, float_model, inputs,
                          passes: int = 1) -> int:
    """For every quantized weight op, SUBTRACT the mean output error
    over the calibration batch from the bias:

    * Gemm / integer Conv bias: the 4x-bit-width payload (scale
      s_x*s_w) absorbs ``rint(corr / bias_scale)``;
    * MatMul followed by a rank-1-constant Add (the exporter's linear
      form): the float bias absorbs ``corr`` directly, measured at the
      Add output (the additive bias commutes, so the error there
      equals the error at the MatMul output).

    ``float_model`` is the unquantized source executor (the oracle);
    ``inputs`` the calibration batch. Runs both executors eagerly in
    record mode; ``passes > 1`` re-measures after correcting so
    downstream layers see corrected upstream activations. Returns the
    number of corrected biases (summed over passes)."""
    from .utils.parity import record_all_values

    corrected = 0
    for _ in range(int(passes)):
        f_acts = record_all_values(float_model, inputs)
        q_acts = record_all_values(qmodel, inputs)
        for node in qmodel.nodes:
            if node.op not in ("MatMul", "Gemm", "Conv") \
                    or len(node.inputs) < 2:
                continue
            w = node.inputs[1]
            if not isinstance(w, Constant) \
                    or not isinstance(w.data, (QTensor, PackedQTensor)):
                continue  # activation-activation matmul: no weight
            if node.op in ("Gemm", "Conv"):
                if len(node.inputs) < 3 \
                        or not isinstance(node.inputs[2], Constant) \
                        or not isinstance(node.inputs[2].data, QTensor):
                    continue
                name = node.outputs[0].name
                if name not in f_acts or name not in q_acts:
                    continue
                err = q_acts[name].astype(np.float64) \
                    - f_acts[name].astype(np.float64)
                if node.op == "Conv":
                    if err.ndim != 4:
                        continue
                    corr = err.mean(axis=(0, 2, 3))  # NCHW channel
                else:
                    corr = err.reshape(-1, err.shape[-1]).mean(0)
                corrected += shift_q_bias(node.inputs[2], corr)
            else:  # MatMul: bias lives in a consuming rank-1 Add
                out_val = node.outputs[0]
                cons = [n for n in qmodel.nodes if out_val in n.inputs]
                if len(cons) != 1 or cons[0].op != "Add":
                    continue
                add = cons[0]
                other = add.inputs[1] if add.inputs[0] is out_val \
                    else add.inputs[0]
                if not isinstance(other, Constant) or not isinstance(
                        other.data, (FTensor, QTensor)):
                    continue
                if np.asarray(getattr(other.data, "data")).ndim != 1:
                    continue
                name = add.outputs[0].name
                if name not in f_acts or name not in q_acts:
                    continue
                err = q_acts[name].astype(np.float64) \
                    - f_acts[name].astype(np.float64)
                corr = err.reshape(-1, err.shape[-1]).mean(0)
                if isinstance(other.data, FTensor):
                    bias_arr = np.asarray(other.data.data, np.float32)
                    if corr.shape != bias_arr.shape:
                        continue
                    other.data = FTensor(bias_arr
                                         - corr.astype(np.float32))
                    corrected += 1
                else:
                    # the PTQ pass quantized the Add constant: shift in
                    # its integer domain (one bias-scale step
                    # granularity, clipped to the bias bit range)
                    corrected += shift_q_bias(other, corr)
        qmodel._dp_cache = None
        qmodel._sharded_param_cache = None
    return corrected
