"""Weight-only quantization for memory-bound decode serving.

Single-token decode reads every weight once per token: the regime
where FULL integer execution loses (activation quantize/dequantize
costs more than the int8 dot saves -- BENCH_HISTORY round-3 decode
table) but weight bandwidth dominates. `quantize_weights` stores
MatMul weights int8/int4 while compute stays float:

* zero calibration data (scales come from the weights),
* W4 uses packed payloads + GPTQ/AWQ-style grouped scales,
* activation-aware accuracy: compose `awq_scale_weights` (real AWQ,
  grid-searched against the W4 reconstruction error) or
  `smooth_outliers` BEFORE quantize_weights,
* every generate loop runs unchanged.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.gpt import gpt_causal_lm, gpt_decode_step
from numpy_quant_tpu.utils import generate, generate_kv

prompt = np.array([[1, 5, 9, 2], [7, 3, 3, 8]], np.int32)

proto = gpt_causal_lm(batch_size=2, seq_len=16, seed=0)
model = nq.Model.from_onnx(proto)
f_seq = generate(model, prompt, proto._wte, max_new_tokens=8)
print("float greedy:            ", f_seq.tolist())

# W8 weight-only: int8 weights, float MXU compute
w8 = nq.Model.from_onnx(gpt_causal_lm(batch_size=2, seq_len=16, seed=0))
n = w8.quantize_weights(bit_width=8)
print(f"W8 weight-only ({n} weights):",
      generate(w8, prompt, proto._wte, max_new_tokens=8).tolist())

# W4 with grouped scales (packed sub-byte HBM payloads)
w4 = nq.Model.from_onnx(gpt_causal_lm(batch_size=2, seq_len=16, seed=0))
w4.quantize_weights(bit_width=4, group_size=8)
print("W4 grouped weight-only:  ",
      generate(w4, prompt, proto._wte, max_new_tokens=8).tolist())

# AWQ-style composition: migrate activation outliers into the weights
# first (smooth_outliers), THEN round the weights
awq = nq.Model.from_onnx(gpt_causal_lm(batch_size=2, seq_len=16, seed=0))
calib = np.take(proto._wte,
                np.random.default_rng(0).integers(0, 96, (2, 16)), axis=0)
awq.smooth_outliers([calib.astype(np.float32)], alpha=0.5)
awq.quantize_weights(bit_width=4, group_size=8)
print("W4 + outlier migration:  ",
      generate(awq, prompt, proto._wte, max_new_tokens=8).tolist())

# the KV-cache serving form drives identically
step = nq.Model.from_onnx(gpt_decode_step(batch_size=2, max_len=16,
                                          seed=0))
step.quantize_weights(bit_width=8)
kv = generate_kv(step, prompt, proto._wte,
                 gpt_decode_step(batch_size=2, max_len=16, seed=0)._wpe,
                 max_new_tokens=8)
print("W8 KV-step decode:       ", kv.tolist())
