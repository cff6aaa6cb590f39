"""Autoregressive generation over a quantized causal decoder.

Two graph forms of the same GPT-2-layout module (same seed = same
weights):

* full-sequence form -- re-forwards the whole fixed length each step;
  simplest, and the fused-attention-friendly layout,
* KV-cache step form -- one token per step at O(L) cost; the serving
  shape.

Either way the ENTIRE decode loop (teacher-forced prefill + greedy/
sampled generation) compiles into one XLA program with this framework's
jitted forward inside: token ids stay traced int32 on device, and the
int8 executor drops in unchanged.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.gpt import gpt_causal_lm, gpt_decode_step
from numpy_quant_tpu.utils import (decode_calibration, generate,
                                   generate_kv, merge_calibration_stats)

proto = gpt_causal_lm(batch_size=2, seq_len=16, seed=0)
model = nq.Model.from_onnx(proto)
prompt = np.array([[1, 5, 9, 2], [7, 3, 3, 8]], np.int32)

seq = generate(model, prompt, proto._wte, max_new_tokens=8)
print("float greedy (full form):", seq.tolist())

sampled = generate(model, prompt, proto._wte, max_new_tokens=8,
                   temperature=0.8)
print("float sampled @0.8:      ", sampled.tolist())

# int8 decode through the SAME loop: quantize the step graph on stats
# replayed from the prompt itself
step_proto = gpt_decode_step(batch_size=2, max_len=16, seed=0)
step = nq.Model.from_onnx(step_proto)
kv_seq = generate_kv(step, prompt, step_proto._wte, step_proto._wpe,
                     max_new_tokens=8)
assert kv_seq.tolist() == seq.tolist(), "KV form must match full form"
print("KV-cache form matches the full form token for token")

batches = decode_calibration(step, prompt, step_proto._wte, step_proto._wpe)
stats = merge_calibration_stats(*[step.calibration_stats(b)
                                  for b in batches])
qstep = step.quantize(stats=stats, bit_width=8)
q_seq = generate_kv(qstep, prompt, step_proto._wte, step_proto._wpe,
                    max_new_tokens=8)
print("int8 greedy (KV form):   ", q_seq.tolist())
print(f"int8 vs float agreement: {(q_seq == kv_seq).mean():.2f}")
