"""LLaMA-style decoder recipe: RMSNorm + RoPE + SwiGLU + GQA.

The modern-LLM block structure, end to end:

* lower a live ``LlamaForCausalLM`` into the framework's graph forms
  (RoPE cos/sin tables bake as initializers; grouped-query attention
  via the repeat_kv idiom),
* int8 PTQ + ``optimize()`` -- RoPE sits between the head split and the
  score MatMul, so the CAUSAL PLAIN fusion applies the additive mask
  inside the VMEM attention kernel (bit-identical to the unfused graph),
* KV-cache decode with the RoPE input layout (``rope=``, no additive
  position table) and the int8 KV cache,
* beam search over the same executor.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.llama import llama_causal_lm, llama_decode_step
from numpy_quant_tpu.utils import (beam_search, decode_calibration,
                                   generate, generate_kv,
                                   merge_calibration_stats)

proto = llama_causal_lm(batch_size=2, seq_len=16, seed=0)
model = nq.Model.from_onnx(proto)
cfg = proto._torch_module.config
print(f"GQA: {cfg.num_attention_heads} query heads over "
      f"{cfg.num_key_value_heads} kv heads")
prompt = np.array([[1, 5, 9, 2], [7, 3, 3, 8]], np.int32)

seq = generate(model, prompt, proto._wte, max_new_tokens=8)
print("float greedy (full form):", seq.tolist())

# int8 + fused causal attention: RoPE/repeat_kv block the head-split
# match, so optimize() falls back to the causal plain kernel fusion
calib = np.take(proto._wte,
                np.random.default_rng(0).integers(0, 96, (2, 16)), axis=0)
qmodel = model.quantize([calib.astype(np.float32)], bit_width=8)
rep = qmodel.optimize()
print("fused attention blocks:", rep["fuse_attention"],
      "(plain causal fusions:",
      len(qmodel.fusion_report.get("plain_fusions", [])), ")")
qseq = generate(qmodel, prompt, proto._wte, max_new_tokens=8)
print("int8 greedy (fused):     ", qseq.tolist())

# KV-cache decode: the RoPE layout feeds cos/sin rows as graph inputs
step_proto = llama_decode_step(batch_size=2, max_len=16, seed=0)
step = nq.Model.from_onnx(step_proto)
rope = step_proto._rope_tables
kv_seq = generate_kv(step, prompt, step_proto._wte, None,
                     max_new_tokens=8, rope=rope)
print("float greedy (KV form):  ", kv_seq.tolist())
assert (kv_seq == seq).all()  # O(L)/token form decodes the same tokens

# int8 step graph + int8 KV cache (4x less cache HBM, bit-identical)
batches = decode_calibration(step, prompt, step_proto._wte, None,
                             rope=rope)
stats = merge_calibration_stats(
    *[step.calibration_stats(b) for b in batches])
qstep = step.quantize(stats=stats, bit_width=8)
q_kv = generate_kv(qstep, prompt, step_proto._wte, None,
                   max_new_tokens=8, rope=rope, kv_cache_dtype="int8")
print("int8 greedy, int8 cache: ", q_kv.tolist())

# beam search: one compiled program, all B*W hypotheses as ONE batch
wide = llama_causal_lm(batch_size=4, seq_len=16, seed=0)
wmodel = nq.Model.from_onnx(wide)
ids, scores = beam_search(wmodel, prompt, wide._wte, max_new_tokens=8,
                          num_beams=2)
print("beam-2 best:", ids[:, 0, :].tolist())
print("beam scores:", np.round(scores, 3).tolist())
