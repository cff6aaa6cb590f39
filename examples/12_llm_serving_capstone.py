"""LLM serving capstone: accuracy passes -> weight-only -> continuous
batching -> AOT artifact, end to end on a LLaMA-style decoder.

The recommended large-decoder serving recipe (docs/DEPLOYMENT.md):
weights carry the quantization (W4 grouped + AWQ + V/O rotation),
compute stays float (single-token decode is weight-bandwidth-bound),
the online engine serves ragged traffic, and the compiled program
ships as a self-contained artifact.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.llama import (llama_causal_lm,
                                          llama_decode_step,
                                          llama_prefill)
from numpy_quant_tpu.utils import (ContinuousBatcher, generate_kv,
                                   load_compiled, save_compiled)

RNG = np.random.default_rng(0)

# one module, three graph forms sharing its weights
full_proto = llama_causal_lm(batch_size=2, seq_len=16, seed=0)
module = full_proto._torch_module
step_proto = llama_decode_step(batch_size=2, max_len=16, module=module)
pre_proto = llama_prefill(prefill_len=8, module=module)

# ---- accuracy passes on the float model, then weight-only W4 grouped
full = nq.Model.from_onnx(full_proto)
calib = full_proto._wte[RNG.integers(0, 96, size=(2, 16))]
calib = calib.astype(np.float32)
rot = full.rotate_vo()                      # QuaRot V/O (data-free)
alphas = full.awq_scale_weights([calib], bit_width=4, group_size=8)
n_w = full.quantize_weights(bit_width=4, group_size=8)
print(f"rotated {rot} attentions, AWQ alphas {alphas}, "
      f"{n_w} weights at W4-grouped")

# the step/prefill forms get the same treatment (shared module, so the
# float functions match; passes run per graph)
step = nq.Model.from_onnx(step_proto)
step.rotate_vo()  # decode-step graphs are skipped by design -> 0
step.quantize_weights(bit_width=4, group_size=8)
pre = nq.Model.from_onnx(pre_proto)
pre.quantize_weights(bit_width=4, group_size=8)

# ---- continuous batching over the W4 step model
b = ContinuousBatcher(step, step_proto._wte, None,
                      rope=step_proto._rope_tables, prefill_model=pre)
workload = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(2, 8), (5, 6), (1, 10), (7, 4), (3, 7)]]
results = b.run(workload)
print(f"served {b.stats['completed']} requests in {b.stats['steps']} "
      f"steps ({b.stats['prefills']} prefills); tokens:")
for rid in sorted(results):
    print(f"  req {rid}: {results[rid].tolist()}")

# engine results match the lockstep W4 loop request-by-request
oracle_proto = llama_decode_step(batch_size=1, max_len=16, module=module)
oracle = nq.Model.from_onnx(oracle_proto)
oracle.quantize_weights(bit_width=4, group_size=8)
for rid, (prompt, n_new) in enumerate(workload):
    want = generate_kv(oracle, prompt[None, :], step_proto._wte, None,
                       max_new_tokens=n_new,
                       rope=step_proto._rope_tables)[0]
    assert (results[rid] == want).all(), rid
print("all engine results token-exact vs solo W4 generate_kv")

# ---- ship the compiled step program as one artifact
path = "/tmp/llama_w4_step.npz"
x = np.zeros((2, 1, 32), np.float32)
mask = np.zeros((1, 1, 1, 17), np.float32)
cs = np.zeros((1, 1, 1, 8), np.float32)
caches = [np.zeros((2, 2, 16, 8), np.float32)] * 4
save_compiled(step, path, [x, mask, cs, cs] + caches)
fn = load_compiled(path)
outs = fn([x, mask, cs, cs] + caches)
print(f"AOT artifact: {os.path.getsize(path)} bytes, "
      f"{len(outs)} outputs, logits {outs[0].shape}")
