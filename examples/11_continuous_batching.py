"""Continuous batching: online decode serving with per-slot positions.

`generate_kv` is lockstep -- one batch, same start, same number of
steps. Real serving traffic is ragged: requests arrive continuously
with different prompt lengths and budgets. `ContinuousBatcher` keeps
ONE compiled step program alive for B slots, each with its own decode
position; finished slots (budget or EOS) hand their place to the next
queued request immediately, and results stay token-exact with each
request's solo generate_kv run.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.gpt import gpt_decode_step
from numpy_quant_tpu.utils import (ContinuousBatcher, decode_calibration,
                                   generate_kv, merge_calibration_stats)

RNG = np.random.default_rng(0)

# an engine with 3 slots and a 16-token cache, float step model
proto = gpt_decode_step(batch_size=3, max_len=16, seed=0)
engine = nq.Model.from_onnx(proto)
b = ContinuousBatcher(engine, proto._wte, proto._wpe)

# five ragged requests through three slots
workload = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(1, 8), (3, 5), (2, 10), (6, 4), (4, 6)]]
for prompt, n_new in workload:
    b.submit(prompt, n_new)

print(f"queued={b.n_queued} active={b.n_active}")
step_no = 0
while b.n_queued or b.n_active:
    step_no += 1
    for req_id, tokens in b.step():
        print(f"step {step_no:2d}: request {req_id} done -> "
              f"{tokens.tolist()}")

# token-exact vs the solo lockstep run of each request
oracle_proto = gpt_decode_step(batch_size=1, max_len=16,
                               module=proto._torch_module)
oracle = nq.Model.from_onnx(oracle_proto)
results = ContinuousBatcher(engine, proto._wte, proto._wpe).run(workload)
for rid, (prompt, n_new) in enumerate(workload):
    want = generate_kv(oracle, prompt[None, :], proto._wte, proto._wpe,
                       max_new_tokens=n_new)[0]
    assert (results[rid] == want).all(), rid
print("all 5 results token-exact vs solo generate_kv")

# int8 engine + int8 slot caches: quantize the step graph once, serve
prompts3 = RNG.integers(0, 96, size=(3, 4)).astype(np.int32)
batches = decode_calibration(engine, prompts3, proto._wte, proto._wpe)
stats = merge_calibration_stats(
    *[engine.calibration_stats(bt) for bt in batches])
qengine = engine.quantize(stats=stats, bit_width=8)
qb = ContinuousBatcher(qengine, proto._wte, proto._wpe,
                       kv_cache_dtype="int8")
qres = qb.run(workload)
print("int8 engine, int8 KV slots:",
      {rid: t.tolist() for rid, t in sorted(qres.items())})
