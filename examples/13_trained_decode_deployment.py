"""Trained-model decode deployment: the round-4 serving recipe.

Uses the COMMITTED trained copy-language GPT (models/text_fixture.py,
held-out accuracy 1.000) so every number is a real task metric:

1. weight-only int8 under the bf16 data plane -- the measured
   speed-of-light decode config (93% of peak HBM bandwidth on the
   bench rig, BENCH_HISTORY.md round 4);
2. an online ContinuousBatcher with ``steps_per_sync=4`` (k decode
   steps per dispatched program: same tokens, ~k-fold fewer host
   syncs -- the remote-attached-chip serving shape);
3. the WHOLE decode loop exported as a StableHLO artifact
   (utils.save_decode_loop) and reloaded with jax + numpy alone.
"""
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq
from numpy_quant_tpu import config as nq_config
from numpy_quant_tpu.models import text_fixture as TF
from numpy_quant_tpu.utils import (ContinuousBatcher, generate_kv,
                                   load_decode_loop, save_decode_loop)

RNG = np.random.default_rng(0)
BATCH = 4

prompts, expected = TF.make_prompts(RNG, BATCH)
prompts = prompts.astype(np.int32)
proto = TF.trained_gpt_decode_onnx(batch_size=BATCH)

# 1. weight-only int8 + bf16 data plane (the serving numerics)
with nq_config.low_precision_floats():
    model = nq.Model.from_onnx(proto)
    n = model.quantize_weights(bit_width=8)
    seq = generate_kv(model, prompts, proto._wte, proto._wpe,
                      max_new_tokens=TF.COPY_LEN)
    acc = TF.copy_accuracy(seq[:, TF.COPY_LEN + 1:], expected)
    print(f"w8 weight-only + bf16: {n} weights converted, "
          f"copy accuracy {acc:.3f}")
    assert acc >= 0.95

# 2. online engine, 4 decode steps per dispatched program
fmodel = nq.Model.from_onnx(proto)
fmodel.quantize_weights(bit_width=8)
cb = ContinuousBatcher(fmodel, proto._wte, proto._wpe, steps_per_sync=4)
results = cb.run([(prompts[i], TF.COPY_LEN) for i in range(BATCH)])
accs = [TF.copy_accuracy(np.asarray(results[i])[None, TF.COPY_LEN + 1:],
                         expected[i]) for i in sorted(results)]
print(f"ContinuousBatcher(steps_per_sync=4): {len(results)} requests, "
      f"copy accuracy {float(np.mean(accs)):.3f}, "
      f"host syncs {cb.stats['steps'] // 4}")
assert float(np.mean(accs)) >= 0.95

# 3. the whole decode loop as a deployment artifact
with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "decode.npz")
    save_decode_loop(fmodel, path, proto._wte, proto._wpe, prompts,
                     max_new_tokens=TF.COPY_LEN)
    fn = load_decode_loop(path)  # jax + numpy alone from here on
    art = fn(prompts)
    want = generate_kv(fmodel, prompts, proto._wte, proto._wpe,
                       max_new_tokens=TF.COPY_LEN)
    np.testing.assert_array_equal(art, want)
    print(f"AOT decode artifact: {os.path.getsize(path) / 1e6:.1f} MB; "
          "artifact decode == in-process decode (token-exact)")
