"""Throughput serving: run a whole [steps, batch, ...] dataset as ONE
scanned device program (map_batches) -- the shape bench.py measures on
the TPU (4,981 img/s int8 ViT-Base at batch 96 on one v5e chip).
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq

src = nq.onnx.load(os.path.join(
    REPO, "numpy_quant_tpu", "models", "mlp.onnx"))
model = nq.Model.from_onnx(src)
rng = np.random.default_rng(0)
calib = rng.normal(size=(64, 2)).astype(np.float32)
qmodel = model.quantize([calib], bit_width=8)

steps, batch = 100, 256
dataset = rng.normal(size=(steps, batch, 2)).astype(np.float32)

t0 = time.time()
out = qmodel.map_batches([dataset])[0]   # one device program, one sync
t1 = time.time()
per_call = [qmodel([dataset[s]])[0] for s in range(steps)]
t2 = time.time()

assert all(np.array_equal(out[s], per_call[s]) for s in range(steps))
print(f"map_batches: {steps * batch / (t1 - t0):,.0f} samples/s "
      f"vs per-call {steps * batch / (t2 - t1):,.0f} samples/s")
