"""The low-bit accuracy recipe: W4A8 with AdaRound + bias correction.

At 4-bit weights, rounding error dominates quantization noise. Two
calibration-time passes claw accuracy back (both parity-plus -- the
reference has only min/max PTQ):

* ``adaround``  -- learn each weight element's rounding direction
  against the layer's output reconstruction error (arXiv:2004.10568)
* ``correct_biases`` -- fold each layer's expected output shift into
  its additive bias (AIMET-style empirical bias correction)

then the usual serving transforms (``optimize``, ``pack_weights`` --
int4 payloads store at exactly 4 bits/value in HBM) and pipelined
online serving with ``serve_stream``.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq
from numpy_quant_tpu.models import fixtures as F

# the committed trained ViT fixture (hidden 128, 4 layers, 65 tokens)
model = nq.Model.from_onnx(F.trained_vit_onnx(batch_size=16))
x, labels = F.make_batch(np.random.default_rng(0), 16)
calib, _ = F.make_batch(np.random.default_rng(1), 16)

float_acc = (model([x])[0].argmax(-1) == labels).mean()

qmodel = model.quantize([calib], bit_width=8, weight_bit_width=4)
base = qmodel([x])[0]
print(f"float accuracy:        {float_acc:.3f}")
print(f"plain W4A8 accuracy:   {(base.argmax(-1) == labels).mean():.3f}")

tuned = qmodel.adaround(model, [calib], iters=150)
shifted = qmodel.correct_biases(model, [calib])
print(f"adaround tuned {tuned} weights; bias-corrected {shifted} layers")

qmodel.optimize()      # fused attention + early-int8 + dead-token elim
qmodel.pack_weights()  # 4-bit payloads: exactly 4 bits/value in HBM

out = qmodel([x])[0]
print(f"recipe W4A8 accuracy:  {(out.argmax(-1) == labels).mean():.3f}")

# pipelined online serving: up to 3 requests in flight
stream = qmodel.serve_stream(([b] for b in x.reshape(4, 4, *x.shape[1:])),
                             depth=3)
preds = np.concatenate([o[0].argmax(-1) for o in stream])
print(f"serve_stream accuracy: {(preds == labels).mean():.3f}")
