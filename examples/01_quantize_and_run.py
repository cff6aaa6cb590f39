"""Quantize an ONNX model and run int8 inference.

The round-trip the reference README shows (reference: README.md:38-58),
TPU-native: one jitted XLA program per input signature, int8 matmuls on
the MXU.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq

onnx_model = nq.onnx.load(os.path.join(
    REPO, "numpy_quant_tpu", "models", "mlp.onnx"))
model = nq.Model.from_onnx(onnx_model)

rng = np.random.default_rng(0)
x = rng.normal(size=(32, 2)).astype(np.float32)

float_out = model([x])[0]

# calibrate + quantize (percentile= clips outliers; weight_bit_width=
# and per_channel_weights= give W4A8-style mixed precision)
qmodel = model.quantize([x], bit_width=8)
int8_out = qmodel([x])[0]

print("mean |float - int8|:", float(np.abs(float_out - int8_out).mean()))
print("labels equal:", bool((float_out.argmax(1) == int8_out.argmax(1)).all()))
