"""When PTQ isn't enough, and when you have no calibration data at all.

* ``qat_quantize`` -- quantization-aware training: fake quantization at
  the integer executor's exact quantize points, straight-through
  gradients through the WHOLE forward (jax.grad), optax Adam on every
  weight, frozen calibration scales. No labels needed: the float model
  distills into its own quantized form.
* ``quantize_dynamic`` -- no calibration anywhere: weights quantize at
  build time, each matmul input's scale is computed from the actual
  batch INSIDE the jitted program (per-row min/max + rint + int8 MXU
  dot + corrected dequantize, all fused by XLA).
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq

model = nq.Model.from_onnx(
    nq.onnx.load(os.path.join(REPO, "numpy_quant_tpu/models/mlp.onnx")))
from sklearn.datasets import make_circles

X, Y = make_circles(n_samples=600, noise=0.03, random_state=3)
X = X.astype(np.float32)

f_out = model([X])[0]
acc = lambda out: ((out[:, 0] > 0.5) == Y).mean()  # noqa: E731
print(f"float accuracy:     {acc(f_out):.3f}")

# 4-bit is where plain PTQ visibly hurts -- and QAT earns its keep
ptq = model.quantize([X], bit_width=4)
print(f"4-bit PTQ accuracy: {acc(ptq([X])[0]):.3f} "
      f"(mse {np.mean((ptq([X])[0] - f_out) ** 2):.4f})")

qat = model.qat_quantize([X], bit_width=4, steps=150, lr=3e-3)
print(f"4-bit QAT accuracy: {acc(qat([X])[0]):.3f} "
      f"(mse {np.mean((qat([X])[0] - f_out) ** 2):.4f}, "
      f"loss {qat.qat_loss_history[0]:.4f} -> "
      f"{qat.qat_loss_history.min():.4f})")

# no calibration data at all: runtime per-row scales
dyn = model.quantize_dynamic(bit_width=8)
print(f"dynamic int8 accuracy (zero calibration): {acc(dyn([X])[0]):.3f}")
