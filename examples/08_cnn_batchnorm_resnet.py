"""The CNN/BatchNorm recipe: fold BN, quantize the convs, read labels
on device.

ResNet-style exports carry a BatchNormalization after every (bias-free)
Conv. The serving recipe is:

1. ``model.fold_batchnorm()``  -- exact reparameterization: BN's
   per-channel affine folds into the conv weights/bias, so calibration
   measures the arithmetic actually served and the integer path sees
   ONE conv per block.
2. ``model.quantize(..., quantize_conv=True)``  -- convs run on the
   int8 MXU path (im2col + q_matmul + requantize) instead of float
   (the reference executes quantized-graph Conv in float,
   reference model.py:528-538 / SURVEY.md §3.4).
3. An ``ArgMax`` head keeps the label selection on device (DITensor):
   the host receives int32 labels, not logits.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O
from numpy_quant_tpu.models import cnn

# a residual CNN whose every conv is bias-free Conv + BatchNorm
m = cnn.resnet_classifier(batch=32, image_size=32, widths=(16, 32))
# append an on-device label head onto the exported graph
m.graph.node.append(O.make_node("ArgMax", ["logits"], ["label"],
                                axis=1, keepdims=0))
m.graph.output.append(
    O.make_tensor_value_info("label", O.TensorProto.INT64, None))

rng = np.random.default_rng(0)
x = rng.standard_normal((32, 3, 32, 32)).astype(np.float32)

model = nq.Model.from_onnx(m)
float_logits, float_labels = model([x])

n = model.fold_batchnorm()
print(f"folded {n} BatchNormalization nodes into their convs")
assert not any(node.op == "BatchNormalization" for node in model.nodes)
folded_logits, _ = model([x])
print("fold is exact:",
      bool(np.allclose(folded_logits, float_logits, rtol=1e-4,
                       atol=1e-5)))

qmodel = model.quantize([x], bit_width=8, quantize_conv=True)
qlogits, qlabels = qmodel([x])

denom = float(np.asarray(float_logits).max()
              - np.asarray(float_logits).min())
err = float(np.mean(np.abs(np.asarray(qlogits)
                           - np.asarray(float_logits)))) / denom
agree = float((np.asarray(qlabels) == np.asarray(float_labels)).mean())
print(f"int8 conv path: mean err {err:.4f} of range, "
      f"label agreement {agree:.2f}")
assert agree >= 0.9
