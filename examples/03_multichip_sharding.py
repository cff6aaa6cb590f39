"""DP x TP sharded quantized inference over a device mesh.

Runs on an 8-device virtual CPU mesh here (set JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count); the same code scales over real
TPU slices -- XLA GSPMD inserts the collectives from the sharding
annotations.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import numpy_quant_tpu as nq
from numpy_quant_tpu import parallel as par
from numpy_quant_tpu.models import vit as V

m = V.vit(8, 16, 4, 24, 16, 4)  # small ViT, batch 8
model = nq.Model.from_onnx(m)
rng = np.random.default_rng(0)
x = rng.normal(size=(8, 3, 16, 16)).astype(np.float32)

qmodel = model.quantize([x], bit_width=8)
single = qmodel([x])[0]

mesh = par.make_dp_tp_mesh(8, tp=2)  # 4-way data x 2-way tensor
par.shard_model(qmodel, mesh, data_axis="data", rules=par.vit_tp_rules)
sharded = qmodel([x])[0]

print("mesh:", dict(mesh.shape))
print("sharded == single-device:", bool(np.array_equal(sharded, single)))
