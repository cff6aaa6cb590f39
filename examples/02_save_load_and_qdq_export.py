"""Persist a quantized model three ways:

* native save/load (bit-exact round trip, packed payloads supported)
* standard QDQ export (QuantizeLinear/DequantizeLinear -- servable by
  any ONNX runtime)
* QOperator export (explicit QLinearMatMul/QLinearConv nodes -- for
  runtimes without QDQ pattern fusion; Gemm keeps the QDQ form since
  the standard opset has no quantized Gemm)

All are capability gaps in the reference (it cannot persist a QModel,
SURVEY.md §5).
"""
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy_quant_tpu as nq
from numpy_quant_tpu.utils import (load_qmodel, save_qmodel,
                                   save_qmodel_qdq, save_qmodel_qoperator)

src = nq.onnx.load(os.path.join(
    REPO, "numpy_quant_tpu", "models", "mlp.onnx"))
model = nq.Model.from_onnx(src)
rng = np.random.default_rng(0)
x = rng.normal(size=(16, 2)).astype(np.float32)
qmodel = model.quantize([x], bit_width=8)
expected = qmodel([x])[0]

with tempfile.TemporaryDirectory() as d:
    native = os.path.join(d, "mlp_int8.onnx")
    save_qmodel(qmodel, native, src)
    reloaded = load_qmodel(native)
    assert np.array_equal(reloaded([x])[0], expected)  # bit-exact
    print("native save/load: bit-exact round trip OK")

    qdq = os.path.join(d, "mlp_int8_qdq.onnx")
    save_qmodel_qdq(qmodel, qdq, src)
    as_qdq = nq.Model.from_onnx(nq.onnx.load(qdq))
    err = float(np.abs(as_qdq([x])[0] - expected).mean())
    print(f"QDQ export: mean |err| vs integer path = {err:.2e}")

    qop = os.path.join(d, "mlp_int8_qop.onnx")
    save_qmodel_qoperator(qmodel, qop, src)
    as_qop = nq.Model.from_onnx(nq.onnx.load(qop))
    err = float(np.abs(as_qop([x])[0] - expected).mean())
    print(f"QOperator export: mean |err| vs integer path = {err:.2e}")
