"""Long-running: full ViT-Base-patch16-224 per-value parity vs the
reference interpreter (reference: test/long_running/test_vit.py).
Enabled with NQ_RUN_SLOW=1 (several minutes: the reference runs the
whole graph in numpy)."""
import os

import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models import vit as V
from numpy_quant_tpu.utils import compare_all_values, record_all_values

from ..oracle import onnx_shim, reference_available

slow = pytest.mark.skipif(
    os.environ.get("NQ_RUN_SLOW") != "1" or not reference_available(),
    reason="set NQ_RUN_SLOW=1 (and mount the reference) to run")


@slow
def test_vit_base_all_values_vs_reference():
    from transformers import ViTConfig

    ref_model_mod = onnx_shim()
    cfg = ViTConfig(num_labels=1000)
    m = V.vit_image_classifier(config=cfg, batch_size=None, seed=0)
    nq.onnx.make_dim_param_fixed(m.graph, "B", 1)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(1, 3, 224, 224)).astype(np.float32)) * 0.5

    model = nq.Model.from_onnx(m)
    actual = record_all_values(model, [x])

    ref_model = ref_model_mod.Model.from_onnx(m)
    ref_model([x])
    desired = {v.name: np.asarray(v.data.data)
               for v in ref_model.values if v.data is not None}

    compare_all_values(actual, desired, decimal=4)


@slow
def test_vit_base_quantized_label_parity():
    """int8 vs float argmax agreement on ViT-Base
    (reference: test/long_running/test_vit.py:167)."""
    from transformers import ViTConfig

    cfg = ViTConfig(num_labels=1000)
    m = V.vit_image_classifier(config=cfg, batch_size=None, seed=0)
    nq.onnx.make_dim_param_fixed(m.graph, "B", 4)
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(4, 3, 224, 224)).astype(np.float32)) * 0.5

    model = nq.Model.from_onnx(m)
    logits = model([x])[0]
    qmodel = model.quantize([x[:2]], bit_width=8, calibration_mode="eager")
    qlogits = qmodel([x])[0]
    assert np.mean(np.abs(qlogits - logits)) < 0.2
    assert (qlogits.argmax(1) == logits.argmax(1)).mean() >= 0.75
