#!/usr/bin/env python
"""Headline benchmark: int8 ViT-Base-patch16-224 images/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the reference implementation
(tebartsch/numpy-quant) running the same int8 ViT-Base on this
machine's host CPU (baselines/reference_cpu.json, measured via
tests/oracle.py's onnx shim).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("NQ_TPU_JAX_CACHE", "/tmp/nq_tpu_jaxcache"))

    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import vit as V
    from numpy_quant_tpu.utils import load_calibration_stats
    from transformers import ViTConfig

    batch = int(os.environ.get("NQ_TPU_BENCH_BATCH", "64"))
    cfg = ViTConfig(num_labels=1000)  # ViT-Base-patch16-224 shape
    m = V.vit_image_classifier(config=cfg, batch_size=None, seed=0)
    nq.onnx.make_dim_param_fixed(m.graph, "B", batch)
    model = nq.Model.from_onnx(m)
    rng = np.random.default_rng(0)

    # Calibration: reuse committed activation stats when they cover this
    # graph (calibration caching); otherwise run eager calibration.
    stats_path = os.path.join(REPO, "baselines",
                              "vit_base_calibration_stats.json")
    stats = None
    if os.path.exists(stats_path):
        stats = load_calibration_stats(stats_path)
        if not all(v.name in stats for v in model.values):
            stats = None
    if stats is not None:
        qmodel = model.quantize(bit_width=8, stats=stats)
    else:
        calib = rng.normal(size=(2, 3, 224, 224)).astype(np.float32) * 0.5
        qmodel = model.quantize([calib], bit_width=8,
                                calibration_mode="eager")

    import jax.numpy as jnp

    x = rng.normal(size=(batch, 3, 224, 224)).astype(np.float32) * 0.5
    # device-resident input: measure the chip, not the host link
    x = jax.device_put(x)

    # ppm-level per-iteration perturbation: every call sees distinct
    # input values, so no runtime can elide/memoize repeated steps
    @jax.jit
    def perturb(x, i):
        return x * (1.0 + 1e-6 * i)

    # as_numpy=True forces a host read of the logits -- the only
    # reliable completion barrier on remote runtimes
    qmodel([x])  # compile + warm
    iters = 10
    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        for it in range(iters):
            xi = perturb(x, float(rep * iters + it + 1))
            logits = qmodel([xi])[0]
        best = min(best, (time.time() - t0) / iters)
    img_per_s = batch / best

    with open(os.path.join(REPO, "baselines", "reference_cpu.json")) as f:
        ref = json.load(f)["ref_int8_img_per_s"]

    print(json.dumps({
        "metric": "vit_base_int8_images_per_sec_per_chip",
        "value": round(img_per_s, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_s / ref, 1),
    }))


if __name__ == "__main__":
    main()
