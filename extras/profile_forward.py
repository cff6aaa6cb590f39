"""Per-kernel device-time profile of the headline int8 ViT-Base
forward, in exactly the bench configuration (bench.py defaults:
bf16 serving mode, optimize(), pack_weights(), integer patch-embed
conv, batch 96).

Captures a ``jax.profiler`` trace of a scanned forward loop and
attributes device time per fused kernel, aggregated by kernel stem --
the tool that produced every per-millisecond breakdown in
BENCH_HISTORY.md. Run on the real chip:

    python extras/profile_forward.py

Environment knobs mirror bench.py (NQ_TPU_BENCH_BATCH, .._MODE,
.._QCONV). No reference analogue: the reference's profiling is the
per-op wall-clock dict (reference extra/evaluate_profile_results.py);
this is the XLA-level equivalent for fused jit programs, built on
utils/profiling.summarize_device_trace.
"""
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nq_tpu_jaxcache")
import jax.numpy as jnp

import numpy_quant_tpu as nq
from numpy_quant_tpu import config as nq_config
from numpy_quant_tpu.models import vit as V
from numpy_quant_tpu.utils import load_calibration_stats
from numpy_quant_tpu.utils.profiling import summarize_device_trace


def build_qmodel(batch):
    from transformers import ViTConfig

    cfg = ViTConfig(num_labels=1000)
    m = V.vit_image_classifier(config=cfg, batch_size=None, seed=0)
    nq.onnx.make_dim_param_fixed(m.graph, "B", batch)
    model = nq.Model.from_onnx(m)
    stats = load_calibration_stats(os.path.join(
        REPO, "baselines", "vit_base_calibration_stats.json"))
    mode = os.environ.get("NQ_TPU_BENCH_MODE", "int8")
    qkw = {} if mode == "int8" else \
        {"weight_bit_width": 4, "per_channel_weights": True}
    if os.environ.get("NQ_TPU_BENCH_QCONV", "1") == "1":
        qkw["quantize_conv"] = True
    qmodel = model.quantize(bit_width=8, stats=stats, **qkw)
    qmodel.optimize()
    qmodel.pack_weights()
    return qmodel


def main():
    nq_config.float_dtype = jnp.bfloat16
    nq_config.float_matmul_precision = jax.lax.Precision.DEFAULT
    batch = int(os.environ.get("NQ_TPU_BENCH_BATCH", "96"))
    iters = int(os.environ.get("NQ_TPU_PROFILE_ITERS", "16"))
    qmodel = build_qmodel(batch)

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.normal(size=(batch, 3, 224, 224)).astype(np.float32) * 0.5)
    params = qmodel._placed_params()
    fwd = qmodel.lowered_fn()

    @jax.jit
    def many(x, params, base):
        def body(carry, f):
            acc, xc = carry
            xc = jax.lax.dynamic_update_slice(
                xc, f.reshape(1, 1, 1, 1).astype(xc.dtype), (0, 0, 0, 0))
            logits = fwd([xc], params)[0]
            return (acc + jnp.sum(logits), xc), 0
        fs = base + 1e-6 * jnp.arange(1, iters + 1, dtype=jnp.float32)
        (out, _), _ = jax.lax.scan(body, (jnp.float32(0), x), fs)
        return out

    float(many(x, params, jnp.float32(1.0)))  # compile + warm
    t0 = time.time()
    float(many(x, params, jnp.float32(1.001)))
    wall = (time.time() - t0) / iters
    print(f"per-forward wall: {wall * 1e3:.2f} ms -> {batch / wall:.0f} img/s")

    trace_dir = os.environ.get("NQ_TPU_PROFILE_DIR", "/tmp/nq_prof")
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        float(many(x, params, jnp.float32(1.002)))

    stems = summarize_device_trace(trace_dir, top=18, group_stems=True)
    singles = summarize_device_trace(trace_dir, top=24, group_stems=False)
    total = sum(s for _, s, _ in
                summarize_device_trace(trace_dir, top=10 ** 6,
                                       group_stems=False))
    print(f"device total: {total * 1e3 / iters:.2f} ms/fwd")
    for stem, sec, cnt in stems:
        print(f"{sec * 1e3 / iters:8.3f} ms  {100 * sec / total:5.1f}%  "
              f"x{cnt:<4d} {stem}")
    print("\n-- top individual kernels --")
    for name, sec, _ in singles:
        print(f"{sec * 1e3 / iters:8.3f} ms  {name[:90]}")
    if os.environ.get("NQ_TPU_PROFILE_JSON"):
        with open(os.environ["NQ_TPU_PROFILE_JSON"], "w") as f:
            json.dump({n: s / iters for n, s, _ in singles}, f)


if __name__ == "__main__":
    main()
