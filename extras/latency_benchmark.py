"""Single-stream latency benchmark: batch-1/4/8 ViT-Base forward
latency (no scan amortization), int8 vs W4A8 (VERDICT r2 #6).

Throughput (bench.py) hides per-forward latency behind a 64-iteration
device scan; serving a single request cares about one forward. W4A8's
halved weight HBM traffic should matter exactly here, where small-batch
dots go memory-bound.

    python extras/latency_benchmark.py

Prints one JSON line per (mode, batch) with the median and p1 latency.
Results are recorded in BENCH_HISTORY.md.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(mode: str, batch: int):
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.utils import load_calibration_stats
    from numpy_quant_tpu.models import vit as V
    from transformers import ViTConfig

    cfg = ViTConfig(num_labels=1000)
    m = V.vit_image_classifier(config=cfg, batch_size=None, seed=0)
    nq.onnx.make_dim_param_fixed(m.graph, "B", batch)
    model = nq.Model.from_onnx(m)
    stats_path = os.path.join(REPO, "baselines",
                              "vit_base_calibration_stats.json")
    stats = load_calibration_stats(stats_path)
    qkw = {} if mode == "int8" else \
        {"weight_bit_width": 4, "per_channel_weights": True}
    qmodel = model.quantize(bit_width=8, stats=stats, **qkw)
    qmodel.optimize()
    qmodel.pack_weights()
    return qmodel


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("NQ_TPU_JAX_CACHE",
                                     "/tmp/nq_tpu_jaxcache"))
    from numpy_quant_tpu import config as nq_config
    import jax.numpy as jnp
    nq_config.float_dtype = jnp.bfloat16
    nq_config.float_matmul_precision = jax.lax.Precision.DEFAULT

    rng = np.random.default_rng(0)
    reps = int(os.environ.get("NQ_TPU_LAT_REPS", "50"))
    for mode in ("int8", "w4a8"):
        for batch in (1, 4, 8):
            # rebuild per batch: the importer folds the batch dim into
            # static shapes (Reshape targets), so B is baked per graph
            qmodel = build(mode, batch)
            params = qmodel._placed_params()
            fwd = qmodel.lowered_fn()
            x = jax.device_put(
                rng.normal(size=(batch, 3, 224, 224)).astype(np.float32)
                * 0.5)
            run = jax.jit(lambda x, p: fwd([x], p)[0])
            np.asarray(run(x, params))  # compile + warm
            lats = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run(x, params).block_until_ready()
                lats.append((time.perf_counter() - t0) * 1e3)
            lats.sort()
            line = {
                "metric": f"vit_base_{mode}_latency_ms",
                "batch": batch,
                "median_ms": round(lats[len(lats) // 2], 3),
                "p1_ms": round(lats[max(0, len(lats) // 100)], 3),
                "imgs_per_s_at_batch": round(
                    batch / (lats[len(lats) // 2] / 1e3), 1),
            }
            # PIPELINED request stream (Model.serve_stream): per-request
            # dispatch overhead (RPC on a remote-attached chip) hides
            # behind in-flight compute -- the online-serving throughput
            # at this batch size, vs the blocking per-request number
            xs = [[np.asarray(x) * np.float32(1 + 1e-6 * i)]
                  for i in range(reps)]
            t0 = time.perf_counter()
            for _ in qmodel.serve_stream(xs, depth=3):
                pass
            wall = time.perf_counter() - t0
            line["stream_imgs_per_s"] = round(batch * reps / wall, 1)
            line["stream_ms_per_req"] = round(wall / reps * 1e3, 3)
            print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
