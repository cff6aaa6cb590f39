#!/usr/bin/env python
"""Online-vs-offline serving shapes on the real chip (ROADMAP item 4).

Measures int8 ViT-Base at the bench batch size across the three
deployment shapes the framework offers:

* sync       -- one __call__ per request, host sync each time (the
                naive server loop; pays dispatch + transfer serially)
* stream d=N -- serve_stream with N requests in flight (the ONLINE
                shape: async dispatch overlaps host->device transfer
                and compute across requests)
* scan       -- map_batches: the whole request set as one device
                program (the OFFLINE shape bench.py measures; upper
                bound -- zero per-request dispatch)
* ring       -- serve_ring: ONE persistent device program for the
                whole session; each step pulls its batch from the host
                through an input-ring io_callback (device-paced
                ingestion, single dispatch, no upfront dataset)

Each shape runs twice: with per-request HOST inputs (real ingest: the
bytes cross the host->device link every request) and with pre-placed
DEVICE inputs (isolates dispatch overhead from link bandwidth -- on a
remote-attached chip the link dominates).

Prints one JSON line per (shape, placement) with images/sec.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ring_supported() -> bool:
    """Library probe (numpy_quant_tpu.serving.ring_supported): a
    watchdogged subprocess runs serve_ring's REAL program shape --
    ordered io_callbacks INSIDE a lax.while_loop body -- so a runtime
    that completes bare callbacks but hangs on the loop-embedded form
    still gates correctly. Override with NQ_TPU_RING=0/1."""
    from numpy_quant_tpu.serving import ring_supported
    return ring_supported()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("NQ_TPU_JAX_CACHE",
                                     "/tmp/nq_tpu_jaxcache"))
    import numpy_quant_tpu as nq
    from numpy_quant_tpu import config as nq_config
    from numpy_quant_tpu.models import vit as V
    from numpy_quant_tpu.utils import load_calibration_stats
    from transformers import ViTConfig
    import jax.numpy as jnp

    nq_config.float_dtype = jnp.bfloat16
    nq_config.float_matmul_precision = jax.lax.Precision.DEFAULT

    batch = int(os.environ.get("NQ_TPU_BENCH_BATCH", "96"))
    steps = int(os.environ.get("NQ_TPU_SERVE_STEPS", "24"))
    cfg = ViTConfig(num_labels=1000)
    m = V.vit_image_classifier(config=cfg, batch_size=None, seed=0)
    nq.onnx.make_dim_param_fixed(m.graph, "B", batch)
    model = nq.Model.from_onnx(m)
    stats = load_calibration_stats(os.path.join(
        REPO, "baselines", "vit_base_calibration_stats.json"))
    qmodel = model.quantize(bit_width=8, stats=stats, quantize_conv=True)
    qmodel.optimize()
    qmodel.pack_weights()
    print(f"# model ready (batch={batch}, steps={steps})", file=sys.stderr,
          flush=True)

    rng = np.random.default_rng(0)
    host = [rng.normal(size=(batch, 3, 224, 224)).astype(np.float32) * 0.5
            for _ in range(steps)]
    dev = [jax.device_put(x) for x in host]
    jax.block_until_ready(dev[-1])

    def timed(fn):
        fn()  # warm (compile + caches)
        t0 = time.time()
        fn()
        return steps * batch / (time.time() - t0)

    def run_sync(inputs):
        def go():
            for x in inputs:
                np.asarray(qmodel([x])[0])
        return go

    def run_stream(inputs, depth):
        def go():
            for out in qmodel.serve_stream(([x] for x in inputs),
                                           depth=depth):
                np.asarray(out[0])
        return go

    def run_scan(stacked):
        def go():
            np.asarray(qmodel.map_batches([stacked])[0])
        return go

    def run_ring(inputs):
        def go():
            outs = qmodel.serve_ring([x] for x in inputs)
            assert len(outs) == len(inputs)
        return go

    host_stack = np.stack(host)
    dev_stack = jax.device_put(host_stack)
    jax.block_until_ready(dev_stack)

    for placement, xs, stacked in (("host", host, host_stack),
                                   ("device", dev, dev_stack)):
        shapes = [("sync", run_sync(xs))]
        for depth in (2, 4, 8):
            shapes.append((f"stream_d{depth}", run_stream(xs, depth)))
        shapes.append(("scan", run_scan(stacked)))
        if placement == "host" and _ring_supported():
            # ring ingest is host-side by construction (the pull
            # callback feeds from the host), so one placement row
            shapes.append(("ring", run_ring(xs)))
        for name, fn in shapes:
            ips = timed(fn)
            print(json.dumps({"shape": name, "inputs": placement,
                              "batch": batch, "steps": steps,
                              "img_per_s": round(ips, 1)}), flush=True)


if __name__ == "__main__":
    main()
