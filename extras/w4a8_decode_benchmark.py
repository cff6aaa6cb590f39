"""W4A8 decode at serving batch: can sub-byte weights win TIME?

BENCH_HISTORY round 4 establishes the floor logic: at batch 8 the
M=8 MXU occupancy wall coincides with the int8 weight-read wall, so
packed-int4 streaming cannot beat W8 on time. At batch >= 64 the MXU
runs int8 dots at 2x the bf16 peak, leaving the weight READ as the
bound -- the regime where W4A8's halved weight traffic must show.

Rows (weight-bound dims: hidden 2048, 12 layers, vocab 8192;
batch NQ_TPU_DECODE_BATCH=64, prompt 16, 48 new tokens; one compiled
program per run):

* w8 weight-only, bf16 compute        -- round-4 champion (93% HBM)
* int8 (full integer execution, int8 weights)
* W4A8 'unpack' (packed storage, hoisted int8 copy streams)
* W4A8 'kernel' (fused split-K Pallas: the PACKED payload streams,
  unpacked in VMEM; kernels/qmatmul.py)

Prints one JSON line per row with wall tokens/sec and device ms/step
(jax.profiler). Results recorded in BENCH_HISTORY.md.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("NQ_TPU_DECODE_BATCH", "64"))
PROMPT, NEW = 16, 48
SEQ = PROMPT + NEW


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("NQ_TPU_JAX_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "nq_tpu_jaxcache")))

    import numpy_quant_tpu as nq
    from numpy_quant_tpu import config as nq_config
    from numpy_quant_tpu.models.gpt import gpt_decode_step
    from numpy_quant_tpu.utils import (decode_calibration, generate_kv,
                                       merge_calibration_stats)
    from numpy_quant_tpu.utils.profiling import (device_busy_seconds,
                                                 device_trace)
    from transformers import GPT2Config

    cfg = GPT2Config(vocab_size=8192, n_positions=SEQ, n_embd=2048,
                     n_layer=12, n_head=16, activation_function="gelu")
    proto = gpt_decode_step(config=cfg, batch_size=BATCH, max_len=SEQ,
                            seed=0)
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 8192, size=(BATCH, PROMPT)).astype(np.int32)
    steps = PROMPT + NEW - 1

    def timed(fn, reps=3):
        fn()
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def dev_ms(fn):
        import shutil
        d = "/tmp/nq_w4a8_trace"
        shutil.rmtree(d, ignore_errors=True)
        try:
            device_trace(lambda: fn(), trace_dir=d)
            sec = device_busy_seconds(d)
            return round(sec / steps * 1e3, 3) if sec > 0 else None
        except Exception:  # noqa: BLE001
            return None

    def emit(name, model, mode=None, kv=None):
        prev = nq_config.packed_execution
        if mode is not None:
            nq_config.packed_execution = mode
            model._jit_cache.clear()
        try:
            fn = lambda: generate_kv(model, prompt, proto._wte,  # noqa: E731
                                     proto._wpe, NEW,
                                     kv_cache_dtype=kv)
            sec = timed(fn)
            rec = {"config": name, "batch": BATCH,
                   "tokens_per_sec": round(BATCH * NEW / sec, 1),
                   "sec_per_run": round(sec, 4),
                   "device_ms_per_step": dev_ms(fn)}
            print(json.dumps(rec), flush=True)
        finally:
            nq_config.packed_execution = prev

    # every row under the bf16 serving mode (docs/DEPLOYMENT.md): the
    # float segments between integer ops carry bf16, halving their HBM
    # traffic -- the honest like-for-like comparison
    with nq_config.low_precision_floats():
        w8 = nq.Model.from_onnx(proto)
        w8.quantize_weights(bit_width=8)
        emit("w8-weight-only-bf16", w8)

        # full int8 execution: calibrate once on the FLOAT graph (f32
        # stats; bf16 execution quantizes against the same params),
        # share stats across the integer rows
        fcal = nq.Model.from_onnx(proto)
        batches = decode_calibration(fcal, prompt[:, :4], proto._wte,
                                     proto._wpe)
        stats = merge_calibration_stats(
            *[fcal.calibration_stats(b) for b in batches])

        q8 = nq.Model.from_onnx(proto).quantize(stats=stats, bit_width=8)
        q8.optimize()
        emit("int8-float-kv", q8)
        # int8 KV cache: the cache CARRIES int8, so the per-step
        # TinyqQuant over the whole [B,H,L,hd] cache -- ~500 MB/step at
        # these dims, the round-4 2.1x loss -- never runs; attention
        # reads the cache at 1/4 the f32 bytes. Token-identical
        # (quantize is idempotent; tests/test_generate.py).
        emit("int8-int8-kv", q8, kv="int8")

        w4a8 = nq.Model.from_onnx(proto).quantize(
            stats=stats, bit_width=8, weight_bit_width=4,
            per_channel_weights=True)
        w4a8.optimize()
        w4a8.pack_weights()
        emit("w4a8-packed-kernel", w4a8, mode="kernel")
        emit("w4a8-packed-kernel-int8-kv", w4a8, mode="kernel", kv="int8")


if __name__ == "__main__":
    main()
