"""Autoregressive decode benchmark: tokens/sec on the chip, with
DEVICE-time attribution.

Measures the generation shapes over a GPT-2-Small-dimension decoder
(hidden 768, 12 heads, 12 layers, vocab 50257 -- real model scale, the
weights are random because no pretrained checkpoints exist in this
environment; throughput does not care):

* full-sequence re-forward (utils.generate) -- O(L) forwards of O(L^2)
  attention each,
* KV-cache step decode (utils.generate_kv) -- O(L) steps of O(L) cost,
  float32 / int8 / weight-only variants.

Each variant decodes as ONE compiled XLA program (the loop is
lax.fori_loop). Two time bases per row:

* ``sec_per_run`` / ``tokens_per_sec`` -- WALL clock, includes the
  host->device dispatch and (on this rig) the tunnel RPC; the
  deployment-topology number.
* ``device_ms_per_step`` / ``tokens_per_sec_chip`` / ``hbm_util_pct``
  -- from the XLA device trace (jax.profiler): what the CHIP actually
  ran per decode step, and the fraction of peak HBM bandwidth the
  step's mandatory traffic (weights + full KV cache read) achieved.
  Decode is bandwidth-bound, so hbm_util_pct is the decode analogue of
  the vision bench's mxu_util_pct. Falls back to wall-minus-dispatch
  when the profiler cannot capture device tracks (some remote
  runtimes).

``--large`` switches to the WEIGHT-BOUND regime (hidden 2048, 16 heads,
12 layers, vocab 8192: ~0.6 GB of f32 linear weights, read once per
step): only the kv rows, float vs W8 vs W4-grouped, where sub-byte
weight storage must show its decode win (VERDICT.md round-3 item 4).

    python extras/generate_benchmark.py [--tiny|--large] [--only FORM]
                                        [--json OUT.json]

Prints one JSON line per (form, quant) with both time bases. Results
are recorded in BENCH_HISTORY.md.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY = "--tiny" in sys.argv   # CPU smoke mode (tests/test_gpt.py)
LARGE = "--large" in sys.argv  # weight-bound decode regime
BATCH = 2 if TINY else 8
PROMPT = 4 if TINY else 16
NEW = 8 if TINY else 48          # decoded tokens per run
SEQ = PROMPT + NEW
PEAK_HBM_GBPS = float(os.environ.get("NQ_TPU_PEAK_HBM_GBPS", "819"))
TRACE_DIR = os.environ.get("NQ_TPU_TRACE_DIR", "/tmp/nq_tpu_decode_trace")


def apply_serving_precision():
    """NQ_TPU_DECODE_PRECISION=default switches float matmuls off
    Precision.HIGHEST (the parity default: 6-pass bf16 emulation per
    f32 dot) onto the serving precision; NQ_TPU_DECODE_BF16=1
    additionally runs the float data plane in bfloat16. Decode rows are
    weight-read bound, but the dot passes still pay the HIGHEST
    multiplier; these knobs measure the serving configs."""
    import jax

    from numpy_quant_tpu import config as nq_config
    if os.environ.get("NQ_TPU_DECODE_PRECISION") == "default":
        nq_config.float_matmul_precision = jax.lax.Precision.DEFAULT
    if os.environ.get("NQ_TPU_DECODE_BF16") == "1":
        import jax.numpy as jnp
        nq_config.float_dtype = jnp.bfloat16
        nq_config.float_matmul_precision = jax.lax.Precision.DEFAULT


def gpt_cfg():
    from transformers import GPT2Config
    if TINY:
        return GPT2Config(vocab_size=96, n_positions=SEQ, n_embd=32,
                          n_layer=2, n_head=2, activation_function="gelu")
    if LARGE:
        # ~0.6 GB of f32 linear weights: a decode step is weight-read
        # bound (0.6 GB / 819 GB/s = 0.8 ms floor at f32), so storage
        # width IS step time and W8/W4 must win proportionally
        return GPT2Config(vocab_size=8192, n_positions=SEQ, n_embd=2048,
                          n_layer=12, n_head=16,
                          activation_function="gelu")
    return GPT2Config(n_positions=SEQ, n_embd=768, n_layer=12,
                      n_head=12, activation_function="gelu")


def build():
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models.gpt import gpt_causal_lm, gpt_decode_step

    full_p = gpt_causal_lm(config=gpt_cfg(), batch_size=BATCH,
                           seq_len=SEQ, seed=0)
    step_p = gpt_decode_step(config=gpt_cfg(), batch_size=BATCH,
                             max_len=SEQ, seed=0)
    # weight-only (W8, float compute): the memory-bound decode config
    wstep = nq.Model.from_onnx(
        gpt_decode_step(config=gpt_cfg(), batch_size=BATCH, max_len=SEQ,
                        seed=0))
    wstep.quantize_weights(bit_width=8)
    return nq.Model.from_onnx(full_p), full_p, \
        nq.Model.from_onnx(step_p), step_p, wstep


def quantize_models(full, step, full_p, step_p, prompt):
    from numpy_quant_tpu.utils import (decode_calibration,
                                       merge_calibration_stats)

    calib = np.take(full_p._wte, np.random.default_rng(0).integers(
        0, full_p._wte.shape[0], size=(BATCH, SEQ)), axis=0)
    qfull = full.quantize([calib.astype(np.float32)], bit_width=8)
    qfull.optimize()  # fused causal attention
    batches = decode_calibration(step, prompt[:, :4], step_p._wte,
                                 step_p._wpe)
    stats = merge_calibration_stats(
        *[step.calibration_stats(b) for b in batches])
    qstep = step.quantize(stats=stats, bit_width=8)
    return qfull, qstep


def timed(fn, repeats=3):
    fn()  # compile + warm
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def measure_dispatch_overhead():
    """Wall time of a trivial dispatched program: the per-call floor
    (RPC round trip on a remote-attached chip) that device compute
    never sees. Used as the fallback device-time correction."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.float32(0.0)
    np.asarray(f(x))  # compile
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def device_seconds(fn):
    """One run under the jax profiler -> device-busy seconds, or None
    when the runtime yields no device tracks."""
    import shutil

    from numpy_quant_tpu.utils.profiling import (device_busy_seconds,
                                                 device_trace)
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    try:
        device_trace(lambda: fn(), trace_dir=TRACE_DIR)
        sec = device_busy_seconds(TRACE_DIR)
        return sec if sec > 0 else None
    except Exception as exc:  # noqa: BLE001 -- report, fall back
        print(f"# device trace unavailable ({type(exc).__name__}: {exc})",
              file=sys.stderr)
        return None


def model_weight_bytes(model) -> int:
    """HBM bytes the executor's parameter dict occupies (what a decode
    step must read): narrowed int8 payloads, packed sub-byte planes,
    f32 floats -- as placed, not as stored in the graph."""
    import jax

    leaves = jax.tree_util.tree_leaves(model._device_params())
    return int(sum(getattr(a, "nbytes", 0) for a in leaves))


def kv_read_bytes(step_model, cache_dtype_bytes=4) -> int:
    """Bytes of KV cache a decode step reads: the step graph scores
    against the FULL static-length cache every step."""
    from numpy_quant_tpu.utils.generate import _kv_layout
    n_layer, b, nh, length, hd = _kv_layout(step_model)
    return int(2 * n_layer * b * nh * length * hd * cache_dtype_bytes)


def decode_device_metrics(rec, dev_sec, n_steps, model=None,
                          cache_bytes=0):
    """Fill the device-time columns of a result row."""
    if dev_sec is None:
        return rec
    step_s = dev_sec / n_steps
    rec["device_ms_per_step"] = round(step_s * 1e3, 3)
    rec["tokens_per_sec_chip"] = round(BATCH / step_s, 1)
    if model is not None:
        bytes_per_step = model_weight_bytes(model) + cache_bytes
        gbps = bytes_per_step / step_s / 1e9
        rec["hbm_gbps"] = round(gbps, 1)
        rec["hbm_util_pct"] = round(100 * gbps / PEAK_HBM_GBPS, 1)
    return rec


def build_search_models():
    """Extra graph forms for the beam / speculative variants: a
    batch*W full graph for beam-2, and (target, 2-layer draft) graphs
    long enough for k=4 speculation."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models.gpt import gpt_causal_lm
    from transformers import GPT2Config

    k = 4
    spec_len = SEQ + k - 1
    if TINY:
        tgt_cfg = GPT2Config(vocab_size=96, n_positions=spec_len,
                             n_embd=32, n_layer=2, n_head=2,
                             activation_function="gelu")
        drf_cfg = GPT2Config(vocab_size=96, n_positions=spec_len,
                             n_embd=32, n_layer=1, n_head=2,
                             activation_function="gelu")
        beam_cfg = GPT2Config(vocab_size=96, n_positions=SEQ, n_embd=32,
                              n_layer=2, n_head=2,
                              activation_function="gelu")
    else:
        tgt_cfg = GPT2Config(n_positions=spec_len, n_embd=768,
                             n_layer=12, n_head=12,
                             activation_function="gelu")
        drf_cfg = GPT2Config(n_positions=spec_len, n_embd=768,
                             n_layer=2, n_head=12,
                             activation_function="gelu")
        beam_cfg = GPT2Config(n_positions=SEQ, n_embd=768, n_layer=12,
                              n_head=12, activation_function="gelu")
    beam_p = gpt_causal_lm(config=beam_cfg, batch_size=BATCH * 2,
                           seq_len=SEQ, seed=0)
    tgt_p = gpt_causal_lm(config=tgt_cfg, batch_size=BATCH,
                          seq_len=spec_len, seed=0)
    drf_p = gpt_causal_lm(config=drf_cfg, batch_size=BATCH,
                          seq_len=spec_len, seed=3)
    return (nq.Model.from_onnx(beam_p), beam_p,
            nq.Model.from_onnx(tgt_p), tgt_p,
            nq.Model.from_onnx(drf_p), drf_p, k)


def _kernel_mode(model, fn):
    """Run ``fn`` under config.packed_execution='kernel'. Sticky (no
    restore): the kernel row is measured LAST and timed()/
    device_seconds() re-invoke the callable -- clearing the model's
    loop cache on every invocation would re-trace per call (the exact
    bug the cached generate loops fixed, BENCH_HISTORY round 4)."""
    from numpy_quant_tpu import config as nq_config

    if nq_config.packed_execution != "kernel":
        nq_config.packed_execution = "kernel"
        model._jit_cache.clear()
    return fn()


def main(json_path=None):
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.utils import generate_kv

    apply_serving_precision()

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    full, full_p, step, step_p, wstep = build()
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, full_p._wte.shape[0],
                          size=(BATCH, PROMPT)).astype(np.int32)
    kv_steps = PROMPT + NEW - 1  # fori_loop executes total-1 forwards
    kv_bytes_f32 = kv_read_bytes(step)

    if LARGE:
        # weight-bound regime: only the kv decode forms, float vs W8 vs
        # W4-grouped (packed split-K storage, unpacked-int8 execution)
        from numpy_quant_tpu.models.gpt import gpt_decode_step
        w4step = nq.Model.from_onnx(gpt_decode_step(
            config=gpt_cfg(), batch_size=BATCH, max_len=SEQ, seed=0))
        w4step.quantize_weights(bit_width=4, group_size=128)
        runs = [
            ("kv", "float", step, lambda: generate_kv(
                step, prompt, step_p._wte, step_p._wpe, NEW)),
            ("kv", "w8-weight-only", wstep, lambda: generate_kv(
                wstep, prompt, step_p._wte, step_p._wpe, NEW)),
            ("kv", "w4-grouped-weight-only", w4step, lambda: generate_kv(
                w4step, prompt, step_p._wte, step_p._wpe, NEW)),
            # same model through the fused weight-only kernel: the
            # PACKED payload streams per step (half the weight reads of
            # the hoisted-int8 form; kernels/qmatmul.splitk_wo_matmul)
            ("kv", "w4-grouped-kernel", w4step,
             lambda: _kernel_mode(w4step, lambda: generate_kv(
                 w4step, prompt, step_p._wte, step_p._wpe, NEW))),
        ]
        results = []
        dispatch = measure_dispatch_overhead()
        print(f"# dispatch overhead {dispatch * 1e3:.1f} ms", flush=True)
        for form, quant, model, fn in runs:
            if only and not form.startswith(only):
                continue
            sec = timed(fn)
            dev = device_seconds(fn)
            if dev is None:
                dev = max(sec - dispatch, 1e-9)  # wall minus dispatch
            rec = {"form": form, "quant": quant,
                   "tokens_per_sec": round(BATCH * NEW / sec, 1),
                   "sec_per_run": round(sec, 4),
                   "weight_mb": round(model_weight_bytes(model) / 1e6, 1)}
            decode_device_metrics(rec, dev, kv_steps, model, kv_bytes_f32)
            print(json.dumps(rec), flush=True)
            results.append(rec)
        if json_path:
            with open(json_path, "w") as f:
                json.dump({"mode": "large", "batch": BATCH,
                           "prompt": PROMPT, "new": NEW,
                           "runs": results}, f, indent=1)
        return

    from numpy_quant_tpu.utils import (beam_search, generate,
                                       generate_speculative)

    if only is None or not only.startswith("cb"):
        qfull, qstep = quantize_models(full, step, full_p, step_p, prompt)
        beam, beam_p, tgt, tgt_p, drf, drf_p, k = build_search_models()

    # (form, quant, model-for-device-metrics (kv rows), cache bytes, fn)
    runs = [] if only is not None and only.startswith("cb") else [
        ("full", "float", None, 0, lambda: generate(
            full, prompt, full_p._wte, NEW)),
        ("full", "int8", None, 0, lambda: generate(
            qfull, prompt, full_p._wte, NEW)),
        ("kv", "float", step, kv_bytes_f32, lambda: generate_kv(
            step, prompt, step_p._wte, step_p._wpe, NEW)),
        ("kv", "int8", qstep, kv_bytes_f32, lambda: generate_kv(
            qstep, prompt, step_p._wte, step_p._wpe, NEW)),
        ("kv-int8cache", "int8", qstep, kv_bytes_f32 // 4,
         lambda: generate_kv(
             qstep, prompt, step_p._wte, step_p._wpe, NEW,
             kv_cache_dtype="int8")),
        ("kv", "w8-weight-only", wstep, kv_bytes_f32,
         lambda: generate_kv(
             wstep, prompt, step_p._wte, step_p._wpe, NEW)),
        ("beam2", "float", None, 0, lambda: beam_search(
            beam, prompt, beam_p._wte, NEW, num_beams=2)),
        ("speculative-k4", "float", None, 0,
         lambda: generate_speculative(
             tgt, drf, prompt, tgt_p._wte, drf_p._wte, NEW, k=k)),
    ]

    # continuous batching: 2x oversubscribed ragged workload through
    # BATCH slots (per-step host sync is the price of online admission;
    # compare against the one-program lockstep kv row)
    from numpy_quant_tpu.models.gpt import gpt_prefill
    from numpy_quant_tpu.utils import ContinuousBatcher

    run_cb_rows = only is None or only.startswith("cb")

    workload = [
        (rng.integers(0, step_p._wte.shape[0],
                      size=(1 + i % PROMPT,)).astype(np.int32), NEW)
        for i in range(2 * BATCH)]
    cb_tokens = sum(n for _, n in workload)
    if run_cb_rows:
        pre = nq.Model.from_onnx(gpt_prefill(
            prefill_len=PROMPT, module=step_p._torch_module))
        cb_plain = ContinuousBatcher(step, step_p._wte, step_p._wpe)
        cb_pre = ContinuousBatcher(step, step_p._wte, step_p._wpe,
                                   prefill_model=pre)

        def run_cb(b):
            b.reset()
            return b.run(workload)

        cb_chunk = ContinuousBatcher(step, step_p._wte, step_p._wpe,
                                     steps_per_sync=8)
        runs.append(("cb-2x", "float", None, 0, lambda: run_cb(cb_plain)))
        runs.append(("cb-2x-prefill", "float", None, 0,
                     lambda: run_cb(cb_pre)))
        # chunked engine: 8 inner decode steps per dispatched program,
        # amortizing the per-step host sync (the online-serving tax on
        # a remote-attached chip) -- bit-identical tokens
        runs.append(("cb-2x-sync8", "float", None, 0,
                     lambda: run_cb(cb_chunk)))
    results = []
    dispatch = measure_dispatch_overhead()
    print(f"# dispatch overhead {dispatch * 1e3:.1f} ms", flush=True)
    for form, quant, model, cache_bytes, fn in runs:
        if only and not form.startswith(only):
            continue
        sec = timed(fn)
        toks = (cb_tokens if form.startswith("cb") else BATCH * NEW) / sec
        rec = {"form": form, "quant": quant,
               "tokens_per_sec": round(toks, 1),
               "sec_per_run": round(sec, 4)}
        if model is not None:  # kv rows: device-time attribution
            dev = device_seconds(fn)
            if dev is None:
                dev = max(sec - dispatch, 1e-9)
            decode_device_metrics(rec, dev, kv_steps, model, cache_bytes)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    if json_path:
        with open(json_path, "w") as f:
            json.dump({"batch": BATCH, "prompt": PROMPT, "new": NEW,
                       "runs": results}, f, indent=1)


if __name__ == "__main__":
    path = None
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
    main(path)
