#!/usr/bin/env python
"""Headline benchmark: int8 ViT-Base-patch16-224 images/sec on one TPU chip.

Prints JSON lines {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
to stdout -- one line per completed measurement rep, each at least as good
as the last, so the LAST line is the result and a partially-completed run
still parses. vs_baseline compares against the reference implementation
(tebartsch/numpy-quant) running the same int8 ViT-Base on this machine's
host CPU (baselines/reference_cpu.json, measured via tests/oracle.py's
onnx shim).

Un-killable by design (the round-3 benchmark of record was lost to a
driver timeout, VERDICT.md):

* the measurement runs in a CHILD process; the parent streams its stdout
  and enforces a wall-clock budget (NQ_TPU_BENCH_BUDGET, default 480 s).
  On budget exhaustion the child is killed and the parent exits 0 if at
  least one JSON line was already emitted -- SIGALRM alone cannot do
  this, because CPython delivers signals only between bytecodes and the
  XLA compile is one long C++ call;
* the XLA compilation cache persists in NQ_TPU_JAX_CACHE (default
  ~/.cache/nq_tpu_jaxcache -- outside /tmp so it survives cleanups);
  the cache key is the HLO hash, so code revisions invalidate exactly
  what they change;
* import/quantize/optimize/pack run on the host CPU backend
  (config.host_eager): measured 596 s of per-op tunnel round trips
  before, ~5 s after (NQ_TPU_BENCH_ITERS/_REPS override the
  measurement length).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_BUDGET = 480.0


def main():
    if os.environ.get("NQ_TPU_BENCH_CHILD") == "1":
        run_measurement()
        return
    run_supervisor()


def run_supervisor():
    """Spawn the measurement child, relay its stdout, enforce the budget."""
    import subprocess

    budget = float(os.environ.get("NQ_TPU_BENCH_BUDGET", DEFAULT_BUDGET))
    env = dict(os.environ, NQ_TPU_BENCH_CHILD="1")
    # test hook: substitute the measurement child with an arbitrary
    # command (tests/test_utils.py exercises the budget-kill /
    # best-so-far / no-measurement paths without a chip)
    cmd_override = os.environ.get("NQ_TPU_BENCH_CHILD_CMD")
    cmd = ([sys.executable, "-c", cmd_override] if cmd_override
           else [sys.executable, os.path.abspath(__file__)])
    child = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                             text=True)
    deadline = time.time() + budget
    saw_json = False
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(child.stdout, selectors.EVENT_READ)
    buf = ""
    while True:
        timeout = deadline - time.time()
        if timeout <= 0:
            break
        events = sel.select(timeout=min(timeout, 5.0))
        if events:
            chunk = os.read(child.stdout.fileno(), 65536).decode(
                "utf-8", "replace")
            if not chunk:  # EOF: child finished
                break
            buf += chunk
            while "\n" in buf:
                line, buf = buf.split("\n", 1)
                print(line, flush=True)
                if line.startswith("{") and '"value"' in line:
                    saw_json = True
        if child.poll() is not None and not events:
            break
    if buf:
        # flush a partial final line (output without a trailing newline,
        # e.g. the child was killed mid-write): it may hold the last
        # best-so-far JSON measurement
        print(buf, flush=True)
        if buf.startswith("{") and '"value"' in buf:
            saw_json = True
        buf = ""
    if child.poll() is None:
        # budget exhausted: kill the child (it may be stuck in a C++
        # compile call where SIGALRM can't be delivered) and keep
        # whatever it already measured
        child.kill()
        child.wait()
        print(f"bench: budget {budget:.0f}s exhausted; "
              f"{'kept best-so-far' if saw_json else 'NO measurement'}",
              file=sys.stderr)
        sys.exit(0 if saw_json else 1)
    rc = child.wait()
    # drain anything left after EOF detection
    rest = child.stdout.read()
    if rest:
        for line in rest.splitlines():
            print(line, flush=True)
            if line.startswith("{") and '"value"' in line:
                saw_json = True
    sys.exit(rc if rc != 0 and not saw_json else 0)


def run_measurement():
    import jax
    cache_dir = os.environ.get(
        "NQ_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "nq_tpu_jaxcache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # keep jax's DEFAULT cache thresholds (min_compile_time ~1 s): the
    # big TPU programs all qualify, while the host_eager CPU eager ops
    # do not -- caching those poisons the cache with XLA:CPU AOT
    # entries whose machine features don't match on reload
    # (cpu_aot_loader SIGILL warnings, and the reload path hangs)

    import numpy_quant_tpu as nq
    from numpy_quant_tpu import config as nq_config
    from numpy_quant_tpu.models import vit as V
    from numpy_quant_tpu.utils import load_calibration_stats
    from transformers import ViTConfig

    if os.environ.get("NQ_TPU_BENCH_BF16", "1") == "1":
        # bfloat16 float segments between int8 matmuls: halves the HBM
        # traffic of LayerNorm/Softmax/GELU; extra error is below int8
        # quantization noise (see tests/test_bf16_mode.py)
        import jax.numpy as _jnp
        nq_config.float_dtype = _jnp.bfloat16
        nq_config.float_matmul_precision = jax.lax.Precision.DEFAULT

    batch = int(os.environ.get("NQ_TPU_BENCH_BATCH", "96"))
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
    # NQ_TPU_BENCH_MODE=w4a8: per-channel 4-bit weights (split-K packed,
    # half the weight HBM) with 8-bit activations -- same headline
    # metric name suffix so recorded numbers stay distinguishable
    mode = os.environ.get("NQ_TPU_BENCH_MODE", "int8")
    qkw = {} if mode == "int8" else \
        {"weight_bit_width": 4, "per_channel_weights": True}
    if os.environ.get("NQ_TPU_BENCH_QCONV", "1") == "1":
        # integer patch-embed conv (im2col + int8 MXU dot) instead of
        # the bf16 float conv: +0.8% end-to-end, and the trained
        # capstone asserts int8-vs-float label EQUALITY under this
        # exact config (tests/long_running/test_vit_base.py
        # [int8_qconv]), so it is the default serving configuration
        qkw["quantize_conv"] = True
    if stats is not None:
        qmodel = model.quantize(bit_width=8, stats=stats, **qkw)
    else:
        calib = rng.normal(size=(2, 3, 224, 224)).astype(np.float32) * 0.5
        qmodel = model.quantize([calib], bit_width=8,
                                calibration_mode="eager", **qkw)
    opt_report = {}
    if os.environ.get("NQ_TPU_BENCH_FUSED_ATTN", "1") == "1":
        # bit-identical graph passes: VMEM-resident int8 attention kernel
        # (head split/merge in-kernel) + early-int8 activation layout +
        # dead-token elimination (the classifier reads only the CLS
        # token, so the last layer's MLP/out-proj and the final LN
        # narrow from 197 tokens to 1 -- same logits, fewer MACs)
        opt_report = qmodel.optimize()
    if os.environ.get("NQ_TPU_BENCH_PACKED", "1") == "1":
        # packed weight storage (bit_width/8 bytes per value in HBM,
        # split-K layout, kernels/pack.py). For int8 the packed payload
        # IS the native int8 tensor, so the default "unpack" execution
        # compiles to the identical dot -- packing is free at 8 bits and
        # sub-byte at 4/2/1 (where the split-K kernel also beats XLA's
        # int8 dot like-for-like; BENCH_HISTORY.md round 2).
        qmodel.pack_weights()

    import jax.numpy as jnp

    x = rng.normal(size=(batch, 3, 224, 224)).astype(np.float32) * 0.5
    # device-resident input: measure the chip, not the host link
    x = jax.device_put(x)
    params = qmodel._placed_params()
    fwd = qmodel.lowered_fn()
    # full scan length always: a shorter scan under-amortizes the fixed
    # per-dispatch overhead (measured: iters=32 reads 3% low), and the
    # budget watchdog -- not a shorter measurement -- is what protects a
    # cold-cache run (reps cost ~1 s each; compile dominates)
    iters = int(os.environ.get("NQ_TPU_BENCH_ITERS", "64"))
    reps = int(os.environ.get("NQ_TPU_BENCH_REPS", "3"))

    # Sustained device throughput: scan `iters` forwards inside ONE
    # program. Each step sees a distinct (ppm-perturbed) input, so no
    # runtime can elide/memoize steps, and the single host sync at the
    # end amortizes the host<->device round trip out of the measurement.
    @jax.jit
    def many(x, params, base):
        def body(carry, factor):
            acc, xc = carry
            # Anti-hoisting perturbation: overwrite ONE pixel in place on
            # the scan carry (XLA aliases the carry buffer, so the
            # dynamic-update-slice is a 12-byte write). Scaling the whole
            # input instead (`x * factor`) was a full 58 MB read+write of
            # pure measurement overhead, ~0.14 ms/fwd; either way every
            # step's input differs so the forward cannot be hoisted out
            # of the loop.
            xc = jax.lax.dynamic_update_slice(
                xc, factor.reshape(1, 1, 1, 1).astype(xc.dtype),
                (0, 0, 0, 0))
            logits = fwd([xc], params)[0]
            return (acc + jnp.sum(logits), xc), jnp.max(logits)
        factors = base + 1e-6 * jnp.arange(1, iters + 1, dtype=jnp.float32)
        (checksum, _), maxes = jax.lax.scan(
            body, (jnp.float32(0.0), x), factors)
        return checksum, maxes

    def sync(out):
        return float(np.asarray(out[0]))  # host read = completion barrier

    with open(os.path.join(REPO, "baselines", "reference_cpu.json")) as f:
        ref = json.load(f)["ref_int8_img_per_s"]
    macs = _vit_macs(cfg)
    peak_tops = float(os.environ.get("NQ_TPU_PEAK_INT8_TOPS", "394"))

    def emit(best_s_per_fwd):
        """Print the JSON result line for the best time so far."""
        img_per_s = batch / best_s_per_fwd
        # Achieved matmul throughput vs the chip's int8 peak (the
        # BASELINE.md ">50% MXU" north-star metric). One MAC = 2 ops
        # (the v5e 394 TOP/s peak counts that way; ViT-Base's quoted
        # "17.6 GFLOPs" counts MACs and must be doubled). int8_tops/
        # mxu_util_pct use the model's NOMINAL MACs (round-2/3
        # convention, comparable across rounds); with narrow_gather the
        # EXECUTED graph has ~6% fewer (the last layer's MLP/out-proj
        # run on the CLS token only), reported as executed_*.
        tops = 2 * macs * img_per_s / 1e12
        line = {
            "metric": f"vit_base_{mode}_images_per_sec_per_chip",
            "value": round(img_per_s, 2),
            "unit": "images/sec",
            "vs_baseline": round(img_per_s / ref, 1),
            "int8_tops": round(tops, 1),
            "mxu_util_pct": round(100 * tops / peak_tops, 1),
        }
        if opt_report.get("narrow_gather", 0) > 0:
            ex = 2 * _vit_macs(cfg, narrowed=True) * img_per_s / 1e12
            line["executed_tops"] = round(ex, 1)
            line["executed_mxu_pct"] = round(100 * ex / peak_tops, 1)
        print(json.dumps(line), flush=True)

    # distinct `base` per call: repeated invocations are never identical,
    # so content-addressed runtimes cannot serve cached results
    t0 = time.time()
    sync(many(x, params, jnp.float32(1.0)))  # compile + warm
    # provisional line from the warm-up scan itself (its time includes
    # any compile wait, so it UNDER-reports; later reps only improve
    # it): a budget-starved run still records a parseable lower bound
    best = (time.time() - t0) / iters
    emit(best)
    for rep in range(reps):
        t0 = time.time()
        sync(many(x, params, jnp.float32(1.0 + 1e-3 * (rep + 1))))
        best = min(best, (time.time() - t0) / iters)
        emit(best)  # best-so-far after EVERY rep: partial runs parse
    # measurement done: exit WITHOUT the interpreter/JAX teardown --
    # on the tunneled runtime teardown hangs for minutes, which is
    # what exhausted every previous round's budget AFTER all reps had
    # already printed (the supervisor then killed the child and relied
    # on best-so-far salvage)
    sys.stdout.flush()
    os._exit(0)


def _vit_macs(cfg, narrowed: bool = False) -> float:
    """Multiply-accumulates per image for the benched ViT classifier
    graph (patch-embed conv + encoder layers + classifier head).
    ViT-Base-patch16-224: 17.57 GMACs -- matches the published 17.6
    "GFLOPs" figure, which counts MACs.

    ``narrowed=True`` counts the graph after narrow_gather (dead-token
    elimination): the LAST layer's out-projection and MLP run on the
    CLS token only (its QKV/attention still see every token), so the
    achieved-TOPs/MXU numbers reflect the MACs actually executed, not
    the unoptimized graph's."""
    p = cfg.patch_size
    n_patch = (cfg.image_size // p) ** 2
    seq = n_patch + 1  # + CLS token
    h, i = cfg.hidden_size, cfg.intermediate_size
    conv = n_patch * h * (cfg.num_channels * p * p)
    qkv_attn = (
        seq * h * 3 * h                                   # QKV projections
        + 2 * cfg.num_attention_heads * seq * seq
        * (h // cfg.num_attention_heads))                 # scores + context
    per_token_tail = (
        seq * h * h                                       # output projection
        + 2 * seq * h * i)                                # MLP up + down
    per_layer = qkv_attn + per_token_tail
    head = h * cfg.num_labels
    last_layer = qkv_attn + (per_token_tail / seq if narrowed
                             else per_token_tail)
    return float(conv + (cfg.num_hidden_layers - 1) * per_layer
                 + last_layer + head)


if __name__ == "__main__":
    main()
