"""Autoregressive decode benchmark: tokens/sec on the chip.

Measures the two generation shapes over a GPT-2-Small-dimension decoder
(hidden 768, 12 heads, 12 layers, vocab 50257 -- real model scale, the
weights are random because no pretrained checkpoints exist in this
environment; throughput does not care):

* full-sequence re-forward (utils.generate) -- O(L) forwards of O(L^2)
  attention each,
* KV-cache step decode (utils.generate_kv) -- O(L) steps of O(L) cost,
  float32 and int8 cache carries.

Each variant decodes as ONE compiled XLA program (the loop is
lax.fori_loop), so what this measures is pure device throughput, not
dispatch.

    python extras/generate_benchmark.py [--json OUT.json]

Prints one JSON line per (form, quant, kv_dtype) with tokens/sec.
Results are recorded in BENCH_HISTORY.md.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY = "--tiny" in sys.argv  # CPU smoke mode (tests/test_gpt.py)
BATCH = 2 if TINY else 8
PROMPT = 4 if TINY else 16
NEW = 8 if TINY else 48          # decoded tokens per run
SEQ = PROMPT + NEW


def build():
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models.gpt import gpt_causal_lm, gpt_decode_step
    from transformers import GPT2Config

    def cfg():
        if TINY:
            return GPT2Config(vocab_size=96, n_positions=SEQ, n_embd=32,
                              n_layer=2, n_head=2,
                              activation_function="gelu")
        return GPT2Config(n_positions=SEQ, n_embd=768, n_layer=12,
                          n_head=12, activation_function="gelu")

    full_p = gpt_causal_lm(config=cfg(), batch_size=BATCH, seq_len=SEQ,
                           seed=0)
    step_p = gpt_decode_step(config=cfg(), batch_size=BATCH, max_len=SEQ,
                             seed=0)
    # weight-only (W8, float compute): the memory-bound decode config
    wstep = nq.Model.from_onnx(
        gpt_decode_step(config=cfg(), batch_size=BATCH, max_len=SEQ,
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


def main(json_path=None):
    from numpy_quant_tpu.utils import (beam_search, generate, generate_kv,
                                       generate_speculative)

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    full, full_p, step, step_p, wstep = build()
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, full_p._wte.shape[0],
                          size=(BATCH, PROMPT)).astype(np.int32)
    if only is None or not only.startswith("cb"):
        qfull, qstep = quantize_models(full, step, full_p, step_p, prompt)
        beam, beam_p, tgt, tgt_p, drf, drf_p, k = build_search_models()

    runs = [] if only is not None and only.startswith("cb") else [
        ("full", "float", lambda: generate(
            full, prompt, full_p._wte, NEW)),
        ("full", "int8", lambda: generate(
            qfull, prompt, full_p._wte, NEW)),
        ("kv", "float", lambda: generate_kv(
            step, prompt, step_p._wte, step_p._wpe, NEW)),
        ("kv", "int8", lambda: generate_kv(
            qstep, prompt, step_p._wte, step_p._wpe, NEW)),
        ("kv-int8cache", "int8", lambda: generate_kv(
            qstep, prompt, step_p._wte, step_p._wpe, NEW,
            kv_cache_dtype="int8")),
        ("kv", "w8-weight-only", lambda: generate_kv(
            wstep, prompt, step_p._wte, step_p._wpe, NEW)),
        ("beam2", "float", lambda: beam_search(
            beam, prompt, beam_p._wte, NEW, num_beams=2)),
        ("speculative-k4", "float", lambda: generate_speculative(
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
        import numpy_quant_tpu as nq
        pre = nq.Model.from_onnx(gpt_prefill(
            prefill_len=PROMPT, module=step_p._torch_module))
        cb_plain = ContinuousBatcher(step, step_p._wte, step_p._wpe)
        cb_pre = ContinuousBatcher(step, step_p._wte, step_p._wpe,
                                   prefill_model=pre)

        def run_cb(b):
            b.reset()
            return b.run(workload)

        runs.append(("cb-2x", "float", lambda: run_cb(cb_plain)))
        runs.append(("cb-2x-prefill", "float",
                     lambda: run_cb(cb_pre)))
    results = []
    for form, quant, fn in runs:
        if only and not form.startswith(only):
            continue
        sec = timed(fn)
        toks = (cb_tokens if form.startswith("cb") else BATCH * NEW) / sec
        rec = {"form": form, "quant": quant,
               "tokens_per_sec": round(toks, 1),
               "sec_per_run": round(sec, 4)}
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
