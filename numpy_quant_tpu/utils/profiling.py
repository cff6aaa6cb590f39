"""Profile visualization.

Terminal bar chart comparing per-op-type time float vs quantized, top-5
(reference: extra/evaluate_profile_results.py:4-25 -- plotext is not
available in this environment, so the chart is plain ASCII). Also hooks
for jax.profiler traces on TPU.
"""
from __future__ import annotations


def profile_results_plot(profile_results: dict[str, float],
                         q_profile_results: dict[str, float],
                         show: int = 5, width: int = 50) -> str:
    """Render (and print) the comparison chart; returns the string."""
    q_sorted = dict(sorted(q_profile_results.items(), key=lambda kv: -kv[1]))
    labels = list(q_sorted)[:show]
    qvals = [q_sorted[k] for k in labels]
    fvals = [profile_results.get(k, 0.0) for k in labels]
    peak = max(qvals + fvals + [1e-12])
    name_w = max((len(l) for l in labels), default=0)

    lines = ["Profile quantized vs. float"]
    for label, qv, fv in zip(labels, qvals, fvals):
        qbar = "#" * max(1, int(width * qv / peak)) if qv > 0 else ""
        fbar = "=" * max(1, int(width * fv / peak)) if fv > 0 else ""
        lines.append(f"{label:<{name_w}} quantized |{qbar} {qv * 1e3:.1f}ms")
        lines.append(f"{'':<{name_w}} float32   |{fbar} {fv * 1e3:.1f}ms")
    out = "\n".join(lines)
    print(out)
    return out


def device_trace(fn, *args, trace_dir: str = "/tmp/nq_tpu_trace"):
    """Run fn under jax.profiler and return its result; the trace can be
    inspected with tensorboard/xprof. TPU equivalent of the reference's
    wall-clock op buckets."""
    import jax

    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    return out


def device_busy_seconds(trace_dir: str) -> float:
    """Total device-side kernel seconds in the LAST capture under
    ``trace_dir`` -- the sum of complete events on accelerator tracks,
    excluding executable wrappers (``jit_*``, ``while``) so nested
    region events do not double-count their kernels.

    This is the decode benchmark's device-time source: wall-clock
    through a remote-attached chip includes RPC and transfer time the
    chip never sees; the trace knows what the chip actually ran."""
    rows = summarize_device_trace(trace_dir, top=None, group_stems=False)
    return float(sum(sec for _, sec, _ in rows))


def summarize_device_trace(trace_dir: str, top: int = 20,
                           group_stems: bool = True) -> list[tuple]:
    """Aggregate device-side kernel times from a ``device_trace`` /
    ``jax.profiler.trace`` capture.

    Parses the chrome-trace JSON the profiler writes
    (``<trace_dir>/plugins/profile/*/\\*.trace.json.gz``), keeps only
    complete events on device (TPU/accelerator) tracks, and returns
    ``[(kernel_name, total_seconds, count), ...]`` sorted by total time.
    ``group_stems=True`` merges XLA's numbered instances
    (``fusion.123`` -> ``fusion``). Executable wrappers (``jit_*``,
    ``while``) are excluded so times attribute to real kernels.

    This is the profile-reading half of the reference's per-op timing
    story (reference: model.py:311-313 accumulates wall-clock per op
    type) for the jitted execution mode, where only the XLA device
    trace knows where time went.
    """
    import collections
    import glob
    import gzip
    import json
    import re

    files = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    pid_name = {e["pid"]: e["args"].get("name", "") for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "args" in e}
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n or "/device" in n or "Core" in n}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids \
                or "dur" not in e:
            continue
        name = e["name"]
        if name.startswith("jit_") or name.startswith("while"):
            continue
        if group_stems:
            name = re.sub(r"\.\d+$", "", name)
        agg[name] += e["dur"]
        cnt[name] += 1
    return [(k, v / 1e6, cnt[k]) for k, v in agg.most_common(top)]
