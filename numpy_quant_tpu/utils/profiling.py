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
