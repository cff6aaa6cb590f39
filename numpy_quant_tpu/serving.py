"""Model serving shapes: how a compiled Model/QModel forward is driven
in production.

Three shapes, in order of support maturity (docs/DEPLOYMENT.md):

* :func:`map_batches` -- throughput over a fixed dataset: ONE device
  program (``lax.scan`` over forwards), a single host sync. This is the
  headline benchmark path (bench.py).
* :func:`serve_stream` -- online pipelined stream: up to ``depth``
  forwards in flight hide per-dispatch round trips behind compute.
* :func:`serve_ring` -- persistent device loop: one dispatched
  program owns the chip and pulls batches through host callbacks.
  GATED behind :func:`ring_supported`, a watchdogged subprocess probe
  of the exact loop-embedded-callback program shape: runtimes that
  cannot complete it (remote-attached chips -- the io_callback hangs,
  BENCH_HISTORY.md round-3 ring measurement) raise a RuntimeError up
  front instead of hanging the session. Even where supported, measure
  before deploying it: on CPU it loses to plain ``__call__``.

``Model`` exposes these as methods; the reference has no serving layer
at all (its executor is a per-call interpreter loop, reference
numpy_quant/model.py:294-326).
"""
from __future__ import annotations

from typing import List

import jax
import numpy as np


def _np_dtype(a) -> np.dtype:
    return np.dtype(getattr(a, "dtype", type(a)))


def map_batches(model, inputs: List[np.ndarray], as_numpy: bool = True):
    """Throughput inference over a leading STEPS axis: each input is
    ``[steps, *per_call_shape]`` and all steps execute inside ONE
    device program (``lax.scan`` over forwards) with a single host
    sync at the end -- the production serving shape (what bench.py
    measures). Returns outputs stacked ``[steps, ...]``.

    Weights stay device-resident across steps, XLA overlaps the output
    transfer of step i with the compute of step i+1, and the per-call
    dispatch overhead of ``__call__`` is paid once for the whole
    dataset instead of per batch.
    """
    if any(_np_dtype(a) == np.int64 for a in inputs):
        raise ValueError("map_batches supports float inputs only "
                         "(int64 inputs are shape-domain, static "
                         "under jit)")
    arrays = list(inputs)
    key = ("map_batches",
           tuple((tuple(a.shape), str(a.dtype)) for a in arrays),
           bool(jax.config.jax_enable_x64))
    if key not in model._jit_cache:
        fwd = model.lowered_fn()

        def run(xs: list, params):
            def body(carry, step_inputs):
                return carry, tuple(fwd(list(step_inputs), params))
            _, ys = jax.lax.scan(body, 0, tuple(xs))
            return ys

        model._jit_cache[key] = jax.jit(run)
    placed = [model._place_batched_input(a) for a in arrays]
    outs = model._jit_cache[key](placed, model._placed_params())
    if as_numpy:
        return [np.asarray(o) for o in outs]
    return list(outs)


def serve_stream(model, batches, depth: int = 2, as_numpy: bool = True):
    """Pipelined request-stream inference: a generator yielding one
    output list per input batch (in order), keeping up to ``depth``
    forwards in flight.

    JAX dispatch is asynchronous -- ``__call__(as_numpy=False)``
    returns device futures without blocking -- so enqueueing the next
    request BEFORE synchronizing the previous one overlaps
    host->device transfer, dispatch and compute across requests. On a
    remote-attached chip each dispatch pays an RPC round trip;
    pipelining hides it behind the in-flight compute. This is the
    ONLINE serving shape: unlike ``map_batches`` (one device program
    over a fixed [steps, ...] dataset) it needs no inputs upfront and
    yields each result as it completes.

    ``batches``: iterable of input lists, each as ``__call__``'s
    ``inputs`` (all batches must share one shape signature to reuse
    the compiled program)."""
    from collections import deque

    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    inflight: deque = deque()

    def _finish(outs):
        return [np.asarray(o) for o in outs] if as_numpy else outs

    for batch in batches:
        inflight.append(model(list(batch), as_numpy=False))
        if len(inflight) >= depth:
            yield _finish(inflight.popleft())
    while inflight:
        yield _finish(inflight.popleft())


_RING_PROBE_CACHE: dict = {}


def ring_supported(timeout: float = 120.0) -> bool:
    """Whether this runtime completes serve_ring's program shape --
    ordered ``io_callback``s INSIDE a ``lax.while_loop`` body.

    A remote-attached chip (tunneled device plugin) never completes
    that shape, and the failure mode is a HANG, not an error -- so the
    probe runs the real loop-embedded form (not a bare callback, which
    some runtimes complete anyway) in a watchdogged subprocess.
    Cached per process; override with ``NQ_TPU_RING=0/1``.
    """
    import os
    import subprocess
    import sys

    forced = os.environ.get("NQ_TPU_RING")
    if forced is not None:
        return forced == "1"
    hit = _RING_PROBE_CACHE.get("ok")
    if hit is not None:
        return hit
    probe = (
        "import jax, numpy as np, jax.numpy as jnp\n"
        "from jax.experimental import io_callback\n"
        "spec = jax.ShapeDtypeStruct((), jnp.float32)\n"
        "def pull(y):\n"
        "    return np.float32(y) + np.float32(1.0)\n"
        "def body(c):\n"
        "    return io_callback(pull, spec, c, ordered=True)\n"
        "f = jax.jit(lambda x: jax.lax.while_loop("
        "lambda c: c < 2.0, body, x))\n"
        "out = jax.block_until_ready(f(jnp.zeros(())))\n"
        "assert float(out) == 2.0, float(out)\n")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           timeout=timeout, capture_output=True)
        ok = r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        ok = False
    _RING_PROBE_CACHE["ok"] = ok
    return ok


def serve_ring(model, batches, probe: bool = True):
    """EXPERIMENTAL persistent device serving loop: ONE dispatched XLA
    program owns the chip for the whole session. The compiled program
    is a ``lax.while_loop`` whose body delivers the previous outputs
    AND pulls the next input batch from the host through a single
    ordered ``io_callback`` (the input ring) -- so per-step dispatch
    overhead is paid ONCE for the session, and the device, not the
    host loop, paces ingestion.

    ``batches`` may be a LIVE generator -- each ``next()`` happens
    inside the pull callback when the device is ready for more work,
    and the session ends when it raises ``StopIteration``. Returns the
    list of per-batch output lists (host numpy -- the push callback
    crosses to the host by construction), in order.

    Cost model: one host round trip per step. The shape can pay off
    only when per-call dispatch overhead exceeds that callback trip
    (locally-attached accelerators with non-trivial per-step compute);
    measured on the CPU backend it LOSES to plain ``__call__`` (288 us
    vs 180 us/step, BENCH_HISTORY.md round 3), and on a remote-
    attached chip host callbacks never complete -- which is why the
    entry point is gated behind :func:`ring_supported` (below). Deploy
    with ``map_batches`` / ``serve_stream`` unless a local-chip
    measurement shows the ring winning (docs/DEPLOYMENT.md).

    All batches must share the first batch's shape/dtype signature
    (one compiled program). Float inputs only (int64 inputs are
    shape-domain, static under jit); unsupported on a sharded model
    (callbacks are single-host).

    ``probe=True`` (default) first checks :func:`ring_supported` --
    the watchdogged subprocess probe of the loop-embedded callback
    shape -- and raises ``RuntimeError`` when the runtime would hang
    instead of hanging the session. Pass ``probe=False`` only when
    the runtime is already known-good (e.g. the probe ran earlier in
    this process: the result is cached, so the default costs nothing
    after the first call).
    """
    import itertools
    import weakref

    import jax.numpy as jnp
    from jax.experimental import io_callback

    if model.mesh is not None:
        raise ValueError("serve_ring runs single-device (host "
                         "callbacks); use map_batches on a sharded "
                         "model")
    if probe and not ring_supported():
        raise RuntimeError(
            "serve_ring: this runtime does not complete ordered "
            "io_callbacks inside a while_loop (remote-attached chips "
            "hang here); deploy with map_batches or serve_stream "
            "instead (docs/DEPLOYMENT.md)")
    it = iter(batches)
    try:
        first_batch = [np.asarray(a) for a in next(it)]
    except StopIteration:
        return []
    if any(_np_dtype(a) == np.int64 for a in first_batch):
        raise ValueError("serve_ring supports float inputs only "
                         "(int64 inputs are shape-domain, static "
                         "under jit)")
    sig = tuple((tuple(a.shape), str(a.dtype)) for a in first_batch)
    key = ("serve_ring", sig, bool(jax.config.jax_enable_x64))
    if key in model._ring_state:
        raise RuntimeError("a serve_ring session with this input "
                           "signature is already running on this "
                           "model")
    if key not in model._jit_cache:
        fwd = model.lowered_fn()
        in_specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                         for a in first_batch)
        pull_spec = (jax.ShapeDtypeStruct((), jnp.int32),) + in_specs
        model_ref = weakref.proxy(model)

        def _stop():
            return ((np.int32(0),)
                    + tuple(np.zeros(s.shape, s.dtype) for s in in_specs))

        def host_pull():
            state = model_ref._ring_state[key]
            try:
                batch = next(state["it"])
            except StopIteration:
                return _stop()
            try:
                arrs = [np.asarray(a) for a in batch]
                got = tuple((tuple(a.shape), str(a.dtype)) for a in arrs)
                if got != sig:
                    raise ValueError(
                        f"serve_ring batch signature changed mid-"
                        f"session: expected {sig}, got {got}")
            except Exception as exc:  # noqa: BLE001
                # Surface host-side AFTER the program winds down: a
                # callback exception aborts the persistent program with
                # runtime-version-dependent wrapping and undefined
                # device state -- returning the stop sentinel instead
                # ends the while_loop cleanly, then the session
                # re-raises this stashed error deterministically.
                state["error"] = exc
                return _stop()
            return (np.int32(1),) + tuple(arrs)

        def host_exchange(*ys):
            # one host round trip per step: deliver this step's
            # outputs AND fetch the next batch in the same callback
            model_ref._ring_state[key]["out"].append(
                [np.asarray(y) for y in ys])
            return host_pull()

        def session(params):
            def cond(carry):
                return carry[0] > 0

            def body(carry):
                ys = fwd(list(carry[1:]), params)
                return io_callback(host_exchange, pull_spec, *ys,
                                   ordered=True)

            carry0 = io_callback(host_pull, pull_spec, ordered=True)
            final = jax.lax.while_loop(cond, body, carry0)
            return final[0]

        model._jit_cache[key] = jax.jit(session)
    state = {"it": itertools.chain([first_batch], it), "out": [],
             "error": None}
    model._ring_state[key] = state
    try:
        jax.block_until_ready(
            model._jit_cache[key](model._placed_params()))
    finally:
        del model._ring_state[key]
    if state["error"] is not None:
        raise state["error"]
    return state["out"]
