"""Pipeline parallelism (GPipe schedule) over a ``pipe`` mesh axis.

The reference has no parallelism at all (SURVEY section 2.3 census);
DP/TP are covered by :mod:`.sharding`. This module fills the last
disposition: PIPELINE parallel inference, the TPU-native way --

* the model's node list splits into S contiguous STAGES at residual
  boundaries (cut points where exactly one activation crosses and
  every cut carries the same shape -- the transformer residual
  stream), balanced by parameter bytes;
* the whole schedule compiles into ONE ``shard_map`` program over the
  mesh's ``pipe`` axis: each device runs its stage
  (``jax.lax.switch`` on the device's axis index), activations move
  stage-to-stage with ``jax.lax.ppermute`` over ICI, and the batch
  streams through as M microbatches (the GPipe pipeline:
  ``M + S - 1`` steps, bubble fraction ``(S-1)/(M+S-1)``);
* results match the unpipelined model to f32 ulps (each microbatch
  row sees the same op sequence on the same values; XLA may tile the
  dots differently at the microbatch size, so reduction-order rounding
  can differ by ulps), asserted in tests/test_parallel.py;
* QModel stages pipeline too: cuts are restricted to values that
  execute as FLOAT in the quantized graph (the residual stream -- not
  a quantized-op accumulator, not an int8_dataflow-planned value) and
  interior stages carry that activation verbatim (boundary
  passthrough: no entry quantize / exit dequantize), so the pipelined
  int8 model runs the exact op sequence of the unpipelined one.

Memory note: this general-graph form passes every stage's params
replicated (device s only READS stage s's -- correct, but each device
holds all weights). For uniform repeated-layer models the standard
stacked-params layout (leaves stacked [S, ...] and sharded P("pipe"))
removes the replication; that optimization composes with this
schedule and is left to the uniform-layer fast path (ROADMAP).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Constant, Node, Variable


def _clone_segment(nodes: list[Node], boundary_in, boundary_out):
    """Deep-clone a node segment into a fresh sub-graph (fresh
    Node/Value objects -- Model.__del__ breaks links, so stages must
    not share objects with the parent). Payload arrays are shared.
    Returns (nodes, values, input_var, output_var)."""
    vmap: dict[int, object] = {}

    def clone_value(v):
        c = vmap.get(id(v))
        if c is None:
            if isinstance(v, Constant):
                c = Constant(v.name, [], v.data)
            else:
                c = Variable(v.name, [], [], v.data)
                c.shape_hint = getattr(v, "shape_hint", None)
                c.dtype_hint = getattr(v, "dtype_hint", None)
            vmap[id(v)] = c
        return c

    new_nodes = []
    for n in nodes:
        nn = Node(n.name, n.op, dict(n.attrs),
                  [clone_value(v) if v is not None else None
                   for v in n.inputs],
                  [clone_value(v) for v in n.outputs])
        for v in nn.inputs:
            if v is not None:
                v.outputs.append(nn)
        for v in nn.outputs:
            v.inputs.append(nn)
        new_nodes.append(nn)
    values = list(vmap.values())
    return (new_nodes, values, vmap[id(boundary_in)],
            vmap[id(boundary_out)])


def split_stages(model, n_stages: int) -> list:
    """Split ``model`` into ``n_stages`` sub-Models at single-value
    cut points whose crossing activation has ONE shape (the residual
    stream), balancing parameter bytes per stage. The model must have
    exactly one input and one output (the pipelined executor carries
    one activation between stages). Returns the list of stage Models.
    """
    from ..model import Model, QModel

    is_q = getattr(model, "quant_params", None) is not None
    if len(model.inputs) != 1 or len(model.outputs) != 1:
        raise ValueError("pipeline stages carry ONE activation; the "
                         "model must have a single input and output "
                         f"(got {len(model.inputs)}/{len(model.outputs)})")
    nodes = model.nodes
    # candidate cut after node i: exactly one live Variable crosses
    last_use: dict[str, int] = {}
    for i, n in enumerate(nodes):
        for v in n.inputs:
            if v is not None and isinstance(v, Variable):
                last_use[v.name] = i

    shapes = model._infer_shapes() or {}
    cuts = []  # (node index i, crossing value) -- cut between i and i+1
    for i in range(len(nodes) - 1):
        live = [v for n in nodes[:i + 1] for v in n.outputs
                if isinstance(v, Variable)
                and last_use.get(v.name, -1) > i]
        live = list({id(v): v for v in live}.values())
        if len(live) == 1:
            v = live[0]
            if is_q:
                # QModel stages carry the boundary activation as a raw
                # FLOAT tensor (passthrough -- no entry quantize / exit
                # dequantize round trip), so cuts are restricted to
                # values that execute as float in the quantized graph:
                # not a quantized-op accumulator, not planned int8.
                prod = v.inputs[0] if v.inputs else None
                if ((prod is not None and prod.op in model.quantized_ops)
                        or v.name in model._int8_values):
                    continue
            cuts.append((i, v))
    if not cuts:
        raise ValueError("no single-value cut points (the graph is not "
                         "a chain at any node boundary)")
    # keep only cuts whose crossing value shares the dominant shape
    # (the residual stream): the schedule's carry has ONE static shape
    shape_of = {c[1].name: shapes.get(c[1].name) for c in cuts}
    from collections import Counter
    known = Counter(s for s in shape_of.values() if s is not None)
    if not known:
        raise ValueError(
            "no cut-point shapes could be inferred (the model inputs "
            "need float shape hints for _infer_shapes; see "
            "Model._infer_shapes) -- cannot pick a pipeline carry shape")
    dominant, _ = known.most_common(1)[0]
    cuts = [c for c in cuts if shape_of[c[1].name] == dominant]
    if len(cuts) < n_stages - 1:
        raise ValueError(f"only {len(cuts)} same-shape cut points for "
                         f"{n_stages} stages")

    # balance by cumulative parameter bytes
    def node_bytes(n):
        return sum(np.asarray(v.data.data).nbytes for v in n.inputs
                   if isinstance(v, Constant) and v.data is not None
                   and hasattr(v.data, "data"))

    cum = np.cumsum([node_bytes(n) for n in nodes])
    total = float(cum[-1])
    chosen = []
    ci = 0
    for s in range(1, n_stages):
        target = total * s / n_stages
        while ci < len(cuts) - (n_stages - 1 - s) - 1 \
                and cum[cuts[ci][0]] < target:
            ci += 1
        chosen.append(cuts[ci])
        ci += 1
    bounds = [-1] + [c[0] for c in chosen] + [len(nodes) - 1]
    stage_models = []
    prev_val = model.inputs[0]
    for s in range(n_stages):
        seg = nodes[bounds[s] + 1:bounds[s + 1] + 1]
        out_val = chosen[s][1] if s < n_stages - 1 else model.outputs[0]
        new_nodes, values, vin, vout = _clone_segment(seg, prev_val,
                                                      out_val)
        # the boundary variable needs a shape hint (the schedule's
        # carry is one static shape); intermediates have none, so take
        # the inferred shape
        if getattr(vin, "shape_hint", None) is None:
            vin.shape_hint = shapes.get(prev_val.name)
            vin.dtype_hint = 1  # FLOAT boundary carry
        if is_q:
            sub = QModel(new_nodes, values, [vin], [vout],
                         model.bit_width, model.quant_params,
                         model.quantized_ops)
            sub.requantized_ops = model.requantized_ops
            sub._int8_values = set(model._int8_values)
            # boundary passthrough: interior stages receive/emit the
            # float residual activation EXACTLY as it flows in the
            # unpipelined executor -- no entry quantize, no exit
            # dequantize, no f32 upcast of a bf16 carry
            sub._passthrough_wrap = s > 0
            sub._passthrough_finalize = s < n_stages - 1
        else:
            sub = Model(new_nodes, values, [vin], [vout])
        stage_models.append(sub)
        prev_val = out_val
    return stage_models


def pipeline_forward(stage_models: list, mesh, x, out_shape_dtype,
                     n_microbatches: int, pipe_axis: str = "pipe",
                     as_numpy: bool = True):
    """Run ``x`` through the stages as a GPipe pipeline: ONE
    ``shard_map`` program over ``mesh[pipe_axis]`` where device ``s``
    executes stage ``s`` and ``ppermute`` moves each microbatch's
    activation to the next stage over ICI.

    ``x``: [B, ...] with B divisible by ``n_microbatches``;
    ``out_shape_dtype``: (shape, dtype) of the model output for one
    microbatch (its shape generally differs from the boundary's).
    Returns the stacked [B, ...] output.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    S = mesh.shape[pipe_axis]
    if len(stage_models) != S:
        raise ValueError(f"{len(stage_models)} stages != mesh "
                         f"{pipe_axis} size {S}")
    M = int(n_microbatches)
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M

    # NOTE on PP x TP in ONE program: a partial-manual shard_map
    # (manual over `pipe`, GSPMD over `model`) DEADLOCKS -- the
    # lax.switch branches are per-stage graphs whose GSPMD-inserted TP
    # collectives differ, so devices of different stages block in
    # mismatched rendezvous (measured: collective-permute timeout,
    # 4 of 8 arrive). PP x TP therefore composes as per-stage TP
    # programs on disjoint device rows (:func:`pipeline_forward_stagewise`);
    # this one-program schedule is for UNSHARDED stages.
    fwds = [sm.lowered_fn() for sm in stage_models]
    params = tuple(sm._device_params() for sm in stage_models)
    # boundary shape: stage 1..S-1 inputs (= every stage's output except
    # the last) -- one static carry shape for the whole schedule
    bshape = tuple(int(d) for d in
                   stage_models[1].inputs[0].shape_hint) \
        if S > 1 and stage_models[1].inputs[0].shape_hint is not None \
        else None
    if bshape is None:
        raise ValueError("stage boundary has no shape hint")
    bshape = (mb,) + bshape[1:]
    oshape, odtype = out_shape_dtype
    oshape = (mb,) + tuple(oshape)[1:]

    def stage_branch(s):
        def branch(state, x_mb, params):
            y = fwds[s]([x_mb if s == 0 else state], params[s])[0]
            if s == len(fwds) - 1:
                return jnp.zeros(bshape, state.dtype), y.astype(odtype)
            return y.astype(state.dtype), jnp.zeros(oshape, odtype)
        return branch

    branches = [stage_branch(s) for s in range(S)]
    fwd_perm = [(i, i + 1) for i in range(S - 1)]

    def spmd(xr, params):
        s = jax.lax.axis_index(pipe_axis)

        def step(t, carry):
            state, outs = carry
            mb_idx = t - s
            x_mb = jax.lax.dynamic_index_in_dim(
                xr, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            state_out, y = jax.lax.switch(s, branches, state, x_mb,
                                          params)
            # hand this microbatch's activation to the next stage
            state_next = jax.lax.ppermute(state_out, pipe_axis, fwd_perm)
            valid = (mb_idx >= 0) & (mb_idx < M)
            outs = jnp.where(
                valid & (s == S - 1),
                jax.lax.dynamic_update_index_in_dim(
                    outs, y, jnp.clip(mb_idx, 0, M - 1), 0),
                outs)
            return state_next, outs

        state0 = jnp.zeros(bshape,
                           jnp.result_type(xr.dtype, jnp.float32))
        outs0 = jnp.zeros((M,) + oshape, odtype)
        _, outs = jax.lax.fori_loop(0, M + S - 1, step, (state0, outs0))
        # the finished microbatches live on the LAST device; everyone
        # else holds zeros -- one psum replicates the result
        return jax.lax.psum(
            jnp.where(s == S - 1, outs, jnp.zeros_like(outs)),
            pipe_axis)

    # cache the jitted schedule on the first stage: re-jitting a fresh
    # closure per call would recompile the whole shard_map program
    # every invocation (the exact per-call re-trace cost the cached
    # generate loops eliminated, BENCH_HISTORY round 4)
    key = (mesh, pipe_axis, M, mb, tuple(x.shape[1:]),
           np.dtype(np.asarray(x).dtype if not hasattr(x, "dtype")
                    else x.dtype).name,
           bshape, oshape, np.dtype(odtype).name,
           jax.tree_util.tree_structure(params))
    cache = stage_models[0].__dict__.setdefault("_pipe_jit_cache", {})
    jfn = cache.get(key)
    if jfn is None:
        run = shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), jax.tree_util.tree_map(lambda _: P(), params)),
            out_specs=P(),
            check_rep=False)
        jfn = cache[key] = jax.jit(run)
    xr = jnp.asarray(x).reshape((M, mb) + tuple(x.shape[1:]))
    out = jfn(xr, params)
    out = out.reshape((B,) + tuple(out.shape[2:]))
    return np.asarray(out) if as_numpy else out


def pipeline_forward_stagewise(stage_models: list, mesh, x,
                               n_microbatches: int,
                               pipe_axis: str = "pipe",
                               model_axis: str = "model",
                               rules=None, as_numpy: bool = True):
    """PP x TP: run ``x`` through the stages as a microbatched
    pipeline where stage ``s`` is its OWN tensor-parallel GSPMD
    program on the mesh's pipe-row ``s`` (a ("model",)-submesh of
    ``mesh[pipe_axis] x mesh[model_axis]``).

    Composition rationale: a single shard_map program (manual over
    pipe, GSPMD over model) deadlocks -- each lax.switch branch
    carries a DIFFERENT stage graph whose TP collectives then meet at
    mismatched rendezvous points across stages. Per-stage programs
    have no cross-stage collective at all: activations hop between
    device rows as explicit transfers (ICI on hardware), TP
    psum/all-gather stay INSIDE a row, and JAX's async dispatch keeps
    all rows busy GPipe-style (stage s works on microbatch t while
    stage s+1 works on t-1 -- the calls are queued without host
    syncs, so the fill-drain schedule emerges from data dependencies).

    ``rules(name, ndim) -> PartitionSpec`` applies TP over
    ``model_axis`` inside each stage (e.g. ``gpt_tp_rules``). Returns
    the stacked [B, ...] float output.
    """
    import jax
    from jax.sharding import Mesh as _Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P_

    from .sharding import shard_model

    S = mesh.shape[pipe_axis]
    if len(stage_models) != S:
        raise ValueError(f"{len(stage_models)} stages != mesh "
                         f"{pipe_axis} size {S}")
    M = int(n_microbatches)
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")

    axis_idx = mesh.axis_names.index(pipe_axis)
    dev_rows = np.moveaxis(np.asarray(mesh.devices), axis_idx, 0)
    for s, sm in enumerate(stage_models):
        row = dev_rows[s].reshape(-1)
        if getattr(sm, "mesh", None) is None \
                or tuple(getattr(sm.mesh, "axis_names", ())) \
                != (model_axis,) \
                or list(np.asarray(sm.mesh.devices).reshape(-1)) \
                != list(row):
            submesh = _Mesh(row, (model_axis,))
            shard_model(sm, submesh, data_axis=None, rules=rules)

    mbs = np.split(np.asarray(x), M, axis=0)
    outs = [None] * M
    # issue every call without host syncs: as_numpy=False returns
    # device futures, so stage s+1's call on microbatch t queues
    # behind stage s's -- rows overlap on different microbatches
    for t, xmb in enumerate(mbs):
        h = xmb
        for sm in stage_models:
            # explicit async device-to-device hop onto the next row
            # (ICI transfer on hardware; no host sync)
            h = jax.device_put(h, NamedSharding(sm.mesh, P_()))
            h = sm([h], as_numpy=False)[0]
        outs[t] = h
    out = np.concatenate([np.asarray(o) for o in outs], axis=0) \
        if as_numpy else outs
    return out
