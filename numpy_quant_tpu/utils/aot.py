"""AOT deployment artifacts: serialize the COMPILED model program.

``save_qmodel`` (utils/serialization.py) persists graph + payloads and
needs this framework to serve again. This module persists the other
half of the deployment story: the traced-and-lowered XLA program
itself, via ``jax.export`` (StableHLO serialization). The artifact is
a single ``.npz`` holding

* the serialized Exported program (every executor decision -- int8
  dataflow, fused attention Pallas kernels, packed sub-byte payload
  UNPACKING, requantize epilogues -- is baked into the StableHLO), and
* the parameter arrays it takes as arguments (params stay ARGUMENTS,
  not embedded constants, so the program body stays small and params
  remain swappable, the same rule all jitted paths in this repo
  follow).

Loading needs jax + numpy only -- no ONNX import, no graph IR, no
calibration state: ``load_compiled(path)`` returns a plain callable.
Cross-platform: pass ``platforms=("cpu", "tpu")`` at save to lower for
both (ahead-of-time -- a TPU does not need to be attached to export
for one).

The reference framework has no deployment surface at all (quantized
state lives only in process memory, reference model.py:441-442);
parity-plus.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = "nq_aot_v1"


def save_compiled(model, path: str, example_inputs: list,
                  platforms=None) -> None:
    """Export ``model``'s lowered program at the example inputs'
    shapes/dtypes and write program + params to ``path`` (.npz).
    ``platforms``: e.g. ``("cpu", "tpu")`` for a multi-platform
    artifact; default = the current backend only."""
    fwd = model.lowered_fn()
    # params may be pytrees (packed payloads are plane tuples): export
    # over the flat leaves; the treedef is static structure and closes
    # over into the traced program
    leaves, treedef = jax.tree_util.tree_flatten(model._device_params())

    def fn(inputs, leaves):
        return fwd(list(inputs),
                   jax.tree_util.tree_unflatten(treedef, list(leaves)))

    args = tuple(jnp.asarray(a) for a in example_inputs)
    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jax.export.export(jax.jit(fn), **kw)(
        args, tuple(jnp.asarray(l) for l in leaves))
    blob = np.frombuffer(exported.serialize(), dtype=np.uint8)
    np.savez(path, __magic__=np.array(_MAGIC),
             __exported__=blob,
             **{f"p:{i:05d}": np.asarray(l) for i, l in enumerate(leaves)})


def load_compiled(path: str):
    """Load an artifact written by :func:`save_compiled`. Returns
    ``fn(inputs: list) -> list`` that runs the deserialized program
    with the stored params -- no Model/QModel, no graph, no ONNX."""
    z = np.load(path, allow_pickle=False)
    if "__magic__" not in z or str(z["__magic__"]) != _MAGIC:
        raise ValueError(f"{path} is not a {_MAGIC} artifact")
    exported = jax.export.deserialize(z["__exported__"].tobytes())
    leaves = tuple(z[k] for k in sorted(k for k in z.files
                                        if k.startswith("p:")))

    def fn(inputs: list):
        args = tuple(jnp.asarray(a) for a in inputs)
        return [np.asarray(o) for o in exported.call(args, leaves)]

    return fn


def save_decode_loop(step_model, path: str, wte, wpe,
                     example_prompt, max_new_tokens: int,
                     platforms=None, key=None, **gen_kw) -> None:
    """Export the WHOLE autoregressive decode loop -- prefill
    (teacher-forced) + generation, the same one-program lax.fori_loop
    :func:`utils.generate.generate_kv` compiles -- as a StableHLO
    artifact with the step model's params and embedding tables stored
    beside it.

    The serving deployment analogue of :func:`save_compiled`: a host
    with jax + numpy alone loads it and decodes -- no graph IR, no
    calibration state, no generation code. The prompt SHAPE and
    ``max_new_tokens`` are baked (static decode program), the prompt
    VALUES and the PRNG key are runtime arguments.

    ``gen_kw`` are generate_kv's knobs (temperature/top_k/top_p/min_p/
    repetition_penalty/kv_cache_dtype/rope/score_bias).
    """
    from .generate import _kv_loop_key, _placed_table, generate_kv

    example_prompt = np.asarray(example_prompt)
    batch, t0 = example_prompt.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    # build + cache the loop program (also a correctness smoke run)
    generate_kv(step_model, example_prompt, wte, wpe, max_new_tokens,
                key=key, **gen_kw)
    ck = _kv_loop_key(batch, t0, max_new_tokens,
                      gen_kw.get("kv_cache_dtype"), gen_kw.get("rope"),
                      gen_kw.get("temperature"), gen_kw.get("top_k"),
                      gen_kw.get("top_p"), gen_kw.get("min_p"),
                      gen_kw.get("repetition_penalty"))
    run_jit = step_model._jit_cache[ck]

    rope = gen_kw.get("rope")
    tables = (
        _placed_table(step_model, "wte", wte),
        _placed_table(step_model, "wpe", wpe),
        None if rope is None else _placed_table(step_model, "rope_cos",
                                                rope[0]),
        None if rope is None else _placed_table(step_model, "rope_sin",
                                                rope[1]),
        _placed_table(step_model, "score_bias",
                      gen_kw.get("score_bias")),
        None,  # memory: seq2seq decode artifacts are not supported here
    )
    params = step_model._device_params()
    leaves, ptree = jax.tree_util.tree_flatten((params, tables))

    def fn(prompt, leaves, key):
        params, tables = jax.tree_util.tree_unflatten(ptree, list(leaves))
        return run_jit(prompt, params, *tables, key)

    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jax.export.export(jax.jit(fn), **kw)(
        jnp.asarray(example_prompt, jnp.int32),
        tuple(jnp.asarray(l) for l in leaves), key)
    blob = np.frombuffer(exported.serialize(), dtype=np.uint8)
    np.savez(path, __magic__=np.array(_MAGIC + ":decode"),
             __exported__=blob,
             **{f"p:{i:05d}": np.asarray(l) for i, l in enumerate(leaves)})


def load_decode_loop(path: str):
    """Load a :func:`save_decode_loop` artifact. Returns
    ``fn(prompt_ids, key=None) -> ids`` running the full decode loop
    with the stored params/tables (numpy in, numpy out)."""
    z = np.load(path, allow_pickle=False)
    if "__magic__" not in z or str(z["__magic__"]) != _MAGIC + ":decode":
        raise ValueError(f"{path} is not a {_MAGIC}:decode artifact")
    exported = jax.export.deserialize(z["__exported__"].tobytes())
    leaves = tuple(z[k] for k in sorted(k for k in z.files
                                        if k.startswith("p:")))

    def fn(prompt_ids, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        out = exported.call(jnp.asarray(prompt_ids, jnp.int32),
                            leaves, key)
        return np.asarray(out)

    return fn
