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
