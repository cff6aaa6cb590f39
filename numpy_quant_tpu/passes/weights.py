"""Weight-storage passes: packed sub-byte HBM layout and integer-domain
bias shifting (shared by the PTQ accuracy passes)."""
from __future__ import annotations

import numpy as np

from ..graph import Constant
from ..tensor import QTensor


def pack_weights(model) -> int:
    """Host-eager wrapper: packing reads every payload eagerly (RPC per
    weight on a remote-attached chip otherwise). See
    :func:`_pack_weights_impl`."""
    from ..config import host_eager
    with host_eager():
        return _pack_weights_impl(model)


def _pack_weights_impl(model) -> int:
    """Switch 2-D symmetric MatMul weights to packed storage
    (kernels/pack.py; split-K layout for bits 1/2/4/8, bit-planes for
    odd widths): exactly bit_width bits per value in HBM. Returns the
    number of packed weights.

    Under a tensor-parallel mesh, a weight the sharding rules
    row-(K-)shard re-packs per device into the stacked layout
    (tensor.pack_qtensor shards=...), so TP memory scales for
    row-sharded payloads too instead of silently replicating."""
    from ..tensor import pack_qtensor

    def _row_shards(name: str) -> int:
        """Mesh size of the model axis if the rules row-shard this 2-D
        weight, else 1."""
        rules = getattr(model, "_shard_rules", None)
        if model.mesh is None or rules is None:
            return 1
        m_ax = getattr(model, "model_axis", "model")
        if m_ax not in model.mesh.axis_names or model.mesh.shape[m_ax] < 2:
            return 1
        parts = tuple(rules(name, 2))
        if parts and parts[0] == m_ax \
                and all(p is None for p in parts[1:]):
            return model.mesh.shape[m_ax]
        return 1

    packed = 0
    for value in model.values:
        if not isinstance(value, Constant) \
                or not isinstance(value.data, QTensor):
            continue
        qt = value.data
        if qt.zero_point is not None or np.asarray(qt.data).ndim != 2:
            continue
        if qt.bit_width > 8:
            continue
        # only weights consumed exclusively as MatMul rhs
        if not value.outputs or not all(
                n.op in ("MatMul", "MatMulSplit") and len(n.inputs) > 1
                and n.inputs[1] is value for n in value.outputs):
            continue
        shards = _row_shards(value.name) if qt.bit_width in (1, 2, 4, 8) \
            else 1
        value.data = pack_qtensor(qt, shards=shards)
        packed += 1
    model._jit_cache.clear()
    model._sharded_param_cache = None
    model._dp_cache = None
    if packed and model.mesh is not None:
        # refresh shardings: packed payloads column-shard over the model
        # axis where the logical weight did (parallel/sharding)
        from ..parallel.sharding import param_shardings
        model.parameter_shardings = param_shardings(
            model, model.mesh, getattr(model, "_shard_rules", None))
    return packed


def shift_q_bias(value: Constant, corr: np.ndarray) -> int:
    """Subtract a per-channel float correction from a quantized bias
    Constant, in its integer domain: q -= rint(corr / scale), clipped
    to the bias bit range. Returns 1 if applied, 0 if skipped."""
    import jax.numpy as jnp

    from ..quantization import qrange

    qt = value.data
    scale = np.asarray(qt.scale, np.float32).reshape(-1)
    arr = np.asarray(qt.data)
    if corr.shape != arr.shape or np.any(scale == 0):
        return 0
    delta = np.rint(corr / scale.astype(np.float64))
    if not np.all(np.isfinite(delta)):
        return 0
    lo, hi = qrange(qt.bit_width)
    newq = np.clip(arr - delta, lo, hi).astype(arr.dtype)
    value.data = QTensor(jnp.asarray(newq), qt.bit_width, qt.scale,
                         qt.zero_point)
    return 1
