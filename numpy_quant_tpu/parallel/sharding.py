"""Sharding rules: how model parameters and activations map onto a mesh.

Tensor-parallel rules follow the Megatron pattern for transformer
blocks: QKV/intermediate weights column-sharded, attention-output/MLP-
output weights row-sharded, so each block needs exactly one
reduce(-scatter)/all-gather pair, inserted automatically by XLA GSPMD
from these annotations.
"""
from __future__ import annotations

import re

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (regex on parameter/value name, PartitionSpec factory given ndim)
_VIT_TP_PATTERNS = [
    # fused qkv / q / k / v projections: [H, H'] column-sharded
    (re.compile(r"\.(query|key|value)\.weight_t$"), lambda nd: P(None, "model")),
    (re.compile(r"\.(query|key|value)\.bias$"), lambda nd: P("model")),
    # attention output projection: [H', H] row-sharded
    (re.compile(r"\.attention\.output\.weight_t$"), lambda nd: P("model", None)),
    # MLP up-projection: [H, I] column-sharded
    (re.compile(r"\.intermediate\.weight_t$"), lambda nd: P(None, "model")),
    (re.compile(r"\.intermediate\.bias$"), lambda nd: P("model")),
    # MLP down-projection: [I, H] row-sharded
    (re.compile(r"(encoder\.layer\.\d+)\.output\.weight_t$"),
     lambda nd: P("model", None)),
]


def vit_tp_rules(name: str, ndim: int) -> P:
    """PartitionSpec for a ViT parameter name under the 'model' axis.
    Unmatched parameters are replicated."""
    for pattern, spec in _VIT_TP_PATTERNS:
        if pattern.search(name):
            return spec(ndim)
    return P()


def param_shardings(model, mesh: Mesh, rules=None) -> dict:
    """NamedSharding per device parameter of a Model.

    ``rules(name, ndim) -> PartitionSpec``; None means fully replicated.
    """
    out = {}
    for name, arr in model._device_params().items():
        if isinstance(arr, tuple):  # packed weight payloads: replicate
            spec = P()
        else:
            spec = rules(name, arr.ndim) if rules is not None else P()
        out[name] = NamedSharding(mesh, spec)
    return out


def shard_model(model, mesh: Mesh, data_axis: str | None = "data",
                rules=None) -> None:
    """Attach a mesh + shardings to a Model: float inputs batch-shard
    over ``data_axis``, parameters shard per ``rules``. The jitted
    executor places arrays accordingly and XLA GSPMD inserts the
    collectives (psum/all-gather over ICI)."""
    model.mesh = mesh
    model.data_axis = data_axis
    model.parameter_shardings = param_shardings(model, mesh, rules)
