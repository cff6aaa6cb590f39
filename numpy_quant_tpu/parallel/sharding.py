"""Sharding rules: how model parameters and activations map onto a mesh.

Tensor-parallel rules follow the Megatron pattern for transformer
blocks: QKV/intermediate weights column-sharded, attention-output/MLP-
output weights row-sharded, so each block needs exactly one
reduce(-scatter)/all-gather pair, inserted automatically by XLA GSPMD
from these annotations.
"""
from __future__ import annotations

import re

import numpy as np
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
    Unmatched parameters are replicated. The BERT text graphs
    (models/text.py) emit the same ``.query/.key/.value/.attention.
    output/.intermediate/.output`` naming, so these rules cover both
    encoder families."""
    for pattern, spec in _VIT_TP_PATTERNS:
        if pattern.search(name):
            return spec(ndim)
    return P()


# GPT decoder (models/gpt.py): merged-QKV c_attn and the vocab-parallel
# LM head column-shard; the c_proj projections row-shard. GSPMD handles
# the Split over the column-sharded 3H axis by resharding -- identical
# values, the collectives just move (Megatron interleaves the merged
# QKV shards instead; with GSPMD annotations that is a layout choice,
# not a correctness one).
_GPT_TP_PATTERNS = [
    (re.compile(r"\.attn\.c_attn\.weight$"), lambda nd: P(None, "model")),
    (re.compile(r"\.attn\.c_attn\.bias$"), lambda nd: P("model")),
    (re.compile(r"\.attn\.c_proj\.weight$"), lambda nd: P("model", None)),
    (re.compile(r"\.mlp\.c_fc\.weight$"), lambda nd: P(None, "model")),
    (re.compile(r"\.mlp\.c_fc\.bias$"), lambda nd: P("model")),
    (re.compile(r"\.mlp\.c_proj\.weight$"), lambda nd: P("model", None)),
    (re.compile(r"^lm_head\.weight_t$"), lambda nd: P(None, "model")),
]


def gpt_tp_rules(name: str, ndim: int) -> P:
    """PartitionSpec for a GPT (models/gpt.py) parameter name under the
    'model' axis. Unmatched parameters are replicated."""
    for pattern, spec in _GPT_TP_PATTERNS:
        if pattern.search(name):
            return spec(ndim)
    return P()


# LLaMA decoder (models/llama.py): Megatron column/row split of the
# separate q/k/v + SwiGLU gate/up projections and the vocab-parallel LM
# head. Grouped-query attention changes nothing for GSPMD correctness
# (annotations never change values); for a balanced layout keep
# tp <= num_key_value_heads so each device holds whole kv heads.
# RMSNorm weights and the RoPE cos/sin tables replicate.
_LLAMA_TP_PATTERNS = [
    (re.compile(r"\.(q_proj|k_proj|v_proj)\.weight_t$"),
     lambda nd: P(None, "model")),
    (re.compile(r"\.o_proj\.weight_t$"), lambda nd: P("model", None)),
    (re.compile(r"\.(gate_proj|up_proj)\.weight_t$"),
     lambda nd: P(None, "model")),
    (re.compile(r"\.down_proj\.weight_t$"), lambda nd: P("model", None)),
    (re.compile(r"^lm_head\.weight_t$"), lambda nd: P(None, "model")),
]


def llama_tp_rules(name: str, ndim: int) -> P:
    """PartitionSpec for a LLaMA (models/llama.py) parameter name under
    the 'model' axis. Unmatched parameters are replicated."""
    for pattern, spec in _LLAMA_TP_PATTERNS:
        if pattern.search(name):
            return spec(ndim)
    return P()


def param_shardings(model, mesh: Mesh, rules=None) -> dict:
    """NamedSharding per device parameter of a Model.

    ``rules(name, ndim) -> PartitionSpec``; None means fully replicated.

    Packed weight payloads ((planes, colsum) tuples) shard over the
    OUTPUT-CHANNEL axis when the rule column-shards the logical [K, N]
    weight: N is the last axis of both packed layouts (split-K
    uint8[KR, N], bit-planes uint8[b, K/8, N]) and of the [1, N]
    colsum, so each device stores only its slice of the sub-byte
    payload. Row-(K-)sharded weights use the STACKED layout
    ([S, KR_local, N], one independently packed row group per device --
    QModel.pack_weights re-packs per shard): the leading axis shards
    over the model axis, the global colsum replicates.
    """
    from ..graph import Constant
    from ..tensor import PackedQTensor

    packed = {}
    for v in getattr(model, "values", []):
        if isinstance(v, Constant) and isinstance(v.data, PackedQTensor):
            packed[v.name] = v.data

    def fits(spec, shape):
        """A spec only applies when every sharded dim divides evenly;
        otherwise the parameter replicates (e.g. a vocab-50 lm_head
        under tp=4 -- GSPMD would reject the placement outright)."""
        for dim, ax in zip(shape, tuple(spec)):
            if ax is None:
                continue
            axes = (ax,) if isinstance(ax, str) else tuple(ax)
            size = int(np.prod([mesh.shape[a] for a in axes]))
            if dim % size:
                return False
        return True

    out = {}
    for name, arr in model._device_params().items():
        if isinstance(arr, tuple):  # (planes, colsum) packed payload
            pq = packed.get(name)
            spec = rules(name, 2) if rules is not None else P()
            parts = tuple(spec)
            # PartitionSpec entries bind to LEADING axes: a full-rank
            # (None, axis) spec is column-sharding; a short P(axis)
            # binds axis 0 (row-sharding) and must replicate
            if pq is not None and pq.layout == "splitk_stacked":
                row_ax = parts[0] if parts else None
                out[name] = (
                    NamedSharding(mesh, P(row_ax, None, None)),
                    NamedSharding(mesh, P()),
                )
                continue
            col_sharded = (pq is not None and len(parts) == 2
                           and parts[0] is None and parts[1] is not None)
            if col_sharded:
                ax = parts[-1]
                planes_nd = len(pq.planes.shape)
                out[name] = (
                    NamedSharding(mesh, P(*([None] * (planes_nd - 1)), ax)),
                    NamedSharding(mesh, P(None, ax)),
                )
            else:
                out[name] = (NamedSharding(mesh, P()),
                             NamedSharding(mesh, P()))
            continue
        spec = rules(name, arr.ndim) if rules is not None else P()
        if not fits(spec, arr.shape):
            spec = P()
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
    model._shard_rules = rules
    model.parameter_shardings = param_shardings(model, mesh, rules)
    # a model executed before sharding holds compiled unsharded
    # programs, placed parameters and device-resident embedding tables
    # (utils.generate._placed_table) -- drop them so every later call
    # recompiles/replaces against the new mesh
    model._jit_cache.clear()
    model._sharded_param_cache = None
    model.__dict__.pop("_table_cache", None)
