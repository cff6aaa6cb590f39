"""Horizontal matmul merge pass: MatMuls sharing one activation input
become ONE wide MXU dot plus in-graph splitting (the ViT Q/K/V
projection pattern). Regime-gated by QModel.optimize() on measured
evidence: it pays at tensor-parallel per-device widths, not at full
single-chip width (BENCH_HISTORY.md round 3)."""
from __future__ import annotations

import numpy as np

from ..graph import Constant, Node
from ..tensor import QTensor


def merge_parallel_matmuls(model) -> int:
    """Horizontally fuse MatMul nodes that share the same activation
    input into ONE wide dot (weights concatenated along the
    output-channel axis) plus in-graph splitting -- the ViT Q/K/V
    projection pattern. One MXU dot of [M, K] x [K, 3N] replaces three
    [M, K] x [K, N] dots: the wider N feeds the 128x128 systolic array
    better and the activation tile is read once instead of three times.

    Bit-identical: the merged weight carries a per-column scale vector,
    each output column's dequantize multiplies by the SAME f32 scale as
    before, and the per-segment output slices carry the original scalar
    qparams -- every downstream f32 op is unchanged (asserted in
    tests/test_kernels.py).

    Returns the number of merged groups.
    """
    from ..model import QuantizationParams

    # group mergeable MatMuls by their shared activation value
    groups: dict[int, list[Node]] = {}
    order = {id(n): i for i, n in enumerate(model.nodes)}
    for node in model.nodes:
        if node.op != "MatMul" or len(node.inputs) != 2:
            continue
        w = node.inputs[1]
        if not isinstance(w, Constant) or not isinstance(w.data, QTensor):
            continue
        qt = w.data
        if np.asarray(qt.data).ndim != 2 or qt.zero_point is not None:
            continue
        if getattr(qt.scale, "ndim", 0) > 0:
            continue  # per-channel weights: scales are already vectors
        if len(w.outputs) != 1:
            continue  # weight shared by several nodes: leave alone
        groups.setdefault(id(node.inputs[0]), []).append(node)

    merged = 0
    for nodes in groups.values():
        nodes = [n for n in nodes
                 if np.asarray(n.inputs[1].data.data).shape[0]
                 == np.asarray(nodes[0].inputs[1].data.data).shape[0]
                 and n.inputs[1].data.bit_width
                 == nodes[0].inputs[1].data.bit_width]
        if len(nodes) < 2:
            continue
        nodes.sort(key=lambda n: order[id(n)])
        x_val = nodes[0].inputs[0]
        weights = [n.inputs[1].data for n in nodes]
        segs = [int(np.asarray(w.data).shape[1]) for w in weights]
        seg_scales = [float(np.float32(w.scale)) for w in weights]
        wdata = np.concatenate([np.asarray(w.data) for w in weights],
                               axis=1)
        scale_vec = np.concatenate(
            [np.full((1, s), np.float32(sc), np.float32)
             for s, sc in zip(segs, seg_scales)], axis=1)
        bw = weights[0].bit_width
        mname = f"{nodes[0].name}/merged_w"
        mconst = Constant(mname, [], QTensor(wdata, bw, scale_vec, None))
        model.quant_params[mname] = QuantizationParams(scale_vec, None)

        fnode = Node(f"{nodes[0].name}/merged", "MatMulSplit",
                     {"segments": segs, "segment_scales": seg_scales,
                      # original weight initializer names, so export_qdq
                      # can re-slice per-initializer int8 payloads out
                      # of the merged tensor
                      "source_weights": [n.inputs[1].name
                                         for n in nodes]},
                     [x_val, mconst],
                     [n.outputs[0] for n in nodes])
        mconst.outputs = [fnode]
        # splice: new node at the first group member's position
        idx = model.nodes.index(nodes[0])
        model.nodes[idx] = fnode
        for n in nodes[1:]:
            model.nodes.remove(n)
        # relink values
        x_val.outputs = [fnode if n in nodes else n for n in x_val.outputs]
        x_val.outputs = list(dict.fromkeys(x_val.outputs))
        for n in nodes:
            old_w = n.inputs[1]
            if old_w in model.values:
                model.values.remove(old_w)
            n.outputs[0].inputs = [fnode]
        model.values.append(mconst)
        merged += 1

    if merged:
        if "MatMulSplit" not in model.quantized_ops:
            model.quantized_ops = tuple(model.quantized_ops) \
                + ("MatMulSplit",)
        model._jit_cache.clear()
        model._dp_cache = None
        model._sharded_param_cache = None
        if model.mesh is not None:
            # merged '<node>/merged_w' params inherit the SOURCE
            # weights' sharding rule (the group shares one spec -- Q/K/V
            # all column-shard), then refresh the shardings
            rules = getattr(model, "_shard_rules", None)
            if rules is not None:
                src_of = {}
                for node in model.nodes:
                    if node.op == "MatMulSplit" \
                            and "source_weights" in node.attrs:
                        src_of[node.inputs[1].name] = \
                            node.attrs["source_weights"][0]

                def rules2(name, ndim, _orig=rules, _map=src_of):
                    return _orig(_map.get(name, name), ndim)

                model._shard_rules = rules2
            from ..parallel.sharding import param_shardings
            model.parameter_shardings = param_shardings(
                model, model.mesh, getattr(model, "_shard_rules", None))
    return merged
