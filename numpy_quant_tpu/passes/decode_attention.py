"""Decode-form attention fusion: the KV-cache step graph's
scores_past/scores_self/Concat/.../Softmax/Slice/ctx chain becomes ONE
``DecodeAttention`` node.

Why this pass exists (round-4 VERDICT item 1): at the [B, 1, H] decode
shape every score/context MatMul has ONE query row, so XLA lowers each
as a VPU multiply-reduce kernel, and the integer path additionally
re-reduces the WHOLE K/V cache every step for the asymmetric
zero-point-correction sums (q_matmul, reference
numpy_quant/numpy_quantization.py:58-60) -- measured ~104
reduce-shaped kernels and ~3.3 ms/step of a 4.2 ms step at
hidden-2048/batch-64. The fused op computes the chain in FLOAT with
the cache dequantize fused into the dot operands (one multiply-reduce
per dot, no correction sums, the int8 cache bytes stream straight from
HBM), which measures ~41 us/layer at the same shape.

Numerics: every QUANTIZATION the unfused executor applies is replayed
value-for-value (fake-quant of q and the probabilities with the SAME
calibrated params, dequantize of int8 cache entries, the PTQ-rounded
scale constant, the quantized mask input); only the dot products
themselves run in f32 instead of exact integers, so results are
ulp-equal rather than bit-identical (float sums associate
differently). Token equality on the trained fixture and tight allclose
parity are asserted in tests/test_decode_attention.py.

Pattern (models/gpt.py _decode_attention; llama/t5/whisper emit the
same shape, with RoPE/GQA upstream of qh/kh and an optional
score-bias Add):

    s_past = MatMul(qh, Transpose(k_cache))        [B,H,1,L]
    s_self = MatMul(qh, Transpose(kh))             [B,H,1,1]
    s      = Concat(s_past, s_self, axis=-1)
    ... Mul(scalar) / Add(mask-or-bias) chain ...
    probs  = Softmax(..., axis=-1)
    p_past = Slice(probs, 0, L, -1); p_self = Slice(probs, L, L+1, -1)
    ctx    = Add(MatMul(p_past, v_cache), Mul(p_self, vh))
"""
from __future__ import annotations

import numpy as np

from ..graph import Constant, Node
from .toolkit import consumers as _consumers, producer_map


def _slice_bounds(node, producer):
    """(start, end, axis) of a Slice with 1-element integer constant
    operands (initializer Constants or Constant-node outputs), or
    None."""
    if node.op != "Slice" or len(node.inputs) < 4:
        return None
    vals = []
    for v in node.inputs[1:4]:
        arr = None
        nd = producer.get(v.name)
        if nd is not None and nd.op == "Constant":
            arr = np.asarray(nd.attrs.get("value"))
        elif isinstance(v, Constant) and v.data is not None:
            arr = np.asarray(v.data.data if hasattr(v.data, "data")
                             else v.data)
        elif getattr(v, "data", None) is not None:
            arr = np.asarray(v.data.data if hasattr(v.data, "data")
                             else v.data)
        if arr is None or arr.size != 1 \
                or not np.issubdtype(arr.dtype, np.integer):
            return None
        vals.append(int(arr.reshape(-1)[0]))
    return tuple(vals)


def _scalar_const(value, producer):
    """Scalar payload of an initializer Constant or a Constant NODE's
    output, seen through PTQ quantization (the executor would
    dequantize a quantized scalar -- replay that exactly)."""
    nd = producer.get(value.name)
    if nd is not None and nd.op == "Constant":
        arr = np.asarray(nd.attrs.get("value"))
        return float(arr.reshape(-1)[0]) if arr.size == 1 else None
    if not isinstance(value, Constant) or value.data is None:
        return None
    d = value.data
    arr = np.asarray(d.data)
    if arr.size != 1:
        return None
    x = float(arr.reshape(-1)[0])
    from ..tensor import QTensor
    if isinstance(d, QTensor):
        if d.zero_point is not None:
            x -= float(np.asarray(d.zero_point).reshape(-1)[0])
        x *= float(np.float32(d.scale))
    return x


def fuse_decode_attention(model) -> int:
    """Fuse decode-step attention chains into DecodeAttention nodes.
    Works on float models and QModels; returns the number fused."""
    producer = producer_map(model)
    qp_map = getattr(model, "quant_params", None)

    def consumers(value):
        return _consumers(model, value)

    def qp_attr(value):
        if qp_map is None:
            return None
        p = qp_map.get(value.name)
        if p is None or p.scale is None \
                or getattr(p.scale, "ndim", 0) > 0:
            return None
        return (float(np.float32(p.scale)),
                None if p.zero_point is None else int(p.zero_point))

    fused = 0
    for sm in [n for n in model.nodes if n.op == "Softmax"]:
        if int(sm.attrs.get("axis", -1)) != -1:
            continue
        # walk the elementwise epilogue chain up to the Concat
        epilogue = []       # applied in forward order after reversal
        extra_inputs = []
        cur = sm.inputs[0]
        chain_nodes = []
        concat = None
        for _ in range(6):
            nd = producer.get(cur.name)
            if nd is None:
                break
            if nd.op == "Concat":
                concat = nd
                break
            if nd.op == "Mul":
                sc = _scalar_const(nd.inputs[1], producer)
                if sc is None:
                    sc = _scalar_const(nd.inputs[0], producer)
                    other = nd.inputs[1]
                else:
                    other = nd.inputs[0]
                if sc is None:
                    break
                epilogue.append(("mul", sc))
                chain_nodes.append(nd)
                cur = other
                continue
            if nd.op == "Add":
                # additive mask / score-bias operand rides as an extra
                # fused-node input (graph input or constant)
                other, operand = nd.inputs[0], nd.inputs[1]
                if producer.get(other.name) is None \
                        and not isinstance(other, Constant) \
                        and (producer.get(operand.name) is not None
                             or isinstance(operand, Constant)):
                    other, operand = operand, other
                epilogue.append(("add", len(extra_inputs)))
                extra_inputs.append(operand)
                chain_nodes.append(nd)
                cur = other
                continue
            break
        if concat is None or len(concat.inputs) != 2 \
                or int(concat.attrs.get("axis", 0)) != -1:
            continue
        epilogue.reverse()

        sp_nd = producer.get(concat.inputs[0].name)
        ss_nd = producer.get(concat.inputs[1].name)
        if sp_nd is None or ss_nd is None \
                or sp_nd.op != "MatMul" or ss_nd.op != "MatMul":
            continue
        if sp_nd.inputs[0] is not ss_nd.inputs[0]:
            continue                      # both dots share q
        qh = sp_nd.inputs[0]
        ktc_nd = producer.get(sp_nd.inputs[1].name)
        kts_nd = producer.get(ss_nd.inputs[1].name)
        if ktc_nd is None or kts_nd is None \
                or ktc_nd.op != "Transpose" or kts_nd.op != "Transpose" \
                or list(ktc_nd.attrs.get("perm", [])) != [0, 1, 3, 2] \
                or list(kts_nd.attrs.get("perm", [])) != [0, 1, 3, 2]:
            continue
        k_cache, kh = ktc_nd.inputs[0], kts_nd.inputs[0]

        # probs consumers: the two slices
        cons = consumers(sm.outputs[0])
        if len(cons) != 2:
            continue
        b0, b1 = (_slice_bounds(cons[0], producer),
                  _slice_bounds(cons[1], producer))
        if b0 is None or b1 is None:
            continue
        if b0[0] == 0:
            past_sl, self_sl = cons[0], cons[1]
            pb, sb = b0, b1
        else:
            past_sl, self_sl = cons[1], cons[0]
            pb, sb = b1, b0
        L = pb[1]
        if pb != (0, L, -1) or sb[0] != L or sb[2] != -1 \
                or sb[1] <= L:
            continue
        pc = consumers(past_sl.outputs[0])
        sc_ = consumers(self_sl.outputs[0])
        if len(pc) != 1 or len(sc_) != 1:
            continue
        mm2, mulc = pc[0], sc_[0]
        if mm2.op != "MatMul" or mm2.inputs[0] is not past_sl.outputs[0]:
            continue
        if mulc.op != "Mul":
            continue
        v_cache = mm2.inputs[1]
        vh = mulc.inputs[1] if mulc.inputs[0] is self_sl.outputs[0] \
            else mulc.inputs[0]
        ac = consumers(mm2.outputs[0])
        mc = consumers(mulc.outputs[0])
        if len(ac) != 1 or len(mc) != 1 or ac[0].op != "Add" \
                or ac[0] is not mc[0]:
            continue
        add = ac[0]

        # single-consumer discipline on every interior value
        interior = [sp_nd, ss_nd, ktc_nd, kts_nd, concat, sm,
                    past_sl, self_sl, mm2, mulc] + chain_nodes
        ok = True
        for nd in interior:
            if nd in (sm,):               # probs fan out to the slices
                continue
            for out in nd.outputs:
                if len(consumers(out)) != 1:
                    ok = False
        if not ok:
            continue

        attrs = {"epilogue": tuple(epilogue), "cache_len": int(L)}
        if qp_map is not None:
            attrs["bit_width"] = int(model.bit_width)
        for key, val in (("q_qp", qp_attr(qh)),
                         ("ktc_qp", qp_attr(ktc_nd.outputs[0])),
                         ("kts_qp", qp_attr(kts_nd.outputs[0])),
                         ("p_qp", qp_attr(past_sl.outputs[0])),
                         ("vc_qp", qp_attr(v_cache))):
            if val is not None:
                attrs[key] = val
        fnode = Node(f"{add.name}/decode_attention", "DecodeAttention",
                     attrs,
                     [qh, k_cache, kh, v_cache, vh] + extra_inputs,
                     [add.outputs[0]])
        idx = model.nodes.index(add)
        model.nodes[idx] = fnode
        for nd in interior:
            if nd in model.nodes:
                model.nodes.remove(nd)
        producer[fnode.outputs[0].name] = fnode
        fused += 1
    if fused:
        model._jit_cache.clear()
    return fused
