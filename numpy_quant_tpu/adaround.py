"""AdaRound: adaptive weight rounding (Nagel et al., arXiv:2004.10568).

The PTQ pass rounds every weight to its NEAREST quantization level
(rint); AdaRound instead learns each element's rounding direction
(floor vs ceil) by minimizing the layer's output reconstruction error
on calibration data -- rounding-to-nearest is optimal per weight, not
per layer output. Classic gains show up at low weight bit widths (W4),
where rounding error dominates.

Implementation follows the paper's relaxation: a per-element variable
``V`` with the rectified sigmoid ``h(V) = clip(1.2 sigmoid(V) - .1, 0, 1)``
is added to ``floor(W/s)``; the loss is the layer's output MSE plus an
annealed regularizer ``sum(1 - |2 h - 1|^beta)`` pushing ``h`` binary
(beta 20 -> 2). ``h`` initializes to the true fractional remainder, so
optimization starts from a zero-reconstruction-error soft weight.
Layers optimize independently with Adam (optax) on the float
calibration activations, exactly as the paper's per-layer variant.

This is parity-plus: the reference has no accuracy passes beyond
min/max PTQ (reference model.py:328-442). Compose as
``quantize -> adaround -> [correct_biases] -> optimize -> pack_weights``
(packed payloads are rebuilt from the tuned integers by pack_weights).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Constant
from .quantization import qrange
from .tensor import QTensor


def _rect_sigmoid(v):
    return jnp.clip(jax.nn.sigmoid(v) * 1.2 - 0.1, 0.0, 1.0)


def adaround_qmodel(qmodel, float_model, inputs, iters: int = 400,
                    lr: float = 1e-2, reg: float = 0.01,
                    max_rows: int = 2048) -> int:
    """Tune the rounding of every 2-D symmetric MatMul/Gemm weight in
    ``qmodel`` against ``float_model``'s activations on the calibration
    ``inputs``. Mutates the quantized payloads in place; returns the
    number of tuned weights. Call BEFORE pack_weights()."""
    import optax

    from .utils.parity import record_all_values

    f_acts = record_all_values(float_model, inputs)
    f_consts = {v.name: v for v in float_model.values
                if isinstance(v, Constant)}

    tuned = 0
    for node in qmodel.nodes:
        if node.op not in ("MatMul", "Gemm") or len(node.inputs) < 2:
            continue
        w = node.inputs[1]
        if not isinstance(w, Constant) or not isinstance(w.data, QTensor):
            continue
        qt = w.data
        if qt.zero_point is not None:
            continue  # weights quantize symmetric (PTQ invariant)
        fsrc = f_consts.get(w.name)
        if fsrc is None or not hasattr(fsrc.data, "data"):
            continue
        W = np.asarray(fsrc.data.data, np.float32)
        if W.ndim != 2:
            continue
        xname = node.inputs[0].name
        if xname not in f_acts:
            continue
        X = np.asarray(f_acts[xname], np.float32)
        if X.ndim < 2:
            continue
        transb = node.op == "Gemm" and bool(node.attrs.get("transB"))
        k = W.shape[1] if transb else W.shape[0]
        if X.shape[-1] != k:
            continue
        X = X.reshape(-1, k)
        if X.shape[0] > max_rows:
            X = X[:: X.shape[0] // max_rows + 1]

        # per-channel scales broadcast along the stored layout's output
        # axis: MatMul rhs [K, N] -> axis 1; Gemm transB [N, K] -> axis 0
        s = np.asarray(qt.scale, np.float32)
        if s.ndim > 0:
            s = s.reshape((1, -1) if not transb else (-1, 1))
        lo, hi = qrange(qt.bit_width)

        Xd = jnp.asarray(X)
        Wd = jnp.asarray(W)
        sd = jnp.asarray(s, jnp.float32)
        ratio = Wd / sd
        base = jnp.floor(ratio)
        frac = jnp.clip(ratio - base, 1e-4, 1 - 1e-4)
        # h(V0) == frac: start at the zero-error soft weight
        v0 = -jnp.log(1.2 / (frac + 0.1) - 1.0)
        y_ref = Xd @ (Wd.T if transb else Wd)
        lam = np.float32(reg) * jnp.mean(y_ref * y_ref)

        def loss(v, beta):
            h = _rect_sigmoid(v)
            wq = sd * jnp.clip(base + h, lo, hi)
            y = Xd @ (wq.T if transb else wq)
            recon = jnp.mean((y - y_ref) ** 2)
            r = jnp.mean(1.0 - jnp.abs(2.0 * h - 1.0) ** beta)
            return recon + lam * r

        opt = optax.adam(lr)
        state = opt.init(v0)
        grad = jax.jit(jax.value_and_grad(loss))

        v = v0
        for i in range(int(iters)):
            beta = jnp.float32(20.0 - (20.0 - 2.0) * i / max(iters - 1, 1))
            _, g = grad(v, beta)
            updates, state = opt.update(g, state)
            v = optax.apply_updates(v, updates)

        h_bin = (_rect_sigmoid(v) > 0.5).astype(jnp.float32)
        q = np.asarray(jnp.clip(base + h_bin, lo, hi))
        container = np.asarray(qt.data).dtype
        w.data = QTensor(jnp.asarray(q.astype(container)), qt.bit_width,
                         qt.scale, None)
        tuned += 1

    if tuned:
        qmodel._dp_cache = None
        qmodel._sharded_param_cache = None
        qmodel._jit_cache.clear()
    return tuned
