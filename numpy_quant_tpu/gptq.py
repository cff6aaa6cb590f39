"""GPTQ: Hessian-guided sequential weight quantization
(Frantar et al., arXiv:2210.17323).

Rounding each weight to its nearest level ignores how the layer's
OUTPUT moves; GPTQ quantizes the contraction (K) axis sequentially and,
after fixing each slice, updates the not-yet-quantized remainder to
absorb the error, weighted by the inverse Hessian of the layer
reconstruction loss (H = 2 X^T X on the calibration activations). The
classic formulation processes columns of W^T; for this framework's
``y = X @ W`` (W stored [K, N]) that is rows of W.

Like ``adaround``, this is a calibration-time weight-only accuracy
pass: same quantization grid (symmetric, per-tensor or per-channel
scales), different integers. Compose
``quantize -> gptq | adaround -> correct_biases -> optimize ->
pack_weights``. Parity-plus: the reference has only min/max PTQ
(reference model.py:328-442).
"""
from __future__ import annotations

import numpy as np

from .graph import Constant
from .quantization import qrange
from .tensor import QTensor


def _gptq_rows(W: np.ndarray, X: np.ndarray, scale: np.ndarray,
               lo: int, hi: int, percdamp: float) -> np.ndarray:
    """Quantize W [K, N] for y = X @ W, X [M, K]. ``scale`` broadcasts
    against W ([1, N] per-channel or scalar). Returns integer levels
    [K, N] in [lo, hi]. Runs in float64 numpy: a calibration-time
    solve, not a serving path."""
    k = W.shape[0]
    H = 2.0 * (X.T @ X).astype(np.float64)
    # dampen: keeps the Cholesky well-posed for rank-deficient X
    damp = percdamp * float(np.mean(np.diag(H)))
    H[np.diag_indices(k)] += max(damp, 1e-8)
    # upper Cholesky factor of H^{-1} (Hinv = U^T U): its rows drive
    # the sequential conditioning, exactly as in the paper's algorithm
    Hinv = np.linalg.inv(H)
    U = np.linalg.cholesky(Hinv).T
    Wf = W.astype(np.float64).copy()
    Q = np.zeros_like(Wf)
    s = np.broadcast_to(np.asarray(scale, np.float64), (1, W.shape[1]))
    for i in range(k):
        d = U[i, i]
        q = np.clip(np.rint(Wf[i] / s[0]), lo, hi)
        Q[i] = q
        err = (Wf[i] - q * s[0]) / d
        if i + 1 < k:
            Wf[i + 1:] -= np.outer(U[i, i + 1:], err)
    return Q


def gptq_qmodel(qmodel, float_model, inputs, percdamp: float = 0.01,
                max_rows: int = 4096) -> int:
    """Requantize every 2-D symmetric MatMul/Gemm weight in ``qmodel``
    with GPTQ against ``float_model``'s activations on the calibration
    ``inputs``. Same (scale, bit_width) grid, Hessian-guided integers.
    Mutates payloads in place; call BEFORE pack_weights(). Returns the
    number of requantized weights."""
    from .utils.parity import record_all_values

    f_acts = record_all_values(float_model, inputs)
    f_consts = {v.name: v for v in float_model.values
                if isinstance(v, Constant)}

    import jax.numpy as jnp

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
        transb = node.op == "Gemm" and bool(node.attrs.get("transB"))
        k = W.shape[1] if transb else W.shape[0]
        if X.ndim < 2 or X.shape[-1] != k:
            continue
        X = X.reshape(-1, k)
        if X.shape[0] > max_rows:
            X = X[:: X.shape[0] // max_rows + 1]
        lo, hi = qrange(qt.bit_width)
        s = np.asarray(qt.scale, np.float32).reshape(-1)
        if transb:
            # stored [N, K]: solve in the [K, N] orientation
            Q = _gptq_rows(W.T, X, s, lo, hi, percdamp).T
        else:
            Q = _gptq_rows(W, X, s, lo, hi, percdamp)
        container = np.asarray(qt.data).dtype
        w.data = QTensor(jnp.asarray(Q.astype(container)), qt.bit_width,
                         qt.scale, None)
        tuned += 1

    if tuned:
        qmodel._dp_cache = None
        qmodel._sharded_param_cache = None
        qmodel._jit_cache.clear()
    return tuned
