"""Quantization-aware training (QAT): end-to-end weight fine-tuning
under fake quantization.

The PTQ passes (adaround/gptq/correct_biases) repair each layer in
isolation; QAT instead differentiates THROUGH the whole quantized
forward and lets every weight move to compensate every other layer's
rounding error. The reference framework is PTQ-only
(reference model.py:328-442) -- this is parity-plus surface, and it is
where a functional-transform framework earns its keep on TPU: the
quantized forward is already one traced XLA program, so ``jax.grad``
over it (with straight-through estimators at the rounding points) and
an optax optimizer give QAT with no new executor.

Simulation model (faithful to the integer executor, QModel):

- float graph inputs  -> fake-quant at their calibrated asymmetric
  params (QModel._wrap_input quantizes on entry),
- quantized constants -> fake-quant at the exact (scale, zero_point,
  bit_width) the PTQ pass assigned (incl. per-channel scales and the
  4x-bit-width bias scales s_x*s_w),
- float inputs of quantized ops (MatMul/Gemm/Conv) -> fake-quant at the
  value's calibrated params (QModel's TinyqQuant),
- outputs of requantized ops (Gemm, integer Conv) -> fake-quant with
  requantize's rint-then-clip rounding (QModel._post_node).

MatMul outputs stay exact accumulators in the integer executor, so they
get NO output fake-quant here -- the float product of the fake-quanted
operands IS the dequantized accumulator (up to f32 rounding). Everything
else runs the ordinary float ops on dequantized values, exactly like the
integer executor does. ``fake_quant_forward`` exposes this simulated
forward so tests can pin it against the real QModel.

Straight-through estimator: forward = dequant(quant(x)), gradient =
identity inside the representable range, zero outside (the PyTorch
FakeQuantize convention) -- saturated values stop pulling on the loss.

Deployment contract: quantization params are FROZEN from the initial
calibration (scales trained against == scales served), and the float
model passed in is left untouched -- the tuned weights live only in the
returned QModel. Compose as
``model.qat_quantize(...)`` -> ``optimize()`` -> ``pack_weights()``.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Constant, Variable
from .model import Model, QModel
from .quantization import qrange
from .tensor import FTensor, ITensor, QTensor


def _fq(x, scale, zero_point, bit_width: int, rint_first: bool = False):
    """Fake-quantize ``x``: forward dequant(quant(x)), straight-through
    gradient (identity inside the representable range, zero outside).

    ``rint_first`` selects requantize's rint-then-clip rounding
    (quantization.py:187-200) instead of quantize's clip-then-rint
    (quantization.py:96-106); they differ only at the saturation
    boundary, matched anyway for faithfulness.
    """
    lo, hi = qrange(bit_width)
    s = jnp.asarray(scale, jnp.float32)
    # scale 0 = a constant-valued tensor (quant_parameters errstate
    # comment): the integer path degenerates to exactly that constant,
    # so pass it through un-fake-quanted instead of dividing by zero
    degenerate = s == 0
    s = jnp.where(degenerate, jnp.float32(1.0), s)
    zp = jnp.float32(0.0) if zero_point is None \
        else jnp.asarray(zero_point, jnp.float32)
    if rint_first:
        # requantize path multiplies by the reciprocal (inv_scale * x)
        q = jnp.clip(jnp.rint(x * (jnp.float32(1.0) / s) + zp), lo, hi)
    else:
        q = jnp.rint(jnp.clip(x / s + zp, lo, hi))
    dq = (q - zp) * s
    # representable float range: gradient passes only where x would not
    # saturate
    lo_val = (jnp.float32(lo) - zp) * s
    hi_val = (jnp.float32(hi) - zp) * s
    passthrough = jnp.where((x >= lo_val) & (x <= hi_val), x,
                            jax.lax.stop_gradient(x))
    y = passthrough + jax.lax.stop_gradient(dq - passthrough)
    return jnp.where(degenerate, x, y)


class _FakeQuantModel(Model):
    """Float executor with fake-quantization at the integer executor's
    quantize points. BORROWS the float model's graph: its __del__ must
    not break the node<->value links the real owner still uses."""

    def __init__(self, float_model: Model, qref: QModel):
        super().__init__(float_model.nodes, float_model.values,
                         float_model.inputs, float_model.outputs)
        self.bit_width = qref.bit_width
        self.quant_params = qref.quant_params
        self.quantized_ops = qref.quantized_ops
        self.requantized_ops = qref.requantized_ops
        # name -> (scale, zero_point, bit_width) for every float constant
        # the PTQ pass quantized (weights, biases, quantized scalars)
        self._const_fq: dict[str, tuple] = {}
        qvals = {v.name: v for v in qref.values}
        for value in float_model.values:
            if not isinstance(value, Constant) \
                    or not isinstance(value.data, FTensor):
                continue
            qv = qvals.get(value.name)
            if isinstance(qv, Constant) and isinstance(qv.data, QTensor):
                qt = qv.data
                self._const_fq[value.name] = (qt.scale, qt.zero_point,
                                              qt.bit_width)

    def __del__(self):
        pass  # graph owned by the float model

    def _wrap_input(self, array, variable: Variable):
        t = super()._wrap_input(np.asarray(array) if isinstance(
            array, np.ndarray) else array, variable)
        if isinstance(t, FTensor):
            qp = self.quant_params[variable.name]
            return FTensor(_fq(t.data, qp.scale, qp.zero_point,
                               self.bit_width))
        return t

    def _wrap_input_traced(self, array, variable: Variable):
        if hasattr(array, "dtype") and array.dtype == jnp.float32:
            qp = self.quant_params[variable.name]
            return FTensor(_fq(jnp.asarray(array), qp.scale, qp.zero_point,
                               self.bit_width))
        return super()._wrap_input_traced(array, variable)

    def _wrap_constant(self, value: Constant, params: dict):
        t = super()._wrap_constant(value, params)
        fq = self._const_fq.get(value.name)
        if fq is not None and isinstance(t, FTensor):
            scale, zp, bw = fq
            host = getattr(t, "host", None)
            t = FTensor(_fq(t.data, scale, zp, bw))
            if host is not None:
                t.host = host  # shape-domain shadow (trace-time reads)
        return t

    def _node_inputs(self, node, data, timings):
        ins = super()._node_inputs(node, data, timings)
        if node.op not in self.quantized_ops:
            return ins
        out = []
        for v, t in zip(node.inputs, ins):
            # constants were fake-quanted at wrap time (at their own,
            # possibly 4x-bit-width/per-channel params); only live float
            # values quantize on the fly (QModel._node_inputs TinyqQuant)
            if t is not None and isinstance(t, FTensor) \
                    and not isinstance(v, Constant):
                qp = self.quant_params[v.name]
                t = FTensor(_fq(t.data, qp.scale, qp.zero_point,
                                self.bit_width))
            out.append(t)
        return out

    def _post_node(self, node, outputs):
        if node.op in self.requantized_ops:
            qp = self.quant_params[node.outputs[0].name]
            outputs = [FTensor(_fq(t.data, qp.scale, qp.zero_point,
                                   self.bit_width, rint_first=True))
                       for t in outputs]
        return outputs


def fake_quant_forward(model: Model, qref: QModel,
                       inputs: list[np.ndarray]) -> list[np.ndarray]:
    """Run the fake-quant simulation of ``qref`` on ``inputs`` (debug /
    test hook: its outputs track ``qref(inputs)`` up to f32-vs-integer
    accumulation rounding)."""
    fqm = _FakeQuantModel(model, qref)
    arrays = [np.asarray(a) for a in inputs]
    input_tensors = {v.name: fqm._wrap_input(a, v)
                     for a, v in zip(arrays, fqm.inputs)}
    data = fqm._forward(input_tensors, fqm._placed_params())
    return [np.asarray(fqm._finalize_output(data[o.name]))
            for o in fqm.outputs]


def qat_quantize(model: Model, inputs: list[np.ndarray], *,
                 steps: int = 200, lr: float = 1e-4,
                 labels: np.ndarray = None,
                 loss_fn: Callable = None,
                 train_filter: Callable[[str], bool] = None,
                 calibration_mode: str = "auto",
                 verbose: bool = False,
                 **quantize_kw) -> QModel:
    """Fine-tune ``model``'s weights under fake quantization, then
    quantize with the SAME frozen calibration params. Returns the QModel
    of the tuned weights (with a ``qat_loss_history`` attribute); the
    float model is left untouched.

    Loss (in priority order): ``loss_fn(outputs)`` -> scalar on the
    traced output list; else cross-entropy of ``outputs[0]`` against
    integer ``labels``; else self-distillation -- normalized MSE against
    the float model's own outputs on ``inputs`` (QAT with no labels:
    the calibration batch is the training set, the float model the
    teacher).

    ``train_filter(name) -> bool`` restricts which quantized constants
    train (default: all of them). ``quantize_kw`` is forwarded to
    :meth:`Model.quantize` (bit_width, weight_bit_width,
    per_channel_weights, quantize_conv, percentile, ...).
    """
    import optax

    arrays = [np.asarray(a) for a in inputs]
    stats = model.calibration_stats(
        arrays, mode=calibration_mode,
        percentile=quantize_kw.get("percentile"))
    qref = model.quantize(stats=stats, **quantize_kw)
    fqm = _FakeQuantModel(model, qref)

    if loss_fn is None and labels is None:
        teacher = [jnp.asarray(o) for o in model(arrays)]

        def loss_fn(outs):
            total = jnp.float32(0.0)
            for o, t in zip(outs, teacher):
                total += jnp.mean((o - t) ** 2) \
                    / (jnp.mean(t * t) + jnp.float32(1e-8))
            return total
    elif loss_fn is None:
        y = jnp.asarray(np.asarray(labels))

        def loss_fn(outs):
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                outs[0], y))

    # trainable = the fake-quanted float constants; everything else
    # (shape-domain constants, host ITensors) stays frozen
    all_params = dict(fqm._device_params())
    # zero-scale constants are degenerate (all-equal payloads, e.g.
    # fresh LayerNorm biases): deployment re-quantizes them with the
    # FROZEN zero scale whatever training does, so they must not train
    names = [n for n in all_params
             if n in fqm._const_fq
             and np.all(np.asarray(fqm._const_fq[n][0]) != 0)
             and (train_filter is None or train_filter(n))]
    trainable = {n: jnp.asarray(all_params[n], jnp.float32) for n in names}
    frozen = {n: a for n, a in all_params.items() if n not in trainable}

    # int64 inputs are shape-domain: bound as static constants of the
    # training step (Model.__call__'s jit contract, model.py:304-348)
    int_idx = {i for i, a in enumerate(arrays) if a.dtype == np.int64}
    float_args = [jnp.asarray(a) for i, a in enumerate(arrays)
                  if i not in int_idx]

    def forward(params, fargs):
        fa = iter(fargs)
        input_tensors = {}
        for i, variable in enumerate(fqm.inputs):
            if i in int_idx:
                input_tensors[variable.name] = ITensor(arrays[i])
            else:
                input_tensors[variable.name] = fqm._wrap_input_traced(
                    next(fa), variable)
        data = fqm._forward(input_tensors, params)
        return [fqm._finalize_output(data[o.name]) for o in fqm.outputs]

    def loss_of(tr, fr, fargs):
        return loss_fn(forward({**fr, **tr}, fargs))

    # Adam + best-loss parameter tracking: STE training on coarse grids
    # is noisy (the loss can bounce a whole rounding level late in
    # training), so deploy the best iterate, not the last
    opt = optax.adam(lr)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(tr, fr, opt_state, fargs):
        loss, grads = jax.value_and_grad(loss_of)(tr, fr, fargs)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(tr, updates), opt_state, loss

    history = []
    best = (np.inf, trainable)
    for i in range(int(steps)):
        new_trainable, opt_state, loss = step(trainable, frozen, opt_state,
                                              float_args)
        loss = float(loss)  # loss is at the PRE-update params
        if loss < best[0]:
            best = (loss, trainable)
        trainable = new_trainable
        history.append(loss)
        if verbose and (i % 50 == 0 or i == steps - 1):
            print(f"qat step {i}: loss {loss:.6g}")
    trainable = best[1]

    # re-quantize the tuned weights with the frozen stats; the float
    # model's own payloads are restored whatever happens
    saved = {}
    try:
        for name, arr in trainable.items():
            for value in model.values:
                if value.name == name:
                    saved[name] = value.data
                    value.data = FTensor(jnp.asarray(arr, jnp.float32))
                    break
        qmodel = model.quantize(stats=stats, **quantize_kw)
    finally:
        for name, data in saved.items():
            for value in model.values:
                if value.name == name:
                    value.data = data
                    break
    qmodel.qat_loss_history = np.asarray(history, np.float32)
    return qmodel
