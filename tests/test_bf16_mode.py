"""Low-precision float mode: bf16 float segments between int8 matmuls
(serving speed mode). Quant math stays float32, so accuracy degradation
is below int8 quantization noise."""
import numpy as np

import numpy_quant_tpu as nq
from numpy_quant_tpu import config
from numpy_quant_tpu.models import vit as V

RNG = np.random.default_rng(0)


def test_bf16_quantized_vit_accuracy():
    m = V.vit(4, 32, 8, 24, 16, 4)
    x = RNG.normal(size=(4, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    f = model([x])[0]
    qmodel = model.quantize([x], bit_width=8)
    q32 = qmodel([x])[0]

    with config.low_precision_floats():
        qmodel._jit_cache.clear()
        qbf = qmodel([x])[0]
    qmodel._jit_cache.clear()

    assert qbf.dtype == np.float32  # outputs come back f32
    err32 = np.mean(np.abs(q32 - f))
    errbf = np.mean(np.abs(qbf - f))
    assert errbf <= max(2.5 * err32, 0.1), (errbf, err32)


def test_bf16_mode_restores_config():
    import jax.numpy as jnp
    assert config.float_dtype == jnp.float32
    with config.low_precision_floats():
        assert config.float_dtype == jnp.bfloat16
    assert config.float_dtype == jnp.float32
