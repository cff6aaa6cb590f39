"""numpy-quant-tpu: TPU-native post-training-quantization + inference.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
tebartsch/numpy-quant: import static-shape ONNX graphs (Opset<=17),
run float32 inference as a single jitted XLA program, calibrate min/max
activation statistics on device, and execute MatMul/Gemm in arbitrary
bit-width integer arithmetic (1-16 bits) with int8/int32 MXU matmuls and
automatic quantize/dequantize insertion at float/int boundaries.
"""
from . import onnx
from .graph import Constant, Node, Value, Variable
from .model import Model, QModel, QuantizationParams
from .quantization import (
    dequantize,
    q_matmul,
    quant_parameters,
    quantize,
    requantize,
)
from .tensor import (
    FTensor,
    ITensor,
    QTensor,
    Tensor,
    concat,
    fconv2d,
    quantize_tensor,
    quantize_tensor_min_max,
    tensor_min_max,
    where,
)

__version__ = "0.1.0"

__all__ = [
    "onnx",
    "Model", "QModel", "QuantizationParams",
    "Constant", "Variable", "Node", "Value",
    "FTensor", "ITensor", "QTensor", "Tensor",
    "quant_parameters", "quantize", "dequantize", "q_matmul", "requantize",
    "quantize_tensor", "quantize_tensor_min_max", "tensor_min_max",
    "concat", "where", "fconv2d",
]
