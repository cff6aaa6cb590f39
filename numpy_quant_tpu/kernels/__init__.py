"""Native kernel layer (Pallas; the reference's NumPy-C substrate rebuilt
for TPU): sub-byte packing, fused packed matmul, elementwise q/dq."""
from .elementwise import dequantize_pallas, quantize_pallas
from .pack import (
    pack_bitplanes,
    pack_splitk,
    unpack_bitplanes,
    unpack_splitk,
)
from .qmatmul import packed_qmatmul, splitk_qmatmul

__all__ = [
    "pack_bitplanes", "unpack_bitplanes", "pack_splitk", "unpack_splitk",
    "packed_qmatmul", "splitk_qmatmul",
    "quantize_pallas", "dequantize_pallas",
]
