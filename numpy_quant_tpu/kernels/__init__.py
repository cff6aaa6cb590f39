from .elementwise import dequantize_pallas, quantize_pallas
from .pack import pack_bitplanes, unpack_bitplanes
from .qmatmul import packed_qmatmul

__all__ = [
    "pack_bitplanes", "unpack_bitplanes", "packed_qmatmul",
    "quantize_pallas", "dequantize_pallas",
]
