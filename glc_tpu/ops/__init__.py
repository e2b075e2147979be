"""Device-side numeric kernels (JAX/XLA/Pallas) for the GLC codec."""

from .mdct import MdctTables, get_mdct_tables
from .psycho import PerceptualTables, get_perceptual_tables
from .encode import encode_chunk_device
from .decode import decode_chunk_device

__all__ = [
    "MdctTables",
    "get_mdct_tables",
    "PerceptualTables",
    "get_perceptual_tables",
    "encode_chunk_device",
    "decode_chunk_device",
]
