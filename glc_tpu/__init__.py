"""glc_tpu — TPU-native gapless lossy codec framework.

A from-scratch JAX/XLA/Pallas rebuild of the `gapless-lossy-codec` Rust crate
(reference: /root/reference, surveyed in SURVEY.md).  The public API mirrors the
reference library facade (reference src/lib.rs:1-5 re-exports `codec::*` and the
`audio`/`flac` modules):

    from glc_tpu import Encoder, Decoder, save_encoded, load_encoded
    from glc_tpu import audio, flac

Compute path (MDCT / psychoacoustic masking / quantization / IMDCT /
overlap-add / FLAC fixed predictors + Rice parameter estimation) runs on TPU as
batched XLA/Pallas kernels over a frame-major layout; bit-exact container and
bitstream writers run on host (numpy vectorized + native C++).
"""

from .config import CodecConfig, DEFAULT_CONFIG
from .container.schema import (
    AudioHeader,
    GaplessInfo,
    EncodedFrame,
    EncodedAudio,
    Progress,
    AudioChunk,
)
from .container.bincode import save_encoded, load_encoded, serialize_encoded, deserialize_encoded
from .codec.encoder import Encoder
from .codec.decoder import Decoder

__version__ = "0.1.0"

__all__ = [
    "CodecConfig",
    "DEFAULT_CONFIG",
    "AudioHeader",
    "GaplessInfo",
    "EncodedFrame",
    "EncodedAudio",
    "Progress",
    "AudioChunk",
    "save_encoded",
    "load_encoded",
    "serialize_encoded",
    "deserialize_encoded",
    "Encoder",
    "Decoder",
]
