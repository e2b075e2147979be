"""Fused Pallas IMDCT kernel vs the XLA path (interpret mode on CPU), and
the CodecConfig(use_pallas=True) decode integration."""

import numpy as np
import pytest

from glc_tpu.ops.mdct import get_mdct_tables, imdct
from glc_tpu.ops.pallas_kernels import imdct_fused


@pytest.fixture(scope="module")
def tables():
    return get_mdct_tables(1024, 2048)


def test_imdct_fused_matches_xla(tables):
    rng = np.random.default_rng(1)
    B = 256
    coeffs = rng.standard_normal((B, 1024)).astype(np.float32) * 0.1
    ref = np.asarray(imdct(coeffs, tables.cos_table, tables.norm))
    ref = ref * np.asarray(tables.window)

    out = imdct_fused(
        coeffs, tables.cos_table, tables.window,
        np.float32(tables.norm), tile_b=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_imdct_fused_rejects_ragged_batch(tables):
    with pytest.raises(ValueError):
        imdct_fused(
            np.zeros((100, 1024), np.float32), tables.cos_table,
            tables.window, np.float32(tables.norm), tile_b=256,
            interpret=True,
        )


def test_use_pallas_decode_end_to_end():
    """CodecConfig(use_pallas=True) must decode to the same waveform as the
    XLA path within the documented ULP tolerance."""
    import sys

    sys.path.insert(0, "tests")
    from utils import generate_sine_wave

    from glc_tpu import Decoder, Encoder
    from glc_tpu.config import CodecConfig

    s = generate_sine_wave(440.0, 44100, 1, 0.5)
    ea = Encoder(44100).encode(s, 1)
    out_xla = Decoder(1, 44100).decode(ea)
    out_pal = Decoder(1, 44100, config=CodecConfig(use_pallas=True)).decode(ea)
    assert len(out_pal) == len(out_xla)
    np.testing.assert_allclose(out_pal, out_xla, atol=3e-6, rtol=3e-5)
