"""Pallas fused kernels vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

from glc_tpu.ops.mdct import get_mdct_tables, mdct, imdct
from glc_tpu.ops.pallas_kernels import imdct_fused, mdct_fused


@pytest.fixture(scope="module")
def tables():
    return get_mdct_tables(1024, 2048)


def test_mdct_fused_matches_xla(tables):
    rng = np.random.default_rng(0)
    B = 512
    blocks = rng.standard_normal((B, 2048)).astype(np.float32) * 0.2
    win = blocks * tables.window
    ref = np.asarray(mdct(win, tables.cos_table, tables.norm))
    ref_scale = np.maximum(np.abs(ref).max(axis=-1), 1e-10)

    coeffs, scale = mdct_fused(
        blocks, tables.cos_table, tables.window,
        np.float32(tables.norm), tile_b=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(coeffs), ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(scale), ref_scale, rtol=2e-5)


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


def test_mdct_fused_rejects_ragged_batch(tables):
    with pytest.raises(ValueError):
        mdct_fused(
            np.zeros((100, 2048), np.float32), tables.cos_table,
            tables.window, np.float32(tables.norm), tile_b=256,
            interpret=True,
        )
