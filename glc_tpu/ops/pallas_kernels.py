"""Pallas TPU kernels for the codec's hot ops.

The XLA path (ops/mdct.py) is already matmul-shaped; these kernels fuse the
surrounding elementwise work into the matmul so intermediate tensors
(windowed blocks, dense |coeffs|) never round-trip HBM:

* `mdct_fused` — window · MDCT-matmul · per-row abs-max scale in one pass.
  The 8 MB cosine table stays resident in VMEM across a grid of frame tiles,
  each tile streaming [TILE_B, 2N] samples through the MXU.

Numerics: f32 matmuls at Precision.HIGHEST (without it Mosaic lowers the
operands to bf16 on the MXU — 2e-3 error; with it the kernels match the XLA
path within ~5e-7).  Accumulation order still differs by ULPs from the XLA
einsum, so these kernels are standalone (exercised by tests and benchmarks,
not wired into the container pipeline) to keep byte-level determinism of
.glc output across code paths; the XLA path remains the production default.

Falls back to interpret mode on CPU (tests run there).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mdct_kernel(x_ref, table_ref, window_ref, norm_ref, coeffs_ref, scale_ref):
    """One grid step: [TILE_B, 2n] samples → [TILE_B, n] coeffs + row scale.

    Mirrors reference src/codec.rs:358-374 (dot products × norm) fused with
    the windowing of codec.rs:477-481 and the scale reduction of
    codec.rs:488.
    """
    win = x_ref[:] * window_ref[:]
    coeffs = jax.lax.dot_general(
        win, table_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * norm_ref[0]
    coeffs_ref[:] = coeffs
    scale_ref[:] = jnp.maximum(
        jnp.max(jnp.abs(coeffs), axis=-1, keepdims=True),
        np.float32(1e-10),
    )


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def mdct_fused(
    blocks2d: jnp.ndarray,   # [B, 2n] f32 un-windowed rows (B % tile_b == 0)
    cos_table: jnp.ndarray,  # [n, 2n] f32
    window: jnp.ndarray,     # [2n] f32
    norm: jnp.ndarray,       # scalar f32
    *,
    tile_b: int = 128,
    interpret: bool = False,
):
    """Fused window+MDCT+scale over a batch of rows.

    Returns (coeffs [B, n] f32, scale [B] f32).  VMEM budget per step:
    8 MB table + tile_b·(2n·4 + n·4) ≈ 8 MB + 1.5 MB at tile_b=128 plus
    double-buffering — inside the ~16 MB/core VMEM (256 exceeds it).
    """
    B, frame = blocks2d.shape
    n = cos_table.shape[0]
    if B % tile_b != 0:
        raise ValueError(f"B={B} not a multiple of tile_b={tile_b}")

    grid = (B // tile_b,)
    coeffs, scale = pl.pallas_call(
        _mdct_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, frame), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, frame), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * frame,
            bytes_accessed=(B * frame + n * frame + B * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(blocks2d, cos_table, window, jnp.reshape(norm, (1,)))
    return coeffs, scale.reshape(B)


def _imdct_kernel(c_ref, table_ref, window_ref, norm_ref, out_ref):
    """[TILE_B, n] coeffs → windowed [TILE_B, 2n] blocks
    (reference src/codec.rs:376-391 fused with the synthesis window of
    codec.rs:672-675)."""
    out = jax.lax.dot_general(
        c_ref[:], table_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * norm_ref[0]
    out_ref[:] = out * window_ref[:]


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def imdct_fused(
    coeffs2d: jnp.ndarray,   # [B, n] f32
    cos_table: jnp.ndarray,  # [n, 2n] f32
    window: jnp.ndarray,     # [2n] f32
    norm: jnp.ndarray,
    *,
    tile_b: int = 128,
    interpret: bool = False,
):
    """Fused IMDCT+window.  Returns windowed blocks [B, 2n] f32."""
    B, n = coeffs2d.shape
    frame = cos_table.shape[1]
    if B % tile_b != 0:
        raise ValueError(f"B={B} not a multiple of tile_b={tile_b}")

    grid = (B // tile_b,)
    return pl.pallas_call(
        _imdct_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, frame), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, frame), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, frame), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * frame,
            bytes_accessed=(B * n + n * frame + B * frame) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coeffs2d, cos_table, window, jnp.reshape(norm, (1,)))
