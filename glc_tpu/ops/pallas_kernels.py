"""Pallas TPU kernel for the decode-side hot op.

The XLA path (ops/mdct.py) is already matmul-shaped; this kernel fuses the
synthesis window into the IMDCT matmul so the [B, 2n] block tensor never
round-trips HBM between the matmul and the elementwise multiply.  The 8 MB
cosine table stays resident in VMEM across a grid of frame tiles, each tile
streaming through the MXU.

Measured on a v5e (B=8192 rows, 30-iteration mean):
  * imdct+window: XLA 2.77 ms → pallas 2.01 ms  (−27%, kept — wired into
    the decode path behind ``CodecConfig(use_pallas=True)``)
  * an equivalent fused mdct+window+scale encode kernel measured 2.58 ms
    vs XLA's 2.29 ms (XLA's own fusion already wins) and was deleted.

Numerics: f32 matmul at Precision.HIGHEST (without it Mosaic lowers the
operands to bf16 on the MXU — 2e-3 error; with it the kernel matches the
XLA path within ~5e-7).  Accumulation order still differs by ULPs from the
XLA einsum, which is why ``use_pallas`` defaults to False: the f32 decode
output stays bit-identical across code paths unless explicitly opted in.

Falls back to interpret mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
