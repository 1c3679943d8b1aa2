"""Pallas TPU kernels for the hottest predicates.

Layout insight: boards are tiny (R*C ≈ 100 cells) but the batch is huge, so
the TPU-friendly layout puts the **batch on the lane dimension** (last dim,
128-wide) and board cells on sublanes — every shifted-equality comparison
then runs across 128 boards per VPU op.  XLA's default [B, R, C] layout puts
C (≈10) on lanes and wastes >90% of each vector op.

`batched_has_any_line` is the cascade-loop predicate (`has_any_line`,
`board.py`-level "are there matches?") in this layout.  SURVEY §7 marks
Pallas as optional ("only if profiling warrants"); XLA already exceeds the
throughput target, so these kernels are opt-in
(`TMT_USE_PALLAS=1`) and serve as the template for fusing more of the step.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

USE_PALLAS = os.environ.get("TMT_USE_PALLAS", "0") == "1"


def _lines_kernel(R, C, TB, col_ref, out_ref):
    x = col_ref[:].reshape(R, C, TB)
    h = (
        (x[:, :-2, :] == x[:, 1:-1, :])
        & (x[:, 1:-1, :] == x[:, 2:, :])
        & (x[:, :-2, :] > 0)
    )
    v = (
        (x[:-2, :, :] == x[1:-1, :, :])
        & (x[1:-1, :, :] == x[2:, :, :])
        & (x[:-2, :, :] > 0)
    )
    any_line = jnp.any(h, axis=(0, 1)) | jnp.any(v, axis=(0, 1))
    out_ref[0, :] = any_line.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_has_any_line(colour_brc: jnp.ndarray, interpret: bool = False):
    """bool[B]: any >=3 same-colour run per board.

    colour_brc: i32[B, R, C]; B is padded internally to a lane multiple.
    """
    B, R, C = colour_brc.shape
    TB = 128
    Bp = ((B + TB - 1) // TB) * TB
    # [R*C, Bp] — batch on lanes
    col_t = jnp.transpose(colour_brc.reshape(B, R * C)).astype(jnp.int32)
    col_t = jnp.pad(col_t, ((0, 0), (0, Bp - B)))

    out = pl.pallas_call(
        functools.partial(_lines_kernel, R, C, TB),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        grid=(Bp // TB,),
        in_specs=[pl.BlockSpec((R * C, TB), lambda i: (0, i))],
        out_specs=pl.BlockSpec((1, TB), lambda i: (0, i)),
        interpret=interpret,
    )(col_t)
    return out[0, :B] > 0
