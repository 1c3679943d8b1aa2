"""Pallas kernels vs their XLA counterparts (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.ops.lines import has_any_line
from tile_match_tpu.ops.pallas_kernels import batched_has_any_line


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("shape", [(5, 5), (10, 10), (7, 4)])
def test_batched_has_any_line(seed, shape):
    rng = np.random.default_rng(seed)
    B = [1, 13, 130][seed % 3]
    colours = rng.integers(1, 4, size=(B, *shape)).astype(np.int32)
    # force some boards line-free by alternating pattern
    alt = (
        2 - ((np.arange(shape[0])[:, None] % 2) == (np.arange(shape[1])[None, :] % 2))
    ).astype(np.int32)
    colours[0] = alt
    cfg = EnvConfig(shape[0], shape[1], 4, 10)
    want = np.asarray(
        jax.vmap(lambda c: has_any_line(cfg, c, None))(colours)
    )
    got = np.asarray(batched_has_any_line(colours, interpret=True))
    assert np.array_equal(got, want)
    assert not got[0]
