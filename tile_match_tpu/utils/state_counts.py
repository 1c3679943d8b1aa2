"""State-space enumeration — batched on device.

Counterpart of ``utils/utils.py:6-31`` in the reference, which enumerates all
colours^(R*C) boards and checks each one in a multiprocessing pool.  Here the
validity predicate (no colour lines + at least one effective move) is a
vmapped kernel evaluated over enumerated boards in large device batches —
the per-board check that dominates the reference (O(actions) njit sweeps)
becomes one batched mask kernel.

Known counts (reference `utils/utils.py:41-53`), used as regression oracle:
(3,3,2): 94/102 · (3,3,3): 5250/9750 · (4,3,2): 378/378 ·
(4,3,3) & (5,3,3): 158052/180870 · (3,2,2): 0/36 · (3,2,3): 0/576.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..ops.effective import effective_mask
from ..ops.lines import has_any_line


@functools.lru_cache(maxsize=None)
def _batch_check(cfg: EnvConfig):
    def one(colour):
        kind = jnp.ones_like(colour)
        no_lines = ~has_any_line(cfg, colour, kind)
        has_move = effective_mask(cfg, colour, kind).any()
        return no_lines & has_move, no_lines

    return jax.jit(jax.vmap(one))


def is_valid_states(cfg: EnvConfig, colours: np.ndarray):
    """colours: i32[B, R, C] → (valid&movable[B], no_lines[B])."""
    fn = _batch_check(cfg)
    a, b = fn(jnp.asarray(colours, jnp.int32))
    return np.asarray(a), np.asarray(b)


def compute_num_states(
    num_rows: int,
    num_cols: int,
    num_colours: int,
    batch_size: int = 1 << 14,
    num_moves: int = 10,
):
    """(#boards with no lines and a possible move, #boards with no lines).

    Enumerates colours^(R*C) boards in device batches; base-K digits are
    generated directly from the flat index (no host-side product() blowup).
    """
    cfg = EnvConfig(num_rows, num_cols, num_colours, num_moves)
    flat = num_rows * num_cols
    total = num_colours**flat
    n_move, n_nolines = 0, 0
    powers = num_colours ** np.arange(flat, dtype=np.int64)
    for start in range(0, total, batch_size):
        idx = np.arange(start, min(start + batch_size, total), dtype=np.int64)
        digits = (idx[:, None] // powers[None, :]) % num_colours
        colours = (digits + 1).astype(np.int32).reshape(-1, num_rows, num_cols)
        a, b = is_valid_states(cfg, colours)
        n_move += int(a.sum())
        n_nolines += int(b.sum())
    return n_move, n_nolines


def get_tabular_obs(board: np.ndarray, num_moves_left: int) -> tuple:
    """Hashable tabular key: flattened board + moves left.

    The reference's version (`utils/utils.py:28-31`) returns the wrong
    variable (the raw board instead of the flattened tuple) — fixed here.
    """
    flat = np.asarray(board).flatten().tolist()
    flat.append(int(num_moves_left))
    return tuple(flat)


if __name__ == "__main__":
    print(compute_num_states(3, 3, 2))
