"""On-device (compiled, non-interpret) parity check for the fused cascade.

pytest pins itself to CPU (tests/conftest.py) so the COMPILED Pallas kernel
cannot run under the suite; this standalone tool claims the real TPU and
asserts `fused_cascade` ≡ `cascade_reference` bit-for-bit on random batches
(boards, eliminations, trip counts, truncation flags), plus the fused
batched step ≡ vmap(engine.step) over a short rollout.

Usage:  python tools/tpu_parity_check.py   (exit 0 = parity holds)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

from tile_match_tpu.config import EnvConfig  # noqa: E402
from tile_match_tpu.engine import step  # noqa: E402
from tile_match_tpu.envs.batched import batched_reset  # noqa: E402
from tile_match_tpu.envs.fused import batched_step_fused  # noqa: E402
from tile_match_tpu.ops.pallas_cascade import (  # noqa: E402
    cascade_reference,
    fused_cascade,
)


def check_cascade(seed: int, B: int, R: int, C: int, K: int) -> None:
    cfg = EnvConfig.create(R, C, K, 30, colourless_specials=(),
                           colour_specials=())
    rng = np.random.default_rng(seed)
    colour = jnp.asarray(rng.integers(1, K + 1, size=(B, R, C)).astype(np.int32))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(seed * 10_000, seed * 10_000 + B))
    got = fused_cascade(cfg, colour, keys)
    want = cascade_reference(cfg, colour, keys)
    for g, w, name in zip(got, want, ["colour", "elim", "trips", "trunc"]):
        assert np.array_equal(np.asarray(g), np.asarray(w)), (
            f"cascade {name} diverges (seed {seed}, {R}x{C}x{K}, B={B})"
        )
    print(f"cascade parity OK: {R}x{C}x{K} B={B} "
          f"(max trips {int(np.asarray(got[2]).max())})")


def check_step(seed: int, B: int) -> None:
    cfg = EnvConfig.create(10, 10, 4, 30, colourless_specials=(),
                           colour_specials=())
    states, ts = batched_reset(cfg, jax.random.PRNGKey(seed), B)
    mask = ts.info.effective_actions
    key = jax.random.PRNGKey(seed + 77)
    for i in range(3):
        key, ka = jax.random.split(key)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        acts = jnp.where(
            mask.any(-1), jax.random.categorical(ka, logits, axis=-1), 0
        ).astype(jnp.int32)
        nf, rf, df, inf_f = jax.jit(
            lambda s, a, m: batched_step_fused(cfg, s, a, m)
        )(states, acts, mask)
        nv, rv, dv, inf_v = jax.jit(
            jax.vmap(lambda s, a, m: step(cfg, s, a, eff_mask=m))
        )(states, acts, mask)
        for a, b, name in [
            (nf.colour, nv.colour, "colour"), (nf.key, nv.key, "key"),
            (rf, rv, "reward"),
            (inf_f.effective_actions, inf_v.effective_actions, "mask"),
            (inf_f.cascade_trips, inf_v.cascade_trips, "trips"),
        ]:
            assert np.array_equal(np.asarray(a), np.asarray(b)), (
                f"step {i}: {name} diverges"
            )
        states, mask = nf, inf_f.effective_actions
    print(f"fused step parity OK: 3 steps, B={B}")


def main() -> None:
    assert jax.default_backend() == "tpu", (
        f"needs the real TPU (backend is {jax.default_backend()})"
    )
    check_cascade(0, 256, 10, 10, 4)
    check_cascade(1, 1024, 10, 10, 4)
    check_cascade(2, 512, 5, 5, 3)
    check_step(3, 256)
    print("ALL TPU PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
