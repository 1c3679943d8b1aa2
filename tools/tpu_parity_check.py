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
    for g, w, name in zip(
        got, want, ["colour", "elim", "trips", "trunc", "mask"]
    ):
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


def check_sp_step(seed: int, B: int) -> None:
    """Full-specials fused step vs vmap(step), compiled on device."""
    from tile_match_tpu.envs.fused import batched_step_fused_sp
    from tile_match_tpu.ops.effective import effective_mask_settled

    cfg = EnvConfig.create(
        10, 10, 4, 30,
        colourless_specials=("cookie",),
        colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
    )
    states, ts = batched_reset(cfg, jax.random.PRNGKey(seed), B)
    # poke specials so activation/combination paths execute
    rng = np.random.default_rng(seed)
    colour = np.asarray(states.colour).copy()
    kind = np.asarray(states.kind).copy()
    for b in range(B):
        for _ in range(rng.integers(1, 6)):
            r, c = rng.integers(0, 10), rng.integers(0, 10)
            k = int(rng.choice([2, 3, 4, -1]))
            kind[b, r, c] = k
            if k == -1:
                colour[b, r, c] = 0
    states = states.replace(colour=jnp.asarray(colour), kind=jnp.asarray(kind))
    mask = jax.jit(jax.vmap(
        lambda s: effective_mask_settled(cfg, s.colour, s.kind)
    ))(states)
    key = jax.random.PRNGKey(seed + 9)
    for i in range(2):
        key, ka = jax.random.split(key)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        acts = jnp.where(
            mask.any(-1), jax.random.categorical(ka, logits, axis=-1), 0
        ).astype(jnp.int32)
        nf, rf, df, inf_f = jax.jit(
            lambda s, a, m: batched_step_fused_sp(cfg, s, a, m)
        )(states, acts, mask)
        nv, rv, dv, inf_v = jax.jit(
            jax.vmap(lambda s, a, m: step(cfg, s, a, eff_mask=m))
        )(states, acts, mask)
        for a, b, name in [
            (nf.colour, nv.colour, "colour"), (nf.kind, nv.kind, "kind"),
            (nf.key, nv.key, "key"), (rf, rv, "reward"),
            (inf_f.effective_actions, inf_v.effective_actions, "mask"),
            (inf_f.num_specials_activated, inf_v.num_specials_activated,
             "act"),
            (inf_f.num_new_specials, inf_v.num_new_specials, "new"),
            (inf_f.cascade_trips, inf_v.cascade_trips, "trips"),
        ]:
            assert np.array_equal(np.asarray(a), np.asarray(b)), (
                f"sp step {i}: {name} diverges"
            )
        states, mask = nf, inf_f.effective_actions
    print(f"fused SPECIALS step parity OK: 2 steps, B={B}")


def main() -> None:
    assert jax.default_backend() == "tpu", (
        f"needs the real TPU (backend is {jax.default_backend()})"
    )
    check_cascade(0, 256, 10, 10, 4)
    check_cascade(1, 1024, 10, 10, 4)
    check_cascade(2, 512, 5, 5, 3)
    check_step(3, 256)
    check_sp_step(4, 256)
    print("ALL TPU PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
