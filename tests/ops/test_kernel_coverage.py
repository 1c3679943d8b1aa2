"""Kernel-coverage floor: the specials cascade kernel must keep consuming
the bulk of trips in-kernel (VERDICT r4 item 3's regression check).

Round-5 telemetry on the flagship config measured 96.5-97.5% of executed
cascade trips consumed in-kernel (COVERAGE_r05_*.json).  A change that
silently widens the defer predicates (e.g. a case-table regression making
every trip freeze for the full machinery) would keep every parity test
green while collapsing throughput ~4x — this test pins a conservative
floor on a seeded random-effective workload so that collapse is loud.

Runs the production fused step in interpret mode (bit-identical to the
compiled kernel, pinned separately by tests/envs/test_fused_step.py).
"""

import jax
import jax.numpy as jnp
import pytest

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.envs.batched import batched_reset
from tile_match_tpu.envs.fused import batched_step_fused_sp

BATCH = 64
STEPS = 8
# Round-5 measured 0.965-0.975 at batch 256-512; small batches are noisier
# (one unlucky board-step freezes a larger fraction), so the floor is
# deliberately loose — it exists to catch a collapse, not to pin the mean.
FLOOR = 0.80


@pytest.mark.parametrize("seed", [0, 3])
def test_kernel_consumes_most_flagship_trips(seed):
    cfg = EnvConfig.create(
        10, 10, 4, 30,
        colourless_specials=("cookie",),
        colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
    )
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def run(key):
        key, k0 = jax.random.split(key)
        states, ts = batched_reset(cfg, k0, BATCH)
        mask = ts.info.effective_actions

        def body(carry, _):
            states, mask, key = carry
            key, ka = jax.random.split(key)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            acts = jnp.where(
                mask.any(-1), jax.random.categorical(ka, logits, axis=-1), 0
            ).astype(jnp.int32)
            states, rew, done, infos, stats = batched_step_fused_sp(
                cfg, states, acts, mask, compute_post_mask=False,
                interpret=interpret, with_stats=True,
            )
            out = {
                "trips": infos.cascade_trips.sum(),
                "full": stats["full_trips"].sum(),
            }
            return (states, infos.effective_actions, key), out

        (_, _, _), outs = jax.lax.scan(
            body, (states, mask, key), None, length=STEPS
        )
        return outs

    outs = jax.device_get(run(jax.random.PRNGKey(seed)))
    total = int(outs["trips"].sum())
    full = int(outs["full"].sum())
    assert total > 0
    frac = (total - full) / total
    assert frac >= FLOOR, (
        f"kernel coverage collapsed: {frac:.3f} < {FLOOR} "
        f"({total - full}/{total} trips in-kernel)"
    )
