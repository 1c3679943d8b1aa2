"""Checkpoint/resume, profiling harness, debug invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from tile_match_tpu.checkpoint import restore_env_state, save_env_state
from tile_match_tpu.config import EnvConfig
from tile_match_tpu.debug import checked_step, validate_state
from tile_match_tpu.engine import reset, step
from tile_match_tpu.profiling import measure_throughput

CFG = EnvConfig(5, 5, 3, 6)


def test_checkpoint_resume_exact(tmp_path):
    """Restoring a checkpoint must reproduce the exact future trajectory."""
    st, info = jax.jit(lambda k: reset(CFG, k))(jax.random.PRNGKey(0))
    sfn = jax.jit(lambda s, a: step(CFG, s, a))
    a = int(np.nonzero(np.asarray(info.effective_actions))[0][0])
    st1, r1, d1, i1 = sfn(st, jnp.int32(a))

    path = str(tmp_path / "ck")
    save_env_state(path, st)
    st_restored = restore_env_state(path, jax.tree.map(np.asarray, st))
    st2, r2, d2, i2 = sfn(
        jax.tree.map(jnp.asarray, st_restored), jnp.int32(a)
    )
    assert np.array_equal(np.asarray(st1.colour), np.asarray(st2.colour))
    assert int(r1) == int(r2)


def test_validate_state():
    st, _ = jax.jit(lambda k: reset(CFG, k))(jax.random.PRNGKey(1))
    validate_state(CFG, st.colour, st.kind)
    bad = np.asarray(st.colour).copy()
    bad[0, 0] = 0  # break coupling
    try:
        validate_state(CFG, bad, st.kind)
        raise RuntimeError("should have failed")
    except AssertionError:
        pass


def test_checked_step():
    st, info = jax.jit(lambda k: reset(CFG, k))(jax.random.PRNGKey(2))
    fn = jax.jit(checked_step(CFG))
    a = int(np.nonzero(np.asarray(info.effective_actions))[0][0])
    err, (st2, r, d, i) = fn(st, jnp.int32(a))
    err.throw()  # no violation
    assert int(r) >= 3


def test_measure_throughput():
    out = measure_throughput(CFG, batch_size=8, num_steps=3, reps=1)
    assert out["steps_per_sec"] > 0
    assert "device" in out
