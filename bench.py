"""Benchmark: batched env-steps/s on the default JAX device.

Protocol: one jitted program scans CHUNK full env steps for the whole batch
(the framework's device-side rollout path — `envs.batched.rollout`), called
in a host loop with async dispatch and no host transfers.  Every scanned
step does the complete per-step work: masked random-effective policy,
effective-action mask, swap, combination branch, cascades with specials,
gravity/refill, playability shuffles, auto-reset.

Configs: the five rows of `BASELINE.json:6-12`; select with `--config N`
(0-4) or env `TMT_BENCH_CONFIG`.  Default is config 3 (10x10, 4 colours,
full specials — the README flagship), which is what the driver records.

Robustness: the axon TPU tunnel's device claim fails transiently — on a
backend-init failure the script re-execs itself (fresh claim) a few times;
XLA programs are cached persistently in .jax_cache so compile cost is paid
once per program shape.  If no accelerator is reachable it falls back to CPU
(tiny batch) rather than crashing, so the driver always gets its JSON line.
Device-claim retries (`_TMT_BENCH_CLAIM_ATTEMPT`) are counted separately
from execution retries (`_TMT_BENCH_EXEC_ATTEMPT`).

The execution-retry ladder shrinks the CHUNK first (shorter dispatches are
what survives a degraded tunnel worker — measured round 3) and keeps the
batch at the per-config throughput optimum (CONFIG_BATCH); the batch drops
only as a last resort, and after any success at a reduced batch the script attempts to
climb back and re-measure at the full batch so the recorded number is the
real optimum, not a degraded-run artifact (round 3 recorded 0.97x at b256
when the true b1024 number was 1.6x).  The ladder is skipped entirely when
the user pinned TMT_BENCH_BATCH/TMT_BENCH_CHUNK or on the CPU fallback
path.

Baseline: the reference env stepped on CPU.  numba is not installed in this
image, so the reference runs de-jitted (no-op njit shim) and the baseline
is CALIBRATED from measurements (see get_baseline): the per-step time spent
in the njit'able `is_move_effective` sweep is measured directly, its numba
speedup is bounded by this repo's C++ engine running the same windowed
test, and only that portion of the step is accelerated (Amdahl) — the rest
of the reference's step is pure Python that numba never touches.  The
legacy guessed whole-step NJIT_FACTOR=30 remains only as a fallback when
the C++ toolchain is absent.  Cached in bench_baseline.json per config with
the measured components.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

NJIT_FACTOR = 30.0
_PARITY_DONE = False
_DIR = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(_DIR, "bench_baseline.json")
JAX_CACHE = os.path.join(_DIR, ".jax_cache")

# The five BASELINE.json configs: (R, C, colours, moves, colourless, colour).
CONFIGS = [
    (5, 5, 3, 10, (), ()),
    (10, 10, 4, 30, (), ()),
    (10, 10, 4, 30, (), ("vertical_laser", "horizontal_laser", "bomb")),
    (10, 10, 4, 30, ("cookie",), ("vertical_laser", "horizontal_laser", "bomb")),
    (20, 20, 6, 100, ("cookie",), ("vertical_laser", "horizontal_laser", "bomb")),
]

# Measured round-5 per-config batch optima.  The round-5 kernel coverage
# (~97% of specials trips consumed in-kernel) plus active-lane/combination
# compaction moved the specials optima up to b8192-16384; the no-specials
# optima are unchanged from round 4.
CONFIG_BATCH = [32768, 16384, 16384, 16384, 8192]


def _config_index() -> int:
    if "--config" in sys.argv:
        idx = sys.argv.index("--config")
        if idx + 1 >= len(sys.argv):
            sys.exit("bench.py: --config requires an integer argument 0-4")
        try:
            n = int(sys.argv[idx + 1])
        except ValueError:
            sys.exit(f"bench.py: --config must be an integer, got {sys.argv[idx + 1]!r}")
    else:
        n = int(os.environ.get("TMT_BENCH_CONFIG", "3"))
    if not 0 <= n < len(CONFIGS):
        sys.exit(f"bench.py: config index {n} out of range 0-{len(CONFIGS) - 1}")
    return n


CFG_IDX = _config_index()
R, C, K, MOVES, COLOURLESS, COLOUR_SP = CONFIGS[CFG_IDX]
_SPEC_LABEL = (
    "no_specials"
    if not (COLOURLESS or COLOUR_SP)
    else ("full_specials" if COLOURLESS else "colour_specials")
)

BATCH = int(os.environ.get("TMT_BENCH_BATCH", str(CONFIG_BATCH[CFG_IDX])))
# Chunk of 8 keeps each device program well under the tunnel's execution
# watchdog (long-running programs get the TPU worker killed; see BENCH.md).
CHUNK = int(os.environ.get("TMT_BENCH_CHUNK", "8"))
STEPS = int(os.environ.get("TMT_BENCH_STEPS", "2"))
REPS = int(os.environ.get("TMT_BENCH_REPS", "3"))
MAX_RETRIES = int(os.environ.get("TMT_BENCH_RETRIES", "6"))


BASELINE_METHOD = "calibrated-v5"


def measure_reference_cpu(budget_s: float = 5.0):
    """Reference env on CPU (de-jitted), random effective actions.

    Returns (steps_per_s, sweep_seconds_per_step, sweep_calls_per_step):
    the module-level ``is_move_effective`` — the reference's ONLY njit hot
    function of consequence (`board.py:735-787`, called O(actions) per step)
    — is wrapped with a perf counter in both modules that bind it, so the
    per-step time attributable to the njit'able sweep is measured, not
    guessed.  (Wrapper overhead ~0.2us/call vs ~5-15us/call measured work:
    <3% and it biases the calibrated factor conservatively downward.)
    """
    import types

    import numpy as np

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(f=None, **kw):
            return f if callable(f) else (lambda g: g)

        class _Any:
            def __getattr__(self, name):
                return lambda *a, **k: None

        numba.njit = njit
        numba.types = _Any()
        numba.typeof = lambda x: None
        sys.modules["numba"] = numba
    ref_path = "/root/reference/src"
    if os.path.isdir(ref_path) and ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    try:
        import tile_match_gym.board as refboard
        import tile_match_gym.tile_match_env as refenvmod
        from tile_match_gym.tile_match_env import TileMatchEnv
    except Exception:
        return 0.0, 0.0, 0.0

    sweep = {"n": 0, "t": 0.0}
    orig = refboard.is_move_effective

    def timed(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        sweep["t"] += time.perf_counter() - t0
        sweep["n"] += 1
        return r

    refboard.is_move_effective = timed
    if getattr(refenvmod, "is_move_effective", None) is orig:
        refenvmod.is_move_effective = timed
    try:
        env = TileMatchEnv(
            R, C, K, MOVES, list(COLOURLESS), list(COLOUR_SP), seed=0
        )
        rng = np.random.default_rng(0)
        obs, info = env.reset()
        sweep["n"] = 0
        sweep["t"] = 0.0
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < budget_s:
            eff = info["effective_actions"]
            a = (
                int(rng.choice(eff))
                if eff
                else int(rng.integers(env.num_actions))
            )
            obs, r, done, _, info = env.step(a)
            n += 1
            if done:
                obs, info = env.reset()
        dt = time.perf_counter() - t0
    finally:
        refboard.is_move_effective = orig
        if getattr(refenvmod, "is_move_effective", None) is timed:
            refenvmod.is_move_effective = orig
    return n / dt, sweep["t"] / max(n, 1), sweep["n"] / max(n, 1)


def measure_cpp_sweep_percall(budget_s: float = 2.0) -> float:
    """Seconds per single windowed effective test in this repo's C++ engine
    (`csrc/tmt_engine.cpp` move_effective via tmt_effective_mask) — an upper
    bound on what numba could make the reference's `is_move_effective`
    (same algorithm, same window) run at."""
    import numpy as np

    from tile_match_tpu.config import EnvConfig
    from tile_match_tpu.native import NativeEngine

    cfg = EnvConfig.create(
        R, C, K, MOVES, colourless_specials=COLOURLESS,
        colour_specials=COLOUR_SP,
    )
    eng = NativeEngine(cfg, seed=1)
    eng.generate_board()
    A = cfg.num_actions
    # warm
    eng.effective_mask()
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s:
        eng.effective_mask()
        n += 1
    dt = time.perf_counter() - t0
    return dt / (n * A)


def get_baseline() -> float:
    """The numba-reference stand-in rate, CALIBRATED (VERDICT r4 item 4).

    numba cannot be installed here, so the baseline is built from
    measurements instead of the legacy guessed 30x factor:

      t_step      de-jitted reference seconds/step (measured)
      T_sweep     of which, seconds/step inside `is_move_effective` (measured)
      f_sweep     de-jitted-vs-C++ per-call ratio for that exact windowed
                  test (measured; C++ >= numba, so this over-corrects in the
                  baseline's FAVOUR)
      baseline    1 / (t_step - T_sweep + T_sweep / f_sweep)   [Amdahl]

    i.e. only the portion of the step numba would actually compile gets the
    speedup.  Falls back to the legacy conservative 30x whole-step factor if
    the C++ engine is unavailable.
    """
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        # legacy single-config layout → keep as config-3 entry
        if "baseline_steps_per_s" in cache and cache.get("config") == [10, 10, 4]:
            cache = {"3": cache}
    key = str(CFG_IDX)
    if (
        key in cache
        and "baseline_steps_per_s" in cache[key]
        and cache[key].get("method") == BASELINE_METHOD
    ):
        return cache[key]["baseline_steps_per_s"]
    raw, sweep_s, sweep_calls = measure_reference_cpu()
    entry = {
        "config": [R, C, K],
        "reference_dejitted_steps_per_s": raw,
        "sweep_seconds_per_step": sweep_s,
        "sweep_calls_per_step": sweep_calls,
    }
    t_step = 1.0 / raw if raw > 0 else 0.0
    try:
        cpp_percall = measure_cpp_sweep_percall()
        dejit_percall = sweep_s / max(sweep_calls, 1e-9)
        f_sweep = max(dejit_percall / max(cpp_percall, 1e-12), 1.0)
        njit_step = t_step - sweep_s + sweep_s / f_sweep
        baseline = max(1.0 / njit_step, 1.0) if njit_step > 0 else 1.0
        entry.update(
            {
                "method": BASELINE_METHOD,
                "cpp_sweep_seconds_per_call": cpp_percall,
                "dejitted_sweep_seconds_per_call": dejit_percall,
                "measured_sweep_factor": f_sweep,
                "baseline_steps_per_s": baseline,
            }
        )
    except Exception as e:  # no C++ toolchain → legacy conservative factor
        baseline = max(raw * NJIT_FACTOR, 1.0)
        entry.update(
            {
                "method": BASELINE_METHOD,
                "fallback": f"legacy njit_factor={NJIT_FACTOR}: {e!r}"[:300],
                "njit_factor": NJIT_FACTOR,
                "baseline_steps_per_s": baseline,
            }
        )
    cache[key] = entry
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f)
    return baseline


def _device_ok() -> bool:
    import jax

    try:
        jax.devices()
        return True
    except Exception:
        return False


def parity_spot_check(cfg) -> None:
    """Compiled-Mosaic parity gate: before any number is recorded, step a
    small batch through the production fused path AND the vmapped XLA engine
    and require bit equality (boards, kinds, rewards, trip counts).  The
    pytest suite runs the kernels in interpret mode only (it pins itself to
    CPU), so this is the check that catches a Mosaic lowering regression on
    the real chip.  Results go to PARITY_SPOT.json + stderr; the bench metric
    is still printed either way (the driver needs its JSON line), but a
    mismatch is loudly flagged.  Skip with TMT_BENCH_PARITY=0.
    """
    import jax
    import jax.numpy as jnp

    if os.environ.get("TMT_BENCH_PARITY") == "0":
        return
    try:
        if jax.default_backend() != "tpu":
            return
        from tile_match_tpu.engine import step as engine_step
        from tile_match_tpu.envs.batched import batched_reset
        from tile_match_tpu.envs.fused import (
            batched_step_fused,
            batched_step_fused_sp,
        )

        b = 256
        states, ts = jax.jit(lambda k: batched_reset(cfg, k, b))(
            jax.random.PRNGKey(7)
        )
        mask = ts.info.effective_actions
        fused = batched_step_fused_sp if cfg.any_special else batched_step_fused

        @jax.jit
        def both(states, mask, acts):
            s1, r1, d1, i1 = fused(cfg, states, acts, mask)
            s2, r2, d2, i2 = jax.vmap(
                lambda s, a, m: engine_step(cfg, s, a, eff_mask=m)
            )(states, acts, mask)
            same = (
                jnp.all(s1.colour == s2.colour)
                & jnp.all(s1.kind == s2.kind)
                & jnp.all(s1.key == s2.key)
                & jnp.all(r1 == r2)
                & jnp.all(i1.cascade_trips == i2.cascade_trips)
                & jnp.all(i1.effective_actions == i2.effective_actions)
            )
            return s1, i1.effective_actions, same

        key = jax.random.PRNGKey(8)
        ok = True
        for _ in range(2):
            key, ka = jax.random.split(key)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            acts = jnp.where(
                mask.any(-1), jax.random.categorical(ka, logits, axis=-1), 0
            ).astype(jnp.int32)
            states, mask, same = both(states, mask, acts)
            ok = ok and bool(same)
        status = {"config": CFG_IDX, "parity_ok": ok, "batch": b, "steps": 2}
    except Exception as e:  # never let the gate kill the bench metric
        status = {"config": CFG_IDX, "parity_ok": None, "error": repr(e)[:500]}
    with open(os.path.join(_DIR, "PARITY_SPOT.json"), "w") as f:
        json.dump(status, f)
    if status["parity_ok"] is False:
        print(
            "bench.py: COMPILED-KERNEL PARITY FAILURE (fused != vmapped "
            "engine on-device) — see PARITY_SPOT.json",
            file=sys.stderr,
        )
    else:
        print(f"bench.py: parity spot check: {status}", file=sys.stderr)


def measure_ours(batch: int, chunk: int, steps: int, reps: int) -> float:
    import jax
    import jax.numpy as jnp

    os.makedirs(JAX_CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", JAX_CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from tile_match_tpu.config import EnvConfig
    from tile_match_tpu.envs.batched import batched_reset, batched_step

    cfg = EnvConfig.create(
        R, C, K, MOVES,
        colourless_specials=COLOURLESS,
        colour_specials=COLOUR_SP,
    )

    # One dispatch = `chunk` full env steps scanned on device (the product
    # rollout path): dispatch overhead amortises while every step still does
    # the complete work — policy from the effective mask, swap, cascades,
    # specials, shuffles, auto-reset, and the next bool[A] mask.
    @jax.jit
    def run_chunk(states, mask, key):
        def body(carry, _):
            states, mask, key = carry
            key, ka = jax.random.split(key)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            acts = jnp.where(
                mask.any(-1), jax.random.categorical(ka, logits, axis=-1), 0
            ).astype(jnp.int32)
            states, ts = batched_step(cfg, states, acts, eff_mask=mask)
            return (states, ts.info.effective_actions, key), ts.reward.sum()

        (states, mask, key), rs = jax.lax.scan(
            body, (states, mask, key), None, length=chunk
        )
        return states, mask, rs.sum(), key

    # Warm the device claim with a tiny op (the remote tunnel's first
    # dispatch can take minutes) before anything is timed.
    float(jnp.zeros(()) + 1.0)

    # Compiled-kernel parity gate, once per process (ADVICE r4: the test
    # suite only exercises the kernels in interpret mode).
    global _PARITY_DONE
    if not _PARITY_DONE:
        _PARITY_DONE = True
        parity_spot_check(cfg)

    states, ts = jax.jit(lambda k: batched_reset(cfg, k, batch))(
        jax.random.PRNGKey(0)
    )
    mask = ts.info.effective_actions
    key = jax.random.PRNGKey(1)
    # compile + one warm chunk, with a REAL host sync: block_until_ready
    # returns early on this image's remote-tunnel backend, so the only
    # trustworthy synchronisation is fetching a value.
    states, mask, r, key = run_chunk(states, mask, key)
    float(r)

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            states, mask, r, key = run_chunk(states, mask, key)
        # float(r) pulls the scalar to the host: a real synchronisation
        # point even on backends whose block_until_ready returns early
        # (the remote-tunnel backend on this image does).
        float(r)
        dt = time.perf_counter() - t0
        best = max(best, batch * chunk * steps / dt)
    return best


def _reexec(counter_env: str) -> None:
    n = int(os.environ.get(counter_env, "0"))
    # A crashed tunnel worker needs 1-3 min to recycle before a fresh claim
    # can succeed (measured round 3) — waiting less just burns retries.
    time.sleep(min(60 * (n + 1), 180))
    os.environ[counter_env] = str(n + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    baseline = get_baseline()

    claim_attempt = int(os.environ.get("_TMT_BENCH_CLAIM_ATTEMPT", "0"))
    exec_attempt = int(os.environ.get("_TMT_BENCH_EXEC_ATTEMPT", "0"))
    if not _device_ok():
        if claim_attempt + exec_attempt < MAX_RETRIES:
            _reexec("_TMT_BENCH_CLAIM_ATTEMPT")
        # last resort: CPU fallback so the driver still gets a data point
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    on_cpu = os.environ.get("JAX_PLATFORMS") == "cpu"
    pinned = "TMT_BENCH_BATCH" in os.environ or "TMT_BENCH_CHUNK" in os.environ
    batch = int(os.environ.get("TMT_BENCH_BATCH", "128" if on_cpu else str(BATCH)))
    chunk = int(os.environ.get("TMT_BENCH_CHUNK", "4" if on_cpu else str(CHUNK)))
    steps = int(os.environ.get("TMT_BENCH_STEPS", "2" if on_cpu else str(STEPS)))
    # Execution-retry ladder, CHUNK FIRST: a long-running dispatch is what
    # outlives the tunnel watchdog and kills the TPU worker (surfaces as
    # UNAVAILABLE), and shorter dispatches are what survives a degraded
    # worker — so retries shrink the per-dispatch chunk at the FULL batch
    # (b1024 is the measured throughput optimum and must stay the recorded
    # operating point), and only the final rungs reduce the batch.  Only
    # EXECUTION failures walk the ladder; pinned settings and the CPU
    # fallback never shrink.  (Round 3's ladder dropped batch first and
    # recorded a 0.6x-smaller number — see module docstring.)
    if not pinned and not on_cpu and exec_attempt:
        ladder = [
            (batch, chunk),
            (batch, max(1, chunk // 2)),
            (batch, max(1, chunk // 4)),
            (batch, 1),
            (max(256, batch // 4), 1),
            (256, 1),
        ]
        batch, chunk = ladder[min(exec_attempt, len(ladder) - 1)]
    try:
        sps = measure_ours(batch, chunk, steps, REPS)
        label = f"b{batch}"
        # Climb-back: if the ladder degraded the batch, the worker is now
        # proven healthy enough for short dispatches — re-attempt the full
        # batch (still at the degraded chunk) so the recorded number is the
        # b1024 optimum whenever it is measurable at all.
        if not pinned and not on_cpu and batch < BATCH:
            try:
                sps_full = measure_ours(BATCH, chunk, steps, REPS)
                sps, label = sps_full, f"b{BATCH}"
            except Exception:
                pass  # keep the degraded-batch measurement already in hand
    except Exception:
        if claim_attempt + exec_attempt < MAX_RETRIES:
            _reexec("_TMT_BENCH_EXEC_ATTEMPT")
        raise

    print(
        json.dumps(
            {
                "metric": f"env_steps_per_sec_{R}x{C}x{K}_{_SPEC_LABEL}_{label}",
                "value": round(sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(sps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
