"""Unit tests for the SHARED chunk-loop policy (core/driver.run_chunk_loop).

Round 2 had three hand-synced copies of the pipelining/chunk-size/time-limit
policy; they now all dispatch through one implementation, so these tests pin
its contract directly:

- chunk schedule growth + max-chunk caps (pipelined vs sync mode),
- pipelined mode: no per-chunk blocking, ONE final flush,
- progress mode: per-chunk flush + reset,
- time limits measured via stats.elapsed_time_seconds stop the loop,
- the returned count equals the flushed iteration total.
"""
import jax.numpy as jnp

from nfmc_tpu.core.driver import chunk_schedule, run_chunk_loop


class FakeStats:
    def __init__(self):
        self.elapsed_time_seconds = 0.0

    def update_elapsed_time(self, dt):
        self.elapsed_time_seconds += dt

    def __repr__(self):
        return f"elapsed={self.elapsed_time_seconds:.3f}"


def test_chunk_schedule_geometric_growth_and_cap():
    assert list(chunk_schedule(1365, max_chunk=1024)) == [1, 4, 16, 64, 256, 1024]
    # the compiled sizes are powers of 4 up to max_chunk: for 128 the largest
    # is 64, which then repeats (each distinct length is a fresh XLA compile)
    assert list(chunk_schedule(341, max_chunk=128)) == [1, 4, 16, 64, 64, 64, 64, 64]
    assert sum(chunk_schedule(12345, max_chunk=1024)) == 12345


def test_pipelined_single_flush_and_count():
    stats = FakeStats()
    log = {"dispatches": [], "flushes": []}

    def dispatch(chunk, iters_done):
        log["dispatches"].append((chunk, iters_done))
        return jnp.zeros(())

    def flush(iters):
        log["flushes"].append(iters)

    # r5: pipelined runs up to SINGLE_CHUNK_ITER_LIMIT compile as ONE chunk
    done = run_chunk_loop(1365, dispatch=dispatch, stats=stats, flush=flush,
                          time_limit_seconds=None, show_progress=False)
    assert done == 1365
    assert log["dispatches"] == [(1365, 0)]
    # exactly one flush at the end covering everything
    assert log["flushes"] == [1365]
    assert stats.elapsed_time_seconds > 0

    # above the single-chunk limit the geometric schedule applies (power-of-4
    # sizes reused across run lengths, bounding distinct compiles)
    log2 = {"dispatches": [], "flushes": []}
    done = run_chunk_loop(
        5461,
        dispatch=lambda c, i: (log2["dispatches"].append((c, i)), jnp.zeros(()))[1],
        stats=FakeStats(), flush=log2["flushes"].append,
        time_limit_seconds=None, show_progress=False)
    assert done == 5461
    sizes = [c for c, _ in log2["dispatches"]]
    assert sizes[:6] == [1, 4, 16, 64, 256, 1024]
    assert max(sizes) == 1024 and sum(sizes) == 5461
    # iters_done passed to dispatch is the absolute pre-chunk index
    assert [i for _, i in log2["dispatches"]][:6] == [0, 1, 5, 21, 85, 341]
    assert log2["flushes"] == [5461]


def test_progress_mode_flushes_per_chunk():
    stats = FakeStats()
    flushes = []
    done = run_chunk_loop(
        21,
        dispatch=lambda c, i: jnp.zeros(()),
        stats=stats,
        flush=flushes.append,
        time_limit_seconds=None,
        show_progress=True,
        sync_max_chunk=16,
    )
    assert done == 21
    assert flushes == [1, 4, 16]  # per-chunk flush + reset under a live bar
    assert sum(flushes) == done


def test_sync_max_chunk_honored_with_time_limit():
    stats = FakeStats()
    sizes = []
    run_chunk_loop(
        1365,
        dispatch=lambda c, i: sizes.append(c) or jnp.zeros(()),
        stats=stats,
        flush=lambda n: None,
        time_limit_seconds=1e9,  # limit present -> sync mode, but never trips
        show_progress=False,
        sync_max_chunk=128,
    )
    assert max(sizes) == 64  # largest power-of-4 size under sync_max_chunk


def test_time_limit_stops_early_and_flushes_partial():
    stats = FakeStats()
    flushes = []

    def dispatch(chunk, iters_done):
        # pretend each chunk takes 1 wall-second (recorded via the stats
        # object the loop updates after its block)
        stats.elapsed_time_seconds += 1.0
        return jnp.zeros(())

    done = run_chunk_loop(
        10_000,
        dispatch=dispatch,
        stats=stats,
        flush=flushes.append,
        time_limit_seconds=2.5,
        show_progress=False,
        sync_max_chunk=4,
    )
    # chunks 1, 4, 4: the limit check runs BEFORE each dispatch, so the
    # chunk that crosses 2.5 elapsed (the third) still completes, then the
    # loop stops having done 1 + 4 + 4 = 9
    assert done == 9
    assert flushes == [9]


def test_explicit_max_chunk_wins():
    sizes = []
    run_chunk_loop(
        100,
        dispatch=lambda c, i: sizes.append(c) or jnp.zeros(()),
        stats=FakeStats(),
        flush=lambda n: None,
        show_progress=False,
        max_chunk=16,
    )
    assert max(sizes) == 16


def test_stats_accum_compensated_long_sum():
    """The scan-carried f32 moment sums are flushed once per pipelined run;
    StatsAccum's Neumaier compensation must keep them O(eps)-accurate over
    long runs. This also guards against XLA optimizing the compensation away
    (it must not reassociate float arithmetic under default flags)."""
    import jax
    import numpy as np

    from nfmc_tpu.core.driver import StatsAccum, StepInfo

    n = 200_000
    v = jnp.full((4, 3), 0.1, dtype=jnp.float32)  # (chains=4, event=(3,))
    zero = jnp.zeros((), dtype=jnp.int32)

    def body(acc, _):
        return acc.add(StepInfo(n_accepted=zero, diverged=zero), v), None

    run = jax.jit(lambda a: jax.lax.scan(body, a, None, length=n)[0])
    acc = jax.device_get(run(StatsAccum.zeros((3,))))
    sum_x, sum_x2 = acc.moment_sums()

    per_add = 4 * float(np.float32(0.1))  # exact in f32 (power-of-2 multiple)
    exact = n * per_add
    rel = abs(float(sum_x[0]) - exact) / exact
    # a plain f32 running sum lands around 1e-4..1e-3 relative error here;
    # the compensated total must be at the f32-representation floor
    assert rel < 1e-6, rel
    exact2 = n * 4 * float(np.float32(0.1)) ** 2
    rel2 = abs(float(sum_x2[0]) - exact2) / exact2
    assert rel2 < 1e-5, rel2


def test_step_info_defaults_are_plain_ints():
    """`jnp.zeros` class-level defaults would initialize the JAX backend at
    import time (before the platform override tests/CLAUDE.md rely on)."""
    from nfmc_tpu.core.driver import StepInfo

    info = StepInfo(n_accepted=jnp.zeros((), jnp.int32), diverged=jnp.zeros((), jnp.int32))
    assert type(info.n_calls) is int and info.n_calls == 0
    assert type(info.n_grads) is int and info.n_grads == 0


def test_stats_accum_dyn_counters_survive_int32_range():
    """Dynamic call/grad counts are carried across ALL chunks; large-chain
    trajectory-dependent kernels (ChEES) push the run total past 2^31 where
    the old i32 accumulator wrapped negative (round-3 review fix)."""
    import jax.numpy as jnp

    from nfmc_tpu.core.driver import StatsAccum, StepInfo

    acc = StatsAccum.zeros((2,))
    per_iter = 524_288  # 1024 chains x 256 leapfrogs x 2
    x = jnp.zeros((4, 2))

    def body(acc, _):
        info = StepInfo(
            n_accepted=jnp.zeros((), jnp.int32),
            diverged=jnp.zeros((), jnp.int32),
            n_calls=jnp.asarray(per_iter, jnp.int32),
            n_grads=jnp.asarray(per_iter, jnp.int32),
        )
        return acc.add(info, x), None

    import jax

    acc, _ = jax.lax.scan(body, acc, jnp.arange(8192))
    total = int(round(float(acc.n_grads_dyn) + float(acc.c_grads_dyn)))
    assert total == per_iter * 8192  # = 2^31 * 2, exactly representable & exact


def test_pipelined_single_chunk_fast_path():
    """A pipelined run that fits in one chunk dispatches exactly once (one
    trace + one compile on a cold call — VERDICT r3 item 6). The per-chunk
    key split makes the chunk decomposition part of a run's seeded stream,
    so the contract is seeded repeatability per (mode, n_iterations) — NOT
    bit-equality across modes; both modes must still sample correctly."""
    stats = FakeStats()
    log = []
    done = run_chunk_loop(
        1000, dispatch=lambda c, i: (log.append((c, i)), jnp.zeros(()))[1],
        stats=stats, flush=lambda n: None,
        time_limit_seconds=None, show_progress=False,
    )
    assert done == 1000
    assert log == [(1000, 0)]

    import jax
    import numpy as np

    from nfmc_tpu.samplers.mcmc import MALA

    def U(x):
        return 0.5 * (x.reshape(x.shape[0], -1) ** 2).sum(-1)

    def run(limit):
        s = MALA((3,), U)
        s.params.n_iterations = 400
        x0 = jax.random.normal(jax.random.key(0), (16, 3))
        return s.sample(x0, show_progress=False, seed=7,
                        time_limit_seconds=limit)

    a, a2, b = run(None), run(None), run(1e9)
    # fast path seeded-repeatable
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(a2.samples))
    # both modes produce a healthy chain on the same target (N(0,1) moments)
    for out in (a, b):
        draws = np.asarray(out.samples)[100:]
        assert abs(draws.mean()) < 0.15
        assert abs(draws.var() - 1.0) < 0.3


def test_single_chunk_cap_preserves_hoist():
    """r4 review: callers with chunk-level hoists pass single_chunk_cap so
    one whole-run chunk can never exceed the precompute's footprint gate."""
    log = []
    run_chunk_loop(
        1000, dispatch=lambda c, i: (log.append(c), jnp.zeros(()))[1],
        stats=FakeStats(), flush=lambda n: None,
        time_limit_seconds=None, show_progress=False,
        single_chunk_cap=256,
    )
    assert log[0] != 1000  # fast path declined: falls back to geometric
    assert max(log) <= 1024 and sum(log) == 1000

    # driver-level: a tiny hoist limit must keep chunks under the cap while
    # the run still completes and hoists (results finite + deterministic)
    import jax
    import numpy as np

    from nfmc_tpu.samplers.mcmc import MALA

    def U(x):
        return 0.5 * (x.reshape(x.shape[0], -1) ** 2).sum(-1)

    s = MALA((3,), U)
    s.rng_hoist_element_limit = 16 * 3 * 8  # 8-iteration chunks max
    s.params.n_iterations = 40
    x0 = jax.random.normal(jax.random.key(0), (16, 3))
    out = s.sample(x0, show_progress=False, seed=1)
    assert np.isfinite(np.asarray(out.samples)).all()
