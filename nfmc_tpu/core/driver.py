"""The chunked jitted ``lax.scan`` chain driver — the framework's hot loop.

The reference runs one eager Python iteration per MCMC step
(``nfmc/algorithms/sampling/mcmc/base.py:69-98``), dispatching many small
batched torch ops and a fresh autograd call per gradient. Here the per-
iteration step is a pure function ``step(x, kernel_state, key) ->
(x', kernel_state', StepInfo)`` compiled once and scanned over a *chunk* of
iterations on device. Host code only runs between chunks — to honor
``time_limit_seconds`` (reference ``mcmc/base.py:70-71``), stream samples to
host RAM, and fold chunk-local statistics into the running totals.

Divergences cannot be raised as exceptions inside jit; instead each step
reports a ``diverged`` flag computed from finiteness checks, which rejects the
whole batch for that iteration — the same observable behavior as the
reference's ``except ValueError`` blocks (``langevin.py:111-114``,
``hmc.py:117-120``).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .samples import MCMCSamples
from .statistics import MCMCStatistics

from ..utils import tqdm  # shared fallback shim


# Footprint cap (f32 elements across a chunk) for hoisted precomputes —
# ~512 MB, small next to 16 GB HBM yet far above the benchmark configs.
# Samplers default their per-instance limits to this.
RNG_HOIST_ELEMENT_LIMIT = 1 << 27

# Largest n_iterations the pipelined single-chunk fast path compiles as ONE
# scan (when no explicit max_chunk and no footprint cap forbids it). A scan's
# compile time is trip-count-independent, so a single-call run pays one trace
# + one compile; above this, runs fall back to the geometric schedule whose
# power-of-4 sizes are reused across differing run lengths (bounding the
# number of distinct compiles for users who vary n). r5: raised from 1024 —
# the reference-native single-call regime (64 chains x 1500 iterations,
# /root/reference/nfmc/sample.py:243-314) previously decomposed into ~12
# chunks whose per-chunk sample fetches each paid a tunnel round trip.
SINGLE_CHUNK_ITER_LIMIT = 4096

# Total-run footprint cap (f32 elements) for deferring collect-mode sample
# fetches: below it, a pipelined run keeps every chunk's emitted draws on
# device and fetches them in ONE end-of-run D2H instead of one blocking
# fetch per chunk (each ~25-30 ms through the tunneled host link).
SAMPLE_DEFER_ELEMENT_LIMIT = 1 << 27


def flow_proposal_footprint_per_draw(flow, event_size: int) -> int:
    """Estimated peak f32 elements a chunk-hoisted flow proposal materializes
    *per draw*: the persistent outputs (proposal position, base draw in
    flight, log-prob/target scalars ~ 3 * event) plus the inference working
    set of the batched inverse (~ the widest conditioner activation — layers
    run sequentially, so XLA reuses buffers rather than keeping every layer
    live). The hoist guards compare ``chunk * n_chains * this`` against the
    element limit; the previous guards counted only ``chunk * x.size``
    (draws alone), undercounting peak memory by the activation factor
    (ADVICE round 1). Falls back to ``4 * event_size`` for flows without a
    discoverable hidden width."""
    bij = getattr(flow, "bijection", None)
    hidden = getattr(bij, "hidden", None) if bij is not None else None
    if hidden is None and bij is not None:
        hidden = getattr(bij, "hidden_size", None)
    if hidden is None and bij is not None:
        # conv flows: hidden_channels is a per-pixel channel count — the
        # activation holds channels x spatial elements, not `channels`
        channels = getattr(bij, "hidden_channels", None)
        if channels is not None:
            chw = getattr(bij, "chw", None)
            spatial = int(np.prod(chw[1:])) if chw else max(1, event_size)
            hidden = int(channels) * spatial
    if isinstance(hidden, (list, tuple)):
        hidden = max(hidden) if hidden else 0
    hidden = int(hidden or event_size)
    return 3 * event_size + hidden


def hoisted_flow_proposals(flow, params, k_props, n_chains, event_shape, target=None):
    """Batched flow proposals for a whole scan chunk: one vmapped base draw
    per key + ONE ``(chunk * n_chains)``-batched coupling inverse + proposal
    log-prob (+ optional target eval), shaped to tile onto the MXU.

    RNG-parity-critical: each key draws exactly one ``flow.sample_base_fn``
    call, matching the in-scan step's derivation bit-for-bit. FixedIMH's
    proposal precompute and JumpNFMC's fused runner both hoist through this
    helper so the key discipline is pinned in one place (cf.
    :func:`flow_proposal_footprint_per_draw` for the matching HBM guard).

    Returns ``(x', flow_log_prob', u')`` with leading ``(chunk, n_chains)``;
    ``u'`` is zeros when ``target`` is None (unadjusted jumps never read it).
    """
    chunk = k_props.shape[0]
    z = jax.vmap(lambda k: flow.sample_base_fn(k, n_chains))(k_props)
    zf = z.reshape(chunk * n_chains, *event_shape)
    xf, log_det_inv = flow.bijection.inverse_fn(params, zf)
    flp = (flow.base_log_prob_fn(zf) - log_det_inv).reshape(chunk, n_chains)
    if target is None:
        u = jnp.zeros((chunk, n_chains), dtype=jnp.float32)
    else:
        u = target(xf).reshape(chunk, n_chains)
    return xf.reshape(chunk, n_chains, *event_shape), flp, u


class StepInfo(NamedTuple):
    """Per-iteration dynamic outputs of a kernel step.

    ``n_calls``/``n_grads`` are for kernels with trajectory-dependent work
    (NUTS); static-cost kernels leave them 0 and the host accounts
    ``chunk * calls_per_iter`` instead.
    """

    n_accepted: jax.Array  # i32 scalar: chains accepted this iteration
    diverged: jax.Array  # i32 scalar: 1 if this iteration diverged (batch-wide)
    # Plain-int defaults on purpose: a `jnp.zeros` class-level default would
    # initialize the JAX backend (and commit the platform) the moment
    # `import nfmc_tpu` runs — before user code can apply the
    # `jax.config.update("jax_platforms", ...)` override CLAUDE.md requires.
    # Weakly-typed 0 adds fine inside jit (StatsAccum.add).
    n_calls: "jax.Array | int" = 0
    n_grads: "jax.Array | int" = 0


def _compensated_add(s, c, v):
    """Neumaier compensated add: returns ``(s', c')`` with ``s' + c'``
    tracking the exact ``s + c + v``.

    The scan-carried f32 moment accumulators are flushed only ONCE per run in
    pipelined mode, so a plain running sum drifts O(n*eps) over ~1e6-iteration
    runs (and the variance ``E[x^2]-E[x]^2`` cancellation amplifies it). XLA's
    default flags do not reassociate float arithmetic, so the compensation
    survives compilation (pinned by ``tests/test_chunk_loop.py``'s long-sum
    test).
    """
    t = s + v
    comp = jnp.where(jnp.abs(s) >= jnp.abs(v), (s - t) + v, (v - t) + s)
    return t, c + comp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StatsAccum:
    """Chunk-local accumulators carried through the scan (reset every chunk).

    Counters that are *static* per iteration (attempted trajectories, target
    call/grad counts — SURVEY.md section 2.8) are computed host-side as
    ``chunk_len * per_iter`` and never touch the device.
    """

    n_accepted: jax.Array
    n_divergences: jax.Array
    # dynamic call/grad counts accumulate as compensated f32 pairs, NOT i32:
    # the accumulator is carried across ALL chunks of a run, and e.g. ChEES
    # at 1024 chains x 256 leapfrogs adds ~5e5 grads per iteration — an i32
    # wraps past 2^31 within a few thousand iterations (round-3 review fix).
    # Each per-iteration addend is < 2^24 so the f32 add is exact, and the
    # Neumaier compensation keeps the running total exact far past 2^31.
    n_calls_dyn: jax.Array
    c_calls_dyn: jax.Array
    n_grads_dyn: jax.Array
    c_grads_dyn: jax.Array
    sum_x: jax.Array  # (*event,) running sum of transformed states
    sum_x2: jax.Array  # (*event,)
    c_x: jax.Array  # (*event,) Neumaier compensation for sum_x
    c_x2: jax.Array  # (*event,) compensation for sum_x2

    @staticmethod
    def zeros(event_shape: Tuple[int, ...]) -> "StatsAccum":
        # each field gets its OWN buffer: the chunk runners donate the
        # accumulator, and donating one shared zeros buffer twice is an error
        def z():
            return jnp.zeros(event_shape, dtype=jnp.float32)

        return StatsAccum(
            n_accepted=jnp.zeros((), dtype=jnp.int32),
            n_divergences=jnp.zeros((), dtype=jnp.int32),
            n_calls_dyn=jnp.zeros((), dtype=jnp.float32),
            c_calls_dyn=jnp.zeros((), dtype=jnp.float32),
            n_grads_dyn=jnp.zeros((), dtype=jnp.float32),
            c_grads_dyn=jnp.zeros((), dtype=jnp.float32),
            sum_x=z(),
            sum_x2=z(),
            c_x=z(),
            c_x2=z(),
        )

    def add(self, info: StepInfo, x_transformed: jax.Array) -> "StatsAccum":
        xt = x_transformed.astype(jnp.float32)
        sum_x, c_x = _compensated_add(self.sum_x, self.c_x, jnp.sum(xt, axis=0))
        sum_x2, c_x2 = _compensated_add(
            self.sum_x2, self.c_x2, jnp.sum(xt * xt, axis=0)
        )
        calls, c_calls = _compensated_add(
            self.n_calls_dyn, self.c_calls_dyn,
            jnp.asarray(info.n_calls, dtype=jnp.float32),
        )
        grads, c_grads = _compensated_add(
            self.n_grads_dyn, self.c_grads_dyn,
            jnp.asarray(info.n_grads, dtype=jnp.float32),
        )
        return StatsAccum(
            n_accepted=self.n_accepted + info.n_accepted,
            n_divergences=self.n_divergences + info.diverged,
            n_calls_dyn=calls,
            c_calls_dyn=c_calls,
            n_grads_dyn=grads,
            c_grads_dyn=c_grads,
            sum_x=sum_x,
            sum_x2=sum_x2,
            c_x=c_x,
            c_x2=c_x2,
        )

    def moment_sums(self):
        """Compensated totals ``(sum_x, sum_x2)`` — what flushes must fold
        into host statistics (works on the device pytree or its
        ``device_get`` numpy image alike)."""
        return self.sum_x + self.c_x, self.sum_x2 + self.c_x2


StepFn = Callable[[jax.Array, object, jax.Array], Tuple[jax.Array, object, StepInfo]]


def chunk_schedule(n_iterations: int, max_chunk: int = 64):
    """Yield chunk sizes growing 1, 4, 16, ... capped at the largest power
    of 4 <= ``max_chunk``, tail decomposed into already-seen sizes. Keeping
    every size a power of 4 means the sync path's sizes are a subset of the
    async path's (one warm-up covers both); pass an exact power of 4 to
    avoid surprises (a ``max_chunk`` of 128 effectively caps at 64 —
    round-3 review clarification).

    Each distinct length is a separate XLA compilation of the scan (~seconds
    on TPU), so growth is geometric with factor 4: at most
    O(log4 max_chunk) compiles, while the small early chunks still give
    prompt wall-clock-limit checks.
    """
    sizes = [1]
    while sizes[-1] * 4 <= max_chunk:
        sizes.append(sizes[-1] * 4)
    remaining = n_iterations
    i = 0
    while remaining > 0:
        if i < len(sizes) and sizes[i] <= remaining:
            size = sizes[i]
            i += 1
        else:
            # largest already-compiled size <= remaining
            size = max((s for s in sizes[: max(i, 1)] if s <= remaining), default=1)
            size = min(size, remaining)
        yield size
        remaining -= size


def run_chunk_loop(
    n_iterations: int,
    *,
    dispatch: Callable[[int, int], object],
    stats,
    flush: Callable[[int], None],
    time_limit_seconds: Optional[float] = None,
    show_progress: bool = False,
    desc: str = "MCMC",
    sync_max_chunk: int = 64,
    max_chunk: Optional[int] = None,
    postfix: Optional[Callable[[], str]] = None,
    single_chunk_cap: Optional[int] = None,
) -> int:
    """THE chunk-loop policy — pipelining, chunk-size growth, time limits,
    elapsed-time accounting, progress flushes — shared by every chunked
    runner (``ChunkedScanDriver.run``, ``JumpNFMC._sample_fused``,
    ``AdaptiveIMH._sample_fused``). One implementation so a policy change
    cannot silently skew walls or time limits in one copy (VERDICT r2 item 7).

    ``dispatch(chunk_len, iters_done)`` launches one compiled chunk (carrying
    its own state via closure) and returns a device value to block on.
    ``flush(unflushed_iters)`` fetches the device accumulators, folds them
    into ``stats``, and RESETS them (called per chunk under a live progress
    bar, once at the end otherwise). ``stats`` provides
    ``elapsed_time_seconds`` / ``update_elapsed_time``.

    Policy (mirrors the tunneled-device economics documented on
    :meth:`ChunkedScanDriver.run`): without a time limit or live bar, chunks
    are dispatched asynchronously (pipelined) with ONE final sync; otherwise
    each chunk blocks so elapsed-time accounting (and limits) see real work.
    Default max chunk: 1024 pipelined (amortizes per-dispatch latency),
    ``sync_max_chunk`` = 64 otherwise (time-limit granularity; a power of 4
    so the sync path re-uses the async path's compiled sizes).

    Returns the number of iterations completed (a time limit may stop early).
    """
    pipelined = time_limit_seconds is None and not show_progress
    explicit_max_chunk = max_chunk is not None
    if max_chunk is None:
        max_chunk = 1024 if pipelined else sync_max_chunk
    # An explicitly passed max_chunk bounds the fast path too (callers that
    # cap chunk size mean it); the default-policy bound is the larger
    # SINGLE_CHUNK_ITER_LIMIT so reference-native single-call runs (e.g.
    # 1500 iterations) compile as one chunk.
    fast_path_limit = max_chunk if explicit_max_chunk else SINGLE_CHUNK_ITER_LIMIT
    if (
        pipelined
        and 0 < n_iterations <= fast_path_limit
        and (single_chunk_cap is None or n_iterations <= single_chunk_cap)
    ):
        # Single-chunk fast path: a pipelined run needs no mid-run host
        # checkpoints (no time limit, no live bar), so a run that fits in
        # one chunk is ONE trace + ONE compile instead of O(log n) distinct
        # chunk lengths — the dominant cost of a cold front-door call at
        # small scale (VERDICT r3 item 6: single-call latency). Note the
        # per-iteration keys split from the chunk-carried key, so the chunk
        # decomposition is part of a run's seeded stream: seeded
        # repeatability holds per (mode, n_iterations) as before, and the
        # sync path (time limit / progress) keeps its geometric schedule.
        # ``single_chunk_cap``: callers with chunk-level RNG/proposal hoists
        # pass the largest chunk their footprint cap accepts — one oversize
        # chunk would otherwise silently lose the hoist for the WHOLE run
        # (r4 review; e.g. 4096-chain MALA at 1000 iterations).
        schedule = [n_iterations]
    else:
        schedule = chunk_schedule(n_iterations, max_chunk=max_chunk)
    iters_done = 0
    unflushed = 0
    token = None
    run_t0 = time.time()
    pbar = tqdm(total=n_iterations, desc=desc, disable=not show_progress)
    for chunk in schedule:
        if (
            time_limit_seconds is not None
            and stats.elapsed_time_seconds >= time_limit_seconds
        ):
            break
        t0 = time.time()
        token = dispatch(chunk, iters_done)
        if not pipelined:
            jax.block_until_ready(token)
            stats.update_elapsed_time(time.time() - t0)
        iters_done += chunk
        unflushed += chunk
        pbar.update(chunk)
        if show_progress:
            flush(unflushed)
            unflushed = 0
            pbar.set_postfix_str(postfix() if postfix is not None else f"{stats}")
    pbar.close()
    if pipelined and token is not None:
        jax.block_until_ready(token)
        stats.update_elapsed_time(time.time() - run_t0)
    if unflushed:
        flush(unflushed)
    return iters_done


class ChunkedScanDriver:
    """Runs `step_fn` for N iterations as jitted scan chunks with host control.

    One driver instance per sampler; jitted chunk runners are cached per
    (tuning, collect) mode and re-specialized by XLA per chunk length.
    """

    def __init__(
        self,
        event_shape: Tuple[int, ...],
        make_step: Optional[Callable[[bool], StepFn]] = None,
        data_transform: Optional[Callable[[jax.Array], jax.Array]] = None,
        emit_transform: Optional[Callable[[jax.Array], jax.Array]] = None,
        make_precompute: Optional[Callable[[bool], Callable]] = None,
        make_step_aux: Optional[Callable[[bool], Callable]] = None,
        unroll: int = 1,
        hoist_per_iter: Optional[Callable[[jax.Array], int]] = None,
    ):
        self.event_shape = tuple(event_shape)
        self.make_step = make_step
        # Footprint of one iteration's hoisted draws (f32 elements, as a
        # function of the chain-state array). When provided alongside
        # make_precompute, run() caps the single-chunk fast path so the
        # whole-run chunk never exceeds the DEFAULT footprint threshold —
        # an oversize single chunk would silently lose the hoist (r4 review).
        # The cap deliberately uses the module constant, NOT the sampler's
        # tunable rng_hoist_element_limit: the chunk schedule feeds the
        # per-chunk key split, so it must depend only on static workload
        # shape — tests that force the in-scan fallback via limit=0 must see
        # the identical schedule (and hence the identical random stream).
        self.hoist_per_iter = hoist_per_iter
        # lax.scan unroll factor (MCMCParameters.scan_unroll): pure scheduling
        # hint, bit-identical results, amortizes TPU scan-loop overhead for
        # tiny step bodies at the cost of linearly larger compiled programs.
        self.unroll = max(1, int(unroll))
        # State-independent per-iteration work can be hoisted out of the scan
        # and computed for the WHOLE chunk in one batched pass: flow proposals
        # (base draw + coupling inverse + log-prob + target eval — (chunk*C,
        # *event) matmuls tile onto the MXU) and plain per-step RNG (noise +
        # accept uniforms; the in-scan serial threefry chains are ~30% of a
        # small-chain MALA step). When set, ``make_precompute(tuning)``
        # returns ``fn(x, kstate, keys) -> aux`` (a pytree with leading dim =
        # chunk, or None to decline — e.g. a size guard for huge
        # chunk*chains*event footprints) and iterations run through
        # ``make_step_aux(tuning)`` = ``step(x, kstate, key, aux_i)``; when
        # the precompute declines (or is absent) they run through plain
        # ``make_step``. RNG parity: the precompute must derive per-iteration
        # keys exactly as the in-scan step would.
        self.make_precompute = make_precompute
        self.make_step_aux = make_step_aux
        if make_step is None and (make_step_aux is None or make_precompute is None):
            raise ValueError("need make_step, or make_step_aux + make_precompute")
        # data_transform feeds the in-scan moment accumulators (NeuTra maps
        # latent -> data, reference ``neutra.py:122``); emit_transform maps the
        # carried state to what gets *stored* (TESS stores x = f^{-1}(u) while
        # carrying u, reference ``tess.py:53-75``). XLA CSEs the recompute when
        # the step already evaluated the same transform.
        self.data_transform = data_transform or (lambda v: v)
        self.emit_transform = emit_transform
        self._runners = {}

    def _runner(self, tuning: bool, collect: bool):
        cache_key = (tuning, collect)
        if cache_key not in self._runners:
            step_fn = self.make_step(tuning) if self.make_step else None
            step_aux_fn = self.make_step_aux(tuning) if self.make_step_aux else None
            precompute_fn = self.make_precompute(tuning) if self.make_precompute else None
            data_transform = self.data_transform
            emit_transform = self.emit_transform
            unroll = self.unroll

            def run_chunk(x, kstate, acc, key, chunk):
                # Per-iteration keys derive inside the compiled chunk and the
                # carried key returns for the next chunk: the host issues ONE
                # device call per chunk (a remote/tunneled device charges
                # milliseconds per dispatch, so the two host-side key splits
                # the loop used to do per chunk were real money).
                keys = jax.random.split(key, chunk + 1)
                key_next, keys = keys[0], keys[1:]
                aux = precompute_fn(x, kstate, keys) if precompute_fn else None
                use_aux = aux is not None  # trace-time decision
                if not use_aux and step_fn is None:
                    raise RuntimeError(
                        "driver precompute declined (returned None) but no plain "
                        "make_step fallback was provided"
                    )
                xs = (keys, aux) if use_aux else keys

                def body(carry, xs_i):
                    x, ks, acc = carry
                    if use_aux:
                        key_i, aux_i = xs_i
                        x_new, ks_new, info = step_aux_fn(x, ks, key_i, aux_i)
                    else:
                        x_new, ks_new, info = step_fn(x, ks, xs_i)
                    acc_new = acc.add(info, data_transform(x_new))
                    if collect:
                        emit = emit_transform(x_new) if emit_transform else x_new
                    else:
                        emit = None
                    return (x_new, ks_new, acc_new), emit

                (x, kstate, acc), ys = jax.lax.scan(
                    body, (x, kstate, acc), xs, unroll=unroll
                )
                return x, kstate, acc, key_next, ys

            self._runners[cache_key] = jax.jit(
                run_chunk, donate_argnums=(0, 2), static_argnums=(4,)
            )
        return self._runners[cache_key]

    def run(
        self,
        x0: jax.Array,
        kstate,
        key: jax.Array,
        n_iterations: int,
        *,
        stats: MCMCStatistics,
        samples: Optional[MCMCSamples] = None,
        calls_per_iter: int = 0,
        grads_per_iter: int = 0,
        tuning: bool = False,
        collect: bool = True,
        time_limit_seconds: Optional[float] = None,
        show_progress: bool = False,
        desc: str = "MCMC",
        max_chunk: Optional[int] = None,
        kernel_repr: Optional[Callable[[object], str]] = None,
    ):
        """Run the chain; mutates ``stats``/``samples``; returns (x, kstate).

        The statistics accumulator is carried on-device across ALL chunks and
        fetched in a single host transfer at the end of the run — on a
        remote/tunneled device, per-chunk transfers would dominate wall-clock.
        With ``show_progress`` the fetch happens per chunk instead so the bar
        can display live rates.

        When neither a time limit nor a progress bar needs per-chunk
        wall-clock, chunks are *pipelined*: dispatched asynchronously without
        blocking, so the device streams through the whole run with one final
        sync instead of one round-trip per chunk (the tunneled host link makes
        each sync cost tens of milliseconds — SURVEY.md section 3's hot loops
        are sync-free on the reference's side too, it just pays per-op eager
        dispatch instead). Caveat: host-side sample storage (the default
        ``store_samples=True`` without ``store_samples_on_device``) fetches
        each chunk's draws to host RAM, which implicitly syncs per chunk —
        full pipelining applies with on-device storage or no storage.
        """
        runner = self._runner(tuning, collect)
        # Copy: chunk runners donate their carry buffers; never consume the
        # caller's x0 storage.
        st = {
            "x": jnp.array(x0, dtype=jnp.float32, copy=True),
            "kstate": kstate,
            "key": key,
            "acc": StatsAccum.zeros(self.event_shape),
        }
        n_chains = st["x"].shape[0]
        event_elems = int(np.prod(self.event_shape)) if self.event_shape else 1

        # Pipelined collect-mode runs with host storage defer the per-chunk
        # sample fetch: chunks' emitted draws stay on device and ONE
        # end-of-run D2H feeds the store (per-chunk `samples.add` converts to
        # numpy, which blocks ~a tunnel round trip per chunk and serializes
        # the pipeline — the dominant cost of a warm single front-door call
        # at reference-native scale, VERDICT r4 item 1). Guarded by a total-
        # run footprint cap; above it (or in sync mode, where per-chunk
        # flushes are the point) draws stream per chunk as before. Fetch
        # order and thinning/max_samples/last_sample semantics are identical:
        # the store consumes the same rows in the same order, just later.
        defer_store = (
            samples is not None
            and collect
            and not samples.on_device
            and time_limit_seconds is None
            and not show_progress
            and n_iterations * n_chains * event_elems <= SAMPLE_DEFER_ELEMENT_LIMIT
        )
        deferred_blocks: list = []

        def dispatch(chunk, _iters_done):
            x, ks, acc, k, ys = runner(st["x"], st["kstate"], st["acc"], st["key"], chunk)
            st.update(x=x, kstate=ks, acc=acc, key=k)
            if samples is not None and collect:
                if defer_store:
                    deferred_blocks.append(ys)
                else:
                    samples.add(ys)
            # collect=False: NO per-chunk add — MCMCSamples.add fetches to
            # host before its store check, and only the final state's
            # last_sample is ever consumed; the run-end add below covers it
            # (per-chunk adds would serialize the pipelined no-storage path
            # with one D2H round trip per chunk over the tunnel).
            return x

        def flush(iters):
            acc_host = jax.device_get(st["acc"])
            st["acc"] = StatsAccum.zeros(self.event_shape)
            stats.update_counters(
                n_accepted_trajectories=int(acc_host.n_accepted),
                n_attempted_trajectories=iters * n_chains,
                n_divergences=int(acc_host.n_divergences),
                n_target_calls=iters * calls_per_iter
                + int(round(float(acc_host.n_calls_dyn) + float(acc_host.c_calls_dyn))),
                n_target_gradient_calls=iters * grads_per_iter
                + int(round(float(acc_host.n_grads_dyn) + float(acc_host.c_grads_dyn))),
            )
            sum_x, sum_x2 = acc_host.moment_sums()
            stats.update_moments_from_sums(sum_x, sum_x2, iters * n_chains)

        def postfix():
            s = f"{stats}"
            if kernel_repr is not None:
                s += f" | {kernel_repr(st['kstate'])}"
            return s

        # Single-chunk fast-path caps. Both depend only on static workload
        # shape (chain count, event size, storage mode) — the chunk schedule
        # feeds the per-chunk key split, so anything tunable would fork the
        # seeded stream (limit=0 hoist-fallback parity tests pin this).
        caps = []
        if self.make_precompute is not None and self.hoist_per_iter is not None:
            # one oversize whole-run chunk would exceed the precompute's
            # footprint gate and silently lose the hoist for the entire run
            caps.append(max(
                1,
                RNG_HOIST_ELEMENT_LIMIT
                // max(1, int(self.hoist_per_iter(st["x"]))),
            ))
        if samples is not None and collect:
            # collect mode materializes the chunk's (chunk, C, *event) draw
            # buffer in HBM before it is stored/fetched
            caps.append(max(1, RNG_HOIST_ELEMENT_LIMIT // max(1, n_chains * event_elems)))
        hoist_cap = min(caps) if caps else None
        iters_done = run_chunk_loop(
            n_iterations,
            dispatch=dispatch,
            stats=stats,
            flush=flush,
            time_limit_seconds=time_limit_seconds,
            show_progress=show_progress,
            desc=desc,
            sync_max_chunk=64,
            max_chunk=max_chunk,
            postfix=postfix,
            single_chunk_cap=hoist_cap,
        )
        if deferred_blocks:
            # ONE device concat + ONE host fetch for the whole run's draws
            blk = (
                deferred_blocks[0]
                if len(deferred_blocks) == 1
                else jnp.concatenate(deferred_blocks, axis=0)
            )
            samples.add(blk)
        if samples is not None and not collect and iters_done > 0:
            # single run-end fetch keeps last_sample semantics without the
            # per-chunk D2H the no-storage path used to pay
            x = st["x"]
            samples.add(self.emit_transform(x) if self.emit_transform else x)
        return st["x"], st["kstate"]
