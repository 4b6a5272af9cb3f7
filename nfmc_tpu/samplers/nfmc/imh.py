"""Independence Metropolis-Hastings with a flow proposal (fixed + adaptive).

Parity with reference ``nfmc/algorithms/sampling/nfmc/imh.py``:

* warmup = reverse-KL ``variational_fit`` to the target, output = one batch of
  flow samples (``imh.py:27-36,67-75``);
* ``FixedIMH``: flow proposal + MH accept with the cached ``flow_log_prob_x``
  updated on acceptance (``imh.py:214-236``); 2B target calls/iter
  (``imh.py:244``). TPU-native: the flow is *fixed* during sampling, so the
  entire run is one jitted chunked scan — proposal sampling (base draw +
  coupling inverse), target evals, and accept masks never leave the device;
* ``AdaptiveIMH``: same accept step (jitted, flow params threaded as an
  argument), then with probability ``adaptation_dropoff ** i`` a 1-epoch refit
  on one stored historical batch chosen by ``train_distribution`` in
  {uniform, bounded_geom_approx, bounded_geom} (``imh.py:152-175``), with
  weight rollback on failure. Counter quirk kept for parity: the reference
  logs the 2B accept-step evaluations as *gradient* calls (``imh.py:146``).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.driver import (
    RNG_HOIST_ELEMENT_LIMIT,
    ChunkedScanDriver,
    StepInfo,
    flow_proposal_footprint_per_draw,
    hoisted_flow_proposals,
)
from ...core.output import MCMCOutput
from ...core.rng import resolve_key
from ...core.sampler import NFMCKernel, NFMCParameters, Sampler
from ...utils import metropolis_acceptance_log_ratio, unevaluable_current_mask

from ...utils import tqdm  # shared fallback shim


@dataclass
class IMHKernel(NFMCKernel):
    pass


@dataclass
class IMHParameters(NFMCParameters):
    train_distribution: str = "uniform"
    adaptation_dropoff: float = 0.9999
    warmup_fit_kwargs: Optional[dict] = None

    def __post_init__(self):
        super().__post_init__()
        if self.train_distribution not in ("bounded_geom_approx", "bounded_geom", "uniform"):
            raise ValueError(f"bad train_distribution: {self.train_distribution}")
        if self.warmup_fit_kwargs is None:
            # Reference defaults at ``imh.py:27-36`` use n_samples=1 (one draw
            # per reverse-KL step); we default to a 128-draw batch — same
            # estimator, far lower gradient variance, near-free on the MXU.
            self.warmup_fit_kwargs = {
                "early_stopping": True,
                "early_stopping_threshold": 50,
                "keep_best_weights": True,
                "n_samples": 128,
                "n_epochs": 500,
                "lr": 0.005,  # reference 0.05 (``imh.py:27-36``) diverges; see flows/train.py
                "check_for_divergences": True,
            }


def sample_bounded_geom(rng: np.random.Generator, p: float, max_val: int) -> int:
    """Exact bounded-geometric index sampler; reference ``imh.py:39-45``."""
    v = np.arange(0, max_val + 1)
    pdf = p * (1 - p) ** (max_val - v) / (1 - (1 - p) ** (max_val + 1))
    cdf = np.cumsum(pdf)
    return int(np.searchsorted(cdf, rng.uniform(), side="right"))


class AbstractIMH(Sampler):
    # footprint cap for the chunk-hoisted proposal precompute (see
    # core/driver.py RNG_HOIST_ELEMENT_LIMIT)
    rng_hoist_element_limit: int = RNG_HOIST_ELEMENT_LIMIT

    def __init__(self, event_shape, target, kernel: Optional[IMHKernel] = None,
                 params: Optional[IMHParameters] = None):
        if kernel is None:
            kernel = IMHKernel(event_shape)
        if params is None:
            params = IMHParameters()
        super().__init__(event_shape, target, kernel, params)

    @property
    def name(self):
        return "Abstract IMH"

    def warmup(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        key = self._key(key, seed)
        k_fit, k_draw = jax.random.split(key)
        # merge (user kwargs win) rather than passing show_progress/key
        # twice: a user-supplied 'show_progress' in warmup_fit_kwargs must
        # not raise TypeError (round-3 review fix, same as NeuTra.warmup)
        fit_kwargs = {
            "show_progress": show_progress,
            "time_limit_seconds": time_limit_seconds,
            "key": k_fit,
            **self.params.warmup_fit_kwargs,
        }
        self.kernel.flow.variational_fit(lambda v: -self.target(v), **fit_kwargs)
        out = MCMCOutput(self.event_shape, store_samples=self.params.store_samples)
        out.running_samples.add(self.kernel.flow.sample(x0.shape[0], key=k_draw))
        return out

    def _make_accept_core(self):
        """Accept logic given an already-materialized proposal.

        ``(x, flp_x, u_x, x', flp', u', k_acc) -> (x_new, flp_new, u_new,
        mask, diverged)``. Both the flow log-prob of the current state
        (reference semantics, ``imh.py:214-236``) and its target potential are
        carried and updated through the accept mask: one target call per
        iteration instead of two on expensive targets (reported counters keep
        the reference contract).
        """
        event_ndim = len(self.event_shape)

        def accept_core(x, flp_x, u_x, x_prime, flp_prime, u_prime, k_acc):
            n_chains = x.shape[0]
            log_alpha = metropolis_acceptance_log_ratio(
                log_prob_target_curr=-u_x,
                log_prob_target_prime=-u_prime,
                log_prob_proposal_curr=flp_x,
                log_prob_proposal_prime=flp_prime,
            )
            # Finiteness gates the PROPOSAL side only (position, potential,
            # flow log-prob): a bad CURRENT state (U(x)=+inf at an out-of-
            # support init) makes log_alpha=+inf, which is accept-with-
            # probability-1 by the MH math and is exactly how chains escape
            # bad inits — guarding on isfinite(log_alpha) froze them forever
            # (round-3 review fix). Other non-finite current sides (NaN
            # potential, flow-zero-density state) can't accept through the
            # comparison; `unevaluable_current_mask` force-moves them.
            finite = (
                jnp.all(jnp.isfinite(x_prime.reshape(n_chains, -1)), axis=-1)
                & jnp.isfinite(u_prime)
                & jnp.isfinite(flp_prime)
            )
            curr_bad = unevaluable_current_mask(u_x, flp_x)
            log_u = jnp.log(jax.random.uniform(k_acc, (n_chains,)))
            mask = ((log_u < log_alpha) | curr_bad) & finite
            bmask = mask.reshape(mask.shape + (1,) * event_ndim)
            x_new = jnp.where(bmask, x_prime, x)
            flp_new = jnp.where(mask, flp_prime, flp_x)
            u_new = jnp.where(mask, u_prime, u_x)
            diverged = (~jnp.all(finite)).astype(jnp.int32)
            return x_new, flp_new, u_new, mask, diverged

        return accept_core

    def _make_accept_step(self):
        """Pure fn (params, x, flp_x, u_x, key) -> (x', flp', u', mask, diverged)."""
        flow = self.kernel.flow
        target = self.target
        accept_core = self._make_accept_core()

        def accept_step(params, x, flp_x, u_x, key):
            n_chains = x.shape[0]
            k_prop, k_acc = jax.random.split(key)
            x_prime, flp_prime = flow.sample_fn(params, k_prop, n_chains, return_log_prob=True)
            u_prime = target(x_prime)
            return accept_core(x, flp_x, u_x, x_prime, flp_prime, u_prime, k_acc)

        return accept_step


class FixedIMH(AbstractIMH):
    @property
    def name(self):
        return "Fixed IMH"

    def sample(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        key = self._key(key, seed)
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        n_chains = x0.shape[0]
        out = MCMCOutput(self.event_shape, store_samples=self.params.store_samples,
                         on_device=getattr(self.params, 'store_samples_on_device', False))

        accept_core = self._make_accept_core()
        accept_step = self._make_accept_step()
        flow = self.kernel.flow
        target = self.target
        event_shape = self.event_shape
        hoist_limit = self.rng_hoist_element_limit
        # Guard against the true peak (draws + inverse working set), not just
        # the draws (ADVICE round 1; see flow_proposal_footprint_per_draw)
        per_draw = flow_proposal_footprint_per_draw(flow, int(np.prod(event_shape)))

        def make_precompute(tuning):
            # Proposals are independent of the chain state: one base draw +
            # coupling inverse + proposal log-prob + target eval for the WHOLE
            # chunk, as (chunk*C, *event) batches that tile onto the MXU. The
            # scan body is left with pure elementwise accept logic. Key
            # derivation matches _make_accept_step (k_prop = split(key)[0]).
            # Declines above the footprint cap (falls back to the in-scan
            # accept step below) — the batched inverse materializes
            # (chunk*C, *event) positions plus coupling activations.
            def precompute(x, kstate, keys):
                params, flp_x, _u_x = kstate
                chunk, n_chains = keys.shape[0], flp_x.shape[0]
                if chunk * n_chains * per_draw > hoist_limit:
                    return None
                k_props = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
                return hoisted_flow_proposals(
                    flow, params, k_props, n_chains, event_shape, target=target
                )

            return precompute

        def make_step_aux(tuning):
            def step(x, kstate, key, aux):
                params, flp_x, u_x = kstate
                x_prime, flp_prime, u_prime = aux
                k_acc = jax.random.split(key)[1]
                x_new, flp_new, u_new, mask, diverged = accept_core(
                    x, flp_x, u_x, x_prime, flp_prime, u_prime, k_acc
                )
                info = StepInfo(
                    n_accepted=jnp.sum(mask).astype(jnp.int32), diverged=diverged
                )
                return x_new, (params, flp_new, u_new), info

            return step

        def make_step(tuning):
            # in-scan fallback when the proposal precompute declines
            def step(x, kstate, key):
                params, flp_x, u_x = kstate
                x_new, flp_new, u_new, mask, diverged = accept_step(
                    params, x, flp_x, u_x, key
                )
                info = StepInfo(
                    n_accepted=jnp.sum(mask).astype(jnp.int32), diverged=diverged
                )
                return x_new, (params, flp_new, u_new), info

            return step

        # The step/precompute bake in the flow structure, its base-log-prob
        # override and the target (params are threaded through the scan
        # carry), so the driver is reusable across calls and flow refits.
        driver = self._cached_driver(
            (id(flow), id(flow.bijection), id(flow._base_log_prob_override),
             id(self.target), self.rng_hoist_element_limit,
             getattr(self.params, "scan_unroll", 1)),
            lambda: ChunkedScanDriver(
                self.event_shape, make_step,
                make_step_aux=make_step_aux, make_precompute=make_precompute,
                unroll=getattr(self.params, "scan_unroll", 1),
                hoist_per_iter=lambda x: x.shape[0] * per_draw,
            ),
            keepalive=(flow, flow.bijection, flow._base_log_prob_override, self.target),
        )
        t0 = time.time()
        flp0 = flow.log_prob(x0)
        u0 = self.target(x0)
        out.statistics.update_elapsed_time(time.time() - t0)
        driver.run(
            x0,
            (flow.params, flp0, u0),
            key,
            self.params.n_iterations,
            stats=out.statistics,
            samples=out.running_samples,
            calls_per_iter=2 * n_chains,
            grads_per_iter=0,
            collect=self.params.store_samples,
            time_limit_seconds=time_limit_seconds,
            show_progress=show_progress,
            desc=self.name,
        )
        out.kernel = self.kernel
        return out


class AdaptiveIMH(AbstractIMH):
    # Footprint cap (f32 elements) for the fused path's on-device draw
    # history — a DEDICATED knob: the unrelated rng_hoist_element_limit
    # (proposal/RNG hoisting) must not silently switch the sampling
    # algorithm path (same lesson as JumpNFMC's separate proposal limit).
    history_element_limit: int = RNG_HOIST_ELEMENT_LIMIT

    def __init__(self, event_shape, target, kernel=None, params=None):
        super().__init__(event_shape, target, kernel, params)
        if not self.params.store_samples:
            print("Warning: params.store_samples is False")
            print("Warning: setting params.store_samples to True")
            self.params.store_samples = True

    @property
    def name(self):
        return "Adaptive IMH"

    def _adaptation_schedule(self, rng: np.random.Generator, start: int,
                             chunk: int, offset: int = 0):
        """Host-precomputed (do_fit, k_idx) for iterations [start, start+chunk):
        the adaptation decision (prob ``dropoff**i``) and the historical batch
        index depend only on the iteration index — ``n_samples`` at iteration
        i is exactly i+1 — so the whole schedule is known before the chunk
        runs. Draw order matches the host loop exactly (same rng stream).

        ``offset`` shifts only the DROPOFF exponent: on a checkpointed
        continuation the adaptation probability keeps decaying from where the
        run left off, while batch indices stay local to this run's history
        buffer. Segments re-window the history: with the DEFAULT
        ``train_distribution='uniform'`` an unsegmented run draws training
        batches over all past iterations while a continuation draws only
        within the current segment (a recency bias — a documented deviation);
        the bounded distributions draw recent batches anyway, so for them the
        re-window is immaterial."""
        do_fit = np.zeros(chunk, dtype=bool)
        k_idx = np.zeros(chunk, dtype=np.int32)
        for j in range(chunk):
            i_abs = start + j
            if rng.uniform() < self.params.adaptation_dropoff ** (offset + i_abs):
                n_samples = i_abs + 1
                if self.params.train_distribution == "uniform":
                    k = int(rng.integers(0, n_samples))
                elif self.params.train_distribution == "bounded_geom_approx":
                    k = int(rng.integers(max(0, n_samples - 100), n_samples))
                else:
                    k = sample_bounded_geom(rng, p=0.025, max_val=n_samples - 1)
                do_fit[j] = True
                k_idx[j] = k
        return do_fit, k_idx

    def extra_resumable_state(self):
        """Checkpoint hook: the absolute adaptation-schedule position."""
        n = int(getattr(self, "_iters_done", 0))
        return {} if n == 0 else {"imh_iters_done": np.int64(n)}

    def restore_extra_resumable_state(self, state) -> None:
        if "imh_iters_done" in state:
            self._iters_done = int(state["imh_iters_done"])

    def _get_fused_runner(self, n_chains: int):
        """Whole-iteration scan step: accept + history write + (conditional)
        1-epoch refit on a historical batch, one device dispatch per chunk.

        The host path issues per iteration one accept dispatch, two counter
        syncs, a sample D2H, and (early on, with prob ~1) a refit whose
        ``flow.fit`` fetches the training batch to host — each sync costs real
        latency on a tunneled device. Here the draw history lives on device
        and the refit is :func:`nfmc_tpu.flows.train.make_scan_fit` (fresh
        Adam, 1 epoch, finite-guard rollback — same effort as the host path's
        ``fit(n_epochs=1)``; RNG stream differs, statistics match)."""
        flow = self.kernel.flow
        config = (id(flow), id(flow.bijection), id(flow._base_log_prob_override),
                  id(self.target), n_chains)

        def build():
            from ...core.driver import StatsAccum
            from ...flows.train import make_scan_fit

            accept_step = self._make_accept_step()
            scan_fit = make_scan_fit(flow, n_chains, n_epochs=1)
            log_prob_fn = flow.log_prob_fn

            def run_chunk(params, x, flp, u, hist, i0, acc, key, do_fit, k_idx, chunk):
                keys = jax.random.split(key, chunk + 1)
                key_next, keys = keys[0], keys[1:]

                def body(carry, xs):
                    params, x, flp, u, hist, i, acc = carry
                    key_i, df, ki = xs
                    k_step, k_fit = jax.random.split(key_i)
                    x, flp, u, mask, div = accept_step(params, x, flp, u, k_step)
                    hist = jax.lax.dynamic_update_index_in_dim(hist, x, i, 0)

                    def fit_branch(args):
                        p, _flp = args
                        xt = jax.lax.dynamic_index_in_dim(hist, ki, 0, keepdims=False)
                        p2 = scan_fit(p, xt, k_fit)
                        # cached proposal density of the current state is
                        # stale after a refit (host path: flow.log_prob(x))
                        return p2, log_prob_fn(p2, x)

                    params, flp = jax.lax.cond(df, fit_branch, lambda a: a, (params, flp))
                    acc = acc.add(
                        StepInfo(n_accepted=jnp.sum(mask).astype(jnp.int32), diverged=div), x
                    )
                    return (params, x, flp, u, hist, i + 1, acc), None

                (params, x, flp, u, hist, _i, acc), _ = jax.lax.scan(
                    body, (params, x, flp, u, hist, i0, acc), (keys, do_fit, k_idx)
                )
                return params, x, flp, u, hist, acc, key_next

            return jax.jit(run_chunk, donate_argnums=(1, 4, 6), static_argnums=(10,))

        return self._memo(
            "adaptive_imh_fused", config, build,
            keepalive=(flow, flow.bijection, flow._base_log_prob_override, self.target),
        )

    def sample_continue(self, x0, **kwargs) -> MCMCOutput:
        """Continuation entry (checkpointed segments): the adaptation
        schedule keeps decaying from the absolute iteration count instead of
        resetting to refit-probability ~1 at every segment boundary. The
        training history re-windows per segment (see
        :meth:`_adaptation_schedule`)."""
        self._continue_offset = int(getattr(self, "_iters_done", 0))
        try:
            return self.sample(x0, **kwargs)
        finally:
            self._continue_offset = 0

    def sample(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        key = self._key(key, seed)
        if not self.params.store_samples:
            self.params.store_samples = True
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        n_chains = x0.shape[0]
        n_total = self.params.n_iterations
        event_size = int(np.prod(self.event_shape)) if self.event_shape else 1
        offset = int(getattr(self, "_continue_offset", 0))

        # Fused path unless the on-device history would be large.
        if n_total * n_chains * event_size <= self.history_element_limit:
            return self._sample_fused(x0, key, n_chains, n_total,
                                      show_progress, time_limit_seconds,
                                      offset=offset)

        out = MCMCOutput(self.event_shape, store_samples=True,
                         on_device=getattr(self.params, 'store_samples_on_device', False))
        # split FIRST: consuming `key` for the numpy seed and then splitting
        # the same key would derive the adaptation schedule and the accept
        # draws from identical key material (round-3 review fix, cf. DLMC)
        key, k_sched = jax.random.split(key)
        rng = np.random.default_rng(int(jax.random.randint(k_sched, (), 0, 2**31 - 1)))

        # One jitted accept step per (flow object incl. base-log-prob
        # override, target); params are an argument, so per-iteration refits
        # never retrace.
        flow = self.kernel.flow
        accept_step = self._memo(
            "accept_step",
            (id(flow), id(flow.bijection), id(flow._base_log_prob_override), id(self.target)),
            lambda: jax.jit(self._make_accept_step()),
            keepalive=(flow, flow.bijection, flow._base_log_prob_override, self.target),
        )

        t0 = time.time()
        x = x0
        flp_x = flow.log_prob(x)
        u_x = self.target(x)
        out.statistics.update_elapsed_time(time.time() - t0)

        completed = 0
        for i in tqdm(range(self.params.n_iterations), desc=self.name, disable=not show_progress):
            if (
                time_limit_seconds is not None
                and out.statistics.elapsed_time_seconds >= time_limit_seconds
            ):
                break
            completed = i + 1
            t0 = time.time()
            key, k_step = jax.random.split(key)
            x, flp_x, u_x, mask, diverged = accept_step(flow.params, x, flp_x, u_x, k_step)
            out.statistics.update_counters(
                # Reference-bug parity: accept-step target evals logged as
                # gradient calls (``imh.py:146``).
                n_target_gradient_calls=2 * n_chains,
                n_accepted_trajectories=int(jnp.sum(mask)),
                n_attempted_trajectories=n_chains,
                n_divergences=int(diverged),
            )
            out.statistics.expectations.update(x)
            out.running_samples.add(x)

            # probabilistic adaptation on one stored historical batch
            alpha_prime = self.params.adaptation_dropoff ** (offset + i)
            if rng.uniform() < alpha_prime:
                n_samples = out.running_samples.n_samples
                if self.params.train_distribution == "uniform":
                    k = int(rng.integers(0, n_samples))
                elif self.params.train_distribution == "bounded_geom_approx":
                    k = int(rng.integers(max(0, n_samples - 100), n_samples))
                else:
                    k = sample_bounded_geom(rng, p=0.025, max_val=n_samples - 1)
                x_train = out.running_samples[k]
                flow_weights = flow.state_dict()
                try:
                    flow.fit(x_train, n_epochs=1, show_progress=False)
                    flp_x = flow.log_prob(x)  # cached proposal density is stale
                except ValueError:
                    flow.load_state_dict(flow_weights)
            out.statistics.update_elapsed_time(time.time() - t0)

        # absolute adaptation-schedule position: only ACTUALLY completed
        # iterations count (a time-limit break must not skip ahead)
        self._iters_done = offset + completed
        out.kernel = self.kernel
        return out

    def _sample_fused(self, x0, key, n_chains, n_total, show_progress,
                      time_limit_seconds, offset: int = 0) -> MCMCOutput:
        from ...core.driver import StatsAccum, run_chunk_loop

        flow = self.kernel.flow
        out = MCMCOutput(self.event_shape, store_samples=True,
                         on_device=getattr(self.params, 'store_samples_on_device', False))
        # seed/stream order matches the host path (dedicated schedule key
        # split off before the per-iteration splits — round-3 review fix)
        key, k_sched = jax.random.split(key)
        rng = np.random.default_rng(int(jax.random.randint(k_sched, (), 0, 2**31 - 1)))
        runner = self._get_fused_runner(n_chains)

        t0 = time.time()
        st = {
            "params": flow.params,
            "x": jnp.array(x0, copy=True),
            "hist": jnp.zeros((n_total, n_chains, *self.event_shape),
                              dtype=jnp.float32),
            "key": key,
            "acc": StatsAccum.zeros(self.event_shape),
        }
        st["flp"] = flow.log_prob_fn(st["params"], st["x"])
        st["u"] = self.target(st["x"])
        out.statistics.update_elapsed_time(time.time() - t0)

        # The pipelining / chunk-size / time-limit policy lives in ONE place —
        # core.driver.run_chunk_loop — shared with ChunkedScanDriver.run and
        # JumpNFMC._sample_fused. The carry here (flow params + draw history)
        # threads through the dispatch closure.
        def dispatch(chunk, iters_done):
            do_fit, k_idx = self._adaptation_schedule(rng, iters_done, chunk,
                                                      offset=offset)
            params, x, flp, u, hist, acc, k = runner(
                st["params"], st["x"], st["flp"], st["u"], st["hist"],
                jnp.int32(iters_done), st["acc"], st["key"],
                jnp.asarray(do_fit), jnp.asarray(k_idx), chunk,
            )
            st.update(params=params, x=x, flp=flp, u=u, hist=hist, acc=acc,
                      key=k)
            return x

        def flush(iters):
            acc_host = jax.device_get(st["acc"])
            st["acc"] = StatsAccum.zeros(self.event_shape)
            out.statistics.update_counters(
                n_accepted_trajectories=int(acc_host.n_accepted),
                n_attempted_trajectories=iters * n_chains,
                n_divergences=int(acc_host.n_divergences),
                # Reference-bug parity: accept-step target evals logged as
                # gradient calls (``imh.py:146``).
                n_target_gradient_calls=2 * n_chains * iters,
            )
            sum_x, sum_x2 = acc_host.moment_sums()
            out.statistics.update_moments_from_sums(sum_x, sum_x2, iters * n_chains)

        iters_done = run_chunk_loop(
            n_total,
            dispatch=dispatch,
            stats=out.statistics,
            flush=flush,
            time_limit_seconds=time_limit_seconds,
            show_progress=show_progress,
            desc=self.name,
            sync_max_chunk=256,
        )
        params, hist = st["params"], st["hist"]
        if iters_done:
            out.running_samples.add(hist[:iters_done])
        self._iters_done = offset + iters_done  # actual completed count
        flow.params = params
        out.kernel = self.kernel
        return out
