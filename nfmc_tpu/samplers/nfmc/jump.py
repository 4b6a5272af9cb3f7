"""Jump NFMC: inner MCMC trajectories interleaved with flow jump proposals.

Parity with reference ``nfmc/algorithms/sampling/nfmc/jump.py``:

* per outer iteration: run the inner sampler for ``inner.n_iterations`` steps,
  optionally refit the flow on those samples (``fit_nf``, gated by
  ``n_jumps_before_training``; ``jump.py:193-201``), then an MH-adjusted flow
  jump in data space (``jump.py:203-231``; unadjusted mode accepts all);
* output interleaving law: ``(n_iterations * (inner_n + 1), C, *event)``
  (asserted by reference ``test/test_samplers.py:140-144``);
* separate jump counters ``n_accepted/attempted_jumps`` (``jump.py:41-73``);
* warmup: inner-sampler warmup on 70% of the time budget, then a flow MLE fit
  on the warmup samples with weight rollback on failure (``jump.py:111-151``).

TPU-native: with ``fit_nf=False`` (the default) the flow is frozen during
sampling, so the *entire* outer loop compiles to a chunked scan whose body
nests the inner sampler's scan — one device program per chunk instead of the
reference's (outer x inner) eager Python iterations. With ``fit_nf=True`` the
outer loop runs host-side (flow training has data-dependent control flow) with
the inner trajectory + jump step still jitted.
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
    StatsAccum,
    flow_proposal_footprint_per_draw,
    hoisted_flow_proposals,
)
from ...core.output import JumpNFMCOutput, MCMCOutput
from ...core.sampler import MCMCKernel, MCMCParameters, NFMCKernel, NFMCParameters, Sampler
from ...core.tuning import train_val_split
from ...utils import metropolis_acceptance_log_ratio, unevaluable_current_mask
from ..mcmc.chees import CheesHMC
from ..mcmc.ensemble import AIES
from ..mcmc.ess import ESS
from ..mcmc.hmc import HMC, UHMC
from ..mcmc.langevin import MALA, ULA
from ..mcmc.mh import MH
from ..mcmc.nuts import NUTS

from ...utils import tqdm  # shared fallback shim


@dataclass
class JumpNFMCParameters(NFMCParameters):
    adjusted_jumps: bool = True
    fit_nf: bool = False
    warmup_fit_kwargs: Optional[dict] = None
    n_jumps_before_training: int = 10
    # lax.scan unroll factors for the fused outer loop. The headline workload
    # (100 chains x 100-d) is dispatch-bound, not FLOP-bound: unrolling lets
    # XLA fuse across trajectory steps / outer iterations at the cost of
    # linearly larger programs (compile time). 1 = no unrolling (default).
    fused_unroll_inner: int = 1
    fused_unroll_outer: int = 1

    def __post_init__(self):
        super().__post_init__()
        if self.warmup_fit_kwargs is None:
            self.warmup_fit_kwargs = {
                "early_stopping": True,
                "early_stopping_threshold": 50,
                "keep_best_weights": True,
                "n_epochs": 500,
                "lr": 0.005,  # reference 0.05 (``jump.py:30-38``) diverges; see flows/train.py
            }


class JumpNFMC(Sampler):
    """Requires a flow with efficient inverse (sampling); adjusted jumps also
    need an efficient forward (reference docstring, ``jump.py:85-90``)."""

    def __init__(self, event_shape, target, inner_sampler: Sampler,
                 kernel: Optional[NFMCKernel] = None,
                 params: Optional[JumpNFMCParameters] = None):
        if kernel is None:
            kernel = NFMCKernel(event_shape)
        if params is None:
            params = JumpNFMCParameters()
        super().__init__(event_shape, target, kernel, params)
        self.inner_sampler = inner_sampler
        self._fused = None
        self._fused_config = None
        self._fused_keepalive = None

    # Footprint cap for the jump's OWN chunk-hoisted flow-proposal precompute.
    # Distinct from the inner sampler's rng_hoist_element_limit (which keeps
    # gating the hoisted inner-step draws): zeroing the inner limit — as the
    # RNG-parity tests do — must not silently disable the unrelated proposal
    # hoisting (ADVICE round 1).
    rng_hoist_element_limit: int = RNG_HOIST_ELEMENT_LIMIT

    @property
    def name(self):
        return "Jump MCMC"

    # ------------------------------------------------------------------ warmup
    def warmup(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        key = self._key(key, seed)
        k_inner, k_fit = jax.random.split(key)
        inner_time_limit = 0.7 * time_limit_seconds if time_limit_seconds is not None else None

        t0 = time.time()
        self.inner_sampler.params.store_samples = True
        warmup_output = self.inner_sampler.warmup(
            x0, show_progress=show_progress,
            time_limit_seconds=inner_time_limit, key=k_inner,
        )

        x_train, x_val = train_val_split(
            warmup_output.samples,
            train_pct=self.params.train_pct,
            max_train_size=self.params.max_train_size,
            max_val_size=self.params.max_val_size,
            # Derive the shuffle seed from the run key: default_rng(None)
            # would pull OS entropy and break seeded reproducibility.
            seed=int(jax.random.randint(jax.random.fold_in(k_fit, 1), (), 0, 2**31 - 1)),
        )
        flow_params = self.kernel.flow.state_dict()
        elapsed = time.time() - t0
        fit_limit = (time_limit_seconds - elapsed) if time_limit_seconds is not None else None
        try:
            self.kernel.flow.fit(
                x_train, x_val=x_val,
                **{
                    **self.params.flow_fit_kwargs,
                    **dict(show_progress=show_progress, time_limit_seconds=fit_limit),
                },
                key=k_fit,
            )
        except ValueError:
            self.kernel.flow.load_state_dict(flow_params)
        # Prefer MCMC warmup draws as x0 (flow sampling can produce outliers).
        return warmup_output

    # ---------------------------------------------------------------- jump step
    def _make_jump_accept_core(self):
        """The single jump-accept implementation shared by the in-scan step
        (``_make_jump_step``) and the hoisted-proposal path
        (``_make_jump_accept``) — one copy so a fix cannot silently diverge
        between the fused and host paths (round-3 review).

        ``(params, x, k_acc, x', logq', U(x')) -> (x_new, mask)``; ``U(x')``
        may be ``None`` when ``adjusted_jumps`` is off (it is unused there).
        """
        flow = self.kernel.flow
        target = self.target
        adjusted = self.params.adjusted_jumps
        event_ndim = len(self.event_shape)

        def accept_core(params, x, k_acc, x_prime, f_x_prime, u_x_prime):
            n_chains = x.shape[0]
            if adjusted:
                u_x = target(x)
                f_x = flow.log_prob_fn(params, x)
                log_alpha = metropolis_acceptance_log_ratio(
                    log_prob_target_curr=-u_x,
                    log_prob_target_prime=-u_x_prime,
                    log_prob_proposal_curr=f_x,
                    log_prob_proposal_prime=f_x_prime,
                )
                # Proposal-side finiteness only: a bad CURRENT state
                # (U(x)=+inf) makes log_alpha=+inf = certain accept, the
                # escape route from out-of-support inits; guarding on
                # isfinite(log_alpha) froze such chains forever (round-3
                # review fix, same as AbstractIMH._make_accept_core). NaN /
                # flow-zero-density current sides force-move instead of
                # freezing (`unevaluable_current_mask`).
                finite = (
                    jnp.all(jnp.isfinite(x_prime.reshape(n_chains, -1)), axis=-1)
                    & jnp.isfinite(u_x_prime)
                    & jnp.isfinite(f_x_prime)
                )
                curr_bad = unevaluable_current_mask(u_x, f_x)
                log_u = jnp.log(jax.random.uniform(k_acc, (n_chains,)))
                mask = ((log_u < log_alpha) | curr_bad) & finite
            else:
                mask = jnp.all(jnp.isfinite(x_prime.reshape(n_chains, -1)), axis=-1)
            bmask = mask.reshape(mask.shape + (1,) * event_ndim)
            x_new = jnp.where(bmask, x_prime, x)
            return x_new, mask

        return accept_core

    def _make_jump_step(self):
        flow = self.kernel.flow
        target = self.target
        adjusted = self.params.adjusted_jumps
        accept_core = self._make_jump_accept_core()

        def jump_step(params, x, key):
            n_chains = x.shape[0]
            k_prop, k_acc = jax.random.split(key)
            x_prime, f_x_prime = flow.sample_fn(params, k_prop, n_chains, return_log_prob=True)
            u_x_prime = target(x_prime) if adjusted else None
            return accept_core(params, x, k_acc, x_prime, f_x_prime, u_x_prime)

        return jump_step

    def _make_jump_accept(self):
        """Jump accept given an already-materialized flow proposal.

        ``(params, x, k_acc, (x', logq', U(x'))) -> (x_new, mask)``. Only the
        state-dependent work (U(x), flow forward log-prob of x) stays per
        iteration; the proposal itself (base draw + coupling inverse + its
        log-prob + target eval) is hoisted to a chunk-batched precompute in
        ``_get_fused_runner``.
        """
        accept_core = self._make_jump_accept_core()

        def jump_accept(params, x, k_acc, aux):
            x_prime, f_x_prime, u_x_prime = aux
            return accept_core(params, x, k_acc, x_prime, f_x_prime, u_x_prime)

        return jump_accept

    def _jump_calls_per_iter(self, n_chains: int) -> int:
        return 2 * n_chains if self.params.adjusted_jumps else 0

    # --------------------------------------------------------------- fused path
    def _get_fused_runner(self, inner_n: int, fit_cfg=None):
        """Jitted chunk runner for the fused outer loop, uniform signature
        ``run_chunk(x, inner_kstate, flow_params, acc, jump_acc, key,
        fit_gate, chunk) -> (x, inner_kstate, flow_params, acc, jump_acc,
        key_next, ys)``.

        Without ``fit_cfg`` (``fit_nf=False``) the flow is frozen:
        ``flow_params`` stays a plain argument (returned unchanged), flow
        jump proposals chunk-hoist below the footprint cap, and ``fit_gate``
        is ignored. With ``fit_cfg`` (a fixed-effort refit config) the params
        ride in the scan carry and each outer iteration refits on its own
        inner-trajectory draws via the shared
        :func:`nfmc_tpu.flows.train.make_scan_fit` when its ``fit_gate``
        element is set (``i >= n_jumps_before_training``, reference
        ``jump.py:193-201``), then jumps with the fresh params — proposals
        cannot hoist on that path (they depend on the refitted params)."""
        flow = self.kernel.flow
        config = (inner_n, self.params.adjusted_jumps, self.params.store_samples,
                  self.rng_hoist_element_limit, fit_cfg,
                  self.params.train_pct, self.params.max_train_size,
                  self.params.max_val_size,
                  self.params.fused_unroll_inner, self.params.fused_unroll_outer,
                  id(flow), id(flow.bijection), id(flow._base_log_prob_override),
                  id(self.target),
                  self.inner_sampler._static_config())
        if self._fused is not None and self._fused_config == config:
            return self._fused

        refit = fit_cfg is not None
        inner_step = self.inner_sampler._make_step(tuning=False)
        inner_sampler = self.inner_sampler
        # Chunk-level RNG hoisting for the inner trajectories: draw every
        # inner step's noise/momentum + accept uniforms for the WHOLE chunk in
        # one batched pass (state-independent; ~30% of a small-chain MALA
        # step is in-scan threefry). Falls back to in-scan derivation when the
        # sampler provides no draws or the footprint would be large.
        inner_step_aux = self.inner_sampler._make_step_aux(tuning=False)
        inner_draws = self.inner_sampler.make_draws()
        inner_hoist_limit = self.inner_sampler.rng_hoist_element_limit
        proposal_hoist_limit = self.rng_hoist_element_limit
        proposal_per_draw = flow_proposal_footprint_per_draw(
            self.kernel.flow, int(np.prod(self.event_shape))
        )

        def inner_refresh(state, x):
            return inner_sampler._augment_state(
                inner_sampler._extract_mstate(state), x
            )

        jump_accept = self._make_jump_accept()
        jump_step = self._make_jump_step()  # in-scan fallback above the cap
        collect = self.params.store_samples
        resample_x0 = getattr(self.inner_sampler, "resample_x0_fn", None)
        target = self.target
        adjusted = self.params.adjusted_jumps
        event_shape = self.event_shape
        train_pct = self.params.train_pct
        max_train_size = self.params.max_train_size
        max_val_size = self.params.max_val_size
        unroll_inner = max(1, int(self.params.fused_unroll_inner))
        unroll_outer = max(1, int(self.params.fused_unroll_outer))

        def run_chunk(x, inner_kstate, flow_params, acc, jump_acc, key, fit_gate, chunk):
            keys = jax.random.split(key, chunk + 1)
            key_next, keys = keys[0], keys[1:]
            n_chains = x.shape[0]

            # Flow jump proposals are independent of the chain state: hoist
            # the base draw + coupling inverse + proposal log-prob + target
            # eval for the WHOLE chunk into one (chunk*C, *event) batched pass
            # (MXU-tiled), leaving only the state-dependent U(x) / logq(x) in
            # the scan body. Key derivation matches the in-scan path:
            # k_jump = split(key, 4)[1], k_prop = split(k_jump)[0]. Above the
            # footprint cap (or when refitting) the jump falls back to the
            # in-scan jump_step.
            use_proposal_aux = (
                not refit
                and chunk * n_chains * proposal_per_draw <= proposal_hoist_limit
            )
            if refit:
                from ...flows.train import make_scan_fit

                n_epochs, lr, batch_size, keep_best, shuffle = fit_cfg
                scan_fit = make_scan_fit(
                    flow, inner_n * n_chains, n_epochs=n_epochs, lr=lr,
                    batch_size=batch_size, shuffle=shuffle,
                    keep_best_weights=keep_best, train_pct=train_pct,
                    max_train_size=max_train_size, max_val_size=max_val_size,
                )
            if use_proposal_aux:
                k_jumps = jax.vmap(lambda k: jax.random.split(k, 3)[1])(keys)
                k_props = jax.vmap(lambda k: jax.random.split(k)[0])(k_jumps)
                proposals = hoisted_flow_proposals(
                    flow, flow_params, k_props, n_chains, event_shape,
                    target=target if adjusted else None,
                )
            else:
                proposals = jnp.zeros((chunk, 0))  # placeholder scan input

            # hoisted inner-step randomness: (chunk, inner_n, ...) draws via
            # the exact per-key derivation the in-scan path would use
            use_inner_aux = (
                inner_step_aux is not None
                and inner_draws is not None
                and chunk * inner_n * x.size <= inner_hoist_limit
            )
            if use_inner_aux:
                k_inners = jax.vmap(lambda k: jax.random.split(k, 3)[0])(keys)
                inner_keys = jax.vmap(lambda k: jax.random.split(k, inner_n))(k_inners)
                # reshape preserves any trailing key-data dims (legacy
                # uint32 PRNGKeys are (..., 2))
                flat_keys = inner_keys.reshape(
                    (chunk * inner_n,) + inner_keys.shape[2:]
                )
                idraws = jax.vmap(lambda k: inner_draws(k, n_chains))(flat_keys)
                idraws = jax.tree_util.tree_map(
                    lambda a: a.reshape(chunk, inner_n, *a.shape[1:]), idraws
                )
            else:
                idraws = jnp.zeros((chunk, inner_n, 0))  # placeholder scan input

            def outer_body(carry, xs_i):
                key, aux, gate, idraw = xs_i
                if refit:
                    x, ks, params, acc, jump_acc = carry
                else:
                    x, ks, acc, jump_acc = carry
                    params = flow_params
                # split(key, 4)[i] == split(key, 3)[i] for i < 3, so adding
                # k_fit leaves the k_inner/k_jump/k_reset streams (and the
                # hoisted-precompute derivations above) bit-identical
                k_inner, k_jump, k_reset, k_fit = jax.random.split(key, 4)
                if resample_x0 is not None:
                    x = resample_x0(k_reset, x)
                    # chain-shaped caches (ESS's carried nll) are stale for
                    # the redrawn state
                    ks = inner_refresh(ks, x)

                # inner trajectories also collect when refitting — the refit
                # trains on them (reference ``jump.py:193-201``)
                emit_inner = collect or refit
                if use_inner_aux:
                    # the hoisted draws ARE the inner randomness; no in-scan
                    # key chain needed (every step_aux ignores its key arg)
                    def inner_body(c, d):
                        x, ks, acc = c
                        x2, ks2, info = inner_step_aux(x, ks, None, d)
                        return (x2, ks2, acc.add(info, x2)), (x2 if emit_inner else None)

                    inner_xs_in = idraw
                else:
                    def inner_body(c, xs):
                        x, ks, acc = c
                        x2, ks2, info = inner_step(x, ks, xs)
                        return (x2, ks2, acc.add(info, x2)), (x2 if emit_inner else None)

                    inner_xs_in = jax.random.split(k_inner, inner_n)

                (x, ks, acc), inner_xs = jax.lax.scan(
                    inner_body, (x, ks, acc), inner_xs_in, unroll=unroll_inner
                )
                if refit:
                    data = inner_xs.reshape(inner_n * n_chains, *event_shape)
                    params = jax.lax.cond(
                        gate, lambda p: scan_fit(p, data, k_fit), lambda p: p, params
                    )
                if use_proposal_aux:
                    k_acc = jax.random.split(k_jump)[1]
                    x, jmask = jump_accept(params, x, k_acc, aux)
                else:
                    x, jmask = jump_step(params, x, k_jump)
                # chain-shaped caches in the inner state (e.g. Langevin's
                # cached U/grad) are stale for jumped chains — rebuild
                ks = inner_refresh(ks, x)
                jump_acc = jump_acc.add_jump(jmask, x)
                if collect:
                    emit = jnp.concatenate([inner_xs, x[None]], axis=0)
                else:
                    emit = None
                if refit:
                    return (x, ks, params, acc, jump_acc), emit
                return (x, ks, acc, jump_acc), emit

            if refit:
                carry0 = (x, inner_kstate, flow_params, acc, jump_acc)
            else:
                carry0 = (x, inner_kstate, acc, jump_acc)
            carry, ys = jax.lax.scan(
                outer_body, carry0, (keys, proposals, fit_gate, idraws),
                unroll=unroll_outer,
            )
            if refit:
                x, inner_kstate, flow_params, acc, jump_acc = carry
            else:
                x, inner_kstate, acc, jump_acc = carry
            return x, inner_kstate, flow_params, acc, jump_acc, key_next, ys

        self._fused = jax.jit(run_chunk, donate_argnums=(0, 3, 4), static_argnums=(7,))
        self._fused_config = config
        # pin the objects behind the id() tokens in `config` so a freed
        # flow/bijection's recycled id cannot alias a stale runner
        self._fused_keepalive = (flow, flow.bijection,
                                 flow._base_log_prob_override, self.target)
        return self._fused

    # ------------------------------------------------------------------- sample
    def sample(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        if not self.inner_sampler.params.store_samples:
            raise ValueError("Inner sampler in jump NFMC must store samples")
        key = self._key(key, seed)
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        n_chains = x0.shape[0]
        inner_n = self.inner_sampler.params.n_iterations
        out = JumpNFMCOutput(event_shape=self.event_shape, store_samples=self.params.store_samples,
                             on_device=getattr(self.params, 'store_samples_on_device', False))

        from ...flows.train import fixed_effort_fit_config

        fit_nf_cfg = (
            fixed_effort_fit_config(self.params.flow_fit_kwargs)
            if self.params.fit_nf else None
        )
        if not self.params.fit_nf or fit_nf_cfg is not None:
            self._sample_fused(x0, out, key, inner_n, n_chains,
                               time_limit_seconds, show_progress,
                               fit_nf_cfg=fit_nf_cfg)
        else:
            self._sample_host(x0, out, key, inner_n, n_chains, time_limit_seconds, show_progress)
        out.kernel = self.kernel
        return out

    def _account_outer_iters(self, out, n_outer, n_chains, inner_n, acc, jump_acc):
        import jax as _jax

        # one host transfer for both accumulators (remote-device friendly)
        acc, jump_acc = _jax.device_get((acc, jump_acc))
        inner_calls = self.inner_sampler.calls_per_iter(n_chains)
        inner_grads = self.inner_sampler.grads_per_iter(n_chains)
        out.statistics.update_counters(
            n_accepted_trajectories=int(acc.n_accepted),
            n_attempted_trajectories=n_outer * inner_n * n_chains,
            n_divergences=int(acc.n_divergences),
            # static per-iter contract + the dynamic channel trajectory-
            # dependent inners (NUTS, ChEES) report through StepInfo
            n_target_calls=(
                n_outer * (inner_n * inner_calls + self._jump_calls_per_iter(n_chains))
                + int(round(float(acc.n_calls_dyn) + float(acc.c_calls_dyn)))
            ),
            n_target_gradient_calls=(
                n_outer * inner_n * inner_grads
                + int(round(float(acc.n_grads_dyn) + float(acc.c_grads_dyn)))
            ),
            n_accepted_jumps=int(jump_acc.n_accepted),
            n_attempted_jumps=n_outer * n_chains,
        )
        a_x, a_x2 = acc.moment_sums()
        j_x, j_x2 = jump_acc.moment_sums()
        out.statistics.update_moments_from_sums(
            a_x + j_x, a_x2 + j_x2, n_outer * (inner_n + 1) * n_chains,
        )

    def _sample_fused(self, x0, out, key, inner_n, n_chains, time_limit_seconds,
                      show_progress, fit_nf_cfg=None):
        runner = self._get_fused_runner(inner_n, fit_cfg=fit_nf_cfg)
        inner_kstate = self.inner_sampler._augment_state(
            self.inner_sampler.kernel.make_state(), x0
        )
        flow_params = self.kernel.flow.params
        x = jnp.array(x0, copy=True)

        # Accumulators are carried on-device across chunks; one host fetch at
        # the end (per chunk only when a live progress bar is shown). The
        # pipelining / chunk-size / time-limit policy lives in ONE place —
        # core.driver.run_chunk_loop — shared with ChunkedScanDriver.run and
        # AdaptiveIMH._sample_fused. Jump carries extra state (flow params +
        # jump accumulators) through the dispatch closure.
        from ...core.driver import run_chunk_loop

        st = {
            "x": x, "inner_kstate": inner_kstate, "flow_params": flow_params,
            "key": key,
            "acc": StatsAccum.zeros(self.event_shape),
            "jump_acc": _JumpAccum.zeros(self.event_shape),
        }

        # Pipelined host-storage runs defer the per-chunk draw fetch to ONE
        # end-of-run D2H (same policy + footprint guard as
        # ChunkedScanDriver.run — per-chunk numpy conversion blocks a tunnel
        # round trip per chunk and serializes the pipeline).
        from ...core.driver import SAMPLE_DEFER_ELEMENT_LIMIT

        event_elems = int(np.prod(self.event_shape)) if self.event_shape else 1
        defer_store = (
            self.params.store_samples
            and not out.running_samples.on_device
            and time_limit_seconds is None
            and not show_progress
            and self.params.n_iterations * (inner_n + 1) * n_chains * event_elems
            <= SAMPLE_DEFER_ELEMENT_LIMIT
        )
        deferred_blocks = []

        def dispatch(chunk, outer_abs):
            # refit gate by absolute outer index (reference ``jump.py:193-201``);
            # ignored by the runner when fit_nf_cfg is None
            gate = jnp.asarray(
                np.arange(outer_abs, outer_abs + chunk)
                >= self.params.n_jumps_before_training
            )
            x, ks, fp, acc, jacc, k, ys = runner(
                st["x"], st["inner_kstate"], st["flow_params"], st["acc"],
                st["jump_acc"], st["key"], gate, chunk,
            )
            st.update(x=x, inner_kstate=ks, flow_params=fp, acc=acc,
                      jump_acc=jacc, key=k)
            if self.params.store_samples:
                # (chunk, inner_n+1, C, *e) -> (chunk*(inner_n+1), C, *e)
                blk = ys.reshape(chunk * (inner_n + 1), n_chains, *self.event_shape)
                if defer_store:
                    deferred_blocks.append(blk)
                else:
                    out.running_samples.add(blk)
            # store_samples=False: last_sample is set ONCE after the loop —
            # a per-chunk add here would block on a D2H fetch per chunk
            # (MCMCSamples.add converts before its store check), serializing
            # the pipelined path.
            return x

        def flush(iters):
            self._account_outer_iters(out, iters, n_chains, inner_n,
                                      st["acc"], st["jump_acc"])
            st["acc"] = StatsAccum.zeros(self.event_shape)
            st["jump_acc"] = _JumpAccum.zeros(self.event_shape)

        # cap the single-chunk fast path so one whole-run chunk can never
        # exceed the runner's per-chunk hoist footprint gates (r4 review):
        # inner-step RNG (chunk * inner_n * x.size) and flow proposals
        # (chunk * C * per_draw) — same formulas as _get_fused_runner. Each
        # term applies only when its hoist can actually engage (ADVICE r4:
        # an unconditional cap forced the geometric schedule — extra compiles
        # — for runs whose inner sampler provides no make_draws): the inner
        # term needs draws + a step_aux, the proposal term is dead when
        # refitting (use_proposal_aux requires not refit). Collect mode adds
        # the emitted (chunk, inner_n+1, C, *e) draw buffer. All terms depend
        # only on static workload shape / sampler structure.
        caps = []
        if (self.inner_sampler.make_draws() is not None
                and self.inner_sampler._make_step_aux(False) is not None):
            caps.append(max(1, RNG_HOIST_ELEMENT_LIMIT
                            // max(1, inner_n * int(x.size))))
        if fit_nf_cfg is None:
            proposal_per_draw = flow_proposal_footprint_per_draw(
                self.kernel.flow, int(np.prod(self.event_shape))
            )
            # DEFAULT constant, not the tunable instance limits: the schedule
            # feeds the key split, so it must depend only on workload shape
            # (limit=0 fallback tests need the identical stream)
            caps.append(max(1, RNG_HOIST_ELEMENT_LIMIT
                            // max(1, n_chains * proposal_per_draw)))
        if self.params.store_samples:
            caps.append(max(1, RNG_HOIST_ELEMENT_LIMIT
                            // max(1, (inner_n + 1) * n_chains * event_elems)))
        hoist_cap = min(caps) if caps else None
        iters_done = run_chunk_loop(
            self.params.n_iterations,
            dispatch=dispatch,
            stats=out.statistics,
            flush=flush,
            time_limit_seconds=time_limit_seconds,
            show_progress=show_progress,
            desc=self.name,
            sync_max_chunk=256,
            single_chunk_cap=hoist_cap,
        )
        if deferred_blocks:
            # ONE device concat + ONE host fetch for the whole run's draws
            blk = (
                deferred_blocks[0]
                if len(deferred_blocks) == 1
                else jnp.concatenate(deferred_blocks, axis=0)
            )
            out.running_samples.add(blk)
        if not self.params.store_samples and iters_done > 0:
            out.running_samples.add(st["x"])  # single run-end fetch
        if fit_nf_cfg is not None:
            self.kernel.flow.params = st["flow_params"]
        self.inner_sampler.kernel.sync_from_state(
            self.inner_sampler._extract_mstate(st["inner_kstate"])
        )

    def _sample_host(self, x0, out, key, inner_n, n_chains, time_limit_seconds, show_progress):
        flow = self.kernel.flow
        # memoized across sample() calls (CLAUDE.md: never build fresh jit
        # closures per call — each one re-traces). Flow params thread as an
        # argument; the closure bakes the flow/bijection/target identities
        # and the adjusted_jumps flag.
        jump_step = self._memo(
            "host_jump_step",
            (id(flow), id(flow.bijection), id(flow._base_log_prob_override),
             id(self.target), bool(self.params.adjusted_jumps)),
            lambda: jax.jit(self._make_jump_step()),
            keepalive=(flow, flow.bijection, flow._base_log_prob_override,
                       self.target),
        )
        x = x0

        pbar = tqdm(range(self.params.n_iterations), desc=self.name, disable=not show_progress)
        for i in pbar:
            if (
                time_limit_seconds is not None
                and out.statistics.elapsed_time_seconds >= time_limit_seconds
            ):
                break
            key, k_inner, k_jump, k_fit = jax.random.split(key, 4)
            mcmc_output = self.inner_sampler.sample(x0=x, show_progress=False, key=k_inner)

            st = mcmc_output.statistics
            out.statistics.update_counters(
                n_accepted_trajectories=st.n_accepted_trajectories,
                n_attempted_trajectories=st.n_attempted_trajectories,
                n_divergences=st.n_divergences,
                n_target_calls=st.n_target_calls,
                n_target_gradient_calls=st.n_target_gradient_calls,
            )
            out.statistics.update_elapsed_time(st.elapsed_time_seconds)
            out.statistics.expectations.update(mcmc_output.samples)
            out.running_samples.add(mcmc_output.samples)

            t0 = time.time()
            if self.params.fit_nf and i >= self.params.n_jumps_before_training:
                x_train, x_val = train_val_split(
                    mcmc_output.samples,
                    train_pct=self.params.train_pct,
                    max_train_size=self.params.max_train_size,
                    max_val_size=self.params.max_val_size,
                    # Keyed shuffle (default_rng(None) is OS entropy —
                    # would break seeded reproducibility of refit runs).
                    seed=int(jax.random.randint(jax.random.fold_in(k_fit, 1), (), 0, 2**31 - 1)),
                )
                flow_params_snapshot = flow.state_dict()
                try:
                    flow.fit(x_train, x_val=x_val, **self.params.flow_fit_kwargs, key=k_fit)
                except ValueError:
                    flow.load_state_dict(flow_params_snapshot)

            x = jnp.asarray(mcmc_output.running_samples.last_sample)
            x, jmask = jump_step(flow.params, x, k_jump)
            out.statistics.update_elapsed_time(time.time() - t0)
            out.statistics.update_counters(
                n_target_calls=self._jump_calls_per_iter(n_chains),
                n_attempted_jumps=n_chains,
                n_accepted_jumps=int(jnp.sum(jmask)),
            )
            out.statistics.expectations.update(x)
            out.running_samples.add(x)
            if show_progress:
                pbar.set_postfix_str(f"{out.statistics}")


import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class _JumpAccum:
    """Chunk-local jump counters + post-jump moment sums."""

    n_accepted: jax.Array
    sum_x: jax.Array
    sum_x2: jax.Array
    c_x: jax.Array  # Neumaier compensations (see core.driver._compensated_add)
    c_x2: jax.Array

    @staticmethod
    def zeros(event_shape):
        # distinct buffers per field: donated accumulators must not alias
        def z():
            return jnp.zeros(event_shape, dtype=jnp.float32)

        return _JumpAccum(
            n_accepted=jnp.zeros((), dtype=jnp.int32),
            sum_x=z(), sum_x2=z(), c_x=z(), c_x2=z(),
        )

    def add_jump(self, mask, x):
        from ...core.driver import _compensated_add

        xf = x.astype(jnp.float32)
        sum_x, c_x = _compensated_add(self.sum_x, self.c_x, jnp.sum(xf, axis=0))
        sum_x2, c_x2 = _compensated_add(
            self.sum_x2, self.c_x2, jnp.sum(xf * xf, axis=0)
        )
        return _JumpAccum(
            n_accepted=self.n_accepted + jnp.sum(mask).astype(jnp.int32),
            sum_x=sum_x, sum_x2=sum_x2, c_x=c_x, c_x2=c_x2,
        )

    def moment_sums(self):
        return self.sum_x + self.c_x, self.sum_x2 + self.c_x2


class JumpHMC(JumpNFMC):
    def __init__(self, event_shape, target, kernel=None, params=None,
                 inner_kernel: Optional[MCMCKernel] = None,
                 inner_params: Optional[MCMCParameters] = None):
        super().__init__(event_shape, target, HMC(event_shape, target, inner_kernel, inner_params),
                         kernel, params)


class JumpUHMC(JumpNFMC):
    def __init__(self, event_shape, target, kernel=None, params=None,
                 inner_kernel=None, inner_params=None):
        super().__init__(event_shape, target, UHMC(event_shape, target, inner_kernel, inner_params),
                         kernel, params)


class JumpMALA(JumpNFMC):
    def __init__(self, event_shape, target, kernel=None, params=None,
                 inner_kernel=None, inner_params=None):
        super().__init__(event_shape, target, MALA(event_shape, target, inner_kernel, inner_params),
                         kernel, params)


class JumpULA(JumpNFMC):
    def __init__(self, event_shape, target, kernel=None, params=None,
                 inner_kernel=None, inner_params=None):
        super().__init__(event_shape, target, ULA(event_shape, target, inner_kernel, inner_params),
                         kernel, params)


class JumpMH(JumpNFMC):
    def __init__(self, event_shape, target, kernel=None, params=None,
                 inner_kernel=None, inner_params=None):
        super().__init__(event_shape, target, MH(event_shape, target, inner_kernel, inner_params),
                         kernel, params)


class JumpESS(JumpNFMC):
    def __init__(self, event_shape, target, negative_log_likelihood,
                 kernel=None, params=None, inner_kernel=None, inner_params=None):
        super().__init__(
            event_shape, target,
            ESS(event_shape, target, negative_log_likelihood, inner_kernel, inner_params),
            kernel, params,
        )


class JumpNUTS(JumpNFMC):
    def __init__(self, event_shape, target, kernel=None, params=None,
                 inner_kernel=None, inner_params=None):
        super().__init__(event_shape, target, NUTS(event_shape, target, inner_kernel, inner_params),
                         kernel, params)


class JumpAIES(JumpNFMC):
    """Flow jumps interleaved with gradient-free affine-invariant ensemble
    moves (superset: the reference has neither an ensemble inner sampler nor
    this combination). Useful when the target's gradient is unavailable but
    its modes call for flow jumps."""

    def __init__(self, event_shape, target, kernel=None, params=None,
                 inner_kernel=None, inner_params=None):
        super().__init__(event_shape, target, AIES(event_shape, target, inner_kernel, inner_params),
                         kernel, params)

class JumpChEES(JumpNFMC):
    """Flow jumps interleaved with ChEES-HMC inner moves (superset: the
    reference has neither trajectory-length adaptation nor this combination).
    The inner trajectory length/step size adapt during the jump warmup's
    inner-tuning phase and stay frozen (jittered) inside the fused outer
    scan; the inner sampler's dynamic leapfrog counters ride the fused
    runner's StatsAccum like JumpNUTS'."""

    def __init__(self, event_shape, target, kernel=None, params=None,
                 inner_kernel=None, inner_params=None):
        super().__init__(event_shape, target,
                         CheesHMC(event_shape, target, inner_kernel, inner_params),
                         kernel, params)
