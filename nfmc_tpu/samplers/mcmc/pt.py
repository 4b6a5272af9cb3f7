"""Parallel tempering (replica exchange) — a TPU-native superset sampler.

The reference has no tempering capability (its only parallelism is chain
vectorization, SURVEY.md section 2.5); multimodal targets are served only by
the flow-jump samplers. Parallel tempering is the classical complement: a
ladder of ``n_temps`` inverse temperatures ``1 = beta_0 > ... > beta_{T-1}``
runs a within-temperature Metropolis move against the tempered potential
``beta_k * U`` every iteration, followed by a deterministic even/odd sweep of
replica-exchange swaps between adjacent rungs with acceptance
``log alpha = (beta_i - beta_j) * (U(x_i) - U(x_j))``.

TPU-native design: the whole ladder is ONE batched tensor — positions
``(n_temps, n_chains, *event)`` move in a single fused step (one target/grad
evaluation of shape ``(T*C, *event)`` per iteration; the MXU sees one big
batch, not T small ones), swaps are a static partner-permutation gather, and
everything (per-rung dual averaging, Vousden-style ladder adaptation, swap
counters) is scan-carried state inside the same jitted chunked driver every
other kernel uses. The driver's chain axis carries the *cold* rung only:
stored samples, streaming moments, and acceptance statistics are the
``beta = 1`` chain, exactly what a user consumes.

Warmup adaptation:

* per-rung step sizes by Nesterov dual averaging (same constants as the
  Metropolis family, reference ``tuning.py:7-41``, vectorized over rungs);
* the inverse-temperature ladder by stochastic approximation toward equal
  swap rates across edges (Vousden, Farr & Mandel 2016, MNRAS 455:1919 —
  spacings in temperature space scale by ``exp(kappa (A_k - A_{k+1}))`` with
  both endpoints anchored);
* optionally the shared diagonal preconditioner from cold-chain variance
  (EMA, reference ``mcmc/base.py:150-155``).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.driver import RNG_HOIST_ELEMENT_LIMIT, StepInfo
from ...core.output import MCMCOutput
from ...core.sampler import MCMCKernel, MCMCParameters
from ...core.statistics import PTStatistics
from ...core.tuning import DualAveragingParams, DualAveragingState, da_step
from ...utils import value_and_batched_grad
from .base import MCMCSampler


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PTState:
    """Scan-carried numeric state for the tempering ladder."""

    betas: jax.Array  # (T,) descending, betas[0] = 1
    step_sizes: jax.Array  # (T,)
    da: DualAveragingState  # leaves of shape (T,)
    inv_mass_diag: jax.Array  # (event_size,)
    i: jax.Array  # i32 scalar: iteration counter (swap parity, ladder kappa)
    swap_accepts: jax.Array  # (T-1,) i32 per-edge accepted swaps
    swap_attempts: jax.Array  # (T-1,) i32 per-edge attempted swaps
    swap_rate_ema: jax.Array  # (T-1,) f32 per-edge acceptance EMA


@dataclass
class PTKernel(MCMCKernel):
    """Tunable state of the tempering ladder.

    ``betas`` (descending, first entry 1.0) wins over ``n_temps``/``beta_min``
    when given; otherwise the default ladder is geometric between 1 and
    ``beta_min``. ``step_sizes`` holds the per-rung steps (default:
    ``step_size * beta_k^{-1/2}`` — the tempered target is ``beta_k`` times
    flatter, so natural step scale grows as the rung heats).

    Ladder sizing: for a d-dimensional target the swap log-ratio between
    adjacent rungs fluctuates like ``(dbeta/beta) * sqrt(d/2)``, so healthy
    swap rates need ``n_temps ~ 1 + log(1/beta_min) * sqrt(d/2)`` (e.g. ~29
    rungs for beta_min 0.02 at d = 100; the default 8 suits low-dimensional
    multimodal targets). The warmup's ladder adaptation equalizes rates
    across edges but cannot compensate for too few rungs."""

    event_size: int = 0
    n_temps: int = 8
    beta_min: float = 0.02
    betas: Optional[np.ndarray] = None
    n_leapfrog_steps: int = 10  # HMC moves (PTHMC) only
    step_size: Optional[float] = None
    step_sizes: Optional[np.ndarray] = None
    inv_mass_diag: Optional[np.ndarray] = None
    da_params: Optional[DualAveragingParams] = None
    # populated by sync_from_state after a run
    swap_acceptance_rates: Optional[np.ndarray] = None
    n_accepted_swaps: int = 0
    n_attempted_swaps: int = 0

    def __post_init__(self):
        super().__post_init__()
        if self.betas is None:
            # geometric ladder 1 -> beta_min
            self.betas = np.geomspace(1.0, self.beta_min, self.n_temps).astype(np.float32)
        else:
            self.betas = np.asarray(self.betas, dtype=np.float32)
            if self.betas.ndim != 1 or self.betas[0] != 1.0:
                raise ValueError("betas must be 1-D with betas[0] == 1.0")
            if np.any(np.diff(self.betas) >= 0):
                raise ValueError("betas must be strictly decreasing")
            self.n_temps = len(self.betas)
        if self.step_size is None:
            self.step_size = self.event_size ** (-1.0 / 3.0)
        if self.step_sizes is None:
            self.step_sizes = (self.step_size * self.betas ** (-0.5)).astype(np.float32)
        else:
            self.step_sizes = np.asarray(self.step_sizes, dtype=np.float32)
            if self.step_sizes.shape != self.betas.shape:
                raise ValueError("step_sizes must match betas")
        if self.inv_mass_diag is None:
            self.inv_mass_diag = np.ones(self.event_size, dtype=np.float32)
        else:
            self.inv_mass_diag = np.asarray(self.inv_mass_diag, dtype=np.float32)
        if self.da_params is None:
            self.da_params = DualAveragingParams()

    def make_state(self) -> PTState:
        T = self.n_temps
        steps = jnp.asarray(self.step_sizes, dtype=jnp.float32)
        da = getattr(self, "_resume_da", None)
        if da is None:
            da = DualAveragingState(
                t=jnp.full((T,), float(self.da_params.t0), dtype=jnp.float32),
                error_sum=jnp.zeros((T,), dtype=jnp.float32),
                log_step_averaged=jnp.log(steps),
                mu=jnp.log(10.0 * steps),
            )
        return PTState(
            betas=jnp.asarray(self.betas, dtype=jnp.float32),
            step_sizes=steps,
            da=da,
            inv_mass_diag=jnp.asarray(self.inv_mass_diag, dtype=jnp.float32),
            # the iteration counter continues across segments so the swap
            # parity (even/odd edge alternation) resumes where it left off
            i=jnp.asarray(getattr(self, "_resume_i", 0), dtype=jnp.int32),
            swap_accepts=jnp.zeros((T - 1,), dtype=jnp.int32),
            swap_attempts=jnp.zeros((T - 1,), dtype=jnp.int32),
            swap_rate_ema=jnp.zeros((T - 1,), dtype=jnp.float32),
        )

    def sync_from_state(self, state: PTState) -> None:
        # ONE batched host fetch (device_get pre-issues the async copies) —
        # seven separate per-leaf fetches each cost a ~25-30 ms
        # tunnel round trip per sample() call (r5, same fix as the
        # Metropolis/dense kernels).
        (betas, step_sizes, inv_mass_diag, swap_rate_ema, swap_accepts,
         swap_attempts, i) = jax.device_get(
            (state.betas, state.step_sizes, state.inv_mass_diag,
             state.swap_rate_ema, state.swap_accepts, state.swap_attempts,
             state.i))
        self.betas = np.asarray(betas)
        self.step_sizes = np.asarray(step_sizes)
        self.step_size = float(self.step_sizes[0])
        self.inv_mass_diag = np.asarray(inv_mass_diag)
        self.swap_acceptance_rates = np.asarray(swap_rate_ema)
        self.n_accepted_swaps = int(np.sum(swap_accepts))
        self.n_attempted_swaps = int(np.sum(swap_attempts))
        # Carry the per-rung dual-averaging state across runs/checkpoints
        # (r4, same semantics as the Metropolis family): a mid-warmup resume
        # continues every rung's step adaptation instead of restarting it.
        self._resume_da = jax.tree_util.tree_map(jnp.asarray, state.da)
        self._resume_i = int(i)

    def __repr__(self):
        rates = self.swap_acceptance_rates
        swap = f", swap-rates {np.round(rates, 2)}" if rates is not None else ""
        return (
            f"T={self.n_temps}, beta_min={float(self.betas[-1]):.3g}, "
            f"cold step {float(self.step_sizes[0]):.3g}{swap}"
        )


@dataclass
class PTParameters(MCMCParameters):
    tune_step_size: bool = True
    tune_inv_mass_diag: bool = True
    tune_ladder: bool = True
    imd_adjustment: float = 1e-3
    # Vousden et al. 2016 eq. (12): kappa(t) = kappa0 / (1 + t / t0_ladder)
    ladder_kappa0: float = 0.1
    ladder_t0: float = 100.0
    swap_ema_alpha: float = 0.05


def _partner_perm(n_temps: int, offset: int) -> np.ndarray:
    """Static swap-partner permutation for even (offset 0) / odd (offset 1)
    pairings; unpaired rungs map to themselves."""
    p = np.arange(n_temps)
    for k in range(offset, n_temps - 1, 2):
        p[k], p[k + 1] = k + 1, k
    return p


class ParallelTempering(MCMCSampler):
    """Shared machinery; concrete classes pick the within-rung move."""

    move: str = "mala"  # "mala" (PTMALA), "rwmh" (PTRWMH), "hmc" (PTHMC)

    @property
    def use_grad(self) -> bool:
        """Whether the within-rung move carries a gradient cache."""
        return self.move in ("mala", "hmc")

    def __init__(self, event_shape, target, kernel: Optional[PTKernel] = None,
                 params: Optional[PTParameters] = None):
        if kernel is None:
            kernel = PTKernel(event_size=int(np.prod(event_shape)))
        if params is None:
            params = PTParameters()
        super().__init__(event_shape, target, kernel, params)
        # Honest hoist-footprint scaling: the hoisted draws are ladder-wide —
        # noise (T, C, *event) + two (T, C) uniform fields per iteration —
        # while the base guard counts only the cold driver-x footprint.
        self.rng_hoist_element_limit = RNG_HOIST_ELEMENT_LIMIT // max(
            1, 2 * kernel.n_temps
        )

    @property
    def name(self):
        return f"PT-{self.move.upper()}"

    def _static_config(self):
        p, k = self.params, self.kernel
        return (
            k.n_temps,
            self.move,
            k.n_leapfrog_steps,
            p.tune_step_size,
            p.tune_inv_mass_diag,
            p.tune_ladder,
            p.imd_adjustment,
            p.ladder_kappa0,
            p.ladder_t0,
            p.swap_ema_alpha,
            self.rng_hoist_element_limit,
        )

    def _make_output(self) -> MCMCOutput:
        return MCMCOutput(
            self.event_shape,
            statistics=PTStatistics(self.event_shape),
            store_samples=self.params.store_samples,
            on_device=getattr(self.params, "store_samples_on_device", False),
        )

    def _post_run(self, out: MCMCOutput) -> None:
        out.statistics.update_counters(
            n_accepted_swaps=self.kernel.n_accepted_swaps,
            n_attempted_swaps=self.kernel.n_attempted_swaps,
        )

    # ---- state -----------------------------------------------------------
    def _augment_state(self, ptstate: PTState, x0):
        T = self.kernel.n_temps
        xs = jnp.broadcast_to(x0[None], (T, *x0.shape))  # every rung starts at x0
        hot = getattr(self, "_continue_hot", None)
        if getattr(self, "_use_continue_hot", False) and hot is not None:
            hot = jnp.asarray(hot, dtype=jnp.float32)
            if hot.shape != xs[1:].shape:
                # silently collapsing onto the cold state would claim
                # continuation semantics while restarting every hot chain
                raise ValueError(
                    f"PT continuation hot-rung state has shape {hot.shape} "
                    f"but this run needs {tuple(xs[1:].shape)} — was the "
                    "ladder (n_temps) or chain count changed since the "
                    "checkpoint?"
                )
            # continuation (sample_continue): the hot replicas resume from
            # where the previous segment left them instead of collapsing
            # onto the cold state
            xs = jnp.concatenate([x0[None], hot], axis=0)
        flat = xs.reshape(T * x0.shape[0], *self.event_shape)
        if self.use_grad:
            u, g = value_and_batched_grad(self.target)(flat)
            return (ptstate, xs[1:], u.reshape(T, -1), g.reshape(xs.shape))
        u = self.target(flat)
        return (ptstate, xs[1:], u.reshape(T, -1))

    # ---- RNG (chunk-hoistable) -------------------------------------------
    def make_draws(self):
        T = self.kernel.n_temps
        event_shape = self.event_shape

        def draws(key, n_chains):
            k_noise, k_move, k_swap = jax.random.split(key, 3)
            noise = jax.random.normal(k_noise, (T, n_chains, *event_shape))
            log_u_move = jnp.log(jax.random.uniform(k_move, (T, n_chains)))
            log_u_swap = jnp.log(jax.random.uniform(k_swap, (T, n_chains)))
            return noise, log_u_move, log_u_swap

        return draws

    def _make_step(self, tuning: bool):
        step_aux = self._make_step_aux(tuning)
        draws = self.make_draws()

        def step(x, state, key):
            return step_aux(x, state, key, draws(key, x.shape[0]))

        return step

    # ---- the fused ladder step -------------------------------------------
    def _make_step_aux(self, tuning: bool):
        target = self.target
        event_shape = self.event_shape
        event_ndim = len(event_shape)
        d = self.event_size
        T = self.kernel.n_temps
        p = self.params
        move = self.move
        use_grad = self.use_grad
        n_leapfrog = self.kernel.n_leapfrog_steps
        da_params = self.kernel.da_params
        u_and_grad = value_and_batched_grad(target)
        partner_even = jnp.asarray(_partner_perm(T, 0))
        partner_odd = jnp.asarray(_partner_perm(T, 1))
        rung_idx = jnp.arange(T)
        edge_target = jnp.arange(1, T)  # partner[k] == k+1 marks edge k active

        def step(x_cold, state, key, aux):
            if use_grad:
                pts, xs_hot, u_all, g_all = state
            else:
                pts, xs_hot, u_all = state
                g_all = None
            noise, log_u_move, log_u_swap = aux
            C = x_cold.shape[0]
            X = jnp.concatenate([x_cold[None], xs_hot], axis=0)  # (T, C, *e)
            beta = pts.betas  # (T,)
            tau = pts.step_sizes  # (T,)
            m = pts.inv_mass_diag  # (d,)

            Xf = X.reshape(T, C, d)
            nf = noise.reshape(T, C, d)
            t_b = tau[:, None, None]
            b_b = beta[:, None, None]
            if move == "hmc":
                # HMC on the tempered potential beta_k * U: leapfrog with
                # per-rung step sizes over the whole (T*C) batch; the carried
                # raw-gradient cache supplies the first kick (the L+1 gradient
                # scheme of ``hmc.py``'s module docstring, per rung), kicks
                # temper the gradient by beta_k, and the accept is on the
                # tempered Hamiltonian beta_k U + 0.5 p^T M^{-1} p
                # (reference contract ``hmc.py:26-37,51-77,103-113``).
                gf = g_all.reshape(T, C, d)
                p0 = nf / jnp.sqrt(m)[None, None]  # Var(p) = M = 1/m per dim

                def lf_body(_, carry):
                    xq, pq, gq, _uq = carry
                    pq = pq - 0.5 * t_b * (b_b * gq)
                    xq = xq + t_b * (m[None, None] * pq)
                    uq, gq = u_and_grad(xq.reshape(T * C, *event_shape))
                    uq = uq.reshape(T, C)
                    gq = gq.reshape(T, C, d)
                    pq = pq - 0.5 * t_b * (b_b * gq)
                    return xq, pq, gq, uq

                xpf, p_end, gpf, u_p = jax.lax.fori_loop(
                    0, n_leapfrog, lf_body, (Xf, p0, gf, u_all)
                )
                Xp = xpf.reshape(X.shape)
                g_p = gpf.reshape(X.shape)
                finite_prop = jnp.all(jnp.isfinite(xpf), axis=-1)  # (T, C)
                ke0 = 0.5 * jnp.sum(m[None, None] * p0 * p0, axis=-1)
                ke1 = 0.5 * jnp.sum(m[None, None] * p_end * p_end, axis=-1)
                log_ratio = (
                    beta[:, None] * (u_all - u_p) + ke0 - ke1
                )
            elif use_grad:
                # MALA on the tempered potential beta_k * U: drift uses the
                # tempered gradient beta_k * grad U (raw U/grad are carried and
                # updated through accept masks — one fused (T*C)-batch target
                # evaluation per iteration; reference Langevin contract at
                # ``langevin.py:74-76,87-106`` applied per rung).
                gf = g_all.reshape(T, C, d)
                xpf = (
                    Xf
                    - t_b / (m[None, None] ** 2) * (b_b * gf)
                    + jnp.sqrt(2.0 * t_b) / m[None, None] * nf
                )
                Xp = xpf.reshape(X.shape)
                finite_prop = jnp.all(jnp.isfinite(xpf), axis=-1)  # (T, C)
                u_p, g_p = u_and_grad(Xp.reshape(T * C, *event_shape))
                u_p = u_p.reshape(T, C)
                g_p = g_p.reshape(X.shape)
                gpf = g_p.reshape(T, C, d)
                a = (1.0 / m**2)[None, None]

                def qpot(to_f, from_f, grad_from_f):
                    term = to_f - from_f + t_b * a * (b_b * grad_from_f)
                    return jnp.sum(term * (1.0 / a) * term, axis=-1) / (4.0 * t_b[..., 0])

                # MH ratio on the tempered target (reference ``util.py:382-392``
                # convention, per rung): beta (u - u') + log q(x|x') - log q(x'|x)
                # with log q(to|from) = -qpot(to, from, grad_from).
                log_ratio = (
                    beta[:, None] * (u_all - u_p)
                    - qpot(Xf, xpf, gpf)  # + log q(x | x')
                    + qpot(xpf, Xf, gf)  # - log q(x' | x)
                )
            else:
                xpf = Xf + t_b * m[None, None] * nf
                Xp = xpf.reshape(X.shape)
                finite_prop = jnp.all(jnp.isfinite(xpf), axis=-1)  # (T, C)
                u_p = target(Xp.reshape(T * C, *event_shape)).reshape(T, C)
                g_p = None
                log_ratio = beta[:, None] * (u_all - u_p)

            finite = finite_prop & jnp.isfinite(u_p)
            mask_move = (log_u_move < log_ratio) & finite  # (T, C)
            diverged = (~jnp.all(finite)).astype(jnp.int32)

            bmask = mask_move.reshape(T, C, *(1,) * event_ndim)
            X = jnp.where(bmask, Xp, X)
            u_all = jnp.where(mask_move, u_p, u_all)
            if use_grad:
                g_all = jnp.where(bmask, g_p, g_all)

            # ---- replica-exchange sweep (deterministic even/odd parity) ----
            parity = pts.i % 2
            partner = jnp.where(parity == 0, partner_even, partner_odd)  # (T,)
            delta = (beta - beta[partner])[:, None] * (u_all - u_all[partner])
            lu = log_u_swap[jnp.minimum(rung_idx, partner)]  # pair-shared draw
            swap_mask = (lu < delta) & (partner != rung_idx)[:, None]  # (T, C)
            sb = swap_mask.reshape(T, C, *(1,) * event_ndim)
            X = jnp.where(sb, X[partner], X)
            u_all = jnp.where(swap_mask, u_all[partner], u_all)
            if use_grad:
                g_all = jnp.where(sb, g_all[partner], g_all)

            edge_active = partner[:-1] == edge_target  # (T-1,)
            edge_accepts = jnp.where(
                edge_active, jnp.sum(swap_mask[:-1], axis=1), 0
            ).astype(jnp.int32)
            swap_accepts = pts.swap_accepts + edge_accepts
            swap_attempts = pts.swap_attempts + jnp.where(edge_active, C, 0).astype(
                jnp.int32
            )
            inst_rate = edge_accepts.astype(jnp.float32) / C
            ema = jnp.where(
                edge_active,
                (1.0 - p.swap_ema_alpha) * pts.swap_rate_ema
                + p.swap_ema_alpha * inst_rate,
                pts.swap_rate_ema,
            )

            # ---- adaptation (tuning mode only; all pure pytree updates) ----
            betas_new, steps_new, da, imd = beta, tau, pts.da, m
            if tuning:
                if p.tune_step_size:
                    acc_rate = jnp.mean(mask_move.astype(jnp.float32), axis=1)  # (T,)
                    da = da_step(da, da_params.target_acceptance_rate - acc_rate, da_params)
                    steps_new = jnp.exp(da.log_step_averaged)
                if p.tune_inv_mass_diag and C > 1:
                    var = jnp.var(X[0].reshape(C, -1), axis=0)
                    imd = p.imd_adjustment * var + (1.0 - p.imd_adjustment) * imd
                if p.tune_ladder and T >= 3:
                    temps = 1.0 / beta  # (T,) ascending
                    s = temps[1:] - temps[:-1]  # (T-1,)
                    kappa = p.ladder_kappa0 / (
                        1.0 + pts.i.astype(jnp.float32) / p.ladder_t0
                    )
                    adj = jnp.concatenate([ema[:-1] - ema[1:], jnp.zeros((1,))])
                    s = s * jnp.exp(kappa * adj)
                    s = s * (temps[-1] - temps[0]) / jnp.sum(s)  # anchor endpoints
                    temps = temps[0] + jnp.concatenate(
                        [jnp.zeros((1,)), jnp.cumsum(s)]
                    )
                    betas_new = 1.0 / temps

            pts_new = PTState(
                betas=betas_new,
                step_sizes=steps_new,
                da=da,
                inv_mass_diag=imd,
                i=pts.i + 1,
                swap_accepts=swap_accepts,
                swap_attempts=swap_attempts,
                swap_rate_ema=ema,
            )
            info = StepInfo(
                n_accepted=jnp.sum(mask_move[0]).astype(jnp.int32),  # cold rung
                diverged=diverged,
            )
            state_new = (
                (pts_new, X[1:], u_all, g_all)
                if use_grad
                else (pts_new, X[1:], u_all)
            )
            return X[0], state_new, info

        return step

    # Counter contract (SURVEY.md section 2.8 style, per rung): an eager
    # implementation evaluates U at current + proposal for every rung
    # (2*T*C calls); MALA also needs both gradients (2*T*C grads); HMC
    # follows the reference trajectory contract (2L*T*C calls and grads,
    # +2*T*C calls for the adjusted accept, ``hmc.py:122-125``). Swaps
    # reuse cached potentials on both sides.
    def calls_per_iter(self, n_chains: int) -> int:
        TC = self.kernel.n_temps * n_chains
        if self.move == "hmc":
            return (2 * self.kernel.n_leapfrog_steps + 2) * TC
        return 2 * TC

    def grads_per_iter(self, n_chains: int) -> int:
        TC = self.kernel.n_temps * n_chains
        if self.move == "hmc":
            return 2 * self.kernel.n_leapfrog_steps * TC
        return 2 * TC if self.use_grad else 0


    # ---- continuation / checkpoint hooks ----------------------------------
    _continue_needs_final_state = True  # base _run stashes via _stash_final_carry

    def _stash_final_carry(self, mstate) -> None:
        """Keep ONLY the hot-rung replica positions (``mstate[1]``) —
        everything continuation/checkpointing consumes. Stashing the full
        carry would pin every rung's potential/gradient caches
        ((T,C) + (T,C,*event) device buffers) for the sampler's lifetime
        (ADVICE r2). The tuple shape matches the consumers' ``st[1]``."""
        self._final_mstate = (None, mstate[1])

    def sample_continue(self, x0, **kwargs):
        """Continuation entry (checkpointed segments): re-seed the hot-rung
        replica positions from the previous run's final scan state — the
        plain entry collapses every rung onto ``x0``, which would restart the
        hot chains' exploration at each segment boundary."""
        st = getattr(self, "_final_mstate", None)
        if st is not None:
            self._continue_hot = st[1]  # xs_hot: (T-1, C, *event)
        self._use_continue_hot = True
        try:
            return self.sample(x0, **kwargs)
        finally:
            self._use_continue_hot = False

    def extra_resumable_state(self):
        """Checkpoint hook: the hot-rung positions (PTState carries the
        ladder/tuning scalars; replica positions live in the scan carry)."""
        st = getattr(self, "_final_mstate", None)
        hot = st[1] if st is not None else getattr(self, "_continue_hot", None)
        if hot is None:
            return {}
        return {"pt_hot_rungs": np.asarray(jax.device_get(hot))}

    def restore_extra_resumable_state(self, state) -> None:
        if "pt_hot_rungs" in state:
            self._continue_hot = np.asarray(state["pt_hot_rungs"])
            # drop any stale in-process carry: a same-process retry after a
            # failed checkpoint write must resume from the RESTORED rungs
            # (consistent with the checkpoint's cold x), not a newer carry
            self._final_mstate = None


class PTMALA(ParallelTempering):
    """Parallel tempering with MALA within-rung moves."""

    move = "mala"


class PTRWMH(ParallelTempering):
    """Parallel tempering with random-walk Metropolis within-rung moves
    (gradient-free; proposal scale ``step_k * inv_mass_diag``, the MH-kernel
    idiom at reference ``mh.py:51-54``)."""

    move = "rwmh"


class PTHMC(ParallelTempering):
    """Parallel tempering with HMC within-rung moves: ``n_leapfrog_steps``
    tempered leapfrogs per rung per iteration, every leapfrog one fused
    ``(T*C)``-batch gradient. The strongest mover per iteration of the
    family — pair with fewer outer iterations or hot-started ladders."""

    move = "hmc"
