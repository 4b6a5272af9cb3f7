"""ChEES-HMC: jittered HMC with cross-chain adaptive trajectory length
(Hoffman, Radul & Sountsov, AISTATS 2021) — a TPU-native superset sampler.

The reference registry has no trajectory-length adaptation at all (its HMC
uses a fixed ``n_leapfrog_steps = 20``, ``nfmc/algorithms/sampling/mcmc/
hmc.py:13``, and its NUTS is a broken single-chain Pyro shim, ``nuts.py:38-51``).
ChEES is the modern accelerator-era answer: instead of NUTS' per-chain
recursive tree (control-flow-hostile, work-imbalanced across vectorized
chains), every chain runs the SAME jittered trajectory length ``t = u * T``
(``u ~ U(0,1]`` shared per iteration), and ``T`` is adapted by maximizing the
Change in the Estimator of the Expected Square criterion

    ChEES(T) = E[ (||x' - E x'||^2 - ||x - E x||^2)^2 ] / 4

whose gradient is estimated *across chains* — the cross-chain expectations
are exactly what a chain-vectorized TPU run has for free (and under GSPMD
chain sharding they compile to ``psum`` collectives over ICI). Step size is
dual-averaged toward the framework-standard 0.651 target on the mean accept
probability; ``log T`` follows Adam (lr 0.025, per the paper) on the ChEES
gradient, weighted by per-chain accept probabilities.

TPU-native notes. The per-iteration leapfrog count ``L = clip(ceil(u T /
eps), 1, max_leapfrog_steps)`` is a traced scalar, so the trajectory runs as
a ``lax.while_loop`` with a dynamic trip count inside the jitted scan step —
all chains share ``L``, so there is no per-chain work imbalance (the failure
mode that makes vectorized NUTS pad to the worst chain). Gradient work is
one pass per position (carried gradient, as in ``hmc.py``); reported
counters keep the reference 2LB contract via the driver's dynamic
``StepInfo.n_calls/n_grads`` channel (the same channel NUTS uses). Jitter
``u`` is uniform rather than the paper's quasi-random Halton sequence (a
variance, not correctness, refinement).
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.driver import StepInfo
from ...core.sampler import MCMCKernel, MCMCParameters
from ...core.tuning import (
    DualAveragingParams,
    DualAveragingState,
    da_init,
    da_update_step_size,
    ema_inv_mass_diag,
)
from ...utils import batched_grad, flatten_event, sum_except_batch
from .base import MCMCSampler


def _van_der_corput(n: jax.Array, bits: int = 24) -> jax.Array:
    """Base-2 radical inverse of the i32 counter ``n``: u in (0, 1)."""
    ks = jnp.arange(bits)
    rev = jnp.sum(((n >> ks) & 1) << (bits - 1 - ks))
    return (rev.astype(jnp.float32) + 0.5) / jnp.float32(1 << bits)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CheesState:
    """Scan-carried numeric state."""

    step_size: jax.Array  # f32 scalar
    inv_mass_diag: jax.Array  # (event_size,)
    da: DualAveragingState  # dual averaging over log step_size
    log_t: jax.Array  # f32 scalar: log trajectory length (time units)
    adam_m: jax.Array  # Adam first moment for log_t
    adam_v: jax.Array  # Adam second moment for log_t
    adam_t: jax.Array  # Adam step counter (f32)
    iter_idx: jax.Array  # i32 iteration counter (drives the Halton jitter)


@dataclass
class CheesHMCKernel(MCMCKernel):
    """Tunable state: step size, diagonal inverse mass, trajectory length."""

    event_size: int = 0
    step_size: float = 0.1
    inv_mass_diag: Optional[np.ndarray] = None
    # total integration time; None = start at one leapfrog step (the paper's
    # cold start — Adam grows it within tens of warmup iterations)
    trajectory_length: Optional[float] = None
    max_leapfrog_steps: int = 256
    adam_lr: float = 0.025
    # trajectory jitter u: "halton" (default; the paper's quasi-random van der
    # Corput sequence over the carried iteration counter — lower-variance
    # coverage of (0, 1)) or "uniform" (plain RNG draw)
    jitter: str = "halton"
    da_params: Optional[DualAveragingParams] = None


    def __post_init__(self):
        super().__post_init__()
        if self.inv_mass_diag is None:
            self.inv_mass_diag = np.ones(self.event_size, dtype=np.float32)
        else:
            self.inv_mass_diag = np.asarray(self.inv_mass_diag, dtype=np.float32)
        if self.trajectory_length is None:
            self.trajectory_length = float(self.step_size)
        if self.da_params is None:
            self.da_params = DualAveragingParams()
        if self.jitter not in ("halton", "uniform"):
            raise ValueError(f"jitter must be 'halton' or 'uniform', got {self.jitter!r}")

    def make_state(self) -> CheesState:
        resumed = getattr(self, "_resume_opt", None)
        if resumed is not None:
            da, adam_m, adam_v, adam_t, iter_idx = resumed
        else:
            da = da_init(self.step_size, self.da_params)
            adam_m = adam_v = adam_t = jnp.asarray(0.0, dtype=jnp.float32)
            iter_idx = jnp.asarray(0, dtype=jnp.int32)
        return CheesState(
            step_size=jnp.asarray(self.step_size, dtype=jnp.float32),
            inv_mass_diag=jnp.asarray(self.inv_mass_diag, dtype=jnp.float32),
            da=da,
            log_t=jnp.asarray(math.log(self.trajectory_length), dtype=jnp.float32),
            adam_m=jnp.asarray(adam_m, dtype=jnp.float32),
            adam_v=jnp.asarray(adam_v, dtype=jnp.float32),
            adam_t=jnp.asarray(adam_t, dtype=jnp.float32),
            iter_idx=jnp.asarray(iter_idx, dtype=jnp.int32),
        )

    def sync_from_state(self, state: CheesState) -> None:
        # ONE batched host fetch — three separate fetches each cost a
        # ~25-30 ms tunnel round trip per sample() call (r5, same fix as
        # the Metropolis/dense/PT kernels).
        step_size, inv_mass_diag, log_t = jax.device_get(
            (state.step_size, state.inv_mass_diag, state.log_t))
        self.step_size = float(step_size)
        self.inv_mass_diag = np.asarray(inv_mass_diag)
        self.trajectory_length = float(np.exp(log_t))
        # Carry the optimizer states (dual averaging + the trajectory Adam +
        # the Halton iteration index) like the Metropolis family does (r4):
        # a mid-warmup checkpoint resume continues adaptation exactly
        # instead of restarting both optimizers from zero.
        self._resume_opt = (
            jax.tree_util.tree_map(jnp.asarray, state.da),
            jnp.asarray(state.adam_m),
            jnp.asarray(state.adam_v),
            jnp.asarray(state.adam_t),
            jnp.asarray(state.iter_idx),
        )

    def __repr__(self):
        return (
            f"log step: {math.log(self.step_size):.2f}, "
            f"trajectory: {self.trajectory_length:.2f}, "
            f"mass norm: {float(np.max(np.abs(self.inv_mass_diag))):.2f}"
        )


@dataclass
class CheesHMCParameters(MCMCParameters):
    # No `adjustment` flag: ChEES is inherently Metropolis-adjusted — both
    # adaptations consume per-chain acceptance probabilities (use `uhmc` for
    # an unadjusted trajectory sampler).
    tune_step_size: bool = True
    tune_trajectory: bool = True
    tune_inv_mass_diag: bool = True
    imd_adjustment: float = 1e-3


class CheesHMC(MCMCSampler):
    """HMC with jittered, ChEES-adapted trajectory length.

    Works best with many chains (the ChEES gradient is a cross-chain
    estimator); with very few chains the trajectory signal is noisy and the
    fixed-length `hmc` strategy may tune faster.
    """

    def __init__(self, event_shape, target, kernel: Optional[CheesHMCKernel] = None,
                 params: Optional[CheesHMCParameters] = None):
        if kernel is None:
            kernel = CheesHMCKernel(event_size=int(np.prod(event_shape)))
        if params is None:
            params = CheesHMCParameters()
        super().__init__(event_shape, target, kernel, params)

    @property
    def name(self):
        return "ChEES-HMC"

    def _static_config(self):
        return (
            self.params.tune_step_size,
            self.params.tune_trajectory,
            self.params.tune_inv_mass_diag,
            self.params.imd_adjustment,
            self.kernel.max_leapfrog_steps,
            self.kernel.adam_lr,
            self.kernel.jitter,
            self.rng_hoist_element_limit,
        )

    # ---- RNG (chunk-hoistable; state-independent raw draws) ----------------
    def make_draws(self):
        event_size = self.kernel.event_size

        def draws(key, n_chains):
            k_mom, k_acc, k_jit = jax.random.split(key, 3)
            p_raw = jax.random.normal(k_mom, (n_chains, event_size))
            log_u = jnp.log(jax.random.uniform(k_acc, (n_chains,)))
            # u in (0, 1]: E[t] = T/2, never a zero-length trajectory
            u_jit = 1.0 - jax.random.uniform(k_jit, ())
            return p_raw, log_u, u_jit

        return draws

    def _make_step(self, tuning: bool):
        step_aux = self._make_step_aux(tuning)
        draws = self.make_draws()

        def step(x, state, key):
            return step_aux(x, state, key, draws(key, x.shape[0]))

        return step

    def _make_step_aux(self, tuning: bool):
        target = self.target
        event_shape = self.event_shape
        event_ndim = len(event_shape)
        grad_u = batched_grad(target)
        p = self.params
        kern = self.kernel
        max_steps = kern.max_leapfrog_steps
        adam_lr = kern.adam_lr
        da_params = kern.da_params
        tune_step = tuning and p.tune_step_size
        tune_traj = tuning and p.tune_trajectory
        tune_imd = tuning and p.tune_inv_mass_diag
        imd_adjustment = p.imd_adjustment
        halton = kern.jitter == "halton"

        def step(x, state, key, aux):
            cs: CheesState = state
            p_raw, log_u, u_jit = aux
            if halton:
                # quasi-random jitter over the carried counter; the hoisted
                # RNG u_jit is unused in this mode (stream unchanged).
                # 1-based (paper convention): vdc(0) ~ 3e-8 would make the
                # first iteration a degenerate near-zero-length trajectory,
                # violating the u in (0, 1] contract; vdc(1) = 0.5.
                u_jit = _van_der_corput(cs.iter_idx + 1)
            n_chains = x.shape[0]
            inv_mass = cs.inv_mass_diag
            eps = cs.step_size
            t_traj = u_jit * jnp.exp(cs.log_t)
            n_leapfrog = jnp.clip(
                jnp.ceil(t_traj / eps).astype(jnp.int32), 1, max_steps
            )

            p0 = (p_raw / jnp.sqrt(inv_mass)[None]).reshape(x.shape)

            def precondition(v):
                v_flat = flatten_event(v, event_shape)
                return (v_flat * inv_mass[None]).reshape(v.shape)

            g0 = grad_u(x)

            def cond(carry):
                return carry[0] < n_leapfrog

            def body(carry):
                i, xq, pq, gq = carry
                pq = pq - 0.5 * eps * gq
                xq = xq + eps * precondition(pq)
                gq = grad_u(xq)
                pq = pq - 0.5 * eps * gq
                return i + 1, xq, pq, gq

            _, x_prime, p_prime, _ = jax.lax.while_loop(
                cond, body, (jnp.zeros((), dtype=jnp.int32), x, p0, g0)
            )

            finite_prop = jnp.all(
                jnp.isfinite(flatten_event(x_prime, event_shape)), axis=-1
            )
            h_start = target(x) + 0.5 * sum_except_batch(precondition(p0) * p0, event_shape)
            h_end = target(x_prime) + 0.5 * sum_except_batch(
                precondition(p_prime) * p_prime, event_shape
            )
            log_alpha = h_start - h_end
            finite = finite_prop & jnp.isfinite(h_end)
            mask = (log_u < log_alpha) & finite
            bmask = mask.reshape(mask.shape + (1,) * event_ndim)
            x_new = jnp.where(bmask, x_prime, x)

            if tuning:
                # accept PROBABILITY (not indicator): the standard low-variance
                # signal for both adaptations. isfinite(log_alpha) guards a
                # NaN h_start (NaN potential at the CURRENT state with a
                # finite trajectory): the accept mask is NaN-safe via its
                # comparison, but exp(min(NaN, 0)) = NaN would poison
                # jnp.mean(alpha) -> dual averaging -> step size for the
                # rest of warmup (round-3 review fix, cf. the nuts_impl
                # NaN-accept fix).
                alpha = jnp.where(
                    finite & jnp.isfinite(log_alpha),
                    jnp.exp(jnp.minimum(log_alpha, 0.0)), 0.0
                )
                da = cs.da
                step_size = cs.step_size
                if tune_step:
                    da, step_size = da_update_step_size(da, jnp.mean(alpha), da_params)
                log_t, m, v, t_adam = cs.log_t, cs.adam_m, cs.adam_v, cs.adam_t
                if tune_traj:
                    # d ChEES / d log T, estimated across chains (means over
                    # the chain axis become psum collectives under GSPMD):
                    # dsq_c = ||x'_c - mean x'||^2 - ||x_c - mean x||^2
                    # grad_c = dsq_c * <x'_c - mean x', v'_c> * u * T
                    xf = flatten_event(x, event_shape)
                    xpf = flatten_event(x_prime, event_shape)
                    # diverged proposals: fall back to the current state so
                    # the ensemble center isn't contaminated (their ChEES
                    # contribution is already zero via the alpha weights)
                    xpf = jnp.where(finite[:, None], xpf, xf)
                    ctr = xpf - jnp.mean(xpf, axis=0, keepdims=True)
                    ctr0 = xf - jnp.mean(xf, axis=0, keepdims=True)
                    dsq = jnp.sum(ctr * ctr, axis=-1) - jnp.sum(ctr0 * ctr0, axis=-1)
                    v_end = flatten_event(precondition(p_prime), event_shape)
                    v_end = jnp.where(finite[:, None], v_end, 0.0)
                    per_chain = dsq * jnp.sum(ctr * v_end, axis=-1)
                    w_sum = jnp.maximum(jnp.sum(alpha), 1e-6)
                    grad = (jnp.sum(alpha * per_chain) / w_sum) * u_jit * jnp.exp(log_t)
                    # normalize scale-invariantly; Adam then sets the pace
                    t_adam = t_adam + 1.0
                    m = 0.9 * m + 0.1 * grad
                    v = 0.999 * v + 0.001 * grad * grad
                    m_hat = m / (1.0 - 0.9**t_adam)
                    v_hat = v / (1.0 - 0.999**t_adam)
                    log_t = log_t + adam_lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
                    # keep T realizable: at most max_steps leapfrogs, at least
                    # one step, at the CURRENT step size
                    log_t = jnp.clip(
                        log_t,
                        jnp.log(step_size),
                        jnp.log(step_size * max_steps),
                    )
                inv_mass_new = cs.inv_mass_diag
                if tune_imd and n_chains > 1:
                    inv_mass_new = ema_inv_mass_diag(
                        cs.inv_mass_diag, flatten_event(x_new, event_shape),
                        imd_adjustment,
                    )
                cs = CheesState(
                    step_size=step_size, inv_mass_diag=inv_mass_new, da=da,
                    log_t=log_t, adam_m=m, adam_v=v, adam_t=t_adam,
                    iter_idx=cs.iter_idx,
                )

            cs = dataclasses.replace(cs, iter_idx=cs.iter_idx + 1)

            # reference-style counter contract (2LB grads, +2B calls for the
            # adjustment), with the dynamic L reported through the same
            # channel NUTS uses
            info = StepInfo(
                n_accepted=jnp.sum(mask).astype(jnp.int32),
                diverged=(~jnp.all(finite)).astype(jnp.int32),
                n_calls=(2 * n_leapfrog * n_chains + 2 * n_chains).astype(jnp.int32),
                n_grads=(2 * n_leapfrog * n_chains).astype(jnp.int32),
            )
            return x_new, cs, info

        return step

    # dynamic counters ride StepInfo; nothing static per iteration
    def calls_per_iter(self, n_chains: int) -> int:
        return 0

    def grads_per_iter(self, n_chains: int) -> int:
        return 0
