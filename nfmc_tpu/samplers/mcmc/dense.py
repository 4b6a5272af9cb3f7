"""Dense mass-matrix (full-covariance metric) HMC and MALA.

Superset of the reference registry: the reference's Metropolis adaptation is
diagonal-only (``nfmc/algorithms/sampling/mcmc/base.py:105-161`` carries
``inv_mass_diag`` and EMAs per-dimension variance), so correlated targets
leave it preconditioner-starved. These samplers carry a full covariance
estimate ``Sigma ~ Cov(x)`` (the Stan "dense metric": kinetic energy
``0.5 p^T Sigma p``, momenta ``p ~ N(0, Sigma^{-1})``) adapted by a
cross-chain EMA during warmup.

TPU design notes (see docs/design.md "User-potential numerics"):

* The hot loop applies the metric exclusively through MXU matmuls against the
  carried Cholesky factor ``A`` (``Sigma = A A^T``) and its precomputed
  inverse — triangular solves are ~40x slower than matmuls on TPU (measured
  for ``potentials/synthetic.py FullRankGaussian``), so ``A^{-1}`` is
  refreshed alongside ``A`` instead of solving per step.
* Quadratic forms evaluate in whitened coordinates (sums of squares of
  ``p @ A`` / ``r @ A^{-T}``), never as ``x @ P @ x`` — the cancellation-free
  form that survives the TPU's default matmul precision on ill-conditioned
  metrics; the (tiny) ``(B,d)@(d,d)`` metric matmuls run ``precision="highest"``.
* Adaptation runs inside the jitted tuning scan: per-step cross-chain
  covariance EMA (one ``(d,B)@(B,d)`` matmul), with the Cholesky + inverse
  refreshed every ``metric_refresh_every`` tuning steps under a ``lax.cond``
  so the sequential factorization cost stays off the common path.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.tuning import DualAveragingParams, DualAveragingState, da_init, da_update_step_size
from ...utils import as_numpy, event_size_of, flatten_event
from .base import MetropolisKernel, MetropolisParameters
from .hmc import HMC, HMCParameters
from .langevin import Langevin, LangevinParameters


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseMetropolisState:
    """Scan-carried state for dense-metric Metropolis kernels."""

    step_size: jax.Array  # f32 scalar
    cov: jax.Array  # (d, d) EMA covariance estimate (Sigma = M^{-1})
    chol: jax.Array  # (d, d) lower A with A A^T = cov
    chol_inv: jax.Array  # (d, d) A^{-1} (lower)
    t: jax.Array  # i32 tuning-step counter (drives the refresh cadence)
    da: DualAveragingState


def _host_factorize(cov: np.ndarray, ridge: float):
    """float64 Cholesky + inverse of a covariance estimate (host, once per
    make_state); the ridge keeps warmup-synced f32 estimates factorizable."""
    cov64 = np.asarray(cov, dtype=np.float64)
    cov64 = 0.5 * (cov64 + cov64.T)
    d = cov64.shape[0]
    cov64 = cov64 + ridge * max(float(np.mean(np.diag(cov64))), 1.0) * np.eye(d)
    chol = np.linalg.cholesky(cov64)
    chol_inv = np.linalg.inv(chol)
    return chol.astype(np.float32), chol_inv.astype(np.float32)


class _DenseCovKernelMixin:
    """Shared mass_cov validation + state construction for dense kernels."""

    def _init_cov(self):
        d = self.event_size
        if self.mass_cov is None:
            self.mass_cov = np.eye(d, dtype=np.float32)
        else:
            self.mass_cov = np.asarray(self.mass_cov, dtype=np.float32)
            if self.mass_cov.shape != (d, d):
                raise ValueError(
                    f"mass_cov shape {self.mass_cov.shape} != ({d}, {d})"
                )
            # Fail at kernel construction with the knob named, not later as a
            # bare LinAlgError inside make_state().
            try:
                _host_factorize(self.mass_cov, self.make_state_ridge)
            except np.linalg.LinAlgError as e:
                raise ValueError(
                    "mass_cov must be positive definite (Cholesky "
                    f"factorization failed: {e})"
                ) from e

    def make_state(self) -> DenseMetropolisState:
        chol, chol_inv = _host_factorize(self.mass_cov, self.make_state_ridge)
        da = getattr(self, "_resume_da", None)
        t = getattr(self, "_resume_t", None)
        return DenseMetropolisState(
            step_size=jnp.asarray(self.step_size, dtype=jnp.float32),
            cov=jnp.asarray(self.mass_cov, dtype=jnp.float32),
            chol=jnp.asarray(chol),
            chol_inv=jnp.asarray(chol_inv),
            t=jnp.asarray(0, dtype=jnp.int32) if t is None else jnp.asarray(t, dtype=jnp.int32),
            da=da if da is not None else da_init(self.step_size, self.da_params),
        )

    def sync_from_state(self, state: DenseMetropolisState) -> None:
        self.step_size = float(state.step_size)
        self.mass_cov = as_numpy(state.cov)
        # Carry dual averaging + the refresh counter like step_size/cov, so a
        # checkpoint taken mid-warmup resumes adaptation (and the Cholesky
        # refresh cadence) exactly instead of silently restarting them.
        self._resume_da = jax.tree_util.tree_map(jnp.asarray, state.da)
        self._resume_t = int(state.t)

    def __repr__(self):
        diag = np.diag(np.asarray(self.mass_cov))
        return (
            f"log step: {math.log(self.step_size):.2f}, "
            f"metric diag range: [{float(diag.min()):.3g}, {float(diag.max()):.3g}]"
        )


@dataclass
class DenseHMCKernel(_DenseCovKernelMixin, MetropolisKernel):
    n_leapfrog_steps: int = 20
    mass_cov: Optional[np.ndarray] = None  # (d, d); defaults to identity
    make_state_ridge: float = 1e-6

    __repr__ = _DenseCovKernelMixin.__repr__  # progress postfix: no (d,d) dump

    def __post_init__(self):
        super().__post_init__()
        self._init_cov()


@dataclass
class DenseLangevinKernel(_DenseCovKernelMixin, MetropolisKernel):
    step_size: Optional[float] = None  # reference MALA default: d^(-1/3)
    mass_cov: Optional[np.ndarray] = None
    make_state_ridge: float = 1e-6

    __repr__ = _DenseCovKernelMixin.__repr__  # progress postfix: no (d,d) dump

    def __post_init__(self):
        if self.step_size is None:
            self.step_size = self.event_size ** (-1.0 / 3.0)
        super().__post_init__()
        self._init_cov()


@dataclass
class DenseMetricParameters(MetropolisParameters):
    """``tune_inv_mass_diag`` gates the (dense) metric adaptation — same flag
    name as the diagonal family so front-door ``param_kwargs`` stay uniform."""

    metric_adjustment: float = 0.05  # cross-chain covariance EMA weight
    metric_refresh_every: int = 8  # tuning steps between Cholesky refreshes
    metric_ridge: float = 1e-6  # per-update diagonal regularizer


@dataclass
class DenseHMCParameters(DenseMetricParameters, HMCParameters):
    pass


@dataclass
class DenseLangevinParameters(DenseMetricParameters, LangevinParameters):
    pass


class _DenseMetricMixin:
    """Adaptation + static-config plumbing shared by DenseHMC / DenseMALA."""

    def _static_config(self):
        p = self.params
        return super()._static_config() + (
            p.metric_adjustment,
            p.metric_refresh_every,
            p.metric_ridge,
        )

    def make_update_kernel(self):
        p = self.params
        kern = self.kernel
        tune_metric = getattr(p, "tune_inv_mass_diag", False)
        tune_step = getattr(p, "tune_step_size", False) and getattr(p, "adjustment", False)
        alpha = p.metric_adjustment
        refresh_every = max(1, int(p.metric_refresh_every))
        ridge = p.metric_ridge
        da_params = getattr(kern, "da_params", None) or DualAveragingParams()

        def update(mstate: DenseMetropolisState, x: jax.Array, mask: jax.Array):
            n_chains = x.shape[0]
            cov, chol, chol_inv, t = mstate.cov, mstate.chol, mstate.chol_inv, mstate.t
            if tune_metric and n_chains > 1:
                d = cov.shape[0]
                x_flat = x.reshape(n_chains, -1)
                xc = x_flat - jnp.mean(x_flat, axis=0, keepdims=True)
                c_hat = jnp.matmul(xc.T, xc, precision="highest") / (n_chains - 1)
                c_hat = c_hat + ridge * jnp.eye(d, dtype=c_hat.dtype)
                cov_new = alpha * c_hat + (1.0 - alpha) * cov
                # Guard: a non-finite batch (diverged chains) must not poison
                # the metric estimate.
                cov = jnp.where(jnp.all(jnp.isfinite(cov_new)), cov_new, cov)
                t = t + 1

                def refresh(_):
                    sym = 0.5 * (cov + cov.T)
                    a = jnp.linalg.cholesky(sym)
                    a_inv = jax.scipy.linalg.solve_triangular(
                        a, jnp.eye(d, dtype=cov.dtype), lower=True
                    )
                    ok = jnp.all(jnp.isfinite(a)) & jnp.all(jnp.isfinite(a_inv))
                    return (
                        jnp.where(ok, a, chol),
                        jnp.where(ok, a_inv, chol_inv),
                    )

                chol, chol_inv = jax.lax.cond(
                    t % refresh_every == 0,
                    refresh,
                    lambda _: (chol, chol_inv),
                    operand=None,
                )
            da = mstate.da
            step_size = mstate.step_size
            if tune_step:
                acc_rate = jnp.mean(mask.astype(jnp.float32))
                da, step_size = da_update_step_size(da, acc_rate, da_params)
            return DenseMetropolisState(
                step_size=step_size, cov=cov, chol=chol, chol_inv=chol_inv, t=t, da=da
            )

        return update


class DenseHMC(_DenseMetricMixin, HMC):
    """HMC with a dense (full-covariance) metric; see module docstring."""

    def __init__(self, event_shape, target, kernel: Optional[DenseHMCKernel] = None,
                 params: Optional[DenseHMCParameters] = None):
        if kernel is None:
            kernel = DenseHMCKernel(event_size=event_size_of(event_shape))
        if params is None:
            params = DenseHMCParameters()
        super(HMC, self).__init__(event_shape, target, kernel, params)

    @property
    def name(self):
        return "DenseHMC"

    # ---- metric hooks (A = chol(Sigma), Sigma = M^{-1}) ----------------------
    def _momentum(self, mstate, p_raw):
        # rows: xi^T A^{-1} = (A^{-T} xi)^T  =>  p ~ N(0, Sigma^{-1}) = N(0, M)
        return jnp.matmul(p_raw, mstate.chol_inv, precision="highest")

    def _precondition(self, mstate, v):
        v_flat = flatten_event(v, self.event_shape)
        w = jnp.matmul(v_flat, mstate.chol, precision="highest")  # (A^T v)^T
        return jnp.matmul(w, mstate.chol.T, precision="highest").reshape(v.shape)

    def _kinetic(self, mstate, p):
        p_flat = flatten_event(p, self.event_shape)
        w = jnp.matmul(p_flat, mstate.chol, precision="highest")  # (A^T p)^T
        return 0.5 * jnp.sum(w * w, axis=-1)  # 0.5 p^T Sigma p, whitened


class DenseMALA(_DenseMetricMixin, Langevin):
    """MALA with a dense preconditioner ``A = Sigma`` (drift ``-tau Sigma
    grad U``, noise ``sqrt(2 tau) chol(Sigma) xi``); see module docstring."""

    def __init__(self, event_shape, target, kernel: Optional[DenseLangevinKernel] = None,
                 params: Optional[DenseLangevinParameters] = None):
        if kernel is None:
            kernel = DenseLangevinKernel(event_size=event_size_of(event_shape))
        if params is None:
            params = DenseLangevinParameters()
        super(Langevin, self).__init__(event_shape, target, kernel, params)
        self.params.adjustment = True

    @property
    def name(self):
        return "DenseMALA"

    def _sigma_apply(self, mstate, v_flat):
        w = jnp.matmul(v_flat, mstate.chol, precision="highest")
        return jnp.matmul(w, mstate.chol.T, precision="highest")  # (Sigma v)^T rows

    def _drift_noise(self, mstate, g_flat, noise_flat):
        tau = mstate.step_size
        colored = jnp.matmul(noise_flat, mstate.chol.T, precision="highest")  # (A xi)^T
        return -tau * self._sigma_apply(mstate, g_flat) + jnp.sqrt(2.0 * tau) * colored

    def _proposal_potential(self, mstate, x_prime_flat, x_flat, grad_u_x_flat):
        tau = mstate.step_size
        term = x_prime_flat - x_flat + tau * self._sigma_apply(mstate, grad_u_x_flat)
        w = jnp.matmul(term, mstate.chol_inv.T, precision="highest")  # (A^{-1} r)^T
        return jnp.sum(w * w, axis=-1) / (4.0 * tau)  # ||r||^2_{Sigma^{-1}} / 4 tau
