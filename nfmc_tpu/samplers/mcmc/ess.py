"""Elliptical slice sampling (Murray, Adams & MacKay 2010), fully vectorized.

Parity with reference ``nfmc/algorithms/sampling/mcmc/ess.py``:

* ellipse ``nu ~ N(0, cov)``, threshold ``log y = -nll(f) + log u``, bracket
  ``[theta - 2 pi, theta]`` and a fixed ``max_iterations = 5`` shrink loop with
  first-acceptance-wins masks (``ess.py:12-64``) — here a masked
  ``lax.fori_loop`` inside the jitted scan step;
* the all-accept hack ``mask = ones`` (``ess.py:107``);
* quirk kept for parity: ``ESS.sample`` discards ``x0`` and redraws from the
  prior (``ess.py:121-127``);
* counters: ``(max_iterations + 1) * B`` target calls per iteration, 0 grads
  (``ess.py:114``).
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.output import MCMCOutput
from ...core.sampler import MCMCKernel, MCMCParameters
from ...utils import get_batch_shape
from .base import MCMCSampler


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ESSState:
    """Scan-carried state: Cholesky factor of the prior covariance (or None)."""

    chol: Optional[jax.Array]


@dataclass
class ESSKernel(MCMCKernel):
    event_shape: Tuple[int, ...] = ()
    cov: Optional[np.ndarray] = None

    def __post_init__(self):
        super().__post_init__()
        self.event_shape = tuple(self.event_shape)

    def make_state(self) -> ESSState:
        if self.cov is None:
            return ESSState(chol=None)
        return ESSState(chol=jnp.linalg.cholesky(jnp.asarray(self.cov, dtype=jnp.float32)))

    def sync_from_state(self, state: ESSState) -> None:
        pass

    def __repr__(self):
        return "ESS kernel"


@dataclass
class ESSParameters(MCMCParameters):
    max_ess_step_iterations: int = 5
    # Warmup-only ellipse adaptation (deviation from the reference, whose ESS
    # warmup is "Not implemented" — ``test/test_warmup.py:38,76``): match the
    # ellipse covariance to the posterior's per-dimension variance seen during
    # warmup, folding a prior-correction into the likelihood so the targeted
    # distribution is unchanged (see ``ESS.warmup``).
    tune_ellipse: bool = True
    min_ellipse_variance: float = 1e-6
    # Dense-covariance adaptation (superset of the diagonal default): match
    # the full warmup-draw covariance, shrunk toward its diagonal for
    # conditioning. Diagonal stays the default — on near-independent
    # posteriors the dense estimate only adds noise.
    dense_ellipse: bool = False
    # Shrinkage weight toward diag(cov); None = auto ``clip(d/n_eff, 0.05, 1)``
    ellipse_shrinkage: Optional[float] = None


def ess_step_draws(key, f_shape: Tuple[int, ...], event_shape: Tuple[int, ...],
                   max_iterations: int, use_chol: bool):
    """Per-iteration randomness of one ESS step, hoistable per chunk.

    Replicates the in-step key derivation exactly: (raw ellipse normal,
    threshold uniform, raw bracket-angle uniform, shrink uniforms)."""
    batch_shape = f_shape[: len(f_shape) - len(event_shape)]
    d = int(np.prod(event_shape)) if event_shape else 1
    expand = (*batch_shape, *([1] * len(event_shape)))
    k_nu, k_u, k_theta, k_shrink = jax.random.split(key, 4)
    z = jax.random.normal(k_nu, (*batch_shape, d) if use_chol else f_shape)
    u = jax.random.uniform(k_u, batch_shape)
    theta0 = jax.random.uniform(k_theta, expand)
    shrink = jax.vmap(lambda k: jax.random.uniform(k, expand))(
        jax.random.split(k_shrink, max_iterations)
    )
    return z, u, theta0, shrink


def elliptical_slice_sampling_step(
    f: jax.Array,
    negative_log_likelihood: Callable,
    event_shape: Tuple[int, ...],
    key: Optional[jax.Array],
    chol: Optional[jax.Array] = None,
    max_iterations: int = 5,
    nll_f: Optional[jax.Array] = None,
    draws=None,
):
    """One vectorized ESS step; reference ``ess.py:12-64``.

    Functionally identical to the reference loop: once a chain first accepts,
    its proposal is frozen (first-accept-wins masking); the bracket keeps
    shrinking for not-yet-accepted chains. ``nll_f`` optionally carries the
    current state's likelihood (known from the previous step's acceptance),
    saving the reference's leading evaluation; reported counters keep the
    (max_iter + 1) * B contract. ``draws`` optionally supplies the step's
    randomness pre-drawn (see :func:`ess_step_draws`); by default it derives
    from ``key``. Returns ``(f', nll(f'), accepted)``.
    """
    batch_shape = get_batch_shape(f, event_shape)
    expand = (*batch_shape, *([1] * len(event_shape)))
    if draws is None:
        draws = ess_step_draws(key, f.shape, event_shape, max_iterations, chol is not None)
    z, u, theta0, shrink = draws

    # 1. Choose ellipse
    if chol is None:
        nu = z.reshape(f.shape)
    else:
        # highest precision: the slice threshold assumes nu ~ exact N(0, cov)
        nu = jnp.matmul(z, chol.T, precision="highest").reshape(f.shape)

    # 2. Log-likelihood threshold
    if nll_f is None:
        nll_f = negative_log_likelihood(f)
    log_y = -nll_f + jnp.log(u)

    # 3. Initial proposal angle defines the bracket
    theta = theta0 * (2.0 * math.pi)
    theta_min = theta - 2.0 * math.pi
    theta_max = theta

    accepted = jnp.zeros(batch_shape, dtype=bool)
    f_proposed = f
    nll_proposed = nll_f

    def body(i, carry):
        f_proposed, nll_proposed, accepted, theta, theta_min, theta_max = carry
        f_prime = f * jnp.cos(theta) + nu * jnp.sin(theta)
        nll_prime = negative_log_likelihood(f_prime)
        newly = (-nll_prime > log_y) & (~accepted)
        bmask = newly.reshape(expand)
        f_proposed = jnp.where(bmask, f_prime, f_proposed)
        nll_proposed = jnp.where(newly, nll_prime, nll_proposed)

        theta_neg = theta < 0
        theta_min = jnp.where(theta_neg, theta, theta_min)
        theta_max = jnp.where(~theta_neg, theta, theta_max)
        theta = shrink[i] * (theta_max - theta_min) + theta_min
        accepted = accepted | newly
        return f_proposed, nll_proposed, accepted, theta, theta_min, theta_max

    f_proposed, nll_proposed, accepted, *_ = jax.lax.fori_loop(
        0, max_iterations, body,
        (f_proposed, nll_proposed, accepted, theta, theta_min, theta_max),
    )
    return f_proposed, nll_proposed, accepted


class ESS(MCMCSampler):
    def __init__(self, event_shape, target, negative_log_likelihood,
                 kernel: Optional[ESSKernel] = None, params: Optional[ESSParameters] = None):
        if kernel is None:
            kernel = ESSKernel(event_shape)
        if params is None:
            params = ESSParameters()
        super().__init__(event_shape, target, kernel, params)
        self.negative_log_likelihood = negative_log_likelihood
        # Base decomposition as supplied by the user; ellipse adaptation
        # (``warmup``) rewrites ``self.negative_log_likelihood``/``kernel.cov``
        # relative to these so repeated warmups stay exact.
        self._base_nll = negative_log_likelihood
        self._base_cov = None if kernel.cov is None else np.asarray(kernel.cov, dtype=np.float64)

    @property
    def name(self):
        return "ESS"

    def _static_config(self):
        # cov is tokenized by value: make_draws bakes use_chol into the cached
        # driver, so mutating kernel.cov between runs must rebuild it
        cov = self.kernel.cov
        cov_token = None if cov is None else hash(np.asarray(cov).tobytes())
        return (
            self.params.max_ess_step_iterations,
            cov_token,
            self.rng_hoist_element_limit,
        )

    def make_propose(self):
        nll = self.negative_log_likelihood
        event_shape = self.event_shape
        max_iterations = self.params.max_ess_step_iterations

        def propose(x, state: ESSState, key):
            x_prime, _nll_prime, _accepted = elliptical_slice_sampling_step(
                x, nll, event_shape, key, chol=state.chol, max_iterations=max_iterations
            )
            n_chains = x.shape[0]
            # All-accept hack, matching reference ``ess.py:107``.
            mask = jnp.ones((n_chains,), dtype=bool)
            finite = jnp.all(jnp.isfinite(x_prime.reshape(n_chains, -1)), axis=-1)
            mask = mask & finite
            diverged = (~jnp.all(finite)).astype(jnp.int32)
            return x_prime, mask, diverged

        return propose

    def _augment_state(self, mstate, x0):
        return (mstate, self.negative_log_likelihood(x0))

    def make_draws(self):
        event_shape = self.event_shape
        max_iterations = self.params.max_ess_step_iterations
        use_chol = self.kernel.cov is not None

        def draws(key, n_chains):
            return ess_step_draws(
                key, (n_chains, *event_shape), event_shape, max_iterations, use_chol
            )

        return draws

    def hoisted_elements_per_iter(self, x) -> int:
        # z (C*d) + u (C) + theta0 (C) + shrink (max_iter*C): for small d the
        # shrink uniforms dominate, so the base x.size estimate would let the
        # hoisted buffer blow past the cap by ~(max_iter + 2)/d.
        n_chains = int(x.shape[0])
        d = int(x.size) // max(n_chains, 1)
        return n_chains * (d + 2 + int(self.params.max_ess_step_iterations))

    def _make_step(self, tuning: bool):
        step_aux = self._make_step_aux(tuning)
        draws = self.make_draws()

        def step(x, state, key):
            return step_aux(x, state, key, draws(key, x.shape[0]))

        return step

    def _make_step_aux(self, tuning: bool):
        """Carried-likelihood step (cf. Langevin's carried potential): the
        current state's nll rides in the scan state, saving the leading
        evaluation of every iteration."""
        from ...core.driver import StepInfo

        nll = self.negative_log_likelihood
        event_shape = self.event_shape
        max_iterations = self.params.max_ess_step_iterations

        def step(x, state, key, aux):
            mstate, nll_x = state
            n_chains = x.shape[0]
            x_prime, nll_prime, _accepted = elliptical_slice_sampling_step(
                x, nll, event_shape, key, chol=mstate.chol,
                max_iterations=max_iterations, nll_f=nll_x, draws=aux,
            )
            # All-accept hack, matching reference ``ess.py:107``.
            finite = jnp.all(jnp.isfinite(x_prime.reshape(n_chains, -1)), axis=-1)
            mask = finite
            bmask = mask.reshape(mask.shape + (1,) * len(event_shape))
            x_new = jnp.where(bmask, x_prime, x)
            nll_new = jnp.where(mask, nll_prime, nll_x)
            info = StepInfo(
                n_accepted=jnp.sum(mask).astype(jnp.int32),
                diverged=(~jnp.all(finite)).astype(jnp.int32),
            )
            return x_new, (mstate, nll_new), info

        return step

    def make_update_kernel(self):
        def update(state, x, mask):
            return state

        return update

    def _apply_ellipse_adaptation(self, cov: np.ndarray) -> None:
        """Replace the ellipse prior N(0, cov_base) with N(0, S) while keeping
        the sampled posterior IDENTICAL; ``cov`` is 1-D (diagonal variances)
        or 2-D (dense covariance).

        ESS targets ``N(x; 0, cov) * exp(-nll(x))``. Swapping the prior for
        ``N(0, S)`` requires ``nll_eff(x) = nll_base(x) + log N(x;0,S)
        - log N(x;0,cov_base)`` so the product is invariant. The adapted
        ellipse matches the posterior geometry, which lengthens the accepted
        arcs (better mixing) without changing the stationary distribution.

        Numerics: both Gaussian terms are evaluated in whitened coordinates
        (host-f64 inverse Cholesky factors, highest-precision MXU matmul) —
        a dense quadratic form under TPU-default bf16 multiplies loses the
        correction signal to cancellation on ill-conditioned ellipses
        (docs/design.md numerics note).
        """
        cov = np.asarray(cov, dtype=np.float64)
        if cov.ndim == 1:
            var = np.maximum(cov.reshape(-1), self.params.min_ellipse_variance)
            S = np.diag(var)
            chol_new64 = np.diag(np.sqrt(var))
            logdet_new = float(np.sum(np.log(var)))
        else:
            d = cov.shape[0]
            S = 0.5 * (cov + cov.T)
            S[np.diag_indices(d)] = np.maximum(
                np.diag(S), self.params.min_ellipse_variance
            )
            try:
                chol_new64 = np.linalg.cholesky(S)
            except np.linalg.LinAlgError:
                # degenerate warmup draws (e.g. frozen dimensions): fall back
                # to the always-PD diagonal of the estimate
                S = np.diag(np.maximum(np.diag(S), self.params.min_ellipse_variance))
                chol_new64 = np.sqrt(S)
            logdet_new = 2.0 * float(np.sum(np.log(np.diag(chol_new64))))
        base_nll = self._base_nll
        white_new = jnp.asarray(np.linalg.inv(chol_new64).T, dtype=jnp.float32)
        if self._base_cov is None:
            white_old = None
            logdet0 = 0.0
        else:
            chol0 = np.linalg.cholesky(self._base_cov)
            white_old = jnp.asarray(np.linalg.inv(chol0).T, dtype=jnp.float32)
            logdet0 = 2.0 * float(np.sum(np.log(np.diag(chol0))))

        def corrected_nll(x):
            xf = x.reshape(x.shape[0], -1)
            y = jnp.matmul(xf, white_new, precision="highest")
            lp_new = -0.5 * jnp.sum(y * y, axis=-1) - 0.5 * logdet_new
            if white_old is None:
                lp_old = -0.5 * jnp.sum(xf * xf, axis=-1)
            else:
                y0 = jnp.matmul(xf, white_old, precision="highest")
                lp_old = -0.5 * jnp.sum(y0 * y0, axis=-1) - 0.5 * logdet0
            return base_nll(x) + (lp_new - lp_old)

        self.negative_log_likelihood = corrected_nll
        # The cov-token in _static_config changes, so the cached driver
        # (which baked the old nll closure) rebuilds on next run.
        self.kernel.cov = S.astype(np.float32)
        # Checkpoint hook (checkpoint.py _collect_extras): the RAW f64
        # adaptation input — restore replays _apply_ellipse_adaptation on it
        # and takes the IDENTICAL branch (1-D diagonal vs 2-D dense compute
        # logdet by different formulas; the f32 kernel.cov would also
        # re-derive a slightly different Cholesky). Bit-exact resume needs
        # the exact original computation.
        self._adapted_cov64 = np.asarray(cov, dtype=np.float64).copy()

    def extra_resumable_state(self):
        """Tuned state outside the make_state contract: the adapted ellipse
        (which also rewrites ``negative_log_likelihood`` — a closure the
        pytree checkpoint cannot carry, but one that re-derives exactly from
        the adapted covariance via :meth:`_apply_ellipse_adaptation`)."""
        cov = getattr(self, "_adapted_cov64", None)
        return {} if cov is None else {"ellipse_cov": cov}

    def restore_extra_resumable_state(self, state) -> None:
        if "ellipse_cov" in state:
            self._apply_ellipse_adaptation(
                np.asarray(state["ellipse_cov"], dtype=np.float64)
            )

    def _warmup_ellipse_covariance(self, out: MCMCOutput) -> Optional[np.ndarray]:
        """Covariance estimate for the adaptation: dense (shrunk toward its
        diagonal) from the stored warmup draws when ``params.dense_ellipse``,
        else the streaming per-dimension variance."""
        if getattr(self.params, "dense_ellipse", False):
            ok = out.samples is not None
            if ok:
                draws = np.asarray(out.samples, dtype=np.float64)  # (K, C, *event)
                flat = draws.reshape(-1, int(np.prod(draws.shape[2:])))
                # discard the first half as burn-in (iterations axis is leading)
                flat = flat[flat.shape[0] // 2:]
                n, d = flat.shape
                ok = n >= 8 and bool(np.all(np.isfinite(flat)))
            if ok:
                C = np.cov(flat.T).reshape(d, d)
                lam = self.params.ellipse_shrinkage
                if lam is None:
                    lam = float(np.clip(d / max(n, 1), 0.05, 1.0))
                return (1.0 - lam) * C + lam * np.diag(np.diag(C))
            # surface the degradation instead of silently honoring only half
            # the request (convention: bare prints, cf. reference imh.py:93-95)
            print(
                "Warning: dense_ellipse=True but warmup draws are unavailable/"
                "too few/non-finite; falling back to diagonal variance adaptation"
            )
        var = np.asarray(out.statistics.running_variance, dtype=np.float64).reshape(-1)
        if var.size and np.all(np.isfinite(var)) and np.any(var > 0):
            return var
        return None

    def warmup(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        """Tuning warmup with ellipse-covariance adaptation.

        The reference skips ESS warmup outright ("Not implemented",
        ``test/test_warmup.py:38,76``); SURVEY.md section 4 directs the rebuild
        to add what the reference lacks. Contract: returns the warmup draws
        ``(n_warmup, C, *event)`` like every other MCMC warmup, then (when
        ``params.tune_ellipse``) re-centers the ellipse prior on the warmup
        draws' covariance via :meth:`_apply_ellipse_adaptation` — dense
        (diagonal-shrunk) when ``params.dense_ellipse``, per-dimension
        variance otherwise.
        """
        out = super().warmup(
            x0, show_progress=show_progress,
            time_limit_seconds=time_limit_seconds, key=key, seed=seed,
        )
        if getattr(self.params, "tune_ellipse", True):
            cov = self._warmup_ellipse_covariance(out)
            if cov is not None:
                self._apply_ellipse_adaptation(cov)
        return out

    def calls_per_iter(self, n_chains: int) -> int:
        return (self.params.max_ess_step_iterations + 1) * n_chains

    def grads_per_iter(self, n_chains: int) -> int:
        return 0

    def resample_x0_fn(self, key, x):
        """Prior redraw used by ESS.sample and the fused Jump path (quirk
        parity with reference ``ess.py:121-127``)."""
        state = self.kernel.make_state()
        n_chains = x.shape[0]
        if state.chol is None:
            return jax.random.normal(key, (n_chains, *self.event_shape))
        d = state.chol.shape[0]
        z = jax.random.normal(key, (n_chains, d))
        return jnp.matmul(z, state.chol.T, precision="highest").reshape(
            n_chains, *self.event_shape
        )

    def sample(self, x0, show_progress: bool = True, time_limit_seconds=None, key=None, seed=None):
        """Quirk parity (reference ``ess.py:121-127``): redraw x0 from the prior."""
        key = self._key(key, seed)
        k0, krun = jax.random.split(key)
        x0 = self.resample_x0_fn(k0, jnp.asarray(x0))
        return super().sample(
            x0, show_progress=show_progress,
            time_limit_seconds=time_limit_seconds, key=krun,
        )

    def sample_continue(self, x0, show_progress: bool = True,
                        time_limit_seconds=None, key=None, seed=None):
        """Continuation entry: KEEP the carried positions (the per-call
        prior redraw above is a run-entry quirk — repeating it at every
        checkpoint-segment boundary would restart the chain from the prior
        each segment). Key discipline mirrors :meth:`sample` (k0 drawn and
        discarded) so segmented runs stay deterministic."""
        key = self._key(key, seed)
        _k0, krun = jax.random.split(key)
        return super().sample(
            x0, show_progress=show_progress,
            time_limit_seconds=time_limit_seconds, key=krun,
        )
