"""Execute the ACTUAL reference implementation (/root/reference) in-process.

The reference's hard dependencies (`torchflows`, `potentials`) are provided
by the from-scratch shim in ``tools/reference_shim`` (see its README). This
module is the single place that puts the reference on ``sys.path``; nothing
in ``nfmc_tpu`` imports it.

Used by ``bench.py``'s ``reference_ab`` block and
``tests/test_reference_parity.py`` for direct A/B validation: same target,
matched kernel configs, different RNG streams — then distribution-level
two-sample tests (:mod:`nfmc_tpu.validation`) and ESS/s comparison.
"""
import contextlib
import io
import os
import sys
import time
import warnings
from typing import Dict, Optional, Sequence

import numpy as np

_REFERENCE_ROOT = os.environ.get("NFMC_REFERENCE_ROOT", "/root/reference")
_SHIM_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_shim")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(_REFERENCE_ROOT, "nfmc"))


def _ensure_paths():
    for p in (_SHIM_ROOT, _REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)


# ---------------------------------------------------------------------------
# Shared fixed transports for the latent-space A/Bs (ESS/TESS/NeuTra).
#
# The default A/B flows are identity-initialized RealNVPs, which make the
# latent-space samplers' transport maps trivial (log_det = 0 everywhere), so
# they exercise the bracket/accept logic but not the pullback arithmetic.
# These two bijections are implemented twice — once against the shim's torch
# surface, once against nfmc_tpu's — with IDENTICAL math, so both frameworks
# run the same fixed nonlinear (sinh) or affine transport:
#
# * ``sinh``: x = sinh(z), elementwise; non-constant Jacobian
#   |dx/dz| = prod cosh(z) — triggers every log-det term in the latent
#   samplers (and the reference TESS's documented sign quirk, tess.py:29-32).
# * ``affine``: x = s * z with a fixed per-dim scale; CONSTANT Jacobian, so
#   sign conventions cancel in accept ratios — a valid exact A/B for TESS.
#
# Convention both sides: forward = data -> latent returns log|det dz/dx|;
# inverse = latent -> data returns log|det dx/dz|.
# ---------------------------------------------------------------------------

def _affine_scale(d: int):
    return np.linspace(0.7, 1.6, d).astype(np.float32)


def _make_reference_flow(flow_spec: str, d: int):
    """Build a shim ``torchflows.Flow`` with the fixed transport."""
    import torch

    from torchflows.bijections.base import Bijection
    from torchflows.flows import Flow

    class _Sinh(Bijection):
        def forward(self, x, context=None):
            z = torch.asinh(x)
            log_det = (-0.5 * torch.log1p(x ** 2)).flatten(1).sum(-1)
            return z, log_det

        def inverse(self, z, context=None):
            x = torch.sinh(z)
            log_det = torch.log(torch.cosh(z)).flatten(1).sum(-1)
            return x, log_det

    class _Affine(Bijection):
        def __init__(self, event_shape, scale):
            super().__init__(event_shape)
            self.register_buffer("scale", torch.as_tensor(scale))

        def forward(self, x, context=None):
            z = x / self.scale
            log_det = -torch.log(self.scale).sum().expand(x.shape[0])
            return z, log_det

        def inverse(self, z, context=None):
            x = z * self.scale
            log_det = torch.log(self.scale).sum().expand(z.shape[0])
            return x, log_det

    if flow_spec == "sinh":
        return Flow(_Sinh((d,)))
    if flow_spec == "affine":
        return Flow(_Affine((d,), _affine_scale(d)))
    raise ValueError(flow_spec)


def _make_ours_flow(flow_spec: str, d: int):
    """The nfmc_tpu side of the same fixed transport."""
    import jax.numpy as jnp

    from nfmc_tpu.flows import Bijection, Flow

    class _Sinh(Bijection):
        def init(self, key):
            return ()

        def forward_fn(self, params, x):
            z = jnp.arcsinh(x)
            log_det = (-0.5 * jnp.log1p(x ** 2)).reshape(*x.shape[:-1], -1).sum(-1)
            return z, log_det

        def inverse_fn(self, params, z):
            x = jnp.sinh(z)
            log_det = jnp.log(jnp.cosh(z)).reshape(*z.shape[:-1], -1).sum(-1)
            return x, log_det

    class _Affine(Bijection):
        def __init__(self, event_shape, scale):
            super().__init__(event_shape)
            self.scale = jnp.asarray(scale)

        def init(self, key):
            return ()

        def forward_fn(self, params, x):
            z = x / self.scale
            log_det = jnp.broadcast_to(-jnp.log(self.scale).sum(), x.shape[:-1])
            return z, log_det

        def inverse_fn(self, params, z):
            x = z * self.scale
            log_det = jnp.broadcast_to(jnp.log(self.scale).sum(), z.shape[:-1])
            return x, log_det

    if flow_spec == "sinh":
        return Flow(_Sinh((d,)), seed=0)
    if flow_spec == "affine":
        return Flow(_Affine((d,), _affine_scale(d)), seed=0)
    raise ValueError(flow_spec)


def _nll_reference(nll_spec: str, sig):
    """Auxiliary negative log-likelihood for ess/tess/dlmc (torch side).

    * ``target``: the full target potential — TESS's stationary data law is
      then exactly the diagonal Gaussian (the transport Jacobians cancel).
    * ``residual``: target minus the standard-normal prior the ESS ellipse
      supplies — ESS targets N(0, I) * exp(-nll) = the diagonal Gaussian.
    """
    if nll_spec == "target":
        return lambda x: 0.5 * ((x / sig) ** 2).flatten(1).sum(-1)
    if nll_spec == "residual":
        return lambda x: 0.5 * (((x / sig) ** 2) - x ** 2).flatten(1).sum(-1)
    raise ValueError(nll_spec)


def _nll_ours(nll_spec: str, sig):
    import jax.numpy as jnp

    s = jnp.asarray(sig)
    if nll_spec == "target":
        return lambda x: 0.5 * ((x / s) ** 2).reshape(*x.shape[:-1], -1).sum(-1)
    if nll_spec == "residual":
        return lambda x: 0.5 * (((x / s) ** 2) - x ** 2).reshape(*x.shape[:-1], -1).sum(-1)
    raise ValueError(nll_spec)


_FUNNEL_SCALE = 3.0


def run_reference(
    strategy: str,
    sigma: Sequence[float],
    n_chains: int = 32,
    n_iterations: int = 500,
    seed: int = 0,
    inner_iterations: Optional[int] = None,
    param_kwargs: Optional[dict] = None,
    kernel_kwargs: Optional[dict] = None,
    x0_from_target: bool = False,
    nll_spec: Optional[str] = None,
    flow_spec: Optional[str] = None,
    target_spec: str = "diag",
) -> Dict:
    """Run the reference's ``sample()`` on a closed-form target.

    ``target_spec="diag"`` (default): ``U(x) = 0.5 * sum((x_i / sigma_i)^2)``
    — the same closed form the matched nfmc-tpu run uses
    (``nfmc_tpu.potentials.DiagonalGaussian``). ``target_spec="funnel"``:
    Neal's funnel with ``len(sigma)`` dims, the exact formula of
    ``nfmc_tpu.potentials.Funnel`` (``sigma`` then only sets the dimension).
    Returns draws ``(T, C, d)`` (host NumPy), wall seconds for the sampling
    call, and the reference's own statistics counters.

    ``x0_from_target``: draw the initial states exactly from the target
    (possible in closed form for both targets) so every chain starts
    IN stationarity — the two-sample parity tests then measure kernel bias
    alone, with no burn-in transient to confound them (slow-mixing defaults
    like HMC's otherwise need thousands of discard iterations).
    """
    _ensure_paths()
    import math

    import torch

    from nfmc import sample  # the reference package, via the shim

    torch.manual_seed(seed)
    sig = torch.tensor(np.asarray(sigma, dtype=np.float32))
    d = int(sig.numel())

    if target_spec == "funnel":
        log_2pi = math.log(2.0 * math.pi)

        def target(x):
            v = x[:, 0]
            rest = x[:, 1:]
            log_p_v = (-0.5 * (v / _FUNNEL_SCALE) ** 2 - 0.5 * log_2pi
                       - math.log(_FUNNEL_SCALE))
            log_p_rest = (-0.5 * (rest ** 2).sum(-1) * torch.exp(-v)
                          - 0.5 * (d - 1) * (log_2pi + v))
            return -(log_p_v + log_p_rest)
    elif target_spec == "diag":
        def target(x):
            return 0.5 * ((x / sig) ** 2).flatten(1).sum(-1)
    else:
        raise ValueError(target_spec)

    kwargs = {}
    if param_kwargs:
        kwargs["param_kwargs"] = dict(param_kwargs)
    if kernel_kwargs:
        kwargs["kernel_kwargs"] = dict(kernel_kwargs)
    if inner_iterations is not None:
        kwargs["inner_param_kwargs"] = {"n_iterations": int(inner_iterations)}
    needs_flow = not (
        strategy in ("mh", "mala", "ula", "hmc", "uhmc", "ess")
        or strategy.startswith("pt_")
    )
    if not needs_flow:
        kwargs["flow"] = "None"
    if flow_spec is not None:
        kwargs["flow"] = _make_reference_flow(flow_spec, d)
    if nll_spec is not None:
        kwargs["negative_log_likelihood"] = _nll_reference(nll_spec, sig)

    x0 = torch.randn(n_chains, d)
    if x0_from_target:
        if target_spec == "funnel":
            v = _FUNNEL_SCALE * torch.randn(n_chains, 1)
            rest = torch.randn(n_chains, d - 1) * torch.exp(0.5 * v)
            x0 = torch.cat([v, rest], dim=-1)
        else:
            x0 = x0 * sig
    t0 = time.time()
    with warnings.catch_warnings(), contextlib.redirect_stderr(io.StringIO()):
        # stderr redirect: the reference's TESS ignores show_progress and
        # unconditionally streams a tqdm bar (tess.py:164)
        warnings.simplefilter("ignore")
        out = sample(
            target,
            event_shape=(d,),
            strategy=strategy,
            n_chains=n_chains,
            n_iterations=n_iterations,
            x0=x0,
            warmup=False,
            show_progress=False,
            **kwargs,
        )
    wall = time.time() - t0
    draws = out.samples.detach().cpu().numpy()
    stats = out.statistics
    return {
        "draws": draws,
        "wall_s": wall,
        "accept_rate": float(stats.acceptance_rate),
        "n_divergences": int(stats.n_divergences),
        "strategy": strategy,
    }


def run_ours_matched(
    strategy: str,
    sigma: Sequence[float],
    n_chains: int = 32,
    n_iterations: int = 500,
    seed: int = 0,
    inner_iterations: Optional[int] = None,
    param_kwargs: Optional[dict] = None,
    kernel_kwargs: Optional[dict] = None,
    x0_from_target: bool = False,
    nll_spec: Optional[str] = None,
    flow_spec: Optional[str] = None,
    target_spec: str = "diag",
) -> Dict:
    """The nfmc-tpu side of the A/B: identical target/config, JAX RNG."""
    import jax

    import nfmc_tpu
    from nfmc_tpu.potentials import DiagonalGaussian, Funnel

    sig = np.asarray(sigma, dtype=np.float32)
    d = len(sig)
    if target_spec == "funnel":
        target = Funnel(n_dim=d, scale=_FUNNEL_SCALE)
    elif target_spec == "diag":
        target = DiagonalGaussian(mu=np.zeros(d), sigma=sig)
    else:
        raise ValueError(target_spec)
    kwargs = {}
    if param_kwargs:
        kwargs["param_kwargs"] = dict(param_kwargs)
    if kernel_kwargs:
        kwargs["kernel_kwargs"] = dict(kernel_kwargs)
    if inner_iterations is not None:
        kwargs["inner_param_kwargs"] = {"n_iterations": int(inner_iterations)}
    if strategy in ("mh", "mala", "ula", "hmc", "uhmc", "ess") or strategy.startswith("pt_"):
        kwargs["flow"] = "None"
    if flow_spec is not None:
        kwargs["flow"] = _make_ours_flow(flow_spec, d)
    if nll_spec is not None:
        kwargs["negative_log_likelihood"] = _nll_ours(nll_spec, sig)
    x0 = jax.random.normal(jax.random.key(seed), (n_chains, d))
    if x0_from_target:
        if target_spec == "funnel":
            x0 = target.sample((n_chains,), key=jax.random.key(seed))
        else:
            x0 = x0 * sig
    t0 = time.time()
    out = nfmc_tpu.sample(
        target,
        strategy=strategy,
        n_chains=n_chains,
        n_iterations=n_iterations,
        x0=x0,
        warmup=False,
        show_progress=False,
        seed=seed,
        **kwargs,
    )
    draws = np.asarray(out.samples)
    wall = time.time() - t0
    return {
        "draws": draws,
        "wall_s": wall,
        "accept_rate": float(out.statistics.acceptance_rate),
        "n_divergences": int(out.statistics.n_divergences),
        "strategy": strategy,
    }


def run_ours_steady(
    strategy: str,
    sigma: Sequence[float],
    n_chains: int = 32,
    n_iterations: int = 500,
    seed: int = 0,
    inner_iterations: Optional[int] = None,
    reps: int = 3,
) -> Dict:
    """Steady-state wall for the matched config: build ONE sampler, absorb
    the per-sampler trace/compile in an untimed call, then time ``reps``
    repeat calls on the memoized driver and report the best.

    Rationale: at the reference-native 32-chain scale a single front-door
    ``sample()`` call's wall is dominated by one-time JAX tracing (and, on
    the tunneled TPU, host<->device sync latency), not sampling compute —
    the eager reference pays neither. A production user who samples
    repeatedly (or at real scale) sees the amortized figure; the A/B block
    reports both, labeled.
    """
    import jax

    from nfmc_tpu.api.sample import create_sampler
    from nfmc_tpu.potentials import DiagonalGaussian

    sig = np.asarray(sigma, dtype=np.float32)
    d = len(sig)
    target = DiagonalGaussian(mu=np.zeros(d), sigma=sig)
    kwargs = {}
    if inner_iterations is not None:
        kwargs["inner_param_kwargs"] = {"n_iterations": int(inner_iterations)}
    if strategy in ("mh", "mala", "ula", "hmc", "uhmc", "ess") or strategy.startswith("pt_"):
        kwargs["flow"] = "None"
    sampler = create_sampler(
        target=target, event_shape=(d,), strategy=strategy,
        param_kwargs={"n_iterations": int(n_iterations)}, **kwargs,
    )
    x0 = jax.random.normal(jax.random.key(seed), (n_chains, d)) * sig
    sampler.sample(x0, show_progress=False, seed=seed)  # trace + compile
    best = None
    out = None
    for _ in range(max(1, int(reps))):
        t0 = time.time()
        out = sampler.sample(x0, show_progress=False, seed=seed)
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
    return {
        "draws": np.asarray(out.samples),
        "wall_s": best,
        "accept_rate": float(out.statistics.acceptance_rate),
        "strategy": strategy,
    }
