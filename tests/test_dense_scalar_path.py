"""Dense-metric scalar fast path (r5, VERDICT r4 item 4) — unit coverage.

The integration behavior (iso enters scalar mode, corr/near-iso stay dense)
is covered by test_dense_metric; here: the BUILD-time branch actually sheds
the dense matmuls from the compiled sampling step, the gate's hysteresis and
patience, and the branch-agreement invariant (dense math == scalar math
whenever the refresh has written scalar factors).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nfmc_tpu.samplers.mcmc.dense import (
    DenseHMC,
    DenseHMCKernel,
    DenseHMCParameters,
    DenseMALA,
)

from tests.util import standard_gaussian_potential


def _iter_eqns(jaxpr):
    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            vs = v if isinstance(v, (tuple, list)) else (v,)
            for u in vs:
                # duck-typed: ClosedJaxpr has .jaxpr.eqns, Jaxpr has .eqns
                inner = getattr(u, "jaxpr", u)
                if hasattr(inner, "eqns"):
                    yield from _iter_eqns(inner)


def _jaxpr_has_dd_dot(fn, *args):
    """True if any dot_general (at any nesting depth — pjit/scan/cond/vjp
    sub-jaxprs included) consumes a square (d,d) operand with d > 1."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    for eqn in _iter_eqns(jaxpr.jaxpr):
        if eqn.primitive.name == "dot_general":
            shapes = [tuple(getattr(v.aval, "shape", ())) for v in eqn.invars]
            if any(len(s) == 2 and s[0] == s[1] and s[0] > 1 for s in shapes):
                return True
    return False


def test_sampling_step_sheds_dense_matmuls_in_scalar_mode():
    """A sampling-mode step built with the kernel host-known scalar must
    contain NO (d,d) dot_general anywhere in its jaxpr; a tuning-mode build
    (which must handle a mid-run flip back to dense) keeps the dense math."""
    d = 8
    s = DenseMALA((d,), standard_gaussian_potential)
    x = jnp.zeros((4, d))
    kstate = s._augment_state(s.kernel.make_state(), x)

    def step_of(tuning):
        step = s._make_step(tuning)
        return lambda: _jaxpr_has_dd_dot(
            lambda x_, ks_, k_: step(x_, ks_, k_)[0], x, kstate, jax.random.key(0)
        )

    # dense-mode kernel: both builds keep the dense math
    assert step_of(False)()
    assert step_of(True)()

    # host-known scalar mode: the sampling build sheds it, tuning keeps it.
    # (Set the _resume_src marker too — make_state treats stashes without it
    # as stale leftovers from a replaced mass_cov and clears them.)
    s.kernel._resume_src = s.kernel.mass_cov
    s.kernel._resume_src_value = np.array(s.kernel.mass_cov, copy=True)
    s.kernel._resume_scalar_mode = True
    s.kernel._resume_mu = 1.0
    kstate = s._augment_state(s.kernel.make_state(), x)
    assert not step_of(False)()
    assert step_of(True)()
    # static config differs so memoized drivers rebuild on mode flip
    s.kernel._resume_scalar_mode = False
    cfg_dense = s._static_config()
    s.kernel._resume_scalar_mode = True
    assert s._static_config() != cfg_dense


def test_refresh_gate_hysteresis_and_patience():
    """Drive make_update_kernel's refresh directly: noise-only halves enter
    scalar mode only after `patience` consecutive refreshes; correlated
    halves recover it."""
    d, C = 6, 64
    params = DenseHMCParameters(
        tune_inv_mass_diag=True, tune_step_size=False,
        metric_refresh_every=1, scalar_fallback_patience=2,
    )
    s = DenseHMC((d,), standard_gaussian_potential,
                 kernel=DenseHMCKernel(event_size=d), params=params)
    update = s.make_update_kernel()
    st = s.kernel.make_state()

    rng = np.random.default_rng(0)

    def push(st, corr):
        # x batches whose half-covariances are either pure independent noise
        # (iso target) or share strong anisotropic structure
        if corr:
            scales = np.linspace(1.0, 10.0, d)
        else:
            scales = np.ones(d)
        x = jnp.asarray(rng.standard_normal((C, d)) * scales, jnp.float32)
        mask = jnp.ones((C,), bool)
        return update(st, x, mask)

    # iso: first low-r refresh must NOT flip (patience 2)
    st = push(st, corr=False)
    first_flip = bool(st.scalar_mode)
    st = push(st, corr=False)
    st = push(st, corr=False)
    assert not first_flip
    assert bool(st.scalar_mode), "patience-consecutive low-r did not enter scalar mode"
    # factors collapsed to the exact scalar
    chol = np.asarray(st.chol)
    assert np.allclose(chol, chol[0, 0] * np.eye(d), atol=1e-5)

    # strong correlated evidence recovers dense mode (r > scalar_recover_r)
    for _ in range(60):  # EMA needs to absorb the new structure
        st = push(st, corr=True)
    assert not bool(st.scalar_mode), "gate failed to recover dense mode"


def test_near_iso_stays_dense_at_higher_dim():
    """Regression (r5): the full-matrix r divides d diagonal signal entries
    by d^2 noise entries, so at higher dim a ±10% per-dim anisotropy read as
    noise and shed the near-iso target to scalar (its bench win collapsed
    40x -> 0.29x). The r_diag gate must keep it dense while an exactly
    isotropic target still collapses."""
    import jax.numpy as jnp

    from nfmc_tpu import create_sampler
    from nfmc_tpu.potentials import DiagonalGaussian, StandardGaussian

    d, C = 48, 64

    def tuned(target):
        s = create_sampler(target, event_shape=(d,), strategy="dense_hmc",
                           param_kwargs={"n_warmup_iterations": 250})
        x0 = jnp.asarray(target.sample((C,), key=jax.random.key(2)),
                         dtype=jnp.float32)
        s.warmup(x0, show_progress=False, seed=3)
        return bool(s.kernel._resume_scalar_mode)

    near = DiagonalGaussian(mu=np.zeros(d),
                            sigma=np.linspace(0.9, 1.1, d).astype(np.float32))
    assert not tuned(near), "near-iso anisotropy shed to scalar (r_diag gate broken)"
    assert tuned(StandardGaussian((d,))), "exact iso failed to collapse to scalar"


def test_branch_agreement_in_scalar_mode():
    """With the refresh having written scalar factors, the dense trajectory
    math must produce the SAME draws as the hard-baked scalar math — the
    invariant that makes the tuning-mode dense build safe during a flip."""
    d = 5
    s = DenseHMC((d,), standard_gaussian_potential)
    x = jax.random.normal(jax.random.key(0), (8, d))

    mu = 1.7
    base = s.kernel.make_state()
    st = dataclasses.replace(
        base,
        mu=jnp.asarray(mu, jnp.float32),
        scalar_mode=jnp.asarray(True),
        chol=jnp.asarray(np.sqrt(mu) * np.eye(d), jnp.float32),
        chol_inv=jnp.asarray(np.eye(d) / np.sqrt(mu), jnp.float32),
        jitter_frac=jnp.asarray(1.0, jnp.float32),  # gated off by scalar_mode
    )

    s._build_scalar = False
    dense_propose = s.make_propose_aux()
    s._build_scalar = True
    scalar_propose = s.make_propose_aux()

    aux = s.make_draws()(jax.random.key(3), x.shape[0])
    xa, ma, _ = dense_propose(x, st, aux)
    xb, mb, _ = scalar_propose(x, st, aux)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))
