"""Synthetic potentials: batched-callable contract, exact sampling, and
gradient finiteness (the `potentials` sibling package surface —
reference ``nfmc/sample.py:17,65-66,285-286``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfmc_tpu.potentials import (
    DiagonalGaussian,
    DiagonalGaussian1,
    DoubleWell,
    FullRankGaussian,
    Funnel,
    GaussianMixture,
    Rosenbrock,
    StandardGaussian,
    as_potential,
)
from nfmc_tpu.utils import value_and_batched_grad


def _all_potentials():
    chol = np.linalg.cholesky(np.array([[2.0, 0.5], [0.5, 1.0]]))
    return [
        StandardGaussian((3,)),
        DiagonalGaussian(mu=np.zeros(3), sigma=np.array([1.0, 2.0, 3.0])),
        DiagonalGaussian1(n_dim=4),
        FullRankGaussian(mu=np.zeros(2), chol=chol),
        Funnel(n_dim=4),
        Rosenbrock(n_dim=4),
        GaussianMixture(np.array([[-2.0, 0.0], [2.0, 0.0]], dtype=np.float32)),
        DoubleWell((3,)),
    ]


@pytest.mark.parametrize("pot", _all_potentials(), ids=lambda p: type(p).__name__)
def test_batched_contract_and_grads(pot):
    x = jax.random.normal(jax.random.key(0), (7, *pot.event_shape))
    u = pot(x)
    assert u.shape == (7,)
    assert np.isfinite(np.asarray(u)).all()
    _, g = value_and_batched_grad(pot)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize(
    "pot",
    [p for p in _all_potentials() if type(p).__name__ not in ("Rosenbrock", "DoubleWell")],
    ids=lambda p: type(p).__name__,
)
def test_exact_sampler_moments(pot):
    x = np.asarray(pot.sample((20000,), key=jax.random.key(1)))
    assert x.shape == (20000, *pot.event_shape)
    assert np.isfinite(x).all()
    if type(pot).__name__ == "GaussianMixture":
        # equal-weight symmetric modes: mean is the average of the means
        assert np.allclose(x.mean(0), pot.means.mean(0), atol=0.35)
        return
    if hasattr(pot, "mean"):
        assert np.allclose(x.mean(0), np.asarray(pot.mean), atol=0.35)
    if hasattr(pot, "second_moment") and type(pot).__name__ != "Funnel":
        assert np.allclose((x**2).mean(0), np.asarray(pot.second_moment), rtol=0.1, atol=0.1)


def test_as_potential_wraps_callable():
    pot = as_potential(lambda x: 0.5 * jnp.sum(x**2, axis=-1), event_shape=(3,))
    assert pot.event_shape == (3,)
    u = pot(jnp.ones((4, 3)))
    assert u.shape == (4,)


# ---------------------------------------------------------------------------
# Applied targets (potentials/applied.py)
# ---------------------------------------------------------------------------

def _applied_potentials():
    from nfmc_tpu.potentials import BayesianLogisticRegression, Phi4Lattice, StudentT

    return [
        BayesianLogisticRegression.synthetic(n=50, d=6, seed=0),
        Phi4Lattice(L=4),
        StudentT(n_dim=4, df=5.0),
    ]


@pytest.mark.parametrize("pot", _applied_potentials(), ids=lambda p: type(p).__name__)
def test_applied_batched_contract_and_grads(pot):
    x = jax.random.normal(jax.random.key(0), (7, *pot.event_shape))
    u = pot(x)
    assert u.shape == (7,)
    assert np.isfinite(np.asarray(u)).all()
    _, g = value_and_batched_grad(pot)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_studentt_exact_sampler():
    from nfmc_tpu.potentials import StudentT

    pot = StudentT(n_dim=3, df=5.0)
    x = np.asarray(pot.sample((40000,), key=jax.random.key(1)))
    assert np.allclose(x.mean(0), 0.0, atol=0.05)
    assert np.allclose((x**2).mean(0), 5.0 / 3.0, rtol=0.15)


def test_logreg_posterior_mala_recovers_separating_weights():
    """Short MALA run on the logistic posterior: finite draws, posterior mean
    predicts the training labels better than chance."""
    from nfmc_tpu.potentials import BayesianLogisticRegression
    from nfmc_tpu.samplers.mcmc import MALA

    pot = BayesianLogisticRegression.synthetic(n=80, d=5, seed=1)
    s = MALA(pot.event_shape, pot)
    s.params.n_warmup_iterations = 100
    s.params.n_iterations = 300
    x0 = jax.random.normal(jax.random.key(2), (16, *pot.event_shape)) * 0.1
    w = s.warmup(x0, show_progress=False, seed=3)  # tunes step ~0.55 -> ~0.04
    out = s.sample(np.asarray(w.samples)[-1], show_progress=False, seed=4)
    beta = np.asarray(out.mean)
    assert np.isfinite(beta).all()
    logits = pot.X @ beta[:-1] + beta[-1]
    acc = ((logits > 0) == (pot.y > 0)).mean()
    assert acc > 0.75, acc  # matches the MAP fit's 0.85 on this dataset


def test_phi4_matrix_event_jump_hmc():
    """phi^4 with (L, L) matrix events end-to-end through a jump sampler."""
    from nfmc_tpu.potentials import Phi4Lattice
    from nfmc_tpu.samplers.nfmc import JumpHMC

    pot = Phi4Lattice(L=4, kappa=0.2)
    s = JumpHMC(pot.event_shape, pot)
    s.params.n_iterations = 3
    s.inner_sampler.params.n_iterations = 2
    x0 = jax.random.normal(jax.random.key(4), (8, 4, 4)) * 0.1
    out = s.sample(x0, show_progress=False, seed=5)
    samples = np.asarray(out.samples)
    assert samples.shape == (3 * 3, 8, 4, 4)
    assert np.isfinite(samples).all()


def test_eight_schools():
    """Non-centered Eight Schools: finite potential/gradients, funnel-like
    coupling between log_tau and z, and NUTS recovers a positive tau with
    mu in the plausible range (classic posterior: mu ~ 8, tau ~ 6)."""
    import nfmc_tpu
    from nfmc_tpu.potentials import EightSchools

    pot = EightSchools()
    assert pot.event_shape == (10,)
    x = jax.random.normal(jax.random.key(0), (7, 10))
    u = pot(x)
    assert u.shape == (7,) and np.isfinite(np.asarray(u)).all()
    g = jax.vmap(jax.grad(lambda v: pot(v[None])[0]))(x)
    assert np.isfinite(np.asarray(g)).all()

    nfmc_tpu.set_seed(0)
    out = nfmc_tpu.sample(pot, strategy="nuts", n_chains=32, n_iterations=300,
                          warmup=True, show_progress=False, seed=2)
    s = np.asarray(out.samples)
    assert np.isfinite(s).all()
    mu = s[150:, :, 0].mean()
    tau = np.exp(s[150:, :, 1]).mean()
    assert 2.0 < mu < 14.0, mu  # pooled MLE ~7.7, shrunk by the mu prior
    # tau is weakly identified and the LogNormal prior admits tiny values;
    # just require a plausible positive scale, not the HalfCauchy-prior ~6
    assert 0.05 < tau < 15.0, tau


def test_lazy_submodule_attributes():
    """`nfmc_tpu.potentials` (and sibling submodules) resolve as attributes
    of the top-level package without eager imports."""
    import nfmc_tpu

    for mod in ("potentials", "flows", "samplers", "transport", "parallel",
                "checkpoint", "diagnostics", "flow_training", "profiling"):
        assert getattr(nfmc_tpu, mod).__name__ == f"nfmc_tpu.{mod}"
        assert mod in dir(nfmc_tpu)
    p = nfmc_tpu.potentials.StandardGaussian((3,))
    assert p.event_shape == (3,)


@pytest.mark.parametrize("pot", _applied_potentials(), ids=lambda p: type(p).__name__)
def test_applied_multi_batch_dims(pot):
    """Potential contract: batched over ARBITRARY leading dims (stacked /
    temperature-batched evaluation). StudentT/EightSchools previously folded
    extra batch dims into the event via reshape (round-3 review fix)."""
    x = jax.random.normal(jax.random.key(1), (3, 5, *pot.event_shape))
    u = pot(x)
    assert u.shape == (3, 5)
    flat = pot(x.reshape(15, *pot.event_shape))
    np.testing.assert_allclose(np.asarray(u).reshape(15), np.asarray(flat), rtol=1e-6)
