"""AIES (affine-invariant ensemble stretch move) — superset sampler tests.

The reference has no ensemble sampler; these are correctness/unit tests in
the style SURVEY.md section 4 prescribes for rebuild supersets: stretch-draw
distribution math, moment recovery on a *correlated* Gaussian (the affine
regime MH-with-diagonal-preconditioner handles poorly), warmup tuning of the
stretch scale, counter contract, RNG-hoisting parity, and the jump_aies
interleaving law.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nfmc_tpu
from nfmc_tpu.samplers.mcmc import AIES, AIESKernel
from nfmc_tpu.samplers.nfmc import JumpAIES

from tests.util import standard_gaussian_potential


X0 = np.asarray(jax.random.normal(jax.random.key(0), (32, 5)))


def _correlated_gaussian(d=4, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(d, d))
    cov = a @ a.T / d + 0.1 * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)

    def target(x):
        xf = x.reshape(x.shape[0], -1)
        return 0.5 * jnp.einsum("bi,ij,bj->b", xf, prec, xf)

    return target, cov


def test_stretch_draw_distribution():
    """z = ((a-1)u + 1)^2 / a must follow g(z) \\propto 1/sqrt(z) on [1/a, a]:
    check support and the exact mean E[z] = (a + 1 + 1/a) / 3."""
    a = 2.0
    u = np.asarray(jax.random.uniform(jax.random.key(1), (200_000,)))
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    assert z.min() >= 1 / a - 1e-6 and z.max() <= a + 1e-6
    assert abs(z.mean() - (a + 1.0 + 1.0 / a) / 3.0) < 5e-3


def test_shapes_finiteness_counters():
    s = AIES((5,), standard_gaussian_potential)
    s.params.n_iterations = 20
    out = s.sample(X0, show_progress=False, seed=1)
    samples = np.asarray(out.samples)
    assert samples.shape == (20, 32, 5)
    assert np.isfinite(samples).all()
    st = out.statistics
    assert st.n_target_calls == 20 * 2 * 32  # eager 2B contract (cf. MH)
    assert st.n_target_gradient_calls == 0
    assert 0.0 <= float(st.acceptance_rate) <= 1.0


def test_needs_four_chains():
    s = AIES((5,), standard_gaussian_potential)
    with pytest.raises(ValueError, match="n_chains >= 4"):
        s.sample(X0[:3], show_progress=False, seed=0)


def test_correlated_gaussian_moments():
    """Affine-invariance payoff: variance recovery on a correlated Gaussian
    without any preconditioning."""
    target, cov = _correlated_gaussian(d=4)
    out = nfmc_tpu.sample(target, event_shape=(4,), strategy="aies",
                          n_chains=64, n_iterations=2000, warmup=True,
                          show_progress=False, seed=2)
    var = np.asarray(out.variance)
    true = np.diag(cov)
    assert np.all(np.abs(var - true) / true < 0.3)
    mean = np.asarray(out.mean)
    assert np.all(np.abs(mean) < 0.3 * np.sqrt(true))


def test_warmup_tunes_stretch_scale():
    target, _ = _correlated_gaussian(d=4)
    s = AIES((4,), target)
    s.params.n_warmup_iterations = 800
    a_before = s.kernel.a
    s.warmup(np.asarray(jax.random.normal(jax.random.key(3), (64, 4))),
             show_progress=False, seed=3)
    assert s.kernel.a != a_before
    out = s.sample(np.asarray(jax.random.normal(jax.random.key(4), (64, 4))),
                   show_progress=False, seed=4)
    # tuned acceptance should sit near the 0.3 target
    assert 0.15 <= float(out.statistics.acceptance_rate) <= 0.5


def test_hoisted_matches_inscan():
    def build(limit):
        s = AIES((5,), standard_gaussian_potential)
        s.params.n_iterations = 12
        s.rng_hoist_element_limit = limit
        return s

    oa = build(1 << 27).sample(X0, show_progress=False, seed=5)
    ob = build(0).sample(X0, show_progress=False, seed=5)
    assert np.allclose(np.asarray(oa.samples), np.asarray(ob.samples), atol=1e-5)


def test_jump_aies_interleaving_law():
    s = JumpAIES((5,), standard_gaussian_potential)
    s.params.n_iterations = 4
    s.inner_sampler.params.n_iterations = 3
    out = s.sample(X0[:8], show_progress=False, seed=6)
    samples = np.asarray(out.samples)
    assert samples.shape == (4 * (3 + 1), 8, 5)
    assert np.isfinite(samples).all()
    assert out.statistics.n_attempted_jumps == 4 * 8
