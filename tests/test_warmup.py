"""Warmup output contracts per sampler family (mirrors reference
``test/test_warmup.py``). Documented deviation: the ESS/JumpESS cases the
reference skips as "Not implemented" (``test/test_warmup.py:38,76``) run here
un-skipped — ESS warmup adapts the ellipse covariance to the warmup draws
while folding a prior correction into the likelihood (``ess.py:ESS.warmup``),
so the targeted posterior is unchanged."""
import jax
import numpy as np
import pytest

from nfmc_tpu.core.sampler import NFMCKernel
from nfmc_tpu.samplers.mcmc import HMC, MALA, MH, RandomWalk, UHMC, ULA
from nfmc_tpu.samplers.nfmc import (
    AdaptiveIMH,
    FixedIMH,
    IMHKernel,
    JumpHMC,
    JumpMALA,
    JumpMH,
    JumpUHMC,
    JumpULA,
    NeuTraHMC,
)

from tests.util import fast_fit_kwargs, small_flow, standard_gaussian_potential

N_DIM, N_CHAINS = 5, 3


def _x0():
    return jax.random.normal(jax.random.key(1), (N_CHAINS, N_DIM))


@pytest.mark.parametrize("sampler_class", [MALA, MH, UHMC, HMC, ULA, RandomWalk])
def test_warmup_mcmc(sampler_class):
    n_iterations = 7
    sampler = sampler_class(event_shape=(N_DIM,), target=standard_gaussian_potential)
    sampler.params.n_warmup_iterations = n_iterations
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape == (n_iterations, N_CHAINS, N_DIM)
    assert np.isfinite(warmup_output.samples).all()


@pytest.mark.parametrize("sampler_class", [JumpMH, JumpULA, JumpHMC, JumpUHMC, JumpMALA])
def test_warmup_jump_nfmc(sampler_class):
    sampler = sampler_class(
        event_shape=(N_DIM,), target=standard_gaussian_potential,
        kernel=NFMCKernel((N_DIM,), flow=small_flow((N_DIM,))),
    )
    sampler.params.flow_fit_kwargs = fast_fit_kwargs()
    sampler.inner_sampler.params.n_warmup_iterations = 4
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape[1:] == (N_CHAINS, N_DIM)
    assert warmup_output.samples.ndim == 3
    assert np.isfinite(warmup_output.samples).all()


@pytest.mark.parametrize("sampler_class", [AdaptiveIMH, FixedIMH])
def test_warmup_imh(sampler_class):
    sampler = sampler_class(
        event_shape=(N_DIM,), target=standard_gaussian_potential,
        kernel=IMHKernel((N_DIM,), flow=small_flow((N_DIM,))),
    )
    sampler.params.warmup_fit_kwargs = {"n_epochs": 3, "n_samples": 8, "lr": 0.05}
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape == (1, N_CHAINS, N_DIM)
    assert np.isfinite(warmup_output.samples).all()


def test_warmup_neutra():
    sampler = NeuTraHMC(event_shape=(N_DIM,), target=standard_gaussian_potential)
    sampler.kernel.flow = small_flow((N_DIM,))
    sampler.params.warmup_fit_kwargs = {"n_epochs": 3, "n_samples": 8, "lr": 0.05}
    sampler.params.n_warmup_iterations = 4
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape == (
        sampler.inner_sampler.params.n_warmup_iterations, N_CHAINS, N_DIM
    )
    assert np.isfinite(warmup_output.samples).all()


def test_warmup_ess():
    """Un-skipped vs the reference: ESS warmup returns the standard MCMC
    warmup contract and adapts the ellipse covariance."""
    from nfmc_tpu.samplers.mcmc import ESS

    n_iterations = 7
    sampler = ESS(
        event_shape=(N_DIM,), target=standard_gaussian_potential,
        negative_log_likelihood=standard_gaussian_potential,
    )
    sampler.params.n_warmup_iterations = n_iterations
    assert sampler.kernel.cov is None
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape == (n_iterations, N_CHAINS, N_DIM)
    assert np.isfinite(warmup_output.samples).all()
    # ellipse adapted: diagonal covariance now set from warmup draw variance
    assert sampler.kernel.cov is not None
    assert sampler.kernel.cov.shape == (N_DIM, N_DIM)
    assert np.all(np.diag(sampler.kernel.cov) > 0)


def test_warmup_jump_ess():
    """Un-skipped vs the reference (``test/test_warmup.py:76``)."""
    from nfmc_tpu.samplers.nfmc import JumpESS

    sampler = JumpESS(
        event_shape=(N_DIM,), target=standard_gaussian_potential,
        negative_log_likelihood=standard_gaussian_potential,
        kernel=NFMCKernel((N_DIM,), flow=small_flow((N_DIM,))),
    )
    sampler.params.flow_fit_kwargs = fast_fit_kwargs()
    sampler.inner_sampler.params.n_warmup_iterations = 4
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape[1:] == (N_CHAINS, N_DIM)
    assert np.isfinite(warmup_output.samples).all()
    assert sampler.inner_sampler.kernel.cov is not None


def test_ess_warmup_preserves_target():
    """The ellipse adaptation must not change the sampled posterior.

    With implicit prior N(0, I) and likelihood exp(-0.5 sum(x/s)^2), the
    posterior is a diagonal Gaussian with variance 1/(1 + 1/s^2) per dim.
    After warmup adaptation (which rewrites both cov and the likelihood),
    long-run sample variance must still match the analytic value.
    """
    import jax.numpy as jnp
    from nfmc_tpu.samplers.mcmc import ESS

    s = np.array([0.5, 1.0, 2.0, 4.0], dtype=np.float32)
    target_var = 1.0 / (1.0 + 1.0 / s**2)

    def nll(x):
        return 0.5 * jnp.sum((x / s) ** 2, axis=-1)

    sampler = ESS(event_shape=(4,), target=nll, negative_log_likelihood=nll)
    sampler.params.n_warmup_iterations = 100
    sampler.params.n_iterations = 400
    x0 = jax.random.normal(jax.random.key(5), (64, 4))
    sampler.warmup(x0, show_progress=False)
    adapted_diag = np.diag(sampler.kernel.cov)
    assert not np.allclose(adapted_diag, np.ones(4), atol=0.05)
    out = sampler.sample(x0, show_progress=False)
    var = np.asarray(out.statistics.running_variance)
    np.testing.assert_allclose(var, target_var, rtol=0.2)


def test_ess_dense_ellipse_correction_exact():
    """Dense adaptation: corrected nll must equal
    nll_base + log N(x;0,S) - log N(x;0,I) pointwise."""
    import jax.numpy as jnp
    from nfmc_tpu.samplers.mcmc import ESS

    d = 5
    rng = np.random.default_rng(0)
    A = rng.normal(size=(d, d)) / np.sqrt(d)
    S = A @ A.T + 0.3 * np.eye(d)

    def nll(x):
        return 0.5 * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=-1) * 3.0

    sampler = ESS(event_shape=(d,), target=nll, negative_log_likelihood=nll)
    sampler._apply_ellipse_adaptation(S)
    assert sampler.kernel.cov.shape == (d, d)
    np.testing.assert_allclose(sampler.kernel.cov, S.astype(np.float32), rtol=1e-5)

    x = rng.normal(size=(32, d)).astype(np.float32) * 2
    got = np.asarray(sampler.negative_log_likelihood(jnp.asarray(x)))
    P = np.linalg.inv(S)
    x64 = x.astype(np.float64)
    lp_new = -0.5 * np.einsum("bi,ij,bj->b", x64, P, x64) - 0.5 * np.linalg.slogdet(S)[1]
    lp_old = -0.5 * np.sum(x64 * x64, axis=-1)
    want = np.asarray(nll(jnp.asarray(x))) + (lp_new - lp_old)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_ess_dense_ellipse_preserves_target():
    """Dense-ellipse warmup on a correlated likelihood: the posterior
    covariance must stay the analytic N(0, (I + Lambda)^-1), and the adapted
    ellipse must pick up off-diagonal structure."""
    import jax.numpy as jnp
    from nfmc_tpu.samplers.mcmc import ESS

    rho = 0.8
    Lam = np.linalg.inv((1 - rho) * np.eye(3) + rho * np.ones((3, 3))).astype(np.float32)
    post_cov = np.linalg.inv(np.eye(3) + Lam)

    def nll(x):
        xf = x.reshape(x.shape[0], -1)
        y = jnp.matmul(xf, jnp.asarray(np.linalg.cholesky(Lam)), precision="highest")
        return 0.5 * jnp.sum(y * y, axis=-1)

    sampler = ESS(event_shape=(3,), target=nll, negative_log_likelihood=nll)
    sampler.params.dense_ellipse = True
    sampler.params.n_warmup_iterations = 150
    sampler.params.n_iterations = 500
    x0 = jax.random.normal(jax.random.key(7), (128, 3))
    sampler.warmup(x0, show_progress=False)
    off = sampler.kernel.cov[np.triu_indices(3, 1)]
    assert np.any(np.abs(off) > 0.02), off
    out = sampler.sample(x0, show_progress=False)
    draws = np.asarray(out.samples)[100:].reshape(-1, 3)
    emp = draws.T @ draws / draws.shape[0]
    np.testing.assert_allclose(emp, post_cov, atol=0.06)


def test_warmup_tunes_kernel():
    """Beyond the reference: warmup must actually adapt the kernel state."""
    sampler = HMC(event_shape=(N_DIM,), target=standard_gaussian_potential)
    step_before = sampler.kernel.step_size
    sampler.params.n_warmup_iterations = 50
    sampler.warmup(jax.random.normal(jax.random.key(2), (8, N_DIM)), show_progress=False)
    assert sampler.kernel.step_size != step_before
    assert not np.allclose(sampler.kernel.inv_mass_diag, np.ones(N_DIM))


def test_tess_warmup_fused_matches_host_path():
    """TESS warmup with fixed-effort fit kwargs compiles step+refit into the
    scan; it must match the host loop's contract (latent draws, counters) and
    statistics, and must actually train the flow."""
    from nfmc_tpu.samplers.nfmc import TESS
    from nfmc_tpu.samplers.nfmc.tess import TESSKernel

    n_iter, n_chains = 10, 32

    def build():
        s = TESS((N_DIM,), standard_gaussian_potential,
                 negative_log_likelihood=standard_gaussian_potential,
                 kernel=TESSKernel((N_DIM,), flow=small_flow((N_DIM,))))
        s.params.n_warmup_iterations = n_iter
        s.params.flow_fit_kwargs = dict(n_epochs=3, lr=5e-3)
        return s

    fused = build()
    from nfmc_tpu.flows.train import fixed_effort_fit_config
    assert fixed_effort_fit_config(fused.params.flow_fit_kwargs) is not None
    p_before = jax.tree_util.tree_leaves(fused.kernel.flow.params)
    x0 = jax.random.normal(jax.random.key(3), (n_chains, N_DIM))
    out_fused = fused.warmup(x0, show_progress=False, seed=0)
    p_after = jax.tree_util.tree_leaves(fused.kernel.flow.params)
    assert any(float(np.max(np.abs(a - b))) > 0 for a, b in zip(p_before, p_after))

    host = build()
    # a real (non-None) time limit needs host control -> host loop
    host.params.flow_fit_kwargs = dict(n_epochs=3, lr=5e-3, time_limit_seconds=1e9)
    assert fixed_effort_fit_config(host.params.flow_fit_kwargs) is None
    out_host = host.warmup(x0, show_progress=False, seed=0)

    for out in (out_fused, out_host):
        assert out.samples.shape == (n_iter, n_chains, N_DIM)
        assert np.isfinite(out.samples).all()
    assert (out_fused.statistics.n_target_calls
            == out_host.statistics.n_target_calls)
    assert (out_fused.statistics.n_attempted_trajectories
            == out_host.statistics.n_attempted_trajectories)
    # different fit RNG streams -> statistical agreement of the latent draws
    assert float(np.max(np.abs(out_fused.mean - out_host.mean))) < 0.5


def test_ess_dense_ellipse_repeated_warmups_stay_exact():
    """Warming up twice re-derives the prior correction relative to the BASE
    decomposition (not the previous correction) — the sampled posterior must
    be unchanged after two adaptations."""
    import jax.numpy as jnp
    from nfmc_tpu.samplers.mcmc import ESS

    rho = 0.8
    Lam = np.linalg.inv((1 - rho) * np.eye(3) + rho * np.ones((3, 3))).astype(np.float32)
    post_cov = np.linalg.inv(np.eye(3) + Lam)

    def nll(x):
        xf = x.reshape(x.shape[0], -1)
        y = jnp.matmul(xf, jnp.asarray(np.linalg.cholesky(Lam)), precision="highest")
        return 0.5 * jnp.sum(y * y, axis=-1)

    sampler = ESS(event_shape=(3,), target=nll, negative_log_likelihood=nll)
    sampler.params.dense_ellipse = True
    sampler.params.n_warmup_iterations = 120
    sampler.params.n_iterations = 500
    x0 = jax.random.normal(jax.random.key(11), (128, 3))
    sampler.warmup(x0, show_progress=False, seed=11)
    cov_once = np.array(sampler.kernel.cov)
    sampler.warmup(x0, show_progress=False, seed=12)
    assert not np.allclose(cov_once, sampler.kernel.cov)  # it re-adapted
    out = sampler.sample(x0, show_progress=False, seed=13)
    draws = np.asarray(out.samples)[100:].reshape(-1, 3)
    emp = draws.T @ draws / draws.shape[0]
    np.testing.assert_allclose(emp, post_cov, atol=0.06)


def test_neutra_transport_x0():
    """transport_x0=True forward-maps the data-space start into latent space
    (superset of the reference's z0 = x0 quirk) and must keep posterior
    recovery intact."""
    import jax.numpy as jnp

    sigma = np.array([1.0, 2.0, 3.0], dtype=np.float32)

    def target(x):
        return 0.5 * jnp.sum((x.reshape(x.shape[0], -1) / sigma) ** 2, axis=-1)

    s = NeuTraHMC(event_shape=(3,), target=target)
    s.kernel.flow = small_flow((3,), seed=2)
    s.params.transport_x0 = True
    x0 = jax.random.normal(jax.random.key(9), (64, 3)) * sigma
    s.params.warmup_fit_kwargs = {"n_epochs": 150, "n_samples": 256, "lr": 0.005}
    s.params.n_warmup_iterations = 100
    s.params.n_iterations = 300
    s.warmup(x0, show_progress=False, seed=1)
    # post-fit the flow is non-identity: the latent start must differ from x0
    z0 = s._initial_latent(x0)
    assert not np.allclose(np.asarray(z0), np.asarray(x0))
    out = s.sample(x0, show_progress=False, seed=2)
    sig = np.sqrt(np.asarray(out.statistics.running_variance))
    np.testing.assert_allclose(sig, sigma, rtol=0.2)


def test_jump_warmup_then_sample_exactly_repeatable():
    """Seeded warmup+sample must be bit-for-bit repeatable. Regression: the
    warmup/refit flow fits shuffled their train/val split with
    ``np.random.default_rng(None)`` (fresh OS entropy per call), so two runs
    with identical seeds trained on different splits and diverged. The split
    seed now derives from the run key (``jump.py`` warmup + host refit,
    fused precompute)."""
    def run():
        s = JumpMALA(
            event_shape=(N_DIM,), target=standard_gaussian_potential,
            kernel=NFMCKernel((N_DIM,), flow=small_flow((N_DIM,))),
        )
        s.params.flow_fit_kwargs = fast_fit_kwargs()
        s.params.n_iterations = 4
        s.inner_sampler.params.n_warmup_iterations = 6
        s.inner_sampler.params.n_iterations = 3
        s.warmup(_x0(), show_progress=False, seed=5)
        return s.sample(_x0(), show_progress=False, seed=6)

    a, b = run(), run()
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))
