"""Dense mass-matrix (full-covariance metric) HMC/MALA — superset coverage.

The reference's Metropolis adaptation is diagonal-only
(``nfmc/algorithms/sampling/mcmc/base.py:105-161``); ``samplers/mcmc/dense.py``
adds the Stan-style dense metric. Covered here: registry/front-door reach,
identity-metric equivalence with the diagonal family, counter-contract parity
(SURVEY.md section 2.8), warmup adaptation toward the target covariance,
moment correctness on a correlated target, and the make_state/sync_from_state
checkpoint contract."""
import dataclasses

import jax
import numpy as np
import pytest

import nfmc_tpu
from nfmc_tpu import create_sampler, sample
from nfmc_tpu.potentials import FullRankGaussian
from nfmc_tpu.samplers.mcmc import (
    HMC,
    MALA,
    DenseHMC,
    DenseHMCKernel,
    DenseHMCParameters,
    DenseLangevinKernel,
    DenseLangevinParameters,
    DenseMALA,
)

from tests.util import standard_gaussian_potential


def _correlated_target(d=5, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(d, d)) * scale
    cov = a @ a.T + np.diag(np.linspace(0.5, 2.0, d))
    return FullRankGaussian(mu=np.zeros(d), chol=np.linalg.cholesky(cov)), cov


def test_dense_strategies_registered():
    names = nfmc_tpu.get_supported_samplers()
    assert "dense_hmc" in names and "dense_mala" in names


@pytest.mark.parametrize("strategy,cls", [("dense_hmc", DenseHMC), ("dense_mala", DenseMALA)])
def test_front_door_shapes(strategy, cls):
    target, _ = _correlated_target()
    sampler = create_sampler(target, strategy=strategy)
    assert isinstance(sampler, cls)
    out = sample(target, strategy=strategy, n_chains=4, n_iterations=3,
                 show_progress=False, seed=0)
    assert out.samples.shape == (3, 4, 5)
    assert np.isfinite(np.asarray(out.samples)).all()


def test_identity_metric_matches_diagonal_hmc():
    """With tuning off and an identity mass matrix, DenseHMC's trajectories
    reduce to HMC's (the metric matmuls are against I)."""
    x0 = jax.random.normal(jax.random.key(0), (8, 5))
    outs = []
    for cls in (HMC, DenseHMC):
        s = cls((5,), standard_gaussian_potential)
        s.params.n_iterations = 5
        s.params.tuning = False
        outs.append(np.asarray(
            s.sample(x0, show_progress=False, key=jax.random.key(7)).samples))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_counter_contract_matches_diagonal_family():
    """SURVEY.md section 2.8: the dense samplers report the same per-iteration
    call/grad accounting as their diagonal counterparts."""
    x0 = jax.random.normal(jax.random.key(0), (4, 5))
    for diag_cls, dense_cls in ((HMC, DenseHMC), (MALA, DenseMALA)):
        a = diag_cls((5,), standard_gaussian_potential)
        b = dense_cls((5,), standard_gaussian_potential)
        for s in (a, b):
            s.params.n_iterations = 3
        sa = a.sample(x0, show_progress=False, seed=0).statistics
        sb = b.sample(x0, show_progress=False, seed=0).statistics
        assert sa.n_target_calls == sb.n_target_calls
        assert sa.n_target_gradient_calls == sb.n_target_gradient_calls


def test_warmup_adapts_metric_toward_target_covariance():
    target, cov = _correlated_target(d=3, seed=1, scale=0.6)
    sampler = DenseMALA((3,), target)
    sampler.params.n_warmup_iterations = 300
    x0 = np.asarray(target.sample((64,), key=jax.random.key(0)))
    sampler.warmup(x0, show_progress=False, seed=2)
    est = np.asarray(sampler.kernel.mass_cov)
    # The EMA starts at identity; after warmup the off-diagonal structure must
    # track the target's (sign + rough magnitude on the dominant entry).
    ij = np.unravel_index(np.abs(np.triu(cov, 1)).argmax(), cov.shape)
    assert np.sign(est[ij]) == np.sign(cov[ij])
    assert abs(est[ij]) > 0.3 * abs(cov[ij])
    # step size was dual-averaged away from its default too
    assert sampler.kernel.step_size != DenseLangevinKernel(event_size=3).step_size


def test_dense_mala_moment_correctness():
    target, cov = _correlated_target(d=5, seed=3)
    out = sample(target, strategy="dense_mala", n_chains=128, n_iterations=300,
                 warmup=True, show_progress=False, seed=4)
    mean = np.asarray(out.mean)
    var = np.asarray(out.variance)
    assert np.abs(mean).max() < 0.25
    assert np.abs(var / np.diag(cov) - 1.0).max() < 0.35


def test_dense_kernels_roundtrip_tuned_state(tmp_path):
    """make_state/sync_from_state checkpoint contract (mirrors
    test_checkpoint.test_superset_kernels_roundtrip_tuned_state)."""
    from nfmc_tpu.checkpoint import (
        load_checkpoint,
        restore_sampler_state,
        sampler_state,
        save_checkpoint,
    )

    target, _ = _correlated_target()
    x0 = jax.random.normal(jax.random.key(0), (16, 5))
    for name, cls in (("dense_hmc", DenseHMC), ("dense_mala", DenseMALA)):
        src = cls((5,), target)
        src.params.n_warmup_iterations = 10
        src.warmup(x0, show_progress=False, seed=1)
        state = sampler_state(src, x0, jax.random.key(1))
        path = str(tmp_path / f"{name}.npz")
        save_checkpoint(path, state)

        dst = cls((5,), target)
        loaded, _ = load_checkpoint(path, sampler_state(dst, x0, jax.random.key(1)))
        x, key = restore_sampler_state(dst, loaded)
        src_leaves = jax.tree_util.tree_leaves(src.kernel.make_state())
        dst_leaves = jax.tree_util.tree_leaves(dst.kernel.make_state())
        for a, b in zip(src_leaves, dst_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        out = dst.sample(x, show_progress=False, key=key)
        assert np.isfinite(np.asarray(out.running_samples.last_sample)).all()


def test_mass_cov_shape_validated():
    with pytest.raises(ValueError):
        DenseHMCKernel(event_size=4, mass_cov=np.eye(3))
    # explicit well-shaped covariance is accepted and used
    k = DenseLangevinKernel(event_size=3, mass_cov=2.0 * np.eye(3))
    st = k.make_state()
    np.testing.assert_allclose(np.asarray(st.chol), np.sqrt(2.0) * np.eye(3), rtol=1e-3)


def test_mass_cov_positive_definite_validated():
    """ADVICE r3: a non-PD mass_cov must fail at kernel construction with the
    knob named, not as a bare LinAlgError inside make_state()."""
    bad = np.eye(4, dtype=np.float32)
    bad[0, 0] = -1.0
    with pytest.raises(ValueError, match="mass_cov"):
        DenseHMCKernel(event_size=4, mass_cov=bad)


def test_sync_carries_dual_averaging_and_refresh_counter():
    """ADVICE r3: sync_from_state must persist the dual-averaging state and
    the refresh counter t, so mid-warmup checkpoint resume continues
    adaptation instead of restarting it."""
    import jax.numpy as jnp

    k = DenseHMCKernel(event_size=3, step_size=0.2)
    st = k.make_state()
    st = dataclasses.replace(
        st,
        t=jnp.asarray(7, dtype=jnp.int32),
        da=dataclasses.replace(
            st.da,
            t=jnp.asarray(17.0, dtype=jnp.float32),
            error_sum=jnp.asarray(-0.3, dtype=jnp.float32),
        ),
    )
    k.sync_from_state(st)
    st2 = k.make_state()
    assert int(st2.t) == 7
    assert float(st2.da.t) == 17.0
    assert float(st2.da.error_sum) == pytest.approx(-0.3)

    # diagonal family: same carry (base.MetropolisKernel)
    from nfmc_tpu.samplers.mcmc.base import MetropolisKernel

    mk = MetropolisKernel(event_size=3, step_size=0.2)
    mst = mk.make_state()
    mst = dataclasses.replace(
        mst, da=dataclasses.replace(mst.da, error_sum=jnp.asarray(0.9, dtype=jnp.float32))
    )
    mk.sync_from_state(mst)
    assert float(mk.make_state().da.error_sum) == pytest.approx(0.9)


def test_split_half_shrinkage_collapses_isotropic_metric():
    """r4: on an isotropic target the split-half evidence estimate must
    detect that the dense structure is pure Wishart noise and collapse the
    FACTORIZED metric to (near-)scalar, while a correlated target retains
    its dense structure. The jitter engages only once the metric is adapted."""
    import jax.numpy as jnp

    from nfmc_tpu.potentials import FullRankGaussian, StandardGaussian

    d, C = 16, 64
    rng = np.random.default_rng(1)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    eigs = np.geomspace(1.0, 1e-2, d)
    chol_t = np.linalg.cholesky((q * eigs) @ q.T + 1e-9 * np.eye(d))

    def tuned_kernel(target):
        s = create_sampler(target, event_shape=(d,), strategy="dense_hmc",
                           param_kwargs={"n_warmup_iterations": 200})
        assert float(s.kernel.make_state().jitter_frac) == 0.0  # pre-tuning
        x0 = jnp.asarray(target.sample((C,), key=jax.random.key(2)),
                         dtype=jnp.float32)
        s.warmup(x0, show_progress=False, seed=3)
        return s.kernel

    def factor_anisotropy(kernel):
        st = kernel.make_state()
        m = np.asarray(st.chol) @ np.asarray(st.chol).T
        w = np.linalg.eigvalsh(m)
        return w.max() / w.min()

    iso_k = tuned_kernel(StandardGaussian((d,)))
    corr_k = tuned_kernel(FullRankGaussian(mu=np.zeros(d), chol=chol_t))
    # adapted metrics engage the jitter
    assert float(iso_k._resume_jitter_frac) == 1.0
    assert float(corr_k._resume_jitter_frac) == 1.0
    iso_spread = factor_anisotropy(iso_k)
    corr_spread = factor_anisotropy(corr_k)
    # iso: shrunk to near-scalar despite the raw EMA's Wishart noise
    raw_iso_spread = np.linalg.eigvalsh(iso_k.mass_cov)
    raw_iso_spread = raw_iso_spread.max() / raw_iso_spread.min()
    assert iso_spread < 1.5, iso_spread
    assert iso_spread < raw_iso_spread, (iso_spread, raw_iso_spread)
    # corr: geodesic shrinkage must RETAIN the 100x eigen structure
    assert corr_spread > 20.0, corr_spread


def test_user_mass_cov_overrides_adapted_stash():
    """r4 review: assigning a NEW mass_cov after a run must win over the
    previous run's adapted factors/jitter (the documented exact-metric
    path), while an untouched kernel keeps its adapted state."""
    import jax.numpy as jnp

    from nfmc_tpu.potentials import StandardGaussian

    target = StandardGaussian((4,))
    s = create_sampler(target, event_shape=(4,), strategy="dense_hmc",
                       param_kwargs={"n_warmup_iterations": 40})
    x0 = jax.random.normal(jax.random.key(0), (16, 4))
    s.warmup(x0, show_progress=False, seed=1)
    st_adapted = s.kernel.make_state()
    assert float(st_adapted.jitter_frac) == 1.0  # adapted: stash in effect

    my_cov = 4.0 * np.eye(4, dtype=np.float32)
    s.kernel.mass_cov = my_cov
    st = s.kernel.make_state()
    np.testing.assert_allclose(np.asarray(st.chol), 2.0 * np.eye(4), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(st.cov_a), my_cov, rtol=1e-6)
    assert float(st.jitter_frac) == 0.0  # user-trusted metric: jitter-free


def test_dense_tuning_adapts_with_two_chains():
    """r4 review: 2-3 chains cannot split-half, but tuning must still adapt
    (shared estimate, no shrinkage) instead of silently doing nothing."""
    import jax.numpy as jnp

    from nfmc_tpu.potentials import DiagonalGaussian

    target = DiagonalGaussian(mu=np.zeros(3), sigma=np.array([1.0, 2.0, 3.0], np.float32))
    s = create_sampler(target, event_shape=(3,), strategy="dense_mala",
                       param_kwargs={"n_warmup_iterations": 200})
    x0 = jnp.asarray(target.sample((2,), key=jax.random.key(1)), dtype=jnp.float32)
    before = np.array(s.kernel.mass_cov)
    s.warmup(x0, show_progress=False, seed=2)
    after = np.array(s.kernel.mass_cov)
    assert not np.allclose(before, after), "2-chain dense tuning did not adapt"
