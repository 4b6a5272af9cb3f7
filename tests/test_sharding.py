"""Multi-device chain sharding on the 8-device virtual CPU mesh — the
distributed coverage the reference never had (SURVEY.md sections 2.5, 4)."""
import jax
import numpy as np
import pytest

from nfmc_tpu.parallel import chain_mesh, shard_chains, sharded_sample
from nfmc_tpu.samplers.mcmc import HMC, MALA

from tests.util import standard_gaussian_potential


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_chain_placement():
    mesh = chain_mesh()
    x = shard_chains(np.zeros((16, 5), dtype=np.float32), mesh)
    assert len(x.sharding.device_set) == 8


def test_sharded_mala_matches_unsharded():
    sampler = MALA(event_shape=(5,), target=standard_gaussian_potential)
    sampler.params.n_iterations = 4
    x0 = jax.random.normal(jax.random.key(0), (16, 5))

    out_plain = sampler.sample(x0, show_progress=False, seed=7)

    sampler2 = MALA(event_shape=(5,), target=standard_gaussian_potential)
    sampler2.params.n_iterations = 4
    out_sharded = sharded_sample(sampler2, x0, show_progress=False, seed=7)

    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-5)
    assert (
        out_plain.statistics.n_accepted_trajectories
        == out_sharded.statistics.n_accepted_trajectories
    )


def test_sharded_hmc_with_tuning():
    sampler = HMC(event_shape=(5,), target=standard_gaussian_potential)
    sampler.params.n_warmup_iterations = 8
    mesh = chain_mesh()
    x0 = shard_chains(jax.random.normal(jax.random.key(1), (16, 5)), mesh)
    out = sampler.warmup(x0, show_progress=False)
    assert np.isfinite(out.samples).all()


def test_sharded_imh_matches_unsharded():
    """FixedIMH's chunk-batched proposal precompute under GSPMD: the hoisted
    (chunk*C, *event) flow pass must partition over the chain axis and produce
    bit-identical draws to the unsharded run."""
    from nfmc_tpu.samplers.nfmc import FixedIMH

    def build():
        s = FixedIMH(event_shape=(5,), target=standard_gaussian_potential)
        s.params.n_iterations = 6
        return s

    x0 = jax.random.normal(jax.random.key(2), (16, 5))
    out_plain = build().sample(x0, show_progress=False, seed=3)
    out_sharded = sharded_sample(build(), x0, show_progress=False, seed=3)
    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-5)
    assert (
        out_plain.statistics.n_accepted_trajectories
        == out_sharded.statistics.n_accepted_trajectories
    )


def test_sharded_jump_mala_matches_unsharded():
    """Fused jump scan (inner trajectories + hoisted flow proposals) sharded
    over chains matches the single-device run."""
    from nfmc_tpu.samplers.nfmc import JumpMALA

    def build():
        s = JumpMALA(event_shape=(5,), target=standard_gaussian_potential)
        s.params.n_iterations = 3
        s.inner_sampler.params.n_iterations = 2
        return s

    x0 = jax.random.normal(jax.random.key(4), (16, 5))
    out_plain = build().sample(x0, show_progress=False, seed=5)
    out_sharded = sharded_sample(build(), x0, show_progress=False, seed=5)
    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-5)


def test_uneven_chains_rejected():
    sampler = MALA(event_shape=(5,), target=standard_gaussian_potential)
    with pytest.raises(ValueError):
        sharded_sample(sampler, np.zeros((10, 5), dtype=np.float32), show_progress=False)


def test_fit_with_mesh():
    """MLE flow training data-parallel over the mesh (GSPMD grad psum)."""
    from nfmc_tpu.flows import Flow, RealNVP

    mesh = chain_mesh()
    flow = Flow(RealNVP((4,), n_layers=2, hidden_size=16), seed=0)
    data = np.asarray(jax.random.normal(jax.random.key(0), (2048, 4))) * 2.0 + 1.0
    lp_before = float(np.mean(np.asarray(flow.log_prob(data[:256]))))
    flow.fit(data[:1536], x_val=data[1536:], n_epochs=60, lr=5e-3, mesh=mesh, seed=1)
    lp_after = float(np.mean(np.asarray(flow.log_prob(data[:256]))))
    assert lp_after > lp_before + 0.5
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(flow.params))


def test_variational_fit_with_mesh():
    """Reverse-KL training with the sample batch sharded over the mesh."""
    import jax.numpy as jnp

    from nfmc_tpu.flows import Flow, RealNVP

    mesh = chain_mesh()
    flow = Flow(RealNVP((4,), n_layers=2, hidden_size=16), seed=0)
    flow.variational_fit(lambda x: -0.5 * jnp.sum((x - 2.0) ** 2, axis=-1),
                         n_epochs=150, lr=1e-2, n_samples=256, mesh=mesh, seed=1)
    s = np.asarray(flow.sample(1024, seed=2))
    assert np.isfinite(s).all()
    assert abs(s.mean() - 2.0) < 0.5
