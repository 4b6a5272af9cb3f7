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


def test_sharded_dense_mala_tuning_matches_unsharded():
    """Dense-metric adaptation crosses the sharded chain axis (the cross-chain
    covariance matmul becomes a GSPMD collective); tuned metric and chains
    must match the unsharded run."""
    from nfmc_tpu.samplers.mcmc import DenseMALA

    def run(sharded):
        s = DenseMALA(event_shape=(5,), target=standard_gaussian_potential)
        s.params.n_warmup_iterations = 8
        s.params.n_iterations = 4
        x0 = jax.random.normal(jax.random.key(2), (16, 5))
        if sharded:
            x0 = shard_chains(x0, chain_mesh())
        s.warmup(x0, show_progress=False, seed=9)
        out = s.sample(x0, show_progress=False, seed=9)
        return s, out

    s_plain, out_plain = run(False)
    s_shard, out_shard = run(True)
    assert np.allclose(out_plain.samples, out_shard.samples, atol=1e-4)
    assert np.allclose(s_plain.kernel.mass_cov, s_shard.kernel.mass_cov, atol=1e-5)


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


def test_sharded_neutra_hmc_matches_unsharded():
    """NeuTra-HMC: gradients THROUGH the flow inverse under GSPMD — the
    latent-space chains shard, the flow params replicate, and results match
    the single-placement run (VERDICT round 1 item 2)."""
    from nfmc_tpu.samplers.nfmc import NeuTraHMC

    from tests.util import small_flow

    def build():
        s = NeuTraHMC(event_shape=(5,), target=standard_gaussian_potential)
        s.kernel.flow = small_flow((5,))
        s.params.n_iterations = 4
        return s

    x0 = jax.random.normal(jax.random.key(8), (16, 5))
    out_plain = build().sample(x0, show_progress=False, seed=11)
    out_sharded = sharded_sample(build(), x0, show_progress=False, seed=11)
    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-4)
    assert (
        out_plain.statistics.n_accepted_trajectories
        == out_sharded.statistics.n_accepted_trajectories
    )


def test_sharded_tess_matches_unsharded():
    """TESS: bracket-shrink masks + carried density cache under GSPMD."""
    from nfmc_tpu.samplers.nfmc import TESS

    from tests.util import small_flow
    from nfmc_tpu.samplers.nfmc.tess import TESSKernel

    def build():
        s = TESS((5,), standard_gaussian_potential,
                 negative_log_likelihood=standard_gaussian_potential,
                 kernel=TESSKernel((5,), flow=small_flow((5,))))
        s.params.n_iterations = 5
        return s

    x0 = jax.random.normal(jax.random.key(9), (16, 5))
    out_plain = build().sample(x0, show_progress=False, seed=12)
    out_sharded = sharded_sample(build(), x0, show_progress=False, seed=12)
    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-4)


def test_sharded_dlmc_fused_matches_unsharded():
    """DLMC's fused path: the in-scan refit (permutation gathers + minibatch
    Adam) plus drift/accept under GSPMD."""
    from nfmc_tpu.flows import Flow, RealNVP
    from nfmc_tpu.samplers.nfmc import DLMC
    from nfmc_tpu.samplers.nfmc.dlmc import DLMCKernel

    def build():
        s = DLMC((5,), standard_gaussian_potential,
                 negative_log_likelihood=standard_gaussian_potential,
                 kernel=DLMCKernel((5,), flow=Flow(RealNVP((5,), n_layers=2, hidden_size=16), seed=0)))
        s.params.flow_fit_kwargs = dict(n_epochs=3, lr=5e-3)
        s.params.n_iterations = 5
        return s

    fused = build()
    assert fused._fused_fit_config() is not None
    x0 = jax.random.normal(jax.random.key(10), (16, 5))
    out_plain = build().sample(x0, show_progress=False, seed=13)
    out_sharded = sharded_sample(build(), x0, show_progress=False, seed=13)
    assert np.isfinite(out_sharded.samples).all()
    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-3)


def test_sharded_aft_matches_unsharded():
    """AFT with the particle axis sharded over the mesh (GSPMD through the
    SMC reweighting + flow fits)."""
    from nfmc_tpu.api.registry import create_flow_object
    from nfmc_tpu.potentials import DiagonalGaussian, StandardGaussian
    from nfmc_tpu.transport import aft
    from nfmc_tpu.transport.aft import AnnealedFlowTransport

    prior = StandardGaussian((3,))
    target_pot = DiagonalGaussian(mu=np.full(3, 2.0), sigma=np.full(3, 0.5))
    flow = 'realnvp%{"n_layers": 2, "hidden_size": 16}'
    mesh = chain_mesh()

    def sharded_prior_sample(batch_shape, key=None):
        x = prior.sample(batch_shape, key=key)
        # AFT also draws auxiliary batches whose size need not tile the mesh
        return shard_chains(x, mesh) if x.shape[0] % mesh.devices.size == 0 else x

    def run_sharded(n_train_epochs):
        flow_obj = create_flow_object(flow, prior.event_shape)
        algorithm = AnnealedFlowTransport(prior, target_pot, flow_obj,
                                          n_steps=4, n_train_epochs=n_train_epochs)
        return algorithm.run(
            sharded_prior_sample,
            n_particles=64, show_progress=False, full_output=True, seed=0,
        )

    # (a) fits disabled: the transports are deterministic (identity), so the
    # sharded SMC arithmetic must agree with the unsharded run to float
    # reduction-order tolerance — an EXACT check of the GSPMD placement.
    out_plain0 = aft(prior, target_pot, flow, n_particles=64, n_iterations=4,
                     seed=0, n_train_epochs=0)
    out_sharded0 = run_sharded(0)
    assert abs(out_sharded0["log_Z"] - out_plain0["log_Z"]) < 1e-3

    # (b) fits enabled: Adam trajectories are chaotic and the per-level
    # val-selected identity-vs-fitted transport CHOICE can flip between the
    # two runs on reduction-order float noise, so log_Z agreement is only
    # statistical — both estimates must be finite and close, and the particle
    # clouds must match in distribution.
    out_plain = aft(prior, target_pot, flow, n_particles=64, n_iterations=4,
                    seed=0, n_train_epochs=3)
    out_sharded = run_sharded(3)
    assert np.isfinite(out_sharded["log_Z"])
    assert abs(out_sharded["log_Z"] - out_plain["log_Z"]) < 0.75
    assert np.isfinite(out_sharded["particles"]).all()
    assert np.allclose(
        out_plain["particles"].mean(0), out_sharded["particles"].mean(0), atol=0.15
    )


def test_sharded_pmc_matches_unsharded():
    from nfmc_tpu.potentials import DiagonalGaussian, StandardGaussian
    from nfmc_tpu.transport.pmc import PreconditionedMonteCarlo
    from nfmc_tpu.api.registry import create_flow_object

    prior = StandardGaussian((3,))
    target_pot = DiagonalGaussian(mu=np.full(3, 2.0), sigma=np.full(3, 0.5))
    mesh = chain_mesh()

    def run(shard):
        flow_obj = create_flow_object('realnvp%{"n_layers": 2, "hidden_size": 16}',
                                      prior.event_shape)
        algo = PreconditionedMonteCarlo(prior, target_pot, flow_obj)
        sample_fn = (
            (lambda bs, key=None: shard_chains(prior.sample(bs, key=key), mesh))
            if shard else (lambda bs, key=None: prior.sample(bs, key=key))
        )
        return algo.run(sample_fn, n_particles=128, show_progress=False,
                        full_output=True, seed=0)

    out_plain = run(False)
    out_sharded = run(True)
    assert np.isfinite(out_sharded["log_Z"])
    assert abs(out_sharded["log_Z"] - out_plain["log_Z"]) < 0.3


def test_jump_fused_proposal_precompute_stays_partitioned():
    """The fused jump runner's hoisted (chunk*C, *event) proposal precompute
    must stay partitioned over the chain axis at 8 devices with a non-trivial
    chunk size (VERDICT round 1 item 2): the emitted samples and final state
    keep an 8-device, non-replicated sharding."""
    import jax.numpy as jnp

    from nfmc_tpu.core.driver import StatsAccum
    from nfmc_tpu.samplers.nfmc import JumpMALA
    from nfmc_tpu.samplers.nfmc.jump import _JumpAccum

    mesh = chain_mesh()
    s = JumpMALA((5,), standard_gaussian_potential)
    s.inner_sampler.params.n_iterations = 2
    runner = s._get_fused_runner(2)

    x = shard_chains(jax.random.normal(jax.random.key(3), (16, 5)), mesh)
    inner_kstate = s.inner_sampler._augment_state(
        s.inner_sampler.kernel.make_state(), x
    )
    acc = StatsAccum.zeros((5,))
    jump_acc = _JumpAccum.zeros((5,))
    chunk = 4
    x_out, _ks, _params, _acc, _jacc, _key, ys = runner(
        x, inner_kstate, s.kernel.flow.params, acc, jump_acc,
        jax.random.key(4), jnp.zeros(chunk, bool), chunk,
    )
    assert ys.shape == (chunk, 3, 16, 5)  # (chunk, inner+1, C, *event)
    assert len(x_out.sharding.device_set) == 8
    assert not x_out.sharding.is_fully_replicated
    assert len(ys.sharding.device_set) == 8
    assert not ys.sharding.is_fully_replicated


def test_sharded_pt_matches_unsharded():
    """Parallel tempering under GSPMD: the ladder state (hot positions of
    shape (T-1, C, *event), per-rung caches) must partition over the chain
    axis and the swap-sweep gathers (over the static temperature axis) must
    not force a resharding; draws stay bit-comparable to the unsharded run."""
    from nfmc_tpu.samplers.mcmc import PTMALA, PTKernel

    def build():
        s = PTMALA(event_shape=(5,), target=standard_gaussian_potential,
                   kernel=PTKernel(event_size=5, n_temps=4))
        s.params.n_iterations = 6
        return s

    x0 = jax.random.normal(jax.random.key(5), (16, 5))
    out_plain = build().sample(x0, show_progress=False, seed=11)
    out_sharded = sharded_sample(build(), x0, show_progress=False, seed=11)

    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-5)
    assert (
        out_plain.statistics.n_accepted_swaps
        == out_sharded.statistics.n_accepted_swaps
    )


def test_sharded_aies_matches_unsharded():
    """AIES partner selection gathers ACROSS the sharded chain axis (each
    walker's partner lives in the complementary half, i.e. on another shard
    half the time) — exactly the access pattern where a GSPMD partitioner
    surprise would hide. Parity must be exact draw-for-draw."""
    from nfmc_tpu.samplers.mcmc import AIES

    def build():
        s = AIES(event_shape=(5,), target=standard_gaussian_potential)
        s.params.n_iterations = 6
        return s

    x0 = jax.random.normal(jax.random.key(2), (16, 5))
    out_plain = build().sample(x0, show_progress=False, seed=9)
    out_sharded = sharded_sample(build(), x0, show_progress=False, seed=9)

    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-5)
    assert (
        out_plain.statistics.n_accepted_trajectories
        == out_sharded.statistics.n_accepted_trajectories
    )


def test_sharded_chees_matches_unsharded():
    """ChEES-HMC's trajectory adaptation is built from CROSS-CHAIN means
    (ensemble centers, accept-probability weights) — under GSPMD those are
    collectives over the sharded chain axis; and the leapfrog count is a
    traced while_loop bound shared by all shards. Parity must be exact
    draw-for-draw in tuning mode (where the adaptation path is live)."""
    from nfmc_tpu.samplers.mcmc import CheesHMC

    def build():
        s = CheesHMC(event_shape=(5,), target=standard_gaussian_potential)
        s.params.n_iterations = 6
        s.params.tuning = True
        return s

    x0 = jax.random.normal(jax.random.key(3), (16, 5))
    out_plain = build().sample(x0, show_progress=False, seed=13)
    out_sharded = sharded_sample(build(), x0, show_progress=False, seed=13)

    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-5)
    assert np.allclose(
        out_plain.kernel.trajectory_length,
        out_sharded.kernel.trajectory_length,
        rtol=1e-5,
    )


def test_front_door_mesh_matches_unsharded():
    """sample(..., mesh=...) shards the chain axis end-to-end: warmup, the
    reshuffled-x0 re-pin, and sampling all run SPMD and reproduce the
    single-device draws (superset of the reference API — SURVEY.md 2.5)."""
    import nfmc_tpu

    kwargs = dict(
        event_shape=(5,), strategy="mala", n_chains=16, n_iterations=4,
        n_warmup_iterations=4, warmup=True, show_progress=False, seed=11,
    )
    out_plain = nfmc_tpu.sample(standard_gaussian_potential, **kwargs)
    out_sharded = nfmc_tpu.sample(standard_gaussian_potential, mesh=chain_mesh(), **kwargs)
    assert np.allclose(out_plain.samples, out_sharded.samples, atol=1e-5)
    assert (
        out_plain.statistics.n_accepted_trajectories
        == out_sharded.statistics.n_accepted_trajectories
    )


def test_front_door_mesh_uneven_chains_rejected():
    import nfmc_tpu

    with pytest.raises(ValueError):
        nfmc_tpu.sample(
            standard_gaussian_potential, event_shape=(5,), strategy="mala",
            n_chains=10, n_iterations=2, show_progress=False, mesh=chain_mesh(),
        )


def test_resumable_sampling_keeps_chain_sharding(tmp_path):
    """sample(checkpoint_path=..., mesh=...): the chain axis stays pinned to
    the mesh across segment boundaries (shard_fn re-pins the inter-segment
    host round-trip)."""
    import numpy as np
    from jax.sharding import Mesh

    import nfmc_tpu
    from nfmc_tpu.parallel import shard_chains
    from nfmc_tpu.checkpoint import sample_resumable
    from nfmc_tpu.samplers.mcmc import MALA

    from tests.util import standard_gaussian_potential

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ("chains",))
    x0 = shard_chains(
        jax.random.normal(jax.random.key(0), (16, 5)), mesh, axis_name="chains"
    )
    s = MALA((5,), standard_gaussian_potential)
    s.params.n_iterations = 12
    pinned = []

    def shard_fn(v):
        v = shard_chains(v, mesh, axis_name="chains")
        pinned.append(len(v.sharding.device_set))
        return v

    out = sample_resumable(s, x0, str(tmp_path / "mesh_ck"),
                           segment_iterations=4, seed=2, show_progress=False,
                           shard_fn=shard_fn)
    x_last = out.running_samples.last_sample
    assert np.isfinite(np.asarray(x_last)).all()
    # the re-pin actually ran at every segment boundary and spans the mesh
    assert len(pinned) == 3 and all(p == len(devs) for p in pinned)
    # the front-door path with mesh= + checkpoint_path wires the same shard_fn
    out2 = nfmc_tpu.sample(standard_gaussian_potential, event_shape=(5,),
                           flow=None, strategy="mala", n_chains=16,
                           n_iterations=8, warmup=False, show_progress=False,
                           mesh=mesh, seed=3,
                           checkpoint_path=str(tmp_path / "mesh_fd"),
                           checkpoint_segment_iterations=4)
    assert np.isfinite(np.asarray(out2.samples)).all()


def test_sharded_sample_multi_axis_mesh():
    """Round-3 review fix: divisibility checks against the CHAINS axis size,
    not the total device count — a (2, 4) mesh accepts n_chains=6."""
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, ("chains", "data"))
    sampler = MALA(event_shape=(3,), target=standard_gaussian_potential)
    sampler.params.n_iterations = 3
    x0 = jax.random.normal(jax.random.key(1), (6, 3))
    out = sharded_sample(sampler, x0, mesh=mesh, show_progress=False, seed=2)
    assert np.isfinite(out.samples).all()
    with pytest.raises(ValueError, match="divisible"):
        sharded_sample(sampler, x0[:5], mesh=mesh, show_progress=False)


def test_sharded_sample_custom_axis_name():
    """Round-3 review fix: sharded_sample must use the mesh's own first axis
    name instead of hardcoding 'chains'."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("shards",))
    sampler = MALA(event_shape=(3,), target=standard_gaussian_potential)
    sampler.params.n_iterations = 3
    x0 = jax.random.normal(jax.random.key(2), (16, 3))
    out = sharded_sample(sampler, x0, mesh=mesh, show_progress=False, seed=4)
    assert np.isfinite(out.samples).all()
