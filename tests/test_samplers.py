"""Shape/finiteness matrix for every sampler class and sample() strategy.

Mirrors reference ``test/test_samplers.py`` including the jump interleaving
law ``(n_iter * (inner + 1), C, *event)``; NUTS is additionally covered
multi-chain (the reference excludes it, ``test_samplers.py:24``).
"""
import jax
import numpy as np
import pytest

from nfmc_tpu import sample
from nfmc_tpu.core.output import MCMCOutput
from nfmc_tpu.core.sampler import NFMCKernel
from nfmc_tpu.samplers.mcmc import ESS, HMC, MALA, MH, NUTS, RandomWalk, UHMC, ULA
from nfmc_tpu.samplers.nfmc import (
    DLMC,
    TESS,
    AdaptiveIMH,
    DLMCKernel,
    FixedIMH,
    IMHKernel,
    JumpESS,
    JumpHMC,
    JumpMALA,
    JumpMH,
    JumpUHMC,
    JumpULA,
    NeuTraHMC,
    TESSKernel,
)

from tests.util import fast_fit_kwargs, small_flow, standard_gaussian_potential

N_ITERATIONS, N_CHAINS, EVENT_SHAPE = 3, 4, (5,)


def _x0():
    return jax.random.normal(jax.random.key(1), (N_CHAINS, *EVENT_SHAPE))


@pytest.mark.parametrize("sampler_class", [MH, RandomWalk, HMC, UHMC, MALA, ULA])
def test_mcmc(sampler_class):
    sampler = sampler_class(event_shape=EVENT_SHAPE, target=standard_gaussian_potential)
    sampler.params.n_iterations = N_ITERATIONS
    output = sampler.sample(x0=_x0(), show_progress=False)
    assert isinstance(output, MCMCOutput)
    assert output.samples.shape == (N_ITERATIONS, N_CHAINS, *EVENT_SHAPE)
    assert np.isfinite(output.samples).all()


def test_nuts_multichain():
    sampler = NUTS(event_shape=EVENT_SHAPE, target=standard_gaussian_potential)
    sampler.kernel.max_tree_depth = 4
    sampler.params.n_iterations = N_ITERATIONS
    output = sampler.sample(x0=_x0(), show_progress=False)
    assert output.samples.shape == (N_ITERATIONS, N_CHAINS, *EVENT_SHAPE)
    assert np.isfinite(output.samples).all()


def test_ess():
    sampler = ESS(
        event_shape=EVENT_SHAPE,
        target=standard_gaussian_potential,
        negative_log_likelihood=standard_gaussian_potential,
    )
    sampler.params.n_iterations = N_ITERATIONS
    output = sampler.sample(x0=_x0(), show_progress=False)
    assert output.samples.shape == (N_ITERATIONS, N_CHAINS, *EVENT_SHAPE)
    assert np.isfinite(output.samples).all()


@pytest.mark.parametrize("sampler_class", [JumpMALA, JumpMH, JumpHMC, JumpUHMC, JumpULA])
def test_jump_nfmc(sampler_class):
    sampler = sampler_class(
        event_shape=EVENT_SHAPE,
        target=standard_gaussian_potential,
        kernel=NFMCKernel(EVENT_SHAPE, flow=small_flow()),
    )
    sampler.params.n_iterations = N_ITERATIONS
    sampler.inner_sampler.params.n_iterations = 5
    output = sampler.sample(x0=_x0(), show_progress=False)
    assert output.samples.shape == (
        N_ITERATIONS * (sampler.inner_sampler.params.n_iterations + 1),
        N_CHAINS,
        *EVENT_SHAPE,
    )
    assert np.isfinite(output.samples).all()


def test_jump_ess():
    sampler = JumpESS(
        event_shape=EVENT_SHAPE,
        target=standard_gaussian_potential,
        negative_log_likelihood=standard_gaussian_potential,
        kernel=NFMCKernel(EVENT_SHAPE, flow=small_flow()),
    )
    sampler.params.n_iterations = N_ITERATIONS
    sampler.inner_sampler.params.n_iterations = 5
    output = sampler.sample(x0=_x0(), show_progress=False)
    assert output.samples.shape == (N_ITERATIONS * 6, N_CHAINS, *EVENT_SHAPE)
    assert np.isfinite(output.samples).all()


@pytest.mark.parametrize("sampler_class", [TESS, DLMC])
def test_nfmc_with_nll(sampler_class):
    kernel_cls = TESSKernel if sampler_class is TESS else DLMCKernel
    sampler = sampler_class(
        event_shape=EVENT_SHAPE,
        target=standard_gaussian_potential,
        negative_log_likelihood=standard_gaussian_potential,
        kernel=kernel_cls(EVENT_SHAPE, flow=small_flow()),
    )
    sampler.params.n_iterations = N_ITERATIONS
    sampler.params.flow_fit_kwargs = fast_fit_kwargs()
    output = sampler.sample(x0=_x0(), show_progress=False)
    assert output.samples.shape == (N_ITERATIONS, N_CHAINS, *EVENT_SHAPE)
    assert np.isfinite(output.samples).all()


@pytest.mark.parametrize("sampler_class", [FixedIMH, AdaptiveIMH])
def test_imh(sampler_class):
    sampler = sampler_class(
        event_shape=EVENT_SHAPE,
        target=standard_gaussian_potential,
        kernel=IMHKernel(EVENT_SHAPE, flow=small_flow()),
    )
    sampler.params.n_iterations = N_ITERATIONS
    output = sampler.sample(x0=_x0(), show_progress=False)
    assert output.samples.shape == (N_ITERATIONS, N_CHAINS, *EVENT_SHAPE)
    assert np.isfinite(output.samples).all()


def test_neutra_hmc():
    sampler = NeuTraHMC(event_shape=EVENT_SHAPE, target=standard_gaussian_potential)
    sampler.kernel.flow = small_flow()
    sampler.params.n_iterations = N_ITERATIONS
    output = sampler.sample(x0=_x0(), show_progress=False)
    assert output.samples.shape == (N_ITERATIONS, N_CHAINS, *EVENT_SHAPE)
    assert np.isfinite(output.samples).all()


@pytest.mark.parametrize(
    "strategy", ["hmc", "uhmc", "ula", "mala", "mh", "imh", "neutra_hmc", "nuts"]
)
def test_sample_wrapper_no_jump(strategy):
    output = sample(
        standard_gaussian_potential,
        event_shape=EVENT_SHAPE,
        strategy=strategy,
        n_chains=N_CHAINS,
        n_iterations=N_ITERATIONS,
        flow_kwargs={"n_layers": 2, "hidden_size": 16},
        show_progress=False,
    )
    assert isinstance(output, MCMCOutput)
    assert output.samples.shape == (N_ITERATIONS, N_CHAINS, *EVENT_SHAPE)
    assert np.isfinite(output.samples).all()


@pytest.mark.parametrize("strategy", ["dlmc", "tess", "ess"])
def test_sample_wrapper_nll(strategy):
    output = sample(
        standard_gaussian_potential,
        event_shape=EVENT_SHAPE,
        strategy=strategy,
        negative_log_likelihood=standard_gaussian_potential,
        n_chains=N_CHAINS,
        n_iterations=N_ITERATIONS,
        flow_kwargs={"n_layers": 2, "hidden_size": 16},
        param_kwargs=(
            {"flow_fit_kwargs": fast_fit_kwargs()} if strategy in ("dlmc", "tess") else None
        ),
        show_progress=False,
    )
    assert output.samples.shape == (N_ITERATIONS, N_CHAINS, *EVENT_SHAPE)
    assert np.isfinite(output.samples).all()


@pytest.mark.parametrize(
    "strategy", ["jump_mala", "jump_ula", "jump_hmc", "jump_uhmc", "jump_mh", "jump_nuts"]
)
def test_sample_wrapper_jump(strategy):
    n_trajectories_per_jump = 7
    output = sample(
        standard_gaussian_potential,
        event_shape=EVENT_SHAPE,
        strategy=strategy,
        n_chains=N_CHAINS,
        n_iterations=N_ITERATIONS,
        inner_param_kwargs={"n_iterations": n_trajectories_per_jump},
        flow_kwargs={"n_layers": 2, "hidden_size": 16},
        show_progress=False,
    )
    assert output.samples.shape == (
        N_ITERATIONS * (n_trajectories_per_jump + 1), N_CHAINS, *EVENT_SHAPE
    )
    assert np.isfinite(output.samples).all()


def test_nuts_front_door_warmup_adapts():
    """Dual-averaging warmup must actually move the NUTS step size
    (VERDICT round 1 item 7: native NUTS exposed via the front door with
    dual-averaging warmup wired)."""
    from nfmc_tpu import create_sampler

    sampler = create_sampler(
        standard_gaussian_potential, event_shape=EVENT_SHAPE, strategy="nuts"
    )
    step_size_before = float(sampler.kernel.step_size)
    x0 = np.random.default_rng(0).normal(size=(N_CHAINS, *EVENT_SHAPE)).astype(np.float32)
    warmup_out = sampler.warmup(x0=x0, show_progress=False)
    assert np.isfinite(warmup_out.samples).all()
    assert float(sampler.kernel.step_size) != step_size_before


def test_sample_wrapper_jump_ess():
    n_trajectories_per_jump = 7
    output = sample(
        standard_gaussian_potential,
        event_shape=EVENT_SHAPE,
        strategy="jump_ess",
        n_chains=N_CHAINS,
        n_iterations=N_ITERATIONS,
        negative_log_likelihood=standard_gaussian_potential,
        inner_param_kwargs={"n_iterations": n_trajectories_per_jump},
        flow_kwargs={"n_layers": 2, "hidden_size": 16},
        show_progress=False,
    )
    assert output.samples.shape == (
        N_ITERATIONS * (n_trajectories_per_jump + 1), N_CHAINS, *EVENT_SHAPE
    )
    assert np.isfinite(output.samples).all()


def test_jump_default_inner_n_iterations():
    """jump_hmc inner default n_iterations=5 (reference ``sample.py:161-162``)."""
    from nfmc_tpu import create_sampler

    s = create_sampler(
        standard_gaussian_potential, event_shape=EVENT_SHAPE, strategy="jump_hmc",
        flow_kwargs={"n_layers": 2, "hidden_size": 16},
    )
    assert s.inner_sampler.params.n_iterations == 5


def test_divergence_detection():
    """Divergence = non-finite proposal OR non-finite proposal potential
    (Stan convention; superset of the reference's except-ValueError path,
    ``langevin.py:111-114``, ``hmc.py:117-120``). A quartic potential with a
    large step explodes; stored samples must stay finite (rejected), the
    counter must fire, and no exception may cross the jitted scan."""
    import jax

    from nfmc_tpu.samplers.mcmc import HMC, MALA, ULA

    class QuarticPot:
        event_shape = (5,)

        def __call__(self, x):
            return (x**4).sum(-1)

    # Far-out start: the drift -tau*4x^3 overshoots to |x'| ~ 4e10 where
    # x'^4 overflows float32 -> non-finite proposal potential.
    x0 = jax.numpy.full((8, 5), 1000.0) + jax.random.normal(jax.random.key(0), (8, 5))
    for cls in (ULA, MALA, HMC):
        sampler = cls(event_shape=(5,), target=QuarticPot())
        sampler.kernel.step_size = 10.0
        sampler.params.n_iterations = 50
        out = sampler.sample(x0, show_progress=False)
        assert np.isfinite(out.samples).all(), cls.__name__
        assert out.statistics.n_divergences > 0, cls.__name__


@pytest.mark.parametrize("force_host", [False, True])
def test_jump_fit_nf_refits_flow(force_host):
    """fit_nf=True: per-outer-iteration flow refits gated by
    n_jumps_before_training (reference ``jump.py:23-26,193-201``).
    Fixed-effort fit kwargs take the fused in-scan refit path; a
    time-limited config forces the host loop — interleaving law, counters,
    and actually-trained flow must hold on both."""
    import jax

    from nfmc_tpu.flows.train import fixed_effort_fit_config
    from nfmc_tpu.samplers.mcmc.langevin import LangevinParameters
    from nfmc_tpu.samplers.nfmc import JumpMALA
    from nfmc_tpu.samplers.nfmc.jump import JumpNFMCParameters

    inner_n, n_iter, n_chains = 2, 4, 8
    params = JumpNFMCParameters(fit_nf=True, n_jumps_before_training=2)
    params.n_iterations = n_iter
    if force_host:
        params.flow_fit_kwargs = dict(n_epochs=2, time_limit_seconds=1e9)
        assert fixed_effort_fit_config(params.flow_fit_kwargs) is None
    else:
        params.flow_fit_kwargs = dict(n_epochs=2)
        assert fixed_effort_fit_config(params.flow_fit_kwargs) is not None
    s = JumpMALA(EVENT_SHAPE, standard_gaussian_potential, params=params,
                 inner_params=LangevinParameters(n_iterations=inner_n))
    before = jax.tree_util.tree_leaves(s.kernel.flow.params)[1]
    x0 = jax.random.normal(jax.random.key(0), (n_chains, *EVENT_SHAPE))
    out = s.sample(x0, show_progress=False, seed=1)

    assert out.samples.shape == (n_iter * (inner_n + 1), n_chains, *EVENT_SHAPE)
    assert np.isfinite(out.samples).all()
    assert out.statistics.n_attempted_jumps == n_iter * n_chains
    # counter contract identical across paths: inner calls + 2B per jump
    inner_calls = s.inner_sampler.calls_per_iter(n_chains)
    assert out.statistics.n_target_calls == n_iter * (
        inner_n * inner_calls + 2 * n_chains
    )
    after = jax.tree_util.tree_leaves(s.kernel.flow.params)[1]
    assert not np.allclose(np.asarray(before), np.asarray(after))  # it trained


def test_dlmc_fused_matches_host_path():
    """The fused fixed-effort DLMC path (refit+drift+accept compiled into one
    scan step) must match the host-loop path in counter contract and
    statistics (VERDICT round 1 item 5)."""
    import jax
    import jax.numpy as jnp

    from nfmc_tpu.flows import Flow, RealNVP
    from nfmc_tpu.samplers.nfmc import DLMC
    from nfmc_tpu.samplers.nfmc.dlmc import DLMCKernel

    d, n_chains, n_iter = 5, 128, 25
    x0 = jax.random.normal(jax.random.key(1), (n_chains, d))

    def build():
        s = DLMC(
            (d,), standard_gaussian_potential,
            negative_log_likelihood=standard_gaussian_potential,
            kernel=DLMCKernel((d,), flow=Flow(RealNVP((d,), n_layers=2, hidden_size=16), seed=0)),
        )
        s.params.flow_fit_kwargs = dict(n_epochs=4, lr=5e-3)
        s.params.n_iterations = n_iter
        return s

    fused = build()
    assert fused._fused_fit_config() is not None
    out_fused = fused.sample(x0, show_progress=False, seed=0)

    host = build()
    host._fused_fit_config = lambda: None  # force the host-loop path
    out_host = host.sample(x0, show_progress=False, seed=0)

    for out in (out_fused, out_host):
        assert out.samples.shape == (n_iter, n_chains, d)
        assert np.isfinite(out.samples).all()
    assert out_fused.statistics.n_target_calls == out_host.statistics.n_target_calls
    assert (out_fused.statistics.n_target_gradient_calls
            == out_host.statistics.n_target_gradient_calls)
    # both paths must report the divergence counter (host path once dropped it)
    assert out_fused.statistics.n_divergences == out_host.statistics.n_divergences
    # different RNG streams -> statistical (not bitwise) agreement
    assert float(np.max(np.abs(out_fused.mean - out_host.mean))) < 0.15
    assert float(np.max(np.abs(out_fused.variance - out_host.variance))) < 0.4


def test_adaptive_imh_fused_matches_host_path():
    """AdaptiveIMH's fused path (device-resident history + in-scan 1-epoch
    refits) must match the host loop in counters and statistics, and must
    actually adapt the flow."""
    import jax

    from nfmc_tpu.samplers.nfmc import AdaptiveIMH, IMHKernel

    d, n_chains, n_iter = 5, 64, 30
    x0 = jax.random.normal(jax.random.key(1), (n_chains, d))

    def build():
        s = AdaptiveIMH(
            event_shape=(d,), target=standard_gaussian_potential,
            kernel=IMHKernel((d,), flow=small_flow((d,))),
        )
        s.params.n_iterations = n_iter
        return s

    fused = build()
    p_before = jax.tree_util.tree_leaves(fused.kernel.flow.params)
    out_fused = fused.sample(x0, show_progress=False, seed=0)
    p_after = jax.tree_util.tree_leaves(fused.kernel.flow.params)
    assert any(
        float(np.max(np.abs(a - b))) > 0 for a, b in zip(p_before, p_after)
    )  # refits engaged

    host = build()
    host.history_element_limit = 0  # force the host loop
    out_host = host.sample(x0, show_progress=False, seed=0)

    for out in (out_fused, out_host):
        assert out.samples.shape == (n_iter, n_chains, d)
        assert np.isfinite(out.samples).all()
    assert (out_fused.statistics.n_target_gradient_calls
            == out_host.statistics.n_target_gradient_calls)
    assert (out_fused.statistics.n_attempted_trajectories
            == out_host.statistics.n_attempted_trajectories)
    # different fit RNG streams -> statistical agreement
    assert float(np.max(np.abs(out_fused.mean - out_host.mean))) < 0.3


def test_jump_flow_swap_rebuilds_fused_runner():
    """Replacing kernel.flow between sample() calls must rebuild the cached
    fused runner (its closures bake the bijection): different-architecture
    swap would otherwise crash or silently use stale densities."""
    import jax

    from nfmc_tpu.samplers.nfmc import JumpMALA

    s = JumpMALA(EVENT_SHAPE, standard_gaussian_potential)
    s.params.n_iterations = 2
    s.inner_sampler.params.n_iterations = 2
    x0 = jax.random.normal(jax.random.key(0), (N_CHAINS, *EVENT_SHAPE))
    out1 = s.sample(x0, show_progress=False, seed=1)
    assert np.isfinite(out1.samples).all()

    s.kernel.flow = small_flow(EVENT_SHAPE, seed=9, n_layers=4)  # new architecture
    out2 = s.sample(x0, show_progress=False, seed=1)
    assert np.isfinite(out2.samples).all()


def test_nuts_backward_subtree_uturn_direction():
    """Round-3 review fix: the within-subtree U-turn check must use
    trajectory-ordered endpoints. With walk-ordered endpoints, every
    backward subtree of >=2 leaves on a non-turning trajectory flagged a
    spurious U-turn, capping trajectories ~3x short (measured 6.5
    leapfrogs/chain/iter on this exact config; direction-ordered gives
    ~18, a half-period being ~31 steps at eps=0.1)."""
    import jax
    import jax.numpy as jnp

    from nfmc_tpu.samplers.mcmc.nuts_impl import make_nuts_step

    def target(x):
        return 0.5 * jnp.sum(x**2, axis=-1)

    step = jax.jit(make_nuts_step(target, (1,), max_tree_depth=8))
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (64, 1))
    total = 0
    n_iter = 60
    for _ in range(n_iter):
        key, k = jax.random.split(key)
        x, _moved, _div, _acc, evals = step(x, jnp.float32(0.1), jnp.ones(1), k)
        total += int(evals) - 64  # minus the per-chain seed evaluation
    mean_leapfrogs = total / (n_iter * 64)
    assert mean_leapfrogs > 12.0, mean_leapfrogs  # broken check gave ~6.5
    assert abs(float(jnp.var(x)) - 1.0) < 0.35


def test_nuts_nan_potential_does_not_poison_accept_stat():
    """A NaN potential at a divergent leaf must count as accept-prob 0 (and
    a divergence), not NaN the accept statistic that dual averaging
    consumes during warmup."""
    import jax
    import jax.numpy as jnp

    from nfmc_tpu.samplers.mcmc.nuts_impl import make_nuts_step

    def nan_outside(x):
        # NaN potential whenever any coordinate leaves (-1.5, 1.5)
        u = 0.5 * jnp.sum(x**2, axis=-1)
        bad = jnp.any(jnp.abs(x) > 1.5, axis=-1)
        return jnp.where(bad, jnp.nan, u)

    step = jax.jit(make_nuts_step(nan_outside, (2,), max_tree_depth=6))
    key = jax.random.key(0)
    x = 0.1 * jax.random.normal(jax.random.key(1), (32, 2))
    saw_divergence = False
    for _ in range(30):
        key, k = jax.random.split(key)
        x, _moved, div, acc, _evals = step(x, jnp.float32(0.5), jnp.ones(2), k)
        saw_divergence = saw_divergence or bool(div)
        assert bool(jnp.all(jnp.isfinite(acc))), acc
    assert saw_divergence  # the large step must actually hit the NaN region
    assert bool(jnp.all(jnp.isfinite(x)))


def test_tess_nonidentity_cov_recovers_target():
    """Round-3 review fix: with TESSKernel.cov != I the auxiliary density in
    the slice threshold/acceptance must be N(0, cov) — the law v is drawn
    from — not the flow base N(0, I). With a frozen identity-init flow the
    latent chain then targets the pullback = the target itself; wrong
    density biases the variance."""
    import jax
    import jax.numpy as jnp

    from nfmc_tpu.samplers.nfmc.tess import TESS, TESSKernel

    d = 3
    cov = np.diag(np.array([4.0, 0.25, 1.0], dtype=np.float32))

    def gaussian(x):
        return 0.5 * jnp.sum(x**2, axis=-1)

    sampler = TESS((d,), target=gaussian, negative_log_likelihood=gaussian,
                   kernel=TESSKernel((d,), cov=cov))
    sampler.params.n_iterations = 600
    sampler.params.store_samples = True
    x0 = jax.random.normal(jax.random.key(0), (64, d))
    out = sampler.sample(x0, show_progress=False, seed=1)
    draws = np.asarray(out.samples)[200:]
    var = draws.reshape(-1, d).var(axis=0)
    assert np.all(np.abs(var - 1.0) < 0.25), var


def test_front_door_kernel_kwargs_reach_nfmc_kernels():
    """Round-3 review fix (documented deviation): the reference silently
    drops kernel_kwargs for every NFMC strategy; here they plumb through so
    DLMC's step_size and TESS's cov are front-door reachable."""
    from nfmc_tpu import create_sampler

    d = create_sampler(target=standard_gaussian_potential, event_shape=EVENT_SHAPE,
                       strategy="dlmc",
                       negative_log_likelihood=standard_gaussian_potential,
                       kernel_kwargs={"step_size": 0.01})
    assert float(d.kernel.step_size) == 0.01

    cov = np.eye(int(np.prod(EVENT_SHAPE))).astype(np.float32)
    t = create_sampler(target=standard_gaussian_potential, event_shape=EVENT_SHAPE,
                       strategy="tess",
                       negative_log_likelihood=standard_gaussian_potential,
                       kernel_kwargs={"cov": cov})
    assert t.kernel.cov is cov


def test_imh_warmup_fit_kwargs_may_carry_show_progress():
    """Round-3 review fix: a user-supplied show_progress (the same shape as
    NFMCParameters' default flow_fit_kwargs) must merge, not raise
    TypeError for a duplicate keyword."""
    from nfmc_tpu.samplers.nfmc import FixedIMH

    s = FixedIMH(EVENT_SHAPE, standard_gaussian_potential)
    s.params.warmup_fit_kwargs = {"n_epochs": 3, "show_progress": False}
    out = s.warmup(_x0(), show_progress=False, seed=0)
    assert np.isfinite(np.asarray(out.running_samples.last_sample)).all()


def test_neutra_transport_x0_roundtrips_warmup_draws():
    """Round-3 review fix: the front door reshuffles NeuTra's LATENT warmup
    draws into x0; with transport_x0=True the sampler forward-maps x0 as
    data-space, so the front door must convert first — the chains then start
    at (a round-trip of) the warmup points instead of f(z)."""
    from nfmc_tpu import sample as front_sample
    from nfmc_tpu.potentials import DiagonalGaussian

    d = int(np.prod(EVENT_SHAPE))
    target = DiagonalGaussian(mu=np.zeros(d), sigma=np.ones(d))
    out = front_sample(
        target, strategy="neutra_mh", n_chains=16,
        n_iterations=20, warmup=True, n_warmup_iterations=10,
        show_progress=False, seed=0,
        param_kwargs={"transport_x0": True},
        flow_kwargs={"n_layers": 2, "hidden_size": 8},
    )
    assert np.isfinite(np.asarray(out.samples)).all()

