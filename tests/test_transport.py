"""Transport layer (AFT / CRAFT / SNF / NS / FAB / AIS) — working versions of
the algorithms the reference ships broken (SURVEY.md section 2.7).

Tiny configs: these check the machinery runs and moves particles the right
way; statistical accuracy is covered by the slow drive scripts."""
import jax
import numpy as np
import pytest

from nfmc_tpu.potentials import DiagonalGaussian, StandardGaussian

PRIOR = StandardGaussian((3,))
TARGET = DiagonalGaussian(mu=np.full(3, 2.0), sigma=np.full(3, 0.5))
TRUE_LOG_Z = 3 * np.log(0.5)
FLOW = 'realnvp%{"n_layers": 2, "hidden_size": 16}'


def test_ais_log_z():
    from nfmc_tpu.transport.ais import ais_base

    x0 = np.asarray(PRIOR.sample((256,), key=jax.random.key(0)))
    x, log_w = ais_base(x0, PRIOR, TARGET, n_steps=24, n_mcmc_steps=3, step_size=0.05, seed=0)
    est = float(jax.scipy.special.logsumexp(log_w) - np.log(256))
    assert np.isfinite(np.asarray(x)).all()
    assert abs(est - TRUE_LOG_Z) < 1.5
    assert np.abs(np.asarray(x).mean(0) - 2.0).max() < 1.0


def test_snf_mala_layer_delta_s_detailed_balance():
    """Regression (beta factor): delta_s must equal the exact log ratio of
    reverse/forward transition densities for any temperature beta."""
    import jax.numpy as jnp

    from nfmc_tpu.transport.snf import MALALayer

    eps_beta_cases = [(0.1, 1.0), (0.1, 2.5), (0.05, 0.5)]
    for time_step, beta in eps_beta_cases:
        layer = MALALayer((3,), time_step=time_step, beta=beta)
        pot = lambda v: 0.5 * jnp.sum((v - 1.0) ** 2, axis=-1)
        x = jax.random.normal(jax.random.key(0), (64, 3))
        x_prime, delta_s = layer.apply((), x, pot, jax.random.key(1))
        eps = layer.eps
        g = jax.vmap(jax.grad(lambda v: pot(v[None])[0]))
        # log q(x | x') - log q(x' | x) under N(. ; y - eps*g(y), 2 eps/beta I)
        fwd = -beta / (4 * eps) * jnp.sum((x_prime - x + eps * g(x)) ** 2, axis=-1)
        rev = -beta / (4 * eps) * jnp.sum((x - x_prime + eps * g(x_prime)) ** 2, axis=-1)
        assert np.allclose(np.asarray(delta_s), np.asarray(rev - fwd), atol=1e-4), beta


def test_systematic_resample_low_variance():
    """Counts of systematic resampling match n*w within 1 (the defining
    low-variance property; multinomial would fluctuate by O(sqrt(n*w)))."""
    import jax.numpy as jnp

    from nfmc_tpu.transport.common import systematic_resample

    w = np.array([0.5, 0.25, 0.125, 0.0625, 0.0625])
    idx = np.asarray(systematic_resample(jax.random.key(3), jnp.log(w), 400))
    counts = np.bincount(idx, minlength=5)
    assert np.abs(counts - 400 * w).max() <= 1.0, counts


def test_aft():
    from nfmc_tpu.transport import aft

    out = aft(PRIOR, TARGET, FLOW, n_particles=64, n_iterations=5, seed=0, n_train_epochs=5)
    assert np.isfinite(out["particles"]).all()
    assert out["history"].shape[0] == 5
    assert np.abs(out["particles"].mean(0) - 2.0).max() < 1.0
    assert np.isfinite(out["log_Z"])


def test_aft_identity_fallback_rejects_bad_transport():
    """Per-level safeguard: a transport whose val-group incremental-weight
    ESS is worse than no transport must be rejected (identity used instead);
    the warm-start params must be accepted when they tie."""
    import jax.numpy as jnp

    from nfmc_tpu.api.registry import create_flow_object
    from nfmc_tpu.transport.aft import AnnealedFlowTransport

    flow = create_flow_object(FLOW, (3,))
    alg = AnnealedFlowTransport(PRIOR, TARGET, flow, n_steps=4)
    x_val = jax.random.normal(jax.random.key(0), (128, 3))
    lw = jnp.full((128,), -np.log(128.0))

    # identity-initialized RealNVP: flow ESS == identity ESS -> accepted (>=)
    assert bool(alg._select_transport(flow.params, x_val, lw, 0.0, 0.5)[0])

    # catastrophic params (huge shifts): val ESS collapses -> rejected
    bad = jax.tree_util.tree_map(lambda p: p + 40.0, flow.params)
    assert not bool(alg._select_transport(bad, x_val, lw, 0.0, 0.5)[0])

    # and the full run with a sabotaged flow stays finite & sane because
    # every level degrades to plain tempered SMC
    flow.params = bad
    alg2 = AnnealedFlowTransport(PRIOR, TARGET, flow, n_steps=6,
                                 n_train_epochs=0)
    out = alg2.run(lambda b, key=None: PRIOR.sample(b, key=key),
                   n_particles=256, seed=0)
    assert np.isfinite(out["log_Z"])
    assert abs(out["log_Z"] - TRUE_LOG_Z) < 3.0


def test_aft_select_prefers_flow_when_identity_ess_is_nan():
    """A non-finite identity ESS (hard-support target: every val particle at
    U=+inf makes log_G_id all -inf, log_ess NaN) must not veto a finite
    fitted transport — identity would be the catastrophic choice there."""
    import jax.numpy as jnp

    from nfmc_tpu.flows import Bijection, Flow
    from nfmc_tpu.transport.aft import AnnealedFlowTransport

    class _Contract(Bijection):
        # forward = data -> latent here plays the transport role T(x) = x/50
        def init(self, key):
            return ()

        def forward_fn(self, params, x):
            return x / 50.0, jnp.full(x.shape[:-1], -3 * np.log(50.0))

        def inverse_fn(self, params, z):
            return z * 50.0, jnp.full(z.shape[:-1], 3 * np.log(50.0))

    def hard_target(x):
        r2 = jnp.sum(x ** 2, axis=-1)
        return jnp.where(r2 > 0.25, jnp.inf, 0.5 * r2)

    flow = Flow(_Contract((3,)), seed=0)
    alg = AnnealedFlowTransport(PRIOR, hard_target, flow, n_steps=4)
    x_val = 2.0 + jax.random.normal(jax.random.key(0), (64, 3))  # all outside
    lw = jnp.full((64,), -np.log(64.0))
    use_flow, x_t, lw_new = alg._select_transport(flow.params, x_val, lw, 0.0, 0.5)
    assert bool(use_flow)  # the contraction rescues the particles
    assert np.isfinite(np.asarray(x_t)).all()
    assert np.isfinite(np.asarray(lw_new)).all()


def test_fab_survives_divergent_ais_round():
    """A divergent AIS sweep (absurd step size on a quartic target) writes
    non-finite weights; sanitized buffer rows + the train step's finite
    guard must keep the fused scan's params finite (the host loop this
    replaced crashed loudly in np.random.choice; silent NaN corruption is
    the failure mode this pins)."""
    import jax.numpy as jnp

    from nfmc_tpu.api.registry import create_flow_object
    from nfmc_tpu.flow_training.fab import FAB

    quartic = lambda x: jnp.sum(x ** 4, axis=-1)
    f = create_flow_object(FLOW, (3,), seed=0)
    init_leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(f.params)]
    alg = FAB(quartic, f, ais_step_size=1e6)
    flow = alg.run(n_iterations=6, n_flow_training_steps=5,
                   n_ais_particles=64, seed=0)
    leaves = jax.tree_util.tree_leaves(flow.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    s = np.asarray(flow.sample(128, seed=3))
    assert np.isfinite(s).all()
    # with EVERY buffer row divergence-sanitized to weight -inf there is no
    # valid replay row: the training steps must be vetoed outright, not run
    # on the zeroed placeholder rows (jax.random.categorical over all--inf
    # logits silently returns index 0, which would drag the flow toward a
    # point mass at the origin)
    if all(not np.isfinite(w) for w in np.asarray(alg._buf_state[1])):
        assert all(np.array_equal(a, np.asarray(b))
                   for a, b in zip(init_leaves, leaves)), \
            "params changed despite no valid replay row"


def test_fab_zero_iterations_noop():
    from nfmc_tpu.api.registry import create_flow_object
    from nfmc_tpu.flow_training.fab import FAB

    f = create_flow_object(FLOW, (3,), seed=0)
    alg = FAB(TARGET, f)
    flow = alg.run(n_iterations=0)
    assert flow is f
    assert alg.loss_trace.shape == (0,)


def test_craft():
    from nfmc_tpu.transport import craft

    out = craft(PRIOR, TARGET, FLOW, n_particles=64, n_iterations=5,
                n_annealing_steps=4, seed=0)
    assert np.isfinite(out["particles"]).all()
    assert out["history"].shape[0] == 5
    assert np.abs(out["particles"].mean(0) - 2.0).max() < 1.0


def test_snf():
    from nfmc_tpu.transport import snf

    out = snf(PRIOR, TARGET, n_particles=64, n_epochs=2, seed=0)
    assert np.isfinite(out["particles"]).all()
    assert np.abs(out["particles"].mean(0) - 2.0).max() < 1.0
    assert out["history"].shape[0] == 6  # 5 layers + initial


def test_ns():
    from nfmc_tpu.transport import ns

    out = ns(PRIOR, TARGET, FLOW, n_particles=25, n_iterations=60, seed=0)
    assert np.isfinite(out["log_Z"])
    assert out["dead_points"].shape[0] > 0
    # live points should have climbed the likelihood
    assert out["live_log_likelihoods"].min() > out["dead_log_likelihoods"][0]


def test_ns_log_z_accuracy():
    """NS evidence convention is Z = E_{normalized prior}[L]: per dim
    int N(x;0,1) exp(-(x-2)^2/(2 * 0.25)) dx = 0.5/sqrt(1.25) * exp(-1.6)."""
    from nfmc_tpu.transport import ns

    true_log_z = 3 * (np.log(0.5) - 0.5 * np.log(1.25) - 1.6)  # = -7.214
    out = ns(PRIOR, TARGET, FLOW, n_particles=64, n_iterations=400, seed=1)
    assert abs(out["log_Z"] - true_log_z) < 1.0, (out["log_Z"], true_log_z)


def test_pmc():
    from nfmc_tpu.transport import pmc

    out = pmc(PRIOR, TARGET, FLOW, n_particles=256, seed=0,
              n_train_epochs=10, n_mcmc_steps=5)
    assert np.isfinite(out["particles"]).all()
    assert out["beta_trace"][-1] == 1.0
    assert abs(out["log_Z"] - TRUE_LOG_Z) < 1.0
    assert np.abs(out["particles"].mean(0) - 2.0).max() < 0.5
    # adaptive ladder actually adapted: strictly increasing, >2 levels
    assert (np.diff(out["beta_trace"]) > 0).all()
    assert len(out["beta_trace"]) > 2


def test_pmc_pcn_log_z_accuracy():
    """Regression for the pCN latent sweep: the isotropic-RW sweep it
    replaced under-mixed between levels and biased log Z by -0.3 to -0.5
    nats on a 16-d version of this target (measured, 2048 particles); pCN
    holds the error well inside +-0.4 at a quarter of the particles."""
    from nfmc_tpu.transport import pmc

    d = 16
    prior = StandardGaussian((d,))
    target = DiagonalGaussian(mu=np.full(d, 2.0), sigma=np.full(d, 0.5))
    true_log_z = d * np.log(0.5)
    flow = 'realnvp%{"n_layers": 2, "hidden_size": 32}'
    out = pmc(prior, target, flow, n_particles=512, seed=0,
              n_train_epochs=20, n_mcmc_steps=10)
    assert out["beta_trace"][-1] == 1.0
    assert abs(out["log_Z"] - true_log_z) < 0.4, out["log_Z"]
    # pCN acceptance adapts to its 0.65 target (RW-optimal was 0.234)
    assert 0.5 < out["acceptance_trace"].mean() < 0.9


def test_fab():
    from nfmc_tpu.flow_training import fab

    flow = fab(TARGET, FLOW, n_iterations=8, n_flow_training_steps=10,
               n_ais_particles=64, seed=0)
    s = np.asarray(flow.sample(256, seed=5))
    assert np.isfinite(s).all()
    # bootstrap is slow at tiny budgets: assert clear movement toward mu=2
    assert s.mean() > 0.3


def test_checkpoint_roundtrip(tmp_path):
    from nfmc_tpu.checkpoint import (
        load_checkpoint,
        restore_sampler_state,
        sampler_state,
        save_checkpoint,
    )
    from nfmc_tpu.samplers.mcmc import MALA

    from tests.util import standard_gaussian_potential

    sampler = MALA(event_shape=(3,), target=standard_gaussian_potential)
    sampler.params.n_warmup_iterations = 10
    x0 = jax.random.normal(jax.random.key(0), (4, 3))
    sampler.warmup(x0, show_progress=False)

    state = sampler_state(sampler, x0, jax.random.key(5))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, metadata={"iteration": 10})
    tuned_step = sampler.kernel.step_size

    sampler2 = MALA(event_shape=(3,), target=standard_gaussian_potential)
    restored, meta = load_checkpoint(path, sampler_state(sampler2, x0, jax.random.key(0)))
    x, key = restore_sampler_state(sampler2, restored)
    assert meta == {"iteration": 10}
    assert np.allclose(np.asarray(x), np.asarray(x0))
    assert abs(sampler2.kernel.step_size - tuned_step) < 1e-6
    # resumed sampling must run
    out = sampler2.sample(x, show_progress=False, key=key)
    assert np.isfinite(out.samples).all()


def test_checkpoint_nested_sampler_keeps_tuned_inner(tmp_path):
    """Regression: NeuTra/Jump keep their tuned Metropolis state on
    sampler.inner_sampler.kernel — checkpoints must carry it."""
    from nfmc_tpu.checkpoint import (
        load_checkpoint,
        restore_sampler_state,
        sampler_state,
        save_checkpoint,
    )
    from nfmc_tpu.samplers.nfmc import JumpMALA

    from tests.util import standard_gaussian_potential

    s = JumpMALA(event_shape=(3,), target=standard_gaussian_potential)
    s.inner_sampler.params.n_iterations = 2
    x0 = jax.random.normal(jax.random.key(0), (4, 3))
    s.inner_sampler.params.n_warmup_iterations = 10
    s.inner_sampler.warmup(x0, show_progress=False)
    tuned_step = s.inner_sampler.kernel.step_size

    state = sampler_state(s, x0, jax.random.key(5))
    path = str(tmp_path / "ckpt_nested")
    save_checkpoint(path, state)

    s2 = JumpMALA(event_shape=(3,), target=standard_gaussian_potential)
    s2.inner_sampler.params.n_iterations = 2
    restored, _ = load_checkpoint(path, sampler_state(s2, x0, jax.random.key(0)))
    x, key = restore_sampler_state(s2, restored)
    assert abs(s2.inner_sampler.kernel.step_size - tuned_step) < 1e-6
    assert np.allclose(
        np.asarray(jax.tree_util.tree_leaves(s2.kernel.flow.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(s.kernel.flow.params)[0]),
    )


def test_checkpoint_orbax_roundtrip(tmp_path):
    from nfmc_tpu.checkpoint import (
        load_checkpoint_orbax,
        restore_sampler_state,
        sampler_state,
        save_checkpoint_orbax,
    )
    from nfmc_tpu.samplers.mcmc import MALA

    from tests.util import standard_gaussian_potential

    sampler = MALA(event_shape=(3,), target=standard_gaussian_potential)
    sampler.params.n_warmup_iterations = 5
    x0 = jax.random.normal(jax.random.key(0), (4, 3))
    sampler.warmup(x0, show_progress=False)

    state = sampler_state(sampler, x0, jax.random.key(5))
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, state, metadata={"iteration": 5})
    tuned_step = sampler.kernel.step_size

    sampler2 = MALA(event_shape=(3,), target=standard_gaussian_potential)
    restored, meta = load_checkpoint_orbax(path, sampler_state(sampler2, x0, jax.random.key(0)))
    x, key = restore_sampler_state(sampler2, restored)
    assert meta == {"iteration": 5}
    assert np.allclose(np.asarray(x), np.asarray(x0))
    assert abs(sampler2.kernel.step_size - tuned_step) < 1e-6
    out = sampler2.sample(x, show_progress=False, key=key)
    assert np.isfinite(out.samples).all()
