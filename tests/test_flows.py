"""Flow-subsystem unit tests the reference lacks (SURVEY.md section 4):
inverse(forward) identity, analytic log-det vs autodiff Jacobian, training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfmc_tpu.flows import (
    IAF,
    MAF,
    NICE,
    CouplingLRS,
    CouplingRQNSF,
    Flow,
    RealNVP,
)

ARCHS = {
    "realnvp": lambda: RealNVP((4,), n_layers=2, hidden_size=16),
    "nice": lambda: NICE((4,), n_layers=2, hidden_size=16),
    "maf": lambda: MAF((4,), n_layers=2, hidden_size=16),
    "iaf": lambda: IAF((4,), n_layers=2, hidden_size=16),
    "c-rqnsf": lambda: CouplingRQNSF((4,), n_layers=2, hidden_size=16, n_bins=4),
    "c-lrsnsf": lambda: CouplingLRS((4,), n_layers=2, hidden_size=16, n_bins=4),
}


def _perturbed_flow(arch):
    f = Flow(ARCHS[arch](), seed=3)
    f.params = jax.tree_util.tree_map(
        lambda p: p + 0.2 * jax.random.normal(jax.random.key(5), p.shape), f.params
    )
    return f


@pytest.mark.parametrize("arch", list(ARCHS))
def test_inverse_forward_identity(arch):
    f = _perturbed_flow(arch)
    x = jax.random.normal(jax.random.key(2), (5, 4))
    z, ld_f = f.bijection.forward(x)
    x2, ld_i = f.bijection.inverse(z)
    tol = 1e-3 if "ma" in arch or arch == "iaf" else 1e-4
    assert float(jnp.max(jnp.abs(x2 - x))) < tol
    assert float(jnp.max(jnp.abs(ld_f + ld_i))) < 1e-2


@pytest.mark.parametrize("arch", ["realnvp", "nice", "maf", "c-rqnsf", "c-lrsnsf"])
def test_log_det_vs_autodiff(arch):
    f = _perturbed_flow(arch)
    x = jax.random.normal(jax.random.key(2), (3, 4))
    _, ld = f.bijection.forward(x)
    J = jax.vmap(jax.jacfwd(lambda v: f.bijection.forward_fn(f.params, v[None])[0][0]))(x)
    ld_auto = jnp.linalg.slogdet(J)[1]
    assert float(jnp.max(jnp.abs(ld_auto - ld))) < 5e-2


def test_log_prob_normalized_realnvp():
    """Identity-initialized flow log_prob == standard normal log density."""
    f = Flow(RealNVP((4,), n_layers=2, hidden_size=16), seed=0)
    x = jax.random.normal(jax.random.key(1), (10, 4))
    lp = f.log_prob(x)
    expected = -0.5 * jnp.sum(x**2, axis=-1) - 2 * jnp.log(2 * jnp.pi)
    assert float(jnp.max(jnp.abs(lp - expected))) < 1e-5


def test_sample_log_prob_consistency():
    f = _perturbed_flow("realnvp")
    s, slp = f.sample(64, return_log_prob=True, seed=4)
    lp = f.log_prob(s)
    assert float(jnp.max(jnp.abs(lp - slp))) < 1e-3


def test_fit_improves_likelihood():
    rng = np.random.default_rng(0)
    data = (rng.normal(size=(512, 4)) * np.array([0.5, 1, 2, 3]) + 2).astype(np.float32)
    f = Flow(RealNVP((4,), n_layers=3, hidden_size=32), seed=1)
    lp_before = float(f.log_prob(jnp.asarray(data)).mean())
    f.fit(data, n_epochs=40, lr=0.02)
    lp_after = float(f.log_prob(jnp.asarray(data)).mean())
    assert lp_after > lp_before + 1.0


def test_variational_fit_moves_toward_target():
    def neg_u(x):
        return -0.5 * jnp.sum(((x - 3.0) / 0.7) ** 2, axis=-1)

    f = Flow(RealNVP((3,), n_layers=3, hidden_size=32), seed=2)
    f.variational_fit(neg_u, n_samples=64, n_epochs=200, lr=0.02)
    s = np.asarray(f.sample(1024, seed=5))
    assert np.all(np.abs(s.mean(axis=0) - 3.0) < 0.5)
    assert np.all(np.abs(s.std(axis=0) - 0.7) < 0.4)


def test_variational_fit_survives_nan_epochs():
    """Regression: a non-finite epoch must not poison the OPTIMIZER state.
    Before the fix, NaN grads were fed to opt.update (only params were
    rolled back), so Adam's moments went NaN and the next, otherwise-finite
    epoch produced all-NaN params — every epoch after the first divergence
    was silently dead."""
    def neg_u(x):
        # NaN (not -inf) outside ||x|| < 3.2: the classic inf - inf
        # potential. The target N(1, 0.3^2 I) lives WELL inside the finite
        # region (||mean|| = 1.73), but identity-init base draws ~ N(0, I)
        # straddle the boundary, so early epochs hit NaN losses often.
        r2 = jnp.sum(((x - 1.0) / 0.3) ** 2, axis=-1)
        bad = jnp.sqrt(3.2 ** 2 - jnp.sum(x ** 2, axis=-1))
        return -0.5 * r2 + 0.0 * bad

    f = Flow(RealNVP((3,), n_layers=3, hidden_size=32), seed=2)
    f.variational_fit(neg_u, n_samples=32, n_epochs=300, lr=0.02,
                      keep_best_weights=False)
    leaves = jax.tree_util.tree_leaves(f.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    s = np.asarray(f.sample(1024, seed=5))
    assert np.isfinite(s).all()
    # training kept making progress between/after divergent epochs
    assert np.all(np.abs(s.mean(axis=0) - 1.0) < 0.5)


def test_divergent_fit_raises_value_error():
    f = Flow(RealNVP((3,), n_layers=2, hidden_size=16), seed=0)
    with pytest.raises(ValueError):
        f.fit(np.full((64, 3), 1e30, dtype=np.float32), n_epochs=5, check_for_divergences=True)


def test_spline_lookup_strategies_bit_exact():
    """The gather (searchsorted + take_along_axis) and select-accumulate
    (one-hot masked sums) bin lookups must agree bit-exactly — values AND
    gradients — for both spline transforms. The select path is the TPU
    default (the strided gather lowers pathologically there: measured 21 ms
    vs 2 ms for a 4-layer ma-rqnsf forward at (1024, 100))."""
    import jax
    import jax.numpy as jnp

    import nfmc_tpu.flows.spline as spl

    raw_r = 0.3 * jax.random.normal(jax.random.key(0), (256, 3 * 8 - 1))
    raw_l = 0.3 * jax.random.normal(jax.random.key(3), (256, 4 * 8 - 1))
    x = 6.0 * jax.random.normal(jax.random.key(1), (256,))  # interior + tails

    def run(fn, raw, inverse):
        y, ld = fn(x, raw, inverse)
        g = jax.grad(lambda r: jnp.sum(fn(x, r, inverse)[0]) + jnp.sum(fn(x, r, inverse)[1]))(raw)
        return y, ld, g

    try:
        for fn, raw in ((spl.rational_quadratic_spline, raw_r),
                        (spl.linear_rational_spline, raw_l)):
            for inverse in (False, True):
                spl._FORCE_LOOKUP = "gather"
                yg, ldg, gg = run(fn, raw, inverse)
                spl._FORCE_LOOKUP = "select"
                ys, lds, gs = run(fn, raw, inverse)
                assert float(jnp.max(jnp.abs(yg - ys))) == 0.0
                assert float(jnp.max(jnp.abs(ldg - lds))) == 0.0
                assert float(jnp.max(jnp.abs(gg - gs))) < 1e-5
    finally:
        spl._FORCE_LOOKUP = None


def test_chain_and_inverse_forward_child_regularization():
    """Round-3 review fix: Chain/Inverse must surface wrapped bijections'
    training regularizers (RNODE's kinetic term otherwise silently vanishes
    under composition)."""
    import jax
    import jax.numpy as jnp

    from nfmc_tpu.flows import RealNVP
    from nfmc_tpu.flows.base import Chain, Inverse

    class Regularized(RealNVP):
        regularization_weight = 0.5

        def regularization(self, params, x):
            return jnp.full(x.shape[:-1], 2.0)

    inner = Regularized((4,), n_layers=2, hidden_size=8)
    chain = Chain([RealNVP((4,), n_layers=2, hidden_size=8), Regularized((4,), n_layers=2, hidden_size=8)])
    inv = Inverse(Regularized((4,), n_layers=2, hidden_size=8))

    kp = jax.random.key(0)
    chain.params = chain.init(kp)
    inv.params = inv.init(kp)
    x = jax.random.normal(jax.random.key(1), (6, 4))

    assert float(getattr(chain, "regularization_weight")) == 1.0
    # chain applies the CHILD's weight inside regularization()
    r = np.asarray(chain.regularization(chain.params, x))
    assert r.shape == (6,)
    assert np.allclose(r, 0.5 * 2.0)

    assert float(getattr(inv, "regularization_weight")) == 0.5
    r2 = np.asarray(inv.regularization(inv.params, x))
    assert np.allclose(r2, 2.0)

    # plain chains stay regularization-free (weight gate 0 compiles it away)
    plain = Chain([RealNVP((4,), n_layers=2, hidden_size=8)])
    assert float(getattr(plain, "regularization_weight")) == 0.0


def test_fit_cache_misses_on_bijection_swap():
    """Round-3 review fix: the compiled-trainer cache must key on the
    bijection identity — swapping a same-shaped but differently configured
    bijection onto the flow previously reused a trainer traced against the
    old one."""
    import jax

    from nfmc_tpu.flows import Flow, RealNVP

    f = Flow(RealNVP((3,), n_layers=2, hidden_size=8, clamp=3.0), seed=0)
    x = np.asarray(jax.random.normal(jax.random.key(0), (64, 3)))
    f.fit(x, n_epochs=2, show_progress=False)
    assert len(f._fit_runner_cache) == 1

    f.bijection = RealNVP((3,), n_layers=2, hidden_size=8, clamp=10.0)
    f.bijection.params = f.bijection.init(jax.random.key(1))
    f.fit(x, n_epochs=2, show_progress=False)
    assert len(f._fit_runner_cache) == 2  # distinct trainer for the new bijection


# ---------------------------------------------------------------------------
# round-3 flows review regressions
# ---------------------------------------------------------------------------

def test_residual_flows_have_finite_grads_at_init_and_train():
    """jnp.linalg.norm's vjp at the zero vector is NaN and the contractive
    residual blocks zero-init w2 — before the grad-safe norms every fit()
    rejected every update and the flows silently never trained."""
    from nfmc_tpu.flows import Flow
    from nfmc_tpu.flows.residual import InvertibleResNet

    flow = Flow(InvertibleResNet((4,), n_layers=2, hidden_size=16), seed=0)
    x = jax.random.normal(jax.random.key(1), (64, 4)) * 1.5 + 0.5
    g = jax.grad(lambda p: -jnp.mean(flow.log_prob_fn(p, x)))(flow.params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g))
    p0 = jax.tree_util.tree_map(np.asarray, flow.params)
    flow.fit(x, n_epochs=5, show_progress=False)
    moved = max(
        float(np.max(np.abs(np.asarray(a) - b)))
        for a, b in zip(jax.tree_util.tree_leaves(flow.params),
                        jax.tree_util.tree_leaves(p0))
    )
    assert moved > 0.0


def test_conv_residual_finite_grads_at_init():
    from nfmc_tpu.flows import Flow
    from nfmc_tpu.flows.multiscale import ConvolutionalInvertibleResNet

    flow = Flow(ConvolutionalInvertibleResNet((4, 4), n_layers=1), seed=0)
    x = jax.random.normal(jax.random.key(2), (8, 4, 4))
    g = jax.grad(lambda p: -jnp.mean(flow.log_prob_fn(p, x)))(flow.params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g))


def test_naf_inverse_expands_bracket_for_far_preimages():
    """Small learned slopes (a = exp(-6), the clamp floor) put true preimages
    far outside the fixed +-60 seed bracket; the inverse used to silently
    return the bracket edge (wrong samples, inconsistent log-probs)."""
    from nfmc_tpu.flows.naf import DeepSigmoidTransform

    t = DeepSigmoidTransform(8)
    K = 8
    raw = jnp.concatenate(
        [jnp.full((3, K), -6.0), jnp.zeros((3, K)), jnp.zeros((3, K))], axis=-1
    )
    x_true = jnp.array([200.0, 1500.0, -900.0])
    y, _ = t.forward(x_true, raw)
    x_rec, _ = t.inverse(y, raw)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x_true), atol=1e-2)
    # implicit-function gradients stay finite through the expansion
    g = jax.grad(lambda r: jnp.sum(t.inverse(y, r)[0]))(raw)
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("cls_name", ["PlanarFlow", "RadialFlow", "SylvesterFlow",
                                      "InvertibleResNet", "FFJORD"])
def test_multi_dim_batch_shapes(cls_name):
    """Bijection contract: forward/inverse accept ANY batch shape with
    log_det shaped like the batch — these families used to assume one axis."""
    import nfmc_tpu.flows.continuous as cont
    import nfmc_tpu.flows.residual as res

    cls = getattr(res, cls_name, None) or getattr(cont, cls_name)
    kwargs = {"n_layers": 2} if cls_name != "FFJORD" else {"n_steps": 4}
    b = cls((5,), **kwargs)
    p = b.init(jax.random.key(4))
    xb = jax.random.normal(jax.random.key(5), (2, 3, 5))
    z, ld = b.forward_fn(p, xb)
    assert z.shape == (2, 3, 5) and ld.shape == (2, 3)
    z1, ld1 = b.forward_fn(p, xb.reshape(6, 5))
    np.testing.assert_allclose(np.asarray(z).reshape(6, 5), np.asarray(z1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld).reshape(6), np.asarray(ld1),
                               rtol=1e-5, atol=1e-5)
    xr, ldr = b.inverse_fn(p, z)
    assert xr.shape == (2, 3, 5) and ldr.shape == (2, 3)


def test_variational_fit_reuses_compiled_trainer():
    """Repeated reverse-KL fits on one flow (NeuTra/TESS warmup pattern) must
    hit the memoized trainer, not re-trace per call."""
    from nfmc_tpu.flows import Flow, RealNVP
    from nfmc_tpu.flows.train import variational_fit

    flow = Flow(RealNVP((4,), n_layers=2, hidden_size=8), seed=0)
    tlp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    variational_fit(flow, tlp, n_samples=16, n_epochs=4, show_progress=False, seed=1)
    first = list(flow._vfit_runner_cache.values())[0][0]
    variational_fit(flow, tlp, n_samples=16, n_epochs=4, show_progress=False, seed=2)
    assert len(flow._vfit_runner_cache) == 1
    assert list(flow._vfit_runner_cache.values())[0][0] is first


def test_base_log_prob_override_sampling_guard():
    """With base_log_prob overridden but no paired base sampler, sampling
    must raise (drawing N(0,I) while reporting the override's density would
    silently bias accept ratios); with a paired sampler it must draw from it
    and report the override's density (round-3 review fix)."""
    import jax
    import jax.numpy as jnp
    from nfmc_tpu.flows import RealNVP
    from nfmc_tpu.flows.base import Flow

    flow = Flow(RealNVP((2,), n_layers=2), seed=0)
    # log-prob-only override (AFT-style training use) keeps log_prob usable
    flow.set_base_log_prob(lambda z: jnp.zeros(z.shape[:-1]))
    assert flow.log_prob(jnp.ones((3, 2))).shape == (3,)
    with pytest.raises(ValueError, match="paired base sampler"):
        flow.sample(4, key=jax.random.key(0))

    # paired sampler: draws come from it, log q uses the override's density
    scale = 2.0
    flow.set_base_log_prob(
        lambda z: -0.5 * jnp.sum((z / scale) ** 2, axis=-1)
        - z.shape[-1] * (0.5 * jnp.log(2 * jnp.pi) + jnp.log(scale)),
        sample_fn=lambda key, n: scale * jax.random.normal(key, (n, 2)),
    )
    x, lq = flow.sample(512, key=jax.random.key(1), return_log_prob=True)
    assert x.shape == (512, 2) and jnp.all(jnp.isfinite(lq))
    # clearing restores N(0, I) sampling
    flow.set_base_log_prob(None)
    assert flow.sample(4, key=jax.random.key(2)).shape == (4, 2)


def test_spline_flows_identity_at_zero_init():
    """Zero conditioner output must give the identity map (uniform knots AND
    unit interior derivatives — the raw_d shift; round-3 review fix)."""
    import jax.numpy as jnp
    from nfmc_tpu.flows.spline import (linear_rational_spline,
                                       rational_quadratic_spline)

    x = jnp.linspace(-6.0, 6.0, 41)  # spans tails and interior
    y, ld = rational_quadratic_spline(x, jnp.zeros((41, 23)), inverse=False, n_bins=8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)
    y2, ld2 = linear_rational_spline(x, jnp.zeros((41, 31)), inverse=False, n_bins=8)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-6)
