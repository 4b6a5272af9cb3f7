"""Correctness of the extended flow zoo: NAF, residual, continuous,
multiscale/Glow, conv variants — inverse identity + log-det vs autodiff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfmc_tpu.flows.base import Flow


def _check(bij, x, scale=0.1, recon_tol=1e-3, ld_tol=5e-2, check_ld=True):
    f = Flow(bij, seed=3)
    f.params = jax.tree_util.tree_map(
        lambda p: p + scale * jax.random.normal(jax.random.key(5), p.shape), f.params
    )
    z, ld_f = f.bijection.forward(x)
    x2, ld_i = f.bijection.inverse(z)
    assert float(jnp.max(jnp.abs(x2 - x))) < recon_tol
    assert np.isfinite(np.asarray(ld_f)).all()
    if check_ld:
        J = jax.vmap(jax.jacfwd(lambda v: f.bijection.forward_fn(f.params, v[None])[0][0]))(x[:2])
        J = J.reshape(2, x[0].size, x[0].size)
        ld_auto = jnp.linalg.slogdet(J)[1]
        assert float(jnp.max(jnp.abs(ld_auto - ld_f[:2]))) < ld_tol
    # sampling path end to end
    s = f.sample(3, seed=7)
    assert np.isfinite(np.asarray(s)).all()


X6 = jax.random.normal(jax.random.key(2), (4, 6)) * 1.2
XIMG = jax.random.normal(jax.random.key(2), (2, 8, 8)) * 1.2


def test_coupling_deep_sf():
    from nfmc_tpu.flows.naf import CouplingDeepSF

    _check(CouplingDeepSF((6,), n_layers=2, hidden_size=16), X6, recon_tol=1e-4, ld_tol=1e-4)


def test_coupling_dense_sf():
    from nfmc_tpu.flows.naf import CouplingDenseSF

    _check(CouplingDenseSF((6,), n_layers=2, hidden_size=16), X6, recon_tol=1e-4, ld_tol=1e-4)


def test_coupling_deep_dense_sf():
    from nfmc_tpu.flows.naf import CouplingDeepDenseSF

    _check(CouplingDeepDenseSF((6,), n_layers=2, hidden_size=16), X6, recon_tol=1e-3, ld_tol=1e-3)


def test_naf_inverse_logdet_gradient():
    """Regression: gradients of the bisection-inverse log-det w.r.t. the raw
    conditioner params must include the d(ld)/dx * dx/d(raw) implicit chain
    term (a stop_gradient once truncated it, biasing reverse-KL training)."""
    from nfmc_tpu.flows.naf import DeepSigmoidTransform

    tr = DeepSigmoidTransform(4)
    raw = 0.3 * jax.random.normal(jax.random.key(0), (3, tr.n_params_per_dim))
    y = jnp.array([0.5, -1.2, 2.0])

    def ld_inv(raw):
        return jnp.sum(tr.inverse(y, raw)[1])

    g = jax.grad(ld_inv)(raw)
    # central finite differences
    eps = 1e-3
    g_fd = np.zeros_like(np.asarray(raw))
    for i in range(raw.shape[0]):
        for j in range(raw.shape[1]):
            dp = np.zeros(raw.shape, dtype=np.float64)
            dp[i, j] = eps
            g_fd[i, j] = (
                float(ld_inv(raw + dp)) - float(ld_inv(raw - dp))
            ) / (2 * eps)
    assert np.allclose(np.asarray(g), g_fd, atol=2e-2), np.abs(np.asarray(g) - g_fd).max()


def test_planar():
    from nfmc_tpu.flows.residual import PlanarFlow

    _check(PlanarFlow((6,), n_layers=4), X6, recon_tol=1e-4, ld_tol=1e-4)


def test_radial():
    from nfmc_tpu.flows.residual import RadialFlow

    _check(RadialFlow((6,), n_layers=4), X6, recon_tol=1e-4, ld_tol=1e-4)


def test_sylvester():
    from nfmc_tpu.flows.residual import SylvesterFlow

    _check(SylvesterFlow((6,), n_layers=2), X6, recon_tol=1e-4, ld_tol=1e-4)


def test_iresnet():
    from nfmc_tpu.flows.residual import InvertibleResNet

    _check(InvertibleResNet((6,), n_layers=2, hidden_size=16), X6, recon_tol=1e-4, ld_tol=1e-4)


def test_ffjord():
    from nfmc_tpu.flows.continuous import FFJORD

    # mild perturbation: the discrete RK4 map's exact Jacobian differs from
    # the integrated continuous-time log-det by O(h^4) (documented)
    _check(FFJORD((6,), hidden_size=16, n_steps=6), X6, scale=0.02,
           recon_tol=1e-3, ld_tol=2e-2)


def test_ffjord_trace_fallback_logdet_sign():
    """Regression: the large-d instantaneous-trace fallback must match the
    exact-slogdet path's log-det (a sign flip here once negated every CNF
    density above exact_trace_dim)."""
    from nfmc_tpu.flows.continuous import FFJORD

    exact = FFJORD((6,), hidden_size=16, n_steps=6)
    fallback = FFJORD((6,), hidden_size=16, n_steps=6, exact_trace_dim=0, n_probes=64)
    f = Flow(exact, seed=3)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(5), p.shape), f.params
    )
    z_e, ld_e = exact.forward_fn(params, X6)
    z_h, ld_h = fallback.forward_fn(params, X6)
    assert np.allclose(np.asarray(z_e), np.asarray(z_h), atol=1e-4)
    assert np.allclose(np.asarray(ld_e), np.asarray(ld_h), atol=5e-2), (ld_e, ld_h)
    # inverse direction too: log|det dx/dz| = -log|det dz/dx|
    _, ld_ih = fallback.inverse_fn(params, z_h)
    assert np.allclose(np.asarray(ld_ih), -np.asarray(ld_h), atol=5e-2)


def test_conv_ffjord_logdet():
    """Conv CNF log-det vs brute-force autodiff slogdet on a tiny image."""
    from nfmc_tpu.flows.multiscale import ConvolutionalFFJORD

    bij = ConvolutionalFFJORD((4, 4), hidden_channels=4, n_steps=6)
    x = jax.random.normal(jax.random.key(2), (2, 4, 4)) * 0.5
    f = Flow(bij, seed=3)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(5), p.shape), f.params
    )
    z, ld_f = bij.forward_fn(params, x)
    x2, ld_i = bij.inverse_fn(params, z)
    assert float(jnp.max(jnp.abs(x2 - x))) < 1e-3
    J = jax.vmap(jax.jacfwd(lambda v: bij.forward_fn(params, v[None])[0][0]))(x)
    J = J.reshape(2, 16, 16)
    ld_auto = jnp.linalg.slogdet(J)[1]
    assert float(jnp.max(jnp.abs(ld_auto - ld_f))) < 5e-2, (ld_auto, ld_f)
    assert np.allclose(np.asarray(ld_i), -np.asarray(ld_f), atol=5e-2)


def test_otflow():
    from nfmc_tpu.flows.continuous import OTFlow

    _check(OTFlow((6,), hidden_size=16, n_steps=6), X6, scale=0.02,
           recon_tol=1e-3, ld_tol=5e-2)


def test_ddb():
    from nfmc_tpu.flows.continuous import DeepDiffeomorphicBijection

    _check(DeepDiffeomorphicBijection((6,), hidden_size=16, n_steps=20), X6,
           scale=0.02, recon_tol=2e-2, ld_tol=5e-2)


def test_multiscale_realnvp():
    from nfmc_tpu.flows.multiscale import MultiscaleRealNVP

    _check(MultiscaleRealNVP((8, 8)), XIMG, recon_tol=1e-4, ld_tol=1e-3)


def test_glow_affine():
    from nfmc_tpu.flows.multiscale import AffineGlow

    _check(AffineGlow((8, 8)), XIMG, recon_tol=1e-4, ld_tol=1e-3)


def test_glow_rqs():
    from nfmc_tpu.flows.multiscale import RQSGlow

    _check(RQSGlow((8, 8)), XIMG, scale=0.05, recon_tol=1e-3, ld_tol=1e-2)


def test_conv_iresnet():
    from nfmc_tpu.flows.multiscale import ConvolutionalInvertibleResNet

    _check(ConvolutionalInvertibleResNet((8, 8), n_layers=2), XIMG,
           recon_tol=1e-4, ld_tol=1e-1)


def test_multiscale_3channel():
    from nfmc_tpu.flows.multiscale import MultiscaleRealNVP

    x = jax.random.normal(jax.random.key(9), (2, 3, 8, 8))
    _check(MultiscaleRealNVP((3, 8, 8)), x, recon_tol=1e-4, ld_tol=1e-3)


def test_registry_constructs_all_names():
    """Every canonical registry name must construct and round-trip."""
    from nfmc_tpu.api.registry import FLOW_NAMES, create_flow_object

    vector_names = [
        "realnvp", "nice", "maf", "iaf", "c-rqnsf", "ma-rqnsf", "ia-rqnsf",
        "c-lrsnsf", "ma-lrsnsf", "ia-lrsnsf", "c-naf-deep", "c-naf-dense",
        "c-naf-deep-dense", "planar", "radial", "sylvester", "i-resnet",
        "resflow", "proximal-resflow",
    ]
    for name in vector_names:
        flow = create_flow_object(name, (4,), n_layers=1)
        lp = flow.log_prob(jnp.zeros((2, 4)))
        assert np.isfinite(np.asarray(lp)).all(), name


def test_rnode_trains_differently_from_ffjord():
    """VERDICT round 1 item 3: RNODE's kinetic regularizer must be live in
    training — same data/seed, FFJORD vs RNODE trajectories diverge."""
    from nfmc_tpu.flows.continuous import FFJORD, RNODE

    x = np.asarray(jax.random.normal(jax.random.key(0), (64, 3)) * 2.0)

    def train(cls):
        f = Flow(cls((3,), hidden_size=8, n_hidden_layers=1, n_steps=2), seed=0)
        f.fit(x, n_epochs=3, batch_size=32, shuffle=False, seed=1)
        return f.params

    assert RNODE.regularization_weight > 0 and FFJORD.regularization_weight == 0
    p_ffjord = train(FFJORD)
    p_rnode = train(RNODE)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p_ffjord, p_rnode
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6


def test_conv_rnode_trains_differently_from_conv_ffjord():
    from nfmc_tpu.flows.multiscale import ConvolutionalFFJORD, ConvolutionalRNODE

    x = np.asarray(jax.random.normal(jax.random.key(0), (8, 4, 4)))

    def train(cls):
        f = Flow(cls((4, 4), hidden_channels=4, n_steps=2), seed=0)
        f.fit(x, n_epochs=2, batch_size=8, shuffle=False, seed=1)
        return f.params

    assert ConvolutionalRNODE.regularization_weight > 0
    p_f = train(ConvolutionalFFJORD)
    p_r = train(ConvolutionalRNODE)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p_f, p_r
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6


def test_hutchinson_probes_vary_per_call_and_key():
    """VERDICT round 1 item 4: probes must differ across inputs and across
    explicit base keys (no baked jax.random.key(0) bias)."""
    from nfmc_tpu.flows.base import hutchinson_probes

    v1 = jnp.arange(6.0)
    v2 = jnp.arange(6.0) + 1.0
    p1 = hutchinson_probes(v1, 4)
    p1b = hutchinson_probes(v1, 4)
    p2 = hutchinson_probes(v2, 4)
    pk = hutchinson_probes(v1, 4, base_key=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p1b))  # deterministic
    assert not np.array_equal(np.asarray(p1), np.asarray(p2))  # per-input
    assert not np.array_equal(np.asarray(p1), np.asarray(pk))  # per-key
    assert set(np.unique(np.asarray(p1))) <= {-1.0, 1.0}


def test_hutchinson_logdet_unbiased_vs_exact():
    """Stochastic power-series log-det (per-sample derived probes) must agree
    with exact slogdet on average over many inputs (small event)."""
    from nfmc_tpu.flows.residual import ResFlow

    d = 6
    bij = ResFlow((d,), n_layers=1, hidden_size=8)
    f = Flow(bij, seed=2)
    f.params = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.key(9), p.shape), f.params
    )
    x = jax.random.normal(jax.random.key(11), (2048, d))
    p0 = f.params[0]
    exact = jnp.linalg.slogdet(
        jnp.eye(d)[None]
        + jax.vmap(jax.jacfwd(lambda v: bij._g(p0, v[None])[0]))(x)
    )[1]
    bij.exact_logdet_dim = 0  # force the stochastic power-series path
    bij.series_terms = 40  # make truncation bias negligible vs probe noise
    est = bij._logdet(p0, x)
    # Per-sample derived probes decorrelate the estimator error so it averages
    # out over inputs (measured: the old shared-key(0) probes gave a +0.43
    # mean bias here that does NOT shrink with more samples; per-sample probes
    # give ~0.000 at n=2048 with per-sample std ~0.27).
    assert abs(float(jnp.mean(est - exact))) < 0.02
    assert float(jnp.std(est - exact)) < 1.0


def test_multiscale_rejects_unsqueezable_n_levels():
    """Round-3 review fix: explicit n_levels implying odd intermediate dims
    must fail at construction, not with a reshape error at trace time."""
    import pytest

    from nfmc_tpu.flows.multiscale import MultiscaleRealNVP

    with pytest.raises(ValueError, match="divisible"):
        MultiscaleRealNVP((1, 6, 6), n_levels=2)
    # one level on 6x6 is fine
    MultiscaleRealNVP((1, 6, 6), n_levels=1)


def test_conv_continuous_rejects_bad_event_rank():
    import pytest

    from nfmc_tpu.flows.multiscale import ConvolutionalFFJORD

    with pytest.raises(ValueError, match="conv flows need"):
        ConvolutionalFFJORD((16,))


def test_conv_init_middle_layer_fan_in():
    """Round-3 review fix: w2 is a 1x1 conv; its init scale uses fan-in
    hidden_ch, not hidden_ch * 9."""
    import jax
    import numpy as np

    from nfmc_tpu.flows.multiscale import conv_init

    p = conv_init(jax.random.key(0), 4, 64, 8)
    std2 = float(np.std(np.asarray(p["w2"])))
    assert abs(std2 - 1 / np.sqrt(64)) < 0.25 / np.sqrt(64), std2
