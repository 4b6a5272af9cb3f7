"""Directional sanity of the MH acceptance log-ratio (mirrors reference
``test/test_metropolization.py``)."""
import jax.numpy as jnp
import numpy as np

from nfmc_tpu.utils import metropolis_acceptance_log_ratio


def test_higher_target_prime_increases_ratio():
    base = metropolis_acceptance_log_ratio(-1.0, -1.0, 0.0, 0.0)
    better = metropolis_acceptance_log_ratio(-1.0, -0.5, 0.0, 0.0)
    worse = metropolis_acceptance_log_ratio(-1.0, -2.0, 0.0, 0.0)
    assert better > base > worse


def test_proposal_correction_direction():
    # Easier-to-propose x' must be penalized.
    sym = metropolis_acceptance_log_ratio(-1.0, -1.0, -3.0, -3.0)
    asym = metropolis_acceptance_log_ratio(-1.0, -1.0, -3.0, -1.0)
    assert asym < sym


def test_batched():
    lr = metropolis_acceptance_log_ratio(
        jnp.zeros(4), jnp.ones(4), jnp.zeros(4), jnp.zeros(4)
    )
    assert lr.shape == (4,)
    assert jnp.allclose(lr, 1.0)


def test_imh_escapes_out_of_support_init():
    """Round-3 review fix: a chain initialized where U(x)=+inf has
    log_alpha=+inf against any finite proposal — certain accept by the MH
    math. Guarding the mask on isfinite(log_alpha) froze such chains at x0
    forever with acceptance 0."""
    import jax
    import jax.numpy as jnp

    from nfmc_tpu.samplers.nfmc import FixedIMH

    def constrained(x):
        # +inf outside the unit ball, quadratic inside
        u = 0.5 * jnp.sum(x**2, axis=-1)
        return jnp.where(jnp.sum(x**2, axis=-1) > 25.0, jnp.inf, u)

    s = FixedIMH((3,), constrained)
    s.params.n_iterations = 50
    x0 = jnp.full((16, 3), 50.0)  # every chain far outside the support
    out = s.sample(x0, show_progress=False, seed=0)
    last = np.asarray(out.running_samples.last_sample)
    # every chain escaped: the flow (near N(0, I)) proposes in-support points
    assert np.all(np.sum(last**2, axis=-1) <= 25.0), last
    assert out.statistics.n_accepted_trajectories > 0


def test_jump_mala_escapes_out_of_support_init():
    import jax
    import jax.numpy as jnp

    from nfmc_tpu.samplers.nfmc import JumpMALA

    def constrained(x):
        u = 0.5 * jnp.sum(x**2, axis=-1)
        return jnp.where(jnp.sum(x**2, axis=-1) > 25.0, jnp.inf, u)

    s = JumpMALA((3,), constrained)
    s.params.n_iterations = 30
    s.inner_sampler.params.n_iterations = 2
    x0 = jnp.full((16, 3), 50.0)
    out = s.sample(x0, show_progress=False, seed=0)
    last = np.asarray(out.running_samples.last_sample)
    assert np.all(np.sum(last**2, axis=-1) <= 25.0), last
    assert out.statistics.n_accepted_jumps > 0


def test_imh_escapes_nan_potential_init():
    """Follow-up to the +inf escape fix: a NaN current potential (the
    classic inf - inf arithmetic in clipped/log-barrier targets) makes
    log_alpha NaN, and `log_u < NaN` is False — before the
    `unevaluable_current_mask` clause such chains froze at x0 with
    acceptance 0 for the whole run."""
    import jax.numpy as jnp

    from nfmc_tpu.samplers.nfmc import FixedIMH

    def nan_outside(x):
        r2 = jnp.sum(x**2, axis=-1)
        u = 0.5 * r2
        # sqrt of a negative number outside the ball: U = NaN, not +inf
        return u + 0.0 * jnp.sqrt(25.0 - r2)

    s = FixedIMH((3,), nan_outside)
    s.params.n_iterations = 50
    x0 = jnp.full((16, 3), 50.0)  # NaN potential at every chain's init
    out = s.sample(x0, show_progress=False, seed=0)
    last = np.asarray(out.running_samples.last_sample)
    assert np.all(np.sum(last**2, axis=-1) <= 25.0), last
    assert out.statistics.n_accepted_trajectories > 0


def test_mh_propose_aux_rejects_nonfinite_proposal_potential():
    """Round-3 review fix: the public make_propose_aux hook must apply the
    same U(x') finiteness guard as the live carried-potential step — a
    proposal with U(x')=-inf gave log_ratio=+inf and was accepted."""
    import jax
    import jax.numpy as jnp

    from nfmc_tpu.samplers.mcmc import MH

    def bad_target(x):
        # -inf potential (infinite density spike) in the far tail
        u = 0.5 * jnp.sum(x**2, axis=-1)
        return jnp.where(x[..., 0] > 1.0, -jnp.inf, u)

    s = MH((2,), bad_target)
    propose = s.make_propose_aux()
    draws = s.make_draws()
    mstate = s.kernel.make_state()
    x = jnp.zeros((8, 2))
    # force every proposal into the bad region via a huge positive first coord
    noise = jnp.concatenate(
        [jnp.full((8, 1), 100.0), jnp.zeros((8, 1))], axis=-1
    )
    log_u = jnp.full((8,), -1e9)  # would accept anything the guard allows
    x_prime, mask, diverged = propose(x, mstate, (noise, log_u))
    assert bool(jnp.all(x_prime[:, 0] > 1.0))
    assert not bool(jnp.any(mask)), "non-finite U(x') must never be accepted"
    assert int(diverged) == 1


def test_ula_propose_rejects_nonfinite_proposal_potential():
    """Round-3 review fix: Langevin.make_propose's unadjusted branch must
    refuse moves into non-finite-potential states like the live ULA step."""
    import jax
    import jax.numpy as jnp

    from nfmc_tpu.samplers.mcmc import ULA

    def wall(x):
        u = 0.5 * jnp.sum(x**2, axis=-1)
        return jnp.where(x[..., 0] > 0.5, jnp.inf, u)

    s = ULA((2,), wall)
    propose = s.make_propose()
    mstate = s.kernel.make_state()
    # start just inside the wall with a large step so most proposals cross it
    x = jnp.full((64, 2), 0.49)
    key = jax.random.key(0)
    x_prime, mask, diverged = propose(x, mstate, key)
    crossed = np.asarray(x_prime[:, 0] > 0.5)
    accepted = np.asarray(mask)
    assert crossed.any(), "test setup: some proposals must cross the wall"
    assert not accepted[crossed].any(), "ULA accepted a non-finite-potential state"
    assert int(diverged) == 1


def test_ess_hoist_footprint_counts_shrink_uniforms():
    """Round-3 review fix: ESS's hoisted draws are dominated by the
    max_iterations shrink uniforms at small event dims; the footprint hook
    must count them so the HBM cap is honored."""
    import jax.numpy as jnp

    from nfmc_tpu.samplers.mcmc import ESS

    nll = lambda x: 0.5 * jnp.sum(x**2, axis=-1)
    s = ESS((1,), nll, nll)
    s.params.max_ess_step_iterations = 10
    x = jnp.zeros((100, 1))
    per = s.hoisted_elements_per_iter(x)
    assert per == 100 * (1 + 2 + 10)
    assert per > x.size  # the base estimate undercounted by ~13x here
