"""Shared test potentials (mirrors reference ``test/util.py``)."""
import jax.numpy as jnp


def standard_gaussian_potential(x):
    return 0.5 * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=-1)


def diagonal_gaussian_potential(x, sigma):
    z = x.reshape(x.shape[0], -1) / sigma.reshape(1, -1)
    return 0.5 * jnp.sum(z**2, axis=-1)


def small_flow(event_shape=(5,), seed=1, **kwargs):
    from nfmc_tpu.flows import Flow, RealNVP

    kwargs.setdefault("n_layers", 2)
    kwargs.setdefault("hidden_size", 16)
    return Flow(RealNVP(event_shape, **kwargs), seed=seed)


def fast_fit_kwargs():
    """Keep in-test flow training tiny."""
    return {
        "early_stopping": True,
        "early_stopping_threshold": 5,
        "batch_size": "adaptive",
        "show_progress": False,
        "n_epochs": 3,
    }
