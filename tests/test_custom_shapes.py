"""Non-vector event shapes, e.g. (8, 8) images (mirrors reference
``test/test_custom_shapes.py``)."""
import numpy as np
import pytest

from nfmc_tpu import sample

from tests.util import fast_fit_kwargs, standard_gaussian_potential

EVENT = (8, 8)


@pytest.mark.parametrize(
    "strategy",
    ["mh", "mala", "hmc", "chees_hmc", "imh", "adaptive_imh", "jump_mala", "neutra_hmc", "tess", "nuts"],
)
def test_matrix_event(strategy):
    kwargs = dict(
        n_chains=3, n_iterations=2,
        flow_kwargs={"n_layers": 2, "hidden_size": 16},
        show_progress=False,
    )
    if strategy == "tess":
        kwargs["negative_log_likelihood"] = standard_gaussian_potential
        kwargs["param_kwargs"] = {"flow_fit_kwargs": fast_fit_kwargs()}
    if strategy == "jump_mala":
        kwargs["inner_param_kwargs"] = {"n_iterations": 3}
    out = sample(standard_gaussian_potential, event_shape=EVENT, strategy=strategy, **kwargs)
    assert out.samples.shape[1:] == (3, *EVENT)
    assert np.isfinite(out.samples).all()
