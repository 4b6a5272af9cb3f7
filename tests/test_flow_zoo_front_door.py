"""End-to-end front-door sweep over the ENTIRE flow zoo (VERDICT r3 item 8).

Construction/inverse unit tests (test_flow_zoo.py) don't prove the jitted
training + sampling paths for the exotic families; this drives every
CANONICAL registry name through ``sample(strategy='imh', flow=name)`` —
reverse-KL variational warmup (the jitted training path) + flow-proposal
MH sampling — at a tiny config and asserts finite output. Synonyms map to
the same constructors (asserted), so the canonical sweep covers all
``get_supported_normalizing_flows()`` names. Reference surface:
``nfmc/util.py:229-278``.
"""
import jax
import numpy as np
import pytest

import nfmc_tpu
from nfmc_tpu.api.registry import FLOW_NAMES

from tests.util import standard_gaussian_potential

# image-event families (spatial coupling / squeeze steps need a 2-d event)
_IMAGE_PREFIXES = ("ms-", "glow-", "conv-")


def _event_shape(name):
    return (8, 8) if name.startswith(_IMAGE_PREFIXES) else (4,)


def test_synonyms_alias_canonicals():
    """Every supported name resolves to one of the 48 canonical families."""
    all_names = set(nfmc_tpu.get_supported_normalizing_flows())
    canonical = set(FLOW_NAMES)
    aliased = set()
    for key, names in FLOW_NAMES.items():
        aliased.update(names)
    assert canonical <= all_names
    assert all_names <= canonical | aliased


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(FLOW_NAMES))
def test_front_door_imh_sweep(name):
    event_shape = _event_shape(name)
    out = nfmc_tpu.sample(
        standard_gaussian_potential,
        event_shape=event_shape,
        flow=name,
        strategy="imh",
        n_chains=4,
        n_iterations=2,
        n_warmup_iterations=2,
        warmup=True,  # reverse-KL variational fit: the jitted training path
        show_progress=False,
        seed=0,
        param_kwargs={
            "warmup_fit_kwargs": {
                "n_epochs": 3,
                "n_samples": 8,
                "early_stopping": False,
                "lr": 1e-3,
            },
        },
    )
    draws = np.asarray(out.samples)
    assert draws.shape == (2, 4, *event_shape), name
    assert np.isfinite(draws).all(), name
    assert np.isfinite(np.asarray(out.mean)).all(), name
