"""Flow-string DSL ``"<name>%<json>"`` (mirrors reference
``test/test_flow_kwargs.py``)."""
import nfmc_tpu
from nfmc_tpu import sample

from tests.util import standard_gaussian_potential


def test_basic():
    out_basic = sample(
        event_shape=(20,), target=standard_gaussian_potential,
        flow="realnvp", strategy="imh", n_iterations=2, n_warmup_iterations=2,
        show_progress=False,
    )
    n_basic_layers = len(out_basic.kernel.flow.bijection.layers)

    out_advanced = sample(
        event_shape=(20,), target=standard_gaussian_potential,
        flow='realnvp%{"n_layers": 10}', strategy="imh",
        n_iterations=2, n_warmup_iterations=2, show_progress=False,
    )
    n_advanced_layers = len(out_advanced.kernel.flow.bijection.layers)
    assert n_advanced_layers > n_basic_layers


def test_advanced():
    out_basic = sample(
        event_shape=(20,), target=standard_gaussian_potential,
        flow="realnvp", strategy="imh", n_iterations=2, n_warmup_iterations=2,
        show_progress=False,
    )
    n_basic_params = out_basic.kernel.flow.bijection.n_parameters()

    out_advanced = sample(
        event_shape=(20,), target=standard_gaussian_potential,
        flow='realnvp%{"n_layers": 10, "conditioner_kwargs": {"n_layers": 5, "n_hidden": 100}}',
        strategy="imh", n_iterations=2, n_warmup_iterations=2, show_progress=False,
    )
    n_advanced_params = out_advanced.kernel.flow.bijection.n_parameters()
    assert n_advanced_params > n_basic_params


def test_parse_flow_string():
    parsed = nfmc_tpu.parse_flow_string('c-rqnsf%{"n_bins": 16}')
    assert parsed["name"] == "c-rqnsf"
    assert parsed["kwargs"] == {"n_bins": 16}
    assert nfmc_tpu.parse_flow_string("maf")["name"] == "maf"


def test_registry_names():
    flows = nfmc_tpu.get_supported_normalizing_flows()
    for name in ["realnvp", "nice", "maf", "iaf", "c-rqnsf", "c-lrsnsf", "resflow", "ffjord"]:
        assert name in flows
    samplers = nfmc_tpu.get_supported_samplers()
    # Reference list (``util.py:421-444``) plus the documented supersets
    # "nuts"/"jump_nuts" (the reference's NUTS is a broken Pyro shim; ours is
    # native multi-chain and front-door reachable).
    reference_names = [
        "hmc", "uhmc", "ula", "mala", "mh", "ess",
        "imh", "fixed_imh", "adaptive_imh",
        "jump_mala", "jump_ula", "jump_hmc", "jump_uhmc", "jump_ess", "jump_mh",
        "neutra_mh", "neutra_hmc", "tess", "dlmc",
    ]
    for name in reference_names:
        assert name in samplers
    assert set(samplers) - set(reference_names) == {
        "nuts", "jump_nuts", "pt_mala", "pt_mh", "pt_hmc", "aies", "jump_aies",
        "chees_hmc", "jump_chees", "neutra_chees",
    }
