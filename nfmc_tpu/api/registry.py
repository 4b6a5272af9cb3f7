"""Flow + sampler registries and the flow-string DSL.

Parity with reference ``nfmc/util.py:5-379,421-444``: the same canonical flow
names, synonym lists and family taxonomy; the same strategy-name lists; and
the ``"<name>%<json kwargs>"`` DSL (e.g. ``'realnvp%{"n_layers": 10}'``,
exercised by reference ``test/test_flow_kwargs.py:23,49``).
"""
from __future__ import annotations

import json
from typing import Dict, List

from ..flows import Flow

FLOW_REFERENCE_DATA = {
    "realnvp": {"alt": ["realnvp", "real_nvp", "rnvp"], "family": ("autoregressive", "coupling", "affine")},
    "ms-realnvp": {"alt": ["ms-realnvp", "multiscale-realnvp"], "family": ("autoregressive", "multiscale", "affine")},
    "glow-realnvp": {"alt": ["affine-glow", "glow-affine", "glow"], "family": ("autoregressive", "multiscale", "affine")},
    "maf": {"alt": [], "family": ("autoregressive", "masked", "affine")},
    "iaf": {"alt": [], "family": ("autoregressive", "masked", "affine")},
    "nice": {"alt": [], "family": ("autoregressive", "coupling", "affine")},
    "ms-nice": {"alt": ["ms-nice", "multiscale-nice"], "family": ("autoregressive", "multiscale", "affine")},
    "glow-nice": {"alt": ["shift-glow", "glow-shift"], "family": ("autoregressive", "multiscale", "affine")},
    "c-rqnsf": {"alt": ["c-rqsnsf"], "family": ("autoregressive", "coupling", "spline")},
    "ms-rqnsf": {"alt": ["ms-rqnsf", "multiscale-rqnsf"], "family": ("autoregressive", "multiscale", "spline")},
    "glow-rqnsf": {"alt": ["rqs-glow", "glow-rqs"], "family": ("autoregressive", "multiscale", "spline")},
    "ma-rqnsf": {"alt": ["ma-rqsnsf", "maf-rqsnsf", "maf-rqnsf"], "family": ("autoregressive", "masked", "spline")},
    "ia-rqnsf": {"alt": ["ia-rqsnsf", "iaf-rqsnsf", "iaf-rqnsf"], "family": ("autoregressive", "masked", "spline")},
    "c-lrsnsf": {"alt": ["c-lrnsf"], "family": ("autoregressive", "coupling", "spline")},
    "ms-lrsnsf": {"alt": ["ms-lrsnsf", "multiscale-lrsnsf"], "family": ("autoregressive", "multiscale", "spline")},
    "glow-lrsnsf": {"alt": ["lrs-glow", "glow-lrs"], "family": ("autoregressive", "multiscale", "spline")},
    "ma-lrsnsf": {"alt": ["ma-lrnsf", "maf-lrsnsf", "maf-lrnsf"], "family": ("autoregressive", "masked", "spline")},
    "ia-lrsnsf": {"alt": ["ia-lrnsf", "iaf-lrsnsf", "iaf-lrnsf"], "family": ("autoregressive", "masked", "spline")},
    "c-naf-deep": {"alt": [], "family": ("autoregressive", "coupling", "nn")},
    "ms-naf-deep": {"alt": ["ms-naf-deep", "multiscale-naf-deep"], "family": ("autoregressive", "multiscale", "nn")},
    "glow-naf-deep": {"alt": ["naf-deep-glow", "glow-naf-deep"], "family": ("autoregressive", "multiscale", "nn")},
    "ma-naf-deep": {"alt": ["maf-naf-deep"], "family": ("autoregressive", "masked", "nn")},
    "ia-naf-deep": {"alt": ["iaf-naf-deep"], "family": ("autoregressive", "masked", "nn")},
    "c-naf-deep-dense": {"alt": [], "family": ("autoregressive", "coupling", "nn")},
    "ms-naf-deep-dense": {"alt": ["ms-naf-deep-dense", "multiscale-naf-deep-dense"], "family": ("autoregressive", "multiscale", "nn")},
    "glow-naf-deep-dense": {"alt": ["naf-deep-dense-glow", "glow-naf-deep-dense"], "family": ("autoregressive", "multiscale", "nn")},
    "ma-naf-deep-dense": {"alt": ["maf-naf-deep-dense"], "family": ("autoregressive", "masked", "nn")},
    "ia-naf-deep-dense": {"alt": ["iaf-naf-deep-dense"], "family": ("autoregressive", "masked", "nn")},
    "c-naf-dense": {"alt": [], "family": ("autoregressive", "coupling", "nn")},
    "ms-naf-dense": {"alt": ["ms-naf-dense", "multiscale-naf-dense"], "family": ("autoregressive", "multiscale", "nn")},
    "glow-naf-dense": {"alt": ["naf-dense-glow", "glow-naf-dense"], "family": ("autoregressive", "multiscale", "nn")},
    "ma-naf-dense": {"alt": ["maf-naf-dense"], "family": ("autoregressive", "masked", "nn")},
    "ia-naf-dense": {"alt": ["iaf-naf-dense"], "family": ("autoregressive", "masked", "nn")},
    "i-resnet": {"alt": ["iresnet", "invertible resnet", "invertible-resnet", "i-resnet"], "family": ("residual", "iterative", "standard")},
    "conv-i-resnet": {"alt": ["conv-iresnet", "convolutional invertible resnet", "conv-invertible-resnet", "conv-i-resnet"], "family": ("residual", "iterative", "convolutional")},
    "resflow": {"alt": ["resflow", "residual flow", "residual-flow", "res-flow"], "family": ("residual", "iterative", "standard")},
    "conv-resflow": {"alt": ["conv-resflow", "convolutional residual flow", "conv-residual-flow", "conv-res-flow"], "family": ("residual", "iterative", "convolutional")},
    "proximal-resflow": {"alt": ["proximal-resflow", "p-resflow", "presflow", "proximal resflow"], "family": ("residual", "iterative", "standard")},
    "planar": {"alt": [], "family": ("residual", "matrix-det")},
    "radial": {"alt": [], "family": ("residual", "matrix-det")},
    "sylvester": {"alt": [], "family": ("residual", "matrix-det")},
    "ot-flow": {"alt": ["ot-flow", "otflow", "ot flow"], "family": ("continuous", "standard")},
    "ffjord": {"alt": ["ffjord"], "family": ("continuous", "standard")},
    "conv-ffjord": {"alt": ["conv-ffjord"], "family": ("continuous", "convolutional")},
    # Quirk kept for parity: the reference reuses 'ddnf' as conv-ddb's alias
    # and 'rnode' as conv-rnode's (``nfmc/util.py:68-71``), so those aliases
    # resolve to the NON-conv canonical names and the conv variants are only
    # reachable by their canonical names.
    "ddb": {"alt": ["ddnf"], "family": ("continuous", "standard")},
    "conv-ddb": {"alt": ["ddnf"], "family": ("continuous", "convolutional")},
    "rnode": {"alt": ["rnode"], "family": ("continuous", "standard")},
    "conv-rnode": {"alt": ["rnode"], "family": ("continuous", "convolutional")},
}


def get_flow_family(flow: str):
    try:
        return FLOW_REFERENCE_DATA[flow]["family"]
    except KeyError:
        for key in FLOW_REFERENCE_DATA:
            if flow in FLOW_REFERENCE_DATA[key]["alt"]:
                return FLOW_REFERENCE_DATA[key]["family"]
    raise KeyError(f"Flow {flow} not found in reference data")


def _subset(pred) -> Dict[str, List[str]]:
    return {
        k: [k] + FLOW_REFERENCE_DATA[k]["alt"]
        for k in FLOW_REFERENCE_DATA
        if pred(FLOW_REFERENCE_DATA[k]["family"])
    }


COUPLING_FLOW_NAMES = _subset(lambda f: f[0] == "autoregressive" and f[1] == "coupling")
AFFINE_AUTOREGRESSIVE_FLOW_NAMES = _subset(
    lambda f: f[0] == "autoregressive" and f[2:] and f[2] == "affine" and f[1] in ("coupling", "masked")
)
SPLINE_AUTOREGRESSIVE_FLOW_NAMES = _subset(
    lambda f: f[0] == "autoregressive" and f[2:] and f[2] == "spline" and f[1] in ("coupling", "masked")
)
NEURAL_AUTOREGRESSIVE_FLOW_NAMES = _subset(
    lambda f: f[0] == "autoregressive" and f[2:] and f[2] == "nn" and f[1] in ("coupling", "masked")
)
MULTISCALE_FLOW_NAMES = _subset(lambda f: f[0] == "autoregressive" and f[1] == "multiscale")
AUTOREGRESSIVE_FLOW_NAMES = {
    **AFFINE_AUTOREGRESSIVE_FLOW_NAMES,
    **SPLINE_AUTOREGRESSIVE_FLOW_NAMES,
    **NEURAL_AUTOREGRESSIVE_FLOW_NAMES,
    **MULTISCALE_FLOW_NAMES,
}
CONTINUOUS_FLOW_NAMES = _subset(lambda f: f[0] == "continuous")
RESIDUAL_FLOW_NAMES = _subset(lambda f: f[0] == "residual")
RESIDUAL_MATRIX_DET_FLOW_NAMES = _subset(lambda f: f[0] == "residual" and f[1] == "matrix-det")
RESIDUAL_CONTRACTIVE_FLOW_NAMES = _subset(lambda f: f[0] == "residual" and f[1] != "matrix-det")

FLOW_NAMES: Dict[str, List[str]] = {
    **AUTOREGRESSIVE_FLOW_NAMES,
    **CONTINUOUS_FLOW_NAMES,
    **RESIDUAL_FLOW_NAMES,
}


def flatten_name_dictionary(d: Dict[str, List[str]]) -> List[str]:
    flat = list(d.keys())
    for value in d.values():
        flat.extend(value)
    return sorted(set(flat))


def is_flow_supported(flow_name: str) -> bool:
    return flow_name in flatten_name_dictionary(FLOW_NAMES)


def get_supported_autoregressive_flows(synonyms: bool = True):
    return flatten_name_dictionary(AUTOREGRESSIVE_FLOW_NAMES) if synonyms else sorted(AUTOREGRESSIVE_FLOW_NAMES)


def get_supported_residual_flows(synonyms: bool = True):
    return flatten_name_dictionary(RESIDUAL_FLOW_NAMES) if synonyms else sorted(RESIDUAL_FLOW_NAMES)


def get_supported_continuous_flows(synonyms: bool = True):
    return flatten_name_dictionary(CONTINUOUS_FLOW_NAMES) if synonyms else sorted(CONTINUOUS_FLOW_NAMES)


def get_supported_normalizing_flows(synonyms: bool = True):
    return sorted(
        set(
            get_supported_autoregressive_flows(synonyms)
            + get_supported_residual_flows(synonyms)
            + get_supported_continuous_flows(synonyms)
        )
    )


def _stable_hash(s: str) -> int:
    """Process-stable digest (builtin ``hash`` is salted per process, so it
    must never be persisted or compared cross-process)."""
    import hashlib

    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def parse_flow_string(flow_string: str) -> dict:
    """``"<name>%<json>"`` or ``"<name>"``; reference ``util.py:189-215``."""
    if flow_string is None:
        return {"name": None, "kwargs": {}, "hash": _stable_hash("None")}
    if "%" not in flow_string:
        return {"name": flow_string, "kwargs": {}, "hash": _stable_hash(flow_string)}
    flow_name = flow_string.split("%")[0]
    kwargs = json.loads(flow_string.split("%", 1)[1])
    return {"name": flow_name, "kwargs": kwargs, "hash": _stable_hash(flow_name + str(kwargs))}


def _constructors():
    from ..flows import (
        IAF,
        MAF,
        NICE,
        CouplingLRS,
        CouplingRQNSF,
        InverseAutoregressiveLRS,
        InverseAutoregressiveRQNSF,
        MaskedAutoregressiveLRS,
        MaskedAutoregressiveRQNSF,
        RealNVP,
    )
    from ..flows.naf import (
        CouplingDeepDenseSF,
        CouplingDeepSF,
        CouplingDenseSF,
        InverseAutoregressiveDeepDenseSF,
        InverseAutoregressiveDeepSF,
        InverseAutoregressiveDenseSF,
        MaskedAutoregressiveDeepDenseSF,
        MaskedAutoregressiveDeepSF,
        MaskedAutoregressiveDenseSF,
    )
    from ..flows.residual import (
        InvertibleResNet,
        PlanarFlow,
        ProximalResFlow,
        RadialFlow,
        ResFlow,
        SylvesterFlow,
    )
    from ..flows.continuous import DeepDiffeomorphicBijection, FFJORD, OTFlow, RNODE
    from ..flows.multiscale import (
        AffineGlow,
        DeepDenseSigmoidGlow,
        DeepSigmoidGlow,
        DenseSigmoidGlow,
        LRSGlow,
        MultiscaleDeepDenseSigmoid,
        MultiscaleDeepSigmoid,
        MultiscaleDenseSigmoid,
        MultiscaleLRSNSF,
        MultiscaleNICE,
        MultiscaleRealNVP,
        MultiscaleRQNSF,
        RQSGlow,
        ShiftGlow,
        ConvolutionalFFJORD,
        ConvolutionalInvertibleResNet,
        ConvolutionalResFlow,
        ConvolutionalRNODE,
        ConvolutionalDDB,
    )

    return {
        "realnvp": RealNVP,
        "nice": NICE,
        "maf": MAF,
        "iaf": IAF,
        "c-rqnsf": CouplingRQNSF,
        "ma-rqnsf": MaskedAutoregressiveRQNSF,
        "ia-rqnsf": InverseAutoregressiveRQNSF,
        "c-lrsnsf": CouplingLRS,
        "ma-lrsnsf": MaskedAutoregressiveLRS,
        "ia-lrsnsf": InverseAutoregressiveLRS,
        "c-naf-deep": CouplingDeepSF,
        "c-naf-deep-dense": CouplingDeepDenseSF,
        "c-naf-dense": CouplingDenseSF,
        "ia-naf-deep": InverseAutoregressiveDeepSF,
        "ia-naf-deep-dense": InverseAutoregressiveDeepDenseSF,
        "ia-naf-dense": InverseAutoregressiveDenseSF,
        "ma-naf-deep": MaskedAutoregressiveDeepSF,
        "ma-naf-deep-dense": MaskedAutoregressiveDeepDenseSF,
        "ma-naf-dense": MaskedAutoregressiveDenseSF,
        "i-resnet": InvertibleResNet,
        "resflow": ResFlow,
        "proximal-resflow": ProximalResFlow,
        "planar": PlanarFlow,
        "radial": RadialFlow,
        "sylvester": SylvesterFlow,
        "ot-flow": OTFlow,
        "ffjord": FFJORD,
        "ddb": DeepDiffeomorphicBijection,
        "rnode": RNODE,
        "ms-realnvp": MultiscaleRealNVP,
        "ms-nice": MultiscaleNICE,
        "ms-rqnsf": MultiscaleRQNSF,
        "ms-lrsnsf": MultiscaleLRSNSF,
        "ms-naf-deep": MultiscaleDeepSigmoid,
        "ms-naf-deep-dense": MultiscaleDeepDenseSigmoid,
        "ms-naf-dense": MultiscaleDenseSigmoid,
        "glow-realnvp": AffineGlow,
        "glow-nice": ShiftGlow,
        "glow-rqnsf": RQSGlow,
        "glow-lrsnsf": LRSGlow,
        "glow-naf-deep": DeepSigmoidGlow,
        "glow-naf-dense": DenseSigmoidGlow,
        "glow-naf-deep-dense": DeepDenseSigmoidGlow,
        "conv-i-resnet": ConvolutionalInvertibleResNet,
        "conv-resflow": ConvolutionalResFlow,
        "conv-ffjord": ConvolutionalFFJORD,
        "conv-rnode": ConvolutionalRNODE,
        "conv-ddb": ConvolutionalDDB,
    }


def create_flow_object(flow_string: str, event_shape, **kwargs) -> Flow:
    """Build a Flow from a registry name (+DSL kwargs); reference ``util.py:218-379``."""
    flow_data = parse_flow_string(flow_string)
    flow_name = flow_data["name"]
    kwargs = {**kwargs, **flow_data["kwargs"]}
    if not isinstance(flow_name, str):
        raise ValueError(f"bad flow name: {flow_name!r}")
    if not is_flow_supported(flow_name):
        raise ValueError(f"unsupported flow: {flow_name!r}")

    constructors = _constructors()
    canonical = None
    if flow_name in constructors:
        canonical = flow_name
    else:
        for key, names in FLOW_NAMES.items():
            if flow_name in names:
                canonical = key
                break
    if canonical is None or canonical not in constructors:
        raise ValueError(f"unsupported flow: {flow_name!r}")

    seed = kwargs.pop("seed", None)
    bijection = constructors[canonical](event_shape, **kwargs)
    return Flow(bijection, seed=seed)


# ---------------------------------------------------------------------------
# Sampler strategy registry (reference ``util.py:421-444``)
# ---------------------------------------------------------------------------

def get_supported_mcmc_samplers() -> List[str]:
    # "nuts" is a superset of the reference list (``util.py:421-425``): the
    # reference ships a broken single-chain Pyro shim it never dispatches
    # (``nfmc/algorithms/sampling/mcmc/nuts.py:38-51``); ours is native
    # multi-chain NUTS (samplers/mcmc/nuts_impl.py) and front-door reachable.
    # "pt_mala"/"pt_mh" are also supersets: parallel tempering (replica
    # exchange), which the reference lacks entirely (samplers/mcmc/pt.py).
    # "aies" is a superset: the affine-invariant ensemble stretch move
    # (gradient-free, step-size-free; samplers/mcmc/ensemble.py).
    # "chees_hmc" is a superset: cross-chain adaptive trajectory length
    # (Hoffman et al. 2021; samplers/mcmc/chees.py).
    # "dense_hmc"/"dense_mala" are supersets: full-covariance (Stan "dense
    # metric") mass-matrix adaptation — the reference's Metropolis adaptation
    # is diagonal-only (``mcmc/base.py:105-161``; samplers/mcmc/dense.py).
    return ["hmc", "uhmc", "ula", "mala", "mh", "ess", "nuts", "pt_mala", "pt_mh",
            "pt_hmc", "aies", "chees_hmc", "dense_hmc", "dense_mala"]


def get_supported_nfmc_samplers() -> List[str]:
    return [
        "imh", "fixed_imh", "adaptive_imh",
        "jump_mala", "jump_ula", "jump_hmc", "jump_uhmc", "jump_ess", "jump_mh",
        "jump_nuts",  # superset, see get_supported_mcmc_samplers
        "jump_aies",  # superset: flow jumps + gradient-free ensemble moves
        "jump_chees",  # superset: flow jumps + ChEES-adapted HMC inner moves
        "neutra_mh", "neutra_hmc",
        "neutra_chees",  # superset: ChEES inner in the reparameterized space
        "tess", "dlmc",
    ]


def get_supported_samplers() -> List[str]:
    return get_supported_mcmc_samplers() + get_supported_nfmc_samplers()
