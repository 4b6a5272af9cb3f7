"""nfmc-tpu: TPU-native normalizing-flow-assisted MCMC.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference ``nfmc`` library (davidnabergoj/nfmc): classical MCMC kernels and
NFMC samplers over batched chains, a normalizing-flow subsystem, and a
one-call ``sample()`` front door — redesigned for TPUs (jitted ``lax.scan``
chains, fused batched gradients, mesh-sharded chain parallelism).
"""
from .core import (
    JumpNFMCOutput,
    MCMCKernel,
    MCMCOutput,
    MCMCParameters,
    MCMCSamples,
    MCMCStatistics,
    NFMCKernel,
    NFMCParameters,
    Sampler,
    set_seed,
)

__version__ = "0.4.0"

__all__ = [
    "sample",
    "create_sampler",
    "set_seed",
    "MCMCOutput",
    "MCMCStatistics",
    "MCMCSamples",
    "MCMCKernel",
    "MCMCParameters",
    "NFMCKernel",
    "NFMCParameters",
    "JumpNFMCOutput",
    "Sampler",
]


def __getattr__(name):
    # Lazy front-door import (avoids flows import cost for MCMC-only use).
    if name in ("sample", "create_sampler"):
        from .api.sample import create_sampler, sample

        return {"sample": sample, "create_sampler": create_sampler}[name]
    if name in (
        "get_supported_samplers",
        "get_supported_mcmc_samplers",
        "get_supported_nfmc_samplers",
        "get_supported_normalizing_flows",
        "create_flow_object",
        "parse_flow_string",
    ):
        from .api import registry

        return getattr(registry, name)
    if name in ("profiling", "potentials", "flows", "samplers", "transport",
                "parallel", "checkpoint", "diagnostics", "flow_training",
                "validation"):
        # importlib, not `from . import`: the from-import form re-enters this
        # __getattr__ through _handle_fromlist before the submodule loads
        import importlib

        return importlib.import_module("." + name, __name__)
    raise AttributeError(f"module 'nfmc_tpu' has no attribute {name}")


def __dir__():
    # Surface the lazily-imported front-door symbols in dir()/completion.
    return sorted(
        set(globals())
        | {
            "sample",
            "create_sampler",
            "get_supported_samplers",
            "get_supported_mcmc_samplers",
            "get_supported_nfmc_samplers",
            "get_supported_normalizing_flows",
            "create_flow_object",
            "parse_flow_string",
            "profiling",
            "potentials",
            "flows",
            "samplers",
            "transport",
            "parallel",
            "checkpoint",
            "diagnostics",
            "flow_training",
            "validation",
        }
    )
