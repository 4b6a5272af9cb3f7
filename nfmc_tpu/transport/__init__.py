"""Transport / annealing algorithms (reference L5; SURVEY.md section 2.7).

The reference ships these partially broken (AFT calls a module as a function,
CRAFT calls a nonexistent signature, SNF's MCMC layers crash, nested sampling
references an undefined helper — ``transport/annealed_flow_transport.py:120-128``,
``:355-363``, ``stochastic_normalizing_flows.py:72-87``, ``nested.py:26``).
These are corrected, working TPU-native implementations.
"""
from .aft import AnnealedFlowTransport, aft
from .craft import CRAFT, craft
from .snf import SNF, snf
from .ns import NestedSampling, ns
from .pmc import PreconditionedMonteCarlo, pmc

__all__ = [
    "AnnealedFlowTransport", "aft",
    "CRAFT", "craft",
    "SNF", "snf",
    "NestedSampling", "ns",
    "PreconditionedMonteCarlo", "pmc",
]
