from .base import MCMCSampler, MetropolisKernel, MetropolisParameters, MetropolisSampler
from .mh import MH, MHKernel, MHParameters, RandomWalk
from .langevin import MALA, ULA, Langevin, LangevinKernel, LangevinParameters
from .hmc import HMC, UHMC, HMCKernel, HMCParameters
from .ess import ESS, ESSKernel, ESSParameters
from .nuts import NUTS, NUTSKernel, NUTSParameters
from .pt import PTHMC, PTMALA, PTRWMH, ParallelTempering, PTKernel, PTParameters
from .ensemble import AIES, AIESKernel, AIESParameters
from .chees import CheesHMC, CheesHMCKernel, CheesHMCParameters
from .dense import (
    DenseHMC,
    DenseHMCKernel,
    DenseHMCParameters,
    DenseLangevinKernel,
    DenseLangevinParameters,
    DenseMALA,
)

__all__ = [
    "MCMCSampler", "MetropolisKernel", "MetropolisParameters", "MetropolisSampler",
    "MH", "MHKernel", "MHParameters", "RandomWalk",
    "MALA", "ULA", "Langevin", "LangevinKernel", "LangevinParameters",
    "HMC", "UHMC", "HMCKernel", "HMCParameters",
    "ESS", "ESSKernel", "ESSParameters",
    "NUTS", "NUTSKernel", "NUTSParameters",
    "PTHMC", "PTMALA", "PTRWMH", "ParallelTempering", "PTKernel", "PTParameters",
    "AIES", "AIESKernel", "AIESParameters",
    "CheesHMC", "CheesHMCKernel", "CheesHMCParameters",
    "DenseHMC", "DenseHMCKernel", "DenseHMCParameters",
    "DenseMALA", "DenseLangevinKernel", "DenseLangevinParameters",
]
