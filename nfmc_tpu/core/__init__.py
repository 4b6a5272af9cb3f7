from .driver import ChunkedScanDriver, StatsAccum, StepInfo, chunk_schedule
from .output import JumpNFMCOutput, MCMCOutput
from .rng import next_key, resolve_key, set_seed
from .sampler import MCMCKernel, MCMCParameters, NFMCKernel, NFMCParameters, Sampler
from .samples import MCMCSamples
from .statistics import (
    JumpNFMCStatistics,
    MCMCExpectation,
    MCMCExpectationDict,
    MCMCStatistics,
)
from .tuning import DualAveragingParams, DualAveragingState, da_init, da_step, da_value, train_val_split

__all__ = [
    "ChunkedScanDriver", "StatsAccum", "StepInfo", "chunk_schedule",
    "JumpNFMCOutput", "MCMCOutput",
    "next_key", "resolve_key", "set_seed",
    "MCMCKernel", "MCMCParameters", "NFMCKernel", "NFMCParameters", "Sampler",
    "MCMCSamples",
    "JumpNFMCStatistics", "MCMCExpectation", "MCMCExpectationDict", "MCMCStatistics",
    "DualAveragingParams", "DualAveragingState", "da_init", "da_step", "da_value", "train_val_split",
]
