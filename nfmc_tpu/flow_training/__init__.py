"""Flow training algorithms beyond plain MLE/reverse-KL (reference L5)."""
from .fab import FAB, fab, flow_annealed_importance_sampling_bootstrap_base

__all__ = ["FAB", "fab", "flow_annealed_importance_sampling_bootstrap_base"]
