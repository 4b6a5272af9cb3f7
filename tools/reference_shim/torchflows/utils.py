"""Tensor-shape helpers consumed by the reference (SURVEY.md §2.9):
``sum_except_batch`` at ``/root/reference/nfmc/.../hmc.py:7,103-110`` and
``get_batch_shape`` at ``ess.py:9,29`` / ``tess.py:12``."""
import torch


def sum_except_batch(x: torch.Tensor, event_shape) -> torch.Tensor:
    """Sum over the trailing ``len(event_shape)`` dims, keep batch dims."""
    n_event = len(tuple(event_shape))
    if n_event == 0:
        return x
    return x.sum(dim=tuple(range(x.dim() - n_event, x.dim())))


def get_batch_shape(x: torch.Tensor, event_shape) -> torch.Size:
    """Leading dims of ``x`` once the trailing event dims are stripped."""
    n_event = len(tuple(event_shape))
    return x.shape[: x.dim() - n_event]
