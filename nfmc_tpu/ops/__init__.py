"""Pallas TPU kernels for the hot compute paths."""
from .coupling_pallas import (
    fused_realnvp_forward,
    fused_realnvp_inverse,
    pallas_available,
)

__all__ = ["fused_realnvp_forward", "fused_realnvp_inverse", "pallas_available"]
