"""Target potentials.

The reference consumes an external ``potentials`` package providing a
``Potential`` base class (callable ``U: (B,*event)->(B,)`` with
``.event_shape`` and ``.sample(batch_shape)``; used at reference
``nfmc/sample.py:17,65-66,285-286`` and ``test/test_moment_estimation.py:10,16``).
This module is the TPU-native equivalent: potentials are pure JAX callables so
``jax.grad``/``vmap`` differentiate them on-device — no host round trips.
"""
from .base import Potential, CallablePotential, as_potential
from .synthetic import (
    StandardGaussian,
    DiagonalGaussian,
    DiagonalGaussian1,
    FullRankGaussian,
    Funnel,
    Rosenbrock,
    GaussianMixture,
    DoubleWell,
)
from .applied import (
    BayesianLogisticRegression,
    EightSchools,
    Phi4Lattice,
    StudentT,
)

__all__ = [
    "Potential",
    "CallablePotential",
    "as_potential",
    "StandardGaussian",
    "DiagonalGaussian",
    "DiagonalGaussian1",
    "FullRankGaussian",
    "Funnel",
    "Rosenbrock",
    "GaussianMixture",
    "DoubleWell",
    "BayesianLogisticRegression",
    "EightSchools",
    "Phi4Lattice",
    "StudentT",
]
