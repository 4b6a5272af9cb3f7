"""Profiler integration (SURVEY.md section 5 superset): traces are written and
annotations nest without disturbing the run."""
import os

import jax
import numpy as np

import nfmc_tpu

from tests.util import standard_gaussian_potential


def test_trace_writes_profile(tmp_path):
    from nfmc_tpu.samplers.mcmc import MALA

    s = MALA((4,), standard_gaussian_potential)
    s.params.n_iterations = 5
    x0 = jax.random.normal(jax.random.key(0), (8, 4))

    with nfmc_tpu.profiling.trace(tmp_path / "run") as p:
        with nfmc_tpu.profiling.annotate("mala-smoke"):
            out = s.sample(x0, show_progress=False, seed=1)
    assert np.isfinite(np.asarray(out.samples)).all()
    dumped = [
        os.path.join(root, f)
        for root, _, files in os.walk(p)
        for f in files
    ]
    assert dumped, "profiler trace produced no files"
