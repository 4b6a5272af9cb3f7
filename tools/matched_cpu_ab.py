"""Matched-hardware steady-state A/B: reference vs nfmc-tpu on the SAME CPU.

The ``reference_ab`` bench section runs the reference (eager torch, host CPU)
against nfmc-tpu on the tunneled TPU, where at reference-native scale
(32 chains, 5-d) every figure is dominated by tunnel sync latency rather
than compute. This script removes the hardware asymmetry: it runs BOTH
sides on the host CPU — the reference's own ``sample()`` (through the
``tools/reference_shim`` dependency shim) and nfmc-tpu's steady path
(memoized compiled driver, ``tools/run_reference.run_ours_steady``) — and
prints ONE JSON line for ``bench.py`` to record.

Must run as a SUBPROCESS of the bench: JAX's platform choice is
process-global, and the parent bench process owns the TPU. Note the axon
caveat (CLAUDE.md): the ``JAX_PLATFORM_NAME`` env var alone is not reliably
honored — ``jax.config.update("jax_platforms", "cpu")`` after import is
required, as done below; the device actually used is recorded in the output.
"""
import json
import os
import sys


def main():
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nfmc_tpu_jax_cache_cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import numpy as np

    here = os.path.dirname(os.path.abspath(__file__))
    for p in (here, os.path.dirname(here)):
        if p not in sys.path:
            sys.path.insert(0, p)
    from run_reference import (reference_available, run_reference,
                               run_ours_steady)

    from nfmc_tpu.validation import per_dim_ess

    device = str(jax.devices()[0])
    if "cpu" not in device.lower():
        print(json.dumps({"error": f"CPU platform not engaged: {device}"}))
        return 1
    if not reference_available():
        print(json.dumps({"error": "/root/reference not present"}))
        return 1

    sigma = np.linspace(1.0, 3.0, 5)
    results = {"device": device}
    for strat, kw in [
        ("mala", {}),
        ("hmc", {}),
        ("imh", {}),
        ("jump_mala", {"inner_iterations": 5}),
    ]:
        ref = run_reference(strat, sigma, n_chains=32, n_iterations=1000,
                            seed=0, x0_from_target=True, **kw)
        ours = run_ours_steady(strat, sigma, n_chains=32, n_iterations=1000,
                               seed=2, **kw)
        ref_rate = float(np.mean(per_dim_ess(ref["draws"]))) / ref["wall_s"]
        ours_rate = float(np.mean(per_dim_ess(ours["draws"]))) / ours["wall_s"]
        results[strat] = {
            "ref_ess_per_s": round(ref_rate, 1),
            "ours_steady_ess_per_s": round(ours_rate, 1),
            "steady_vs_reference": round(ours_rate / max(ref_rate, 1e-9), 1),
        }
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
