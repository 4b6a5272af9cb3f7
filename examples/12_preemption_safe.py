"""Preemption-safe sampling: checkpointed segments + bit-exact resume.

Long production runs die — preemptions, OOMs elsewhere on the host, flaky
links. `sample(checkpoint_path=...)` makes the sampling phase resumable: the
iteration budget runs as segments, each segment checkpoints the full
resumable state (chain positions, tuned kernel + flow params, RNG, combined
statistics, stored draws), and re-invoking the SAME call after a crash skips
warmup and continues bit-exact from the last completed segment. On success
the checkpoint files are deleted.

Run me twice with KILL=1 the first time to see it in action:

    KILL=1 python examples/12_preemption_safe.py   # dies mid-run
    python examples/12_preemption_safe.py          # resumes and finishes
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import os

import numpy as np

import nfmc_tpu
from nfmc_tpu.potentials import DiagonalGaussian

CKPT = "/tmp/nfmc_tpu_example_ckpt"

target = DiagonalGaussian(mu=np.zeros(10), sigma=np.linspace(0.5, 2.0, 10))

if os.environ.get("KILL") == "1":
    # Simulate a preemption: kill the process after the second segment by
    # crashing inside the sampler (a real preemption needs no cooperation —
    # the per-segment checkpoint on disk is all that matters).
    from nfmc_tpu.samplers.nfmc.jump import JumpMALA

    orig, calls = JumpMALA.sample, {"n": 0}

    def crashing(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            print("... simulated preemption after 2 of 5 segments ...")
            os._exit(1)
        return orig(self, *a, **k)

    JumpMALA.sample = crashing

resuming = os.path.exists(CKPT + ".npz")
print("resuming from checkpoint" if resuming else "starting fresh")

out = nfmc_tpu.sample(
    target,
    strategy="jump_mala",
    n_chains=64,
    n_iterations=250,
    n_warmup_iterations=100,
    inner_param_kwargs={"n_iterations": 5},
    warmup=True,
    show_progress=False,
    seed=0,
    checkpoint_path=CKPT,
    checkpoint_segment_iterations=50,
)

print(out.summary())
print("draws:", np.asarray(out.samples).shape)
print("checkpoint cleaned up:", not os.path.exists(CKPT + ".npz"))
