"""In-process A/B of lax.scan unroll factors on the fused jump_mala headline.

Tunnel latency drifts minute-to-minute (CLAUDE.md), so all variants are timed
interleaved in ONE process, several rounds, median-of-rounds per variant.
Run AFTER the CPU is quiet (single-core box: pytest contends with dispatch).

Usage: python scripts/exp_unroll_ab.py
"""
import json
import time

import jax
import jax.numpy as jnp

import nfmc_tpu
from nfmc_tpu.core.sampler import NFMCKernel
from nfmc_tpu.flows import Flow, RealNVP
from nfmc_tpu.samplers.mcmc.langevin import LangevinParameters
from nfmc_tpu.samplers.nfmc import JumpMALA

EVENT_DIM, N_CHAINS, INNER_N = 100, 100, 5
FLOW_LAYERS, HIDDEN = 4, 128
OUTER = 1365  # 1+4+16+64+256+1024: warms every chunk size, decent timed length
ROUNDS = 5

VARIANTS = [
    ("base", 1, 1),
    ("inner5", 5, 1),
    ("outer4", 1, 4),
    ("inner5_outer4", 5, 4),
]


def target(x):
    return 0.5 * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=-1)


def build(unroll_inner, unroll_outer):
    s = JumpMALA(
        (EVENT_DIM,), target,
        kernel=NFMCKernel(
            (EVENT_DIM,),
            flow=Flow(RealNVP((EVENT_DIM,), n_layers=FLOW_LAYERS, hidden_size=HIDDEN), seed=0),
        ),
        inner_params=LangevinParameters(n_iterations=INNER_N),
    )
    s.params.store_samples_on_device = True
    s.params.n_iterations = OUTER
    s.params.fused_unroll_inner = unroll_inner
    s.params.fused_unroll_outer = unroll_outer
    return s


def build_mala(unroll):
    from nfmc_tpu.samplers.mcmc import MALA
    from nfmc_tpu.samplers.mcmc.langevin import LangevinKernel

    s = MALA((EVENT_DIM,), target,
             kernel=LangevinKernel(event_size=EVENT_DIM, step_size=0.1),
             params=LangevinParameters(tuning=False))
    s.params.store_samples_on_device = True
    s.params.n_iterations = OUTER
    s.params.scan_unroll = unroll
    return s


MALA_VARIANTS = [("mala_u1", 1), ("mala_u4", 4), ("mala_u8", 8)]


def main():
    nfmc_tpu.set_seed(0)
    print("devices:", jax.devices(), flush=True)
    x0 = jax.random.normal(jax.random.key(1), (N_CHAINS, EVENT_DIM))
    # force materialization so timing is honest (CLAUDE.md)
    float(jnp.sum(x0))

    samplers = {}
    for name, ui, uo in VARIANTS:
        t0 = time.time()
        s = build(ui, uo)
        out = s.sample(x0, show_progress=False, seed=0)  # compile warmup
        jax.block_until_ready(out.running_samples.last_sample)
        samplers[name] = s
        print(f"warm {name}: {time.time()-t0:.1f}s (incl. compile)", flush=True)
    for name, u in MALA_VARIANTS:
        t0 = time.time()
        s = build_mala(u)
        out = s.sample(x0, show_progress=False, seed=0)
        jax.block_until_ready(out.running_samples.last_sample)
        samplers[name] = s
        print(f"warm {name}: {time.time()-t0:.1f}s (incl. compile)", flush=True)

    all_names = [n for n, *_ in VARIANTS] + [n for n, _ in MALA_VARIANTS]
    walls = {name: [] for name in all_names}
    for r in range(ROUNDS):
        for name in all_names:
            s = samplers[name]
            t0 = time.time()
            out = s.sample(x0, show_progress=False, seed=0)
            jax.block_until_ready(out.running_samples.last_sample)
            walls[name].append(time.time() - t0)
        print(f"round {r}: " + " ".join(f"{n}={walls[n][-1]:.3f}s" for n in walls), flush=True)

    result = {}
    for name in walls:
        base_name = "mala_u1" if name.startswith("mala") else "base"
        base = sorted(walls[base_name])[ROUNDS // 2]
        med = sorted(walls[name])[ROUNDS // 2]
        result[name] = {"median_s": round(med, 4), "speedup_vs_base": round(base / med, 3),
                        "spread": [round(min(walls[name]), 3), round(max(walls[name]), 3)]}
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
