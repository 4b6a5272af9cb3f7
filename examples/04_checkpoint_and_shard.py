"""Checkpoint/resume and multi-device chain sharding.

Sampler state is an explicit pytree (positions, tuned kernel, RNG key), so
checkpointing is first-class (the reference has none — SURVEY.md section 5).
Chains shard over a 1-D device mesh; GSPMD inserts the cross-chip reductions
for the statistics.

Run (8 virtual devices on CPU):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORM_NAME=cpu \
      python examples/04_checkpoint_and_shard.py
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import tempfile

import jax
import numpy as np

import nfmc_tpu
from nfmc_tpu.checkpoint import load_checkpoint, restore_sampler_state, sampler_state, save_checkpoint
from nfmc_tpu.parallel import chain_mesh, sharded_sample
from nfmc_tpu.samplers.mcmc import MALA
from nfmc_tpu.potentials import StandardGaussian

nfmc_tpu.set_seed(0)
target = StandardGaussian((20,))

# --- sharded sampling ------------------------------------------------------
mesh = chain_mesh()  # 1-D mesh over all local devices
sampler = MALA(event_shape=(20,), target=target)
sampler.params.n_iterations = 200
x0 = jax.random.normal(jax.random.key(0), (64, 20))  # 64 chains / n devices
out = sharded_sample(sampler, x0, mesh=mesh, show_progress=False)
print(f"devices: {mesh.devices.size}, acceptance: {out.statistics.acceptance_rate:.2f}")

# --- data-parallel flow training over the same mesh -------------------------
from nfmc_tpu.flows import Flow, RealNVP

flow = Flow(RealNVP((20,), n_layers=2, hidden_size=16), seed=0)
flow.fit(np.asarray(out.samples).reshape(-1, 20)[:4096], n_epochs=30, mesh=mesh)
print("mesh-trained flow log-prob (finite):",
      bool(np.isfinite(np.asarray(flow.log_prob(x0))).all()))

# --- checkpoint / resume ---------------------------------------------------
sampler.warmup(x0, show_progress=False)
state = sampler_state(sampler, x0, jax.random.key(5))
path = tempfile.mkdtemp() + "/ckpt"
save_checkpoint(path, state, metadata={"phase": "tuned"})

fresh = MALA(event_shape=(20,), target=target)
restored, meta = load_checkpoint(path, sampler_state(fresh, x0, jax.random.key(0)))
x, key = restore_sampler_state(fresh, restored)
print("restored:", meta, "| tuned step size:", round(fresh.kernel.step_size, 4))
out2 = fresh.sample(x, key=key, show_progress=False)
print("resumed sampling:", np.asarray(out2.samples).shape)
