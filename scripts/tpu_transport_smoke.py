import sys; sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
import numpy as np, jax
from nfmc_tpu.potentials import DiagonalGaussian, StandardGaussian

PRIOR = StandardGaussian((3,))
TARGET = DiagonalGaussian(mu=np.full(3, 2.0), sigma=np.full(3, 0.5))
FLOW = 'realnvp%{"n_layers": 2, "hidden_size": 16}'
TRUE = 3 * np.log(0.5)

_n_fail = 0

def check(name, fn):
    global _n_fail
    try:
        fn()
        print(f"OK   {name}", flush=True)
    except Exception as e:
        _n_fail += 1
        print(f"FAIL {name}: {repr(e)[:200]}", flush=True)

from nfmc_tpu.transport import aft, craft, snf, ns, pmc
from nfmc_tpu.transport.ais import ais_base
from nfmc_tpu.flow_training import fab

def _ais():
    x0 = np.asarray(PRIOR.sample((256,), key=jax.random.key(0)))
    x, lw = ais_base(x0, PRIOR, TARGET, n_steps=24, n_mcmc_steps=3, step_size=0.05, seed=0)
    est = float(jax.scipy.special.logsumexp(lw) - np.log(256))
    assert abs(est - TRUE) < 1.5, est
check("ais", _ais)
check("aft", lambda: aft(PRIOR, TARGET, FLOW, n_particles=64, n_iterations=5, seed=0, n_train_epochs=5))
check("craft", lambda: craft(PRIOR, TARGET, FLOW, n_particles=64, n_iterations=5, n_annealing_steps=4, seed=0))
check("snf", lambda: snf(PRIOR, TARGET, n_particles=64, n_epochs=2, seed=0))
check("ns", lambda: ns(PRIOR, TARGET, FLOW, n_particles=25, n_iterations=60, seed=0))
def _pmc():
    out = pmc(PRIOR, TARGET, FLOW, n_particles=256, seed=0, n_train_epochs=10, n_mcmc_steps=5)
    assert abs(out["log_Z"] - TRUE) < 1.0, out["log_Z"]
check("pmc", _pmc)
check("fab", lambda: fab(TARGET, FLOW, n_iterations=8, n_flow_training_steps=10, n_ais_particles=64, seed=0))
print("done", "failures:", _n_fail, flush=True)
sys.exit(1 if _n_fail else 0)  # CI-visible failure status
