import sys; sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from nfmc_tpu.api.registry import create_flow_object, get_supported_normalizing_flows

ok, fail = [], []
x = jax.random.normal(jax.random.key(0), (4, 12))
ximg = jax.random.normal(jax.random.key(0), (4, 4, 4))  # for conv/multiscale
for name in get_supported_normalizing_flows(synonyms=False):
    try:
        ev = (4, 4) if (name.startswith(("conv-", "ms-", "glow-"))) else (12,)
        flow = create_flow_object(name, ev)
        v = ximg if ev == (4, 4) else x
        z, ld = flow.bijection.forward(v)
        v2, ld2 = flow.bijection.inverse(z)
        err = float(jnp.max(jnp.abs(v2 - v)))
        ldsum = float(jnp.max(jnp.abs(ld + ld2)))
        assert np.isfinite(err) and err < 1e-2, f"inv err {err}"
        assert ldsum < 1e-2, f"logdet asym {ldsum}"
        s = flow.sample(8, seed=1)
        lp = flow.log_prob(v)
        assert np.isfinite(np.asarray(s)).all() and np.isfinite(np.asarray(lp)).all()
        ok.append(name); print(f"OK   {name} (inv err {err:.1e})", flush=True)
    except Exception as e:
        fail.append((name, repr(e)[:160])); print(f"FAIL {name}: {repr(e)[:160]}", flush=True)
print("ok:", len(ok), "fail:", len(fail))
import sys
sys.exit(1 if fail else 0)  # CI-visible failure status
