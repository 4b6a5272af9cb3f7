import sys; sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
import numpy as np, jax
import nfmc_tpu
from nfmc_tpu.api.registry import get_supported_samplers

def U(x): return 0.5 * (x.reshape(x.shape[0], -1)**2).sum(-1)
ok, fail = [], []
for strat in get_supported_samplers():
    try:
        if strat == "adaptive_imh":
            # create_sampler ignores param_kwargs/n_iterations for adaptive_imh
            # (reference quirk, ``sample.py:127-130``) — construct directly so
            # the smoke stays small.
            from nfmc_tpu.samplers.nfmc import AdaptiveIMH

            s = AdaptiveIMH(event_shape=(5,), target=U)
            s.params.n_iterations = 3
            import jax as _jax
            out = s.sample(_jax.random.normal(_jax.random.key(0), (4, 5)),
                           show_progress=False, seed=0)
            assert np.isfinite(np.asarray(out.samples)).all()
            ok.append(strat)
            print(f"OK   {strat} {np.asarray(out.samples).shape}", flush=True)
            continue
        kw = dict(strategy=strat, event_shape=(5,), n_chains=4, n_iterations=3,
                  n_warmup_iterations=3, warmup=True, show_progress=False, seed=0,
                  flow_kwargs={"n_layers": 2, "hidden_size": 16})
        if strat in ("ess", "tess", "dlmc", "jump_ess"):
            kw["negative_log_likelihood"] = U
        if strat.startswith("jump"):
            kw["inner_param_kwargs"] = {"n_iterations": 2}
        if strat in ("neutra_mh", "neutra_hmc"):
            kw["param_kwargs"] = {"warmup_fit_kwargs": {"n_epochs": 20, "lr": 0.005, "n_samples": 32}}
        if strat in ("imh", "fixed_imh", "adaptive_imh"):
            kw["param_kwargs"] = {"warmup_fit_kwargs": {"n_epochs": 20, "lr": 0.005, "n_samples": 32}}
        out = nfmc_tpu.sample(U, **kw)
        s = out.samples
        assert s is not None and np.isfinite(np.asarray(s)).all(), "non-finite"
        ok.append(strat)
        print(f"OK   {strat} {np.asarray(s).shape}", flush=True)
    except Exception as e:
        fail.append((strat, repr(e)[:200]))
        print(f"FAIL {strat}: {repr(e)[:200]}", flush=True)
print("ok:", len(ok), "fail:", len(fail))
import sys
sys.exit(1 if fail else 0)  # CI-visible failure status
