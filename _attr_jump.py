"""Attribute jump_mala per-outer-iteration time: MALA-only vs +jump pieces."""
import time
import jax
import jax.numpy as jnp
import numpy as np
import nfmc_tpu
from nfmc_tpu.flows import Flow, RealNVP
from nfmc_tpu.samplers.mcmc.langevin import MALA, LangevinParameters
from nfmc_tpu.samplers.nfmc import JumpMALA
from nfmc_tpu.core.sampler import NFMCKernel

D, C, CHUNK, INNER = 100, 100, 1024, 5
# enter truth mode so timing is honest
_ = float(jnp.sum(jax.random.normal(jax.random.key(0), (8,))))

def target(x):
    return 0.5 * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=-1)

flow = Flow(RealNVP((D,), n_layers=4, hidden_size=128), seed=0)
s = JumpMALA((D,), target, kernel=NFMCKernel((D,), flow=flow),
             inner_params=LangevinParameters(n_iterations=INNER))
inner = s.inner_sampler
inner_step = inner._make_step(tuning=False)
x0 = jax.random.normal(jax.random.key(1), (C, D))
ks0 = inner._augment_state(inner.kernel.make_state(), x0)
params = flow.params

def inner_refresh(ks, x):
    return inner._augment_state(inner._extract_mstate(ks), x)

def variant(with_jump, with_logprob, with_proposals, with_refresh=True):
    def run(x, ks, key):
        keys = jax.random.split(key, CHUNK)
        if with_proposals:
            k_jumps = jax.vmap(lambda k: jax.random.split(k, 3)[1])(keys)
            k_props = jax.vmap(lambda k: jax.random.split(k)[0])(k_jumps)
            z = jax.vmap(lambda k: jax.random.normal(k, (C, D)))(k_props)
            zf = z.reshape(CHUNK * C, D)
            xpf, ldi = flow.bijection.inverse_fn(params, zf)
            fp = (-0.5 * jnp.sum(zf * zf, -1) - 0.5 * D * np.log(2 * np.pi) - ldi).reshape(CHUNK, C)
            up = target(xpf).reshape(CHUNK, C)
            aux = (xpf.reshape(CHUNK, C, D), fp, up)
        else:
            aux = (jnp.zeros((CHUNK, C, D)), jnp.zeros((CHUNK, C)), jnp.zeros((CHUNK, C)))

        def outer(carry, xs):
            key, (xp, fp, up) = xs
            x, ks = carry
            k_inner, k_jump, _ = jax.random.split(key, 3)

            def body(c, k):
                x, ks = c
                x2, ks2, _ = inner_step(x, ks, k)
                return (x2, ks2), None

            (x, ks), _ = jax.lax.scan(body, (x, ks), jax.random.split(k_inner, INNER))
            if with_jump:
                k_acc = jax.random.split(k_jump)[1]
                u_x = target(x)
                f_x = flow.log_prob_fn(params, x) if with_logprob else jnp.zeros(C)
                log_alpha = (-up) - (-u_x) + f_x - fp
                mask = jnp.log(jax.random.uniform(k_acc, (C,))) < log_alpha
                x = jnp.where(mask[:, None], xp, x)
                if with_refresh:
                    ks = inner_refresh(ks, x)
            return (x, ks), None

        (x, ks), _ = jax.lax.scan(outer, (x, ks), (keys, aux))
        return x

    return jax.jit(run)

variants = {
    "mala_only": variant(False, False, False),
    "mala+jump_nologq": variant(True, False, True),
    "mala+jump_full": variant(True, True, True),
    "mala+jump_norefresh": variant(True, True, True, with_refresh=False),
}
for name, f in variants.items():
    jax.block_until_ready(f(x0, ks0, jax.random.key(2)))
res = {k: [] for k in variants}
for rep in range(5):
    for name, f in variants.items():
        t0 = time.time()
        jax.block_until_ready(f(x0, ks0, jax.random.key(3 + rep)))
        res[name].append(time.time() - t0)
for name, ts in res.items():
    ts = sorted(ts)
    print(f"{name}: {ts[len(ts)//2]*1000:.1f} ms / {CHUNK} outer iters  ({ts[len(ts)//2]/CHUNK*1e6:.0f} us/iter)")
