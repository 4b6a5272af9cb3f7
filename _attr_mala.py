"""Is per-step RNG a meaningful slice of the 14us MALA step? A/B in-scan vs
chunk-hoisted noise/uniform draws, plus an op-count-reduction probe."""
import time
import jax
import jax.numpy as jnp
import numpy as np

D, C, STEPS = 100, 100, 5120  # = 1024 outer x 5 inner
_ = float(jnp.sum(jax.random.normal(jax.random.key(0), (8,))))

def target_vg(x):
    # U = 0.5|x|^2 -> grad = x (hand-fused, like the Gaussian bench target)
    return 0.5 * jnp.sum(x * x, -1), x

tau = jnp.float32(0.215)
x0 = jax.random.normal(jax.random.key(1), (C, D))

def mala_core(x, u_x, g_x, noise, log_u):
    xp = x - tau * g_x + jnp.sqrt(2.0 * tau) * noise
    u_xp, g_xp = target_vg(xp)
    def qpot(a, b, g):
        t = a - b + tau * g
        return jnp.sum(t * t, -1) / (4 * tau)
    lr = (-u_xp) - (-u_x) + (-qpot(x, xp, g_xp)) - (-qpot(xp, x, g_x))
    mask = (log_u < lr) & jnp.all(jnp.isfinite(xp), -1) & jnp.isfinite(u_xp)
    m = mask[:, None]
    return jnp.where(m, xp, x), jnp.where(mask, u_xp, u_x), jnp.where(m, g_xp, g_x)

@jax.jit
def run_inscan(x, key):
    u_x, g_x = target_vg(x)
    def body(c, k):
        x, u, g = c
        kn, ka = jax.random.split(k)
        noise = jax.random.normal(kn, x.shape)
        log_u = jnp.log(jax.random.uniform(ka, (x.shape[0],)))
        return mala_core(x, u, g, noise, log_u), None
    (x, u, g), _ = jax.lax.scan(body, (x, u_x, g_x), jax.random.split(key, STEPS))
    return x

@jax.jit
def run_hoisted(x, key):
    u_x, g_x = target_vg(x)
    keys = jax.random.split(key, STEPS)
    kn = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
    ka = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
    noise = jax.vmap(lambda k: jax.random.normal(k, (C, D)))(kn)
    log_u = jnp.log(jax.vmap(lambda k: jax.random.uniform(k, (C,)))(ka))
    def body(c, xs):
        x, u, g = c
        n, lu = xs
        return mala_core(x, u, g, n, lu), None
    (x, u, g), _ = jax.lax.scan(body, (x, u_x, g_x), (noise, log_u))
    return x

@jax.jit
def run_bulk_rng(x, key):
    # one giant draw instead of vmapped per-key draws (different stream; just
    # a cost probe for the RNG itself)
    u_x, g_x = target_vg(x)
    kn, ka = jax.random.split(key)
    noise = jax.random.normal(kn, (STEPS, C, D))
    log_u = jnp.log(jax.random.uniform(ka, (STEPS, C)))
    def body(c, xs):
        x, u, g = c
        n, lu = xs
        return mala_core(x, u, g, n, lu), None
    (x, u, g), _ = jax.lax.scan(body, (x, u_x, g_x), (noise, log_u))
    return x

variants = {"inscan": run_inscan, "hoisted_vmap": run_hoisted, "bulk_rng": run_bulk_rng}
for n, f in variants.items():
    jax.block_until_ready(f(x0, jax.random.key(2)))
res = {k: [] for k in variants}
for rep in range(5):
    for n, f in variants.items():
        t0 = time.time()
        jax.block_until_ready(f(x0, jax.random.key(3 + rep)))
        res[n].append(time.time() - t0)
for n, ts in res.items():
    ts = sorted(ts)
    print(f"{n}: {ts[len(ts)//2]*1000:.1f} ms / {STEPS} steps  ({ts[len(ts)//2]/STEPS*1e6:.1f} us/step)")
