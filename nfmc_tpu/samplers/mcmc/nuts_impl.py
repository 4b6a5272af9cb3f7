"""Iterative NUTS tree builder (multi-chain, jit/vmap-native).

Algorithm: multinomial NUTS (Betancourt 2017) with *iterative* tree doubling.
U-turn detection inside a subtree uses a checkpoint stack of the left
endpoints of all currently-open subtrees (O(max_tree_depth) memory): when leaf
``i`` (1-based) completes subtrees (``i`` even), the stack positions
``popcount(i)-1 .. popcount(i-1)-1`` hold exactly the left endpoints of every
subtree whose right endpoint is leaf ``i``. A subtree of size ``2^m`` is
checked with the original Hoffman–Gelman criterion
``dot(z+ - z-, M^{-1} r) < 0`` at either endpoint.

Everything is fixed-shape: the per-chain dynamic trajectory length lives in
``lax.while_loop`` predicates, and chains vectorize with ``vmap``.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...utils import event_size_of


class _SubtreeState(NamedTuple):
    i: jax.Array  # leaf counter within subtree (i32)
    sum_accept: jax.Array  # f32: sum over leaves of min(1, exp(-delta))
    z: jax.Array  # current endpoint position (d,)
    r: jax.Array  # current endpoint momentum (d,)
    g: jax.Array  # current endpoint gradient (d,)
    z_prop: jax.Array  # subtree multinomial proposal
    log_sum_w: jax.Array  # subtree log sum of weights
    turning: jax.Array  # bool
    diverged: jax.Array  # bool
    ckpt_z: jax.Array  # (max_depth+1, d) checkpoint stack
    ckpt_r: jax.Array
    n_leapfrog: jax.Array  # i32 total leapfrogs taken
    key: jax.Array


class _TrajState(NamedTuple):
    depth: jax.Array
    sum_accept: jax.Array
    z_left: jax.Array
    r_left: jax.Array
    g_left: jax.Array
    z_right: jax.Array
    r_right: jax.Array
    g_right: jax.Array
    z_prop: jax.Array
    log_sum_w: jax.Array
    turning: jax.Array
    diverged: jax.Array
    n_leapfrog: jax.Array
    key: jax.Array


def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def make_nuts_step(
    target: Callable,
    event_shape: Tuple[int, ...],
    max_tree_depth: int = 10,
    max_delta_energy: float = 1000.0,
):
    """Returns ``nuts_step(x, eps, inv_mass_diag, key) -> (x', moved, diverged_any)``
    operating on a batch ``x: (n_chains, *event_shape)``."""

    d = event_size_of(event_shape)

    def u_fn(z_flat):
        return target(z_flat.reshape(1, *event_shape))[0]

    u_grad = jax.value_and_grad(u_fn)

    def kinetic(r, imd):
        return 0.5 * jnp.sum(r * r * imd)

    def is_turning(z_minus, r_minus, z_plus, r_plus, imd):
        dz = z_plus - z_minus
        return (jnp.dot(dz, imd * r_minus) < 0.0) | (jnp.dot(dz, imd * r_plus) < 0.0)

    def leapfrog(z, r, g, eps, imd):
        r = r - 0.5 * eps * g
        z = z + eps * imd * r
        u, g = u_grad(z)
        r = r - 0.5 * eps * g
        return z, r, g, u

    def build_subtree(z, r, g, depth, direction, eps, imd, energy0, key, n_leapfrog):
        """Build a subtree of 2^depth leaves going in `direction` from (z, r, g)."""
        n_leaves = jnp.int32(1) << depth
        signed_eps = direction.astype(z.dtype) * eps

        init = _SubtreeState(
            i=jnp.int32(0),
            sum_accept=jnp.asarray(0.0, dtype=z.dtype),
            z=z, r=r, g=g,
            z_prop=z,
            log_sum_w=jnp.asarray(-jnp.inf, dtype=z.dtype),
            turning=jnp.asarray(False),
            diverged=jnp.asarray(False),
            ckpt_z=jnp.zeros((max_tree_depth + 1, d), dtype=z.dtype),
            ckpt_r=jnp.zeros((max_tree_depth + 1, d), dtype=z.dtype),
            n_leapfrog=n_leapfrog,
            key=key,
        )

        def cond(s: _SubtreeState):
            return (s.i < n_leaves) & (~s.turning) & (~s.diverged)

        def body(s: _SubtreeState):
            i = s.i + 1  # 1-based leaf index
            z, r, g, u = leapfrog(s.z, s.r, s.g, signed_eps, imd)
            energy = u + kinetic(r, imd)
            delta = energy - energy0
            diverged = s.diverged | (delta > max_delta_energy) | (~jnp.isfinite(delta))
            # Finiteness mask (repo convention): a NaN potential at a
            # divergent leaf must count as accept-prob 0, not poison
            # sum_accept -> accept_stat -> dual averaging for the rest of
            # warmup. (+inf delta already maps to exp(-inf)=0.)
            leaf_accept = jnp.where(
                jnp.isfinite(delta), jnp.minimum(1.0, jnp.exp(-delta)), 0.0
            )
            sum_accept = s.sum_accept + leaf_accept

            # progressive multinomial sampling within the subtree
            w = -delta
            log_sum_w_new = jnp.logaddexp(s.log_sum_w, w)
            key, k_acc = jax.random.split(s.key)
            p_leaf = jnp.exp(w - log_sum_w_new)
            take = jax.random.uniform(k_acc, ()) < p_leaf
            z_prop = jnp.where(take, z, s.z_prop)

            # checkpoint stack: push left endpoints on odd leaves, check
            # completed subtrees on even leaves
            pc_i = _popcount(i)
            pc_prev = _popcount(i - 1)
            is_odd = (i % 2) == 1
            write_idx = jnp.where(is_odd, pc_i - 1, 0)
            ckpt_z = jnp.where(
                is_odd, s.ckpt_z.at[write_idx].set(z), s.ckpt_z
            )
            ckpt_r = jnp.where(
                is_odd, s.ckpt_r.at[write_idx].set(r), s.ckpt_r
            )

            idx_min = pc_i - 1
            idx_max = pc_prev - 1

            def check(j, turning):
                active = (~is_odd) & (j >= idx_min) & (j <= idx_max)
                # Trajectory-ordered endpoints: walking backward
                # (direction=-1) the current leaf is the EARLIER point in
                # trajectory time and the checkpoint the later one. Backward
                # leapfrog with -eps yields true trajectory momenta (no
                # negation), so ordering the endpoints is the whole fix;
                # evaluating with walk-ordered endpoints inverts the
                # Hoffman-Gelman criterion's sign for backward subtrees and
                # terminates healthy expanding trajectories ~3x early.
                fwd = direction > 0
                z_lo = jnp.where(fwd, ckpt_z[j], z)
                r_lo = jnp.where(fwd, ckpt_r[j], r)
                z_hi = jnp.where(fwd, z, ckpt_z[j])
                r_hi = jnp.where(fwd, r, ckpt_r[j])
                t = is_turning(z_lo, r_lo, z_hi, r_hi, imd)
                return turning | (active & t)

            turning = jax.lax.fori_loop(0, max_tree_depth + 1, check, s.turning)

            return _SubtreeState(
                i=i, sum_accept=sum_accept, z=z, r=r, g=g,
                z_prop=z_prop, log_sum_w=log_sum_w_new,
                turning=turning, diverged=diverged,
                ckpt_z=ckpt_z, ckpt_r=ckpt_r,
                n_leapfrog=s.n_leapfrog + 1,
                key=key,
            )

        return jax.lax.while_loop(cond, body, init)

    def single_chain_step(z0, eps, imd, key):
        key, k_mom = jax.random.split(key)
        r0 = jax.random.normal(k_mom, (d,)) / jnp.sqrt(imd)
        u0, g0 = u_grad(z0)
        energy0 = u0 + kinetic(r0, imd)

        init = _TrajState(
            depth=jnp.int32(0),
            sum_accept=jnp.asarray(0.0, dtype=z0.dtype),
            z_left=z0, r_left=r0, g_left=g0,
            z_right=z0, r_right=r0, g_right=g0,
            z_prop=z0,
            log_sum_w=jnp.asarray(0.0, dtype=z0.dtype),  # initial leaf has w=0
            turning=jnp.asarray(False),
            diverged=jnp.asarray(False),
            n_leapfrog=jnp.int32(0),
            key=key,
        )

        def cond(t: _TrajState):
            return (t.depth < max_tree_depth) & (~t.turning) & (~t.diverged)

        def body(t: _TrajState):
            key, k_dir, k_merge, k_sub = jax.random.split(t.key, 4)
            go_right = jax.random.bernoulli(k_dir)
            direction = jnp.where(go_right, jnp.int32(1), jnp.int32(-1))

            z_e = jnp.where(go_right, t.z_right, t.z_left)
            r_e = jnp.where(go_right, t.r_right, t.r_left)
            g_e = jnp.where(go_right, t.g_right, t.g_left)

            sub = build_subtree(
                z_e, r_e, g_e, t.depth, direction, eps, imd, energy0, k_sub, t.n_leapfrog
            )
            ok = (~sub.turning) & (~sub.diverged)

            # biased progressive sampling across subtrees
            p_sub = jnp.minimum(1.0, jnp.exp(sub.log_sum_w - t.log_sum_w))
            take = ok & (jax.random.uniform(k_merge, ()) < p_sub)
            z_prop = jnp.where(take, sub.z_prop, t.z_prop)
            log_sum_w = jnp.where(ok, jnp.logaddexp(t.log_sum_w, sub.log_sum_w), t.log_sum_w)

            upd = lambda new, old, side: jnp.where(ok & (go_right == side), new, old)
            z_right = upd(sub.z, t.z_right, True)
            r_right = upd(sub.r, t.r_right, True)
            g_right = upd(sub.g, t.g_right, True)
            z_left = upd(sub.z, t.z_left, False)
            r_left = upd(sub.r, t.r_left, False)
            g_left = upd(sub.g, t.g_left, False)

            turning_global = is_turning(z_left, r_left, z_right, r_right, imd)
            turning = sub.turning | (ok & turning_global)

            return _TrajState(
                depth=t.depth + 1,
                sum_accept=t.sum_accept + sub.sum_accept,
                z_left=z_left, r_left=r_left, g_left=g_left,
                z_right=z_right, r_right=r_right, g_right=g_right,
                z_prop=z_prop, log_sum_w=log_sum_w,
                turning=turning, diverged=sub.diverged,
                n_leapfrog=sub.n_leapfrog,
                key=key,
            )

        final = jax.lax.while_loop(cond, body, init)
        moved = jnp.any(final.z_prop != z0)
        accept_stat = final.sum_accept / jnp.maximum(final.n_leapfrog.astype(z0.dtype), 1.0)
        return final.z_prop, moved, final.diverged, accept_stat, final.n_leapfrog

    def nuts_step(x, eps, inv_mass_diag, key):
        n_chains = x.shape[0]
        x_flat = x.reshape(n_chains, d)
        keys = jax.random.split(key, n_chains)
        z_new, moved, diverged, accept_stat, n_leapfrog = jax.vmap(
            lambda z, k: single_chain_step(z, eps, inv_mass_diag, k)
        )(x_flat, keys)
        diverged_any = jnp.any(diverged).astype(jnp.int32)
        # + n_chains: the per-chain seed evaluation u_grad(z0) in
        # single_chain_step is a real target call+gradient on top of the
        # leapfrogs (counter contract, SURVEY.md section 2.8)
        total_evals = jnp.sum(n_leapfrog).astype(jnp.int32) + jnp.int32(n_chains)
        return z_new.reshape(x.shape), moved, diverged_any, accept_stat, total_evals

    return nuts_step
