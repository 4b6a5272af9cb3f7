"""Continuous normalizing flows: FFJORD, RNODE, OT-Flow, DDB.

Reference registry names at ``nfmc/util.py:229-278``. The map is the flow of
``dx/dt = f_theta(x, t)`` with ``d logdet/dt = -tr(df/dx)``, integrated by a
fixed-step RK4 (or Euler for DDB) so the whole transform jits to a bounded
unrolled graph (no adaptive stepping — XLA-friendly, deterministic).

Trace of the Jacobian: exact (vmapped ``jacfwd`` trace) for event sizes up to
``exact_trace_dim``; deterministic Hutchinson probes beyond. The inverse
integrates the dynamics backward — exact for the continuous flow, O(h^5)
consistent for the discretization (standard CNF practice).

OT-Flow uses potential-based dynamics ``f = -grad Phi`` (Onken et al. 2021),
whose trace is the negative Laplacian of ``Phi``. RNODE is FFJORD trained
with kinetic-energy regularization (the regularizer is exposed via
``regularization(params, x)`` for training loops; the map itself is FFJORD).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .base import Bijection, hutchinson_probes
from .conditioners import mlp_apply, mlp_init


class ContinuousFlow(Bijection):
    method = "rk4"

    def __init__(self, event_shape: Sequence[int], hidden_size: int = 64,
                 n_hidden_layers: int = 2, n_steps: int = 12,
                 exact_trace_dim: int = 32, n_probes: int = 4, **_):
        super().__init__(event_shape)
        self.hidden = [int(hidden_size)] * int(n_hidden_layers)
        self.n_steps = int(n_steps)
        self.exact_trace_dim = int(exact_trace_dim)
        self.n_probes = int(n_probes)

    @property
    def layers(self):
        return list(range(self.n_steps))

    def init(self, key):
        return mlp_init(key, self.event_size + 1, self.hidden, self.event_size)

    def _f_single(self, params, v, t):
        """Dynamics for one flattened state (d,) at time t (scalar)."""
        inp = jnp.concatenate([v, jnp.asarray(t, dtype=v.dtype)[None]])
        return mlp_apply(params, inp)

    def _f_and_trace_single(self, params, v, t):
        f1 = lambda u: self._f_single(params, u, t)
        d = v.shape[0]
        if d <= self.exact_trace_dim:
            J = jax.jacfwd(f1)(v)
            return f1(v), jnp.trace(J)
        probes = hutchinson_probes(v, self.n_probes, base_key=self.probe_key)
        y, pullbacks = jax.vjp(f1, v)

        def probe(e):
            return jnp.dot(e, pullbacks(e)[0])

        return y, jnp.mean(jax.vmap(probe)(probes))

    def _step_map_single(self, params, v, t, h):
        """One forward integrator step for a single state (d,)."""
        f = lambda u, tt: self._f_single(params, u, tt)
        if self.method == "euler":
            return v + h * f(v, t)
        f1 = f(v, t)
        f2 = f(v + 0.5 * h * f1, t + 0.5 * h)
        f3 = f(v + 0.5 * h * f2, t + 0.5 * h)
        f4 = f(v + h * f3, t + h)
        return v + h / 6.0 * (f1 + 2 * f2 + 2 * f3 + f4)

    def _exact(self) -> bool:
        return self.event_size <= self.exact_trace_dim

    def _integrate(self, params, x, reverse: bool):
        """Small events (the common NFMC regime): the bijection is the
        *discrete* integrator map — forward applies the steps, the log-det is
        the exact per-step Jacobian ``slogdet``, and the inverse solves each
        step by Picard fixed point, so forward/inverse/log-det are mutually
        consistent to solver tolerance. Above ``exact_trace_dim`` this falls
        back to classic CNF practice: integrate the instantaneous trace and
        run the dynamics backward (O(h^p) consistency)."""
        batch_shape = x.shape[: x.ndim - len(self.event_shape)]
        # collapse ALL batch dims: the vmapped per-sample dynamics below
        # assume one batch axis (Bijection contract allows any batch shape)
        v = x.reshape(-1, self.event_size)
        h = 1.0 / self.n_steps
        d = self.event_size

        if self._exact():
            def fwd_step(vi, t):
                return self._step_map_single(params, vi, t, h)

            def step(carry, i):
                v, ld = carry
                if not reverse:
                    t = i * h
                    J = jax.vmap(jax.jacfwd(fwd_step, argnums=0), in_axes=(0, None))(v, t)
                    ld = ld + jnp.linalg.slogdet(J)[1]
                    v = jax.vmap(fwd_step, in_axes=(0, None))(v, t)
                else:
                    # invert step at t = (n_steps - 1 - i) * h via Picard:
                    # x <- x + (y - step(x)); step ~= identity + O(h)
                    t = (self.n_steps - 1.0 - i) * h
                    y = v

                    def picard(_, u):
                        return u + (y - jax.vmap(fwd_step, in_axes=(0, None))(u, t))

                    u = jax.lax.fori_loop(0, 20, picard, y)
                    # Picard contracts only while h*Lip(f) < 1; stiff trained
                    # dynamics can leave the loop non-converged, which would
                    # otherwise return a confidently wrong inverse + log-det.
                    # Mask non-converged rows to NaN so sampler finiteness
                    # guards count them as divergences (CLAUDE.md convention:
                    # masks inside jit, never exceptions).
                    resid = jnp.linalg.norm(
                        y - jax.vmap(fwd_step, in_axes=(0, None))(u, t), axis=-1
                    )
                    ok = resid <= 1e-3 * (1.0 + jnp.linalg.norm(y, axis=-1))
                    u = jnp.where(ok[:, None], u, jnp.nan)
                    J = jax.vmap(jax.jacfwd(fwd_step, argnums=0), in_axes=(0, None))(u, t)
                    ld = ld - jnp.linalg.slogdet(J)[1]
                    v = u
                return (v, ld), None

            ld0 = jnp.zeros(v.shape[0])
            (v, ld), _ = jax.lax.scan(
                step, (v, ld0), jnp.arange(self.n_steps, dtype=jnp.float32)
            )
            return v.reshape(x.shape), ld.reshape(batch_shape)

        # large-d fallback: instantaneous-trace integration
        sign = -1.0 if reverse else 1.0
        aug_b = jax.vmap(
            lambda vi, t: self._f_and_trace_single(params, vi, t), in_axes=(0, None)
        )

        def step(carry, i):
            v, ld = carry
            t = (1.0 - i * h) if reverse else (i * h)
            # d/dt log|det dz_t/dx| = +tr(df/dx): forward (sign=+1) accumulates
            # +int tr dt; the backward traversal (sign=-1) accumulates
            # log|det dx/dz| = -int tr dt. (A sign flip here once negated every
            # large-d CNF density; the exact-slogdet path below
            # ``exact_trace_dim`` is the ground truth it must match.)
            if self.method == "euler":
                f, tr = aug_b(v, t)
                v = v + sign * h * f
                ld = ld + sign * h * tr
            else:
                f1, tr1 = aug_b(v, t)
                f2, tr2 = aug_b(v + sign * 0.5 * h * f1, t + sign * 0.5 * h)
                f3, tr3 = aug_b(v + sign * 0.5 * h * f2, t + sign * 0.5 * h)
                f4, tr4 = aug_b(v + sign * h * f3, t + sign * h)
                v = v + sign * h / 6.0 * (f1 + 2 * f2 + 2 * f3 + f4)
                ld = ld + sign * h / 6.0 * (tr1 + 2 * tr2 + 2 * tr3 + tr4)
            return (v, ld), None

        ld0 = jnp.zeros(v.shape[0])
        (v, ld), _ = jax.lax.scan(step, (v, ld0), jnp.arange(self.n_steps, dtype=jnp.float32))
        return v.reshape(x.shape), ld.reshape(batch_shape)

    def forward_fn(self, params, x):
        return self._integrate(params, x, reverse=False)

    def inverse_fn(self, params, z):
        return self._integrate(params, z, reverse=True)

    def regularization(self, params, x) -> jax.Array:
        """Per-sample kinetic-energy regularizer E_t[|f|^2] (RNODE; Finlay et
        al. 2020); shape ``(batch,)`` so training can weight padded rows."""
        batch_shape = x.shape[: x.ndim - len(self.event_shape)]
        v = x.reshape(-1, self.event_size)  # any batch shape -> one axis
        ts = jnp.linspace(0.0, 1.0, 4)
        f = jax.vmap(
            lambda t: jax.vmap(self._f_single, in_axes=(None, 0, None))(params, v, t)
        )(ts)
        return jnp.mean(jnp.sum(f * f, axis=-1), axis=0).reshape(batch_shape)


class FFJORD(ContinuousFlow):
    """Grathwohl et al. 2019."""


class RNODE(ContinuousFlow):
    """FFJORD + kinetic regularization during training (Finlay et al. 2020).

    ``regularization_weight`` activates the kinetic-energy term
    (:meth:`ContinuousFlow.regularization`) inside ``fit``/``variational_fit``
    losses — this is what makes RNODE train differently from FFJORD
    (reference registry names ``rnode`` vs ``ffjord``,
    ``nfmc/util.py:68-71``)."""

    regularization_weight = 0.01


class DeepDiffeomorphicBijection(ContinuousFlow):
    """Euler-discretized NODE bijection (DDB); more, cheaper steps."""

    method = "euler"

    def __init__(self, event_shape, n_steps: int = 20, **kwargs):
        super().__init__(event_shape, n_steps=n_steps, **kwargs)


class OTFlow(ContinuousFlow):
    """Potential-driven dynamics f = -grad Phi(x, t); trace = -laplacian(Phi)."""

    def init(self, key):
        return mlp_init(key, self.event_size + 1, self.hidden, 1)

    def _phi(self, params, v, t):
        inp = jnp.concatenate([v, jnp.asarray(t, dtype=v.dtype)[None]])
        return mlp_apply(params, inp)[0]

    def _f_single(self, params, v, t):
        return -jax.grad(lambda u: self._phi(params, u, t))(v)

    def _f_and_trace_single(self, params, v, t):
        grad_phi = jax.grad(lambda u: self._phi(params, u, t))
        d = v.shape[0]
        if d <= self.exact_trace_dim:
            H = jax.jacfwd(grad_phi)(v)
            return -grad_phi(v), -jnp.trace(H)
        probes = hutchinson_probes(v, self.n_probes, base_key=self.probe_key)

        def probe(e):
            _, hvp = jax.jvp(grad_phi, (v,), (e,))
            return jnp.dot(e, hvp)

        return -grad_phi(v), -jnp.mean(jax.vmap(probe)(probes))
