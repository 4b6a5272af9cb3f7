"""FAB: Flow Annealed importance sampling Bootstrap (Midgley et al. 2023),
corrected.

The reference version cannot run (imports the nonexistent ``nfmc.mcmc.ais``,
``flow_annealed_bootstrap.py:4``; its wrapper also calls ``create_flow_object``
without an event shape). Working scheme:

per iteration: (1) draw from the flow and run AIS from ``q`` toward the
alpha=2 optimal target ``p^2 / q`` (potential ``2 U(x) + log q(x)``), (2) push
particles + weights into a prioritized replay buffer, (3) take gradient steps
on ``-E_w[ log q(x) ]`` over buffer draws with importance correction
``w_corr = q_old(x) / q_new(x)``, updating the buffered weights/densities.

TPU-native execution: the replay buffer lives ON DEVICE and the whole run
(AIS round + ring-buffer write + ``n_flow_training_steps`` prioritized
replay-training steps per iteration) compiles into a single ``lax.scan`` —
one device dispatch per silent run (chunked only to drive a progress bar)
instead of ~20 host<->device round trips per iteration (through the axon
tunnel each sync costs a ~25-30 ms round trip, which made the host-loop
formulation ~13x slower end-to-end). The buffer state persists on the
object across ``run()`` calls, matching the reference's object-held ring
buffer. Prioritized
replay draws use ``jax.random.categorical`` over the buffered log-weights
(the reference's ``np.random.choice(p=softmax(log_w))`` with replacement,
``flow_annealed_bootstrap.py:9-26``); weight/density updates use
``.at[idx].set`` with values that are identical across duplicate indices, so
duplicate draws behave like numpy's buffered fancy assignment.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..core.rng import resolve_key
from ..transport.ais import anneal_chain
from ..transport.common import make_mala_sweep, tempered


class FAB:
    def __init__(self, target_potential, flow, buffer_size: int = 10_000,
                 n_ais_steps: int = 8, ais_step_size: float = 0.05, lr: float = 3e-3,
                 n_mcmc_steps: int = 3):
        self.target_potential = target_potential
        self.flow = flow
        self.event_shape = flow.event_shape
        self.buffer_size = int(buffer_size)
        self.opt = optax.adamw(lr)
        self.n_ais_steps = n_ais_steps
        self.ais_step_size = ais_step_size
        self.n_mcmc_steps = int(n_mcmc_steps)
        # memoized compiled runs, keyed on the static loop sizes they bake in
        self._fused_cache = {}

    def _make_ais_round(self):
        flow = self.flow
        target = self.target_potential

        def ais_round(params, key, n_particles):
            k_draw, k_ais = jax.random.split(key)
            # the pre-AIS log q is NOT used: the buffer stores the flow
            # density of the post-AIS particles (computed on return)
            x = flow.sample_fn(params, k_draw, n_particles)
            # AIS from q toward p^2/q (alpha=2 optimal proposal); the shared
            # annealing loop from transport/ais.py with params-dependent ends
            prior_pot = lambda v: -flow.log_prob_fn(params, v)
            target_pot = lambda v: 2.0 * target(v) + flow.log_prob_fn(params, v)
            u = tempered(prior_pot, target_pot)
            sweep = make_mala_sweep(u, n_steps=self.n_mcmc_steps, step_size=self.ais_step_size)
            x, log_w = anneal_chain(u, sweep, self.n_ais_steps)(x, k_ais)
            return x, log_w, flow.log_prob_fn(params, x)

        return ais_round

    def _make_train_step(self):
        flow = self.flow

        def train_step(params, opt_state, x, log_q_old, enabled):
            """``enabled=False`` vetoes the update outright (used when the
            replay buffer holds no finite-weight row to draw from)."""
            from ..flows.train import _finite_update

            def loss_fn(p):
                log_q_new = flow.log_prob_fn(p, x)
                w_corr = jnp.exp(
                    jnp.clip(log_q_old - jax.lax.stop_gradient(log_q_new), -10.0, 10.0)
                )
                return -jnp.mean(w_corr * log_q_new), log_q_new

            (loss, log_q_new), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # skip non-finite updates (params AND opt state): inside the
            # fused scan a single bad replay batch must not poison every
            # remaining compiled iteration (the host-loop formulation this
            # replaced failed loudly via np.random.choice on NaN weights)
            finite = _finite_update(loss, grads) & enabled
            updates, os_new = self.opt.update(grads, opt_state, params)
            p_new = optax.apply_updates(params, updates)
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), p_new, params
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), os_new, opt_state
            )
            return params, opt_state, loss, log_q_new

        return train_step

    def _make_fused_run(self, n_iterations: int, n_flow_training_steps: int,
                        n_ais_particles: int, n_training_particles: int):
        """``n_iterations`` bootstrap iterations as one compiled scan over a
        carried (params, opt_state, replay buffer) state."""
        size = self.buffer_size
        if n_ais_particles > size:
            # the ring write pos = (index + arange(n)) % size would wrap and
            # silently overwrite rows within one round (== size is a legal
            # full-buffer write); a stripped assert under python -O must not
            # let that through
            raise ValueError(
                f"n_ais_particles ({n_ais_particles}) exceeds buffer_size "
                f"({size}); one AIS round would overwrite its own rows"
            )
        ais_round = self._make_ais_round()
        train_step = self._make_train_step()

        def iteration(carry, key):
            params, opt_state, buf_x, buf_lw, buf_lq, index, filled = carry
            k_ais, k_train = jax.random.split(key)
            x, log_w, log_q = ais_round(params, k_ais, n_ais_particles)

            # sanitize BEFORE the buffer write: a divergent AIS round (NaN
            # weight/position/density) would otherwise poison the categorical
            # logits — jax.random.categorical over NaN logits returns garbage
            # indices without error. Bad rows get weight -inf (never drawn)
            # and zeroed positions/densities.
            row_ok = (
                jnp.all(jnp.isfinite(x.reshape(n_ais_particles, -1)), axis=-1)
                & jnp.isfinite(log_w) & jnp.isfinite(log_q)
            )
            x = jnp.where(
                row_ok.reshape((-1,) + (1,) * len(self.event_shape)), x, 0.0
            )
            log_w = jnp.where(row_ok, log_w, -jnp.inf)
            log_q = jnp.where(row_ok, log_q, 0.0)

            # ring-buffer write (leading-axis scatter — fine on TPU; the
            # pathological axis is the last/lane axis, see flows/spline.py)
            pos = (index + jnp.arange(n_ais_particles)) % size
            buf_x = buf_x.at[pos].set(x)
            buf_lw = buf_lw.at[pos].set(log_w)
            buf_lq = buf_lq.at[pos].set(log_q)
            index = (index + n_ais_particles) % size
            filled = jnp.minimum(size, filled + n_ais_particles)
            valid = jnp.arange(size) < filled

            def t_body(tc, k):
                params, opt_state, buf_lw, buf_lq = tc
                logits = jnp.where(valid, buf_lw, -jnp.inf)
                # no finite-weight row to draw from (e.g. a fully divergent
                # first AIS round): jax.random.categorical over all--inf
                # logits silently degenerates to index 0 — the zeroed
                # placeholder row — and training would drag the flow toward
                # a point mass at the origin. Veto the whole step instead.
                any_valid = jnp.any(logits > -jnp.inf)
                idx = jax.random.categorical(k, logits,
                                             shape=(n_training_particles,))
                lq_old = buf_lq[idx]
                params, opt_state, loss, lq_new = train_step(
                    params, opt_state, buf_x[idx], lq_old, any_valid
                )
                # importance-correct buffered weights/densities; duplicate
                # idx write identical values, so .set matches numpy fancy
                # assignment semantics. Rows whose density under the NEW
                # params is non-finite (flow lost that region) get weight
                # -inf — never drawn again; writing the raw +inf/NaN weight
                # would permanently poison the categorical logits.
                upd_ok = any_valid & jnp.isfinite(lq_new)
                new_lw = jnp.where(upd_ok, buf_lw[idx] + lq_old - lq_new,
                                   jnp.where(any_valid, -jnp.inf, buf_lw[idx]))
                new_lq = jnp.where(upd_ok, lq_new,
                                   jnp.where(any_valid, 0.0, buf_lq[idx]))
                buf_lw = buf_lw.at[idx].set(new_lw)
                buf_lq = buf_lq.at[idx].set(new_lq)
                loss = jnp.where(any_valid, loss, jnp.nan)  # mark skipped
                return (params, opt_state, buf_lw, buf_lq), loss

            tkeys = jax.random.split(k_train, n_flow_training_steps)
            (params, opt_state, buf_lw, buf_lq), losses = jax.lax.scan(
                t_body, (params, opt_state, buf_lw, buf_lq), tkeys
            )
            carry = (params, opt_state, buf_x, buf_lw, buf_lq, index, filled)
            # nanmean: skipped (vetoed) steps are NaN-marked above and drop
            # out of the iteration's reported loss; all-skipped iterations
            # report NaN honestly. Empty scan (n_flow_training_steps=0, a
            # pure buffer-fill run) reports 0 — np-semantics mean would NaN.
            loss_rep = (jnp.nanmean(losses) if n_flow_training_steps > 0
                        else jnp.float32(0.0))
            return carry, loss_rep

        def run(params, opt_state, buf_state, key):
            keys = jax.random.split(key, n_iterations)
            init = (params, opt_state, *buf_state)
            (params, opt_state, *buf_state), loss_trace = jax.lax.scan(
                iteration, init, keys
            )
            return params, opt_state, tuple(buf_state), loss_trace

        return jax.jit(run)

    def _init_buffer(self):
        size = self.buffer_size
        return (
            jnp.zeros((size, *self.event_shape), dtype=jnp.float32),
            jnp.zeros((size,), dtype=jnp.float32),
            jnp.zeros((size,), dtype=jnp.float32),
            jnp.int32(0),
            jnp.int32(0),
        )

    def run(self, n_iterations: int = 50, n_flow_training_steps: int = 20,
            n_ais_particles: int = 100, n_training_particles: int = 50,
            show_progress: bool = False, key=None, seed=None):
        from ..utils import tqdm  # shared fallback shim

        key = resolve_key(key, seed)
        params = self.flow.params
        opt_state = self.opt.init(params)
        # replay buffer persists across run() calls (reference parity: the
        # ring buffer lives on the object, flow_annealed_bootstrap.py:9-26)
        buf_state = getattr(self, "_buf_state", None)
        if buf_state is None:
            buf_state = self._init_buffer()

        # chunk the compiled scan only when a progress bar is requested;
        # silent runs compile one scan over all iterations (single dispatch)
        chunk = max(1, n_iterations // 20) if show_progress else n_iterations
        losses = []
        pbar = tqdm(total=n_iterations, desc="FAB", disable=not show_progress)
        try:
            done = 0
            while done < n_iterations:
                block = min(chunk, n_iterations - done)
                sizes = (block, int(n_flow_training_steps),
                         int(n_ais_particles), int(n_training_particles))
                fused = self._fused_cache.get(sizes)
                if fused is None:
                    fused = self._fused_cache[sizes] = self._make_fused_run(*sizes)
                key, sub = jax.random.split(key)
                params, opt_state, buf_state, loss_trace = fused(
                    params, opt_state, buf_state, sub
                )
                losses.append(loss_trace)
                done += block
                pbar.update(block)
        finally:
            pbar.close()
        self._buf_state = buf_state
        # (n_iterations,) replay loss; n_iterations=0 is legal (no-op run)
        self.loss_trace = (jnp.concatenate(losses) if losses
                           else jnp.zeros((0,), jnp.float32))
        self.flow.params = params
        return self.flow


_CTOR_KEYS = ("buffer_size", "n_ais_steps", "ais_step_size", "lr", "n_mcmc_steps")


def _split_ctor_kwargs(kwargs):
    return {k: kwargs.pop(k) for k in _CTOR_KEYS if k in kwargs}


def flow_annealed_importance_sampling_bootstrap_base(target_potential, flow, **kwargs):
    ctor_kwargs = _split_ctor_kwargs(kwargs)
    return FAB(target_potential, flow, **ctor_kwargs).run(**kwargs)


def fab(target, flow: str = "realnvp", show_progress: bool = False, seed: int = 0, **kwargs):
    """Wrapper (reference ``flow_training/wrappers.py:6-15``); the flow itself
    is the importance-sampling prior."""
    from ..api.registry import create_flow_object

    flow_object = create_flow_object(flow, target.event_shape, seed=seed)
    algorithm = FAB(target, flow_object, **_split_ctor_kwargs(kwargs))
    return algorithm.run(show_progress=show_progress, seed=seed, **kwargs)
