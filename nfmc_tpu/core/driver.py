"""The chunked jitted ``lax.scan`` chain driver — the framework's hot loop.

The reference runs one eager Python iteration per MCMC step
(``nfmc/algorithms/sampling/mcmc/base.py:69-98``), dispatching many small
batched torch ops and a fresh autograd call per gradient. Here the per-
iteration step is a pure function ``step(x, kernel_state, key) ->
(x', kernel_state', StepInfo)`` compiled once and scanned over a *chunk* of
iterations on device. Host code only runs between chunks — to honor
``time_limit_seconds`` (reference ``mcmc/base.py:70-71``), stream samples to
host RAM, and fold chunk-local statistics into the running totals.

Divergences cannot be raised as exceptions inside jit; instead each step
reports a ``diverged`` flag computed from finiteness checks, which rejects the
whole batch for that iteration — the same observable behavior as the
reference's ``except ValueError`` blocks (``langevin.py:111-114``,
``hmc.py:117-120``).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .samples import MCMCSamples
from .statistics import MCMCStatistics

try:  # pragma: no cover - cosmetic only
    from tqdm import tqdm
except Exception:  # pragma: no cover
    def tqdm(it, **kwargs):
        return it


class StepInfo(NamedTuple):
    """Per-iteration dynamic outputs of a kernel step."""

    n_accepted: jax.Array  # i32 scalar: chains accepted this iteration
    diverged: jax.Array  # i32 scalar: 1 if this iteration diverged (batch-wide)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StatsAccum:
    """Chunk-local accumulators carried through the scan (reset every chunk).

    Counters that are *static* per iteration (attempted trajectories, target
    call/grad counts — SURVEY.md section 2.8) are computed host-side as
    ``chunk_len * per_iter`` and never touch the device.
    """

    n_accepted: jax.Array
    n_divergences: jax.Array
    sum_x: jax.Array  # (*event,) running sum of transformed states
    sum_x2: jax.Array  # (*event,)

    @staticmethod
    def zeros(event_shape: Tuple[int, ...]) -> "StatsAccum":
        return StatsAccum(
            n_accepted=jnp.zeros((), dtype=jnp.int32),
            n_divergences=jnp.zeros((), dtype=jnp.int32),
            sum_x=jnp.zeros(event_shape, dtype=jnp.float32),
            sum_x2=jnp.zeros(event_shape, dtype=jnp.float32),
        )

    def add(self, info: StepInfo, x_transformed: jax.Array) -> "StatsAccum":
        xt = x_transformed.astype(jnp.float32)
        return StatsAccum(
            n_accepted=self.n_accepted + info.n_accepted,
            n_divergences=self.n_divergences + info.diverged,
            sum_x=self.sum_x + jnp.sum(xt, axis=0),
            sum_x2=self.sum_x2 + jnp.sum(xt * xt, axis=0),
        )


StepFn = Callable[[jax.Array, object, jax.Array], Tuple[jax.Array, object, StepInfo]]


def chunk_schedule(n_iterations: int, max_chunk: int = 128):
    """Yield power-of-two chunk sizes: 1,1,2,4,... capped, tail decomposed.

    Keeps the number of distinct compiled scan lengths at O(log max_chunk)
    while checking wall-clock limits early and often.
    """
    remaining = n_iterations
    size = 1
    first = True
    while remaining > 0:
        if size > remaining:
            # largest power of two <= remaining (already compiled earlier)
            size = 1 << (remaining.bit_length() - 1)
        yield size
        remaining -= size
        if not first:
            size = min(size * 2, max_chunk)
        first = False


class ChunkedScanDriver:
    """Runs `step_fn` for N iterations as jitted scan chunks with host control.

    One driver instance per sampler; jitted chunk runners are cached per
    (tuning, collect) mode and re-specialized by XLA per chunk length.
    """

    def __init__(
        self,
        event_shape: Tuple[int, ...],
        make_step: Callable[[bool], StepFn],
        data_transform: Optional[Callable[[jax.Array], jax.Array]] = None,
    ):
        self.event_shape = tuple(event_shape)
        self.make_step = make_step
        self.data_transform = data_transform or (lambda v: v)
        self._runners = {}

    def _runner(self, tuning: bool, collect: bool):
        cache_key = (tuning, collect)
        if cache_key not in self._runners:
            step_fn = self.make_step(tuning)
            data_transform = self.data_transform

            def run_chunk(x, kstate, acc, keys):
                def body(carry, key):
                    x, ks, acc = carry
                    x_new, ks_new, info = step_fn(x, ks, key)
                    acc_new = acc.add(info, data_transform(x_new))
                    emit = x_new if collect else None
                    return (x_new, ks_new, acc_new), emit

                (x, kstate, acc), ys = jax.lax.scan(body, (x, kstate, acc), keys)
                return x, kstate, acc, ys

            self._runners[cache_key] = jax.jit(run_chunk, donate_argnums=(0, 2))
        return self._runners[cache_key]

    def run(
        self,
        x0: jax.Array,
        kstate,
        key: jax.Array,
        n_iterations: int,
        *,
        stats: MCMCStatistics,
        samples: Optional[MCMCSamples] = None,
        calls_per_iter: int = 0,
        grads_per_iter: int = 0,
        tuning: bool = False,
        collect: bool = True,
        time_limit_seconds: Optional[float] = None,
        show_progress: bool = False,
        desc: str = "MCMC",
        max_chunk: int = 128,
        kernel_repr: Optional[Callable[[object], str]] = None,
    ):
        """Run the chain; mutates ``stats``/``samples``; returns (x, kstate)."""
        runner = self._runner(tuning, collect)
        # Copy: chunk runners donate their carry buffers; never consume the
        # caller's x0 storage.
        x = jnp.array(x0, dtype=jnp.float32, copy=True)
        n_chains = x.shape[0]

        pbar = tqdm(total=n_iterations, desc=desc, disable=not show_progress)
        for chunk in chunk_schedule(n_iterations, max_chunk=max_chunk):
            if (
                time_limit_seconds is not None
                and stats.elapsed_time_seconds > time_limit_seconds
            ):
                break
            t0 = time.time()
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, chunk)
            acc = StatsAccum.zeros(self.event_shape)
            x, kstate, acc, ys = runner(x, kstate, acc, keys)
            # Block so elapsed-time accounting reflects real device work.
            jax.block_until_ready(x)

            stats.update_counters(
                n_accepted_trajectories=int(acc.n_accepted),
                n_attempted_trajectories=chunk * n_chains,
                n_divergences=int(acc.n_divergences),
                n_target_calls=chunk * calls_per_iter,
                n_target_gradient_calls=chunk * grads_per_iter,
            )
            stats.update_moments_from_sums(acc.sum_x, acc.sum_x2, chunk * n_chains)
            if samples is not None:
                if collect:
                    samples.add(ys)
                else:
                    samples.add(x)
            stats.update_elapsed_time(time.time() - t0)
            if show_progress:
                pbar.update(chunk)
                postfix = f"{stats}"
                if kernel_repr is not None:
                    postfix += f" | {kernel_repr(kstate)}"
                pbar.set_postfix_str(postfix)
        pbar.close()
        return x, kstate
