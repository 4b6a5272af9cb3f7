"""Shared numeric utilities.

TPU-native equivalents of helpers the reference keeps in ``nfmc/util.py:382-418``
and ``torchflows.utils`` (``sum_except_batch``, ``get_batch_shape``).
"""
from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Shape = Tuple[int, ...]


try:  # progress bars are optional; every call site imports this shim
    from tqdm import tqdm
except Exception:  # pragma: no cover

    class tqdm:  # noqa: N801 - drop-in for tqdm.tqdm
        """No-op fallback supporting both usage styles: wrapping an iterable
        (``for x in tqdm(it, ...)``) and manual bars (``tqdm(total=...)`` with
        ``update``/``set_postfix_str``/``refresh``/``close``)."""

        def __init__(self, iterable=None, total=None, **kwargs):
            self.iterable = iterable
            self.total = total
            self.n = 0

        def __iter__(self):
            return iter(self.iterable if self.iterable is not None else ())

        def update(self, n=1):
            self.n += n

        def set_postfix_str(self, s=""):
            pass

        def set_description(self, s=""):
            pass

        def refresh(self):
            pass

        def close(self):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False


def event_size_of(event_shape: Sequence[int]) -> int:
    return int(np.prod(np.asarray(event_shape, dtype=np.int64))) if len(event_shape) else 1


def get_batch_shape(x: jax.Array, event_shape: Sequence[int]) -> Shape:
    """Batch dims of ``x`` given its trailing event dims (torchflows.utils.get_batch_shape parity)."""
    n_event = len(event_shape)
    return tuple(x.shape[: x.ndim - n_event])


def sum_except_batch(x: jax.Array, event_shape: Sequence[int]) -> jax.Array:
    """Sum over the trailing event dims (torchflows.utils.sum_except_batch parity)."""
    n_event = len(event_shape)
    if n_event == 0:
        return x
    return jnp.sum(x.reshape(*x.shape[: x.ndim - n_event], -1), axis=-1)


def flatten_event(x: jax.Array, event_shape: Sequence[int]) -> jax.Array:
    """Reshape ``(*batch, *event)`` to ``(*batch, event_size)``."""
    batch_shape = get_batch_shape(x, event_shape)
    return x.reshape(*batch_shape, event_size_of(event_shape))


def unflatten_event(x: jax.Array, event_shape: Sequence[int]) -> jax.Array:
    """Inverse of :func:`flatten_event`."""
    return x.reshape(*x.shape[:-1], *event_shape)


def metropolis_acceptance_log_ratio(
    log_prob_target_curr,
    log_prob_target_prime,
    log_prob_proposal_curr,
    log_prob_proposal_prime,
):
    """log alpha = log p(x') - log p(x) + log g(x|x') - log g(x'|x).

    Semantics of reference ``nfmc/util.py:382-392``.
    """
    return (
        log_prob_target_prime
        - log_prob_target_curr
        + log_prob_proposal_curr
        - log_prob_proposal_prime
    )


def unevaluable_current_mask(u_curr, logq_curr):
    """Per-chain mask: True where the current side of a flow-proposal MH
    ratio is UNEVALUABLE. Used by the accept guards (IMH / jump / DLMC):
    against a FINITE proposal side, ``log_alpha`` is non-finite iff a
    current-side term is, and the comparison ``log_u < log_alpha`` then
    freezes the chain for every non-finite value except ``U(x) = +inf`` — a
    NaN current potential (``inf - inf`` arithmetic in clipped/log-barrier
    targets) or a current state of flow density zero (``log q(x) = -inf``,
    where the MH ratio is formally undefined for an independence proposal)
    would pin the chain at ``x0`` for the whole run. The accept guards OR
    this mask into the accept decision: an unevaluable current state always
    moves to a finite proposal.

    Deliberately NOT triggered by ``U(x) = -inf`` (an integrable density
    singularity, e.g. Beta(1/2,1/2)-like targets): ``log_alpha = -inf`` is
    then the CORRECT accept probability (0) for any finite proposal, and
    force-moving would bias samples away from the singularity.
    (``U(x) = +inf`` needs no clause: ``log_alpha = +inf`` already accepts.)
    """
    return jnp.isnan(u_curr) | ~jnp.isfinite(logq_curr)


def batched_grad(fn_batched: Callable[[jax.Array], jax.Array]) -> Callable[[jax.Array], jax.Array]:
    """Gradient of a batched potential ``U: (B,*event)->(B,)`` w.r.t. each row.

    TPU-native replacement for per-call autograd in the reference
    (``nfmc/util.py:395-402``): a single reverse-mode pass of the summed
    potential, which XLA fuses with the surrounding computation.
    """

    def grad_fn(x: jax.Array) -> jax.Array:
        return jax.grad(lambda v: jnp.sum(fn_batched(v)))(x)

    return grad_fn


def value_and_batched_grad(fn_batched: Callable[[jax.Array], jax.Array]):
    """Returns ``(U(x), dU/dx)`` in one pass."""

    def fn(x: jax.Array):
        def summed(v):
            u = fn_batched(v)
            return jnp.sum(u), u

        (_, u), g = jax.value_and_grad(summed, has_aux=True)(x)
        return u, g

    return fn


def multivariate_normal_sample(key, batch_shape: Shape, event_shape: Shape, cov=None, chol=None):
    """Draw from N(0, cov); identity covariance when ``cov`` is None.

    Parity with reference ``nfmc/util.py:405-418`` but keyed (explicit RNG) and
    accepting a pre-computed Cholesky factor so hot loops avoid refactorizing.
    """
    if cov is None and chol is None:
        return jax.random.normal(key, (*batch_shape, *event_shape))
    d = event_size_of(event_shape)
    if chol is None:
        chol = jnp.linalg.cholesky(jnp.asarray(cov))
    z = jax.random.normal(key, (*batch_shape, d))
    # highest precision: the MH ratio assumes proposals follow the exact MVN
    # density; TPU-default bf16 multiplies would skew the sampled covariance
    # relative to the density used in the ratio (docs/design.md numerics note).
    samples = jnp.matmul(z, chol.T, precision="highest")
    return samples.reshape(*batch_shape, *event_shape)


def as_numpy(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


LOG_2PI = math.log(2.0 * math.pi)


def std_normal_log_prob(x: jax.Array, event_shape: Sequence[int]) -> jax.Array:
    """Batched standard-normal log density over the event dims."""
    d = event_size_of(event_shape)
    return -0.5 * sum_except_batch(x * x, event_shape) - 0.5 * d * LOG_2PI
