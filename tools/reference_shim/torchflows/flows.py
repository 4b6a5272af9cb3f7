"""Minimal-but-functional ``Flow`` for executing the reference in-place.

Implements exactly the surface the reference consumes (SURVEY.md §2.9 lists
each call site): ``sample(n, no_grad=, return_log_prob=)``, ``log_prob``,
overridable ``base_log_prob``, ``fit`` (forward-KL MLE with the kwargs
observed at ``/root/reference/nfmc/algorithms/sampling/base.py:55-61`` and
``jump.py:139-149``), ``variational_fit`` (reverse KL,
``imh.py:67-72``), ``state_dict``/``load_state_dict`` (via nn.Module),
``to``/``get_device``, ``event_shape`` and ``bijection``.

Divergent fits raise ``ValueError`` when ``check_for_divergences`` is set —
the reference's rollback paths catch exactly that (``jump.py:150-151``,
``imh.py:174-175``).
"""
import math
import time
from typing import Optional

import torch
import torch.nn as nn

from .bijections.base import Bijection


class Flow(nn.Module):
    def __init__(self, bijection: Bijection):
        super().__init__()
        self.bijection = bijection

    @property
    def event_shape(self):
        return self.bijection.event_shape

    # -- densities ----------------------------------------------------------
    def base_log_prob(self, z: torch.Tensor) -> torch.Tensor:
        """Standard-normal base; overridable (AFT swaps it for an annealed
        potential — reference ``annealed_flow_transport.py:238``)."""
        flat = z.reshape(z.shape[0], -1)
        d = flat.shape[-1]
        return -0.5 * (flat ** 2).sum(-1) - 0.5 * d * math.log(2 * math.pi)

    def log_prob(self, x: torch.Tensor) -> torch.Tensor:
        z, log_det = self.bijection.forward(x)
        return self.base_log_prob(z) + log_det

    def sample(self, n: int, no_grad: bool = False, return_log_prob: bool = False):
        def _draw():
            z = torch.randn(n, *self.event_shape, device=self._device())
            x, log_det = self.bijection.inverse(z)
            if return_log_prob:
                return x, self.base_log_prob(z) - log_det
            return x

        if no_grad:
            with torch.no_grad():
                return _draw()
        return _draw()

    # -- training -----------------------------------------------------------
    def _run_opt(self, loss_fn, n_epochs, lr, early_stopping,
                 early_stopping_threshold, keep_best_weights, show_progress,
                 time_limit_seconds, check_for_divergences, val_loss_fn=None):
        opt = torch.optim.AdamW(self.parameters(), lr=lr)
        best = math.inf
        best_weights = None
        bad_epochs = 0
        t0 = time.time()
        for epoch in range(n_epochs):
            if time_limit_seconds is not None and time.time() - t0 > time_limit_seconds:
                break
            opt.zero_grad()
            loss = loss_fn()
            if check_for_divergences and not bool(torch.isfinite(loss)):
                raise ValueError(f"divergent loss at epoch {epoch}: {loss}")
            loss.backward()
            opt.step()
            score = loss
            if val_loss_fn is not None:
                with torch.no_grad():
                    score = val_loss_fn()
            score = float(score)
            if score < best:
                best = score
                bad_epochs = 0
                if keep_best_weights:
                    best_weights = {k: v.detach().clone()
                                    for k, v in self.state_dict().items()}
            else:
                bad_epochs += 1
                if early_stopping and bad_epochs >= early_stopping_threshold:
                    break
        if keep_best_weights and best_weights is not None:
            self.load_state_dict(best_weights)

    def fit(self, x_train: torch.Tensor, x_val: Optional[torch.Tensor] = None,
            n_epochs: int = 500, lr: float = 0.05, batch_size="adaptive",
            early_stopping: bool = False, early_stopping_threshold: int = 50,
            keep_best_weights: bool = True, show_progress: bool = False,
            time_limit_seconds=None, check_for_divergences: bool = False):
        """Forward-KL MLE on samples."""
        x_train = x_train.reshape(-1, *self.event_shape).detach()
        if batch_size == "adaptive" or batch_size is None:
            batch_size = max(32, min(8192, len(x_train)))

        def loss_fn():
            # fresh random minibatch per optimizer step — a single fixed
            # batch would leave most of a large history unseen across all
            # epochs and systematically weaken the reference side's fits
            perm = torch.randperm(len(x_train))[:batch_size]
            return -self.log_prob(x_train[perm]).mean()

        val = None
        if x_val is not None and len(x_val):
            val = x_val.reshape(-1, *self.event_shape).detach()
        self._run_opt(
            loss_fn=loss_fn,
            val_loss_fn=(lambda: -self.log_prob(val).mean()) if val is not None else None,
            n_epochs=n_epochs, lr=lr, early_stopping=early_stopping,
            early_stopping_threshold=early_stopping_threshold,
            keep_best_weights=keep_best_weights, show_progress=show_progress,
            time_limit_seconds=time_limit_seconds,
            check_for_divergences=check_for_divergences,
        )

    def variational_fit(self, target_log_prob: callable, n_samples: int = 1,
                        n_epochs: int = 500, lr: float = 0.05,
                        early_stopping: bool = False,
                        early_stopping_threshold: int = 50,
                        keep_best_weights: bool = True,
                        show_progress: bool = False, time_limit_seconds=None,
                        check_for_divergences: bool = False):
        """Reverse KL to an unnormalized target log-density (reparameterized)."""
        def loss_fn():
            z = torch.randn(max(2, n_samples), *self.event_shape,
                            device=self._device())
            x, log_det = self.bijection.inverse(z)
            flow_lp = self.base_log_prob(z) - log_det
            return (flow_lp - target_log_prob(x)).mean()

        self._run_opt(
            loss_fn=loss_fn, n_epochs=n_epochs, lr=lr,
            early_stopping=early_stopping,
            early_stopping_threshold=early_stopping_threshold,
            keep_best_weights=keep_best_weights, show_progress=show_progress,
            time_limit_seconds=time_limit_seconds,
            check_for_divergences=check_for_divergences,
        )

    # -- device plumbing ----------------------------------------------------
    def _device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")

    def get_device(self):
        return self._device()
