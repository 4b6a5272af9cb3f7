"""MCMC sampler driver + Metropolis adaptation, TPU-native.

Behavioral parity with reference ``nfmc/algorithms/sampling/mcmc/base.py``:

* the hot loop (``mcmc/base.py:69-98``) — propose, masked accept, counters,
  streaming moments, optional kernel adaptation — compiles into a single
  jitted ``lax.scan`` body (see :mod:`nfmc_tpu.core.driver`);
* warmup (``mcmc/base.py:39-54``) runs the same scan in tuning mode for
  ``n_warmup_iterations`` and keeps the tuned kernel (no deepcopy needed —
  state is an explicit pytree);
* Metropolis adaptation (``mcmc/base.py:142-161``): EMA of per-dimension
  chain variance into ``inv_mass_diag`` plus Nesterov dual averaging of the
  step size, both as pure pytree updates inside the scan.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.driver import RNG_HOIST_ELEMENT_LIMIT, ChunkedScanDriver, StepInfo
from ...core.output import MCMCOutput
from ...core.sampler import MCMCKernel, MCMCParameters, Sampler
from ...core.tuning import (
    DualAveragingParams,
    DualAveragingState,
    da_init,
    da_update_step_size,
    ema_inv_mass_diag,
)
from ...utils import as_numpy


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MetropolisState:
    """Scan-carried numeric state for Metropolis-family kernels."""

    step_size: jax.Array  # f32 scalar
    inv_mass_diag: jax.Array  # (event_size,)
    da: DualAveragingState


@dataclass
class MetropolisKernel(MCMCKernel):
    """User-facing tunable state; reference ``mcmc/base.py:105-123``."""

    event_size: int = 0
    inv_mass_diag: Optional[np.ndarray] = None
    step_size: float = 0.01
    da_params: Optional[DualAveragingParams] = None

    def __post_init__(self):
        super().__post_init__()
        if self.inv_mass_diag is None:
            self.inv_mass_diag = np.ones(self.event_size, dtype=np.float32)
        else:
            self.inv_mass_diag = np.asarray(self.inv_mass_diag, dtype=np.float32)
            if self.inv_mass_diag.shape != (self.event_size,):
                raise ValueError(
                    f"inv_mass_diag shape {self.inv_mass_diag.shape} != ({self.event_size},)"
                )
        if self.da_params is None:
            self.da_params = DualAveragingParams()

    def make_state(self) -> MetropolisState:
        da = getattr(self, "_resume_da", None)
        return MetropolisState(
            step_size=jnp.asarray(self.step_size, dtype=jnp.float32),
            inv_mass_diag=jnp.asarray(self.inv_mass_diag, dtype=jnp.float32),
            da=da if da is not None else da_init(self.step_size, self.da_params),
        )

    def sync_from_state(self, state: MetropolisState) -> None:
        # ONE batched host fetch (device_get issues the async copies up
        # front) instead of separate float()/as_numpy() blocks — each
        # standalone fetch costs a full tunnel round trip (~25-30 ms), which
        # dominates a warm single front-door call at small scale.
        step_size, inv_mass_diag = jax.device_get(
            (state.step_size, state.inv_mass_diag)
        )
        self.step_size = float(step_size)
        self.inv_mass_diag = np.asarray(inv_mass_diag)
        # Carry the dual-averaging state across runs and checkpoints so a
        # mid-warmup resume CONTINUES adaptation rather than restarting it
        # (the reference copies its DualAveraging object back after warmup,
        # ``mcmc/base.py:39-54`` — same semantics). make_state() includes
        # ``da`` in the saved pytree, so checkpointed resume is exact.
        self._resume_da = jax.tree_util.tree_map(jnp.asarray, state.da)

    def __repr__(self):
        return (
            f"log step: {math.log(self.step_size):.2f}, "
            f"mass norm: {float(np.max(np.abs(self.inv_mass_diag))):.2f}"
        )


@dataclass
class MetropolisParameters(MCMCParameters):
    """Reference ``mcmc/base.py:126-131``."""

    tune_inv_mass_diag: bool = True
    tune_step_size: bool = True
    adjustment: bool = True
    imd_adjustment: float = 1e-3


class MCMCSampler(Sampler):
    """Shared scan-driven MCMC runner; reference ``mcmc/base.py:13-102``."""

    def __init__(
        self,
        event_shape,
        target: Callable,
        kernel: MCMCKernel,
        params: MCMCParameters,
        data_transform: Optional[Callable] = None,
    ):
        super().__init__(event_shape, target, kernel, params)
        self.data_transform = data_transform
        self._driver: Optional[ChunkedScanDriver] = None
        self._driver_config = None

    @property
    def name(self) -> str:
        return "Generic MCMC"

    # ---- to be provided by subclasses -------------------------------------
    def make_propose(self) -> Callable:
        """Return pure fn ``(x, mstate, key) -> (x_prime, accept_mask, diverged)``."""
        raise NotImplementedError

    # ---- optional chunk-level RNG hoisting ----------------------------------
    # Per-iteration randomness (proposal noise / momentum + accept uniform) is
    # state-independent, so it can be drawn for a WHOLE scan chunk in one
    # batched pass instead of serial in-scan threefry chains (~30% of a
    # small-chain MALA step). Samplers opt in by providing ``make_draws`` (a
    # pure fn ``(key, n_chains) -> draws`` that replicates the step's in-scan
    # key derivation EXACTLY, so results are bit-identical) plus aux-consuming
    # step/propose variants.
    def make_draws(self) -> Optional[Callable]:
        return None

    def make_propose_aux(self) -> Optional[Callable]:
        """Optional ``(x, mstate, draws) -> (x_prime, mask, diverged)``."""
        return None

    # Footprint cap for hoisted draws (f32 elements across the chunk): above
    # this the precompute declines and iterations derive RNG in-scan.
    rng_hoist_element_limit: int = RNG_HOIST_ELEMENT_LIMIT

    def hoisted_elements_per_iter(self, x) -> int:
        """f32 elements one iteration's hoisted draws occupy. Default assumes
        the draws are dominated by one state-shaped array (MH/Langevin/HMC
        noise); samplers whose draws materially exceed ``x.size`` (ESS's
        per-iteration shrink uniforms) override so the footprint cap tracks
        the real HBM cost."""
        return x.size

    def calls_per_iter(self, n_chains: int) -> int:
        raise NotImplementedError

    def grads_per_iter(self, n_chains: int) -> int:
        raise NotImplementedError

    def _augment_state(self, mstate, x0):
        """Hook: samplers may extend the scan-carried kernel state with
        chain-shaped caches (e.g. Langevin carries U(x), grad U(x))."""
        return mstate

    def _make_output(self) -> MCMCOutput:
        """Hook: samplers with extra statistics (PT swap counters) override."""
        return MCMCOutput(self.event_shape, store_samples=self.params.store_samples,
                          on_device=getattr(self.params, 'store_samples_on_device', False))

    def _post_run(self, out: MCMCOutput) -> None:
        """Hook called after the driver run and kernel sync (PT pushes swap
        counters from the synced kernel into the output statistics)."""

    def _extract_mstate(self, state):
        return state[0] if isinstance(state, tuple) else state

    def _static_config(self) -> Tuple:
        """Static config participating in jit specialization; subclasses extend."""
        p = self.params
        return (
            getattr(p, "adjustment", None),
            getattr(p, "tune_inv_mass_diag", None),
            getattr(p, "tune_step_size", None),
            getattr(p, "imd_adjustment", None),
            # baked into the driver's precompute closure
            self.rng_hoist_element_limit,
            # baked into the driver's scan (scheduling hint, bit-identical)
            getattr(p, "scan_unroll", 1),
        )

    # ---- kernel adaptation -------------------------------------------------
    def make_update_kernel(self) -> Callable:
        """Pure tuning update; reference ``MetropolisSampler.update_kernel``
        (``mcmc/base.py:142-161``)."""
        p = self.params
        kern = self.kernel
        tune_imd = getattr(p, "tune_inv_mass_diag", False)
        tune_step = getattr(p, "tune_step_size", False) and getattr(p, "adjustment", False)
        imd_adjustment = getattr(p, "imd_adjustment", 1e-3)
        da_params = getattr(kern, "da_params", None) or DualAveragingParams()

        def update(mstate: MetropolisState, x: jax.Array, mask: jax.Array) -> MetropolisState:
            n_chains = x.shape[0]
            inv_mass_diag = mstate.inv_mass_diag
            if tune_imd and n_chains > 1:
                inv_mass_diag = ema_inv_mass_diag(
                    inv_mass_diag, x.reshape(n_chains, -1), imd_adjustment
                )
            da = mstate.da
            step_size = mstate.step_size
            if tune_step:
                acc_rate = jnp.mean(mask.astype(jnp.float32))
                da, step_size = da_update_step_size(da, acc_rate, da_params)
            return MetropolisState(step_size=step_size, inv_mass_diag=inv_mass_diag, da=da)

        return update

    # ---- scan step construction ---------------------------------------------
    def _make_step(self, tuning: bool) -> Callable:
        propose = self.make_propose()
        update_kernel = self.make_update_kernel()
        event_ndim = len(self.event_shape)

        def step(x, mstate, key):
            x_prime, mask, diverged = propose(x, mstate, key)
            bmask = mask.reshape(mask.shape + (1,) * event_ndim)
            x_new = jnp.where(bmask, x_prime, x)
            if tuning:
                mstate = update_kernel(mstate, x_new, mask)
            info = StepInfo(
                n_accepted=jnp.sum(mask).astype(jnp.int32),
                diverged=diverged.astype(jnp.int32),
            )
            return x_new, mstate, info

        return step

    def _make_step_aux(self, tuning: bool) -> Optional[Callable]:
        """Aux-consuming step for chunk-hoisted RNG; None when the sampler
        provides no draws/propose_aux (samplers with carried-cache custom
        ``_make_step``s override this alongside)."""
        propose_aux = self.make_propose_aux()
        if propose_aux is None:
            return None
        update_kernel = self.make_update_kernel()
        event_ndim = len(self.event_shape)

        def step(x, mstate, key, aux):
            x_prime, mask, diverged = propose_aux(x, mstate, aux)
            bmask = mask.reshape(mask.shape + (1,) * event_ndim)
            x_new = jnp.where(bmask, x_prime, x)
            if tuning:
                mstate = update_kernel(mstate, x_new, mask)
            info = StepInfo(
                n_accepted=jnp.sum(mask).astype(jnp.int32),
                diverged=diverged.astype(jnp.int32),
            )
            return x_new, mstate, info

        return step

    def _make_rng_precompute(self):
        """Driver precompute hoisting the per-iteration draws for a chunk (or
        declining above the footprint cap)."""
        draws = self.make_draws()
        if draws is None or self._make_step_aux(False) is None:
            return None
        limit = self.rng_hoist_element_limit
        per_iter = self.hoisted_elements_per_iter

        def make_precompute(tuning):
            def precompute(x, kstate, keys):
                if keys.shape[0] * per_iter(x) > limit:  # static under jit
                    return None
                return jax.vmap(lambda k: draws(k, x.shape[0]))(keys)

            return precompute

        return make_precompute

    def _get_driver(self) -> ChunkedScanDriver:
        config = self._static_config()
        if self._driver is None or self._driver_config != config:
            make_precompute = self._make_rng_precompute()
            self._driver = ChunkedScanDriver(
                self.event_shape,
                self._make_step,
                data_transform=self.data_transform,
                make_precompute=make_precompute,
                make_step_aux=self._make_step_aux if make_precompute else None,
                unroll=getattr(self.params, "scan_unroll", 1),
                hoist_per_iter=self.hoisted_elements_per_iter,
            )
            self._driver_config = config
        return self._driver

    # ---- public API ----------------------------------------------------------
    def warmup(
        self,
        x0,
        show_progress: bool = True,
        time_limit_seconds: Optional[float] = None,
        key=None,
        seed=None,
    ) -> MCMCOutput:
        """Tuning run of ``n_warmup_iterations``; keeps the tuned kernel.

        Same contract as reference ``mcmc/base.py:39-54`` (deepcopy-free: the
        tuned state is synced back into ``self.kernel``).
        """
        return self._run(
            x0,
            n_iterations=self.params.n_warmup_iterations,
            tuning=True,
            show_progress=show_progress,
            time_limit_seconds=time_limit_seconds,
            key=self._key(key, seed),
            desc=f"{self.name} (tuning)",
        )

    def sample(
        self,
        x0,
        show_progress: bool = True,
        time_limit_seconds: Optional[float] = None,
        key=None,
        seed=None,
    ) -> MCMCOutput:
        return self._run(
            x0,
            n_iterations=self.params.n_iterations,
            tuning=self.params.tuning,
            show_progress=show_progress,
            time_limit_seconds=time_limit_seconds,
            key=self._key(key, seed),
            desc=self.name,
        )

    def _run(
        self,
        x0,
        n_iterations: int,
        tuning: bool,
        show_progress: bool,
        time_limit_seconds,
        key,
        desc: str,
    ) -> MCMCOutput:
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        n_chains = x0.shape[0]
        out = self._make_output()

        mstate = self._augment_state(self.kernel.make_state(), x0)
        driver = self._get_driver()
        x, mstate = driver.run(
            x0,
            mstate,
            key,
            n_iterations,
            stats=out.statistics,
            samples=out.running_samples,
            calls_per_iter=self.calls_per_iter(n_chains),
            grads_per_iter=self.grads_per_iter(n_chains),
            tuning=tuning,
            collect=self.params.store_samples,
            time_limit_seconds=time_limit_seconds,
            show_progress=show_progress,
            desc=desc,
        )
        self.kernel.sync_from_state(self._extract_mstate(mstate))
        if getattr(self, "_continue_needs_final_state", False):
            # Final scan state the kernel-state contract doesn't carry (e.g.
            # PT's hot-rung replica positions) — the continuation entry
            # (``sample_continue``) re-seeds from it. Samplers override
            # ``_stash_final_carry`` to keep only the components continuation
            # actually consumes, so the stash doesn't pin the whole carry's
            # device buffers for the sampler's lifetime (ADVICE r2).
            self._stash_final_carry(mstate)
        out.kernel = self.kernel
        self._post_run(out)
        return out

    def _stash_final_carry(self, mstate) -> None:
        """Store the final scan carry for ``sample_continue``. Default keeps
        everything; samplers whose carry holds large caches should keep only
        what continuation needs (see ``ParallelTempering``)."""
        self._final_mstate = mstate


class MetropolisSampler(MCMCSampler):
    def __init__(self, event_shape, target, kernel: MetropolisKernel, params: MetropolisParameters, **kw):
        super().__init__(event_shape, target, kernel, params, **kw)
