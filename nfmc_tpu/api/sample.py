"""Front door: ``create_sampler`` and ``sample``.

Signature/dispatch parity with reference ``nfmc/sample.py:20-314``:
strategy-string dispatch to (kernel, params, inner kernel/params) -> Sampler;
default ``x0 ~ N(0, I)``; optional warmup whose draws are reshuffled into a
new ``x0`` (``sample.py:307-313``); the jump_hmc inner default of 5 iterations
(``sample.py:161-162``). ``device`` is accepted for API compatibility and is a
no-op (everything runs on the default JAX device/mesh).
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.output import MCMCOutput
from ..core.rng import resolve_key
from ..core.sampler import NFMCKernel, Sampler
from ..flows import Flow
from ..potentials import Potential
from ..samplers.mcmc import (
    AIES,
    CheesHMC,
    CheesHMCKernel,
    CheesHMCParameters,
    AIESKernel,
    AIESParameters,
    ESS,
    HMC,
    MALA,
    MH,
    NUTS,
    UHMC,
    ULA,
    ESSKernel,
    ESSParameters,
    HMCKernel,
    HMCParameters,
    LangevinKernel,
    LangevinParameters,
    MHKernel,
    MHParameters,
    NUTSKernel,
    NUTSParameters,
    PTHMC,
    PTMALA,
    PTRWMH,
    PTKernel,
    PTParameters,
    DenseHMC,
    DenseHMCKernel,
    DenseHMCParameters,
    DenseLangevinKernel,
    DenseLangevinParameters,
    DenseMALA,
)
from ..samplers.nfmc import (
    JumpChEES,
    NeuTraChEES,
    DLMC,
    TESS,
    AdaptiveIMH,
    DLMCKernel,
    DLMCParameters,
    FixedIMH,
    IMHKernel,
    IMHParameters,
    JumpAIES,
    JumpESS,
    JumpHMC,
    JumpMALA,
    JumpMH,
    JumpNFMCParameters,
    JumpNUTS,
    JumpUHMC,
    JumpULA,
    NeuTraHMC,
    NeuTraKernel,
    NeuTraMH,
    NeuTraParameters,
    TESSKernel,
    TESSParameters,
)
from .registry import create_flow_object


def create_sampler(
    target,
    event_shape: Optional[Tuple[int, ...]] = None,
    flow: Optional[Union[str, Flow]] = "realnvp",
    strategy: str = "imh",
    negative_log_likelihood=None,
    kernel_kwargs: Optional[dict] = None,
    param_kwargs: Optional[dict] = None,
    inner_kernel_kwargs: Optional[dict] = None,
    inner_param_kwargs: Optional[dict] = None,
    device=None,
    flow_kwargs: Optional[dict] = None,
) -> Sampler:
    """Build a Sampler; parity with reference ``sample.py:20-240``."""
    flow_kwargs = flow_kwargs or {}
    kernel_kwargs = kernel_kwargs or {}
    param_kwargs = param_kwargs or {"n_iterations": 100}
    inner_kernel_kwargs = inner_kernel_kwargs or {}
    inner_param_kwargs = dict(inner_param_kwargs or {})

    if flow is not None and not isinstance(flow, str):
        event_shape = flow.event_shape
    elif isinstance(target, Potential):
        event_shape = target.event_shape
    if event_shape is None:
        raise ValueError("event_shape could not be resolved")
    event_shape = tuple(int(s) for s in event_shape)
    event_size = int(np.prod(event_shape))

    if strategy in ("hmc", "uhmc", "ula", "mala", "mh", "ess", "nuts", "pt_mala",
                    "pt_mh", "pt_hmc", "aies", "chees_hmc", "dense_hmc",
                    "dense_mala"):
        if strategy == "dense_hmc":
            # Superset of the reference registry: full-covariance (dense
            # metric) mass matrix; the reference adapts diagonal-only
            # (``mcmc/base.py:105-161``; samplers/mcmc/dense.py).
            return DenseHMC(event_shape, target,
                            DenseHMCKernel(event_size=event_size, **kernel_kwargs),
                            DenseHMCParameters(**param_kwargs))
        if strategy == "dense_mala":
            return DenseMALA(event_shape, target,
                             DenseLangevinKernel(event_size=event_size, **kernel_kwargs),
                             DenseLangevinParameters(**param_kwargs))
        if strategy == "chees_hmc":
            # Superset of the reference registry: jittered HMC with ChEES
            # cross-chain trajectory-length adaptation (samplers/mcmc/chees.py).
            return CheesHMC(event_shape, target,
                            CheesHMCKernel(event_size=event_size, **kernel_kwargs),
                            CheesHMCParameters(**param_kwargs))
        if strategy == "aies":
            # Superset of the reference registry: affine-invariant ensemble
            # stretch move (gradient-free; samplers/mcmc/ensemble.py).
            return AIES(event_shape, target,
                        AIESKernel(event_size=event_size, **kernel_kwargs),
                        AIESParameters(**param_kwargs))
        if strategy in ("pt_mala", "pt_mh", "pt_hmc"):
            # Superset of the reference registry: parallel tempering / replica
            # exchange (the reference has no tempering; SURVEY.md section 2.5
            # lists chain vectorization as its only parallelism).
            cls = {"pt_mala": PTMALA, "pt_mh": PTRWMH, "pt_hmc": PTHMC}[strategy]
            return cls(event_shape, target,
                       PTKernel(event_size=event_size, **kernel_kwargs),
                       PTParameters(**param_kwargs))
        if strategy == "nuts":
            # Superset of the reference registry: the reference's NUTS is a
            # broken single-chain Pyro shim excluded from its own dispatch
            # (``nfmc/algorithms/sampling/mcmc/nuts.py:38-51``); ours is a
            # native multi-chain implementation, so it IS front-door reachable.
            return NUTS(event_shape, target,
                        NUTSKernel(event_size=event_size, **kernel_kwargs),
                        NUTSParameters(**param_kwargs))
        if strategy == "hmc":
            return HMC(event_shape, target, HMCKernel(event_size=event_size, **kernel_kwargs),
                       HMCParameters(**param_kwargs))
        if strategy == "uhmc":
            return UHMC(event_shape, target, HMCKernel(event_size=event_size, **kernel_kwargs),
                        HMCParameters(**param_kwargs))
        if strategy == "mala":
            return MALA(event_shape, target, LangevinKernel(event_size=event_size, **kernel_kwargs),
                        LangevinParameters(**param_kwargs))
        if strategy == "ula":
            return ULA(event_shape, target, LangevinKernel(event_size=event_size, **kernel_kwargs),
                       LangevinParameters(**param_kwargs))
        if strategy == "mh":
            return MH(event_shape, target, MHKernel(event_size=event_size, **kernel_kwargs),
                      MHParameters(**param_kwargs))
        if strategy == "ess":
            if negative_log_likelihood is None:
                raise ValueError("Negative log likelihood must be provided")
            return ESS(event_shape, target, negative_log_likelihood,
                       ESSKernel(event_shape=event_shape, **kernel_kwargs),
                       ESSParameters(**param_kwargs))

    nfmc_strategies = (
        "imh", "fixed_imh", "adaptive_imh",
        "jump_mala", "jump_ula", "jump_hmc", "jump_uhmc", "jump_ess", "jump_mh",
        "jump_nuts",  # superset: reference's NUTS delegation is broken
        "jump_aies",  # superset: gradient-free ensemble inner moves
        "jump_chees",  # superset: ChEES-adapted HMC inner moves
        "neutra_hmc", "neutra_mh",
        "neutra_chees",  # superset: adaptive-trajectory latent-space HMC
        "tess", "dlmc",
    )
    if strategy not in nfmc_strategies:
        raise ValueError(f"Unsupported sampling strategy: {strategy}")

    if flow is None:
        raise ValueError("Flow object must be provided")
    if isinstance(flow, str):
        flow_object = create_flow_object(flow_string=flow, event_shape=event_shape, **flow_kwargs)
    elif isinstance(flow, Flow):
        flow_object = flow
    else:
        raise ValueError(f"Unknown type for normalizing flow: {type(flow)}")

    # Documented deviation (round-3 review): the reference SILENTLY drops
    # kernel_kwargs for every NFMC strategy (``sample.py:124-233`` builds the
    # kernels bare) — here they plumb through, so e.g. DLMC's step_size and
    # TESS's cov are front-door reachable instead of being ignored without
    # error (docs/parity.md).
    if strategy in ("imh", "fixed_imh"):
        return FixedIMH(event_shape, target,
                        IMHKernel(event_shape, flow=flow_object, **kernel_kwargs),
                        IMHParameters(**param_kwargs))
    if strategy == "adaptive_imh":
        # Reference quirk parity: AdaptiveIMH ignores param_kwargs (``sample.py:127-130``).
        return AdaptiveIMH(event_shape, target,
                           IMHKernel(event_shape, flow=flow_object, **kernel_kwargs),
                           IMHParameters())

    if strategy.startswith("jump_"):
        kernel = NFMCKernel(event_shape, flow=flow_object, **kernel_kwargs)
        params = JumpNFMCParameters(**param_kwargs)
        inner = strategy[len("jump_"):]
        if inner in ("mala", "ula"):
            inner_kernel = LangevinKernel(event_size=event_size, **inner_kernel_kwargs)
            inner_params = LangevinParameters(**inner_param_kwargs)
            cls = JumpMALA if inner == "mala" else JumpULA
            return cls(event_shape, target, kernel=kernel, params=params,
                       inner_kernel=inner_kernel, inner_params=inner_params)
        if inner in ("hmc", "uhmc"):
            inner_kernel = HMCKernel(event_size=event_size, **inner_kernel_kwargs)
            if inner == "hmc" and "n_iterations" not in inner_param_kwargs:
                inner_param_kwargs["n_iterations"] = 5  # reference ``sample.py:161-162``
            inner_params = HMCParameters(**inner_param_kwargs)
            cls = JumpHMC if inner == "hmc" else JumpUHMC
            return cls(event_shape, target, kernel=kernel, params=params,
                       inner_kernel=inner_kernel, inner_params=inner_params)
        if inner == "mh":
            return JumpMH(event_shape, target, kernel=kernel, params=params,
                          inner_kernel=MHKernel(event_size=event_size, **inner_kernel_kwargs),
                          inner_params=MHParameters(**inner_param_kwargs))
        if inner == "ess":
            if negative_log_likelihood is None:
                raise ValueError("Negative log likelihood must be provided")
            return JumpESS(event_shape, target, negative_log_likelihood=negative_log_likelihood,
                           kernel=kernel, params=params,
                           inner_kernel=ESSKernel(event_shape=event_shape, **inner_kernel_kwargs),
                           inner_params=ESSParameters(**inner_param_kwargs))
        if inner == "aies":
            # Superset (see "aies" above): flow jumps + gradient-free
            # ensemble inner moves.
            return JumpAIES(event_shape, target, kernel=kernel, params=params,
                            inner_kernel=AIESKernel(event_size=event_size, **inner_kernel_kwargs),
                            inner_params=AIESParameters(**inner_param_kwargs))
        if inner == "chees":
            # Superset (see "chees_hmc" above): flow jumps + ChEES-adapted
            # HMC inner moves; inner defaults mirror jump_hmc's 5-iteration
            # inner run (reference ``sample.py:161-162``).
            if "n_iterations" not in inner_param_kwargs:
                inner_param_kwargs["n_iterations"] = 5
            return JumpChEES(event_shape, target, kernel=kernel, params=params,
                             inner_kernel=CheesHMCKernel(event_size=event_size, **inner_kernel_kwargs),
                             inner_params=CheesHMCParameters(**inner_param_kwargs))
        if inner == "nuts":
            # Superset (see "nuts" above); inner defaults mirror jump_hmc's
            # 5-iteration inner run (reference ``sample.py:161-162``).
            if "n_iterations" not in inner_param_kwargs:
                inner_param_kwargs["n_iterations"] = 5
            return JumpNUTS(event_shape, target, kernel=kernel, params=params,
                            inner_kernel=NUTSKernel(event_size=event_size, **inner_kernel_kwargs),
                            inner_params=NUTSParameters(**inner_param_kwargs))

    if strategy == "tess":
        if negative_log_likelihood is None:
            raise ValueError("Negative log likelihood must be provided")
        return TESS(event_shape, target, negative_log_likelihood,
                    TESSKernel(event_shape, flow=flow_object, **kernel_kwargs),
                    TESSParameters(**param_kwargs))
    if strategy == "dlmc":
        if negative_log_likelihood is None:
            raise ValueError("Negative log likelihood must be provided")
        return DLMC(event_shape, target, negative_log_likelihood,
                    DLMCKernel(event_shape, flow=flow_object, **kernel_kwargs),
                    DLMCParameters(**param_kwargs))
    if strategy == "neutra_hmc":
        return NeuTraHMC(event_shape, target,
                         inner_kernel=HMCKernel(event_size=event_size, **inner_kernel_kwargs),
                         inner_params=HMCParameters(**inner_param_kwargs),
                         kernel=NeuTraKernel(event_shape, flow=flow_object, **kernel_kwargs),
                         params=NeuTraParameters(**param_kwargs))
    if strategy == "neutra_mh":
        return NeuTraMH(event_shape, target,
                        inner_kernel=MHKernel(event_size=event_size, **inner_kernel_kwargs),
                        inner_params=MHParameters(**inner_param_kwargs),
                        kernel=NeuTraKernel(event_shape, flow=flow_object, **kernel_kwargs),
                        params=NeuTraParameters(**param_kwargs))
    if strategy == "neutra_chees":
        # Superset (see "chees_hmc"): adaptive-trajectory HMC in the
        # reparameterized latent space, gradients through the flow inverse.
        return NeuTraChEES(event_shape, target,
                           inner_kernel=CheesHMCKernel(event_size=event_size, **inner_kernel_kwargs),
                           inner_params=CheesHMCParameters(**inner_param_kwargs),
                           kernel=NeuTraKernel(event_shape, flow=flow_object, **kernel_kwargs),
                           params=NeuTraParameters(**param_kwargs))
    raise ValueError(f"Unsupported sampling strategy: {strategy}")


def sample(
    target,
    event_shape: Optional[Tuple[int, ...]] = None,
    flow: Optional[Union[str, Flow]] = "realnvp",
    strategy: str = "imh",
    n_iterations: int = 100,
    n_warmup_iterations: int = 100,
    n_chains: int = 100,
    x0=None,
    warmup: bool = False,
    show_progress: bool = True,
    sampling_time_limit_seconds: Optional[float] = None,
    warmup_time_limit_seconds: Optional[float] = None,
    seed: Optional[int] = None,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_segment_iterations: Optional[int] = None,
    checkpoint_save_samples: Optional[bool] = None,
    **kwargs,
) -> MCMCOutput:
    """One-call sampling entry; parity with reference ``sample.py:243-314``.

    ``mesh`` (superset of the reference API, which is single-device only —
    SURVEY.md section 2.5): an optional ``jax.sharding.Mesh`` whose first axis
    the chain dimension is sharded over. Warmup and sampling then run SPMD
    across the mesh devices with GSPMD inserting the statistic all-reduces;
    the first mesh axis's size must divide ``n_chains``. Equivalent to
    wrapping the sampler in ``nfmc_tpu.parallel.sharded_sample``.

    ``checkpoint_path`` (superset; the reference has no recovery story —
    SURVEY.md section 5): run the sampling phase preemption-safe via
    :func:`nfmc_tpu.checkpoint.sample_resumable` — the iteration budget runs
    as checkpointed segments (``checkpoint_segment_iterations`` each,
    default ~10 segments) with stored draws round-tripped. If the process
    dies, calling ``sample()`` again with the same arguments skips warmup
    (the checkpoint holds the tuned kernel + flow, incl. ESS's adapted
    ellipse) and continues BIT-EXACT from the last completed segment — the
    resumed base PRNG key comes from the checkpoint, so this holds even
    without an explicit ``seed``. On successful completion the checkpoint
    files are deleted, so a file on disk always means "crashed, resume"
    (a re-call that finds an already-complete checkpoint rebuilds the
    finished output from it). ``checkpoint_save_samples=False`` skips the
    per-segment draw sidecar files when only statistics matter; the default
    (``None``) saves them on fresh runs and, on resume, adopts whatever the
    original run used — so a run started here and resumed via
    :func:`~nfmc_tpu.checkpoint.sample_resumable` (or vice versa) can never
    silently flip sidecar behavior mid-run (an explicit contradicting bool
    raises; ADVICE r2).
    Incompatible with ``sampling_time_limit_seconds`` (segments already
    bound loss-on-crash; a wall-clock limit across segments would make the
    resume point ambiguous).
    """
    if flow == "None":
        flow = None
    if flow is not None and not isinstance(flow, str):
        event_shape = flow.event_shape
    elif isinstance(target, Potential):
        event_shape = target.event_shape

    kwargs.setdefault("param_kwargs", {})
    kwargs["param_kwargs"] = {
        **(kwargs["param_kwargs"] or {}),
        "n_iterations": n_iterations,
        "n_warmup_iterations": n_warmup_iterations,
    }

    key = resolve_key(None, seed)
    k_flow, k_x0, k_warm, k_samp, k_shuffle = jax.random.split(key, 5)

    # Pin the flow's init params to the seed-derived stream (when the caller
    # builds the flow from a registry name and supplies no explicit seed):
    # without this two sample(seed=7) calls start from different flow weights.
    if seed is not None and isinstance(flow, str):
        flow_kwargs = dict(kwargs.get("flow_kwargs") or {})
        flow_kwargs.setdefault(
            "seed", int(jax.random.randint(k_flow, (), 0, 2**31 - 1))
        )
        kwargs["flow_kwargs"] = flow_kwargs

    sampler = create_sampler(
        target=target, event_shape=event_shape, flow=flow, strategy=strategy, **kwargs
    )

    if x0 is None:
        x0 = jax.random.normal(k_x0, (n_chains, *sampler.event_shape))
    x0 = jnp.asarray(x0, dtype=jnp.float32)

    if mesh is not None:
        from ..parallel import shard_chains

        # Chains shard over the FIRST mesh axis only (multi-axis meshes keep
        # their remaining axes free for e.g. flow-training data parallelism).
        n_shards = mesh.shape[mesh.axis_names[0]]
        if x0.shape[0] % n_shards != 0:
            raise ValueError(
                f"n_chains={x0.shape[0]} must be divisible by mesh axis "
                f"{mesh.axis_names[0]!r} size {n_shards}"
            )
        x0 = shard_chains(x0, mesh, axis_name=mesh.axis_names[0])

    resume = False
    if checkpoint_path is not None:
        import os as _os

        if sampling_time_limit_seconds is not None:
            raise ValueError(
                "checkpoint_path is incompatible with sampling_time_limit_seconds"
            )
        ckpt_file = str(checkpoint_path)
        if not ckpt_file.endswith(".npz"):
            ckpt_file += ".npz"
        # A checkpoint on disk means a previous call crashed mid-sampling:
        # the tuned kernel/flow state lives in the checkpoint, so warmup is
        # skipped and sampling continues from the saved segment.
        resume = _os.path.exists(ckpt_file)

    if warmup and not resume:
        warmup_output = sampler.warmup(
            x0=x0, show_progress=show_progress,
            time_limit_seconds=warmup_time_limit_seconds, key=k_warm,
        )
        n_stored = warmup_output.running_samples.n_samples
        x0_is_warmup_draw = True
        if warmup_output.store_samples and n_stored > 0:
            flat = warmup_output.samples.reshape(-1, *sampler.event_shape)
            perm = np.asarray(jax.random.permutation(k_shuffle, len(flat)))
            x0 = jnp.asarray(flat[perm][: x0.shape[0]])
        elif warmup_output.running_samples.last_sample is not None:
            x0 = jnp.asarray(warmup_output.running_samples.last_sample)
        else:
            # warmup produced nothing (zero iterations / immediate time
            # limit) — keep the original DATA-space x0
            x0_is_warmup_draw = False
        if (
            x0_is_warmup_draw
            and getattr(sampler, "warmup_draws_are_latent", False)
            and getattr(sampler.params, "transport_x0", False)
        ):
            # NeuTra's warmup draws are LATENT; with transport_x0 the
            # sampler will forward-map x0 as data-space, which would land
            # chains at f(z) instead of z (round-3 review fix). Convert to
            # data space so the transport reconstructs the warmup points.
            x0 = sampler._latent_to_data(x0)
        if mesh is not None:
            from ..parallel import shard_chains

            # the reshuffle rebuilt x0 from host arrays — re-pin the sharding
            x0 = shard_chains(x0, mesh, axis_name=mesh.axis_names[0])
    if checkpoint_path is not None:
        from ..checkpoint import discard_resumable_checkpoint, sample_resumable

        shard_fn = None
        if mesh is not None:
            from ..parallel import shard_chains

            shard_fn = lambda v: shard_chains(v, mesh, axis_name=mesh.axis_names[0])
        # Fresh front-door runs default the sidecars ON (out.samples covers
        # the full run) — unless the sampler stores no draws at all, where
        # forcing True would hit sample_resumable's fail-fast contradiction
        # check; resumes pass None so sample_resumable adopts the original
        # run's setting from the checkpoint meta.
        if checkpoint_save_samples is None and not resume:
            checkpoint_save_samples = bool(sampler.params.store_samples)
        out = sample_resumable(
            sampler, x0, checkpoint_path,
            segment_iterations=checkpoint_segment_iterations,
            key=k_samp, show_progress=show_progress,
            save_samples=checkpoint_save_samples, shard_fn=shard_fn,
        )
        # done: a leftover checkpoint always means "resume"
        discard_resumable_checkpoint(ckpt_file)
        return out
    return sampler.sample(
        x0=x0, show_progress=show_progress,
        time_limit_seconds=sampling_time_limit_seconds, key=k_samp,
    )
