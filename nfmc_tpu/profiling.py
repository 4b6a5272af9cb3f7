"""Profiler integration (SURVEY.md section 5: the reference's only tracing is
wall-clock accounting + tqdm postfix, ``mcmc/base.py:73,98-99``; this is the
promised superset).

Counters (``MCMCStatistics``) remain the always-on observability layer; for
op-level timelines wrap any region in :func:`trace` and open the dump with
TensorBoard's profile plugin or Perfetto:

    import nfmc_tpu
    with nfmc_tpu.profiling.trace("/tmp/nfmc-trace"):
        out = sampler.sample(x0, show_progress=False)

Label host-side phases (warmup / flow refits / jumps) with :func:`annotate`
so they show up as named spans inside the trace:

    with nfmc_tpu.profiling.annotate("flow-refit"):
        flow.fit(x_train, ...)
"""
from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path


@contextmanager
def trace(log_dir, create_perfetto_link: bool = False, create_perfetto_trace: bool = False):
    """Capture a JAX/XLA profiler trace of the enclosed region to ``log_dir``.

    Thin wrapper over ``jax.profiler.trace`` that creates the directory and
    returns its path; view with ``tensorboard --logdir <log_dir>`` (profile
    plugin) or, with ``create_perfetto_trace=True``, open the generated
    ``.perfetto-trace`` file at ui.perfetto.dev.
    """
    import jax

    path = Path(log_dir)
    path.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(
        str(path),
        create_perfetto_link=create_perfetto_link,
        create_perfetto_trace=create_perfetto_trace,
    ):
        yield path


def annotate(name: str):
    """Named span visible in profiler traces (``jax.profiler.TraceAnnotation``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def start_server(port: int = 9999):
    """Start the on-demand profiling server (connect live from TensorBoard)."""
    import jax

    return jax.profiler.start_server(port)
