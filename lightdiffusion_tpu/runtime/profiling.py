"""Profiling / tracing utilities.

The reference has NO profiler (SURVEY §5.1 — tqdm loops only). TPU-native
observability: jax.profiler xplane traces viewable in TensorBoard/Perfetto,
plus compiled-program cost introspection (FLOPs / bytes from XLA itself).
"""

from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ldt_trace"):
    """Capture an XLA profiler trace: ``with trace(): run_workload()``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)


def cost_analysis(fn, *args):
    """Compile fn and return XLA's cost analysis (flops, bytes accessed)."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return cost


@contextlib.contextmanager
def timed(name: str):
    t0 = time.perf_counter()
    yield
    log.info("%s: %.1f ms", name, (time.perf_counter() - t0) * 1e3)
