"""Reliable device timing on the axon TPU relay.

``Array.block_until_ready()`` does not actually synchronize on the relayed
axon backend (observed: 58µs "wall time" for an 11ms kernel). The reliable
pattern is *chained iteration + scalar readback*: each call consumes the
previous call's output (forcing serialization on device), and timing ends
with a one-element readback which genuinely round-trips.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    """Force completion of everything x depends on (scalar readback)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[0])))


def benchmark_chained(fn, x, iters: int = 10, warmup: int = 2):
    """Time ``x = fn(x)`` per iteration. fn's output must be feedable back as
    its input (same structure). Returns seconds/iter."""
    for _ in range(warmup):
        x = fn(x)
    _sync(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _sync(x)
    return (time.perf_counter() - t0) / iters


def benchmark(fn, *args, iters: int = 10, warmup: int = 2):
    """Time ``fn(*args)`` per iteration, serializing by threading a scalar
    perturbation of the first argument through the loop (defeats both the
    async queue and any common-subexpression reuse)."""
    first = jax.tree_util.tree_leaves(args[0])[0]
    eps = jnp.zeros((), first.dtype)

    def step(eps, *a):
        a0, rest = a[0], a[1:]
        a0 = jax.tree_util.tree_map(lambda t: t + eps.astype(t.dtype), a0)
        out = fn(a0, *rest)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return (leaf.ravel()[0] * 0).astype(eps.dtype), out

    step = jax.jit(step)
    for _ in range(warmup):
        eps, out = step(eps, *args)
    _sync(eps)
    t0 = time.perf_counter()
    for _ in range(iters):
        eps, out = step(eps, *args)
    _sync(eps)
    return (time.perf_counter() - t0) / iters
