"""Device mesh + sharding policies.

The reference is single-GPU with a CPU-offload manager
(/root/reference/LightDiffusion.py:1362-2265) and has NO distributed layer
(SURVEY.md §2.14/§5.8). This module is the TPU-native scaling design instead:

  - a 2D ``Mesh`` with axes ("dp", "tp"): data parallel over batch (ICI
    all-reduce free at inference; psum of grads in training), tensor parallel
    over attention heads / MLP hidden (Megatron-style column→row sharding —
    XLA/GSPMD inserts the reduce at the row-parallel output).
  - param/activation PartitionSpecs derived from the param-tree structure, so
    any UNet/CLIP/VAE config shards without per-model code.

Sequence/context parallelism is unnecessary at SD sequence lengths (≤16k,
SURVEY §5.7); spatial tiling (USDU/ESRGAN tiles) shards as extra batch on
"dp". There is no MoE in the model family → no expert parallelism.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp is None:
        n_dp = n // n_tp
    assert n_dp * n_tp <= n, (n_dp, n_tp, n)
    grid = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(grid, axis_names=("dp", "tp"))


# --------------------------------------------------------------- policies ---
_COL_PARALLEL = {"to_q", "to_k", "to_v", "ff_in", "q", "k", "v", "fc1"}
_ROW_PARALLEL = {"to_out", "ff_out", "out", "fc2"}


def _spec_for(path, leaf) -> P:
    """Megatron-style TP sharding by param name; everything else replicated."""
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    parent = None
    for n in reversed(names):
        if n in _COL_PARALLEL or n in _ROW_PARALLEL:
            parent = n
            break
    leafname = names[-1]
    if parent and leaf.ndim == 2 and leafname in ("weight", "weight_q8"):
        return P(None, "tp") if parent in _COL_PARALLEL else P("tp", None)
    if (
        parent
        and leaf.ndim == 1
        and leafname in ("bias", "w_scale")
        and parent in _COL_PARALLEL
    ):
        return P("tp")
    return P()


def param_specs(params):
    """Pytree of PartitionSpec matching a model param tree."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params(params, mesh: Mesh):
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis on dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
