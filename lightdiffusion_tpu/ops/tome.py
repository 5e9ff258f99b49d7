"""Token merging (ToMe) for UNet self-attention — static-shape, TPU-native.

"Token Merging for Fast Stable Diffusion" (arXiv 2303.17604): spatial latent
tokens are highly redundant; merging the r most-similar source tokens into
their best-matching destination tokens before self-attention (and unmerging
the outputs after) cuts the attention token count with negligible visual
change at ratios ≤0.5. ABSENT in the reference (its attention cost is paid
in full by xformers, /root/reference/LightDiffusion.py:3942-3992); opt-in
accelerator here (``UNetConfig.tome_ratio``).

TPU-first design notes (vs the torch implementation's dynamic gathers):
  - destinations are a STATIC stride-2×2 grid (the paper uses a random dst
    per 2×2 window; a fixed corner is deterministic, jit-static, and was
    reported near-identical), so dst/src index sets are trace-time numpy
  - the merge count r is static (ratio × src count) — every op is
    fixed-shape
  - NO dynamic scatters anywhere (TPU scatters with computed indices
    serialize — measured 11× SLOWDOWN at 96×96 tokens in a scatter-based
    first cut). The mean-merge is a one-hot MATMUL (rides the MXU) and the
    unmerge is a sort-built inverse permutation + gather.

The merged set is [all dst (merged as means) ‖ kept src], attention runs on
it (q=k=v), and outputs map back through the inverse permutation: kept src
read their own rows, merged src read their destination's row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _grid_indices(h: int, w: int):
    """Static (dst_idx, src_idx) for a stride-2×2 dst grid on an h×w map."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    flat = (ys * w + xs).reshape(-1)
    is_dst = ((ys % 2 == 0) & (xs % 2 == 0)).reshape(-1)
    return (
        tuple(flat[is_dst].tolist()),
        tuple(flat[~is_dst].tolist()),
    )


def merge_and_unmerge(x: jnp.ndarray, h: int, w: int, ratio: float,
                      align: int = 256):
    """Build (merged_tokens, unmerge_fn) for x: (B, h·w, C).

    ``ratio``: fraction of SRC tokens (the non-dst 3/4 of the grid) to merge.
    Returns x unchanged (with identity unmerge) when the merge count rounds
    to 0. Token count of the merged set: N − r (static).

    ``align``: the merged count rounds DOWN to a multiple of this (merging
    slightly more) so the flash-attention dispatcher keeps the Pallas path —
    a non-multiple length falls back to the O(S²) XLA attention, which at
    96²-token hires sizes is catastrophically slower than no ToMe at all
    (measured 11×)."""
    b, n, c = x.shape
    assert n == h * w, (n, h, w)
    dst_t, src_t = _grid_indices(h, w)
    idx_dst = jnp.asarray(dst_t, jnp.int32)
    idx_src = jnp.asarray(src_t, jnp.int32)
    nd, ns = len(dst_t), len(src_t)
    r = int(ns * ratio)
    # only align when the merged set is in flash-attention territory
    # (the dispatcher's XLA path is the right one below ~2k tokens)
    if align > 1 and r > 0 and (n - r) >= 2048 and (n - r) % align:
        merged_n = max(nd, (n - r) // align * align)
        r = n - merged_n
    r = min(r, ns)
    if r <= 0:
        return x, lambda out: out

    def one(xb):
        """xb: (N, C) → (merged (N − r, C), inverse-permutation (N,))."""
        xf = xb.astype(jnp.float32)
        src = xf[idx_src]
        dst = xf[idx_dst]
        srcn = src * jax.lax.rsqrt(
            jnp.sum(src * src, axis=-1, keepdims=True) + 1e-12
        )
        dstn = dst * jax.lax.rsqrt(
            jnp.sum(dst * dst, axis=-1, keepdims=True) + 1e-12
        )
        scores = srcn @ dstn.T  # (Ns, Nd) cosine similarity — one MXU matmul
        node_max = scores.max(axis=1)
        node_idx = scores.argmax(axis=1).astype(jnp.int32)
        order = jnp.argsort(-node_max)  # most-similar first
        merged_sel = order[:r]
        kept_sel = order[r:]
        # mean-merge via one-hot matmul (scatter-add serializes on TPU)
        onehot = jax.nn.one_hot(node_idx[merged_sel], nd, dtype=jnp.float32)
        contrib = onehot.T @ src[merged_sel]  # (Nd, C)
        counts = jnp.sum(onehot, axis=0)  # (Nd,)
        dst_merged = (dst + contrib) / (1.0 + counts)[:, None]
        merged = jnp.concatenate(
            [dst_merged, src[kept_sel]], axis=0
        ).astype(xb.dtype)
        # inverse permutation WITHOUT scatter: pair (original position →
        # merged-set row), sort by position
        positions = jnp.concatenate(
            [idx_dst, idx_src[kept_sel], idx_src[merged_sel]]
        )
        rows = jnp.concatenate(
            [
                jnp.arange(nd, dtype=jnp.int32),
                nd + jnp.arange(ns - r, dtype=jnp.int32),
                node_idx[merged_sel],  # merged src read their dst's row
            ]
        )
        _, dest = jax.lax.sort([positions, rows], num_keys=1)
        return merged, dest

    merged, dest = jax.vmap(one)(x)

    def unmerge(out):
        """out: (B, N − r, C) attention outputs → (B, N, C): pure gather."""
        return jax.vmap(lambda ob, db: ob[db])(out, dest)

    return merged, unmerge
