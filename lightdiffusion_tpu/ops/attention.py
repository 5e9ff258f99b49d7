"""Attention kernels: Pallas flash attention (TPU) + fused XLA fallback.

This replaces the reference's attention layer (xformers
``memory_efficient_attention`` / torch SDPA, /root/reference/LightDiffusion.py
:3942-3992 and the VAE attention at :3579-3642). The reference computes
softmax in fp32 (``_ATTN_PRECISION == "fp32"``, :3895); we keep that contract:
QK^T and the online-softmax statistics are fp32 regardless of input dtype.

Shapes: (batch, heads, seq, head_dim) throughout. SD1.5 self-attention runs
at head_dim 40/80/160 — the flash kernel pads head_dim to a lane multiple
(128) with zeros (zero columns are exact no-ops in both matmuls).

Dispatch policy (``attention``):
  - long sequences on TPU → Pallas flash kernel (never materializes S×S)
  - short sequences / CPU → XLA einsum path (fuses fine at these sizes)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def shrink_to_divisor(block: int, n: int) -> int:
    """Largest power-of-two ≤ block dividing n (1 if n is odd). Kernel block
    sizes MUST divide the sequence length — the pallas grids use integer
    division, so a non-dividing block silently drops the tail tokens."""
    block = min(block, n)
    while block > 1 and n % block:
        block //= 2
    return block


# ------------------------------------------------------------------ XLA -----
def attention_xla(q, k, v, scale: float | None = None):
    """Reference multi-head attention, fp32 softmax. (B,H,S,D),(B,H,T,D)."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


# --------------------------------------------------------------- Pallas -----
def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale, kv_steps,
                  with_lse):
    lse_ref = rest[0] if with_lse else None
    m_ref, l_ref, acc_ref = rest[-3:]
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # (block_q, d)
    k = k_ref[0, 0]  # (block_k, d)
    v = v_ref[0, 0]  # (block_k, d)

    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),  # q @ k^T
        preferred_element_type=jnp.float32,
    )
    s = s * scale  # (block_q, block_k) fp32

    m_prev = m_ref[:, :1]  # (block_q, 1)
    l_prev = l_ref[:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(kv_idx == kv_steps - 1)
    def _store():
        l_final = l_ref[:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        if with_lse:
            # logsumexp per query row — the residual the fused backward
            # needs. Stored 8-row broadcast: TPU blocks need sublane-
            # multiple shapes, so lse is (B, H, 8, S), row 0 = payload.
            m_fin = m_ref[:, 0]
            l_fin = jnp.maximum(l_ref[:, 0], 1e-30)
            lse = m_fin + jnp.log(l_fin)
            lse_ref[0, 0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[2:])


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "return_lse")
)
def flash_attention(q, k, v, scale=None, block_q: int = 1024,
                    block_k: int = 1024, return_lse: bool = False):
    """Pallas flash attention forward (non-causal, no mask).

    q: (B,H,S,D), k/v: (B,H,T,D). D is padded to a multiple of 128 inside;
    S must be divisible by block_q, T by block_k (callers guarantee this for
    SD shapes; the dispatcher falls back to XLA otherwise).
    ``return_lse``: also return the per-row logsumexp (B,H,S) — the residual
    consumed by the fused Pallas backward.
    """
    b, h, sq, d = q.shape
    t = k.shape[2]
    scale_val = float(scale) if scale is not None else 1.0 / math.sqrt(d)

    block_q = min(block_q, sq)
    block_k = min(block_k, t)

    d_pad = ((d + LANES - 1) // LANES) * LANES

    # shrink blocks until the working set fits scoped VMEM (~16MB/core on
    # v5e; budget 11MB for tiles incl. double buffering). Matters for large
    # head dims at fp32 (VAE single-head attention: d=512).
    itemsize = jnp.dtype(q.dtype).itemsize

    def vmem_bytes(bq, bk):
        tiles = (bq * d_pad + 2 * bk * d_pad) * itemsize * 2  # double-buffered
        scores = bq * bk * 4
        scratch = bq * d_pad * 4 + 2 * bq * LANES * 4
        return tiles + scores + scratch

    while vmem_bytes(block_q, block_k) > 11 * 1024 * 1024 and (
        block_q > 128 or block_k > 128
    ):
        if block_k >= block_q and block_k > 128:
            block_k //= 2
        else:
            block_q //= 2
    # block sizes must DIVIDE the sequence lengths: the grid below uses
    # integer division, so a non-dividing block SILENTLY DROPS the tail
    # tokens (ToMe-merged lengths like 2560 = 2.5·1024 hit this — found by
    # the bench's SSIM gate as NaN images)
    block_q = shrink_to_divisor(block_q, sq)
    block_k = shrink_to_divisor(block_k, t)
    # a block that shrank below 128 (without being the whole sequence)
    # means the length has no viable power-of-two divisor — a (…,1,d)
    # grid would be pathologically slow; the caller should use XLA
    if (block_q < 128 and block_q != sq) or (block_k < 128 and block_k != t):
        raise ValueError(
            f"flash_attention: no viable block divides sq={sq} t={t} "
            f"(use the XLA path)"
        )
    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    kv_steps = t // block_k
    grid = (b, h, sq // block_q, kv_steps)

    out_shape = [jax.ShapeDtypeStruct((b, h, sq, d_pad), q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d_pad),
            lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, h, 8, sq), jnp.float32))
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 8, block_q),
                lambda b, h, i, j: (b, h, 0, i),
                memory_space=pltpu.VMEM,
            )
        )

    res = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale_val, kv_steps=kv_steps,
                          with_lse=return_lse),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d_pad),
                lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_pad),
                lambda b, h, i, j: (b, h, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_pad),
                lambda b, h, i, j: (b, h, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),  # running max
            pltpu.VMEM((block_q, LANES), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    out = res[0]
    if d_pad != d:
        out = out[..., :d]
    if return_lse:
        return out, res[1][:, :, 0]  # (B, H, S)
    return out


# ------------------------------------------------------ Pallas backward -----
# FlashAttention-2 backward: never materializes the S×T score matrix.
# Residuals: (q, k, v, o, lse); delta_i = rowsum(dO_i · O_i) precomputed.
# Two kernels: dK/dV sweeps q-blocks innermost (accumulating per kv-block),
# dQ sweeps kv-blocks innermost — both recompute P = exp(S − lse) blockwise.

def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale, q_steps):
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]   # (block_q, d)
    k = k_ref[0, 0]   # (block_k, d)
    v = v_ref[0, 0]
    do = do_ref[0, 0]  # (block_q, d)
    lse = lse_ref[0, 0][0]      # row 0 of the 8-row broadcast, (block_q,)
    delta = delta_ref[0, 0][0]  # (block_q,)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                        # (block_q, block_k)
    p = jnp.exp(s - lse[:, None])
    # dV += P^T dO
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP = dO V^T ; dS = P ∘ (dP − delta) · scale
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta[:, None]) * scale
    # dK += dS^T Q
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == q_steps - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_acc, *, scale, kv_steps):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][0]
    delta = delta_ref[0, 0][0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse[:, None])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta[:, None]) * scale
    dq_acc[...] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == kv_steps - 1)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention_bwd(q, k, v, o, lse, do, scale=None,
                        block_q: int = 512, block_k: int = 512):
    """Fused Pallas backward: (q,k,v,o,lse,dO) → (dQ, dK, dV) without ever
    materializing S×T (the XLA-vjp path does, and OOMs at S=16384)."""
    b, h, sq, d = q.shape
    t = k.shape[2]
    scale_val = float(scale) if scale is not None else 1.0 / math.sqrt(d)
    block_q = min(block_q, sq)
    block_k = min(block_k, t)
    d_pad = ((d + LANES - 1) // LANES) * LANES

    itemsize = jnp.dtype(q.dtype).itemsize

    def vmem_bytes(bq, bk):
        tiles = (2 * bq * d_pad + 2 * bk * d_pad) * itemsize * 2
        scores = 3 * bq * bk * 4
        scratch = 2 * max(bq, bk) * d_pad * 4
        return tiles + scores + scratch

    while vmem_bytes(block_q, block_k) > 11 * 1024 * 1024 and (
        block_q > 128 or block_k > 128
    ):
        if block_k >= block_q and block_k > 128:
            block_k //= 2
        else:
            block_q //= 2
    # divisibility shrink — same silent-tail-drop hazard as the forward
    block_q = shrink_to_divisor(block_q, sq)
    block_k = shrink_to_divisor(block_k, t)
    if (block_q < 128 and block_q != sq) or (block_k < 128 and block_k != t):
        raise ValueError(
            f"flash_attention_bwd: no viable block divides sq={sq} t={t} "
            f"(use the XLA path)"
        )

    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        q, k, v, do = (jnp.pad(x, pad) for x in (q, k, v, do))

    delta = jnp.einsum(
        "bhsd,bhsd->bhs", do.astype(jnp.float32), o.astype(jnp.float32)
    ) if d_pad == d else jnp.einsum(
        "bhsd,bhsd->bhs", do[..., :d].astype(jnp.float32), o.astype(jnp.float32)
    )
    # 8-row broadcast layout for sublane-aligned TPU blocks (see fwd kernel)
    lse8 = jnp.broadcast_to(lse[:, :, None, :], (b, h, 8, sq))
    delta8 = jnp.broadcast_to(delta[:, :, None, :], (b, h, 8, sq))

    q_steps, kv_steps = sq // block_q, t // block_k

    def q_spec(fn):
        return pl.BlockSpec((1, 1, block_q, d_pad), fn, memory_space=pltpu.VMEM)

    def k_spec(fn):
        return pl.BlockSpec((1, 1, block_k, d_pad), fn, memory_space=pltpu.VMEM)

    def row_spec(fn):
        return pl.BlockSpec((1, 1, 8, block_q), fn, memory_space=pltpu.VMEM)

    # ---- dK/dV: grid (b, h, kv_block, q_step) ----
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale_val,
                          q_steps=q_steps),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b, h, t, d_pad), v.dtype),
        ],
        grid=(b, h, kv_steps, q_steps),
        in_specs=[
            q_spec(lambda b, h, j, i: (b, h, i, 0)),
            k_spec(lambda b, h, j, i: (b, h, j, 0)),
            k_spec(lambda b, h, j, i: (b, h, j, 0)),
            q_spec(lambda b, h, j, i: (b, h, i, 0)),
            row_spec(lambda b, h, j, i: (b, h, 0, i)),
            row_spec(lambda b, h, j, i: (b, h, 0, i)),
        ],
        out_specs=[
            k_spec(lambda b, h, j, i: (b, h, j, 0)),
            k_spec(lambda b, h, j, i: (b, h, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse8, delta8)

    # ---- dQ: grid (b, h, q_block, kv_step) ----
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale_val,
                          kv_steps=kv_steps),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d_pad), q.dtype),
        grid=(b, h, q_steps, kv_steps),
        in_specs=[
            q_spec(lambda b, h, i, j: (b, h, i, 0)),
            k_spec(lambda b, h, i, j: (b, h, j, 0)),
            k_spec(lambda b, h, i, j: (b, h, j, 0)),
            q_spec(lambda b, h, i, j: (b, h, i, 0)),
            row_spec(lambda b, h, i, j: (b, h, 0, i)),
            row_spec(lambda b, h, i, j: (b, h, 0, i)),
        ],
        out_specs=q_spec(lambda b, h, i, j: (b, h, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse8, delta8)

    if d_pad != d:
        dq, dk, dv = dq[..., :d], dk[..., :d], dv[..., :d]
    return dq, dk, dv


# --------------------------------------------------- differentiable wrap ----
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale):
    return flash_attention(q, k, v, scale=scale)


def _flash_diff_fwd(q, k, v, scale):
    o, lse = flash_attention(q, k, v, scale=scale, return_lse=True)
    return o, (q, k, v, o, lse)


def _flash_diff_bwd(scale, res, g):
    q, k, v, o, lse = res
    return flash_attention_bwd(q, k, v, o, lse, g, scale=scale)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


# ------------------------------------------------------------- dispatch -----
def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def _auto_flash(b: int, h: int, sq: int, t: int, d: int) -> bool:
    """Flash-vs-XLA crossover rule, measured in-scan on v5e
    (scratch/attn_crossover.py, marginal rate between scan lengths so relay
    dispatch cancels):

    - s>=2048: flash wins 1.8-2.7x and is the only option at 16384 tokens
      (XLA OOMs materializing S×S).
    - s=1024: flash wins 2.6-2.8x once the (batch·heads) grid is large
      (b·h=40, SDXL's 32² stage: XLA 491us vs flash 187us) and 1.5x at
      d=80 (SD1.5 32²: XLA pads 80→128 lanes; 133us vs 88us); XLA keeps
      a 1.2-1.4x edge only at small grids with MXU-aligned d (b·h=16,
      d∈{64,128}).
    - s<=512: XLA wins everywhere (2-3x) — grid too small to fill.
    """
    return (
        sq % 256 == 0
        and t % 256 == 0
        and (sq >= 2048 or (sq >= 1024 and (b * h >= 32 or d % 64 != 0)))
    )


def attention(q, k, v, scale=None, force: str | None = None):
    """Multi-head attention dispatcher. q:(B,H,S,D) k/v:(B,H,T,D) → (B,H,S,D).

    ``force``: None (auto) | 'xla' | 'flash'.
    """
    if force not in (None, "xla", "flash"):
        raise ValueError(
            f"unknown attention force {force!r}; use 'xla' or 'flash'"
        )
    use_flash = (
        force == "flash"
        if force
        else (
            _on_tpu()
            and _auto_flash(q.shape[0], q.shape[1], q.shape[2], k.shape[2],
                            q.shape[3])
        )
    )
    if use_flash:
        scale_val = float(scale) if scale is not None else 1.0 / math.sqrt(q.shape[-1])
        return _flash_diff(q, k, v, scale_val)
    return attention_xla(q, k, v, scale=scale)


def attention_heads_last(q, k, v, num_heads: int, scale=None, force=None):
    """Attention over (B, S, C) tensors with C = heads*head_dim (the
    transformer-block layout, ref LightDiffusion.py:3966-3978)."""
    b, s, c = q.shape
    t = k.shape[1]
    d = c // num_heads

    def split(x, length):
        return x.reshape(b, length, num_heads, d).transpose(0, 2, 1, 3)

    out = attention(split(q, s), split(k, t), split(v, t), scale=scale, force=force)
    return out.transpose(0, 2, 1, 3).reshape(b, s, c)
