"""Functional NN primitives with a TPU dtype policy.

Replaces the reference's cast-on-forward op layer
(``disable_weight_init`` / ``manual_cast`` / ``cast_bias_weight``,
/root/reference/LightDiffusion.py:2342-2429). On TPU the idiom collapses to a
*policy*: params are stored in ``param_dtype`` (bf16 in HBM), compute runs in
``compute_dtype``, and normalization statistics accumulate in fp32. All
functions take an explicit params dict — the whole model is a pytree, so
``jax.jit``/``pjit`` see pure functions.

Layouts (TPU-native, NOT torch):
  linear weight   (in, out)        — matmul-ready, MXU-friendly
  conv2d kernel   (kh, kw, in, out) — HWIO for NHWC convs
  activations     NHWC
Checkpoint ingestion (loader/state_dict.py) transposes torch layouts once at
load time.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy: what's stored vs what's computed."""

    param_dtype: Any = jnp.bfloat16
    compute_dtype: Any = jnp.bfloat16
    norm_dtype: Any = jnp.float32  # statistics accumulate here
    # "xla" pins convs to the XLA emitter (no Pallas dispatch). Mesh/SPMD
    # programs must set this: pallas_call does not partition under GSPMD,
    # like attn_force on UNetConfig (SDPipeline pins both when mesh!=None).
    conv_force: Any = None

    def cast_in(self, x):
        return x.astype(self.compute_dtype)


FP32 = Policy(jnp.float32, jnp.float32, jnp.float32)
BF16 = Policy(jnp.bfloat16, jnp.bfloat16, jnp.float32)
DEFAULT_POLICY = BF16


# ---------------------------------------------------------------- linear ----
def linear(params: dict, x: jnp.ndarray, policy: Policy = DEFAULT_POLICY):
    if "weight_q8" in params:  # W8A8 path (ops/quant.py), opt-in at load
        from .quant import linear_q8

        return linear_q8(params, x, compute_dtype=policy.compute_dtype)
    w = params["weight"].astype(policy.compute_dtype)
    y = jnp.dot(x.astype(policy.compute_dtype), w)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def init_linear(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(d_in)
    p = {"weight": jax.random.uniform(k1, (d_in, d_out), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


# ---------------------------------------------------------------- conv2d ----
def conv2d(
    params: dict,
    x: jnp.ndarray,
    stride: int = 1,
    padding="SAME",
    policy: Policy = DEFAULT_POLICY,
):
    """NHWC conv with HWIO kernel. padding: 'SAME' | 'VALID' | explicit list."""
    if "weight_q8" in params:  # W8A8 path (ops/quant.py), opt-in at load
        from .quant import conv2d_q8

        return conv2d_q8(params, x, stride=stride, padding=padding,
                         compute_dtype=policy.compute_dtype)
    w = params["weight"].astype(policy.compute_dtype)
    xc = x.astype(policy.compute_dtype)
    b = params.get("bias")

    from . import conv_pallas as _cp

    if (
        _cp.pallas_conv_enabled()
        and policy.conv_force != "xla"
        and jax.default_backend() not in ("cpu", "gpu")
        and _cp.pallas_conv_viable(xc.shape, w.shape, stride, padding,
                                   itemsize=xc.dtype.itemsize)
    ):
        bb = (b.astype(policy.compute_dtype) if b is not None
              else jnp.zeros((w.shape[-1],), policy.compute_dtype))
        return _cp.conv3x3_same(xc, w, bb)

    y = jax.lax.conv_general_dilated(
        xc,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=policy.compute_dtype,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def init_conv2d(key, kh, kw, c_in, c_out, bias=True, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(kh * kw * c_in)
    p = {"weight": jax.random.uniform(k1, (kh, kw, c_in, c_out), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((c_out,), dtype)
    return p


# ----------------------------------------------------------------- norms ----
def group_norm(
    params: dict,
    x: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    policy: Policy = DEFAULT_POLICY,
):
    """GroupNorm over NHWC (stats in fp32). x: (..., H, W, C) or (..., L, C).

    TPU-shaped: the big-tensor passes stay CHANNEL-LAST the whole way. A
    naive (B,...,g,c/g) reshape splits the 128-lane channel axis and forces
    relayouts of the full activation (measured 90 GB/s effective on a
    512x512x128 tensor — 9x off HBM bandwidth, and the single largest cost
    in VAE decode). Instead: reduce per-channel moments over spatial dims
    (one fused pass — XLA computes sum and sum-of-squares together), do the
    group averaging on the tiny (B, C) stats, and fold mean/rstd/affine
    into ONE per-channel scale+shift FMA over the activation."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    g = num_groups
    xf = x.astype(policy.norm_dtype)
    spatial = tuple(range(1, xf.ndim - 1))
    s1 = xf.mean(axis=spatial)  # (B, C)
    s2 = jnp.square(xf).mean(axis=spatial)  # (B, C); fused with s1's pass
    s1 = s1.reshape(s1.shape[0], g, c // g).mean(axis=-1)  # (B, g)
    s2 = s2.reshape(s2.shape[0], g, c // g).mean(axis=-1)
    # E[x^2] - E[x]^2 in fp32: GN inputs are activation-scaled, so the
    # cancellation error is ~ulp(mean^2) — far below the bf16 output grid
    var = jnp.maximum(s2 - jnp.square(s1), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(s1, c // g, axis=-1)  # (B, C)
    rstd_c = jnp.repeat(rstd, c // g, axis=-1)
    w = params["weight"].astype(policy.norm_dtype)
    b = params["bias"].astype(policy.norm_dtype)
    scale = rstd_c * w  # (B, C)
    shift = b - mean_c * scale
    bshape = (x.shape[0],) + (1,) * (xf.ndim - 2) + (c,)
    out = xf * scale.reshape(bshape) + shift.reshape(bshape)
    return out.astype(orig_dtype)


def layer_norm(
    params: dict, x: jnp.ndarray, eps: float = 1e-5, policy: Policy = DEFAULT_POLICY
):
    orig_dtype = x.dtype
    xf = x.astype(policy.norm_dtype)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * params["weight"].astype(policy.norm_dtype) + params["bias"].astype(
        policy.norm_dtype
    )
    return out.astype(orig_dtype)


def init_norm(c: int, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ----------------------------------------------------------- activations ----
def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def silu(x):
    return jax.nn.silu(x)


def geglu(params: dict, x: jnp.ndarray, policy: Policy = DEFAULT_POLICY):
    """GEGLU: one projection to 2×dim, gate with gelu (ref LightDiffusion.py:4508)."""
    proj = linear(params, x, policy)
    a, gate = jnp.split(proj, 2, axis=-1)
    return a * jax.nn.gelu(gate, approximate=False)


# ------------------------------------------------------------- embedding ----
def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray, policy: Policy = DEFAULT_POLICY):
    return table.astype(policy.compute_dtype)[ids]


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (ref LightDiffusion.py:803-812). fp32."""
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
