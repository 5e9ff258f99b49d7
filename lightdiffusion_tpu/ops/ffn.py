"""Fused GEGLU feed-forward block for the UNet transformer:
out = x + geglu(layer_norm(x) @ W1) @ W2.

XLA runs the FF slice through HBM three times (LN out, the (M, 2*inner)
projection, the residual read-back); this Pallas kernel keeps the row
block resident in VMEM for the whole chain — LN at n==0, inner-dim tiles
accumulated in fp32, residual + bias epilogue at the last tile — so the
2*inner intermediate and the normalized activations never leave VMEM.

Dispatch is empirically gated (scratch/ffn_gate_tune.py, in-scan marginal
UNet-step timing on v5e): the SAME (M, C) kernel cell wins inside one
surrounding program and loses inside another — e.g. (M=8192, C=640) is a
win inside the SD1.5 512^2 CFG-batch-8 step but a loss inside the SDXL
1024^2 CFG-batch-2 step — so no per-call shape rule can separate them;
what decides is how saturated the surrounding program keeps the chip.
Measured regime table (ms/step off -> all-fused):

  SD1.5 512^2 B8  64.8 -> 60.8  (+6.6%)   <- the only winning regime
  SD1.5 512^2 B2  20.7 -> 23.0  (-11%)
  SD1.5 1024^2 B2 150.1 -> 160.4 (-6.4%)
  SDXL 1024^2 B2  120.4 -> 124.2 (-3.1%)
  SDXL 1024^2 B8  453.1 -> 455.0 (neutral)

The winning cells are exactly {CFG batch >= 8, per-sample token volume
S*C <= 4096*320}; the gate encodes that (plus block viability: >= 8 row
tiles of bm >= 512, VMEM-budgeted).

gelu is exact (erf) via Eigen's fp32 rational polynomial — the same one
XLA lowers fp32 erf to — because erf/erfc have no Pallas TPU lowering.
The fp32 LN/gate/accumulate make the fused path slightly MORE precise
than the bf16 XLA composition (rel delta ~5e-3 at bf16).

Backward = the XLA composition's VJP via custom_vjp (training unchanged).

Reference parity target: GEGLU feed-forward in BasicTransformerBlock
(/root/reference/LightDiffusion.py:4508-4530).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["geglu_ffn_block", "fused_ffn_viable", "fused_ffn_applicable",
           "set_fused_ffn", "fused_ffn_enabled"]

_ENABLED = True
_MIN_ROW_TILES = 8
# regime gate (see module docstring): fuse only at CFG batch >= 8 and
# per-sample token volume S*C <= 4096*320 — the measured winning cells
_MIN_BATCH = 8
_MAX_TOKEN_VOLUME = 4096 * 320


def set_fused_ffn(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def fused_ffn_enabled() -> bool:
    return _ENABLED


def _erf_f32(x):
    """Eigen generic_fast_erf_float (~1e-7 abs err; what XLA lowers fp32
    erf to). Pallas TPU has no erf/erfc primitive."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    a = jnp.float32(-2.72614225801306e-10)
    a = a * x2 + jnp.float32(2.77068142495902e-08)
    a = a * x2 + jnp.float32(-2.10102402082508e-06)
    a = a * x2 + jnp.float32(-5.69250639462346e-05)
    a = a * x2 + jnp.float32(-7.34990630326855e-04)
    a = a * x2 + jnp.float32(-2.95459980854025e-03)
    a = a * x2 + jnp.float32(-1.60960333262415e-02)
    a = a * x
    b = jnp.float32(-1.45660718464996e-05)
    b = b * x2 + jnp.float32(-2.13374055278905e-04)
    b = b * x2 + jnp.float32(-1.68282697438203e-03)
    b = b * x2 + jnp.float32(-7.37332916720468e-03)
    b = b * x2 + jnp.float32(-1.42647390514189e-02)
    return a / b


def _kernel(x_ref, g_ref, gb_ref, w1a_ref, w1g_ref, b1a_ref, b1g_ref,
            w2_ref, b2_ref, o_ref, acc_ref, xn_ref, *, n_steps, eps):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _init():
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + jnp.float32(eps))
        xn = (xn * g_ref[0, :].astype(jnp.float32)
              + gb_ref[0, :].astype(jnp.float32))
        xn_ref[:] = xn.astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = xn_ref[:]
    u = jnp.dot(x, w1a_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(x, w1g_ref[:], preferred_element_type=jnp.float32)
    u = u + b1a_ref[0, :].astype(jnp.float32)
    v = v + b1g_ref[0, :].astype(jnp.float32)
    gelu = 0.5 * v * (1.0 + _erf_f32(v * jnp.float32(0.7071067811865476)))
    g = (u * gelu).astype(x.dtype)
    acc_ref[:] += jnp.dot(g, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(n == n_steps - 1)
    def _done():
        o_ref[:] = (x_ref[:].astype(jnp.float32) + acc_ref[:]
                    + b2_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_blocks(M, C, inner, itemsize):
    """Largest (bm, bn) dividing (M, inner) whose working set fits VMEM
    AND leaves >= _MIN_ROW_TILES row tiles (with only 2-4 row tiles the
    grid can't pipeline the weight streams and the kernel loses to XLA's
    producer fusion in-context — measured, scratch/ffn_e2e.py).
    bm=1024 measured fastest wherever it fits; bn=256 keeps the weight
    streams small. bm below 512 is never considered: tiny row blocks can
    manufacture >=8 tiles at small M (e.g. SDXL's M=2048 depth-10 level)
    but that regime measured a net loss — those shapes belong to XLA."""
    for bm in (1024, 512):
        if M % bm or (M // bm) < _MIN_ROW_TILES:
            continue
        for bn in (256, 512, 128):
            if inner % bn:
                continue
            est = (
                2 * bm * C * itemsize        # x in (double-buffered)
                + bm * C * itemsize          # xn scratch
                + 2 * 2 * C * bn * itemsize  # w1a+w1g streams
                + 2 * bn * C * itemsize      # w2 stream
                + bm * C * 4                 # fp32 acc scratch
                + 2 * bm * bn * 4            # u, v
                + 2 * bm * C * itemsize      # out (double-buffered)
            )
            if est <= 12 * 1024 * 1024:
                return bm, bn
    return None


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "eps", "interpret"))
def _ffn_pallas(x, g, gb, w1, b1, w2, b2, bm, bn, eps, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    M, C = x.shape
    inner = w2.shape[0]
    w1a, w1g = w1[:, :inner], w1[:, inner:]
    # biases/gains as 2-D (1, n): 1-D operands hit Mosaic tiling mismatches
    b1a, b1g = b1[None, :inner], b1[None, inner:]
    g, gb, b2 = g[None, :], gb[None, :], b2[None, :]
    n_steps = inner // bn
    return pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps, eps=eps),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        grid=(M // bm, n_steps),
        in_specs=[
            pl.BlockSpec((bm, C), lambda i, n: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bn), lambda i, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bn), lambda i, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, C), lambda i, n: (n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, C), lambda i, n: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, C), jnp.float32),
                        pltpu.VMEM((bm, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, g, gb, w1a, w1g, b1a, b1g, w2, b2)


def _xla_block(x, g, gb, w1, b1, w2, b2, eps):
    """The reference composition: LN -> linear -> gelu gate -> linear ->
    residual, with the package's dtype semantics (fp32 LN stats, bf16
    matmuls when x is bf16)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = (xn * g.astype(jnp.float32) + gb.astype(jnp.float32)).astype(x.dtype)
    proj = jnp.dot(xn, w1) + b1.astype(x.dtype)
    a, gate = jnp.split(proj, 2, axis=-1)
    h = a * jax.nn.gelu(gate, approximate=False)
    return x + jnp.dot(h, w2) + b2.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ffn_fused(x, g, gb, w1, b1, w2, b2, blocks, eps):
    return _ffn_pallas(x, g, gb, w1, b1, w2, b2,
                       bm=blocks[0], bn=blocks[1], eps=eps)


def _ffn_fused_fwd(x, g, gb, w1, b1, w2, b2, blocks, eps):
    return _ffn_fused(x, g, gb, w1, b1, w2, b2, blocks, eps), (
        x, g, gb, w1, b1, w2, b2)


def _ffn_fused_bwd(blocks, eps, res, ct):
    x, g, gb, w1, b1, w2, b2 = res
    _, pullback = jax.vjp(
        functools.partial(_xla_block, eps=eps), x, g, gb, w1, b1, w2, b2)
    return pullback(ct)


_ffn_fused.defvjp(_ffn_fused_fwd, _ffn_fused_bwd)


def fused_ffn_viable(M, C, inner, itemsize) -> bool:
    return _pick_blocks(M, C, inner, itemsize) is not None


def fused_ffn_applicable(B, S, C, inner, itemsize) -> bool:
    """Full dispatch rule: regime gate (batch/token-volume, module
    docstring) + block viability."""
    return (
        B >= _MIN_BATCH
        and S * C <= _MAX_TOKEN_VOLUME
        and fused_ffn_viable(B * S, C, inner, itemsize)
    )


def geglu_ffn_block(p_ln: dict, p_in: dict, p_out: dict, x, policy,
                    eps: float = 1e-5, force=None):
    """x + GEGLU-FF(LayerNorm(x)) over (B, S, C) tokens, with dispatch:
    fused Pallas kernel on TPU in the measured winning regime, else the
    plain LN/linear/geglu/linear composition (also the int8 and CPU
    path). ``force="xla"`` pins the composition — mesh/multichip programs
    use it (like attn_force) because Pallas custom calls don't partition
    under GSPMD."""
    from . import layers as L

    if (
        _ENABLED
        and force != "xla"
        and "weight_q8" not in p_in
        and "weight_q8" not in p_out
        and jax.default_backend() not in ("cpu", "gpu")
        and p_in.get("bias") is not None
        and p_out.get("bias") is not None
    ):
        B, S, C = x.shape
        inner = p_out["weight"].shape[0]
        dt = policy.compute_dtype
        itemsize = jnp.dtype(dt).itemsize
        blocks = (
            _pick_blocks(B * S, C, inner, itemsize)
            if B >= _MIN_BATCH and S * C <= _MAX_TOKEN_VOLUME
            else None
        )
        if blocks is not None:
            y = _ffn_fused(
                x.reshape(B * S, C).astype(dt),
                p_ln["weight"].astype(jnp.float32),
                p_ln["bias"].astype(jnp.float32),
                p_in["weight"].astype(dt),
                p_in["bias"].astype(dt),
                p_out["weight"].astype(dt),
                p_out["bias"].astype(dt),
                blocks,
                eps,
            )
            return y.reshape(B, S, C)
    return x + L.linear(
        p_out, L.geglu(p_in, L.layer_norm(p_ln, x, eps=eps, policy=policy),
                       policy), policy)
