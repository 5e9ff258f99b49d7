"""Pallas TPU kernel for 3x3 stride-1 SAME convolution (NHWC, HWIO).

XLA's conv emitter leaves 1.4-1.8x on the table at the VAE decoder's
large-spatial shapes (55-93 TF/s measured on v5e at 512^2x128/256 — see
NOTES_ROUND3 "VAE decode + GroupNorm findings"); this kernel reaches
90-200 TF/s (scratch/conv3x3_pallas2.py) by turning the conv into nine
row-shifted (W, Cin) @ (Cin, Cout) MXU matmuls accumulated in fp32.

Design (the only formulation that lowers on current Mosaic):
- grid = (B, H): one output ROW per program. Mosaic pipelines the row DMAs
  across grid steps, so single-row blocks are not overhead-bound (measured
  faster than multi-row blocks at every shape, which blow VMEM instead).
- row halo: the padded input is passed THREE times with block row size 1
  and index maps (b, i) -> (b, i + dy); block index == row index, so the
  +1/+2 row offsets are legal Blocked indexing (pl.Element does not lower
  on TPU Mosaic, and materializing shifted copies costs 3x HBM).
- column halo: blocks carry the full padded width W+2; the dx in {0,1,2}
  shifts are in-VMEM sublane slices.
- accumulation in an fp32 VMEM scratch; output cast to the input dtype.

Backward: registered as a custom_vjp whose backward pass is the VJP of the
equivalent XLA conv — forward speed where it matters (inference), exact
well-tested gradients for the training path.

Reference parity target: torch F.conv2d(padding=1) as used throughout the
reference VAE/UNet (/root/reference/LightDiffusion.py:5155,5189-5287).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_same", "pallas_conv_viable", "set_pallas_conv",
           "pallas_conv_enabled"]

# Global opt-out (tests flip it to pin the XLA path; default on — the
# dispatch gate already restricts to measured-win shapes on TPU).
_ENABLED = True


def set_pallas_conv(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def pallas_conv_enabled() -> bool:
    return _ENABLED


def _kernel(x0, x1, x2, w_ref, b_ref, o_ref, acc_ref, *, W, cin, cout):
    # x_dy: (1, 1, W+2, cin) padded input rows i+dy; w: (9*cin, cout)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy, xr in enumerate((x0, x1, x2)):
        for dx in range(3):
            xs = xr[0, 0, dx : dx + W, :]
            wk = w_ref[(dy * 3 + dx) * cin : (dy * 3 + dx + 1) * cin, :]
            acc_ref[:] += jnp.dot(xs, wk, preferred_element_type=jnp.float32)
    out = acc_ref[:] + b_ref[:].astype(jnp.float32)
    o_ref[:] = out.reshape(1, 1, W, cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_fwd(x, w, b, interpret=None):
    if interpret is None:
        # auto: interpret-mode off-TPU so CPU tests can exercise the full
        # custom_vjp path on tiny shapes (L.conv2d never dispatches here
        # on CPU — the gate is TPU-only)
        interpret = jax.default_backend() in ("cpu", "gpu")
    B, H, W, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * cin, cout)

    def spec(dy):
        return pl.BlockSpec(
            (1, 1, W + 2, cin),
            functools.partial(lambda bb, i, dy: (bb, i + dy, 0, 0), dy=dy),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(_kernel, W=W, cin=cin, cout=cout),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        grid=(B, H),
        in_specs=[
            spec(0),
            spec(1),
            spec(2),
            pl.BlockSpec((9 * cin, cout), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda bb, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, W, cout), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xp, xp, xp, wf, b)


def _xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + b.astype(y.dtype)


@jax.custom_vjp
def conv3x3_same(x, w, b):
    """3x3 stride-1 SAME conv: x (B,H,W,Cin), w (3,3,Cin,Cout), b (Cout,).

    Pallas forward on TPU; gradients via the equivalent XLA conv's VJP.
    Call ``pallas_conv_viable`` first — this function assumes the shape
    already passed the dispatch gate.
    """
    return _conv3x3_fwd(x, w, b)


def _vjp_fwd(x, w, b):
    return _conv3x3_fwd(x, w, b), (x, w, b)


def _vjp_bwd(res, g):
    x, w, b = res
    _, pullback = jax.vjp(_xla_conv, x, w, b)
    return pullback(g)


conv3x3_same.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_conv_viable(x_shape, w_shape, stride, padding,
                       itemsize=2) -> bool:
    """Dispatch gate for routing L.conv2d through the Pallas kernel.

    Measured rules (scratch/conv3x3_pallas2.py + conv_e2e_check.py, v5e,
    bf16 and fp32):
    - 3x3, stride 1, SAME only (the kernel's contract).
    - W >= 128: W is the per-row matmul M dimension; W=64 underfills the
      MXU (64^2 shapes lose 0.6-0.8x).
    - lane-aligned channels (cin, cout % 128 == 0) win 1.37-1.79x at every
      H*W >= 128^2 decoder shape; 320/640-wide UNet channels measured
      ~1.0x (XLA already at 115-120 TF/s there) so they stay on XLA.
    - 64-divisible channels (ESRGAN/TAESD 64-wide bodies) win 1.22x at
      image resolution, where XLA collapses to 18 TF/s — allowed only at
      H*W >= 512^2.
    - the whole working set must fit the 16 MB VMEM scope. Mosaic's real
      allocation (buffered row blocks for the three shifted views, the
      double-buffered output, the fp32 accumulator, resident weights, and
      kernel stack temporaries) measured 16.4 MB — an OOM — at the SDXL
      decoder's fp32 1024^2 x 256->256 conv while fp32 256^2 x 512->512
      passed at ~16 MB, so the estimate below is capped at 14 MB for
      margin. This keeps every measured-win shape except fp32 512-wide
      (marginal), and admits the fp32 1024^2 x 128 SDXL decode tail.
    """
    if len(w_shape) != 4 or w_shape[0] != 3 or w_shape[1] != 3:
        return False
    if stride != 1:
        return False
    if padding != "SAME" and padding != [(1, 1), (1, 1)] \
            and padding != ((1, 1), (1, 1)):
        return False
    B, H, W, cin = x_shape
    cout = w_shape[-1]
    if W < 128:
        return False
    s = itemsize
    vmem_est = (
        9 * (W + 2) * cin * s          # row blocks of the 3 shifted views
        + W * cout * (2 * s + 4)       # double-buffered out + fp32 acc
        + 9 * cin * cout * s           # resident weights
        + 2 * W * max(cin, cout) * 4   # kernel stack temporaries
    )
    if vmem_est > 14 * 1024 * 1024:
        return False
    if cin % 128 == 0 and cout % 128 == 0:
        return H * W >= 128 * 128
    if cin % 64 == 0 and cout % 64 == 0 and cin <= 128 and cout <= 128:
        return H * W >= 512 * 512
    return False
