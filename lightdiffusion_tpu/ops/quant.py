"""Opt-in W8A8 int8 quantization for the UNet inference path.

The bf16 sampling loop sits at the v5e MXU roofline (NOTES_ROUND1), so the
one remaining *hardware* lever is the int8 MXU path: measured on this chip,
s8×s8→s32 matmul sustains ~209 TOP/s vs ~139 TFLOP/s for bf16 in the same
harness (~1.5× observed; the nominal ratio is 2×). This module quantizes the
UNet's matmul/conv weights to per-output-channel symmetric int8 at load time
and quantizes activations dynamically (per-token for linears, per-image for
convs), accumulating in int32 on the MXU.

No parallel in the reference — its low-precision story stops at fp16
(/root/reference/LightDiffusion.py:6418-6423). Method follows the standard
W8A8 recipe (SmoothQuant, arXiv 2211.10438; Q-Diffusion, arXiv 2302.04304):

  - weights: symmetric per-output-channel absmax int8 (offline, at load)
  - activations: symmetric dynamic absmax — per token for linears (scale
    factors out of the contraction over the feature axis), per image for
    convs (factors out of the kh·kw·cin contraction)
  - first conv (conv_in), final conv (out_conv), all norms, and the
    time/label-embedding MLPs stay in the bf16 policy path (the standard
    "keep boundary layers high-precision" rule)
  - attention itself (softmax·V) stays bf16 through the Pallas flash kernel;
    only the q/k/v/out projections quantize

Quantized layer dicts carry ``weight_q8`` (int8) + ``w_scale`` (f32,
per-out-channel) instead of ``weight``; ``ops.layers.linear``/``conv2d``
dispatch on that, so every model/program path (sampling scans, DeepCache,
chunked, tiled) runs quantized with no call-site changes — replacing
``sd.unet_params`` re-specializes the jit programs automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _absmax_scale(x: jnp.ndarray, axes, eps: float = 1e-8) -> jnp.ndarray:
    """Symmetric absmax scale s such that x/s fits int8: s = max|x|/127."""
    s = jnp.max(jnp.abs(x), axis=axes, keepdims=True) / 127.0
    return jnp.maximum(s, eps)


def _to_int8(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)


# -------------------------------------------------------------- weights ----
def quantize_linear_params(p: dict) -> dict:
    """{"weight" (in,out)[, "bias"]} → {"weight_q8", "w_scale"[, "bias"]}."""
    w = p["weight"].astype(jnp.float32)
    s = _absmax_scale(w, axes=0)  # (1, out)
    q = {"weight_q8": _to_int8(w, s), "w_scale": s[0]}  # w_scale: (out,)
    if "bias" in p:
        q["bias"] = p["bias"]
    return q


def quantize_conv_params(p: dict) -> dict:
    """{"weight" (kh,kw,in,out)[, "bias"]} → int8 + per-out-channel scale."""
    w = p["weight"].astype(jnp.float32)
    s = _absmax_scale(w, axes=(0, 1, 2))  # (1,1,1,out)
    q = {"weight_q8": _to_int8(w, s), "w_scale": s[0, 0, 0]}  # (out,)
    if "bias" in p:
        q["bias"] = p["bias"]
    return q


# --------------------------------------------------------------- applies ----
def linear_q8(p: dict, x: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """y = dequant(int8(x) @ weight_q8) + bias. Per-token activation scale."""
    xf = x.astype(jnp.float32)
    s_x = _absmax_scale(xf, axes=-1)  # (..., 1)
    xq = _to_int8(xf, s_x)
    acc = jax.lax.dot_general(
        xq,
        p["weight_q8"],
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * p["w_scale"].astype(jnp.float32)
    y = y.astype(compute_dtype)
    b = p.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv2d_q8(p: dict, x: jnp.ndarray, stride=1, padding="SAME",
              compute_dtype=jnp.bfloat16):
    """NHWC int8 conv with per-image activation scale (factors out of the
    spatial+channel contraction)."""
    xf = x.astype(jnp.float32)
    s_x = _absmax_scale(xf, axes=(1, 2, 3))  # (B,1,1,1)
    xq = _to_int8(xf, s_x)
    acc = jax.lax.conv_general_dilated(
        xq,
        p["weight_q8"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * p["w_scale"].astype(jnp.float32)
    y = y.astype(compute_dtype)
    b = p.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# ------------------------------------------------------------- transform ----
# Param-dict names never quantized: embedding MLPs are per-image (negligible
# FLOPs, quality-sensitive), norms are not matmuls.
_SKIP_NAMES = frozenset(
    {"time_fc1", "time_fc2", "label_fc1", "label_fc2", "emb"}
)


def _is_layer_dict(node) -> bool:
    return isinstance(node, dict) and "weight" in node and not isinstance(
        node["weight"], dict
    )


def quantize_unet_params(params: dict, quantize_convs: bool = True) -> dict:
    """Quantize a UNet param tree (models/unet.py layout) to W8A8 form.

    Quantizes every linear/conv leaf dict except: conv_in (input_blocks[0]),
    out_conv, resblock time-emb projections, the time/label MLPs, and norms.
    LoRA/TI must be merged BEFORE quantizing (the merge is fp32 host-side).
    ``quantize_convs=False`` restricts to linears (transformer projections).
    """

    def walk(node, path):
        if _is_layer_dict(node):
            name = path[-1] if path else None
            if name in _SKIP_NAMES:
                return node
            # The FINAL projection is the top-level "out_conv"; resblocks'
            # second 3x3 conv shares the name but carries ~half the conv
            # FLOPs and MUST quantize — skip by path, not by name.
            if name == "out_conv" and len(path) == 1:
                return node
            w = node["weight"]
            if w.ndim == 2:
                return quantize_linear_params(node)
            if w.ndim == 4:
                if not quantize_convs:
                    return node
                # conv_in: first input block's conv — keep high precision
                if len(path) >= 2 and path[0] == "input_blocks" and path[1] == 0:
                    return node
                if w.shape[2] < 32:  # tiny fan-in (e.g. latent-space 4ch)
                    return node
                return quantize_conv_params(node)
            return node  # norms (ndim==1) and anything else
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (tuple, list)):
            return type(node)(walk(v, path + (i,)) for i, v in enumerate(node))
        return node

    return walk(params, ())


def count_quantized(params) -> tuple[int, int]:
    """(n_quantized_layers, n_int8_bytes) for diagnostics."""
    n = [0, 0]

    def visit(node):
        if isinstance(node, dict):
            if "weight_q8" in node:
                n[0] += 1
                n[1] += node["weight_q8"].size
            for v in node.values():
                visit(v)
        elif isinstance(node, (tuple, list)):
            for v in node:
                visit(v)

    visit(params)
    return n[0], n[1]
