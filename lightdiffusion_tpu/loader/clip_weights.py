"""CLIP text-encoder weight conversion: SD/HF state dict → stacked pytree.

The SD1.x checkpoint stores the text encoder under
``cond_stage_model.transformer.text_model.`` with HF CLIPTextModel naming
(ref clip loading at /root/reference/LightDiffusion.py:6471-6496, key renames
at :5980-6009). We convert once at load time:
  - torch Linear (out,in) → (in,out)
  - per-layer dicts stacked along a leading L axis for lax.scan
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def detect_clip_config(sd: dict, prefix: str, open_clip: bool = False):
    """ClipConfig from state-dict shapes. head count is not stored in
    weights; heads = hidden/64 is exact for every real CLIP text tower
    (CLIP-L 768/12, OpenCLIP-H 1024/16, bigG 1280/20)."""
    from ..models.clip import ClipConfig

    if open_clip:
        tok = np.asarray(sd[prefix + "token_embedding.weight"])
        hidden = tok.shape[1]
        n = 0
        while f"{prefix}transformer.resblocks.{n}.ln_1.weight" in sd:
            n += 1
        inter = sd[prefix + "transformer.resblocks.0.mlp.c_fc.weight"].shape[0]
        max_pos = sd[prefix + "positional_embedding"].shape[0]
        act = "gelu"
        pad_end = False
    else:
        tok = np.asarray(sd[prefix + "embeddings.token_embedding.weight"])
        hidden = tok.shape[1]
        n = 0
        while f"{prefix}encoder.layers.{n}.layer_norm1.weight" in sd:
            n += 1
        inter = sd[prefix + "encoder.layers.0.mlp.fc1.weight"].shape[0]
        max_pos = sd[prefix + "embeddings.position_embedding.weight"].shape[0]
        act = "quick_gelu"
        pad_end = True
    return ClipConfig(
        vocab_size=tok.shape[0],
        hidden_size=hidden,
        num_layers=n,
        num_heads=max(1, hidden // 64),
        intermediate_size=inter,
        max_positions=max_pos,
        hidden_act=act,
        pad_with_end=pad_end,
    )


def convert_clip_text_model(
    sd: dict, prefix: str = "cond_stage_model.transformer.text_model.", dtype=jnp.float32
):
    """Build the clip.py param tree from a flat state dict."""

    def g(name):
        a = sd[prefix + name]
        return np.asarray(a, dtype=np.float32)

    n_layers = 0
    while f"{prefix}encoder.layers.{n_layers}.layer_norm1.weight" in sd:
        n_layers += 1
    if n_layers == 0:
        raise KeyError(f"no CLIP layers found under prefix {prefix!r}")

    def layer(i):
        p = f"encoder.layers.{i}."
        return {
            "ln1": {"weight": g(p + "layer_norm1.weight"), "bias": g(p + "layer_norm1.bias")},
            "ln2": {"weight": g(p + "layer_norm2.weight"), "bias": g(p + "layer_norm2.bias")},
            "q": {"weight": _t(g(p + "self_attn.q_proj.weight")), "bias": g(p + "self_attn.q_proj.bias")},
            "k": {"weight": _t(g(p + "self_attn.k_proj.weight")), "bias": g(p + "self_attn.k_proj.bias")},
            "v": {"weight": _t(g(p + "self_attn.v_proj.weight")), "bias": g(p + "self_attn.v_proj.bias")},
            "out": {"weight": _t(g(p + "self_attn.out_proj.weight")), "bias": g(p + "self_attn.out_proj.bias")},
            "fc1": {"weight": _t(g(p + "mlp.fc1.weight")), "bias": g(p + "mlp.fc1.bias")},
            "fc2": {"weight": _t(g(p + "mlp.fc2.weight")), "bias": g(p + "mlp.fc2.bias")},
        }

    import jax

    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs), dtype=dtype),
        *[layer(i) for i in range(n_layers)],
    )
    params = {
        "token_embedding": jnp.asarray(g("embeddings.token_embedding.weight"), dtype),
        "position_embedding": jnp.asarray(
            g("embeddings.position_embedding.weight"), dtype
        ),
        "layers": layers,
        "final_ln": {
            "weight": jnp.asarray(g("final_layer_norm.weight"), dtype),
            "bias": jnp.asarray(g("final_layer_norm.bias"), dtype),
        },
    }
    tp = prefix.replace("text_model.", "") + "text_projection.weight"
    if tp in sd:
        params["text_projection"] = jnp.asarray(_t(np.asarray(sd[tp])), dtype)
    return params


def convert_open_clip_text_model(
    sd: dict, prefix: str = "cond_stage_model.model.", dtype=jnp.float32
):
    """OpenCLIP text tower (SD2.x checkpoints: ``cond_stage_model.model.``,
    resblocks with fused attn.in_proj) → the same clip.py param tree.

    The computation is identical to the OpenAI CLIP text model (pre-LN
    blocks), only the naming, fused qkv, and activation (gelu) differ —
    pair with ClipConfig(hidden_act='gelu'). Beyond the reference's SD1.5-only
    support."""

    def g(name):
        return np.asarray(sd[prefix + name], np.float32)

    n_layers = 0
    while f"{prefix}transformer.resblocks.{n_layers}.ln_1.weight" in sd:
        n_layers += 1
    if n_layers == 0:
        raise KeyError(f"no OpenCLIP layers under prefix {prefix!r}")
    width = g("token_embedding.weight").shape[1]

    def layer(i):
        p = f"transformer.resblocks.{i}."
        in_w = g(p + "attn.in_proj_weight")  # (3d, d)
        in_b = g(p + "attn.in_proj_bias")
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        return {
            "ln1": {"weight": g(p + "ln_1.weight"), "bias": g(p + "ln_1.bias")},
            "ln2": {"weight": g(p + "ln_2.weight"), "bias": g(p + "ln_2.bias")},
            "q": {"weight": _t(qw), "bias": qb},
            "k": {"weight": _t(kw), "bias": kb},
            "v": {"weight": _t(vw), "bias": vb},
            "out": {"weight": _t(g(p + "attn.out_proj.weight")),
                    "bias": g(p + "attn.out_proj.bias")},
            "fc1": {"weight": _t(g(p + "mlp.c_fc.weight")),
                    "bias": g(p + "mlp.c_fc.bias")},
            "fc2": {"weight": _t(g(p + "mlp.c_proj.weight")),
                    "bias": g(p + "mlp.c_proj.bias")},
        }

    import jax

    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs), dtype),
        *[layer(i) for i in range(n_layers)],
    )
    params = {
        "token_embedding": jnp.asarray(g("token_embedding.weight"), dtype),
        "position_embedding": jnp.asarray(g("positional_embedding"), dtype),
        "layers": layers,
        "final_ln": {
            "weight": jnp.asarray(g("ln_final.weight"), dtype),
            "bias": jnp.asarray(g("ln_final.bias"), dtype),
        },
    }
    if prefix + "text_projection" in sd:
        # stored as a raw (width, embed) matrix applied x @ P — no transpose
        params["text_projection"] = jnp.asarray(g("text_projection"), dtype)
    return params
