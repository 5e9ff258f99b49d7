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
