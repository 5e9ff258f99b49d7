"""Textual-inversion embedding loading.

Behavioral parity target: ``load_embed`` (/root/reference/LightDiffusion.py:4804-4874):
accepts .safetensors or torch-pickled .pt/.bin/.ckpt files, handles the
``string_to_param`` A1111 layout, plain-tensor layouts, and {name: tensor}
dicts. Returns a float32 numpy array of shape (rows, dim) or (dim,).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..assets import SUPPORTED_EXTENSIONS


def _from_state(embed_dict, embedding_size: int, name: str) -> np.ndarray:
    # A1111 layout: {"string_to_param": {"*": tensor}}
    if "string_to_param" in embed_dict:
        values = embed_dict["string_to_param"].values()
        return np.asarray(next(iter(values)), dtype=np.float32)
    if len(embed_dict) == 0:
        raise ValueError(f"empty embedding file for {name!r}")
    # SDXL-style {"clip_l": ..., "clip_g": ...} — take clip_l for SD1
    if "clip_l" in embed_dict:
        return np.asarray(embed_dict["clip_l"], dtype=np.float32)
    # plain {name: tensor} or {"emb_params": tensor}
    if "emb_params" in embed_dict:
        return np.asarray(embed_dict["emb_params"], dtype=np.float32)
    values = [v for v in embed_dict.values() if hasattr(v, "shape")]
    for v in values:
        a = np.asarray(v, dtype=np.float32)
        if a.ndim <= 2 and a.shape[-1] == embedding_size:
            return a
    raise ValueError(f"could not find a ({embedding_size},)-dim tensor in {name!r}")


def load_embed_file(path: Path, embedding_size: int) -> np.ndarray:
    if path.suffix.lower() == ".safetensors":
        from safetensors import safe_open

        with safe_open(str(path), framework="numpy") as f:
            embed_dict = {k: f.get_tensor(k) for k in f.keys()}
    else:
        import torch

        obj = torch.load(str(path), map_location="cpu", weights_only=True)
        embed_dict = obj if isinstance(obj, dict) else {"emb_params": obj}
        embed_dict = {
            k: (v.float().numpy() if hasattr(v, "numpy") else v)
            if not isinstance(v, dict)
            else {kk: vv.float().numpy() for kk, vv in v.items()}
            for k, v in embed_dict.items()
        }
    return _from_state(embed_dict, embedding_size, path.name)


def load_textual_inversion(
    directory: str | Path, name: str, embedding_size: int = 768
) -> np.ndarray:
    """Resolve NAME(.ext) under directory and load it. Raises FileNotFoundError
    if absent (callers skip missing embeddings, matching the reference)."""
    d = Path(directory)
    candidates = [d / name] + [d / (name + ext) for ext in SUPPORTED_EXTENSIONS]
    for p in candidates:
        if p.is_file():
            emb = load_embed_file(p, embedding_size)
            return emb if emb.ndim == 2 else emb[None]
    raise FileNotFoundError(f"embedding {name!r} not found under {d}")
