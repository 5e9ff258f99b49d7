"""Native checkpoint persistence (orbax): save/load converted param trees.

The reference re-reads + re-converts the 2 GB torch checkpoint on every
process start (SURVEY §5.4: "load only, never written"). Here the converted
NHWC pytrees persist in orbax format next to the source checkpoint, so warm
starts skip torch-format parsing and layout transposes entirely.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
from pathlib import Path


log = logging.getLogger(__name__)

_FORMAT_VERSION = 1


def _cache_dir_for(path: Path) -> Path:
    h = hashlib.sha256(
        f"{path.resolve()}:{path.stat().st_mtime_ns}:{path.stat().st_size}:v{_FORMAT_VERSION}".encode()
    ).hexdigest()[:16]
    import os

    base = Path(os.environ.get("LDT_NATIVE_CACHE", Path.home() / ".cache" / "lightdiffusion_tpu" / "ckpt"))
    return base / h


def save_native(model, cache_dir: Path) -> None:
    """Persist a StableDiffusion's param trees + configs."""
    import orbax.checkpoint as ocp

    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    for name in ("unet_params", "clip_params", "vae_params"):
        ckptr.save(
            (cache_dir / name).resolve(), getattr(model, name), force=True
        )
    ckptr.wait_until_finished()
    meta = {
        "unet_config": dataclasses.asdict(model.unet_config),
        "clip_config": dataclasses.asdict(model.clip_config),
        "vae_config": dataclasses.asdict(model.vae_config),
        "prediction_type": model.model_sampling.prediction_type,
    }
    (cache_dir / "meta.json").write_text(json.dumps(meta))


def load_native(cache_dir: Path):
    """Load a previously-saved StableDiffusion (without the flat torch dict).
    Returns None if absent/incomplete."""
    import orbax.checkpoint as ocp

    from ..models.unet import UNetConfig
    from ..models.vae import VAEConfig
    from ..models.clip import ClipConfig
    from ..diffusion.parameterization import make_discrete_sampling
    from .checkpoint import StableDiffusion

    cache_dir = Path(cache_dir)
    meta_path = cache_dir / "meta.json"
    if not meta_path.is_file():
        return None
    try:
        meta = json.loads(meta_path.read_text())
        for k in ("unet_config", "clip_config", "vae_config"):
            for kk, vv in meta[k].items():
                if isinstance(vv, list):
                    meta[k][kk] = tuple(vv)
        ckptr = ocp.StandardCheckpointer()
        trees = {
            name: ckptr.restore((cache_dir / name).resolve())
            for name in ("unet_params", "clip_params", "vae_params")
        }
        return StableDiffusion(
            unet_params=trees["unet_params"],
            unet_config=UNetConfig(**meta["unet_config"]),
            clip_params=trees["clip_params"],
            clip_config=ClipConfig(**meta["clip_config"]),
            vae_params=trees["vae_params"],
            vae_config=VAEConfig(**meta["vae_config"]),
            model_sampling=make_discrete_sampling(meta["prediction_type"]),
        )
    except Exception as e:
        log.warning("native checkpoint cache unreadable (%s); ignoring", e)
        return None


def load_checkpoint_cached(path, **kwargs):
    """load_checkpoint with a native-format warm cache (no LoRAs: merged
    checkpoints depend on lora files, so only the base converts are cached)."""
    from .checkpoint import load_checkpoint

    path = Path(path)
    cache = _cache_dir_for(path)
    if not kwargs.get("loras"):
        cached = load_native(cache)
        if cached is not None:
            log.info("loaded native cache for %s", path.name)
            return cached
    model = load_checkpoint(path, **kwargs)
    if not kwargs.get("loras"):
        try:
            save_native(model, cache)
        except Exception as e:
            log.warning("could not write native cache: %s", e)
    return model
