"""Checkpoint ingestion: one safetensors/ckpt file → (unet, clip, vae) trees.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``load_torch_file``                :200 (safetensors or torch pickle)
  - ``load_checkpoint_guess_config``   :6426-6513 (prefix split, config
    sniffing, dtype decisions)
  - ``state_dict_prefix_replace``      :218

Unlike the reference there is no ModelPatcher: the returned trees are plain
pytrees; LoRA/TI merge into them functionally (loader/lora.py).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..models.unet import UNetConfig
from ..models.vae import SD15_VAE, VAEConfig
from ..models.clip import SD1_CLIP, ClipConfig
from ..diffusion.parameterization import DiscreteSampling, make_discrete_sampling
from .unet_weights import convert_unet, detect_unet_config
from .vae_weights import convert_vae
from .clip_weights import convert_clip_text_model

log = logging.getLogger(__name__)


def load_torch_file(path: str | Path) -> dict:
    """Load a .safetensors (zero-copy numpy) or torch-pickled checkpoint into
    a flat {key: np.ndarray} dict (ref :200)."""
    path = Path(path)
    if path.suffix.lower() == ".safetensors":
        from safetensors import safe_open

        out = {}
        with safe_open(str(path), framework="numpy") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {
        k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        for k, v in sd.items()
        if hasattr(v, "numpy")
    }


def state_dict_prefix_replace(sd: dict, replace: dict, filter_keys=False) -> dict:
    """(ref :218)"""
    out = {} if filter_keys else dict(sd)
    for old, new in replace.items():
        for k in list(sd):
            if k.startswith(old):
                out.pop(k, None)
                out[new + k[len(old):]] = sd[k]
    return out


def calculate_parameters(sd: dict, prefix: str = "") -> int:
    """(ref :210)"""
    return int(
        sum(np.prod(v.shape) for k, v in sd.items() if k.startswith(prefix))
    )


@dataclasses.dataclass
class StableDiffusion:
    """Everything ``load_checkpoint_guess_config`` returns, as one object."""

    unet_params: dict
    unet_config: UNetConfig
    clip_params: dict
    clip_config: ClipConfig
    vae_params: dict
    vae_config: VAEConfig
    model_sampling: DiscreteSampling
    # retained flat checkpoint (host numpy) so LoRAs can be re-merged without
    # re-reading the file; None for random-init models
    flat_sd: dict | None = dataclasses.field(default=None, repr=False)
    dtypes: tuple = (jnp.bfloat16, jnp.float32, jnp.float32)  # unet/clip/vae
    # SDXL second text tower (OpenCLIP bigG); None for SD1/SD2
    clip2_params: dict | None = None
    clip2_config: ClipConfig | None = None

    @property
    def is_refiner(self) -> bool:
        """SDXL refiner: bigG-only conditioning (no CLIP-L tower)."""
        return self.clip_params is None and self.clip2_params is not None

    def param_count(self) -> int:
        return sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(
                (self.unet_params, self.clip_params, self.vae_params,
                 self.clip2_params)
            )
        )


def load_checkpoint(
    path: str | Path,
    unet_dtype=jnp.bfloat16,
    clip_dtype=jnp.float32,
    vae_dtype=jnp.float32,
    prediction_type: str = "eps",
    loras: list[tuple[str | Path, float, float]] | None = None,
) -> StableDiffusion:
    """Load + config-sniff + convert an SD1.x checkpoint (ref :6426).

    Dtype defaults mirror the reference's policy (UNet fp16→bf16 on TPU,
    VAE fp32, text encoder fp16→fp32 here since it is tiny; :1883-1956).
    ``loras``: [(path, strength_model, strength_clip), ...] merged at load.
    """
    sd = load_torch_file(path)
    unet_config = detect_unet_config(sd)
    log.info(
        "checkpoint %s: %.1fM params, unet config %s",
        Path(path).name, calculate_parameters(sd) / 1e6, unet_config,
    )
    if "model.diffusion_model.v_pred" in sd:
        prediction_type = "v"
    out = _convert_all(
        sd, unet_config, unet_dtype, clip_dtype, vae_dtype, prediction_type
    )
    if loras:
        out = apply_loras(
            out, [(load_torch_file(p), sm, sc) for (p, sm, sc) in loras]
        )
    return out


def load_controlnet(path: str | Path, dtype=None):
    """Load a ControlNet checkpoint (arXiv 2302.05543; capability extension —
    the reference has no spatial conditioning). Returns (params, UNetConfig).
    Handles both bare and ``control_model.``-prefixed key layouts; the
    encoder config is shape-sniffed like the UNet's."""
    import jax.numpy as jnp

    from .unet_weights import convert_controlnet, detect_unet_config

    sd = load_torch_file(path)
    prefix = (
        "control_model."
        if any(k.startswith("control_model.") for k in sd)
        else ""
    )
    cfg = detect_unet_config(sd, prefix=prefix)
    params = convert_controlnet(
        sd, cfg, prefix=prefix, dtype=dtype or jnp.bfloat16
    )
    return params, cfg


def _convert_all(sd, unet_config, unet_dtype, clip_dtype, vae_dtype, pred):
    # text-encoder family detection (beyond the reference's SD1.5-only
    # registry at :6015): SD2.x = OpenCLIP under cond_stage_model.model.*;
    # SDXL = dual towers under conditioner.embedders.{0,1}.*
    from .clip_weights import convert_open_clip_text_model, detect_clip_config
    from .vae_weights import detect_vae_config

    clip2_params = clip2_config = None
    vae_config = detect_vae_config(sd)
    if any(k.startswith("conditioner.embedders.0.model.") for k in sd):
        # SDXL REFINER: a single OpenCLIP bigG tower sits directly at
        # embedders.0 (the base model has CLIP-L there and bigG at
        # embedders.1) — clip slot stays empty, bigG goes in clip2
        p0 = "conditioner.embedders.0.model."
        clip_params, clip_config = None, None
        clip2_params = convert_open_clip_text_model(sd, prefix=p0, dtype=clip_dtype)
        clip2_config = detect_clip_config(sd, p0, open_clip=True)
        vae_config = dataclasses.replace(vae_config, scale_factor=0.13025)
    elif any(k.startswith("conditioner.embedders.0.") for k in sd):
        # SDXL base: CLIP-L + OpenCLIP bigG towers
        p0 = "conditioner.embedders.0.transformer.text_model."
        p1 = "conditioner.embedders.1.model."
        clip_params = convert_clip_text_model(sd, prefix=p0, dtype=clip_dtype)
        clip_config = detect_clip_config(sd, p0)
        clip2_params = convert_open_clip_text_model(sd, prefix=p1, dtype=clip_dtype)
        clip2_config = detect_clip_config(sd, p1, open_clip=True)
        vae_config = dataclasses.replace(vae_config, scale_factor=0.13025)
    elif any(k.startswith("cond_stage_model.model.") for k in sd):
        # SD2.x: one OpenCLIP tower
        clip_params = convert_open_clip_text_model(sd, dtype=clip_dtype)
        clip_config = detect_clip_config(
            sd, "cond_stage_model.model.", open_clip=True
        )
    else:
        clip_params = convert_clip_text_model(sd, dtype=clip_dtype)
        clip_config = detect_clip_config(
            sd, "cond_stage_model.transformer.text_model."
        )
    return StableDiffusion(
        unet_params=convert_unet(sd, unet_config, dtype=unet_dtype),
        unet_config=unet_config,
        clip_params=clip_params,
        clip_config=clip_config,
        vae_params=convert_vae(sd, vae_config, dtype=vae_dtype),
        vae_config=vae_config,
        model_sampling=make_discrete_sampling(pred),
        flat_sd=sd,
        dtypes=(unet_dtype, clip_dtype, vae_dtype),
        clip2_params=clip2_params,
        clip2_config=clip2_config,
    )


def apply_loras(
    model: StableDiffusion, loras: list[tuple[dict, float, float]]
) -> StableDiffusion:
    """Functional LoRA merge: base flat dict + deltas → fresh param trees
    (the reference's LoraLoader + ModelPatcher.add_patches collapse,
    :6611/:3297). Requires the model to retain its flat_sd."""
    from .lora import apply_loras_to_checkpoint

    if model.flat_sd is None:
        raise ValueError("model has no retained flat state dict (random init?)")
    merged = apply_loras_to_checkpoint(model.flat_sd, model.unet_config, loras)
    unet_dtype, clip_dtype, vae_dtype = model.dtypes
    out = _convert_all(
        merged, model.unet_config, unet_dtype, clip_dtype, vae_dtype,
        model.model_sampling.prediction_type,
    )
    return dataclasses.replace(out, flat_sd=model.flat_sd)


def init_random(
    key=None,
    unet_config: UNetConfig | None = None,
    unet_dtype=jnp.bfloat16,
    vae_dtype=jnp.float32,
    clip_dtype=jnp.float32,
) -> StableDiffusion:
    """Random-weight StableDiffusion at full SD1.5 size — for benchmarks and
    end-to-end drives in weightless environments."""
    from ..models.unet import init_unet_params, SD15_UNET
    from ..models.vae import init_vae_params
    from ..models.clip import init_clip_params

    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    unet_config = unet_config or SD15_UNET

    # Structure comes from eval_shape (abstract, instant); leaves are filled
    # ON DEVICE. Per-leaf eager jax.random would trigger one (remote)
    # compile per unique shape, and host-side numpy + transfer moves GBs
    # through the relay (~400s measured). A single program with one
    # jax.random.normal PER LEAF is also bad: ~2700 threefry subgraphs make
    # an HLO the remote compile helper chews on for ~700s (SDXL, measured)
    # and the closure-captured key value ends up a program constant, so the
    # persistent cache misses whenever the key differs. Instead: chunk the
    # leaves, draw ONE flat normal buffer per chunk and slice/scale/reshape
    # out of it — tiny HLO per chunk, key as a runtime argument, stable
    # cache keys.
    def materialize(tree, key):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        CHUNK = 256
        out = []
        for c0 in range(0, len(leaves), CHUNK):
            chunk = leaves[c0 : c0 + CHUNK]
            sizes = [int(np.prod(s.shape)) for s in chunk]
            offsets = np.concatenate([[0], np.cumsum(sizes)])
            total = int(offsets[-1])
            shapes = tuple(tuple(s.shape) for s in chunk)
            dtypes = tuple(jnp.dtype(s.dtype).name for s in chunk)

            @functools.partial(
                jax.jit, static_argnames=("shapes", "dtypes", "total")
            )
            def build_chunk(key, shapes, dtypes, total):
                flat = jax.random.normal(key, (total,), jnp.float32)
                outs = []
                for j, (shp, dt) in enumerate(zip(shapes, dtypes)):
                    n = int(np.prod(shp)) if shp else 1
                    fan_in = int(np.prod(shp[:-1])) or 1
                    piece = jax.lax.dynamic_slice(
                        flat, (int(offsets[j]),), (n,)
                    )
                    outs.append(
                        (piece / np.sqrt(fan_in)).reshape(shp).astype(dt)
                    )
                return outs

            out.extend(
                build_chunk(jax.random.fold_in(key, c0), shapes, dtypes, total)
            )
        return jax.tree_util.tree_unflatten(treedef, out)

    unet_shapes = jax.eval_shape(
        lambda k: init_unet_params(k, unet_config, dtype=unet_dtype), k1
    )
    clip_shapes = jax.eval_shape(
        lambda k: init_clip_params(k, SD1_CLIP, dtype=clip_dtype), k2
    )
    vae_shapes = jax.eval_shape(
        lambda k: init_vae_params(k, SD15_VAE, dtype=vae_dtype), k3
    )
    return StableDiffusion(
        unet_params=materialize(unet_shapes, k1),
        unet_config=unet_config,
        clip_params=materialize(clip_shapes, k2),
        clip_config=SD1_CLIP,
        vae_params=materialize(vae_shapes, k3),
        vae_config=SD15_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
