"""Diffusion training: losses, train step, EMA, remat, state persistence.

The reference framework is inference-only (SURVEY.md top: "no training, no
distributed layer"); this module is a capability extension so the framework
scales past the reference: jit'd train steps with DP batch sharding + TP
param sharding over a ``jax.sharding.Mesh`` (gradients reduced by XLA
collectives over ICI), eps- and v-prediction objectives with min-SNR
weighting, EMA tracking, gradient accumulation, block rematerialization for
memory, and orbax train-state checkpointing.

Everything stays in the repo's functional idiom: the train state is a plain
pytree dict, steps are pure functions, and sharding is applied by placing
inputs/params — GSPMD does the rest.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

from .diffusion.parameterization import DiscreteSampling
from .models import unet as U
from .ops import layers as L

log = logging.getLogger(__name__)


# ------------------------------------------------------------------ loss ----
def diffusion_loss(
    unet_params,
    x0: jnp.ndarray,  # (B, H, W, 4) clean model-space latents
    context: jnp.ndarray,  # (B, T, C)
    key,
    model_sampling: DiscreteSampling,
    unet_cfg: U.UNetConfig,
    policy: L.Policy = L.BF16,
    snr_gamma: float | None = None,
    unet_apply=None,
):
    """Sample t ~ U, add noise, predict eps or v, (weighted) MSE.

    ``model_sampling.prediction_type`` selects the target:
      eps: target = noise
      v:   target = (noise − σ·x0)/√(σ²+1)   (v-parameterization in the
           discrete σ=√((1−ᾱ)/ᾱ) convention of parameterization.py)
    ``snr_gamma``: min-SNR-γ loss weighting (arXiv 2303.09556); None = uniform.
    """
    b = x0.shape[0]
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (b,), 0, model_sampling.sigmas.shape[0])
    sigma = model_sampling.sigmas[t]
    noise = jax.random.normal(k_n, x0.shape, jnp.float32)
    x_noisy = x0 + noise * sigma[:, None, None, None]
    x_in = model_sampling.calculate_input(sigma, x_noisy)
    apply = unet_apply or functools.partial(
        U.apply_unet, cfg=unet_cfg, policy=policy
    )
    pred = apply(unet_params, x_in, t.astype(jnp.float32), context)
    if model_sampling.prediction_type == "v":
        sig = sigma[:, None, None, None]
        target = (noise - sig * x0) / jnp.sqrt(sig**2 + 1.0)
    else:
        target = noise
    per = jnp.mean(
        (pred.astype(jnp.float32) - target) ** 2, axis=(1, 2, 3)
    )
    if snr_gamma is not None:
        snr = 1.0 / jnp.maximum(sigma**2, 1e-8)
        if model_sampling.prediction_type == "v":
            w = jnp.minimum(snr, snr_gamma) / (snr + 1.0)
        else:
            w = jnp.minimum(snr, snr_gamma) / snr
        per = per * w
    return jnp.mean(per)


# ------------------------------------------------------------------- EMA ----
def ema_update(ema_params, params, decay: float = 0.9999):
    """Exponential moving average of params (sampling-quality standard)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )


# ------------------------------------------------------------ train step ----
def make_train_step(
    optimizer: optax.GradientTransformation,
    model_sampling: DiscreteSampling,
    unet_cfg: U.UNetConfig,
    policy: L.Policy = L.BF16,
    snr_gamma: float | None = None,
    remat: bool = False,
    accum_steps: int = 1,
):
    """Returns jittable (params, opt_state, x0, context, key) → (params,
    opt_state, loss). Shard inputs batch-on-dp and params per
    parallel.mesh.param_specs; GSPMD inserts the grad all-reduces.

    ``remat``: rematerialize the UNet forward in the backward pass
    (jax.checkpoint) — trades ~30% step FLOPs for activation memory, the
    standard lever for batch/resolution scaling on HBM.
    ``accum_steps``: split the batch into k microbatches scanned
    sequentially, averaging grads (batch must divide by k).
    """
    unet_apply = functools.partial(U.apply_unet, cfg=unet_cfg, policy=policy)
    if remat:
        unet_apply = jax.checkpoint(unet_apply)

    def loss_fn(params, x0, context, key):
        return diffusion_loss(
            params, x0, context, key, model_sampling, unet_cfg, policy,
            snr_gamma=snr_gamma, unet_apply=unet_apply,
        )

    def step(params, opt_state, x0, context, key):
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, x0, context, key)
        else:
            b = x0.shape[0]
            assert b % accum_steps == 0, (b, accum_steps)
            mb = b // accum_steps
            x0_m = x0.reshape(accum_steps, mb, *x0.shape[1:])
            ctx_m = context.reshape(accum_steps, mb, *context.shape[1:])
            keys = jax.random.split(key, accum_steps)

            def micro(carry, inp):
                loss_acc, grad_acc = carry
                x0_i, ctx_i, k_i = inp
                loss_i, grads_i = jax.value_and_grad(loss_fn)(
                    params, x0_i, ctx_i, k_i
                )
                grad_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(a.dtype), grad_acc, grads_i
                )
                return (loss_acc + loss_i, grad_acc), ()

            # accumulate in the grad's own dtype (== param dtype) so the
            # optimizer state matches the accum_steps=1 path exactly
            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), params
            )
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.float32(0.0), zeros), (x0_m, ctx_m, keys)
            )
            loss = loss / accum_steps
            grads = jax.tree_util.tree_map(
                lambda g: (g / accum_steps), grads
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


# ------------------------------------------------------------ LoRA train ----
_LORA_TARGETS = frozenset(
    {"to_q", "to_k", "to_v", "to_out", "ff_in", "ff_out"}
)


def init_lora_params(key, unet_params, rank: int = 8,
                     targets=_LORA_TARGETS) -> dict:
    """Low-rank adapters {path: {"a" (in,r), "b" (r,out)}} for every targeted
    transformer linear. ``b`` is zero-initialized (kohya convention: the
    delta a@b starts at exactly zero), ``a`` is gaussian/√in.

    Inference-time LoRA stays a load-time merge (loader/lora.py, the
    reference's ModelPatcher collapse); this is the TRAINING side — adapters
    are a separate differentiable pytree merged functionally per step."""
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            if (
                path
                and path[-1] in targets
                and "weight" in node
                and node["weight"].ndim == 2
            ):
                flat[path] = node["weight"].shape
                return
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(unet_params, ())
    out = {}
    for i, (path, (d_in, d_out)) in enumerate(sorted(flat.items())):
        k = jax.random.fold_in(key, i)
        out[path] = {
            "a": jax.random.normal(k, (d_in, rank), jnp.float32)
            / jnp.sqrt(d_in),
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }
    return out


def merge_lora_params(unet_params, lora: dict, scale: float = 1.0):
    """params tree with W + scale·(a@b) at every adapter path. Pure/traceable
    — differentiating the result w.r.t. ``lora`` trains the adapters only."""

    def walk(node, path):
        if path in lora and isinstance(node, dict):
            p = lora[path]
            delta = (p["a"] @ p["b"]) * scale
            new = dict(node)
            new["weight"] = (
                node["weight"].astype(jnp.float32) + delta
            ).astype(node["weight"].dtype)
            return new
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (tuple, list)):
            return type(node)(walk(v, path + (i,)) for i, v in enumerate(node))
        return node

    return walk(unet_params, ())


def make_lora_train_step(
    optimizer: optax.GradientTransformation,
    model_sampling: DiscreteSampling,
    unet_cfg: U.UNetConfig,
    policy: L.Policy = L.BF16,
    scale: float = 1.0,
    snr_gamma: float | None = None,
    remat: bool = False,
):
    """Returns jittable (lora, opt_state, base_params, x0, context, key) →
    (lora, opt_state, loss): fine-tunes the adapters with the base frozen
    (the standard LoRA recipe, arXiv 2106.09685 applied to diffusion)."""
    unet_apply = functools.partial(U.apply_unet, cfg=unet_cfg, policy=policy)
    if remat:
        unet_apply = jax.checkpoint(unet_apply)

    def loss_fn(lora, base_params, x0, context, key):
        merged = merge_lora_params(base_params, lora, scale)
        return diffusion_loss(
            merged, x0, context, key, model_sampling, unet_cfg, policy,
            snr_gamma=snr_gamma, unet_apply=unet_apply,
        )

    def step(lora, opt_state, base_params, x0, context, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            lora, base_params, x0, context, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step


_KOHYA_SUBKEY = {
    "to_out": "to_out.0",
    "ff_in": "ff.net.0.proj",
    "ff_out": "ff.net.2",
}


def _lora_path_to_ldm(path) -> str:
    """Adapter tree path → LDM module path (the naming loader/lora.py's
    unet_lora_key_map targets)."""
    leaf = _KOHYA_SUBKEY.get(path[-1], path[-1])
    if path[0] == "middle":
        # ("middle", "attn", "blocks", t, ["attnX"], leaf)
        t = path[2 + 1]
        mid = ".".join(str(p) for p in path[4:-1])
        base = f"middle_block.1.transformer_blocks.{t}"
    else:
        # ("input_blocks"|"output_blocks", i, "attn", "blocks", t, ...)
        blocks, i, t = path[0], path[1], path[4]
        mid = ".".join(str(p) for p in path[5:-1])
        base = f"{blocks}.{i}.1.transformer_blocks.{t}"
    return f"{base}.{mid}.{leaf}" if mid else f"{base}.{leaf}"


def export_lora_kohya(lora: dict, path, scale: float = 1.0) -> dict:
    """Write trained adapters as a kohya-format LoRA safetensors file —
    loadable by loader/lora.py (and the wider SD ecosystem): keys
    ``lora_unet_<ldm-name>.lora_{down,up}.weight`` + ``.alpha``
    (torch layouts: down (r, in), up (out, r)). Pass the SAME ``scale``
    given to make_lora_train_step — it folds into alpha (= rank·scale), so
    loading at strength 1 reproduces the trained delta exactly."""
    import numpy as np_
    from safetensors.numpy import save_file

    out = {}
    for p, ab in lora.items():
        name = "lora_unet_" + _lora_path_to_ldm(p).replace(".", "_")
        a = np_.asarray(ab["a"], np_.float32)  # (in, r)
        b = np_.asarray(ab["b"], np_.float32)  # (r, out)
        out[name + ".lora_down.weight"] = a.T.copy()
        out[name + ".lora_up.weight"] = b.T.copy()
        out[name + ".alpha"] = np_.asarray(a.shape[1] * scale, np_.float32)
    save_file(out, str(path))
    return out


# ----------------------------------------------------------- train state ----
def init_train_state(params, optimizer: optax.GradientTransformation,
                     ema: bool = True) -> dict:
    """Plain-pytree train state: {"params", "opt_state", "ema", "step"}."""
    return {
        "params": params,
        "opt_state": optimizer.init(params),
        "ema": jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32), params
        ) if ema else None,
        "step": jnp.zeros((), jnp.int32),
    }


def make_trainer(
    optimizer: optax.GradientTransformation,
    model_sampling: DiscreteSampling,
    unet_cfg: U.UNetConfig,
    policy: L.Policy = L.BF16,
    snr_gamma: float | None = None,
    remat: bool = False,
    accum_steps: int = 1,
    ema_decay: float = 0.9999,
):
    """Full-state trainer: jittable (state, x0, context, key) → (state, loss).
    Wraps make_train_step with EMA tracking and a step counter."""
    step_fn = make_train_step(
        optimizer, model_sampling, unet_cfg, policy,
        snr_gamma=snr_gamma, remat=remat, accum_steps=accum_steps,
    )

    def trainer(state, x0, context, key):
        params, opt_state, loss = step_fn(
            state["params"], state["opt_state"], x0, context, key
        )
        ema = state["ema"]
        if ema is not None:
            # warmup-aware decay (standard: min(decay, (1+t)/(10+t)))
            t = state["step"].astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            ema = ema_update(ema, params, d)
        return {
            "params": params,
            "opt_state": opt_state,
            "ema": ema,
            "step": state["step"] + 1,
        }, loss

    return trainer


# ------------------------------------------------------------ persistence ---
def save_train_state(state: dict, path, unet_cfg: U.UNetConfig) -> None:
    """Checkpoint/resume for training runs (orbax, like loader/native_cache;
    the reference's only persistence is GUI prompt.txt, SURVEY §5.4)."""
    import orbax.checkpoint as ocp

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((path / "state").resolve(), state, force=True)
    ckptr.wait_until_finished()
    (path / "meta.json").write_text(
        json.dumps({"unet_config": dataclasses.asdict(unet_cfg),
                    "step": int(state["step"])})
    )


def load_train_state(path, abstract_state: dict):
    """Restore a saved train state. ``abstract_state``: a state pytree with
    the target structure/shapes (e.g. from init_train_state on fresh params).
    Returns (state, meta) or None if absent."""
    import orbax.checkpoint as ocp

    path = Path(path)
    if not (path / "meta.json").exists():
        return None
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, abstract_state
    )
    state = ckptr.restore((path / "state").resolve(), abstract)
    meta = json.loads((path / "meta.json").read_text())
    return state, meta
