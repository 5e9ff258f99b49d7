"""SDPipeline: the user-facing model object + compiled program cache.

Replaces the reference's ModelPatcher/CFGGuider/node plumbing
(/root/reference/LightDiffusion.py L5-L7 layers) with one object holding the
param pytrees and a cache of jit-compiled programs (sampling, decode, encode)
keyed by static config — the TPU equivalent of stable-fast's trace cache
(:9786-9868), except it is just ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np
import jax
import jax.numpy as jnp

from ..loader.checkpoint import StableDiffusion
from ..models import unet as U
from ..models import vae as V
from ..models.clip import ClipTextEncoder
from ..ops import layers as L
from ..ops.resize import common_upscale
from ..diffusion import sampling as SMP
from ..diffusion.cfg import make_cfg_denoiser
from ..diffusion.noise import prepare_noise

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    """Static (compile-time) sampling configuration."""

    steps: int = 20
    sampler_name: str = "euler_ancestral"
    scheduler: str = "karras"
    denoise: float = 1.0
    disable_noise: bool = False
    cond_len: int = 77
    uncond_len: int = 77
    masked: bool = False
    differential_diffusion: bool = False
    deepcache: int = 0  # >1: refresh deep UNet blocks every N steps
    uncond_interval: int = 0  # >1: run the uncond CFG branch every N steps
    has_y: bool = False  # SDXL ADM vector conditioning
    uncond_free: bool = False  # cond-only (no CFG): UNet batch B, not 2·B
    control_cfg: object = None  # ControlNet encoder UNetConfig (None = off)
    has_concat: bool = False  # 9ch inpaint-model input conditioning
    # sampler options (eta/s_noise/pcoeff/...) as a sorted item tuple so the
    # frozen config stays hashable (ref sampler signatures :1118-1140)
    options: tuple = ()


def _cfg_denoiser_prologue(ms, policy, cond, uncond, y_cond, y_uncond,
                           x, sigma):
    """Shared per-step prep for the stateful CFG denoiser factories below:
    lcm context padding + batch broadcast (cfg.py semantics), optional SDXL
    ADM vectors, and the parameterization's input/timestep transforms.
    Returns ``(ctx_c, ctx_u, y_c, y_u, sigma_b, x_in, t)``; ``x_in`` is
    fp32 — callers cast to the compute dtype at the UNet boundary."""
    from ..diffusion.cfg import common_context_length, pad_context_to

    b = x.shape[0]
    target = common_context_length(cond.shape[1], uncond.shape[1])
    cond_p = pad_context_to(cond, target)
    uncond_p = pad_context_to(uncond, target)
    ctx_c = jnp.broadcast_to(
        cond_p, (b,) + cond_p.shape[1:]
    ).astype(policy.compute_dtype)
    ctx_u = jnp.broadcast_to(
        uncond_p, (b,) + uncond_p.shape[1:]
    ).astype(policy.compute_dtype)
    y_c = y_u = None
    if y_cond is not None:
        y_c = jnp.broadcast_to(y_cond, (b,) + y_cond.shape[1:])
        y_u = jnp.broadcast_to(y_uncond, (b,) + y_uncond.shape[1:])
    sigma_b = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,))
    x_in = ms.calculate_input(sigma_b, x)
    t = ms.timestep(sigma_b)
    return ctx_c, ctx_u, y_c, y_u, sigma_b, x_in, t


def _make_deepcache_cfg_denoiser(ms, unet_cfg, policy, unet_params, cond,
                                 uncond, cfg_scale, interval,
                                 y_cond=None, y_uncond=None):
    """Stateful CFG denoiser with DeepCache deep-block reuse (arXiv
    2312.03209): ``(x, sigma, i, cache) -> (denoised, cache)``; the deep UNet
    half refreshes when ``i % interval == 0``. Shared by the monolithic and
    chunked DeepCache programs so both run the identical trajectory."""

    def denoise_cached(x, sigma, i, cache):
        b = x.shape[0]
        ctx_c, ctx_u, y_c, y_u, sigma_b, x_in, t = _cfg_denoiser_prologue(
            ms, policy, cond, uncond, y_cond, y_uncond, x, sigma)
        context = jnp.concatenate([ctx_c, ctx_u], axis=0)
        y2 = None if y_c is None else jnp.concatenate([y_c, y_u], axis=0)
        x2 = jnp.concatenate([x_in, x_in], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        refresh = (i % interval) == 0
        eps2, cache = U.apply_unet_cached(
            unet_params, x2.astype(policy.compute_dtype), t2, context,
            cache, refresh, y=y2, cfg=unet_cfg, policy=policy,
        )
        den2 = ms.calculate_denoised(
            jnp.concatenate([sigma_b, sigma_b]),
            eps2.astype(jnp.float32),
            jnp.concatenate([x, x], axis=0),
        )
        d_cond, d_uncond = den2[:b], den2[b:]
        scale = jnp.asarray(cfg_scale, jnp.float32)
        if scale.ndim:  # per-sample guidance, as in cfg.py
            scale = scale.reshape(scale.shape + (1,) * (x.ndim - scale.ndim))
        return d_uncond + (d_cond - d_uncond) * scale, cache

    return denoise_cached


def _make_uncond_skip_cfg_denoiser(ms, unet_cfg, policy, unet_params, cond,
                                   uncond, cfg_scale, interval,
                                   y_cond=None, y_uncond=None):
    """Stateful CFG denoiser with guidance-delta caching:
    ``(x, sigma, i, delta) -> (denoised, delta)``. The uncond branch runs
    only when ``i % interval == 0`` (full 2·B CFG batch, storing
    ``delta = d_cond − d_uncond``); skip steps run the UNet cond-only at
    batch B and reuse the stored delta via
    ``denoised = d_cond + (s−1)·delta`` (algebraically identical to CFG
    when the delta is fresh). The DeepCache temporal-redundancy observation
    (arXiv 2312.03209) applied to the guidance term itself; opt-in
    accelerator beyond the reference. Shared by the monolithic and chunked
    programs so both run the identical trajectory."""

    def denoise(x, sigma, i, delta):
        b = x.shape[0]
        ctx_c, ctx_u, y_c, y_u, sigma_b, x_in, t = _cfg_denoiser_prologue(
            ms, policy, cond, uncond, y_cond, y_uncond, x, sigma)
        x_in = x_in.astype(policy.compute_dtype)

        def full(_):
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx2 = jnp.concatenate([ctx_c, ctx_u], axis=0)
            y2 = (
                None if y_c is None
                else jnp.concatenate([y_c, y_u], axis=0)
            )
            eps2 = U.apply_unet(unet_params, x2, t2, ctx2, y=y2,
                                cfg=unet_cfg, policy=policy)
            den2 = ms.calculate_denoised(
                jnp.concatenate([sigma_b, sigma_b]),
                eps2.astype(jnp.float32),
                jnp.concatenate([x, x], axis=0),
            )
            return den2[:b], den2[:b] - den2[b:]

        def skip(_):
            eps = U.apply_unet(unet_params, x_in, t, ctx_c, y=y_c,
                               cfg=unet_cfg, policy=policy)
            d_cond = ms.calculate_denoised(
                sigma_b, eps.astype(jnp.float32), x
            )
            return d_cond, delta

        d_cond, delta_new = jax.lax.cond((i % interval) == 0, full, skip,
                                         operand=None)
        scale = jnp.asarray(cfg_scale, jnp.float32)
        if scale.ndim:  # per-sample guidance, as in cfg.py
            scale = scale.reshape(scale.shape + (1,) * (x.ndim - scale.ndim))
        return d_cond + (scale - 1.0) * delta_new, delta_new

    return denoise


def _make_dual_cache_cfg_denoiser(ms, unet_cfg, policy, unet_params, cond,
                                  uncond, cfg_scale, dc_interval, ui_interval,
                                  y_cond=None, y_uncond=None):
    """Composed DeepCache + guidance-delta caching:
    ``(x, sigma, i, (cache, delta)) -> (denoised, (cache, delta))``.

    A step runs the full 2·B CFG batch whenever EITHER cadence fires —
    ``i % ui_interval == 0`` (guidance-delta refresh) or
    ``i % dc_interval == 0`` (deep-block refresh; promoted to a full step so
    both cache halves refresh together) — and a cond-only B-batch shallow
    eval reusing ``cache[:b]`` otherwise. Invariants: the deep cache is
    never staler than ``dc_interval`` steps, the guidance delta never staler
    than ``min(ui, dc)`` steps (full steps refresh the delta for free).
    Opt-in accelerator beyond the reference; the two single-lever variants
    above remain the trajectory-gentler defaults."""

    def denoise(x, sigma, i, state):
        cache, delta = state
        b = x.shape[0]
        ctx_c, ctx_u, y_c, y_u, sigma_b, x_in, t = _cfg_denoiser_prologue(
            ms, policy, cond, uncond, y_cond, y_uncond, x, sigma)
        x_in = x_in.astype(policy.compute_dtype)
        refresh = (i % dc_interval) == 0
        full_step = ((i % ui_interval) == 0) | refresh

        def full(_):
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx2 = jnp.concatenate([ctx_c, ctx_u], axis=0)
            y2 = (
                None if y_c is None
                else jnp.concatenate([y_c, y_u], axis=0)
            )
            eps2, cache2 = U.apply_unet_cached(
                unet_params, x2, t2, ctx2, cache, refresh, y=y2,
                cfg=unet_cfg, policy=policy,
            )
            den2 = ms.calculate_denoised(
                jnp.concatenate([sigma_b, sigma_b]),
                eps2.astype(jnp.float32),
                jnp.concatenate([x, x], axis=0),
            )
            return den2[:b], den2[:b] - den2[b:], cache2

        def skip(_):
            eps, _ = U.apply_unet_cached(
                unet_params, x_in, t, ctx_c, cache[:b],
                jnp.asarray(False), y=y_c, cfg=unet_cfg, policy=policy,
            )
            d_cond = ms.calculate_denoised(
                sigma_b, eps.astype(jnp.float32), x
            )
            return d_cond, delta, cache

        d_cond, delta_new, cache_new = jax.lax.cond(full_step, full, skip,
                                                    operand=None)
        scale = jnp.asarray(cfg_scale, jnp.float32)
        if scale.ndim:  # per-sample guidance, as in cfg.py
            scale = scale.reshape(scale.shape + (1,) * (x.ndim - scale.ndim))
        return d_cond + (scale - 1.0) * delta_new, (cache_new, delta_new)

    return denoise


def _make_control_apply(cn_cfg, unet_cfg, policy, cn_params, hint, strength):
    """Per-step ControlNet residuals feeding the UNet call
    (models/controlnet.py; arXiv 2302.05543). Applied to both CFG halves
    (the hint broadcasts over the 2·B batch). Shared by the monolithic,
    chunked, and adaptive-segment programs so every sampling path carries
    the same control semantics."""
    from ..models import controlnet as CN

    def wrapped(params, x, t, ctx, y=None):
        b = x.shape[0]
        # hint is (1,...) (shared) or (B,...) (per-sample); the CFG
        # batch is [cond‖uncond] = [x;x], so tiling matches halves
        reps = b // hint.shape[0]
        hb = jnp.tile(hint, (reps, 1, 1, 1)) if reps > 1 else hint
        # the control encoder sees only the latent channels — for 9ch
        # inpaint models x carries extra concat channels the 4ch
        # ControlNet conv_in must not receive
        x_cn = x[..., : cn_cfg.in_channels]
        outs, mid = CN.apply_controlnet(
            cn_params, x_cn, hb, t, ctx,
            y=y if cn_cfg.adm_in_channels else None,
            cfg=cn_cfg, policy=policy,
        )
        s = strength.astype(mid.dtype)
        if s.ndim:  # per-sample strengths (the serving frontend)
            sreps = b // s.shape[0]
            s = jnp.tile(s, (sreps,)) if sreps > 1 else s
            s = s.reshape(s.shape + (1, 1, 1))
        control = (tuple(o * s for o in outs), mid * s)
        return U.apply_unet(params, x, t, ctx, y=y, cfg=unet_cfg,
                            policy=policy, control=control)

    return wrapped


class SDPipeline:
    def __init__(
        self,
        sd: StableDiffusion,
        policy: L.Policy = L.BF16,
        vae_policy: L.Policy = L.FP32,
        clip_skip: int = -1,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh("dp","tp") — UNet params are
        TP-sharded (parallel/mesh.py policies), batches shard on dp, and the
        jit'd programs run SPMD with XLA-inserted ICI collectives. The
        reference has no distributed layer (SURVEY §2.14); this is the
        TPU-native scaling path."""
        self.sd = sd
        self.policy = policy
        self.vae_policy = vae_policy
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import mesh as M

            # Pallas custom calls don't partition under GSPMD: SPMD programs
            # must run the XLA attention/FFN/conv paths. Pin every Pallas
            # dispatch gate (harmless on the CPU dryrun mesh, where the
            # backend gate already picks XLA; required on real TPU meshes).
            sd.unet_config = dataclasses.replace(
                sd.unet_config, attn_force="xla")
            self.policy = policy = dataclasses.replace(
                policy, conv_force="xla")
            self.vae_policy = vae_policy = dataclasses.replace(
                vae_policy, conv_force="xla")
            sd.unet_params = M.shard_params(sd.unet_params, mesh)
        if sd.clip_params is None and sd.clip2_params is not None:
            # SDXL refiner: bigG-only tower (loader/checkpoint.py detection)
            from ..models.clip import SDXLRefinerTextEncoder

            self.clip = SDXLRefinerTextEncoder(
                sd.clip2_params, sd.clip2_config, clip_skip=clip_skip,
            )
        elif sd.clip2_params is not None:
            from ..models.clip import SDXLTextEncoder

            self.clip = SDXLTextEncoder(
                sd.clip_params, sd.clip2_params, sd.clip_config,
                sd.clip2_config, clip_skip=clip_skip,
            )
        else:
            self.clip = ClipTextEncoder(
                sd.clip_params, sd.clip_config, policy=L.FP32,
                clip_skip=clip_skip,
            )
        self.vae = V.VAE(sd.vae_params, sd.vae_config, policy=vae_policy)
        # bounded LRUs: a long-running server sees unbounded distinct
        # prompts and (via width/height/steps) compile keys; dropping a
        # program frees its executable (the persistent on-disk XLA cache
        # makes re-adding cheap)
        import collections

        self._programs: collections.OrderedDict = collections.OrderedDict()
        self._programs_max = 64
        self._cond_cache: collections.OrderedDict = collections.OrderedDict()
        self._cond_cache_max = 256

    def _cache_program(self, key, program):
        self._programs[key] = program
        while len(self._programs) > self._programs_max:
            self._programs.popitem(last=False)

    def _seed_noise(self, latent, seed, disable_noise=False, make_noise=True):
        """(initial noise | None, sampler PRNG key) for an int seed or a
        sequence of B per-sample seeds (serving semantics: each sample's
        initial AND per-step noise depend on its own seed only, so any
        batch composition reproduces the solo image — noise.keys_for)."""
        from ..diffusion.noise import keys_for

        per_sample = not isinstance(seed, (int, np.integer))
        if per_sample:
            seeds = [int(s) for s in seed]
            if len(seeds) != latent.shape[0]:
                raise ValueError(
                    f"{len(seeds)} seeds for batch {latent.shape[0]}"
                )
        rng = keys_for(seeds if per_sample else seed)
        if not make_noise:
            return None, rng
        if disable_noise:
            noise = jnp.zeros_like(latent, dtype=jnp.float32)
        elif per_sample:
            noise = jnp.concatenate(
                [
                    prepare_noise(latent[i : i + 1].astype(jnp.float32), s)
                    for i, s in enumerate(seeds)
                ],
                axis=0,
            )
        else:
            noise = prepare_noise(latent.astype(jnp.float32), seed)
        return noise, rng

    def _control_cfg_key(self, control):
        """Static ControlNet encoder config for SampleConfig. Mesh programs
        pin the XLA attention path (Pallas doesn't partition under GSPMD,
        see __init__)."""
        if control is None:
            return None
        cfg = control[1]
        if self.mesh is not None:
            cfg = dataclasses.replace(cfg, attn_force="xla")
        return cfg

    def _control_kwargs(self, control):
        """Dynamic ControlNet program arguments (params tree, prepared
        hint, per-sample strengths) from a (cn_params, cn_cfg, hint,
        strength) tuple."""
        if control is None:
            return {}
        cn_params, _, hint, strength = control
        hint = jnp.asarray(hint, jnp.float32)
        if hint.ndim == 3:
            hint = hint[None]
        return dict(
            cn_params=cn_params,
            hint=hint.astype(self.policy.compute_dtype),
            ctrl_strength=jnp.asarray(strength, jnp.float32),
        )

    def set_tome(self, ratio: float, min_tokens: int = 4096):
        """Removed round 4: ToMe measured strictly slower than ToDo at every
        size/topology (NOTES_ROUND3; MIGRATION.md has the table)."""
        raise RuntimeError(
            "ToMe was removed: superseded by ToDo, which is faster at every "
            "measured size (use set_todo(2) / set_todo(4); see MIGRATION.md)"
        )

    def set_todo(self, factor: int, min_tokens: int = 4096):
        """Enable/disable ToDo K/V token downsampling (arXiv 2402.13573) for
        every subsequent program: self-attention keys/values are spatially
        avg-pooled by ``factor`` at levels with ≥ min_tokens tokens while
        queries stay full-resolution — no merge/unmerge overhead, so it
        wins even at 512² token counts. Opt-in accelerator absent
        in the reference."""
        self.sd.unet_config = dataclasses.replace(
            self.sd.unet_config, todo_factor=factor, todo_min_tokens=min_tokens
        )
        # no cache clear: program keys include the unet_config, so toggling
        # ToDo per serving group reuses previously traced programs
        return self

    def set_freeu(self, b1: float | None = 1.5, b2: float = 1.6,
                  s1: float = 0.9, s2: float = 0.2):
        """Enable FreeU (arXiv 2309.11497; defaults = the paper's SD1.5
        values) or disable it with ``set_freeu(None)``. Free quality lever
        absent in the reference."""
        self.sd.unet_config = dataclasses.replace(
            self.sd.unet_config,
            freeu=() if b1 is None else (b1, b2, s1, s2),
        )
        # no cache clear needed: program keys include the unet_config
        return self

    def quantize_unet(self, quantize_convs: bool = True):
        """Switch the UNet to the W8A8 int8 inference path (ops/quant.py).

        Call AFTER any LoRA/TI merge (the merge needs fp32 weights). Replaces
        ``sd.unet_params`` with the quantized tree; every cached program
        re-specializes on the new tree structure automatically. Opt-in:
        ~1.3-1.5× step rate on the int8 MXU at a small quality delta (absent
        in the reference, whose precision floor is fp16, ref :6418-6423)."""
        import functools

        from ..ops.quant import count_quantized, quantize_unet_params

        # one jitted program (the eager walk would dispatch thousands of
        # tiny round/clip kernels over the device relay)
        self.sd.unet_params = jax.jit(
            functools.partial(quantize_unet_params,
                              quantize_convs=quantize_convs)
        )(self.sd.unet_params)
        if self.mesh is not None:
            from ..parallel import mesh as M

            self.sd.unet_params = M.shard_params(self.sd.unet_params, self.mesh)
        self._programs.clear()
        n, nbytes = count_quantized(self.sd.unet_params)
        log.info("quantized %d UNet layers to int8 (%.0f MB int8 weights)",
                 n, nbytes / 1e6)
        return self

    def _shard_batch(self, x):
        """Place a batch-leading array on the mesh (dp over batch); arrays
        whose batch doesn't divide dp (e.g. (1,L,C) conds, broadcast inside
        the program) are replicated."""
        if self.mesh is None:
            return x
        from ..parallel import mesh as M

        n_dp = self.mesh.shape["dp"]
        if x.shape[0] % n_dp == 0:
            return jax.device_put(x, M.batch_sharding(self.mesh, x.ndim))
        return jax.device_put(x, M.replicated(self.mesh))

    # ------------------------------------------------------------ text ------
    def set_clip_skip(self, clip_skip: int):
        self.clip.clip_layer(clip_skip)
        self._cond_cache.clear()

    def encode_text(self, text: str):
        key = (text, self.clip.clip_skip)
        if key not in self._cond_cache:
            cond, pooled = self.clip.encode(text)
            self._cond_cache[key] = (cond, pooled)
            if len(self._cond_cache) > self._cond_cache_max:
                self._cond_cache.popitem(last=False)
        else:
            self._cond_cache.move_to_end(key)
        return self._cond_cache[key]

    # --------------------------------------------------------- programs -----
    def _sample_program(self, cfg_key: SampleConfig, sigmas_bytes: bytes,
                        step_offset: int = 0):
        """One jitted program: noise-scale → sampler scan → final latent.
        ``step_offset``: absolute index of the window's first sigma in the
        unsliced schedule (Brownian/suffix-noise semantics, ref :9025-9041)."""
        key = ("sample", cfg_key, sigmas_bytes, step_offset,
               self.sd.unet_config)
        if key in self._programs:
            self._programs.move_to_end(key)
            return self._programs[key]
        sigmas = np.frombuffer(sigmas_bytes, dtype=np.float32)
        ms = self.sd.model_sampling
        unet_cfg = self.sd.unet_config
        policy = self.policy

        def unet_apply(params, x, t, ctx):
            return U.apply_unet(params, x, t, ctx, cfg=unet_cfg, policy=policy)

        if cfg_key.deepcache > 1 or cfg_key.uncond_interval > 1:
            program = self._stateful_program(cfg_key, sigmas, step_offset)
            self._cache_program(key, program)
            return program

        def unet_apply_y(params, x, t, ctx, y):
            return U.apply_unet(params, x, t, ctx, y=y, cfg=unet_cfg,
                                policy=policy)

        @jax.jit
        def program(unet_params, noise, latent, cond, uncond, cfg_scale, key,
                    mask=None, y_cond=None, y_uncond=None, cn_params=None,
                    hint=None, ctrl_strength=None, concat_cond=None):
            base_apply = unet_apply_y if cfg_key.has_y else unet_apply
            if cfg_key.control_cfg is not None:
                base_apply = _make_control_apply(
                    cfg_key.control_cfg, unet_cfg, policy, cn_params, hint,
                    ctrl_strength,
                )
            if cfg_key.uncond_free:
                from ..diffusion.cfg import make_denoiser_single

                denoise_fn = make_denoiser_single(
                    base_apply, unet_params, cond, ms, y_cond=y_cond,
                    concat=concat_cond,
                )
            else:
                denoise_fn = make_cfg_denoiser(
                    base_apply, unet_params, cond, uncond, cfg_scale, ms,
                    y_cond=y_cond, y_uncond=y_uncond, concat=concat_cond,
                )
            if cfg_key.masked:
                from ..diffusion.inpaint import (
                    differential_diffusion_mask_fn,
                    make_masked_denoiser,
                )

                mask_fn = (
                    differential_diffusion_mask_fn(ms)
                    if cfg_key.differential_diffusion
                    else None
                )
                denoise_fn = make_masked_denoiser(
                    denoise_fn, latent.astype(jnp.float32),
                    noise.astype(jnp.float32), mask, mask_fn
                )
            return SMP.sample(
                denoise_fn, ms, noise, sigmas, latent=latent, key=key,
                sampler_name=cfg_key.sampler_name, step_offset=step_offset,
                sampler_options=dict(cfg_key.options),
            )

        self._cache_program(key, program)
        return program

    def _adm_vectors(self, latent, positive, negative,
                     aesthetic_pos: float = 6.0, aesthetic_neg: float = 2.5):
        """SDXL ADM vector conditioning (base: pooled + 6 size embeddings;
        refiner: pooled + 4 size + aesthetic score) or (None, None) for
        SD1/SD2. Beyond the reference (SD1.5-only registry, :6015)."""
        if not self.sd.unet_config.adm_in_channels:
            return None, None
        from ..models.clip import (
            sdxl_refiner_vector_conditioning,
            sdxl_vector_conditioning,
        )

        r = self.sd.vae_config.downscale_ratio
        w_px, h_px = latent.shape[2] * r, latent.shape[1] * r
        pooled_c = positive[1] if not isinstance(positive, jnp.ndarray) else None
        pooled_u = negative[1] if not isinstance(negative, jnp.ndarray) else None
        if pooled_c is None or pooled_u is None:
            raise ValueError("SDXL models need (cond, pooled) conditioning tuples")
        if self.sd.is_refiner:
            return (
                sdxl_refiner_vector_conditioning(pooled_c, w_px, h_px,
                                                 aesthetic_pos),
                sdxl_refiner_vector_conditioning(pooled_u, w_px, h_px,
                                                 aesthetic_neg),
            )
        return (
            sdxl_vector_conditioning(pooled_c, w_px, h_px),
            sdxl_vector_conditioning(pooled_u, w_px, h_px),
        )

    # ------------------------------------------------------------ core ------
    def sample_latent(
        self,
        latent: jnp.ndarray,  # (B, h, w, 4) model-space latent
        positive,
        negative,
        seed: int = 0,
        steps: int = 20,
        cfg: float = 7.0,
        sampler_name: str = "euler_ancestral",
        scheduler: str = "karras",
        denoise: float = 1.0,
        disable_noise: bool = False,
        noise_mask: jnp.ndarray | None = None,
        differential_diffusion: bool = False,
        start_step: int | None = None,
        last_step: int | None = None,
        deepcache_interval: int = 0,
        uncond_interval: int = 0,
        noise: jnp.ndarray | None = None,
        cfg_cutoff: float | None = None,
        control=None,  # (cn_params, cn_cfg, hint, strength) — ControlNet
        concat_cond: jnp.ndarray | None = None,  # (B,h,w,Cc) inpaint models
        sampler_options: dict | None = None,  # eta/s_noise/... (ref :1118)
        _uncond_free: bool = False,
    ) -> jnp.ndarray:
        """The KSampler node (ref KSampler2.sample :6704 / common_ksampler
        :6657): seeded noise + full jit'd sampling program. ``noise_mask``
        (B,h,w,1): inpaint-style masked denoise (ref :2629/:9451).
        ``start_step``/``last_step``: sigma-window slicing (the Impact-pack
        ``separated_sample`` semantics, ref :9113). For SDXL models the
        pooled outputs carried in (cond, pooled) tuples become ADM vectors.

        Serving-batch extensions (beyond the reference's one-request flow):
        ``seed`` may be a sequence of B per-sample seeds — initial AND
        per-step sampler noise are then drawn per sample (noise.keys_for),
        so each sample reproduces its solo-run image regardless of batch
        composition; ``cfg`` may be a (B,) array for per-sample guidance;
        ``noise`` overrides the initial noise explicitly.

        ``cfg_cutoff`` (opt-in accelerator, e.g. 0.6): run CFG only for the
        first fraction of steps, then resume the SAME schedule cond-only
        (UNet batch B instead of 2·B) — guidance matters most early in the
        trajectory ("Applying Guidance in a Limited Interval", arXiv
        2404.07724); the handoff reuses the exact suffix-noise window
        machinery (KSamplerAdvanced semantics).

        ``uncond_interval`` (opt-in accelerator, e.g. 2): guidance-delta
        caching — the uncond CFG branch runs every N steps and skip steps
        are cond-only at half UNet batch, reusing the stored
        ``d_cond − d_uncond`` delta (the DeepCache temporal-redundancy
        observation applied to the guidance term). Composes with
        ``deepcache_interval`` (both >1): skip steps then run cond-only
        through the SHALLOW blocks only, and a deep-cache refresh promotes
        the step to a full CFG eval so both cache halves stay coherent
        (_make_dual_cache_cfg_denoiser). Both cached accelerators reach
        masked runs too (the detailer's per-seg passes — the reference's
        slowest phase — via make_masked_stateful_denoiser); silently
        disabled (like DeepCache) for ControlNet/inpaint-concat runs."""
        if cfg_cutoff is not None and 0.0 < cfg_cutoff < 1.0 and steps >= 2:
            if noise_mask is not None:
                raise ValueError(
                    "cfg_cutoff does not compose with masked sampling: the "
                    "resumed phase would blend zero noise into the preserved "
                    "region (run masked sampling without cfg_cutoff)"
                )
            if start_step is not None or last_step is not None:
                raise ValueError(
                    "cfg_cutoff manages its own step window; it cannot be "
                    "combined with start_step/last_step"
                )
            k = max(1, min(steps - 1, round(steps * cfg_cutoff)))
            x = self.sample_latent(
                latent, positive, negative, seed=seed, steps=steps, cfg=cfg,
                sampler_name=sampler_name, scheduler=scheduler,
                denoise=denoise, disable_noise=disable_noise,
                deepcache_interval=deepcache_interval,
                uncond_interval=uncond_interval,
                start_step=0, last_step=k, noise=noise, control=control,
                concat_cond=concat_cond, sampler_options=sampler_options,
            )
            return self.sample_latent(
                x, positive, negative, seed=seed, steps=steps, cfg=cfg,
                sampler_name=sampler_name, scheduler=scheduler,
                denoise=denoise, disable_noise=True,
                start_step=k, control=control, concat_cond=concat_cond,
                sampler_options=sampler_options, _uncond_free=True,
            )
        if not _uncond_free and np.isscalar(cfg) and float(cfg) == 1.0:
            # cfg 1.0 makes the CFG combine collapse to d_cond exactly
            # (d_u + 1·(d_c − d_u) = d_c), so the uncond half of every UNet
            # eval is dead weight — run cond-only at batch B, not 2·B.
            # Exact (not gated); a 2× step-rate win for guidance-free runs
            # (LCM-style sampling). The cached CFG accelerators are
            # superseded here (cond-only already beats what they save) and
            # drop out, keeping the chunked path's trajectory identical.
            _uncond_free = True
            deepcache_interval = uncond_interval = 0
        cond = positive if isinstance(positive, jnp.ndarray) else positive[0]
        uncond = negative if isinstance(negative, jnp.ndarray) else negative[0]
        y_cond, y_uncond = self._adm_vectors(latent, positive, negative)
        sigmas = SMP.sigmas_for(self.sd.model_sampling, scheduler, steps, denoise)
        lo = 0
        if start_step is not None or last_step is not None:
            lo = start_step or 0
            hi = last_step if last_step is not None else steps
            sigmas = sigmas[lo : hi + 1]
        if sigmas.shape[0] <= 1:
            return latent
        cfg_key = SampleConfig(
            steps, sampler_name, scheduler, denoise, disable_noise,
            cond.shape[1], uncond.shape[1],
            masked=noise_mask is not None,
            differential_diffusion=differential_diffusion and noise_mask is not None,
            deepcache=(
                deepcache_interval
                if control is None and concat_cond is None
                else 0
            ),
            uncond_interval=(
                uncond_interval
                if control is None and concat_cond is None
                and not _uncond_free
                else 0
            ),
            has_y=y_cond is not None,
            uncond_free=_uncond_free,
            control_cfg=self._control_cfg_key(control),
            has_concat=concat_cond is not None,
            options=tuple(sorted((sampler_options or {}).items())),
        )
        program = self._sample_program(cfg_key, sigmas.tobytes(), step_offset=lo)
        default_noise, rng = self._seed_noise(
            latent, seed, disable_noise, make_noise=noise is None
        )
        if noise is None:
            noise = default_noise
        args = [
            self.sd.unet_params, self._shard_batch(noise),
            self._shard_batch(latent), self._shard_batch(cond),
            self._shard_batch(uncond), jnp.asarray(cfg, jnp.float32),
            rng,
        ]
        kwargs = {}
        if noise_mask is not None:
            mask = jnp.asarray(noise_mask, jnp.float32)
            if mask.ndim == 3:
                mask = mask[..., None]
            kwargs["mask"] = mask
        if y_cond is not None:
            kwargs["y_cond"] = y_cond
            kwargs["y_uncond"] = y_uncond
        kwargs.update(self._control_kwargs(control))
        if concat_cond is not None:
            kwargs["concat_cond"] = jnp.asarray(concat_cond, jnp.float32)
        return program(*args, **kwargs)

    def _stateful_program(self, cfg_key: SampleConfig, sigmas: np.ndarray,
                          step_offset: int = 0):
        """Sampling program for the stateful-denoiser accelerators:
        DeepCache deep-block reuse (arXiv 2312.03209, PAPERS.md — the deep
        UNet half recomputes every ``deepcache`` steps) or guidance-delta
        caching (``uncond_interval``: the uncond CFG branch runs every N
        steps, skip steps are cond-only at half UNet batch). Opt-in
        accelerators beyond the reference."""
        import math as _math

        from ..diffusion.samplers import make_stepper, run_steps

        ms = self.sd.model_sampling
        unet_cfg = self.sd.unet_config
        policy = self.policy
        if cfg_key.deepcache > 1 and cfg_key.uncond_interval > 1:
            which = "deepcache+uncond_interval"
        elif cfg_key.deepcache > 1:
            which = "deepcache"
        else:
            which = "uncond_interval"

        if make_stepper(
            cfg_key.sampler_name, lambda x, s: x, jax.random.PRNGKey(0)
        ) is None:
            raise ValueError(
                f"{which} unsupported for sampler {cfg_key.sampler_name!r} "
                "(needs a fixed-step single-eval form)"
            )

        max_denoise = _math.isclose(
            float(sigmas[0]), float(ms.sigma_max), rel_tol=1e-3
        ) or float(sigmas[0]) > float(ms.sigma_max)
        n = sigmas.shape[0] - 1

        opts = dict(cfg_key.options)

        @jax.jit
        def program(unet_params, noise, latent, cond, uncond, cfg_scale, key,
                    mask=None, y_cond=None, y_uncond=None):
            b = latent.shape[0]
            if cfg_key.deepcache > 1 and cfg_key.uncond_interval > 1:
                denoise_fn = _make_dual_cache_cfg_denoiser(
                    ms, unet_cfg, policy, unet_params, cond, uncond,
                    cfg_scale, cfg_key.deepcache, cfg_key.uncond_interval,
                    y_cond=y_cond, y_uncond=y_uncond,
                )
                state0 = (
                    jnp.zeros(
                        U.deepcache_shape(unet_cfg, latent.shape[1],
                                          latent.shape[2], 2 * b),
                        policy.compute_dtype,
                    ),
                    jnp.zeros(latent.shape, jnp.float32),
                )
            elif cfg_key.deepcache > 1:
                denoise_fn = _make_deepcache_cfg_denoiser(
                    ms, unet_cfg, policy, unet_params, cond, uncond,
                    cfg_scale, cfg_key.deepcache, y_cond=y_cond,
                    y_uncond=y_uncond,
                )
                state0 = jnp.zeros(
                    U.deepcache_shape(unet_cfg, latent.shape[1],
                                      latent.shape[2], 2 * b),
                    policy.compute_dtype,
                )
            else:
                denoise_fn = _make_uncond_skip_cfg_denoiser(
                    ms, unet_cfg, policy, unet_params, cond, uncond,
                    cfg_scale, cfg_key.uncond_interval, y_cond=y_cond,
                    y_uncond=y_uncond,
                )
                state0 = jnp.zeros(latent.shape, jnp.float32)
            if cfg_key.masked:
                from ..diffusion.inpaint import (
                    differential_diffusion_mask_fn,
                    make_masked_stateful_denoiser,
                )

                mask_fn = (
                    differential_diffusion_mask_fn(ms)
                    if cfg_key.differential_diffusion
                    else None
                )
                denoise_fn = make_masked_stateful_denoiser(
                    denoise_fn, latent.astype(jnp.float32),
                    noise.astype(jnp.float32), mask, mask_fn
                )
            x = ms.noise_scaling(
                jnp.float32(sigmas[0]), noise.astype(jnp.float32),
                latent.astype(jnp.float32), max_denoise,
            )
            body = make_stepper(
                cfg_key.sampler_name, denoise_fn, key, stateful=True,
                step_offset=step_offset,
                eta=opts.get("eta", 1.0), s_noise=opts.get("s_noise", 1.0),
            )
            x, _, _ = run_steps(
                body, x, (jnp.zeros_like(x), jnp.float32(1.0)),
                jnp.arange(n), (jnp.asarray(sigmas[:-1]), jnp.asarray(sigmas[1:])),
                state=state0,
            )
            return ms.inverse_noise_scaling(jnp.float32(sigmas[-1]), x)

        return program

    # --------------------------------------------- chunked (interruptible) --
    def _chunk_program(self, cfg_key: SampleConfig, chunk_len: int,
                       step_offset: int = 0):
        """One compiled scan over ``chunk_len`` steps with the full feature
        set of the monolithic program: CFG or cond-only (``uncond_free``,
        the cfg_cutoff tail), masked denoise (+DifferentialDiffusion, the
        detailer's path), and DeepCache (cache threads through ``state``).
        ``step_offset``: absolute index of the phase's first step — the
        noise-key offset for suffix windows (indices stay phase-relative so
        multistep order gates and the DeepCache cadence match a monolithic
        run of the phase)."""
        key = ("chunk", cfg_key, chunk_len, step_offset, self.sd.unet_config)
        if key in self._programs:
            self._programs.move_to_end(key)
            return self._programs[key]
        ms = self.sd.model_sampling
        unet_cfg = self.sd.unet_config
        policy = self.policy

        def unet_apply(params, x, t, ctx):
            return U.apply_unet(params, x, t, ctx, cfg=unet_cfg, policy=policy)

        def unet_apply_y(params, x, t, ctx, y):
            return U.apply_unet(params, x, t, ctx, y=y, cfg=unet_cfg,
                                policy=policy)

        from ..diffusion.samplers import make_stepper, run_steps

        opts = dict(cfg_key.options)
        eta = opts.get("eta", 1.0)
        s_noise = opts.get("s_noise", 1.0)

        @jax.jit
        def program(unet_params, x, aux, cond, uncond, cfg_scale, key,
                    indices, sig_lo, sig_hi, state=(), mask=None,
                    latent_orig=None, noise0=None, y_cond=None, y_uncond=None,
                    cn_params=None, hint=None, ctrl_strength=None):
            base_apply = unet_apply_y if cfg_key.has_y else unet_apply
            if cfg_key.control_cfg is not None:
                base_apply = _make_control_apply(
                    cfg_key.control_cfg, unet_cfg, policy, cn_params, hint,
                    ctrl_strength,
                )
            if cfg_key.deepcache > 1 or cfg_key.uncond_interval > 1:
                if cfg_key.deepcache > 1 and cfg_key.uncond_interval > 1:
                    denoise_fn = _make_dual_cache_cfg_denoiser(
                        ms, unet_cfg, policy, unet_params, cond, uncond,
                        cfg_scale, cfg_key.deepcache,
                        cfg_key.uncond_interval, y_cond=y_cond,
                        y_uncond=y_uncond,
                    )
                elif cfg_key.deepcache > 1:
                    denoise_fn = _make_deepcache_cfg_denoiser(
                        ms, unet_cfg, policy, unet_params, cond, uncond,
                        cfg_scale, cfg_key.deepcache, y_cond=y_cond,
                        y_uncond=y_uncond,
                    )
                else:
                    denoise_fn = _make_uncond_skip_cfg_denoiser(
                        ms, unet_cfg, policy, unet_params, cond, uncond,
                        cfg_scale, cfg_key.uncond_interval, y_cond=y_cond,
                        y_uncond=y_uncond,
                    )
                if cfg_key.masked:
                    from ..diffusion.inpaint import (
                        differential_diffusion_mask_fn,
                        make_masked_stateful_denoiser,
                    )

                    mask_fn = (
                        differential_diffusion_mask_fn(ms)
                        if cfg_key.differential_diffusion
                        else None
                    )
                    denoise_fn = make_masked_stateful_denoiser(
                        denoise_fn, latent_orig, noise0, mask, mask_fn
                    )
                body = make_stepper(
                    cfg_key.sampler_name, denoise_fn, key, eta=eta,
                    s_noise=s_noise, stateful=True, step_offset=step_offset,
                )
                x, aux2, state = run_steps(
                    body, x, aux, indices, (sig_lo, sig_hi), state=state
                )
                return x, aux2, state
            if cfg_key.uncond_free:
                from ..diffusion.cfg import make_denoiser_single

                denoise_fn = make_denoiser_single(
                    base_apply, unet_params, cond, ms, y_cond=y_cond,
                )
            else:
                denoise_fn = make_cfg_denoiser(
                    base_apply, unet_params, cond, uncond, cfg_scale, ms,
                    y_cond=y_cond, y_uncond=y_uncond,
                )
            if cfg_key.masked:
                from ..diffusion.inpaint import (
                    differential_diffusion_mask_fn,
                    make_masked_denoiser,
                )

                mask_fn = (
                    differential_diffusion_mask_fn(ms)
                    if cfg_key.differential_diffusion
                    else None
                )
                denoise_fn = make_masked_denoiser(
                    denoise_fn, latent_orig, noise0, mask, mask_fn
                )
            body = make_stepper(
                cfg_key.sampler_name, denoise_fn, key, eta=eta,
                s_noise=s_noise, step_offset=step_offset,
            )
            x, aux2, state = run_steps(
                body, x, aux, indices, (sig_lo, sig_hi), state=state
            )
            return x, aux2, state

        self._cache_program(key, program)
        return program

    def _adaptive_chunk_programs(self, cfg_key: SampleConfig,
                                 sigmas_bytes: bytes, seg_iters: int):
        """(run, finish) jitted programs advancing the dpm_adaptive
        while_loop by ≤seg_iters solver iterations per call (samplers.
        dpm_adaptive_segment) — host polls interrupts/previews between calls,
        mirroring the reference's in-loop interrupt_flag check (:1076)."""
        key = ("adaptive_chunk", cfg_key, sigmas_bytes, seg_iters,
               self.sd.unet_config)
        if key in self._programs:
            self._programs.move_to_end(key)
            return self._programs[key]
        sigmas = np.frombuffer(sigmas_bytes, dtype=np.float32)
        ms = self.sd.model_sampling
        unet_cfg = self.sd.unet_config
        policy = self.policy

        def unet_apply(params, x, t, ctx):
            return U.apply_unet(params, x, t, ctx, cfg=unet_cfg, policy=policy)

        def unet_apply_y(params, x, t, ctx, y):
            return U.apply_unet(params, x, t, ctx, y=y, cfg=unet_cfg,
                                policy=policy)

        from ..diffusion import samplers as S

        def with_denoiser(fn):
            @jax.jit
            def prog(unet_params, cond, uncond, cfg_scale, carry, key,
                     y_cond=None, y_uncond=None, mask=None,
                     latent_orig=None, noise0=None, cn_params=None,
                     hint=None, ctrl_strength=None):
                base_apply = unet_apply_y if cfg_key.has_y else unet_apply
                if cfg_key.control_cfg is not None:
                    base_apply = _make_control_apply(
                        cfg_key.control_cfg, unet_cfg, policy, cn_params,
                        hint, ctrl_strength,
                    )
                denoise_fn = make_cfg_denoiser(
                    base_apply,
                    unet_params, cond, uncond, cfg_scale, ms,
                    y_cond=y_cond, y_uncond=y_uncond,
                )
                if cfg_key.masked:
                    from ..diffusion.inpaint import (
                        differential_diffusion_mask_fn,
                        make_masked_denoiser,
                    )

                    mask_fn = (
                        differential_diffusion_mask_fn(ms)
                        if cfg_key.differential_diffusion
                        else None
                    )
                    denoise_fn = make_masked_denoiser(
                        denoise_fn, latent_orig, noise0, mask, mask_fn
                    )
                _, run, finish = S.dpm_adaptive_segment(
                    denoise_fn, sigmas, key=key, seg_iters=seg_iters,
                    **dict(cfg_key.options),
                )
                return fn(run, finish, carry)

            return prog

        run_prog = with_denoiser(lambda run, finish, carry: run(carry))
        finish_prog = with_denoiser(lambda run, finish, carry: finish(carry))
        self._cache_program(key, (run_prog, finish_prog))
        return self._programs[key]

    def _sample_adaptive_chunked(self, latent, cond, uncond, seed, steps, cfg,
                                 scheduler, denoise, chunk_size, on_chunk,
                                 y_cond=None, y_uncond=None, options=(),
                                 noise_mask=None,
                                 differential_diffusion=False,
                                 control=None):
        """``options``: sorted item tuple of dpm_adaptive sampler options
        (eta/s_noise/pcoeff/icoeff/dcoeff/rtol/atol...) — forwarded into the
        bounded segments so the interruptible path carries the same SDE/PID
        variants as the monolithic sampler (ref signature :1118-1140).

        ``noise_mask`` (+``differential_diffusion``): inpaint-style masked
        denoise via make_masked_denoiser — the same wrapper the monolithic
        program uses, so a masked dpm_adaptive run is interruptible too
        (the reference polls inside its adaptive loop unconditionally,
        :1076; mask semantics :2629). ``seed`` may be a sequence of
        per-sample seeds (serving semantics, as in sample_latent)."""
        import math as _math

        from ..diffusion import samplers as S

        ms = self.sd.model_sampling
        sigmas = SMP.sigmas_for(ms, scheduler, steps, denoise)
        if sigmas.shape[0] <= 1:
            return latent
        noise, rng = self._seed_noise(latent, seed)
        max_denoise = _math.isclose(
            float(sigmas[0]), float(ms.sigma_max), rel_tol=1e-3
        ) or float(sigmas[0]) > float(ms.sigma_max)
        x = ms.noise_scaling(
            jnp.float32(sigmas[0]), noise, latent.astype(jnp.float32), max_denoise
        )
        cfg_key = SampleConfig(
            steps, "dpm_adaptive", scheduler, denoise, False,
            cond.shape[1], uncond.shape[1], has_y=y_cond is not None,
            masked=noise_mask is not None,
            differential_diffusion=(
                differential_diffusion and noise_mask is not None
            ),
            control_cfg=self._control_cfg_key(control),
            options=tuple(options),
        )
        # ≥3 UNet evals per solver iteration; chunk_size counts UNet steps
        seg_iters = max(1, chunk_size // 3)
        run_prog, finish_prog = self._adaptive_chunk_programs(
            cfg_key, sigmas.tobytes(), seg_iters
        )
        init, _, _ = S.dpm_adaptive_segment(lambda x, s: x, sigmas,
                                            seg_iters=seg_iters)
        carry = init(x)
        max_steps = 200
        args = (self.sd.unet_params, cond, uncond, jnp.float32(cfg))
        kwargs = (
            {} if y_cond is None
            else {"y_cond": y_cond, "y_uncond": y_uncond}
        )
        if noise_mask is not None:
            mask = jnp.asarray(noise_mask, jnp.float32)
            if mask.ndim == 3:
                mask = mask[..., None]
            kwargs.update(
                mask=mask,
                latent_orig=latent.astype(jnp.float32),
                noise0=noise.astype(jnp.float32),
            )
        kwargs.update(self._control_kwargs(control))
        while True:
            carry, done = run_prog(*args, carry, rng, **kwargs)
            n_iter = int(carry[6])
            if on_chunk is not None:
                if on_chunk(n_iter, max_steps, np.asarray(carry[0])) is False:
                    break
            if bool(done) or n_iter >= max_steps:
                break
        x = finish_prog(*args, carry, rng, **kwargs)
        return ms.inverse_noise_scaling(jnp.float32(sigmas[-1]), x)

    def sample_latent_chunked(
        self,
        latent,
        positive,
        negative,
        seed: int = 0,
        steps: int = 20,
        cfg: float = 7.0,
        sampler_name: str = "euler_ancestral",
        scheduler: str = "karras",
        denoise: float = 1.0,
        chunk_size: int = 5,
        on_chunk=None,  # fn(steps_done, total, latent_np) -> False to stop
        deepcache_interval: int = 0,
        uncond_interval: int = 0,
        cfg_cutoff: float | None = None,
        noise_mask: jnp.ndarray | None = None,
        differential_diffusion: bool = False,
        sampler_options: dict | None = None,
        control=None,  # (cn_params, cn_cfg, hint, strength) — ControlNet
    ):
        """Interruptible sampling: compiled scans over chunks of steps, host
        polling between chunks (reference interrupt_flag/preview parity,
        LightDiffusion.py:922/:937; SURVEY §7). dpm_adaptive runs as bounded
        while_loop segments (ref polls inside its adaptive loop too, :1076).
        SDXL ADM vectors thread through every chunk program. ``control``:
        per-step ControlNet residuals (as in sample_latent) — interruptible
        control-guided runs, including dpm_adaptive; the cached accelerators
        are silently disabled for control runs (as in the monolithic path).

        Carries the monolithic path's features so the GUI/interruptible
        frontend reaches the same accelerators and masked flows:
          - ``deepcache_interval`` > 1: DeepCache (cache threads across
            chunks — identical trajectory to the monolithic program)
          - ``uncond_interval`` > 1: guidance-delta caching (the stored
            CFG delta threads across chunks the same way)
          - ``cfg_cutoff``: CFG for the first fraction of steps, cond-only
            tail (arXiv 2404.07724); the tail phase re-keys its noise at the
            absolute step (suffix-noise semantics)
          - ``noise_mask`` (+``differential_diffusion``): inpaint-style
            masked denoise — the detailer's per-seg path (ref :2629/:9451)
          - ``sampler_options``: eta/s_noise for fixed-step SDE samplers,
            full option set for dpm_adaptive (ref :1118-1140)
        """
        from ..diffusion.samplers import make_stepper

        cond = positive if isinstance(positive, jnp.ndarray) else positive[0]
        uncond = negative if isinstance(negative, jnp.ndarray) else negative[0]
        y_cond, y_uncond = self._adm_vectors(latent, positive, negative)
        opts = tuple(sorted((sampler_options or {}).items()))
        if sampler_name == "dpm_adaptive":
            return self._sample_adaptive_chunked(
                latent, cond, uncond, seed, steps, cfg, scheduler,
                denoise, chunk_size, on_chunk, y_cond, y_uncond,
                options=opts, noise_mask=noise_mask,
                differential_diffusion=differential_diffusion,
                control=control,
            )
        no_stepper = make_stepper(
            sampler_name, lambda x, s: x, jax.random.PRNGKey(0)
        ) is None
        if no_stepper:
            if deepcache_interval > 1 or uncond_interval > 1:
                # the cached accelerators need a fixed-step single-eval
                # stepper — downgrade gracefully like txt2img does rather
                # than erroring the whole (GUI) run out of sample_latent's
                # stateful-program gate
                log.info(
                    "deepcache/uncond_interval unsupported for sampler %r; "
                    "running unaccelerated", sampler_name,
                )
            return self.sample_latent(
                latent, positive, negative, seed=seed, steps=steps, cfg=cfg,
                sampler_name=sampler_name, scheduler=scheduler,
                denoise=denoise,
                cfg_cutoff=cfg_cutoff, noise_mask=noise_mask,
                differential_diffusion=differential_diffusion,
                sampler_options=sampler_options, control=control,
            )
        import math as _math

        ms = self.sd.model_sampling
        sigmas = SMP.sigmas_for(ms, scheduler, steps, denoise)
        if sigmas.shape[0] == 0:
            return latent
        n = sigmas.shape[0] - 1
        noise, rng = self._seed_noise(latent, seed)
        max_denoise = _math.isclose(
            float(sigmas[0]), float(ms.sigma_max), rel_tol=1e-3
        ) or float(sigmas[0]) > float(ms.sigma_max)
        x = ms.noise_scaling(
            jnp.float32(sigmas[0]), noise, latent.astype(jnp.float32), max_denoise
        )
        aux = (jnp.zeros_like(x), jnp.float32(1.0))
        # cfg_cutoff: steps [0, k) guided, [k, n] cond-only — matches the
        # monolithic two-call handoff exactly (inverse_noise_scaling is the
        # identity, so the continuous trajectory IS the mono trajectory)
        k = None
        if cfg_cutoff is not None and 0.0 < cfg_cutoff < 1.0 and steps >= 2:
            if noise_mask is not None:
                raise ValueError(
                    "cfg_cutoff does not compose with masked sampling (see "
                    "sample_latent)"
                )
            k = max(1, min(n - 1, round(steps * cfg_cutoff)))
        # cached accelerators are disabled for control runs (the control
        # residuals feed the deep blocks apply_unet_cached doesn't carry),
        # matching the monolithic path's silent downgrade
        # cfg 1.0 collapses CFG to d_cond exactly — run cond-only at batch
        # B (see sample_latent); works with masks (the masked wrapper sits
        # outside the denoiser either way)
        guidance_free = np.isscalar(cfg) and float(cfg) == 1.0
        dc = deepcache_interval if deepcache_interval > 1 and control is None \
            and not guidance_free else 0
        us = uncond_interval if uncond_interval > 1 and control is None \
            and not guidance_free else 0
        mask_kwargs = {}
        if noise_mask is not None:
            mask = jnp.asarray(noise_mask, jnp.float32)
            if mask.ndim == 3:
                mask = mask[..., None]
            mask_kwargs = dict(
                mask=mask,
                latent_orig=latent.astype(jnp.float32),
                noise0=noise,
            )
        y_kwargs = (
            {} if y_cond is None
            else {"y_cond": y_cond, "y_uncond": y_uncond}
        )
        # hoisted: rebuilding these per chunk would re-upload the full-res
        # hint tensor every few steps of a control-guided interruptible run
        ctrl_kwargs = self._control_kwargs(control)
        state = ()
        if dc:
            state = jnp.zeros(
                U.deepcache_shape(
                    self.sd.unet_config, latent.shape[1], latent.shape[2],
                    2 * latent.shape[0],
                ),
                self.policy.compute_dtype,
            )
            if us:
                state = (state, jnp.zeros(latent.shape, jnp.float32))
        elif us:
            state = jnp.zeros(latent.shape, jnp.float32)
        done = 0
        while done < n:
            in_tail = k is not None and done >= k
            phase_start = k if in_tail else 0
            phase_end = n if k is None or in_tail else k
            m = min(chunk_size, phase_end - done)
            cfg_key = SampleConfig(
                steps, sampler_name, scheduler, denoise, False,
                cond.shape[1], uncond.shape[1],
                masked=noise_mask is not None,
                differential_diffusion=(
                    differential_diffusion and noise_mask is not None
                ),
                deepcache=0 if in_tail else dc,
                uncond_interval=0 if in_tail else us,
                has_y=y_cond is not None,
                uncond_free=in_tail or guidance_free,
                control_cfg=self._control_cfg_key(control),
                options=opts,
            )
            program = self._chunk_program(cfg_key, m, step_offset=phase_start)
            rel = done - phase_start
            idx = jnp.arange(rel, rel + m)
            lo = jnp.asarray(sigmas[done : done + m])
            hi = jnp.asarray(sigmas[done + 1 : done + m + 1])
            stateful = cfg_key.deepcache > 1 or cfg_key.uncond_interval > 1
            x, aux, state_out = program(
                self.sd.unet_params, x, aux, cond, uncond, jnp.float32(cfg),
                rng, idx, lo, hi, state if stateful else (),
                **mask_kwargs, **y_kwargs, **ctrl_kwargs,
            )
            if stateful:
                state = state_out
            done += m
            if k is not None and done == k:
                # phase handoff: the mono path's second call starts with a
                # fresh multistep history — reset aux to match it exactly
                aux = (jnp.zeros_like(x), jnp.float32(1.0))
            if on_chunk is not None:
                if on_chunk(done, n, np.asarray(x)) is False:
                    break
        return ms.inverse_noise_scaling(jnp.float32(sigmas[-1]), x)

    def empty_latent(self, width: int, height: int, batch: int = 1):
        """EmptyLatentImage (ref :6628): zeros (B, H/8, W/8, 4)."""
        r = self.sd.vae_config.downscale_ratio
        return jnp.zeros((batch, height // r, width // r, 4), jnp.float32)

    def decode(self, latent):
        """VAE decode with the automatic tiled-OOM fallback (SURVEY §5.3):
        a full-batch 1024² fp32 decode (~8.6 GB conv activations at batch 4)
        exceeds v5e HBM; decode_safe retries tiled instead of crashing."""
        return self.vae.decode_safe(latent)

    def encode_image(self, pixels, seed: int = 0):
        return self.vae.encode(pixels, key=jax.random.PRNGKey(seed))

    def upscale_latent(self, latent, width, height, method="bislerp"):
        """LatentUpscale (ref :6639): operates on latent (H/8) dims."""
        r = self.sd.vae_config.downscale_ratio
        return common_upscale(latent, width // r, height // r, method)


def txt2img(
    pipe: SDPipeline,
    prompt: str,
    negative_prompt: str = "",
    width: int = 512,
    height: int = 512,
    steps: int = 20,
    cfg: float = 7.0,
    seed: int = 0,
    sampler_name: str = "dpmpp_2m_sde",
    scheduler: str = "karras",
    batch: int = 1,
    hires_fix: bool = False,
    hires_steps: int = 10,
    hires_denoise: float = 0.45,
    hires_cfg: float = 8.0,
    deepcache_interval: int = 0,
    uncond_interval: int = 0,
    cfg_cutoff: float | None = None,
    control=None,  # (cn_params, cn_cfg, hint, strength)
) -> np.ndarray:
    """Full txt2img (ref GUI flow :10483 / headless pipeline :10001):
    encode → sample → [hires: bislerp ×2 + second pass] → decode.
    Returns (B, H, W, 3) float32 in [0,1]."""
    positive = pipe.encode_text(prompt)
    negative = pipe.encode_text(negative_prompt)
    latent = pipe.empty_latent(width, height, batch)
    base_dc, base_ui = deepcache_interval, uncond_interval
    if base_dc > 1 or base_ui > 1:
        from ..diffusion.samplers import make_stepper

        if make_stepper(
            sampler_name, lambda x, s: x, jax.random.PRNGKey(0)
        ) is None:
            # adaptive/multi-eval samplers have no fixed-step form, so the
            # stateful cached accelerators cannot apply — run the base pass
            # plain rather than erroring out of the whole workload (the
            # hires pass below is always euler_ancestral and keeps them)
            log.info(
                "deepcache/uncond_interval unsupported for sampler %r; "
                "base pass runs unaccelerated", sampler_name,
            )
            base_dc = base_ui = 0
    latent = pipe.sample_latent(
        latent, positive, negative, seed=seed, steps=steps, cfg=cfg,
        sampler_name=sampler_name, scheduler=scheduler,
        deepcache_interval=base_dc,
        uncond_interval=base_ui, cfg_cutoff=cfg_cutoff,
        control=control,
    )
    if hires_fix:
        latent = pipe.upscale_latent(latent, width * 2, height * 2, "bislerp")
        latent = pipe.sample_latent(
            latent, positive, negative, seed=seed, steps=hires_steps,
            cfg=hires_cfg, sampler_name="euler_ancestral", scheduler="normal",
            denoise=hires_denoise, deepcache_interval=deepcache_interval,
            uncond_interval=uncond_interval,
        )
    return np.asarray(pipe.decode(latent))


def img2img(
    pipe: SDPipeline,
    image: np.ndarray,  # (B, H, W, 3) float in [0, 1]
    prompt: str,
    negative_prompt: str = "",
    denoise: float = 0.75,
    steps: int = 20,
    cfg: float = 7.0,
    seed: int = 0,
    sampler_name: str = "dpmpp_2m_sde",
    scheduler: str = "karras",
    control=None,
) -> np.ndarray:
    """Plain image-to-image: VAE encode → partial denoise → decode. The
    standard SD img2img primitive; the reference's only img2img surface is
    the UltimateSDUpscale tile engine (ref :10325 — see postprocess/usdu.py
    for that parity path). ``denoise``<1 keeps the last ``steps`` sigmas of
    the lengthened schedule (ref denoise math :3097-3104)."""
    positive = pipe.encode_text(prompt)
    negative = pipe.encode_text(negative_prompt)
    latent = pipe.encode_image(jnp.asarray(image, jnp.float32), seed=seed)
    latent = pipe.sample_latent(
        latent, positive, negative, seed=seed, steps=steps, cfg=cfg,
        sampler_name=sampler_name, scheduler=scheduler, denoise=denoise,
        control=control,
    )
    return np.asarray(pipe.decode(latent))


def inpaint_conditioning(pipe: SDPipeline, pixels, mask, seed: int = 0):
    """Build the 9-channel inpaint-model input conditioning: concat latent
    ``[mask ‖ VAE(masked pixels)]`` at latent resolution (the ComfyUI
    InpaintModelConditioning convention; the reference registers only the
    4-channel SD1.5, ref :6015). ``pixels``: (B,H,W,3) in [0,1]; ``mask``:
    (B,H,W,1), 1 = region to repaint. Returns (B,h,w,5)."""
    pixels = jnp.asarray(pixels, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    if mask.ndim == 3:
        mask = mask[..., None]
    # fill the hole with 0.5 gray (= 0 after the VAE's [-1,1] shift) — the
    # distribution sd-1.5-inpainting was trained on; a plain zero would
    # encode BLACK and bias fills dark
    masked = (pixels - 0.5) * (1.0 - mask) + 0.5
    lat = pipe.encode_image(masked, seed=seed)
    m_lat = jax.image.resize(
        mask, (mask.shape[0],) + lat.shape[1:3] + (1,), "nearest"
    )
    return jnp.concatenate([m_lat, lat], axis=-1)


def inpaint(
    pipe: SDPipeline,
    image: np.ndarray,  # (B, H, W, 3) in [0, 1]
    mask: np.ndarray,  # (B, H, W, 1), 1 = repaint
    prompt: str,
    negative_prompt: str = "",
    steps: int = 20,
    cfg: float = 7.0,
    seed: int = 0,
    sampler_name: str = "euler_ancestral",
    scheduler: str = "karras",
) -> np.ndarray:
    """Inpainting with a dedicated 9-channel inpaint UNet (in_channels 9,
    auto-sniffed at load): full-denoise from noise with the per-step
    [mask ‖ masked-image-latent] concat conditioning. For 4-channel models
    use ``sample_latent(noise_mask=...)`` (latent-space masked blending)
    instead."""
    if pipe.sd.unet_config.in_channels <= 4:
        raise ValueError(
            "inpaint() needs a 9-channel inpaint UNet (this model has "
            f"in_channels={pipe.sd.unet_config.in_channels}); use "
            "sample_latent(noise_mask=...) for standard models"
        )
    positive = pipe.encode_text(prompt)
    negative = pipe.encode_text(negative_prompt)
    concat = inpaint_conditioning(pipe, image, mask, seed=seed)
    h_px, w_px = image.shape[1], image.shape[2]
    latent = pipe.empty_latent(w_px, h_px, image.shape[0])
    latent = pipe.sample_latent(
        latent, positive, negative, seed=seed, steps=steps, cfg=cfg,
        sampler_name=sampler_name, scheduler=scheduler, concat_cond=concat,
    )
    return np.asarray(pipe.decode(latent))


def txt2img_refined(
    base: SDPipeline,
    refiner: SDPipeline,
    prompt: str,
    negative_prompt: str = "",
    width: int = 1024,
    height: int = 1024,
    steps: int = 25,
    cfg: float = 7.0,
    seed: int = 0,
    sampler_name: str = "euler_ancestral",
    scheduler: str = "karras",
    refiner_switch: float = 0.8,
    batch: int = 1,
) -> np.ndarray:
    """Two-stage SDXL base→refiner txt2img (beyond the reference, which is
    SD1.5-only): the base model denoises window [0..k) of ONE shared
    schedule, the refiner resumes [k..n] with disable_noise — the
    KSamplerAdvanced handoff, made exact by the suffix-noise semantics
    (absolute step / interval noise keys). Both models share the discrete
    EPS sigma schedule and 0.13025-scaled latent space, so the latent passes
    straight through."""
    k = max(1, min(steps - 1, round(steps * refiner_switch)))
    pos_b = base.encode_text(prompt)
    neg_b = base.encode_text(negative_prompt)
    latent = base.empty_latent(width, height, batch)
    latent = base.sample_latent(
        latent, pos_b, neg_b, seed=seed, steps=steps, cfg=cfg,
        sampler_name=sampler_name, scheduler=scheduler,
        start_step=0, last_step=k,
    )
    pos_r = refiner.encode_text(prompt)
    neg_r = refiner.encode_text(negative_prompt)
    latent = refiner.sample_latent(
        latent, pos_r, neg_r, seed=seed, steps=steps, cfg=cfg,
        sampler_name=sampler_name, scheduler=scheduler,
        start_step=k, disable_noise=True,
    )
    return np.asarray(refiner.decode(latent))
