"""Headline benchmark: SD1.5 512×512 20-step txt2img on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's stable-fast CUDA path (README claims ~1.7× over
torch; commonly ~2 s/image for SD1.5 20 steps ⇒ 30 images/min/chip). We
report images/min/chip; vs_baseline = value / 30.

Runs with random weights (no checkpoints exist in this environment) — FLOPs
and memory traffic are weight-independent, so throughput is representative.
Diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from lightdiffusion_tpu.loader.checkpoint import init_random
    from lightdiffusion_tpu.pipelines.sd import SDPipeline, txt2img
    from lightdiffusion_tpu.ops import layers as L

    log("devices:", jax.devices())
    t0 = time.perf_counter()
    sd = init_random(jax.random.PRNGKey(0))
    pipe = SDPipeline(sd, policy=L.BF16, clip_skip=-2)
    log(f"init_random: {time.perf_counter()-t0:.1f}s")

    kwargs = dict(
        prompt="masterpiece, best quality, a cat on a mat",
        negative_prompt="blurry, low quality",
        width=512, height=512, steps=20, cfg=7.0,
        sampler_name="euler_ancestral", scheduler="karras",
    )

    def timed_reps(reps, batch, **kw):
        """Per-image seconds over `reps` timed runs (after a compile run):
        returns (mean, std) to pin down run-to-run variance."""
        txt2img(pipe, seed=0, batch=batch, **kw)  # compile + warm
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            txt2img(pipe, seed=i + 1, batch=batch, **kw)
            times.append((time.perf_counter() - t0) / batch)
        return float(np.mean(times)), float(np.std(times))

    # single-image latency (the <1s/image target)
    t0 = time.perf_counter()
    img = txt2img(pipe, seed=0, batch=1, **kwargs)
    log(f"first image (compile+run): {time.perf_counter()-t0:.1f}s shape={img.shape}")
    assert np.isfinite(img).all()
    lat, lat_std = timed_reps(3, 1, **kwargs)
    log(f"batch-1 latency: {lat*1000:.0f} ± {lat_std*1000:.0f} ms/image")
    # interactive latency with the max gated stack (the dual-cache skip
    # steps run the UNet at batch 1 here, so the win is larger than the
    # throughput ratio suggests); SSIM for this config is gated in the
    # batch-4 stack row below
    try:
        pipe.set_todo(4)
        lat_s, lat_s_std = timed_reps(
            3, 1, deepcache_interval=4, uncond_interval=2, **kwargs)
        log(f"batch-1 latency (DC-4+ui-2+ToDo-4 max stack): "
            f"{lat_s*1000:.0f} ± {lat_s_std*1000:.0f} ms/image "
            f"({lat/lat_s:.2f}x)")
    except Exception as e:
        log(f"batch-1 stacked latency failed ({e})")
    finally:
        pipe.set_todo(0)

    # ---- serving throughput: steady-state PIPELINED at the saturating
    # batch (4). Programs queue on the device back-to-back; the host's
    # dispatch + relay round-trips overlap device compute (what a serving
    # loop actually achieves). One sync per group; several groups for
    # variance. Falls back to per-call latency if the program fails. ----
    def pipelined(reps, batch, groups=3, **kw):
        pos = pipe.encode_text(kw["prompt"])
        neg = pipe.encode_text(kw["negative_prompt"])
        latent = pipe.empty_latent(kw["width"], kw["height"], batch)
        skw = dict(steps=kw["steps"], cfg=kw["cfg"],
                   sampler_name=kw["sampler_name"], scheduler=kw["scheduler"])
        for opt in ("deepcache_interval", "uncond_interval", "cfg_cutoff"):
            if kw.get(opt):
                skw[opt] = kw[opt]

        def run(seed):
            out = pipe.sample_latent(latent, pos, neg, seed=seed, **skw)
            return pipe.decode(out)

        img = run(0)  # compile + warm
        float(np.asarray(img.ravel()[0]))
        times = []
        for gi in range(groups):
            t0 = time.perf_counter()
            for i in range(reps):
                img = run(gi * reps + i + 1)
            float(np.asarray(img.ravel()[0]))  # scalar sync (relay-safe)
            times.append((time.perf_counter() - t0) / (reps * batch))
        return float(np.mean(times)), float(np.std(times))

    per_image, per_std = lat, lat_std
    batch = 4
    try:
        per_image, per_std = pipelined(4, batch, **kwargs)
        log(f"batch-{batch} pipelined throughput: {per_image*1000:.0f} ± "
            f"{per_std*1000:.0f} ms/image ({per_std/per_image*100:.1f}% rsd, "
            f"3 groups x 4 reps)")
    except Exception as e:
        log(f"batch-{batch} failed ({e}); reporting batch-1 throughput")
    images_per_min = 60.0 / per_image
    log(f"-> {images_per_min:.1f} images/min/chip "
        f"(±{images_per_min * per_std / per_image:.1f})")
    log(f"per-UNet-step (incl. CLIP+VAE amortized): {per_image/20*1000:.1f} ms")

    # ---- quality-gated opt-in accelerators (VERDICT r2 #1): each row
    # prints img/min AND on-chip SSIM vs a fixed-seed baseline, flagged
    # below the floor. Random weights; SSIM measures how much the
    # accelerator perturbs the exact same trajectory, which is the claim
    # each one makes. ----
    from lightdiffusion_tpu.utils.ssim import ssim

    SSIM_FLOOR = 0.90
    QSEED = 1234

    def quality_images(**kw):
        """Fixed-seed batch-4 images for SSIM rows (separate from timing)."""
        pos = pipe.encode_text(kw["prompt"])
        neg = pipe.encode_text(kw["negative_prompt"])
        latent = pipe.empty_latent(kw["width"], kw["height"], batch)
        skw = dict(steps=kw["steps"], cfg=kw["cfg"],
                   sampler_name=kw["sampler_name"], scheduler=kw["scheduler"])
        for opt in ("deepcache_interval", "uncond_interval", "cfg_cutoff"):
            if kw.get(opt):
                skw[opt] = kw[opt]
        out = pipe.sample_latent(latent, pos, neg, seed=QSEED, **skw)
        return np.asarray(pipe.decode(out), np.float32)

    def ssim_row(name, imgs, ref):
        s = np.asarray(ssim(imgs, ref))
        verdict = "PASS" if s.min() >= SSIM_FLOOR else f"FLAGGED(<{SSIM_FLOOR})"
        log(f"  {name}: ssim={s.mean():.4f} (min {s.min():.4f}) "
            f"quality-gate: {verdict}")
        return float(s.mean())

    imgs_base = imgs_sde = None
    try:
        imgs_base = quality_images(**kwargs)  # 20-step euler_ancestral
        imgs_sde = quality_images(
            **dict(kwargs, sampler_name="dpmpp_2m_sde")
        )  # 20-step SDE baseline for the schedule-swap rows
    except Exception as e:
        log(f"quality baseline failed: {e}")

    try:
        dc, dc_std = pipelined(3, batch, deepcache_interval=2, **kwargs)
        log(f"DeepCache interval-2 (opt-in): {60.0/dc:.1f} img/min/chip "
            f"({dc*1000:.0f} ± {dc_std*1000:.0f} ms/image)")
        if imgs_base is not None:
            ssim_row("DeepCache-2 vs 20-step baseline",
                     quality_images(deepcache_interval=2, **kwargs), imgs_base)
    except Exception as e:
        log(f"deepcache bench failed: {e}")
    try:
        ui, ui_std = pipelined(3, batch, uncond_interval=3, **kwargs)
        log(f"uncond_interval-3 guidance-delta cache (opt-in): "
            f"{60.0/ui:.1f} img/min/chip ({ui*1000:.0f} ± "
            f"{ui_std*1000:.0f} ms/image)")
        if imgs_base is not None:
            ssim_row("uncond_interval-3 vs 20-step baseline",
                     quality_images(uncond_interval=3, **kwargs), imgs_base)
    except Exception as e:
        log(f"uncond_interval bench failed: {e}")
    try:
        ays_kw = dict(kwargs, scheduler="ays", steps=10,
                      sampler_name="dpmpp_2m_sde")
        ays, ays_std = pipelined(3, batch, **ays_kw)
        log(f"AYS-10 dpmpp_2m_sde (arXiv 2404.14507): "
            f"{60.0/ays:.1f} img/min/chip ({ays*1000:.0f} ± "
            f"{ays_std*1000:.0f} ms/image)")
        if imgs_sde is not None:
            # AYS swaps the sigma schedule, so this measures trajectory
            # drift vs the same sampler at 20 steps — the honest bound on
            # the "≈20-step quality" claim with these weights
            ssim_row("AYS-10 vs 20-step dpmpp_2m_sde",
                     quality_images(**ays_kw), imgs_sde)
    except Exception as e:
        log(f"AYS bench failed: {e}")
    try:
        pipe.set_todo(2)
        tdo, tdo_std = pipelined(3, batch, **kwargs)
        log(f"ToDo-2 K/V downsampling (arXiv 2402.13573): "
            f"{60.0/tdo:.1f} img/min/chip ({tdo*1000:.0f} ± "
            f"{tdo_std*1000:.0f} ms/image)")
        if imgs_base is not None:
            ssim_row("ToDo-2 vs 20-step baseline",
                     quality_images(**kwargs), imgs_base)
        # trajectory-preserving stacks (scratch/stack_tune.py DC x ToDo
        # grid + scratch/dual_tune.py DC x ui composition): recommended =
        # DC-3+ui-2+ToDo-2; max gated = DC-4+ui-2+ToDo-4 (the dual-cache
        # denoiser runs skip steps cond-only through the shallow blocks)
        dcd, dcd_std = pipelined(3, batch, deepcache_interval=3,
                                 uncond_interval=2, **kwargs)
        log(f"DeepCache-3 + ui-2 + ToDo-2 (recommended stack): "
            f"{60.0/dcd:.1f} img/min/chip ({dcd*1000:.0f} ± "
            f"{dcd_std*1000:.0f} ms/image)")
        if imgs_base is not None:
            ssim_row("DeepCache-3+ui-2+ToDo-2 vs 20-step baseline",
                     quality_images(deepcache_interval=3, uncond_interval=2,
                                    **kwargs),
                     imgs_base)
        pipe.set_todo(4)
        dcm, dcm_std = pipelined(3, batch, deepcache_interval=4,
                                 uncond_interval=2, **kwargs)
        log(f"DeepCache-4 + ui-2 + ToDo-4 (max gated stack): "
            f"{60.0/dcm:.1f} img/min/chip ({dcm*1000:.0f} ± "
            f"{dcm_std*1000:.0f} ms/image)")
        if imgs_base is not None:
            ssim_row("DeepCache-4+ui-2+ToDo-4 vs 20-step baseline",
                     quality_images(deepcache_interval=4, uncond_interval=2,
                                    **kwargs),
                     imgs_base)
    except Exception as e:
        log(f"ToDo bench failed: {e}")
    finally:
        pipe.set_todo(0)
    try:
        pipe.set_tome(0.5)
        tom, tom_std = pipelined(3, batch, **kwargs)
        log(f"ToMe-0.5 (20-step euler_ancestral): {60.0/tom:.1f} img/min/chip "
            f"({tom*1000:.0f} ± {tom_std*1000:.0f} ms/image)")
        if imgs_base is not None:
            ssim_row("ToMe-0.5 vs 20-step baseline",
                     quality_images(**kwargs), imgs_base)
    except Exception as e:
        log(f"ToMe bench failed: {e}")
    finally:
        pipe.set_tome(0.0)
    try:
        # everything-on preset: AYS-10 + ToDo-2 + CFG truncation
        pipe.set_todo(2)
        stack_kw = dict(kwargs, scheduler="ays", steps=10,
                        sampler_name="dpmpp_2m_sde", cfg_cutoff=0.7)
        stk, stk_std = pipelined(3, batch, **stack_kw)
        log(f"stacked opt-ins (AYS-10 + ToDo-2 + cfg_cutoff 0.7): "
            f"{60.0/stk:.1f} img/min/chip ({stk*1000:.0f} ± "
            f"{stk_std*1000:.0f} ms/image)")
        if imgs_sde is not None:
            ssim_row("stacked vs 20-step dpmpp_2m_sde",
                     quality_images(**stack_kw), imgs_sde)
    except Exception as e:
        log(f"stacked bench failed: {e}")
    finally:
        pipe.set_todo(0)

    # bf16 cross-shape contract (VERDICT r2 weak #7): the same seed in a
    # batch-4 program (per-sample keys) must perceptually match its solo
    # batch-1 image — automated on-chip check of the recompile-divergence
    # tolerance claims
    try:
        pos = pipe.encode_text(kwargs["prompt"])
        neg = pipe.encode_text(kwargs["negative_prompt"])
        skw = dict(steps=kwargs["steps"], cfg=kwargs["cfg"],
                   sampler_name=kwargs["sampler_name"],
                   scheduler=kwargs["scheduler"])
        solo = np.asarray(pipe.decode(pipe.sample_latent(
            pipe.empty_latent(512, 512, 1), pos, neg, seed=[QSEED], **skw
        )))
        batched = np.asarray(pipe.decode(pipe.sample_latent(
            pipe.empty_latent(512, 512, batch), pos, neg,
            seed=[QSEED + i for i in range(batch)], **skw
        )))
        s = float(np.asarray(ssim(solo[0], batched[0]))[0])
        verdict = "PASS" if s >= 0.95 else "FLAGGED(<0.95)"
        log(f"  bf16 batch-1 vs batch-4 same-seed: ssim={s:.4f} "
            f"cross-shape-gate: {verdict}")
    except Exception as e:
        log(f"cross-shape check failed: {e}")

    # int8 LAST: quantize_unet replaces the param tree in place
    try:
        pipe.quantize_unet()
        i8, i8_std = pipelined(3, batch, **kwargs)
        log(f"int8 W8A8 UNet (opt-in): {60.0/i8:.1f} img/min/chip "
            f"({i8*1000:.0f} ± {i8_std*1000:.0f} ms/image)")
        if imgs_base is not None:
            ssim_row("int8 vs bf16 baseline", quality_images(**kwargs),
                     imgs_base)
    except Exception as e:
        log(f"int8 bench failed: {e}")

    if "--no-sdxl" not in sys.argv:
        try:
            bench_sdxl()
        except Exception as e:
            log(f"SDXL bench failed: {e}")

    print(json.dumps({
        "metric": "sd15_512x512_20step_txt2img_throughput",
        "value": round(images_per_min, 2),
        "unit": "images/min/chip",
        "vs_baseline": round(images_per_min / 30.0, 3),
    }))


def bench_sdxl():
    """SDXL (2.57B) on-chip rows (VERDICT r2 #2): random-init SDXL_UNET at
    1024², 20 steps, dual-tower-shaped conds (random (1,77,2048) + pooled
    (1,1280) → real ADM vectors), batch 1. Also int8 and ToMe-0.5 at XL
    width — the two NOTES_ROUND2 projections that hung on this measurement."""
    import jax
    import jax.numpy as jnp

    from lightdiffusion_tpu.loader.checkpoint import init_random
    from lightdiffusion_tpu.models.unet import SDXL_UNET
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu.utils.ssim import ssim

    log("-- SDXL 1024x1024 20-step (random-init, batch 1) --")
    t0 = time.perf_counter()
    sdx = init_random(jax.random.PRNGKey(1), unet_config=SDXL_UNET)
    pipex = SDPipeline(sdx, policy=L.BF16)
    log(f"  init_random SDXL: {time.perf_counter()-t0:.1f}s")
    kc, kp = jax.random.split(jax.random.PRNGKey(2))
    cond = (jax.random.normal(kc, (1, 77, 2048), jnp.float32) * 0.3,
            jax.random.normal(kp, (1, 1280), jnp.float32) * 0.3)
    neg = (jnp.zeros((1, 77, 2048), jnp.float32),
           jnp.zeros((1, 1280), jnp.float32))
    latent = pipex.empty_latent(1024, 1024, 1)

    def runx(seed, **skw):
        out = pipex.sample_latent(
            latent, cond, neg, seed=seed, steps=20, cfg=7.0,
            sampler_name="euler_ancestral", scheduler="karras", **skw,
        )
        return pipex.decode(out)

    def timed(label, reps=2, groups=2, **skw):
        img = runx(0, **skw)  # compile + warm
        float(np.asarray(img.ravel()[0]))
        times = []
        for gi in range(groups):
            t0 = time.perf_counter()
            for i in range(reps):
                img = runx(gi * reps + i + 1, **skw)
            float(np.asarray(img.ravel()[0]))
            times.append((time.perf_counter() - t0) / reps)
        m = float(np.mean(times))
        log(f"  {label}: {60.0/m:.2f} img/min/chip ({m*1000:.0f} ± "
            f"{float(np.std(times))*1000:.0f} ms/image)")
        return m, np.asarray(runx(777, **skw), np.float32)

    base, img_base = timed("SDXL base")

    # DeepCache at XL width: the deep half (the depth-10 level-2
    # transformers + middle) is ~80% of SDXL FLOPs, so interval-2 reuse
    # is worth far more here than on SD1.5 topology
    try:
        dc, img_dc = timed("SDXL DeepCache-2", deepcache_interval=2)
        s = float(np.asarray(ssim(img_dc, img_base)).min())
        log(f"  SDXL DeepCache-2: {base/dc:.2f}x speedup, ssim={s:.4f} "
            f"quality-gate: {'PASS' if s >= 0.90 else 'FLAGGED(<0.90)'}")
        dc3, img_dc3 = timed("SDXL DeepCache-3", deepcache_interval=3)
        s3 = float(np.asarray(ssim(img_dc3, img_base)).min())
        log(f"  SDXL DeepCache-3: {base/dc3:.2f}x speedup, ssim={s3:.4f} "
            f"quality-gate: {'PASS' if s3 >= 0.90 else 'FLAGGED(<0.90)'}")
    except Exception as e:
        log(f"  SDXL DeepCache failed ({type(e).__name__}: {e})")
        import gc
        gc.collect()

    # guidance-delta caching at XL width (the quality-leaning alternative
    # to DeepCache; also composes with it — see the max-stack row below)
    try:
        ui, img_ui = timed("SDXL uncond_interval-3", uncond_interval=3)
        s = float(np.asarray(ssim(img_ui, img_base)).min())
        log(f"  SDXL uncond_interval-3: {base/ui:.2f}x speedup, ssim={s:.4f} "
            f"quality-gate: {'PASS' if s >= 0.90 else 'FLAGGED(<0.90)'}")
    except Exception as e:
        log(f"  SDXL uncond_interval failed ({type(e).__name__}: {e})")
        import gc
        gc.collect()

    # batch-4 pipelined throughput (the serving regime). CFG batch 8 fits
    # v5e HBM for the UNet (551 ms/UNet-step measured in
    # scratch/sdxl_profile.py) but a full-batch 1024² fp32 VAE decode does
    # NOT (~8.6 GB conv activations) — decode per-sample, reusing the
    # batch-1 decode program already compiled by the base row.
    def bench_sdxl_batch(nb):
        condb = (jnp.tile(cond[0], (nb, 1, 1)), jnp.tile(cond[1], (nb, 1)))
        negb = (jnp.tile(neg[0], (nb, 1, 1)), jnp.tile(neg[1], (nb, 1)))
        latentb = pipex.empty_latent(1024, 1024, nb)

        def runxb(seed):
            out = pipex.sample_latent(
                latentb, condb, negb, seed=seed, steps=20, cfg=7.0,
                sampler_name="euler_ancestral", scheduler="karras",
            )
            return [pipex.decode(out[i : i + 1]) for i in range(nb)]

        imgs = runxb(0)  # compile + warm
        float(np.asarray(imgs[-1].ravel()[0]))
        times = []
        for gi in range(2):
            t0 = time.perf_counter()
            for i in range(2):
                imgs = runxb(gi * 2 + i + 1)
            float(np.asarray(imgs[-1].ravel()[0]))
            times.append((time.perf_counter() - t0) / (2 * nb))
        m = float(np.mean(times))
        log(f"  SDXL batch-{nb} pipelined: {60.0/m:.2f} img/min/chip "
            f"({m*1000:.0f} ms/image, {base/m:.2f}x batch-1)")

    for nb in (2, 4):
        try:
            bench_sdxl_batch(nb)
        except Exception as e:
            log(f"  SDXL batch-{nb} failed ({type(e).__name__}: {e})")
            import gc
            gc.collect()  # drop traceback-held device buffers before the
            break         # next row so one OOM can't poison the rest

    # XL attention mass sits at the 32^2 (1024-token) level, so the ToDo
    # threshold drops to 1024 here (measured: 1.25x vs 1.09x at 4096)
    pipex.set_todo(4, min_tokens=1024)
    try:
        tdo, img_todo = timed("SDXL ToDo-4@1024")
        s = float(np.asarray(ssim(img_todo, img_base)).min())
        log(f"  SDXL ToDo-4@1024: {base/tdo:.2f}x speedup, ssim={s:.4f}")
    except Exception as e:
        log(f"  SDXL ToDo failed ({type(e).__name__}: {e})")
        import gc
        gc.collect()
    finally:
        pipex.set_todo(0)
    # the three XL levers stack: DeepCache reuses the deep half, ToDo thins
    # the 32^2 attention in the shallow half that still runs every step,
    # and guidance-delta caching makes skip steps cond-only at batch 1
    # (the dual-cache denoiser; scratch/sdxl_dual_row.py sweep)
    pipex.set_todo(4, min_tokens=1024)
    try:
        stk, img_stk = timed("SDXL DC-3+ToDo-4@1024", deepcache_interval=3)
        s = float(np.asarray(ssim(img_stk, img_base)).min())
        log(f"  SDXL DC-3+ToDo-4@1024 stack: {base/stk:.2f}x speedup, "
            f"ssim={s:.4f} quality-gate: "
            f"{'PASS' if s >= 0.90 else 'FLAGGED(<0.90)'}")
        stk2, img_stk2 = timed("SDXL DC-4+ui-2+ToDo-4@1024",
                               deepcache_interval=4, uncond_interval=2)
        s2 = float(np.asarray(ssim(img_stk2, img_base)).min())
        log(f"  SDXL DC-4+ui-2+ToDo-4@1024 (max gated stack): "
            f"{base/stk2:.2f}x speedup, ssim={s2:.4f} quality-gate: "
            f"{'PASS' if s2 >= 0.90 else 'FLAGGED(<0.90)'}")
    except Exception as e:
        log(f"  SDXL stack failed ({type(e).__name__}: {e})")
        import gc
        gc.collect()
    finally:
        pipex.set_todo(0)
    pipex.set_tome(0.5)
    try:
        tom, img_tome = timed("SDXL ToMe-0.5")
        s = float(np.asarray(ssim(img_tome, img_base)).min())
        log(f"  SDXL ToMe-0.5: {base/tom:.2f}x speedup, ssim={s:.4f}")
    except Exception as e:
        log(f"  SDXL ToMe failed ({type(e).__name__}: {e})")
        import gc
        gc.collect()
    finally:
        pipex.set_tome(0.0)
    try:
        pipex.quantize_unet()
        i8, img_i8 = timed("SDXL int8 W8A8")
        s = float(np.asarray(ssim(img_i8, img_base)).min())
        log(f"  SDXL int8: {base/i8:.2f}x speedup, ssim={s:.4f} "
            f"(verdict: {'keep' if base/i8 >= 1.1 else 'placebo at XL too — gate it'})")
    except Exception as e:
        log(f"  SDXL int8 failed ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
