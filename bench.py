"""Headline benchmark: SD1.5 512×512 20-step txt2img on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's stable-fast CUDA path (README claims ~1.7× over
torch; commonly ~2 s/image for SD1.5 20 steps ⇒ 30 images/min/chip). We
report images/min/chip; vs_baseline = value / 30.

Driver-survivability contract (VERDICT r4 #1 — supersedes the r3 contract):
- The headline JSON prints EARLY (immediately after the batch-4 pipelined
  measurement, as timeout insurance) AND is re-printed UNCONDITIONALLY as
  the LAST line of every run (end of main + atexit + signal handler).
  Duplicates are harmless; the driver parses the tail of the output, so
  absence from the final window is the only failure mode (r3 timed out
  before its end-only print; r4 completed but its early-only print fell
  outside the ~2000-char parse tail — both lost the number).
- A SIGTERM/SIGINT or interpreter exit flushes the best-available headline
  (pipelined if measured, else batch-1-derived) before dying, so even a
  hard driver timeout leaves the JSON on stdout.
- An elapsed-time budget (--budget-s, default 2400) gates every optional
  row; each skipped row is named on stderr. A cold XLA cache (detected via
  the first compile) raises the per-row cost estimates so the gate errs
  toward skipping.
- The final JSON also carries roofline attribution (unet_tflops / mfu,
  VERDICT r4 #6) when the MFU probe ran within budget.

Runs with random weights (no checkpoints exist in this environment) — FLOPs
and memory traffic are weight-independent, so throughput is representative.
Diagnostics go to stderr; stdout carries only the JSON line.
"""

import atexit
import gc
import json
import os
import signal
import sys
import time

import numpy as np

START = time.perf_counter()


def _argval(flag, default):
    if flag in sys.argv:
        try:
            return float(sys.argv[sys.argv.index(flag) + 1])
        except (IndexError, ValueError):
            pass
    return default


BUDGET_S = _argval("--budget-s", 2400.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.perf_counter() - START)


def allow(name, est_s):
    """Budget gate for optional rows; names every skip on stderr."""
    r = remaining()
    if r < est_s:
        log(f"  SKIPPED {name}: needs ~{est_s:.0f}s, {r:.0f}s of "
            f"{BUDGET_S:.0f}s budget left")
        return False
    return True


# ---- headline flush-on-exit machinery ----
# NO emit-once guard: the JSON must appear EARLY (timeout insurance) and as
# the FINAL line of the process (the driver parses the output tail —
# VERDICT r4 #1). emit_headline() therefore prints every time it is called;
# `extras` (MFU attribution) measured after the early print still lands in
# the final copies.
_headline = {"value": None, "note": None, "extras": {}}


def set_headline(images_per_min, note=None):
    _headline["value"] = images_per_min
    _headline["note"] = note


def emit_headline():
    if _headline["value"] is None:
        return
    rec = {
        "metric": "sd15_512x512_20step_txt2img_throughput",
        "value": round(_headline["value"], 2),
        "unit": "images/min/chip",
        "vs_baseline": round(_headline["value"] / 30.0, 3),
    }
    rec.update(_headline["extras"])
    if _headline["note"]:
        rec["note"] = _headline["note"]
    print(json.dumps(rec), flush=True)


def _on_signal(signum, frame):
    log(f"signal {signum} after {time.perf_counter()-START:.0f}s — flushing "
        f"headline and exiting")
    emit_headline()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(128 + signum)


atexit.register(emit_headline)
signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGINT, _on_signal)


def main():
    from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from lightdiffusion_tpu.loader.checkpoint import init_random
    from lightdiffusion_tpu.pipelines.sd import SDPipeline, txt2img
    from lightdiffusion_tpu.ops import layers as L

    log(f"devices: {jax.devices()}  budget: {BUDGET_S:.0f}s")
    t0 = time.perf_counter()
    sd = init_random(jax.random.PRNGKey(0))
    # bf16 VAE decode: the reference's own policy on capable hardware
    # (ref :1508-1526, fp16 there; bf16 keeps fp32 exponent range so the
    # overflow hazard doesn't apply). Measured r5: −21 ms/img of the
    # 365 ms/img headline at decode ssim 0.9980 vs fp32
    # (scratch/sdxl_decode_attrib.py). The cross-shape + accelerator SSIM
    # gates below all run through this same decode, so gating is
    # apples-to-apples.
    pipe = SDPipeline(sd, policy=L.BF16, vae_policy=L.BF16, clip_skip=-2)
    init_s = time.perf_counter() - t0
    log(f"init_random: {init_s:.1f}s")

    kwargs = dict(
        prompt="masterpiece, best quality, a cat on a mat",
        negative_prompt="blurry, low quality",
        width=512, height=512, steps=20, cfg=7.0,
        sampler_name="euler_ancestral", scheduler="karras",
    )
    batch = 4

    # ---- headline FIRST: steady-state PIPELINED throughput at the
    # saturating batch (4). Programs queue on the device back-to-back; the
    # host's dispatch + relay round-trips overlap device compute (what a
    # serving loop actually achieves). One sync per group. ----
    def make_runner(nb, **kw):
        pos = pipe.encode_text(kw["prompt"])
        neg = pipe.encode_text(kw["negative_prompt"])
        latent = pipe.empty_latent(kw["width"], kw["height"], nb)
        skw = dict(steps=kw["steps"], cfg=kw["cfg"],
                   sampler_name=kw["sampler_name"], scheduler=kw["scheduler"])
        for opt in ("deepcache_interval", "uncond_interval", "cfg_cutoff"):
            if kw.get(opt):
                skw[opt] = kw[opt]

        def run(seed):
            out = pipe.sample_latent(latent, pos, neg, seed=seed, **skw)
            return pipe.decode(out)

        return run

    def pipelined(reps, nb, groups=3, **kw):
        run = make_runner(nb, **kw)
        tc = time.perf_counter()
        img = run(0)  # compile + warm
        float(np.asarray(img.ravel()[0]))
        compile_s = time.perf_counter() - tc
        times = []
        for gi in range(groups):
            t0 = time.perf_counter()
            for i in range(reps):
                img = run(gi * reps + i + 1)
            float(np.asarray(img.ravel()[0]))  # scalar sync (relay-safe)
            times.append((time.perf_counter() - t0) / (reps * nb))
        return float(np.mean(times)), float(np.std(times)), compile_s

    try:
        per_image, per_std, first_compile_s = pipelined(4, batch, **kwargs)
    except Exception as e:
        log(f"batch-{batch} pipelined failed ({e}); falling back to batch-1")
        gc.collect()
        t0 = time.perf_counter()
        txt2img(pipe, seed=0, batch=1, **kwargs)  # compile + warm
        first_compile_s = time.perf_counter() - t0
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            txt2img(pipe, seed=i + 1, batch=1, **kwargs)
            times.append(time.perf_counter() - t0)
        per_image, per_std = float(np.mean(times)), float(np.std(times))
        batch = 1
    cold = first_compile_s > 45.0 or init_s > 90.0
    if batch == 1:
        log(f"batch-1 per-call latency (DEGRADED fallback): "
            f"{per_image*1000:.0f} ± {per_std*1000:.0f} ms/image "
            f"(first compile {first_compile_s:.0f}s)")
    else:
        log(f"batch-{batch} pipelined throughput: {per_image*1000:.0f} ± "
            f"{per_std*1000:.0f} ms/image ({per_std/per_image*100:.1f}% rsd, "
            f"3 groups x 4 reps; first compile {first_compile_s:.0f}s, "
            f"cache {'COLD' if cold else 'warm'})")
    images_per_min = 60.0 / per_image
    log(f"-> {images_per_min:.1f} images/min/chip "
        f"(±{images_per_min * per_std / per_image:.1f})")
    log(f"per-UNet-step (incl. CLIP+VAE amortized): {per_image/20*1000:.1f} ms")
    set_headline(images_per_min,
                 note=None if batch == 4 else
                 "batch-1 per-call fallback (pipelined batch-4 failed)")
    emit_headline()  # EARLY copy (timeout insurance) — re-printed at exit

    # Per-row wall-clock estimate: one program compile + a few runs. Cold
    # compiles through the remote helper measured 30-165s in r3.
    row_est = 240.0 if cold else 60.0

    # ---- MFU probe (VERDICT r4 #6): counted-TFLOP/s for the UNet eval at
    # the headline's CFG batch (2·4=8), the scratch/sd15_unet_roofline.py
    # method — cost_analysis FLOPs ÷ pipelined per-eval time. Lands in the
    # FINAL headline JSON copies via _headline["extras"]. ----
    if batch == 4 and allow("MFU probe", 240.0 if cold else 60.0):
        try:
            from lightdiffusion_tpu.models import unet as U
            from lightdiffusion_tpu.runtime.profiling import cost_analysis

            uparams = jax.tree.map(
                lambda a: a.astype(L.BF16.param_dtype), pipe.sd.unet_params)
            ucfg = pipe.sd.unet_config
            b2 = 2 * batch  # cond+uncond CFG batch of the headline program
            kp = jax.random.PRNGKey(7)
            ux = jax.random.normal(kp, (b2, 64, 64, 4), jnp.float32)
            ut = jnp.full((b2,), 500.0, jnp.float32)
            uctx = jax.random.normal(kp, (b2, 77, 768), jnp.float32) * 0.3

            @jax.jit
            def unet_eval(x, params, ctx):
                return U.apply_unet(
                    params, x, ut, ctx, cfg=ucfg, policy=L.BF16
                ).astype(jnp.float32)

            fl = float(cost_analysis(unet_eval, ux, uparams, uctx)["flops"])

            # per-eval time via scan-length ablation (marginal of n=16 vs
            # n=4 in-scan evals) — per-dispatch relay overhead would
            # otherwise dominate a call-loop at this granularity
            # (CLAUDE.md measurement discipline; scratch/sd15_unet_roofline)
            def make_scan(n):
                @jax.jit
                def many(x, params, ctx):
                    def body(c, _):
                        return unet_eval(c, params, ctx), ()
                    out, _ = jax.lax.scan(body, x, None, length=n)
                    return out
                return many

            def best_of(f, reps=3):
                r = f(ux, uparams, uctx)
                float(np.asarray(r.ravel()[0]))  # compile + warm
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    r = f(ux, uparams, uctx)
                    float(np.asarray(r.ravel()[0]))
                    best = min(best, time.perf_counter() - t0)
                return best

            n1, n2 = 4, 16
            per_eval = (best_of(make_scan(n2)) - best_of(make_scan(n1))) / (
                n2 - n1)
            tfs = fl / per_eval / 1e12
            mfu = tfs / 197.0  # v5e bf16 MXU peak
            log(f"MFU probe: {fl/1e12:.3f} TFLOP/eval (CFG batch {b2}), "
                f"{per_eval*1000:.2f} ms/eval -> {tfs:.1f} TF/s, "
                f"MFU {mfu:.3f} (v5e bf16 peak 197)")
            _headline["extras"] = {
                "unet_tflops": round(tfs, 1), "mfu": round(mfu, 3)}
            del uparams, ux, uctx
            gc.collect()
        except Exception as e:
            log(f"MFU probe failed: {e}")
            gc.collect()

    # ---- single-image latency (the <1s/image target) ----
    if allow("batch-1 latency", row_est):
        txt2img(pipe, seed=0, batch=1, **kwargs)  # compile + warm
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            img = txt2img(pipe, seed=i + 1, batch=1, **kwargs)
            times.append(time.perf_counter() - t0)
        lat, lat_std = float(np.mean(times)), float(np.std(times))
        assert np.isfinite(np.asarray(img)).all()
        log(f"batch-1 latency: {lat*1000:.0f} ± {lat_std*1000:.0f} ms/image")
    else:
        lat = None

    # interactive latency with the max gated stack (the dual-cache skip
    # steps run the UNet at batch 1 here, so the win is larger than the
    # throughput ratio suggests); SSIM for this config is gated in the
    # batch-4 stack row below
    if lat is not None and allow("batch-1 max-stack latency", row_est):
        try:
            pipe.set_todo(4)
            run1 = lambda seed: txt2img(  # noqa: E731
                pipe, seed=seed, batch=1, deepcache_interval=4,
                uncond_interval=2, **kwargs)
            run1(0)
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                run1(i + 1)
                times.append(time.perf_counter() - t0)
            lat_s = float(np.mean(times))
            log(f"batch-1 latency (DC-4+ui-2+ToDo-4 max stack): "
                f"{lat_s*1000:.0f} ± {float(np.std(times))*1000:.0f} ms/image "
                f"({lat/lat_s:.2f}x)")
        except Exception as e:
            log(f"batch-1 stacked latency failed ({e})")
        finally:
            pipe.set_todo(0)

    # ---- quality-gated opt-in accelerators: each row prints img/min AND
    # on-chip SSIM vs a fixed-seed baseline, flagged below the floor.
    # Random weights; SSIM measures how much the accelerator perturbs the
    # exact same trajectory, which is the claim each one makes. ----
    from lightdiffusion_tpu.utils.ssim import ssim

    SSIM_FLOOR = 0.90
    QSEED = 1234

    def quality_images(**kw):
        """Fixed-seed batch-4 images for SSIM rows. Reuses the programs the
        timed rows compiled (same shapes/options; seed is a runtime arg)."""
        run = make_runner(batch, **kw)
        return np.asarray(run(QSEED), np.float32)

    def ssim_row(name, imgs, ref):
        s = np.asarray(ssim(imgs, ref))
        verdict = "PASS" if s.min() >= SSIM_FLOOR else f"FLAGGED(<{SSIM_FLOOR})"
        log(f"  {name}: ssim={s.mean():.4f} (min {s.min():.4f}) "
            f"quality-gate: {verdict}")
        return float(s.mean())

    imgs_base = None
    if allow("quality baseline images", 30.0):
        try:
            imgs_base = quality_images(**kwargs)  # same program as headline
        except Exception as e:
            log(f"quality baseline failed: {e}")

    def accel_row(label, est=None, todo=0, ssim_vs=None, **opts):
        """One timed+gated accelerator row; budget-checked, program reuse
        between the timed and SSIM runs (same cache key, different seed)."""
        if not allow(label, row_est if est is None else est):
            return
        try:
            if todo:
                pipe.set_todo(todo)
            m, m_std, _ = pipelined(3, batch, **dict(kwargs, **opts))
            log(f"{label}: {60.0/m:.1f} img/min/chip "
                f"({m*1000:.0f} ± {m_std*1000:.0f} ms/image, "
                f"{per_image/m:.2f}x)")
            ref = imgs_base if ssim_vs is None else ssim_vs
            if ref is not None:
                ssim_row(f"{label} vs 20-step baseline",
                         quality_images(**dict(kwargs, **opts)), ref)
        except Exception as e:
            log(f"{label} failed: {e}")
            gc.collect()
        finally:
            if todo:
                pipe.set_todo(0)

    accel_row("DeepCache interval-2 (opt-in)", deepcache_interval=2)
    accel_row("uncond_interval-3 guidance-delta cache (opt-in)",
              uncond_interval=3)
    accel_row("ToDo-2 K/V downsampling (arXiv 2402.13573)", todo=2)
    # trajectory-preserving stacks (scratch/stack_tune.py DC x ToDo grid +
    # scratch/dual_tune.py DC x ui composition): recommended =
    # DC-3+ui-2+ToDo-2; max gated = DC-4+ui-2+ToDo-4 (the dual-cache
    # denoiser runs skip steps cond-only through the shallow blocks)
    accel_row("DeepCache-3 + ui-2 + ToDo-2 (recommended stack)",
              todo=2, deepcache_interval=3, uncond_interval=2)
    accel_row("DeepCache-4 + ui-2 + ToDo-4 (max gated stack)",
              todo=4, deepcache_interval=4, uncond_interval=2)

    # AYS swaps the sigma schedule, so it follows a DIFFERENT trajectory by
    # design — with random weights any trajectory change decorrelates the
    # output texture, so SSIM cannot validate the paper's trained-model
    # claim (arXiv 2404.14507). Print the drift as information, not a gate.
    if allow("AYS-10 rows", row_est * 2):
        imgs_sde = None
        try:
            sde_kw = dict(kwargs, sampler_name="dpmpp_2m_sde")
            imgs_sde = quality_images(**sde_kw)
        except Exception as e:
            log(f"20-step SDE baseline failed: {e}")
        try:
            ays_kw = dict(kwargs, scheduler="ays", steps=10,
                          sampler_name="dpmpp_2m_sde")
            ays, ays_std, _ = pipelined(3, batch, **ays_kw)
            log(f"AYS-10 dpmpp_2m_sde (arXiv 2404.14507): "
                f"{60.0/ays:.1f} img/min/chip ({ays*1000:.0f} ± "
                f"{ays_std*1000:.0f} ms/image)")
            if imgs_sde is not None:
                s = np.asarray(ssim(quality_images(**ays_kw), imgs_sde))
                log(f"  AYS-10 vs 20-step dpmpp_2m_sde: ssim={s.mean():.4f} "
                    f"(schedule swap — SSIM n/a on random weights; the "
                    f"quality claim needs trained checkpoints)")
        except Exception as e:
            log(f"AYS bench failed: {e}")
            gc.collect()

    # AYS directional quality gate on the TOY-TRAINED fixture (VERDICT r4
    # #5): random weights make schedule swaps unscorable, but on a trained
    # score model different schedules converge to the same sample. This is
    # a toy-scale mechanism gate, NOT the paper's SD1.5-scale claim.
    if allow("AYS toy-trained gate", row_est):
        try:
            from pathlib import Path
            import sys as _sys

            _sys.path.insert(0, str(Path(__file__).parent))
            from tests.fixtures.make_toy_checkpoint import load_toy_params
            from tests.test_toy_quality import (
                _latent_ssim, _pipe as _toy_pipe, _sample as _toy_sample,
                smoothness)

            tpipe = _toy_pipe(load_toy_params())
            base = _toy_sample(tpipe, 20, "karras", sampler="euler")
            ays_i = _toy_sample(tpipe, 10, "ays", sampler="euler")
            s = _latent_ssim(base, ays_i)
            sm_ratio = smoothness(ays_i) / max(smoothness(base), 1e-6)
            # 0.98 on-chip (TPU fp32 = bf16-pass matmuls; the CPU fp32
            # test gate is 0.99 — measured 0.9992 CPU vs 0.9891 on-chip)
            ok = s >= 0.98 and sm_ratio < 1.5
            log(f"  AYS-10 vs 20-step on TOY-TRAINED fixture: endpoint "
                f"ssim {s:.4f}, on-manifold smoothness ratio "
                f"{sm_ratio:.2f} (toy-scale mechanism gate): "
                f"{'PASS' if ok else 'FLAGGED'}")
            del tpipe
            gc.collect()
        except Exception as e:
            log(f"AYS toy gate failed ({type(e).__name__}: {e})")

    # bf16 cross-shape contract: the same seed in a batch-4 program
    # (per-sample keys) must perceptually match its solo batch-1 image —
    # automated on-chip check of the recompile-divergence tolerance claims
    if allow("cross-shape same-seed gate", row_est):
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

    # ---- the reference's real default workloads (VERDICT r4 #3): the
    # remaining BASELINE.json configs as recorded rows. Each warms once
    # (compiles) then times 2 reps. They use `pipe`, so they run BEFORE the
    # int8 row (quantize_unet replaces the param tree). ----

    def workload_row(name, fn, est):
        """Warm once, time 2 reps of fn(seed) -> wall s/image rows.
        ``fn`` may be a zero-arg factory returning the runner (so setup
        like ESRGAN init only happens once the budget gate passes)."""
        if not allow(name, est):
            return
        try:
            if fn.__code__.co_argcount == 0:
                fn = fn()
            t0 = time.perf_counter()
            fn(0)
            warm_s = time.perf_counter() - t0
            times = []
            for i in range(2):
                t0 = time.perf_counter()
                fn(i + 1)
                times.append(time.perf_counter() - t0)
            m = float(np.mean(times))
            log(f"{name}: {m:.2f} ± {float(np.std(times)):.2f} s/image "
                f"({60.0/m:.1f} img/min/chip; warm+compile {warm_s:.0f}s)")
        except Exception as e:
            log(f"{name} failed ({type(e).__name__}: {e})")
            gc.collect()

    # (a) ref-default txt2img+hires (ref :10048-10078): dpm_adaptive-40
    # karras → bislerp ×2 → euler_ancestral-10 @0.45 cfg 8 → 1024² decode.
    # Re-pins NOTES_ROUND3's 3.53 s/img scratch number as a tracked row.
    workload_row(
        "ref-default txt2img+hires (dpm_adaptive-40 + bislerp x2 + "
        "euler_ancestral-10 @0.45, 512->1024)",
        lambda seed: txt2img(
            pipe, kwargs["prompt"], kwargs["negative_prompt"],
            width=512, height=512, steps=40, cfg=7.0, seed=seed,
            sampler_name="dpm_adaptive", scheduler="karras", batch=1,
            hires_fix=True, hires_steps=10, hires_denoise=0.45,
            hires_cfg=8.0,
        ),
        420.0 if cold else 150.0,
    )

    # (b) USDU img2img (ref :10392-10417): random-init RealESRGAN-x4plus
    # topology ×4 pre-pass → ×2 canvas → 512² tiles dpmpp_2m_sde-8 @0.3,
    # Half Tile seam fix — the reference's img2img surface, on a synthetic
    # input (FLOPs/traffic are content-independent).
    def usdu_workload():
        from lightdiffusion_tpu.models.esrgan import (
            ESRGANConfig, init_esrgan_params)
        from lightdiffusion_tpu.postprocess.usdu import ultimate_sd_upscale

        ecfg = ESRGANConfig(num_blocks=23, num_feat=64, scale=4)
        ep = init_esrgan_params(jax.random.PRNGKey(5), ecfg)
        src = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(6), (1, 512, 512, 3)),
            np.float32)

        def run(seed):
            ultimate_sd_upscale(
                pipe, src, kwargs["prompt"], kwargs["negative_prompt"],
                upscale_by=2.0, steps=8, cfg=6.0, denoise=0.3,
                sampler_name="dpmpp_2m_sde", scheduler="karras",
                esrgan=(ep, ecfg), seed=seed,
            )
        return run

    workload_row(
        "USDU img2img (ESRGAN x4 pre-pass + 512px tiles "
        "dpmpp_2m_sde-8 @0.3 + Half Tile seams, 512->1024)",
        usdu_workload, 420.0 if cold else 150.0)

    # (c) detailer-style masked per-seg pass (ref :9208-9352): random-weight
    # YOLO can't detect, so the SEGs are fixtured — two face-sized boxes →
    # crop ×3 → guide-512 masked denoise @0.5, pasted back feathered.
    def detailer_workload():
        from lightdiffusion_tpu.postprocess.detailer import (
            bboxes_to_segs, detail_segs)

        src = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(8), (512, 512, 3)),
            np.float32)
        segs = bboxes_to_segs(
            src, np.array([[96., 96., 224., 224.], [288., 256., 416., 384.]]),
            np.array([0.9, 0.85]), ["face", "face"])
        pos = pipe.encode_text(kwargs["prompt"])
        neg = pipe.encode_text(kwargs["negative_prompt"])

        def run(seed):
            detail_segs(
                pipe, src, segs, pos, neg, seed=seed, steps=20, cfg=6.5,
                sampler_name="dpmpp_2m_sde", scheduler="karras",
                denoise=0.5,
            )
        return run

    workload_row(
        "detailer masked per-seg pass (2 fixtured SEGs, guide-512 "
        "dpmpp_2m_sde-20 @0.5)",
        detailer_workload, 300.0 if cold else 120.0)

    # int8 LAST among SD1.5 rows: quantize_unet replaces the param tree
    if allow("int8 W8A8 row", row_est):
        try:
            pipe.quantize_unet()
            i8, i8_std, _ = pipelined(3, batch, **kwargs)
            log(f"int8 W8A8 UNet (opt-in, saves HBM ~1x speed): "
                f"{60.0/i8:.1f} img/min/chip "
                f"({i8*1000:.0f} ± {i8_std*1000:.0f} ms/image)")
            if imgs_base is not None:
                ssim_row("int8 vs bf16 baseline", quality_images(**kwargs),
                         imgs_base)
        except Exception as e:
            log(f"int8 bench failed: {e}")

    if "--no-sdxl" not in sys.argv:
        # gate only on init + the base row here — every further XL row
        # checks the budget itself, so a partially-affordable section still
        # yields base numbers instead of skipping wholesale
        sdxl_est = 500.0 if cold else 250.0
        if allow("SDXL section", sdxl_est):
            try:
                bench_sdxl(cold)
            except Exception as e:
                log(f"SDXL bench failed: {e}")

    log(f"bench done in {time.perf_counter()-START:.0f}s of "
        f"{BUDGET_S:.0f}s budget")
    # FINAL copy — the contract is "last line of the run"; the atexit hook
    # prints one more after this, which is equally fine (tail-parse wins).
    emit_headline()


def bench_sdxl(cold=False):
    """SDXL (2.57B) on-chip rows: random-init SDXL_UNET at 1024², 20 steps,
    dual-tower-shaped conds (random (1,77,2048) + pooled (1,1280) → real ADM
    vectors), batch 1. Every row is budget-gated and SKIP-logged."""
    import jax
    import jax.numpy as jnp

    from lightdiffusion_tpu.loader.checkpoint import init_random
    from lightdiffusion_tpu.models.unet import SDXL_UNET
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu.utils.ssim import ssim

    row_est = 300.0 if cold else 90.0

    log("-- SDXL 1024x1024 20-step (random-init, batch 1) --")
    t0 = time.perf_counter()
    sdx = init_random(jax.random.PRNGKey(1), unet_config=SDXL_UNET)
    # bf16 VAE decode (ref :1508-1526 policy): 501 vs 632 ms/img at XL,
    # decode ssim 0.9921 vs fp32 (scratch/sdxl_decode_attrib.py)
    pipex = SDPipeline(sdx, policy=L.BF16, vae_policy=L.BF16)
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

    def xl_row(label, todo=0, todo_min=1024, **skw):
        if not allow(label, row_est):
            return None
        try:
            if todo:
                pipex.set_todo(todo, min_tokens=todo_min)
            m, img = timed(label, **skw)
            s = float(np.asarray(ssim(img, img_base)).min())
            log(f"  {label}: {base/m:.2f}x speedup, ssim={s:.4f} "
                f"quality-gate: {'PASS' if s >= 0.90 else 'FLAGGED(<0.90)'}")
            return m
        except Exception as e:
            log(f"  {label} failed ({type(e).__name__}: {e})")
            gc.collect()
            return None
        finally:
            if todo:
                pipex.set_todo(0)

    # DeepCache at XL width: the deep half (the depth-10 level-2
    # transformers + middle) is ~80% of SDXL FLOPs, so interval reuse is
    # worth far more here than on SD1.5 topology
    xl_row("SDXL DeepCache-3", deepcache_interval=3)
    # guidance-delta caching: the quality-leaning alternative to DeepCache
    xl_row("SDXL uncond_interval-3", uncond_interval=3)
    # XL attention mass sits at the 32² (1024-token) level, so the ToDo
    # threshold drops to 1024 here (measured: 1.25x vs 1.09x at 4096)
    xl_row("SDXL ToDo-4@1024", todo=4)
    # the three XL levers stack: DeepCache reuses the deep half, ToDo thins
    # the 32² attention in the shallow half that still runs every step, and
    # guidance-delta caching makes skip steps cond-only at batch 1
    xl_row("SDXL DC-4+ui-2+ToDo-4@1024 (max gated stack)", todo=4,
           deepcache_interval=4, uncond_interval=2)

    # batch-4 pipelined throughput (the serving regime). CFG batch 8 fits
    # v5e HBM for the UNet but a full-batch 1024² fp32 VAE decode does NOT
    # (~8.6 GB conv activations) — decode per-sample, reusing the batch-1
    # decode program already compiled by the base row. Attribution
    # (scratch/sdxl_decode_attrib.py, r5): the row is SAMPLER-bound —
    # 2313 ms/img sampler + 501 ms/img bf16 decode; CFG batch 2 at 1024²
    # already saturates the MXU, so batch scaling ~1.1x is a real ceiling,
    # not a decode artifact (batched bf16 decode measured no better than
    # per-sample: 506 vs 501 ms/img).
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

    if allow("SDXL batch-4 pipelined", row_est):
        try:
            bench_sdxl_batch(4)
        except Exception as e:
            log(f"  SDXL batch-4 failed ({type(e).__name__}: {e})")
            gc.collect()  # drop traceback-held device buffers so one OOM
            # can't poison the next row

    if allow("SDXL int8 row", row_est):
        try:
            pipex.quantize_unet()
            i8, img_i8 = timed("SDXL int8 W8A8")
            s = float(np.asarray(ssim(img_i8, img_base)).min())
            log(f"  SDXL int8: {base/i8:.2f}x speedup, ssim={s:.4f} "
                f"(saves HBM; measured a slowdown at XL width — opt-in "
                f"for memory only)")
        except Exception as e:
            log(f"  SDXL int8 failed ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
