"""Command-line frontend.

The reference defines an argparse EnumAction but never builds a parser
(SURVEY §5.6, LightDiffusion.py:666-680, args_parsing=False) — all its config
is GUI state. This CLI exposes the same workload surface properly:

  python -m lightdiffusion_tpu.frontends.cli txt2img "a cat" --hires-fix
  python -m lightdiffusion_tpu.frontends.cli img2img in.png --scale 2
  python -m lightdiffusion_tpu.frontends.cli pipeline "a cat"   # ref :10001
"""

from __future__ import annotations

import argparse
import logging
import sys
import time


from ..presets import PRESETS


def apply_preset(args) -> None:
    """Fill accelerator knobs the user didn't pass from the preset via the
    shared resolver (presets.resolve — one copy of the override rules for
    every frontend). Explicit flags win — including explicit zeros
    ('--preset fast --todo 0' is DeepCache without ToDo), which is why the
    argparse defaults are None rather than 0."""
    from ..presets import resolve

    args.deepcache, args.todo, args.uncond_interval = resolve(
        args.preset, deepcache=args.deepcache,
        uncond_interval=args.uncond_interval, todo=args.todo,
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lightdiffusion-tpu")
    p.add_argument("--verbose", action="store_true")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--checkpoint", default=None)
        sp.add_argument("--lora", action="append", default=[],
                        metavar="NAME[:STRENGTH]",
                        help="LoRA to merge (repeatable)")
        sp.add_argument("--clip-skip", type=int, default=-2)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--random-init", action="store_true",
                        help="random weights (smoke runs without checkpoints)")
        sp.add_argument("--output-prefix", default="LD")
        sp.add_argument("--dp", type=int, default=1, metavar="N",
                        help="data-parallel mesh size: shard batches over N "
                             "device groups (SPMD over a jax Mesh; needs "
                             "dp*tp <= len(jax.devices()))")
        sp.add_argument("--tp", type=int, default=1, metavar="N",
                        help="tensor-parallel mesh size: Megatron-shard the "
                             "UNet's attention/MLP over N devices per dp "
                             "group (halves per-device UNet HBM at tp=2)")
        sp.add_argument("--vae-bf16", action="store_true",
                        help="decode in bf16 (ref's reduced-precision VAE "
                             "policy; ~-21 ms/img at 512^2 batch 4, decode "
                             "ssim 0.998 vs fp32)")

    t = sub.add_parser("txt2img", help="text → image")
    common(t)
    t.add_argument("prompt")
    t.add_argument("--negative", default="")
    t.add_argument("--width", type=int, default=512)
    t.add_argument("--height", type=int, default=512)
    t.add_argument("--steps", type=int, default=20)
    t.add_argument("--cfg", type=float, default=7.0)
    t.add_argument("--sampler", default="dpmpp_2m_sde")
    t.add_argument("--scheduler", default="karras")
    t.add_argument("--batch", type=int, default=1)
    t.add_argument("--hires-fix", action="store_true")
    t.add_argument("--hires-steps", type=int, default=10)
    t.add_argument("--hires-denoise", type=float, default=0.45)
    t.add_argument("--adetailer", action="store_true",
                   help="face/person detail passes (needs YOLO/SAM weights)")
    t.add_argument("--preset", choices=tuple(PRESETS),
                   default=None,
                   help="measured accelerator stacks (BENCH ledger, "
                        "SSIM-gated on-chip): fast = DeepCache-3 + ui-2 + "
                        "ToDo-2 (~1.9x, ssim 0.992); max = DeepCache-4 + "
                        "ui-2 + ToDo-4 (~2.2x, ssim 0.989); quality = "
                        "uncond-interval-2 alone (~1.2x, ssim 0.994). "
                        "Explicit --deepcache/--todo/--uncond-interval "
                        "flags override the preset knobs")
    t.add_argument("--deepcache", type=int, default=None, metavar="N",
                   help="refresh deep UNet blocks every N steps (faster, "
                        "slight quality trade; 0 = off)")
    t.add_argument("--uncond-interval", type=int, default=None,
                   metavar="N",
                   help="guidance-delta caching: run the uncond CFG branch "
                        "every N steps, reuse the stored delta between "
                        "(faster, slight quality trade; 0 = off; composes "
                        "with --deepcache: skip steps run shallow cond-only)")
    t.add_argument("--int8", action="store_true",
                   help="quantize the UNet to W8A8 after LoRA merge "
                        "(int8 MXU path, ops/quant.py)")
    t.add_argument("--todo", type=int, default=None, metavar="FACTOR",
                   help="ToDo K/V token downsampling factor (e.g. 2; arXiv "
                        "2402.13573 — slight quality trade; superseded the "
                        "removed ToMe, see MIGRATION.md)")
    t.add_argument("--cfg-cutoff", type=float, default=None, metavar="FRAC",
                   help="run CFG only for the first FRAC of steps (e.g. 0.6),"
                        " cond-only after — ~1.2-1.4x, slight quality trade")
    t.add_argument("--freeu", nargs="?", const="1.5,1.6,0.9,0.2",
                   default=None, metavar="B1,B2,S1,S2",
                   help="FreeU decoder reweighting (arXiv 2309.11497); bare "
                        "flag uses the paper's SD1.5 values")
    t.add_argument("--controlnet", default=None, metavar="CKPT",
                   help="ControlNet checkpoint (arXiv 2302.05543); needs "
                        "--control-image")
    t.add_argument("--control-image", default=None, metavar="PATH",
                   help="prepared hint image (canny/depth/pose map)")
    t.add_argument("--control-strength", type=float, default=1.0)
    t.add_argument("--refiner", default=None, metavar="CKPT",
                   help="SDXL refiner checkpoint: two-stage base→refiner "
                        "sampling on one shared schedule")
    t.add_argument("--refiner-switch", type=float, default=0.8,
                   help="fraction of steps run on the base model")

    i = sub.add_parser("img2img", help="image → upscaled/refined image (USDU)")
    common(i)
    i.add_argument("image")
    i.add_argument("--prompt", default="")
    i.add_argument("--negative", default="")
    i.add_argument("--scale", type=float, default=2.0)
    i.add_argument("--steps", type=int, default=8)
    i.add_argument("--cfg", type=float, default=6.0)
    i.add_argument("--denoise", type=float, default=0.3)
    i.add_argument("--tile", type=int, default=512)
    i.add_argument("--preset", choices=tuple(PRESETS),
                   default=None,
                   help="measured accelerator stack for the tile redraw "
                        "passes (presets.py; same table/override rules as "
                        "txt2img --preset)")
    i.add_argument("--deepcache", type=int, default=None, metavar="N",
                   help="DeepCache for the tile redraw passes (0 = off)")
    i.add_argument("--uncond-interval", type=int, default=None, metavar="N",
                   help="guidance-delta caching for the tile redraw passes "
                        "(0 = off; composes with --deepcache)")
    i.add_argument("--todo", type=int, default=None, metavar="FACTOR",
                   help="ToDo K/V token downsampling for the redraw passes")

    pl = sub.add_parser("pipeline", help="reference headless pipeline (ref :10001)")
    common(pl)
    pl.add_argument("prompt")
    pl.add_argument("--width", type=int, default=512)
    pl.add_argument("--height", type=int, default=512)
    pl.add_argument("--number", type=int, default=1)
    pl.add_argument("--no-enhance", action="store_true")
    pl.add_argument("--preset", choices=tuple(PRESETS),
                    default=None,
                    help="measured accelerator stack for the whole workload "
                         "(presets.py): the dpm_adaptive base pass keeps "
                         "only the stateless levers (ToDo), the hires pass "
                         "runs the full stack")

    w = sub.add_parser(
        "warmup",
        help="AOT-compile the common shape buckets into the persistent "
             "XLA cache (replaces the reference's per-shape stable-fast "
             "compile windup, README.md:24)",
    )
    common(w)
    w.add_argument("--batch", type=int, default=1)

    s = sub.add_parser(
        "serve",
        help="HTTP serving frontend: POST /txt2img with cross-request "
             "batching into one compiled program (frontends/server.py)",
    )
    common(s)
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--max-batch", type=int, default=4)
    s.add_argument("--max-wait-ms", type=float, default=25.0)
    s.add_argument("--int8", action="store_true",
                   help="quantize the UNet to W8A8 (int8 MXU path)")
    s.add_argument("--todo", type=int, default=0, metavar="FACTOR",
                   help="serve with ToDo K/V downsampling (pipeline-level "
                        "accelerator: one compiled program set, ~1.3x at "
                        "512^2, SSIM 0.998)")
    s.add_argument("--warmup", action="store_true",
                   help="AOT-compile the default shape buckets before "
                        "accepting requests (no first-request compile stall)")
    s.add_argument("--controlnet", default=None, metavar="CKPT",
                   help="serve with a ControlNet: requests may carry a "
                        "base64-PNG control_image (+ control_strength)")
    s.add_argument("--adetailer", action="store_true",
                   help="load the YOLO/SAM detector stack so requests may "
                        "set adetailer=true (the ref GUI's two detail "
                        "passes, :10621-10731)")

    d = sub.add_parser(
        "download",
        help="first-run asset bootstrap from HF Hub (ref :53-120); "
             "no-op when huggingface_hub/network is unavailable",
    )
    d.add_argument("--classes", nargs="*", default=None,
                   help="asset classes (default: all)")
    return p


def _mesh_from_args(args):
    """None for the 1x1 default; otherwise a ("dp","tp") Mesh over the
    first dp*tp devices (parallel/mesh.py). The SPMD path pins the XLA
    kernel routes (SDPipeline does that); programs and ICI collectives are
    inserted by GSPMD — no frontend code is parallelism-aware."""
    dp = getattr(args, "dp", 1) or 1
    tp = getattr(args, "tp", 1) or 1
    if dp * tp == 1:
        return None
    import jax

    from ..parallel.mesh import make_mesh

    n = len(jax.devices())
    if dp * tp > n:
        raise SystemExit(
            f"--dp {dp} --tp {tp} needs {dp * tp} devices, "
            f"found {n}"
        )
    return make_mesh(n_dp=dp, n_tp=tp)


def _parse_loras(items):
    out = []
    for it in items:
        name, _, s = it.partition(":")
        strength = float(s) if s else 1.0
        out.append((name, strength, strength))
    return out


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        format="%(message)s",
        level=logging.DEBUG if args.verbose else logging.INFO,
    )
    from ..runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    from .headless import load_default_pipeline, pipeline
    from ..nodes import SaveImage
    from ..pipelines.sd import txt2img

    t0 = time.time()
    if args.command == "download":
        from .. import assets

        touched = assets.ensure_downloaded(asset_classes=args.classes)
        print(f"populated {len(touched)} asset dirs" if touched
              else "nothing to download (all present or hub unavailable)",
              file=sys.stderr)
        return
    if args.command == "warmup":
        from ..runtime.warmup import warmup

        pipe = load_default_pipeline(
            checkpoint=args.checkpoint, loras=_parse_loras(args.lora),
            clip_skip=args.clip_skip, random_init=args.random_init,
            mesh=_mesh_from_args(args), vae_bf16=args.vae_bf16,
        )
        warmup(pipe, batch=args.batch)
        print(f"warmup done in {time.time()-t0:.1f}s", file=sys.stderr)
        return
    if args.command == "serve":
        from .server import serve

        pipe = load_default_pipeline(
            checkpoint=args.checkpoint, loras=_parse_loras(args.lora),
            clip_skip=args.clip_skip, random_init=args.random_init,
            mesh=_mesh_from_args(args), vae_bf16=args.vae_bf16,
        )
        if args.int8:
            pipe.quantize_unet()
        if args.todo:
            pipe.set_todo(args.todo)
        if args.warmup:
            from ..runtime.warmup import warmup

            warmup(pipe, batch=args.max_batch, serving=True)
        cn = None
        if args.controlnet:
            from ..loader.checkpoint import load_controlnet

            cn = load_controlnet(args.controlnet)
        detectors = None
        if args.adetailer:
            from ..pipelines.adetailer import load_detectors

            detectors = load_detectors()
        serve(pipe, host=args.host, port=args.port,
              max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
              controlnet=cn, detectors=detectors)
        return
    if args.command == "pipeline":
        mesh = _mesh_from_args(args)
        pipeline(
            args.prompt, args.width, args.height, args.number,
            enhance=not args.no_enhance, random_init=args.random_init,
            seed=args.seed, preset=args.preset, vae_bf16=args.vae_bf16,
            pipe=None if mesh is None else load_default_pipeline(
                checkpoint=args.checkpoint, loras=_parse_loras(args.lora),
                clip_skip=args.clip_skip, random_init=args.random_init,
                mesh=mesh, vae_bf16=args.vae_bf16,
            ),
        )
    elif args.command == "txt2img":
        pipe = load_default_pipeline(
            checkpoint=args.checkpoint, loras=_parse_loras(args.lora),
            clip_skip=args.clip_skip, random_init=args.random_init,
            mesh=_mesh_from_args(args), vae_bf16=args.vae_bf16,
        )
        if args.preset:
            apply_preset(args)
        # unset (None) accelerator knobs mean off (the defaults are None so
        # apply_preset can tell "--todo 0" from "not passed")
        args.deepcache = args.deepcache or 0
        args.uncond_interval = args.uncond_interval or 0
        args.todo = args.todo or 0
        if args.int8:
            pipe.quantize_unet()
        if args.todo:
            pipe.set_todo(args.todo)
        if args.freeu:
            vals = [float(v) for v in args.freeu.split(",")]
            if len(vals) != 4:
                raise SystemExit(
                    f"--freeu needs exactly 4 values B1,B2,S1,S2 "
                    f"(got {len(vals)})"
                )
            pipe.set_freeu(*vals)
        control = None
        if args.controlnet:
            import numpy as np
            from PIL import Image

            from ..loader.checkpoint import load_controlnet

            if not args.control_image:
                raise SystemExit("--controlnet needs --control-image")
            cn_params, cn_cfg = load_controlnet(args.controlnet)
            # hint target is latent*8 (like server.py): the hint encoder
            # downsamples x8, and the residual add requires the latent grid
            # exactly, so non-multiple-of-8 sizes must round down here
            r = pipe.sd.vae_config.downscale_ratio
            hint = np.asarray(
                Image.open(args.control_image).convert("RGB").resize(
                    (args.width // r * 8, args.height // r * 8)
                ),
                np.float32,
            )[None] / 255.0
            control = (cn_params, cn_cfg, hint, args.control_strength)
        if args.refiner:
            if control is not None or args.cfg_cutoff:
                raise SystemExit(
                    "--refiner does not combine with --controlnet/"
                    "--cfg-cutoff (two-stage refiner sampling has its own "
                    "schedule handoff)"
                )
            from ..loader.checkpoint import load_checkpoint
            from ..pipelines.sd import SDPipeline, txt2img_refined

            refiner = SDPipeline(load_checkpoint(args.refiner),
                                 clip_skip=args.clip_skip)
            imgs = txt2img_refined(
                pipe, refiner, args.prompt, args.negative, width=args.width,
                height=args.height, steps=args.steps, cfg=args.cfg,
                seed=args.seed, sampler_name=args.sampler,
                scheduler=args.scheduler, refiner_switch=args.refiner_switch,
                batch=args.batch,
            )
            SaveImage().save_images(imgs, args.output_prefix)
            print(f"done in {time.time()-t0:.1f}s", file=sys.stderr)
            return
        imgs = txt2img(
            pipe, args.prompt, args.negative, width=args.width,
            height=args.height, steps=args.steps, cfg=args.cfg,
            seed=args.seed, sampler_name=args.sampler,
            scheduler=args.scheduler, batch=args.batch,
            hires_fix=args.hires_fix, hires_steps=args.hires_steps,
            hires_denoise=args.hires_denoise,
            deepcache_interval=args.deepcache,
            uncond_interval=args.uncond_interval,
            cfg_cutoff=args.cfg_cutoff,
            control=control,
        )
        if args.adetailer:
            from ..pipelines.adetailer import adetailer

            imgs = adetailer(pipe, imgs, seed=args.seed)
        SaveImage().save_images(imgs, args.output_prefix)
    elif args.command == "img2img":
        import numpy as np
        from PIL import Image
        from ..postprocess.usdu import ultimate_sd_upscale

        pipe = load_default_pipeline(
            checkpoint=args.checkpoint, loras=_parse_loras(args.lora),
            clip_skip=args.clip_skip, random_init=args.random_init,
            mesh=_mesh_from_args(args), vae_bf16=args.vae_bf16,
        )
        if args.preset:
            apply_preset(args)
        args.deepcache = args.deepcache or 0
        args.uncond_interval = args.uncond_interval or 0
        if args.todo:
            pipe.set_todo(args.todo)
        img = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0
        out = ultimate_sd_upscale(
            pipe, img[None], args.prompt, args.negative,
            upscale_by=args.scale, steps=args.steps, cfg=args.cfg,
            denoise=args.denoise, tile_width=args.tile, tile_height=args.tile,
            seed=args.seed, deepcache_interval=args.deepcache,
            uncond_interval=args.uncond_interval,
        )
        SaveImage().save_images(out, args.output_prefix + "-img2img")
    print(f"done in {time.time()-t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
