"""Tkinter GUI — the reference's desktop frontend.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``App``                 :10121-10799 (sidebar: prompt/neg boxes,
    checkpoint+LoRA dropdowns, w/h sliders 1-2048 step 16, cfg 1-15,
    checkboxes Hires-Fix/Adetailer/Prompt-enhancer/Previewer,
    generate/img2img/interrupt buttons, aspect-fit display pane,
    param persistence on every change, most-recent-image restore)
  - generation thread       :10452-10735
  - interrupt flag          :10794 (NOTE: the reference never clears it —
    a stale-state bug (SURVEY §5.2); we reset it at the start of each run)
  - live previews           :761-777 (TAESD per step; here per chunk via
    sample_latent_chunked — no unsynchronized threads)

Requires a display; ``python -m lightdiffusion_tpu.frontends.gui``.
"""

from __future__ import annotations

import logging
import threading

import numpy as np

from .. import assets
from .persistence import SessionParams, load_parameters_from_file, write_parameters_to_file

log = logging.getLogger(__name__)

# sentinel: "keep the controller's current selection" — distinct from None,
# which callers use to mean "no checkpoint / random-init"
_KEEP = object()


class GenerationController:
    """GUI-independent orchestration (testable headlessly): holds the
    pipeline, interrupt flag, and runs the reference's generate flow."""

    def __init__(self):
        self.pipe = None
        self.interrupt_flag = False
        self.current_checkpoint = None
        self.current_lora = None
        self.current_lora_strength = 1.0
        self.current_int8 = False
        self._taesd = self._try_load_taesd()
        # single-flight: a second Generate while one runs would contend for
        # the chip (the reference lets threads race, SURVEY §5.2)
        self._run_lock = threading.Lock()

    @staticmethod
    def _try_load_taesd():
        """TAESD previews when taesd_decoder weights exist (ref :761-777);
        falls back to the linear latent→RGB projection otherwise."""
        try:
            from ..loader.checkpoint import load_torch_file
            from ..models.taesd import convert_taesd_decoder

            path = assets.resolve_file("vae_approx", "taesd_decoder")
            return convert_taesd_decoder(load_torch_file(path))
        except Exception:
            return None

    def interrupt(self):
        self.interrupt_flag = True

    def prep(self, checkpoint: str | None, lora: str | None = None,
             random_init: bool = False, int8: bool = False,
             lora_strength: float = 1.0):
        """(Re)load when the selection changed (ref _prep :10455). ``int8``
        fills the reference's Stable-Fast accelerator toggle slot
        (:10184-10220) — here jit is always on, so the opt-in accelerator
        is the W8A8 quantized UNet (ops/quant.py). ``lora_strength`` applies
        to both model and clip towers (the ref's img2img path reloads the
        LoRA at strength 2/2, :10345-10355)."""
        if (
            self.pipe is not None
            and checkpoint == self.current_checkpoint
            and lora == self.current_lora
            and int8 == self.current_int8
            and lora_strength == self.current_lora_strength
        ):
            return self.pipe
        from .headless import load_default_pipeline

        loras = (
            [(lora, lora_strength, lora_strength)]
            if lora and lora != "None" else []
        )
        self.pipe = load_default_pipeline(
            checkpoint=checkpoint, loras=loras, clip_skip=-2,
            random_init=random_init,
        )
        if int8:
            self.pipe.quantize_unet()
        self.current_checkpoint = checkpoint
        self.current_lora = lora
        self.current_lora_strength = lora_strength
        self.current_int8 = int8
        return self.pipe

    def generate(
        self,
        prompt: str,
        neg: str,
        width: int,
        height: int,
        cfg: float,
        seed: int = 0,
        steps: int = 20,
        sampler_name: str = "dpmpp_2m_sde",
        scheduler: str = "karras",
        hires_fix: bool = False,
        adetailer: bool = False,
        enhance: bool = False,
        preview_cb=None,  # fn(image_np) for live previews
        progress_cb=None,  # fn(done, total)
        random_init: bool = False,
        int8: bool = False,
        todo: bool = False,  # ToDo factor 2 (arXiv 2402.13573)
        freeu: bool = False,  # FreeU paper defaults (models/unet.py)
        deepcache: bool = False,  # DeepCache interval 2 (chunked-capable)
        guidance_cache: bool = False,  # uncond_interval 2 (quality-leaning
        # alternative to DeepCache; checking both composes them — skip
        # steps run shallow cond-only, pipelines/sd.py dual-cache denoiser)
        preset: str | None = None,  # fast|max|quality: the measured stacks
        # (presets.py) — overrides the individual accelerator toggles
        checkpoint=_KEEP,  # explicit selection; _KEEP = current
        lora=_KEEP,
    ) -> np.ndarray | None:
        from ..models.taesd import latent_to_rgb_preview

        if not self._run_lock.acquire(blocking=False):
            log.warning("generation already running; ignoring request")
            return None
        try:
            return self._generate_locked(
                prompt, neg, width, height, cfg, seed, steps, sampler_name,
                scheduler, hires_fix, adetailer, enhance, preview_cb,
                progress_cb, random_init, int8, todo, freeu,
                deepcache, guidance_cache, preset, checkpoint, lora,
            )
        finally:
            self._run_lock.release()

    def _generate_locked(self, prompt, neg, width, height, cfg, seed, steps,
                         sampler_name, scheduler, hires_fix, adetailer,
                         enhance, preview_cb, progress_cb, random_init,
                         int8=False, todo=False,
                         freeu=False, deepcache=False, guidance_cache=False,
                         preset=None, checkpoint=_KEEP, lora=_KEEP):
        from ..models.taesd import latent_to_rgb_preview

        self.interrupt_flag = False  # the reference forgets this (:10794)
        # selections are passed IN, not pre-written to current_* — writing
        # them first would make prep()'s change detection vacuous and hand
        # back a stale pipe with the previous checkpoint's weights
        ckpt = self.current_checkpoint if checkpoint is _KEEP else checkpoint
        lra = self.current_lora if lora is _KEEP else lora
        pipe = self.prep(ckpt, lra, random_init=random_init, int8=int8)
        dc = 2 if deepcache else 0
        ui = 2 if guidance_cache else 0  # composes with DeepCache (sd.py)
        todo_f = 2 if todo else 0
        if preset:
            from ..presets import resolve

            dc, todo_f, ui = resolve(preset)
        if todo_f != pipe.sd.unet_config.todo_factor:
            pipe.set_todo(todo_f)
        if freeu != bool(pipe.sd.unet_config.freeu):
            pipe.set_freeu() if freeu else pipe.set_freeu(None)
        if enhance:
            from .enhancer import enhance_prompt

            prompt = enhance_prompt(prompt)

        def on_chunk(done, total, latent_np):
            if progress_cb:
                progress_cb(done, total)
            if preview_cb is not None:
                import jax.numpy as jnp

                if self._taesd is not None:
                    from ..models.taesd import taesd_decode

                    preview = np.asarray(
                        taesd_decode(self._taesd, jnp.asarray(latent_np[:1]))
                    )[0]
                else:
                    preview = np.asarray(
                        latent_to_rgb_preview(jnp.asarray(latent_np[:1]))
                    )[0]
                preview_cb(preview)
            return not self.interrupt_flag

        positive = pipe.encode_text(prompt)
        negative = pipe.encode_text(neg)
        latent = pipe.empty_latent(width, height, 1)
        latent = pipe.sample_latent_chunked(
            latent, positive, negative, seed=seed, steps=steps, cfg=cfg,
            sampler_name=sampler_name, scheduler=scheduler, chunk_size=5,
            on_chunk=on_chunk, deepcache_interval=dc, uncond_interval=ui,
        )
        if self.interrupt_flag:
            return None
        if hires_fix:
            latent = pipe.upscale_latent(latent, width * 2, height * 2, "bislerp")
            latent = pipe.sample_latent_chunked(
                latent, positive, negative, seed=seed, steps=10, cfg=8.0,
                sampler_name="euler_ancestral", scheduler="normal",
                denoise=0.45, chunk_size=5, on_chunk=on_chunk,
                deepcache_interval=dc, uncond_interval=ui,
            )
        if self.interrupt_flag:
            return None
        imgs = np.asarray(pipe.decode(latent))
        if adetailer:
            from ..pipelines.adetailer import adetailer as run_adetailer

            def on_seg(done, total, canvas):
                # live-canvas preview + stop between segs (ref polls
                # interrupt_flag inside every sampler loop, :922/:1076)
                if preview_cb is not None:
                    preview_cb(canvas)
                if progress_cb:
                    progress_cb(done, total)
                return not self.interrupt_flag

            imgs = run_adetailer(
                pipe, imgs, seed=seed,
                interrupt=lambda: self.interrupt_flag, on_seg=on_seg,
                # the sidebar accelerator toggles reach the (slowest)
                # masked detail passes too (stateful masked denoisers)
                deepcache_interval=dc, uncond_interval=ui,
            )
        return imgs


def main():  # pragma: no cover - needs a display
    import tkinter as tk
    from tkinter import filedialog, ttk
    from PIL import Image, ImageTk

    ctl = GenerationController()
    saved = load_parameters_from_file()

    root = tk.Tk()
    root.title("LightDiffusion-TPU")
    root.geometry("1100x720")

    side = tk.Frame(root, width=320)
    side.pack(side="left", fill="y", padx=8, pady=8)

    tk.Label(side, text="Prompt").pack(anchor="w")
    prompt_box = tk.Text(side, height=6, width=40)
    prompt_box.insert("1.0", saved.prompt)
    prompt_box.pack()
    tk.Label(side, text="Negative").pack(anchor="w")
    neg_box = tk.Text(side, height=4, width=40)
    neg_box.insert("1.0", saved.neg)
    neg_box.pack()

    ckpts = ["random-init"] + assets.list_files("checkpoints")
    loras = ["None"] + assets.list_files("loras")
    ckpt_var = tk.StringVar(value=ckpts[1] if len(ckpts) > 1 else ckpts[0])
    lora_var = tk.StringVar(value="None")
    ttk.Combobox(side, textvariable=ckpt_var, values=ckpts).pack(fill="x")
    ttk.Combobox(side, textvariable=lora_var, values=loras).pack(fill="x")

    # read the Tk selections on the MAIN thread (Tcl variable access is not
    # thread-safe), then preload + warm on a daemon thread (ref _prep thread
    # :10243); warm the CHUNKED program — it is what Generate actually runs
    # (sample_latent_chunked, a different jit program than the monolithic
    # warmup bucket), so the first click reuses the hot executable
    _preload_ckpt = None if ckpt_var.get() == "random-init" else ckpt_var.get()
    _preload_lora = lora_var.get()
    _preload_random = ckpt_var.get() == "random-init"

    def preload():
        try:
            with ctl._run_lock:
                pipe = ctl.prep(_preload_ckpt, _preload_lora,
                                random_init=_preload_random)
                pos = pipe.encode_text("warmup")
                neg = pipe.encode_text("")
                lat = pipe.empty_latent(saved.width, saved.height, 1)
                out = pipe.sample_latent_chunked(
                    lat, pos, neg, steps=20, cfg=7.0,
                    sampler_name="dpmpp_2m_sde", scheduler="karras",
                    chunk_size=5,
                )
                pipe.decode(out)
        except Exception:
            log.exception("startup preload failed (first Generate pays it)")

    threading.Thread(target=preload, daemon=True).start()

    w_var = tk.IntVar(value=saved.width)
    h_var = tk.IntVar(value=saved.height)
    cfg_var = tk.DoubleVar(value=saved.cfg)
    tk.Scale(side, from_=16, to=2048, resolution=16, orient="horizontal",
             label="Width", variable=w_var).pack(fill="x")
    tk.Scale(side, from_=16, to=2048, resolution=16, orient="horizontal",
             label="Height", variable=h_var).pack(fill="x")
    tk.Scale(side, from_=1, to=15, resolution=0.5, orient="horizontal",
             label="CFG", variable=cfg_var).pack(fill="x")

    hires_var = tk.BooleanVar()
    adet_var = tk.BooleanVar()
    enh_var = tk.BooleanVar()
    prev_var = tk.BooleanVar(value=True)
    int8_var = tk.BooleanVar()  # the ref's Stable-Fast accel slot (:10184)
    todo_var = tk.BooleanVar()
    freeu_var = tk.BooleanVar()
    deepcache_var = tk.BooleanVar()
    gcache_var = tk.BooleanVar()
    # int8 is labeled for what it measurably is: ~1x e2e speed at every
    # width tested (512² SD1.5 AND 1024² SDXL — BENCH_r03), but it halves
    # UNet weight HBM; not a speed lever (NOTES_ROUND3)
    for label, var in [("Hires Fix", hires_var), ("Adetailer", adet_var),
                       ("Prompt enhancer", enh_var), ("Previewer", prev_var),
                       ("Int8 (saves HBM, ~1x speed)", int8_var),
                       ("ToDo (1.3x at 512, 1.7x hires)", todo_var),
                       ("DeepCache accelerator", deepcache_var),
                       ("Guidance cache (1.2x, quality-leaning)", gcache_var),
                       ("FreeU quality", freeu_var)]:
        tk.Checkbutton(side, text=label, variable=var).pack(anchor="w")
    # measured preset stacks (presets.py; same table as CLI --preset and
    # the server's per-request "preset"); overrides the toggles above
    preset_var = tk.StringVar(value="none")
    tk.Label(side, text="Preset (overrides toggles)").pack(anchor="w")
    from ..presets import PRESETS as _PRESETS
    tk.OptionMenu(side, preset_var, "none", *_PRESETS).pack(fill="x")

    display = tk.Label(root, bg="#202020")
    display.pack(side="right", expand=True, fill="both")
    photo_ref = {}

    def show(img_np):
        img = Image.fromarray((np.clip(img_np, 0, 1) * 255).astype(np.uint8))
        dw, dh = max(display.winfo_width(), 64), max(display.winfo_height(), 64)
        scale = min(dw / img.width, dh / img.height)
        img = img.resize((int(img.width * scale), int(img.height * scale)))
        photo = ImageTk.PhotoImage(img)
        photo_ref["p"] = photo
        display.configure(image=photo)

    def persist(*_):
        write_parameters_to_file(SessionParams(
            prompt_box.get("1.0", "end").strip(),
            neg_box.get("1.0", "end").strip(),
            w_var.get(), h_var.get(), cfg_var.get(),
        ))

    for v in (w_var, h_var, cfg_var):
        v.trace_add("write", persist)
    # per-keystroke prompt/neg persistence (ref writes prompt.txt on every
    # keystroke and slider release, :10270-10319) — a crash mid-typing
    # must not lose the prompt
    for box in (prompt_box, neg_box):
        box.bind("<KeyRelease>", persist)

    def run_generate():
        persist()
        # snapshot every Tk variable on the main thread; the worker thread
        # receives plain values (and the selection goes through generate()'s
        # checkpoint=/lora= args so prep() sees a real change)
        sel_ckpt = None if ckpt_var.get() == "random-init" else ckpt_var.get()
        sel_lora = lora_var.get()
        sel_random = ckpt_var.get() == "random-init"
        args = (prompt_box.get("1.0", "end").strip(),
                neg_box.get("1.0", "end").strip(),
                w_var.get(), h_var.get(), cfg_var.get())
        opts = dict(
            hires_fix=hires_var.get(), adetailer=adet_var.get(),
            enhance=enh_var.get(), int8=int8_var.get(),
            todo=todo_var.get(),
            freeu=freeu_var.get(),
            deepcache=deepcache_var.get(),
            guidance_cache=gcache_var.get(),
            preset=None if preset_var.get() == "none" else preset_var.get(),
        )
        do_preview = prev_var.get()

        def work():
            imgs = ctl.generate(
                *args,
                preview_cb=(lambda p: root.after(0, show, p)) if do_preview else None,
                progress_cb=lambda d, t: root.after(
                    0, root.title, f"LightDiffusion-TPU — {d}/{t}"
                ),
                random_init=sel_random, checkpoint=sel_ckpt, lora=sel_lora,
                **opts,
            )
            if imgs is not None:
                from ..nodes import SaveImage

                SaveImage().save_images(imgs, "GUI")
                root.after(0, show, imgs[0])

        threading.Thread(target=work, daemon=True).start()

    def run_img2img():
        path = filedialog.askopenfilename()
        if not path:
            return
        # main-thread snapshot of Tk state (Tcl is not thread-safe)
        sel_ckpt = None if ckpt_var.get() == "random-init" else ckpt_var.get()
        sel_lora = lora_var.get()
        sel_random = ckpt_var.get() == "random-init"
        sel_prompt = prompt_box.get("1.0", "end").strip()
        sel_neg = neg_box.get("1.0", "end").strip()
        do_preview = prev_var.get()

        def work():
            from ..postprocess.usdu import ultimate_sd_upscale
            from ..nodes import SaveImage

            # the reference's img2img reloads the LoRA at strength 2/2
            # (:10345-10355)
            pipe = ctl.prep(sel_ckpt, sel_lora, random_init=sel_random,
                            lora_strength=2.0)
            img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
            ctl.interrupt_flag = False

            def on_tile(done, total, canvas):
                root.after(0, root.title,
                           f"LightDiffusion-TPU — img2img {done}/{total}")
                if do_preview:
                    root.after(0, show, canvas)
                return not ctl.interrupt_flag

            out = ultimate_sd_upscale(
                pipe, img[None], sel_prompt, sel_neg, upscale_by=2.0, steps=8,
                cfg=6.0, denoise=0.3, mask_blur=16, padding=32,
                seam_fix_mode="Half Tile", seam_fix_denoise=0.2,
                on_tile=on_tile,
            )
            SaveImage().save_images(out, "GUI-img2img")
            root.after(0, show, out[0])

        threading.Thread(target=work, daemon=True).start()

    tk.Button(side, text="Generate", command=run_generate).pack(fill="x", pady=2)
    tk.Button(side, text="Img2Img", command=run_img2img).pack(fill="x", pady=2)
    tk.Button(side, text="Interrupt", command=ctl.interrupt).pack(fill="x", pady=2)

    # most-recent-image restore (ref :10774)
    outs = sorted(assets.output_dir().glob("*.png"))
    if outs:
        show(np.asarray(Image.open(outs[-1]), np.float32) / 255.0)

    root.mainloop()


if __name__ == "__main__":  # pragma: no cover
    main()
