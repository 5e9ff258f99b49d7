"""HTTP serving frontend with cross-request batching.

The reference's only "serving" surface is the Discord-bot headless
``pipeline(prompt, w, h)`` (/root/reference/LightDiffusion.py:10001) — one
request at a time, no concurrency story. This is the TPU-native production
path instead: a stdlib HTTP server feeding a single device worker that
**batches compatible concurrent requests into one compiled program call**
(batch is the throughput lever on the MXU — bench.py saturates at 4).

Design:
  - one worker thread owns the TPU (one process/one stream discipline);
    HTTP threads only enqueue and wait on a per-request event
  - the worker is PIPELINED: it dispatches a batch's compiled programs
    (async in JAX) and hands the un-synced device arrays to a drainer
    thread for host transfer + delivery, so batch N+1's programs queue on
    the device while batch N drains — the dispatch/compute overlap bench.py's
    pipelined mode measures. In-flight depth is bounded to cap HBM
  - requests group by static compile key (width, height, steps, sampler,
    scheduler); seeds/prompts/guidance are dynamic: initial noise is
    prepared per request and concatenated, prompts encode to per-sample
    (B, L, C) conds (repeat-padded to the lcm chunk length, ref :648-663),
    and ``cfg`` rides as a (B,) array (per-sample guidance in the CFG
    combine)
  - batching waits at most ``max_wait_ms`` for co-travellers, then runs
    whatever is there (padding-free: programs are cached per batch size
    ≤ max_batch)
  - seed reproducibility: initial AND per-step sampler noise are keyed per
    request (noise.keys_for), so a request's noise is identical in any
    batch composition — exact at fp32 (tests); under bf16 the compiled
    program differs per batch SHAPE, so images agree to bf16 accumulation
    tolerance across batch sizes (measured ~1% of the different-seed scale
    on-chip), like any shape-specializing batching server

Endpoints:
  POST /txt2img  {"prompt": ..., "negative_prompt", "width", "height",
                  "steps", "cfg", "seed", "sampler", "scheduler",
                  "hires_fix", "hires_steps", "hires_denoise", "hires_cfg",
                  "preset": "fast"|"max"|"quality" (measured accelerator
                  stacks, presets.py — explicit "deepcache"/
                  "uncond_interval"/"todo" fields override, CLI rules),
                  "format": "png"|"json"} → image/png bytes or JSON meta.
                  hires_fix reproduces the reference's default headless
                  output (bislerp x2 + euler_ancestral/normal partial
                  denoise, ref :10060-10078), batched across requests.
  POST /img2img  {"init_image": base64-PNG, "prompt", "upscale_by",
                  "steps", "cfg", "denoise", "seam_fix_mode", ...} →
                  UltimateSDUpscale per request (ref GUI img2img
                  :10392-10417); never co-batched.
  GET  /healthz  → {"ok": true, ...}
  GET  /stats    → batching counters (requests, batches, batched_requests)
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

log = logging.getLogger(__name__)

# Request-size caps: the server binds 0.0.0.0 by default. HTTP bodies are
# rejected at MAX_BODY_BYTES (413) before buffering — that is the operative
# limit for base64 payloads over HTTP (~6 MB decoded). The image-bytes cap
# below guards direct library submit() callers (no HTTP body limit) and is
# measured on the COMPRESSED payload; the decompression-bomb guard is the
# separate pixel-count check done on the PIL header before any decode.
MAX_BODY_BYTES = 8 << 20
MAX_CONTROL_IMAGE_BYTES = 16 << 20
MAX_IMAGE_PIXELS = 4096 * 4096


def _open_image_checked(raw: bytes, what: str):
    """bytes → PIL RGB image with client-fault errors: size cap on the
    header BEFORE full decode (PIL parses only metadata at open()), and
    malformed data surfaced as ValueError (→ HTTP 400, not 500)."""
    import io as _io

    from PIL import Image

    if len(raw) > MAX_CONTROL_IMAGE_BYTES:
        raise ValueError(
            f"{what} too large (>{MAX_CONTROL_IMAGE_BYTES >> 20} MB payload)"
        )
    try:
        img = Image.open(_io.BytesIO(raw))
        if img.width * img.height > MAX_IMAGE_PIXELS:
            raise ValueError(
                f"{what} larger than {MAX_IMAGE_PIXELS} pixels "
                f"({img.width}x{img.height})"
            )
        return img.convert("RGB")
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(f"{what} is not a decodable image: {e}")

_ALLOWED = {
    "prompt", "negative_prompt", "width", "height", "steps", "cfg", "seed",
    "sampler", "scheduler", "format", "control_image", "control_strength",
    "cfg_cutoff", "hires_fix", "hires_steps", "hires_denoise", "hires_cfg",
    "adetailer", "deepcache", "uncond_interval", "todo", "preset",
}


def _resolve_preset(params: dict, default_sampler: str,
                    require_fixed_step: bool = False) -> dict:
    """Fill accelerator knobs the request didn't pass from ``preset``
    ("fast" | "max" | "quality"; presets.PRESETS) — the same override rules
    as the CLI (frontends/cli.py apply_preset): explicit fields win,
    including explicit zeros, and passing either of deepcache/
    uncond_interval explicitly suppresses the preset's other knob."""
    preset = params.get("preset")
    if preset is None:
        return params
    from ..presets import resolve

    dc, todo, ui = resolve(preset)
    params = dict(params)
    del params["preset"]
    if "deepcache" not in params and "uncond_interval" not in params:
        # preset-derived cached accelerators downgrade silently where they
        # can't apply (control_image; for img2img also a non-fixed-step
        # sampler — its single sampler runs every redraw). For txt2img a
        # non-fixed-step BASE sampler keeps them: the worker downgrades
        # only the base pass while the hires pass (always euler_ancestral)
        # runs the full stack, like txt2img/headless. Only EXPLICIT
        # deepcache/uncond_interval fields get the 400.
        fixed = _fixed_step_sampler(str(params.get("sampler",
                                                   default_sampler)))
        if params.get("control_image") is None and (
            fixed or not require_fixed_step
        ):
            params["deepcache"] = dc
            params["uncond_interval"] = ui
            if not fixed:
                params["_accel_from_preset"] = True
    if "todo" not in params:
        params["todo"] = todo
    return params

def _fixed_step_sampler(name: str) -> bool:
    """True when the sampler has a fixed-step single-eval scan body
    (diffusion.samplers.make_stepper) — the forms the DeepCache /
    uncond_interval stateful steppers support. Queries the authoritative
    gate (_stateful_program checks the same thing) rather than keeping a
    parallel sampler list here."""
    import jax

    from ..diffusion.samplers import make_stepper

    return make_stepper(name, lambda x, s: x, jax.random.PRNGKey(0)) \
        is not None

_ALLOWED_IMG2IMG = {
    "init_image", "prompt", "negative_prompt", "upscale_by", "steps", "cfg",
    "denoise", "seed", "sampler", "scheduler", "mode_type", "seam_fix_mode",
    "seam_fix_denoise", "tile_width", "tile_height", "mask_blur", "padding",
    "deepcache", "uncond_interval", "todo", "preset", "format",
}


class _Request:
    __slots__ = ("params", "kind", "event", "image", "error")

    def __init__(self, params, kind="txt2img"):
        self.params = params
        self.kind = kind
        self.event = threading.Event()
        self.image = None
        self.error = None

    def group_key(self):
        p = self.params
        if self.kind == "img2img":
            # per-request canvases (arbitrary sizes, long sequential tile
            # loops) never co-batch — unique key per request
            return ("img2img", id(self))
        # hires knobs only shape the compiled program when hires_fix is on;
        # collapse them otherwise so requests that populate unused fields
        # still co-batch
        hires = (
            (True, p["hires_steps"], p["hires_denoise"])
            if p["hires_fix"] else (False, 0, 0.0)
        )
        return ("txt2img", p["width"], p["height"], p["steps"], p["sampler"],
                p["scheduler"], p["control_image"] is not None,
                p["cfg_cutoff"]) + hires + (
                p["adetailer"], p["deepcache"], p["uncond_interval"],
                p["todo"],
                # cfg==1.0 requests group apart: they always run the
                # cond-only guidance-free program, so a request's program
                # (and image) never depends on its co-travellers' cfg
                p["cfg"] == 1.0)


class GenerationServer:
    """Batching worker around one SDPipeline. Thread-safe submit()."""

    def __init__(self, pipe, max_batch: int = 4, max_wait_ms: float = 25.0,
                 max_in_flight: int = 2, controlnet=None, detectors=None,
                 adetailer_kwargs: dict | None = None):
        """``controlnet``: optional (params, UNetConfig) from
        loader.checkpoint.load_controlnet — requests may then carry a
        base64-PNG ``control_image`` (+ ``control_strength``), batched as
        per-sample hints/strengths. ``detectors``: optional (person, face,
        sam) triple (pipelines.adetailer.load_detectors) enabling the
        ``adetailer`` request flag — the reference GUI's two detail passes
        (ref :10621-10731) as a serving option."""
        self.pipe = pipe
        self.controlnet = controlnet
        self.detectors = detectors
        # deployment-level detailer settings (guide_size/steps/denoise...)
        self.adetailer_kwargs = dict(adetailer_kwargs or {})
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._queue: queue.Queue[_Request] = queue.Queue()
        # (group, device_images) awaiting host transfer; bounded put() is the
        # backpressure that caps device-side in-flight batches
        self._pending: queue.Queue = queue.Queue(maxsize=max_in_flight)
        self._stats = {"requests": 0, "batches": 0, "batched_requests": 0}
        self._stats_lock = threading.Lock()
        self._stop = threading.Event()
        self._backlog: list[_Request] = []  # worker-thread only
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self._drainer = threading.Thread(target=self._drain, daemon=True)
        self._drainer.start()

    # ------------------------------------------------------------- public ---
    def submit(self, params: dict, timeout: float = 600.0,
               kind: str = "txt2img") -> np.ndarray:
        """Enqueue one generation; blocks until its image is ready.
        ``kind``: "txt2img" (batchable; optional hires_fix second pass —
        the reference's DEFAULT headless output is always hires-fixed,
        ref :10060-10078) or "img2img" (UltimateSDUpscale per-request)."""
        if kind == "img2img":
            req = _Request(self._normalize_img2img(params), kind)
        else:
            req = _Request(self._normalize(params))
        with self._stats_lock:
            self._stats["requests"] += 1
        self._queue.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise req.error
        return req.image

    def stats(self) -> dict:
        with self._stats_lock:
            return dict(self._stats)

    def health(self) -> dict:
        """Operational snapshot for /healthz: device, model shape, queue
        depth, compiled-program cache occupancy, live accelerator state."""
        import jax

        cfg = self.pipe.sd.unet_config
        return {
            "ok": True,
            "device": str(jax.devices()[0]),
            "model": {
                "model_channels": cfg.model_channels,
                "context_dim": cfg.context_dim,
                "adm_in_channels": cfg.adm_in_channels,
                "todo_factor": cfg.todo_factor,
            },
            "queue_depth": self._queue.qsize(),
            "programs_cached": len(self.pipe._programs),
            "max_batch": self.max_batch,
        }

    def shutdown(self):
        self._stop.set()
        self._queue.put(None)  # wake the worker
        self._worker.join(timeout=5)
        # Wake the drainer without ever blocking: if _pending is full (the
        # worker may even be stuck in its put()), drain items ourselves and
        # fail their waiters until the sentinel fits.
        while True:
            try:
                self._pending.put_nowait(None)
                break
            except queue.Full:
                try:
                    item = self._pending.get_nowait()
                except queue.Empty:
                    continue
                if item is not None:
                    for r in item[0]:
                        r.error = RuntimeError("server shutting down")
                        r.event.set()
        self._drainer.join(timeout=5)
        # fail any groups the drainer never reached (e.g. enqueued after the
        # sentinel by a worker that outlived its join timeout)
        while True:
            try:
                item = self._pending.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                for r in item[0]:
                    r.error = RuntimeError("server shutting down")
                    r.event.set()
        # fail any requests still queued/deferred so their waiters unblock
        # immediately instead of hitting the submit() timeout
        leftovers = list(self._backlog)
        self._backlog = []
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if r is not None:
                leftovers.append(r)
        for r in leftovers:
            r.error = RuntimeError("server shutting down")
            r.event.set()

    # ------------------------------------------------------------ worker ----
    def _normalize(self, params: dict) -> dict:
        if not isinstance(params, dict):
            raise ValueError("request body must be a JSON object")
        unknown = set(params) - _ALLOWED
        if unknown:
            raise ValueError(f"unknown fields: {sorted(unknown)}")
        params = _resolve_preset(params, "euler_ancestral")
        p = {
            "prompt": str(params.get("prompt", "")),
            "negative_prompt": str(params.get("negative_prompt", "")),
            "width": int(params.get("width", 512)),
            "height": int(params.get("height", 512)),
            "steps": int(params.get("steps", 20)),
            "cfg": float(params.get("cfg", 7.0)),
            "seed": int(params.get("seed", 0)),
            "sampler": str(params.get("sampler", "euler_ancestral")),
            "scheduler": str(params.get("scheduler", "karras")),
            "format": str(params.get("format", "png")),
            "control_image": None,
            "control_strength": float(params.get("control_strength", 1.0)),
            "cfg_cutoff": (
                float(params["cfg_cutoff"])
                if params.get("cfg_cutoff") is not None
                else None
            ),
            # the reference's default headless output is hires-fixed
            # (euler_ancestral/normal/10 steps/denoise 0.45/cfg 8,
            # ref :10060-10078)
            "hires_fix": bool(params.get("hires_fix", False)),
            "hires_steps": int(params.get("hires_steps", 10)),
            "hires_denoise": float(params.get("hires_denoise", 0.45)),
            "hires_cfg": float(params.get("hires_cfg", 8.0)),
            "adetailer": bool(params.get("adetailer", False)),
            # DeepCache interval (0 = off): the biggest measured serving
            # lever at SDXL width (interval-2 = 1.62x, interval-3 = 2.07x,
            # SSIM>=0.998 — NOTES_ROUND3)
            "deepcache": int(params.get("deepcache", 0)),
            # guidance-delta caching (0 = off): the uncond CFG branch runs
            # every N steps, skip steps are cond-only at half UNet batch
            "uncond_interval": int(params.get("uncond_interval", 0)),
            # ToDo K/V downsampling factor (0 = off): config-level, applied
            # per batch group by the worker (joins the compile key)
            "todo": int(params.get("todo", 0)),
        }
        if p["adetailer"] and self.detectors is None:
            raise ValueError(
                "this server has no detailer detectors loaded (start with "
                "serve --adetailer)"
            )
        if not (64 <= p["width"] <= 2048 and 64 <= p["height"] <= 2048):
            raise ValueError("width/height out of range [64, 2048]")
        if not (1 <= p["steps"] <= 200):
            raise ValueError("steps out of range [1, 200]")
        if not (1 <= p["hires_steps"] <= 200):
            raise ValueError("hires_steps out of range [1, 200]")
        if not (0.0 < p["hires_denoise"] <= 1.0):
            raise ValueError("hires_denoise out of range (0, 1]")
        if p["hires_fix"] and params.get("control_image") is not None:
            raise ValueError("hires_fix does not combine with control_image")
        if p["hires_fix"] and (p["width"] > 1024 or p["height"] > 1024):
            # the second pass runs at 2x, which must stay inside the same
            # [64, 2048] envelope the base validation enforces
            raise ValueError("hires_fix doubles the size; width/height must "
                             "be <= 1024")
        if p["cfg_cutoff"] is not None and not (0.0 < p["cfg_cutoff"] < 1.0):
            raise ValueError("cfg_cutoff must be in (0, 1)")
        from_preset = bool(params.get("_accel_from_preset"))
        if p["deepcache"]:
            if not (2 <= p["deepcache"] <= 10):
                raise ValueError("deepcache interval must be in [2, 10]")
            if not _fixed_step_sampler(p["sampler"]) and not from_preset:
                raise ValueError(
                    f"deepcache needs a fixed-step sampler, "
                    f"not {p['sampler']!r}"
                )
            if params.get("control_image") is not None:
                raise ValueError(
                    "deepcache does not combine with control_image"
                )
        if p["todo"] and not (2 <= p["todo"] <= 8):
            raise ValueError("todo factor must be in [2, 8]")
        if p["uncond_interval"]:
            # composes with deepcache (pipelines/sd.py dual-cache denoiser)
            if not (2 <= p["uncond_interval"] <= 10):
                raise ValueError("uncond_interval must be in [2, 10]")
            if not _fixed_step_sampler(p["sampler"]) and not from_preset:
                raise ValueError(
                    f"uncond_interval needs a fixed-step sampler, "
                    f"not {p['sampler']!r}"
                )
            if params.get("control_image") is not None:
                raise ValueError(
                    "uncond_interval does not combine with control_image"
                )
        if params.get("control_image") is not None:
            if self.controlnet is None:
                raise ValueError(
                    "this server has no controlnet loaded (start with "
                    "serve --controlnet CKPT)"
                )
            import base64

            raw = base64.b64decode(params["control_image"])
            img = _open_image_checked(raw, "control_image")
            # the hint encoder downsamples ×8 to latent resolution, so the
            # hint target is latent·8 (== pixel size for the SD ratio-8 VAE)
            r = self.pipe.sd.vae_config.downscale_ratio
            img = img.resize((p["width"] // r * 8, p["height"] // r * 8))
            p["control_image"] = (
                np.asarray(img, np.float32)[None] / 255.0
            )
        return p

    def _normalize_img2img(self, params: dict) -> dict:
        """USDU img2img request (defaults mirror the reference GUI img2img
        call, ref :10392-10417)."""
        if not isinstance(params, dict):
            raise ValueError("request body must be a JSON object")
        unknown = set(params) - _ALLOWED_IMG2IMG
        if unknown:
            raise ValueError(f"unknown fields: {sorted(unknown)}")
        params = _resolve_preset(params, "dpmpp_2m_sde",
                                 require_fixed_step=True)
        if params.get("init_image") is None:
            raise ValueError("img2img needs init_image (base64 PNG)")
        import base64

        raw = base64.b64decode(params["init_image"])
        img = _open_image_checked(raw, "init_image")
        p = {
            "init_image": np.asarray(img, np.float32)[None] / 255.0,
            "prompt": str(params.get("prompt", "")),
            "negative_prompt": str(params.get("negative_prompt", "")),
            "upscale_by": float(params.get("upscale_by", 2.0)),
            "steps": int(params.get("steps", 8)),
            "cfg": float(params.get("cfg", 6.0)),
            "denoise": float(params.get("denoise", 0.3)),
            "seed": int(params.get("seed", 0)),
            "sampler": str(params.get("sampler", "dpmpp_2m_sde")),
            "scheduler": str(params.get("scheduler", "karras")),
            "mode_type": str(params.get("mode_type", "Linear")),
            "seam_fix_mode": str(params.get("seam_fix_mode", "Half Tile")),
            "seam_fix_denoise": float(params.get("seam_fix_denoise", 0.2)),
            "tile_width": int(params.get("tile_width", 512)),
            "tile_height": int(params.get("tile_height", 512)),
            "mask_blur": int(params.get("mask_blur", 16)),
            "padding": int(params.get("padding", 32)),
            "deepcache": int(params.get("deepcache", 0)),
            "uncond_interval": int(params.get("uncond_interval", 0)),
            "todo": int(params.get("todo", 0)),
            "format": str(params.get("format", "png")),
        }
        if not (1.0 <= p["upscale_by"] <= 4.0):
            raise ValueError("upscale_by out of range [1, 4]")
        # cap the UPSCALED canvas, not just the init image: a 4096² init at
        # ×4 would be a 16384² float canvas (~3 GB) and ~1000 sequential
        # tile programs — one request monopolizing the single worker for
        # hours. 4096² output ≈ the reference GUI's practical USDU ceiling.
        out_px = (p["init_image"].shape[1] * p["upscale_by"]
                  * p["init_image"].shape[2] * p["upscale_by"])
        if out_px > MAX_IMAGE_PIXELS:
            raise ValueError(
                f"upscaled canvas would be {int(out_px)} pixels "
                f"(> {MAX_IMAGE_PIXELS}); lower upscale_by or the init size"
            )
        if not (1 <= p["steps"] <= 200):
            raise ValueError("steps out of range [1, 200]")
        if not (0.0 < p["denoise"] <= 1.0):
            raise ValueError("denoise out of range (0, 1]")
        for knob in ("deepcache", "uncond_interval"):
            if p[knob] and not (2 <= p[knob] <= 10):
                raise ValueError(f"{knob} must be in [2, 10]")
            if p[knob] and not _fixed_step_sampler(p["sampler"]):
                raise ValueError(
                    f"{knob} needs a fixed-step sampler, not {p['sampler']!r}"
                )
        if p["todo"] and not (2 <= p["todo"] <= 8):
            raise ValueError("todo factor must be in [2, 8]")
        return p

    def _run_img2img(self, req: _Request) -> np.ndarray:
        from ..postprocess.usdu import ultimate_sd_upscale

        p = req.params
        return ultimate_sd_upscale(
            self.pipe, p["init_image"], p["prompt"], p["negative_prompt"],
            upscale_by=p["upscale_by"], steps=p["steps"], cfg=p["cfg"],
            denoise=p["denoise"], sampler_name=p["sampler"],
            scheduler=p["scheduler"], tile_width=p["tile_width"],
            tile_height=p["tile_height"], mask_blur=p["mask_blur"],
            padding=p["padding"], seam_fix_mode=p["seam_fix_mode"],
            seam_fix_denoise=p["seam_fix_denoise"], seed=p["seed"],
            mode_type=p["mode_type"], deepcache_interval=p["deepcache"],
            uncond_interval=p["uncond_interval"],
        )

    def _gather(self) -> list[_Request]:
        """One head-of-line request + compatible co-travellers (same static
        compile key) arriving within max_wait_ms, up to max_batch.

        Deferred (incompatible) requests park in ``_backlog`` and the OLDEST
        deferred request becomes the next head — a minority compile key is
        served on the very next batch instead of starving behind a sustained
        majority stream."""
        if self._backlog:
            head = self._backlog.pop(0)
        else:
            head = self._queue.get()
            if head is None:
                return []
        group = [head]
        # absorb compatible backlog first (oldest-first)
        rest = []
        for r in self._backlog:
            if len(group) < self.max_batch and r.group_key() == head.group_key():
                group.append(r)
            else:
                rest.append(r)
        self._backlog = rest
        deadline = time.monotonic() + self.max_wait_ms / 1e3
        while len(group) < self.max_batch:
            budget = deadline - time.monotonic()
            if budget <= 0:
                break
            try:
                nxt = self._queue.get(timeout=budget)
            except queue.Empty:
                break
            if nxt is None:
                break
            if nxt.group_key() == head.group_key():
                group.append(nxt)
            else:
                self._backlog.append(nxt)
        return group

    def _run(self):
        import jax.numpy as jnp

        from ..diffusion.cfg import common_context_length, pad_context_to

        while not self._stop.is_set():
            group = self._gather()
            if not group:
                continue
            try:
                pipe = self.pipe
                b = len(group)
                p0 = group[0].params
                # ToDo is a config-level knob: apply per batch group on the
                # worker (it owns the pipeline). Program keys include the
                # unet_config, so toggling between groups reuses the traced
                # programs rather than recompiling.
                todo = p0.get("todo", 0)
                if pipe.sd.unet_config.todo_factor != todo:
                    pipe.set_todo(todo)
                if group[0].kind == "img2img":
                    canvas = self._run_img2img(group[0])
                    with self._stats_lock:
                        self._stats["batches"] += 1
                    self._pending.put((group, canvas))
                    continue
                latent = pipe.empty_latent(p0["width"], p0["height"], b)
                conds = [pipe.encode_text(r.params["prompt"]) for r in group]
                unconds = [
                    pipe.encode_text(r.params["negative_prompt"])
                    for r in group
                ]

                def stack(pairs):
                    """(1,L,C) conds → (B,lcm,C); pooled halves → (B,D) so
                    SDXL ADM conditioning works per request."""
                    arrs = [c[0] if isinstance(c, tuple) else c for c in pairs]
                    target = common_context_length(
                        *[a.shape[1] for a in arrs]
                    )
                    cond = jnp.concatenate(
                        [pad_context_to(a, target) for a in arrs], axis=0
                    )
                    pooled = [
                        c[1] if isinstance(c, tuple) else None for c in pairs
                    ]
                    if all(p is not None for p in pooled):
                        return cond, jnp.concatenate(pooled, axis=0)
                    return cond

                cfg = np.asarray([r.params["cfg"] for r in group], np.float32)
                if (cfg == 1.0).all():
                    # cfg-1.0 requests group apart (group_key), so this
                    # scalar collapse — which dispatches the cond-only
                    # guidance-free program (~1.5x e2e) — fires for every
                    # batch composition such a request can see
                    cfg = 1.0
                control = None
                if p0["control_image"] is not None:
                    cn_params, cn_cfg = self.controlnet
                    hints = np.concatenate(
                        [r.params["control_image"] for r in group], axis=0
                    )
                    strengths = np.asarray(
                        [r.params["control_strength"] for r in group],
                        np.float32,
                    )
                    control = (cn_params, cn_cfg, hints, strengths)
                # per-request seeds: initial + per-step sampler noise are
                # drawn per sample (pipelines/sd.py), so co-batching never
                # changes a request's image
                pos_s, neg_s = stack(conds), stack(unconds)
                seeds = [r.params["seed"] for r in group]
                # preset-derived cached accelerators on a non-fixed-step
                # base sampler: downgrade the base pass only — the hires
                # pass below (always euler_ancestral) keeps the stack,
                # matching txt2img/headless (explicit fields were already
                # validated fixed-step at submit)
                base_fixed = _fixed_step_sampler(p0["sampler"])
                out = pipe.sample_latent(
                    latent, pos_s, neg_s, seed=seeds,
                    steps=p0["steps"], cfg=cfg,
                    sampler_name=p0["sampler"], scheduler=p0["scheduler"],
                    control=control, cfg_cutoff=p0["cfg_cutoff"],
                    deepcache_interval=p0["deepcache"] if base_fixed else 0,
                    uncond_interval=(
                        p0["uncond_interval"] if base_fixed else 0
                    ),
                )
                if p0["hires_fix"]:
                    # the reference's hires pass: bislerp x2 then
                    # euler_ancestral/normal at partial denoise
                    # (ref :10060-10078); hires_cfg rides per-sample
                    out = pipe.upscale_latent(
                        out, p0["width"] * 2, p0["height"] * 2, "bislerp"
                    )
                    hires_cfg = np.asarray(
                        [r.params["hires_cfg"] for r in group], np.float32
                    )
                    out = pipe.sample_latent(
                        out, pos_s, neg_s, seed=seeds,
                        steps=p0["hires_steps"], cfg=hires_cfg,
                        sampler_name="euler_ancestral", scheduler="normal",
                        denoise=p0["hires_denoise"],
                        deepcache_interval=p0["deepcache"],
                        uncond_interval=p0["uncond_interval"],
                    )
                # hand the UN-synCED device array to the drainer: the next
                # batch's programs dispatch while this one transfers
                device_images = pipe.decode(out)
                if p0["adetailer"]:
                    # detail passes run on the worker (it owns the chip),
                    # one call PER request with its own seed — co-batching
                    # must never change a request's image
                    from ..pipelines.adetailer import adetailer as run_adet

                    imgs_np = np.asarray(device_images, np.float32)
                    device_images = np.concatenate([
                        run_adet(
                            pipe, imgs_np[i : i + 1],
                            detectors=self.detectors, seed=seeds[i],
                            **self.adetailer_kwargs,
                        )
                        for i in range(b)
                    ], axis=0)
                with self._stats_lock:
                    self._stats["batches"] += 1
                    if b > 1:
                        self._stats["batched_requests"] += b
                self._pending.put((group, device_images))
            except Exception as e:  # deliver the failure to every waiter
                log.exception("generation batch failed")
                # generation faults are server errors (500) even when the
                # underlying exception is a ValueError — only _normalize
                # failures are client faults (400)
                err = e if not isinstance(e, (ValueError, KeyError)) else (
                    RuntimeError(f"generation failed: {e}")
                )
                for r in group:
                    r.error = err
                    r.event.set()

    def _drain(self):
        """Host-transfer + delivery thread (overlaps device compute)."""
        while True:
            item = self._pending.get()
            if item is None:
                return
            group, device_images = item
            try:
                images = np.asarray(device_images)
                for i, r in enumerate(group):
                    r.image = images[i]
                    r.event.set()
            except Exception as e:
                log.exception("image transfer failed")
                for r in group:
                    r.error = e
                    r.event.set()


# ------------------------------------------------------------------ HTTP ----
def _png_bytes(image: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.clip(image, 0.0, 1.0) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    server_version = "lightdiffusion-tpu/1.0"

    def log_message(self, fmt, *args):
        log.debug("http: " + fmt, *args)

    def _json(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        gen: GenerationServer = self.server.generation  # type: ignore
        if self.path == "/healthz":
            self._json(200, gen.health())
        elif self.path == "/stats":
            self._json(200, gen.stats())
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        gen: GenerationServer = self.server.generation  # type: ignore
        if self.path not in ("/txt2img", "/img2img"):
            self._json(404, {"error": "not found"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            if n > MAX_BODY_BYTES:
                self._json(413, {"error": "request body too large"})
                return
            params = json.loads(self.rfile.read(n) or b"{}")
            image = gen.submit(params, kind=self.path.lstrip("/"))
        except (ValueError, KeyError) as e:
            self._json(400, {"error": str(e)})
            return
        except Exception as e:
            self._json(500, {"error": str(e)})
            return
        if params.get("format") == "json":
            self._json(200, {
                "shape": list(image.shape),
                "mean": float(image.mean()),
            })
            return
        body = _png_bytes(image)
        self.send_response(200)
        self.send_header("Content-Type", "image/png")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def make_server(pipe, host: str = "127.0.0.1", port: int = 0,
                max_batch: int = 4, max_wait_ms: float = 25.0,
                max_in_flight: int = 2,
                controlnet=None, detectors=None) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``server.generation`` holds
    the batching worker. port=0 picks a free port (tests)."""
    httpd = ThreadingHTTPServer((host, port), _Handler)
    httpd.generation = GenerationServer(  # type: ignore[attr-defined]
        pipe, max_batch=max_batch, max_wait_ms=max_wait_ms,
        max_in_flight=max_in_flight, controlnet=controlnet,
        detectors=detectors,
    )
    return httpd


def serve(pipe, host: str = "0.0.0.0", port: int = 8000,
          max_batch: int = 4, max_wait_ms: float = 25.0,
          max_in_flight: int = 2, controlnet=None, detectors=None):
    """Blocking serve loop (CLI `serve` subcommand)."""
    httpd = make_server(pipe, host, port, max_batch, max_wait_ms,
                        max_in_flight, controlnet, detectors)
    log.info("serving on http://%s:%d (max_batch=%d)", host, port, max_batch)
    try:
        httpd.serve_forever()
    finally:
        httpd.generation.shutdown()  # type: ignore[attr-defined]
        httpd.server_close()
