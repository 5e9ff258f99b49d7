"""Frontends: CLI arg parsing, persistence round-trip, SaveImage numbering,
prompt enhancer gating."""

import numpy as np
import pytest

from lightdiffusion_tpu.frontends.cli import build_parser, _parse_loras
from lightdiffusion_tpu.frontends import persistence as P
from lightdiffusion_tpu.frontends.enhancer import enhance_prompt


def test_cli_parser_txt2img():
    args = build_parser().parse_args(
        ["txt2img", "a cat", "--steps", "12", "--hires-fix",
         "--lora", "add_detail:0.7", "--clip-skip", "-2"]
    )
    assert args.command == "txt2img"
    assert args.prompt == "a cat"
    assert args.steps == 12 and args.hires_fix
    assert _parse_loras(args.lora) == [("add_detail", 0.7, 0.7)]


def test_cli_parser_uncond_interval():
    args = build_parser().parse_args(
        ["txt2img", "a cat", "--uncond-interval", "3"]
    )
    assert args.uncond_interval == 3
    # unset is None (not 0) so apply_preset can tell "--x 0" from "absent";
    # main() coerces None -> 0 after preset application
    assert build_parser().parse_args(["txt2img", "x"]).uncond_interval is None


def test_cli_preset_fills_unset_knobs():
    """--preset fills accelerator knobs at their defaults; explicit flags
    win; the fast/max presets ship the composed dual-cache stacks."""
    from lightdiffusion_tpu.frontends.cli import apply_preset

    a = build_parser().parse_args(["txt2img", "x", "--preset", "fast"])
    apply_preset(a)
    assert (a.deepcache, a.todo, a.uncond_interval) == (3, 2, 2)

    a = build_parser().parse_args(["txt2img", "x", "--preset", "quality"])
    apply_preset(a)
    assert (a.deepcache, a.todo, a.uncond_interval) == (0, 0, 2)

    a = build_parser().parse_args(
        ["txt2img", "x", "--preset", "max", "--todo", "2"])
    apply_preset(a)
    assert (a.deepcache, a.todo, a.uncond_interval) == (4, 2, 2)

    # an explicit --deepcache with the quality preset suppresses the
    # preset's uncond_interval (single-lever intent wins over the preset)
    a = build_parser().parse_args(
        ["txt2img", "x", "--preset", "quality", "--deepcache", "2"])
    apply_preset(a)
    assert (a.deepcache, a.uncond_interval or 0) == (2, 0)

    # an explicit ZERO is an override too: '--preset fast --todo 0' means
    # DeepCache without ToDo, and '--preset quality --uncond-interval 0'
    # disables the preset entirely
    a = build_parser().parse_args(
        ["txt2img", "x", "--preset", "fast", "--todo", "0"])
    apply_preset(a)
    assert (a.deepcache, a.todo) == (3, 0)
    a = build_parser().parse_args(
        ["txt2img", "x", "--preset", "quality", "--uncond-interval", "0"])
    apply_preset(a)
    assert (a.deepcache or 0, a.todo, a.uncond_interval) == (0, 0, 0)


def test_cli_parser_pipeline_and_img2img():
    a = build_parser().parse_args(["pipeline", "hello", "--number", "2"])
    assert a.command == "pipeline" and a.number == 2
    b = build_parser().parse_args(["img2img", "x.png", "--scale", "2.5"])
    assert b.command == "img2img" and b.scale == 2.5
    # --preset reaches img2img with the same override rules as txt2img
    from lightdiffusion_tpu.frontends.cli import apply_preset

    c = build_parser().parse_args(["img2img", "x.png", "--preset", "fast"])
    apply_preset(c)
    from lightdiffusion_tpu.presets import PRESETS

    assert (c.deepcache, c.todo, c.uncond_interval) == PRESETS["fast"]
    d = build_parser().parse_args(
        ["img2img", "x.png", "--preset", "fast", "--deepcache", "0"])
    apply_preset(d)
    # explicit deepcache suppresses the preset's other knob
    assert d.deepcache == 0 and not d.uncond_interval


def test_persistence_roundtrip(tmp_path):
    p = tmp_path / "prompt.txt"
    params = P.SessionParams("a cat", "blurry", 768, 512, 8.0)
    P.write_parameters_to_file(params, p)
    loaded = P.load_parameters_from_file(p)
    assert loaded.prompt == "a cat"
    assert loaded.neg == "blurry"
    assert loaded.width == 768 and loaded.height == 512
    assert loaded.cfg == 8.0


def test_persistence_missing_file(tmp_path):
    loaded = P.load_parameters_from_file(tmp_path / "nope.txt")
    assert loaded.width == 512


def test_enhancer_falls_back_without_ollama():
    assert enhance_prompt("a cat") == "a cat"


def test_save_image_numbering(tmp_path, monkeypatch):
    from lightdiffusion_tpu import assets
    from lightdiffusion_tpu.nodes import SaveImage

    monkeypatch.setenv("LDT_OUTPUT", str(tmp_path))
    imgs = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    r1 = SaveImage().save_images(imgs, "T")
    r2 = SaveImage().save_images(imgs[:1], "T")
    names = sorted(p.name for p in tmp_path.glob("T_*.png"))
    assert names == ["T_00001.png", "T_00002.png", "T_00003.png"]
    assert len(r1["ui"]["images"]) == 2 and len(r2["ui"]["images"]) == 1


def test_save_image_path_prefixes(tmp_path, monkeypatch):
    """Prefixes carrying a directory: relative subfolders land under the
    output dir; absolute ones replace it (ref :6531-6567 path split)."""
    from lightdiffusion_tpu.nodes import SaveImage

    monkeypatch.setenv("LDT_OUTPUT", str(tmp_path / "out"))
    imgs = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
    SaveImage().save_images(imgs, "sub/T")
    assert (tmp_path / "out" / "sub" / "T_00001.png").exists()
    SaveImage().save_images(imgs, str(tmp_path / "abs" / "T"))
    assert (tmp_path / "abs" / "T_00001.png").exists()


def test_nodes_api_roundtrip():
    """Node-graph style composition on the tiny pipeline."""
    import jax
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu import nodes as N

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    pipe = SDPipeline(sd, policy=L.FP32)
    clip, vae = pipe.clip, pipe.vae

    (clip,) = N.CLIPSetLastLayer().set_last_layer(clip, -2)
    (pos,) = N.CLIPTextEncode().encode(clip, "a cat")
    (neg,) = N.CLIPTextEncode().encode(clip, "")
    assert "pooled_output" in pos[0][1]
    (latent,) = N.EmptyLatentImage().generate(32, 32)
    (out,) = N.KSampler().sample(
        pipe, 0, 2, 7.0, "euler_ancestral", "karras", pos, neg, latent
    )
    (up,) = N.LatentUpscale().upscale(out, "bislerp", 64, 64)
    assert up["samples"].shape == (1, 8, 8, 4)
    (img,) = N.VAEDecode().decode(vae, up)
    # TINY_VAE has downscale ratio 2 (2 levels), not SD's 8
    assert img.shape == (1, 16, 16, 3)
    (re_lat,) = N.VAEEncode().encode(vae, img)
    assert re_lat["samples"].shape == (1, 8, 8, 4)


def test_generation_controller_headless(monkeypatch):
    """GUI controller without tk: generate with previews + interrupt reset."""
    import jax
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu.frontends.gui import GenerationController

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    ctl = GenerationController()
    ctl.pipe = SDPipeline(sd, policy=L.FP32)
    ctl.current_checkpoint = "x"  # skip prep()
    ctl.interrupt_flag = True  # stale flag must be cleared by generate()

    previews, progress = [], []
    imgs = ctl.generate(
        "a cat", "", 32, 32, 7.0, steps=4, sampler_name="euler_ancestral",
        preview_cb=previews.append, progress_cb=lambda d, t: progress.append((d, t)),
    )
    assert imgs is not None and imgs.shape == (1, 32, 32, 3)
    assert len(previews) >= 1 and previews[0].ndim == 3
    assert progress[-1][0] == progress[-1][1]

    # interrupt mid-run
    def interrupter(img):
        ctl.interrupt_flag = True

    out = ctl.generate(
        "a cat", "", 32, 32, 7.0, steps=8, sampler_name="euler_ancestral",
        preview_cb=interrupter,
    )
    assert out is None


def test_generation_controller_todo_freeu_toggles():
    """generate(todo=/freeu=) flips the pipeline accelerators per run."""
    import jax
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu.frontends.gui import GenerationController

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    ctl = GenerationController()
    ctl.pipe = SDPipeline(sd, policy=L.FP32)
    ctl.current_checkpoint = "x"
    imgs = ctl.generate("a cat", "", 32, 32, 7.0, steps=2,
                        sampler_name="euler_ancestral", todo=True, freeu=True)
    assert imgs is not None and imgs.shape == (1, 32, 32, 3)
    assert ctl.pipe.sd.unet_config.todo_factor == 2
    assert ctl.pipe.sd.unet_config.freeu != ()
    ctl.generate("a cat", "", 32, 32, 7.0, steps=2,
                 sampler_name="euler_ancestral")
    assert ctl.pipe.sd.unet_config.todo_factor == 0
    assert ctl.pipe.sd.unet_config.freeu == ()


def test_generation_controller_guidance_cache_toggle():
    """The Guidance-cache checkbox forwards uncond_interval=2 to the chunked
    sampler; checking DeepCache too composes the levers (dual-cache)."""
    import jax
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu.frontends.gui import GenerationController

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    ctl = GenerationController()
    ctl.pipe = SDPipeline(sd, policy=L.FP32)
    ctl.current_checkpoint = "x"

    seen = []
    orig = ctl.pipe.sample_latent_chunked

    def spy(*a, **kw):
        seen.append((kw.get("deepcache_interval"), kw.get("uncond_interval")))
        return orig(*a, **kw)

    ctl.pipe.sample_latent_chunked = spy
    imgs = ctl.generate("a cat", "", 32, 32, 7.0, steps=4,
                        sampler_name="euler_ancestral", guidance_cache=True)
    assert imgs is not None and seen[-1] == (0, 2)
    # both checked: the levers compose (dual-cache denoiser, pipelines/sd.py)
    ctl.generate("a cat", "", 32, 32, 7.0, steps=4,
                 sampler_name="euler_ancestral", guidance_cache=True,
                 deepcache=True)
    assert seen[-1] == (2, 2)
    # the preset dropdown overrides the toggles with the measured stack
    from lightdiffusion_tpu.presets import PRESETS

    dc, todo, ui = PRESETS["max"]
    imgs = ctl.generate("a cat", "", 32, 32, 7.0, steps=4,
                        sampler_name="euler_ancestral", deepcache=True,
                        preset="max")
    assert imgs is not None and seen[-1] == (dc, ui)
    assert ctl.pipe.sd.unet_config.todo_factor == todo
    # back to no preset/toggles: ToDo resets
    ctl.generate("a cat", "", 32, 32, 7.0, steps=4,
                 sampler_name="euler_ancestral")
    assert seen[-1] == (0, 0)
    assert ctl.pipe.sd.unet_config.todo_factor == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="valid presets"):
        ctl.generate("a cat", "", 32, 32, 7.0, steps=4, preset="warp")


def test_generation_controller_int8_toggle(monkeypatch):
    """The Int8-accelerator checkbox (the ref's Stable-Fast slot, :10184)
    quantizes on prep and un-quantizes by reloading when toggled off."""
    import jax
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.ops.quant import count_quantized
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu.frontends import headless
    from lightdiffusion_tpu.frontends.gui import GenerationController

    def tiny_pipe(**kwargs):
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        sd = StableDiffusion(
            unet_params=U.init_unet_params(k[0], TINY_UNET),
            unet_config=TINY_UNET,
            clip_params=C.init_clip_params(k[1], TINY_CLIP),
            clip_config=TINY_CLIP,
            vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
            model_sampling=make_discrete_sampling("eps"),
        )
        return SDPipeline(sd, policy=L.FP32)

    monkeypatch.setattr(headless, "load_default_pipeline", tiny_pipe)
    ctl = GenerationController()
    pipe = ctl.prep("ck", None, int8=True)
    assert count_quantized(pipe.sd.unet_params)[0] > 0
    assert ctl.prep("ck", None, int8=True) is pipe  # cached
    pipe2 = ctl.prep("ck", None, int8=False)  # toggle off → fresh fp pipe
    assert count_quantized(pipe2.sd.unet_params)[0] == 0


def test_ksampler_advanced_step_windows():
    """Two-phase sampling via step windows equals... runs and stays finite;
    window [0,0] is a no-op."""
    import jax
    import jax.numpy as jnp
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu import nodes as N

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    pipe = SDPipeline(sd, policy=L.FP32)
    (pos,) = N.CLIPTextEncode().encode(pipe.clip, "x")
    (neg,) = N.CLIPTextEncode().encode(pipe.clip, "")
    (latent,) = N.EmptyLatentImage().generate(32, 32)
    adv = N.KSamplerAdvanced()
    (phase1,) = adv.sample(pipe, "enable", 0, 6, 7.0, "euler", "karras",
                           pos, neg, latent, start_at_step=0, end_at_step=3)
    (phase2,) = adv.sample(pipe, "disable", 0, 6, 7.0, "euler", "karras",
                           pos, neg, phase1, start_at_step=3, end_at_step=6)
    assert np.isfinite(np.asarray(phase2["samples"])).all()
    # full single run with the same seed/sampler for comparison
    (full,) = N.KSampler().sample(pipe, 0, 6, 7.0, "euler", "karras",
                                  pos, neg, latent)
    # deterministic euler split at the same sigma grid: phase2 == full except
    # the initial noise-scaling happens once — compare loosely
    a, b = np.asarray(phase2["samples"]), np.asarray(full["samples"])
    assert a.shape == b.shape
    # no-op window returns the input unchanged
    (noop,) = adv.sample(pipe, "disable", 0, 6, 7.0, "euler", "karras",
                         pos, neg, latent, start_at_step=2, end_at_step=2)
    np.testing.assert_array_equal(
        np.asarray(noop["samples"]), np.asarray(latent["samples"])
    )


def test_generation_single_flight():
    """A second generate while one runs is rejected (no GPU-thread races)."""
    import threading
    from lightdiffusion_tpu.frontends.gui import GenerationController

    ctl = GenerationController()
    ctl._run_lock.acquire()  # simulate a run in progress
    try:
        out = ctl.generate("x", "", 32, 32, 7.0)
        assert out is None
    finally:
        ctl._run_lock.release()


def test_warmup_populates_program_cache():
    """runtime.warmup pre-compiles sampling programs into the pipeline's
    program cache (the persistent-XLA-cache warm start, SURVEY §7)."""
    from tests.test_usdu import _tiny_pipe
    from lightdiffusion_tpu.runtime.warmup import warmup

    pipe = _tiny_pipe()
    assert len(pipe._programs) == 0
    buckets = [(32, 32, 2, "euler_ancestral", "karras", 1.0),
               (32, 32, 2, "dpmpp_2m_sde", "karras", 1.0)]
    warmup(pipe, buckets=buckets)
    n = len(pipe._programs)
    assert n >= 2
    warmup(pipe, buckets=buckets)  # idempotent: everything already cached
    assert len(pipe._programs) == n


def test_cli_parser_has_warmup_and_download():
    from lightdiffusion_tpu.frontends.cli import build_parser

    p = build_parser()
    a = p.parse_args(["warmup", "--random-init", "--batch", "2"])
    assert a.command == "warmup" and a.batch == 2
    d = p.parse_args(["download", "--classes", "loras"])
    assert d.command == "download" and d.classes == ["loras"]


def test_cli_download_noop(monkeypatch, capsys):
    """`download` command runs the gated bootstrap; without the hub package
    it is a no-op."""
    import builtins

    from lightdiffusion_tpu.frontends import cli

    real_import = builtins.__import__

    def no_hub(name, *a, **k):
        if name == "huggingface_hub":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_hub)
    cli.main(["download"])


def test_generation_controller_checkpoint_switch(tmp_path, monkeypatch):
    """Selecting a different checkpoint before Generate reloads the pipe
    (code-review r3: pre-writing current_* made prep()'s change detection
    vacuous and served stale weights)."""
    from lightdiffusion_tpu.frontends import gui as G

    calls = []

    class FakePipe:
        def __init__(self, tag):
            self.tag = tag

    def fake_load(checkpoint=None, loras=(), clip_skip=-2, random_init=False):
        calls.append((checkpoint, tuple(loras)))
        return FakePipe(checkpoint)

    monkeypatch.setattr(
        "lightdiffusion_tpu.frontends.headless.load_default_pipeline",
        fake_load,
    )
    ctl = G.GenerationController()
    p1 = ctl.prep("A", "None")
    assert p1.tag == "A"
    # same selection → cached
    assert ctl.prep("A", "None") is p1
    # new selection passed explicitly (as generate(checkpoint=...) does)
    p2 = ctl.prep("B", "None")
    assert p2.tag == "B" and p2 is not p1
    assert [c[0] for c in calls] == ["A", "B"]


def test_cli_mesh_flags():
    """--dp/--tp build a ("dp","tp") Mesh over the first dp*tp devices;
    the 1x1 default means no mesh (single-device programs), and asking for
    more devices than exist is a clean SystemExit, not a jax traceback."""
    import pytest

    from lightdiffusion_tpu.frontends.cli import _mesh_from_args, build_parser

    a = build_parser().parse_args(["txt2img", "x"])
    assert (a.dp, a.tp) == (1, 1)
    assert _mesh_from_args(a) is None

    a = build_parser().parse_args(["serve", "--dp", "4", "--tp", "2"])
    mesh = _mesh_from_args(a)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}

    a = build_parser().parse_args(["txt2img", "x", "--dp", "64"])
    with pytest.raises(SystemExit):
        _mesh_from_args(a)


def test_headless_pipeline_preset(monkeypatch):
    """pipeline(preset=...) applies the measured stack (presets.py): ToDo is
    set on the pipe (config-level, reaches the adaptive base pass too) and
    DeepCache/uncond_interval flow into txt2img. The reference's headless
    entry has no accelerator surface (:10001)."""
    import numpy as np

    from lightdiffusion_tpu.frontends import headless
    from lightdiffusion_tpu.presets import PRESETS

    import types

    class FakePipe:
        def __init__(self):
            self.todo_calls = []
            self.sd = types.SimpleNamespace(
                unet_config=types.SimpleNamespace(
                    todo_factor=0, todo_min_tokens=4096
                )
            )

        def set_todo(self, factor, min_tokens=4096):
            self.todo_calls.append(factor)
            self.sd.unet_config.todo_factor = factor
            self.sd.unet_config.todo_min_tokens = min_tokens

    seen = {}

    def fake_txt2img(pipe, prompt, negative, **kwargs):
        seen.update(kwargs)
        seen["todo_during_run"] = pipe.sd.unet_config.todo_factor
        return np.zeros((1, 8, 8, 3), np.float32)

    monkeypatch.setattr(headless, "txt2img", fake_txt2img)
    pipe = FakePipe()
    headless.pipeline("cat", 64, 64, pipe=pipe, enhance=False, save=False,
                      preset="fast")
    dc, todo, ui = PRESETS["fast"]
    assert seen["todo_during_run"] == todo
    assert seen["deepcache_interval"] == dc
    assert seen["uncond_interval"] == ui
    assert seen["hires_fix"] is True and seen["steps"] == 40
    # the preset's ToDo is RESTORED after the run (ADVICE r3): a caller-
    # supplied pipe must not keep this run's factor
    assert pipe.sd.unet_config.todo_factor == 0
    assert pipe.todo_calls == [todo, 0]

    # no preset -> accelerators off, pipe untouched
    pipe2 = FakePipe()
    seen.clear()
    headless.pipeline("cat", 64, 64, pipe=pipe2, enhance=False, save=False)
    assert pipe2.todo_calls == []
    assert seen["deepcache_interval"] == 0 and seen["uncond_interval"] == 0

    # unknown preset names are a clear client error (ADVICE r3)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="valid presets"):
        headless.pipeline("cat", 64, 64, pipe=FakePipe(), enhance=False,
                          save=False, preset="warp")


def test_txt2img_adaptive_downgrades_stateful_accel(monkeypatch):
    """dpm_adaptive has no fixed-step form, so deepcache/uncond_interval
    cannot apply to it (pipelines/sd.py raises at the program level);
    txt2img instead runs the base pass plain and keeps the full stack on
    the euler_ancestral hires pass — a preset never crashes the reference
    default workload."""
    import jax

    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import (
        make_discrete_sampling,
    )
    from lightdiffusion_tpu.pipelines.sd import SDPipeline, txt2img

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET),
        unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP),
        clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    pipe = SDPipeline(sd, policy=L.FP32)

    calls = []

    def spy(self, latent, positive, negative, **kwargs):
        calls.append((kwargs.get("sampler_name"),
                      kwargs.get("deepcache_interval", 0),
                      kwargs.get("uncond_interval", 0)))
        return latent  # skip the actual solve: wiring is what's under test

    monkeypatch.setattr(SDPipeline, "sample_latent", spy)
    imgs = txt2img(
        pipe, "a cat", "bad", width=64, height=64, steps=4,
        sampler_name="dpm_adaptive", scheduler="karras", hires_fix=True,
        hires_steps=2, deepcache_interval=3, uncond_interval=2,
    )
    assert imgs.shape == (1, 128, 128, 3)
    assert calls[0] == ("dpm_adaptive", 0, 0)  # base: downgraded, not a crash
    assert calls[1] == ("euler_ancestral", 3, 2)  # hires keeps the stack

    # supported samplers keep the stack on BOTH passes
    calls.clear()
    txt2img(
        pipe, "a cat", "bad", width=64, height=64, steps=4,
        sampler_name="euler", hires_fix=True, hires_steps=2,
        deepcache_interval=3, uncond_interval=2,
    )
    assert calls[0] == ("euler", 3, 2)
