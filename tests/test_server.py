"""HTTP serving frontend (frontends/server.py): batching + endpoints.

Beyond the reference, whose only headless surface is the single-request
Discord ``pipeline`` (/root/reference/LightDiffusion.py:10001).
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from lightdiffusion_tpu.frontends.server import GenerationServer, make_server


def _make_tiny_sd():
    from lightdiffusion_tpu.diffusion.parameterization import (
        make_discrete_sampling,
    )
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import clip as C
    from lightdiffusion_tpu.models import unet as U
    from lightdiffusion_tpu.models import vae as V

    ucfg = U.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 0), context_dim=64, num_heads=2,
        attn_force="xla",
    )
    ccfg = C.ClipConfig(hidden_size=64, num_layers=2, num_heads=2,
                        intermediate_size=128)
    vcfg = V.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    return StableDiffusion(
        unet_params=U.init_unet_params(k[0], ucfg), unet_config=ucfg,
        clip_params=C.init_clip_params(k[1], ccfg), clip_config=ccfg,
        vae_params=V.init_vae_params(k[2], vcfg), vae_config=vcfg,
        model_sampling=make_discrete_sampling("eps"),
    )


@pytest.fixture(scope="module")
def pipe():
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.pipelines.sd import SDPipeline

    return SDPipeline(_make_tiny_sd(), policy=L.FP32, clip_skip=-2)


def test_generation_server_batches_compatible_requests(pipe):
    gen = GenerationServer(pipe, max_batch=4, max_wait_ms=300.0)
    try:
        results = {}

        def fire(i, prompt, cfg):
            results[i] = gen.submit({
                "prompt": prompt, "width": 64, "height": 64, "steps": 2,
                "seed": i, "cfg": cfg,
            })

        threads = [
            threading.Thread(target=fire, args=(i, p, c))
            for i, (p, c) in enumerate(
                [("a cat", 7.0), ("a dog", 5.0), ("a bird", 9.0)]
            )
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 3
        for img in results.values():
            assert img.shape == (64, 64, 3)
            assert np.isfinite(img).all()
        # different prompts/seeds/cfg must produce different images
        assert np.abs(results[0] - results[1]).max() > 1e-6
        st = gen.stats()
        assert st["requests"] == 3
        # with a 300ms window the three concurrent requests share batches
        assert st["batches"] < 3
        assert st["batched_requests"] >= 2
    finally:
        gen.shutdown()


def test_generation_server_groups_by_compile_key(pipe):
    gen = GenerationServer(pipe, max_batch=4, max_wait_ms=200.0)
    try:
        out = {}

        def fire(name, w):
            out[name] = gen.submit(
                {"prompt": "x", "width": w, "height": 64, "steps": 2}
            )

        t1 = threading.Thread(target=fire, args=("a", 64))
        t2 = threading.Thread(target=fire, args=("b", 96))
        t1.start(); t2.start()
        t1.join(timeout=300); t2.join(timeout=300)
        assert out["a"].shape == (64, 64, 3)
        assert out["b"].shape == (64, 96, 3)
        assert gen.stats()["batches"] == 2  # incompatible → separate programs
    finally:
        gen.shutdown()


def test_generation_server_pipelined_stream(pipe):
    """A stream of requests flows through the dispatch→drain pipeline with
    every response delivered to the right waiter (images differ by seed)."""
    gen = GenerationServer(pipe, max_batch=2, max_wait_ms=5.0, max_in_flight=2)
    try:
        out = {}

        def fire(i):
            out[i] = gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                                 "steps": 2, "seed": i})

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(out) == 6
        for i, img in out.items():
            assert img.shape == (64, 64, 3) and np.isfinite(img).all()
        # distinct seeds ⇒ distinct images (right response to right waiter)
        assert np.abs(out[0] - out[5]).max() > 1e-6
        st = gen.stats()
        assert st["requests"] == 6
        assert st["batches"] >= 3  # max_batch=2
    finally:
        gen.shutdown()


def test_batched_request_reproduces_solo_image(pipe):
    """A request's image is identical whether it runs alone or co-batched
    with arbitrary neighbours (per-sample seed keys, noise.keys_for) — for
    an ANCESTRAL sampler, whose per-step noise comes from the sampler key."""
    import jax.numpy as jnp

    pos = pipe.encode_text("a cat")
    neg = pipe.encode_text("")
    kw = dict(steps=3, cfg=7.0, sampler_name="euler_ancestral",
              scheduler="karras")
    solo = pipe.sample_latent(
        pipe.empty_latent(64, 64, 1), pos, neg, seed=[7], **kw
    )
    pos3 = jnp.concatenate([pos[0]] * 3, axis=0)
    neg3 = jnp.concatenate([neg[0]] * 3, axis=0)
    batched = pipe.sample_latent(
        pipe.empty_latent(64, 64, 3), pos3, neg3, seed=[3, 7, 11], **kw
    )
    np.testing.assert_array_equal(np.asarray(solo[0]), np.asarray(batched[1]))
    other = pipe.sample_latent(
        pipe.empty_latent(64, 64, 3), pos3, neg3, seed=[7, 99, 100], **kw
    )
    np.testing.assert_array_equal(np.asarray(batched[1]), np.asarray(other[0]))
    # distinct seeds still give distinct images
    assert np.abs(np.asarray(batched[0] - batched[1])).max() > 1e-6


def test_gather_backlog_prevents_starvation(pipe):
    """A deferred (incompatible) request becomes the NEXT batch's head."""
    gen = GenerationServer(pipe, max_batch=2, max_wait_ms=400.0)
    try:
        order = []
        lock = threading.Lock()

        def fire(name, w):
            img = gen.submit({"prompt": name, "width": w, "height": 64,
                              "steps": 2})
            with lock:
                order.append((name, img.shape))

        threads = [
            threading.Thread(target=fire, args=(f"maj{i}", 64))
            for i in range(2)
        ] + [threading.Thread(target=fire, args=("minority", 96))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(order) == 3
        shapes = dict(order)
        assert shapes["minority"] == (64, 96, 3)
        st = gen.stats()
        assert st["requests"] == 3 and st["batches"] == 2
    finally:
        gen.shutdown()


def test_shutdown_fails_queued_requests_immediately(pipe):
    gen = GenerationServer(pipe, max_batch=1, max_wait_ms=1.0)
    errors = []
    # occupy the worker, then shut down with a request still queued
    slow = threading.Thread(
        target=lambda: gen.submit({"prompt": "x", "width": 64, "height": 64,
                                   "steps": 2})
    )
    slow.start()

    def queued():
        try:
            gen.submit({"prompt": "y", "width": 64, "height": 64, "steps": 2})
        except Exception as e:
            errors.append(e)

    q = threading.Thread(target=queued)
    q.start()
    import time as _time

    _time.sleep(0.2)
    gen.shutdown()
    q.join(timeout=30)
    slow.join(timeout=300)
    # the queued request either completed before shutdown or failed fast
    assert not q.is_alive()


def test_server_batches_sdxl_requests():
    """The batch assembly keeps pooled halves as tuples, so ADM-conditioned
    (SDXL) models serve batched requests (regression: pooled was dropped and
    every SDXL request 400'd)."""
    import jax
    import jax.numpy as jnp

    from lightdiffusion_tpu.diffusion.parameterization import (
        make_discrete_sampling,
    )
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import clip as C
    from lightdiffusion_tpu.models import unet as U
    from lightdiffusion_tpu.models import vae as V
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from tests.test_pipeline import TINY_VAE

    k = jax.random.split(jax.random.PRNGKey(0), 4)
    cfg_l = C.ClipConfig(hidden_size=24, num_layers=2, num_heads=2,
                         intermediate_size=48)
    cfg_g = C.ClipConfig(hidden_size=40, num_layers=2, num_heads=2,
                         intermediate_size=80, hidden_act="gelu",
                         pad_with_end=False)
    xl_cfg = U.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(0, 1), middle_depth=1, context_dim=64,
        num_heads=-1, num_head_channels=16, use_linear_projections=True,
        adm_in_channels=40 + 6 * 256, attn_force="xla",
    )
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], xl_cfg), unet_config=xl_cfg,
        clip_params=C.init_clip_params(k[1], cfg_l), clip_config=cfg_l,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
        clip2_params=C.init_clip_params(k[3], cfg_g), clip2_config=cfg_g,
    )
    gen = GenerationServer(SDPipeline(sd, policy=L.FP32), max_batch=2,
                           max_wait_ms=300.0)
    try:
        out = {}

        def fire(i):
            out[i] = gen.submit({"prompt": f"a cat {i}", "width": 64,
                                 "height": 64, "steps": 2, "seed": i})

        t1 = threading.Thread(target=fire, args=(0,))
        t2 = threading.Thread(target=fire, args=(1,))
        t1.start(); t2.start()
        t1.join(timeout=300); t2.join(timeout=300)
        assert len(out) == 2
        for img in out.values():
            assert img.shape == (64, 64, 3) and np.isfinite(img).all()
        assert gen.stats()["batched_requests"] >= 2
    finally:
        gen.shutdown()


def test_server_controlnet_requests(pipe):
    """serve --controlnet flow: base64 control_image requests batch with
    per-sample hints/strengths; control-less servers reject them."""
    import base64
    import io

    import jax
    from PIL import Image

    from lightdiffusion_tpu.models import controlnet as CN

    cfg = pipe.sd.unet_config
    cn = CN.init_controlnet_params(jax.random.PRNGKey(1), cfg)
    gen = GenerationServer(pipe, max_batch=2, max_wait_ms=300.0,
                           controlnet=(cn, cfg))
    buf = io.BytesIO()
    Image.fromarray(
        (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    try:
        out = {}

        def fire(i, strength):
            out[i] = gen.submit({
                "prompt": "a cat", "width": 64, "height": 64, "steps": 2,
                "seed": i, "control_image": b64,
                "control_strength": strength,
            })

        t1 = threading.Thread(target=fire, args=(0, 1.0))
        t2 = threading.Thread(target=fire, args=(1, 0.5))
        t1.start(); t2.start()
        t1.join(timeout=300); t2.join(timeout=300)
        assert len(out) == 2
        for img in out.values():
            assert img.shape == (64, 64, 3) and np.isfinite(img).all()
        assert gen.stats()["batched_requests"] >= 2
    finally:
        gen.shutdown()

    nogen = GenerationServer(pipe, max_wait_ms=5.0)  # no controlnet loaded
    try:
        with pytest.raises(ValueError, match="no controlnet"):
            nogen.submit({"prompt": "x", "width": 64, "height": 64,
                          "steps": 2, "control_image": b64})
    finally:
        nogen.shutdown()


def test_http_non_dict_body_is_400(pipe):
    httpd = make_server(pipe, port=0, max_wait_ms=5.0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/txt2img", data=b"5"
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.generation.shutdown()
        httpd.shutdown()
        httpd.server_close()


def test_generation_server_validates(pipe):
    gen = GenerationServer(pipe)
    try:
        with pytest.raises(ValueError):
            gen.submit({"prompt": "x", "width": 17})
        with pytest.raises(ValueError):
            gen.submit({"prompt": "x", "bogus_field": 1})
        with pytest.raises(ValueError):
            gen.submit({"prompt": "x", "cfg_cutoff": 1.5})
    finally:
        gen.shutdown()


def test_server_cfg_cutoff_requests(pipe):
    """Per-request cfg_cutoff is part of the compile key and flows through."""
    gen = GenerationServer(pipe, max_wait_ms=5.0)
    try:
        img = gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                          "steps": 4, "cfg_cutoff": 0.5})
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
    finally:
        gen.shutdown()


def test_server_deepcache_requests(pipe):
    """Per-request DeepCache joins the compile key and flows through; bad
    combinations are rejected at submit (400), not at batch time."""
    gen = GenerationServer(pipe, max_wait_ms=5.0)
    try:
        img = gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                          "steps": 4, "deepcache": 2})
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
        # deepcache + hires: both passes run the cached program
        img = gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                          "steps": 4, "deepcache": 2, "hires_fix": True,
                          "hires_steps": 2})
        assert img.shape == (128, 128, 3)
        assert np.isfinite(img).all()
        with pytest.raises(ValueError):
            gen.submit({"prompt": "x", "deepcache": 1})
        with pytest.raises(ValueError):
            gen.submit({"prompt": "x", "deepcache": 2,
                        "sampler": "dpm_adaptive"})
    finally:
        gen.shutdown()


def test_server_uncond_interval_requests(pipe):
    """Per-request guidance-delta caching joins the compile key and flows
    through (base + hires); invalid combos are rejected at submit."""
    gen = GenerationServer(pipe, max_wait_ms=5.0)
    try:
        img = gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                          "steps": 4, "uncond_interval": 2})
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
        img = gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                          "steps": 4, "uncond_interval": 2,
                          "hires_fix": True, "hires_steps": 2})
        assert img.shape == (128, 128, 3)
        assert np.isfinite(img).all()
        # deepcache composes with uncond_interval (dual-cache denoiser)
        img = gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                          "steps": 4, "uncond_interval": 2, "deepcache": 2})
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
        with pytest.raises(ValueError):
            gen.submit({"prompt": "x", "uncond_interval": 1})
        with pytest.raises(ValueError):
            gen.submit({"prompt": "x", "uncond_interval": 2,
                        "sampler": "dpm_adaptive"})
    finally:
        gen.shutdown()


def test_server_preset_field(pipe):
    """`preset` resolves through presets.PRESETS with the CLI's override
    rules (VERDICT r3 #5): the normalized request carries the preset's
    deepcache/uncond_interval/todo; explicit fields win (including zeros,
    and either of deepcache/uncond_interval suppresses the preset's other
    knob); same-preset requests co-batch; unknown names are client errors."""
    from lightdiffusion_tpu.presets import PRESETS

    gen = GenerationServer(pipe, max_batch=4, max_wait_ms=300.0)
    try:
        # normalization matches the CLI preset's accelerator config
        p = gen._normalize({"prompt": "x", "preset": "max"})
        dc, todo, ui = PRESETS["max"]
        assert (p["deepcache"], p["todo"], p["uncond_interval"]) == \
            (dc, todo, ui)
        # explicit deepcache suppresses BOTH of the preset's dc/ui knobs
        p = gen._normalize({"prompt": "x", "preset": "max", "deepcache": 0})
        assert (p["deepcache"], p["uncond_interval"]) == (0, 0)
        assert p["todo"] == todo  # todo still comes from the preset
        # explicit todo=0 overrides the preset's todo
        p = gen._normalize({"prompt": "x", "preset": "fast", "todo": 0})
        assert p["todo"] == 0
        assert p["deepcache"] == PRESETS["fast"][0]
        with pytest.raises(ValueError, match="valid presets"):
            gen._normalize({"prompt": "x", "preset": "warp"})
        # preset-derived cached accelerators survive a non-fixed-step BASE
        # sampler (the worker downgrades the base pass only; the hires pass
        # keeps the stack, like txt2img/headless) — while an EXPLICIT
        # deepcache with the same sampler is still a client error
        p = gen._normalize({"prompt": "x", "preset": "max",
                            "sampler": "dpm_adaptive"})
        assert (p["deepcache"], p["uncond_interval"]) == (dc, ui)
        assert p["todo"] == todo  # config-level ToDo still applies
        with pytest.raises(ValueError, match="fixed-step"):
            gen._normalize({"prompt": "x", "deepcache": 4,
                            "sampler": "dpm_adaptive"})
        # ...and such a request actually generates (base pass downgraded)
        img = gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                          "steps": 3, "sampler": "dpm_adaptive",
                          "preset": "max", "hires_fix": True,
                          "hires_steps": 2})
        assert img.shape == (128, 128, 3) and np.isfinite(img).all()

        # two preset-"max" requests co-batch (same group key) and generate
        results = {}

        def fire(i):
            results[i] = gen.submit({
                "prompt": "a cat", "width": 64, "height": 64, "steps": 4,
                "seed": i, "preset": "max",
            })

        threads = [threading.Thread(target=fire, args=(i,)) for i in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(results[i].shape == (64, 64, 3) for i in (0, 1))
        assert all(np.isfinite(results[i]).all() for i in (0, 1))
        assert gen.stats()["batched_requests"] >= 2
        # the worker applied the preset's config-level ToDo for the group
        assert pipe.sd.unet_config.todo_factor == todo
        # a preset-less request resets it
        gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                    "steps": 2})
        assert pipe.sd.unet_config.todo_factor == 0
    finally:
        gen.shutdown()


def test_server_cfg_one_uses_uncond_free_program(pipe):
    """An all-cfg-1.0 group dispatches the guidance-free cond-only program
    (~1.5x e2e); mixed-cfg groups keep the per-sample array path."""
    gen = GenerationServer(pipe, max_wait_ms=5.0)
    try:
        img = gen.submit({"prompt": "a cat", "width": 64, "height": 64,
                          "steps": 2, "cfg": 1.0})
        assert img.shape == (64, 64, 3) and np.isfinite(img).all()
        assert any(
            getattr(k[1], "uncond_free", False)
            for k in pipe._programs if k[0] == "sample"
        )
    finally:
        gen.shutdown()


def test_server_img2img_preset_field(pipe):
    """/img2img accepts `preset` too, resolved with the same rules."""
    import base64
    import io

    from PIL import Image

    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)).save(
        buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    gen = GenerationServer(pipe, max_wait_ms=5.0)
    try:
        from lightdiffusion_tpu.presets import PRESETS

        params = {"init_image": b64, "prompt": "x", "preset": "quality"}
        p = gen._normalize_img2img(params)
        dc, todo, ui = PRESETS["quality"]
        assert (p["deepcache"], p["todo"], p["uncond_interval"]) == \
            (dc, todo, ui)
        with pytest.raises(ValueError, match="valid presets"):
            gen._normalize_img2img(dict(params, preset="nope"))
    finally:
        gen.shutdown()


def test_http_endpoints(pipe):
    httpd = make_server(pipe, port=0, max_wait_ms=5.0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
            assert health["ok"] is True
            # operational snapshot: device, model shape, queue/cache state
            assert health["model"]["model_channels"] == 32
            assert "device" in health and "queue_depth" in health
            assert health["max_batch"] >= 1

        body = json.dumps({
            "prompt": "a cat", "width": 64, "height": 64, "steps": 2,
        }).encode()
        req = urllib.request.Request(
            base + "/txt2img", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            png = r.read()
            assert r.headers["Content-Type"] == "image/png"
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        body = json.dumps({"prompt": "a cat", "width": 64, "height": 64,
                           "steps": 2, "format": "json"}).encode()
        req = urllib.request.Request(base + "/txt2img", data=body)
        with urllib.request.urlopen(req, timeout=300) as r:
            meta = json.loads(r.read())
        assert meta["shape"] == [64, 64, 3]

        # bad request → 400
        req = urllib.request.Request(
            base + "/txt2img", data=json.dumps({"steps": 999}).encode()
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            st = json.loads(r.read())
        assert st["requests"] >= 2
    finally:
        httpd.generation.shutdown()
        httpd.shutdown()
        httpd.server_close()


def test_server_hires_fix_batched(pipe):
    """hires_fix serves the reference's DEFAULT headless output (always
    hires-fixed, ref :10060-10078) with cross-request batching (VERDICT r2
    item 5): base pass + bislerp x2 + partial-denoise second pass."""
    gen = GenerationServer(pipe, max_batch=4, max_wait_ms=300.0)
    try:
        results = {}

        def fire(i):
            results[i] = gen.submit({
                "prompt": f"cat {i}", "width": 64, "height": 64, "steps": 2,
                "seed": i, "hires_fix": True, "hires_steps": 2,
                "hires_denoise": 0.5, "hires_cfg": 8.0,
            })

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 3
        for img in results.values():
            assert img.shape == (128, 128, 3)  # x2 upscale
            assert np.isfinite(img).all()
        assert np.abs(results[0] - results[1]).max() > 1e-6
        st = gen.stats()
        assert st["batches"] < 3  # the three requests shared batches
        # hires and non-hires requests are different compile keys
        plain = gen.submit({"prompt": "x", "width": 64, "height": 64,
                            "steps": 2})
        assert plain.shape == (64, 64, 3)
    finally:
        gen.shutdown()


def test_server_img2img_usdu_endpoint(pipe):
    """POST /img2img runs UltimateSDUpscale per request E2E (VERDICT r2
    item 5)."""
    import base64
    import io

    from PIL import Image

    rng = np.random.RandomState(0)
    src = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    httpd = make_server(pipe, port=0, max_wait_ms=5.0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps({
            "init_image": b64, "prompt": "a cat", "upscale_by": 2.0,
            "steps": 2, "denoise": 0.4, "tile_width": 64, "tile_height": 64,
            "mask_blur": 4, "padding": 8, "seam_fix_mode": "None",
        }).encode()
        req = urllib.request.Request(base + "/img2img", data=body)
        with urllib.request.urlopen(req, timeout=600) as r:
            png = r.read()
            assert r.headers["Content-Type"] == "image/png"
        out = np.asarray(Image.open(io.BytesIO(png)))
        assert out.shape == (128, 128, 3)

        # missing init_image → 400
        req = urllib.request.Request(
            base + "/img2img", data=json.dumps({"prompt": "x"}).encode()
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.generation.shutdown()
        httpd.shutdown()
        httpd.server_close()


def test_server_adetailer_flag(pipe):
    """adetailer=true runs the two detail passes on the worker when the
    server holds a detector stack; without one it is a client error."""

    def fake_detector(image, conf=0.5):
        return (np.array([[8.0, 8.0, 40.0, 40.0]]), np.array([0.9]),
                ["face"], None)

    gen = GenerationServer(
        pipe, max_wait_ms=5.0, detectors=(None, fake_detector, None),
        adetailer_kwargs=dict(steps=2, guide_size=32, max_size=48,
                              noise_mask_feather=2),
    )
    try:
        plain = gen.submit({"prompt": "x", "width": 64, "height": 64,
                            "steps": 2, "seed": 3})
        detailed = gen.submit({"prompt": "x", "width": 64, "height": 64,
                               "steps": 2, "seed": 3, "adetailer": True})
        assert detailed.shape == (64, 64, 3)
        assert np.isfinite(detailed).all()
        assert np.abs(detailed - plain).max() > 1e-5  # the pass ran
    finally:
        gen.shutdown()

    gen2 = GenerationServer(pipe, max_wait_ms=5.0)
    try:
        with pytest.raises(ValueError, match="no detailer detectors"):
            gen2.submit({"prompt": "x", "width": 64, "height": 64,
                         "steps": 2, "adetailer": True})
    finally:
        gen2.shutdown()


def test_server_hires_size_cap_and_bad_image(pipe):
    """Code-review r3 fixes: hires_fix cannot escape the [64,2048] envelope
    via the 2x second pass, and malformed/oversized images are client
    faults (ValueError -> 400), not 500s."""
    import base64

    gen = GenerationServer(pipe, max_wait_ms=5.0)
    try:
        with pytest.raises(ValueError, match="hires_fix doubles"):
            gen.submit({"prompt": "x", "width": 2048, "height": 2048,
                        "steps": 2, "hires_fix": True})
        bad = base64.b64encode(b"not an image at all").decode()
        with pytest.raises(ValueError, match="not a decodable image"):
            gen.submit({"init_image": bad, "prompt": "x"}, kind="img2img")
    finally:
        gen.shutdown()


def test_server_batched_adetailer_per_request_seed(pipe):
    """Co-batched adetailer requests each use their OWN seed: a request's
    detailed image matches its solo run (code-review r3 finding 1)."""

    def fake_detector(image, conf=0.5):
        return (np.array([[8.0, 8.0, 40.0, 40.0]]), np.array([0.9]),
                ["face"], None)

    kw = dict(detectors=(None, fake_detector, None),
              adetailer_kwargs=dict(steps=2, guide_size=32, max_size=48,
                                    noise_mask_feather=2))
    gen = GenerationServer(pipe, max_batch=4, max_wait_ms=300.0, **kw)
    try:
        results = {}

        def fire(i):
            results[i] = gen.submit({"prompt": "x", "width": 64,
                                     "height": 64, "steps": 2, "seed": i,
                                     "adetailer": True})

        threads = [threading.Thread(target=fire, args=(i,)) for i in (1, 2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert gen.stats()["batches"] == 1  # they really co-batched
    finally:
        gen.shutdown()

    solo = GenerationServer(pipe, max_wait_ms=5.0, **kw)
    try:
        for i in (1, 2):
            ref = solo.submit({"prompt": "x", "width": 64, "height": 64,
                               "steps": 2, "seed": i, "adetailer": True})
            np.testing.assert_allclose(results[i], ref, atol=1e-5)
    finally:
        solo.shutdown()


def test_group_key_collapses_unused_hires_knobs(pipe):
    """Requests differing only in hires params co-batch when hires_fix is
    off (the knobs don't shape the compiled program then)."""
    from lightdiffusion_tpu.frontends.server import GenerationServer, _Request

    gen = GenerationServer(pipe)
    try:
        base = {"prompt": "x", "width": 64, "height": 64, "steps": 4}
        a = _Request(gen._normalize(dict(base, hires_steps=10)))
        b = _Request(gen._normalize(dict(base, hires_steps=20,
                                         hires_denoise=0.7)))
        assert a.group_key() == b.group_key()
        # ... but they split once hires_fix actually uses them
        c = _Request(gen._normalize(dict(base, hires_fix=True,
                                         hires_steps=10)))
        d = _Request(gen._normalize(dict(base, hires_fix=True,
                                         hires_steps=20)))
        assert c.group_key() != d.group_key()
    finally:
        gen.shutdown()


def test_img2img_upscaled_canvas_cap(pipe):
    """The cap applies to the UPSCALED canvas: a legal init image times a
    legal upscale_by can still be rejected (16k^2 float canvases + ~1000
    sequential tile programs would monopolize the worker)."""
    import base64
    import io

    from PIL import Image

    gen = GenerationServer(pipe)
    try:
        src = np.zeros((2304, 2304, 3), np.uint8)  # < 4096^2 pixels: legal
        buf = io.BytesIO()
        Image.fromarray(src).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        with pytest.raises(ValueError, match="upscaled canvas"):
            gen._normalize_img2img({"init_image": b64, "upscale_by": 2.0})
        # at x1 the same init is fine
        p = gen._normalize_img2img({"init_image": b64, "upscale_by": 1.0})
        assert p["init_image"].shape == (1, 2304, 2304, 3)
    finally:
        gen.shutdown()


def test_fixed_step_sampler_queries_make_stepper():
    """The server's fixed-step sampler gate must agree with the
    authoritative make_stepper support set (no parallel hardcoded list)."""
    import jax

    from lightdiffusion_tpu.diffusion.samplers import make_stepper
    from lightdiffusion_tpu.frontends.server import _fixed_step_sampler

    for name in ("euler", "ddim", "euler_ancestral", "dpmpp_2m",
                 "dpmpp_2m_sde", "dpm_adaptive", "heun", "dpmpp_2s_ancestral"):
        expected = make_stepper(
            name, lambda x, s: x, jax.random.PRNGKey(0)) is not None
        assert _fixed_step_sampler(name) == expected, name
    assert _fixed_step_sampler("euler")
    assert not _fixed_step_sampler("dpm_adaptive")


def test_server_over_mesh_pipeline_matches_single_device(pipe):
    """The serving frontend is parallelism-agnostic: a GenerationServer over
    an SPMD SDPipeline (dp4 x tp2 mesh, CLI `serve --dp 4 --tp 2`) produces
    the same images as the single-device server, for both a dp-divisible
    co-batched group (4 requests) and a non-divisible one (3 requests,
    which falls back to replicated batch placement). The reference has no
    serving or distributed layer at all (SURVEY §2.14/§5.8)."""
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.parallel import mesh as M
    from lightdiffusion_tpu.pipelines.sd import SDPipeline

    mesh_pipe = SDPipeline(
        _make_tiny_sd(), policy=L.FP32, clip_skip=-2,
        mesh=M.make_mesh(n_dp=4, n_tp=2),
    )

    def run_group(gen, n):
        results = {}

        def fire(i):
            results[i] = gen.submit({
                "prompt": "a cat", "width": 64, "height": 64, "steps": 2,
                "seed": i,
            })

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == n
        return results

    solo = GenerationServer(pipe, max_batch=4, max_wait_ms=300.0)
    try:
        ref4 = run_group(solo, 4)
        ref3 = run_group(solo, 3)
    finally:
        solo.shutdown()

    meshed = GenerationServer(mesh_pipe, max_batch=4, max_wait_ms=300.0)
    try:
        out4 = run_group(meshed, 4)
        out3 = run_group(meshed, 3)
        st = meshed.stats()
        assert st["batches"] < st["requests"]  # co-batching still happens
    finally:
        meshed.shutdown()

    for i in range(4):
        np.testing.assert_allclose(out4[i], ref4[i], atol=1e-4, rtol=1e-4)
    for i in range(3):
        np.testing.assert_allclose(out3[i], ref3[i], atol=1e-4, rtol=1e-4)
