"""Regenerate tests/fixtures/toy_trained_unet.safetensors (VERDICT r4 #5).

Trains the tiny test UNet (tests/test_pipeline.TINY_UNET topology) on a
smooth low-dimensional synthetic latent distribution (Gaussian blobs with
random center/width/per-channel amplitude) until its denoising trajectories
are structured. With a TRAINED score model, different sigma schedules (AYS-10
vs a 20-step baseline) converge to nearly the same sample from the same seed
— which is exactly the property schedule-swap SSIM gates need and random
weights cannot provide (every schedule change decorrelates pure-noise
trajectories; NOTES_ROUND4 "AYS rows print drift as information").

Run on the default backend — the TPU chip when available (measured: CPU-XLA
runs this step at ~4 s, hours for 4000 steps; the chip runs it in minutes):
    PYTHONPATH=/root/repo:$PYTHONPATH python tests/fixtures/make_toy_checkpoint.py

The checkpoint is committed so tests/bench never retrain; this script is the
provenance + regeneration path. Seeds are fixed; backend numerics vary, but
the artifact is a committed fixture, not a reproducible-bitwise build.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from lightdiffusion_tpu import training as T  # noqa: E402
from lightdiffusion_tpu.diffusion.parameterization import (  # noqa: E402
    make_discrete_sampling,
)
from lightdiffusion_tpu.models import unet as U  # noqa: E402
from lightdiffusion_tpu.ops import layers as L  # noqa: E402

# MUST match tests/test_pipeline.TINY_UNET (the fixture loads into it)
TOY_UNET = U.UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 0), context_dim=64, num_heads=2, attn_force="xla",
)
HW = 16  # latent side (width 32 pixels through the 2-level toy VAE)
STEPS = 4000
BATCH = 64
OUT = Path(__file__).parent / "toy_trained_unet.safetensors"


def sample_blobs(key, n):
    """(n, HW, HW, 4) latents: one Gaussian blob, low-dim smooth manifold."""
    kc, ks, ka = jax.random.split(key, 3)
    cx_cy = jax.random.uniform(kc, (n, 2), minval=4.0, maxval=HW - 4.0)
    width = jax.random.uniform(ks, (n, 1, 1, 1), minval=2.0, maxval=4.0)
    amp = jax.random.uniform(ka, (n, 1, 1, 4), minval=-1.5, maxval=1.5)
    yy, xx = jnp.mgrid[0:HW, 0:HW]
    d2 = (
        (xx[None] - cx_cy[:, 0, None, None]) ** 2
        + (yy[None] - cx_cy[:, 1, None, None]) ** 2
    )
    return jnp.exp(-d2[..., None] / (2.0 * width**2)) * amp


def main():
    t0 = time.perf_counter()
    params = U.init_unet_params(jax.random.PRNGKey(0), TOY_UNET,
                                dtype=jnp.float32)
    ms = make_discrete_sampling("eps")
    opt = optax.adam(1e-3)
    trainer = T.make_trainer(opt, ms, TOY_UNET, policy=L.FP32,
                             ema_decay=0.999)
    state = T.init_train_state(params, opt, ema=True)
    ctx = jnp.zeros((BATCH, 77, TOY_UNET.context_dim), jnp.float32)

    # one jitted step + a Python loop: the scanned-epoch variant compiles
    # pathologically slowly on the CPU backend, and per-dispatch overhead
    # is irrelevant at this scale
    @jax.jit
    def step(state, key):
        kd, kt = jax.random.split(key)
        x0 = sample_blobs(kd, BATCH)
        return trainer(state, x0, ctx, kt)

    losses = []
    for i in range(STEPS):
        state, loss = step(state, jax.random.PRNGKey(100 + i))
        losses.append(loss)
        if (i + 1) % 200 == 0:
            recent = float(jnp.stack(losses[-50:]).mean())
            print(f"step {i+1:5d}  loss {recent:.4f}  "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    losses = jnp.stack(losses[-10:])

    # save the RAW trained params, fp32, tree-order keyed. (Measured: the
    # EMA tree lands at loss ~1.05 while the params reach ~0.008 — in this
    # tiny overfit regime the optimum is sharp enough that a ~450-step
    # parameter average sits far off the manifold, so the usual
    # sampling-quality EMA heuristic is exactly wrong here.)
    #
    # Download hardening: over the axon relay, device→host reads of
    # freshly-written buffers are RACY (np.asarray returned stale values
    # for ~27/208 leaves right after training — the two bad fixture builds
    # evaluated at exactly fresh-init loss). Checksum every leaf on-device
    # first, verify the host copies against it, and re-download on
    # mismatch; finally reload the written file and re-evaluate the loss
    # in-process so a bad artifact can never be committed silently.
    from safetensors.numpy import save_file

    from safetensors.numpy import load_file

    leaves = jax.tree_util.tree_leaves(state["params"])
    # position-WEIGHTED per-leaf device checksums (scalar readbacks sync
    # correctly on the relay; plain |sum| is permutation-blind across
    # same-shaped leaves and let a bad artifact through twice)
    wrng = np.random.default_rng(7)
    Ws = [wrng.standard_normal(v.shape).astype(np.float32) for v in leaves]
    wdev = [float(jnp.sum(v * jnp.asarray(W)))
            for v, W in zip(leaves, Ws)]
    # Snapshot each download as IMMUTABLE BYTES the instant it lands.
    # np.array(..., copy=True) host copies verified clean and then the
    # written file still had ~27 leaves of stale content (every attempt,
    # deterministically) — ndarray-held buffers get clobbered by later
    # relay traffic, while `tobytes()` snapshots taken at download time
    # survive. Verify each snapshot against its device checksum
    # immediately, then write from the snapshots and byte-verify the file.
    for attempt in range(10):
        snap = []
        bad = []
        for i, v in enumerate(leaves):
            h = np.asarray(v, np.float32)
            b = h.tobytes()  # immutable snapshot, taken NOW
            a = np.frombuffer(b, np.float32).reshape(h.shape)
            if abs(float((a * Ws[i]).sum()) - wdev[i]) \
                    > 1e-3 * max(1.0, abs(wdev[i])):
                bad.append(i)
            snap.append((b, h.shape))
        if bad:
            print(f"  download mismatch on {len(bad)} leaves "
                  f"(attempt {attempt + 1}) — retrying", flush=True)
            time.sleep(1.0)
            continue
        arrs = [np.frombuffer(b, np.float32).reshape(s).copy()
                for b, s in snap]
        save_file({f"p{i:04d}": a for i, a in enumerate(arrs)}, str(OUT))
        flat = load_file(str(OUT))
        bad = [i for i, (b, s) in enumerate(snap)
               if not np.array_equal(
                   flat[f"p{i:04d}"], np.frombuffer(b, np.float32).reshape(s))]
        if not bad:
            break
        print(f"  file byte mismatch on {len(bad)} leaves "
              f"(attempt {attempt + 1}) — retrying", flush=True)
    else:
        raise RuntimeError("device->file transfer never converged")
    nparam = sum(v.size for v in leaves)
    print(f"saved {OUT.name}: {nparam/1e6:.2f}M params, "
          f"{OUT.stat().st_size/1e6:.1f} MB, "
          f"final loss {float(losses.mean()):.4f}; weighted checksums + "
          f"file bytes verified", flush=True)


def load_toy_params():
    """Restore the committed fixture into a TOY_UNET-structured pytree."""
    from safetensors.numpy import load_file

    flat = load_file(str(OUT))
    template = U.init_unet_params(jax.random.PRNGKey(0), TOY_UNET,
                                  dtype=jnp.float32)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    assert len(flat) == len(leaves), (len(flat), len(leaves))
    new = [jnp.asarray(flat[f"p{i:04d}"]) for i in range(len(leaves))]
    for old, n in zip(leaves, new):
        assert old.shape == n.shape, (old.shape, n.shape)
    return jax.tree_util.tree_unflatten(treedef, new)


if __name__ == "__main__":
    main()
