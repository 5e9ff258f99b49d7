"""In-scan op attribution for the SD1.5 512² UNet step at CFG batch 8.

Post-GN question: the whole eval measures 65.6 ms / 81 TF/s — where do the
missing 59% of the MXU go? Rows mirror models/unet.py build_plan for
SD15_UNET (heads=8, ch 320/640/1280/1280, transformer levels 0/1/2,
num_res_blocks 2: input 2 res+1 tf per attn level, output 3, mid 1).
"""
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.ops.attention import attention, attention_heads_last

print("devices:", jax.devices(), flush=True)
policy = L.BF16
B = 8
N1, N2 = 10, 50


def scan_time(fn, x, *consts):
    def make(n):
        @jax.jit
        def many(x, consts):
            def body(c, _):
                y = fn(c, *consts)
                flat = y.reshape(-1)
                if flat.size < x.size:
                    flat = jnp.tile(flat, -(-x.size // flat.size))
                return flat[: x.size].reshape(x.shape).astype(x.dtype), ()
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out
        return many

    def timed(many, reps=3):
        r = many(x, consts)
        float(np.asarray(r.ravel()[0]))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            r = many(x, consts)
            float(np.asarray(r.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(make(N1)), timed(make(N2))
    return max((t2 - t1) / (N2 - N1), 1e-9)


rows = []


def row(label, count, secs, flops=None):
    tot = secs * count * 1e3
    msg = f"{label:46s} {secs*1e6:9.1f} us x{count:3d} = {tot:7.2f} ms"
    if flops:
        msg += f"  {flops/secs/1e12:6.1f} TF/s"
    print(msg, flush=True)
    rows.append((label, tot))


k0 = jax.random.PRNGKey(0)

# ---- self-attention through attention_heads_last (incl transposes) ----
# level: (s, c, n_self_blocks)
for s, c, nblk, lbl in ((4096, 320, 5, "64^2"), (1024, 640, 5, "32^2"),
                        (256, 1280, 6, "16^2")):
    x = jax.random.normal(k0, (B, s, c), jnp.bfloat16)
    fl = 4.0 * B * 8 * s * s * (c // 8)
    for force in ("flash", "xla"):
        try:
            t = scan_time(
                lambda q: attention_heads_last(q, q, q, num_heads=8,
                                               force=force), x)
            row(f"{lbl} self h_last {force} (s={s},d={c//8})", nblk, t, fl)
        except Exception as e:
            print(f"{lbl} {force}: FAILED {str(e)[:70]}", flush=True)

# bare attention without the outer transposes, flash, same shapes
for s, c, nblk, lbl in ((4096, 320, 5, "64^2"), (1024, 640, 5, "32^2"),
                        (256, 1280, 6, "16^2")):
    d = c // 8
    q = jax.random.normal(k0, (B, 8, s, d), jnp.bfloat16)
    fl = 4.0 * B * 8 * s * s * d
    for force in ("flash", "xla"):
        try:
            t = scan_time(lambda q: attention(q, q, q, force=force), q)
            row(f"{lbl} self BARE {force} (d={d})", nblk, t, fl)
        except Exception as e:
            print(f"{lbl} bare {force}: FAILED {str(e)[:70]}", flush=True)

# transpose pair alone (split + merge) at 64^2
x = jax.random.normal(k0, (B, 4096, 320), jnp.bfloat16)
t = scan_time(
    lambda x: x.reshape(B, 4096, 8, 40).transpose(0, 2, 1, 3)
    .transpose(0, 2, 1, 3).reshape(B, 4096, 320), x)
row("64^2 head split+merge transposes", 5 * 4, t)

# ---- cross attention kv=77 ----
ctx = jax.random.normal(k0, (B, 77, 320), jnp.bfloat16)
x = jax.random.normal(k0, (B, 4096, 320), jnp.bfloat16)
t = scan_time(lambda q, kv: attention_heads_last(q, kv, kv, num_heads=8), x, ctx)
row("64^2 cross (kv77)", 5, t, 4.0 * B * 8 * 4096 * 77 * 40)

# ---- matmuls: qkvo projections + GEGLU ffs ----
for m, kk, n_, count, label in (
    (B * 4096, 320, 320, 5 * 4 + 5 * 2, "64^2 qkv/proj 320"),
    (B * 4096, 320, 2560, 5, "64^2 ff_in (geglu)"),
    (B * 4096, 1280, 320, 5, "64^2 ff_out"),
    (B * 1024, 640, 640, 5 * 4 + 5 * 2, "32^2 qkv/proj 640"),
    (B * 1024, 640, 5120, 5, "32^2 ff_in"),
    (B * 1024, 2560, 640, 5, "32^2 ff_out"),
    (B * 256, 1280, 1280, 6 * 4 + 6 * 2, "16^2 qkv/proj 1280"),
    (B * 256, 1280, 10240, 6, "16^2 ff_in"),
    (B * 256, 5120, 1280, 6, "16^2 ff_out"),
):
    a = jax.random.normal(k0, (m, kk), jnp.bfloat16)
    w = jax.random.normal(k0, (kk, n_), jnp.bfloat16) * 0.02
    t = scan_time(lambda a, w: a @ w, a, w)
    row(label, count, t, 2.0 * m * kk * n_)

# ---- res convs ----
for hw, c_in, c_out, count, label in (
    (64, 320, 320, 12, "64^2 conv 320"),
    (32, 640, 640, 12, "32^2 conv 640"),
    (16, 1280, 1280, 12, "16^2 conv 1280"),
    (8, 1280, 1280, 14, "8^2 conv 1280 (lvl3+mid)"),
):
    x = jax.random.normal(k0, (B, hw, hw, c_in), jnp.bfloat16)
    wp = {"weight": jax.random.normal(k0, (3, 3, c_in, c_out), jnp.bfloat16) * 0.02,
          "bias": jnp.zeros((c_out,), jnp.bfloat16)}
    t = scan_time(lambda x, wp: L.conv2d(wp, x, policy=policy), x, wp)
    row(label, count, t, 2.0 * B * hw * hw * 9 * c_in * c_out)

# ---- norms ----
for s, c, count, label in ((4096, 320, 5 * 3 + 14, "64^2 LN+GN"),
                           (1024, 640, 5 * 3 + 14, "32^2 LN+GN"),
                           (256, 1280, 6 * 3 + 16, "16^2 LN+GN")):
    x = jax.random.normal(k0, (B, s, c), jnp.bfloat16)
    gp = {"weight": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    t = scan_time(lambda x: L.layer_norm(gp, x, policy=policy), x)
    row(label, count, t)

print("---- sorted totals (ms, pick ONE of flash/xla per row family) ----",
      flush=True)
for lbl, tot in sorted(rows, key=lambda r: -r[1]):
    print(f"{lbl:46s} {tot:7.2f}", flush=True)
