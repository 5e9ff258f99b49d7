"""In-scan op micros at SDXL shapes (amortizes the ~1.2ms relay dispatch).

Each op runs N times chained inside one lax.scan under a single jit call, so
per-iteration time is the true in-program cost. Counts below multiply out to
a per-CFG-step attribution for SDXL 1024² (b = CFG batch = 2).

Per-step op counts (from models/unet.py build_plan, SDXL_UNET):
  64² transformer blocks: 10   (in 2×2, out 3×2)
  32² transformer blocks: 60   (in 2×10, mid 10, out 3×10)
  res blocks: 64²:2+? ... printed per-row below with counts.
"""
import functools
import sys
import time

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.ops.attention import attention

print("devices:", jax.devices(), flush=True)
policy = L.BF16
N1, N2 = 40, 200


def scan_time(fn, x, *consts):
    """Seconds per fn application: marginal rate between scan lengths N1 and
    N2 inside single jit calls — cancels the ~25-28ms fixed relay round-trip
    (measured in scratch/scan_calib.py) exactly."""
    def make(n):
        @jax.jit
        def many(x, consts):
            def body(c, _):
                y = fn(c, *consts)
                flat = y.reshape(-1)
                if flat.size < x.size:
                    flat = jnp.tile(flat, -(-x.size // flat.size))
                c2 = (flat[: x.size].reshape(x.shape)).astype(x.dtype)
                return c2, ()
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out
        return many

    def timed(many, reps=3):
        r = many(x, consts)
        float(np.asarray(r.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = many(x, consts)
        float(np.asarray(r.ravel()[0]))
        return (time.perf_counter() - t0) / reps

    t1 = timed(make(N1))
    t2 = timed(make(N2))
    return max((t2 - t1) / (N2 - N1), 1e-9)


rows = []


def row(label, count, secs, flops=None):
    tot = secs * count * 1e3
    msg = f"{label:44s} {secs*1e6:9.1f} us x{count:3d} = {tot:7.2f} ms"
    if flops:
        msg += f"  {flops/secs/1e12:6.1f} TF/s"
    print(msg, flush=True)
    rows.append((label, tot))


k0 = jax.random.PRNGKey(0)

# ---- attention (q from carry; k,v constants) ----
for (b, h, s, t_kv, d, count, force, label) in [
    (2, 10, 4096, 4096, 64, 10, "flash", "64^2 self flash"),
    (2, 10, 4096, 4096, 64, 10, "xla", "64^2 self xla"),
    (2, 10, 4096, 77, 64, 10, "xla", "64^2 cross (kv77)"),
    (2, 20, 1024, 1024, 64, 70, "xla", "32^2 self xla"),
    (2, 20, 1024, 1024, 64, 70, "flash", "32^2 self flash"),
    (2, 20, 1024, 77, 64, 70, "xla", "32^2 cross (kv77)"),
    # SD1.5 shapes at 512² for the dispatcher-crossover question (d=80/160)
    (2, 8, 1024, 1024, 80, 1, "xla", "sd15 32^2 self xla d80"),
    (2, 8, 1024, 1024, 80, 1, "flash", "sd15 32^2 self flash d80"),
    (2, 8, 256, 256, 160, 1, "xla", "sd15 16^2 self xla d160"),
]:
    q = jax.random.normal(k0, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(k0, (b, h, t_kv, d), jnp.bfloat16)
    v = jax.random.normal(k0, (b, h, t_kv, d), jnp.bfloat16)
    fl = 4.0 * b * h * s * t_kv * d
    try:
        t = scan_time(lambda q, k, v: attention(q, k, v, force=force), q, k, v)
        row(f"{label}", count, t, fl)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__} {str(e)[:80]}", flush=True)

# ---- matmuls (weights as constants; input from carry) ----
for (m, kk, n_, count, label) in [
    (2 * 4096, 640, 640, 40, "64^2 qkv/proj 640"),      # 10 blocks x (3q+1o)... self+cross: q,k,v,o x2 minus kv77 ≈ 4
    (2 * 4096, 640, 5120, 10, "64^2 ff_in"),
    (2 * 4096, 2560, 640, 10, "64^2 ff_out"),
    (2 * 1024, 1280, 1280, 280, "32^2 qkv/proj 1280"),  # 60 blocks x ~4.7 incl cross q/o
    (2 * 1024, 1280, 10240, 60, "32^2 ff_in"),
    (2 * 1024, 5120, 1280, 60, "32^2 ff_out"),
    (2 * 77, 2048, 1280, 120, "32^2 cross kv-proj"),
]:
    a = jax.random.normal(k0, (m, kk), jnp.bfloat16)
    w = jax.random.normal(k0, (kk, n_), jnp.bfloat16)
    t = scan_time(lambda a, w: a @ w, a, w)
    row(f"{label} {m}x{kk}x{n_}", count, t, 2.0 * m * kk * n_)

# ---- convs ----
for (b, hw, c_in, c_out, count, label) in [
    (2, 128, 320, 320, 11, "128^2 res conv 320"),   # lvl0: in 2x2 + out 3x2 + conv_in/out-ish
    (2, 64, 640, 640, 11, "64^2 res conv 640"),
    (2, 32, 1280, 1280, 17, "32^2 res conv 1280"),  # lvl2 in/out/mid x2 each
]:
    x = jax.random.normal(k0, (b, hw, hw, c_in), jnp.bfloat16)
    wp = {"weight": jax.random.normal(k0, (3, 3, c_in, c_out), jnp.bfloat16) * 0.02,
          "bias": jnp.zeros((c_out,), jnp.bfloat16)}
    t = scan_time(lambda x, wp: L.conv2d(wp, x, policy=policy), x, wp)
    row(f"{label}", count, t, 2.0 * b * hw * hw * 9 * c_in * c_out)

# ---- norms (VPU/HBM) ----
for (b, hw, c, count, label) in [
    (2, 128, 320, 22, "128^2 GN"),
    (2, 64, 640, 30, "64^2 GN+LN"),
    (2, 32, 1280, 250, "32^2 GN+LN"),
]:
    x = jax.random.normal(k0, (b, hw, hw, c), jnp.bfloat16)
    gp = {"weight": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    t = scan_time(lambda x, gp: L.group_norm(gp, x, eps=1e-5, policy=policy), x, gp)
    byts = 2 * b * hw * hw * c * 2
    print(f"{label:44s} {t*1e6:9.1f} us x{count:3d} = {t*count*1e3:7.2f} ms  "
          f"{byts/t/1e9:6.1f} GB/s", flush=True)
    rows.append((label, t * count * 1e3))

print("----", flush=True)
tot = sum(t for _, t in rows if "xla" not in _ or "self xla" not in _)
for lbl, t in sorted(rows, key=lambda r: -r[1]):
    print(f"{lbl:44s} {t:7.2f} ms", flush=True)
