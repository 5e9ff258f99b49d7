"""XLA vs Pallas conv at ESRGAN's REAL shapes (fp32, the esrgan_apply
default): RRDB dense-growth convs (cin 64..192 -> cout 32/64) at input
resolution + the 2x/4x upconv tail. 345 body convs per pass make this the
whole ESRGAN cost; the current gate excludes cout=32 — measure whether it
should.
"""
import sys
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.ops.conv_pallas import _conv3x3_fwd, _xla_conv


def scan_time(fn, x, *consts, n1=6, n2=24):
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

    t1, t2 = timed(make(n1)), timed(make(n2))
    return max((t2 - t1) / (n2 - n1), 1e-9)


SHAPES = [
    (1, 512, 512, 64, 32),
    (1, 512, 512, 96, 32),
    (1, 512, 512, 128, 32),
    (1, 512, 512, 160, 32),
    (1, 512, 512, 192, 64),
    (1, 1024, 1024, 64, 64),   # conv_up1 output res (x4 model, 512 in)
    (1, 2048, 2048, 64, 64),   # conv_up2 / conv_hr res
]

PAD_SHAPES = [  # padded-channel candidates for the dense-growth convs
    (1, 512, 512, 192, 32),    # conv4 padded 160->192
    (1, 512, 512, 256, 32),    # conv4 padded 160->256
    (1, 512, 512, 256, 64),    # conv5 padded 192->256
    (1, 512, 512, 128, 64),    # cout padding probe: 128->64 vs 128->32
    (1, 512, 512, 96, 64),     # conv2 with cout padded
    (1, 512, 512, 160, 64),    # conv4 with cout padded only
    (1, 512, 512, 64, 64),     # conv1 with cout padded
    (1, 512, 512, 128, 128),   # fully aligned dense-block regime
]

PACK_SHAPES = [  # tile-packed RDB candidates (all lane-aligned)
    (1, 512, 512, 256, 128),   # conv4/conv5 packed: 2 tiles in -> 1 out
    (1, 512, 512, 384, 128),   # headroom probe
    (1, 512, 512, 128, 256),
]


def main():
    print("devices:", jax.devices(), flush=True)
    dt = jnp.float32
    k = jax.random.PRNGKey(0)
    shapes = (PACK_SHAPES if "--pack" in sys.argv
              else PAD_SHAPES if "--pad" in sys.argv else SHAPES)
    for (B, H, W, cin, cout) in shapes:
        x = jax.random.normal(k, (B, H, W, cin), dt)
        w = jax.random.normal(k, (3, 3, cin, cout), dt) * 0.05
        b = jax.random.normal(k, (cout,), dt)
        fl = 2.0 * B * H * W * 9 * cin * cout
        t_x = scan_time(_xla_conv, x, w, b)
        try:
            t_p = scan_time(
                lambda x, w, b: _conv3x3_fwd(x, w, b, interpret=False),
                x, w, b)
            print(f"{(B,H,W,cin,cout)} XLA {t_x*1e3:6.2f} ms "
                  f"{fl/t_x/1e12:5.1f} TF/s | pallas {t_p*1e3:6.2f} ms "
                  f"{fl/t_p/1e12:5.1f} TF/s ({t_x/t_p:.2f}x)", flush=True)
        except Exception as e:
            print(f"{(B,H,W,cin,cout)} XLA {t_x*1e3:6.2f} ms | pallas "
                  f"FAILED {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
