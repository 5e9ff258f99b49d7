"""Direct in-scan micro of the SD1.5 64^2 transformer block internals
(CFG batch 8, C=320, heads 8, ctx 77x768, bf16): where do the ~20 ms of
non-attention transformer time per UNet step go?
"""
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.ops.attention import attention_heads_last

B, S, C, HEADS = 8, 4096, 320, 8
CTX = 77


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


def main():
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)
    pol = L.BF16
    x = jax.random.normal(k, (B, S, C), jnp.bfloat16)
    ctx = jax.random.normal(k, (B, CTX, 768), jnp.bfloat16)

    def lin_p(ci, co):
        return {"weight": jax.random.normal(k, (ci, co), jnp.bfloat16) * 0.02,
                "bias": jnp.zeros((co,), jnp.bfloat16)}

    def ln_p(c):
        return {"weight": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    blk = {
        "ln1": ln_p(C), "ln2": ln_p(C), "ln3": ln_p(C),
        "attn1": {"to_q": lin_p(C, C), "to_k": lin_p(C, C),
                  "to_v": lin_p(C, C), "to_out": lin_p(C, C)},
        "attn2": {"to_q": lin_p(C, C), "to_k": lin_p(768, C),
                  "to_v": lin_p(768, C), "to_out": lin_p(C, C)},
        "ff_in": lin_p(C, 8 * C), "ff_out": lin_p(4 * C, C),
    }

    def row(label, fn, *consts, flops=None):
        t = scan_time(fn, x, *consts)
        extra = f" {flops/t/1e12:6.1f} TF/s" if flops else ""
        print(f"{label:28s} {t*1e3:7.3f} ms{extra}", flush=True)
        return t

    full = row("full block", lambda x, c: U.transformer_block_apply(
        blk, x, c, HEADS, pol), ctx)

    row("3x layer_norm", lambda x: L.layer_norm(
        blk["ln3"], L.layer_norm(blk["ln2"], L.layer_norm(
            blk["ln1"], x, policy=pol), policy=pol), policy=pol))
    qkv_fl = 2 * B * S * C * C * 4
    row("self qkv+out linears", lambda x: L.linear(
        blk["attn1"]["to_out"], L.linear(blk["attn1"]["to_q"], x, pol)
        + L.linear(blk["attn1"]["to_k"], x, pol)
        + L.linear(blk["attn1"]["to_v"], x, pol), pol), flops=qkv_fl)
    ff_fl = 2 * B * S * (C * 8 * C + 4 * C * C)
    row("GEGLU ff", lambda x: L.linear(
        blk["ff_out"], L.geglu(blk["ff_in"], x, pol), pol), flops=ff_fl)
    att_fl = 4 * B * HEADS * S * S * (C // HEADS)
    row("self attention core", lambda x: attention_heads_last(
        x, x, x, num_heads=HEADS), flops=att_fl)
    row("cross attention core", lambda x, c: attention_heads_last(
        x, jnp.tile(c[:, :, :C], (1, 1, 1)), jnp.tile(c[:, :, :C], (1, 1, 1)),
        num_heads=HEADS), ctx)
    row("residual add x3", lambda x: x + x + x)


if __name__ == "__main__":
    main()
