"""ESRGAN / RealESRGAN RRDBNet super-resolution, TPU-native NHWC.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``RRDBNet`` arch reconstructed from state dict  :7025-7234
    (``new_to_old_arch`` remap :7154, ``get_scale`` :7209,
     ``get_num_blocks`` :7219)
  - ``ResidualDenseBlock_5C`` dense concat convs    :6905 (out·0.2+x :6902)
  - ``upconv_block`` nearest + conv                 :6995
  - ``load_state_dict`` → model (params_ema unwrap) :7251
  - ``UpscaleModelLoader``                          :7260

Supports both key layouts: new (conv_first/body.N.rdb1/conv_up1...) and old
(model.0/model.1.sub.N.RDB1.conv1.0/...).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import re

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as L


@dataclasses.dataclass(frozen=True)
class ESRGANConfig:
    num_blocks: int
    num_feat: int
    scale: int
    in_ch: int = 3
    out_ch: int = 3


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


# ---------------------------------------------------- lane-packed convs -----
# The RRDB dense-growth convs (cin 64..192 -> cout 32/64) are the whole
# ESRGAN cost (23 blocks x 3 RDBs x 5 convs at image resolution) and their
# channel counts are hostile to the TPU's 128-wide lanes: measured fp32 at
# 512^2 on v5e (scratch/esrgan_conv_shapes.py), XLA runs 160->32 at
# 3.6 TF/s and 192->64 at 9.4 TF/s, while a fully lane-aligned 128->128
# conv runs at 59.8 TF/s — faster in wall-time than the unpadded 64->32.
# So: split the logical input into 128-lane tiles (pad the last), pad cout
# up to a lane multiple with zero weights, and sum one aligned conv per
# tile. Zero lanes contribute exact zeros; only fp32 accumulation order
# differs from the direct conv.
_LANE = 128

# None = auto (TPU only); tests override to exercise the packed path on CPU.
_FORCE_PACK = None


def set_packed_rdb(mode):
    """None (auto: pack on TPU), True, or False."""
    global _FORCE_PACK
    _FORCE_PACK = mode


def _use_pack(x):
    if _FORCE_PACK is not None:
        return _FORCE_PACK
    return (
        jax.default_backend() not in ("cpu", "gpu")
        and x.shape[1] * x.shape[2] >= 512 * 512
    )


def _packed_conv(p, xcat, policy):
    w = p["weight"].astype(policy.compute_dtype)
    cin, cout = w.shape[2], w.shape[3]
    cout_pad = -(-cout // _LANE) * _LANE
    acc = None
    for off in range(0, cin, _LANE):
        u = min(_LANE, cin - off)
        t = xcat[..., off : off + u]
        wk = w[:, :, off : off + u, :]
        if u < _LANE:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, _LANE - u)))
            wk = jnp.pad(wk, ((0, 0), (0, 0), (0, _LANE - u), (0, 0)))
        wk = jnp.pad(wk, ((0, 0), (0, 0), (0, 0), (0, cout_pad - cout)))
        y = L.conv2d({"weight": wk}, t, policy=policy)
        acc = y if acc is None else acc + y
    bias = jnp.pad(p["bias"], (0, cout_pad - cout)).astype(acc.dtype)
    return (acc + bias)[..., :cout]


def _rdb5c(p, x, policy):
    """Dense block: 5 convs, each sees concat of all previous (ref :6905)."""
    conv = _packed_conv if _use_pack(x) else (
        lambda p_, xc, policy: L.conv2d(p_, xc, policy=policy))
    x1 = _lrelu(conv(p["conv1"], x, policy))
    x2 = _lrelu(conv(p["conv2"], jnp.concatenate([x, x1], -1), policy))
    x3 = _lrelu(conv(p["conv3"], jnp.concatenate([x, x1, x2], -1), policy))
    x4 = _lrelu(conv(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1), policy))
    x5 = conv(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1), policy)
    return x5 * 0.2 + x


def _rrdb(p, x, policy):
    out = _rdb5c(p["rdb1"], x, policy)
    out = _rdb5c(p["rdb2"], out, policy)
    out = _rdb5c(p["rdb3"], out, policy)
    return out * 0.2 + x  # ref :6902


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def esrgan_apply(params, x, cfg: ESRGANConfig, policy: L.Policy = L.FP32):
    """(B,H,W,3) in [0,1] → (B, scale·H, scale·W, 3)."""
    x = x.astype(policy.compute_dtype)
    fea = L.conv2d(params["conv_first"], x, policy=policy)
    trunk = fea
    for blk in params["body"]:
        trunk = _rrdb(blk, trunk, policy)
    fea = fea + L.conv2d(params["conv_body"], trunk, policy=policy)
    for up in params["ups"]:
        fea = jnp.repeat(jnp.repeat(fea, 2, axis=1), 2, axis=2)
        fea = _lrelu(L.conv2d(up, fea, policy=policy))
    fea = _lrelu(L.conv2d(params["conv_hr"], fea, policy=policy))
    out = L.conv2d(params["conv_last"], fea, policy=policy)
    return out.astype(jnp.float32)


# ----------------------------------------------------------- conversion -----
_OLD_MAP = [
    (re.compile(r"^model\.0\.(weight|bias)$"), r"conv_first.\1"),
    (re.compile(r"^model\.1\.sub\.(\d+)\.RDB(\d)\.conv(\d)\.0\.(weight|bias)$"),
     r"body.\1.rdb\2.conv\3.\4"),
    (re.compile(r"^model\.1\.sub\.\d+\.(weight|bias)$"), None),  # trunk conv (index = n_blocks)
    (re.compile(r"^model\.3\.(weight|bias)$"), r"conv_up1.\1"),
    (re.compile(r"^model\.6\.(weight|bias)$"), r"conv_up2.\1"),
    (re.compile(r"^model\.8\.(weight|bias)$"), r"conv_hr.\1"),
    (re.compile(r"^model\.10\.(weight|bias)$"), r"conv_last.\1"),
]


def normalize_esrgan_keys(sd: dict) -> dict:
    """old-arch → new-arch key names (ref new_to_old_arch inverse, :7154)."""
    if "params_ema" in sd:
        sd = sd["params_ema"]
    elif "params" in sd:
        sd = sd["params"]
    if "conv_first.weight" in sd:
        return dict(sd)
    out = {}
    trunk_re = re.compile(r"^model\.1\.sub\.(\d+)\.(weight|bias)$")
    for k, v in sd.items():
        m = trunk_re.match(k)
        if m:
            out[f"conv_body.{m.group(2)}"] = v
            continue
        for pat, repl in _OLD_MAP:
            if repl is None:
                continue
            if pat.match(k):
                out[pat.sub(repl, k)] = v
                break
        else:
            out[k] = v
    return out


def detect_esrgan_config(sd: dict) -> ESRGANConfig:
    """Shape-sniff blocks/features/scale (ref :7209-7234)."""
    num_feat = sd["conv_first.weight"].shape[0]
    in_ch = sd["conv_first.weight"].shape[1]
    blocks = set()
    n_up = 0
    for k in sd:
        m = re.match(r"^body\.(\d+)\.", k)
        if m:
            blocks.add(int(m.group(1)))
        if re.match(r"^conv_up(\d)\.weight$", k):
            n_up += 1
    return ESRGANConfig(
        num_blocks=max(blocks) + 1,
        num_feat=num_feat,
        scale=2**n_up if n_up else 1,
        in_ch=in_ch,
        out_ch=sd["conv_last.weight"].shape[0],
    )


def _conv_p(sd, name, dtype):
    w = np.asarray(sd[name + ".weight"], np.float32)
    return {
        "weight": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
        "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32), dtype),
    }


def convert_esrgan(sd: dict, dtype=jnp.float32):
    """→ (params, config). Handles params_ema wrap + old-arch keys."""
    sd = normalize_esrgan_keys(sd)
    cfg = detect_esrgan_config(sd)
    body = []
    for i in range(cfg.num_blocks):
        body.append(
            {
                f"rdb{j}": {
                    f"conv{c}": _conv_p(sd, f"body.{i}.rdb{j}.conv{c}", dtype)
                    for c in range(1, 6)
                }
                for j in range(1, 4)
            }
        )
    ups = []
    for u in range(1, int(math.log2(cfg.scale)) + 1):
        ups.append(_conv_p(sd, f"conv_up{u}", dtype))
    return {
        "conv_first": _conv_p(sd, "conv_first", dtype),
        "body": tuple(body),
        "conv_body": _conv_p(sd, "conv_body", dtype),
        "ups": tuple(ups),
        "conv_hr": _conv_p(sd, "conv_hr", dtype),
        "conv_last": _conv_p(sd, "conv_last", dtype),
    }, cfg


def load_esrgan(path, dtype=jnp.float32):
    from ..loader.checkpoint import load_torch_file

    return convert_esrgan(load_torch_file(path), dtype)


def init_esrgan_params(key, cfg: ESRGANConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 8 + cfg.num_blocks * 15))
    nf, gc = cfg.num_feat, 32

    def rdb():
        return {
            "conv1": L.init_conv2d(next(ks), 3, 3, nf, gc, dtype=dtype),
            "conv2": L.init_conv2d(next(ks), 3, 3, nf + gc, gc, dtype=dtype),
            "conv3": L.init_conv2d(next(ks), 3, 3, nf + 2 * gc, gc, dtype=dtype),
            "conv4": L.init_conv2d(next(ks), 3, 3, nf + 3 * gc, gc, dtype=dtype),
            "conv5": L.init_conv2d(next(ks), 3, 3, nf + 4 * gc, nf, dtype=dtype),
        }

    return {
        "conv_first": L.init_conv2d(next(ks), 3, 3, cfg.in_ch, nf, dtype=dtype),
        "body": tuple(
            {"rdb1": rdb(), "rdb2": rdb(), "rdb3": rdb()}
            for _ in range(cfg.num_blocks)
        ),
        "conv_body": L.init_conv2d(next(ks), 3, 3, nf, nf, dtype=dtype),
        "ups": tuple(
            L.init_conv2d(next(ks), 3, 3, nf, nf, dtype=dtype)
            for _ in range(int(math.log2(cfg.scale)))
        ),
        "conv_hr": L.init_conv2d(next(ks), 3, 3, nf, nf, dtype=dtype),
        "conv_last": L.init_conv2d(next(ks), 3, 3, nf, cfg.out_ch, dtype=dtype),
    }
