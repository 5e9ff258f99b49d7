"""A compact torch UNet with exact LDM module naming, used as an independent
numerical reference for the JAX UNet + weight converter. Written from the
published LDM/SD architecture (GroupNorm-SiLU-conv ResBlocks, spatial
transformers with GEGLU FF, skip-concat U topology) — NOT imported from the
reference repo. Only used in tests, on CPU, at toy sizes."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(timesteps, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float32) / half
    )
    args = timesteps[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class ResBlock(nn.Module):
    def __init__(self, ch_in, ch_out, emb_dim, groups=32):
        super().__init__()
        self.in_layers = nn.Sequential(
            nn.GroupNorm(groups, ch_in), nn.SiLU(), nn.Conv2d(ch_in, ch_out, 3, padding=1)
        )
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb_dim, ch_out))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(groups, ch_out), nn.SiLU(), nn.Identity(), nn.Conv2d(ch_out, ch_out, 3, padding=1)
        )
        self.skip_connection = (
            nn.Conv2d(ch_in, ch_out, 1) if ch_in != ch_out else nn.Identity()
        )

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        h = self.out_layers(h)
        return self.skip_connection(x) + h


class CrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head**-0.5
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim))

    def forward(self, x, context=None):
        context = x if context is None else context
        b, s, _ = x.shape
        t = context.shape[1]
        h = self.heads
        q = self.to_q(x).view(b, s, h, -1).transpose(1, 2)
        k = self.to_k(context).view(b, t, h, -1).transpose(1, 2)
        v = self.to_v(context).view(b, t, h, -1).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) * self.scale, dim=-1)
        out = (a @ v).transpose(1, 2).reshape(b, s, -1)
        return self.to_out(out)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads):
        super().__init__()
        dim_head = dim // heads
        self.attn1 = CrossAttention(dim, dim, heads, dim_head)
        self.attn2 = CrossAttention(dim, context_dim, heads, dim_head)
        self.ff = nn.Module()
        self.ff.net = nn.Sequential(GEGLU(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim))
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff.net(self.norm3(x)) + x
        return x


class SpatialTransformer(nn.Module):
    def __init__(self, ch, context_dim, heads, depth=1, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, context_dim, heads) for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x)
        x = self.proj_in(x)
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + residual


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.op = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class MiniLDMUNet(nn.Module):
    """LDM-structured UNet at toy size, state-dict compatible with the SD
    'model.diffusion_model.' key layout (minus the prefix)."""

    def __init__(
        self,
        in_ch=4,
        out_ch=4,
        model_ch=32,
        channel_mult=(1, 2),
        num_res=(1, 1),
        depths=(1, 0),
        context_dim=64,
        heads=2,
        groups=32,
    ):
        super().__init__()
        emb = model_ch * 4
        self.model_ch = model_ch
        self.time_embed = nn.Sequential(
            nn.Linear(model_ch, emb), nn.SiLU(), nn.Linear(emb, emb)
        )
        self.input_blocks = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(in_ch, model_ch, 3, padding=1))]
        )
        ch = model_ch
        skips = [ch]
        for level, mult in enumerate(channel_mult):
            oc = model_ch * mult
            for _ in range(num_res[level]):
                mods = [ResBlock(ch, oc, emb, groups)]
                if depths[level] > 0:
                    mods.append(SpatialTransformer(oc, context_dim, heads, depths[level], groups))
                self.input_blocks.append(nn.Sequential(*mods))
                ch = oc
                skips.append(ch)
            if level != len(channel_mult) - 1:
                self.input_blocks.append(nn.Sequential(Downsample(ch)))
                skips.append(ch)
        self.middle_block = nn.Sequential(
            ResBlock(ch, ch, emb, groups),
            SpatialTransformer(ch, context_dim, heads, 1, groups),
            ResBlock(ch, ch, emb, groups),
        )
        self.output_blocks = nn.ModuleList()
        for level, mult in reversed(list(enumerate(channel_mult))):
            oc = model_ch * mult
            for i in range(num_res[level] + 1):
                sc = skips.pop()
                mods = [ResBlock(ch + sc, oc, emb, groups)]
                if depths[level] > 0:
                    mods.append(SpatialTransformer(oc, context_dim, heads, depths[level], groups))
                if level != 0 and i == num_res[level]:
                    mods.append(Upsample(oc))
                self.output_blocks.append(nn.Sequential(*mods))
                ch = oc
        self.out = nn.Sequential(
            nn.GroupNorm(groups, model_ch), nn.SiLU(), nn.Conv2d(model_ch, out_ch, 3, padding=1)
        )

    def forward(self, x, timesteps, context):
        emb = self.time_embed(timestep_embedding(timesteps, self.model_ch))
        h = x
        hs = []
        for block in self.input_blocks:
            for mod in block:
                if isinstance(mod, ResBlock):
                    h = mod(h, emb)
                elif isinstance(mod, SpatialTransformer):
                    h = mod(h, context)
                else:
                    h = mod(h)
            hs.append(h)
        for mod in self.middle_block:
            if isinstance(mod, ResBlock):
                h = mod(h, emb)
            else:
                h = mod(h, context)
        for block in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            for mod in block:
                if isinstance(mod, ResBlock):
                    h = mod(h, emb)
                elif isinstance(mod, SpatialTransformer):
                    h = mod(h, context)
                else:
                    h = mod(h)
        return self.out(h)


# ----------------------------------------------------------------- VAE ------
class VAEResnet(nn.Module):
    def __init__(self, cin, cout, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class VAEAttn(nn.Module):
    def __init__(self, c, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        n = self.norm(x)
        q = self.q(n).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(n).reshape(b, c, h * w)
        v = self.v(n).reshape(b, c, h * w).permute(0, 2, 1)
        a = torch.softmax(q @ k * (c ** -0.5), dim=-1)
        o = (a @ v).permute(0, 2, 1).reshape(b, c, h, w)
        return x + self.proj_out(o)


class VAEDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class VAEUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class MiniAutoencoderKL(nn.Module):
    """LDM-layout AutoencoderKL at toy size (state-dict key compatible)."""

    def __init__(self, ch=32, ch_mult=(1, 2), num_res=1, z=4, groups=32):
        super().__init__()
        levels = len(ch_mult)

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, ch, 3, padding=1)
        enc.down = nn.ModuleList()
        cin = ch
        for lv, mult in enumerate(ch_mult):
            cout = ch * mult
            m = nn.Module()
            m.block = nn.ModuleList()
            for _ in range(num_res):
                m.block.append(VAEResnet(cin, cout, groups))
                cin = cout
            if lv != levels - 1:
                m.downsample = VAEDown(cin)
            enc.down.append(m)
        enc.mid = nn.Module()
        enc.mid.block_1 = VAEResnet(cin, cin, groups)
        enc.mid.attn_1 = VAEAttn(cin, groups)
        enc.mid.block_2 = VAEResnet(cin, cin, groups)
        enc.norm_out = nn.GroupNorm(groups, cin, eps=1e-6)
        enc.conv_out = nn.Conv2d(cin, 2 * z, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * z, 2 * z, 1)

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(z, cin, 3, padding=1)
        dec.mid = nn.Module()
        dec.mid.block_1 = VAEResnet(cin, cin, groups)
        dec.mid.attn_1 = VAEAttn(cin, groups)
        dec.mid.block_2 = VAEResnet(cin, cin, groups)
        dec.up = nn.ModuleList([nn.Module() for _ in range(levels)])
        c = cin
        for lv in reversed(range(levels)):
            cout = ch * ch_mult[lv]
            m = dec.up[lv]
            m.block = nn.ModuleList()
            for _ in range(num_res + 1):
                m.block.append(VAEResnet(c, cout, groups))
                c = cout
            if lv != 0:
                m.upsample = VAEUp(c)
        dec.norm_out = nn.GroupNorm(groups, ch, eps=1e-6)
        dec.conv_out = nn.Conv2d(ch, 3, 3, padding=1)
        self.decoder = dec
        self.post_quant_conv = nn.Conv2d(z, z, 1)
        self.levels = levels
        self.num_res = num_res

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for lv, m in enumerate(self.encoder.down):
            for b in m.block:
                h = b(h)
            if hasattr(m, "downsample"):
                h = m.downsample(h)
        h = self.encoder.mid.block_2(self.encoder.mid.attn_1(self.encoder.mid.block_1(h)))
        h = self.encoder.conv_out(F.silu(self.encoder.norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid.block_2(self.decoder.mid.attn_1(self.decoder.mid.block_1(h)))
        for lv in reversed(range(self.levels)):
            m = self.decoder.up[lv]
            for b in m.block:
                h = b(h)
            if hasattr(m, "upsample"):
                h = m.upsample(h)
        return self.decoder.conv_out(F.silu(self.decoder.norm_out(h)))


# ---------------------------------------------------------------- TAESD -----
def _taesd_conv(n_in, n_out, **kw):
    return nn.Conv2d(n_in, n_out, 3, padding=1, **kw)


class TaesdClamp(nn.Module):
    def forward(self, x):
        return torch.tanh(x / 3) * 3


class TaesdBlock(nn.Module):
    def __init__(self, n_in, n_out):
        super().__init__()
        self.conv = nn.Sequential(
            _taesd_conv(n_in, n_out), nn.ReLU(),
            _taesd_conv(n_out, n_out), nn.ReLU(), _taesd_conv(n_out, n_out),
        )
        self.skip = (
            nn.Conv2d(n_in, n_out, 1, bias=False) if n_in != n_out else nn.Identity()
        )
        self.fuse = nn.ReLU()

    def forward(self, x):
        return self.fuse(self.conv(x) + self.skip(x))


def taesd_decoder_torch():
    return nn.Sequential(
        TaesdClamp(), _taesd_conv(4, 64), nn.ReLU(),
        TaesdBlock(64, 64), TaesdBlock(64, 64), TaesdBlock(64, 64),
        nn.Upsample(scale_factor=2), _taesd_conv(64, 64, bias=False),
        TaesdBlock(64, 64), TaesdBlock(64, 64), TaesdBlock(64, 64),
        nn.Upsample(scale_factor=2), _taesd_conv(64, 64, bias=False),
        TaesdBlock(64, 64), TaesdBlock(64, 64), TaesdBlock(64, 64),
        nn.Upsample(scale_factor=2), _taesd_conv(64, 64, bias=False),
        TaesdBlock(64, 64), _taesd_conv(64, 3),
    )


def taesd_encoder_torch():
    return nn.Sequential(
        _taesd_conv(3, 64), TaesdBlock(64, 64),
        _taesd_conv(64, 64, stride=2, bias=False),
        TaesdBlock(64, 64), TaesdBlock(64, 64), TaesdBlock(64, 64),
        _taesd_conv(64, 64, stride=2, bias=False),
        TaesdBlock(64, 64), TaesdBlock(64, 64), TaesdBlock(64, 64),
        _taesd_conv(64, 64, stride=2, bias=False),
        TaesdBlock(64, 64), TaesdBlock(64, 64), TaesdBlock(64, 64),
        _taesd_conv(64, 4),
    )


# --------------------------------------------------------------- RRDBNet ----
class RDB5C(nn.Module):
    def __init__(self, nf=32, gc=16):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, gc, 3, padding=1)
        self.conv2 = nn.Conv2d(nf + gc, gc, 3, padding=1)
        self.conv3 = nn.Conv2d(nf + 2 * gc, gc, 3, padding=1)
        self.conv4 = nn.Conv2d(nf + 3 * gc, gc, 3, padding=1)
        self.conv5 = nn.Conv2d(nf + 4 * gc, nf, 3, padding=1)
        self.act = nn.LeakyReLU(0.2)

    def forward(self, x):
        x1 = self.act(self.conv1(x))
        x2 = self.act(self.conv2(torch.cat([x, x1], 1)))
        x3 = self.act(self.conv3(torch.cat([x, x1, x2], 1)))
        x4 = self.act(self.conv4(torch.cat([x, x1, x2, x3], 1)))
        x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
        return x5 * 0.2 + x


class RRDBT(nn.Module):
    def __init__(self, nf=32, gc=16):
        super().__init__()
        self.rdb1 = RDB5C(nf, gc)
        self.rdb2 = RDB5C(nf, gc)
        self.rdb3 = RDB5C(nf, gc)

    def forward(self, x):
        return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x


class MiniRRDBNet(nn.Module):
    """New-arch RealESRGAN naming: conv_first/body.N/conv_body/conv_up1..."""

    def __init__(self, nf=32, gc=16, num_blocks=2, scale=4):
        super().__init__()
        import math
        self.conv_first = nn.Conv2d(3, nf, 3, padding=1)
        self.body = nn.ModuleList([RRDBT(nf, gc) for _ in range(num_blocks)])
        self.conv_body = nn.Conv2d(nf, nf, 3, padding=1)
        self.n_up = int(math.log2(scale))
        for i in range(self.n_up):
            setattr(self, f"conv_up{i+1}", nn.Conv2d(nf, nf, 3, padding=1))
        self.conv_hr = nn.Conv2d(nf, nf, 3, padding=1)
        self.conv_last = nn.Conv2d(nf, 3, 3, padding=1)
        self.act = nn.LeakyReLU(0.2)

    def forward(self, x):
        fea = self.conv_first(x)
        t = fea
        for b in self.body:
            t = b(t)
        fea = fea + self.conv_body(t)
        for i in range(self.n_up):
            fea = F.interpolate(fea, scale_factor=2, mode="nearest")
            fea = self.act(getattr(self, f"conv_up{i+1}")(fea))
        return self.conv_last(self.act(self.conv_hr(fea)))
