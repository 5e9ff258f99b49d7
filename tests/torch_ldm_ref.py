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
    def __init__(self, ch, context_dim, heads, depth=1, groups=32,
                 use_linear=False):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.use_linear = use_linear
        self.proj_in = nn.Linear(ch, ch) if use_linear else nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, context_dim, heads) for _ in range(depth)]
        )
        self.proj_out = nn.Linear(ch, ch) if use_linear else nn.Conv2d(ch, ch, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x)
        if self.use_linear:
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
            x = self.proj_in(x)
        else:
            x = self.proj_in(x)
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        if self.use_linear:
            x = self.proj_out(x)
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
            x = self.proj_out(x)
        return x + residual


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
        mid_depth=1,
        adm_ch=0,
        use_linear=False,
        head_ch=None,
    ):
        super().__init__()
        emb = model_ch * 4
        self.model_ch = model_ch
        self.time_embed = nn.Sequential(
            nn.Linear(model_ch, emb), nn.SiLU(), nn.Linear(emb, emb)
        )
        if adm_ch:
            self.label_emb = nn.Sequential(
                nn.Sequential(nn.Linear(adm_ch, emb), nn.SiLU(), nn.Linear(emb, emb))
            )
        self.adm_ch = adm_ch
        self.input_blocks = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(in_ch, model_ch, 3, padding=1))]
        )
        ch = model_ch
        skips = [ch]
        nheads = lambda oc: (oc // head_ch) if head_ch else heads
        for level, mult in enumerate(channel_mult):
            oc = model_ch * mult
            for _ in range(num_res[level]):
                mods = [ResBlock(ch, oc, emb, groups)]
                if depths[level] > 0:
                    mods.append(SpatialTransformer(oc, context_dim, nheads(oc), depths[level], groups, use_linear))
                self.input_blocks.append(nn.Sequential(*mods))
                ch = oc
                skips.append(ch)
            if level != len(channel_mult) - 1:
                self.input_blocks.append(nn.Sequential(Downsample(ch)))
                skips.append(ch)
        self.middle_block = nn.Sequential(
            ResBlock(ch, ch, emb, groups),
            SpatialTransformer(ch, context_dim, nheads(ch), mid_depth, groups, use_linear),
            ResBlock(ch, ch, emb, groups),
        )
        self.output_blocks = nn.ModuleList()
        for level, mult in reversed(list(enumerate(channel_mult))):
            oc = model_ch * mult
            for i in range(num_res[level] + 1):
                sc = skips.pop()
                mods = [ResBlock(ch + sc, oc, emb, groups)]
                if depths[level] > 0:
                    mods.append(SpatialTransformer(oc, context_dim, nheads(oc), depths[level], groups, use_linear))
                if level != 0 and i == num_res[level]:
                    mods.append(Upsample(oc))
                self.output_blocks.append(nn.Sequential(*mods))
                ch = oc
        self.out = nn.Sequential(
            nn.GroupNorm(groups, model_ch), nn.SiLU(), nn.Conv2d(model_ch, out_ch, 3, padding=1)
        )

    def forward(self, x, timesteps, context, y=None):
        emb = self.time_embed(timestep_embedding(timesteps, self.model_ch))
        if y is not None:
            emb = emb + self.label_emb(y)
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


# ---------------------------------------------------------------- YOLOv8 ----
class YConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class YBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = YConv(c1, c2, 3)
        self.cv2 = YConv(c2, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class YC2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = YConv(c1, 2 * self.c, 1)
        self.cv2 = YConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(YBottleneck(self.c, self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class YSPPF(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = YConv(c1, c_, 1)
        self.cv2 = YConv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = self.cv1(x)
        y1 = self.m(y); y2 = self.m(y1); y3 = self.m(y2)
        return self.cv2(torch.cat([y, y1, y2, y3], 1))


class YProto(nn.Module):
    def __init__(self, c1, c_, c2):
        super().__init__()
        self.cv1 = YConv(c1, c_, 3)
        self.upsample = nn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = YConv(c_, c_, 3)
        self.cv3 = YConv(c_, c2, 1)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class MiniYolo(nn.Module):
    """yolov8-shaped model with ultralytics 'model.N.' key naming, toy width.
    width factor 0.125 -> ch(64)=8 etc; depth n=1."""

    def __init__(self, nc=2, seg=False, w=0.125, max_ch=1024, reg_max=16, nm=8):
        super().__init__()
        ch = lambda c: int(-(-min(c, max_ch) * w // 8) * 8)
        c1, c2, c3, c4, c5 = ch(64), ch(128), ch(256), ch(512), ch(1024)
        self.nc, self.reg_max, self.seg, self.nm = nc, reg_max, seg, nm
        m = nn.ModuleDict()
        m["0"] = YConv(3, c1, 3, 2)
        m["1"] = YConv(c1, c2, 3, 2)
        m["2"] = YC2f(c2, c2, 1, True)
        m["3"] = YConv(c2, c3, 3, 2)
        m["4"] = YC2f(c3, c3, 1, True)
        m["5"] = YConv(c3, c4, 3, 2)
        m["6"] = YC2f(c4, c4, 1, True)
        m["7"] = YConv(c4, c5, 3, 2)
        m["8"] = YC2f(c5, c5, 1, True)
        m["9"] = YSPPF(c5, c5)
        m["12"] = YC2f(c5 + c4, c4, 1, False)
        m["15"] = YC2f(c4 + c3, c3, 1, False)
        m["16"] = YConv(c3, c3, 3, 2)
        m["18"] = YC2f(c3 + c4, c4, 1, False)
        m["19"] = YConv(c4, c4, 3, 2)
        m["21"] = YC2f(c4 + c5, c5, 1, False)
        self.model = m
        hid = str(22)
        chs = (c3, c4, c5)
        cb = max(16, chs[0] // 4, reg_max * 4)
        cc = max(chs[0], min(nc, 100))
        head = nn.Module()
        head.cv2 = nn.ModuleList(
            nn.Sequential(YConv(x, cb, 3), YConv(cb, cb, 3), nn.Conv2d(cb, 4 * reg_max, 1))
            for x in chs
        )
        head.cv3 = nn.ModuleList(
            nn.Sequential(YConv(x, cc, 3), YConv(cc, cc, 3), nn.Conv2d(cc, nc, 1))
            for x in chs
        )
        if seg:
            c4m = max(chs[0] // 4, nm)
            head.cv4 = nn.ModuleList(
                nn.Sequential(YConv(x, c4m, 3), YConv(c4m, c4m, 3), nn.Conv2d(c4m, nm, 1))
                for x in chs
            )
            head.proto = YProto(chs[0], max(chs[0], 8), nm)
        self.model[hid] = head

    def forward(self, x):
        m = self.model
        h = m["2"](m["1"](m["0"](x)))
        p3in = m["4"](m["3"](h))
        p4in = m["6"](m["5"](p3in))
        p5 = m["9"](m["8"](m["7"](p4in)))
        u = torch.cat([F.interpolate(p5, scale_factor=2, mode="nearest"), p4in], 1)
        p4 = m["12"](u)
        u = torch.cat([F.interpolate(p4, scale_factor=2, mode="nearest"), p3in], 1)
        p3 = m["15"](u)
        p4 = m["18"](torch.cat([m["16"](p3), p4], 1))
        p5o = m["21"](torch.cat([m["19"](p4), p5], 1))
        head = m["22"]
        outs = []
        for i, f in enumerate((p3, p4, p5o)):
            outs.append((head.cv2[i](f), head.cv3[i](f)))
        protos = head.proto(p3) if self.seg else None
        coeffs = [head.cv4[i](f) for i, f in enumerate((p3, p4, p5o))] if self.seg else None
        return outs, protos, coeffs


# ------------------------------------------------------------------ SAM -----
class SamLayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):  # NCHW, normalize over C
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


def _sam_get_rel_pos(q, k, rel_pos):
    coords = torch.arange(q)[:, None] - torch.arange(k)[None, :] + (k - 1)
    return rel_pos[coords]


class SamVitAttention(nn.Module):
    def __init__(self, dim, heads, input_size):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rel_pos_h = nn.Parameter(torch.randn(2 * input_size[0] - 1, dim // heads) * 0.02)
        self.rel_pos_w = nn.Parameter(torch.randn(2 * input_size[1] - 1, dim // heads) * 0.02)

    def forward(self, x):
        b, h, w, c = x.shape
        qkv = self.qkv(x.reshape(b, h * w, c)).reshape(b, h * w, 3, self.heads, -1)
        qkv = qkv.permute(2, 0, 3, 1, 4).reshape(3, b * self.heads, h * w, -1)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        rh = _sam_get_rel_pos(h, h, self.rel_pos_h)
        rw = _sam_get_rel_pos(w, w, self.rel_pos_w)
        r_q = q.reshape(-1, h, w, q.shape[-1])
        rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, rw)
        attn = (
            attn.view(-1, h, w, h, w) + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
        ).view(-1, h * w, h * w)
        attn = attn.softmax(-1)
        x = (attn @ v).view(b, self.heads, h * w, -1).permute(0, 2, 1, 3).reshape(b, h, w, c)
        return self.proj(x)


class SamVitBlock(nn.Module):
    def __init__(self, dim, heads, window, input_size):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        size = (window, window) if window else input_size
        self.attn = SamVitAttention(dim, heads, size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.lin1 = nn.Linear(dim, dim * 4)
        self.mlp.lin2 = nn.Linear(dim * 4, dim)
        self.window = window

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window:
            b, h, w, c = x.shape
            ws = self.window
            ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
            x = F.pad(x, (0, 0, 0, pw, 0, ph))
            hp, wp = h + ph, w + pw
            x = x.view(b, hp // ws, ws, wp // ws, ws, c).permute(0, 1, 3, 2, 4, 5)
            x = x.reshape(-1, ws, ws, c)
            x = self.attn(x)
            x = x.view(b, hp // ws, wp // ws, ws, ws, c).permute(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, hp, wp, c)[:, :h, :w]
        else:
            x = self.attn(x)
        x = shortcut + x
        return x + self.mlp.lin2(F.gelu(self.mlp.lin1(self.norm2(x))))


class MiniSam(nn.Module):
    """SAM with official key naming at toy size: dim 32, depth 2 (block 1
    global), window 2, img 64, patch 16, out 16, 2 mask tokens... uses 4 mask
    tokens to match the decoder contract."""

    def __init__(self, img=64, patch=16, dim=32, depth=2, heads=4, window=2,
                 out=16, dec_heads=2, nm_tokens=4):
        super().__init__()
        grid = img // patch
        enc = nn.Module()
        enc.patch_embed = nn.Module()
        enc.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        enc.pos_embed = nn.Parameter(torch.randn(1, grid, grid, dim) * 0.02)
        enc.blocks = nn.ModuleList(
            [SamVitBlock(dim, heads, window if i != 1 else 0, (grid, grid)) for i in range(depth)]
        )
        enc.neck = nn.Sequential(
            nn.Conv2d(dim, out, 1, bias=False), SamLayerNorm2d(out),
            nn.Conv2d(out, out, 3, padding=1, bias=False), SamLayerNorm2d(out),
        )
        self.image_encoder = enc

        pe = nn.Module()
        pe.pe_layer = nn.Module()
        pe.pe_layer.register_parameter(
            "positional_encoding_gaussian_matrix", nn.Parameter(torch.randn(2, out // 2))
        )
        pe.point_embeddings = nn.ModuleList([nn.Embedding(1, out) for _ in range(4)])
        pe.not_a_point_embed = nn.Embedding(1, out)
        pe.no_mask_embed = nn.Embedding(1, out)
        self.prompt_encoder = pe

        dec = nn.Module()
        dec.iou_token = nn.Embedding(1, out)
        dec.mask_tokens = nn.Embedding(nm_tokens, out)
        tr = nn.Module()
        tr.layers = nn.ModuleList()
        for i in range(2):
            layer = nn.Module()
            for name, rate in [("self_attn", 1), ("cross_attn_token_to_image", 2),
                               ("cross_attn_image_to_token", 2)]:
                a = nn.Module()
                d_int = out // rate
                a.q_proj = nn.Linear(out, d_int)
                a.k_proj = nn.Linear(out, d_int)
                a.v_proj = nn.Linear(out, d_int)
                a.out_proj = nn.Linear(d_int, out)
                setattr(layer, name, a)
            layer.norm1 = nn.LayerNorm(out)
            layer.norm2 = nn.LayerNorm(out)
            layer.norm3 = nn.LayerNorm(out)
            layer.norm4 = nn.LayerNorm(out)
            layer.mlp = nn.Module()
            layer.mlp.lin1 = nn.Linear(out, out * 8)
            layer.mlp.lin2 = nn.Linear(out * 8, out)
            tr.layers.append(layer)
        fa = nn.Module()
        d_int = out // 2
        fa.q_proj = nn.Linear(out, d_int); fa.k_proj = nn.Linear(out, d_int)
        fa.v_proj = nn.Linear(out, d_int); fa.out_proj = nn.Linear(d_int, out)
        tr.final_attn_token_to_image = fa
        tr.norm_final_attn = nn.LayerNorm(out)
        dec.transformer = tr
        dec.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(out, out // 2, 2, 2), SamLayerNorm2d(out // 2),
            nn.GELU(), nn.ConvTranspose2d(out // 2, out // 4, 2, 2), nn.GELU(),
        )
        def mlp3(i, o, hid):
            m = nn.Module()
            m.layers = nn.ModuleList([nn.Linear(i, hid), nn.Linear(hid, hid), nn.Linear(hid, o)])
            return m
        dec.output_hypernetworks_mlps = nn.ModuleList(
            [mlp3(out, out // 4, out) for _ in range(nm_tokens)]
        )
        dec.iou_prediction_head = mlp3(out, nm_tokens, out)
        self.mask_decoder = dec
        self.dec_heads = dec_heads
        self.nm = nm_tokens
        self.out_dim = out
        self.img = img
        self.grid = grid

    # ---- reference forward passes (mirroring official SAM semantics) ----
    def encode_image(self, x):  # x NCHW normalized
        h = self.image_encoder.patch_embed.proj(x).permute(0, 2, 3, 1)
        h = h + self.image_encoder.pos_embed
        for blk in self.image_encoder.blocks:
            h = blk(h)
        return self.image_encoder.neck(h.permute(0, 3, 1, 2))

    def _pe(self, coords):
        g = self.prompt_encoder.pe_layer.positional_encoding_gaussian_matrix
        c = 2 * coords - 1
        c = c @ g
        c = 2 * math.pi * c
        return torch.cat([torch.sin(c), torch.cos(c)], -1)

    def dense_pe(self):
        g = self.grid
        ys = (torch.arange(g).float() + 0.5) / g
        xs = (torch.arange(g).float() + 0.5) / g
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return self._pe(torch.stack([gx, gy], -1))  # (g,g,C)

    def _attn(self, a, q, k, v, heads):
        b, nq, _ = q.shape
        qh = a.q_proj(q).view(b, nq, heads, -1).transpose(1, 2)
        kh = a.k_proj(k).view(b, k.shape[1], heads, -1).transpose(1, 2)
        vh = a.v_proj(v).view(b, v.shape[1], heads, -1).transpose(1, 2)
        d = qh.shape[-1]
        attn = torch.softmax(qh @ kh.transpose(-2, -1) / math.sqrt(d), -1)
        o = (attn @ vh).transpose(1, 2).reshape(b, nq, -1)
        return a.out_proj(o)

    def decode(self, feats, sparse, dense):
        dec = self.mask_decoder
        out_tokens = torch.cat([dec.iou_token.weight, dec.mask_tokens.weight], 0)
        tokens = torch.cat([out_tokens.unsqueeze(0), sparse], 1)
        b, c, gh, gw = feats.shape
        src = feats + dense.permute(0, 3, 1, 2)
        keys = src.flatten(2).transpose(1, 2)
        key_pe = self.dense_pe().reshape(1, -1, c)
        queries = tokens
        for i, layer in enumerate(dec.transformer.layers):
            if i == 0:
                queries = self._attn(layer.self_attn, queries, queries, queries, self.dec_heads)
            else:
                q = queries + tokens
                queries = queries + self._attn(layer.self_attn, q, q, queries, self.dec_heads)
            queries = layer.norm1(queries)
            q = queries + tokens
            k = keys + key_pe
            queries = queries + self._attn(layer.cross_attn_token_to_image, q, k, keys, self.dec_heads)
            queries = layer.norm2(queries)
            queries = queries + layer.mlp.lin2(F.relu(layer.mlp.lin1(queries)))
            queries = layer.norm3(queries)
            q = queries + tokens
            k = keys + key_pe
            keys = keys + self._attn(layer.cross_attn_image_to_token, k, q, queries, self.dec_heads)
            keys = layer.norm4(keys)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + self._attn(dec.transformer.final_attn_token_to_image, q, k, keys, self.dec_heads)
        queries = dec.transformer.norm_final_attn(queries)
        iou_out = queries[:, 0]
        mask_tokens_out = queries[:, 1 : 1 + self.nm]
        src2 = keys.transpose(1, 2).reshape(b, c, gh, gw)
        up = dec.output_upscaling(src2)
        hyper = torch.stack(
            [self._mlp3(dec.output_hypernetworks_mlps[i], mask_tokens_out[:, i])
             for i in range(self.nm)], 1,
        )
        masks = torch.einsum("bnc,bchw->bnhw", hyper, up)
        iou = self._mlp3(dec.iou_prediction_head, iou_out)
        return masks, iou

    @staticmethod
    def _mlp3(m, x):
        x = F.relu(m.layers[0](x))
        x = F.relu(m.layers[1](x))
        return m.layers[2](x)


# ------------------------------------------------------- OpenCLIP text ------
class OpenClipBlock(nn.Module):
    """CLIP resblock with fused in_proj (open_clip naming)."""

    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.c_fc = nn.Linear(d, d * 4)
        self.mlp.c_proj = nn.Linear(d * 4, d)

    def forward(self, x, mask):
        a, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                         attn_mask=mask, need_weights=False)
        x = x + a
        x = x + self.mlp.c_proj(F.gelu(self.mlp.c_fc(self.ln_2(x))))
        return x


class MiniOpenClipText(nn.Module):
    """SD2-style text tower, 'cond_stage_model.model.'-compatible keys."""

    def __init__(self, vocab=1000, d=64, layers=3, heads=4, ctx=77):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, d)
        self.positional_embedding = nn.Parameter(torch.randn(ctx, d) * 0.01)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [OpenClipBlock(d, heads) for _ in range(layers)]
        )
        self.ln_final = nn.LayerNorm(d)
        self.text_projection = nn.Parameter(torch.randn(d, d) * 0.02)

    def forward(self, ids, penultimate=False):
        t = ids.shape[1]
        x = self.token_embedding(ids) + self.positional_embedding[:t]
        mask = torch.full((t, t), float("-inf")).triu(1)
        hidden = None
        for i, blk in enumerate(self.transformer.resblocks):
            x = blk(x, mask)
            if i == len(self.transformer.resblocks) - 2:
                hidden = x
        tap = hidden if penultimate else x
        out = self.ln_final(tap)
        last = self.ln_final(x)
        pooled = last[torch.arange(x.shape[0]), ids.argmax(-1)] @ self.text_projection
        return out, pooled


# ---------------------------------------------------------------- YOLOv9 ----
class RepConvN(nn.Module):
    """Training-form RepConv (3x3 + 1x1 branches, each BN'd, SiLU act)."""

    def __init__(self, c1, c2, s=1):
        super().__init__()
        self.conv1 = nn.Module()
        self.conv1.conv = nn.Conv2d(c1, c2, 3, s, 1, bias=False)
        self.conv1.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.conv2 = nn.Module()
        self.conv2.conv = nn.Conv2d(c1, c2, 1, s, 0, bias=False)
        self.conv2.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.conv1.bn(self.conv1.conv(x)) + self.conv2.bn(self.conv2.conv(x)))


class RepNBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e) if False else c2  # ultralytics uses e on cv1 width
        self.cv1 = RepConvN(c1, c2)
        self.cv2 = YConv(c2, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class RepNCSP(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = YConv(c1, c_, 1)
        self.cv2 = YConv(c1, c_, 1)
        self.cv3 = YConv(2 * c_, c2, 1)
        self.m = nn.Sequential(*[RepNBottleneck(c_, c_) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class RepNCSPELAN4(nn.Module):
    def __init__(self, c1, c2, c3, c4, n=1):
        super().__init__()
        self.c = c3 // 2
        self.cv1 = YConv(c1, c3, 1)
        self.cv2 = nn.Sequential(RepNCSP(c3 // 2, c4, n), YConv(c4, c4, 3))
        self.cv3 = nn.Sequential(RepNCSP(c4, c4, n), YConv(c4, c4, 3))
        self.cv4 = YConv(c3 + 2 * c4, c2, 1)

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in (self.cv2, self.cv3))
        return self.cv4(torch.cat(y, 1))


class ADown(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = YConv(c1 // 2, self.c, 3, 2)
        self.cv2 = YConv(c1 // 2, self.c, 1, 1)

    def forward(self, x):
        x = F.avg_pool2d(x, 2, 1, 0, False, True)
        x1, x2 = x.chunk(2, 1)
        x1 = self.cv1(x1)
        x2 = F.max_pool2d(x2, 3, 2, 1)
        x2 = self.cv2(x2)
        return torch.cat((x1, x2), 1)


class SPPELAN(nn.Module):
    def __init__(self, c1, c2, c3):
        super().__init__()
        self.cv1 = YConv(c1, c3, 1)
        self.m = nn.MaxPool2d(5, 1, 2)
        self.cv5 = YConv(4 * c3, c2, 1)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.m(y[-1]))
        return self.cv5(torch.cat(y, 1))


class MiniYolo9(nn.Module):
    """yolov9-c-shaped GELAN model, 'model.N.' keys, toy channel widths."""

    def __init__(self, nc=2, c=16, reg_max=16):
        super().__init__()
        m = nn.ModuleDict()
        m["0"] = YConv(3, c, 3, 2)
        m["1"] = YConv(c, 2 * c, 3, 2)
        m["2"] = RepNCSPELAN4(2 * c, 4 * c, 2 * c, c)
        m["3"] = ADown(4 * c, 4 * c)
        m["4"] = RepNCSPELAN4(4 * c, 8 * c, 4 * c, 2 * c)
        m["5"] = ADown(8 * c, 8 * c)
        m["6"] = RepNCSPELAN4(8 * c, 8 * c, 8 * c, 4 * c)
        m["7"] = ADown(8 * c, 8 * c)
        m["8"] = RepNCSPELAN4(8 * c, 8 * c, 8 * c, 4 * c)
        m["9"] = SPPELAN(8 * c, 8 * c, 4 * c)
        m["12"] = RepNCSPELAN4(16 * c, 8 * c, 8 * c, 4 * c)
        m["15"] = RepNCSPELAN4(16 * c, 4 * c, 4 * c, 2 * c)
        m["16"] = ADown(4 * c, 4 * c)
        m["18"] = RepNCSPELAN4(12 * c, 8 * c, 8 * c, 4 * c)
        m["19"] = ADown(8 * c, 8 * c)
        m["21"] = RepNCSPELAN4(16 * c, 8 * c, 8 * c, 4 * c)
        chs = (4 * c, 8 * c, 8 * c)
        cb = max(16, chs[0] // 4, reg_max * 4)
        cc = max(chs[0], min(nc, 100))
        head = nn.Module()
        head.cv2 = nn.ModuleList(
            nn.Sequential(YConv(x, cb, 3), YConv(cb, cb, 3), nn.Conv2d(cb, 4 * reg_max, 1))
            for x in chs
        )
        head.cv3 = nn.ModuleList(
            nn.Sequential(YConv(x, cc, 3), YConv(cc, cc, 3), nn.Conv2d(cc, nc, 1))
            for x in chs
        )
        m["22"] = head
        self.model = m
        self.nc, self.reg_max = nc, reg_max

    def forward(self, x):
        m = self.model
        h = m["2"](m["1"](m["0"](x)))
        p3in = m["4"](m["3"](h))
        p4in = m["6"](m["5"](p3in))
        p5 = m["9"](m["8"](m["7"](p4in)))
        u = torch.cat([F.interpolate(p5, scale_factor=2, mode="nearest"), p4in], 1)
        n4 = m["12"](u)
        u = torch.cat([F.interpolate(n4, scale_factor=2, mode="nearest"), p3in], 1)
        n3 = m["15"](u)
        n4 = m["18"](torch.cat([m["16"](n3), n4], 1))
        n5 = m["21"](torch.cat([m["19"](n4), p5], 1))
        head = m["22"]
        return [(head.cv2[i](f), head.cv3[i](f)) for i, f in enumerate((n3, n4, n5))]


# ----------------------------------------------------------- ControlNet -----
class MiniControlNet(nn.Module):
    """ControlNet (arXiv 2302.05543) at toy size, state-dict compatible with
    the release's ``control_model.`` key layout: the UNet encoder tree +
    zero_convs.i.0 + middle_block_out.0 + input_hint_block.{0,2,..,14}."""

    HINT_CHS = (16, 16, 32, 32, 96, 96, 256)
    HINT_STRIDES = (1, 1, 2, 1, 2, 1, 2)

    def __init__(self, in_ch=4, model_ch=32, channel_mult=(1, 2),
                 num_res=(1, 1), depths=(1, 0), context_dim=64, heads=2,
                 groups=32, hint_ch=3):
        super().__init__()
        emb = model_ch * 4
        self.model_ch = model_ch
        self.time_embed = nn.Sequential(
            nn.Linear(model_ch, emb), nn.SiLU(), nn.Linear(emb, emb)
        )
        hint_mods = []
        c = hint_ch
        for co, s in zip(self.HINT_CHS, self.HINT_STRIDES):
            hint_mods += [nn.Conv2d(c, co, 3, padding=1, stride=s), nn.SiLU()]
            c = co
        hint_mods.append(nn.Conv2d(c, model_ch, 3, padding=1))
        nn.init.zeros_(hint_mods[-1].weight)
        nn.init.zeros_(hint_mods[-1].bias)
        self.input_hint_block = nn.Sequential(*hint_mods)

        def zconv(ch):
            m = nn.Conv2d(ch, ch, 1)
            nn.init.zeros_(m.weight)
            nn.init.zeros_(m.bias)
            return nn.Sequential(m)

        self.input_blocks = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(in_ch, model_ch, 3, padding=1))]
        )
        self.zero_convs = nn.ModuleList([zconv(model_ch)])
        ch = model_ch
        for level, mult in enumerate(channel_mult):
            oc = model_ch * mult
            for _ in range(num_res[level]):
                mods = [ResBlock(ch, oc, emb, groups)]
                if depths[level] > 0:
                    mods.append(SpatialTransformer(oc, context_dim, heads,
                                                   depths[level], groups))
                self.input_blocks.append(nn.Sequential(*mods))
                self.zero_convs.append(zconv(oc))
                ch = oc
            if level != len(channel_mult) - 1:
                self.input_blocks.append(nn.Sequential(Downsample(ch)))
                self.zero_convs.append(zconv(ch))
        self.middle_block = nn.Sequential(
            ResBlock(ch, ch, emb, groups),
            SpatialTransformer(ch, context_dim, heads, 1, groups),
            ResBlock(ch, ch, emb, groups),
        )
        self.middle_block_out = zconv(ch)

    def forward(self, x, hint, timesteps, context):
        emb = self.time_embed(timestep_embedding(timesteps, self.model_ch))
        guided = self.input_hint_block(hint)
        h = x
        outs = []
        for i, block in enumerate(self.input_blocks):
            for mod in block:
                if isinstance(mod, ResBlock):
                    h = mod(h, emb)
                elif isinstance(mod, SpatialTransformer):
                    h = mod(h, context)
                else:
                    h = mod(h)
            if i == 0:
                h = h + guided
            outs.append(self.zero_convs[i](h))
        for mod in self.middle_block:
            if isinstance(mod, ResBlock):
                h = mod(h, emb)
            else:
                h = mod(h, context)
        return outs, self.middle_block_out(h)
