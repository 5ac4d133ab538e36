"""Torch CPU replica of the OCPG eval forward — the golden-parity oracle.

Original test-only code (NOT copied from /root/reference): a minimal PyTorch
implementation of the same architecture whose module tree uses the reference
checkpoint's state_dict key names (backbone.0.body.*, text_encoder.
text_backbone.*, transformer.encoder.layers.*, bbox_embed.*, ...), so that
`ocpg_tpu.utils.torch_weights.convert_ocpg` is exercised exactly as it would
be on a real reference checkpoint, and the converted JAX model can be compared
against this torch forward end to end (tests/test_golden_parity.py).

Scope: the eval (DAVIS/YTVOS) branch — backbone -> text -> LFM/fusion ->
deformable transformer -> heads -> dynamic-conv mask -> MSO -> x4 upsample.
MSDA core uses F.grid_sample (align_corners=False, zeros padding), the same
semantics the CUDA kernel implements.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------- backbone --
class FrozenBN2d(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.ones(n))
        self.register_buffer("bias", torch.zeros(n))
        self.register_buffer("running_mean", torch.zeros(n))
        self.register_buffer("running_var", torch.ones(n))

    def forward(self, x):
        scale = self.weight * (self.running_var + 1e-5).rsqrt()
        shift = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = FrozenBN2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = FrozenBN2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = FrozenBN2d(planes * 4)
        self.downsample = (
            nn.Sequential(nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                          FrozenBN2d(planes * 4))
            if downsample else None
        )

    def forward(self, x):
        idn = self.downsample(x) if self.downsample is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class ResNetBody(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = FrozenBN2d(64)
        cin = 64
        for s, (blocks, planes) in enumerate(zip(layers, (64, 128, 256, 512))):
            mods = []
            for b in range(blocks):
                stride = (1 if s == 0 else 2) if b == 0 else 1
                mods.append(Bottleneck(cin, planes, stride, downsample=(b == 0)))
                cin = planes * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*mods))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            outs.append(x)
        return outs


class BackboneJoinerSlot(nn.Module):
    """Key-shape shim: reference keys are backbone.0.body.*"""

    def __init__(self, layers):
        super().__init__()
        self.body = ResNetBody(layers)


# ------------------------------------------------------- video-swin backbone --
class _SwinAttnParams(nn.Module):
    def __init__(self, c, heads, window):
        super().__init__()
        self.qkv = nn.Linear(c, 3 * c)
        self.proj = nn.Linear(c, c)
        n = (2 * window[0] - 1) * (2 * window[1] - 1) * (2 * window[2] - 1)
        self.relative_position_bias_table = nn.Parameter(torch.zeros(n, heads))


class _SwinMlpParams(nn.Module):
    def __init__(self, c, ratio=4.0):
        super().__init__()
        self.fc1 = nn.Linear(c, int(c * ratio))
        self.fc2 = nn.Linear(int(c * ratio), c)


class _SwinBlockParams(nn.Module):
    def __init__(self, c, heads, window):
        super().__init__()
        self.norm1 = nn.LayerNorm(c)
        self.norm2 = nn.LayerNorm(c)
        self.attn = _SwinAttnParams(c, heads, window)
        self.mlp = _SwinMlpParams(c)


class _SwinStage(nn.Module):
    def __init__(self, c, depth, heads, window):
        super().__init__()
        self.blocks = nn.ModuleList(
            _SwinBlockParams(c, heads, window) for _ in range(depth))


class _PatchMerging(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.LayerNorm(4 * c)
        self.reduction = nn.Linear(4 * c, 2 * c, bias=False)

    def forward(self, x):  # (B, T, H, W, C)
        b, t, h, w, c = x.shape
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat([x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                       x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], -1)
        return self.reduction(self.norm(x))


class _PatchEmbed3D(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.proj = nn.Conv3d(3, c, kernel_size=(1, 4, 4), stride=(1, 4, 4))
        self.norm = nn.LayerNorm(c)


class VideoSwinBody(nn.Module):
    """Reference VideoSwinTransformerBackbone key layout
    (video_swin_transformer.py:638-701): patch_embed.*, layers.{s}.blocks.{i}.*
    with downsamples.{s}.* pulled out of the stages.  The block math delegates
    to tests.test_video_swin_parity._torch_swin_block (the reference-semantics
    functional implementation already validated against SwinBlock3D)."""

    def __init__(self, embed_dim=32, depths=(1, 1, 2, 1), heads=(1, 2, 4, 8),
                 window=(8, 7, 7)):
        super().__init__()
        self.patch_embed = _PatchEmbed3D(embed_dim)
        self.layers = nn.ModuleList()
        self.downsamples = nn.ModuleList()
        for s, (d, h) in enumerate(zip(depths, heads)):
            c = embed_dim * 2 ** s
            self.layers.append(_SwinStage(c, d, h, window))
            self.downsamples.append(
                _PatchMerging(c) if s < len(depths) - 1 else None)
        self.embed_dim, self.depths, self.heads = embed_dim, depths, heads
        self.window = window

    def forward(self, samples, num_frames):
        from tests.test_video_swin_parity import _torch_swin_block

        bt, _, H, W = samples.shape
        t = num_frames
        b = bt // t
        x = samples.reshape(b, t, 3, H, W).permute(0, 2, 1, 3, 4)   # (B,3,T,H,W)
        x = self.patch_embed.proj(x)                                # (B,C,T,H4,W4)
        bch, c, _, h4, w4 = x.shape
        x = F.layer_norm(x.flatten(2).transpose(1, 2), (c,),
                         self.patch_embed.norm.weight,
                         self.patch_embed.norm.bias, eps=1e-5)
        x = x.view(b, t, h4, w4, c)                                 # (B,T,H,W,C)

        outs = []
        for s, (stage, down) in enumerate(zip(self.layers, self.downsamples)):
            for i, blk in enumerate(stage.blocks):
                sd = {k: v.detach() for k, v in blk.state_dict().items()}
                x = _torch_swin_block(x, sd, self.window, shift=(i % 2 == 1),
                                      num_heads=self.heads[s])
            outs.append(x.permute(0, 1, 4, 2, 3).reshape(
                bt, x.shape[-1], x.shape[2], x.shape[3]))           # (BT,C,h,w)
            if down is not None:
                x = down(x)
        return outs


class SwinBackboneJoinerSlot(nn.Module):
    def __init__(self, embed_dim, depths, heads):
        super().__init__()
        self.body = VideoSwinBody(embed_dim, depths, heads)


# -------------------------------------------------------------- small bits --
class FeatureResizer(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.fc = nn.Linear(cin, cout)
        self.layer_norm = nn.LayerNorm(cout, eps=1e-12)

    def forward(self, x):
        return self.layer_norm(self.fc(x))


class MLP(nn.Module):
    def __init__(self, cin, hidden, cout, num_layers):
        super().__init__()
        dims = [cin] + [hidden] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [cout]))

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return x


def sine_pos_2d(mask, num_pos_feats=128, temperature=10000.0):
    not_mask = (~mask).float()
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    eps = 1e-6
    scale = 2 * math.pi
    y = (y - 0.5) / (y[:, -1:, :] + eps) * scale
    x = (x - 0.5) / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), -1).flatten(-2)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), -1).flatten(-2)
    return torch.cat((py, px), -1)  # (B, H, W, C)


def sine_pos_1d(mask, num_pos_feats=256, temperature=10000.0):
    not_mask = (~mask).float()
    x = not_mask.cumsum(1)
    x = x / (x[:, -1:] + 1e-6) * (2 * math.pi)
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    p = x[..., None] / dim_t
    return torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()), -1).flatten(-2)


class LFM(nn.Module):
    def __init__(self, c, sigma=7.0):
        super().__init__()
        self.conv1 = nn.Conv2d(2 * c, 2 * c, 1)
        self.conv2 = nn.Conv2d(2 * c, 2 * c, 1)
        self.laplace = nn.Conv2d(c, c, 3, padding=0)
        self.fc = nn.Sequential(nn.Linear(c, c, bias=False), nn.ReLU(),
                                nn.Linear(c, 1, bias=False), nn.Sigmoid())
        self.sigma = sigma

    def forward(self, x, gauss=None):
        b, c, h, w = x.shape
        coef = self.laplace(x).mean((2, 3))
        coef = self.fc(coef).view(b, 1, 1, 1)
        y = torch.fft.fft2(x)
        if gauss is None:
            yv = torch.arange(h, dtype=torch.float32)[:, None]
            xv = torch.arange(w, dtype=torch.float32)[None, :]
            gauss = torch.exp(-((yv - h // 2) ** 2 + (xv - w // 2) ** 2)
                              / (2 * self.sigma ** 2))[None, None]
        else:
            gauss = F.interpolate(gauss, size=(h, w), mode="bilinear",
                                  align_corners=False)
        y = y * (1 - coef * gauss)
        yf = torch.cat([y.real, y.imag], 1)
        yf = self.conv2(F.relu(self.conv1(yf)))
        yr, yi = torch.chunk(yf, 2, 1)
        y = torch.fft.ifft2(torch.complex(yr, yi), s=(h, w)).real
        return x + y, gauss


class VLFusion(nn.Module):
    def __init__(self, c, heads):
        super().__init__()
        self.multihead_attn = nn.MultiheadAttention(c, heads, batch_first=True)

    def forward(self, visual, text, text_pad, text_pos):
        out, _ = self.multihead_attn(visual, text + text_pos, text,
                                     key_padding_mask=text_pad)
        return visual * out


# -------------------------------------------------------------------- MSDA --
def msda_core(value, shapes, locations, attn):
    """value (N, S, M, D); locations (N, Lq, M, L, P, 2); attn (N, Lq, M, L, P)."""
    n, s, m, d = value.shape
    _, lq, _, nl, p, _ = locations.shape
    v = value.permute(0, 2, 3, 1).reshape(n * m, d, s)
    out = torch.zeros(n * m, d, lq, dtype=value.dtype)
    start = 0
    for lid, (h, w) in enumerate(shapes):
        vl = v[:, :, start:start + h * w].view(n * m, d, h, w)
        grid = locations[:, :, :, lid].permute(0, 2, 1, 3, 4).reshape(n * m, lq, p, 2)
        g = F.grid_sample(vl, 2 * grid - 1, mode="bilinear",
                          padding_mode="zeros", align_corners=False)  # (NM, D, Lq, P)
        a = attn[:, :, :, lid].permute(0, 2, 1, 3).reshape(n * m, 1, lq, p)
        out = out + (g * a).sum(-1)
        start += h * w
    return out.view(n, m, d, lq).permute(0, 3, 1, 2).reshape(n, lq, m * d)


class MSDA(nn.Module):
    def __init__(self, c=256, levels=4, heads=8, points=4):
        super().__init__()
        self.m, self.l, self.p = heads, levels, points
        self.sampling_offsets = nn.Linear(c, heads * levels * points * 2)
        self.attention_weights = nn.Linear(c, heads * levels * points)
        self.value_proj = nn.Linear(c, c)
        self.output_proj = nn.Linear(c, c)

    def forward(self, query, ref, src, shapes, pad_mask):
        n, lq, c = query.shape
        value = self.value_proj(src)
        if pad_mask is not None:
            value = value.masked_fill(pad_mask[..., None], 0.0)
        value = value.view(n, -1, self.m, c // self.m)
        off = self.sampling_offsets(query).view(n, lq, self.m, self.l, self.p, 2)
        aw = self.attention_weights(query).view(n, lq, self.m, self.l * self.p)
        aw = aw.softmax(-1).view(n, lq, self.m, self.l, self.p)
        if ref.shape[-1] == 2:
            normalizer = torch.tensor([[w, h] for h, w in shapes], dtype=torch.float32)
            loc = ref[:, :, None, :, None, :] + off / normalizer[None, None, None, :, None, :]
        else:
            loc = ref[:, :, None, :, None, :2] + off / self.p * ref[:, :, None, :, None, 2:] * 0.5
        return self.output_proj(msda_core(value, shapes, loc, aw)), loc, aw


class EncLayer(nn.Module):
    def __init__(self, c, ffn, levels, heads, points):
        super().__init__()
        self.self_attn = MSDA(c, levels, heads, points)
        self.norm1 = nn.LayerNorm(c)
        self.linear1 = nn.Linear(c, ffn)
        self.linear2 = nn.Linear(ffn, c)
        self.norm2 = nn.LayerNorm(c)

    def forward(self, src, pos, ref, shapes, pad):
        s2, _, _ = self.self_attn(src + pos, ref, src, shapes, pad)
        src = self.norm1(src + s2)
        f = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + f)


class DecLayer(nn.Module):
    def __init__(self, c, ffn, levels, heads, points):
        super().__init__()
        self.cross_attn = MSDA(c, levels, heads, points)
        self.norm1 = nn.LayerNorm(c)
        self.self_attn = nn.MultiheadAttention(c, heads, batch_first=True)
        self.norm2 = nn.LayerNorm(c)
        self.linear1 = nn.Linear(c, ffn)
        self.linear2 = nn.Linear(ffn, c)
        self.norm3 = nn.LayerNorm(c)

    def forward(self, tgt, qp, ref, src, shapes, pad):
        q = tgt + qp
        t2, _ = self.self_attn(q, q, tgt)
        tgt = self.norm2(tgt + t2)
        t2, loc, aw = self.cross_attn(tgt + qp, ref, src, shapes, pad)
        tgt = self.norm1(tgt + t2)
        f = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + f), loc, aw


class Encoder(nn.Module):
    def __init__(self, layer_args, n):
        super().__init__()
        self.layers = nn.ModuleList(EncLayer(*layer_args) for _ in range(n))


class Decoder(nn.Module):
    def __init__(self, layer_args, n):
        super().__init__()
        self.layers = nn.ModuleList(DecLayer(*layer_args) for _ in range(n))


class Transformer(nn.Module):
    def __init__(self, c, heads, enc, dec, ffn, levels, points):
        super().__init__()
        self.level_embed = nn.Parameter(torch.zeros(levels, c))
        self.reference_points = nn.Linear(c, 2)
        self.encoder = Encoder((c, ffn, levels, heads, points), enc)
        self.decoder = Decoder((c, ffn, levels, heads, points), dec)


def inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


class MSO(nn.Module):
    def __init__(self, mask_dim, img_dims):
        super().__init__()
        self.conv1_1div8 = nn.Conv2d(mask_dim + img_dims[1], mask_dim, 3, padding=1)
        self.conv2_1div8 = nn.Conv2d(mask_dim, mask_dim, 3, padding=1)
        self.conv1_1div4 = nn.Conv2d(mask_dim + img_dims[0], mask_dim, 3, padding=1)
        self.conv2_1div4 = nn.Conv2d(mask_dim, mask_dim, 3, padding=1)
        self.out_conv = nn.Conv2d(mask_dim, 1, 3, padding=1)

    def forward(self, pm, f4, f8):
        x = F.relu(torch.cat([pm, f8], 1))
        pm = pm + self.conv2_1div8(F.relu(self.conv1_1div8(x)))
        pm = F.interpolate(pm, size=f4.shape[-2:], mode="bilinear", align_corners=False)
        x = F.relu(torch.cat([pm, f4], 1))
        pm = pm + self.conv2_1div4(F.relu(self.conv1_1div4(x)))
        return self.out_conv(pm)


# ----------------------------------------------------------------- replica --
class OCPGReplica(nn.Module):
    """Eval forward replica (DAVIS branch) with reference state_dict keys."""

    def __init__(self, hf_text_config, resnet_layers=(3, 4, 6, 3), hidden=256,
                 heads=8, enc=1, dec=2, ffn=64, levels=4, points=4, queries=5,
                 mask_ch=16, swin_cfg=None):
        super().__init__()
        from transformers import RobertaModel

        class TextSlot(nn.Module):
            def __init__(slf):
                super().__init__()
                slf.text_backbone = RobertaModel(hf_text_config)

        if swin_cfg is not None:
            self.backbone = nn.ModuleList([SwinBackboneJoinerSlot(
                swin_cfg["embed_dim"], swin_cfg["depths"], swin_cfg["num_heads"])])
            bb_ch = tuple(swin_cfg["embed_dim"] * 2 ** i
                          for i in range(len(swin_cfg["depths"])))
        else:
            self.backbone = nn.ModuleList([BackboneJoinerSlot(resnet_layers)])
            bb_ch = (256, 512, 1024, 2048)
        self.is_swin = swin_cfg is not None
        self.text_encoder = TextSlot()
        th = hf_text_config.hidden_size
        self.text_proj = FeatureResizer(th, hidden)
        self.sentence_proj = FeatureResizer(th, hidden)
        self.fusion_module = VLFusion(hidden, heads)
        self.query_embed = nn.Embedding(queries, hidden)
        projs = []
        for l in range(levels):
            cin = bb_ch[1 + l] if l < 3 else bb_ch[-1]
            conv = (nn.Conv2d(cin, hidden, 1) if l < 3
                    else nn.Conv2d(cin, hidden, 3, stride=2, padding=1))
            projs.append(nn.Sequential(conv, nn.GroupNorm(32, hidden)))
        self.input_proj = nn.ModuleList(projs)
        self.input_fft = nn.ModuleList(LFM(hidden) for _ in range(levels))
        self.input_fft_post = nn.ModuleList(LFM(hidden) for _ in range(levels))
        self.transformer = Transformer(hidden, heads, enc, dec, ffn, levels, points)
        self.bbox_embed = nn.ModuleList(MLP(hidden, hidden, 4, 3) for _ in range(dec))
        self.class_embed = nn.ModuleList(nn.Linear(hidden, 1) for _ in range(dec))
        n_params = (hidden + 2) * mask_ch + mask_ch + mask_ch * mask_ch + mask_ch
        self.controller = MLP(hidden, hidden, n_params, 3)
        self.ls_feat_viz = nn.Conv2d(hidden, 8, 3, padding=1)
        self.ls_text_proj = nn.Linear(hidden, 8)
        self.mask_refine = MSO(mask_ch, (bb_ch[0], bb_ch[1]))
        self.hidden, self.heads, self.levels = hidden, heads, levels
        self.dec, self.queries, self.mask_ch = dec, queries, mask_ch

    @torch.no_grad()
    def _trunk(self, samples, samples_mask, text_ids, text_mask, sizes,
               valid_indices=None):
        """Shared pipeline through the per-layer dynamic-conv patches.

        samples (B,T,3,H,W); samples_mask (B,T,H,W) bool; sizes (B,2) hw;
        valid_indices (B,) selects one annotated frame after the backbone
        (reference ocpg.py:226-235, a2d/jhmdb path).
        """
        b, t, _, H, W = samples.shape
        frames = samples.reshape(b * t, 3, H, W)
        fmask = samples_mask.reshape(b * t, H, W)
        feats = (self.backbone[0].body(frames, t) if self.is_swin
                 else self.backbone[0].body(frames))
        if valid_indices is not None:
            sel = torch.arange(b) * t + valid_indices
            feats = [f[sel] for f in feats]
            frames = frames[sel]
            fmask = fmask[sel]
            t = 1
        feat_masks = [
            (F.interpolate(fmask[:, None].float(), size=f.shape[-2:],
                           mode="nearest")[:, 0] > 0.5)
            for f in feats
        ]
        poses = [sine_pos_2d(m, self.hidden // 2).permute(0, 3, 1, 2)
                 for m in feat_masks]

        out = self.text_encoder.text_backbone(input_ids=text_ids,
                                              attention_mask=text_mask)
        text_word = self.text_proj(out.last_hidden_state)
        text_sentence = self.sentence_proj(out.pooler_output)
        text_pad = text_mask == 0
        text_pos = sine_pos_1d(text_pad, self.hidden)

        srcs, masks_l, pos_l = [], [], []
        gauss = None
        for l in range(self.levels):
            if l < 3:
                src = self.input_proj[l](feats[1 + l])
                lvl_mask = feat_masks[1 + l]
                p = poses[1 + l]
            else:
                base = feats[-1] if l == 3 else srcs[-1]
                src = self.input_proj[l](base)
                lvl_mask = (F.interpolate(fmask[:, None].float(), size=src.shape[-2:],
                                          mode="nearest")[:, 0] > 0.5)
                p = sine_pos_2d(lvl_mask, self.hidden // 2).permute(0, 3, 1, 2)
            src, gauss = self.input_fft[l](src, gauss)
            n_, c_, h_, w_ = src.shape
            vis = src.flatten(2).permute(0, 2, 1).reshape(b, t * h_ * w_, c_)
            vis = self.fusion_module(vis, text_word, text_pad, text_pos)
            src = vis.reshape(n_, h_ * w_, c_).permute(0, 2, 1).reshape(n_, c_, h_, w_)
            src, gauss = self.input_fft_post[l](src, gauss)
            srcs.append(src)
            masks_l.append(lvl_mask)
            pos_l.append(p)

        # --- transformer ---
        shapes = tuple((s.shape[2], s.shape[3]) for s in srcs)
        src_flat = torch.cat([s.flatten(2).permute(0, 2, 1) for s in srcs], 1)
        mask_flat = torch.cat([m.flatten(1) for m in masks_l], 1)
        pos_flat = torch.cat(
            [p.flatten(2).permute(0, 2, 1) + self.transformer.level_embed[i][None, None]
             for i, p in enumerate(pos_l)], 1)

        def valid_ratio(m):
            nm = ~m
            vh = nm[:, :, 0].sum(1).float()
            vw = nm[:, 0, :].sum(1).float()
            return torch.stack([vw / m.shape[2], vh / m.shape[1]], -1)

        valid_ratios = torch.stack([valid_ratio(m) for m in masks_l], 1)  # (N,L,2)

        refs = []
        for lvl, (h, w) in enumerate(shapes):
            ry = (torch.arange(h, dtype=torch.float32) + 0.5)[:, None].expand(h, w).reshape(-1)[None]
            rx = (torch.arange(w, dtype=torch.float32) + 0.5)[None, :].expand(h, w).reshape(-1)[None]
            ry = ry / (valid_ratios[:, None, lvl, 1] * h)
            rx = rx / (valid_ratios[:, None, lvl, 0] * w)
            refs.append(torch.stack((rx, ry), -1))
        enc_ref = torch.cat(refs, 1)[:, :, None] * valid_ratios[:, None]

        memory = src_flat
        for layer in self.transformer.encoder.layers:
            memory = layer(memory, pos_flat, enc_ref, shapes, mask_flat)

        bt = memory.shape[0]
        qp = self.query_embed.weight[None].expand(bt, -1, -1)
        reference = torch.sigmoid(self.transformer.reference_points(qp))
        tgt = text_sentence[:, None, :].repeat(1, t, 1).reshape(bt, 1, -1)
        tgt = tgt.expand(bt, self.queries, -1)

        hs_layers, refs_layers, coords_layers = [], [], []
        for i, layer in enumerate(self.transformer.decoder.layers):
            if reference.shape[-1] == 4:
                ref_in = reference[:, :, None] * torch.cat(
                    [valid_ratios, valid_ratios], -1)[:, None]
            else:
                ref_in = reference[:, :, None] * valid_ratios[:, None]
            tgt, _, _ = layer(tgt, qp, ref_in, memory, shapes, mask_flat)
            tmp = self.bbox_embed[i](tgt)
            if reference.shape[-1] == 4:
                new_ref = torch.sigmoid(tmp + inverse_sigmoid(reference))
            else:
                tmp = tmp.clone()
                tmp[..., :2] = tmp[..., :2] + inverse_sigmoid(reference)
                new_ref = torch.sigmoid(tmp)
            coords_layers.append(new_ref)
            reference = new_ref.detach()
            hs_layers.append(tgt)
            refs_layers.append(reference)

        memory_features = []
        start = 0
        for lvl in range(self.levels - 1):
            h, w = shapes[lvl]
            memory_features.append(
                memory[:, start:start + h * w].permute(0, 2, 1).reshape(bt, -1, h, w))
            start += h * w

        logits = torch.stack([self.class_embed[i](hs_layers[i])
                              for i in range(self.dec)]).reshape(self.dec, b, t, self.queries, 1)
        coords = torch.stack(coords_layers).reshape(self.dec, b, t, self.queries, 4)

        # --- mask path: per-layer dynamic-conv patches ---
        h8, w8 = memory_features[0].shape[-2:]
        mem_fuse = sum(F.interpolate(x, size=(h8, w8), mode="bicubic",
                                     align_corners=False) for x in memory_features)
        scale_wh = torch.stack([sizes[:, 1], sizes[:, 0]], -1).float()
        sx = (torch.arange(w8, dtype=torch.float32) * 8 + 4)
        sy = (torch.arange(h8, dtype=torch.float32) * 8 + 4)
        locations = torch.stack(
            (sx[None, :].expand(h8, w8), sy[:, None].expand(h8, w8)), -1)

        cin0 = self.hidden + 2
        mc = self.mask_ch
        n_w1, n_w2 = cin0 * mc, mc * mc
        patches, shuffled = [], []
        for i in range(self.dec):
            params = self.controller(hs_layers[i]).reshape(b, t, self.queries, -1)
            refq = refs_layers[i][..., :2].reshape(b, t, self.queries, 2) * scale_wh[:, None, None]
            rel = refq[:, :, :, None, None, :] - locations[None, None, None]
            mf = mem_fuse.reshape(b, t, -1, h8, w8)
            mf = mf[:, :, None].expand(b, t, self.queries, mf.shape[2], h8, w8)
            inst = torch.cat([mf, rel.permute(0, 1, 2, 5, 3, 4)], 3)
            inst = inst.reshape(b * t * self.queries, -1, h8, w8)
            cp = params.reshape(b * t * self.queries, -1)

            # controller layout: all weights first, then all biases
            # (reference parse_dynamic_params, ocpg.py:552-569)
            w1 = cp[:, :n_w1].reshape(-1, mc, cin0)
            w2 = cp[:, n_w1:n_w1 + n_w2].reshape(-1, mc, mc)
            b1 = cp[:, n_w1 + n_w2:n_w1 + n_w2 + mc]
            b2 = cp[:, n_w1 + n_w2 + mc:]
            x = torch.einsum("ichw,ioc->iohw", inst, w1) + b1[:, :, None, None]
            x = F.relu(x)
            patch = torch.einsum("ichw,ioc->iohw", x, w2) + b2[:, :, None, None]
            shuffled.append(F.pixel_shuffle(patch, 4).reshape(
                b, t, self.queries, h8 * 4, w8 * 4))
            patches.append(patch.reshape(b, t, self.queries, self.mask_ch, h8, w8))

        return {
            "b": b, "t": t, "H": H, "W": W, "bt": bt,
            "h8": h8, "w8": w8,
            "feats": feats, "frames": frames,
            "logits": logits, "coords": coords,
            "hs_layers": hs_layers, "refs_layers": refs_layers,
            "mem_fuse": mem_fuse, "text_sentence": text_sentence,
            "patches": patches, "shuffled": shuffled,
        }

    @torch.no_grad()
    def forward(self, samples, samples_mask, text_ids, text_mask, sizes):
        """DAVIS/YTVOS eval branch (reference ocpg.py:401-433): best query."""
        tr = self._trunk(samples, samples_mask, text_ids, text_mask, sizes)
        b, t, H, W, bt = tr["b"], tr["t"], tr["H"], tr["W"], tr["bt"]
        logits, coords = tr["logits"], tr["coords"]
        feats = tr["feats"]

        scores = torch.sigmoid(logits[-1])                     # (B,T,Q,1)
        best_q = scores.mean(1).max(-1).values.argmax(-1)      # (B,)

        patch = tr["patches"][-1]
        psel = patch[torch.arange(b), :, best_q]               # (B,T,16,h8,w8)
        psel = psel.reshape(bt, self.mask_ch, tr["h8"], tr["w8"])
        refined = self.mask_refine(psel, feats[0], feats[1])   # (BT,1,h4,w4)
        full = F.interpolate(refined, size=(H, W), mode="nearest")[:, 0]

        refs_pen = tr["refs_layers"][-2][..., :2].reshape(b, t, self.queries, 2)
        return {
            "pred_logits": torch.gather(
                logits[-1], 2, best_q[:, None, None, None].expand(b, t, 1, 1)),
            "pred_boxes": torch.gather(
                coords[-1], 2, best_q[:, None, None, None].expand(b, t, 1, 4)),
            "reference_points": torch.gather(
                refs_pen, 2, best_q[:, None, None, None].expand(b, t, 1, 2)),
            "pred_masks": full.reshape(b, t, 1, H, W),
        }

    @torch.no_grad()
    def forward_a2d(self, samples, samples_mask, text_ids, text_mask, sizes,
                    valid_indices):
        """A2D/JHMDB eval branch (reference ocpg.py:434-445): valid-frame
        select after the backbone, then MSO-refine EVERY query."""
        tr = self._trunk(samples, samples_mask, text_ids, text_mask, sizes,
                         valid_indices=valid_indices)
        b, t, H, W = tr["b"], tr["t"], tr["H"], tr["W"]
        q, mc = self.queries, self.mask_ch
        feats = tr["feats"]

        # instance order (b, q, t) as the JAX branch (ocpg.py:354-362)
        patch = tr["patches"][-1]                              # (B,T,Q,16,h8,w8)
        patch_q = patch.permute(0, 2, 1, 3, 4, 5).reshape(
            b * q * t, mc, tr["h8"], tr["w8"])
        f4 = feats[0].reshape(b, t, *feats[0].shape[1:])
        f8 = feats[1].reshape(b, t, *feats[1].shape[1:])
        f4 = f4[:, None].expand(b, q, *f4.shape[1:]).reshape(b * q * t, *feats[0].shape[1:])
        f8 = f8[:, None].expand(b, q, *f8.shape[1:]).reshape(b * q * t, *feats[1].shape[1:])
        refined = self.mask_refine(patch_q, f4, f8)
        full = F.interpolate(refined, size=(H, W), mode="nearest")[:, 0]
        return {
            "pred_logits": tr["logits"][-1],                   # (B,T,Q,1)
            "pred_boxes": tr["coords"][-1],
            "pred_masks": full.reshape(b, q, t, H, W).permute(0, 2, 1, 3, 4),
        }

    @torch.no_grad()
    def forward_train(self, samples, samples_mask, text_ids, text_mask, sizes,
                      matched):
        """Train branch (reference ocpg.py:336-399): per-layer matched masks
        + MSO, level-set feature stack.  `matched` is the (L, B) query
        assignment (computed outside so the torch matcher replica in
        tests/test_matcher.py can be exercised on the same tensors)."""
        tr = self._trunk(samples, samples_mask, text_ids, text_mask, sizes)
        b, t, H, W, bt = tr["b"], tr["t"], tr["H"], tr["W"], tr["bt"]
        h8, w8 = tr["h8"], tr["w8"]
        h2, w2 = h8 * 4, w8 * 4
        feats = tr["feats"]

        # level-set targets (reference ocpg.py:368-384)
        ls_viz = self.ls_feat_viz(tr["mem_fuse"])
        ls_viz = F.interpolate(ls_viz, size=(h2, w2), mode="bilinear",
                               align_corners=True)             # (BT,8,h2,w2)
        txt8 = self.ls_text_proj(tr["text_sentence"])          # (B,8)
        txt8_bt = txt8.repeat_interleave(t, dim=0)[:, :, None, None]
        dot = (ls_viz * txt8_bt).sum(1)
        cos = (F.normalize(ls_viz, dim=1) * F.normalize(txt8_bt, dim=1)).sum(1)
        sim_cross = dot / (cos + 1e-5)
        img_ori = F.interpolate(tr["frames"], size=(h2, w2), mode="bilinear",
                                align_corners=True)            # (BT,3,h2,w2)
        ls_features = torch.cat([img_ori, ls_viz, sim_cross[:, None]], 1)

        pred_masks_layers, pred_low_layers = [], []
        for i in range(self.dec):
            sel = torch.as_tensor(matched[i])
            psel = tr["patches"][i][torch.arange(b), :, sel]   # (B,T,16,h8,w8)
            psel = psel.reshape(bt, self.mask_ch, h8, w8)
            refined = self.mask_refine(psel, feats[0], feats[1])
            full = F.interpolate(refined, size=(H, W), mode="nearest")[:, 0]
            pred_masks_layers.append(full.reshape(b, t, H, W))
            pred_low_layers.append(
                tr["shuffled"][i][torch.arange(b), :, sel])    # (B,T,h2,w2)

        return {
            "outputs_class": torch.stack(tr["logits"]) if isinstance(tr["logits"], list)
                             else tr["logits"],                # (L,B,T,Q,1)
            "outputs_coord": torch.stack(tr["coords"]) if isinstance(tr["coords"], list)
                             else tr["coords"],
            "formatcher_layers": torch.stack(tr["shuffled"]),  # (L,B,T,Q,h2,w2)
            "pred_masks_layers": torch.stack(pred_masks_layers),
            "pred_masks_low_layers": torch.stack(pred_low_layers),
            "ls_features": ls_features.reshape(b, t, -1, h2, w2),  # (B,T,12,h2,w2)
        }
