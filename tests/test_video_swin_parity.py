"""Video-Swin backbone parity: torch block replica vs SwinBlock3D, and the
2D->3D checkpoint inflation (reference video_swin_transformer.py:563-614)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ocpg_tpu.models.backbone_video_swin import (SwinBlock3D,
                                                 _relative_position_index,
                                                 _sw_attn_mask)
from ocpg_tpu.utils.torch_weights import (_inflate_bias_table, _linear, _ln,
                                          _t, convert_video_swin)


def _torch_swin_block(x, sd, window_size, shift, num_heads):
    """Original torch implementation of one 3D shifted-window block with
    reference semantics (video_swin_transformer.py:172-274)."""
    import torch.nn.functional as F

    b, t, h, w, c = x.shape
    dims = (t, h, w)
    ws = list(window_size)
    ss = [s // 2 for s in window_size] if shift else [0, 0, 0]
    for i in range(3):
        if dims[i] <= ws[i]:
            ws[i] = dims[i]
            ss[i] = 0
    ws, ss = tuple(ws), tuple(ss)

    shortcut = x
    x = F.layer_norm(x, (c,), sd["norm1.weight"], sd["norm1.bias"], eps=1e-5)
    pads = [(ws[i] - dims[i] % ws[i]) % ws[i] for i in range(3)]
    x = F.pad(x, (0, 0, 0, pads[2], 0, pads[1], 0, pads[0]))
    tp, hp, wp = x.shape[1:4]
    if any(ss):
        x = torch.roll(x, shifts=(-ss[0], -ss[1], -ss[2]), dims=(1, 2, 3))
        mask = torch.from_numpy(_sw_attn_mask(tp, hp, wp, ws, ss))
    else:
        mask = None

    n = ws[0] * ws[1] * ws[2]
    xw = x.view(b, tp // ws[0], ws[0], hp // ws[1], ws[1], wp // ws[2], ws[2], c)
    xw = xw.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, n, c)

    qkv = xw @ sd["attn.qkv.weight"].T + sd["attn.qkv.bias"]
    bw = xw.shape[0]
    nh = num_heads
    dh = c // nh
    qkv = qkv.view(bw, n, 3, nh, dh).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * dh ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    # full-window table sliced to the effective window, as the reference
    # (video_swin_transformer.py:152-154): index[:N, :N] into the full table
    idx = torch.from_numpy(
        _relative_position_index(window_size)[:n, :n]).reshape(-1)
    bias = sd["attn.relative_position_bias_table"][idx].view(n, n, nh)
    attn = attn + bias.permute(2, 0, 1)[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.view(bw // nw, nw, nh, n, n) + mask[None, :, None]
        attn = attn.view(bw, nh, n, n)
    attn = attn.softmax(-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(bw, n, c)
    out = out @ sd["attn.proj.weight"].T + sd["attn.proj.bias"]

    out = out.view(b, tp // ws[0], hp // ws[1], wp // ws[2], ws[0], ws[1], ws[2], c)
    out = out.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)
    if any(ss):
        out = torch.roll(out, shifts=ss, dims=(1, 2, 3))
    out = out[:, :t, :h, :w]
    x = shortcut + out

    y = F.layer_norm(x, (c,), sd["norm2.weight"], sd["norm2.bias"], eps=1e-5)
    y = F.gelu(y @ sd["mlp.fc1.weight"].T + sd["mlp.fc1.bias"])
    y = y @ sd["mlp.fc2.weight"].T + sd["mlp.fc2.bias"]
    return x + y


@pytest.mark.parametrize("shift", [False, True])
def test_swin_block3d_matches_torch(rng, shift):
    b, t, h, w, c = 1, 4, 6, 6, 16
    nh = 2
    ws = (2, 3, 3)
    g = torch.Generator().manual_seed(3)
    table_rows = (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1)
    sd = {
        "norm1.weight": torch.randn(c, generator=g) * 0.1 + 1,
        "norm1.bias": torch.randn(c, generator=g) * 0.1,
        "attn.qkv.weight": torch.randn(3 * c, c, generator=g) * 0.1,
        "attn.qkv.bias": torch.randn(3 * c, generator=g) * 0.1,
        "attn.proj.weight": torch.randn(c, c, generator=g) * 0.1,
        "attn.proj.bias": torch.randn(c, generator=g) * 0.1,
        "attn.relative_position_bias_table": torch.randn(table_rows, nh, generator=g) * 0.1,
        "norm2.weight": torch.randn(c, generator=g) * 0.1 + 1,
        "norm2.bias": torch.randn(c, generator=g) * 0.1,
        "mlp.fc1.weight": torch.randn(4 * c, c, generator=g) * 0.1,
        "mlp.fc1.bias": torch.randn(4 * c, generator=g) * 0.1,
        "mlp.fc2.weight": torch.randn(c, 4 * c, generator=g) * 0.1,
        "mlp.fc2.bias": torch.randn(4 * c // 4, generator=g) * 0.1,
    }
    x = torch.randn(b, t, h, w, c, generator=g)
    with torch.no_grad():
        expected = _torch_swin_block(x, sd, ws, shift, nh).numpy()

    params = {
        "norm1": _ln(sd, "norm1"),
        "norm2": _ln(sd, "norm2"),
        "attn": {
            "qkv": _linear(sd, "attn.qkv"),
            "proj": _linear(sd, "attn.proj"),
            "relative_position_bias_table": _t(sd["attn.relative_position_bias_table"]),
        },
        "mlp_fc1": _linear(sd, "mlp.fc1"),
        "mlp_fc2": _linear(sd, "mlp.fc2"),
    }
    block = SwinBlock3D(dim=c, num_heads=nh, window_size=ws, shift=shift)
    got = block.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5, rtol=1e-4)


def test_bias_table_inflation_tiles_temporally():
    """(2*7-1)^2 2D table -> tiled (2*wt-1) times, temporal offset slowest
    (reference repeat(2*wd-1, 1), video_swin_transformer.py:608)."""
    nh = 3
    table2d = np.arange(169 * nh, dtype=np.float32).reshape(169, nh)
    out = _inflate_bias_table(table2d, (8, 7, 7))
    assert out.shape == (15 * 169, nh)
    for rep in range(15):
        np.testing.assert_array_equal(out[rep * 169:(rep + 1) * 169], table2d)
    # already-3D tables pass through verbatim
    table3d = np.zeros((15 * 169, nh), np.float32)
    assert _inflate_bias_table(table3d, (8, 7, 7)) is table3d


def test_bias_table_inflation_bicubic_resize():
    """A 2D table from a different window (e.g. 12x12 -> 23x23 grid) is
    bicubic-resized to (2*wh-1, 2*ww-1) then tiled."""
    nh = 2
    s1 = 23
    table = np.random.default_rng(0).standard_normal((s1 * s1, nh)).astype(np.float32)
    out = _inflate_bias_table(table, (8, 7, 7))
    assert out.shape == (15 * 169, nh)
    # equals torch's own bicubic on the grid
    import torch.nn.functional as F

    t = torch.from_numpy(table).permute(1, 0).view(1, nh, s1, s1)
    exp = F.interpolate(t, size=(13, 13), mode="bicubic").view(nh, 169).permute(1, 0).numpy()
    np.testing.assert_allclose(out[:169], exp, rtol=1e-6)
    np.testing.assert_allclose(out[169:338], exp, rtol=1e-6)


@pytest.mark.parametrize("depths,embed", [((2, 2, 6, 2), 96), ((2, 2, 18, 2), 128)])
def test_convert_video_swin_2d_checkpoint_roundtrip(depths, embed):
    """Shape roundtrip: a synthetic 2D (ImageNet-style) checkpoint converts
    into a tree the VideoSwin module accepts, incl. inflated bias tables."""
    heads = [embed // 32 * (2 ** i) for i in range(4)]
    sd = {
        "patch_embed.proj.weight": torch.zeros(embed, 3, 4, 4),
        "patch_embed.proj.bias": torch.zeros(embed),
        "patch_embed.norm.weight": torch.ones(embed),
        "patch_embed.norm.bias": torch.zeros(embed),
    }
    for s, depth in enumerate(depths):
        dim = embed * 2 ** s
        for i in range(depth):
            lp = f"layers.{s}.blocks.{i}"
            sd.update({
                f"{lp}.norm1.weight": torch.ones(dim), f"{lp}.norm1.bias": torch.zeros(dim),
                f"{lp}.norm2.weight": torch.ones(dim), f"{lp}.norm2.bias": torch.zeros(dim),
                f"{lp}.attn.qkv.weight": torch.zeros(3 * dim, dim),
                f"{lp}.attn.qkv.bias": torch.zeros(3 * dim),
                f"{lp}.attn.proj.weight": torch.zeros(dim, dim),
                f"{lp}.attn.proj.bias": torch.zeros(dim),
                f"{lp}.attn.relative_position_bias_table": torch.zeros(169, heads[s]),
                f"{lp}.mlp.fc1.weight": torch.zeros(4 * dim, dim),
                f"{lp}.mlp.fc1.bias": torch.zeros(4 * dim),
                f"{lp}.mlp.fc2.weight": torch.zeros(dim, 4 * dim),
                f"{lp}.mlp.fc2.bias": torch.zeros(dim),
            })
        if s < 3:
            sd[f"layers.{s}.downsample.norm.weight"] = torch.ones(4 * dim)
            sd[f"layers.{s}.downsample.norm.bias"] = torch.zeros(4 * dim)
            sd[f"layers.{s}.downsample.reduction.weight"] = torch.zeros(2 * dim, 4 * dim)
    params = convert_video_swin(sd, depths, window_size=(8, 7, 7))
    assert params["patch_embed"]["kernel"].shape == (4, 4, 3, embed)
    for s, depth in enumerate(depths):
        for i in range(depth):
            tbl = params[f"stage{s}_block{i}"]["attn"]["relative_position_bias_table"]
            assert tbl.shape == (15 * 169, heads[s])


def test_swin_convert_spec_covers_all_registered_backbones():
    """convert_ocpg's swin dispatch must resolve every registered swin name:
    video variants get window (8,7,7) + temporal bias tiling; 2D variants get
    (1,7,7) so the (2*7-1)^2-row tables pass through un-tiled (a video-config
    lookup for a 2D name used to KeyError — regression)."""
    from ocpg_tpu.models.backbone_swin2d import _CONFIGS as CFG2D
    from ocpg_tpu.models.backbone_video_swin import _CONFIGS as CFG3D
    from ocpg_tpu.utils.torch_weights import _inflate_bias_table, swin_convert_spec

    for name, cfg in {**CFG3D, **CFG2D}.items():
        depths, window = swin_convert_spec(name)
        assert depths == tuple(cfg["depths"]), name
        assert window == ((8, 7, 7) if name.startswith("video") else (1, 7, 7)), name

    # 2D table through the 2D window: un-tiled; through the 3D window: 15x rows
    table = np.arange(169 * 4, dtype=np.float32).reshape(169, 4)
    np.testing.assert_array_equal(
        _inflate_bias_table(table, swin_convert_spec("swin_b_p4w7")[1]), table)
    assert _inflate_bias_table(
        table, swin_convert_spec("video_swin_b_p4w7")[1]).shape == (15 * 169, 4)
