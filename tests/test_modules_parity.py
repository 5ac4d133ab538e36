"""Module-level numerical parity vs torch implementations of the reference
formulas (modules.py LFM, segmentation.py VL fusion, position_encoding.py,
backbone.py FrozenBN, ocpg.py dynamic conv)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def test_frozen_batchnorm_matches(rng):
    from ocpg_tpu.models.layers import FrozenBatchNorm

    c = 8
    x = rng.standard_normal((2, 5, 6, c)).astype(np.float32)
    weight = rng.standard_normal(c).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = rng.random(c).astype(np.float32) + 0.1

    mod = FrozenBatchNorm(c)
    out = mod.apply({"frozen": {"weight": weight, "bias": bias,
                                "running_mean": mean, "running_var": var}},
                    jnp.asarray(x))
    # torch formula (backbone.py:46-56)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    scale = torch.from_numpy(weight) * (torch.from_numpy(var) + 1e-5).rsqrt()
    shift = torch.from_numpy(bias) - torch.from_numpy(mean) * scale
    expected = (xt * scale[None, :, None, None] + shift[None, :, None, None]).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), expected.numpy(), rtol=1e-5, atol=1e-6)


def test_sine_2d_position_encoding_matches(rng):
    from ocpg_tpu.models.position_encoding import position_embedding_sine_2d

    mask = np.zeros((2, 9, 11), bool)
    mask[:, :, -3:] = True
    got = np.asarray(position_embedding_sine_2d(jnp.asarray(mask), num_pos_feats=16))

    import math

    not_mask = ~torch.from_numpy(mask)
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(16, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / 16)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
    expected = torch.cat((pos_y, pos_x), dim=3).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_sine_1d_position_encoding_matches(rng):
    from ocpg_tpu.models.position_encoding import position_embedding_sine_1d

    import math

    mask = np.zeros((2, 7), bool)
    mask[:, -2:] = True
    got = np.asarray(position_embedding_sine_1d(jnp.asarray(mask), num_pos_feats=8))
    not_mask = ~torch.from_numpy(mask)
    x_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = x_embed / (x_embed[:, -1:] + 1e-6) * (2 * math.pi)
    dim_t = torch.arange(8, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / 8)
    pos_x = x_embed[:, :, None] / dim_t
    expected = torch.stack((pos_x[:, :, 0::2].sin(), pos_x[:, :, 1::2].cos()), dim=3).flatten(2).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_multihead_attention_matches_torch(rng):
    from ocpg_tpu.models.layers import MultiheadAttention

    c, h, lq, lk, b = 16, 4, 5, 7, 2
    q = rng.standard_normal((b, lq, c)).astype(np.float32)
    k = rng.standard_normal((b, lk, c)).astype(np.float32)
    v = rng.standard_normal((b, lk, c)).astype(np.float32)
    pad = np.zeros((b, lk), bool)
    pad[:, -2:] = True

    tm = tnn.MultiheadAttention(c, h, dropout=0.0, batch_first=True)
    tm.eval()
    with torch.no_grad():
        expected = tm(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
                      key_padding_mask=torch.from_numpy(pad))[0].numpy()

    w = tm.in_proj_weight.detach().numpy()       # (3C, C)
    bb = tm.in_proj_bias.detach().numpy()
    params = {"params": {
        "q_proj": {"kernel": w[:c].T, "bias": bb[:c]},
        "k_proj": {"kernel": w[c:2 * c].T, "bias": bb[c:2 * c]},
        "v_proj": {"kernel": w[2 * c:].T, "bias": bb[2 * c:]},
        "out_proj": {"kernel": tm.out_proj.weight.detach().numpy().T,
                     "bias": tm.out_proj.bias.detach().numpy()},
    }}
    got = MultiheadAttention(h).apply(params, jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v), key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_lfm_matches_torch_formula(rng):
    from ocpg_tpu.models.cross_modal import LFM

    c, b, hh, ww = 8, 2, 10, 12
    x = rng.standard_normal((b, hh, ww, c)).astype(np.float32)
    mod = LFM(c, sigma=7.0)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got, high_filter = mod.apply(variables, jnp.asarray(x))

    p = variables["params"]

    # torch replica of modules.py:33-61
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    lap_w = torch.from_numpy(np.asarray(p["laplace"]["kernel"])).permute(3, 2, 0, 1)
    lap_b = torch.from_numpy(np.asarray(p["laplace"]["bias"]))
    coef = F.conv2d(xt, lap_w, lap_b, padding=0)
    coef = coef.mean(dim=(2, 3))
    coef = coef @ torch.from_numpy(np.asarray(p["fc1"]["kernel"]))
    coef = F.relu(coef)
    coef = coef @ torch.from_numpy(np.asarray(p["fc2"]["kernel"]))
    coef = torch.sigmoid(coef)[:, :, None, None]

    y = torch.fft.fft2(xt)
    yv, xv = torch.meshgrid(torch.arange(hh).float(), torch.arange(ww).float(), indexing="ij")
    g = torch.exp(-((yv - hh // 2) ** 2 + (xv - ww // 2) ** 2) / (2 * 7.0**2))[None, None]
    y = y * (1 - coef * g)
    y_f = torch.cat([y.real, y.imag], dim=1)
    w1 = torch.from_numpy(np.asarray(p["conv1"]["kernel"])).permute(3, 2, 0, 1)
    b1 = torch.from_numpy(np.asarray(p["conv1"]["bias"]))
    w2 = torch.from_numpy(np.asarray(p["conv2"]["kernel"])).permute(3, 2, 0, 1)
    b2 = torch.from_numpy(np.asarray(p["conv2"]["bias"]))
    y_f = F.relu(F.conv2d(y_f, w1, b1))
    y_f = F.conv2d(y_f, w2, b2)
    y_r, y_i = torch.chunk(y_f, 2, dim=1)
    y = torch.complex(y_r, y_i)
    y = torch.fft.ifft2(y, s=(hh, ww)).real
    expected = (xt + y).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


def test_dynamic_conv_matches_torch_grouped_conv(rng):
    from ocpg_tpu.models.mask_head import apply_dynamic_conv, dynamic_params_layout

    n_inst, hh, ww, cin, ch = 3, 6, 7, 10, 4
    weight_nums, bias_nums = dynamic_params_layout(cin - 2, ch, 2, rel_coord=True)
    num_params = sum(weight_nums) + sum(bias_nums)
    feats = rng.standard_normal((n_inst, hh, ww, cin)).astype(np.float32)
    params = rng.standard_normal((n_inst, num_params)).astype(np.float32)

    got = np.asarray(apply_dynamic_conv(jnp.asarray(feats), jnp.asarray(params),
                                        ch, weight_nums, bias_nums))

    # torch grouped-conv replica (ocpg.py:531-569)
    pt = torch.from_numpy(params)
    splits = list(torch.split_with_sizes(pt, weight_nums + bias_nums, dim=1))
    ws = [splits[0].reshape(n_inst * ch, -1, 1, 1), splits[1].reshape(n_inst * ch, -1, 1, 1)]
    bs = [splits[2].reshape(n_inst * ch), splits[3].reshape(n_inst * ch)]
    x = torch.from_numpy(feats).permute(0, 3, 1, 2).reshape(1, -1, hh, ww)
    x = F.conv2d(x, ws[0], bs[0], groups=n_inst)
    x = F.relu(x)
    x = F.conv2d(x, ws[1], bs[1], groups=n_inst)
    expected = x.reshape(n_inst, ch, hh, ww).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_dynamic_conv_shared_matches_naive(rng):
    """apply_dynamic_conv_shared (first-layer memory/rel split, no Q-fold
    broadcast) must equal apply_dynamic_conv on the concatenated input."""
    from ocpg_tpu.models.mask_head import (
        apply_dynamic_conv, apply_dynamic_conv_shared, dynamic_params_layout)

    g, q, hh, ww, c, ch = 2, 3, 6, 7, 8, 4
    for rel_coord in (True, False):
        weight_nums, bias_nums = dynamic_params_layout(c, ch, 2, rel_coord)
        num_params = sum(weight_nums) + sum(bias_nums)
        mem = rng.standard_normal((g, hh, ww, c)).astype(np.float32)
        rel = rng.standard_normal((g, q, hh, ww, 2)).astype(np.float32)
        params = rng.standard_normal((g, q, num_params)).astype(np.float32)

        got = np.asarray(apply_dynamic_conv_shared(
            jnp.asarray(mem), jnp.asarray(rel), jnp.asarray(params),
            ch, weight_nums, bias_nums))

        mem_q = np.broadcast_to(mem[:, None], (g, q, hh, ww, c))
        feats = (np.concatenate([mem_q, rel], axis=-1) if rel_coord
                 else mem_q).reshape(g * q, hh, ww, -1)
        want = np.asarray(apply_dynamic_conv(
            jnp.asarray(feats), jnp.asarray(params.reshape(g * q, num_params)),
            ch, weight_nums, bias_nums)).reshape(g, q, hh, ww, ch)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mso_shared_queries_matches_per_query_loop(rng):
    """MSO's split-conv shared-feature path (queries=Q) must equal running
    the plain path per query with replicated features (the reference's loop
    at ocpg.py:457-465)."""
    import jax

    from ocpg_tpu.models.mask_head import MSO

    g, q, h8, w8, mc = 2, 3, 8, 10, 16
    dims = (24, 40)
    mso = MSO(mask_dim=mc, img_dims=dims, dtype=jnp.float32)
    pm = rng.standard_normal((g * q, h8, w8, mc)).astype(np.float32)
    f8 = rng.standard_normal((g, h8, w8, dims[1])).astype(np.float32)
    f4 = rng.standard_normal((g, 2 * h8, 2 * w8, dims[0])).astype(np.float32)

    params = mso.init(jax.random.PRNGKey(0), jnp.asarray(pm),
                      jnp.asarray(f4), jnp.asarray(f8), q)
    got = np.asarray(mso.apply(params, jnp.asarray(pm), jnp.asarray(f4),
                               jnp.asarray(f8), q))

    f4_rep = np.repeat(f4, q, axis=0)
    f8_rep = np.repeat(f8, q, axis=0)
    want = np.asarray(mso.apply(params, jnp.asarray(pm), jnp.asarray(f4_rep),
                                jnp.asarray(f8_rep), 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
