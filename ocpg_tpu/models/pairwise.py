"""BoxInst pairwise color-similarity machinery (opt-in).

Reference: /root/reference/models/segmentation.py:358-513 —
`unfold_wo_center` / `unfold_w_center` (:358-401), `compute_pairwise_term`
(:402-428), `compute_pairwise_term_neighbor` (:430-458),
`get_images_color_similarity` (:460-470), `get_neighbor_images_color_similarity`
(:472-483), `get_neighbor_images_patch_color_similarity` (:485-500),
`transform_images` (:502-510).

Upstream status: these functions are imported by criterion.py:11 but the only
call-sites live in the `__main__` playground (segmentation.py:515-555); the
`--supervision_type boxinst|boxlevelset|boxvos` flag the recipe scripts pass
does not exist in opts.py, so the reference boxinst recipes die in argparse —
the machinery is dead code upstream.  Here it is a working OPT-IN loss knob
(`OCPGConfig.pairwise_loss`): the spatial BoxInst pairwise term plus the
playground's temporal-neighbor terms, wired into the criterion at the
1/2-resolution mask scale.  Parity with the torch formulation is pinned by
tests/test_pairwise.py against an F.unfold-based oracle.

TPU notes: `F.unfold` becomes a static stack of shifted slices (k**2 = 9
slices for the k=3 kernels used everywhere) — XLA fuses the pad+slice+stack
into the consuming elementwise ops, so no gather is materialized.  rgb2lab is
a closed-form per-pixel map (sRGB inverse gamma -> XYZ matmul -> cube-root
spline) and runs on-device in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def unfold_w_center(x: Array, kernel_size: int, dilation: int) -> Array:
    """(B, C, H, W) -> (B, C, k*k, H, W) patch stack, SAME zero padding.

    Patch index runs row-major over (ky, kx) exactly like torch F.unfold
    (reference segmentation.py:383-401); index k*k//2 is the center pixel.
    """
    assert kernel_size % 2 == 1
    b, c, h, w = x.shape
    pad = (kernel_size + (dilation - 1) * (kernel_size - 1)) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    slices = [
        jax.lax.dynamic_slice(xp, (0, 0, ky * dilation, kx * dilation), (b, c, h, w))
        for ky in range(kernel_size)
        for kx in range(kernel_size)
    ]
    return jnp.stack(slices, axis=2)


def unfold_wo_center(x: Array, kernel_size: int, dilation: int) -> Array:
    """unfold_w_center with the center patch removed (segmentation.py:358-381):
    (B, C, H, W) -> (B, C, k*k - 1, H, W)."""
    u = unfold_w_center(x, kernel_size, dilation)
    size = kernel_size ** 2
    return jnp.concatenate([u[:, :, : size // 2], u[:, :, size // 2 + 1:]], axis=2)


def compute_pairwise_term(mask_logits: Array, pairwise_size: int,
                          pairwise_dilation: int) -> Array:
    """-log P(center and neighbor predict the same label), per neighbor.

    Reference segmentation.py:402-428.  mask_logits: (B, 1, H, W) ->
    (B, k*k - 1, H, W).  P(same) = p_i p_j + (1-p_i)(1-p_j), evaluated in log
    space (the torch max-trick is jnp.logaddexp).
    """
    assert mask_logits.ndim == 4
    log_fg = jax.nn.log_sigmoid(mask_logits)
    log_bg = jax.nn.log_sigmoid(-mask_logits)
    log_fg_unfold = unfold_wo_center(log_fg, pairwise_size, pairwise_dilation)
    log_bg_unfold = unfold_wo_center(log_bg, pairwise_size, pairwise_dilation)
    log_same_fg = log_fg[:, :, None] + log_fg_unfold
    log_same_bg = log_bg[:, :, None] + log_bg_unfold
    log_same = jnp.logaddexp(log_same_fg, log_same_bg)
    return -log_same[:, 0]


def compute_pairwise_term_neighbor(mask_logits: Array,
                                   mask_logits_neighbor: Array,
                                   pairwise_size: int,
                                   pairwise_dilation: int) -> Array:
    """Temporal variant (segmentation.py:430-458): the center probability
    comes from the NEIGHBOR frame, patches (center kept) from the current
    frame.  (B, 1, H, W) x2 -> (B, k*k, H, W)."""
    assert mask_logits.ndim == 4
    log_fg_neigh = jax.nn.log_sigmoid(mask_logits_neighbor)
    log_bg_neigh = jax.nn.log_sigmoid(-mask_logits_neighbor)
    log_fg_unfold = unfold_w_center(jax.nn.log_sigmoid(mask_logits),
                                    pairwise_size, pairwise_dilation)
    log_bg_unfold = unfold_w_center(jax.nn.log_sigmoid(-mask_logits),
                                    pairwise_size, pairwise_dilation)
    log_same_fg = log_fg_neigh[:, :, None] + log_fg_unfold
    log_same_bg = log_bg_neigh[:, :, None] + log_bg_unfold
    log_same = jnp.logaddexp(log_same_fg, log_same_bg)
    return -log_same[:, 0]


def get_images_color_similarity(images: Array, kernel_size: int,
                                dilation: int) -> Array:
    """exp(-0.5 * ||lab_center - lab_neighbor||) per non-center neighbor
    (segmentation.py:460-470).  images: (B, C, H, W) -> (B, k*k - 1, H, W)."""
    unfolded = unfold_wo_center(images, kernel_size, dilation)
    diff = images[:, :, None] - unfolded
    return jnp.exp(-jnp.linalg.norm(diff, axis=1) * 0.5)


def get_neighbor_images_color_similarity(images: Array, images_neighbor: Array,
                                         kernel_size: int, dilation: int) -> Array:
    """Cross-frame color similarity, center kept (segmentation.py:472-483):
    (B, C, H, W) x2 -> (B, k*k, H, W)."""
    unfolded = unfold_w_center(images, kernel_size, dilation)
    diff = images_neighbor[:, :, None] - unfolded
    return jnp.exp(-jnp.linalg.norm(diff, axis=1) * 0.5)


def get_neighbor_images_patch_color_similarity(images: Array,
                                               images_neighbor: Array,
                                               kernel_size: int,
                                               dilation: int) -> Array:
    """Patch-level cross-frame similarity (segmentation.py:485-500): both
    frames are unfolded with dilation 1 (the reference hardcodes 1 and ignores
    the arg — replicated), channels x patches flattened, then the k=3 d=3
    neighbor similarity of the patch descriptors.  -> (B, 9, H, W)."""
    del dilation  # reference :489,492 passes `1 #dilation`
    unfolded = unfold_w_center(images, kernel_size, 1)
    unfolded_neighbor = unfold_w_center(images_neighbor, kernel_size, 1)
    b, c, kk, h, w = unfolded.shape
    return get_neighbor_images_color_similarity(
        unfolded.reshape(b, c * kk, h, w),
        unfolded_neighbor.reshape(b, c * kk, h, w), 3, 3)


# -- color space --------------------------------------------------------------

# sRGB -> XYZ (D65) matrix and white point, as used by skimage.color.rgb2lab
# (the reference's transform_images, segmentation.py:502-510).
_RGB2XYZ = jnp.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], jnp.float32)
_D65_WHITE = jnp.array([0.95047, 1.0, 1.08883], jnp.float32)


def rgb2lab(rgb: Array) -> Array:
    """CIE-Lab from sRGB in [0, 1]; channels-last (..., 3) -> (..., 3).

    Matches skimage.color.rgb2lab (D65, 2-degree observer) to f32 precision:
    inverse sRGB gamma, linear map to XYZ, cube-root spline, Lab affine.
    """
    rgb = rgb.astype(jnp.float32)
    linear = jnp.where(rgb > 0.04045,
                       ((rgb + 0.055) / 1.055) ** 2.4,
                       rgb / 12.92)
    xyz = linear @ _RGB2XYZ.T
    t = xyz / _D65_WHITE
    f = jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)
    lab = jnp.stack([
        116.0 * f[..., 1] - 16.0,
        500.0 * (f[..., 0] - f[..., 1]),
        200.0 * (f[..., 1] - f[..., 2]),
    ], axis=-1)
    return lab


def normalized_rgb_to_lab(img_norm: Array) -> Array:
    """De-normalize ImageNet-normalized RGB and convert to Lab, replicating
    transform_images (segmentation.py:502-510) incl. its uint8 quantization
    (`.byte()` before rgb2lab).  img_norm: (..., 3) -> (..., 3) Lab f32."""
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

    rgb = (img_norm * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)) * 255.0
    rgb = jnp.clip(rgb, 0.0, 255.0).astype(jnp.uint8)  # torch .byte() trunc+wrap; clip is saner
    return rgb2lab(rgb.astype(jnp.float32) / 255.0)


# -- criterion composition -----------------------------------------------------

def pairwise_losses(mask_logits: Array, img_norm: Array, box_region: Array,
                    color_thresh: float = 0.05) -> dict:
    """The playground's BoxInst loss composition (segmentation.py:515-555).

    mask_logits: (B, T, H, W) matched mask logits (1/2-res scale here);
    img_norm: (B, T, H, W, 3) ImageNet-normalized RGB at the same scale (the
    criterion feeds the ls_features image channels); box_region: (B, T, H, W)
    binary box-target masks.

    Spatial term (per frame, k=3 d=2): pairwise term weighted by
    (lab similarity >= 0.05) & box region, playground :463-465 semantics.
    Temporal terms: frames in triplets (ii, ii+1, ii+2) with stride 3
    (playground :536-538), patch color similarity k=3 d=3, weights gated by
    the box region being present in >1 frame of the clip (:546-548); each
    pair normalized by its own weight mass then averaged.  Frames beyond the
    last full triplet contribute only the spatial term (the playground
    indexes out of bounds there — it only ever ran at T=3).
    """
    b, t, h, w = mask_logits.shape
    lab = normalized_rgb_to_lab(img_norm)                    # (B, T, H, W, 3)
    lab_f = lab.reshape(b * t, h, w, 3).transpose(0, 3, 1, 2)
    logits_f = mask_logits.reshape(b * t, 1, h, w).astype(jnp.float32)
    region_f = box_region.reshape(b * t, 1, h, w)

    sim = get_images_color_similarity(lab_f, 3, 2)           # (BT, 8, H, W)
    pw = compute_pairwise_term(logits_f, 3, 2)               # (BT, 8, H, W)
    weights = (sim >= color_thresh).astype(jnp.float32) * region_f
    loss_sp = (pw * weights).sum() / jnp.clip(weights.sum(), 1.0, None)
    out = {"loss_pairwise": loss_sp}

    if t < 3:
        out["loss_pairwise_neighbor"] = jnp.zeros((), jnp.float32)
        return out

    # box region present in more than one frame of the clip (:546-548)
    region_sum = (box_region.sum(axis=1, keepdims=True) > 1.0).astype(jnp.float32)

    terms = []
    lab_bt = lab.transpose(0, 1, 4, 2, 3)                    # (B, T, 3, H, W)
    logits_b = mask_logits[:, :, None].astype(jnp.float32)   # (B, T, 1, H, W)
    for ii in range(0, t - 2, 3):
        for (i, j) in ((ii, ii + 1), (ii, ii + 2), (ii + 1, ii + 2)):
            psim = get_neighbor_images_patch_color_similarity(
                lab_bt[:, i], lab_bt[:, j], 3, 3)            # (B, 9, H, W)
            pwn = compute_pairwise_term_neighbor(
                logits_b[:, i], logits_b[:, j], 3, 3)        # (B, 9, H, W)
            wn = (psim >= color_thresh).astype(jnp.float32) * region_sum[:, 0:1]
            terms.append((pwn * wn).sum() / jnp.clip(wn.sum(), 1.0, None))
    out["loss_pairwise_neighbor"] = sum(terms) / len(terms)
    return out
