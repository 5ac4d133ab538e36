"""OCPG top-level model (flax.linen, NHWC, frames-in-batch).

Reference: /root/reference/models/ocpg.py:35-549.  Pipeline per forward:
backbone -> text encoder -> per-level {input_proj -> LFM -> VL-fusion -> LFM}
-> deformable transformer -> class/box heads -> dynamic-conv mask head
(patch logits, pixel-shuffled for the matcher) -> matcher (train) or
best-query selection (eval) -> MSO refinement -> x4 upsample.

TPU-first notes:
  * Frames ride the batch dimension exactly as the reference
    (`backbone.py:111`): every per-frame module sees (B*T, H, W, C); B*T is
    the natural data-parallel shard axis.
  * The matcher runs *inside* the jitted forward under stop_gradient — it is
    an argmin over queries (matcher.py:166-168), not a host Hungarian solve.
  * Static shapes: a fixed padded canvas per resolution bucket; per-image
    validity is carried by the bool pad mask (NestedTensor equivalent).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import OCPGConfig
from ..ops.image import bicubic_resize, bilinear_resize, nearest_resize, pixel_shuffle
from .backbone_resnet import build_resnet
from .cross_modal import LFM, VisionLanguageFusion
from .deformable_transformer import DeformableTransformer
from .layers import MLP, FeatureResizer, inverse_sigmoid, xavier_uniform
from .mask_head import (MSO, apply_dynamic_conv_shared, compute_locations,
                        dynamic_params_layout)
from .matcher import MatcherConfig, match
from .position_encoding import position_embedding_sine_1d, position_embedding_sine_2d
from .text_encoder import RobertaConfig, RobertaEncoder

Array = jax.Array


def _class_bias_init(num_classes: int):
    prior_prob = 0.01
    bias_value = -math.log((1 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, bias_value, dtype)

    return init


class OCPG(nn.Module):
    cfg: OCPGConfig

    def _compute_dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    @nn.compact
    def __call__(
        self,
        samples: Array,            # (B, T, H, W, 3) normalized frames
        samples_mask: Array,       # (B, T, H, W) bool, True = padding
        text_ids: Array,           # (B, Lt) int32
        text_attn_mask: Array,     # (B, Lt) int32, 1 = real token
        sizes: Array,              # (B, 2) actual (h, w) per video
        targets: Optional[Dict[str, Array]] = None,  # train: labels/boxes/valid/masks/...
        valid_indices: Optional[Array] = None,       # (B,) annotated frame (a2d/jhmdb)
        *,
        # (B,) int32: >=0 forces that decoder query in the DAVIS/YTVOS eval
        # branch (cross-chunk-consistent selection — the reference's
        # whole-video forward picks ONE query globally, inference_ytvos.py:
        # 198-213); -1 keeps the per-forward argmax.  Ignored by the other
        # branches.
        query_override: Optional[Array] = None,
        train: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, Array]:
        cfg = self.cfg
        dtype = self._compute_dtype()
        b, t_in, H, W, _ = samples.shape
        hidden = cfg.hidden_dim
        nq = cfg.num_queries

        # ---------------- visual backbone (frames in batch dim) ----------------
        frames = samples.reshape(b * t_in, H, W, 3).astype(dtype)
        frames_mask = samples_mask.reshape(b * t_in, H, W)
        if cfg.backbone in ("resnet50", "resnet101"):
            backbone = build_resnet(cfg.backbone, cfg.dilation, dtype=dtype, name="backbone")
        elif cfg.backbone.startswith("video_swin"):
            from .backbone_video_swin import build_video_swin

            backbone = build_video_swin(cfg.backbone, dtype=dtype, name="backbone",
                                        use_checkpoint=cfg.use_checkpoint,
                                        num_frames=t_in,
                                        attn_impl=cfg.swin_attn_impl)
        elif cfg.backbone.startswith("swin"):
            from .backbone_swin2d import build_swin_2d

            backbone = build_swin_2d(cfg.backbone, dtype=dtype, name="backbone",
                                     use_checkpoint=cfg.use_checkpoint,
                                     attn_impl=cfg.swin_attn_impl)
        else:
            raise NotImplementedError(cfg.backbone)
        feats = list(backbone(frames))

        # A2D/JHMDB: only one annotated frame per clip (ocpg.py:226-235)
        if valid_indices is not None:
            sel = jnp.arange(b) * t_in + valid_indices
            feats = [f[sel] for f in feats]
            frames = frames[sel]
            frames_mask = frames_mask[sel]
            t = 1
        else:
            t = t_in
        bt = b * t

        feat_masks = [
            nearest_resize(frames_mask[..., None].astype(jnp.float32), (f.shape[1], f.shape[2]))[..., 0] > 0.5
            for f in feats
        ]
        visual_pos = [
            position_embedding_sine_2d(m, num_pos_feats=hidden // 2).astype(dtype)
            for m in feat_masks
        ]

        # ---------------- text encoder ----------------
        rcfg = RobertaConfig(
            vocab_size=cfg.text_vocab, hidden_size=cfg.text_hidden,
            num_layers=cfg.text_layers, num_heads=cfg.text_heads,
            intermediate_size=cfg.text_ffn,
            max_position_embeddings=cfg.text_max_pos,
        )
        text_feat, text_pooled = RobertaEncoder(rcfg, dtype=dtype,
                                                name="text_encoder")(text_ids, text_attn_mask)
        if cfg.freeze_text_encoder:
            text_feat = jax.lax.stop_gradient(text_feat)
            text_pooled = jax.lax.stop_gradient(text_pooled)
        text_word = FeatureResizer(hidden, dropout=0.1, dtype=dtype, name="text_proj")(
            text_feat, deterministic=deterministic)                       # (B, Lt, C)
        text_sentence = FeatureResizer(hidden, dropout=0.1, dtype=dtype, name="sentence_proj")(
            text_pooled, deterministic=deterministic)                     # (B, C)
        text_pad_mask = text_attn_mask == 0
        text_pos = position_embedding_sine_1d(text_pad_mask, num_pos_feats=hidden).astype(dtype)

        # ---------------- spectrum-guided cross-modal fusion ----------------
        fusion = VisionLanguageFusion(cfg.nheads, dtype=dtype, name="fusion_module")
        srcs, masks_l, poses = [], [], []
        high_filter = None
        num_backbone_levels = 3
        for l in range(cfg.num_feature_levels):
            if l < num_backbone_levels:
                src = feats[-num_backbone_levels:][l]
                lvl_mask = feat_masks[-num_backbone_levels:][l]
                pos_l = visual_pos[-num_backbone_levels:][l]
                src = nn.Conv(hidden, (1, 1), dtype=dtype, kernel_init=xavier_uniform,
                              name=f"input_proj_{l}")(src)
            else:
                base = feats[-1] if l == num_backbone_levels else srcs[-1]
                src = nn.Conv(hidden, (3, 3), strides=(2, 2), padding=1, dtype=dtype,
                              kernel_init=xavier_uniform, name=f"input_proj_{l}")(base)
                lvl_mask = (
                    nearest_resize(frames_mask[..., None].astype(jnp.float32),
                                   (src.shape[1], src.shape[2]))[..., 0] > 0.5
                )
                pos_l = position_embedding_sine_2d(lvl_mask, num_pos_feats=hidden // 2).astype(dtype)
            src = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"input_proj_gn_{l}")(src)

            n_, h_, w_, c_ = src.shape
            src, high_filter = LFM(hidden, sigma=7.0, name=f"input_fft_{l}")(src, high_filter)
            # (b t) h w c -> b (t h w) c  (frame tokens of one video fuse with its text)
            vis_tokens = src.reshape(b, t * h_ * w_, c_)
            vis_tokens = fusion(vis_tokens, text_word, text_pad_mask, text_pos,
                                deterministic=deterministic)
            src = vis_tokens.reshape(n_, h_, w_, c_)
            src, high_filter = LFM(hidden, sigma=7.0, name=f"input_fft_post_{l}")(src, high_filter)

            srcs.append(src)
            masks_l.append(lvl_mask)
            poses.append(pos_l)

        # ---------------- deformable transformer ----------------
        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (nq, hidden))
        tgt = jnp.repeat(text_sentence[:, None, :], t, axis=1).reshape(bt, 1, hidden)
        tgt = jnp.broadcast_to(tgt, (bt, nq, hidden))

        # 'auto' is resolved eagerly by build_model (the pallas probe cannot
        # run inside an active jit trace); treat a leftover 'auto' as 'xla'.
        msda_impl = "xla" if cfg.msda_impl == "auto" else cfg.msda_impl

        tr = DeformableTransformer(
            d_model=hidden, nhead=cfg.nheads,
            num_encoder_layers=cfg.enc_layers, num_decoder_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward, dropout=cfg.dropout,
            num_feature_levels=cfg.num_feature_levels,
            dec_n_points=cfg.dec_n_points, enc_n_points=cfg.enc_n_points,
            with_box_refine=cfg.with_box_refine, dtype=dtype,
            msda_impl=msda_impl, name="transformer",
        )(srcs, tgt, masks_l, poses, query_embed, deterministic=deterministic)

        hs = tr["hs"]                                # (L, BT, Q, C)
        ldec = hs.shape[0]
        init_reference = tr["init_reference"]        # (BT, Q, 2)
        inter_references = tr["inter_references"]    # (L, BT, Q, 4)
        inter_coords = tr["inter_coords"]            # (L, BT, Q, 4) grad-carrying
        memory = tr["memory_features"]               # [8x, 16x, 32x] NHWC

        # ---------------- class / box heads (ocpg.py:310-333) ----------------
        outputs_classes = []
        outputs_coords = []
        for lvl in range(ldec):
            logits = nn.Dense(cfg.num_classes, dtype=jnp.float32,
                              bias_init=_class_bias_init(cfg.num_classes),
                              name=f"class_embed_{lvl}")(hs[lvl].astype(jnp.float32))
            outputs_classes.append(logits)
            if cfg.with_box_refine:
                outputs_coords.append(inter_coords[lvl])
            else:
                reference = init_reference if lvl == 0 else inter_references[lvl - 1]
                tmp = MLP(hidden, 4, 3, dtype=jnp.float32, name=f"bbox_embed_{lvl}")(
                    hs[lvl].astype(jnp.float32))
                tmp = tmp.at[..., :2].add(inverse_sigmoid(reference))
                outputs_coords.append(jax.nn.sigmoid(tmp))
        outputs_class = jnp.stack(outputs_classes).reshape(ldec, b, t, nq, cfg.num_classes)
        outputs_coord = jnp.stack(outputs_coords).reshape(ldec, b, t, nq, 4)

        out: Dict[str, Array] = {
            "pred_logits": outputs_class[-1],
            "pred_boxes": outputs_coord[-1],
        }

        # ---------------- segmentation (ocpg.py:336-351) ----------------
        h8, w8 = memory[0].shape[1], memory[0].shape[2]
        # bicubic in the compute dtype (bf16 under production config: one MXU
        # pass instead of fp32-HIGHEST's six), fp32 from the sum onward — the
        # dynamic-conv head and ls path stay fp32 as before
        memory_fusion = sum(
            bicubic_resize(x, (h8, w8), align_corners=False).astype(jnp.float32)
            for x in memory
        )  # (BT, h8, w8, C) fp32
        mask_dim_ch = cfg.dynamic_mask_channels
        weight_nums, bias_nums = dynamic_params_layout(
            cfg.mask_dim, mask_dim_ch, cfg.controller_layers, cfg.rel_coord)
        num_params = sum(weight_nums) + sum(bias_nums)

        # image-size scale for reference points (ocpg.py:496-503)
        scale_wh = jnp.stack([sizes[:, 1], sizes[:, 0]], axis=-1).astype(jnp.float32)  # (B, 2) xy

        locations = compute_locations(h8, w8, stride=8)  # (h8, w8, 2) xy in image coords

        # the controller MLP is shared across decoder layers (ocpg.py:343)
        controller = MLP(hidden, num_params, 3, dtype=jnp.float32, name="controller")

        patch_masks_layers = []       # (L, B, T, Q, h8, w8, 16) patch logits
        formatcher_layers = []        # (L, B, T, Q, h2, w2) pixel-shuffled
        # Eval consumes only the LAST layer's patches (reference eval branch,
        # ocpg.py:423,457 index outputs_seg_masks[-1]) and never reads the
        # pixel-shuffled formatcher maps — the reference still runs the
        # dynamic-conv head for every decoder layer in eval (:342-351); here
        # the dead layers are skipped (mf broadcast + dynamic conv are the
        # mask path's biggest HBM tenants).  patch_masks_layers[-1] stays the
        # final layer either way.
        head_lvls = range(ldec) if train else [ldec - 1]
        for lvl in head_lvls:
            params = controller(hs[lvl].astype(jnp.float32))
            params = params.reshape(b, t, nq, num_params)
            refs = inter_references[lvl][..., :2].reshape(b, t, nq, 2)
            refs = refs * scale_wh[:, None, None, :]

            if cfg.rel_coord:
                rel = refs[:, :, :, None, None, :] - locations[None, None, None]  # (B,T,Q,h8,w8,2)
                rel_g = rel.astype(jnp.float32).reshape(b * t, nq, h8, w8, 2)
            else:
                rel_g = jnp.zeros((b * t, nq, h8, w8, 2), jnp.float32)
            # first-layer input split into query-shared memory + per-query
            # rel coords — same math as the reference's per-query concat
            # (ocpg.py:506-517) without materialising the Q-fold broadcast
            # of the 256-channel memory (see apply_dynamic_conv_shared)
            mem_bt = memory_fusion.reshape(b * t, h8, w8, -1)
            patch = apply_dynamic_conv_shared(
                mem_bt, rel_g, params.reshape(b * t, nq, num_params),
                mask_dim_ch, weight_nums, bias_nums)     # (BT, Q, h8, w8, 16)
            patch_masks_layers.append(patch.reshape(b, t, nq, h8, w8, mask_dim_ch))
            if train:   # matcher/criterion input only (ocpg.py:352-366)
                shuffled = pixel_shuffle(
                    patch.reshape(b * t * nq, h8, w8, mask_dim_ch), 4)[..., 0]
                formatcher_layers.append(shuffled.reshape(b, t, nq, h8 * 4, w8 * 4))

        feat_4x = feats[0]
        feat_8x = feats[1]
        mso = MSO(mask_dim=mask_dim_ch,
                  img_dims=(feat_4x.shape[-1], feat_8x.shape[-1]),
                  dtype=dtype, name="mask_refine")

        if train:
            assert targets is not None
            matcher_cfg = MatcherConfig(
                cost_class=cfg.set_cost_class, cost_bbox=cfg.set_cost_bbox,
                cost_giou=cfg.set_cost_giou, cost_mask=cfg.set_cost_mask,
                cost_dice=cfg.set_cost_dice, num_classes=cfg.num_classes,
            )
            matched = []
            for lvl in range(ldec):
                matched.append(
                    jax.lax.stop_gradient(
                        match(matcher_cfg, outputs_class[lvl], outputs_coord[lvl],
                              formatcher_layers[lvl], targets["labels"], targets["boxes"],
                              targets["masks"], targets["valid"])
                    )
                )
            matched = jnp.stack(matched)  # (L, B)

            # level-set targets (ocpg.py:368-384)
            ls_viz = nn.Conv(8, (3, 3), padding=1, dtype=jnp.float32,
                             kernel_init=xavier_uniform, name="ls_feat_viz")(memory_fusion)
            ls_viz = bilinear_resize(ls_viz, (h8 * 4, w8 * 4), align_corners=True)  # (BT,h2,w2,8)
            txt8 = nn.Dense(8, dtype=jnp.float32, name="ls_text_proj")(
                text_sentence.astype(jnp.float32))                                   # (B, 8)
            txt8_bt = jnp.repeat(txt8, t, axis=0)[:, None, None, :]                  # (BT,1,1,8)
            dot = (ls_viz * txt8_bt).sum(-1)
            cos = (
                ls_viz / jnp.clip(jnp.linalg.norm(ls_viz, axis=-1, keepdims=True), 1e-12, None)
                * (txt8_bt / jnp.clip(jnp.linalg.norm(txt8_bt, axis=-1, keepdims=True), 1e-12, None))
            ).sum(-1)
            sim_cross = dot / (cos + 1e-5)                                            # (BT,h2,w2)
            img_ori = bilinear_resize(frames.astype(jnp.float32), (h8 * 4, w8 * 4),
                                      align_corners=True)                             # (BT,h2,w2,3)
            ls_features = jnp.concatenate([img_ori, ls_viz, sim_cross[..., None]], axis=-1)
            out["ls_features"] = ls_features.reshape(b, t, h8 * 4, w8 * 4, 12)
            out["frames"] = img_ori.reshape(b, t, h8 * 4, w8 * 4, 3)

            # per-layer matched masks -> MSO -> x4 (ocpg.py:385-399)
            pred_masks_layers = []
            pred_low_layers = []
            for lvl in range(ldec):
                sel = matched[lvl]  # (B,)
                patch = patch_masks_layers[lvl]  # (B,T,Q,h8,w8,16)
                psel = jnp.take_along_axis(
                    patch, sel[:, None, None, None, None, None], axis=2)[:, :, 0]
                psel = psel.reshape(bt, h8, w8, mask_dim_ch)
                refined = mso(psel.astype(dtype), feat_4x, feat_8x)   # (BT, h4, w4, 1)
                full = nearest_resize(refined.astype(jnp.float32), (H, W))[..., 0]
                pred_masks_layers.append(full.reshape(b, t, H, W))
                fsel = jnp.take_along_axis(
                    formatcher_layers[lvl], sel[:, None, None, None, None], axis=2)[:, :, 0]
                pred_low_layers.append(fsel)

            out["pred_masks"] = pred_masks_layers[-1]
            out["pred_masks_low"] = pred_low_layers[-1]
            out["matched"] = matched
            out["outputs_class"] = outputs_class      # (L,B,T,Q,K)
            out["outputs_coord"] = outputs_coord
            out["pred_masks_layers"] = jnp.stack(pred_masks_layers)   # (L,B,T,H,W)
            out["pred_masks_low_layers"] = jnp.stack(pred_low_layers)
            return out

        # ---------------- eval branches ----------------
        if cfg.dataset_file not in ("a2d", "jhmdb") and "refcoco" not in cfg.dataset_file:
            # DAVIS / YTVOS: best query by mean score (ocpg.py:401-433).
            # The mean over T must skip padding frames (fully-masked canvases
            # the static-shape inference engine appends to reach clip_len):
            # the reference's eager loop only ever sees real frames
            # (inference_davis.py:230-236), so a plain mean would let garbage
            # pad-frame logits flip the best-query choice on short chunks.
            scores = jax.nn.sigmoid(out["pred_logits"].astype(jnp.float32))  # (B,T,Q,K)
            frame_ok = 1.0 - samples_mask.reshape(b, t, -1).all(axis=-1).astype(jnp.float32)
            fv = frame_ok[:, :, None, None]                                  # (B,T,1,1)
            mean_scores = (scores * fv).sum(axis=1) / jnp.maximum(fv.sum(axis=1), 1.0)
            # per-query valid-frame-mean scores + the valid-frame count: a
            # chunked video's global mean is exactly the frame-count-weighted
            # mean of its chunk means, so a host can re-select one query
            # across chunks and force it via query_override
            out["query_scores"] = mean_scores                                # (B,Q,K)
            out["query_frames"] = fv.sum(axis=1)[:, 0, 0]                    # (B,)
            best_q = mean_scores.max(axis=-1).argmax(axis=-1)                # (B,)
            if query_override is not None:
                best_q = jnp.where(query_override >= 0,
                                   query_override.astype(best_q.dtype), best_q)
            sel = best_q[:, None, None, None]
            out["pred_logits"] = jnp.take_along_axis(out["pred_logits"], sel, axis=2)
            out["pred_boxes"] = jnp.take_along_axis(
                out["pred_boxes"], best_q[:, None, None, None], axis=2)
            refs_pen = inter_references[-2][..., :2].reshape(b, t, nq, 2)
            out["reference_points"] = jnp.take_along_axis(
                refs_pen, best_q[:, None, None, None], axis=2)
            patch = patch_masks_layers[-1]
            psel = jnp.take_along_axis(
                patch, best_q[:, None, None, None, None, None], axis=2)[:, :, 0]
            psel = psel.reshape(bt, h8, w8, mask_dim_ch)
            refined = mso(psel.astype(dtype), feat_4x, feat_8x)
            full = nearest_resize(refined.astype(jnp.float32), (H, W))[..., 0]
            out["pred_masks"] = full.reshape(b, t, 1, H, W)
            return out

        # A2D / JHMDB / RefCOCO: refine every query (ocpg.py:434-445).
        # feat_4x/feat_8x are shared by the Q queries of each (b, t) group —
        # MSO's split-conv path (queries=nq) refines all queries without the
        # reference's Q-fold feature replication (per-query mask_refine loop
        # at ocpg.py:457-465).
        patch = patch_masks_layers[-1]                       # (B,T,Q,h8,w8,16)
        patch_q = patch.reshape(b * t * nq, h8, w8, mask_dim_ch)   # (bt)-major
        refined = mso(patch_q.astype(dtype), feat_4x, feat_8x, queries=nq)
        full = nearest_resize(refined.astype(jnp.float32), (H, W))[..., 0]
        out["pred_masks"] = full.reshape(b, t, nq, H, W)           # (B,T,Q,H,W)
        return out
