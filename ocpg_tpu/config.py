"""Model / training configuration.

Replaces the reference's argparse tree (`/root/reference/opts.py:3-156`) with a
typed dataclass; defaults mirror the reference flag defaults and the canonical
training recipes in `/root/reference/scripts/` (`--with_box_refine --binary
--freeze_text_encoder`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class OCPGConfig:
    # * Backbone (opts.py:33-47)
    backbone: str = "resnet50"  # resnet50 | resnet101 | video_swin_{t,s,b}_p4w7 | swin_{t,s,b,l}_p4w7
    text_backbone: str = "roberta-base"
    # text encoder dims (roberta-base defaults; override for tiny test configs)
    text_layers: int = 12
    text_hidden: int = 768
    text_heads: int = 12
    text_ffn: int = 3072
    text_vocab: int = 50265
    text_max_pos: int = 514
    dilation: bool = False
    num_feature_levels: int = 4
    freeze_text_encoder: bool = True
    freeze_video_encoder: bool = False
    use_checkpoint: bool = False  # gradient rematerialisation in swin blocks

    # * Transformer (opts.py:49-67)
    enc_layers: int = 4
    dec_layers: int = 4
    dim_feedforward: int = 2048
    hidden_dim: int = 256
    dropout: float = 0.1
    nheads: int = 8
    num_frames: int = 3
    num_queries: int = 5
    dec_n_points: int = 4
    enc_n_points: int = 4
    with_box_refine: bool = True
    two_stage: bool = False

    # * Segmentation (opts.py:72-82)
    masks: bool = True
    mask_dim: int = 256
    controller_layers: int = 2
    dynamic_mask_channels: int = 16
    rel_coord: bool = True

    # * Losses / matcher (opts.py:84-111)
    aux_loss: bool = True
    set_cost_class: float = 2.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0
    set_cost_mask: float = 2.0
    set_cost_dice: float = 5.0
    mask_loss_coef: float = 2.0
    dice_loss_coef: float = 5.0
    proj_loss_coef: float = 5.0
    lst_loss_coef: float = 2.0
    cls_loss_coef: float = 2.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    eos_coef: float = 0.1
    focal_alpha: float = 0.25
    lst_warmup_iters: int = 100_000  # criterion.py:43
    # Opt-in BoxInst pairwise color-similarity loss (the reference ships the
    # machinery as dead code — segmentation.py:358-500 imported by
    # criterion.py:11 but only called from a __main__ playground, and the
    # recipe flag `--supervision_type boxinst` doesn't parse upstream; see
    # models/pairwise.py and PARITY.md "BoxInst pairwise").
    pairwise_loss: bool = False
    pairwise_loss_coef: float = 1.0

    # * Dataset (opts.py:113-132)
    dataset_file: str = "ytvos"
    supervision: str = "box"  # full | box | point
    binary: bool = True
    max_size: int = 640
    max_skip: int = 3

    # * Optimization (opts.py:5-17, main.py:68-100)
    lr: float = 1e-4
    lr_backbone: float = 5e-5
    lr_text_encoder: float = 1e-5
    lr_linear_proj_mult: float = 1.0
    batch_size: int = 1
    weight_decay: float = 5e-4
    epochs: int = 10
    lr_drop: Tuple[int, ...] = (6, 8)
    clip_max_norm: float = 0.1

    # * Numerics (TPU): bf16 matmul path with fp32 islands, replaces AMP+GradScaler
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # MSDA core-op implementation: 'auto' resolves to the Pallas TPU kernel
    # when it compiles on the current backend, else the XLA gather path.
    # ('pallas' | 'separable' | 'xla' force a specific path.)
    msda_impl: str = "auto"
    # Swin window attention: 'auto' -> 'xla' (batched einsums).  The fused
    # Pallas kernel (ops/window_attention_pallas.py) is kept as a measured
    # NEGATIVE result — 'pallas' forces it for A/B runs (PROFILE.md).
    swin_attn_impl: str = "auto"

    # * Parallelism: mesh axis sizes; data axis shards (batch*time)
    data_parallel: int = 1

    # Dropout PRNG implementation: 'rbg' (XLA RngBitGenerator) generates the
    # large dropout masks ~10 ms/step cheaper than 'threefry' at train shapes
    # (PROFILE.md); 'threefry' keeps JAX's default splittable PRNG.
    prng_impl: str = "rbg"

    seed: int = 42

    @property
    def num_classes(self) -> int:
        # models/ocpg.py:636-646
        if self.binary:
            return 1
        return {"ytvos": 65, "davis": 78, "a2d": 1, "jhmdb": 1}.get(self.dataset_file, 91)

    def replace(self, **kw) -> "OCPGConfig":
        return dataclasses.replace(self, **kw)


# Canonical recipes, mirroring /root/reference/scripts/*.sh
def a2d_r101_boxsup() -> OCPGConfig:
    return OCPGConfig(backbone="resnet101", dataset_file="a2d", supervision="box",
                      epochs=12, lr_drop=(3, 5), num_frames=3)


def ytvos_r101_boxsup() -> OCPGConfig:
    return OCPGConfig(backbone="resnet101", dataset_file="ytvos", supervision="box",
                      epochs=10, lr_drop=(6, 8), num_frames=3)


def a2d_videoswin_tiny() -> OCPGConfig:
    return OCPGConfig(backbone="video_swin_t_p4w7", dataset_file="a2d", epochs=12,
                      lr_drop=(3, 5))


def davis_videoswin_base() -> OCPGConfig:
    return OCPGConfig(backbone="video_swin_b_p4w7", dataset_file="davis", epochs=10)


def apply_config_overrides(cfg: OCPGConfig, overrides_json: Optional[str]) -> OCPGConfig:
    """Apply a `--config_overrides` JSON dict of field overrides (shared by
    the CLIs; unknown keys raise via dataclasses.replace)."""
    if not overrides_json:
        return cfg
    import json

    return cfg.replace(**json.loads(overrides_json))
