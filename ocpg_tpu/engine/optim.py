"""Optimizer with per-group learning rates + MultiStep schedule.

Reference: /root/reference/main.py:68-100 — AdamW with four param groups
selected by name keywords (default group lr, backbone lr, text-encoder lr,
linear-proj lr*mult), `MultiStepLR(optimizer, lr_drop)` stepping per epoch,
and `clip_max_norm=0.1` grad clipping (`opts.py:16`, `engine.py:100-113`).

Implemented as `optax.multi_transform` keyed by a param-path label function.
Frozen subtrees (text encoder when `freeze_text_encoder`, the ResNet stem +
layer1 which the reference never trains, `backbone.py:63-65`) get
`optax.set_to_zero`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import optax

from ..config import OCPGConfig


def param_group_label(cfg: OCPGConfig, path: Tuple[str, ...]) -> str:
    joined = "/".join(str(p) for p in path)
    if "text_encoder" in joined:
        return "frozen" if cfg.freeze_text_encoder else "text"
    if "backbone" in joined:
        if cfg.freeze_video_encoder:
            return "frozen"
        if cfg.backbone.startswith("resnet"):
            # only layer2..layer4 train (backbone.py:63-65)
            if not any(f"layer{i}" in joined for i in (2, 3, 4)):
                return "frozen"
        return "backbone"
    if "reference_points" in joined or "sampling_offsets" in joined:
        return "proj"
    return "main"


def _multistep(base_lr: float, lr_drop_steps: Sequence[int]) -> optax.Schedule:
    if not lr_drop_steps:
        return optax.constant_schedule(base_lr)
    return optax.piecewise_constant_schedule(
        base_lr, {int(b): 0.1 for b in lr_drop_steps}
    )


def build_optimizer(cfg: OCPGConfig, lr_drop_steps: Sequence[int],
                    lr_scale: float = 1.0) -> optax.GradientTransformation:
    """lr_drop_steps: boundaries in optimizer steps (epoch boundaries x steps/epoch).

    lr_scale mirrors the reference's linear LR scaling by device count
    (main.py:266-276).
    """

    def adamw(lr):
        return optax.adamw(
            learning_rate=_multistep(lr * lr_scale, lr_drop_steps),
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.weight_decay,
        )

    transforms = {
        "main": adamw(cfg.lr),
        "backbone": adamw(cfg.lr_backbone),
        "text": adamw(cfg.lr_text_encoder),
        "proj": adamw(cfg.lr * cfg.lr_linear_proj_mult),
        "frozen": optax.set_to_zero(),
    }

    def labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: param_group_label(cfg, tuple(getattr(k, "key", getattr(k, "idx", k)) for k in path)),
            params,
        )

    tx = optax.multi_transform(transforms, labels)
    return optax.chain(optax.clip_by_global_norm(cfg.clip_max_norm), tx)
