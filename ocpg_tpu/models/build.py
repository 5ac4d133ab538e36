"""Model factory (mirrors /root/reference/models/ocpg.py:635-718)."""

from __future__ import annotations

from typing import Dict, Tuple

from ..config import OCPGConfig
from .criterion import CriterionConfig
from .matcher import MatcherConfig
from .ocpg import OCPG


def build_weight_dict(cfg: OCPGConfig) -> Dict[str, float]:
    """Loss-name -> coefficient map incl. per-aux-layer entries (ocpg.py:682-701).

    Note: the reference also registers `loss_dice*` weights that no loss ever
    emits (dead config, criterion.py never produces them) — not replicated.
    """
    wd = {
        "loss_ce": cfg.cls_loss_coef,
        "loss_bbox": cfg.bbox_loss_coef,
        "loss_giou": cfg.giou_loss_coef,
    }
    if cfg.masks:
        wd.update({
            "loss_mask": cfg.mask_loss_coef,
            "loss_proj": cfg.proj_loss_coef,
            "loss_lst": cfg.lst_loss_coef,
            "loss_mask_low": cfg.mask_loss_coef,
            "loss_proj_low": cfg.proj_loss_coef,
            "loss_lst_low": cfg.lst_loss_coef,
        })
        if cfg.pairwise_loss:
            wd["loss_pairwise"] = cfg.pairwise_loss_coef
            wd["loss_pairwise_neighbor"] = cfg.pairwise_loss_coef
    if cfg.aux_loss:
        aux = {}
        for i in range(cfg.dec_layers - 1):
            aux.update({f"{k}_{i}": v for k, v in wd.items()})
        wd.update(aux)
    return wd


def build_model(cfg: OCPGConfig) -> Tuple[OCPG, MatcherConfig, CriterionConfig, Dict[str, float]]:
    if cfg.msda_impl == "auto":
        # Resolve the MSDA implementation here, outside any jit trace: the
        # probe compiles a tiny kernel on the current default backend
        # (TPU -> 'pallas'; CPU meshes / tests -> 'xla').
        from ..ops.ms_deform_attn_pallas import pallas_available

        cfg = cfg.replace(msda_impl="pallas" if pallas_available() else "xla")
    if cfg.swin_attn_impl == "auto":
        # 'auto' resolves to XLA: the fused Pallas window-attention kernel
        # measured SLOWER than the batched-einsum XLA path on v5e (2x at
        # stage-3 shapes — window attention is MXU-row-bound once logits are
        # bf16-stored, and XLA's batched matmuls use the MXUs better than
        # sequential per-head dots; PROFILE.md "fused window attention").
        # 'pallas' stays forceable for A/B measurement.
        cfg = cfg.replace(swin_attn_impl="xla")
    model = OCPG(cfg)
    matcher_cfg = MatcherConfig(
        cost_class=cfg.set_cost_class,
        cost_bbox=cfg.set_cost_bbox,
        cost_giou=cfg.set_cost_giou,
        cost_mask=cfg.set_cost_mask,
        cost_dice=cfg.set_cost_dice,
        num_classes=cfg.num_classes,
    )
    criterion_cfg = CriterionConfig(
        num_classes=cfg.num_classes,
        focal_alpha=cfg.focal_alpha,
        lst_warmup_iters=cfg.lst_warmup_iters,
        pairwise=cfg.pairwise_loss,
    )
    return model, matcher_cfg, criterion_cfg, build_weight_dict(cfg)
