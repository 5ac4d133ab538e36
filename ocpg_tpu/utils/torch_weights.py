"""Torch checkpoint -> flax params converters.

Covers the external assets the reference loads from `checkpoints/`:
  * torchvision ResNet-50/101 (ImageNet) -> backbone params + frozen BN stats
    (reference loads via torchvision pretrained=True, backbone.py:94-96)
  * HF RoBERTa-base (pytorch_model.bin) -> text encoder params
    (reference: text_encoder.py:43)
  * Kinetics Video-Swin checkpoints -> video swin params, incl. the reference's
    2D->3D patch-embed inflation (video_swin_transformer.py:563-614) — our
    patch embed is (1,4,4) so 2D weights map directly.

All converters are pure-numpy (torch used only to deserialize .pth/.bin) and
return nested dicts matching the linen module trees defined in
ocpg_tpu/models/*.  Finetune key surgery (drop class heads, utils.py:5-13)
is `drop_class_head`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _conv(sd, prefix) -> Dict[str, np.ndarray]:
    w = _t(sd[f"{prefix}.weight"])  # (O, I, H, W) -> (H, W, I, O)
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _bn_frozen(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "weight": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "running_mean": _t(sd[f"{prefix}.running_mean"]),
        "running_var": _t(sd[f"{prefix}.running_var"]),
    }


def _ln(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def convert_resnet(sd: Dict, layers: Tuple[int, ...]) -> Tuple[Dict, Dict]:
    """torchvision resnet state_dict -> (params, frozen) trees for ResNet."""
    params: Dict = {"conv1": _conv(sd, "conv1")}
    frozen: Dict = {"bn1": _bn_frozen(sd, "bn1")}
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            tp = f"layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_{b}"
            p = {
                "conv1": _conv(sd, f"{tp}.conv1"),
                "conv2": _conv(sd, f"{tp}.conv2"),
                "conv3": _conv(sd, f"{tp}.conv3"),
            }
            f = {
                "bn1": _bn_frozen(sd, f"{tp}.bn1"),
                "bn2": _bn_frozen(sd, f"{tp}.bn2"),
                "bn3": _bn_frozen(sd, f"{tp}.bn3"),
            }
            if f"{tp}.downsample.0.weight" in sd:
                p["downsample_conv"] = _conv(sd, f"{tp}.downsample.0")
                f["downsample_bn"] = _bn_frozen(sd, f"{tp}.downsample.1")
            params[name] = p
            frozen[name] = f
    return params, frozen


def convert_roberta(sd: Dict, num_layers: int = 12) -> Dict:
    """HF roberta-base state_dict -> RobertaEncoder params tree."""
    pre = "roberta." if any(k.startswith("roberta.") for k in sd) else ""
    emb = f"{pre}embeddings"
    out: Dict = {
        "word_embeddings": {"embedding": _t(sd[f"{emb}.word_embeddings.weight"])},
        "position_embeddings": {"embedding": _t(sd[f"{emb}.position_embeddings.weight"])},
        "token_type_embeddings": {"embedding": _t(sd[f"{emb}.token_type_embeddings.weight"])},
        "embeddings_ln": _ln(sd, f"{emb}.LayerNorm"),
        "pooler": _linear(sd, f"{pre}pooler.dense"),
    }
    for i in range(num_layers):
        lp = f"{pre}encoder.layer.{i}"
        out[f"layer_{i}"] = {
            "q": _linear(sd, f"{lp}.attention.self.query"),
            "k": _linear(sd, f"{lp}.attention.self.key"),
            "v": _linear(sd, f"{lp}.attention.self.value"),
            "attn_out": _linear(sd, f"{lp}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{lp}.attention.output.LayerNorm"),
            "ffn_in": _linear(sd, f"{lp}.intermediate.dense"),
            "ffn_out": _linear(sd, f"{lp}.output.dense"),
            "ffn_ln": _ln(sd, f"{lp}.output.LayerNorm"),
        }
    return out


def convert_video_swin(sd: Dict, depths: Tuple[int, ...]) -> Dict:
    """Video-Swin (or 2D Swin Kinetics-inflatable) state_dict -> VideoSwin params.

    Accepts either a 3D checkpoint (patch_embed.proj.weight (C,3,1,4,4)) or a
    2D one ((C,3,4,4)); with patch (1,4,4) both collapse to a 2D conv kernel,
    which is exactly the reference's center-inflation for kt=1
    (video_swin_transformer.py:563-614).
    """
    sd = {k.replace("backbone.", ""): v for k, v in sd.items()}
    pw = _t(sd["patch_embed.proj.weight"])
    if pw.ndim == 5:  # (O, I, kt, kh, kw) with kt == 1
        pw = pw[:, :, 0]
    out: Dict = {
        "patch_embed": {"kernel": pw.transpose(2, 3, 1, 0),
                        "bias": _t(sd["patch_embed.proj.bias"])},
        "patch_norm": _ln(sd, "patch_embed.norm"),
    }
    for stage, depth in enumerate(depths):
        for i in range(depth):
            lp = f"layers.{stage}.blocks.{i}"
            blk = {
                "norm1": _ln(sd, f"{lp}.norm1"),
                "norm2": _ln(sd, f"{lp}.norm2"),
                "attn": {
                    "qkv": _linear(sd, f"{lp}.attn.qkv"),
                    "proj": _linear(sd, f"{lp}.attn.proj"),
                    "relative_position_bias_table": _t(
                        sd[f"{lp}.attn.relative_position_bias_table"]),
                },
                "mlp_fc1": _linear(sd, f"{lp}.mlp.fc1"),
                "mlp_fc2": _linear(sd, f"{lp}.mlp.fc2"),
            }
            out[f"stage{stage}_block{i}"] = blk
        if stage < len(depths) - 1:
            dp = f"layers.{stage}.downsample"
            out[f"downsample{stage}"] = {
                "norm": _ln(sd, f"{dp}.norm"),
                "reduction": {"kernel": _t(sd[f"{dp}.reduction.weight"]).T},
            }
    return out


def drop_class_head(params: Dict) -> Dict:
    """Finetune surgery: drop class_embed heads (utils.py:5-13, main.py:141-147)."""
    return {k: v for k, v in params.items() if not k.startswith("class_embed")}


def load_torch_file(path: str) -> Dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj
