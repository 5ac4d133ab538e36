"""2D Swin backbone for image experiments (RefCOCO pretraining).

Reference: /root/reference/models/swin_transformer.py — standard Swin-T/S/B/L
with window 7.  A 2D Swin block is exactly a Video-Swin block with a
length-1 temporal window, so this wraps VideoSwin with `window=(1, 7, 7)`
and num_frames=1 — one implementation, two backbones.

(The reference's 2D swin exposes out_indices (0,1,2) (swin_transformer.py:446);
we return all four stages like the video variant and let the model select
`feats[-3:]`, which yields the same 8x/16x/32x pyramid.)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .backbone_video_swin import VideoSwin

_CONFIGS = {
    "swin_t_p4w7": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_s_p4w7": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_b_p4w7": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_l_p4w7": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


def build_swin_2d(arch: str, dtype=jnp.float32, name: Optional[str] = None,
                  use_checkpoint: bool = False, attn_impl: str = "xla") -> VideoSwin:
    cfg = _CONFIGS[arch]
    return VideoSwin(dtype=dtype, name=name, use_checkpoint=use_checkpoint,
                     num_frames=1, window_size=(1, 7, 7), attn_impl=attn_impl,
                     **cfg)
