"""RoBERTa-base text encoder (flax.linen) + tokenizer wrapper.

Reference: /root/reference/models/text_encoder/text_encoder.py:32-84 wraps HF
`RobertaModel.from_pretrained("checkpoints/roberta-base")` and returns
`(last_hidden_state, pooler_output, pad_mask)`; the tokenizer is
`RobertaTokenizerFast.batch_encode_plus(padding='longest')`
(`text_encoder/tokenizer.py:140-146`).

Here the encoder is implemented natively (12-layer post-LN transformer,
learned positions with RoBERTa's padding_idx=1 offset, tanh pooler) so the
whole model is one jittable linen module; HF torch checkpoints convert via
ocpg_tpu/utils/torch_weights.py.  Tokenization happens on the host; for TPU
static shapes we pad to a fixed `max_len` bucket instead of 'longest'.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1


class RobertaLayer(nn.Module):
    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pad_mask: Array) -> Array:
        cfg = self.cfg
        c, h = cfg.hidden_size, cfg.num_heads
        dh = c // h
        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v")(x)

        def split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, h, dh).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)).astype(jnp.float32)
        logits = logits / np.sqrt(dh)
        logits = jnp.where(pad_mask[:, None, None, :], jnp.finfo(jnp.float32).min, logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(x.shape)
        ctx = nn.Dense(c, dtype=self.dtype, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attn_ln")(x + ctx)

        y = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="ffn_in")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="ffn_out")(y)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ffn_ln")(x + y)


class RobertaEncoder(nn.Module):
    cfg: RobertaConfig = RobertaConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids: Array, attention_mask: Array
    ) -> Tuple[Array, Array]:
        """Returns (last_hidden_state (B, L, 768), pooler_output (B, 768))."""
        cfg = self.cfg
        pad_mask = attention_mask == 0
        # RoBERTa position ids: cumsum over non-pad, offset by padding_idx
        mask_f = attention_mask.astype(jnp.int32)
        position_ids = jnp.cumsum(mask_f, axis=1) * mask_f + cfg.pad_token_id

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(position_ids)
        tok = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = word + pos + tok
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="embeddings_ln")(x)

        for i in range(cfg.num_layers):
            x = RobertaLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x, pad_mask)

        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled


class SimpleTokenizer:
    """Host-side tokenizer.

    Prefers a local HF RobertaTokenizerFast (when vocab files are available at
    `checkpoint_path`); otherwise falls back to a deterministic hash tokenizer
    so the full pipeline runs hermetically (tests, benchmarks, random-weight
    smoke runs).  Outputs fixed-length `(input_ids, attention_mask)` buckets
    for static TPU shapes.
    """

    def __init__(self, checkpoint_path: Optional[str] = None, max_len: int = 32,
                 vocab_size: int = 50265):
        self.max_len = max_len
        self.vocab_size = vocab_size
        self._hf = None
        if checkpoint_path:
            # An explicit tokenizer path that fails to load must raise: silently
            # degrading to hash tokens would produce garbage masks on a real
            # checkpoint run with a typo'd --tokenizer_path.
            from transformers import RobertaTokenizerFast

            try:
                self._hf = RobertaTokenizerFast.from_pretrained(checkpoint_path)
            except Exception as e:
                raise ValueError(
                    f"failed to load tokenizer from {checkpoint_path!r}: {e}; "
                    "omit tokenizer_path to use the hermetic hash fallback"
                ) from e

    def __call__(self, captions: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        if self._hf is not None:
            enc = self._hf.batch_encode_plus(
                captions, padding="max_length", truncation=True, max_length=self.max_len,
                return_tensors="np",
            )
            ids = enc["input_ids"].astype(np.int32)
            if ids.max(initial=0) >= self.vocab_size:
                # out-of-range ids would silently become NaN embeddings on
                # device (jnp.take fills OOB with NaN) — fail on the host
                raise ValueError(
                    f"tokenizer produced id {int(ids.max())} >= vocab_size "
                    f"{self.vocab_size}; pass vocab_size=cfg.text_vocab when "
                    "constructing SimpleTokenizer")
            return ids, enc["attention_mask"].astype(np.int32)
        # hash fallback: <s> tokens </s> with deterministic per-word ids.
        # md5 (not Python hash()) so ids are identical across processes
        # regardless of PYTHONHASHSEED — hermetic runs stay reproducible.
        import hashlib

        ids = np.full((len(captions), self.max_len), 1, dtype=np.int32)  # pad_id = 1
        mask = np.zeros((len(captions), self.max_len), dtype=np.int32)
        for i, cap in enumerate(captions):
            words = cap.lower().split()[: self.max_len - 2]
            row = [0]  # <s>
            for wdx in words:
                h = int.from_bytes(hashlib.md5(wdx.encode()).digest()[:8], "little")
                row.append(4 + (h % (self.vocab_size - 8)))
            row.append(2)  # </s>
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask
