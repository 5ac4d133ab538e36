"""Small shared NN layers (flax.linen), NHWC layouts.

Reference counterparts:
  * MLP              — /root/reference/models/ocpg.py:613-625
  * FeatureResizer   — /root/reference/models/text_encoder/text_encoder.py:16-29
  * FrozenBatchNorm  — /root/reference/models/backbone.py:20-56
  * MultiheadAttention — torch nn.MultiheadAttention as used by the VL fusion
    (`segmentation.py:95-113`) and decoder self-attention
    (`deformable_transformer.py:302`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array

# torch xavier_uniform, the init used across the reference transformer
# (`deformable_transformer.py:65-75`)
xavier_uniform = nn.initializers.xavier_uniform()


class MLP(nn.Module):
    """ReLU MLP; final layer linear (ocpg.py:613-625)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = xavier_uniform
    final_kernel_init: Optional[Callable] = None
    final_bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            dim = self.output_dim if last else self.hidden_dim
            kinit = self.final_kernel_init if (last and self.final_kernel_init) else self.kernel_init
            binit = self.final_bias_init if (last and self.final_bias_init) else nn.initializers.zeros
            x = nn.Dense(dim, dtype=self.dtype, kernel_init=kinit, bias_init=binit,
                         name=f"layers_{i}")(x)
            if not last:
                x = jax.nn.relu(x)
        return x


class FeatureResizer(nn.Module):
    """Linear + LayerNorm(eps=1e-12) + dropout (text_encoder.py:16-29)."""
    output_dim: int
    dropout: float = 0.1
    do_ln: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(x)
        if self.do_ln:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine parameters frozen (backbone.py:20-56).

    Parameters live in the `frozen` collection so they take no optimizer state
    and no gradient; eps=1e-5 applied before rsqrt as in the reference.
    """
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        weight = self.variable("frozen", "weight", jnp.ones, (self.features,)).value
        bias = self.variable("frozen", "bias", jnp.zeros, (self.features,)).value
        running_mean = self.variable("frozen", "running_mean", jnp.zeros, (self.features,)).value
        running_var = self.variable("frozen", "running_var", jnp.ones, (self.features,)).value
        scale = weight * jax.lax.rsqrt(running_var + 1e-5)
        shift = bias - running_mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class MultiheadAttention(nn.Module):
    """torch-compatible multi-head attention (batch-second semantics not kept;
    we use (B, L, C) layouts and handle key padding masks).

    Equivalent to nn.MultiheadAttention with in_proj/out_proj; used for the
    decoder self-attention and vision-language fusion.
    """
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,                      # (B, Lq, C)
        key: Array,                        # (B, Lk, C)
        value: Array,                      # (B, Lk, C)
        key_padding_mask: Optional[Array] = None,  # (B, Lk) bool, True = pad
        *,
        deterministic: bool = True,
    ) -> Array:
        c = query.shape[-1]
        h = self.num_heads
        dh = c // h
        q = nn.Dense(c, dtype=self.dtype, kernel_init=xavier_uniform, name="q_proj")(query)
        k = nn.Dense(c, dtype=self.dtype, kernel_init=xavier_uniform, name="k_proj")(key)
        v = nn.Dense(c, dtype=self.dtype, kernel_init=xavier_uniform, name="v_proj")(value)

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, h, dh).transpose(0, 2, 1, 3)  # (B, H, L, Dh)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / jnp.sqrt(dh)
        if key_padding_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(query.shape[0], query.shape[1], c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=xavier_uniform, name="out_proj")(out)


def inverse_sigmoid(x: Array, eps: float = 1e-5) -> Array:
    """util/misc.py inverse_sigmoid."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)
