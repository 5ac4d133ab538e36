"""Jitted SPMD train step.

Reference: /root/reference/engine.py:29-123 — forward, weighted loss sum,
AMP GradScaler + clip + step, NaN-loss guard.  On TPU: one jitted program,
bf16 forward with fp32 params (no GradScaler needed), grads averaged over the
data mesh axis by XLA automatically, non-finite-loss step skipping expressed
with `jnp.where` (the reference zeroes NaN losses, engine.py:53-59, and exits
on a non-finite total, engine.py:92-95 — we skip the update instead, which is
the restart-free equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import OCPGConfig
from ..models.criterion import CriterionConfig, compute_criterion

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any
    rng: Array


def create_train_state(params, optimizer: optax.GradientTransformation, seed: int = 0) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params["params"] if "params" in params else params),
        rng=jax.random.PRNGKey(seed),
    )


def make_train_step(
    model,
    criterion_cfg: CriterionConfig,
    weight_dict: Dict[str, float],
    optimizer: optax.GradientTransformation,
    has_valid_indices: bool = False,
    debug_images: bool = False,
    deterministic: bool = False,
) -> Callable[[TrainState, Dict[str, Array]], Tuple[TrainState, Dict[str, Array]]]:
    """Returns a jittable (state, batch) -> (state, metrics) step.

    batch keys: samples (B,T,H,W,3), samples_mask, text_ids, text_mask,
    sizes, targets{labels, boxes, valid, masks, weights, weak_masks, size},
    and optionally valid_indices.  With debug_images=True the metrics carry
    the first sample's predicted/target/weak maps for the periodic image
    dumps (reference engine.py:63-77).
    """

    def loss_fn(variables, batch, step, dropout_rng):
        out = model.apply(
            variables,
            batch["samples"], batch["samples_mask"],
            batch["text_ids"], batch["text_mask"], batch["targets"]["size"],
            targets=batch["targets"],
            valid_indices=batch.get("valid_indices") if has_valid_indices else None,
            train=True,
            # deterministic=True disables dropout (overfit-one-batch tests);
            # production training keeps it stochastic like the reference
            deterministic=deterministic,
            rngs={"dropout": dropout_rng},
        )
        total, losses = compute_criterion(criterion_cfg, weight_dict, out,
                                          batch["targets"], step)
        if debug_images:
            losses = dict(losses)
            losses["debug_pred"] = jax.nn.sigmoid(
                out["pred_masks"][0, 0].astype(jnp.float32))
        return total, losses

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Array]]:
        from ..data.loader import decompress_batch

        # compact-wire batches (uint8 frames / f16 heatmaps) expand on device
        # — no-op for f32 batches (see loader.decompress_batch)
        batch = decompress_batch(batch)
        rng, dropout_rng = jax.random.split(state.rng)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, state.step, dropout_rng
        )
        inner = grads["params"] if "params" in grads else grads
        params_inner = state.params["params"] if "params" in state.params else state.params
        updates, new_opt_state = optimizer.update(inner, state.opt_state, params_inner)
        new_params_inner = optax.apply_updates(params_inner, updates)
        # Non-finite guard: a skipped step must leave params AND opt_state
        # bit-identical — AdamW momentum and decoupled weight decay must not
        # move (the reference zeroes NaN losses / exits on non-finite total,
        # engine.py:53-59,92-95; skipping is the restart-free equivalent).
        finite = jnp.isfinite(total)

        def _keep_old(new_tree, old_tree):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_tree, old_tree)

        new_params_inner = _keep_old(new_params_inner, params_inner)
        new_opt_state = _keep_old(new_opt_state, state.opt_state)
        if "params" in state.params:
            new_params = dict(state.params)
            new_params["params"] = new_params_inner
        else:
            new_params = new_params_inner
        grad_norm = optax.global_norm(inner)
        metrics = {"loss": total, "grad_norm": grad_norm,
                   "finite": finite.astype(jnp.float32), **losses}
        return (
            TrainState(step=state.step + 1, params=new_params,
                       opt_state=new_opt_state, rng=rng),
            metrics,
        )

    return train_step
