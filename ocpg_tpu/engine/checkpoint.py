"""Orbax checkpointing of the full training state.

Reference: /root/reference/main.py:227-239 — per-epoch `{model, optimizer,
lr_scheduler, epoch, args, grad_scaler}` + rolling `checkpoint.pth`, rank-0
writes only.  TPU equivalent: async Orbax checkpointing of the TrainState
pytree (params + opt_state + step); single-writer semantics come free from
the single-program model.  Finetune-style partial restore (strict=False minus
class heads, main.py:141-147) is `restore_params_into`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


# same-process registry: a new manager (or load_params) on a directory must
# barrier any in-flight async save scheduled through a prior manager
_MANAGERS: dict = {}


def _barrier_directory(directory: str):
    prev = _MANAGERS.get(os.path.abspath(directory))
    if prev is not None:
        prev.mgr.wait_until_finished()


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        _barrier_directory(self.directory)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        _MANAGERS[self.directory] = self

    def save(self, step: int, state: Any, metadata: Optional[dict] = None):
        # async: schedule the write and return; the train loop overlaps the
        # next epoch with the serialization.  The previous save is barriered
        # here (orbax requires one in-flight save per manager) and readers
        # (restore/latest_step) barrier themselves.
        self.mgr.wait_until_finished()
        self.mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self):
        """Block until any in-flight async save has committed."""
        self.mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        self.mgr.wait_until_finished()
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        self.mgr.wait_until_finished()
        return self.mgr.latest_step()


def load_params(checkpoint_dir: str, params_template: dict) -> dict:
    """Restore just the model variables (params + frozen collections) from a
    TrainState checkpoint directory, for inference."""
    _barrier_directory(checkpoint_dir)
    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore())
    src = restored["params"] if isinstance(restored, dict) and "params" in restored else restored
    return restore_params_into(params_template, src, drop_prefixes=())


def restore_params_into(target_params: dict, source_params: dict,
                        drop_prefixes: tuple = ("class_embed",)) -> dict:
    """strict=False merge: copy matching-shape leaves from source, keep target
    elsewhere; drop class heads for finetuning (utils.py:5-13)."""

    def merge(tgt, src, path=""):
        if isinstance(tgt, dict):
            out = {}
            for k, v in tgt.items():
                p = f"{path}/{k}" if path else str(k)
                if any(p.startswith(d) or k.startswith(d) for d in drop_prefixes):
                    out[k] = v
                elif isinstance(src, dict) and k in src:
                    out[k] = merge(v, src[k], p)
                else:
                    out[k] = v
            return out
        src_arr = np.asarray(src)
        if hasattr(tgt, "shape") and tuple(tgt.shape) == tuple(src_arr.shape):
            return src_arr.astype(np.asarray(tgt).dtype)
        return tgt

    return merge(target_params, source_params)


def load_pretrained_torch(variables: dict, path: str, cfg,
                          drop_class_heads: bool = True) -> dict:
    """`--pretrained_weights` loader (reference main.py:141-147 + utils.py:5-13).

    Accepts either a raw reference OCPG ``.pth`` (flat torch key strings —
    converted through ``torch_weights.convert_ocpg`` over the full param
    surface) or an already-converted nested params tree.  With
    ``drop_class_heads`` (the finetune default) the class heads keep their
    fresh init; pass False to load a checkpoint for inference/eval.  Returns
    new variables with params (and, for raw checkpoints, the FrozenBN
    ``frozen`` collection) merged in.
    """
    from ..utils.torch_weights import convert_ocpg, load_torch_file

    drop = ("class_embed",) if drop_class_heads else ()
    src = load_torch_file(path)
    out = dict(variables)
    if isinstance(src, dict) and any(
            isinstance(k, str) and "." in k for k in src):
        conv_params, conv_frozen = convert_ocpg(
            src, enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
            num_feature_levels=cfg.num_feature_levels, backbone=cfg.backbone,
            text_layers=cfg.text_layers, with_box_refine=cfg.with_box_refine)
        out["params"] = restore_params_into(out["params"], conv_params,
                                            drop_prefixes=drop)
        if "frozen" in out and conv_frozen:
            out["frozen"] = restore_params_into(
                out["frozen"], conv_frozen, drop_prefixes=())
    else:
        # already-converted nested tree: either a bare params tree or a full
        # variables dict {'params': ..., 'frozen': ...} — merge the FrozenBN
        # stats too so converted checkpoints don't keep fresh running stats
        src_params = src.get("params", src) if isinstance(src, dict) else src
        out["params"] = restore_params_into(out["params"], src_params,
                                            drop_prefixes=drop)
        if isinstance(src, dict) and "frozen" in src and "frozen" in out:
            out["frozen"] = restore_params_into(out["frozen"], src["frozen"],
                                                drop_prefixes=())
    return out
