"""Engine tests: param-group labeling, checkpoint roundtrip, finetune merge."""
import numpy as np
import pytest

from ocpg_tpu.config import OCPGConfig
from ocpg_tpu.engine.optim import param_group_label


def test_param_group_labels():
    cfg = OCPGConfig(backbone="resnet101", freeze_text_encoder=True)
    assert param_group_label(cfg, ("backbone", "layer2_0", "conv1", "kernel")) == "backbone"
    assert param_group_label(cfg, ("backbone", "conv1", "kernel")) == "frozen"
    assert param_group_label(cfg, ("backbone", "layer1_2", "conv1", "kernel")) == "frozen"
    assert param_group_label(cfg, ("text_encoder", "layer_0", "q", "kernel")) == "frozen"
    assert param_group_label(cfg, ("transformer", "reference_points", "kernel")) == "proj"
    assert param_group_label(
        cfg, ("transformer", "encoder_layer_0", "self_attn", "sampling_offsets", "kernel")
    ) == "proj"
    assert param_group_label(cfg, ("controller", "layers_0", "kernel")) == "main"

    cfg2 = cfg.replace(freeze_text_encoder=False)
    assert param_group_label(cfg2, ("text_encoder", "pooler", "kernel")) == "text"
    cfg3 = cfg.replace(backbone="video_swin_t_p4w7")
    assert param_group_label(cfg3, ("backbone", "stage0_block0", "attn", "qkv", "kernel")) == "backbone"


def test_restore_params_into_merges_and_drops_class_head():
    from ocpg_tpu.engine.checkpoint import restore_params_into

    target = {
        "class_embed_0": {"kernel": np.zeros((4, 1))},
        "controller": {"layers_0": {"kernel": np.zeros((4, 4))}},
        "extra": {"kernel": np.zeros((2, 2))},
    }
    source = {
        "class_embed_0": {"kernel": np.ones((4, 1))},
        "controller": {"layers_0": {"kernel": np.ones((4, 4))}},
        "shape_mismatch": {"kernel": np.ones((3, 3))},
    }
    out = restore_params_into(target, source, drop_prefixes=("class_embed",))
    assert (out["class_embed_0"]["kernel"] == 0).all()      # dropped
    assert (out["controller"]["layers_0"]["kernel"] == 1).all()  # merged
    assert (out["extra"]["kernel"] == 0).all()              # absent in source


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax

    from ocpg_tpu.engine.checkpoint import CheckpointManager
    from ocpg_tpu.engine.train import TrainState, create_train_state

    params = {"params": {"w": jnp.arange(4.0), "b": jnp.ones(2)}}
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state)
    restored = CheckpointManager(str(tmp_path / "ckpt")).restore(state)
    np.testing.assert_array_equal(np.asarray(restored.params["params"]["w"]),
                                  np.arange(4.0))
    assert int(restored.step) == 0


def test_refexp_metrics():
    from ocpg_tpu.evaluation.refexp_metrics import evaluate_refexp

    preds = [{
        "image_id": 0,
        "boxes": np.array([[0, 0, 1, 1], [10, 10, 20, 20]], np.float32),
        "scores": np.array([0.2, 0.9]),
    }]
    gts = [{"image_id": 0, "box": np.array([10, 10, 20, 20], np.float32)}]
    out = evaluate_refexp(preds, gts)
    assert out["P@1"] == 1.0  # top-scored box is correct
    preds[0]["scores"] = np.array([0.9, 0.2])
    out = evaluate_refexp(preds, gts)
    assert out["P@1"] == 0.0 and out["P@5"] == 1.0
