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


@pytest.mark.slow
def test_nonfinite_step_skips_update():
    """A NaN-loss batch must leave params AND opt_state bit-identical.

    Reference behavior: engine.py:53-59 zeroes NaN losses and :92-95 exits on
    a non-finite total; our restart-free equivalent is a true skipped step —
    AdamW momentum and decoupled weight decay must not move either.
    """
    import jax
    import jax.numpy as jnp

    from ocpg_tpu.models import build_model
    from ocpg_tpu.engine import build_optimizer, create_train_state, make_train_step

    cfg = OCPGConfig(
        backbone="resnet50", enc_layers=1, dec_layers=2, dim_feedforward=64,
        num_queries=5, num_frames=2, compute_dtype="float32",
        dataset_file="ytvos",
        text_layers=2, text_hidden=128, text_heads=4, text_ffn=256,
        text_vocab=2048,
    )
    model, _, criterion_cfg, weight_dict = build_model(cfg)
    rng = np.random.default_rng(0)
    b, t, h, w, lt = 1, 2, 64, 64, 8
    batch = {
        "samples": jnp.asarray(rng.standard_normal((b, t, h, w, 3)), jnp.float32),
        "samples_mask": jnp.zeros((b, t, h, w), bool),
        "text_ids": jnp.asarray(rng.integers(4, 1000, (b, lt)), jnp.int32),
        "text_mask": jnp.ones((b, lt), jnp.int32),
        "targets": {
            "labels": jnp.zeros((b, t), jnp.int32),
            "boxes": jnp.tile(jnp.asarray([0.4, 0.5, 0.3, 0.4], jnp.float32), (b, t, 1)),
            "valid": jnp.ones((b, t), jnp.int32),
            "masks": jnp.asarray(rng.random((b, t, h, w)) > 0.7, jnp.float32),
            "weights": jnp.asarray(rng.random((b, t, h, w)), jnp.float32),
            "weak_masks": jnp.asarray(rng.random((b, t, h, w)) > 0.6, jnp.float32),
            "size": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        },
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["samples"], batch["samples_mask"],
        batch["text_ids"], batch["text_mask"], batch["targets"]["size"],
        targets=batch["targets"], train=True,
    )
    optimizer = build_optimizer(cfg, lr_drop_steps=[1000])
    state = create_train_state(params, optimizer)
    step = jax.jit(make_train_step(model, criterion_cfg, weight_dict, optimizer))

    nan_batch = dict(batch)
    nan_batch["samples"] = batch["samples"].at[0, 0, 0, 0, 0].set(jnp.nan)
    new_state, metrics = step(state, nan_batch)
    assert float(metrics["finite"]) == 0.0
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_array_equal(np.asarray(a), np.asarray(b_)),
        state.params, new_state.params)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_array_equal(np.asarray(a), np.asarray(b_)),
        state.opt_state, new_state.opt_state)
    assert int(new_state.step) == int(state.step) + 1

    good_state, metrics = step(state, batch)
    assert float(metrics["finite"]) == 1.0
    changed = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or pair,
        jax.tree_util.tree_map(
            lambda a, b_: bool(np.any(np.asarray(a) != np.asarray(b_))),
            state.params, good_state.params),
        False)
    assert changed, "finite step should update params"


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


@pytest.mark.slow
def test_evaluate_refexp_loop_smoke():
    """RefCOCO eval loop end-to-end on a fake loader (pretrain eval path,
    reference main_pretrain.py:138-170 / engine.py:197-300)."""
    import jax
    import jax.numpy as jnp

    from ocpg_tpu.engine.evaluate import evaluate_refexp_loop
    from ocpg_tpu.models import build_model

    cfg = OCPGConfig(
        backbone="resnet50", enc_layers=1, dec_layers=2, dim_feedforward=64,
        num_queries=5, num_frames=1, compute_dtype="float32",
        dataset_file="refcoco",
        text_layers=2, text_hidden=128, text_heads=4, text_ffn=256,
        text_vocab=2048,
    )
    model, *_ = build_model(cfg)
    rng = np.random.default_rng(0)
    b, t, h, w, lt = 1, 1, 64, 64, 8
    gt_mask = np.zeros((b, t, h, w), np.float32)
    gt_mask[:, :, 10:40, 10:50] = 1.0
    batch = {
        "samples": np.asarray(rng.standard_normal((b, t, h, w, 3)), np.float32),
        "samples_mask": np.zeros((b, t, h, w), bool),
        "text_ids": np.asarray(rng.integers(4, 1000, (b, lt)), np.int32),
        "text_mask": np.ones((b, lt), np.int32),
        "targets": {
            "labels": np.zeros((b, t), np.int32),
            "boxes": np.tile(np.asarray([0.45, 0.4, 0.6, 0.45], np.float32), (b, t, 1)),
            "valid": np.ones((b, t), np.int32),
            "masks": gt_mask,
            "weights": gt_mask.copy(),
            "weak_masks": gt_mask.copy(),
            "size": np.tile(np.asarray([[h, w]], np.int32), (b, 1)),
            "orig_size": np.tile(np.asarray([[128, 128]], np.int32), (b, 1)),
        },
        "orig_masks": [np.zeros((1, 128, 128), np.uint8)],
    }
    batch["orig_masks"][0][:, 20:80, 20:100] = 1
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["samples"]),
        jnp.asarray(batch["samples_mask"]), jnp.asarray(batch["text_ids"]),
        jnp.asarray(batch["text_mask"]), jnp.asarray(batch["targets"]["size"]),
        train=False)

    class FakeLoader:
        def epoch(self, _):
            yield batch

    out = evaluate_refexp_loop(model, params, FakeLoader())
    for key in ("bbox_P@1", "segm_mAP 0.5:0.95", "segm_overall_iou"):
        assert key in out, out.keys()
        assert np.isfinite(out[key])


@pytest.mark.slow
def test_train_step_debug_images_output():
    """debug_images=True exposes the first sample's predicted map in metrics
    (feeds the periodic pred/target/weak dumps, reference engine.py:63-77)."""
    import jax
    import jax.numpy as jnp

    from ocpg_tpu.models import build_model
    from ocpg_tpu.engine import build_optimizer, create_train_state, make_train_step

    cfg = OCPGConfig(
        backbone="resnet50", enc_layers=1, dec_layers=2, dim_feedforward=64,
        num_queries=5, num_frames=2, compute_dtype="float32",
        dataset_file="ytvos",
        text_layers=2, text_hidden=128, text_heads=4, text_ffn=256,
        text_vocab=2048,
    )
    model, _, criterion_cfg, weight_dict = build_model(cfg)
    rng = np.random.default_rng(0)
    b, t, h, w, lt = 1, 2, 64, 64, 8
    batch = {
        "samples": jnp.asarray(rng.standard_normal((b, t, h, w, 3)), jnp.float32),
        "samples_mask": jnp.zeros((b, t, h, w), bool),
        "text_ids": jnp.asarray(rng.integers(4, 1000, (b, lt)), jnp.int32),
        "text_mask": jnp.ones((b, lt), jnp.int32),
        "targets": {
            "labels": jnp.zeros((b, t), jnp.int32),
            "boxes": jnp.tile(jnp.asarray([0.4, 0.5, 0.3, 0.4], jnp.float32), (b, t, 1)),
            "valid": jnp.ones((b, t), jnp.int32),
            "masks": jnp.asarray(rng.random((b, t, h, w)) > 0.7, jnp.float32),
            "weights": jnp.asarray(rng.random((b, t, h, w)), jnp.float32),
            "weak_masks": jnp.asarray(rng.random((b, t, h, w)) > 0.6, jnp.float32),
            "size": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        },
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["samples"], batch["samples_mask"],
        batch["text_ids"], batch["text_mask"], batch["targets"]["size"],
        targets=batch["targets"], train=True,
    )
    optimizer = build_optimizer(cfg, lr_drop_steps=[1000])
    state = create_train_state(params, optimizer)
    step = jax.jit(make_train_step(model, criterion_cfg, weight_dict, optimizer,
                                   debug_images=True))
    _, metrics = step(state, batch)
    pred = np.asarray(metrics["debug_pred"])
    assert pred.shape == (h, w)
    assert np.isfinite(pred).all() and 0.0 <= pred.min() and pred.max() <= 1.0


def test_load_pretrained_torch_reference_pth(tmp_path, rng):
    """--pretrained_weights with a RAW reference-style .pth (flat torch keys)
    must convert through convert_ocpg and actually change the params —
    reference main.py:141-147 finetune flow, class heads dropped."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig as HFConfig

    from tests.torch_replica import OCPGReplica
    from ocpg_tpu.config import OCPGConfig
    from ocpg_tpu.engine.checkpoint import load_pretrained_torch
    from ocpg_tpu.models import build_model

    hf_cfg = HFConfig(vocab_size=1000, hidden_size=128, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=256,
                      max_position_embeddings=40, type_vocab_size=1,
                      pad_token_id=1, layer_norm_eps=1e-5)
    replica = OCPGReplica(hf_cfg, resnet_layers=(3, 4, 6, 3), enc=1, dec=2,
                          ffn=64, queries=5).eval()
    path = tmp_path / "ref_checkpoint.pth"
    torch.save({"model": replica.state_dict()}, path)

    cfg = OCPGConfig(backbone="resnet50", enc_layers=1, dec_layers=2,
                     dim_feedforward=64, num_queries=5, num_frames=2,
                     compute_dtype="float32", dataset_file="davis",
                     text_layers=2, text_hidden=128, text_heads=4,
                     text_ffn=256, text_vocab=1000, text_max_pos=40,
                     msda_impl="xla")
    model, *_ = build_model(cfg)
    import jax
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)),
        jnp.zeros((1, 2, 64, 64), bool), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32), jnp.asarray([[64, 64]], jnp.int32),
        train=False)
    before = np.asarray(
        variables["params"]["transformer"]["level_embed"])
    before_cls = np.asarray(variables["params"]["class_embed_0"]["kernel"])

    loaded = load_pretrained_torch(dict(variables), str(path), cfg)

    after = np.asarray(loaded["params"]["transformer"]["level_embed"])
    expected = replica.state_dict()["transformer.level_embed"].numpy()
    assert not np.allclose(after, before)
    np.testing.assert_allclose(after, expected, rtol=1e-6)
    # class heads are dropped for finetuning (utils.py:5-13)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["class_embed_0"]["kernel"]), before_cls)
    # FrozenBN stats came along
    rm = loaded["frozen"]["backbone"]["bn1"]["running_mean"]
    np.testing.assert_allclose(
        np.asarray(rm), replica.state_dict()["backbone.0.body.bn1.running_mean"].numpy(),
        rtol=1e-6)


def test_convert_checkpoint_tool_roundtrip(tmp_path, rng):
    """tools convert_checkpoint: reference .pth -> orbax dir -> load_params."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig as HFConfig

    from tests.torch_replica import OCPGReplica
    from ocpg_tpu.cli.tools import convert_checkpoint
    from ocpg_tpu.config import OCPGConfig
    from ocpg_tpu.engine.checkpoint import load_params
    from ocpg_tpu.models import build_model

    hf_cfg = HFConfig(vocab_size=1000, hidden_size=128, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=256,
                      max_position_embeddings=40, type_vocab_size=1,
                      pad_token_id=1, layer_norm_eps=1e-5)
    replica = OCPGReplica(hf_cfg, resnet_layers=(3, 4, 6, 3), enc=1, dec=2,
                          ffn=64, queries=5).eval()
    src = tmp_path / "ref.pth"
    torch.save(replica.state_dict(), src)
    out_dir = tmp_path / "converted"
    convert_checkpoint(str(src), str(out_dir), backbone="resnet50",
                       enc_layers=1, dec_layers=2, text_layers=2)

    cfg = OCPGConfig(backbone="resnet50", enc_layers=1, dec_layers=2,
                     dim_feedforward=64, num_queries=5, num_frames=2,
                     compute_dtype="float32", dataset_file="davis",
                     text_layers=2, text_hidden=128, text_heads=4,
                     text_ffn=256, text_vocab=1000, text_max_pos=40,
                     msda_impl="xla")
    model, *_ = build_model(cfg)
    import jax
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)),
        jnp.zeros((1, 2, 64, 64), bool), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32), jnp.asarray([[64, 64]], jnp.int32),
        train=False)
    loaded = load_params(str(out_dir), dict(variables))
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["transformer"]["level_embed"]),
        replica.state_dict()["transformer.level_embed"].numpy(), rtol=1e-6)


def test_prefetch_to_mesh_order_and_placement():
    """Double-buffered prefetch must preserve batch order, yield every batch
    exactly once, and place arrays on the mesh with the data axis sharded."""
    import jax
    import numpy as np

    from ocpg_tpu.parallel import create_mesh, prefetch_to_mesh

    mesh = create_mesh()
    n_dev = mesh.devices.size
    batches = [{"x": np.full((n_dev, 3), i, np.float32), "s": np.float32(i)}
               for i in range(5)]
    seen = []
    for host, dev in prefetch_to_mesh(iter(batches), mesh):
        assert float(host["s"]) == float(np.asarray(dev["s"]))
        np.testing.assert_array_equal(np.asarray(dev["x"]), host["x"])
        assert isinstance(dev["x"], jax.Array)
        assert len(dev["x"].sharding.device_set) == n_dev
        seen.append(int(host["s"]))
    assert seen == list(range(5))


def test_evaluate_device_vs_host_postprocess(rng):
    """The device-fused A2D postprocess (crop -> traced-resize-to-original ->
    threshold -> bit-pack; VERDICT r4 next-step 8) must agree with the legacy
    host path: same traced-vs-static resize matrices, same binary masks
    (modulo pixels whose resized logit is within float-reduction noise of
    exactly 0), and the same metric dict on a synthetic val pass."""
    import jax
    import jax.numpy as jnp

    from ocpg_tpu.config import OCPGConfig
    from ocpg_tpu.data.synthetic import synthetic_batch
    from ocpg_tpu.engine.evaluate import (_resize_matrix_traced, evaluate_a2d)
    from ocpg_tpu.models import build_model
    from ocpg_tpu.ops.image import _resize_matrix

    # 1) traced resize matrices == the static host matrices, including the
    # clamped-corner edge accumulation and the valid-region embedding
    for (src, dst, vs, vd) in ((80, 128, 80, 100), (64, 64, 48, 37),
                               (96, 192, 50, 192), (64, 128, 64, 128)):
        got = np.asarray(_resize_matrix_traced(
            src, dst, jnp.asarray(vs), jnp.asarray(vd)))
        want = _resize_matrix(vs, vd, "bilinear", False)
        np.testing.assert_allclose(got[:vd, :vs], want, atol=1e-6)
        assert np.abs(got[vd:]).max() == 0.0 if vd < dst else True
        assert np.abs(got[:, vs:]).max() == 0.0 if vs < src else True

    # 2) full loop: device and host postprocess produce the same metrics
    cfg = OCPGConfig(
        backbone="resnet50", enc_layers=1, dec_layers=2, dim_feedforward=64,
        num_queries=5, num_frames=2, compute_dtype="float32",
        dataset_file="a2d",
        text_layers=2, text_hidden=128, text_heads=4, text_ffn=256,
        text_vocab=2048,
    )
    model, *_ = build_model(cfg)
    host = synthetic_batch(rng, batch=2, frames=2, height=64, width=80,
                           with_valid_indices=True, vocab_size=2048)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(host["samples"]),
        jnp.asarray(host["samples_mask"]), jnp.asarray(host["text_ids"]),
        jnp.asarray(host["text_mask"]), jnp.asarray(host["targets"]["size"]),
        valid_indices=jnp.asarray(host["valid_indices"]), train=False)

    # two samples with different valid/orig sizes to exercise the traced crop
    host["targets"]["size"] = np.asarray([[64, 80], [56, 72]], np.int32)
    host["targets"]["orig_size"] = np.asarray([[50, 90], [56, 72]], np.int32)
    host["valid_indices"] = host["valid_indices"].astype(np.int32)
    host["real_count"] = 2
    # dataset contract: orig_size != size requires native-resolution GT masks
    om = []
    for oh, ow in host["targets"]["orig_size"]:
        g = np.zeros((1, oh, ow), np.uint8)
        g[0, oh // 4: 3 * oh // 4, ow // 4: 3 * ow // 4] = 1
        om.append(g)
    host["orig_masks"] = om

    class OneBatchLoader:
        def epoch(self, _):
            yield host

    m_host = evaluate_a2d(model, params, OneBatchLoader(),
                          postprocess="host")
    m_dev = evaluate_a2d(model, params, OneBatchLoader(),
                         postprocess="device")
    assert set(m_host) == set(m_dev)
    for k in m_host:
        assert abs(m_host[k] - m_dev[k]) < 1e-6, (k, m_host[k], m_dev[k])
