"""End-to-end golden parity: torch replica -> convert_ocpg -> JAX model.

The parity anchor demanded by SURVEY.md §7: a torch-CPU forward with the
reference's state_dict key layout (tests/torch_replica.py) is converted via
`ocpg_tpu.utils.torch_weights.convert_ocpg` and compared against the JAX
model's eval forward on the same inputs.  Any missing/mismapped parameter
fails the flax apply; any numerical divergence fails the closeness asserts.
Also contains the isolated HF-RoBERTa vs linen RoBERTa parity test.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _randomize(module, seed=0):
    """Fill every param/buffer with seeded noise (variances kept positive)."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        if k.endswith("running_var"):
            v.copy_(torch.empty_like(v).uniform_(0.5, 1.5, generator=g))
        else:
            v.copy_(torch.randn(v.shape, generator=g) * 0.05)
    module.load_state_dict(sd)


def test_roberta_matches_hf(rng):
    from transformers import RobertaConfig as HFConfig, RobertaModel

    from ocpg_tpu.models.text_encoder import RobertaConfig, RobertaEncoder
    from ocpg_tpu.utils.torch_weights import convert_roberta

    hf_cfg = HFConfig(vocab_size=500, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=40, type_vocab_size=1,
                      pad_token_id=1, layer_norm_eps=1e-5)
    hf = RobertaModel(hf_cfg).eval()
    _randomize(hf, seed=1)

    ids = np.asarray(rng.integers(4, 499, (2, 10)), np.int64)
    mask = np.ones((2, 10), np.int64)
    ids[0, 7:] = 1
    mask[0, 7:] = 0
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask))

    enc = RobertaEncoder(RobertaConfig(
        vocab_size=500, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=40))
    params = {"params": convert_roberta(hf.state_dict(), 2)}
    hidden, pooled = enc.apply(params, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(hidden),
                               out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(), atol=2e-5, rtol=1e-4)


def test_full_model_golden_parity(rng):
    from tests.torch_replica import OCPGReplica
    from transformers import RobertaConfig as HFConfig

    from ocpg_tpu.config import OCPGConfig
    from ocpg_tpu.models import build_model
    from ocpg_tpu.utils.torch_weights import convert_ocpg

    B, T, H, W, LT = 1, 2, 192, 256, 8
    hf_cfg = HFConfig(vocab_size=1000, hidden_size=128, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=256,
                      max_position_embeddings=40, type_vocab_size=1,
                      pad_token_id=1, layer_norm_eps=1e-5)
    replica = OCPGReplica(hf_cfg, resnet_layers=(3, 4, 6, 3), enc=1, dec=2,
                          ffn=64, queries=5).eval()
    _randomize(replica, seed=2)

    samples = np.asarray(rng.standard_normal((B, T, 3, H, W)), np.float32)
    smask = np.zeros((B, T, H, W), bool)
    smask[..., -32:] = True          # right padding
    smask[..., -16:, :] = True       # bottom padding
    ids = np.asarray(rng.integers(4, 999, (B, LT)), np.int64)
    mask = np.ones((B, LT), np.int64)
    ids[:, -2:] = 1
    mask[:, -2:] = 0
    sizes = np.asarray([[H - 16, W - 32]], np.int32)

    t_out = replica(torch.from_numpy(samples), torch.from_numpy(smask),
                    torch.from_numpy(ids), torch.from_numpy(mask),
                    torch.from_numpy(sizes))

    params, frozen = convert_ocpg(
        replica.state_dict(), enc_layers=1, dec_layers=2,
        backbone="resnet50", text_layers=2)
    cfg = OCPGConfig(backbone="resnet50", enc_layers=1, dec_layers=2,
                     dim_feedforward=64, num_queries=5, num_frames=T,
                     compute_dtype="float32", dataset_file="davis",
                     text_layers=2, text_hidden=128, text_heads=4,
                     text_ffn=256, text_vocab=1000, text_max_pos=40,
                     msda_impl="xla")
    model, *_ = build_model(cfg)
    j_out = model.apply(
        {"params": params, "frozen": frozen},
        jnp.asarray(samples.transpose(0, 1, 3, 4, 2)),   # NCHW -> NHWC
        jnp.asarray(smask), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(sizes), train=False)

    np.testing.assert_allclose(np.asarray(j_out["pred_logits"]),
                               t_out["pred_logits"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_out["pred_boxes"]),
                               t_out["pred_boxes"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_out["reference_points"]),
                               t_out["reference_points"].numpy(), atol=2e-3)
    jm = np.asarray(j_out["pred_masks"])
    tm = t_out["pred_masks"].numpy()
    assert jm.shape == tm.shape == (B, T, 1, H, W)
    scale = max(np.abs(tm).max(), 1e-3)
    np.testing.assert_allclose(jm / scale, tm / scale, atol=5e-3)
