"""Tests for the bench accounting helpers: device-derived peaks
(ocpg_tpu/utils/hw.py) and the analytic Pallas-MSDA flop counter
(ops/ms_deform_attn.count_msda_flops) that makes MFU kernel-inclusive
(VERDICT r4 next-step 3, ADVICE r4 hard-coded-peak finding)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocpg_tpu.utils.hw import tpu_spec

msda = importlib.import_module("ocpg_tpu.ops.ms_deform_attn")


class _FakeDev:
    def __init__(self, kind):
        self.device_kind = kind


def test_tpu_spec_known_kinds():
    v5e = tpu_spec(_FakeDev("TPU v5 lite"))
    assert v5e.peak_flops_bf16 == 197e12 and v5e.hbm_bytes == 16 * 1024**3
    assert not v5e.assumed
    v5p = tpu_spec(_FakeDev("TPU v5p"))
    assert v5p.peak_flops_bf16 == 459e12 and not v5p.assumed
    v4 = tpu_spec(_FakeDev("TPU v4"))
    assert v4.peak_flops_bf16 == 275e12 and v4.hbm_bytes == 32 * 1024**3


def test_tpu_spec_unknown_falls_back_flagged():
    spec = tpu_spec(_FakeDev("cpu"))
    assert spec.assumed
    assert spec.peak_flops_bf16 == 197e12  # documented v5e fallback


def test_msda_flop_formulas_scale():
    ss = ((8, 8), (4, 4))
    base_f = msda.msda_pallas_fwd_flops(ss, n=1, m=2, d=32, p=2, lq=130)
    base_b = msda.msda_pallas_bwd_flops(ss, n=1, m=2, d=32, p=2, lq=130)
    assert base_f > 0 and base_b > 0
    # linear in N*M
    assert msda.msda_pallas_fwd_flops(ss, 2, 2, 32, 2, 130) == 2 * base_f
    # more points -> strictly more work, but sublinear in the fwd because the
    # SEL contraction runs once per query row (P-sum precedes SEL)
    more_p = msda.msda_pallas_fwd_flops(ss, 1, 2, 32, 4, 130)
    assert base_f < more_p < 2 * base_f
    # padding: lq rounds up to the 128-tile, so 120 and 128 count the same
    assert (msda.msda_pallas_fwd_flops(ss, 1, 2, 32, 2, 120)
            == msda.msda_pallas_fwd_flops(ss, 1, 2, 32, 2, 128))


def test_count_msda_flops_trace_counts():
    """Tracing a jitted fn under the context yields exactly one entry per
    executed Pallas call: 1 fwd for eval, 1 fwd + 1 bwd under grad (the
    custom_vjp fwd thunk re-enters the primal without double counting —
    verified against the on-chip probe in round 5)."""
    ss = ((8, 8), (4, 4))
    n, s, m, d, p, lq = 1, 80, 2, 32, 2, 130
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.random((n, s, m, d)), jnp.float32)
    x = jnp.asarray(rng.random((n, m, len(ss), p, lq)), jnp.float32)
    y = jnp.asarray(rng.random((n, m, len(ss), p, lq)), jnp.float32)
    a = jnp.asarray(rng.random((n, m, len(ss), p, lq)), jnp.float32)

    def f(v, x, y, a):
        return msda.ms_deform_attn_fast_cm(v, ss, x, y, a, "pallas").sum()

    with msda.count_msda_flops() as c1:
        jax.make_jaxpr(f)(v, x, y, a)
    assert [t for t, _ in c1] == ["fwd"]
    assert c1[0][1] == msda.msda_pallas_fwd_flops(ss, n, m, d, p, lq)

    def g(v, x, y, a):
        return jax.grad(f, argnums=(0, 1, 2, 3))(v, x, y, a)

    with msda.count_msda_flops() as c2:
        jax.make_jaxpr(g)(v, x, y, a)
    kinds = sorted(t for t, _ in c2)
    assert kinds == ["bwd", "fwd"]

    # outside the context nothing accumulates and nothing breaks
    jax.make_jaxpr(f)(v, x, y, a)


def test_counter_is_trace_time_only_no_xla_counting():
    """The XLA impl paths must NOT record analytic entries (their flops are
    already in HLO cost analysis — adding them would double count)."""
    ss = ((4, 4),)
    n, s, m, d, p, lq = 1, 16, 1, 8, 1, 8
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.random((n, s, m, d)), jnp.float32)
    x = jnp.asarray(rng.random((n, m, 1, p, lq)), jnp.float32)
    y = jnp.asarray(rng.random((n, m, 1, p, lq)), jnp.float32)
    a = jnp.asarray(rng.random((n, m, 1, p, lq)), jnp.float32)
    with msda.count_msda_flops() as c:
        out = msda.ms_deform_attn_fast_cm(v, ss, x, y, a, "xla")
    assert c == []
    assert np.isfinite(np.asarray(out)).all()
