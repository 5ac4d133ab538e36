"""MSDA fast paths vs the XLA gather op: separable matmul formulation,
Pallas kernel (interpret mode on CPU), and the custom-VJP dispatcher."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocpg_tpu.ops import ms_deform_attn
from ocpg_tpu.ops.ms_deform_attn import ms_deform_attn_fast, ms_deform_attn_separable
from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

SHAPES = ((6, 4), (3, 2))


def _inputs(rng, n=2, m=4, d=8, lq=5, p=3):
    s = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.random((n, s, m, d)), jnp.float32)
    locs = jnp.asarray(rng.random((n, lq, m, len(SHAPES), p, 2)) * 1.2 - 0.1, jnp.float32)
    attn = jnp.asarray(rng.random((n, lq, m, len(SHAPES), p)), jnp.float32)
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)
    return value, locs, attn


def test_separable_matches_gather(rng):
    value, locs, attn = _inputs(rng)
    expected = ms_deform_attn(value, SHAPES, locs, attn)
    got = ms_deform_attn_separable(value, SHAPES, locs, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_pallas_matches_gather_interpret(rng):
    value, locs, attn = _inputs(rng)
    expected = ms_deform_attn(value, SHAPES, locs, attn)
    # the kernel's stage-1/2 matmuls run in bf16 -> bf16-level tolerance
    got = ms_deform_attn_pallas(value, SHAPES, locs, attn, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)


def test_fast_dispatcher_grads_match_gather_autodiff(rng):
    value, locs, attn = _inputs(rng)

    def loss_fast(v, l, a):
        return (ms_deform_attn_fast(v, SHAPES, l, a, "separable") ** 2).sum()

    def loss_gather(v, l, a):
        return (ms_deform_attn(v, SHAPES, l, a) ** 2).sum()

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(value, locs, attn)
    g_ref = jax.grad(loss_gather, argnums=(0, 1, 2))(value, locs, attn)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_backward_matches_autodiff_interpret(rng):
    """Hand-written Pallas backward (ms_deform_attn_pallas_bwd) vs autodiff
    of the gather formulation — dvalue / dlocations / dattention.  bf16
    matmul precision inside the kernel -> bf16-level tolerance."""
    from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas_bwd

    value, locs, attn = _inputs(rng)
    g = jnp.asarray(np.random.default_rng(7).random(
        (value.shape[0], locs.shape[1], value.shape[2] * value.shape[3])),
        jnp.float32)

    def loss(v, l, a):
        return (ms_deform_attn(v, SHAPES, l, a) * g).sum()

    dv_ref, dl_ref, da_ref = jax.grad(loss, argnums=(0, 1, 2))(value, locs, attn)
    dv, dl, da = ms_deform_attn_pallas_bwd(value, SHAPES, locs, attn, g, 128, True)
    for got, ref in ((dv, dv_ref), (dl, dl_ref), (da, da_ref)):
        got, ref = np.asarray(got, np.float32), np.asarray(ref, np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(got / scale, ref / scale, atol=6e-3)


def _to_cm(locs, attn):
    """standard (N, Lq, M, L, P[, 2]) -> channel-major (N, M, L, P, Lq)."""
    x_cm = jnp.transpose(locs[..., 0], (0, 2, 3, 4, 1))
    y_cm = jnp.transpose(locs[..., 1], (0, 2, 3, 4, 1))
    aw_cm = jnp.transpose(attn, (0, 2, 3, 4, 1))
    return x_cm, y_cm, aw_cm


@pytest.mark.parametrize("ryx_mm", [False, True])
@pytest.mark.parametrize("hat_direct", [False, True])
def test_pallas_cm_matches_gather_interpret(rng, ryx_mm, hat_direct):
    """Channel-major forward kernel (P-sum before the SEL matmul) vs gather,
    for both ryx expansions — the ry @ REP matmul (production, ryx_mm=True)
    and the pltpu.repeat lane-tiling candidate (impl='pallas_rep') — and both
    hat-row builds (direct relu(1-|x-g|) production form vs legacy
    floor/frac corner form)."""
    from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas_cm

    value, locs, attn = _inputs(rng)
    expected = ms_deform_attn(value, SHAPES, locs, attn)
    got = ms_deform_attn_pallas_cm(value, SHAPES, *_to_cm(locs, attn), 128,
                                   True, ryx_mm, hat_direct)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)


def test_pallas_cm_hat_forms_bit_identical_interpret(rng):
    """The direct relu(1-|x-g|) hat build and the floor/frac corner form are
    algebraically the same function.  Forward outputs are bit-identical (the
    hat rows pass through a bf16 cast that absorbs the forms' 1-ULP f32
    rounding difference at the upper corner: `1 - frac` vs `(c+1) - v` each
    round once, possibly differently).  Backward grads consume the f32 hat
    rows directly, so they agree to 1 ULP rather than bit-exactly; the
    derivative rows agree everywhere, including at exactly-integer sampling
    coordinates (both forms produce the right-sided subgradient of the
    kink — see test_pallas_cm_backward_exact_integer_coords)."""
    from ocpg_tpu.ops.ms_deform_attn_pallas import (
        ms_deform_attn_pallas_bwd_cm, ms_deform_attn_pallas_cm)

    value, locs, attn = _inputs(rng)
    x_cm, y_cm, aw_cm = _to_cm(locs, attn)
    a = ms_deform_attn_pallas_cm(value, SHAPES, x_cm, y_cm, aw_cm, 128,
                                 True, True, True)
    b = ms_deform_attn_pallas_cm(value, SHAPES, x_cm, y_cm, aw_cm, 128,
                                 True, True, False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    g = jnp.asarray(np.random.default_rng(7).random(
        (value.shape[0], locs.shape[1], value.shape[2] * value.shape[3])),
        jnp.float32)
    ga = ms_deform_attn_pallas_bwd_cm(value, SHAPES, x_cm, y_cm, aw_cm, g,
                                      128, True, True, True)
    gb = ms_deform_attn_pallas_bwd_cm(value, SHAPES, x_cm, y_cm, aw_cm, g,
                                      128, True, True, False)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-7,
                                   atol=0)


def test_pallas_cm_pstack_parity_interpret(rng):
    """The P-stacked dot form (points concatenated on the sublane axis, one
    dot per level/stage instead of 2P; '_ps' impl suffix) computes the same
    per-point products in the same order, so the forward is bit-identical to
    the sequential form.  The backward's dV folds the P-accumulation into a
    single K = P*tile contraction whose internal f32 summation order differs
    from dot-then-add, so grads agree to f32 rounding rather than bit-exactly.
    On-chip it measured NEUTRAL (PROFILE.md round-8) — kept as an A/B knob,
    not production."""
    from ocpg_tpu.ops.ms_deform_attn_pallas import (
        ms_deform_attn_pallas_bwd_cm, ms_deform_attn_pallas_cm)

    value, locs, attn = _inputs(rng)
    x_cm, y_cm, aw_cm = _to_cm(locs, attn)
    a = ms_deform_attn_pallas_cm(value, SHAPES, x_cm, y_cm, aw_cm, 128, True)
    b = ms_deform_attn_pallas_cm(value, SHAPES, x_cm, y_cm, aw_cm, 128, True,
                                 pstack=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    g = jnp.asarray(np.random.default_rng(7).random(
        (value.shape[0], locs.shape[1], value.shape[2] * value.shape[3])),
        jnp.float32)
    ga = ms_deform_attn_pallas_bwd_cm(value, SHAPES, x_cm, y_cm, aw_cm, g,
                                      128, True)
    gb = ms_deform_attn_pallas_bwd_cm(value, SHAPES, x_cm, y_cm, aw_cm, g,
                                      128, True, pstack=True)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-7)


def test_pallas_cm_xk_backward_parity_interpret(rng):
    """The expansion-side derivative contractions ('_xk' impl suffix) flip
    the dcx/dry dots' K and N axes (dx_q = sum_k da*(dxrow@V'), dy/daw via
    ga = gxH*a against dyrow@REP / hy@REP) so the dots run with full D*H_l
    output lanes instead of N = W_l/H_l (<= 80 of 128).  All grads agree to
    bf16-product precision rather than bit-exactly: hy rides through REP as
    bf16 before the aw scaling (double rounding, 1 bf16 ulp in ryx/da — so
    even dV can differ), and dx/dy/daw sum the same products in a different
    (lane vs MXU-tree) order."""
    from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas_bwd_cm

    value, locs, attn = _inputs(rng)
    x_cm, y_cm, aw_cm = _to_cm(locs, attn)
    g = jnp.asarray(np.random.default_rng(7).random(
        (value.shape[0], locs.shape[1], value.shape[2] * value.shape[3])),
        jnp.float32)
    ga = ms_deform_attn_pallas_bwd_cm(value, SHAPES, x_cm, y_cm, aw_cm, g,
                                      128, True)
    gb = ms_deform_attn_pallas_bwd_cm(value, SHAPES, x_cm, y_cm, aw_cm, g,
                                      128, True, xk=True)
    for x, y in zip(ga, gb):
        scale = np.abs(np.asarray(x)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(y) / scale,
                                   np.asarray(x) / scale, atol=2e-2)


def test_pallas_cm_backward_exact_integer_coords(rng):
    """Sampling coordinates that land EXACTLY on integer pixels (a kink of
    the bilinear hat).  At f32 bench scale dozens of coordinates do this, and
    the gather oracle's autodiff — like the reference CUDA col2im, whose
    floor/frac algebra bakes the convention in — produces the RIGHT-SIDED
    subgradient there.  Regression for the open-interval sign(g-v) derivative
    form that returned 0 at the kink and failed on-chip parity by 20% max-rel
    (TPU_PARITY.json history)."""
    from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas_bwd_cm

    value, locs, attn = _inputs(rng)
    # level 0 is (H=6, W=4): x_norm=(k+0.5)/4 and y_norm in {0.25, 0.75} hit
    # integer pixel coords exactly in f32 ((k+0.5)/4*4-0.5 == k, 0.25*6-0.5
    # == 1.0); mix interior and edge (x=0) kinks across queries/points
    locs = np.array(locs)
    locs[0, :, :, 0, 0, 0] = 0.125   # x = 0.0 (left-edge kink)
    locs[0, :, :, 0, 1, 0] = 0.625   # x = 2.0
    locs[0, :, :, 0, 0, 1] = 0.25    # y = 1.0
    locs[1, :, :, 0, 2, 1] = 0.75    # y = 4.0
    locs = jnp.asarray(locs, jnp.float32)
    x_cm, y_cm, aw_cm = _to_cm(locs, attn)
    g = jnp.asarray(np.random.default_rng(11).random(
        (value.shape[0], locs.shape[1], value.shape[2] * value.shape[3])),
        jnp.float32)

    def loss(v, l, a):
        return (ms_deform_attn(v, SHAPES, l, a) * g).sum()

    dv_ref, dl_ref, da_ref = jax.grad(loss, argnums=(0, 1, 2))(value, locs, attn)
    dx_ref, dy_ref, daw_ref = _to_cm(dl_ref, da_ref)
    dv, dx, dy, daw = ms_deform_attn_pallas_bwd_cm(
        value, SHAPES, x_cm, y_cm, aw_cm, g, 128, True)
    for got, ref in ((dv, dv_ref), (dx, dx_ref), (dy, dy_ref), (daw, daw_ref)):
        got, ref = np.asarray(got, np.float32), np.asarray(ref, np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(got / scale, ref / scale, atol=6e-3)


def test_fast_cm_dispatcher_grads_match_gather_autodiff(rng):
    """ms_deform_attn_fast_cm (xla fallback path) forward + grads vs gather."""
    from ocpg_tpu.ops.ms_deform_attn import ms_deform_attn_fast_cm

    value, locs, attn = _inputs(rng)
    x_cm, y_cm, aw_cm = _to_cm(locs, attn)

    out = ms_deform_attn_fast_cm(value, SHAPES, x_cm, y_cm, aw_cm, "xla")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ms_deform_attn(value, SHAPES, locs, attn)),
        rtol=1e-5, atol=1e-5)

    def loss_cm(v, x, y, a):
        return (ms_deform_attn_fast_cm(v, SHAPES, x, y, a, "separable") ** 2).sum()

    def loss_gather(v, l, a):
        return (ms_deform_attn(v, SHAPES, l, a) ** 2).sum()

    gv, gx, gy, ga = jax.grad(loss_cm, argnums=(0, 1, 2, 3))(value, x_cm, y_cm, aw_cm)
    gv_ref, gl_ref, ga_ref = jax.grad(loss_gather, argnums=(0, 1, 2))(value, locs, attn)
    gx_ref, gy_ref, ga_ref_cm = _to_cm(gl_ref, ga_ref)
    for a, b in ((gv, gv_ref), (gx, gx_ref), (gy, gy_ref), (ga, ga_ref_cm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ryx_mm", [False, True])
@pytest.mark.parametrize("hat_direct", [False, True])
def test_pallas_cm_backward_matches_autodiff_interpret(rng, ryx_mm, hat_direct):
    """CM Pallas backward vs autodiff of the gather formulation."""
    from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas_bwd_cm

    value, locs, attn = _inputs(rng)
    x_cm, y_cm, aw_cm = _to_cm(locs, attn)
    g = jnp.asarray(np.random.default_rng(7).random(
        (value.shape[0], locs.shape[1], value.shape[2] * value.shape[3])),
        jnp.float32)

    def loss(v, l, a):
        return (ms_deform_attn(v, SHAPES, l, a) * g).sum()

    dv_ref, dl_ref, da_ref = jax.grad(loss, argnums=(0, 1, 2))(value, locs, attn)
    dx_ref, dy_ref, daw_ref = _to_cm(dl_ref, da_ref)
    dv, dx, dy, daw = ms_deform_attn_pallas_bwd_cm(
        value, SHAPES, x_cm, y_cm, aw_cm, g, 128, True, ryx_mm, hat_direct)
    for got, ref in ((dv, dv_ref), (dx, dx_ref), (dy, dy_ref), (daw, daw_ref)):
        got, ref = np.asarray(got, np.float32), np.asarray(ref, np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(got / scale, ref / scale, atol=6e-3)


def test_pallas_cm_r4_matches_gather_interpret(rng):
    """Rank-4 dense-row forward (VPU outer product + full-K MXU contraction,
    PROFILE.md round-3 lever) vs the gather oracle, incl. OOB sampling."""
    from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas_cm_r4

    value, locs, attn = _inputs(rng)
    expected = ms_deform_attn(value, SHAPES, locs, attn)
    got = ms_deform_attn_pallas_cm_r4(value, SHAPES, *_to_cm(locs, attn), 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)


def test_pallas_cm_fk_matches_gather_interpret(rng):
    """Multi-level fused-K forward (block-diagonal stage dots, the last
    structural lever named in PROFILE.md round-4) vs the gather oracle,
    incl. OOB sampling.  Bench A/B: scripts/bench_msda_kernel.py
    --variants cm fk."""
    from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas_cm_fk

    value, locs, attn = _inputs(rng)
    expected = ms_deform_attn(value, SHAPES, locs, attn)
    got = ms_deform_attn_pallas_cm_fk(value, SHAPES, *_to_cm(locs, attn), 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)
