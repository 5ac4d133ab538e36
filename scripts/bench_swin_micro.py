"""Microbench Swin-B block components on the real TPU chip.

Isolates the costs the full-model profile attributes to the Video-Swin
backbone (PROFILE.md round-4): LayerNorm chains, window attention variants,
and the partition/reverse relayouts — so block-structure changes can be
evaluated without recompiling the whole model.

Method: same chained-scan + paired long/short median as bench.py.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

LONG, SHORT, REPEATS = 64, 8, 5


def timeit(fn, *args):
    """median (t_long - t_short)/(LONG-SHORT) of a chained on-device scan."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def chained(a, n):
        def body(carry, _):
            out = fn(*[x + carry * 1e-6 if i == 0 else x for i, x in enumerate(a)])
            return jnp.real(out).astype(jnp.float32).mean(), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    float(chained(args, SHORT))
    float(chained(args, LONG))
    deltas = []
    for _ in range(REPEATS):
        t0 = time.perf_counter(); float(chained(args, LONG)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chained(args, SHORT)); ts = time.perf_counter() - t0
        deltas.append((tl - ts) / (LONG - SHORT))
    return sorted(deltas)[len(deltas) // 2]


def main():
    rng = np.random.default_rng(0)
    report = []

    def rep(name, ms):
        line = f"{name:<56s} {ms*1e3:8.3f} ms"
        print(line, flush=True)
        report.append(line)

    # ---- 1. LayerNorm at stage-2 shape ------------------------------------
    x5d = jnp.asarray(rng.standard_normal((1, 5, 24, 40, 512)), jnp.bfloat16)
    ln = nn.LayerNorm(dtype=jnp.bfloat16)
    p = ln.init(jax.random.PRNGKey(0), x5d)
    rep("flax LayerNorm (1,5,24,40,512) bf16", timeit(lambda x: ln.apply(p, x), x5d))

    x2d = x5d.reshape(-1, 512)
    p2 = ln.init(jax.random.PRNGKey(0), x2d)
    rep("flax LayerNorm (4800,512) bf16", timeit(lambda x: ln.apply(p2, x), x2d))

    def manual_ln(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

    rep("manual LN (1,5,24,40,512)", timeit(manual_ln, x5d))

    big = jnp.asarray(rng.standard_normal((1, 5, 96, 160, 128)), jnp.bfloat16)
    pb = ln.init(jax.random.PRNGKey(0), big)
    rep("flax LayerNorm (1,5,96,160,128) bf16", timeit(lambda x: ln.apply(pb, x), big))

    # ---- 2. stage-2 window attention variants -----------------------------
    # stage 2: dim 512, heads 16, window (5,7,7) -> N=245, 24 windows
    bw, n, c, h = 24, 245, 512, 16
    dh = c // h
    xw = jnp.asarray(rng.standard_normal((bw, n, c)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, jnp.bfloat16)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.bfloat16)
    bias_nnh = jnp.asarray(rng.standard_normal((n, n, h)), jnp.bfloat16)

    def attn_current(x):
        qkv = (x @ wqkv).reshape(bw, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (dh ** -0.5), qkv[1], qkv[2]
        a = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        a = a + bias_nnh.transpose(2, 0, 1)[None]
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return o @ wproj

    rep("stage2 window attn (current, transpose qkv)", timeit(attn_current, xw))

    def attn_sliced(x):
        qkv = (x @ wqkv).reshape(bw, n, 3, h, dh)
        q = qkv[:, :, 0] * (dh ** -0.5)
        k = qkv[:, :, 1]
        v = qkv[:, :, 2]
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        a = a + bias_nnh.transpose(2, 0, 1)[None]
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v)
        return o.reshape(bw, n, c) @ wproj

    rep("stage2 window attn (sliced qkv, no transpose)", timeit(attn_sliced, xw))

    def attn_sliced_bf16sm(x):
        qkv = (x @ wqkv).reshape(bw, n, 3, h, dh)
        q = qkv[:, :, 0] * (dh ** -0.5)
        k = qkv[:, :, 1]
        v = qkv[:, :, 2]
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                       preferred_element_type=jnp.float32)
        a = a + bias_nnh.transpose(2, 0, 1)[None].astype(jnp.float32)
        a = jax.nn.softmax(a, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v)
        return o.reshape(bw, n, c) @ wproj

    rep("stage2 window attn (sliced, f32 logits+softmax)", timeit(attn_sliced_bf16sm, xw))

    from ocpg_tpu.ops.window_attention_pallas import window_attention_fused
    bias_hnn = bias_nnh.transpose(2, 0, 1).astype(jnp.float32)

    def attn_fused(x):
        qkv = (x @ wqkv).reshape(bw, n, 3, h, dh)
        q = qkv[:, :, 0] * (dh ** -0.5)
        o = window_attention_fused(q, qkv[:, :, 1], qkv[:, :, 2], bias_hnn, None)
        return o.reshape(bw, n, c) @ wproj

    rep("stage2 window attn (fused pallas kernel)", timeit(attn_fused, xw))

    # stage-1 shape: many small windows — grid-step overhead check
    bw1, c1, h1 = 322, 128, 4
    dh1 = c1 // h1
    xw1 = jnp.asarray(rng.standard_normal((bw1, n, c1)), jnp.bfloat16)
    wqkv1 = jnp.asarray(rng.standard_normal((c1, 3 * c1)) * 0.02, jnp.bfloat16)
    wproj1 = jnp.asarray(rng.standard_normal((c1, c1)) * 0.02, jnp.bfloat16)
    bias1 = jnp.asarray(rng.standard_normal((h1, n, n)), jnp.float32)

    def attn1_sliced(x):
        qkv = (x @ wqkv1).reshape(bw1, n, 3, h1, dh1)
        q = qkv[:, :, 0] * (dh1 ** -0.5)
        a = jnp.einsum("bnhd,bmhd->bhnm", q, qkv[:, :, 1],
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        a = a + bias1[None].astype(jnp.bfloat16)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, qkv[:, :, 2])
        return o.reshape(bw1, n, c1) @ wproj1

    rep("stage1 window attn (sliced qkv, xla)", timeit(attn1_sliced, xw1))

    def attn1_fused(x):
        qkv = (x @ wqkv1).reshape(bw1, n, 3, h1, dh1)
        q = qkv[:, :, 0] * (dh1 ** -0.5)
        o = window_attention_fused(q, qkv[:, :, 1], qkv[:, :, 2], bias1, None)
        return o.reshape(bw1, n, c1) @ wproj1

    rep("stage1 window attn (fused pallas kernel)", timeit(attn1_fused, xw1))

    # ---- 3. bias gather layouts ------------------------------------------
    table = jnp.asarray(rng.standard_normal((2535, h)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 2535, (n, n)), jnp.int32)

    def bias_current(t):
        b = t[idx.reshape(-1)].reshape(n, n, h)
        return b.transpose(2, 0, 1)

    rep("bias gather (n,n,h)->transpose", timeit(bias_current, table))

    def bias_direct(t):
        return t.T[:, idx]          # (h, n, n)

    rep("bias gather direct (h,n,n)", timeit(bias_direct, table))

    # ---- 4. partition/reverse relayout at stage 2 -------------------------
    xs = jnp.asarray(rng.standard_normal((1, 5, 28, 42, 512)), jnp.bfloat16)

    def partition_reverse(x):
        b = x.shape[0]
        xw_ = x.reshape(b, 1, 5, 4, 7, 6, 7, 512)
        xw_ = xw_.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, 245, 512)
        y = xw_ * 1.0001
        y = y.reshape(b, 1, 4, 6, 5, 7, 7, 512)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, 5, 28, 42, 512)
        return y

    rep("stage2 partition+reverse relayout", timeit(partition_reverse, xs))

    # ---- 5. full MLP at stage-2 shape ------------------------------------
    w1 = jnp.asarray(rng.standard_normal((512, 2048)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((2048, 512)) * 0.02, jnp.bfloat16)
    xs2 = jnp.asarray(rng.standard_normal((1, 5, 24, 40, 512)), jnp.bfloat16)

    def mlp_exact(x):
        y = jax.nn.gelu(x @ w1, approximate=False)
        return x + y @ w2

    rep("stage2 MLP gelu exact", timeit(mlp_exact, xs2))

    def mlp_tanh(x):
        y = jax.nn.gelu(x @ w1, approximate=True)
        return x + y @ w2

    rep("stage2 MLP gelu tanh-approx", timeit(mlp_tanh, xs2))

    out = "\n".join(report)
    with open("/tmp/swin_micro.txt", "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
