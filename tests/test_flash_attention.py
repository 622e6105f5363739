"""Pallas flash-attention kernel vs the jnp oracle (interpret mode on CPU).

Mirrors the role of the reference's attention test
(/root/reference/tests/test_attention.py drives zeta MultiheadAttention with
flash_attn=True) but actually asserts numerics, which the reference never
does.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.ops.flash_attention import flash_attention, mha_reference


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_reference(causal, dtype):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    b, h, l, d = 2, 4, 256, 64
    q = _rand(k1, (b, h, l, d), dtype)
    k = _rand(k2, (b, h, l, d), dtype)
    v = _rand(k3, (b, h, l, d), dtype)
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_kv=128,
                          interpret=True)
    ref = mha_reference(q, k, v, causal=causal)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


def test_ragged_length_padding():
    """Non-block-multiple lengths are padded internally and unpadded back."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    b, h, l, d = 1, 2, 200, 64  # 200 not a multiple of 128
    q = _rand(k1, (b, h, l, d))
    k = _rand(k2, (b, h, l, d))
    v = _rand(k3, (b, h, l, d))
    out = flash_attention(q, k, v, causal=True, block_q=128, block_kv=128,
                          interpret=True)
    ref = mha_reference(q, k, v, causal=True)
    assert out.shape == (b, h, l, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_segment_ids_block_cross_attention():
    """Packed segments: tokens must not attend across segment boundaries."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    b, h, l, d = 1, 2, 256, 64
    q = _rand(k1, (b, h, l, d))
    k = _rand(k2, (b, h, l, d))
    v = _rand(k3, (b, h, l, d))
    seg = jnp.concatenate([jnp.zeros((b, 128), jnp.int32),
                           jnp.ones((b, 128), jnp.int32)], axis=1)
    out = flash_attention(q, k, v, causal=True, q_segment_ids=seg,
                          kv_segment_ids=seg, block_q=128, block_kv=128,
                          interpret=True)
    ref = mha_reference(q, k, v, causal=True, q_segment_ids=seg,
                        kv_segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    # second segment must equal attention computed on it alone
    out2 = flash_attention(q[:, :, 128:], k[:, :, 128:], v[:, :, 128:],
                           causal=True, block_q=128, block_kv=128,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :, 128:]), np.asarray(out2),
                               atol=2e-5, rtol=2e-5)


def test_gradients_match_reference():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(3), 4)
    b, h, l, d = 1, 2, 256, 64
    q = _rand(k1, (b, h, l, d))
    k = _rand(k2, (b, h, l, d))
    v = _rand(k3, (b, h, l, d))
    do = _rand(k4, (b, h, l, d))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=128,
                                       block_kv=128, interpret=True) * do)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) * do)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_mqa_style_short_kv():
    """Lq != Lk (bottom-right-aligned causal) on the reference path only —
    kernel path requires equal lengths for training; decode uses ops decode."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    q = _rand(k1, (1, 2, 4, 64))
    k = _rand(k2, (1, 2, 16, 64))
    v = _rand(k3, (1, 2, 16, 64))
    ref = mha_reference(q, k, v, causal=True)
    assert ref.shape == (1, 2, 4, 64)
    # last query row attends to everything: equals full softmax attention
    s = (q[0, :, -1:] @ k[0].transpose(0, 2, 1))
    p = jax.nn.softmax(s, axis=-1)
    expect = p @ v[0]
    np.testing.assert_allclose(np.asarray(ref[0, :, -1]),
                               np.asarray(expect[:, 0]), atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fused_xpos_matches_external(devices):
    """xpos_scale_base fused into the kernel == apply_xpos outside + plain
    kernel, for forward and all three input grads."""
    import jax
    from kosmosx_tpu.nn.xpos import apply_xpos

    key = jax.random.PRNGKey(11)
    B, H, L, D = 2, 2, 384, 64
    q = jax.random.normal(key, (B, H, L, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, L, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, L, D), jnp.float32)

    def ext(q, k, v):
        qr = apply_xpos(q, scale_base=512, downscale=False, center=L // 2)
        kr = apply_xpos(k, scale_base=512, downscale=True, center=L // 2)
        return flash_attention(qr, kr, v, causal=True, block_q=128,
                               block_kv=128, interpret=True)

    def fused(q, k, v):
        return flash_attention(q, k, v, causal=True, block_q=128,
                               block_kv=128, interpret=True,
                               xpos_scale_base=512)

    with jax.default_matmul_precision("highest"):
        np.testing.assert_allclose(np.asarray(ext(q, k, v)),
                                   np.asarray(fused(q, k, v)),
                                   atol=1e-4, rtol=1e-4)
        g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(ext(*a))), (0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(fused(*a))), (0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "seed", [pytest.param(s, marks=pytest.mark.slow) if s in (1, 3, 5)
             else s for s in range(6)])
def test_fuzz_random_configs_vs_oracle(devices, seed):
    """Randomized shapes/blocks/segments/xpos vs the jnp oracle (fixed
    seeds — deterministic 'fuzz')."""
    import jax
    from kosmosx_tpu.nn.xpos import apply_xpos

    rng = np.random.RandomState(seed)
    b = int(rng.choice([1, 2, 3]))
    h = int(rng.choice([1, 2, 4]))
    lq = int(rng.choice([128, 200, 384, 513]))
    d = int(rng.choice([32, 64]))
    block = int(rng.choice([128, 256]))
    causal = bool(rng.rand() < 0.7)
    use_seg = bool(rng.rand() < 0.5)
    use_xpos = bool(rng.rand() < 0.5)

    key = jax.random.PRNGKey(seed)
    q = jax.random.normal(key, (b, h, lq, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, lq, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, lq, d), jnp.float32)
    seg = None
    if use_seg:
        lengths = rng.randint(1, lq + 1, size=(b, 1))
        seg = jnp.asarray(
            np.where(np.arange(lq)[None] < lengths, 0, -1), jnp.int32)

    with jax.default_matmul_precision("highest"):
        out = flash_attention(
            q, k, v, causal=causal, q_segment_ids=seg, kv_segment_ids=seg,
            block_q=block, block_kv=block, interpret=True,
            xpos_scale_base=512 if use_xpos else None)
        qr, kr = q, k
        if use_xpos:
            qr = apply_xpos(q, scale_base=512, downscale=False, center=lq // 2)
            kr = apply_xpos(k, scale_base=512, downscale=True, center=lq // 2)
        ref = mha_reference(qr, kr, v, causal=causal,
                            q_segment_ids=seg, kv_segment_ids=seg)
    valid = np.ones((b, 1, lq, 1), bool)
    if use_seg:
        valid = np.asarray(seg)[:, None, :, None] == 0
    err = np.abs(np.asarray(out) - np.asarray(ref)) * valid
    assert err.max() < 5e-4, (err.max(), b, h, lq, d, block, causal,
                              use_seg, use_xpos)
