"""xPos invariants.

We can't import torchscale (not installed), so instead of golden values we
assert the mathematical properties that define xPos (SURVEY.md §2.1 decoder
row; torchscale semantics documented in nn/xpos.py):

1. relative invariance: q_i · k_j after xPos depends only on (i - j);
2. center cancellation: any ``center`` yields identical q·k scores;
3. decay: the relative factor zeta**((i-j)/scale_base) shrinks scores for
   distant pairs relative to near pairs of equal raw dot product;
4. offset consistency: applying xPos with offset=o equals applying it to a
   longer sequence and slicing — the KV-cache decode contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kosmosx_tpu.nn.xpos import apply_xpos


def _score(q, k):
    return jnp.einsum("ld,md->lm", q, k)


def test_relative_invariance_and_center_cancellation():
    d, L = 64, 32
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, L, d))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, L, d))

    s_a = _score(apply_xpos(q, center=0)[0], apply_xpos(k, downscale=True, center=0)[0])
    s_b = _score(apply_xpos(q, center=16)[0], apply_xpos(k, downscale=True, center=16)[0])
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b), rtol=1e-4, atol=1e-4)


def test_relative_shift_invariance():
    """Scores at (i, j) and (i+s, j+s) match when inputs are shifted copies."""
    d = 64
    key = jax.random.PRNGKey(1)
    qv = jax.random.normal(key, (1, 1, d))
    kv = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, d))
    # place the same q/k vectors at positions (2, 0) and (10, 8) via offset
    q_a = apply_xpos(qv, offset=2, center=0)[0, 0]
    k_a = apply_xpos(kv, offset=0, downscale=True, center=0)[0, 0]
    q_b = apply_xpos(qv, offset=10, center=0)[0, 0]
    k_b = apply_xpos(kv, offset=8, downscale=True, center=0)[0, 0]
    np.testing.assert_allclose(float(q_a @ k_a), float(q_b @ k_b), rtol=1e-4)


def test_offset_matches_sliced_full_sequence():
    """decode contract: xPos(x, offset=t) == xPos(full)[t] elementwise."""
    d, L = 64, 16
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, L, d))
    full = apply_xpos(x, offset=0, center=0)
    for t in [3, 7, 15]:
        one = apply_xpos(x[:, t:t + 1], offset=t, center=0)
        np.testing.assert_allclose(np.asarray(one[0, 0]), np.asarray(full[0, t]),
                                   rtol=1e-5, atol=1e-5)


def test_batched_offsets():
    d = 64
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 4, 1, d))  # (B, H, L=1, d)
    offs = jnp.array([3, 9], jnp.int32)
    out = apply_xpos(x, offset=offs, center=0)
    out3 = apply_xpos(x[0:1], offset=3, center=0)
    out9 = apply_xpos(x[1:2], offset=9, center=0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out3[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out9[0]), rtol=1e-5, atol=1e-5)


def test_long_range_decay():
    """Identical raw q·k pairs score lower at larger distances (the xPos
    long-context decay that replaces the reference's broken 2048-position
    table, SURVEY.md §2.6.3)."""
    d = 64
    q = jnp.ones((1, 1, d))
    k = jnp.ones((1, 1, d))
    score_near = float(apply_xpos(q, offset=10, center=0)[0, 0]
                       @ apply_xpos(k, offset=9, downscale=True, center=0)[0, 0])
    score_far = float(apply_xpos(q, offset=510, center=0)[0, 0]
                      @ apply_xpos(k, offset=9, downscale=True, center=0)[0, 0])
    assert abs(score_far) < abs(score_near)
