"""Image-embedding splicing into token-embedding sequences.

The reference splices its 64 projected image embeddings into the text
embedding sequence right after [BOS, <image>]:
``cat([emb[:, 0:2], images, emb[:, 2:]], dim=1)``
(/root/reference/kosmosx/model.py:239-241). That only supports one image at a
fixed position. We implement:

- ``splice_single``: the exact reference behavior (static concatenation);
- ``splice_embeddings``: interleaved multi-image splicing at arbitrary
  per-sample positions (BASELINE.json config 4), as one static-shape gather —
  no dynamic shapes, no host round-trips, jit/pjit-safe.

Layout contract for the general form: image block m (K embeddings) is
inserted immediately AFTER text position ``positions[b, m]`` (the <image>
token). ``positions`` must be strictly increasing along m. Output length is
statically ``L_text + M*K``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def splice_single(text_emb: jax.Array, image_emb: jax.Array,
                  index: int = 2) -> jax.Array:
    """cat([text[:, :index], image, text[:, index:]]) — the reference splice
    (/root/reference/kosmosx/model.py:239-241 uses index=2: after BOS+<image>)."""
    return jnp.concatenate(
        [text_emb[:, :index], image_emb.astype(text_emb.dtype),
         text_emb[:, index:]], axis=1)


def splice_plan(positions: jax.Array, text_len: int, num_images: int,
                block: int) -> Tuple[jax.Array, jax.Array]:
    """Compute (gather_idx, is_image) for multi-image splicing.

    positions: (B, M) int32, strictly increasing along M; image m's block goes
    right after text position positions[b, m].
    Returns gather_idx (B, L_out) indexing into cat([text, images.flat], 1)
    and is_image (B, L_out) bool.
    """
    b, m = positions.shape
    out_len = text_len + num_images * block

    # target output index of each text token j: shifted by `block` for every
    # image inserted at a position < j
    j = jnp.arange(text_len)[None, :]                      # (1, Lt)
    shifts = jnp.sum(positions[:, :, None] < j[:, None, :], axis=1)  # (B, Lt)
    text_tgt = j + block * shifts                          # (B, Lt)

    # target output index of image element (m, k)
    k = jnp.arange(block)[None, None, :]
    m_idx = jnp.arange(num_images)[None, :, None]
    img_tgt = positions[:, :, None] + 1 + block * m_idx + k  # (B, M, K)
    img_tgt = img_tgt.reshape(b, num_images * block)

    batch_idx = jnp.arange(b)[:, None]
    gather_idx = jnp.zeros((b, out_len), jnp.int32)
    gather_idx = gather_idx.at[batch_idx, text_tgt].set(
        jnp.broadcast_to(jnp.arange(text_len)[None], (b, text_len)))
    gather_idx = gather_idx.at[batch_idx, img_tgt].set(
        text_len + jnp.arange(num_images * block)[None])
    is_image = jnp.zeros((b, out_len), bool).at[batch_idx, img_tgt].set(True)
    return gather_idx, is_image


def _default_positions(b: int, m: int, index: int, text_len: int) -> jax.Array:
    """Default multi-image anchor positions: back-to-back tag pairs in TEXT
    coordinates — [BOS, <image>, </image>, <image>, </image>, ...] puts the
    m-th <image> token at text position index-1 + 2m. (Positions are text
    coordinates; splice_plan handles the output-coordinate shifts.)"""
    last = index - 1 + 2 * (m - 1)
    if last >= text_len:
        raise ValueError(
            f"{m} default image positions (last at text index {last}) do not "
            f"fit a length-{text_len} text; pass explicit `image_positions`")
    return jnp.broadcast_to(
        index - 1 + 2 * jnp.arange(m)[None], (b, m)).astype(jnp.int32)


def splice_embeddings(text_emb: jax.Array, image_emb: jax.Array,
                      positions: Optional[jax.Array] = None,
                      index: int = 2) -> jax.Array:
    """General splice. text_emb (B, Lt, D); image_emb (B, K, D) or
    (B, M, K, D); positions (B, M) or None (single image at static ``index``,
    reference behavior)."""
    if image_emb.ndim == 3:
        image_emb = image_emb[:, None]
    b, m, k, d = image_emb.shape
    lt = text_emb.shape[1]
    if positions is None:
        if m == 1:
            return splice_single(text_emb, image_emb[:, 0], index)
        positions = _default_positions(b, m, index, lt)
    gather_idx, _ = splice_plan(positions.astype(jnp.int32), lt, m, k)
    src = jnp.concatenate(
        [text_emb, image_emb.astype(text_emb.dtype).reshape(b, m * k, d)], axis=1)
    return jnp.take_along_axis(src, gather_idx[:, :, None], axis=1)


def spliced_segment_ids(tokens: jax.Array, padding_idx: int,
                        num_images: int, block: int,
                        positions: Optional[jax.Array] = None,
                        index: int = 2) -> jax.Array:
    """Segment ids for a spliced sequence: 0 for real positions (text tokens
    and image embeddings), -1 for padding — the combined mask the reference
    never threads through attention (SURVEY.md §3.4). Shape (B, Lt + M*K)."""
    b, lt = tokens.shape
    text_valid = (tokens != padding_idx)
    if positions is None:
        positions = _default_positions(b, num_images, index, lt)
    gather_idx, is_image = splice_plan(positions, lt, num_images, block)
    src = jnp.concatenate(
        [text_valid, jnp.ones((b, num_images * block), bool)], axis=1)
    valid = jnp.take_along_axis(src, gather_idx, axis=1)
    return jnp.where(valid, 0, -1).astype(jnp.int32)
