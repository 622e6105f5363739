"""Sequence-parallel (context-parallel) training step.

Shards the SEQUENCE dimension of a causal-LM training step over a mesh axis
(on top of batch data parallelism) so context length scales with chips:
activations, attention, and logits all live at O(L/S) per device, and the
only cross-device traffic is the ring attention's neighbor K/V rotation
(parallel/ring_attention.py) plus one gradient psum.

The reference has nothing like this (SURVEY.md §2.3: no SP/CP anywhere) —
its 8192-token training config would overflow both its positional table and
a single device's memory.

Design (shard_map over a ("data", "sequence") mesh):
- params and optimizer state are replicated; every device computes the
  gradient of ITS shard's loss contribution and one ``psum`` over both axes
  makes gradients (and therefore updates) bit-identical everywhere;
- tokens and (pre-shifted) labels arrive sharded (batch over ``data``,
  length over ``sequence``). Labels must be shifted GLOBALLY before
  sharding — a shard's last position is supervised by the first token of
  the NEXT shard, which it cannot see locally. ``shift_labels`` does this;
- inside the shard, the decoder runs with ``cfg.sequence_axis`` set: ring
  attention + per-shard global position offsets (nn/decoder.decoder_forward
  ``position_offset``).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec


def make_sp_mesh(data: int = 1, sequence: int = -1, devices=None) -> Mesh:
    """A ("data", "sequence") mesh; ``sequence=-1`` absorbs the rest."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if sequence == -1:
        assert n % data == 0, (n, data)
        sequence = n // data
    assert data * sequence == n, f"{data}x{sequence} != {n}"
    return Mesh(np.asarray(devices).reshape(data, sequence),
                ("data", "sequence"))


def shift_labels(tokens: jax.Array, pad_id: int) -> Tuple[jax.Array, jax.Array]:
    """Global next-token labels + weights BEFORE sequence sharding.

    labels[:, t] = tokens[:, t+1]; the final position gets ``pad_id`` with
    weight 0. Returns (labels, weights) each (B, L)."""
    labels = jnp.concatenate(
        [tokens[:, 1:], jnp.full_like(tokens[:, :1], pad_id)], axis=1)
    weights = jnp.concatenate(
        [jnp.ones_like(tokens[:, 1:], jnp.float32),
         jnp.zeros_like(tokens[:, :1], jnp.float32)], axis=1)
    return labels, weights


def _local_loss(params, tokens, labels, weights, segment_ids,
                cfg: MagnetoConfig, axis: str, data_axis: str,
                interpret: bool, rng=None):
    i = lax.axis_index(axis)
    lq = tokens.shape[1]
    if cfg.sequence_schedule == "zigzag":
        from kosmosx_tpu.parallel.ring_attention import zigzag_position_offsets

        s = lax.psum(1, axis)
        offset = zigzag_position_offsets(i, lq, s)  # (lq,) per-position
    else:
        offset = i * lq
    logits = dec.decoder_forward(params, tokens, cfg, interpret=interpret,
                                 segment_ids=segment_ids, rng=rng,
                                 position_offset=offset).astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[..., None],
                                     axis=-1)[..., 0]
    nll = (logz - true_logit) * weights
    # global mean over every supervised position on the whole mesh
    loss_sum = lax.psum(jnp.sum(nll), (data_axis, axis))
    denom = lax.psum(jnp.sum(weights), (data_axis, axis))
    return loss_sum / jnp.maximum(denom, 1.0)


def make_seq_parallel_train_step(cfg: MagnetoConfig, optimizer, mesh: Mesh,
                                 *, axis: str = "sequence",
                                 data_axis: str = "data",
                                 interpret: bool = False) -> Callable:
    """Build ``step(state, tokens, labels, weights[, segment_ids, rng])
    -> (state, loss)``.

    - ``cfg.sequence_axis`` must equal ``axis`` (the decoder routes
      attention through the ring based on it); ``cfg.sequence_schedule``
      picks the ring schedule — with ``"zigzag"`` the step permutes the
      global sequence into the zigzag layout itself (and the loss is
      position-wise, so no unpermute is needed);
    - ``state = {"params", "opt_state"}`` replicated;
    - ``tokens``/``labels``/``weights``/``segment_ids``: (B, L) global
      arrays — the returned step is already shard_map'ed, jitted, and
      annotated, so pass them whole and XLA shards them (B over
      ``data_axis``, L over ``axis``). ``segment_ids`` enables padded /
      packed batches under SP; pass zeros (or reuse an attention mask's
      ``where(mask>0, 0, -1)``) for plain batches;
    - ``rng`` enables dropout (cfg.dropout / cfg.attention_dropout > 0);
      attention dropout routes through the all-gather fallback
      (nn/attention._gathered_sp_attention).
    """
    if cfg.sequence_axis != axis:
        raise ValueError(f"cfg.sequence_axis={cfg.sequence_axis!r} must "
                         f"match axis={axis!r}")
    s = int(mesh.shape[axis])

    def step(state, tokens, labels, weights, segment_ids, rng):
        def loss_fn(p):
            lrng = None
            if rng is not None:
                lrng = jax.random.fold_in(rng, lax.axis_index(axis))
                lrng = jax.random.fold_in(lrng, lax.axis_index(data_axis))
            return _local_loss(p, tokens, labels, weights, segment_ids, cfg,
                               axis, data_axis, interpret, rng=lrng)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        # The loss's psum transposes into an all-reduce of the cotangents,
        # so each device's grad already equals the GLOBAL gradient; pmean is
        # then an exact synchronizer (psum alone would overcount by the mesh
        # size — verified empirically: psum(grads)/n == single-device grads
        # to 1e-9).
        grads = lax.pmean(grads, (data_axis, axis))
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state}, loss

    batch_spec = P(data_axis, axis)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec, batch_spec, batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False)  # pallas_call carries no vma metadata

    def wrapped(state, tokens, labels, weights, segment_ids=None, rng=None):
        if segment_ids is None:
            segment_ids = jnp.zeros(tokens.shape, jnp.int32)
        if cfg.sequence_schedule == "zigzag":
            from kosmosx_tpu.parallel.ring_attention import zigzag_permute

            tokens, labels, segment_ids = (zigzag_permute(t, s)
                                           for t in (tokens, labels,
                                                     segment_ids))
            weights = zigzag_permute(weights, s)
        return sharded(state, tokens, labels, weights, segment_ids, rng)

    return jax.jit(wrapped, static_argnums=())
