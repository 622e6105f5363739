"""Pipeline-parallel (GPipe-schedule) training step over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.3: absent), and its
FSDP/ZeRO stack cannot place a model whose LAYERS exceed one device's memory
even fully sharded (activations of the whole stack still live on every
rank). This module completes the parallelism matrix (dp / fsdp / tp / sp /
pp): the 24-layer decoder splits into contiguous stages over a ``pipe`` mesh
axis; microbatches stream through the stages GPipe-style; the only
cross-stage traffic is one activation ``ppermute`` per tick on ICI neighbor
links.

Design (shard_map over a ("data", "pipe") mesh):
- ``params["layers"]`` leaves (stacked ``(L, ...)`` — requires
  ``cfg.scan_layers=True``) are SHARDED over ``pipe`` axis 0: each device
  holds ``L/S`` layers and their optimizer moments — real parameter-memory
  scaling, unlike activation-only schemes. Embedding / positional /
  final-LN / output-projection params are replicated.
- schedule: ``T = M + S - 1`` ticks for ``M`` microbatches and ``S``
  stages. At tick ``t`` stage 0 injects microbatch ``min(t, M-1)`` (embed +
  positions), every stage runs its layer slice, the last stage applies the
  final LN + vocab projection and accumulates the NLL of microbatch
  ``t-(S-1)`` (masked while the pipe fills/drains), and activations rotate
  one stage forward via ``ppermute``. All devices execute the same program
  (SPMD); stage selection is by ``lax.axis_index``. The final-LN/projection
  therefore runs (masked) on every stage — wasted FLOPs proportional to
  1/S of one vocab projection; a production variant would all-gather the
  last stage's logits instead. The bubble fraction is the usual
  ``(S-1)/(M+S-1)``.
- gradients: the loss is a global ``psum`` mean whose transpose inflates
  each device's raw grad by the total device count; the exact global grads
  are ``psum(g, data)/n`` for the pipe-sharded layer leaves and
  ``psum(g, (data, pipe))/n`` for the replicated leaves — verified against
  single-device autodiff to float32 precision (tests/test_pipeline.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers
from kosmosx_tpu.nn.multiway import multiway_apply


def make_pp_mesh(data: int = 1, pipe: int = -1, devices=None) -> Mesh:
    """A ("data", "pipe") mesh; ``pipe=-1`` absorbs the rest."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if pipe == -1:
        assert n % data == 0, (n, data)
        pipe = n // data
    assert data * pipe == n, f"{data}x{pipe} != {n}"
    return Mesh(np.asarray(devices).reshape(data, pipe), ("data", "pipe"))


def pipeline_state_specs(state, *, axis: str = "pipe") -> Any:
    """PartitionSpec pytree for ``{"params", "opt_state"}``: every leaf under
    a ``"layers"`` key (params AND optimizer moments mirroring them) is
    sharded over ``axis`` along dim 0; everything else replicated."""

    def spec(path, leaf):
        under_layers = any(getattr(p, "key", None) == "layers" for p in path)
        if under_layers and getattr(leaf, "ndim", 0) >= 1:
            return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, state)


def _stage_forward(layer_params, x, cfg: MagnetoConfig, interpret: bool):
    """Run this device's (L/S, ...) stacked layer slice (no final LN)."""

    def one_layer(lp, xx):
        return dec.decoder_layer(lp, xx, cfg, interpret=interpret)[0]

    if cfg.remat:
        one_layer = jax.checkpoint(
            one_layer, policy=jax.checkpoint_policies.nothing_saveable,
            prevent_cse=False)

    def body(xx, lp):
        return one_layer(lp, xx), None

    x, _ = lax.scan(body, x, layer_params)
    return x


def _ln_project_nll(params, h, lbl, wts, cfg: MagnetoConfig):
    """Final LN + vocab projection + summed NLL for one microbatch.
    Returns (nll_sum, weight_sum) fp32 scalars."""
    hn = multiway_apply(cfg.multiway, layers.layer_norm, params["ln"], h, None)
    logits = dec.output_logits(params, hn, cfg).astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    true = jnp.take_along_axis(logits, lbl[..., None], -1)[..., 0]
    return jnp.sum((logz - true) * wts), jnp.sum(wts).astype(jnp.float32)


def make_pipeline_train_step(cfg: MagnetoConfig, optimizer, mesh: Mesh, *,
                             microbatches: Optional[int] = None,
                             axis: str = "pipe", data_axis: str = "data",
                             interpret: bool = False) -> Callable:
    """Build ``step(state, tokens, labels, weights) -> (state, loss)``.

    - ``cfg.scan_layers`` must be True and ``cfg.layers`` divisible by the
      pipe-axis size; dropout must be 0 (no rng threading through ticks).
    - ``state = {"params", "opt_state"}``; pass GLOBAL arrays — the returned
      step is shard_map'ed + jitted with ``pipeline_state_specs`` shardings,
      so XLA scatters layer leaves to their stages on first call.
    - ``tokens/labels/weights``: (B, L) with B divisible by
      ``data_size * microbatches`` (labels pre-shifted globally, e.g. via
      ``parallel.shift_labels``).
    - ``microbatches`` defaults to the number of stages.
    """
    S = mesh.shape[axis]
    M = int(microbatches) if microbatches else S
    if not cfg.scan_layers:
        raise ValueError("pipeline parallelism needs cfg.scan_layers=True "
                         "(stacked (L, ...) layer params to shard)")
    if cfg.layers % S != 0:
        raise ValueError(f"layers={cfg.layers} not divisible by pipe={S}")
    if cfg.dropout or cfg.attention_dropout:
        raise ValueError("pipeline step does not thread dropout rngs")
    T = M + S - 1

    def local_loss(params, tokens, labels, weights):
        my = lax.axis_index(axis)
        b_local, seq_len = tokens.shape
        assert b_local % M == 0, (b_local, M)
        mb = b_local // M
        toks_mb = tokens.reshape(M, mb, seq_len)
        lbl_mb = labels.reshape(M, mb, seq_len)
        wts_mb = weights.reshape(M, mb, seq_len)

        def tick(carry, t):
            x_prev, loss_sum, denom = carry
            # stage 0 injects microbatch t (held at the last one while
            # draining — masked out by `where` on later stages anyway)
            inj_tokens = lax.dynamic_index_in_dim(
                toks_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            inj, _ = dec.forward_embedding(params, cfg, inj_tokens)
            x_in = jnp.where(my == 0, inj.astype(x_prev.dtype), x_prev)
            h = _stage_forward(params["layers"], x_in, cfg, interpret)

            # LAST STAGE ONLY (real runtime branch, not a mask): final LN +
            # vocab projection + NLL of microbatch t-(S-1). Other stages run
            # the trivial branch — no wasted 32002-wide projection.
            out_t = t - (S - 1)
            sel = jnp.clip(out_t, 0, M - 1)
            lbl = lax.dynamic_index_in_dim(lbl_mb, sel, 0, keepdims=False)
            wts = lax.dynamic_index_in_dim(wts_mb, sel, 0, keepdims=False)
            is_loss_tick = (my == S - 1) & (out_t >= 0) & (out_t < M)

            def loss_branch(op):
                h_, lbl_, wts_ = op
                ls, dn = _ln_project_nll(params, h_, lbl_, wts_, cfg)
                return ls, dn

            def skip_branch(op):
                return jnp.float32(0.0), jnp.float32(0.0)

            ls, dn = lax.cond(is_loss_tick, loss_branch, skip_branch,
                              (h, lbl, wts))
            loss_sum = loss_sum + ls
            denom = denom + dn

            x_next = lax.ppermute(h, axis,
                                  [(i, (i + 1) % S) for i in range(S)])
            return (x_next, loss_sum, denom), None

        x0 = jnp.zeros((mb, seq_len, cfg.embed_dim), cfg.dtype)
        (_, loss_sum, denom), _ = lax.scan(
            tick, (x0, jnp.float32(0.0), jnp.float32(0.0)), jnp.arange(T))
        loss_sum = lax.psum(loss_sum, (data_axis, axis))
        denom = lax.psum(denom, (data_axis, axis))
        return loss_sum / jnp.maximum(denom, 1.0)

    def step(state, tokens, labels, weights):
        loss, grads = jax.value_and_grad(local_loss)(
            state["params"], tokens, labels, weights)
        # The loss psum's transpose inflates every device's raw grad by the
        # TOTAL device count n = data*pipe (check_vma=False: psum transposes
        # to psum). Exact global grads — verified against single-device
        # autodiff (tests/test_pipeline.py):
        #   sharded layer leaves: psum over data, / n
        #   replicated leaves (embed/pos/ln/out): psum over BOTH axes, / n
        # (contributions live only on the stages that use them).
        n_total = mesh.shape[data_axis] * S

        def sync(path, g):
            under_layers = any(getattr(p, "key", None) == "layers"
                               for p in path)
            reduced = lax.psum(g, data_axis if under_layers
                               else (data_axis, axis))
            return reduced / n_total

        grads = jax.tree_util.tree_map_with_path(sync, grads)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state}, loss

    # spec trees are built lazily on the first call (they depend on the
    # optimizer-state structure)
    compiled: Dict[str, Callable] = {}

    def call(state, tokens, labels, weights):
        if "fn" not in compiled:
            state_specs = pipeline_state_specs(state, axis=axis)
            batch_spec = P(data_axis, None)
            sharded = jax.shard_map(
                step, mesh=mesh,
                in_specs=(state_specs, batch_spec, batch_spec, batch_spec),
                out_specs=(state_specs, P()),
                check_vma=False)  # pallas_call carries no vma metadata
            compiled["fn"] = jax.jit(sharded)
        return compiled["fn"](state, tokens, labels, weights)

    return call


# ---------------------------------------------------------------------------
# 1F1B schedule (explicitly-scheduled forward/backward, O(S) activation stash)
# ---------------------------------------------------------------------------

def make_pipeline_train_step_1f1b(cfg: MagnetoConfig, optimizer, mesh: Mesh,
                                  *, microbatches: Optional[int] = None,
                                  axis: str = "pipe",
                                  data_axis: str = "data",
                                  interpret: bool = False) -> Callable:
    """1F1B pipeline train step: ``step(state, tokens, labels, weights)``.

    Unlike the GPipe step (which lets jax.grad differentiate the whole
    scheduled forward, keeping all M microbatch stage-inputs alive), this
    schedules forward AND backward ticks explicitly:

    - stage ``i`` forwards microbatch ``j`` at tick ``i + j`` and backwards
      it at tick ``2(S-1) - i + j`` (the classic non-interleaved 1F1B);
      total ticks ``T = M + 2S - 2``;
    - each stage stashes only its microbatch INPUTS in a ``min(2S-1, M)``
      -slot ring buffer — activation memory is O(S), not O(M) — and
      recomputes its forward during the backward tick (per-stage remat);
    - backward ticks run ``jax.vjp`` of the stage function; the last stage
      seeds the cotangent from its own loss (``lax.cond`` keeps the
      32002-wide projection off the other stages), everyone else applies the
      cotangent arriving from the right;
    - per tick, activations ppermute left->right and cotangents
      right->left — both on ICI neighbor links.

    Grad math: the loss is sum(nll)/denom with a GLOBAL denom (computed
    before the pipeline), so per-microbatch cotangents just add; layer-shard
    grads psum over ``data`` only, replicated-param grads over both axes.
    Verified against single-device autodiff (tests/test_pipeline.py).
    """
    S = mesh.shape[axis]
    M = int(microbatches) if microbatches else S
    if not cfg.scan_layers:
        raise ValueError("pipeline parallelism needs cfg.scan_layers=True")
    if cfg.layers % S != 0:
        raise ValueError(f"layers={cfg.layers} not divisible by pipe={S}")
    if cfg.dropout or cfg.attention_dropout:
        raise ValueError("pipeline step does not thread dropout rngs")
    T = M + 2 * S - 2
    K = min(2 * S - 1, M)  # stash slots

    def local_loss_and_grads(params, tokens, labels, weights, denom):
        my = lax.axis_index(axis)
        b_local, seq_len = tokens.shape
        assert b_local % M == 0, (b_local, M)
        mb = b_local // M
        toks_mb = tokens.reshape(M, mb, seq_len)
        lbl_mb = labels.reshape(M, mb, seq_len)
        wts_mb = weights.reshape(M, mb, seq_len)

        def stage_fn(p, x_in, toks):
            inj, _ = dec.forward_embedding(p, cfg, toks)
            x = jnp.where(my == 0, inj.astype(x_in.dtype), x_in)
            return _stage_forward(p["layers"], x, cfg, interpret)

        def stage_loss_fn(p, x_in, toks, lbl, wts):
            h = stage_fn(p, x_in, toks)
            nll_sum, _ = _ln_project_nll(p, h, lbl, wts, cfg)
            return nll_sum / denom

        zero_grads = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), params)

        def tick(carry, t):
            h_recv, g_recv, stash, dparams, loss_sum = carry

            # ---- forward tick: microbatch j_f = t - my ----
            j_f = t - my
            do_fwd = (j_f >= 0) & (j_f < M)
            sel_f = jnp.clip(j_f, 0, M - 1)
            toks_f = lax.dynamic_index_in_dim(toks_mb, sel_f, 0,
                                              keepdims=False)
            # no stage forward on fill/drain ticks (real branch, not a mask)
            y = lax.cond(do_fwd,
                         lambda op: stage_fn(params, op[0], op[1]),
                         lambda op: op[0],
                         (h_recv, toks_f))
            # gate the stash write: drain ticks must not clobber slot M-1
            # before its backward reads it
            slot_cur = lax.dynamic_index_in_dim(stash, sel_f % K, 0,
                                                keepdims=False)
            stash = lax.dynamic_update_index_in_dim(
                stash, jnp.where(do_fwd, h_recv, slot_cur), sel_f % K, 0)

            is_last = my == S - 1

            # ---- backward tick: microbatch j_b = t - (2(S-1) - my) ----
            j_b = t - (2 * (S - 1) - my)
            do_bwd = (j_b >= 0) & (j_b < M)
            sel_b = jnp.clip(j_b, 0, M - 1)
            x_saved = lax.dynamic_index_in_dim(stash, sel_b % K, 0,
                                               keepdims=False)
            toks_b = lax.dynamic_index_in_dim(toks_mb, sel_b, 0,
                                              keepdims=False)
            lbl_b = lax.dynamic_index_in_dim(lbl_mb, sel_b, 0, keepdims=False)
            wts_b = lax.dynamic_index_in_dim(wts_mb, sel_b, 0, keepdims=False)

            def bwd_last(op):
                x_s, g_in = op
                loss_val, vjp = jax.vjp(
                    lambda p, x: stage_loss_fn(p, x, toks_b, lbl_b, wts_b),
                    params, x_s)
                dp, dx = vjp(jnp.float32(1.0))
                return (jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32), dp),
                    dx.astype(cfg.dtype), loss_val)

            def bwd_mid(op):
                x_s, g_in = op
                _, vjp = jax.vjp(
                    lambda p, x: stage_fn(p, x, toks_b), params, x_s)
                dp, dx = vjp(g_in.astype(cfg.dtype))
                return (jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32), dp),
                    dx.astype(cfg.dtype), jnp.float32(0.0))

            dp, dx, loss_val = lax.cond(is_last, bwd_last, bwd_mid,
                                        (x_saved, g_recv))
            gate = do_bwd.astype(jnp.float32)
            dparams = jax.tree_util.tree_map(
                lambda acc, g: acc + gate * g, dparams, dp)
            loss_sum = loss_sum + gate * loss_val

            # ---- communication ----
            h_next = lax.ppermute(y, axis,
                                  [(i, (i + 1) % S) for i in range(S)])
            g_next = lax.ppermute(dx, axis,
                                  [(i, (i - 1) % S) for i in range(S)])
            return (h_next, g_next, stash, dparams, loss_sum), None

        x0 = jnp.zeros((mb, seq_len, cfg.embed_dim), cfg.dtype)
        g0 = jnp.zeros((mb, seq_len, cfg.embed_dim), cfg.dtype)
        stash0 = jnp.zeros((K, mb, seq_len, cfg.embed_dim), cfg.dtype)
        (_, _, _, dparams, loss_sum), _ = lax.scan(
            tick, (x0, g0, stash0, zero_grads, jnp.float32(0.0)),
            jnp.arange(T))
        return loss_sum, dparams

    def step(state, tokens, labels, weights):
        # global denominator first (the loss is sum(nll)/denom everywhere)
        denom = lax.psum(jnp.sum(weights.astype(jnp.float32)),
                         (data_axis, axis)) / S  # weights replicated on pipe
        loss_sum, grads = local_loss_and_grads(
            state["params"], tokens, labels, weights,
            jnp.maximum(denom, 1.0))
        loss = lax.psum(loss_sum, (data_axis, axis))

        def sync(path, g):
            under_layers = any(getattr(p, "key", None) == "layers"
                               for p in path)
            return lax.psum(g, data_axis if under_layers
                            else (data_axis, axis))

        grads = jax.tree_util.tree_map_with_path(sync, grads)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state}, loss

    compiled: Dict[str, Callable] = {}

    def call(state, tokens, labels, weights):
        if "fn" not in compiled:
            state_specs = pipeline_state_specs(state, axis=axis)
            batch_spec = P(data_axis, None)
            sharded = jax.shard_map(
                step, mesh=mesh,
                in_specs=(state_specs, batch_spec, batch_spec, batch_spec),
                out_specs=(state_specs, P()),
                check_vma=False)
            compiled["fn"] = jax.jit(sharded)
        return compiled["fn"](state, tokens, labels, weights)

    call.num_ticks = T
    call.stash_slots = K
    return call
