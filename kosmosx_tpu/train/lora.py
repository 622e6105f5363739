"""LoRA (low-rank adaptation) fine-tuning over explicit param pytrees.

Capability extension beyond the reference (kyegomez/Kosmos-X fine-tunes by
resuming full training, /root/reference/train.py:618-639; it has no
parameter-efficient path). TPU-native design:

- LoRA factors live INSIDE the model's param pytree, at the same path as the
  linear they adapt: ``params[...]["lora"] = {"a": (in, r), "b": (r, out),
  "scale": ()}``. ``nn/layers.linear`` adds ``scale * (x @ a) @ b`` to its
  output, so every consumer — scan-stacked decoder layers, multiway experts,
  W8 int8 base weights (QLoRA-style), pjit sharding rules — composes with no
  special cases.
- Training differentiates ONLY the LoRA subtree: the loss closes over the
  frozen base as a separate jit argument (never a baked-in constant), so
  optimizer state is rank-sized and XLA dead-code-eliminates the frozen
  weight-gradient matmuls.
- ``merge_lora`` folds ``w + scale * a @ b`` for zero-overhead serving.

Scan-stacked layers (``MagnetoConfig.scan_layers``) store weights as
``(L, in, out)``; the factors get the same leading stack dims and
``lax.scan`` slices them alongside the base weight.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

# Linear projections applied via nn/layers.linear. MoE expert stacks and conv
# patch-embeds use their own einsum paths and are not targeted.
DEFAULT_TARGETS = ("q", "k", "v", "out", "fc1", "fc2")
ALL_TARGETS = DEFAULT_TARGETS + ("out_proj", "image_proj", "to_q", "to_kv",
                                 "to_out")


def _effective_name(path: Tuple) -> str:
    """Name of the linear a param dict belongs to. Multiway expert keys A/B
    are transparent (attn/out/A is the 'out' projection), matching the
    sharding rules (parallel/sharding.py)."""
    names = [p for p in path if isinstance(p, str) and p not in ("A", "B")]
    return names[-1] if names else ""


def _weight_shape(w) -> Tuple[Tuple[int, ...], Tuple[int, int]]:
    """(leading stack dims, (in, out)) of a base weight that may be a raw
    array or a W8 dict {"q": int8 (..., in, out), "scale": (..., 1, out)}."""
    arr = w["q"] if isinstance(w, dict) else w
    return tuple(arr.shape[:-2]), (int(arr.shape[-2]), int(arr.shape[-1]))


def add_lora(key, params, rank: int, *, alpha: Optional[float] = None,
             targets: Sequence[str] = DEFAULT_TARGETS,
             dtype=jnp.float32) -> Any:
    """Insert zero-initialized LoRA factors into every targeted linear.

    ``a`` ~ N(0, 1/rank), ``b`` = 0 (the adapted model is exactly the base
    model at init), ``scale`` = alpha/rank (alpha defaults to rank, i.e.
    scale 1.0 — the common fine-tuning default)."""
    if rank <= 0:
        raise ValueError(f"rank must be positive, got {rank}")
    scale_val = (alpha if alpha is not None else float(rank)) / float(rank)
    targets = tuple(targets)

    def is_target(node, path):
        if not (isinstance(node, dict) and "w" in node):
            return False
        if _effective_name(path) not in targets:
            return False
        w = node["w"]
        if isinstance(w, dict):  # W8 int8 base (QLoRA-style)
            return "q" in w
        return getattr(w, "ndim", 0) >= 2

    def rec(node, path):
        if isinstance(node, dict):
            if is_target(node, path):
                import zlib
                sub = jax.random.fold_in(
                    key, zlib.crc32("/".join(map(str, path)).encode()))
                lead, (din, dout) = _weight_shape(node["w"])
                a = (jax.random.normal(sub, lead + (din, rank), dtype)
                     / jnp.sqrt(jnp.asarray(rank, dtype)))
                b = jnp.zeros(lead + (rank, dout), dtype)
                scale = jnp.full(lead, scale_val, dtype)
                return {**node, "lora": {"a": a, "b": b, "scale": scale}}
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v, path + (i,)) for i, v in enumerate(node))
        return node

    return rec(params, ())


def strip_lora(params) -> Tuple[Any, Any]:
    """Split an adapted tree into (base_params, lora_tree). ``lora_tree``
    mirrors the param structure but contains only the ``lora`` nodes, so
    ``attach_lora(base, lora_tree)`` reconstitutes the adapted tree."""

    def rec(node):
        if isinstance(node, dict):
            if "lora" in node and isinstance(node["lora"], dict) \
                    and "a" in node["lora"]:
                base = {k: v for k, v in node.items() if k != "lora"}
                return base, {"lora": node["lora"]}
            pairs = {k: rec(v) for k, v in node.items()}
            base = {k: b for k, (b, l) in pairs.items()}
            lora = {k: l for k, (b, l) in pairs.items() if l is not None}
            return base, (lora or None)
        if isinstance(node, (list, tuple)):
            pairs = [rec(v) for v in node]
            base = type(node)(b for b, l in pairs)
            if any(l is not None for b, l in pairs):
                # keep positional alignment: empty dicts where no lora
                return base, type(node)((l if l is not None else {})
                                        for b, l in pairs)
            return base, None
        return node, None

    base, lora = rec(params)
    return base, (lora or {})


def attach_lora(base_params, lora_tree) -> Any:
    """Inverse of :func:`strip_lora`: graft the lora subtrees back in."""

    def rec(node, lnode):
        if lnode is None or (isinstance(lnode, dict) and not lnode):
            return node
        if isinstance(lnode, dict) and "lora" in lnode \
                and isinstance(lnode["lora"], dict) and "a" in lnode["lora"]:
            return {**node, "lora": lnode["lora"]}
        if isinstance(node, dict):
            return {k: rec(v, lnode.get(k)) if isinstance(lnode, dict)
                    else v for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v, lnode[i]) for i, v in enumerate(node))
        return node

    return rec(base_params, lora_tree)


def merge_lora(params) -> Any:
    """Fold every ``lora`` node into its base weight (``w += scale * a @ b``)
    and drop the factors — zero-overhead inference. W8 (int8) base weights
    cannot absorb a delta exactly; keep those unmerged (the apply path adds
    the delta at runtime) — merging them raises."""

    def rec(node):
        if isinstance(node, dict):
            if "lora" in node and isinstance(node["lora"], dict) \
                    and "a" in node["lora"]:
                w = node["w"]
                if isinstance(w, dict):
                    raise ValueError(
                        "cannot merge LoRA into int8 (W8) base weights; "
                        "serve unmerged (nn/layers.linear applies the delta) "
                        "or dequantize first")
                l = node["lora"]
                delta = jnp.einsum("...ir,...ro->...io", l["a"], l["b"])
                scale = l["scale"][..., None, None] if l["scale"].ndim else \
                    l["scale"]
                new = dict(node)
                new.pop("lora")
                new["w"] = (w + (scale * delta).astype(w.dtype))
                return new
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v) for v in node)
        return node

    return rec(params)


def num_lora_params(lora_tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora_tree))


def make_lora_train_step(loss_fn: Callable, optimizer) -> Callable:
    """loss_fn(params, batch, rng) -> (loss, metrics) over the FULL adapted
    tree. Returns ``step(state, base_params, batch) -> (state, metrics)``
    where ``state = {"lora", "opt_state", "step", "rng"}`` and gradients /
    optimizer state exist only for the LoRA factors."""

    def train_step(state, base_params, batch):
        rng, new_rng = jax.random.split(state["rng"])

        def lora_loss(lora_tree):
            return loss_fn(attach_lora(base_params, lora_tree), batch, rng)

        (loss, metrics), grads = jax.value_and_grad(
            lora_loss, has_aux=True)(state["lora"])
        updates, new_opt = optimizer.update(grads, state["opt_state"],
                                            state["lora"])
        new_lora = optax.apply_updates(state["lora"], updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return {"lora": new_lora, "opt_state": new_opt,
                "step": state["step"] + 1, "rng": new_rng}, metrics

    return train_step


def lora_state(lora_tree, optimizer, rng) -> dict:
    return {"lora": lora_tree, "opt_state": optimizer.init(lora_tree),
            "step": jnp.zeros([], jnp.int32), "rng": rng}


class LoraTrainer:
    """Parameter-efficient fine-tuning driver: frozen sharded base + LoRA
    state, reusing :class:`~kosmosx_tpu.train.trainer.Trainer`'s loop.

    ``base_params`` may be passed in (e.g. restored from a checkpoint via
    train/checkpoint.restore_params); otherwise ``init_fn`` builds them."""

    def __init__(self, init_fn: Callable, loss_fn: Callable, cfg,
                 rank: int, *, alpha: Optional[float] = None,
                 targets: Sequence[str] = DEFAULT_TARGETS, mesh=None,
                 base_params=None):
        from kosmosx_tpu.train.trainer import Trainer

        # reuse Trainer for mesh/optimizer/schedule construction and run()
        self._t = Trainer(init_fn, loss_fn, cfg, mesh=mesh)
        self._t.init_state = self.init_state
        self._t._build_step = self._build_step
        self._t.final_params = self._final_params
        self._t.evaluate = self.evaluate
        self._eval_jit = None
        self.rank, self.alpha, self.targets = rank, alpha, tuple(targets)
        self._given_base = base_params
        self.base_params = None
        self.base_shardings = None

    # delegate the public surface
    @property
    def cfg(self):
        return self._t.cfg

    @property
    def mesh(self):
        return self._t.mesh

    @property
    def optimizer(self):
        return self._t.optimizer

    @property
    def state(self):
        return self._t.state

    def run(self, batches, steps=None, log_fn=None, eval_batches=None):
        return self._t.run(batches, steps=steps, log_fn=log_fn,
                           eval_batches=eval_batches)

    def evaluate(self, eval_batches):
        """Validation over the ADAPTED model (base + current factors);
        aggregation/sharding shared with Trainer._eval_loop."""
        if self._eval_jit is None:
            def eval_step(lora_tree, base, batch):
                return self._t._loss_fn(attach_lora(base, lora_tree),
                                        batch, None)

            self._eval_jit = jax.jit(eval_step)
        return self._t._eval_loop(
            eval_batches,
            lambda b: self._eval_jit(self._t.state["lora"],
                                     self.base_params, b))

    def init_state(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from kosmosx_tpu.parallel.sharding import param_specs, shard_params

        cfg = self._t.cfg
        key = jax.random.PRNGKey(cfg.seed)
        kb, kl = jax.random.split(key)

        if self._given_base is not None:
            self.base_params = shard_params(self._given_base, self.mesh)
        else:
            abstract = jax.eval_shape(self._t._init_fn, kb)
            shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(self.mesh, s), param_specs(abstract))
            self.base_params = jax.jit(
                self._t._init_fn, out_shardings=shardings)(kb)
        self.base_shardings = jax.tree_util.tree_map(
            lambda x: x.sharding, self.base_params)

        lora_tree = strip_lora(add_lora(
            kl, jax.eval_shape(lambda: self.base_params), self.rank,
            alpha=self.alpha, targets=self.targets))[1]
        repl = NamedSharding(self.mesh, P())
        state = lora_state(lora_tree, self._t.optimizer, kl)
        # everything rank-sized: replicate the whole LoRA state on the mesh
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state)
        self._t.state_shardings = jax.tree_util.tree_map(
            lambda x: repl, state)
        self._t.state = state
        return state

    def _build_step(self):
        step = make_lora_train_step(self._t._loss_fn, self._t.optimizer)
        jitted = jax.jit(
            step,
            in_shardings=(self._t.state_shardings, self.base_shardings, None),
            out_shardings=(self._t.state_shardings, None),
            donate_argnums=(0,))
        self._t._step_fn = lambda state, batch: jitted(
            state, self.base_params, batch)
        return self._t._step_fn

    def adapted_params(self):
        """Base + current LoRA factors (unmerged apply-time tree)."""
        return attach_lora(self.base_params, self._t.state["lora"])

    def merged_params(self):
        """Base with LoRA deltas folded in — for zero-overhead serving."""
        return merge_lora(self.adapted_params())

    def _final_params(self):
        """Final consolidated save: merged when the base can absorb the
        deltas; the unmerged adapted tree for W8/QLoRA bases (int8 codes
        cannot take an exact delta — nn/layers.linear applies it at
        runtime instead), so a final_save run never crashes post-training."""
        try:
            return self.merged_params()
        except ValueError:
            return self.adapted_params()
