"""Training orchestration: pjit train step over a (data, fsdp, tensor) mesh.

This is the TPU-native rebuild of the reference's ``Train()``
(/root/reference/train.py:486-695): Accelerator+FSDP+DeepSpeed become one
jitted SPMD train step with NamedShardings; fp16 loss-scaling becomes plain
bf16; activation checkpointing becomes ``MagnetoConfig.remat``; NCCL
collectives become XLA ICI collectives implied by the shardings.

Defaults mirror the reference CFG (/root/reference/train.py:53-69) and its
Lion setup (:547-556): lr 1e-4, wd 0.1, betas (0.9, 0.95), cosine schedule
with 1% warmup (:567-583), grad clip 1.0 (:652), checkpoint every 1000 steps
(:663-668), logging every 100 (:674-678).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from kosmosx_tpu.parallel.mesh import make_mesh
from kosmosx_tpu.parallel.sharding import batch_spec, param_specs
from kosmosx_tpu.train import checkpoint as ckpt
from kosmosx_tpu.train.loss import next_token_loss
from kosmosx_tpu.train.optim import make_optimizer, make_schedule

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference CFG class (/root/reference/train.py:53-69)."""

    batch_size: int = 1
    grad_accum: int = 1
    seq_len: int = 8192
    seed: int = 42
    learning_rate: float = 1e-4
    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 1.0
    optimizer: str = "lion"
    schedule: str = "cosine"
    total_steps: int = 100_000
    warmup_steps: Optional[int] = None  # default: 1% of total (train.py:576)
    z_loss: float = 0.0
    checkpoint_every: int = 1000
    log_every: int = 100
    eval_every: int = 0   # validation cadence (0 = off); see Trainer.run
    # Multi-process data: False = every process feeds IDENTICAL host
    # batches (global placement); True = each process feeds its OWN
    # disjoint batches (shard_stream) contributed as local shards of the
    # global batch — the global batch is batch_size x process_count
    per_process_batches: bool = False
    # Background host->device prefetch thread. Disable when the batch
    # GENERATOR itself runs jitted device work (e.g. DPO reference
    # log-probs): device dispatch from the worker thread concurrently with
    # the main thread's collective train step can deadlock the one-core
    # CPU backend
    prefetch: bool = True
    output_dir: str = "checkpoints/"
    resume: bool = False
    # final consolidated params save to {output_dir}/final at end of run
    # (reference train.py:688-695 final_model.pt); off by default so library
    # callers don't write to disk unasked — the CLI turns it on
    final_save: bool = False
    # Frozen TOP-LEVEL param subtrees (e.g. ("clip",) for Kosmos training
    # with a frozen vision tower — the reference composes pretrained
    # encoder towers as frozen feature extractors). Frozen subtrees are
    # excluded from differentiation (JAX then saves no backward
    # activations through them) AND from the optimizer (no moments), so
    # freezing CLIP reclaims both its Lion state and its backward memory
    # — the two items that held multimodal training at batch 1
    # (BASELINE.md mm-train row: batch 2 was 182 MB short). Frozen leaves
    # pass through the train step bit-identical; checkpoints keep the
    # full param tree (opt_state shrinks to the trainable subtree).
    freeze: tuple = ()
    # mesh
    data: int = -1
    fsdp: int = 1
    tensor: int = 1
    expert: int = 1  # MoE expert parallelism (nn/moe.py)


class TrainState(dict):
    """{params, opt_state, step, rng} — a plain-dict pytree so orbax and
    optax see through it without custom registrations."""

    @staticmethod
    def create(params, opt_state, rng):
        return {"params": params, "opt_state": opt_state,
                "step": jnp.zeros([], jnp.int32), "rng": rng}


def split_frozen(params, freeze):
    """Partition a top-level param dict into (trainable, frozen) by key.
    Dict pytrees flatten in sorted key order, so re-merging ``{**t, **f}``
    reproduces the original structure exactly."""
    frozen = {k: params[k] for k in freeze if k in params}
    trainable = {k: v for k, v in params.items() if k not in frozen}
    return trainable, frozen


def make_train_step(loss_fn: Callable, optimizer,
                    freeze: tuple = ()) -> Callable:
    """loss_fn(params, batch, rng) -> (loss, metrics). Returns
    step(state, batch) -> (state, metrics). ``freeze``: top-level param
    keys excluded from differentiation and optimizer state (their leaves
    pass through unchanged; ``grad_norm`` covers trainable params only)."""

    def train_step(state, batch):
        rng, new_rng = jax.random.split(state["rng"])
        trainable, frozen = split_frozen(state["params"], freeze) \
            if freeze else (state["params"], None)
        if frozen:
            # differentiate ONLY the trainable subtree: JAX never builds
            # the frozen towers' backward, so their activations are not
            # saved — this, not just the dropped moments, is the memory win
            def loss_of(tr):
                return loss_fn({**tr, **frozen}, batch, rng)
        else:
            def loss_of(tr):
                return loss_fn(tr, batch, rng)
        (loss, metrics), grads = jax.value_and_grad(
            loss_of, has_aux=True)(trainable)
        updates, new_opt = optimizer.update(grads, state["opt_state"],
                                            trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_params = ({**new_trainable, **frozen} if frozen
                      else new_trainable)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = {"params": new_params, "opt_state": new_opt,
                     "step": state["step"] + 1, "rng": new_rng}
        return new_state, metrics

    return train_step


def lm_loss_fn(model_cfg, *, z_loss: float = 0.0) -> Callable:
    """Next-token CE for the text-only decoder (fixing the reference's broken
    ``return_loss=True`` call, SURVEY.md §2.6.4)."""
    from kosmosx_tpu.nn.decoder import decoder_forward

    def loss_fn(params, batch, rng):
        tokens = batch["input_ids"]
        mask = batch.get("attention_mask")
        seg = None
        if mask is not None:
            seg = jnp.where(mask > 0, 0, -1).astype(jnp.int32)
        if model_cfg.moe_experts > 0:
            logits, moe_aux = decoder_forward(params, tokens, model_cfg,
                                              segment_ids=seg, rng=rng,
                                              with_aux=True)
            loss, metrics = next_token_loss(logits, tokens, mask,
                                            z_loss=z_loss)
            metrics = dict(metrics)
            metrics["moe_aux"] = moe_aux
            return loss + moe_aux, metrics
        logits = decoder_forward(params, tokens, model_cfg,
                                 segment_ids=seg, rng=rng)
        return next_token_loss(logits, tokens, mask, z_loss=z_loss)

    return loss_fn


def kosmos_loss_fn(kcfg, *, z_loss: float = 0.0) -> Callable:
    """Multimodal CE: image+text batches {text_tokens, images}."""
    from kosmosx_tpu.models.kosmos import Kosmos
    from kosmosx_tpu.train.loss import multimodal_next_token_loss

    def loss_fn(params, batch, rng):
        if kcfg.decoder.moe_experts > 0:
            logits, moe_aux = Kosmos.apply(
                params, batch["text_tokens"], batch["images"], kcfg,
                use_padding_mask=True, rng=rng, with_aux=True)
            loss, metrics = multimodal_next_token_loss(
                logits, batch["text_tokens"], kcfg.image_embed_len,
                kcfg.splice_index, kcfg.decoder.padding_idx, z_loss=z_loss)
            metrics = dict(metrics)
            metrics["moe_aux"] = moe_aux
            return loss + moe_aux, metrics
        logits = Kosmos.apply(params, batch["text_tokens"], batch["images"],
                              kcfg, use_padding_mask=True, rng=rng)
        return multimodal_next_token_loss(
            logits, batch["text_tokens"], kcfg.image_embed_len,
            kcfg.splice_index, kcfg.decoder.padding_idx, z_loss=z_loss)

    return loss_fn


class Trainer:
    """End-to-end training driver (reference Train(),
    /root/reference/train.py:486-695)."""

    def __init__(self, init_fn: Callable, loss_fn: Callable,
                 cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh or make_mesh(data=cfg.data, fsdp=cfg.fsdp,
                                      tensor=cfg.tensor, expert=cfg.expert)
        schedule = make_schedule(cfg.schedule, cfg.learning_rate,
                                 cfg.total_steps, cfg.warmup_steps)
        self.schedule = schedule
        self.optimizer = make_optimizer(
            cfg.optimizer, schedule, weight_decay=cfg.weight_decay,
            beta1=cfg.beta1, beta2=cfg.beta2, grad_clip=cfg.grad_clip)
        if cfg.grad_accum > 1:
            self.optimizer = optax.MultiSteps(self.optimizer, cfg.grad_accum)
        self._init_fn = init_fn
        self._loss_fn = loss_fn
        self._step_fn = None
        self._eval_fn = None
        self.state = None
        self.state_shardings = None

    # -- state ---------------------------------------------------------------
    def init_state(self, initial_params=None):
        """Build sharded state. ``initial_params`` (e.g. a restored
        checkpoint) skips the random init entirely — the params are passed
        as a jit ARGUMENT, not a closure constant (big baked-in constants
        blow up remote-compile requests)."""
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)

        if cfg.freeze:
            shape = jax.eval_shape(self._init_fn, key) \
                if initial_params is None else initial_params
            if not isinstance(shape, dict):
                raise ValueError("TrainConfig.freeze needs a top-level "
                                 "param dict")
            missing = [k for k in cfg.freeze if k not in shape]
            if missing:
                raise ValueError(f"freeze keys {missing} not in params "
                                 f"(have {sorted(shape)})")

        if initial_params is None:
            def build(key):
                params = self._init_fn(key)
                opt_state = self.optimizer.init(
                    split_frozen(params, cfg.freeze)[0] if cfg.freeze
                    else params)
                return TrainState.create(params, opt_state, key)

            abstract = jax.eval_shape(build, key)
            specs = self._state_specs(abstract)
            self.state_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(self.mesh, s), specs)
            build_jit = jax.jit(build, out_shardings=self.state_shardings)
            self.state = build_jit(key)
            return self.state

        def build_from(params, key):
            opt_state = self.optimizer.init(
                split_frozen(params, cfg.freeze)[0] if cfg.freeze
                else params)
            return TrainState.create(params, opt_state, key)

        abstract = jax.eval_shape(build_from, initial_params, key)
        specs = self._state_specs(abstract)
        self.state_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs)
        build_jit = jax.jit(build_from, out_shardings=self.state_shardings)
        self.state = build_jit(initial_params, key)
        return self.state

    def _state_specs(self, abstract_state):
        pspecs = param_specs(abstract_state["params"])

        # optimizer state: slots that mirror a param (same shape) inherit its
        # spec; scalars/counters replicate
        by_shape = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                abstract_state["params"])[0]:
            spec = _get_by_path(pspecs, path)
            by_shape.setdefault((leaf.shape, str(leaf.dtype)), spec)

        fsdp_size = int(self.mesh.shape.get("fsdp", 1))

        def opt_spec(leaf):
            key = (getattr(leaf, "shape", ()), str(getattr(leaf, "dtype", "")))
            if key in by_shape:
                return by_shape[key]
            # blockwise-int8 moments (train/quant.py): (nblocks, block) codes
            # and (nblocks, 1) scales match no param shape; shard the block
            # axis over fsdp so quantized state keeps ZeRO memory scaling
            shape = key[0]
            if (len(shape) == 2 and shape[0] > 1
                    and shape[0] % fsdp_size == 0):
                return P("fsdp", None)
            return P()

        opt_specs = jax.tree_util.tree_map(opt_spec, abstract_state["opt_state"])
        return {"params": pspecs, "opt_state": opt_specs,
                "step": P(), "rng": P()}

    # -- step ---------------------------------------------------------------
    def _build_step(self):
        step = make_train_step(self._loss_fn, self.optimizer,
                               freeze=self.cfg.freeze)
        self._step_fn = jax.jit(
            step,
            in_shardings=(self.state_shardings, None),
            out_shardings=(self.state_shardings, None),
            donate_argnums=(0,))
        return self._step_fn

    def shard_batch(self, batch):
        from kosmosx_tpu.parallel.sharding import shard_batch
        return shard_batch(batch, self.mesh,
                           per_process=self.cfg.per_process_batches)

    # -- eval ----------------------------------------------------------------
    def _eval_loop(self, eval_batches: Iterable[Dict[str, Any]],
                   run_step: Callable) -> Dict:
        """Shared eval aggregation: mean loss/metrics over a validation set.
        ``run_step(sharded_batch) -> (loss, metrics)``. The metrics dict's
        own 'loss' entry is skipped (it duplicates the returned loss —
        adding both would double-count eval_loss)."""
        total: Dict[str, float] = {}
        n = 0
        for batch in eval_batches:
            loss, metrics = run_step(self.shard_batch(batch))
            total["eval_loss"] = total.get("eval_loss", 0.0) + float(loss)
            for k, v in metrics.items():
                if k == "loss":
                    continue
                try:
                    total[f"eval_{k}"] = total.get(f"eval_{k}", 0.0) + float(v)
                except TypeError:
                    pass
            n += 1
        return {k: v / max(n, 1) for k, v in total.items()}

    def evaluate(self, eval_batches: Iterable[Dict[str, Any]]) -> Dict:
        """Mean loss/metrics over a validation set (jitted forward-only
        step, no dropout rng, params untouched)."""
        if self._eval_fn is None:
            def eval_step(params, batch):
                loss, metrics = self._loss_fn(params, batch, None)
                return loss, metrics

            self._eval_fn = jax.jit(
                eval_step, in_shardings=(self.state_shardings["params"],
                                         None))
        return self._eval_loop(
            eval_batches,
            lambda b: self._eval_fn(self.state["params"], b))

    # -- loop ----------------------------------------------------------------
    def run(self, batches: Iterable[Dict[str, Any]],
            steps: Optional[int] = None,
            log_fn: Optional[Callable[[int, Dict], None]] = None,
            eval_batches: Optional[Callable[[], Iterable]] = None):
        """``eval_batches``: zero-arg callable returning a fresh validation
        iterable; evaluated every ``cfg.eval_every`` steps, metrics merged
        into that step's log line as ``eval_*``."""
        cfg = self.cfg
        if self.state is None:
            self.init_state()
        if self._step_fn is None:
            self._build_step()

        start_step = 0
        if cfg.resume:
            found = ckpt.latest_checkpoint(cfg.output_dir)
            if found:
                path, start_step = found
                self.state = ckpt.restore_checkpoint(path, self.state)
                logger.info("resumed from %s (step %d)", path, start_step)

        t0 = time.time()
        metrics = {}
        n = 0

        def _bounded():
            # bound BEFORE the prefetcher so it never reads past what this
            # run will consume (a shared iterator must not lose batches to
            # read-ahead when `steps` caps the run)
            yielded = 0
            for i, b in enumerate(batches):
                if i < start_step:  # skip_first_batches equiv (train.py:636)
                    continue
                if steps is not None and yielded >= steps:
                    return
                yield i, b
                yielded += 1

        if cfg.prefetch:
            from kosmosx_tpu.train.data import device_prefetch
            stream = device_prefetch(
                _bounded(), lambda ib: (ib[0], self.shard_batch(ib[1])))
        else:
            stream = ((i, self.shard_batch(b)) for i, b in _bounded())
        eval_metrics: Dict[str, float] = {}
        for i, batch in stream:
            self.state, metrics = self._step_fn(self.state, batch)
            n += 1
            step_no = int(i) + 1
            if cfg.eval_every and eval_batches is not None \
                    and step_no % cfg.eval_every == 0:
                eval_metrics = self.evaluate(eval_batches())
            if step_no % cfg.log_every == 0 or n == 1:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(eval_metrics)
                eval_metrics = {}  # fresh evals only — never re-log stale
                m["lr"] = float(self.schedule(step_no))
                m["steps_per_sec"] = n / (time.time() - t0)
                if log_fn:
                    log_fn(step_no, m)
                else:
                    logger.info("step %d %s", step_no,
                                json.dumps({k: round(v, 5) for k, v in m.items()}))
            if cfg.checkpoint_every and step_no % cfg.checkpoint_every == 0:
                ckpt.save_checkpoint(self.state, cfg.output_dir, step_no)
        if cfg.final_save:
            ckpt.save_params(self.final_params(),
                             os.path.join(cfg.output_dir, "final"))
        return self.state, metrics

    def final_params(self):
        """Params to persist in the final consolidated save."""
        return self.state["params"]


def _get_by_path(tree, path):
    node = tree
    for p in path:
        if hasattr(p, "key"):
            node = node[p.key]
        elif hasattr(p, "idx"):
            node = node[p.idx]
    return node
