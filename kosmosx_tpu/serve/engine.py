"""Continuous-batching serving engine (slot-based KV cache).

The reference ships NO serving/inference layer at all (SURVEY.md §1: no
``serve()``, no generation loop, no KV cache use anywhere; torchscale's
``incremental_state`` is never exercised). This module goes beyond parity
and provides a production-shaped serving path, designed TPU-first:

- ALL device state has static shapes: a fixed pool of ``max_batch`` decode
  slots over one stacked KV cache, prompts padded to ``max_prompt_len`` —
  so exactly two programs are compiled (one prefill, one decode step) no
  matter how requests arrive;
- decode advances every active slot one token per step in a single jitted
  call (continuous batching: new requests are admitted into free slots
  between steps, without disturbing in-flight ones);
- admission = batch-1 prefill + a jitted cache insert
  (``dynamic_update_index_in_dim`` into the slot axis);
- per-slot cache indices make ragged prompts/generation lengths exact: a
  slot's stale cache contents past its index are never attended to.

EOS detection and request bookkeeping run on the host (the per-step token
fetch is required to stream tokens out anyway), but the decode feedback loop
never leaves the device, so ``ServeConfig.sync_lag`` lets the host's token
reads pipeline K steps behind the device — hiding the device->host link
latency behind compute at the cost of K-step-late EOS reaction (trailing
speculative tokens are discarded), ``ServeConfig.drain_batch`` reads K
steps' tokens back in one batched transfer (one link round-trip per K
steps), and ``ServeConfig.decode_block`` runs K decode steps per dispatch
to amortize the dispatch overhead itself.
Measured on the flagship (BASELINE.md round-5 table): 186 tok/s fully
synchronous -> 523 at sync_lag=4 -> 588 with the async-drain reader (the
default) -> 1,066 with W8 weights + int8 KV cache + decode_block=4 on top
(1.17x the bf16 no-streaming decode ceiling — the levers raise the
ceiling itself).

Module layout (split for reviewability; the public surface is unchanged):
- serve/config.py    ServeConfig, Request, the mode-compatibility matrix
- serve/programs.py  the jitted device programs (prefill/decode/spec/chunk)
- serve/admission.py submit / prefixes / adapters / chunked ingestion
- serve/engine.py    (this file) the orchestration loop
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict, deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kosmosx_tpu.core.config import KosmosConfig, MagnetoConfig
from kosmosx_tpu.generate.sampler import SamplingConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.serve.admission import AdmissionMixin
from kosmosx_tpu.serve.config import (Request, ServeConfig,
                                      check_engine_modes)
from kosmosx_tpu.serve.programs import (_decode_block_jit, _decode_step_jit,
                                        _recenter_pool_jit,
                                        _spec_block_pool_jit,
                                        _spec_step_pool_jit)

__all__ = ["ServeConfig", "Request", "ServeEngine"]


class ServeEngine(AdmissionMixin):
    """Continuous-batching engine over one model replica.

    >>> eng = ServeEngine(params, cfg, ServeConfig(max_batch=4))
    >>> h = eng.submit([3, 17, 9], max_new_tokens=16, eos_id=2)
    >>> eng.run()          # drain all pending/in-flight requests
    >>> h.tokens           # generated ids (stops at eos_id if hit)

    For Kosmos multimodal params pass ``kosmos_cfg`` and submit requests
    with ``images``; text-only requests work against the same engine.
    """

    def __init__(self, params, cfg: MagnetoConfig,
                 serve_cfg: Optional[ServeConfig] = None,
                 sampling: Optional[SamplingConfig] = None,
                 kosmos_cfg: Optional[KosmosConfig] = None,
                 rng: Optional[jax.Array] = None,
                 draft_params=None, draft_cfg: Optional[MagnetoConfig] = None,
                 interpret: bool = False, mesh=None):
        scfg_ = serve_cfg or ServeConfig()
        sampling = sampling or SamplingConfig(greedy=True)
        self.spec = scfg_.spec_gamma > 0
        if self.spec and (draft_params is None or draft_cfg is None):
            raise ValueError("spec_gamma > 0 needs draft_params and "
                             "draft_cfg")
        # every statically-knowable unsupported mode pairing raises HERE,
        # with the reason from serve/config.UNSUPPORTED_MODE_PAIRS — never
        # mid-flight
        check_engine_modes(cfg, scfg_, draft_cfg=draft_cfg,
                           kosmos_cfg=kosmos_cfg,
                           sampling=sampling if self.spec else None)
        # serving-side unroll gate (ServeConfig.unroll_min_len, None =
        # inherit): decides the pool's resident layout, see _pool_layout
        if scfg_.unroll_min_len is not None:
            cfg = dataclasses.replace(
                cfg, decode_unroll_min_len=scfg_.unroll_min_len)
            if draft_cfg is not None:
                draft_cfg = dataclasses.replace(
                    draft_cfg, decode_unroll_min_len=scfg_.unroll_min_len)
        self.cfg = cfg
        self.kcfg = kosmos_cfg
        self.params = params
        self.dec_params = params["decoder"] if kosmos_cfg is not None else params
        self.scfg = scfg_
        self.sampling = sampling
        self.interpret = interpret
        self.double_scale = bool(kosmos_cfg.parity_double_scale) \
            if kosmos_cfg is not None else False
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        # host copy of the key words for the zero-dispatch per-step key
        # schedule (_fold); typed keys unwrap via key_data
        raw = (jax.random.key_data(self.rng)
               if jnp.issubdtype(getattr(self.rng, "dtype", jnp.uint32),
                                 jax.dtypes.prng_key) else self.rng)
        self._rng_host = np.asarray(jax.device_get(raw), np.uint32).copy()
        self._fold_n = 0
        b = self.scfg.max_batch
        # Multi-chip serving: pass params sharded over a (tensor-parallel)
        # mesh and the mesh itself; the KV-cache pool then shards its heads
        # dim over the `tensor` axis so decode attention runs fully
        # tensor-parallel (GSPMD propagates the param shardings through
        # every engine jit — greedy outputs are identical to single-device,
        # tests/test_serve.py::test_engine_tensor_parallel_params).
        self.mesh = mesh
        # window-capped cache size: with kv_window the ring bounds memory
        self.cache_len = (min(self.scfg.max_len, cfg.kv_window)
                          if cfg.kv_window > 0 else self.scfg.max_len)
        self.caches = self._shard_cache(
            self._pool_layout(dec.init_cache(cfg, batch=b,
                                             max_len=self.cache_len), cfg))
        self.index = jnp.zeros((b,), jnp.int32)
        self.last = jnp.full((b,), self.scfg.pad_id, jnp.int32)
        self.slots: List[Optional[Request]] = [None] * b
        self.pending: deque[Request] = deque()
        self._inflight: deque = deque()  # (nxt tokens on device, slot snapshot)
        self._dispatched = [0] * b       # decode tokens dispatched per slot
        self._prefill_host = [0] * b     # true prefill len (tokens + embeds)
        self._active_key = None          # active_list at last mask rebuild
        self._active_dev = None          # device copy of the slot-occupancy
        self._next_id = 0                # mask (rebuilt only when it changes)
        self.steps = 0
        # speculative decoding (ServeConfig.spec_gamma + a draft model)
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        if self.spec:
            self.draft_caches = self._shard_cache(
                self._pool_layout(dec.init_cache(draft_cfg, batch=b,
                                                 max_len=self.cache_len),
                                  draft_cfg))
            # the draft's own cache index: equals the target's for text
            # slots; lags by n_images*image_embed_len for multimodal slots
            # (the text-only draft proposes from tokens alone; the target's
            # verify forward carries the image context)
            self.index_d = jnp.zeros((b,), jnp.int32)
        self.accepted_total = 0   # speculative observability
        self.emitted_total = 0
        # prefix caching (ServeConfig.prefix_cache_size, register_prefix)
        self.prefix_cache: "OrderedDict[tuple, Any]" = OrderedDict()
        self.prefix_hits = 0
        # shared-prefix attention (register_prefix(share=True)): ONE prefix
        # KV segment attended by all flagged slots without per-slot copies
        self.shared_seg = None
        self.pos_offset = jnp.zeros((b,), jnp.int32)
        self.shared_on = jnp.zeros((b,), bool)
        # xPos re-centering for truly unbounded rolling-window serving: each
        # slot's decay center slides forward every 8*scale_base generated
        # tokens (the cached keys are rescaled in place — exact algebra, the
        # center cancels in q·k), so the per-dim zeta**((pos-center)/sb)
        # scales never leave numeric range however long a request decodes.
        # Disabled while a SHARED prefix segment is registered (its keys are
        # one broadcast buffer at center 0 and cannot be rescaled per slot)
        # — submit() then enforces the xpos_position_bound instead.
        self._recenter = cfg.kv_window > 0 and cfg.xpos_rel_pos
        self._center = (jnp.zeros((b,), jnp.int32) if self._recenter
                        else None)
        self._center_host = [0] * b
        # multi-LoRA serving (load_adapter / submit(adapter=...)): per-slot
        # adapter factor stacks grafted into the decode params — every slot
        # can run a different fine-tune over the one base model
        # per-request sampling overrides (temperature / top-k / top-p):
        # rows flagged in slot_override fully replace the engine's static
        # SamplingConfig; jits take the vectors only once a request asks
        self.slot_override = jnp.zeros((b,), bool)
        self.slot_temp = jnp.ones((b,), jnp.float32)
        self.slot_topk = jnp.zeros((b,), jnp.int32)
        self.slot_topp = jnp.ones((b,), jnp.float32)
        self._override_host = [False] * b  # host mirror of slot_override
        self.adapters: Dict[str, Any] = {}
        self._slot_lora = None       # mirror tree, leaves stacked over slots
        self._slot_axes = None       # slot axis per leaf (1 under scan stack)
        self._zero_adapter = None
        self._insert_adapter_fn = None
        self._live_params = None     # dec_params + slot_lora graft (cached)
        # blocked decode (ServeConfig.decode_block)
        self.block = max(int(self.scfg.decode_block), 0)
        # batched admission: groups of exactly this many simple text-only
        # requests prefill in ONE dispatch (prefill is weight-read bound,
        # so a full bucket costs barely more than one admission); smaller
        # groups keep the batch-1 path. One extra program, warmed by
        # warmup().
        self._admit_bucket = min(b, 8)
        # fill-adaptive decode-attention kernel (ServeConfig.
        # decode_kernel_fill): the alternate cfg the low-fill dispatches
        # run under; hashes distinctly so at most one extra decode program
        self._cfg_kernel = (dataclasses.replace(cfg, decode_attn_kernel=True)
                            if self.scfg.decode_kernel_fill > 0 else None)
        # chunked prefill (ServeConfig.prefill_chunk)
        self.chunked = self.scfg.prefill_chunk > 0
        # async drains (ServeConfig.async_drain): reader thread + queues,
        # created lazily on first use; _outstanding counts fetches handed
        # to the reader whose results the main thread has not bookkept yet
        self._reader = None
        self._reader_q = None
        self._done_q = None
        self._outstanding = 0
        self._reader_stats = {"s": 0.0, "n": 0}   # fetch wall time / count
        # host-loop anatomy: cumulative wall time per step() phase (seconds).
        # Serving throughput on a remote chip is host-LOOP sensitive; these
        # six counters split each step into admit / prep (active mask +
        # recenter) / rng fold / device dispatch (enqueue) / post (async-copy
        # start + bookkeeping) / drain (blocking token reads) so a slow row
        # in the serving table can be attributed instead of guessed at
        # (benchmarks/serve_bench.py --anatomy prints them).
        self.phase_s = {k: 0.0 for k in
                        ("admit", "prep", "fold", "dispatch", "post",
                         "drain")}
        if self.chunked:
            import numpy as _np
            self._prompt_rows = _np.full(
                (b, self.scfg.max_prompt_len), self.scfg.pad_id, _np.int32)
            self._pf_pos = [-1] * b    # -1 = not prefilling
            self._pf_len = [0] * b

    # -- internals -----------------------------------------------------------

    def _fold(self):
        """Distinct per-step PRNG key with ZERO device work.

        ``jax.random.split`` on the engine's device key is one extra device
        dispatch per step — measured 0.55-1.3 ms/step on the axon tunnel
        (host-loop anatomy), pure overhead for greedy traffic and an
        arbitrary key schedule for sampled traffic. A threefry key is just
        two uint32 words, so the host builds ``(seed_hi, seed_lo ^ step)``
        itself: deterministic given (ctor rng, step), distinct every step,
        and it rides the dispatch as an inline 8-byte arg. Programs that
        fold further (blocked decode folds per sub-step) compose on top.
        The counter is per-CALL (admission prefills and the decode dispatch
        within one step must not share a key)."""
        n = self._fold_n
        self._fold_n = n + 1
        k = self._rng_host.copy()
        k[1] ^= np.uint32(n & 0xFFFFFFFF)
        k[0] ^= np.uint32((n >> 32) & 0xFFFFFFFF)
        return k

    def _reset_center(self, slot: int):
        """A freshly admitted slot's cache is prefilled at xPos center 0."""
        if self._center is not None and self._center_host[slot] != 0:
            self._center_host[slot] = 0
            self._center = self._center.at[slot].set(0)

    def _maybe_recenter(self, active_list):
        """Slide due slots' xPos centers forward (rolling-window serving).

        A slot's absolute write position is exactly
        ``_prefill_host[slot] + _dispatched[slot]`` — both known host-side
        (admission records the true prompt-token + image-embed count). The
        pooled rescale (_recenter_pool_jit) is one donated cache rewrite
        per event, i.e. once per ~4k generated tokens per slot."""
        if self._center is None or self.shared_seg is not None:
            return
        every = 8 * self.cfg.xpos_scale_base
        pos = [p + d for p, d in zip(self._prefill_host, self._dispatched)]
        due = [a and pos[i] - self._center_host[i] >= every
               for i, a in enumerate(active_list)]
        if not any(due):
            return
        # the construction-time reach contract (check_engine_modes):
        # |pos - center| never exceeds window (prompt bound) + interval,
        # plus the dispatch granularity (blocked decode advances `block`
        # positions between due checks)
        slack = self.cfg.kv_window + every + max(self.block, 1) - 1
        for i, d in enumerate(due):
            if d:
                assert pos[i] - self._center_host[i] <= slack, \
                    (pos[i], self._center_host[i], self.cfg.kv_window, every)
        new = [pos[i] if d else self._center_host[i]
               for i, d in enumerate(due)]
        delta = jnp.asarray(
            [n - c for n, c in zip(new, self._center_host)], jnp.int32)
        self.caches = _recenter_pool_jit(self.caches, delta, self.cfg)
        self._center_host = new
        self._center = jnp.asarray(new, jnp.int32)

    def _pool_layout(self, caches, cfg):
        """Pick the pool's resident layout ONCE at construction: a per-layer
        LIST when unrolled decode applies (nn.decoder.wants_unrolled_decode)
        so every decode dispatch takes run_layers' unrolled branch with
        in-place per-layer cache updates — no unstack/restack copies at
        dispatch boundaries (wrapping the programs instead was measured to
        REGRESS: 148.3 vs 174.1 tok/s at 1024-prompt step mode). All pool
        programs (insert/recenter/chunk-prefill/shard) handle both layouts."""
        if dec.wants_unrolled_decode(cfg, caches):
            return dec.unstack_caches(caches, cfg)
        return caches

    def _shard_cache(self, caches):
        """Shard the pooled KV cache's heads dim over the mesh's `tensor`
        axis (cache leaves are (B, H, S, D) or stacked (L, B, H, S, D|1);
        heads = ndim-3). Leaves whose head count doesn't divide the axis
        stay replicated. No-op without a mesh."""
        if self.mesh is None:
            return caches
        from jax.sharding import NamedSharding, PartitionSpec as P
        tp = int(self.mesh.shape.get("tensor", 1))

        def put(x):
            nd = getattr(x, "ndim", 0)
            h = nd - 3
            spec = [None] * nd
            if tp > 1 and nd >= 4 and x.shape[h] % tp == 0:
                spec[h] = "tensor"
            return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

        return jax.tree_util.tree_map(put, caches)

    def _decode_cfg(self, active_list):
        """Per-dispatch decode-attention kernel selection
        (ServeConfig.decode_kernel_fill): route this dispatch through the
        Pallas single-query kernel only in its one winning regime — a long
        pool (>= 1024) whose active slots are mostly empty, where the
        kernel's DMA skip past each row's kv_len beats XLA's full-cache
        einsum read (BASELINE.md decode S-sweep). The fill estimate is
        exact and host-side (_prefill_host + _dispatched). Shared-prefix
        dispatches keep the einsum path (the kernel doesn't take a shared
        segment)."""
        if (self._cfg_kernel is None or self.shared_seg is not None
                or self.cache_len < 1024):
            return self.cfg
        pos = [min(self._prefill_host[i] + self._dispatched[i],
                   self.cache_len)
               for i, a in enumerate(active_list) if a]
        if not pos or (sum(pos) / (len(pos) * self.cache_len)
                       > self.scfg.decode_kernel_fill):
            return self.cfg
        return self._cfg_kernel

    # -- the decode loop -----------------------------------------------------

    def step(self) -> bool:
        """Admit pending requests into free slots, advance every active slot
        one token, and read back tokens (``sync_lag`` steps behind the
        device). Returns False when there is nothing left to do."""
        from time import perf_counter as _pc
        t0 = _pc()
        # admission: simple text-only requests batch into pooled prefills
        # (one weight-read for up to 8 admissions — the 47 ms/step
        # admission tax at 32-slot churn, BASELINE.md round-5); everything
        # else (multimodal, adapters, prefix hits, chunked, buckets) keeps
        # its specialized batch-1 path. FIFO submit order is preserved —
        # only the device work is grouped.
        batch_pairs = []
        for slot in range(self.scfg.max_batch):
            if self.slots[slot] is None and self.pending:
                req = self.pending.popleft()
                if self._batchable(req):
                    batch_pairs.append((slot, req))
                else:
                    self._admit(slot, req)
        # ONE batched size (_admit_bucket): every distinct batch size
        # compiles its own prefill program (~30 s+ each on a remote chip —
        # measured collapsing a whole bench run when power-of-two buckets
        # compiled mid-traffic), so groups below the bucket admit singly
        # (the pre-batching behavior) and only full buckets batch. warmup()
        # compiles the bucket program at deploy time.
        bsz = self._admit_bucket
        while bsz > 1 and len(batch_pairs) >= bsz:
            chunk, batch_pairs = batch_pairs[:bsz], batch_pairs[bsz:]
            self._admit_many(chunk)
        for slot_req in batch_pairs:
            self._admit(*slot_req)
        if self.chunked and any(p >= 0 for p in self._pf_pos):
            self._advance_prefill()
        t1 = _pc()
        self.phase_s["admit"] += t1 - t0
        # budget clamp: the host KNOWS each request's max_new_tokens at
        # submit time, so a slot whose dispatched-token count has reached
        # its budget is excluded from `active` immediately — without this,
        # sync_lag/decode_block overrun decodes up to (sync_lag+1)*block
        # discarded tokens per request before the drain detects the budget
        # (measured 31% throughput loss at lag 4 x block 4 with 64-token
        # budgets). Only EOS — which the host can't predict — still pays
        # the detection lag. (Speculation commits a variable 1..gamma+1
        # tokens per round, so its dispatch count isn't host-predictable
        # and it keeps the drain-time check.)
        active_list = [
            s is not None and not self._is_prefilling(i)
            and (self.spec or self._dispatched[i] < s.max_new_tokens)
            for i, s in enumerate(self.slots)]
        act = any(active_list)
        if not act:
            # stamp prep unconditionally so idle-heavy steps don't leak the
            # active-mask build time into the drain column of the anatomy
            t2 = _pc()
            self.phase_s["prep"] += t2 - t1
            t1 = t2
        if act:
            self._maybe_recenter(active_list)
            key = tuple(active_list)
            if self._active_dev is None or key != self._active_key:
                self._active_dev = jnp.asarray(active_list, bool)
                self._active_key = key
            active = self._active_dev
            t2 = _pc()
            self.phase_s["prep"] += t2 - t1
            rng_sub = self._fold()
            t1 = _pc()
            self.phase_s["fold"] += t1 - t2
            if self.spec and self.block > 1:
                emit, emit_lp, n_emit, self.last, self.caches, \
                    self.draft_caches, \
                    self.index, self.index_d = _spec_block_pool_jit(
                        self.dec_params, self.draft_params, self.last,
                        self.caches, self.draft_caches, self.index,
                        self.index_d, active,
                        rng_sub, self.cfg, self.draft_cfg,
                        self.sampling, self.scfg.spec_gamma, self.block,
                        pad_id=self.scfg.pad_id,
                        double_scale=self.double_scale,
                        shared_t=self._shared(), shared_d=self._shared_d())
            elif self.spec:
                emit, emit_lp, n_emit, carry, self.caches, \
                    self.draft_caches, \
                    self.index, self.index_d = _spec_step_pool_jit(
                        self.dec_params, self.draft_params, self.last,
                        self.caches, self.draft_caches, self.index,
                        self.index_d, active,
                        rng_sub, self.cfg, self.draft_cfg,
                        self.sampling, self.scfg.spec_gamma,
                        pad_id=self.scfg.pad_id,
                        double_scale=self.double_scale,
                        shared_t=self._shared(), shared_d=self._shared_d())
                self.last = carry
            elif self.block > 1:
                emit, emit_lp, self.last, self.caches, self.index = \
                    _decode_block_jit(
                    self._pool_params(), self.last, self.caches, self.index,
                    active, rng_sub, self._decode_cfg(active_list),
                    self.sampling,
                    self.block, pad_id=self.scfg.pad_id,
                    double_scale=self.double_scale,
                    shared=self._shared(), rows=self._rows(),
                    center=self._center, interpret=self.interpret)
                n_emit = [self.block if a else 0 for a in active_list]
            else:
                nxt, nlp, self.caches, self.index = _decode_step_jit(
                    self._pool_params(), self.last, self.caches, self.index,
                    active, rng_sub, self._decode_cfg(active_list),
                    self.sampling,
                    pad_id=self.scfg.pad_id,
                    double_scale=self.double_scale,
                    shared=self._shared(), rows=self._rows(),
                    center=self._center, interpret=self.interpret)
                # the decode feedback loop stays on DEVICE (last <- nxt):
                # rebuilding ``last`` host-side would cost a host→device
                # RTT per token on remote links (~25 ms on the axon
                # tunnel); inactive slots are masked to pad inside the jit.
                self.last = nxt
                # one token per slot that was ACTIVE in this dispatch
                # (occupied-but-prefilling slots must not be credited)
                emit = nxt[:, None]
                emit_lp = nlp[:, None]
                n_emit = [1 if a else 0 for a in active_list]
            self.steps += 1
            t2 = _pc()
            self.phase_s["dispatch"] += t2 - t1
            t1 = t2
            if not self.spec:
                for i, n in enumerate(n_emit):
                    self._dispatched[i] += n
            if self.scfg.eager_copy:
                try:  # start the device->host copy; read it sync_lag later
                    emit.copy_to_host_async()
                    emit_lp.copy_to_host_async()
                    if hasattr(n_emit, "copy_to_host_async"):
                        n_emit.copy_to_host_async()
                except AttributeError:  # backend without async copies
                    pass
            self._inflight.append((emit, emit_lp, n_emit, list(self.slots)))
            t2 = _pc()
            self.phase_s["post"] += t2 - t1
            t1 = t2
        # with DISPATCHING slots, let reads pipeline sync_lag steps deep and
        # trigger every drain_batch steps — a batched device_get of K steps'
        # tokens costs ONE link RTT (measured flat for 1..16 entries), so
        # batching divides the per-step fetch cost by K. Once nothing
        # dispatched this step (pool idle, or every occupied slot
        # budget-clamped awaiting its drain), drain everything in one fetch.
        kb = max(self.scfg.drain_batch, 1)
        if self.scfg.async_drain:
            # hand due entries to the reader thread in drain_batch-sized
            # BATCHES (one link RTT each); integrate whatever it finished
            # without blocking, and block only past the backpressure cap
            # (~2 batches in flight — ServeConfig.overrun_window widens to
            # sync_lag + 3*drain_batch for async engines)
            if act:
                while len(self._inflight) >= self.scfg.sync_lag + kb:
                    self._submit_fetch(
                        [self._inflight.popleft() for _ in range(kb)])
                # backpressure bounds TOTAL un-bookkept steps (still queued
                # in _inflight + handed to the reader) to sync_lag + 3*kb —
                # the exact budget ServeConfig.overrun_window credits. The
                # cap must subtract len(_inflight): without it, inflight
                # entries ride on top of the reader allowance and a spec
                # engine (no host budget clamp) can write
                # (gamma+1)*block cache rows per extra step past the
                # headroom submit() verified.
                self._collect_done(max(
                    0, self.scfg.sync_lag + 3 * kb - len(self._inflight)))
            else:
                if self._inflight:
                    self._submit_fetch(list(self._inflight))
                    self._inflight.clear()
                self._collect_done(0)
        elif act:
            while len(self._inflight) >= self.scfg.sync_lag + kb:
                self._drain_many(kb)
        elif self._inflight:
            self._drain_many(len(self._inflight))
        self.phase_s["drain"] += _pc() - t1
        return (self.num_active > 0 or bool(self.pending)
                or bool(self._inflight) or self._outstanding > 0)

    def _ensure_reader(self):
        """Start the async-drain reader thread (lazy; daemon). The thread
        only ever calls ``jax.device_get`` — bookkeeping stays on the main
        thread, in dispatch order (single reader, FIFO queues). A weakref
        finalizer stops the thread when the engine is collected."""
        if self._reader is not None:
            return
        import queue
        import threading
        import weakref
        self._reader_q = queue.Queue()
        self._done_q = queue.Queue()

        # close over the INIT-TIME stats dict (never rebind it): callers
        # that reset counters in place (reset_counters) must keep aliasing
        # the dict the reader accumulates into
        stats = self._reader_stats

        def _loop(q_in, q_out):
            from time import perf_counter as _pc
            while True:
                batch = q_in.get()
                if batch is None:
                    return
                try:
                    t0 = _pc()
                    # ONE batched transfer for the whole batch: K steps'
                    # tokens cost the same single link RTT as one step's
                    fetched = jax.device_get(
                        [(e[0], e[1],
                          None if isinstance(e[2], (list, dict)) else e[2])
                         for e in batch])
                    stats["s"] += _pc() - t0
                    stats["n"] += 1
                    for (_, _, n_emit, snapshot), (toks, lps, cnts) in zip(
                            batch, fetched):
                        q_out.put((toks, lps,
                                   n_emit if cnts is None else cnts,
                                   snapshot, None))
                except Exception as e:   # surface on the main thread
                    for entry in batch:
                        q_out.put((None, None, None, entry[3], e))

        self._reader = threading.Thread(
            target=_loop, args=(self._reader_q, self._done_q), daemon=True)
        self._reader.start()
        weakref.finalize(self, self._reader_q.put, None)

    def _submit_fetch(self, batch):
        """Hand a LIST of inflight entries to the reader as one batched
        fetch (one link RTT for the whole batch)."""
        self._ensure_reader()
        self._reader_q.put(batch)
        self._outstanding += len(batch)

    def _collect_done(self, max_left: int):
        """Bookkeep finished async fetches: everything the reader already
        completed, then keep blocking until at most ``max_left`` fetches
        remain outstanding (the backpressure bound that keeps the EOS
        overrun within ``ServeConfig.overrun_window``)."""
        import queue as _q
        while self._outstanding > 0:
            block = self._outstanding > max_left
            try:
                toks, lps, cnts, snapshot, err = self._done_q.get(
                    block=block, timeout=600 if block else None)
            except _q.Empty:
                if block:
                    raise RuntimeError("async-drain reader stalled (600 s)")
                break
            self._outstanding -= 1
            if err is not None:
                raise err
            self._bookkeep(toks, lps, cnts, snapshot)

    def _drain_one(self):
        self._drain_many(1)

    def _drain_many(self, n: int):
        """Read back the oldest ``n`` outstanding steps' tokens in ONE
        batched transfer (on a remote link a device_get of K tiny buffers
        costs the same single RTT as one buffer — measured flat ~30 ms for
        1..16 entries on the axon tunnel), then bookkeep each step against
        the slot occupancy AT ITS DISPATCH TIME (a finished request's
        trailing speculative tokens are discarded)."""
        entries = [self._inflight.popleft() for _ in range(n)]
        fetched = jax.device_get(
            [(e[0], e[1], None if isinstance(e[2], (list, dict)) else e[2])
             for e in entries])
        for (_, _, n_emit, snapshot), (toks, lps, cnts) in zip(entries,
                                                               fetched):
            self._bookkeep(toks, lps,
                           n_emit if cnts is None else cnts, snapshot)

    def _bookkeep(self, toks, lps, counts, snapshot):
        if isinstance(counts, dict):   # admission first-token entry
            # {"slot": s} = batch-1 admission; {"slots": [...]} = batched
            # admission (row r of toks/lps belongs to slots[r])
            slots = counts.get("slots", None)
            if slots is None:
                slots = [counts["slot"]]
            for r, slot in enumerate(slots):
                req = snapshot[slot]
                if req is not None and not req.done:
                    tok = int(toks[r])
                    req.tokens.append(tok)
                    req.logprobs.append(float(lps[r]))
                    self.emitted_total += 1
                    self._finish_if_needed(slot, req, tok)
            return
        if getattr(toks, "ndim", 2) == 3:     # blocked spec: (K, B, g+1)
            rounds = [(toks[k], lps[k], [int(n) for n in counts[k]])
                      for k in range(toks.shape[0])]
        else:
            rounds = [(toks, lps, [int(n) for n in counts])]
        for rtoks, rlps, rcounts in rounds:
            for slot, req in enumerate(snapshot):
                if req is None or req.done:
                    continue
                committed = 0
                for j in range(rcounts[slot]):
                    if req.done or len(req.tokens) >= req.max_new_tokens:
                        break  # sync-lag overrun past budget/EOS
                    tok = int(rtoks[slot, j])
                    req.tokens.append(tok)
                    req.logprobs.append(float(rlps[slot, j]))
                    self.emitted_total += 1
                    committed += 1
                    self._finish_if_needed(slot, req, tok)
                if self.spec and committed > 0:
                    # draft tokens actually banked this round (the +1 is
                    # the target's own correction/bonus token)
                    self.accepted_total += committed - 1

    def reset_counters(self):
        """Zero the host-loop anatomy timers and reader fetch stats IN
        PLACE (benchmarks call this at their warmup boundary so both
        printed diagnostics cover the same steady-state step range). The
        reader thread closes over these same dicts, so they are mutated,
        never rebound. Known benign race: a reader `+=` in flight during
        the reset can re-add its pre-reset accumulation — at most one
        fetch's time, and a fetch spanning the boundary is attributable to
        either side anyway."""
        for k in self.phase_s:
            self.phase_s[k] = 0.0
        self._reader_stats["s"] = 0.0
        self._reader_stats["n"] = 0

    def run(self, max_steps: Optional[int] = None):
        """Drain every pending/in-flight request (bounded by max_steps)."""
        n = 0
        while (self.pending or self.num_active or self._inflight
               or self._outstanding > 0) and (
                max_steps is None or n < max_steps):
            self.step()
            n += 1
        return n
