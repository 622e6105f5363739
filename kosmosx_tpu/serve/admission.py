"""Request admission for the serving engine: submit validation, prefix
caching (copy + shared-segment modes), multi-LoRA adapters, per-request
sampling overrides, chunked prompt ingestion, and warmup.

Split out of engine.py (the orchestration loop) so each concern reads on its
own; ``AdmissionMixin`` carries no state of its own — it operates on the
attributes ServeEngine.__init__ sets up. Request-time mode pairings are
validated against the same matrix as construction time
(serve/config.UNSUPPORTED_MODE_PAIRS).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from kosmosx_tpu.serve.config import Request, unsupported_reason
from kosmosx_tpu.serve.programs import (_insert_rows_jit, _insert_slot_jit,
                                        _prefill_chunk_pool_jit,
                                        _prefill_mm_one_jit,
                                        _prefill_mm_prefix_jit,
                                        _prefill_one_jit,
                                        _prefill_suffix_one_jit, _trim_shared)


def _suffix_bucket(n: int, cap: int) -> int:
    """Static width for the batch-1 suffix program: next power of two
    (min 8) capped at ``max_prompt_len`` — bounds distinct compiles at
    log2(max_prompt_len) while keeping suffix FLOPs near the true length."""
    b = 8
    while b < n:
        b *= 2
    return min(b, cap)


class AdmissionMixin:
    """Admission half of ServeEngine (see engine.py for the decode loop)."""

    # -- request API --------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int = 64,
               eos_id: Optional[int] = None, images=None,
               adapter: Optional[str] = None,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None) -> Request:
        import numpy as np

        if adapter is not None and adapter not in self.adapters:
            raise KeyError(f"unknown adapter {adapter!r}; load_adapter first")
        if adapter is not None and images is not None:
            raise NotImplementedError("multi-LoRA serving is text-only")
        if temperature is not None and temperature < 0:
            raise ValueError("temperature must be >= 0")
        if top_k is not None and top_k < 0:
            raise ValueError("top_k must be >= 0")
        if top_p is not None and not (0.0 < top_p <= 1.0):
            raise ValueError("top_p must be in (0, 1]")
        override = (temperature is not None or top_k is not None
                    or top_p is not None)
        if override:
            reason = unsupported_reason(
                "sampling_override", "spec" if self.spec else None)
            if reason is not None:
                raise NotImplementedError(reason)

        # ONE host fetch for device-array prompts: per-element int() on a
        # jax array costs one link RTT per token (~3.4 s / 128 tokens on
        # the tunnel, measured)
        prompt = [int(t) for t in
                  np.asarray(jax.device_get(prompt), np.int64).ravel()]
        if not prompt:
            raise ValueError("empty prompt")
        if len(prompt) > self.scfg.max_prompt_len:
            raise ValueError(f"prompt len {len(prompt)} > max_prompt_len "
                             f"{self.scfg.max_prompt_len}")
        extra = 0
        if images is not None:
            if self.kcfg is None:
                raise ValueError("engine was built without kosmos_cfg; "
                                 "multimodal requests need one")
            n_img = images.shape[0] if images.ndim == 4 else 1
            extra = n_img * self.kcfg.image_embed_len
        # headroom: EOS detection lags, speculative rounds write gamma
        # positions past the committed index, and blocked decode writes
        # whole blocks — ServeConfig.overrun_window bounds all of it.
        # Prompts matching the SHARED prefix never store it in their own
        # cache, so only the remainder counts against max_len.
        window = self.scfg.overrun_window
        if self.cfg.kv_window > 0:
            # windowed pool: prompt + IMAGE EMBEDS must fit the un-wrapped
            # prefill; budgets are unbounded by the cache (the ring reuses
            # slots), limited only by the xPos numeric range
            from kosmosx_tpu.nn.xpos import xpos_position_bound

            if len(prompt) + extra > self.cfg.kv_window:
                raise ValueError(
                    f"prompt ({len(prompt)}) + image embeds ({extra}) "
                    f"exceeds kv_window ({self.cfg.kv_window})")
            if self.cfg.xpos_rel_pos and self.shared_seg is not None:
                # a registered SHARED prefix disables per-slot xPos
                # re-centering (its broadcast keys sit at center 0 for every
                # slot), so generations are bounded by the numeric range.
                # Without one the engine re-centers (_maybe_recenter) and
                # budgets are truly unbounded.
                bound = xpos_position_bound(self.cfg.xpos_scale_base)
                if len(prompt) + extra + max_new_tokens + window > bound:
                    raise ValueError(
                        f"prompt + image embeds + max_new_tokens = "
                        f"{len(prompt) + extra + max_new_tokens} exceeds "
                        f"the xPos numeric range bound ({bound}); "
                        f"shared-prefix windowed serving cannot re-center "
                        f"(unregister the prefix for unbounded budgets)")
        else:
            own_prompt = len(prompt)
            # mirror _admit's sh_match condition exactly: adapter requests
            # do NOT use the shared segment (it was prefilled with the base
            # model), so their whole prompt occupies their own cache
            if images is None and adapter is None \
                    and self._matches_shared(prompt):
                own_prompt -= self.shared_seg["len"]
            if (own_prompt + extra + max_new_tokens + window
                    > self.scfg.max_len):
                raise ValueError(
                    f"prompt ({own_prompt} own-cache tokens) + image embeds "
                    f"({extra}) + max_new_tokens ({max_new_tokens}) exceeds "
                    f"cache length {self.scfg.max_len}")
        req = Request(prompt=prompt, max_new_tokens=max_new_tokens,
                      eos_id=eos_id, images=images, adapter=adapter,
                      temperature=temperature, top_k=top_k, top_p=top_p,
                      id=self._next_id)
        self._next_id += 1
        self.pending.append(req)
        return req

    def register_prefix(self, tokens, share: bool = False) -> None:
        """Prefill ``tokens`` once and cache the resulting K/V (LRU, at most
        ``ServeConfig.prefix_cache_size`` entries). Subsequent text prompts
        that start with these tokens are admitted by copying the cached
        K/V into their slot and prefilling only the remainder — cutting the
        admission prefill from O(prompt) to O(prompt - prefix).

        ``share=True`` goes further (RelayAttention-style): the prefix K/V
        becomes ONE broadcast segment attended by every matching slot — no
        per-slot copy at all, so a P-token system prompt costs P cache
        positions TOTAL instead of P per slot, and each slot's own cache
        only needs (prompt - P) + new positions. One shared segment per
        engine; registering replaces it (engine must be idle). Greedy
        outputs are identical to full prefill either way (the softmax runs
        over the exact concatenated [shared | own] scores).

        TPU-native contrast with block-level automatic prefix caching
        (vLLM): the pool keeps contiguous per-slot caches with static
        shapes, so sharing is at explicit registered-prefix granularity —
        zero per-token bookkeeping, no gathers."""
        import numpy as np

        if not share and self.scfg.prefix_cache_size <= 0:
            # the shared segment lives in self.shared_seg, not the LRU —
            # size 0 only disables copy-mode caching
            raise ValueError("ServeConfig.prefix_cache_size is 0")
        toks = [int(t) for t in
                np.asarray(jax.device_get(tokens), np.int64).ravel()]
        if not toks:
            raise ValueError("empty prefix")
        if len(toks) >= self.scfg.max_prompt_len:
            raise ValueError(
                f"prefix len {len(toks)} must be < max_prompt_len "
                f"{self.scfg.max_prompt_len} (a matching prompt needs at "
                f"least one suffix token)")
        if share:
            if self.num_active or self._inflight or self.pending:
                raise ValueError("register_prefix(share=True) requires an "
                                 "idle engine (it re-bases slot positions)")
            if self.cfg.kv_window == 0 and \
                    len(toks) + self.scfg.max_len \
                    > self.cfg.max_target_positions:
                # matching slots embed at offset index + P; traced offsets
                # bypass the positional table's loud host-side bound check,
                # so enforce it here instead of silently clamping
                raise ValueError(
                    f"shared prefix ({len(toks)}) + max_len "
                    f"({self.scfg.max_len}) exceeds the learned position "
                    f"table ({self.cfg.max_target_positions}); raise "
                    f"max_positions or shrink max_len")
        key = tuple(toks)
        if not share and key in self.prefix_cache:
            self.prefix_cache.move_to_end(key)
            return
        p = self.scfg.max_prompt_len
        prompt = jnp.asarray(
            np.pad(np.asarray(toks, np.int32), (0, p - len(toks)),
                   constant_values=self.scfg.pad_id))[None, :]
        length = jnp.asarray([len(toks)], jnp.int32)
        # deterministic rng: the sampled token is discarded
        _, _, c1 = _prefill_one_jit(
            self.dec_params, prompt, length, jax.random.PRNGKey(0), self.cfg,
            self.sampling, self.cache_len, double_scale=self.double_scale,
            interpret=self.interpret)
        if share:
            self.shared_seg = {"key": key, "len": len(toks),
                               "caches": _trim_shared(c1, len(toks),
                                                      self.cfg.dtype)}
            if self.spec:
                # the draft pool attends its OWN shared segment (text-only
                # prefix prefilled through the draft)
                _, _, cd1 = _prefill_one_jit(
                    self.draft_params, prompt, length, jax.random.PRNGKey(0),
                    self.draft_cfg, self.sampling, self.cache_len,
                    interpret=self.interpret)
                self.shared_seg["draft_caches"] = _trim_shared(
                    cd1, len(toks), self.draft_cfg.dtype)
            return
        entry = {"caches": c1, "len": len(toks), "draft": None}
        if self.spec:
            _, _, cd1 = _prefill_one_jit(
                self.draft_params, prompt, length, jax.random.PRNGKey(0),
                self.draft_cfg, self.sampling, self.cache_len,
                interpret=self.interpret)
            entry["draft"] = cd1
        self.prefix_cache[key] = entry
        while len(self.prefix_cache) > self.scfg.prefix_cache_size:
            self.prefix_cache.popitem(last=False)

    def load_adapter(self, name: str, lora_tree) -> None:
        """Register a LoRA adapter for multi-tenant serving: requests submit
        with ``adapter=name`` and every slot decodes through its own
        factors, grafted per-row into the shared base (S-LoRA-style, but
        static-shape: the per-slot factor stacks live at the adapted
        linears' pytree paths and nn/layers.linear applies them as two thin
        batched einsums — no gathers, no recompilation per adapter).

        ``lora_tree``: the mirror tree from train/lora.strip_lora (or a
        LoraTrainer state's ``lora`` subtree)."""
        from kosmosx_tpu.train.lora import attach_lora, num_lora_params

        reason = unsupported_reason(
            "adapter", "multimodal" if self.kcfg is not None else None,
            "spec" if self.spec else None)
        if reason is not None:
            raise NotImplementedError(reason)
        if num_lora_params(lora_tree) == 0:
            raise ValueError("lora_tree has no adapter factors")
        flat = jax.tree_util.tree_map(jnp.asarray, lora_tree)
        if self._slot_lora is None:
            self._init_slot_lora(flat)
        # per-adapter batch-1 prefill params (graft shares the base arrays)
        self.adapters[name] = {
            "tree": flat,
            "params": attach_lora(self.dec_params, flat),
        }

    def _init_slot_lora(self, template):
        b = self.scfg.max_batch

        def axis(path, leaf):
            names = [getattr(p, "key", None) for p in path]
            # scan-stacked decoder layers carry a leading L axis; the slot
            # axis slots in right after it so lax.scan still slices L first
            return 1 if "layers" in names and leaf.ndim >= 1 and \
                not any(hasattr(p, "idx") for p in path) else 0

        self._slot_axes = jax.tree_util.tree_map_with_path(axis, template)
        self._slot_lora = jax.tree_util.tree_map(
            lambda x, ax: jnp.zeros(x.shape[:ax] + (b,) + x.shape[ax:],
                                    x.dtype),
            template, self._slot_axes)
        self._zero_adapter = jax.tree_util.tree_map(jnp.zeros_like, template)
        axes = self._slot_axes

        def ins(dst, src, slot):
            return jax.tree_util.tree_map(
                lambda d, s, ax: jax.lax.dynamic_update_index_in_dim(
                    d, s, slot, ax), dst, src, axes)

        self._insert_adapter_fn = jax.jit(ins, donate_argnums=(0,))

    def _set_slot_adapter(self, slot: int, name: Optional[str]):
        if self._slot_lora is None:
            return
        src = (self.adapters[name]["tree"] if name is not None
               else self._zero_adapter)
        self._slot_lora = self._insert_adapter_fn(self._slot_lora, src, slot)
        from kosmosx_tpu.train.lora import attach_lora
        self._live_params = attach_lora(self.dec_params, self._slot_lora)

    def _pool_params(self):
        """Decode-path params: the base, or base + per-slot adapter stacks
        once any adapter has been loaded."""
        return self._live_params if self._live_params is not None \
            else self.dec_params

    @staticmethod
    def _row1(req: Request):
        """Batch-1 rows tuple for admission prefills, or None."""
        if req.temperature is None and req.top_k is None \
                and req.top_p is None:
            return None
        return (jnp.ones((1,), bool),
                jnp.asarray([1.0 if req.temperature is None
                             else float(req.temperature)], jnp.float32),
                jnp.asarray([0 if req.top_k is None else int(req.top_k)],
                            jnp.int32),
                jnp.asarray([1.0 if req.top_p is None
                             else float(req.top_p)], jnp.float32))

    def _rows(self):
        """Per-slot sampling-override vectors (on, temp, top_k, top_p), or
        None while no OCCUPIED slot carries an override — all-default
        traffic keeps the cheap sampler program (the rows variant pays two
        (B, V) sorts per step)."""
        if not any(self._override_host[i]
                   for i, s in enumerate(self.slots) if s is not None):
            return None
        return (self.slot_override, self.slot_temp, self.slot_topk,
                self.slot_topp)

    def _shared(self):
        """(shared_caches, shared_on, pos_offset) for the jitted cores."""
        if self.shared_seg is None:
            return None
        return (self.shared_seg["caches"], self.shared_on, self.pos_offset)

    def _shared_d(self):
        """The DRAFT pool's shared segment (speculative engines)."""
        if self.shared_seg is None or "draft_caches" not in self.shared_seg:
            return None
        return (self.shared_seg["draft_caches"], self.shared_on,
                self.pos_offset)

    def _matches_shared(self, toks) -> bool:
        sh = self.shared_seg
        return (sh is not None and len(toks) > sh["len"]
                and [int(t) for t in toks[:sh["len"]]] == list(sh["key"]))

    def _match_prefix(self, praw, probe: bool = False):
        """Longest registered prefix that strictly prefixes ``praw``.
        ``probe=True`` (the batched-admission eligibility check) leaves the
        LRU order and hit counter untouched — only the real admission
        counts."""
        best = None
        for key in self.prefix_cache:
            n = len(key)
            if n < len(praw) and (best is None or n > best[1]) \
                    and list(praw[:n]) == list(key):
                best = (key, n)
        if best is None:
            return None
        if not probe:
            self.prefix_cache.move_to_end(best[0])
            self.prefix_hits += 1
        return self.prefix_cache[best[0]]

    def warmup(self, images=None, adapters: bool = True) -> int:
        """Compile every program this engine will dispatch before real
        traffic: one throwaway request per admission flavor (each prompt
        bucket, each loaded adapter when ``adapters``, a multimodal request
        when ``images`` is given, prefix hits when prefixes are registered)
        plus the decode/chunk/spec step programs, then drain. On a remote
        chip the first compile of each program costs seconds to minutes —
        pay it at deploy time, not on the first user request. Returns the
        number of warmup requests run. Requires an idle engine."""
        if self.num_active or self._inflight or self.pending:
            raise ValueError("warmup requires an idle engine")
        import numpy as np

        tok = self.scfg.pad_id + 1
        p = self.scfg.max_prompt_len
        flavors = []
        buckets = [b for b in sorted(self.scfg.prompt_buckets) if b <= p]
        for b in buckets:
            flavors.append({"prompt": [tok] * b})
        # the full-length (pad-to-max_prompt_len) program: use the SHORTEST
        # prompt that misses every bucket, so tight max_len budgets can
        # still admit it
        full_len = min(p, (max(buckets) + 1) if buckets else 2)
        flavors.append({"prompt": [tok] * full_len})
        if adapters:
            for name in self.adapters:
                flavors.append({"prompt": [self.scfg.pad_id + 1] * 2,
                                "adapter": name})
        if images is not None:
            flavors.append({"prompt": [self.scfg.pad_id + 1] * 2,
                            "images": np.asarray(images)})
        for key in list(self.prefix_cache)[:1]:
            flavors.append({"prompt": list(key) + [self.scfg.pad_id + 1]})
        if self.shared_seg is not None:
            flavors.append({"prompt": list(self.shared_seg["key"])
                            + [self.scfg.pad_id + 1]})
        hits_before = self.prefix_hits
        handles = []
        for f in flavors:
            try:
                handles.append(self.submit(max_new_tokens=2, **f))
            except ValueError:
                # a flavor that cannot fit max_len can never be dispatched
                # by real traffic either (e.g. full-length prompts on a
                # tight cache) — nothing to warm
                pass
        self.run()
        assert all(h.done for h in handles)
        # the batched-admission program (engine.step groups _admit_bucket
        # simple admissions into one pooled prefill): warm it with one
        # full group — a mid-traffic compile of this program costs ~30 s+
        # on a remote chip
        if self._admit_bucket > 1 and not self.chunked \
                and not self.scfg.prompt_buckets:
            group = []
            for _ in range(self._admit_bucket):
                try:
                    group.append(self.submit([tok, tok], max_new_tokens=2))
                except ValueError:
                    break
            if len(group) < self._admit_bucket:
                # a tight engine that can't hold a full group will never
                # form one in real traffic either
                pass
            self.run()
            assert all(h.done for h in group)
            handles += group
        self.prefix_hits = hits_before  # warmup must not skew stats
        self.emitted_total = 0
        self.accepted_total = 0
        self.steps = 0
        return len(handles)

    def cancel(self, req: Request) -> bool:
        """Abort a request: drop it from the pending queue or free its slot.
        Tokens already committed stay on ``req.tokens``; tokens still in
        flight are discarded by the drain (same machinery as EOS). Returns
        False if the request had already finished."""
        if req.done:
            return False
        req.done = True
        try:
            self.pending.remove(req)
        except ValueError:
            pass
        for i, s in enumerate(self.slots):
            if s is req:
                self.slots[i] = None
                if self.chunked:
                    self._pf_pos[i] = -1
        return True

    # -- admission internals -------------------------------------------------

    def _batchable(self, req: Request) -> bool:
        """Eligible for the batched-admission prefill: the plain text-only
        tail of _admit (no images, no adapter, no chunked ingestion, no
        prompt buckets, no prefix-cache or shared-segment hit). Everything
        else keeps the specialized batch-1 paths."""
        import numpy as np
        if self.chunked or req.images is not None or req.adapter is not None:
            return False
        if self.scfg.prompt_buckets:
            return False
        praw = np.asarray(req.prompt, np.int32)
        if self.shared_seg is not None and self._matches_shared(praw):
            return False
        if self.prefix_cache and self._match_prefix(praw,
                                                    probe=True) is not None:
            return False
        return True

    def _admit_many(self, pairs) -> None:
        """Admit several simple text-only requests with ONE pooled prefill.

        Prefill is weight-read bound (a 128-token batch-1 prefill reads all
        ~5 GB of weights for ~0.7 TFLOP of compute), so A admissions
        batched into one dispatch cost barely more than one — measured as
        the 47 ms/step admission tax at 32-slot high-churn serving
        (BASELINE.md round-5 slot-scaling table). The caller buckets A to
        powers of two so at most log2(max_batch) extra prefill programs
        compile. Per-slot sampling-override state updates are batched into
        one dispatch per field; the batch commits as ONE admission inflight
        entry (counts = {"slots": [...]}) on throughput engines, or one
        batched device_get on latency engines."""
        import numpy as np
        A = len(pairs)
        p = self.scfg.max_prompt_len
        slots = [s for s, _ in pairs]
        prompts = np.full((A, p), self.scfg.pad_id, np.int32)
        lens = np.zeros((A,), np.int32)
        on = np.zeros((A,), bool)
        temps = np.ones((A,), np.float32)
        topks = np.zeros((A,), np.int32)
        topps = np.ones((A,), np.float32)
        for r, (slot, req) in enumerate(pairs):
            praw = np.asarray(req.prompt, np.int32)
            prompts[r, :len(praw)] = praw
            lens[r] = len(praw)
            self._dispatched[slot] = 0
            self._reset_center(slot)
            self._prefill_host[slot] = len(praw)
            self._set_slot_adapter(slot, None)
            on[r] = (req.temperature is not None or req.top_k is not None
                     or req.top_p is not None)
            self._override_host[slot] = bool(on[r])
            if req.temperature is not None:
                temps[r] = float(req.temperature)
            if req.top_k is not None:
                topks[r] = int(req.top_k)
            if req.top_p is not None:
                topps[r] = float(req.top_p)
        sl = jnp.asarray(slots, jnp.int32)
        self.slot_override = self.slot_override.at[sl].set(
            jnp.asarray(on))
        self.slot_temp = self.slot_temp.at[sl].set(jnp.asarray(temps))
        self.slot_topk = self.slot_topk.at[sl].set(jnp.asarray(topks))
        self.slot_topp = self.slot_topp.at[sl].set(jnp.asarray(topps))
        if self.shared_seg is not None:
            # eligibility guarantees no shared match, but the rows must be
            # cleared (a previous occupant may have attended the segment)
            self.shared_on = self.shared_on.at[sl].set(False)
            self.pos_offset = self.pos_offset.at[sl].set(0)
        rows = None
        if on.any():
            rows = (jnp.asarray(on), jnp.asarray(temps),
                    jnp.asarray(topks), jnp.asarray(topps))
        pj = jnp.asarray(prompts)
        lj = jnp.asarray(lens)
        first, flp, cA = _prefill_one_jit(
            self.dec_params, pj, lj, self._fold(), self.cfg,
            self.sampling, self.cache_len, double_scale=self.double_scale,
            interpret=self.interpret, rows=rows)
        self.caches = _insert_rows_jit(self.caches, cA, sl)
        self.index = self.index.at[sl].set(lj)
        if self.spec:
            _, _, cdA = _prefill_one_jit(
                self.draft_params, pj, lj, self._fold(), self.draft_cfg,
                self.sampling, self.cache_len, interpret=self.interpret)
            self.draft_caches = _insert_rows_jit(self.draft_caches, cdA, sl)
            self.index_d = self.index_d.at[sl].set(lj)
        if self.scfg.sync_lag > 0 or self.scfg.async_drain:
            self.last = self.last.at[sl].set(first)
            for slot, req in pairs:
                self.slots[slot] = req
                self._dispatched[slot] = 1
            if self.scfg.eager_copy:
                try:
                    first.copy_to_host_async()
                    flp.copy_to_host_async()
                except AttributeError:
                    pass
            self._inflight.append((first, flp, {"slots": list(slots)},
                                   list(self.slots)))
        else:
            # latency engines: ONE blocking read for the whole batch, then
            # the standard per-slot commit (which feeds `last` per row)
            tok_h, lp_h = jax.device_get((first, flp))
            for r, (slot, req) in enumerate(pairs):
                self._commit_first_token(slot, req, int(tok_h[r]),
                                         float(lp_h[r]))

    def _admit(self, slot: int, req: Request):
        import numpy as np

        self._dispatched[slot] = 0
        self._reset_center(slot)  # fresh caches are prefilled at center 0
        p = self.scfg.max_prompt_len
        praw = np.asarray(req.prompt, np.int32)  # submit() normalized it
        # true prefill length (prompt tokens + image embeds), host-side:
        # _maybe_recenter's exact position accounting (same n_img formula
        # as submit()'s kv_window bound)
        n_img = 0
        if req.images is not None:
            n_img = req.images.shape[0] if req.images.ndim == 4 else 1
        self._prefill_host[slot] = len(praw) + n_img * (
            self.kcfg.image_embed_len if self.kcfg is not None else 0)
        s_idx = self.kcfg.splice_index if self.kcfg is not None else 0
        # per-slot LoRA adapter (cleared to zeros when the request has none)
        self._set_slot_adapter(slot, req.adapter)
        # per-request sampling overrides (flagged rows fully replace the
        # engine's static SamplingConfig; temperature defaults to 1.0 when
        # only top-k/top-p are given)
        override = (req.temperature is not None or req.top_k is not None
                    or req.top_p is not None)
        self._override_host[slot] = override
        self.slot_override = self.slot_override.at[slot].set(override)
        self.slot_temp = self.slot_temp.at[slot].set(
            1.0 if req.temperature is None else float(req.temperature))
        self.slot_topk = self.slot_topk.at[slot].set(
            0 if req.top_k is None else int(req.top_k))
        self.slot_topp = self.slot_topp.at[slot].set(
            1.0 if req.top_p is None else float(req.top_p))
        # shared-prefix segment: matching slots attend it in place (no
        # copy); their own cache starts at 0 with positions shifted by P.
        # Adapter requests skip BOTH prefix paths: registered prefixes were
        # prefilled with the BASE model, and an adapted model processes the
        # prefix differently.
        sh_match = (req.images is None and req.adapter is None
                    and self._matches_shared(praw))
        if self.shared_seg is not None:
            self.shared_on = self.shared_on.at[slot].set(bool(sh_match))
            self.pos_offset = self.pos_offset.at[slot].set(
                self.shared_seg["len"] if sh_match else 0)
            if sh_match:
                self.prefix_hits += 1
                praw = praw[self.shared_seg["len"]:]  # own-cache remainder
        # prefix cache: text-only prompts matching a registered prefix skip
        # its prefill (the cached K/V is copied into the slot)
        hit = (self._match_prefix(praw)
               if self.prefix_cache and req.images is None and not sh_match
               and req.adapter is None else None)
        if self.chunked and (req.images is None or len(praw) > s_idx):
            # no full-prompt device work now: the text streams in
            # chunk-by-chunk via _advance_prefill, interleaved with other
            # slots' decode steps
            self._prompt_rows[slot, :] = self.scfg.pad_id
            self._prompt_rows[slot, :len(praw)] = praw
            self._pf_len[slot] = len(praw)
            if req.images is not None:
                # one-shot vision tower + spliced-prefix prefill (cheap:
                # splice_index tokens + M*64 image embeds); the text
                # remainder joins the pooled chunk stream at s_idx
                images = (req.images if req.images.ndim == 5
                          else req.images[None])
                c1, idx0 = _prefill_mm_prefix_jit(
                    self.params, jnp.asarray(praw[:s_idx])[None, :], images,
                    self.kcfg, self.cache_len)
                self.caches = _insert_slot_jit(self.caches, c1, slot)
                self._pf_pos[slot] = s_idx
                self.index = self.index.at[slot].set(idx0[0])
            elif hit is not None:
                # prefix hit: the chunk stream starts after the cached part
                self.caches = _insert_slot_jit(self.caches, hit["caches"],
                                               slot)
                self._pf_pos[slot] = hit["len"]
                self.index = self.index.at[slot].set(hit["len"])
            else:
                self._pf_pos[slot] = 0
                self.index = self.index.at[slot].set(0)
            self.slots[slot] = req
            return
        if hit is not None or sh_match:
            # plain-path prefix hit: BATCH-1 suffix prefill (in-flight slots
            # never pay for it), then one pool insert. Copy mode continues
            # the LRU entry's cache (un-donated — the entry stays pristine);
            # share mode starts a fresh remainder-only cache and attends the
            # broadcast shared segment with positions shifted by its length.
            suffix = praw[hit["len"]:] if hit is not None else praw
            start = hit["len"] if hit is not None else 0
            pad_to = _suffix_bucket(len(suffix), p)
            srow = jnp.asarray(np.pad(
                suffix, (0, pad_to - len(suffix)),
                constant_values=self.scfg.pad_id))[None, :]
            slen = jnp.asarray([len(suffix)], jnp.int32)
            sstart = jnp.asarray([start], jnp.int32)
            if sh_match:
                sh_len = self.shared_seg["len"]
                shared1 = (self.shared_seg["caches"],
                           jnp.ones((1,), bool),
                           jnp.full((1,), sh_len, jnp.int32))
            else:
                shared1 = None
            first, flp, c1 = _prefill_suffix_one_jit(
                self.dec_params, srow, slen, sstart,
                hit["caches"] if hit is not None else None, self._fold(),
                self.cfg, self.sampling, max_len=self.cache_len,
                double_scale=self.double_scale, shared=shared1,
                rows=self._row1(req), interpret=self.interpret)
            self.caches = _insert_slot_jit(self.caches, c1, slot)
            self.index = self.index.at[slot].set(start + len(suffix))
            if self.spec:
                shared1_d = None
                if sh_match:
                    shared1_d = (self.shared_seg["draft_caches"],
                                 jnp.ones((1,), bool),
                                 jnp.full((1,), sh_len, jnp.int32))
                _, _, cd1 = _prefill_suffix_one_jit(
                    self.draft_params, srow, slen, sstart,
                    hit["draft"] if hit is not None else None,
                    jax.random.PRNGKey(0), self.draft_cfg, self.sampling,
                    max_len=self.cache_len, shared=shared1_d,
                    interpret=self.interpret)
                self.draft_caches = _insert_slot_jit(self.draft_caches, cd1,
                                                     slot)
                self.index_d = self.index_d.at[slot].set(start + len(suffix))
            self._commit_first(slot, req, first, flp)
            return
        # bucketed admission (ServeConfig.prompt_buckets): pad to the
        # smallest bucket that fits — prefill FLOPs scale with the bucket,
        # so short prompts admit proportionally faster
        pad_to = p
        for bucket in sorted(self.scfg.prompt_buckets):
            if len(praw) <= bucket <= p:
                pad_to = bucket
                break
        prompt = jnp.asarray(
            np.pad(praw, (0, pad_to - len(praw)),
                   constant_values=self.scfg.pad_id))[None, :]
        length = jnp.asarray([len(praw)], jnp.int32)
        if req.images is not None:
            images = req.images if req.images.ndim == 5 else req.images[None]
            r1 = self._row1(req)
            first, flp, c1, full_len = _prefill_mm_one_jit(
                self.params, prompt, images, length, self._fold(),
                self.kcfg, self.sampling, self.cache_len, rows=r1)
            idx = full_len
        else:
            pparams = (self.adapters[req.adapter]["params"]
                       if req.adapter is not None else self.dec_params)
            r1 = self._row1(req)
            first, flp, c1 = _prefill_one_jit(
                pparams, prompt, length, self._fold(), self.cfg,
                self.sampling, self.cache_len,
                double_scale=self.double_scale, interpret=self.interpret,
                rows=r1)
            idx = length
        self.caches = _insert_slot_jit(self.caches, c1, slot)
        if self.spec:
            # the draft prefills on the TOKENS only (for multimodal slots
            # that's the raw prompt incl. the <image></image> tag ids; it
            # never sees image embeddings — the target's verify carries the
            # image context). The draft never double-scales.
            _, _, cd1 = _prefill_one_jit(
                self.draft_params, prompt, length, self._fold(),
                self.draft_cfg, self.sampling, self.cache_len,
                interpret=self.interpret)
            self.draft_caches = _insert_slot_jit(self.draft_caches, cd1,
                                                 slot)
            self.index_d = self.index_d.at[slot].set(len(praw))
        self.index = self.index.at[slot].set(idx[0])
        self._commit_first(slot, req, first, flp)

    def _commit_first_token(self, slot: int, req: Request, tok: int,
                            lp: float):
        """Bookkeeping shared by every admission flavor: the prefill's
        sampled token enters the slot's device feed and the request's
        output, and counts toward its budget."""
        self.last = self.last.at[slot].set(tok)
        self.slots[slot] = req
        req.tokens.append(tok)
        req.logprobs.append(lp)
        self._dispatched[slot] = 1
        self.emitted_total += 1
        self._maybe_finish(slot, tok)

    def _commit_first(self, slot: int, req: Request, first, flp):
        """Commit an admission's sampled first token.

        Throughput engines (sync_lag > 0 or async_drain) must NOT block on
        a host read here: the blocking ``device_get`` costs prefill-wait +
        one link RTT per admission (measured 30-50 ms on the axon tunnel —
        up to ~20 ms/step amortized at decode_block=4). Instead the token
        enters the slot's device feed via a device-side copy and the
        HOST-side commit (handle append, logprob, EOS/budget check) rides
        the normal drain pipeline as an admission-only inflight entry
        (counts = {"slot": slot}), keeping token order per slot. Latency
        engines (sync_lag == 0, no async_drain) keep the synchronous read
        — their contract is immediate first-token visibility."""
        if self.scfg.sync_lag > 0 or self.scfg.async_drain:
            self.last = self.last.at[slot].set(first[0])
            self.slots[slot] = req
            self._dispatched[slot] = 1
            if self.scfg.eager_copy:
                try:
                    first.copy_to_host_async()
                    flp.copy_to_host_async()
                except AttributeError:
                    pass
            self._inflight.append((first, flp, {"slot": slot},
                                   list(self.slots)))
        else:
            tok_h, lp_h = jax.device_get((first, flp))
            self._commit_first_token(slot, req, int(tok_h[0]),
                                     float(lp_h[0]))

    def _maybe_finish(self, slot: int, tok: int):
        req = self.slots[slot]
        if req is not None:
            self._finish_if_needed(slot, req, tok)

    def _finish_if_needed(self, slot: int, req: Request, tok: int):
        if ((req.eos_id is not None and tok == req.eos_id)
                or len(req.tokens) >= req.max_new_tokens):
            req.done = True
            # no need to pad ``last[slot]``: _decode_step_jit masks inactive
            # slots to pad on device. Guard against the slot having been
            # re-admitted (possible when bookkeeping lags dispatch).
            if self.slots[slot] is req:
                self.slots[slot] = None

    @property
    def num_active(self) -> int:
        return sum(s is not None for s in self.slots)

    def _is_prefilling(self, slot: int) -> bool:
        return self.chunked and self._pf_pos[slot] >= 0

    @property
    def num_decoding(self) -> int:
        return sum(s is not None and not self._is_prefilling(i)
                   for i, s in enumerate(self.slots))

    def _advance_prefill(self):
        """Ingest one chunk for every prefilling slot; slots whose prompt
        completes sample their first token and switch to decoding."""
        import numpy as np

        K = self.scfg.prefill_chunk
        b = self.scfg.max_batch
        chunk = np.full((b, K), self.scfg.pad_id, np.int32)
        seg = np.full((b, K), -1, np.int32)
        boundary = np.zeros((b,), np.int32)
        mask = np.zeros((b,), bool)
        completing = []
        for slot in range(b):
            pos = self._pf_pos[slot]
            if pos < 0:
                continue
            plen = self._pf_len[slot]
            n = min(K, plen - pos)
            chunk[slot, :n] = self._prompt_rows[slot, pos:pos + n]
            seg[slot, :n] = 0
            boundary[slot] = n - 1
            mask[slot] = True
            if pos + n >= plen:
                completing.append(slot)
        first, flp, self.caches, self.index = _prefill_chunk_pool_jit(
            self._pool_params(), jnp.asarray(chunk), jnp.asarray(seg),
            self.caches, self.index, jnp.asarray(mask),
            jnp.asarray(boundary), self._fold(), self.cfg, self.sampling,
            double_scale=self.double_scale, shared=self._shared(),
            rows=self._rows())
        if completing:
            toks, lps = jax.device_get((first, flp))  # ONE round-trip
            for slot in completing:
                req = self.slots[slot]
                tok = int(toks[slot])
                self.last = self.last.at[slot].set(tok)
                self._pf_pos[slot] = -1
                if req is not None:
                    req.tokens.append(tok)
                    req.logprobs.append(float(lps[slot]))
                    self._dispatched[slot] = 1  # prefill token counts
                    self.emitted_total += 1
                    self._finish_if_needed(slot, req, tok)
        for slot in range(b):
            if self._pf_pos[slot] >= 0 and slot not in completing:
                self._pf_pos[slot] += K
