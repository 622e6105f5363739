"""Serving configuration, request handles, and the mode-compatibility matrix.

The reference ships no serving layer at all (SURVEY.md §1); ServeConfig is
this framework's own surface. The engine composes many orthogonal modes —
plain / blocked / chunked / speculative / kv_window / prefix-copy /
prefix-share / multi-LoRA / per-request sampling / w8 / kv8 — and every
unsupported pairing must fail AT CONSTRUCTION (or at the request-shaping
call: submit / load_adapter / register_prefix), never mid-flight.
``UNSUPPORTED_MODE_PAIRS`` is the single source of truth; the table-driven
test (tests/test_serve_matrix.py) enumerates mode pairs and asserts that
supported combos match the plain engine's greedy output and unsupported
combos raise exactly here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    max_batch: int = 8          # concurrent decode slots
    max_prompt_len: int = 128   # prompts are padded to this (static shape)
    max_len: int = 256          # KV-cache length (prompt + generated bound)
    pad_id: int = 1             # feed for inactive slots
    # How many decode steps the HOST may lag behind the device when reading
    # sampled tokens. 0 = read every step (EOS reacts immediately; one
    # blocking device->host fetch per token). K>0 = the device free-runs —
    # its token feedback loop lives on device — while token reads pipeline
    # K-deep, hiding the host link latency behind compute; EOS/budget
    # detection lags K steps, so a finishing request decodes up to K
    # discarded tokens and its slot frees K steps late. On a remote-device
    # link (measured: ~36 ms fetch vs ~9 ms compute) this takes the step
    # from RTT-bound to compute-bound.
    sync_lag: int = 0
    # Drain batching: read back K steps' tokens in ONE batched device_get
    # instead of one fetch per step. On the axon tunnel a batched get of
    # 1..16 tiny buffers costs the same ~30 ms link RTT (measured flat),
    # so K-batching divides the per-step fetch cost by K where deeper
    # sync_lag cannot (more outstanding per-step fetches just contend on
    # the one tunnel channel — lag 8 measured SLOWER than lag 4). Composes
    # with sync_lag: reads start after sync_lag steps and trigger every
    # drain_batch steps; EOS detection lags up to sync_lag + drain_batch
    # steps (budget exhaustion still reacts immediately via the host-side
    # dispatch clamp).
    drain_batch: int = 1
    # Asynchronous drains: a daemon READER THREAD performs the blocking
    # token device_gets while the main loop keeps dispatching — on the axon
    # tunnel the fetch RTT then fully overlaps the step loop (cadence
    # probe: 1.2 ms/step vs 6.1 with inline fetches; the async host copies
    # land in background and the reader's get costs ~0.7 ms). Entries are
    # handed to the reader in drain_batch-sized batches (one link RTT per
    # batch) once they are sync_lag steps old, and bookkept on the MAIN
    # thread in dispatch order; at most sync_lag + 3*drain_batch fetches
    # may be outstanding before the loop blocks (≈2 reader batches in
    # flight), and overrun_window widens accordingly. Default ON
    # (round-5 table, BASELINE.md: async won every measured pairing —
    # +12% plain, +5% w8+kv8, +5% all-levers — with bit-identical greedy
    # token streams); set False when the host must observe tokens
    # strictly step-synchronously (per-token latency SLAs): with
    # async_drain the host's view of tokens lags a few steps even at
    # sync_lag=0.
    async_drain: bool = True
    # Start device->host copies eagerly at dispatch time
    # (copy_to_host_async on each emitted-token buffer). On a local device
    # this hides the copy behind compute for free; on the axon tunnel each
    # async copy is its own RPC and the per-request overhead can dominate
    # the tiny token buffers — serving sweeps toggle this to find the
    # cheaper side for a given link.
    eager_copy: bool = True
    # Speculative decoding: when > 0 (and the engine is built with
    # draft_params/draft_cfg), every engine step runs one speculative round
    # — the draft proposes spec_gamma tokens per slot, the target verifies
    # them in ONE chunked forward, and each active slot commits 1..gamma+1
    # tokens per step. Multimodal slots work too: the draft proposes from
    # TOKENS alone (its cache index lags the target's by the image-embed
    # count); the target's verify forward carries the image context, so
    # correctness is unchanged — only the acceptance rate depends on how
    # image-dependent the continuation is.
    spec_gamma: int = 0
    # Decode blocking: when > 1, every engine step runs decode_block decode
    # steps in ONE device dispatch (lax.scan inside the jit, token feedback
    # on device) and reads back (B, decode_block) tokens. Amortizes the
    # per-dispatch overhead (~3 ms on the remote link vs a ~7-10 ms
    # flagship step) the same way sync_lag amortizes the READ latency; the
    # two compose. Budget exhaustion reacts immediately (the host clamps
    # dispatch when a slot's known budget is reached; overrun is at most
    # block-1 tokens from the final partial block), but EOS — which the
    # host cannot predict — is detected up to (sync_lag+1)*decode_block
    # tokens late (overrun discarded, the slot frees late). Admission
    # waits for a step boundary. Greedy outputs are identical to the
    # per-token engine. With spec_gamma > 0, decode_block scans K
    # SPECULATIVE ROUNDS per dispatch instead (the spec engine is
    # host-pipeline-bound at small sync_lag, so amortizing the dispatch
    # cadence raises throughput; overrun grows to
    # (sync_lag+1)*(gamma+1)*block).
    decode_block: int = 0
    # Chunked prefill: when > 0, request admission does NO full-prompt
    # prefill up front; the engine ingests the prompt prefill_chunk tokens
    # per step through a pooled multi-token cached forward, interleaved
    # with the decode steps of in-flight slots. Multimodal admissions run
    # the vision tower + a spliced-prefix prefill once (splice_index tokens
    # + image embeds), then their text remainder joins the chunk stream.
    # Bounds the admission stall to one chunk per step instead of one full
    # prompt.
    prefill_chunk: int = 0
    # Admission prefill buckets: batch-1 prefills pad the prompt to the
    # smallest listed bucket >= its length instead of always to
    # max_prompt_len — prefill FLOPs scale with the bucket, so short
    # prompts admit proportionally faster. Each bucket compiles one extra
    # prefill program (expensive on a remote chip: opt in deliberately).
    # () = always pad to max_prompt_len.
    prompt_buckets: tuple = ()
    # Prefix caching: max number of prefixes held by register_prefix()
    # (LRU). A registered prefix's KV cache is computed once; any text
    # request whose prompt starts with it is admitted by copying the cached
    # K/V into its slot and prefilling only the remainder — the serving
    # answer to shared system prompts / few-shot headers. Greedy outputs
    # are identical to full prefill (same cache contents, same positions).
    prefix_cache_size: int = 8
    # Pool-fill-adaptive decode-attention kernel: when > 0, a decode
    # dispatch whose mean active-slot cache fill (valid positions /
    # cache_len) is at or below this fraction routes through a
    # MagnetoConfig.decode_attn_kernel=True variant — the Pallas
    # single-query kernel's ONLY winning regime is long pools at low fill
    # (BASELINE.md decode S-sweep: its scalar-prefetch DMA skip wins at
    # S=2048 half-valid, 0.280 vs 0.290 ms; it loses everywhere at full
    # validity, ~300 vs ~550 GB/s), so the engine checks the host-known
    # fill before every dispatch and picks per dispatch. Pools shorter
    # than 1024 never use the kernel (fixed overheads dominate below
    # that). At most one extra decode program compiles. 0 = off.
    decode_kernel_fill: float = 0.0
    # Serving-side override of MagnetoConfig.decode_unroll_min_len (None =
    # inherit). The engine picks its pool's RESIDENT layout once at
    # construction (ServeEngine._pool_layout): per-layer list buffers when
    # the unroll applies (decode programs then run the unrolled layer loop
    # with in-place cache updates — measured faster at every pool length,
    # BASELINE.md decode-unroll section), the stacked array otherwise.
    # Raise this (or set decode_unroll=False on the model config) to force
    # the lax.scan decode path, e.g. to trade step speed for the unrolled
    # programs' ~2x one-time compile. Applied to cfg AND draft_cfg.
    unroll_min_len: Optional[int] = None

    @property
    def overrun_window(self) -> int:
        """Cache positions a slot can touch past its budget (worst-case
        EOS/speculative overrun). size max_len >= prompt + image embeds +
        max_new_tokens + this. Single source of truth for the engine's
        submit() guard and the benchmarks' max_len sizing."""
        # async_drain bounds TOTAL un-bookkept steps (queued in _inflight
        # plus handed to the reader) to sync_lag + 3*drain_batch at the
        # END of each step: the engine's backpressure cap subtracts
        # len(_inflight) from the reader allowance (engine.step's
        # _collect_done call). The +1 mirrors the sync path's own +1:
        # the NEXT step dispatches before it bookkeeps anything, so one
        # more dispatch can land on top of the end-of-step bound. This
        # matters most for spec engines, which bypass the host budget
        # clamp and write (gamma+1)*block cache rows per un-bookkept step.
        kb = max(self.drain_batch, 1)
        lag = (self.sync_lag + 3 * kb + 1 if self.async_drain
               else self.sync_lag + kb)
        if self.spec_gamma > 0:
            return lag * (self.spec_gamma + 1) * max(self.decode_block, 1)
        return lag * max(self.decode_block, 1) - 1


@dataclasses.dataclass
class Request:
    prompt: Any                  # (Lp,) int32 token ids (list or array)
    max_new_tokens: int = 64
    eos_id: Optional[int] = None
    images: Any = None           # optional (M, 3, H, W) for multimodal
    adapter: Optional[str] = None  # LoRA adapter name (load_adapter)
    # per-request sampling overrides: when ANY is set, this request's row
    # fully replaces the engine SamplingConfig (temp 0 = greedy; top_k 0 =
    # off; top_p 1.0 = off; unset fields default to 1.0 / 0 / 1.0)
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    # filled by the engine:
    id: int = -1
    tokens: List[int] = dataclasses.field(default_factory=list)
    logprobs: List[float] = dataclasses.field(default_factory=list)
    done: bool = False


# ---------------------------------------------------------------------------
# Mode-compatibility matrix
# ---------------------------------------------------------------------------
#
# Engine modes (how each is switched on):
#   spec        ServeConfig.spec_gamma > 0 (+ draft_params/draft_cfg)
#   chunked     ServeConfig.prefill_chunk > 0
#   blocked     ServeConfig.decode_block > 1
#   kv_window   MagnetoConfig.kv_window > 0 (rolling ring + sinks)
#   kv8         MagnetoConfig.kv_cache_dtype == "int8"
#   w8          int8-quantized params (utils/quantize.quantize_params_w8)
#   multimodal  engine built with kosmos_cfg; requests may carry images
#   prefix_copy register_prefix(tokens) — per-slot K/V copy on admission
#   prefix_share register_prefix(tokens, share=True) — one broadcast segment
#   adapter     load_adapter(name, tree) + submit(adapter=name)
#   sampling_override  submit(temperature=/top_k=/top_p=)
#
# Every pair NOT listed below is SUPPORTED and covered by
# tests/test_serve_matrix.py (greedy output equal to the plain engine).
UNSUPPORTED_MODE_PAIRS = {
    frozenset({"kv_window", "spec"}):
        "kv_window serving does not compose with speculation "
        "(the multi-token verify bypasses the ring)",
    frozenset({"chunked", "spec"}):
        "chunked prefill + speculative serving is not implemented "
        "(the draft pool would need chunked ingestion too)",
    frozenset({"adapter", "spec"}):
        "multi-LoRA + speculative serving is not implemented "
        "(the draft would need per-slot adapters too)",
    frozenset({"adapter", "multimodal"}):
        "multi-LoRA serving is text-only for now (adapters attach to the "
        "decoder; build the engine without kosmos_cfg)",
    frozenset({"sampling_override", "spec"}):
        "per-request sampling with speculative serving is not implemented "
        "(the draft/verify acceptance rule is engine-global); set the "
        "engine SamplingConfig instead",
    # adapter requests intentionally SKIP both prefix paths (registered
    # prefixes are prefilled with the BASE model) — that pairing is
    # supported-with-degradation, not an error; see AdmissionMixin._admit.
}


def unsupported_reason(*modes: str) -> Optional[str]:
    """The matrix reason for the first unsupported pair among ``modes``."""
    on = [m for m in modes if m]
    for i, a in enumerate(on):
        for b in on[i + 1:]:
            reason = UNSUPPORTED_MODE_PAIRS.get(frozenset({a, b}))
            if reason is not None:
                return reason
    return None


def check_engine_modes(cfg, scfg: ServeConfig, draft_cfg=None,
                       kosmos_cfg=None, sampling=None) -> None:
    """Construction-time validation: every statically-knowable unsupported
    mode pairing raises here, with the matrix reason — never mid-flight.
    (Request-time modes — adapter, images, sampling_override — are checked
    in load_adapter/submit against the same matrix.)"""
    spec = scfg.spec_gamma > 0
    modes = []
    if spec:
        modes.append("spec")
    if scfg.prefill_chunk > 0:
        modes.append("chunked")
    if cfg.kv_window > 0 or (draft_cfg is not None
                             and draft_cfg.kv_window > 0):
        modes.append("kv_window")
    reason = unsupported_reason(*modes)
    if reason is not None:
        raise NotImplementedError(reason)
    if spec and sampling is not None and (
            sampling.top_k > 0
            or (not sampling.greedy and sampling.top_p < 1.0)):
        raise NotImplementedError(
            "speculative serving supports greedy or plain temperature "
            "sampling")
    if cfg.kv_window > 0 or (draft_cfg is not None
                             and draft_cfg.kv_window > 0):
        # rolling-window serving: single-token decode writes ring;
        # multi-token PREFILL writes are safe (prompts fit the window,
        # enforced below, so they never wrap) — chunked prefill is fine.
        if draft_cfg is not None and draft_cfg.kv_window != cfg.kv_window:
            raise ValueError("draft kv_window must match the target's")
        if cfg.kv_sink >= cfg.kv_window:
            raise ValueError(f"kv_sink ({cfg.kv_sink}) must be < "
                             f"kv_window ({cfg.kv_window})")
        if scfg.max_prompt_len > cfg.kv_window:
            raise ValueError(
                f"max_prompt_len ({scfg.max_prompt_len}) exceeds "
                f"kv_window ({cfg.kv_window}); prompts must fit the "
                f"window (prefill is a single un-wrapped write)")
        if scfg.max_len < cfg.kv_window:
            raise ValueError(
                f"max_len ({scfg.max_len}) < kv_window "
                f"({cfg.kv_window}): ring writes target positions in "
                f"[0, kv_window) — a smaller buffer silently drops "
                f"them; set max_len >= kv_window")
        if cfg.xpos_rel_pos:
            # mirror generate/sampler.py's reach guard: with per-slot xPos
            # re-centering (ServeEngine._maybe_recenter) the largest
            # |pos - center| ever rotated or cached is bounded by the
            # prompt (<= window, enforced by submit) + the recenter
            # interval. INTENDED: this rejects at construction even
            # engines that would only ever serve shared-prefix traffic
            # (where a registered shared segment disables re-centering and
            # submit() bounds each request instead) — re-centering
            # capability is a constructor-level contract, never a
            # mid-flight discovery; shared-prefix-only deployments should
            # raise xpos_scale_base or shrink kv_window the same way.
            from kosmosx_tpu.nn.xpos import xpos_position_bound
            bound = xpos_position_bound(cfg.xpos_scale_base)
            reach = cfg.kv_window + 8 * cfg.xpos_scale_base
            if reach > bound:
                raise ValueError(
                    f"kv_window ({cfg.kv_window}) + re-center interval "
                    f"(8*xpos_scale_base = {8 * cfg.xpos_scale_base}) "
                    f"= {reach} exceeds the xPos numeric range "
                    f"({bound}); shrink the window or raise "
                    f"xpos_scale_base")
