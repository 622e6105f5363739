"""Training data pipelines.

Replicates the reference's two loaders (/root/reference/train.py:416-483):
(a) on-the-fly: tokenize documents, append EOS, concat-and-chunk into fixed
``seq_len`` blocks (``group_texts``, :444-462); (b) pre-tokenized token
streams. The reference trains a multimodal model on text-only data
(SURVEY.md §2.6.4); we support text-only AND synthetic/real image+text
batches so the Kosmos path actually trains.

Everything yields plain numpy dicts; device placement/sharding happens in the
Trainer (host→device transfer happens once, already batched).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np


def group_texts(token_streams: Iterable[Sequence[int]], seq_len: int,
                eos_id: int = 2) -> Iterator[np.ndarray]:
    """Concatenate tokenized docs (appending EOS) and emit ``seq_len`` blocks
    (the reference's group_texts, /root/reference/train.py:444-462 — drop the
    trailing remainder like the reference does).

    Docs are batched and packed through the native C++ kernel
    (data/native/packing.cpp) when built; semantics are identical to the
    numpy path (tests/test_native_data.py checks byte equality).
    """
    from kosmosx_tpu.data import native as _native

    carry = np.zeros((0,), np.int32)
    pending: List[np.ndarray] = []
    pending_tokens = 0
    flush_at = max(seq_len * 64, 1 << 16)  # amortize the ctypes call
    for stream in token_streams:
        doc = np.asarray(stream, np.int32).ravel()
        pending.append(doc)
        pending_tokens += len(doc) + 1
        if pending_tokens + len(carry) >= flush_at:
            blocks, carry = _native.pack_blocks(pending, seq_len, eos_id,
                                                carry)
            pending, pending_tokens = [], 0
            yield from blocks
    if pending:
        blocks, carry = _native.pack_blocks(pending, seq_len, eos_id, carry)
        yield from blocks


def packed_text_batches(token_streams: Iterable[Sequence[int]], *,
                        batch_size: int, seq_len: int,
                        eos_id: int = 2) -> Iterator[Dict[str, np.ndarray]]:
    """{"input_ids": (B, L), "attention_mask": ones} batches from packed
    blocks."""
    block_iter = group_texts(token_streams, seq_len, eos_id)
    while True:
        blocks = []
        for _ in range(batch_size):
            try:
                blocks.append(next(block_iter))
            except StopIteration:
                return
        ids = np.stack(blocks)
        yield {"input_ids": ids,
               "attention_mask": np.ones_like(ids, np.int32)}


def device_prefetch(iterator: Iterable, place_fn,
                    depth: int = 2) -> Iterator:
    """Apply ``place_fn`` (host→device transfer / sharding) up to ``depth``
    items ahead on a background thread, so transfers overlap the current
    step's compute. The reference gets this from torch DataLoader workers +
    FSDP forward_prefetch (/root/reference/train.py:196-197); on TPU the
    device side is async already, so one thread hiding the host-side copy
    is all that's needed. Exceptions from the worker re-raise at the
    consumption point.

    Prefetching inherently reads ahead: callers that stop early should
    bound ``iterator`` to exactly the items they will consume (Trainer.run
    does), or accept up to ``depth+1`` extra items being pulled. Closing
    the generator (break / gc) stops the worker thread promptly instead of
    leaving it blocked on a full queue."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def _put(payload) -> bool:
        while not stop.is_set():
            try:
                q.put(payload, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if stop.is_set() or not _put(("item", place_fn(item))):
                    return
            _put(("done", None))
        except BaseException as e:  # re-raised on the consumer thread
            _put(("error", e))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            kind, payload = q.get()
            if kind == "done":
                return
            if kind == "error":
                raise payload
            yield payload
    finally:
        stop.set()


def text_file_stream(paths: Sequence[str], tokenizer) -> Iterator[List[int]]:
    """Tokenize documents (one per line) from text files."""
    for path in paths:
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if hasattr(tokenizer, "hf") and tokenizer.hf is not None:
                    yield tokenizer.hf(line)["input_ids"]
                elif hasattr(tokenizer, "byte"):
                    yield tokenizer.byte.encode(line)
                else:
                    yield tokenizer.encode(line)


def synthetic_text_batches(*, batch_size: int, seq_len: int, vocab_size: int,
                           seed: int = 0,
                           steps: Optional[int] = None
                           ) -> Iterator[Dict[str, np.ndarray]]:
    """Deterministic synthetic LM batches with learnable structure (each
    token = f(previous), so loss can actually decrease)."""
    rng = np.random.RandomState(seed)
    i = 0
    while steps is None or i < steps:
        start = rng.randint(2, vocab_size, size=(batch_size, 1))
        step = rng.randint(1, 7, size=(batch_size, 1))
        seq = (start + step * np.arange(seq_len)[None, :]) % (vocab_size - 2) + 2
        yield {"input_ids": seq.astype(np.int32),
               "attention_mask": np.ones((batch_size, seq_len), np.int32)}
        i += 1


def synthetic_multimodal_batches(*, batch_size: int, seq_len: int,
                                 vocab_size: int, image_size: int = 224,
                                 seed: int = 0,
                                 steps: Optional[int] = None
                                 ) -> Iterator[Dict[str, np.ndarray]]:
    """{text_tokens, images} batches for the Kosmos train path (the image
    data pipeline the reference lacks, SURVEY.md §2.2 dataloaders row)."""
    rng = np.random.RandomState(seed)
    i = 0
    while steps is None or i < steps:
        toks = rng.randint(4, vocab_size, size=(batch_size, seq_len)).astype(np.int32)
        toks[:, 0] = 0  # BOS
        imgs = rng.rand(batch_size, 3, image_size, image_size).astype(np.float32)
        yield {"text_tokens": toks, "images": imgs}
        i += 1


def multimodal_batches(samples: Iterable[Dict[str, Any]], tokenizer, *,
                       batch_size: int, text_len: int,
                       ) -> Iterator[Dict[str, np.ndarray]]:
    """Real image+text batches from raw {"target_text", "image"} samples.

    Tokenizes each caption through ``KosmosTokenizer.tokenize_texts`` (BOS +
    <image></image> tags spliced), pads/truncates to a FIXED ``text_len``
    (static shapes — one compiled train step), CLIP-normalizes images
    device-side, and stacks. Completes the data path the reference lacks:
    it trains its multimodal model on text-only C4/openwebtext
    (SURVEY.md §2.6.4).
    """
    import jax.numpy as jnp

    pad = tokenizer.pad_token_id
    # the spliced row is BOS + one <tag></tag> pair per modality + caption;
    # budget the raw encoding so full captions never lose trailing tokens
    # to the fixed row width
    reserve = 1 + 2 * len(tokenizer.modalities)
    batch_toks: List[np.ndarray] = []
    batch_imgs: List[np.ndarray] = []
    for sample in samples:
        ids, _ = tokenizer.tokenize_texts(sample["target_text"],
                                          max_length=max(1, text_len - reserve))
        row = np.full((text_len,), pad, np.int32)
        n = min(ids.shape[1], text_len)
        row[:n] = ids[0, :n]
        batch_toks.append(row)
        img = np.asarray(sample["image"])
        if img.ndim == 3:
            img = img[None]
        batch_imgs.append(img[0])
        if len(batch_toks) == batch_size:
            imgs = np.stack(batch_imgs)
            pixel_values = np.asarray(
                tokenizer.tokenize_images(jnp.asarray(imgs)), np.float32)
            yield {"text_tokens": np.stack(batch_toks), "images": pixel_values}
            batch_toks, batch_imgs = [], []
