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

import json
import os
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


def _open_token_file(path: str, dtype: Optional[str] = None) -> np.ndarray:
    """Open a pretokenized token file without loading it into RAM.

    ``.npy``: memmapped via ``np.load`` (1-D stream or 2-D ``(N, L)`` rows).
    Anything else (``.bin``): raw ``np.memmap``; dtype comes from the
    ``dtype`` arg, a ``<stem>.json`` sidecar ``{"dtype": ...}``, or defaults
    to uint16 (the common GPT-2/NeoX token-dump convention).
    """
    if path.endswith(".npy"):
        return np.load(path, mmap_mode="r")
    dt = dtype
    if dt is None:
        sidecar = os.path.splitext(path)[0] + ".json"
        if os.path.exists(sidecar):
            with open(sidecar, "r", encoding="utf-8") as f:
                dt = json.load(f).get("dtype")
    return np.memmap(path, dtype=np.dtype(dt or "uint16"), mode="r")


def pretokenized_stream(paths: Sequence[str], *, seq_len: int,
                        dtype: Optional[str] = None,
                        slab_tokens: int = 1 << 20) -> Iterator[np.ndarray]:
    """Stream fixed ``seq_len`` blocks from pretokenized token files.

    The TPU-native analog of the reference's ``build_pre_tokenized``
    (/root/reference/train.py:474-483), which loads a HF dataset of
    already-tokenized fixed-length rows. Here the on-disk formats are memmap
    ``.bin`` streams and ``.npy`` arrays; rows/streams are concatenated
    (carrying across file boundaries) and re-chunked into ``seq_len`` blocks,
    dropping the trailing remainder like ``group_texts``
    (/root/reference/train.py:444-462). Files whose rows already have length
    ``seq_len`` pass through unchanged.

    Reads go through ``slab_tokens``-sized memmap slices so arbitrarily large
    dumps stream at O(slab) host memory.
    """
    carry = np.zeros((0,), np.int32)
    for path in paths:
        arr = _open_token_file(path, dtype)
        flat = arr.reshape(-1)
        pos = 0
        while pos < flat.shape[0]:
            slab = np.asarray(flat[pos:pos + slab_tokens], np.int32)
            pos += slab.shape[0]
            if carry.size:
                slab = np.concatenate([carry, slab])
            nblocks = slab.shape[0] // seq_len
            for i in range(nblocks):
                yield slab[i * seq_len:(i + 1) * seq_len].copy()
            carry = slab[nblocks * seq_len:]
    # trailing remainder dropped (group_texts semantics)


def pretokenized_batches(paths: Sequence[str], *, batch_size: int,
                         seq_len: int, dtype: Optional[str] = None,
                         ) -> Iterator[Dict[str, np.ndarray]]:
    """{"input_ids": (B, L), "attention_mask": ones} batches from
    pretokenized token files (see ``pretokenized_stream``)."""
    block_iter = pretokenized_stream(paths, seq_len=seq_len, dtype=dtype)
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


def _load_image_file(path: str, image_size: Optional[int]) -> np.ndarray:
    """Load one image file as channel-first uint8/float (3, H, W).

    ``.npy`` arrays pass through ((3,H,W) or (H,W,3)); everything else goes
    through PIL. When ``image_size`` is set, non-conforming images get the
    CLIPProcessor-style short-side resize + center crop on the host so a
    batch stacks to one static shape (the device-side normalize in
    ``data/images.py`` then sees already-sized inputs and skips its resize).
    """
    if path.endswith(".npy"):
        img = np.load(path)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=0)
        if img.ndim == 3 and img.shape[0] not in (1, 3):
            img = img[..., :3].transpose(2, 0, 1)
        if img.shape[0] == 1:
            img = np.repeat(img, 3, axis=0)
        if image_size is not None and img.shape[-2:] != (image_size, image_size):
            raise ValueError(
                f"{path}: npy image is {img.shape[-2:]}, expected "
                f"({image_size}, {image_size}) — pre-size npy images")
        return img
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if image_size is not None and im.size != (image_size, image_size):
            w, h = im.size
            scale = image_size / min(w, h)
            nw, nh = max(image_size, round(w * scale)), max(image_size, round(h * scale))
            im = im.resize((nw, nh), Image.BICUBIC)
            left = (nw - image_size) // 2
            top = (nh - image_size) // 2
            im = im.crop((left, top, left + image_size, top + image_size))
        return np.asarray(im, np.uint8).transpose(2, 0, 1)


def image_caption_samples(root: str, *, captions_file: str = "captions.jsonl",
                          image_size: Optional[int] = 224,
                          ) -> Iterator[Dict[str, Any]]:
    """Yield {"target_text", "image"} samples from an on-disk dataset.

    Layout: a directory with a JSONL manifest (one
    ``{"image": relpath, "text": caption}`` object per line; ``caption`` /
    ``target_text`` and ``file`` / ``image_path`` accepted as aliases) next
    to the image files (png/jpg via PIL, or pre-sized ``.npy`` arrays).

    This is the on-disk image+caption path the reference lacks entirely —
    it trains its multimodal model on text-only C4/openwebtext
    (/root/reference/train.py:416-483, SURVEY.md §2.6.4).
    """
    manifest = os.path.join(root, captions_file)
    with open(manifest, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            text = rec.get("text") or rec.get("caption") or rec.get("target_text")
            img_rel = rec.get("image") or rec.get("file") or rec.get("image_path")
            if text is None or img_rel is None:
                raise ValueError(f"{manifest}: record missing text/image: {rec}")
            img_path = img_rel if os.path.isabs(img_rel) else os.path.join(root, img_rel)
            yield {"target_text": text,
                   "image": _load_image_file(img_path, image_size)}


def image_caption_batches(root: str, tokenizer, *, batch_size: int,
                          text_len: int,
                          captions_file: str = "captions.jsonl",
                          image_size: Optional[int] = None,
                          epochs: Optional[int] = 1,
                          ) -> Iterator[Dict[str, np.ndarray]]:
    """{text_tokens, images} training batches from an on-disk image+caption
    dataset (``image_caption_samples`` → ``multimodal_batches``).
    ``epochs=None`` loops forever (the Trainer bounds by steps)."""
    if image_size is None:
        image_size = getattr(tokenizer, "image_size", 224)
    epoch = 0
    while epochs is None or epoch < epochs:
        samples = image_caption_samples(root, captions_file=captions_file,
                                        image_size=image_size)
        yield from multimodal_batches(samples, tokenizer,
                                      batch_size=batch_size,
                                      text_len=text_len)
        epoch += 1


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


def _encode_doc(tokenizer, text: str) -> List[int]:
    if hasattr(tokenizer, "hf") and tokenizer.hf is not None:
        return tokenizer.hf(text)["input_ids"]
    if hasattr(tokenizer, "byte"):
        return tokenizer.byte.encode(text)
    return tokenizer.encode(text)


def text_file_stream(paths: Sequence[str], tokenizer) -> Iterator[List[int]]:
    """Tokenize documents (one per line) from text files."""
    for path in paths:
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                yield _encode_doc(tokenizer, line)


def hf_dataset_stream(name: str, tokenizer, *, split: str = "train",
                      text_key: str = "text", streaming: bool = True,
                      config: Optional[str] = None) -> Iterator[List[int]]:
    """On-the-fly tokenized documents from a Hugging Face dataset — the
    analog of the reference's ``build_dataloaders`` (GPT-NeoX tokenizer over
    ``openwebtext``, /root/reference/train.py:416-462). Feed the stream into
    :func:`packed_text_batches` for the concat-and-chunk packing the
    reference's ``group_texts`` does (:444-462).

    Requires the ``datasets`` package and either network access or a local
    dataset cache; import/availability errors surface eagerly."""
    try:
        from datasets import load_dataset  # type: ignore
    except Exception as e:  # pragma: no cover - environment without datasets
        raise ImportError(
            "hf_dataset_stream needs the `datasets` package (pip install "
            "datasets) and a reachable/cached dataset") from e
    ds = (load_dataset(name, config, split=split, streaming=streaming)
          if config is not None else
          load_dataset(name, split=split, streaming=streaming))
    for ex in ds:
        text = ex.get(text_key) if hasattr(ex, "get") else ex[text_key]
        if not text:
            continue
        yield _encode_doc(tokenizer, text)


def shard_stream(it: Iterable, index: int, count: int) -> Iterator:
    """Round-robin shard of a stream for multi-process training: process
    ``index`` of ``count`` keeps items ``i % count == index`` (the
    ``skip_first_batches``-compatible analog of a DistributedSampler)."""
    if not (0 <= index < count):
        raise ValueError(f"bad shard index {index} of {count}")
    for i, item in enumerate(it):
        if i % count == index:
            yield item


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


def preference_jsonl_batches(path: str, tokenizer, *, batch_size: int,
                             length: int,
                             epochs: Optional[int] = 1
                             ) -> Iterator[Dict[str, np.ndarray]]:
    """DPO preference batches from a JSONL file of
    ``{"prompt", "chosen", "rejected"}`` text rows — tokenized and collated
    via train/dpo.preference_batch (completion-masked weights). Attach the
    frozen reference's log-probs afterwards with
    ``train.dpo.compute_ref_logprobs``."""
    import json

    from kosmosx_tpu.train.dpo import preference_batch

    epoch = 0
    while epochs is None or epoch < epochs:
        epoch += 1
        prompts, chosen, rejected = [], [], []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                prompts.append(_encode_doc(tokenizer, row["prompt"]))
                chosen.append(_encode_doc(tokenizer, row["chosen"]))
                rejected.append(_encode_doc(tokenizer, row["rejected"]))
                if len(prompts) == batch_size:
                    yield preference_batch(prompts, chosen, rejected,
                                           length=length)
                    prompts, chosen, rejected = [], [], []
        # trailing partial batch dropped (static shapes)
