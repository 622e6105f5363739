"""KosmosTokenizer — text + image preprocessing with <image> tag splicing.

API-parity target: the reference ``KosmosTokenizer``
(/root/reference/kosmosx/model.py:23-129):

- ``tokenize_texts(texts) -> (spliced_ids, raw_ids)`` where spliced ids have
  ``[<image>, </image>]`` inserted right after BOS
  (/root/reference/kosmosx/model.py:71-77), so the model's embedding splice at
  index 2 lands the 64 image embeddings *between* the tag tokens;
- ``tokenize_images(images) -> pixel_values`` (CLIP resize/normalize — done
  device-side here, data/images.py, instead of host PIL);
- ``tokenize(sample) -> {text_tokens, images, labels, attention_mask}``.

Fixed vs reference: the reference builds its attention mask by *prepending*
64 ones (/root/reference/kosmosx/model.py:116-120) although the model splices
at position 2, and then never consumes the mask (SURVEY.md §3.4). We emit the
mask aligned to the true spliced layout and the model actually applies it
(``use_padding_mask``).

Tokenizer backends: HF ``AutoTokenizer`` (GPT-NeoX-20B like the reference at
/root/reference/kosmosx/model.py:39-46) when available/cached; otherwise a
self-contained byte-level tokenizer (zero-egress environments) with the same
special-token layout. Both use fairseq-style ids: bos=0, pad=1, eos=2.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

logger = logging.getLogger(__name__)


class ByteTokenizer:
    """Deterministic byte-level fallback tokenizer (no downloads).

    Layout: bos=0, pad=1, eos=2, unk=3, bytes 4..259, then special tokens.
    """

    def __init__(self, extra_special_tokens: Sequence[str] = ()):
        self.bos_token_id = 0
        self.pad_token_id = 1
        self.eos_token_id = 2
        self.unk_token_id = 3
        self._byte_offset = 4
        self._specials: Dict[str, int] = {}
        for tok in extra_special_tokens:
            self.add_special_token(tok)

    def add_special_token(self, tok: str) -> int:
        if tok not in self._specials:
            self._specials[tok] = self._byte_offset + 256 + len(self._specials)
        return self._specials[tok]

    def convert_tokens_to_ids(self, tok: str) -> int:
        return self._specials.get(tok, self.unk_token_id)

    @property
    def vocab_size(self) -> int:
        return self._byte_offset + 256 + len(self._specials)

    def encode(self, text: str, *, add_bos: bool = True,
               add_eos: bool = False) -> List[int]:
        ids = [self._byte_offset + b for b in text.encode("utf-8")]
        if add_bos:
            ids = [self.bos_token_id] + ids
        if add_eos:
            ids = ids + [self.eos_token_id]
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        inv = {v: k for k, v in self._specials.items()}
        out: List[Any] = []
        byte_buf: List[int] = []

        def flush():
            if byte_buf:
                out.append(bytes(byte_buf).decode("utf-8", errors="replace"))
                byte_buf.clear()

        for i in ids:
            i = int(i)
            if self._byte_offset <= i < self._byte_offset + 256:
                byte_buf.append(i - self._byte_offset)
            elif i in inv:
                flush()
                out.append(inv[i])
            # bos/pad/eos/unk are dropped
        flush()
        return "".join(out)


def _try_hf_tokenizer(name: str, extra_ids: int, model_max_length: int):
    """Resolve ``name`` to a HF tokenizer. Accepts, in order:

    - a LOCAL ``tokenizer.json`` file (the artifact the reference's
      GPT-NeoX-20B tokenizer ships as) -> PreTrainedTokenizerFast;
    - a LOCAL directory holding tokenizer files -> AutoTokenizer;
    - a hub name -> AutoTokenizer (fails under zero egress -> byte fallback).
    """
    import os

    try:
        if os.path.isfile(name) and name.endswith(".json"):
            from transformers import PreTrainedTokenizerFast

            return PreTrainedTokenizerFast(
                tokenizer_file=name, model_max_length=model_max_length)
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(
            name,
            additional_special_tokens=[f"<extra_id_{i}>" for i in range(extra_ids)],
            extra_ids=0,
            model_max_length=model_max_length,
        )
        return tok
    except Exception as e:  # zero-egress / not cached
        logger.info("HF tokenizer %r unavailable (%s); using byte fallback",
                    name, type(e).__name__)
        return None


class KosmosTokenizer:
    """Multimodal preprocessing (reference /root/reference/kosmosx/model.py:23-129)."""

    IMAGE_TOKEN = "<image>"
    IMAGE_END_TOKEN = "</image>"
    # the full multimodal tag set of the experimental zoo
    # (/root/reference/experimental/model/video/kosmos_video.py:27-39 uses 6;
    # allModalities/kosmos.py:148-162 adds <any></any> for 8)
    MODALITY_TAGS = {
        "image": ("<image>", "</image>"),
        "audio": ("<audio>", "</audio>"),
        "video": ("<video>", "</video>"),
        "any": ("<any>", "</any>"),
    }

    def __init__(self,
                 tokenizer_name: str = "EleutherAI/gpt-neox-20b",
                 model_max_length: int = 8192,
                 image_size: int = 224,
                 image_embed_len: int = 64,
                 modalities: Sequence[str] = ("image",),
                 use_hf: bool = True):
        self.image_size = image_size
        self.image_embed_len = image_embed_len
        self.modalities = tuple(modalities)
        tags: List[str] = []
        for m in self.modalities:
            tags.extend(self.MODALITY_TAGS[m])
        self.hf = _try_hf_tokenizer(tokenizer_name, 0, model_max_length) if use_hf else None
        if self.hf is not None:
            self.hf.add_tokens(tags)
            self._tag_ids = {t: self.hf.convert_tokens_to_ids(t) for t in tags}
            # explicit None checks: GPT-NeoX's eos is id 0, which a falsy
            # `or`-fallback would silently remap; tokenizers without a pad
            # token (NeoX again) get eos as pad so padding=True works
            if self.hf.pad_token_id is None:
                if self.hf.eos_token is not None:
                    self.hf.pad_token = self.hf.eos_token
                else:
                    self.hf.add_special_tokens({"pad_token": "<|pad|>"})
            self.pad_token_id = self.hf.pad_token_id
            bos = getattr(self.hf, "bos_token_id", None)
            self.bos_token_id = bos if bos is not None else 0
            eos = getattr(self.hf, "eos_token_id", None)
            self.eos_token_id = eos if eos is not None else 2
            self.vocab_size = len(self.hf)
        else:
            self.byte = ByteTokenizer(tags)
            self._tag_ids = {t: self.byte.convert_tokens_to_ids(t) for t in tags}
            self.pad_token_id = self.byte.pad_token_id
            self.bos_token_id = self.byte.bos_token_id
            self.eos_token_id = self.byte.eos_token_id
            self.vocab_size = self.byte.vocab_size
        self.im_idx = self._tag_ids.get(self.IMAGE_TOKEN)
        self.im_end_idx = self._tag_ids.get(self.IMAGE_END_TOKEN)
        self.model_max_length = model_max_length

    # -- text ---------------------------------------------------------------
    def _encode_batch(self, texts: Sequence[str], max_length: Optional[int]):
        if self.hf is not None:
            enc = self.hf(list(texts), return_tensors="np", padding=True,
                          truncation=True,
                          max_length=max_length or self.model_max_length)
            ids = enc["input_ids"].astype(np.int32)
            # ensure a BOS at position 0 (NeoX tokenizer has no auto-BOS)
            if ids.shape[1] == 0 or not np.all(ids[:, 0] == self.bos_token_id):
                bos = np.full((ids.shape[0], 1), self.bos_token_id, np.int32)
                ids = np.concatenate([bos, ids], axis=1)
            return ids
        encoded = [self.byte.encode(t) for t in texts]
        cap = max_length or self.model_max_length
        encoded = [e[:cap] for e in encoded]
        longest = max(len(e) for e in encoded)
        out = np.full((len(encoded), longest), self.pad_token_id, np.int32)
        for i, e in enumerate(encoded):
            out[i, :len(e)] = e
        return out

    def tokenize_texts(self, texts: Union[str, Sequence[str]],
                       max_length: Optional[int] = None,
                       modalities: Optional[Sequence[str]] = None):
        """-> (spliced_ids (B, L+2*M), raw_ids (B, L)): one ``<tag></tag>``
        pair per modality inserted after BOS
        (/root/reference/kosmosx/model.py:71-77 for the image pair;
        kosmos_video.py:27-39 style for multiple modalities)."""
        if isinstance(texts, str):
            texts = [texts]
        raw = self._encode_batch(texts, max_length)
        b = raw.shape[0]
        modalities = modalities if modalities is not None else self.modalities
        tag_row: List[int] = []
        for m in modalities:
            open_t, close_t = self.MODALITY_TAGS[m]
            tag_row += [self._tag_ids[open_t], self._tag_ids[close_t]]
        tags = np.tile(np.array([tag_row], np.int32), (b, 1))
        spliced = np.concatenate([raw[:, :1], tags, raw[:, 1:]], axis=1)
        return spliced, raw

    # -- images ---------------------------------------------------------------
    def tokenize_images(self, images):
        """(B, 3, H, W) uint8/float -> CLIP-normalized pixel_values
        (B, 3, image_size, image_size). Device-side."""
        from kosmosx_tpu.data.images import preprocess_images
        import jax.numpy as jnp

        return preprocess_images(jnp.asarray(images), image_size=self.image_size)

    # -- sample assembly ------------------------------------------------------
    def tokenize(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        """{"target_text", "image"} -> {text_tokens, images, labels,
        attention_mask}. The mask follows the true spliced layout:
        [BOS, <image>, 64 image positions, </image>, text..., pad...]
        (fixing /root/reference/kosmosx/model.py:116-120, SURVEY.md §3.4)."""
        text_tokens, raw = self.tokenize_texts(sample["target_text"])
        b, l = text_tokens.shape
        k = self.image_embed_len
        text_mask = (text_tokens != self.pad_token_id)
        # spliced layout: positions 0..1 then K image slots then the rest
        attention_mask = np.concatenate(
            [text_mask[:, :2], np.ones((b, k), bool), text_mask[:, 2:]], axis=1)
        return {
            "text_tokens": text_tokens,
            "images": self.tokenize_images(sample["image"]),
            "labels": raw,
            "attention_mask": attention_mask.astype(np.int32),
        }

    def decode(self, ids) -> str:
        if self.hf is not None:
            return self.hf.decode([int(i) for i in np.asarray(ids).reshape(-1)
                                   if int(i) != self.pad_token_id],
                                  skip_special_tokens=False)
        return self.byte.decode(np.asarray(ids).reshape(-1))
