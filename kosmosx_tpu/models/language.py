"""KosmosLanguage — text-only Magneto decoder model.

API-parity target: the reference ``KosmosLanguage`` class
(/root/reference/kosmosx/model.py:256-320): fully parameterized ctor,
``forward(x: (B, L) int tokens) -> logits (B, L, vocab_size)`` with a single
embed-scale application (+ learned positions), decode, untied output
projection. The reference's ``alibi_pos_bias``/``alibi_num_heads`` kwargs are
accepted-and-ignored here exactly as they are there (they are not torchscale
DecoderConfig options — defect ledger SURVEY.md §2.6.11; xPos is the effective
positional scheme).

Structure: a frozen ``MagnetoConfig`` + a functional param pytree. The class
is a thin convenience wrapper — ``init`` / ``apply`` are static and pure so
they compose with pjit/shard_map; ``__call__`` jits on first use.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec


class KosmosLanguage:
    """Text-only decoder LM (reference /root/reference/kosmosx/model.py:256-320)."""

    def __init__(self,
                 vocab_size: int = 64007,
                 dim: int = 2048,
                 depth: int = 24,
                 ffn_dim: int = 8192,
                 dropout: float = 0.1,
                 multiway: bool = True,
                 decoder_heads: int = 32,
                 activation_fn: str = "gelu",
                 subln: bool = True,
                 alibi_pos_bias: bool = True,   # accepted, dead (SURVEY §2.6.11)
                 alibi_num_heads: int = 16,     # accepted, dead
                 xpos_rel_pos: bool = True,
                 max_rel_pos: int = 2048,
                 *,
                 config: Optional[MagnetoConfig] = None,
                 seed: int = 0,
                 compute_dtype: str = "float32",
                 use_flash_attention: bool = True,
                 scan_layers: bool = False,
                 params=None):
        del alibi_pos_bias, alibi_num_heads
        if config is None:
            config = MagnetoConfig(
                vocab_size=vocab_size, embed_dim=dim, layers=depth,
                ffn_dim=ffn_dim, dropout=dropout, multiway=multiway,
                heads=decoder_heads, activation=activation_fn, subln=subln,
                xpos_rel_pos=xpos_rel_pos, max_positions=max_rel_pos,
                compute_dtype=compute_dtype,
                use_flash_attention=use_flash_attention,
                scan_layers=scan_layers)
        self.config = config
        self.params = (params if params is not None
                       else self.init(jax.random.PRNGKey(seed), config))
        self._jit_apply = None

    # -- pure functional surface ------------------------------------------
    @staticmethod
    def init(key, config: MagnetoConfig):
        return dec.init_decoder(key, config)

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("config", "interpret"))
    def apply(params, tokens, config: MagnetoConfig, *,
              segment_ids=None, rng=None, interpret: bool = False):
        return dec.decoder_forward(params, tokens, config,
                                   segment_ids=segment_ids, rng=rng,
                                   interpret=interpret)

    # -- torch-like convenience --------------------------------------------
    def __call__(self, tokens, **kw):
        tokens = jnp.asarray(tokens)
        return self.apply(self.params, tokens, self.config, **kw)

    forward = __call__

    @property
    def num_params(self) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(self.params))
