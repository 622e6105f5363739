"""Prefix caching in the serving engine (ServeEngine.register_prefix):
a registered prefix's KV cache is computed once and reused by every text
prompt that starts with it — greedy outputs must be identical to full
prefill in every engine mode (plain / chunked / speculative / int8 KV),
and the LRU must evict without breaking misses.

Beyond the reference (it ships no serving layer at all, SURVEY.md §1).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate import SamplingConfig, generate_text
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.serve import ServeConfig, ServeEngine

CFG = MagnetoConfig(vocab_size=97, embed_dim=64, ffn_dim=128, layers=2,
                    heads=4, max_positions=128, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0,
                    scan_layers=True)
PREFIX = [5, 11, 23, 42, 7, 9]


@pytest.fixture(scope="module")
def params():
    return dec.init_decoder(jax.random.PRNGKey(0), CFG)


def _shared_prompts(n, key=13):
    """Prompts sharing PREFIX plus one that doesn't."""
    out = []
    for i in range(n):
        lp = 2 + (i * 3) % 6
        tail = list(np.asarray(jax.random.randint(
            jax.random.PRNGKey(key + i), (lp,), 4, CFG.vocab_size), np.int64))
        out.append(PREFIX + tail)
    out.append([77, 3, 8, 15])  # no shared prefix (miss path)
    return out


def _refs(params, prompts, new):
    refs = []
    for p in prompts:
        r = generate_text(params, CFG, jnp.asarray([p], jnp.int32),
                          SamplingConfig(max_new_tokens=new, greedy=True))
        refs.append([int(t) for t in np.asarray(r[0])])
    return refs


def _run(params, prompts, new, scfg):
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True))
    eng.register_prefix(PREFIX)
    handles = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    return eng, handles


@pytest.mark.parametrize("scfg", [
    ServeConfig(max_batch=3, max_prompt_len=16, max_len=64),
    pytest.param(ServeConfig(max_batch=3, max_prompt_len=16, max_len=64,
                             sync_lag=2), marks=pytest.mark.slow),
    pytest.param(ServeConfig(max_batch=2, max_prompt_len=16, max_len=64,
                             prefill_chunk=4), marks=pytest.mark.slow),
], ids=["plain", "lagged", "chunked"])
def test_prefix_hits_match_full_prefill(params, scfg):
    prompts = _shared_prompts(4)
    new = 6
    refs = _refs(params, prompts, new)
    eng, handles = _run(params, prompts, new, scfg)
    assert eng.prefix_hits == len(prompts) - 1  # the last prompt misses
    for p, h, ref in zip(prompts, handles, refs):
        assert h.tokens == ref, f"prompt {p}: {h.tokens} vs {ref}"


@pytest.mark.slow
def test_prefix_with_int8_kv_cache(params):
    cfg8 = dataclasses.replace(CFG, kv_cache_dtype="int8")
    prompts = _shared_prompts(3)
    new = 5
    scfg = ServeConfig(max_batch=2, max_prompt_len=16, max_len=64)
    # reference = the SAME int8 engine without prefix registration (int8
    # quantization is lossy vs generate_text; the invariant is that the
    # prefix path changes nothing)
    ref_eng = ServeEngine(params, cfg8, scfg, SamplingConfig(greedy=True))
    ref_handles = [ref_eng.submit(p, max_new_tokens=new) for p in prompts]
    ref_eng.run()
    eng, handles = _run(params, prompts, new,
                        dataclasses.replace(scfg))
    del eng
    eng8 = ServeEngine(params, cfg8, scfg, SamplingConfig(greedy=True))
    eng8.register_prefix(PREFIX)
    handles8 = [eng8.submit(p, max_new_tokens=new) for p in prompts]
    eng8.run()
    for hr, h8 in zip(ref_handles, handles8):
        assert hr.tokens == h8.tokens


@pytest.mark.slow
def test_prefix_speculative_engine(params):
    draft_cfg = dataclasses.replace(CFG, layers=1)
    dparams = dec.init_decoder(jax.random.PRNGKey(3), draft_cfg)
    prompts = _shared_prompts(3)
    new = 6
    refs = _refs(params, prompts, new)
    scfg = ServeConfig(max_batch=2, max_prompt_len=16, max_len=64,
                       spec_gamma=2)
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True),
                      draft_params=dparams, draft_cfg=draft_cfg)
    eng.register_prefix(PREFIX)
    handles = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    for h, ref in zip(handles, refs):
        assert h.tokens == ref


def test_prefix_lru_eviction(params):
    scfg = ServeConfig(max_batch=2, max_prompt_len=16, max_len=64,
                       prefix_cache_size=1)
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True))
    eng.register_prefix(PREFIX)
    other = [9, 8, 7, 6]
    eng.register_prefix(other)           # evicts PREFIX
    assert len(eng.prefix_cache) == 1
    assert tuple(other) in eng.prefix_cache
    new = 5
    prompts = [PREFIX + [33, 44], other + [12, 13]]
    refs = _refs(params, prompts, new)
    handles = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    assert eng.prefix_hits == 1          # only the second prompt hits
    for h, ref in zip(handles, refs):
        assert h.tokens == ref


def test_prefix_validation(params):
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=2, max_prompt_len=8, max_len=64),
                      SamplingConfig(greedy=True))
    with pytest.raises(ValueError, match="empty"):
        eng.register_prefix([])
    with pytest.raises(ValueError, match="max_prompt_len"):
        eng.register_prefix(list(range(2, 10)))  # len 8 == max_prompt_len
    eng0 = ServeEngine(params, CFG,
                       ServeConfig(max_batch=2, max_prompt_len=8, max_len=64,
                                   prefix_cache_size=0),
                       SamplingConfig(greedy=True))
    with pytest.raises(ValueError, match="prefix_cache_size"):
        eng0.register_prefix(PREFIX)


@pytest.mark.parametrize("scfg", [
    ServeConfig(max_batch=3, max_prompt_len=16, max_len=64),
    pytest.param(ServeConfig(max_batch=3, max_prompt_len=16, max_len=64,
                             sync_lag=2, decode_block=2),
                 marks=pytest.mark.slow),
    pytest.param(ServeConfig(max_batch=2, max_prompt_len=16, max_len=64,
                             prefill_chunk=4), marks=pytest.mark.slow),
], ids=["plain", "lag_block", "chunked"])
def test_shared_prefix_matches_full_prefill(params, scfg):
    """register_prefix(share=True): matching slots attend ONE broadcast
    segment (no per-slot copy); greedy outputs identical to full prefill,
    including for non-matching prompts admitted into the same pool."""
    prompts = _shared_prompts(4)
    new = 6
    refs = _refs(params, prompts, new)
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True))
    eng.register_prefix(PREFIX, share=True)
    handles = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    assert eng.prefix_hits == len(prompts) - 1
    for p, h, ref in zip(prompts, handles, refs):
        assert h.tokens == ref, f"prompt {p}: {h.tokens} vs {ref}"


@pytest.mark.parametrize("share", [False, True], ids=["copy", "share"])
def test_suffix_bucket_boundaries(params, share):
    """Prefix-hit admission pads the suffix to a power-of-two bucket
    (admission._suffix_bucket) before the batch-1 suffix prefill — suffix
    lengths straddling bucket edges (3→8, 9→16, 17→32, 33→64) must all
    produce outputs identical to full prefill (pad positions past
    ``length`` carry seg=-1 and are masked out of attention and the
    boundary-logit slice)."""
    new = 4
    prompts = []
    for i, lt in enumerate([3, 9, 17, 33]):
        tail = list(np.asarray(jax.random.randint(
            jax.random.PRNGKey(31 + i), (lt,), 4, CFG.vocab_size), np.int64))
        prompts.append(PREFIX + tail)
    refs = _refs(params, prompts, new)
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=2, max_prompt_len=48,
                                  max_len=96),
                      SamplingConfig(greedy=True))
    eng.register_prefix(PREFIX, share=share)
    handles = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    assert eng.prefix_hits == len(prompts)
    for p, h, ref in zip(prompts, handles, refs):
        assert h.tokens == ref, f"prompt {p}: {h.tokens} vs {ref}"


def test_shared_prefix_shrinks_cache_budget(params):
    """The shared segment does not occupy per-slot cache: a max_len too
    small for prompt+new (but big enough for remainder+new) must serve
    matching prompts — the capacity win over copy-mode prefix caching."""
    new = 6
    prompt = PREFIX + [30, 31]          # 8 tokens; remainder = 2
    # async_drain off: this test sizes max_len EXACTLY (remainder + new
    # with zero overrun headroom) to prove the budget accounting, and the
    # default async reader widens overrun_window
    small = ServeConfig(max_batch=2, max_prompt_len=16,
                        max_len=2 + new,  # < len(prompt) + new
                        async_drain=False)
    eng = ServeEngine(params, CFG, small, SamplingConfig(greedy=True))
    eng.register_prefix(PREFIX, share=True)
    ref = _refs(params, [prompt], new)[0]
    h = eng.submit(prompt, max_new_tokens=new)
    eng.run()
    assert h.tokens == ref
    # without the shared segment the same submit must be rejected
    eng2 = ServeEngine(params, CFG, small, SamplingConfig(greedy=True))
    with pytest.raises(ValueError, match="exceeds"):
        eng2.submit(prompt, max_new_tokens=new)


@pytest.mark.slow
def test_shared_prefix_int8_kv(params):
    """Shared segment (bf16, exact) over an int8 own-cache pool."""
    cfg8 = dataclasses.replace(CFG, kv_cache_dtype="int8")
    prompts = _shared_prompts(3)
    new = 5
    refs = _refs(params, prompts, new)
    eng = ServeEngine(params, cfg8,
                      ServeConfig(max_batch=2, max_prompt_len=16, max_len=64),
                      SamplingConfig(greedy=True))
    eng.register_prefix(PREFIX, share=True)
    handles = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    for h, ref in zip(handles, refs):
        assert h.tokens == ref


def test_shared_prefix_guards(params):
    scfg = ServeConfig(max_batch=2, max_prompt_len=16, max_len=64)
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True))
    eng.submit(PREFIX + [3], max_new_tokens=4)
    with pytest.raises(ValueError, match="idle"):
        eng.register_prefix(PREFIX, share=True)
    eng.run()
    eng.register_prefix(PREFIX, share=True)  # idle now: ok


def test_shared_prefix_speculative_engine(params):
    """Shared-prefix attention composes with speculation: target AND draft
    pools each attend their own broadcast segment; greedy outputs equal
    full prefill for hits and misses alike."""
    draft_cfg = dataclasses.replace(CFG, layers=1)
    dparams = dec.init_decoder(jax.random.PRNGKey(3), draft_cfg)
    prompts = _shared_prompts(3)
    new = 6
    refs = _refs(params, prompts, new)
    scfg = ServeConfig(max_batch=2, max_prompt_len=16, max_len=64,
                       spec_gamma=2)
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True),
                      draft_params=dparams, draft_cfg=draft_cfg)
    eng.register_prefix(PREFIX, share=True)
    handles = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    assert eng.prefix_hits == len(prompts) - 1
    for p, h, ref in zip(prompts, handles, refs):
        assert h.tokens == ref, (p, h.tokens, ref)


def test_shared_and_copy_prefixes_compose(params):
    """A shared segment and a different copy-mode prefix serve one pool."""
    other = [9, 8, 7, 6]
    scfg = ServeConfig(max_batch=2, max_prompt_len=16, max_len=64)
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True))
    eng.register_prefix(PREFIX, share=True)
    eng.register_prefix(other)           # copy mode
    new = 5
    prompts = [PREFIX + [33, 44], other + [12, 13], [50, 51, 52]]
    refs = _refs(params, prompts, new)
    handles = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    assert eng.prefix_hits == 2
    for h, ref in zip(handles, refs):
        assert h.tokens == ref


def test_longest_prefix_wins(params):
    """With nested registered prefixes, the longest match is used."""
    scfg = ServeConfig(max_batch=2, max_prompt_len=16, max_len=64)
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True))
    eng.register_prefix(PREFIX[:3])
    eng.register_prefix(PREFIX)
    prompt = PREFIX + [50, 51]
    new = 5
    ref = _refs(params, [prompt], new)[0]
    h = eng.submit(prompt, max_new_tokens=new)
    eng.run()
    assert h.tokens == ref
    assert eng.prefix_hits == 1
