"""Multi-LoRA serving (serve/engine.py load_adapter / submit(adapter=...)):
every slot decodes through its own adapter factors grafted per-row into the
shared base. Greedy outputs must equal a dedicated engine whose base params
have that adapter attached; base requests in the same pool stay bit-exact.

S-LoRA-style multi-tenant serving, absent upstream (no serving layer at all,
SURVEY.md §1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate import SamplingConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.serve import ServeConfig, ServeEngine
from kosmosx_tpu.train.lora import add_lora, attach_lora, strip_lora

CFG = MagnetoConfig(vocab_size=97, embed_dim=64, ffn_dim=128, layers=2,
                    heads=4, max_positions=128, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0,
                    scan_layers=True)


@pytest.fixture(scope="module")
def params():
    return dec.init_decoder(jax.random.PRNGKey(0), CFG)


def _adapter(params, seed, scale=0.1):
    """Random non-trivial adapter factors (b nonzero so outputs change)."""
    key = jax.random.PRNGKey(seed)
    tree = strip_lora(add_lora(key, params, rank=3))[1]

    def randomize(path, x):
        last = None
        for p in path:
            if hasattr(p, "key"):
                last = p.key
        if last in ("a", "b"):
            k = jax.random.fold_in(key, len(jax.tree_util.keystr(path)))
            return jax.random.normal(k, x.shape, x.dtype) * scale
        return x

    return jax.tree_util.tree_map_with_path(randomize, tree)


def _run_engine(base, scfg, prompts_and_adapters, new, adapters=None):
    eng = ServeEngine(base, CFG, scfg, SamplingConfig(greedy=True))
    for name, tree in (adapters or {}).items():
        eng.load_adapter(name, tree)
    handles = [eng.submit(p, max_new_tokens=new, adapter=a)
               for p, a in prompts_and_adapters]
    eng.run()
    return [h.tokens for h in handles]


def _prompts(n, key=7):
    out = []
    for i in range(n):
        lp = 3 + (i * 5) % 7
        out.append(list(np.asarray(jax.random.randint(
            jax.random.PRNGKey(key + i), (lp,), 4, CFG.vocab_size),
            np.int64)))
    return out


@pytest.mark.parametrize("scfg", [
    ServeConfig(max_batch=3, max_prompt_len=16, max_len=48),
    pytest.param(ServeConfig(max_batch=2, max_prompt_len=16, max_len=48,
                             sync_lag=2), marks=pytest.mark.slow),
    pytest.param(ServeConfig(max_batch=2, max_prompt_len=16, max_len=48,
                             prefill_chunk=4), marks=pytest.mark.slow),
], ids=["plain", "lagged", "chunked"])
def test_per_slot_adapters_match_dedicated_engines(params, scfg):
    a_tree = _adapter(params, seed=11)
    b_tree = _adapter(params, seed=22)
    prompts = _prompts(4)
    work = [(prompts[0], "A"), (prompts[1], "B"), (prompts[2], None),
            (prompts[3], "A")]
    new = 6
    got = _run_engine(params, scfg, work, new,
                      adapters={"A": a_tree, "B": b_tree})

    # references: dedicated engines with the adapter folded into the base
    refs = {}
    for name, tree in (("A", a_tree), ("B", b_tree), (None, None)):
        base = params if tree is None else attach_lora(params, tree)
        for p, a in work:
            if a == name:
                refs[(tuple(p), a)] = _run_engine(
                    base, ServeConfig(max_batch=1, max_prompt_len=16,
                                      max_len=48), [(p, None)], new)[0]
    for (p, a), toks in zip(work, got):
        assert toks == refs[(tuple(p), a)], (a, p, toks)


def test_adapter_changes_output(params):
    """Sanity: a non-trivial adapter actually changes greedy decode."""
    a_tree = _adapter(params, seed=33, scale=0.5)
    p = _prompts(1)[0]
    scfg = ServeConfig(max_batch=1, max_prompt_len=16, max_len=48)
    base_toks = _run_engine(params, scfg, [(p, None)], 8)[0]
    lora_toks = _run_engine(params, scfg, [(p, "A")], 8,
                            adapters={"A": a_tree})[0]
    assert base_toks != lora_toks


def test_adapter_guards(params):
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=2, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    with pytest.raises(KeyError, match="unknown adapter"):
        eng.submit([5, 6, 7], adapter="nope")
    with pytest.raises(ValueError, match="no adapter factors"):
        eng.load_adapter("empty", {})


@pytest.mark.slow
def test_adapter_slot_reuse_resets_factors(params):
    """A base request admitted into a slot previously used by an adapter
    request must decode with ZERO factors (slot stacks are re-zeroed)."""
    a_tree = _adapter(params, seed=44, scale=0.5)
    p = _prompts(2, key=50)
    scfg = ServeConfig(max_batch=1, max_prompt_len=16, max_len=48)
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True))
    eng.load_adapter("A", a_tree)
    h1 = eng.submit(p[0], max_new_tokens=5, adapter="A")
    eng.run()
    h2 = eng.submit(p[1], max_new_tokens=5)     # same slot, no adapter
    eng.run()
    ref = _run_engine(params, scfg, [(p[1], None)], 5)[0]
    assert h2.tokens == ref


def test_adapter_requests_do_not_use_shared_prefix_budget(params):
    """An adapter request matching the shared prefix stores its WHOLE
    prompt in its own cache (the shared segment holds base-model KV), so
    submit() must reject it when only the remainder would fit — and serve
    it correctly when max_len covers the full prompt."""
    prefix = [5, 11, 23, 42, 7, 9]
    prompt = prefix + [30, 31]
    new = 5
    a_tree = _adapter(params, seed=55)
    # async_drain off: max_len is sized EXACTLY (remainder + new, zero
    # overrun headroom) and the default async reader widens overrun_window
    small = ServeConfig(max_batch=2, max_prompt_len=16, max_len=2 + new,
                        async_drain=False)
    eng = ServeEngine(params, CFG, small, SamplingConfig(greedy=True))
    eng.register_prefix(prefix, share=True)
    eng.load_adapter("A", a_tree)
    eng.submit(prompt, max_new_tokens=new)  # base request: remainder fits
    with pytest.raises(ValueError, match="exceeds"):
        eng.submit(prompt, max_new_tokens=new, adapter="A")

    big = ServeConfig(max_batch=2, max_prompt_len=16, max_len=32)
    eng2 = ServeEngine(params, CFG, big, SamplingConfig(greedy=True))
    eng2.register_prefix(prefix, share=True)
    eng2.load_adapter("A", a_tree)
    h = eng2.submit(prompt, max_new_tokens=new, adapter="A")
    eng2.run()
    ref = _run_engine(attach_lora(params, a_tree),
                      ServeConfig(max_batch=1, max_prompt_len=16,
                                  max_len=32), [(prompt, None)], new)[0]
    assert h.tokens == ref
