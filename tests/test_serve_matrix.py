"""Serving mode-compatibility matrix (VERDICT round-2 item 7).

The engine composes ten orthogonal modes. This test enumerates every mode
singleton and pair, table-driven from serve/config.UNSUPPORTED_MODE_PAIRS:

- SUPPORTED combos must produce greedy tokens identical to the one-shot
  ``generate_text`` path run with the same numerics (same params variant,
  same cache dtype/window) — the engine's batching/admission machinery must
  never change results;
- UNSUPPORTED combos must raise NotImplementedError at the request-shaping
  stage (construction / load_adapter / submit) — never mid-flight.

A fast subset runs in the default tier; the full enumeration is slow-marked.
The reference has no serving layer at all (SURVEY.md §1), so this matrix is
this framework's own contract.
"""

import dataclasses
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate import SamplingConfig, generate_text
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.serve import ServeConfig, ServeEngine
from kosmosx_tpu.serve.config import unsupported_reason
from kosmosx_tpu.train.lora import add_lora, attach_lora, strip_lora
from kosmosx_tpu.utils.quantize import quantize_params_w8

CFG = MagnetoConfig(vocab_size=97, embed_dim=64, ffn_dim=128, layers=2,
                    heads=4, max_positions=128, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0,
                    scan_layers=True)
NEW = 6
MODES = ("blocked", "chunked", "kv_window", "spec", "kv8", "w8",
         "prefix_copy", "prefix_share", "adapter", "sampling_override")
# default-tier subset: every unsupported pair (cheap raises) + one
# representative supported pair per machinery family
FAST = {
    ("kv_window", "spec"), ("chunked", "spec"), ("spec", "adapter"),
    ("spec", "sampling_override"),
    ("blocked", "chunked"), ("kv_window", "prefix_share"),
    ("w8", "adapter"), ("kv8", "prefix_copy"),
}


def _toks(key, n):
    return [int(t) for t in np.asarray(jax.random.randint(
        jax.random.PRNGKey(key), (n,), 4, CFG.vocab_size))]


PREF_A = _toks(101, 6)   # shared-segment prefix
PREF_B = _toks(102, 6)   # copy-mode prefix


@pytest.fixture(scope="module")
def base_params():
    return dec.init_decoder(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def adapter_tree(base_params):
    key = jax.random.PRNGKey(9)
    tree = strip_lora(add_lora(key, base_params, rank=3))[1]

    def randomize(path, x):
        last = None
        for p in path:
            if hasattr(p, "key"):
                last = p.key
        if last in ("a", "b"):
            k = jax.random.fold_in(key, len(jax.tree_util.keystr(path)))
            return jax.random.normal(k, x.shape, x.dtype) * 0.1
        return x

    return jax.tree_util.tree_map_with_path(randomize, tree)


def _build_requests(modes):
    """Two requests exercising the request-scoped modes of ``modes``."""
    reqs = []
    for i, suffix_key in enumerate((7, 8)):
        prompt = _toks(suffix_key, 3 + 2 * i)
        kind = "base"
        if "prefix_share" in modes and ("prefix_copy" not in modes or i == 0):
            prompt = PREF_A + prompt
        elif "prefix_copy" in modes:
            prompt = PREF_B + prompt
        kw = {}
        if "adapter" in modes and i == 1:
            kw["adapter"] = "t1"
            kind = "adapter"
        if "sampling_override" in modes and i == 1:
            kw["temperature"] = 0.0   # greedy via the rows sampler path
        reqs.append((prompt, kw, kind))
    return reqs


def _run_scenario(modes, base_params, adapter_tree, dispatched):
    cfg = dataclasses.replace(
        CFG,
        kv_cache_dtype="int8" if "kv8" in modes else None,
        kv_window=32 if "kv_window" in modes else 0, kv_sink=2)
    pv = (jax.jit(quantize_params_w8)(base_params) if "w8" in modes
          else base_params)
    draft_params = draft_cfg = None
    if "spec" in modes:
        draft_cfg = dataclasses.replace(cfg, layers=1)
        draft_params = dec.init_decoder(jax.random.PRNGKey(5), draft_cfg)
    scfg = ServeConfig(
        max_batch=2, max_prompt_len=12, max_len=48,
        decode_block=2 if "blocked" in modes else 0,
        prefill_chunk=4 if "chunked" in modes else 0,
        spec_gamma=2 if "spec" in modes else 0)
    eng = ServeEngine(pv, cfg, scfg, SamplingConfig(greedy=True),
                      draft_params=draft_params, draft_cfg=draft_cfg)
    if "adapter" in modes:
        eng.load_adapter("t1", adapter_tree)
    if "prefix_share" in modes:
        eng.register_prefix(PREF_A, share=True)
    if "prefix_copy" in modes:
        eng.register_prefix(PREF_B)
    reqs = _build_requests(modes)
    handles = [eng.submit(p, max_new_tokens=NEW, **kw)
               for p, kw, _ in reqs]
    # ---- past this point, nothing may raise (matrix contract) ----
    dispatched.append(True)
    eng.run()
    assert all(h.done for h in handles)
    # reference: the one-shot path with the SAME numerics per request
    ref_params = {"base": pv, "adapter": attach_lora(pv, adapter_tree)
                  if "adapter" in modes else None}
    for (p, _, kind), h in zip(reqs, handles):
        ref = generate_text(ref_params[kind], cfg,
                            jnp.asarray([p], jnp.int32),
                            SamplingConfig(max_new_tokens=NEW, greedy=True))
        assert h.tokens == [int(t) for t in np.asarray(ref[0])], (
            f"{'+'.join(modes)}: engine {h.tokens} vs one-shot "
            f"{[int(t) for t in np.asarray(ref[0])]} (kind={kind})")


def _cases():
    cases = [(m,) for m in MODES] + list(combinations(MODES, 2))
    out = []
    for modes in cases:
        fast = modes in FAST or tuple(reversed(modes)) in FAST
        marks = () if fast else (pytest.mark.slow,)
        out.append(pytest.param(modes, id="+".join(modes), marks=marks))
    return out


@pytest.mark.parametrize("modes", _cases())
def test_mode_matrix(modes, base_params, adapter_tree, devices):
    reason = unsupported_reason(*modes)
    dispatched = []
    if reason is not None:
        with pytest.raises(NotImplementedError):
            _run_scenario(modes, base_params, adapter_tree, dispatched)
        assert not dispatched, (
            f"{'+'.join(modes)} raised mid-flight; the matrix contract is "
            f"raise-at-construction/submit")
    else:
        _run_scenario(modes, base_params, adapter_tree, dispatched)
