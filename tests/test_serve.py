"""Continuous-batching serving engine (kosmosx_tpu/serve/engine.py).

The reference has no serving layer (SURVEY.md §1); these tests pin the
engine's contract: greedy outputs identical to the one-shot generate_text
path, slot reuse under overload, EOS + budget stopping, ragged prompts,
and multimodal admission.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                     ResamplerConfig, VisionConfig)
from kosmosx_tpu.generate import SamplingConfig, generate_text
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.serve import ServeConfig, ServeEngine

CFG = MagnetoConfig(vocab_size=97, embed_dim=64, ffn_dim=128, layers=2,
                    heads=4, max_positions=128, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0,
                    scan_layers=True)


@pytest.fixture(scope="module")
def params():
    return dec.init_decoder(jax.random.PRNGKey(0), CFG)


def _prompts(n, key=7):
    out = []
    for i in range(n):
        lp = 3 + (i * 5) % 9
        out.append(list(np.asarray(
            jax.random.randint(jax.random.PRNGKey(key + i), (lp,), 4,
                               CFG.vocab_size), np.int64)))
    return out


@pytest.mark.slow
def test_engine_matches_one_shot_greedy(params):
    prompts = _prompts(5)
    new = 6
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=3, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    handles = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    for p, h in zip(prompts, handles):
        assert h.done and len(h.tokens) == new
        ref = generate_text(params, CFG, jnp.asarray([p], jnp.int32),
                            SamplingConfig(max_new_tokens=new, greedy=True))
        assert h.tokens == [int(t) for t in np.asarray(ref[0])], (
            f"prompt {p}: engine {h.tokens} vs one-shot {list(ref[0])}")


def test_engine_staggered_admission(params):
    """Submitting mid-flight must not disturb in-progress slots."""
    prompts = _prompts(4, key=31)
    new = 8
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=2, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    h0 = eng.submit(prompts[0], max_new_tokens=new)
    h1 = eng.submit(prompts[1], max_new_tokens=new)
    for _ in range(3):
        eng.step()
    h2 = eng.submit(prompts[2], max_new_tokens=new)
    h3 = eng.submit(prompts[3], max_new_tokens=new)
    eng.run()
    for p, h in zip(prompts, (h0, h1, h2, h3)):
        ref = generate_text(params, CFG, jnp.asarray([p], jnp.int32),
                            SamplingConfig(max_new_tokens=new, greedy=True))
        assert h.tokens == [int(t) for t in np.asarray(ref[0])]


@pytest.mark.parametrize("slots,n,lag", [(4, 4, 0), (8, 7, 2), (8, 8, 0),
                                         (3, 5, 1)])
def test_engine_batched_admission_matches_one_shot(params, slots, n, lag):
    """Filling several free slots in one step routes through the pooled
    batched-admission prefill (one dispatch per power-of-two bucket; a
    leftover single uses the batch-1 program). Greedy outputs, logprob
    presence, and slot bookkeeping must be identical to one-shot
    generation — across batch sizes that exercise the 4-, 2-, and 1-row
    buckets and both the sync and lagged commit paths."""
    prompts = _prompts(n, key=61)
    new = 6
    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_batch=slots, max_prompt_len=16, max_len=64,
                    sync_lag=lag),
        SamplingConfig(greedy=True))
    hs = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    for p, h in zip(prompts, hs):
        ref = generate_text(params, CFG, jnp.asarray([p], jnp.int32),
                            SamplingConfig(max_new_tokens=new, greedy=True))
        assert h.done
        assert h.tokens == [int(t) for t in np.asarray(ref[0])]
        assert len(h.logprobs) == len(h.tokens)


def test_engine_eos_stops_early(params):
    p = _prompts(1)[0]
    ref = generate_text(params, CFG, jnp.asarray([p], jnp.int32),
                        SamplingConfig(max_new_tokens=8, greedy=True))
    eos = int(ref[0, 3])  # the 4th greedy token, so it stops after 4
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=2, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    h = eng.submit(p, max_new_tokens=8, eos_id=eos)
    eng.run()
    assert h.done
    assert h.tokens[-1] == eos
    assert len(h.tokens) <= 4


def test_engine_rejects_oversize(params):
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=1, max_prompt_len=8, max_len=16))
    with pytest.raises(ValueError):
        eng.submit(list(range(4, 14)))         # prompt too long
    with pytest.raises(ValueError):
        eng.submit([5, 6], max_new_tokens=32)  # exceeds cache length
    with pytest.raises(ValueError):
        eng.submit([])


def test_engine_multimodal_admission(devices):
    kcfg = KosmosConfig(
        decoder=dataclasses.replace(CFG, vocab_size=128),
        vision=VisionConfig(image_size=28, patch_size=14, layers=1,
                            hidden_dim=32, heads=2, mlp_dim=64,
                            use_flash_attention=False),
        resampler=ResamplerConfig(dim=32, depth=1, dim_head=8, heads=2,
                                  num_latents=4, num_media_embeds=5),
        image_embed_len=4)
    from kosmosx_tpu.models.kosmos import Kosmos

    params = Kosmos.init(jax.random.PRNGKey(0), kcfg)
    eng = ServeEngine(params, kcfg.decoder,
                      ServeConfig(max_batch=2, max_prompt_len=12, max_len=48),
                      SamplingConfig(greedy=True), kosmos_cfg=kcfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    h_mm = eng.submit([3, 17, 9, 11], max_new_tokens=5, images=img)
    h_txt = eng.submit([4, 8, 15], max_new_tokens=5)
    eng.run()
    assert h_mm.done and len(h_mm.tokens) == 5
    assert h_txt.done and len(h_txt.tokens) == 5
    # multimodal path must match the one-shot multimodal generator
    from kosmosx_tpu.generate import generate_multimodal
    ref = generate_multimodal(params, kcfg, jnp.asarray([[3, 17, 9, 11]],
                                                        jnp.int32),
                              img, SamplingConfig(max_new_tokens=5,
                                                  greedy=True))
    assert h_mm.tokens == [int(t) for t in np.asarray(ref[0])]


@pytest.mark.parametrize("block,lag", [(2, 0), (4, 0), (3, 2)])
def test_engine_decode_block_matches_per_token(params, block, lag):
    """decode_block runs K decode steps per dispatch (on-device lax.scan
    feedback); greedy outputs must be identical to the per-token engine,
    including EOS/budget overrun discard and staggered admission."""
    prompts = _prompts(5, key=33)
    new = 6
    mk = lambda b, sl: ServeEngine(
        params, CFG,
        ServeConfig(max_batch=3, max_prompt_len=16, max_len=64,
                    sync_lag=sl, decode_block=b),
        SamplingConfig(greedy=True))
    ref_eng, blk_eng = mk(0, 0), mk(block, lag)
    ref_h = [ref_eng.submit(p, max_new_tokens=new) for p in prompts]
    blk_h = [blk_eng.submit(p, max_new_tokens=new) for p in prompts]
    ref_eng.run()
    blk_eng.run()
    for hr, hb in zip(ref_h, blk_h):
        assert hb.done
        assert hr.tokens == hb.tokens


def test_engine_decode_block_eos_discards_overrun(params):
    """EOS landing mid-block: the rest of that block's tokens plus any
    lagged inflight blocks must be discarded, the slot freed, and the
    output identical to the synchronous per-token engine."""
    new = 12
    eng0 = ServeEngine(
        params, CFG,
        ServeConfig(max_batch=2, max_prompt_len=16, max_len=64, sync_lag=0),
        SamplingConfig(greedy=True))
    h0 = eng0.submit(_prompts(1, key=37)[0], max_new_tokens=new)
    eng0.run()
    # pick the 4th greedy token as EOS so it lands mid-block (block=3:
    # token 4 = prefill token + decode position 3 = index 0 of block 2)
    eos = h0.tokens[3]

    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_batch=2, max_prompt_len=16, max_len=64, sync_lag=2,
                    decode_block=3),
        SamplingConfig(greedy=True))
    h = eng.submit(_prompts(1, key=37)[0], max_new_tokens=new, eos_id=eos)
    eng.run()
    assert h.done
    assert h.tokens == h0.tokens[:4]  # stops AT the eos token
    assert len(eng._inflight) == 0
    assert eng.slots == [None, None]  # slot freed despite the overrun


@pytest.mark.parametrize("lag", [1, 3])
def test_engine_sync_lag_matches_sync(params, lag):
    """Lagged host sync must produce identical greedy outputs (the device
    feedback loop never depended on the host reads)."""
    prompts = _prompts(5, key=21)
    new = 6
    mk = lambda sl: ServeEngine(
        params, CFG,
        ServeConfig(max_batch=3, max_prompt_len=16, max_len=48, sync_lag=sl),
        SamplingConfig(greedy=True))
    sync_eng, lag_eng = mk(0), mk(lag)
    sync_h = [sync_eng.submit(p, max_new_tokens=new) for p in prompts]
    lag_h = [lag_eng.submit(p, max_new_tokens=new) for p in prompts]
    sync_eng.run()
    lag_eng.run()
    for hs, hl in zip(sync_h, lag_h):
        assert hl.done
        assert hs.tokens == hl.tokens


@pytest.mark.parametrize("db,lag,block,async_d",
                         [(4, 0, 0, False), (4, 4, 0, False),
                          (2, 4, 0, False), (8, 2, 0, False),
                          (4, 4, 2, False), (1, 4, 0, True),
                          (4, 2, 0, True), (2, 4, 3, True),
                          (8, 0, 0, True)])
def test_engine_drain_batch_matches_sync(params, db, lag, block, async_d):
    """Batched drains (K steps' tokens in one device_get — one link RTT
    per K steps on a remote chip) and reader-thread async drains must
    produce identical greedy outputs and identical EOS handling: the
    fetch SCHEDULE changes, the token stream must not."""
    prompts = _prompts(5, key=33)
    new = 7
    mk = lambda d, sl, blk, ad=False: ServeEngine(
        params, CFG,
        ServeConfig(max_batch=3, max_prompt_len=16, max_len=96,
                    sync_lag=sl, drain_batch=d, decode_block=blk,
                    async_drain=ad, eager_copy=not ad),
        SamplingConfig(greedy=True))
    base_eng, db_eng = mk(1, 0, 0), mk(db, lag, block, async_d)
    base_h = [base_eng.submit(p, max_new_tokens=new) for p in prompts]
    db_h = [db_eng.submit(p, max_new_tokens=new) for p in prompts]
    base_eng.run()
    db_eng.run()
    for hb, hd in zip(base_h, db_h):
        assert hd.done
        assert hb.tokens == hd.tokens
        # blocked decode computes logprobs inside the block scan — same
        # math, different fusion, so bitwise equality only without a block
        assert np.allclose(hb.logprobs, hd.logprobs, atol=1e-5)
        if block == 0:
            assert hb.logprobs == hd.logprobs
    # EOS cut: rerun with the eos set to a token known to appear
    eos = base_h[0].tokens[2]
    e1, e2 = mk(1, 2, 0), mk(db, lag, block, async_d)
    h1 = [e1.submit(p, max_new_tokens=new, eos_id=eos) for p in prompts]
    h2 = [e2.submit(p, max_new_tokens=new, eos_id=eos) for p in prompts]
    e1.run()
    e2.run()
    for a, b in zip(h1, h2):
        assert a.tokens == b.tokens


def test_engine_sync_lag_eos_discards_speculative(params):
    """With lag, a request hitting EOS must stop at EOS — trailing
    speculative tokens are discarded."""
    new = 12
    eng0 = ServeEngine(
        params, CFG,
        ServeConfig(max_batch=2, max_prompt_len=16, max_len=48, sync_lag=0),
        SamplingConfig(greedy=True))
    h0 = eng0.submit(_prompts(1, key=33)[0], max_new_tokens=new)
    eng0.run()
    # pick the 3rd greedy token as a synthetic EOS so it triggers mid-stream
    eos = h0.tokens[2]

    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_batch=2, max_prompt_len=16, max_len=48, sync_lag=2),
        SamplingConfig(greedy=True))
    h = eng.submit(_prompts(1, key=33)[0], max_new_tokens=new, eos_id=eos)
    eng.run()
    assert h.done
    assert h.tokens == h0.tokens[:3]  # stops AT the eos token
    assert len(eng._inflight) == 0


DRAFT_CFG = dataclasses.replace(CFG, embed_dim=32, ffn_dim=64, layers=1)


@pytest.fixture(scope="module")
def draft_params():
    return dec.init_decoder(jax.random.PRNGKey(9), DRAFT_CFG)


@pytest.mark.parametrize("lag,block", [(0, 0), (2, 0), (0, 2), (1, 3)])
def test_engine_speculative_matches_plain(params, draft_params, lag, block):
    """Speculative serving (any draft) produces the same greedy tokens as
    the plain engine, for staggered multi-request workloads — including
    blocked speculation (decode_block spec rounds per dispatch)."""
    prompts = _prompts(5, key=41)
    new = 8

    def run(spec):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_batch=3, max_prompt_len=16, max_len=96,
                        sync_lag=lag, spec_gamma=3 if spec else 0,
                        decode_block=block if spec else 0),
            SamplingConfig(greedy=True),
            draft_params=draft_params if spec else None,
            draft_cfg=DRAFT_CFG if spec else None)
        hs = [eng.submit(p, max_new_tokens=new) for p in prompts]
        eng.run()
        return hs

    plain = run(False)
    spec = run(True)
    for hp, hsp in zip(plain, spec):
        assert hsp.done
        assert hp.tokens == hsp.tokens


@pytest.mark.parametrize("db,lag,block", [(2, 1, 0), (2, 2, 2), (4, 0, 0)])
def test_engine_speculative_async_drain_matches_sync(params, draft_params,
                                                     db, lag, block):
    """spec_gamma + async_drain: the spec engine bypasses the host budget
    clamp, so every un-bookkept step writes (gamma+1)*block cache rows —
    the backpressure cap must bound TOTAL un-bookkept (inflight + reader)
    steps to sync_lag + 3*drain_batch or cache tails silently overwrite.
    Greedy outputs must match the synchronous spec engine exactly, and the
    overrun submit() guard must accept the workload."""
    prompts = _prompts(5, key=47)
    new = 7

    def run(ad):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_batch=3, max_prompt_len=16, max_len=256,
                        sync_lag=lag, spec_gamma=3, decode_block=block,
                        drain_batch=db, async_drain=ad, eager_copy=not ad),
            SamplingConfig(greedy=True),
            draft_params=draft_params, draft_cfg=DRAFT_CFG)
        hs = [eng.submit(p, max_new_tokens=new) for p in prompts]
        eng.run()
        return hs

    for hs, ha in zip(run(False), run(True)):
        assert ha.done
        assert hs.tokens == ha.tokens


def test_engine_speculative_self_draft_accepts(params):
    """Draft == target: every proposal accepted, so steps collapse and the
    acceptance counter reflects it."""
    # async_drain off: the sharp steps<=5 bound asserts the SYNC round
    # collapse; async bookkeeping lag adds drain-only trailing steps
    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_batch=2, max_prompt_len=16, max_len=64,
                    spec_gamma=3, async_drain=False),
        SamplingConfig(greedy=True),
        draft_params=params, draft_cfg=CFG)
    h = eng.submit(_prompts(1, key=43)[0], max_new_tokens=12)
    steps = eng.run()
    assert h.done and len(h.tokens) == 12
    assert steps <= 5  # ~12/(gamma+1)=3 productive rounds + admission slack
    assert eng.accepted_total > 0


def test_engine_speculative_eos(params, draft_params):
    probe = ServeEngine(params, CFG,
                        ServeConfig(max_batch=1, max_prompt_len=16,
                                    max_len=64),
                        SamplingConfig(greedy=True))
    h0 = probe.submit(_prompts(1, key=47)[0], max_new_tokens=10)
    probe.run()
    eos = h0.tokens[3]

    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_batch=1, max_prompt_len=16, max_len=64,
                    spec_gamma=2, sync_lag=1),
        SamplingConfig(greedy=True),
        draft_params=draft_params, draft_cfg=DRAFT_CFG)
    h = eng.submit(_prompts(1, key=47)[0], max_new_tokens=10, eos_id=eos)
    eng.run()
    assert h.done
    assert h.tokens == h0.tokens[:4]


@pytest.mark.parametrize("chunk,lag", [(4, 0), (5, 2), (16, 0)])
def test_engine_chunked_prefill_matches_plain(params, chunk, lag):
    """Chunked prompt ingestion must not change any greedy output — even
    with ragged lengths, slot reuse, and decode interleaved mid-prefill."""
    prompts = _prompts(6, key=61)
    new = 7

    def run(chunked):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_batch=3, max_prompt_len=16, max_len=48,
                        sync_lag=lag,
                        prefill_chunk=chunk if chunked else 0),
            SamplingConfig(greedy=True))
        hs = []
        # stagger: submit some late so they prefill while others decode
        for p in prompts[:3]:
            hs.append(eng.submit(p, max_new_tokens=new))
        eng.step()
        eng.step()
        for p in prompts[3:]:
            hs.append(eng.submit(p, max_new_tokens=new))
        eng.run()
        return hs

    plain = run(False)
    chunked = run(True)
    for hp, hc in zip(plain, chunked):
        assert hc.done
        assert hp.tokens == hc.tokens


def test_engine_chunked_prefill_interleaves(params):
    """A long-prompt admission must not stall an in-flight decode: the
    decoding request keeps emitting one token per step while the other
    slot's prompt streams in."""
    eng = ServeEngine(
        params, CFG,
        ServeConfig(max_batch=2, max_prompt_len=16, max_len=48,
                    prefill_chunk=2),
        SamplingConfig(greedy=True))
    short = eng.submit(_prompts(1, key=71)[0][:3], max_new_tokens=10)
    # let `short` finish its prefill (2 chunks) and start decoding
    eng.step()
    eng.step()
    emitted_before = len(short.tokens)
    long_req = eng.submit(list(_prompts(1, key=72)[0]) * 2, max_new_tokens=4)
    for _ in range(3):
        eng.step()
    # the decoding slot advanced every step despite the other slot prefilling
    assert len(short.tokens) >= emitted_before + 3
    assert not long_req.done
    eng.run()
    assert short.done and long_req.done


def test_engine_chunked_matches_oneshot_on_kosmos_engine(devices):
    """On a kosmos-configured engine (parity double_scale active), text
    requests must produce identical greedy tokens whether the prompt is
    admitted whole or streamed in chunks — the prefill embedding scale must
    match the decode convention on both paths."""
    kcfg = KosmosConfig(
        decoder=dataclasses.replace(CFG, vocab_size=128),
        vision=VisionConfig(image_size=28, patch_size=14, layers=1,
                            hidden_dim=32, heads=2, mlp_dim=64,
                            use_flash_attention=False),
        resampler=ResamplerConfig(dim=32, depth=1, dim_head=8, heads=2,
                                  num_latents=4, num_media_embeds=5),
        image_embed_len=4)
    from kosmosx_tpu.models.kosmos import Kosmos

    kparams = Kosmos.init(jax.random.PRNGKey(0), kcfg)
    assert kcfg.parity_double_scale

    def run(chunk):
        eng = ServeEngine(kparams, kcfg.decoder,
                          ServeConfig(max_batch=2, max_prompt_len=12,
                                      max_len=48, prefill_chunk=chunk),
                          SamplingConfig(greedy=True), kosmos_cfg=kcfg)
        h = eng.submit([4, 8, 15, 16, 23], max_new_tokens=6)
        eng.run()
        return h.tokens

    assert run(0) == run(2) == run(16)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engine_fuzz_random_schedules_match_plain(params, draft_params,
                                                  seed):
    """Randomized workloads (arrival times, prompt lengths, budgets,
    per-request EOS ids) across engine configurations (sync_lag /
    prefill_chunk / decode_block / blocked speculation) must all produce
    the reference (plain whole-prompt, synchronous) greedy outputs."""
    import random

    r = random.Random(seed)
    n_req = 7
    reqs = []
    for i in range(n_req):
        lp = r.randint(2, 14)
        prompt = [r.randint(4, CFG.vocab_size - 1) for _ in range(lp)]
        # a random (likely-unhit, sometimes-hit) EOS id exercises the
        # mid-stream discard paths differently per config
        eos = r.randint(4, CFG.vocab_size - 1) if r.random() < 0.5 else None
        reqs.append((prompt, r.randint(1, 9), r.randint(0, 4), eos))

    def run(lag, chunk, block=0, spec=0):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_batch=3, max_prompt_len=16, max_len=96,
                        sync_lag=lag, prefill_chunk=chunk,
                        decode_block=block, spec_gamma=spec),
            SamplingConfig(greedy=True),
            draft_params=draft_params if spec else None,
            draft_cfg=DRAFT_CFG if spec else None)
        handles = []
        i = 0
        guard = 0
        alive = True
        while i < n_req or alive:
            guard += 1
            assert guard < 500, "engine failed to drain"
            # arrival schedule: submit the next request after its delay,
            # then ALWAYS step — admissions interleave with in-flight
            # decode at varying cache indices
            while i < n_req and reqs[i][2] <= guard:
                prompt, budget, _, eos = reqs[i]
                handles.append(eng.submit(prompt, max_new_tokens=budget,
                                          eos_id=eos))
                i += 1
            alive = eng.step()
        eng.run()
        return [h.tokens for h in handles]

    ref = run(0, 0)
    for lag, chunk, block, spec in [
            (0, 3, 0, 0), (2, 0, 0, 0), (3, 5, 0, 0), (1, 16, 0, 0),
            (0, 0, 2, 0), (2, 0, 3, 0), (1, 4, 2, 0),
            (0, 0, 0, 3), (2, 0, 2, 3), (1, 0, 3, 2)]:
        got = run(lag, chunk, block, spec)
        assert got == ref, (lag, chunk, block, spec)


def _tiny_kcfg():
    return KosmosConfig(
        decoder=dataclasses.replace(CFG, vocab_size=128),
        vision=VisionConfig(image_size=28, patch_size=14, layers=1,
                            hidden_dim=32, heads=2, mlp_dim=64,
                            use_flash_attention=False),
        resampler=ResamplerConfig(dim=32, depth=1, dim_head=8, heads=2,
                                  num_latents=4, num_media_embeds=5),
        image_embed_len=4)


@pytest.mark.slow
def test_engine_multimodal_chunked_prefill_matches_oneshot(devices):
    """Multimodal admission under chunked prefill (vision tower + spliced
    prefix once, text remainder streamed) must produce the one-shot greedy
    tokens (VERDICT r1 weak #4)."""
    from kosmosx_tpu.models.kosmos import Kosmos

    kcfg = _tiny_kcfg()
    kparams = Kosmos.init(jax.random.PRNGKey(0), kcfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    prompt = [3, 17, 9, 11, 22, 35, 51, 6]

    def run(chunk):
        eng = ServeEngine(kparams, kcfg.decoder,
                          ServeConfig(max_batch=2, max_prompt_len=12,
                                      max_len=64, prefill_chunk=chunk),
                          SamplingConfig(greedy=True), kosmos_cfg=kcfg)
        h_mm = eng.submit(prompt, max_new_tokens=6, images=img)
        h_txt = eng.submit([4, 8, 15, 16], max_new_tokens=6)
        eng.run()
        assert h_mm.done and h_txt.done
        return h_mm.tokens, h_txt.tokens

    base_mm, base_txt = run(0)
    for chunk in (2, 3, 16):
        mm, txt = run(chunk)
        assert mm == base_mm, (chunk, mm, base_mm)
        assert txt == base_txt, (chunk, txt, base_txt)

    from kosmosx_tpu.generate import generate_multimodal
    ref = generate_multimodal(kparams, kcfg,
                              jnp.asarray([prompt], jnp.int32), img,
                              SamplingConfig(max_new_tokens=6, greedy=True))
    assert base_mm == [int(t) for t in np.asarray(ref[0])]


@pytest.mark.parametrize("lag", [0, 2])
def test_engine_multimodal_speculative_matches_plain(devices, lag):
    """Multimodal requests under speculative serving (text-only draft with
    a lagged cache index) must produce the plain engine's greedy tokens
    (VERDICT r1 weak #4)."""
    from kosmosx_tpu.models.kosmos import Kosmos

    kcfg = _tiny_kcfg()
    kparams = Kosmos.init(jax.random.PRNGKey(0), kcfg)
    dcfg = dataclasses.replace(DRAFT_CFG, vocab_size=128)
    dparams = dec.init_decoder(jax.random.PRNGKey(9), dcfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    mm_prompt = [3, 17, 9, 11, 22]
    txt_prompt = [4, 8, 15, 16]

    def run(spec):
        eng = ServeEngine(
            kparams, kcfg.decoder,
            ServeConfig(max_batch=2, max_prompt_len=12, max_len=96,
                        sync_lag=lag, spec_gamma=3 if spec else 0),
            SamplingConfig(greedy=True), kosmos_cfg=kcfg,
            draft_params=dparams if spec else None,
            draft_cfg=dcfg if spec else None)
        h_mm = eng.submit(mm_prompt, max_new_tokens=6, images=img)
        h_txt = eng.submit(txt_prompt, max_new_tokens=6)
        eng.run()
        assert h_mm.done and h_txt.done
        return h_mm.tokens, h_txt.tokens

    base = run(False)
    assert run(True) == base


def test_engine_tensor_parallel_params(devices):
    """Multi-chip serving: params sharded over a (fsdp=2, tensor=4) mesh +
    engine mesh arg -> greedy tokens identical to the unsharded engine and
    the KV-cache pool physically sharded over the tensor axis (heads dim)."""
    from kosmosx_tpu.parallel.mesh import make_mesh
    from kosmosx_tpu.parallel.sharding import shard_params

    cfg = dataclasses.replace(CFG, vocab_size=96)  # embed divisible by fsdp
    params = dec.init_decoder(jax.random.PRNGKey(0), cfg)
    prompts = [[5, 7, 11, 13], [21, 22], [40, 41, 42, 43, 44]]

    def run(p, mesh=None):
        eng = ServeEngine(p, cfg,
                          ServeConfig(max_batch=2, max_prompt_len=16,
                                      max_len=48),
                          SamplingConfig(greedy=True), mesh=mesh)
        if mesh is not None:
            # unrolled-decode engines hold the pool as a per-layer list
            k = (eng.caches[0] if isinstance(eng.caches, list)
                 else eng.caches)["k"]
            shard = k.sharding.shard_shape(k.shape)
            assert shard[-3] == cfg.heads // 4, shard  # heads over tensor=4
        hs = [eng.submit(pr, max_new_tokens=6) for pr in prompts]
        eng.run()
        return [h.tokens for h in hs]

    ref = run(params)
    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    assert run(shard_params(params, mesh), mesh=mesh) == ref


def test_engine_cancel(params):
    """cancel() frees the slot mid-flight, pending requests drop cleanly,
    and remaining requests finish with unchanged greedy outputs."""
    prompts = _prompts(3, key=91)
    new = 12
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=2, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    h0 = eng.submit(prompts[0], max_new_tokens=new)
    h1 = eng.submit(prompts[1], max_new_tokens=new)
    h2 = eng.submit(prompts[2], max_new_tokens=new)  # waits in pending
    for _ in range(3):
        eng.step()
    n0 = len(h0.tokens)
    assert eng.cancel(h0) is True          # in a slot
    assert eng.cancel(h2) is True          # still pending
    assert eng.cancel(h0) is False         # idempotent
    eng.run()
    assert h0.done and len(h0.tokens) <= n0 + eng.scfg.sync_lag + 1
    assert h2.done and h2.tokens == []     # never admitted
    ref = generate_text(params, CFG, jnp.asarray([prompts[1]], jnp.int32),
                        SamplingConfig(max_new_tokens=new, greedy=True))
    assert h1.tokens == [int(t) for t in np.asarray(ref[0])]
    # the freed slot serves a new request correctly
    h3 = eng.submit(prompts[0], max_new_tokens=new)
    eng.run()
    ref0 = generate_text(params, CFG, jnp.asarray([prompts[0]], jnp.int32),
                         SamplingConfig(max_new_tokens=new, greedy=True))
    assert h3.tokens == [int(t) for t in np.asarray(ref0[0])]


def test_per_request_temperature(params):
    """temperature=0 requests stay bit-exact greedy even while a sampling
    request shares the pool; sentinel slots keep the engine default."""
    prompts = _prompts(3, key=61)
    new = 8
    scfg = ServeConfig(max_batch=3, max_prompt_len=16, max_len=48)
    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True),
                      rng=jax.random.PRNGKey(9))
    h_greedy = eng.submit(prompts[0], max_new_tokens=new, temperature=0.0)
    h_hot = eng.submit(prompts[1], max_new_tokens=new, temperature=5.0)
    h_default = eng.submit(prompts[2], max_new_tokens=new)  # engine greedy
    eng.run()
    for p, h in ((prompts[0], h_greedy), (prompts[2], h_default)):
        ref = generate_text(params, CFG, jnp.asarray([p], jnp.int32),
                            SamplingConfig(max_new_tokens=new, greedy=True))
        assert h.tokens == [int(t) for t in np.asarray(ref[0])]
    ref_hot = generate_text(params, CFG, jnp.asarray([prompts[1]], jnp.int32),
                            SamplingConfig(max_new_tokens=new, greedy=True))
    # at temperature 5 on random-init logits, matching greedy on all 8
    # tokens is ~impossible; this pins that the override actually applies
    assert h_hot.tokens != [int(t) for t in np.asarray(ref_hot[0])]
    assert len(h_hot.tokens) == new


def test_temperature_guards(params):
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=2, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    with pytest.raises(ValueError, match="temperature"):
        eng.submit([5, 6], temperature=-1.0)


def test_bucketed_admission_matches(params):
    """prompt_buckets pads admission prefills to the smallest fitting
    bucket; outputs must be identical to always-max padding."""
    prompts = _prompts(4, key=71)
    new = 6
    base = ServeConfig(max_batch=2, max_prompt_len=16, max_len=48)
    eng_ref = ServeEngine(params, CFG, base, SamplingConfig(greedy=True))
    ref = [eng_ref.submit(p, max_new_tokens=new) for p in prompts]
    eng_ref.run()
    bucketed = dataclasses.replace(base, prompt_buckets=(4, 8))
    eng = ServeEngine(params, CFG, bucketed, SamplingConfig(greedy=True))
    got = [eng.submit(p, max_new_tokens=new) for p in prompts]
    eng.run()
    for r, g in zip(ref, got):
        assert r.tokens == g.tokens


@pytest.mark.parametrize("seed", [0, pytest.param(1, marks=pytest.mark.slow),
                                  pytest.param(2, marks=pytest.mark.slow)])
def test_engine_fuzz_prefix_adapter_temp_surface(params, seed):
    """Round-3 surface fuzz: randomized workloads where ~half the prompts
    share a registered prefix (copy OR shared-attention mode), some
    requests carry a ZERO-initialized adapter (b=0: mathematically the base
    model), and some pin temperature=0.0 — every combination must still
    produce the plain engine's greedy outputs."""
    import random

    from kosmosx_tpu.train.lora import add_lora, strip_lora

    r = random.Random(100 + seed)
    prefix = [r.randint(4, CFG.vocab_size - 1) for _ in range(6)]
    zero_adapter = strip_lora(add_lora(jax.random.PRNGKey(5), params, 2))[1]

    n_req = 6
    reqs = []
    for i in range(n_req):
        lp = r.randint(2, 8)
        tail = [r.randint(4, CFG.vocab_size - 1) for _ in range(lp)]
        prompt = (prefix + tail) if r.random() < 0.5 else tail
        adapter = "Z" if r.random() < 0.3 else None
        temp = 0.0 if r.random() < 0.3 else None
        eos = r.randint(4, CFG.vocab_size - 1) if r.random() < 0.4 else None
        reqs.append((prompt, r.randint(1, 8), r.randint(0, 3), eos, adapter,
                     temp))

    def run(mode, lag=0, chunk=0, block=0):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_batch=3, max_prompt_len=16, max_len=96,
                        sync_lag=lag, prefill_chunk=chunk,
                        decode_block=block),
            SamplingConfig(greedy=True))
        eng.load_adapter("Z", zero_adapter)
        if mode == "copy":
            eng.register_prefix(prefix)
        elif mode == "share":
            eng.register_prefix(prefix, share=True)
        handles = []
        i = 0
        guard = 0
        alive = True
        while i < n_req or alive:
            guard += 1
            assert guard < 500, "engine failed to drain"
            while i < n_req and reqs[i][2] <= guard:
                prompt, budget, _, eos, adapter, temp = reqs[i]
                handles.append(eng.submit(
                    prompt, max_new_tokens=budget, eos_id=eos,
                    adapter=adapter, temperature=temp))
                i += 1
            alive = eng.step()
        eng.run()
        return [h.tokens for h in handles]

    ref = run("none")
    for mode, lag, chunk, block in [
            ("copy", 0, 0, 0), ("copy", 2, 0, 2), ("copy", 1, 4, 0),
            ("share", 0, 0, 0), ("share", 2, 0, 2), ("share", 1, 4, 0)]:
        got = run(mode, lag, chunk, block)
        assert got == ref, (mode, lag, chunk, block)


def test_warmup_compiles_then_serves_clean(params):
    """warmup() exercises every admission flavor, resets stats, and leaves
    subsequent outputs bit-identical to a cold engine."""
    from kosmosx_tpu.train.lora import add_lora, strip_lora

    prefix = [5, 11, 23]
    scfg = ServeConfig(max_batch=2, max_prompt_len=16, max_len=64,
                       prompt_buckets=(4, 8))
    zero = strip_lora(add_lora(jax.random.PRNGKey(5), params, 2))[1]

    eng = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True))
    eng.register_prefix(prefix)
    eng.load_adapter("Z", zero)
    n = eng.warmup()
    assert n >= 4  # 2 buckets + adapter + prefix hit
    assert eng.emitted_total == 0 and eng.steps == 0 and eng.prefix_hits == 0

    p = _prompts(1, key=81)[0]
    h = eng.submit(p, max_new_tokens=6)
    eng.run()
    cold = ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True))
    hc = cold.submit(p, max_new_tokens=6)
    cold.run()
    assert h.tokens == hc.tokens
    # warmup demands an idle engine
    eng.submit(p, max_new_tokens=4)
    with pytest.raises(ValueError, match="idle"):
        eng.warmup()
    eng.run()


def test_warmup_spec_engine_batched_admission(params, draft_params):
    """warmup() on a speculative engine compiles the batched-admission
    pooled prefill for target AND draft plus the spec step programs,
    resets stats, and leaves greedy outputs bit-identical to a cold spec
    engine (a mid-traffic compile of the batched draft prefill was
    measured collapsing spec serving to 63 tok/s on chip)."""
    scfg = ServeConfig(max_batch=4, max_prompt_len=16, max_len=64,
                       spec_gamma=3, sync_lag=1)

    def make():
        return ServeEngine(params, CFG, scfg, SamplingConfig(greedy=True),
                           draft_params=draft_params, draft_cfg=DRAFT_CFG)

    eng = make()
    n = eng.warmup()
    # at least the full-length flavor plus one full batched-admission group
    assert n >= 1 + eng._admit_bucket and eng._admit_bucket == 4
    assert eng.emitted_total == 0 and eng.accepted_total == 0
    assert eng.steps == 0
    prompts = _prompts(4, key=91)
    handles = [eng.submit(p, max_new_tokens=6) for p in prompts]
    eng.run()
    cold = make()
    hc = [cold.submit(p, max_new_tokens=6) for p in prompts]
    cold.run()
    assert [h.tokens for h in handles] == [h.tokens for h in hc]


def test_per_request_top_k_and_top_p(params):
    """Deterministic corners: top_k=1 (any temperature) and top_p→0 both
    reduce to argmax, so they must reproduce the greedy reference while
    sharing the pool with an unconstrained sampling request."""
    prompts = _prompts(3, key=77)
    new = 6
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=3, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True),
                      rng=jax.random.PRNGKey(4))
    h_k1 = eng.submit(prompts[0], max_new_tokens=new, temperature=3.0,
                      top_k=1)
    h_p0 = eng.submit(prompts[1], max_new_tokens=new, temperature=2.0,
                      top_p=1e-6)
    h_hot = eng.submit(prompts[2], max_new_tokens=new, temperature=5.0)
    eng.run()
    for p, h in ((prompts[0], h_k1), (prompts[1], h_p0)):
        ref = generate_text(params, CFG, jnp.asarray([p], jnp.int32),
                            SamplingConfig(max_new_tokens=new, greedy=True))
        assert h.tokens == [int(t) for t in np.asarray(ref[0])], p
    assert len(h_hot.tokens) == new
    with pytest.raises(ValueError, match="top_p"):
        eng.submit(prompts[0], top_p=0.0)
    with pytest.raises(ValueError, match="top_k"):
        eng.submit(prompts[0], top_k=-1)


def test_token_logprobs_match_full_forward(params, draft_params):
    """Every emitted token carries its raw-model log-prob; values must match
    an independent full-forward log-softmax at that position, and agree
    across plain / blocked / speculative engines (same greedy tokens)."""
    p = _prompts(1, key=55)[0]
    new = 6

    def run(block=0, spec=0):
        eng = ServeEngine(
            params, CFG,
            ServeConfig(max_batch=2, max_prompt_len=16, max_len=64,
                        decode_block=block, spec_gamma=spec),
            SamplingConfig(greedy=True),
            draft_params=draft_params if spec else None,
            draft_cfg=DRAFT_CFG if spec else None)
        h = eng.submit(p, max_new_tokens=new)
        eng.run()
        return h

    h = run()
    assert len(h.logprobs) == len(h.tokens) == new
    full = jnp.asarray([p + h.tokens], jnp.int32)
    logits = dec.decoder_forward(params, full, CFG).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    for i, tok in enumerate(h.tokens):
        pos = len(p) + i - 1  # logits at pos predict token at pos+1
        want = float(logp[0, pos, tok])
        assert abs(h.logprobs[i] - want) < 0.05, (i, h.logprobs[i], want)

    for kwargs in ({"block": 3}, {"spec": 2}):
        h2 = run(**kwargs)
        assert h2.tokens == h.tokens
        assert len(h2.logprobs) == len(h2.tokens)
        assert all(abs(a - b) < 0.05
                   for a, b in zip(h2.logprobs, h.logprobs)), kwargs
