"""HTTP serving daemon (kosmosx_tpu/serve/server.py).

Spins a real ThreadingHTTPServer on an ephemeral port over a tiny engine and
drives it with urllib: non-streaming and streaming completions must match the
direct-engine greedy output; concurrent requests batch; stats/health work;
bad payloads fail without wedging the dispatcher.
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate import SamplingConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.serve import ServeConfig, ServeEngine, ServeServer

CFG = MagnetoConfig(vocab_size=97, embed_dim=64, ffn_dim=128, layers=2,
                    heads=4, max_positions=128, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0,
                    scan_layers=True)


@pytest.fixture(scope="module")
def params():
    return dec.init_decoder(jax.random.PRNGKey(0), CFG)


@pytest.fixture()
def server(params):
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=3, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    srv = ServeServer(eng, port=0).start()
    yield srv
    srv.stop()


def _post(srv, payload, stream=False):
    host, port = srv.address[0], srv.address[1]
    req = urllib.request.Request(
        f"http://{host}:{port}/v1/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    resp = urllib.request.urlopen(req, timeout=120)
    if not stream:
        return resp.status, json.loads(resp.read())
    lines = [json.loads(l) for l in resp.read().splitlines() if l.strip()]
    return resp.status, lines


def _get(srv, path):
    host, port = srv.address[0], srv.address[1]
    resp = urllib.request.urlopen(f"http://{host}:{port}{path}", timeout=30)
    return resp.status, json.loads(resp.read())


def _ref_tokens(params, prompt, new):
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=1, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    h = eng.submit(prompt, max_new_tokens=new)
    eng.run()
    return h.tokens


def _prompt(i, lp=5):
    return [int(t) for t in np.asarray(jax.random.randint(
        jax.random.PRNGKey(40 + i), (lp,), 4, CFG.vocab_size))]


def test_health_and_stats(server):
    code, body = _get(server, "/healthz")
    assert code == 200 and body == {"ok": True}
    code, body = _get(server, "/v1/stats")
    assert code == 200 and body["max_batch"] == 3
    code2, _ = _get(server, "/healthz")
    assert code2 == 200


def test_completion_matches_engine(server, params):
    p = _prompt(0)
    code, body = _post(server, {"prompt": p, "max_tokens": 6})
    assert code == 200
    assert body["num_tokens"] == 6
    assert body["tokens"] == _ref_tokens(params, p, 6)


def test_streaming_matches_non_streaming(server, params):
    p = _prompt(1)
    code, lines = _post(server, {"prompt": p, "max_tokens": 6,
                                 "stream": True}, stream=True)
    assert code == 200
    toks = [t for l in lines if "tokens" in l and not l.get("done")
            for t in l["tokens"]]
    final = lines[-1]
    assert final.get("done") is True
    assert toks == final["tokens"] == _ref_tokens(params, p, 6)


def test_concurrent_requests_batch(server, params):
    prompts = [_prompt(i, lp=4 + i) for i in range(4)]  # > max_batch: queues
    results = {}

    def go(i):
        _, body = _post(server, {"prompt": prompts[i], "max_tokens": 5})
        results[i] = body["tokens"]

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    [t.start() for t in threads]
    [t.join(timeout=120) for t in threads]
    assert len(results) == 4
    for i, p in enumerate(prompts):
        assert results[i] == _ref_tokens(params, p, 5), i


def test_bad_payloads_do_not_wedge(server, params):
    import urllib.error
    for bad in ({"prompt": []}, {"prompt": "text needs tokenizer"},
                {"no_prompt": 1}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, bad)
        assert e.value.code == 400
    # the dispatcher must still serve real requests afterwards
    p = _prompt(2)
    code, body = _post(server, {"prompt": p, "max_tokens": 4})
    assert code == 200 and body["tokens"] == _ref_tokens(params, p, 4)


def test_eos_id_respected(server, params):
    p = _prompt(3)
    ref = _ref_tokens(params, p, 8)
    eos = ref[2]  # force an early stop at the 3rd token
    code, body = _post(server, {"prompt": p, "max_tokens": 8, "eos_id": eos})
    assert code == 200
    assert body["tokens"] == ref[:3]


def test_tokenizer_text_roundtrip(params):
    class ToyTok:
        def encode(self, s):
            return [4 + (ord(c) % 90) for c in s]

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=2, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    srv = ServeServer(eng, port=0, tokenizer=ToyTok()).start()
    try:
        code, body = _post(srv, {"prompt": "hi jax", "max_tokens": 4})
        assert code == 200
        assert body["text"] == " ".join(str(t) for t in body["tokens"])
        ref = _ref_tokens(params, ToyTok().encode("hi jax"), 4)
        assert body["tokens"] == ref
    finally:
        srv.stop()


def test_cancel_endpoint(server):
    """POST /v1/cancel aborts an in-flight request (or reports 404 if it
    already finished — timing-dependent on a fast tiny model); either way
    the blocked completion returns and the server stays serviceable.
    Deterministic cancel semantics are pinned at the engine level in
    tests/test_serve.py::test_engine_cancel."""
    import time
    import urllib.error

    host, port = server.address[0], server.address[1]
    results = {}

    def post_big():
        results["resp"] = _post(server, {"prompt": [5, 9, 2],
                                         "max_tokens": 40})

    th = threading.Thread(target=post_big, daemon=True)
    th.start()
    for _ in range(200):  # wait for admission (ticket enters the id map)
        if server._by_id:
            break
        time.sleep(0.02)
    rid = next(iter(server._by_id)) if server._by_id else 0
    req = urllib.request.Request(
        f"http://{host}:{port}/v1/cancel",
        data=json.dumps({"id": rid}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        resp = urllib.request.urlopen(req, timeout=60)
        body = json.loads(resp.read())
        assert body["cancelled"] == rid
    except urllib.error.HTTPError as e:
        assert e.code == 404  # request finished before the cancel landed
    th.join(timeout=60)
    assert not th.is_alive()
    status, out = results["resp"]
    assert status == 200 and out["num_tokens"] <= 40
    # engine is still serviceable after the cancel
    ref = _ref_tokens(server.engine.dec_params, [7, 11, 4], 5)
    status, out = _post(server, {"prompt": [7, 11, 4], "max_tokens": 5})
    assert status == 200 and out["tokens"] == ref


def test_cancel_unknown_id(server):
    import urllib.error

    host, port = server.address[0], server.address[1]
    req = urllib.request.Request(
        f"http://{host}:{port}/v1/cancel",
        data=json.dumps({"id": 12345}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_streaming_text_deltas(params):
    """With a tokenizer, stream chunks carry incremental text whose
    concatenation equals the final decoded text."""
    class ToyTok:
        def encode(self, s):
            return [4 + (ord(c) % 90) for c in s]

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=2, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    srv = ServeServer(eng, port=0, tokenizer=ToyTok()).start()
    try:
        code, lines = _post(srv, {"prompt": "hey", "max_tokens": 5,
                                  "stream": True}, stream=True)
        assert code == 200
        deltas = "".join(l.get("text", "") for l in lines
                         if not l.get("done"))
        final = lines[-1]
        assert final.get("done") is True
        assert deltas == final["text"]
    finally:
        srv.stop()


def test_logprobs_over_http(server, params):
    """'logprobs': true returns per-token log-probs in blocking responses
    and streams them aligned with their token chunks."""
    p = _prompt(5)
    code, body = _post(server, {"prompt": p, "max_tokens": 5,
                                "logprobs": True})
    assert code == 200
    assert len(body["logprobs"]) == len(body["tokens"]) == 5
    assert all(lp <= 0.0 for lp in body["logprobs"])

    code, lines = _post(server, {"prompt": p, "max_tokens": 5,
                                 "stream": True, "logprobs": True},
                        stream=True)
    assert code == 200
    toks = [t for l in lines if not l.get("done")
            for t in l.get("tokens", [])]
    lps = [x for l in lines if not l.get("done")
           for x in l.get("logprobs", [])]
    final = lines[-1]
    assert toks == final["tokens"] == body["tokens"]
    assert lps == final["logprobs"] == body["logprobs"]
    # requests WITHOUT the flag stay lean
    code, body2 = _post(server, {"prompt": p, "max_tokens": 3})
    assert "logprobs" not in body2


def test_warmup_on_start(params):
    """start() runs a deploy-style engine.warmup() by default (every
    program compiles before traffic — a mid-request compile costs 30 s+
    on a remote chip), resets the stats counters, and leaves served
    outputs bit-identical; warmup=False opts out."""
    eng = ServeEngine(params, CFG,
                      ServeConfig(max_batch=3, max_prompt_len=16, max_len=48),
                      SamplingConfig(greedy=True))
    calls = {}
    orig = eng.warmup
    eng.warmup = lambda **kw: calls.setdefault("n", orig(**kw))
    srv = ServeServer(eng, port=0).start()
    try:
        assert calls["n"] >= 1
        assert eng.steps == 0 and eng.emitted_total == 0
        p = _prompt(9)
        code, body = _post(srv, {"prompt": p, "max_tokens": 6})
        assert code == 200
        assert body["tokens"] == _ref_tokens(params, p, 6)
    finally:
        srv.stop()

    cold = ServeEngine(params, CFG,
                       ServeConfig(max_batch=3, max_prompt_len=16,
                                   max_len=48),
                       SamplingConfig(greedy=True))
    ccalls = {}
    corig = cold.warmup
    cold.warmup = lambda **kw: ccalls.setdefault("n", corig(**kw))
    srv2 = ServeServer(cold, port=0, warmup=False).start()
    try:
        assert "n" not in ccalls
        code, body = _post(srv2, {"prompt": p, "max_tokens": 6})
        assert code == 200
        assert body["tokens"] == _ref_tokens(params, p, 6)
    finally:
        srv2.stop()
