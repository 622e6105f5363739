"""Benchmark: images+text tokens/sec/chip on the flagship Kosmos model.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...extras}

Methodology (axon-tunnel-safe, see .claude/skills/verify/SKILL.md):
``block_until_ready`` does not block and identical executions are cached, so
every timed call (a) gets DISTINCT token inputs pre-staged on device, and
(b) is synced by fetching a scalar reduction of the logits to host with
``float(...)`` — a real value fetch, which does block. Per-call tunnel RTT
is included once per CHAIN: timed forwards run CHAINED inside one jit via
``lax.scan`` carrying a SCALAR (each step's logit-sum perturbs the next
step's tokens by a runtime zero, so no step can be cached, elided, or
reordered) — this amortizes the tunnel RTT across the chain, which is the
production shape: inference steps run back-to-back with no host sync per
step. Round 1's scan attempt OOMed because it carried full logits; the
scalar carry fits (chained 318.7 ms/step vs 350.2 sequential at batch 6,
benchmarks/chained_forward_probe.py). Falls back to sequential timed calls
if the chain fails to compile or fit.

Workload = BASELINE.json config 4: batched bf16, one image + text at decoder
sequence length 2048 (1984 text tokens + 64 spliced image embeddings), on the
24L/2048d/32h multiway decoder with CLIP ViT-L/14 + resampler in the loop.

``vs_baseline``: ratio against a recorded naive-XLA implementation of the
same model (fp32, no Pallas flash attention, no layer scan — the "direct
translation" a torch port would produce; measured once on this chip and
cached in bench_baseline.json). The reference itself publishes no numbers
(BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")

BATCH = 6                # sweet spot on v5e (BASELINE.md batch sweep)
TEXT_LEN = 1984          # + 64 image embeddings = 2048 decoder positions
TIMED_CALLS = 6          # sequential-fallback path only
CHAIN = 6                # forwards per scan chain
CHAIN_CALLS = 2          # timed chain executions (plus one compile call)


def _build(cfg):
    import jax
    import jax.numpy as jnp

    from kosmosx_tpu.models.kosmos import Kosmos

    def probe(params, tokens, images):
        logits = Kosmos.apply(params, tokens, images, cfg)
        # scalar reduction over ALL logits: the float() fetch of this value
        # is the only reliable sync point on the axon tunnel, and reducing
        # every position keeps XLA from shrinking the final vocab projection
        # to one row (measured cost of the full reduction: ~2%)
        return jnp.sum(logits.astype(jnp.float32))

    return jax.jit(probe)


def _measure_sequential(cfg, label, params, imgs):
    import jax
    import jax.numpy as jnp

    fn = _build(cfg)
    vocab = cfg.decoder.vocab_size
    key = jax.random.PRNGKey(1)
    # pre-stage distinct token inputs on device (distinct values per call so
    # the tunnel's identical-execution cache can never serve a timed call)
    tok_batches = [
        jax.random.randint(jax.random.fold_in(key, i), (BATCH, TEXT_LEN),
                           4, vocab, jnp.int32)
        for i in range(TIMED_CALLS + 1)
    ]
    for t in tok_batches:
        float(jnp.sum(t))  # force resident before timing
    # warmup/compile
    float(fn(params, tok_batches[-1], imgs))
    times = []
    for i in range(TIMED_CALLS):
        t0 = time.perf_counter()
        float(fn(params, tok_batches[i], imgs))
        times.append(time.perf_counter() - t0)
    best = min(times)
    tokens_per_call = BATCH * (TEXT_LEN + 64)
    tps = tokens_per_call / best
    prefill_ms = best * 1000.0
    print(f"# {label}: {tps:,.0f} tok/s  ({prefill_ms:.1f} ms / "
          f"{tokens_per_call}-token prefill; times={['%.3f' % t for t in times]})",
          file=sys.stderr)
    return tps, prefill_ms


def _measure_chained(cfg, label, params, imgs):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from kosmosx_tpu.models.kosmos import Kosmos

    vocab = cfg.decoder.vocab_size
    key = jax.random.PRNGKey(1)

    def chain(p, stack, im, c0):
        def body(c, t):
            # runtime-dependent zero ties each step to the carry: no step
            # can be served from the tunnel cache, eliminated, or reordered
            t = t + jnp.isnan(c).astype(jnp.int32)
            s = jnp.sum(Kosmos.apply(p, t, im, cfg).astype(jnp.float32))
            return c + s, ()
        return lax.scan(body, c0, stack)[0]

    chain_fn = jax.jit(chain)
    stacks = [
        jax.random.randint(jax.random.fold_in(key, 1000 + i),
                           (CHAIN, BATCH, TEXT_LEN), 4, vocab, jnp.int32)
        for i in range(CHAIN_CALLS + 1)
    ]
    for s in stacks:
        float(jnp.sum(s))
    float(chain_fn(params, stacks[-1], imgs, jnp.float32(0)))  # compile
    times = []
    for i in range(CHAIN_CALLS):
        t0 = time.perf_counter()
        float(chain_fn(params, stacks[i], imgs, jnp.float32(i)))
        times.append((time.perf_counter() - t0) / CHAIN)
    best = min(times)
    tokens_per_call = BATCH * (TEXT_LEN + 64)
    tps = tokens_per_call / best
    prefill_ms = best * 1000.0
    print(f"# {label}: {tps:,.0f} tok/s  ({prefill_ms:.1f} ms/step, "
          f"chain of {CHAIN}; per-step={['%.3f' % t for t in times]})",
          file=sys.stderr)
    return tps, prefill_ms


def _measure(cfg, label):
    import jax
    import jax.numpy as jnp

    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.models.kosmos import Kosmos

    # fused init+cast: materializing fp32 then casting would exceed HBM
    params = init_casted(lambda k: Kosmos.init(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)
    imgs = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), 999),
                             (BATCH, 3, 224, 224), jnp.float32)
    try:
        return _measure_chained(cfg, label + " (chained)", params, imgs)
    except Exception as e:  # HBM / remote-compile failures only
        print(f"# chain failed ({type(e).__name__}: {e}); "
              f"sequential fallback", file=sys.stderr)
        return _measure_sequential(cfg, label, params, imgs)


def _device_health_or_die(timeout_s: int = 600):
    """A tiny matmul value-fetch in a SUBPROCESS with a timeout: if the
    remote device is unreachable (the axon tunnel hangs in a C transport
    call rather than erroring — observed service-side outage 2026-08-17/18;
    SIGALRM cannot interrupt it), print a diagnosable JSON line and exit
    instead of hanging the driver indefinitely. Run as a subprocess so a
    wedged tunnel never poisons THIS process."""
    import subprocess

    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128), jnp.bfloat16); "
             "assert float((x @ x).sum()) > 0; print('ok')")
    err = None
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        if r.returncode != 0:
            err = f"health probe failed (rc={r.returncode}): " \
                  f"{r.stderr[-300:]}"
    except subprocess.TimeoutExpired:
        err = (f"device unreachable: health matmul hung >{timeout_s}s "
               f"(axon tunnel down?)")
    if err is not None:
        print(json.dumps({
            "metric": "images+text tokens/sec/chip (flagship Kosmos)",
            "value": 0.0, "unit": "tokens/sec/chip", "vs_baseline": 0.0,
            "error": err}))
        sys.stdout.flush()
        os._exit(3)


def _main_cfg():
    from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                         ResamplerConfig, VisionConfig)

    # max_positions=8194: seq-8192-capable table per the reference's training
    # intent (its 2048-entry table would NaN past ~2046 tokens, SURVEY §2.6.3)
    return KosmosConfig(
        # activation="gelu_fast": the SAME erf-gelu evaluated by a
        # purpose-fit polynomial (max abs err 1.2e-6 over the bf16 domain,
        # exhaustively tested; passes the torch-oracle 1e-4 parity bar) at
        # 27.5 ms less than XLA's erf — see ops/fast_gelu.py. The naive
        # baseline keeps the default XLA erf (direct-translation shape).
        decoder=MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                              dropout=0.0, attention_dropout=0.0,
                              use_flash_attention=True, max_positions=8194,
                              activation="gelu_fast",
                              flash_block_q=1024, flash_block_kv=1024),
        vision=VisionConfig(compute_dtype="bfloat16"),
        resampler=ResamplerConfig(compute_dtype="bfloat16"),
    )


def main_probe(batch: int):
    """Measure the MAIN (bf16+flash) number in this process and print
    ``MAIN <tps> <prefill_ms>``. Run via subprocess from main(): after a
    RESOURCE_EXHAUSTED the tunnel is wedged for the rest of the process
    (CLAUDE.md), so the driver-facing main() must never measure in its own
    process — round 3 lost its official number exactly this way
    (BENCH_r03.json rc=1 on a transient OOM that an in-process retry could
    never recover from)."""
    global BATCH
    BATCH = batch
    tps, prefill_ms = _measure(_main_cfg(), f"kosmosx_tpu bf16+flash b{batch}")
    print(f"MAIN {tps} {prefill_ms}")


def main():
    global BATCH
    _device_health_or_die()
    import subprocess

    # fresh process per attempt: same batch twice (transient tunnel/HBM
    # state — the observed failure mode — clears with the process), then a
    # known-fitting small batch as the last resort
    tps = prefill_ms = used_batch = None
    errs = []
    for nb in (BATCH, BATCH, 2):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--main-probe", str(nb)],
                capture_output=True, text=True, timeout=2400)
            if out.stderr:
                sys.stderr.write(out.stderr)  # pass the probe's notes through
            for line in out.stdout.splitlines():
                if line.startswith("MAIN "):
                    _, t, pm = line.split()
                    tps, prefill_ms, used_batch = float(t), float(pm), nb
                    break
            if tps is None:
                tail = (out.stderr.strip().splitlines()[-1]
                        if out.stderr.strip() else "no output")
                errs.append(f"main b{nb} rc={out.returncode}: {tail[-200:]}")
        except Exception as e:
            errs.append(f"main b{nb}: {type(e).__name__}: {e}")
        if tps is not None:
            break
    if tps is None:
        # rc=0 with an error field: a failed measurement must never turn
        # into a failed ROUND artifact
        print(json.dumps({
            "metric": "images+text tokens/sec/chip (flagship Kosmos)",
            "value": 0.0, "unit": "tokens/sec/chip", "vs_baseline": 0.0,
            "error": "; ".join(errs)[-500:]}))
        return
    BATCH = used_batch

    baseline_tps = None
    baseline_batch = None
    if os.path.exists(BASELINE_FILE) and not os.environ.get(
            "BENCH_REMEASURE_BASELINE"):
        with open(BASELINE_FILE) as f:
            cached = json.load(f)
        # a baseline measured with the old sequential (per-call-RTT)
        # methodology is not comparable to the chained main number
        if cached.get("chained"):
            baseline_tps = cached.get("naive_tokens_per_sec")
            baseline_batch = cached.get("batch")
    if baseline_tps is None:
        # each naive variant runs in a FRESH subprocess: a RESOURCE_EXHAUSTED
        # wedges the tunnel for the rest of the process, so an in-process
        # fallback chain never recovers (observed: the bf16 retry after an
        # fp32 OOM fails spuriously)
        import subprocess

        variants = [("float32", BATCH), ("bfloat16", BATCH)]
        if BATCH != 4:
            variants.append(("bfloat16", 4))  # last resort: known-fitting
        for dtype, nb in variants:
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--naive-probe", dtype, str(nb)],
                    capture_output=True, text=True, timeout=1800)
                for line in out.stdout.splitlines():
                    if line.startswith("NAIVE "):
                        baseline_tps = float(line.split()[1])
                        baseline_batch = nb
                        break
                if baseline_tps is None and out.stderr:
                    tail = "\n# ".join(out.stderr.strip().splitlines()[-3:])
                    print(f"# naive {dtype} b{nb} rc={out.returncode} "
                          f"stderr tail:\n# {tail}", file=sys.stderr)
            except Exception as e:
                print(f"# naive {dtype} b{nb} subprocess failed: {e}",
                      file=sys.stderr)
            if baseline_tps:
                note = (f"{dtype}, jnp attention, same model/shapes; "
                        f"the direct-translation baseline (chained "
                        f"methodology, same as the main measurement)")
                with open(BASELINE_FILE, "w") as f:
                    json.dump({"naive_tokens_per_sec": baseline_tps,
                               "batch": nb, "chained": True,
                               "note": note}, f)
                break
            print(f"# naive {dtype} b{nb} did not produce a number",
                  file=sys.stderr)

    result = {
        "metric": f"images+text tokens/sec/chip (24L/2048d multiway decoder, "
                  f"CLIP ViT-L/14 + resampler, bf16, seq 2048, batch {BATCH})",
        "value": round(tps, 1),
        # only compare like with like: the ratio is null when the baseline
        # was (or had to be) measured at a different batch than the main run
        "vs_baseline": (round(tps / baseline_tps, 3)
                        if baseline_tps and baseline_batch == BATCH else None),
        "unit": "tokens/sec/chip",
        "prefill_ms_per_batch": round(prefill_ms, 2),
    }
    print(json.dumps(result))


def naive_probe(dtype: str, batch: int):
    """Measure the naive (no-flash) baseline in this process and print
    ``NAIVE <tps>``. Run via subprocess from main()."""
    global BATCH
    BATCH = batch
    from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                         ResamplerConfig, VisionConfig)

    cfg = KosmosConfig(
        decoder=MagnetoConfig(compute_dtype=dtype, scan_layers=True,
                              dropout=0.0, attention_dropout=0.0,
                              use_flash_attention=False, max_positions=8194),
        vision=VisionConfig(compute_dtype=dtype, use_flash_attention=False),
        resampler=ResamplerConfig(compute_dtype=dtype),
    )
    tps, _ = _measure(cfg, f"naive {dtype} no-flash b{batch}")
    print(f"NAIVE {tps}")


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--naive-probe":
        naive_probe(sys.argv[2], int(sys.argv[3]))
    elif len(sys.argv) > 2 and sys.argv[1] == "--main-probe":
        main_probe(int(sys.argv[2]))
    else:
        main()
