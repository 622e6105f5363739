"""Benchmark harness — the working TPU analog of the reference's metric
taxonomy (/root/reference/tests/test_benchmarking.py, which is not runnable:
SURVEY.md §2.6.7):

- SpeedMetrics: forward / backward / end-to-end latency  (ref :64-95)
- ScalabilityMetrics: instances/sec over a dataloader     (ref :98-109)
- SequenceMetrics: seq-len scaling 1k..8k                 (ref :148-160)
- ConsistencyMetrics: run-to-run determinism              (ref :112-133)
- MemoryMetrics: device memory of params + transient      (ref :136-145)
- FlopsBenchmark: achieved TFLOP/s vs analytic FLOPs      (ref :163-216)

Timing uses the chained-scan method (see bench.py / verify skill): N
iterations with a data dependency inside ONE jit, timed by the host fetch of
a scalar — robust against async dispatch and the axon tunnel's cached
replies.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def chained_timeit(step_fn: Callable, init_carry, *, iters: int = 8,
                   repeats: int = 3) -> float:
    """step_fn(carry) -> carry. Returns best seconds per iteration."""

    @jax.jit
    def chained(carry):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return jax.tree_util.tree_map(
            lambda x: jnp.sum(x.astype(jnp.float32)), c)

    probe = chained(init_carry)
    jax.tree_util.tree_map(float, probe)  # warmup + compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(float, chained(init_carry))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def decoder_flops_per_token(cfg) -> float:
    """Analytic forward FLOPs per token for a Magneto decoder (matmuls only;
    2*m*n*k per matmul). Replaces the reference's attention-only formula
    ``4*s^2*d`` (/root/reference/tests/test_benchmarking.py:200-205)."""
    d, f, v = cfg.embed_dim, cfg.ffn_dim, cfg.vocab_size
    per_layer = 2 * (4 * d * d) + 2 * (2 * d * f)  # qkvo + fc1/fc2
    return cfg.layers * per_layer + 2 * d * v      # + logits


class SpeedMetrics:
    """Forward / backward / end-to-end latency for a decoder config."""

    def __init__(self, cfg, batch: int = 1, seq_len: int = 2048):
        from kosmosx_tpu.nn import decoder as dec

        self.cfg, self.batch, self.seq_len = cfg, batch, seq_len
        self.params = dec.init_decoder(jax.random.PRNGKey(0), cfg)
        self._dec = dec

    def _tokens(self, seed=0):
        return jax.random.randint(jax.random.PRNGKey(seed),
                                  (self.batch, self.seq_len), 4,
                                  self.cfg.vocab_size)

    def forward_latency(self) -> float:
        toks0 = self._tokens()

        def step(toks):
            logits = self._dec.decoder_forward(self.params, toks, self.cfg)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return jnp.roll(toks, 1, axis=1).at[:, 0].set(nxt)

        return chained_timeit(step, toks0)

    def train_step_latency(self) -> float:
        from kosmosx_tpu.train.loss import next_token_loss

        toks0 = self._tokens()
        params0 = self.params

        def step(carry):
            params, toks = carry

            def loss(p):
                logits = self._dec.decoder_forward(p, toks, self.cfg)
                return next_token_loss(logits, toks)[0]

            grads = jax.grad(loss)(params)
            params = jax.tree_util.tree_map(
                lambda p, g: p - 1e-6 * g.astype(p.dtype), params, grads)
            return params, toks

        return chained_timeit(step, (params0, toks0), iters=4, repeats=2)


class SequenceMetrics:
    """Latency/throughput across sequence lengths (ref 1k/2k/4k/8k)."""

    def __init__(self, cfg, lengths: Sequence[int] = (1024, 2048, 4096, 8192)):
        self.cfg = cfg
        self.lengths = lengths

    def run(self, batch: int = 1) -> Dict[int, Dict[str, float]]:
        out = {}
        for length in self.lengths:
            sm = SpeedMetrics(self.cfg, batch=batch, seq_len=length)
            lat = sm.forward_latency()
            out[length] = {"latency_s": lat,
                           "tokens_per_sec": batch * length / lat}
        return out


class ScalabilityMetrics:
    """End-to-end throughput (instances/sec) over a data stream, including
    host->device transfer — the TPU analog of the reference's DataLoader
    throughput metric (/root/reference/tests/test_benchmarking.py:98-109,
    which iterates ``torchvision FakeData`` through the model)."""

    def __init__(self, cfg, batch: int = 8, seq_len: int = 512):
        self.cfg, self.batch, self.seq_len = cfg, batch, seq_len

    def run(self, num_batches: int = 8) -> Dict[str, float]:
        from kosmosx_tpu.nn import decoder as dec
        from kosmosx_tpu.train.data import synthetic_text_batches

        params = dec.init_decoder(jax.random.PRNGKey(0), self.cfg)
        # reduce over ALL positions so XLA cannot shrink the vocab
        # projection to one row (tokens_per_sec counts every position)
        fwd = jax.jit(lambda p, t: jnp.sum(
            dec.decoder_forward(p, t, self.cfg).astype(jnp.float32)))
        stream = synthetic_text_batches(batch_size=self.batch,
                                        seq_len=self.seq_len,
                                        vocab_size=self.cfg.vocab_size,
                                        steps=num_batches + 1)
        first = next(stream)
        float(fwd(params, first["input_ids"]))  # compile outside the timing
        t0 = time.perf_counter()
        n = 0
        for batch in stream:
            float(fwd(params, batch["input_ids"]))  # host fetch = sync point
            n += self.batch
        dt = time.perf_counter() - t0
        return {"instances_per_sec": n / dt,
                "tokens_per_sec": n * self.seq_len / dt,
                "seconds": dt}


class ConsistencyMetrics:
    """Determinism: identical inputs -> identical outputs across runs
    (TPU/XLA is deterministic for a fixed program; ref :112-133)."""

    def __init__(self, cfg, runs: int = 5):
        self.cfg, self.runs = cfg, runs

    def run(self, batch: int = 1, seq_len: int = 256) -> bool:
        from kosmosx_tpu.nn import decoder as dec

        params = dec.init_decoder(jax.random.PRNGKey(0), self.cfg)
        toks = jax.random.randint(jax.random.PRNGKey(1), (batch, seq_len), 4,
                                  self.cfg.vocab_size)
        fwd = jax.jit(lambda p, t: dec.decoder_forward(p, t, self.cfg))
        ref = np.asarray(fwd(params, toks))
        return all(np.array_equal(ref, np.asarray(fwd(params, toks)))
                   for _ in range(self.runs - 1))


class MemoryMetrics:
    """Parameter bytes + (when available) device memory stats."""

    @staticmethod
    def params_bytes(params) -> int:
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(params))

    @staticmethod
    def device_memory() -> Optional[Dict[str, int]]:
        try:
            stats = jax.devices()[0].memory_stats()
            return {k: int(v) for k, v in stats.items()
                    if "bytes" in k} if stats else None
        except Exception:
            return None


class FlopsBenchmark:
    """Achieved model TFLOP/s from measured latency + analytic FLOPs."""

    def __init__(self, cfg):
        self.cfg = cfg

    def run(self, batch: int = 4, seq_len: int = 2048) -> Dict[str, float]:
        sm = SpeedMetrics(self.cfg, batch=batch, seq_len=seq_len)
        lat = sm.forward_latency()
        flops = decoder_flops_per_token(self.cfg) * batch * seq_len
        # attention score/value matmuls (the reference's 4*s^2*d term)
        flops += self.cfg.layers * 4 * batch * seq_len * seq_len * self.cfg.embed_dim
        return {"latency_s": lat, "tflops_per_sec": flops / lat / 1e12,
                "tokens_per_sec": batch * seq_len / lat}
