"""Benchmark-harness smoke tests on tiny configs (CPU).

The reference ships a metrics harness that is not collectible as pytest
(/root/reference/tests/test_benchmarking.py — SURVEY.md §2.6.7); here the
same metric taxonomy is a real, runnable module, so these tests keep it
importable and numerically sane.
"""

import jax
import pytest

from benchmarks.harness import (ConsistencyMetrics, FlopsBenchmark,
                                MemoryMetrics, ScalabilityMetrics,
                                SequenceMetrics, SpeedMetrics,
                                decoder_flops_per_token)
from kosmosx_tpu.core.config import MagnetoConfig

TINY = MagnetoConfig(vocab_size=128, embed_dim=64, ffn_dim=128, layers=2,
                     heads=4, max_positions=512, use_flash_attention=False,
                     dropout=0.0, attention_dropout=0.0)


@pytest.mark.slow
def test_speed_metrics_forward(devices):
    lat = SpeedMetrics(TINY, batch=1, seq_len=32).forward_latency()
    assert lat > 0


def test_scalability_metrics(devices):
    out = ScalabilityMetrics(TINY, batch=2, seq_len=32).run(num_batches=2)
    assert out["instances_per_sec"] > 0
    assert out["tokens_per_sec"] == pytest.approx(
        out["instances_per_sec"] * 32, rel=1e-6)


def test_sequence_metrics(devices):
    out = SequenceMetrics(TINY, lengths=(32, 64)).run(batch=1)
    assert set(out) == {32, 64}
    assert all(v["tokens_per_sec"] > 0 for v in out.values())


def test_consistency_metrics(devices):
    assert ConsistencyMetrics(TINY, runs=3).run(batch=1, seq_len=32)


def test_memory_metrics(devices):
    from kosmosx_tpu.nn import decoder as dec
    params = dec.init_decoder(jax.random.PRNGKey(0), TINY)
    assert MemoryMetrics.params_bytes(params) > 0


def test_flops_benchmark(devices):
    out = FlopsBenchmark(TINY).run(batch=1, seq_len=32)
    assert out["tflops_per_sec"] > 0
    # analytic FLOPs formula covers qkvo + ffn + logits matmuls
    per_tok = decoder_flops_per_token(TINY)
    d, f, v = TINY.embed_dim, TINY.ffn_dim, TINY.vocab_size
    expect = TINY.layers * (8 * d * d + 4 * d * f) + 2 * d * v
    assert per_tok == expect
