"""Eval harness tests: perplexity correctness + text-metric sanity.

The reference never implemented these metrics (commented out,
/root/reference/tests/test_benchmarking.py:225-248,294-311); the oracle
here is math, not the reference.
"""

import math

import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.eval import (bleu, evaluate_perplexity, exact_match,
                              rouge_l, token_f1)
from kosmosx_tpu.models.language import KosmosLanguage


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                        heads=4, max_positions=64, dropout=0.0,
                        attention_dropout=0.0)
    import jax
    params = KosmosLanguage.init(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_perplexity_token_weighted(tiny_lm):
    params, cfg = tiny_lm
    rng = np.random.RandomState(0)
    batches = [{"input_ids": rng.randint(2, 64, size=(2, 16)).astype(np.int32),
                "attention_mask": np.ones((2, 16), np.int32)}
               for _ in range(3)]
    out = evaluate_perplexity(params, batches, cfg)
    assert out["batches"] == 3
    assert out["tokens"] == 3 * 2 * 15  # (L-1) label positions per row
    # random-init model on uniform-random tokens: ppl near vocab size
    assert 10 < out["perplexity"] < 400
    assert math.isclose(out["perplexity"], math.exp(out["cross_entropy"]))


def test_perplexity_respects_mask(tiny_lm):
    params, cfg = tiny_lm
    rng = np.random.RandomState(1)
    ids = rng.randint(2, 64, size=(1, 16)).astype(np.int32)
    mask = np.ones((1, 16), np.int32)
    mask[:, 8:] = 0
    out = evaluate_perplexity(params, [{"input_ids": ids,
                                        "attention_mask": mask}], cfg)
    assert out["tokens"] == 7


def test_perplexity_max_batches(tiny_lm):
    params, cfg = tiny_lm
    ids = np.ones((1, 8), np.int32) * 3
    batches = [{"input_ids": ids} for _ in range(10)]
    out = evaluate_perplexity(params, batches, cfg, max_batches=2)
    assert out["batches"] == 2


def test_bleu_perfect_and_zero():
    assert bleu(["the cat sat on the mat"], ["the cat sat on the mat"]) == \
        pytest.approx(1.0)
    assert bleu(["x y z w"], ["a b c d"]) == 0.0
    assert bleu([""], ["a b"]) == 0.0


def test_bleu_partial_ordering():
    good = bleu(["the cat sat on the mat"], ["the cat sat on a mat"])
    worse = bleu(["cat the on sat mat a"], ["the cat sat on a mat"])
    assert 0 < worse < good < 1


def test_bleu_brevity_penalty():
    full = bleu(["the cat sat on the mat"], ["the cat sat on the mat"])
    short = bleu(["the cat sat"], ["the cat sat on the mat"])
    assert short < full


def test_rouge_l():
    assert rouge_l("a b c d", "a b c d") == pytest.approx(1.0)
    assert rouge_l("a x b y c", "a b c") > 0.5
    assert rouge_l("x y", "a b") == 0.0


def test_token_f1_and_em():
    assert token_f1("a b c", "a b c") == pytest.approx(1.0)
    assert token_f1("a b", "b c") == pytest.approx(0.5)
    assert token_f1("x", "y") == 0.0
    assert exact_match("a b", "a b") == 1.0
    assert exact_match("a b", "a c") == 0.0


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path):
    """scripts/eval.py runs on a corpus file and prints a JSON result."""
    import json
    import os
    import subprocess
    import sys

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join("alpha beta gamma delta" for _ in range(60)))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "eval.py"),
         "--layers", "1", "--dim", "32", "--ffn-dim", "64", "--heads", "2",
         "--dtype", "float32", "--data", str(corpus),
         "--seq-len", "32", "--batch-size", "2", "--max-batches", "2"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "HF_HUB_OFFLINE": "1"})
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["batches"] == 2 and result["perplexity"] > 1.0
