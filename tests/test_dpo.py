"""DPO preference fine-tuning (train/dpo.py): sequence log-prob math
against a hand computation, margin/accuracy improvement on synthetic
preferences, reference-term wiring, and Trainer integration.

Beyond the reference (its training is CE-only and broken upstream,
SURVEY.md §2.6.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.train.dpo import (compute_ref_logprobs, dpo_loss_fn,
                                   preference_batch, sequence_logprob)

CFG = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                    heads=4, max_positions=64, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0)


@pytest.fixture(scope="module")
def params():
    return dec.init_decoder(jax.random.PRNGKey(0), CFG)


def test_sequence_logprob_matches_manual(params):
    toks = jnp.asarray([[5, 9, 2, 33, 7, 11]], jnp.int32)
    w = jnp.asarray([[0, 0, 1, 1, 1, 0]], jnp.float32)  # completion = 2,33,7
    got = float(sequence_logprob(params, CFG, toks, w)[0])
    logits = dec.decoder_forward(params, toks, CFG).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    want = sum(float(logp[0, t - 1, int(toks[0, t])]) for t in (2, 3, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_preference_batch_layout():
    b = preference_batch([[4, 5]], [[10, 11, 12]], [[20]], pad_id=1,
                         length=8)
    assert b["chosen"].tolist() == [[4, 5, 10, 11, 12, 1, 1, 1]]
    assert b["chosen_weights"].tolist() == [[0, 0, 1, 1, 1, 0, 0, 0]]
    assert b["rejected"].tolist() == [[4, 5, 20, 1, 1, 1, 1, 1]]
    # over-length rows fail loudly instead of silently truncating the
    # completion into a zero-gradient pair
    with pytest.raises(ValueError, match="exceeds"):
        preference_batch([[4, 5]], [[10, 11, 12]], [[20]], length=4)


def _pref_data(n=8, seed=3):
    """Synthetic preferences: chosen completions are a fixed 'good' token
    pattern, rejected are random — DPO should learn to prefer the pattern."""
    r = np.random.RandomState(seed)
    prompts = [list(r.randint(4, 60, size=3)) for _ in range(n)]
    chosen = [[7, 7, 7] for _ in range(n)]
    rejected = [list(r.randint(8, 60, size=3)) for _ in range(n)]
    return preference_batch(prompts, chosen, rejected, length=8)


def test_dpo_training_improves_margin(params):
    batch = _pref_data()
    batch = compute_ref_logprobs(params, CFG, batch)
    loss_fn = dpo_loss_fn(CFG, beta=0.5)
    opt = optax.adam(5e-3)

    @jax.jit
    def step(p, o, b):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, b, None)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, metrics

    p, o = params, opt.init(params)
    first = last = None
    for i in range(20):
        p, o, m = step(p, o, batch)
        if first is None:
            first = {k: float(v) for k, v in m.items()}
        last = {k: float(v) for k, v in m.items()}
    assert last["loss"] < first["loss"]
    assert last["reward_margin"] > first["reward_margin"]
    assert last["reward_accuracy"] == 1.0  # trivially separable data


def test_reference_term_matters(params):
    """With the reference EQUAL to the policy (init), the DPO logits gap is
    exactly zero -> loss = log 2; reference_free keeps the raw policy
    margin and differs; shifting the ref log-probs moves the loss."""
    batch = compute_ref_logprobs(params, CFG, _pref_data())
    l_dpo, m = dpo_loss_fn(CFG, beta=0.5)(params, batch, None)
    np.testing.assert_allclose(float(l_dpo), np.log(2.0), rtol=1e-4)
    np.testing.assert_allclose(float(m["reward_margin"]), 0.0, atol=1e-4)
    l_free, _ = dpo_loss_fn(CFG, beta=0.5, reference_free=True)(
        params, batch, None)
    assert abs(float(l_free) - float(l_dpo)) > 1e-4
    shifted = dict(batch)
    shifted["ref_chosen_logp"] = batch["ref_chosen_logp"] + 2.0
    l_shift, _ = dpo_loss_fn(CFG, beta=0.5)(params, shifted, None)
    assert abs(float(l_shift) - float(l_dpo)) > 1e-3


def test_dpo_through_trainer(params):
    """DPO loss drives the standard Trainer (sharded pjit step)."""
    from kosmosx_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(batch_size=8, seq_len=8, total_steps=5,
                      learning_rate=5e-3, optimizer="adamw",
                      schedule="constant", checkpoint_every=0, log_every=1,
                      data=2, fsdp=2, tensor=2)
    trainer = Trainer(init_fn=lambda k: dec.init_decoder(k, CFG),
                      loss_fn=dpo_loss_fn(CFG, beta=0.5), cfg=cfg)
    base = compute_ref_logprobs(params, CFG, _pref_data())
    state, metrics = trainer.run(iter([base] * 5), steps=5)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["reward_margin"]) > 0


def test_preference_jsonl_batches(tmp_path):
    """The JSONL preference loader tokenizes and collates rows with
    completion-masked weights."""
    import json

    from kosmosx_tpu.train.data import preference_jsonl_batches

    rows = [{"prompt": "ab", "chosen": "cd", "rejected": "e"},
            {"prompt": "f", "chosen": "gh", "rejected": "ij"}]
    path = tmp_path / "prefs.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in rows))

    class ByteTok:
        hf = None

        class byte:
            @staticmethod
            def encode(s):
                return [ord(c) for c in s]

    batches = list(preference_jsonl_batches(str(path), ByteTok(),
                                            batch_size=2, length=8,
                                            epochs=1))
    assert len(batches) == 1
    b = batches[0]
    assert b["chosen"].shape == (2, 8)
    # row 0: prompt 'ab' + chosen 'cd', weights on the completion only
    assert b["chosen"][0, :4].tolist() == [97, 98, 99, 100]
    assert b["chosen_weights"][0, :4].tolist() == [0, 0, 1, 1]
    assert b["rejected"][1, :3].tolist() == [102, 105, 106]


@pytest.mark.slow
def test_dpo_cli_end_to_end(tmp_path):
    """scripts/train.py --dpo runs preference fine-tuning from JSONL."""
    import json
    import os
    import subprocess
    import sys

    rows = [{"prompt": f"q{i}", "chosen": "yes!", "rejected": "no"}
            for i in range(8)]
    prefs = tmp_path / "prefs.jsonl"
    prefs.write_text("\n".join(json.dumps(r) for r in rows))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train.py"),
         "--model", "language", "--dpo", str(prefs), "--dpo-beta", "0.5",
         "--layers", "1", "--dim", "32", "--ffn-dim", "64", "--heads", "2",
         "--vocab-size", "32002", "--max-positions", "64",
         "--dtype", "float32", "--no-flash", "--batch-size", "4",
         "--seq-len", "24", "--steps", "4", "--log-every", "1",
         "--checkpoint-every", "0", "--no-final-save",
         "--optimizer", "adamw", "--data", "-1",
         "--output-dir", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "HF_HUB_OFFLINE": "1",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=2"})
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])
    assert "reward_margin" in out.stdout
