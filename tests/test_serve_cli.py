"""scripts/serve.py end-to-end smoke test (CPU, tiny random-init model)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_serve_cli_end_to_end(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pf = tmp_path / "prompts.txt"
    pf.write_text("hello world\nanother prompt\nthird\n")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "serve.py"),
         "--layers", "2", "--dim", "64", "--ffn-dim", "128", "--heads", "2",
         "--max-positions", "256", "--dtype", "float32", "--no-flash",
         "--no-multiway", "--slots", "2", "--max-prompt-len", "16",
         "--sync-lag", "2", "--decode-block", "2",
         "--prompts-file", str(pf), "--max-new-tokens", "8"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "HF_HUB_OFFLINE": "1"})
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])
    lines = [l for l in out.stdout.splitlines() if l.startswith("[req ")]
    assert len(lines) == 3
    assert "24 tokens / 3 requests" in out.stderr


@pytest.mark.slow
def test_serving_tour_example():
    """examples/serving_tour.py is living documentation — it must keep
    running end-to-end (prefixes, adapters, per-request sampling, cancel,
    warmup, stats)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "serving_tour.py")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout
