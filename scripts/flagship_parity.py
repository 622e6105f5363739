"""Flagship-depth numerical parity: 24L/2048d/32h multiway decoder vs the
torch oracle at fp32 (VERDICT r2 weak #2 — the 1e-2 contract in BASELINE.md
was only ever exercised at 3L/32d; error compounding across 24 sub-LN layers
at dim 2048 is exactly the hard part SURVEY.md §7 flags).

Runs on the host CPU (fp32, highest matmul precision; ~11 GB params/side,
fits the 125 GB box). Covers:
  1. decoder_forward (KosmosLanguage path) vs decoder_forward_oracle;
  2. the Kosmos splice path (position-free text embed + 64-token image block,
     double-scale re-embed) vs spliced_forward_oracle;
  3. the bf16 deviation of the same forwards vs the fp32 oracle (the
     production dtype's distance from exact math).

Reference config: /root/reference/kosmosx/model.py:170-191 (24L / 2048d /
8192 ffn / 32h, subln, xpos, multiway; effective vocab 32002 per SURVEY.md
§2.6.2). Usage: python scripts/flagship_parity.py [--seq 256] [--layers 24]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from kosmosx_tpu.core.config import MagnetoConfig  # noqa: E402
from kosmosx_tpu.nn import decoder as dec  # noqa: E402
from tests.torch_oracle import (decoder_forward_oracle,  # noqa: E402
                                spliced_forward_oracle)


def report(name, ours, ref, contract=1e-2):
    err = np.max(np.abs(ours - ref))
    rel = err / max(np.max(np.abs(ref)), 1e-9)
    ok = "PASS" if err < contract else "FAIL"
    print(f"{name}: max_abs_err={err:.3e} rel={rel:.3e} "
          f"(contract <{contract}) {ok}", flush=True)
    return float(err)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--image-len", type=int, default=64)
    args = ap.parse_args()

    cfg = MagnetoConfig(vocab_size=32002, embed_dim=2048, ffn_dim=8192,
                        layers=args.layers, heads=32, max_positions=2048,
                        compute_dtype="float32", multiway=True, subln=True,
                        xpos_rel_pos=True, use_flash_attention=False,
                        scan_layers=False, dropout=0.0, attention_dropout=0.0)

    t0 = time.time()
    params = dec.init_decoder(jax.random.PRNGKey(7), cfg)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"init: {n/1e9:.2f}B params fp32 in {time.time()-t0:.0f}s",
          flush=True)
    params_np = jax.tree_util.tree_map(np.asarray, params)

    toks = jax.random.randint(jax.random.PRNGKey(3), (1, args.seq), 4,
                              cfg.vocab_size, jnp.int32)
    toks_np = np.asarray(toks)

    # 1. text-only decoder path at depth
    t0 = time.time()
    ours = np.asarray(dec.decoder_forward(params, toks, cfg))
    print(f"jax fp32 forward: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    ref = decoder_forward_oracle(params_np, toks_np, cfg)
    print(f"torch oracle forward: {time.time()-t0:.0f}s", flush=True)
    e1 = report(f"decoder {args.layers}L/2048d fp32 (seq {args.seq})",
                ours, ref)

    # 2. Kosmos splice path: text prefix + image block, double-scale re-embed
    lt = args.seq - args.image_len
    text_emb = dec.embed_only(params, cfg, toks[:, :lt])
    img_block = 0.02 * jax.random.normal(
        jax.random.PRNGKey(11), (1, args.image_len, cfg.embed_dim),
        jnp.float32)
    spliced = jnp.concatenate(
        [text_emb[:, :2], img_block, text_emb[:, 2:]], axis=1)
    x, _ = dec.forward_embedding(params, cfg, token_embedding=spliced)
    h, _ = dec.run_layers(params, x, cfg)
    ours_sp = np.asarray(dec.output_logits(params, h, cfg))
    ref_sp = spliced_forward_oracle(params_np, np.asarray(spliced), cfg,
                                    double_scale=True)
    e2 = report(f"Kosmos splice path {args.layers}L fp32 (double-scale)",
                ours_sp, ref_sp)

    # 3. bf16 deviation from the fp32 oracle (production dtype)
    cfg_bf = MagnetoConfig(vocab_size=32002, embed_dim=2048, ffn_dim=8192,
                           layers=args.layers, heads=32, max_positions=2048,
                           compute_dtype="bfloat16", multiway=True,
                           subln=True, xpos_rel_pos=True,
                           use_flash_attention=False, scan_layers=False,
                           dropout=0.0, attention_dropout=0.0)
    params_bf = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    ours_bf = np.asarray(dec.decoder_forward(params_bf, toks, cfg_bf)
                         ).astype(np.float32)
    err_bf = np.max(np.abs(ours_bf - ref))
    # bf16 logits land on a coarse grid; relative deviation is the honest
    # number (|logits| at depth 24 reach O(30))
    rel_bf = err_bf / max(np.max(np.abs(ref)), 1e-9)
    print(f"decoder {args.layers}L bf16 vs fp32 oracle: "
          f"max_abs_err={err_bf:.3e} rel={rel_bf:.3e} (informational)",
          flush=True)
    print(f"SUMMARY fp32_decoder={e1:.3e} fp32_splice={e2:.3e} "
          f"bf16_decoder={err_bf:.3e}")


if __name__ == "__main__":
    main()
