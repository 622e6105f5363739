"""Flagship-depth numerical parity: 24L/2048d/32h decoder vs the torch oracle.

The parity contract (BASELINE.md:21-22) is "logits within 1e-2 of the torch
reference" measured on the REAL 24L/2048d config (/root/reference/kosmosx/
model.py:170-191) — but the fast-tier test (tests/test_torch_parity.py) runs
the oracle at 3L/32d. Error compounding across 24 sub-LN layers at dim 2048 is
exactly the hard part SURVEY.md §7 flags, so this script runs the one-shot
fp32 comparison at flagship depth on the host CPU (125 GB RAM; one-shot by
design — too slow for the test tier):

  A. decoder_forward (24L/2048d/32h multiway, vocab 32002) vs
     tests/torch_oracle.decoder_forward_oracle, fp32, batch 1 x seq 256;
  B. the Kosmos SPLICE path at the same depth (position-free scaled text
     embedding + 64-embedding image block + double-scale re-embed, the
     reference quirk at /root/reference/kosmosx/model.py:238-244) vs
     spliced_forward_oracle;
  C. the bf16 deviation of the same forward vs the fp32 oracle (the serving
     dtype), reported as max-abs-error and argmax agreement.

Prints one JSON dict; record the numbers in BASELINE.md.

Run: python scripts/flagship_parity.py  (CPU; ~10-20 min on one core)
"""

import json
import sys
import time

import jax

# CPU before first device query (the axon sitecustomize force-registers the
# TPU tunnel; see CLAUDE.md / utils/platform.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from kosmosx_tpu.core.config import MagnetoConfig  # noqa: E402
from kosmosx_tpu.data.splice import splice_embeddings  # noqa: E402
from kosmosx_tpu.nn import decoder as dec  # noqa: E402
from tests.torch_oracle import (decoder_forward_oracle,  # noqa: E402
                                spliced_forward_oracle)

# The reference decoder config (/root/reference/kosmosx/model.py:170-191),
# effective vocab 32002 (SURVEY.md §2.6.2). jnp attention (the flash kernel's
# flagship-depth agreement is covered by the on-chip bench + interpret tests;
# interpret mode at this scale is infeasible on one core).
CFG = MagnetoConfig(compute_dtype="float32", use_flash_attention=False,
                    scan_layers=False, dropout=0.0, attention_dropout=0.0)
SEQ = 256


def _report(name, ours, ref, out):
    err = np.max(np.abs(ours - ref))
    scale = np.max(np.abs(ref))
    agree = float(np.mean(np.argmax(ours, -1) == np.argmax(ref, -1)))
    out[name] = {"max_abs_err": float(err), "ref_max_abs": float(scale),
                 "argmax_agreement": agree}
    print(f"{name}: max_abs_err={err:.3e} (ref scale {scale:.1f}), "
          f"argmax agreement {agree:.4f}", flush=True)


def main():
    out = {"config": "24L/2048d/32h multiway subln xpos, vocab 32002",
           "seq": SEQ, "contract": "logits within 1e-2 (BASELINE.md:21-22)"}
    t0 = time.time()
    params = dec.init_decoder(jax.random.PRNGKey(7), CFG)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    out["params"] = n
    print(f"init {n/1e9:.2f}B params in {time.time()-t0:.0f}s", flush=True)
    params_np = jax.tree_util.tree_map(np.asarray, params)
    toks = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (1, SEQ), 4,
                           CFG.vocab_size, jnp.int32))

    # A. fp32 decoder at depth
    t0 = time.time()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(dec.decoder_forward(params, jnp.asarray(toks), CFG))
    print(f"jax fp32 forward {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    ref = decoder_forward_oracle(params_np, toks, CFG)
    print(f"torch oracle forward {time.time()-t0:.0f}s", flush=True)
    _report("fp32_decoder_24L", ours, ref, out)

    # B. the Kosmos splice path at depth (double-scale quirk §2.6.1)
    img = 0.02 * jax.random.normal(jax.random.PRNGKey(11),
                                   (1, 64, CFG.embed_dim), jnp.float32)
    with jax.default_matmul_precision("highest"):
        text_emb = dec.embed_only(params, CFG, jnp.asarray(toks[:, :SEQ - 64]))
        spliced = splice_embeddings(text_emb, img, None, index=2)
        x, _ = dec.forward_embedding(params, CFG, token_embedding=spliced)
        h, _ = dec.run_layers(params, x, CFG)
        ours_sp = np.asarray(dec.output_logits(params, h, CFG))
    ref_sp = spliced_forward_oracle(params_np, np.asarray(spliced), CFG,
                                    double_scale=True)
    _report("fp32_splice_24L", ours_sp, ref_sp, out)

    # C. bf16 deviation (the serving dtype) vs the fp32 oracle
    import dataclasses
    bcfg = dataclasses.replace(CFG, compute_dtype="bfloat16")
    bparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    ours_bf = np.asarray(dec.decoder_forward(bparams, jnp.asarray(toks),
                                             bcfg)).astype(np.float32)
    _report("bf16_decoder_24L_vs_fp32_oracle", ours_bf, ref, out)

    ok = (out["fp32_decoder_24L"]["max_abs_err"] < 1e-2
          and out["fp32_splice_24L"]["max_abs_err"] < 1e-2)
    out["contract_met_fp32"] = bool(ok)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
