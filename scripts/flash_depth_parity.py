"""Flash-kernel parity at flagship depth, ON THE CHIP (bf16).

scripts/flagship_parity.py deliberately runs `use_flash_attention=False`
(its fp32 CPU oracle can't afford interpret-mode Pallas at 24L/2048d), so
the Pallas flash kernel's correctness at depth rested on small-shape
interpret tests plus the bench's plausibility. This script closes that gap
(round-3 verdict weak #8): one on-chip run comparing the SAME bf16
24L/2048d/32h decoder forward with the flash kernel vs the jnp einsum
attention path, over a full batch at seq 2048.

The comparison is computed ON DEVICE (max-abs error, max ref magnitude,
argmax agreement) and fetched as scalars — shipping 2x 2048x32002 logits
through the tunnel is slower than the forwards themselves, and the scalar
fetch is also the only reliable tunnel sync (CLAUDE.md).

Expected: bf16 flash vs bf16 jnp diverge only by bf16 rounding-order noise;
the pass bar mirrors the serving dtype's own deviation measured in
flagship_parity.py part C (max_abs_err ~0.5 at logit scale ~30 is normal
for bf16-vs-fp32; flash-vs-jnp at the SAME dtype should sit well below
that, and argmax agreement should be ~0.99+).

Run: python scripts/flash_depth_parity.py   (real chip; ~5 min incl compile)
Record the JSON next to BASELINE.md row 1a.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from kosmosx_tpu.core.config import MagnetoConfig  # noqa: E402
from kosmosx_tpu.core.dtypes import init_casted  # noqa: E402
from kosmosx_tpu.nn import decoder as dec  # noqa: E402

# the reference decoder config (/root/reference/kosmosx/model.py:170-191)
CFG_FLASH = MagnetoConfig(compute_dtype="bfloat16", use_flash_attention=True,
                          dropout=0.0, attention_dropout=0.0,
                          max_positions=8194)
CFG_JNP = dataclasses.replace(CFG_FLASH, use_flash_attention=False)
BATCH, SEQ = 2, 2048


def main():
    devs = jax.devices()
    print(f"devices: {devs}", flush=True)
    t0 = time.time()
    params = init_casted(lambda k: dec.init_decoder(k, CFG_FLASH),
                         jax.random.PRNGKey(7), jnp.bfloat16)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    toks = jax.random.randint(jax.random.PRNGKey(3), (BATCH, SEQ), 4,
                              CFG_FLASH.vocab_size, jnp.int32)

    @jax.jit
    def compare(params, toks):
        lf = dec.decoder_forward(params, toks, CFG_FLASH).astype(jnp.float32)
        lj = dec.decoder_forward(params, toks, CFG_JNP).astype(jnp.float32)
        return (jnp.max(jnp.abs(lf - lj)), jnp.max(jnp.abs(lj)),
                jnp.mean((jnp.argmax(lf, -1) == jnp.argmax(lj, -1))
                         .astype(jnp.float32)))

    err, scale, agree = compare(params, toks)
    # host fetch = the only reliable sync on the tunnel
    err, scale, agree = float(err), float(scale), float(agree)
    out = {"config": "24L/2048d/32h multiway subln xpos, vocab 32002",
           "params": n, "batch": BATCH, "seq": SEQ, "dtype": "bfloat16",
           "flash_vs_jnp_max_abs_err": err, "jnp_max_abs_logit": scale,
           "argmax_agreement": agree, "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
