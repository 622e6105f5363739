"""FFN-activation variants: can the 34.1 ms fp32 erf-gelu cost be cut?

BASELINE.md decoder anatomy: the torchscale fp32-gelu discipline
(``activation_fn(x.float())``, ref torchscale feedforward_network) costs
34.1 ms of the 335.7 ms batch-6 flagship decoder forward — XLA does not
fuse the bf16->fp32->erf->bf16 chain into the fc1 matmul epilogue and
materializes extra HBM passes. Variants measured here:

  parity      — activation_fp32=True (default; torchscale semantics)
  act_bf16    — activation_fp32=False (gelu in compute dtype; what the
                reference would run if torchscale hadn't forced .float())
  tanh_fp32   — fp32 tanh-approx gelu (isolates erf transcendental cost)
  f32mm_gelu  — fc1 with preferred_element_type=f32, round through bf16
                (bit-parity input to the gelu), erf-gelu in fp32, cast out.
                Same math as parity; tests whether handing XLA the fp32
                array straight out of the MXU accumulator fuses better.

Methodology: bench.py rules (distinct inputs, scalar fetch sync).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.core.dtypes import init_casted
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers

BATCH = 6
SEQ = 2048
CALLS = 4


def make_cfg(**kw):
    return MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                         dropout=0.0, attention_dropout=0.0,
                         use_flash_attention=True, max_positions=8194,
                         flash_block_q=1024, flash_block_kv=1024, **kw)


def measure(label, cfg):
    fn = jax.jit(lambda p, t: jnp.sum(
        dec.decoder_forward(p, t, cfg).astype(jnp.float32)))
    params = init_casted(lambda k: dec.init_decoder(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)
    key = jax.random.PRNGKey(1)
    toks = [jax.random.randint(jax.random.fold_in(key, i), (BATCH, SEQ), 4,
                               cfg.vocab_size, jnp.int32)
            for i in range(CALLS + 1)]
    for t in toks:
        float(jnp.sum(t))
    float(fn(params, toks[-1]))  # compile
    times = []
    for i in range(CALLS):
        t0 = time.perf_counter()
        float(fn(params, toks[i]))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label}: {best * 1e3:.1f} ms  "
          f"({[f'{t * 1e3:.0f}' for t in times]})", flush=True)
    del params
    return best


def ffn_f32mm(params, x, *, activation="gelu", dropout_rate=0.0,
              activation_dropout=0.0, rng=None, dtype=None,
              activation_fp32=True):
    """fc1 straight to fp32 out of the MXU accumulator, bf16 round-trip
    for bit-parity with the stock path, erf-gelu in fp32, bf16 out."""
    act = layers.activation_fn(activation)
    w = params["fc1"]["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    h32 = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in params["fc1"]:
        h32 = h32 + params["fc1"]["b"].astype(jnp.float32)
    # replicate the stock path's bf16 rounding of the matmul output so the
    # gelu sees bit-identical inputs
    h32 = h32.astype(x.dtype).astype(jnp.float32)
    h = act(h32).astype(x.dtype)
    if "ffn_ln" in params:
        h = layers.layer_norm(params["ffn_ln"], h)
    return layers.linear(params["fc2"], h, dtype=dtype)


def ffn_poly(params, x, *, activation="gelu", dropout_rate=0.0,
             activation_dropout=0.0, rng=None, dtype=None,
             activation_fp32=True):
    """SPEED probe only (placeholder coefficients): gelu via a clamped
    odd polynomial in fp32 — costs the poly FMAs + 1 clamp + 1 select,
    no erf/tanh/exp. Measures the ceiling for a minimax-fitted gelu."""
    h = layers.linear(params["fc1"], x, dtype=dtype)
    t = h.astype(jnp.float32)
    tc = jnp.clip(t, -5.0, 5.0)
    t2 = tc * tc
    # degree-9 odd Horner in t (placeholder coeffs, NOT accurate)
    p = 0.5 + tc * (0.3989 + t2 * (-0.066 + t2 * (0.0087 + t2 * (-6.3e-4
        + t2 * 1.8e-5))))
    g = t * jnp.clip(p, 0.0, 1.0)
    h = g.astype(h.dtype)
    if "ffn_ln" in params:
        h = layers.layer_norm(params["ffn_ln"], h)
    return layers.linear(params["fc2"], h, dtype=dtype)


_T6 = (0.7978828682178812, 0.036343200198652635, -4.3983891272934235e-05,
       -5.0548261841443504e-05, 3.1086679874847133e-06,
       -6.628358746501451e-08)


def _make_ffn_tanh6(guard: bool):
    def ffn_t6(params, x, *, activation="gelu", dropout_rate=0.0,
               activation_dropout=0.0, rng=None, dtype=None,
               activation_fp32=True):
        h = layers.linear(params["fc1"], x, dtype=dtype)
        xf = h.astype(jnp.float32)
        u = xf * xf
        p = _T6[-1]
        for c in _T6[-2::-1]:
            p = p * u + c
        if guard:
            p = jnp.maximum(p, _T6[0])
        y = xf * p
        half = 0.5 * xf
        g = (half * jnp.tanh(y) + half).astype(h.dtype)
        if "ffn_ln" in params:
            g = layers.layer_norm(params["ffn_ln"], g)
        return layers.linear(params["fc2"], g, dtype=dtype)
    return ffn_t6


def main():
    only = set((os.environ.get("GELU_VARIANTS") or
                "parity,bf16,tanh,f32mm,poly").split(","))
    print("devices:", jax.devices(), flush=True)
    t = {}
    if "parity" in only:
        t["parity"] = measure("parity fp32 erf-gelu", make_cfg())
    if "bf16" in only:
        t["bf16"] = measure("act_bf16 (activation_fp32=False)",
                            make_cfg(activation_fp32=False))
    if "tanh" in only:
        t["tanh"] = measure("tanh_fp32 (gelu_tanh, fp32 path)",
                            make_cfg(activation="gelu_tanh"))
    real_ffn = dec.ffn
    if "f32mm" in only:
        dec.ffn = ffn_f32mm
        t["f32mm"] = measure("f32mm_gelu (preferred_element_type=f32 fc1)",
                             make_cfg())
    if "poly" in only:
        dec.ffn = ffn_poly
        t["poly"] = measure("poly_gelu (deg-9 clamped poly, SPEED probe)",
                            make_cfg())
    if "tanh6raw" in only:
        dec.ffn = _make_ffn_tanh6(guard=False)
        t["tanh6raw"] = measure("tanh6_raw (6-term poly + tanh, NO guard; "
                                "wrong tails — cost probe)", make_cfg())
    if "tanh6guard" in only:
        dec.ffn = _make_ffn_tanh6(guard=True)
        t["tanh6guard"] = measure("tanh6_guard (+ max(p, c0))", make_cfg())
    dec.ffn = real_ffn
    if "fast" in only:
        t["fast"] = measure("gelu_fast (ops/fast_gelu current impl)",
                            make_cfg(activation="gelu_fast"))
    base = t.get("parity")
    if base:
        print("deltas vs parity: " + ", ".join(
            f"{k} {(base - v) * 1e3:+.1f} ms" for k, v in t.items()
            if k != "parity"), flush=True)


if __name__ == "__main__":
    main()
