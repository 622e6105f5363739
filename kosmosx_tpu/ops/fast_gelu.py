"""Polynomial-precise erf-gelu: fp32-faithful accuracy without XLA's erf.

The flagship decoder spends 34.1 ms/forward (10.2%, BASELINE.md decoder
anatomy) in the FFN's fp32 erf-gelu — and the gelu-variant study showed the
cost is XLA's erf lowering itself (branchy polynomial + exp + divide on the
VPU), not the fp32 cast. But every erf implementation IS an approximation;
XLA's is just tuned for full generic-erf accuracy. The gelu only needs
Φ(x) = 0.5·(1 + erf(x/√2)) to absolute fp32-level accuracy, so a
purpose-fit approximation evaluates the SAME function much cheaper.

Form (every choice measured on-chip, BASELINE.md gelu study):

    Φ(x) ≈ 0.5·(1 + tanh(x · max(P(x²), Q(x²))))

- ``P``: the classic tanh-gelu SHAPE with the inner polynomial extended
  from the textbook 2 terms to a 6-term Lawson-iterated minimax fit on
  [0, 5.45]: max |Φ̂ − Φ| = 2.8e-7 in fp64 (textbook coefficients: 1.4e-4).
- ``Q(u) = 0.1·u − 1.5691``: a linear-in-x² guard anchored to P at the fit
  edge (max(P,Q) = P exactly on the fit range). Beyond the edge the
  unconstrained fit's y = x·P decays and would de-saturate the tanh
  (3.4e-4 error at |x| ≈ 6.15 without the guard); the guard forces
  y ≥ 0.1|x|³ − 1.57|x| there, so the tanh saturates and gelu(x) returns
  exactly x (or 0) for all large |x| — including ±inf, with no NaN lanes.
- No clamps or selects: a compare+select pair measured ~2 ms EACH on the
  flagship forward (they break XLA's elementwise fusion), while the five
  extra FMAs vs the textbook tanh-gelu are nearly free. ``max`` is a
  single fused VPU op.

Measured accuracy (tests/test_fast_gelu.py): max abs error vs fp64
erf-gelu is 1.19e-6 over the ENTIRE finite-bf16 input domain (65,280
values, tested by enumeration) and 1.43e-6 over a dense fp32 grid of
[-40, 40] — ~200× closer to the true function than the tanh-approx gelu
(3e-4, which flips 397 bf16 outputs; a true fp32 libm erf lands ~4e-7 on
the same test). This is a cheaper erf evaluation for the same model, not a
different activation.

Parity: the torch-oracle logits test passes at the repo's 1e-4 fp32 bar
with this implementation (tests/test_torch_parity.py::
test_fast_gelu_holds_oracle_parity). The reference runs torch's erf-gelu
(torchscale ``activation_fn(x.float())``); torch's libm erf, XLA's erf,
and this fit all sit at small finite distances from the true function.

Measured speed: 27.7 ms off the batch-6 flagship decoder forward (of the
34.1 ms erf total) — see BASELINE.md.
"""

from __future__ import annotations

import jax.numpy as jnp

# 6-term minimax fit of P such that 0.5(1+tanh(x·P(x²))) ≈ Φ(x) on
# [0, 5.45]; Lawson-iterated least squares in fp64, max Φ-err 2.836e-7.
_C = (
    0.7978828682178812,
    0.036343200198652635,
    -4.3983891272934235e-05,
    -5.0548261841443504e-05,
    3.1086679874847133e-06,
    -6.628358746501451e-08,
)
# linear guard Q(u) = _QE·u + _QF, anchored to P at u = 5.45² so that
# max(P, Q) == P on the whole fit range
_QE = 0.1
_QF = -1.569069562707193


def gelu_fast(x):
    """x · Φ(x) with max abs error < 2e-6 over the finite-bf16 domain.

    Computes in fp32 regardless of input dtype (matching the torchscale
    ``.float()`` discipline) and casts back to the input dtype.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    u = xf * xf
    p = _C[-1]
    for c in _C[-2::-1]:
        p = p * u + c
    p = jnp.maximum(p, _QE * u + _QF)
    y = xf * p
    half = 0.5 * xf
    return (half * jnp.tanh(y) + half).astype(dtype)
