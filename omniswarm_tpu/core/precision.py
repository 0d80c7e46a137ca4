"""Matmul-precision control for the estimation stack.

JAX's DEFAULT matmul precision runs f32 contractions through reduced
(bf16-grade) multiplier passes — measured ~2e-3 relative error on a plain
64x64 f32 matmul in this environment, on both the TPU MXU and the CPU
backend. That is fine for the CNN frontend (which wants the fast path) but
poisons the solver: Hessian assembly einsums, cyclic-reduction corrections,
Newton-Schulz inverses, and iterative-refinement residuals all lose ~10 bits
and the refinement loop stops contracting.

``highp`` scopes HIGHEST precision (true f32 accumulation; 3-pass bf16 on
the MXU) over a function body at trace time. Applied to every solver entry
point; the frontend models keep the fast default. The reference runs Ceres
in float64 (SURVEY §7 numerics note) — full f32 is the minimum we can get
away with for centimeter-level ATE.
"""
from __future__ import annotations

import functools

import jax


def highp(fn):
    """Decorator: trace ``fn`` under HIGHEST matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
