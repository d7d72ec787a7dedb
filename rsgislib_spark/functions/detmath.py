"""Deterministic natural-log trees (cross-engine bit-exact).

libm ``log`` differs JVM/numpy-vs-DuckDB in the last ulp on a fraction
of inputs (NOTES determinism lesson 3), so operators whose reference
semantics need a logarithm (thermal brightness temperature,
Bhattacharyya / Jeffries-Matusita distances, Yen/Li/cross-entropy
thresholds) cannot pass the exact-hash gate through ``ln``.  This
module provides a pinned expression tree that BOTH engines evaluate
op-for-op:

    x = m * 2^e           (exact binade decomposition of the double)
    s = m*2, k = e-1;  if s >= sqrt(2): s = s*0.5, k += 1
    t = (s - 1)/(s + 1)                   # |t| <= 0.1716
    ln(x) = k*LN2 + t * P(t^2)            # atanh series, 12 terms

Every step is an IEEE correctly-rounded primitive (or exact: power-of-
two scaling, s-1 by Sterbenz) on identical inputs, so the result is
bit-identical across engines; accuracy vs true ln is < 1e-15 relative
(pytest-checked).  The numpy side uses ``np.frexp`` (exact); the SQL
side finds the binade with an exact-comparison CASE ladder over
driver-emitted 2^k literals — equivalent for every double in the
declared domain, including exact powers of two (pytest-checked on the
boundaries).

The SQL form repeats the argument expression O(bits) times — ALWAYS
bind the argument to a CTE column first (NOTES perf lesson 14).
"""
import math

import numpy as np

from ..geo.transverse_mercator import dlit

__all__ = ["LN2", "ln_pos_np", "ln_steps", "ln_chain_sql", "LN_SERIES"]

LN2 = math.log(2.0)

# atanh series coefficients 2/(2i+1), i = 0..11 — |t| <= 0.1716 makes
# the truncated tail < 1e-19 relative
LN_SERIES = tuple(2.0 / (2 * i + 1) for i in range(12))

_SQRT2 = math.sqrt(2.0)


def ln_pos_np(x):
    """Vectorized pinned-tree ln over positive float64 (numpy twin)."""
    x = np.asarray(x, dtype=np.float64)
    m, e = np.frexp(x)            # x = m * 2^e, m in [0.5, 1) — exact
    s = m * 2.0                   # [1, 2) — exact
    k = e.astype(np.float64) - 1.0
    hi = s >= _SQRT2
    s = np.where(hi, s * 0.5, s)  # exact halving
    k = np.where(hi, k + 1.0, k)
    t = (s - 1.0) / (s + 1.0)
    u = t * t
    p = np.full_like(t, LN_SERIES[-1])
    for c in LN_SERIES[-2::-1]:
        p = p * u + c
    return k * LN2 + t * p


def ln_steps(x: str, out: str, lo: int = -4, hi: int = 44):
    """SQL twin of :func:`ln_pos_np` for ``x`` in [2^lo, 2^hi) as a
    list of chained column definitions ``[(colname, expr), ...]``
    ending with ``out`` = ln(x).

    A single-expression form would repeat the binade ladder inside the
    12-term Horner chain (hundreds of KB of SQL — NOTES perf lesson
    14), so callers materialise each step as a CTE column:

        steps = ln_steps("arg", "lnarg")
        sql = prev
        for name, expr in steps:
            sql = f"SELECT *, {expr} AS {name} FROM ({sql})"

    or the equivalent chained-CTE spelling.  ``x`` must be a short
    column reference; every intermediate is referenced by name only.
    """
    # k such that 2^k <= x < 2^(k+1), exact double comparisons
    ladder = f"CAST({lo} AS DOUBLE)"
    for k in range(lo + 1, hi + 1):
        ladder = (f"CASE WHEN {x} >= {dlit(2.0 ** k)} "
                  f"THEN CAST({k} AS DOUBLE) ELSE {ladder} END")
    steps = [
        (f"{out}_k0", f"({ladder})"),
        (f"{out}_s0",
         f"({x} * pow(CAST(2 AS DOUBLE), "
         f"CAST(0 AS DOUBLE) - {out}_k0))"),
        (f"{out}_s",
         f"(CASE WHEN {out}_s0 >= {dlit(_SQRT2)} "
         f"THEN {out}_s0 * CAST(0.5 AS DOUBLE) ELSE {out}_s0 END)"),
        (f"{out}_kk",
         f"(CASE WHEN {out}_s0 >= {dlit(_SQRT2)} "
         f"THEN {out}_k0 + CAST(1 AS DOUBLE) ELSE {out}_k0 END)"),
        (f"{out}_t",
         f"(({out}_s - CAST(1 AS DOUBLE)) "
         f"/ ({out}_s + CAST(1 AS DOUBLE)))"),
        (f"{out}_u", f"({out}_t * {out}_t)"),
    ]
    p = dlit(LN_SERIES[-1])
    for c in LN_SERIES[-2::-1]:
        p = f"({p} * {out}_u + {dlit(c)})"
    steps.append((out, f"({out}_kk * {dlit(LN2)} + {out}_t * {p})"))
    return steps


def ln_chain_sql(inner: str, x: str, out: str,
                 lo: int = -4, hi: int = 44) -> str:
    """Wrap SELECT ``inner`` with the :func:`ln_steps` projections."""
    sql = inner
    for name, expr in ln_steps(x, out, lo, hi):
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql


# ---------------------------------------------------------------- exp
# Pinned natural-exp tree (the ln tree's inverse-direction twin, added
# for the GMM-EM operators whose per-round Gaussian densities feed
# integer quantisation — a last-ulp libm exp difference would flip the
# floor at a bin boundary).  Construction:
#
#     k = floor(x/LN2 + 0.5)          (nearest binade, exact floor)
#     r = x - k*LN2                   (|r| <= LN2/2 + 1 ulp)
#     exp(x) = 2^k * P(r)             (Taylor sum_{n=0}^{13} r^n/n!)
#
# x/LN2, k*LN2, the Horner chain and the final product are all single
# IEEE correctly-rounded primitives on identical inputs; 2^k is exact
# (ldexp / pow-of-two).  Truncation r^14/14! < 5e-18 relative.
# Domain: |x| <= 700 (k in [-1011, 1011], 2^k normal).

#: Taylor 1/n! coefficients for exp(r), n = 0..13
EXP_SERIES = tuple(1.0 / math.factorial(n) for n in range(14))

__all__ += ["EXP_SERIES", "exp_np", "exp_steps", "exp_chain_sql"]


def exp_np(x):
    """Vectorized pinned-tree exp over float64 |x| <= 700 (numpy twin)."""
    x = np.asarray(x, dtype=np.float64)
    k = np.floor(x / LN2 + 0.5)
    r = x - k * LN2
    p = np.full_like(r, EXP_SERIES[-1])
    for c in EXP_SERIES[-2::-1]:
        p = p * r + c
    return p * np.ldexp(1.0, k.astype(np.int64))


def exp_steps(x: str, out: str):
    """SQL twin of :func:`exp_np` as chained column definitions
    ``[(colname, expr), ...]`` ending with ``out`` = exp(x).  Unlike
    :func:`ln_steps` the binade index is a direct arithmetic formula
    (no comparison ladder), so the chain is four projections.  ``x``
    must be a short column reference."""
    steps = [
        (f"{out}_k", f"floor({x} / {dlit(LN2)} + CAST(0.5 AS DOUBLE))"),
        (f"{out}_r", f"({x} - {out}_k * {dlit(LN2)})"),
    ]
    p = dlit(EXP_SERIES[-1])
    for c in EXP_SERIES[-2::-1]:
        p = f"({p} * {out}_r + {dlit(c)})"
    steps.append((out,
                  f"({p} * pow(CAST(2 AS DOUBLE), {out}_k))"))
    return steps


def exp_chain_sql(inner: str, x: str, out: str) -> str:
    """Wrap SELECT ``inner`` with the :func:`exp_steps` projections."""
    sql = inner
    for name, expr in exp_steps(x, out):
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql
