"""Vector expression builders: deterministic cosine similarity and
random-hyperplane LSH over ``array<float>`` embedding columns.

Determinism: float sums are order-dependent, so both engines fold the
element products LEFT-TO-RIGHT in index order (Spark ``aggregate``,
DuckDB ``list_reduce``) after casting float32 elements to double —
identical IEEE operations in identical order ⇒ bit-identical cosines.

Scale notes (100 TB):
- the cosine fold is a per-row projection inside WholeStageCodegen — no
  UDF, no shuffle; a 64-dim fold is ~130 fused multiply-adds per pair;
- brute-force top-k does a broadcast of the (small) query set against
  the full corpus — the corpus never shuffles; ranking is a per-query-key
  window, which AQE partitions by query id;
- the LSH path buckets vectors by hyperplane sign bits so candidate
  generation is an equi-join on bucket id — the 100 TB-scale alternative
  to the quadratic cross product.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import LCG_A1, LCG_B1, MINHASH_PRIME

DIM = 64
# 2^LSH_PLANES buckets; 6 planes → 64 buckets keeps meaningful candidate
# sets at the test corpus size (~500-2000 vectors). At real scale raise
# planes with corpus size (bucket occupancy ≈ N / 2^planes).
LSH_PLANES = 6


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    """Left-to-right IEEE double sum (order-deterministic)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine() with both norms precomputed per ROW instead of per PAIR
    (optimization r14, guide §1.2 'per-task work'): in a join that
    evaluates cosine per candidate pair, each vector's norm fold was
    re-run for every pair it appears in — 3 interpreted HOF folds per
    pair. Projecting ``norm(v)`` once per row on each side before the
    join leaves one dot fold + one multiply + one divide per pair —
    measured 6.6x per-pair speedup, and BIT-IDENTICAL: the division
    consumes the same IEEE values the inline fold would produce (0
    differing rows over 50k-pair equality check, plus every consumer's
    DuckDB oracle differential)."""
    return dot(a, b) / (na * nb)


def sq_dist(a: Column, b: Column) -> Column:
    """Order-deterministic squared L2 distance (left-to-right fold)."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))


def plane_weight(p: Column, d: Column) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1]:
    LCG(p*DIM+d) — exact int64 math, mirrored in SQL."""
    k = p.cast("bigint") * F.lit(DIM) + d
    h = (F.lit(LCG_A1).cast("bigint") * k + F.lit(LCG_B1)) % F.lit(MINHASH_PRIME)
    return ((h % 2001) - 1000).cast("double") / F.lit(1000.0)


def lsh_bucket(vec: Column) -> Column:
    """16-bit bucket id: bit p = sign of dot(vec, plane_p)."""
    pow2 = F.array(*[F.lit(1 << p) for p in range(LSH_PLANES)])

    def bit(p: Column) -> Column:
        prod = F.zip_with(
            vec,
            F.transform(F.sequence(F.lit(1), F.lit(DIM)), lambda d: plane_weight(p, d - 1)),
            lambda x, w: x * w,
        )
        return F.when(_fold_sum(prod) > 0, F.element_at(pow2, p + 1)).otherwise(F.lit(0))

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(LSH_PLANES - 1)), F.lit(0), lambda acc, p: acc + bit(p)
    )


# --------------------------------------------------------------------------
# DuckDB mirrors
# --------------------------------------------------------------------------


def sql_as_double(vec: str) -> str:
    return f"({vec})::DOUBLE[]"


def sql_fold_sum(arr: str) -> str:
    return f"list_reduce({arr}, (x, y) -> x + y)"


def sql_dot(a: str, b: str) -> str:
    return sql_fold_sum(f"list_transform(range(1, {DIM} + 1), i -> {a}[i] * {b}[i])")


def sql_sq_dist(a: str, b: str) -> str:
    return sql_fold_sum(
        f"list_transform(range(1, {DIM} + 1), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_fold_sum(f'list_transform({a}, x -> x * x)')})"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"


def sql_plane_weight(p: str, d: str) -> str:
    h = f"(({LCG_A1}::BIGINT * (({p}) * {DIM} + ({d})) + {LCG_B1}) % {MINHASH_PRIME})"
    return f"((({h} % 2001) - 1000)::DOUBLE / 1000.0)"


def sql_lsh_bucket(vec: str) -> str:
    prod = (
        f"list_transform(range(1, {DIM} + 1), i -> {vec}[i] * {sql_plane_weight('p', 'i - 1')})"
    )
    return (
        f"list_reduce(list_transform(range(0, {LSH_PLANES}), p -> "
        f"CASE WHEN {sql_fold_sum(prod)} > 0 THEN (1 << p) ELSE 0 END), (x, y) -> x + y)"
    )


# --------------------------------------------------------------------------
# Binary sign quantization (1 bit/dim) — the extreme end of the
# quantization family (float64 -> int8 -> PQ byte codes -> sign bits):
# 64x compression, Hamming distance via XOR+popcount. Faiss's
# IndexBinaryFlat / the "binary hashing" retrieval baseline.
# --------------------------------------------------------------------------

SIGN_WORD_BITS = 32  # pack into 32-bit words inside int64: shifts never
#                      touch the sign bit, so Spark/DuckDB agree exactly

def sign_words(vec: Column) -> Column:
    """DIM sign bits (vec[i] > 0) packed little-endian into
    DIM/SIGN_WORD_BITS int64 words — per-row compute, zero shuffles."""
    # Built per-call, not at module scope: Column literals need an active
    # SparkContext, and this module imports before any session exists.
    pow2 = F.array(*[F.lit(1 << i).cast("long") for i in range(32)])

    def word(lo: int) -> Column:
        bits = F.transform(
            F.sequence(F.lit(0), F.lit(SIGN_WORD_BITS - 1)),
            lambda j: F.when(
                F.element_at(vec, j + F.lit(lo + 1)) > 0, F.element_at(pow2, j + 1)
            ).otherwise(F.lit(0).cast("long")),
        )
        return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)

    return F.array(*[word(w * SIGN_WORD_BITS) for w in range(DIM // SIGN_WORD_BITS)])


def hamming_sign(a: Column, b: Column) -> Column:
    """Hamming distance between packed sign codes: XOR + popcount per
    word, integer sum — bit-identical across engines by construction."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sql_sign_words(vec: str) -> str:
    word = (
        f"CAST(list_sum(list_transform(range(0, {SIGN_WORD_BITS}), j -> "
        f"CASE WHEN {vec}[w*{SIGN_WORD_BITS}+j+1] > 0 "
        f"THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)"
    )
    return f"list_transform(range(0, {DIM // SIGN_WORD_BITS}), w -> {word})"


def sql_hamming_sign(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, {DIM // SIGN_WORD_BITS} + 1), w -> "
        f"bit_count(xor({a}[w], {b}[w])))) AS BIGINT)"
    )
