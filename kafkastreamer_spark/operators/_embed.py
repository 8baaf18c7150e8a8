"""Shared vector/text expression builders for the operator library.

All cross-engine-deterministic: dot products are sequential left folds
over the array (Spark ``F.aggregate`` ≡ DuckDB ``list_dot_product`` on
DOUBLE[], verified bit-exact), and pseudo-random projections derive
from md5 (identical hex output in both engines) rather than any
engine-specific hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def as_double_array(col) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (bit-exact vs DuckDB
    list_dot_product on DOUBLE[])."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def tokens(text_col) -> Column:
    """Whitespace tokenization of lowercased text (parity with DuckDB
    string_split_regex(lower(text), '\\s+'))."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.split(F.lower(c), r"\s+")


SQL_TOKENS = "string_split_regex(lower(text), '\\s+')"


def shingles(words: Column, n: int = 3) -> Column:
    """Distinct word n-grams. Empty when the doc has < n words
    (sequence() would go descending — guarded by the when)."""
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_array(sh: Column, perms: int) -> Column:
    """Per-row MinHash signature: mh[p] = min over shingles of
    md5(shingle # p) — array_min over a transform, no row explosion,
    no shuffle. Empty-shingle docs yield null mins (callers drop).

    This is the shuffle-free form of the classic explode + groupBy
    minhash: at 100 TB the signature build becomes a pure map stage.
    MATERIALIZE the result as a column before deriving band
    signatures — referencing it inside another lambda re-evaluates
    all perms per band element.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(perms - 1)),
        lambda p: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(s, F.lit("#"), p.cast("string"))))
        ),
    )


def band_sigs(mh: Column, perms: int, bands: int) -> Column:
    """Band signatures from a materialized minhash array: band b joins
    its perms/bands row minhashes with '|' (order = permutation id)."""
    r = perms // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.array_join(F.slice(mh, b * r + 1, r), "|"),
    )


def sql_shingles(words_var: str = "w", n: int = 3) -> str:
    """DuckDB mirror of shingles(); expects a list column named
    ``words_var`` in scope (1-based list indexing). range(a,b) is
    half-open and returns empty when b <= a, matching the <n-words
    guard on the Spark side."""
    parts = "||' '||".join(f"{words_var}[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, len({words_var}) - {n - 2}),"
        f" i -> {parts}))"
    )
