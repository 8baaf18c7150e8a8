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


def hyperplane_bucket(n_planes: int, v: Column | str = "v") -> Column:
    """Sign-bucket string over ``n_planes`` md5-derived random
    hyperplanes, computed per row (r13, guide §2.4): one nested
    transform over p = 0..n_planes-1 folding dot(plane_p, v). The
    previous idiom — crossJoin with a plane table + groupBy(vec_id, v)
    reassembling signs with array_sort(collect_list(...)) — exchanged
    an n_planes×-exploded copy of every vector and hashed the full
    64-double array as a group key; this form has zero exchanges and
    produces bit-identical buckets (same md5 plane derivation, same
    sign expression, same p order)."""
    vc = v if isinstance(v, Column) else F.col(v)

    def _proj(p: Column) -> Column:
        plane_vec = F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.instr(
                F.lit(HEX),
                F.substring(
                    F.md5(F.concat(F.lit("plane"), p, F.lit("_"), i)), 1, 1
                ),
            ).cast("double")
            - 8.5,
        )
        return F.aggregate(
            F.zip_with(plane_vec, vc, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda p: F.when(_proj(p.cast("int")) >= 0, "1").otherwise("0"),
        ),
        "",
    )


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


MINHASH_MOD = 4294967296  # 2^32: the double-hashing value domain


def minhash_array(sh: Column, perms: int) -> Column:
    """Per-row MinHash signature with Kirsch–Mitzenmacher double
    hashing: each shingle is md5'd ONCE, the digest split into two
    32-bit halves (h1, h2), and "permutation" p hashes the shingle as
    (h1 + p·h2) mod 2^32 — the standard construction for deriving a
    hash family from one base hash (Kirsch & Mitzenmacher, "Less
    Hashing, Same Performance"). mh[p] = min over shingles, rendered
    as a decimal string so band signatures concatenate unchanged.
    Empty-shingle inputs yield a NULL signature (callers drop).

    No row explosion, no shuffle: at 100 TB the signature build is a
    pure map stage, and the md5 count is |shingles|, not
    |shingles|·perms (the previous salted-md5-per-perm form — 12x
    fewer digest computations at 12 perms; the per-perm work is an
    integer multiply-add). Expression shape matters: the (h1, h2)
    pairs are the INPUT of a single F.aggregate fold carrying an
    array of running minima, because a nested
    transform(perms, p -> min(transform(sh, hash(s, p)))) re-evaluates
    the inner md5 array once per outer element — higher-order-function
    arguments are not common-subexpression-eliminated.
    MATERIALIZE the result as a column before deriving band
    signatures — referencing it inside another lambda re-evaluates
    all perms per band element.
    """
    pairs = F.transform(
        sh,
        lambda s: F.struct(
            F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long").alias("h2"),
        ),
    )
    pseq = F.sequence(F.lit(0).cast("long"), F.lit(perms - 1).cast("long"))
    mins = F.aggregate(
        pairs,
        F.array_repeat(F.lit(MINHASH_MOD).cast("long"), perms),
        lambda acc, x: F.zip_with(
            acc,
            pseq,
            lambda m, p: F.least(m, (x["h1"] + p * x["h2"]) % MINHASH_MOD),
        ),
    )
    return F.when(F.size(sh) > 0, F.transform(mins, lambda m: m.cast("string")))


def band_sigs(mh: Column, perms: int, bands: int) -> Column:
    """Band signatures from a materialized minhash array: band b joins
    its perms/bands row minhashes with '|' (order = permutation id)."""
    r = perms // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.array_join(F.slice(mh, b * r + 1, r), "|"),
    )


def sql_minhash_ctes(perms: int) -> str:
    """DuckDB mirror of minhash_array() as two CTE bodies (caller
    splices them after a ``posting(doc_id, s)`` CTE): ``hashed`` md5s
    each shingle once into 32-bit halves, ``minhash`` takes the
    per-permutation double-hash minima — same Kirsch–Mitzenmacher
    family, bit-identical values."""
    return f"""
        hashed AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS h1,
                   CAST(('0x' || substr(md5(s), 9, 8)) AS BIGINT) AS h2
            FROM posting
        ),
        minhash AS (
            SELECT doc_id, p,
                   CAST(MIN((h1 + p * h2) % {MINHASH_MOD}) AS VARCHAR) AS mh
            FROM hashed, (SELECT unnest(range({perms})) AS p)
            GROUP BY doc_id, p
        )"""


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
