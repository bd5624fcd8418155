"""Privacy-preserving record linkage (PPRL): Bloom-filter field encodings.

The census linkage workflow the reference tooling wraps
(`/root/reference/README.md:1-6` — BigMatch runs over raw identifiers)
assumes both files may hold cleartext names; when one party cannot share
identifiers, the standard remedy is the Schnell–Bachteler–Reiher Bloom
filter encoding (Schnell, Bachteler & Reiher 2009, "Privacy-preserving
record linkage using Bloom filters", BMC Med Inform Decis Mak 9:41; the
CLK variant of Schnell et al. 2011): each quasi-identifier is split into
character bigrams, every bigram sets k bits in an m-bit Bloom filter, and
similarity between two encodings is the Dice coefficient of their bit
sets — a monotone proxy for bigram Jaccard that never reveals the
underlying string.  The encoded column can then flow through the SAME
blocking / scoring / closure pipeline as any other field (Dice as a
partial-agreement comparator).

Representation: the filter is the SORTED ARRAY OF DISTINCT SET-BIT
POSITIONS (array<int>), not a packed bitmap — this keeps every step a
JVM codegen array expression (sequence/transform/flatten/array_distinct/
array_intersect) with an exact DuckDB list-function twin, supports any
m (CLK-realistic 512/1024 included, where a single BIGINT could not),
and sidesteps cross-engine sign semantics of bit 63.  A production sink
could pack positions into BINARY at the storage boundary; densities are
low (k·(len+1) candidate bits into m=512), so positions are also the
compact form.

Hashing: the k hash functions are the affine family
    h_j(bigram) = (131·ascii(c1) + 31·ascii(c2) + 97·j) mod m
over the bigram's two code points — integer arithmetic both engines
evaluate identically (the same double-hashing-style scheme the paper's
implementations use, minus cryptographic keying, which a real deployment
would add via an HMAC before this step; see the module tests for the
cross-engine pin).  Strings are lowercased, trimmed, and padded with a
leading/trailing space so first/last characters get their own bigrams;
blank values encode to the EMPTY filter (the blank_flag convention:
blanks carry no evidence — Dice of two empty filters is NULL, empty
against non-empty is 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bloom_bits(col: Column, bits: int = 512, k: int = 3) -> Column:
    """Bloom/CLK encoding of a string field: sorted distinct bit positions.

    Pure JVM expression (sequence → transform → flatten → distinct →
    sort); no UDF, no shuffle — a map-side derived column like any
    blocking key.
    """
    s = F.concat(F.lit(" "), F.lower(F.trim(col)), F.lit(" "))
    # bigram i = chars (i, i+1), i in 1..len-1 (1-based, inclusive)
    idx = F.sequence(F.lit(1), F.length(s) - F.lit(1))
    positions = F.flatten(
        F.transform(
            idx,
            lambda i: F.array(
                *[
                    (
                        (
                            F.ascii(s.substr(i, F.lit(1))) * F.lit(131)
                            + F.ascii(s.substr(i + F.lit(1), F.lit(1))) * F.lit(31)
                            + F.lit(97 * j)
                        )
                        % F.lit(bits)
                    ).cast("int")
                    for j in range(k)
                ]
            ),
        )
    )
    empty = F.array().cast("array<int>")
    return F.when(F.trim(col) == "", empty).otherwise(
        F.array_sort(F.array_distinct(positions))
    )


def bloom_bits_sql(expr: str, bits: int = 512, k: int = 3) -> str:
    """DuckDB twin of :func:`bloom_bits` (value-identical)."""
    s = f"(' ' || lower(trim({expr})) || ' ')"
    masks = ", ".join(
        f"(ascii(substring({s}, i, 1)) * 131 + "
        f"ascii(substring({s}, i + 1, 1)) * 31 + {97 * j}) % {bits}"
        for j in range(k)
    )
    return (
        f"CASE WHEN trim({expr}) = '' THEN CAST([] AS INTEGER[]) ELSE "
        f"CAST(list_sort(list_distinct(flatten(list_transform("
        f"range(1, length({s})), i -> [{masks}])))) AS INTEGER[]) END"
    )


def dice(a: Column, b: Column) -> Column:
    """Dice coefficient of two bit-position encodings (NULL if both empty).

    2·|A∩B| / (|A|+|B|) — the PPRL similarity of Schnell et al. 2009
    §Methods; array_intersect keeps everything whole-stage codegen.
    """
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return F.try_divide(2.0 * inter, (F.size(a) + F.size(b)).cast("double"))


def dice_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`dice`."""
    return (
        f"2.0 * len(list_intersect({a}, {b})) / "
        f"NULLIF(len({a}) + len({b}), 0)"
    )


def _band_positions(band: int, band_bits: int, bits: int) -> list[int]:
    """Deterministic sampled bit positions for one band — distinct within
    a band whenever gcd(37, bits) = 1 and band_bits ≤ bits (37 is odd, so
    any power-of-two m qualifies)."""
    return [(band * 97 + t * 37) % bits for t in range(band_bits)]


def bloom_band_pairs(
    df,
    id_col: str,
    field: str,
    *,
    bits: int = 512,
    k: int = 3,
    bands: int = 8,
    band_bits: int = 8,
    max_bucket: int = 2_000,
):
    """PPRL blocking: candidate pairs whose Bloom encodings agree on at
    least one band of sampled bits (Hamming-LSH bit sampling, Indyk &
    Motwani 1998, applied to Bloom-encoded PPRL as in Durham 2012 /
    Karapiperis & Verykios 2015 HLSH).

    With cleartext unavailable, none of the usual blocking keys exist —
    but two similar values' filters differ in few bits, so the chance
    they agree on ALL `band_bits` sampled positions of some band is high
    for true matches and vanishing for random pairs (the same
    band/row amplification as MinHash-LSH, over Hamming space).  Pairs
    carry `n_co` = number of agreeing bands.

    Together with :func:`bloom_bits` (encode) and the "b" comparator
    (score), this closes the fully-encoded pipeline: block → score →
    closure without any party revealing a string.

    Scale guardrails are the shared purge chain (singleton drop +
    `max_bucket` cap — an all-zero or boilerplate band key is a
    mega-bucket exactly like a blank blocking key): one map-side encode,
    `bands` projections unioned, two shuffles total.  Blank values
    encode to the empty filter and propose NOTHING (excluded before
    banding — the blank_flag convention).
    """
    from bigmatch_utilities_spark.operators.meta_blocking import (
        _purge_filter_pairs,
    )

    enc = df.select(
        F.col(id_col).alias("id"),
        bloom_bits(F.col(field), bits=bits, k=k).alias("_bb"),
    ).filter(F.size("_bb") > 0)
    parts = []
    for j in range(bands):
        key = F.concat(
            F.lit(f"{j}:"),
            *[
                F.when(F.array_contains("_bb", F.lit(p)), F.lit("1")).otherwise(
                    F.lit("0")
                )
                for p in _band_positions(j, band_bits, bits)
            ],
        )
        parts.append(enc.select("id", key.alias("block")))
    asg = parts[0]
    for part in parts[1:]:
        asg = asg.unionByName(part)
    # ratio 1.0: every agreeing band is a candidate (the per-record
    # smallest-blocks filter is an equi-blocking refinement, not an LSH
    # one — dropping a band here would break the ≥1-shared-band contract)
    return _purge_filter_pairs(asg, 1_000_000, max_bucket)


def bloom_band_pairs_sql(
    table: str,
    id_col: str,
    field: str,
    *,
    bits: int = 512,
    k: int = 3,
    bands: int = 8,
    band_bits: int = 8,
    max_bucket: int = 2_000,
) -> str:
    """DuckDB twin of :func:`bloom_band_pairs`."""
    from bigmatch_utilities_spark.operators.meta_blocking import (
        _purge_filter_pairs_sql,
    )

    bb = bloom_bits_sql(field, bits=bits, k=k)
    band_selects = []
    for j in range(bands):
        key_bits = " || ".join(
            f"(CASE WHEN list_contains(_bb, {p}) THEN '1' ELSE '0' END)"
            for p in _band_positions(j, band_bits, bits)
        )
        band_selects.append(f"SELECT id, '{j}:' || {key_bits} AS block FROM enc")
    asg_sql = f"""
        WITH enc AS (
            SELECT {id_col} AS id, {bb} AS _bb FROM {table}
        ), enc2 AS (SELECT * FROM enc WHERE len(_bb) > 0)
        {" UNION ALL ".join(s.replace("FROM enc", "FROM enc2") for s in band_selects)}
    """
    return _purge_filter_pairs_sql(asg_sql, 1_000_000, max_bucket)
