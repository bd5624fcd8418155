"""Legacy text emitters reproducing the reference's file formats.

Pairs-file row grammar (parsed by /root/reference/app/MatchReview.py:182-228):

    weight  id_rec  id_mem  <blocking field values...> ?   ~ <rec match values> ~ <mem match values>

with the separator constant ``"?   ~"`` (app/MatchReview.py:68), ``~``
splitting the rec/mem halves (:213), weights printed to 3dp (+ stripped on
parse, :198-202), and ``****`` lines separating blocking-pass sections
(:141-142). Combined files prefix rows with ``bp:NN`` (:588-620); the
good-pairs file is ``blkpass weight(rjust 9) id_rec id_mem``
(app/MatchReview.py:580).

All emitters are Column expressions — the legacy bytes are produced
distributed and written with ``spark.write.text``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigmatch_utilities_spark.config import BlockingPassSpec

SEPARATOR = "?   ~"
SECTION_LINE = "*" * 40


def pairs_row(
    spec: BlockingPassSpec, with_pass_prefix: bool = False, signed: bool = False
) -> Column:
    """Render one scored candidate pair to the legacy row layout.

    ``signed=True`` prints ``+`` on positive weights for byte-identical
    compatibility with raw engine output (the review tool strips the sign
    on parse, app/MatchReview.py:198-202 ``weight.replace("+", "")``);
    the default unsigned form matches the post-processed files."""
    parts: list[Column] = []
    if with_pass_prefix:
        parts.append(
            F.concat(F.lit("bp:"), F.lpad(F.col("pass_id").cast("string"), 2, "0"))
        )
    fmt = "%+.3f" if signed else "%.3f"
    parts.append(F.format_string(fmt, F.col("weight")))  # no 1,234 grouping
    parts.append(F.col("id_rec").cast("string"))
    parts.append(F.col("id_mem").cast("string"))
    for bf in spec.block_fields:
        parts.append(F.coalesce(F.col(f"bk_{bf.name}").cast("string"), F.lit("")))
    parts.append(F.lit(SEPARATOR))
    rec_vals = [
        F.coalesce(F.col(f"rec_{mf.name}").cast("string"), F.lit(""))
        for mf in spec.match_fields
    ]
    mem_vals = [
        F.coalesce(F.col(f"mem_{mf.name}").cast("string"), F.lit(""))
        for mf in spec.match_fields
    ]
    parts.append(F.concat_ws(" ", *rec_vals))
    parts.append(F.lit("~"))
    parts.append(F.concat_ws(" ", *mem_vals))
    return F.concat_ws("  ", *parts)


def write_pairs_file(
    scored: DataFrame, spec: BlockingPassSpec, path: str, pass_id: int,
    signed: bool = False,
) -> None:
    """One pass's ``...Pairs_NN.dat`` analog: weight-descending rows
    (cleanpairs:36 sorts -r before key extraction)."""
    (
        scored.filter(F.col("pass_id") == pass_id)
        .orderBy(F.col("weight").desc())
        .select(pairs_row(spec, signed=signed).alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def good_pairs_row() -> Column:
    """Combined exact+accepted row: ``blkpass weight(rjust 9) id_rec id_mem``
    (app/MatchReview.py:580)."""
    return F.concat_ws(
        " ",
        F.col("pass_id").cast("string"),
        F.lpad(F.format_string("%.3f", F.col("weight")), 9, " "),
        F.col("id_rec").cast("string"),
        F.col("id_mem").cast("string"),
    )


def combine_pairs_text(per_pass: list[tuple[int, DataFrame, BlockingPassSpec]]) -> DataFrame:
    """The combined review file: ``bp:NN``-prefixed rows with ``****``
    section separators between passes (app/MatchReview.py:588-620)."""
    out: DataFrame | None = None
    for pass_id, df, spec in per_pass:
        rows = (
            df.filter(F.col("pass_id") == pass_id)
            .orderBy(F.col("weight").desc())
            .select(pairs_row(spec, with_pass_prefix=True).alias("value"))
        )
        sep = df.sparkSession.createDataFrame([(SECTION_LINE,)], ["value"])
        block = rows.unionAll(sep)
        out = block if out is None else out.unionAll(block)
    return out


KEY_WIDTH = 28  # cleanpairs:37 `cut -c 1-28`


def cleanpairs_keys(
    per_pass: list[tuple[int, DataFrame, BlockingPassSpec]], signed: bool = False
) -> DataFrame:
    """The reference ``cleanpairs`` keys pipeline (cleanpairs:29-44) as a
    DataFrame: per pass, render the legacy pairs rows, byte-sort them
    descending (``sort -r`` under LC_ALL=C — Spark's UTF8String binary
    comparison agrees for these ASCII rows), keep the first 28 characters
    (``cut -c 1-28``; shorter lines pass through whole) and append the
    `` Pass_P`` tag with P unpadded (the zero-pad in the script is the
    *filename* W, not the tag). Returns ``(pass_id, value)`` rows;
    within-pass order is the byte-descending sort order."""
    out: DataFrame | None = None
    for pass_id, df, spec in per_pass:
        rows = (
            df.filter(F.col("pass_id") == pass_id)
            .select(pairs_row(spec, signed=signed).alias("line"))
            .select(
                F.lit(pass_id).alias("pass_id"),
                F.concat(
                    F.substring(F.col("line"), 1, KEY_WIDTH),
                    F.lit(f" Pass_{pass_id}"),
                ).alias("value"),
                F.col("line").alias("_sort"),
            )
        )
        out = rows if out is None else out.unionAll(rows)
    assert out is not None, "cleanpairs_keys needs at least one pass"
    return out.orderBy("pass_id", F.col("_sort").desc()).drop("_sort")


def write_cleanpairs_keys(
    per_pass: list[tuple[int, DataFrame, BlockingPassSpec]],
    path: str,
    signed: bool = False,
) -> None:
    """Byte-exact ``keys.dat`` golden-file egress: passes concatenated in
    order, each byte-sorted descending. Driver-side single-file assembly
    (like `sas_to_text`, this exists only for legacy byte compatibility;
    the distributed form is `cleanpairs_keys`)."""
    keys = cleanpairs_keys(per_pass, signed=signed)
    with open(path, "w") as fh:
        for row in keys.toLocalIterator():
            fh.write(row["value"] + "\n")


def segment_compare(rec: Column, mem: Column) -> Column:
    """C5: tokenize both sides on spaces; per-token case-insensitive
    equality verdicts (the review GUI's black/red coloring,
    app/MatchReview.py:1411-1475) as an array<struct<rec,mem,same>>."""
    rt = F.split(F.trim(rec), " +")
    mt = F.split(F.trim(mem), " +")
    return F.zip_with(
        rt,
        mt,
        lambda a, b: F.struct(
            a.alias("rec"), b.alias("mem"), (F.lower(a) == F.lower(b)).alias("same")
        ),
    )
