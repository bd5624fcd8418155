"""Fixed-width flat-file source/sink (the reference's native data model).

The reference stores every record as one fixed-length line; fields are
(1-based start_pos, width) substrings declared in an external dictionary CSV
(/root/reference/app/BlockingPass.py:179-219, samplefiles/*.dict.csv).
Spark-side this is a single ``spark.read.text`` scan plus a pure-projection
``F.substring`` select — column pruning and whole-stage codegen apply, no
Python executes per row.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigmatch_utilities_spark.config import DictField


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: list[DictField],
    trim: bool = True,
) -> DataFrame:
    """Read a fixed-width file into named string columns.

    Blanks are pad spaces in the reference model (no nulls); ``trim=True``
    strips both sides (left-justified strings AND right-justified numerics,
    e.g. the id column of the gs samples) so '' means "blank field" — the
    reference's own parsers whitespace-split values the same way.
    """
    raw = spark.read.text(path)
    cols = []
    for f in fields:
        c = F.substring(F.col("value"), f.start_pos, f.width)
        if trim:
            c = F.trim(c)
        cols.append(c.alias(f.name))
    return raw.select(*cols)


def fixed_width_line(fields: list[DictField]) -> Column:
    """Column expression rendering a row back to its fixed-width line."""
    parts = [F.rpad(F.coalesce(F.col(f.name), F.lit("")), f.width, " ") for f in fields]
    return reduce(lambda a, b: F.concat(a, b), parts)


def write_fixed_width(df: DataFrame, path: str, fields: list[DictField]) -> None:
    """Write a DataFrame as a fixed-width text file (legacy egress,
    ≈ the padded writers at /root/reference/app/RDBMS_Read_Export_UI.py:223-241)."""
    df.select(fixed_width_line(fields).alias("value")).write.mode("overwrite").text(path)


def infer_widths(df: DataFrame, columns: list[str] | None = None) -> dict[str, int]:
    """Column-width discovery for CSV→fixed-width conversion.

    The reference rescans the whole file once *per column*
    (/root/reference/dev/Textfile.py:101-113); here it is one distributed
    aggregate pass over all columns.
    """
    columns = columns or df.columns
    aggs = [
        F.max(F.length(F.coalesce(F.col(c).cast("string"), F.lit("")))).alias(c)
        for c in columns
    ]
    row = df.agg(*aggs).collect()[0]
    return {c: max(int(row[c] or 1), 1) for c in columns}


def csv_to_fixed_width(
    spark: SparkSession,
    csv_path: str,
    out_path: str,
    header: bool = True,
) -> list[DictField]:
    """CSV → fixed-width converter + auto-generated dictionary
    (≈ /root/reference/dev/Textfile.py:38-194). Returns the generated dict."""
    df = spark.read.csv(csv_path, header=header)
    widths = infer_widths(df)
    fields = []
    pos = 1
    for c in df.columns:
        fields.append(DictField(name=c, start_pos=pos, width=widths[c]))
        pos += widths[c]
    write_fixed_width(df.na.fill(""), out_path, fields)
    return fields


def widen_column(
    df: DataFrame, fields: list[DictField], column: str, new_width: int
) -> tuple[DataFrame, list[DictField]]:
    """Grow a field in place (≈ widen_column_in_fixed_width_textfile,
    /root/reference/dev/Textfile.py:232-274) — columnar, it's a no-op on the
    data; only the layout changes."""
    new_fields: list[DictField] = []
    pos = 1
    for f in fields:
        w = new_width if f.name == column else f.width
        new_fields.append(
            DictField(
                name=f.name,
                start_pos=pos,
                width=w,
                is_unique_id=f.is_unique_id,
                is_match_field=f.is_match_field,
                bigmatch_type=f.bigmatch_type,
                data_format=f.data_format,
            )
        )
        pos += w
    return df, new_fields
