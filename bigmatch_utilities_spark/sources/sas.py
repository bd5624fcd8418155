"""SAS dataset ingest (SURVEY §2.1 S4).

The reference converts SAS7BDAT files to tab-delimited text with a vendored
pure-python reader (``ConvertFile_Model.convert_sas_to_text``,
/root/reference/app/ConvertFile.py:114-122, lib at
app/ch_lib/sas7bdat_py3/sas7bdat.py). Here the decode is delegated to
``pandas.read_sas`` (sas7bdat + xport, stdlib-free, baked into the image)
and the distribution is Spark's:

* small files: one driver-side chunked read → ``spark.createDataFrame``
  (Arrow path) — the SAS binary format is not splittable, so a single
  sequential decode mirrors what any engine must do;
* many files: ``read_sas_dir`` parallelizes ACROSS files — each executor
  task decodes whole files via ``mapInPandas`` over a file-list DataFrame,
  which is the only scalable axis for a non-splittable format at 100 TB
  (the same strategy Spark itself uses for gzip text).

The legacy tab-delimited text conversion is reproduced by
``sas_to_text`` for golden-file compatibility.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_sas_pdf(
    path: str, chunksize: int | None = None, reader=None
) -> Iterator[pd.DataFrame]:
    """Chunked read; yields DataFrames. `reader` defaults to pandas.read_sas
    and is injectable (it is pickled into executor closures by
    `read_sas_dir`, so it must be a module-level callable)."""
    reader = reader or pd.read_sas
    if chunksize:
        yield from reader(path, chunksize=chunksize, iterator=True)
    else:
        yield reader(path)


def deterministic_fake_reader(path, chunksize=None, iterator=False, **kw):
    """Stand-in decoder for environments without SAS fixtures (pandas can
    read but not write sas7bdat, and this container ships none): a
    deterministic 7-row table whose character column arrives as bytes,
    exactly as pandas.read_sas yields it. Lives here (not in tests/) so
    executor processes can unpickle closures that reference it."""
    full = pd.DataFrame(
        {
            "NAME": [f"row{i}".encode("latin-1") for i in range(7)],
            "VALUE": [float(i) * 1.5 for i in range(7)],
        }
    )
    if chunksize:
        return iter([full.iloc[:4], full.iloc[4:]])
    return full


def _decode_bytes(pdf: pd.DataFrame, encoding: str) -> pd.DataFrame:
    """pandas.read_sas returns bytes for character columns; decode to str."""
    out = pdf.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: v.decode(encoding, errors="replace")
                if isinstance(v, (bytes, bytearray))
                else v
            )
    return out


def read_sas(
    spark: SparkSession,
    path: str,
    *,
    encoding: str = "latin-1",
    chunksize: int = 50_000,
    reader=None,
) -> DataFrame:
    """One SAS file → DataFrame. The chunked decode bounds the reader's
    working set, but every decoded chunk is driver-resident here anyway, so
    they are concatenated into ONE pandas frame before createDataFrame — a
    per-chunk unionByName would grow the logical plan linearly with file
    size at identical peak memory. Files too big for the driver go through
    `read_sas_dir` (executor-side decode)."""
    chunks = [
        _decode_bytes(pdf, encoding)
        for pdf in _read_sas_pdf(path, chunksize, reader)
    ]
    if not chunks:
        raise ValueError(f"empty SAS file: {path}")
    return spark.createDataFrame(
        chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    )


def read_sas_dir(
    spark: SparkSession,
    paths: list[str],
    schema: str,
    *,
    encoding: str = "latin-1",
    reader=None,
) -> DataFrame:
    """Many SAS files → one DataFrame, decoded in parallel one-file-per-task
    (`mapInPandas` over the file list — the scalable path for a
    non-splittable format). `schema` is the DDL of the decoded columns.
    `reader` (module-level callable) is shipped to executors in the
    closure."""
    files = spark.createDataFrame([(p,) for p in paths], "path string")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                for chunk in _read_sas_pdf(p, chunksize=50_000, reader=reader):
                    yield _decode_bytes(chunk, encoding)

    return files.repartition(max(len(paths), 1)).mapInPandas(decode, schema=schema)


def sas_to_text(
    spark: SparkSession,
    sas_path: str,
    out_path: str,
    *,
    sep: str = "\t",
    encoding: str = "latin-1",
    reader=None,
) -> int:
    """Legacy converter (reference semantics: SAS → header + tab-delimited
    rows). Returns the row count."""
    df = read_sas(spark, sas_path, encoding=encoding, reader=reader)
    cols = df.columns
    header = sep.join(cols)
    body = df.select(
        F.concat_ws(
            sep, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
        ).alias("line")
    )
    n = body.count()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write(header + "\n")
        for row in body.toLocalIterator():
            fh.write(row["line"] + "\n")
    return n
