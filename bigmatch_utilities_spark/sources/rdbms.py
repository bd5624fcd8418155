"""RDBMS ingest/egress (the reference's SQLite side tables).

Reference behavior:
* text → SQLite loader with dict-driven DDL
  (/root/reference/app/Datafile_to_RDBMS_UI.py:110-136, column typing at
  app/RDBMS_Read_Export_UI.py:366-409);
* SQL SELECT → padded flat-file export with a SELECT-only guard
  (app/RDBMS_Read_Export_UI.py:139-241, guard at :147-148);
* table listing (:294-307).

Spark-native: the "RDBMS" is the session catalog (or any JDBC source via
``format("jdbc")`` — same code path); the SELECT-only guard becomes a
statement-shape check before ``spark.sql``.
"""

from __future__ import annotations

import re
import sqlite3
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from bigmatch_utilities_spark.config import DictField
from bigmatch_utilities_spark.sources.fixed_width import write_fixed_width

_TYPE_MAP = {
    "int": "long",
    "integer": "long",
    "float": "double",
    "real": "double",
    "date": "string",  # reference stores yyyymmdd strings
    "char": "string",
    "": "string",
}


def spark_type_for(field: DictField) -> str:
    """Dict-driven column typing (≈ app/RDBMS_Read_Export_UI.py:366-409)."""
    return _TYPE_MAP.get(field.data_format.lower(), "string")


def load_table(
    spark: SparkSession, df: DataFrame, table: str, fields: list[DictField] | None = None
) -> None:
    """Persist a DataFrame as a catalog table, casting per the dictionary's
    advisory data_format (the reference's add_column DDL + row import)."""
    if fields:
        from pyspark.sql import functions as F

        df = df.select(
            *[
                F.col(f.name).try_cast(spark_type_for(f)).alias(f.name)
                for f in fields
                if f.name in df.columns
            ]
        )
    df.write.mode("overwrite").saveAsTable(table)


_FORBIDDEN = re.compile(
    r"^\s*(insert|update|delete|drop|create|alter|truncate|replace|merge|grant)\b",
    re.IGNORECASE,
)


def guarded_select(spark: SparkSession, sql: str) -> DataFrame:
    """SELECT-only guard (app/RDBMS_Read_Export_UI.py:147-148): reject any
    statement that isn't a query before touching the catalog."""
    stripped = sql.strip().rstrip(";")
    if ";" in stripped:
        raise ValueError("multiple statements are not allowed")
    if _FORBIDDEN.match(stripped) or not re.match(
        r"^\s*(select|with)\b", stripped, re.IGNORECASE
    ):
        raise ValueError("only SELECT statements are allowed")
    return spark.sql(stripped)


def list_tables(spark: SparkSession) -> list[str]:
    """Table listing (≈ app/RDBMS_Read_Export_UI.py:294-307)."""
    return [t.name for t in spark.catalog.listTables()]


# ---------------------------------------------------------------------------
# SQLite ingest — the reference's actual side-table store
# (app/RDBMS_Read_Export_UI.py:139-221 reads samplefiles/sample.db)
# ---------------------------------------------------------------------------

_PANDAS_TO_SPARK = {"int64": "long", "float64": "double", "bool": "boolean"}


def list_sqlite_tables(db_path: str) -> list[str]:
    """sqlite_master table listing (app/RDBMS_Read_Export_UI.py:294-307)."""
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        return [
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name"
            )
        ]
    finally:
        con.close()


def _sqlite_select(table: str | None, query: str | None) -> str:
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= / query=")
    if query is not None:
        stripped = query.strip().rstrip(";")
        if ";" in stripped or _FORBIDDEN.match(stripped) or not re.match(
            r"^\s*(select|with)\b", stripped, re.IGNORECASE
        ):
            raise ValueError("only SELECT statements are allowed")
        return stripped
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table or ""):
        raise ValueError(f"invalid table name: {table!r}")
    return f'SELECT * FROM "{table}"'


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table: str | None = None,
    query: str | None = None,
    *,
    batch_rows: int = 50_000,
) -> DataFrame:
    """One SQLite file → DataFrame (read-only URI connection; the same
    SELECT-only guard as `guarded_select` applies to `query`).

    A SQLite file is a single non-splittable local artifact, so one
    sequential driver-side read mirrors what any engine must do — the
    scalable axis at 100 TB is ACROSS files (`read_sqlite_dir`). Chunks are
    concatenated into ONE pandas frame before createDataFrame: the chunks
    are all driver-resident either way, and a per-chunk unionByName would
    grow the logical plan linearly with file size."""
    sql = _sqlite_select(table, query)
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        chunks = list(pd.read_sql_query(sql, con, chunksize=batch_rows))
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.read_sql_query(sql, con)
        )
    finally:
        con.close()
    if len(pdf) == 0:
        # empty result: schema from pandas dtypes (all-object → string)
        ddl = ", ".join(
            f"`{c}` {_PANDAS_TO_SPARK.get(str(t), 'string')}"
            for c, t in pdf.dtypes.items()
        )
        return spark.createDataFrame([], schema=ddl)
    return spark.createDataFrame(pdf)


def read_sqlite_dir(
    spark: SparkSession,
    db_paths: list[str],
    table: str,
    schema: str,
    *,
    batch_rows: int = 50_000,
) -> DataFrame:
    """Many SQLite files → one DataFrame, decoded one-file-per-task via
    ``mapInPandas`` over the path list — the scalable path for a fleet of
    non-splittable side databases (same strategy as sources.sas
    read_sas_dir). `schema` is the DDL of the decoded columns."""
    sql = _sqlite_select(table, None)
    files = spark.createDataFrame([(p,) for p in db_paths], "path string")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                con = sqlite3.connect(f"file:{p}?mode=ro", uri=True)
                try:
                    yield from pd.read_sql_query(sql, con, chunksize=batch_rows)
                finally:
                    con.close()

    return files.repartition(max(len(db_paths), 1)).mapInPandas(
        decode, schema=schema
    )


def export_query_to_fixed_width(
    spark: SparkSession, sql: str, out_path: str, fields: list[DictField]
) -> None:
    """SQL SELECT → padded flat file (app/RDBMS_Read_Export_UI.py:223-241)."""
    df = guarded_select(spark, sql)
    write_fixed_width(df, out_path, fields)
