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


def export_query_to_fixed_width(
    spark: SparkSession, sql: str, out_path: str, fields: list[DictField]
) -> None:
    """SQL SELECT → padded flat file (app/RDBMS_Read_Export_UI.py:223-241)."""
    df = guarded_select(spark, sql)
    write_fixed_width(df, out_path, fields)
