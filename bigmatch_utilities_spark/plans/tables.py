"""Iceberg-ready table DDL + writer with a partitioned-parquet fallback.

The north rule targets an Iceberg table of source-code repositories
(repo, path, commit, lang, content) partitioned for the linkage access
pattern: identity(lang) — passes block within a language — and
bucket(N, repo) — co-locates a repository's files without hot
directories. This module pins that contract:

* :func:`iceberg_ddl` renders the exact ``CREATE TABLE … USING iceberg
  PARTITIONED BY …`` statement a deployment runs against its catalog;
* :func:`write_table` writes through the Iceberg DataFrameWriterV2 when a
  catalog is configured, and otherwise falls back to plain parquet with
  the same directory layout (identity columns verbatim; bucket(N, col)
  materialized as ``<col>_bucket = pmod(xxhash64(col), N)``).

Fallback caveat, stated rather than hidden: Iceberg's bucket transform is
a 32-bit Murmur3 over the value's Iceberg-serialized form, while the
fallback uses Spark's xxhash64 — the LAYOUT (file count, pruning shape,
skew behavior) matches, the assignment of rows to buckets does not, so
the parquet dirs are not byte-interchangeable with an Iceberg rewrite.
In-sandbox there is no Iceberg runtime jar (BASELINE.md permits plain
parquet); the DDL + writeTo path is the production wiring.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

#: Error markers that mean "this session has no Iceberg support" — the ONLY
#: condition fmt="auto" is allowed to paper over. Anything else (a transient
#: catalog commit failure, a permission error, a conflict) re-raises: on a
#: real Iceberg deployment a silent parquet detour — to a local dir literally
#: named after the catalog table — would be data loss in disguise (ADVICE r3).
_MISSING_ICEBERG_MARKERS = (
    "data_source_not_found",
    "failed to find the data source",
    "classnotfound",
    "cannot find catalog",
    "catalog_not_found",
    "nosuchcatalog",
    "catalog plugin",
)


#: `target` was a filesystem path (or otherwise not a parsable catalog
#: identifier) — it cannot name an Iceberg table, so auto mode may use the
#: parquet layout for it.
_NOT_AN_IDENTIFIER_MARKERS = (
    "parseexception",
    "parse_syntax_error",
    "invalid identifier",
    "requires_single_part_namespace",
    "schema_not_found",
)


def _missing_iceberg(exc: Exception) -> bool:
    msg = str(exc).lower()
    return any(m in msg for m in _MISSING_ICEBERG_MARKERS)


def _not_an_identifier(exc: Exception) -> bool:
    msg = f"{type(exc).__name__} {exc}".lower()
    return any(m in msg for m in _NOT_AN_IDENTIFIER_MARKERS)

try:  # pyspark >= 4.0 moved partition transforms out of the main namespace
    from pyspark.sql.functions import partitioning as _partitioning

    _bucket_transform = _partitioning.bucket
except ImportError:  # pragma: no cover - pyspark 3.x
    _bucket_transform = F.bucket


@dataclass(frozen=True)
class PartitionField:
    """One Iceberg partition-spec entry: identity(col) or bucket(n, col)."""

    column: str
    transform: str = "identity"  # "identity" | "bucket"
    n: int = 0  # bucket count (bucket transform only)

    def __post_init__(self) -> None:
        if self.transform not in ("identity", "bucket"):
            raise ValueError(f"unsupported transform {self.transform!r}")
        if self.transform == "bucket" and self.n <= 0:
            raise ValueError("bucket transform needs n > 0")

    def ddl(self) -> str:
        if self.transform == "bucket":
            return f"bucket({self.n}, {self.column})"
        return self.column


#: The repo-files table spec from the north rule (see jobs/run_match.py):
#: block-by-language pruning + repo co-location without hot directories.
REPO_FILES_SPEC = (
    PartitionField("lang"),
    PartitionField("repo", "bucket", 16),
)


def iceberg_ddl(
    table: str, df: DataFrame, spec: tuple[PartitionField, ...] = REPO_FILES_SPEC
) -> str:
    """The CREATE TABLE statement for `df`'s schema under `spec` — what a
    deployment runs once against its Iceberg catalog before `write_table`
    appends into it."""
    cols = ",\n  ".join(
        f"{f.name} {f.dataType.simpleString().upper()}" for f in df.schema.fields
    )
    parts = ", ".join(p.ddl() for p in spec)
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n)\n"
        f"USING iceberg\nPARTITIONED BY ({parts})"
    )


def _fallback_columns(df: DataFrame, spec: tuple[PartitionField, ...]):
    """(df_with_derived_cols, physical_partition_columns) for the parquet
    fallback: identity columns pass through; bucket transforms materialize
    a `<col>_bucket` int column (xxhash64 — layout twin, not hash twin,
    of Iceberg's murmur3 bucket; see module docstring)."""
    cols: list[str] = []
    out = df
    for p in spec:
        if p.transform == "identity":
            cols.append(p.column)
        else:
            name = f"{p.column}_bucket"
            out = out.withColumn(
                name, F.pmod(F.xxhash64(F.col(p.column)), F.lit(p.n)).cast("int")
            )
            cols.append(name)
    return out, cols


def write_table(
    df: DataFrame,
    target: str,
    spec: tuple[PartitionField, ...] = REPO_FILES_SPEC,
    fmt: str = "auto",
    mode: str = "overwrite",
) -> str:
    """Write `df` as the partitioned table the linkage jobs scan.

    fmt="iceberg": DataFrameWriterV2 against catalog table `target` with
    the spec's transforms (requires an Iceberg catalog on the session).
    fmt="parquet": partitioned parquet at path `target` with the fallback
    layout. fmt="auto": try iceberg, fall back to parquet when the
    session has no Iceberg support (the in-sandbox path). Returns the
    format actually written ("iceberg" | "parquet")."""
    if fmt not in ("auto", "iceberg", "parquet"):
        raise ValueError(f"unknown fmt {fmt!r}")
    if fmt in ("auto", "iceberg"):
        try:
            transforms = [
                _bucket_transform(p.n, p.column)
                if p.transform == "bucket"
                else F.col(p.column)
                for p in spec
            ]
            writer = df.writeTo(target).using("iceberg").partitionedBy(
                transforms[0], *transforms[1:]
            )
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
            _LOG.info("write_table: wrote %s via Iceberg writeTo", target)
            return "iceberg"
        except Exception as exc:
            # auto only falls back when the session demonstrably lacks
            # Iceberg or the target is a plain path, never a catalog
            # identifier; real write/commit errors always surface.
            if fmt == "iceberg" or not (
                _missing_iceberg(exc) or _not_an_identifier(exc)
            ):
                raise
            _LOG.warning(
                "write_table: session has no Iceberg support (%s); "
                "falling back to partitioned parquet at %s",
                str(exc).splitlines()[0][:200],
                target,
            )
    out, cols = _fallback_columns(df, spec)
    out.write.mode(mode).partitionBy(*cols).parquet(target)
    _LOG.info("write_table: wrote %s via partitioned parquet", target)
    return "parquet"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save `df` as a BUCKETED catalog table: co-located storage for the
    joins the linkage pipeline repeats every night.

    The standing tables a nightly incremental run touches over and over —
    the (id, cluster_id) assignment, the good-pairs ledger, the prepared
    records keyed by record_id — are re-shuffled on the same key at every
    join today.  Hash-bucketing them on that key once at write time makes
    every later equi-join on it exchange-free: Spark's bucketed scan
    reports a HashPartitioning that matches the join requirement, so the
    sort-merge join reads both sides in place (no Exchange in the plan —
    pinned by tests/test_tables.py).  At 100 TB this converts the nightly
    shuffle of the whole standing corpus into zero network bytes; only
    the (small) unbucketed delta side moves.

    Production note: on Iceberg the same property comes from the
    bucket(N, col) partition transform plus storage-partitioned joins
    (spark.sql.sources.v2.bucketing.enabled); this helper is the
    session-catalog equivalent (DataFrameWriter.bucketBy), which works on
    any Spark without extra jars and is what the sandbox tests exercise.
    Both sides of a join must use the SAME bucket count and key.

    sort_cols (defaults to bucket_cols) additionally sorts within
    buckets, letting the SMJ skip its per-task sort when Spark can prove
    the files' order.
    """
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .saveAsTable(table)
    )


def read_table(spark, target: str, fmt: str = "auto") -> DataFrame:
    """Scan counterpart of `write_table`: catalog table when available,
    else the partitioned-parquet dir (partition columns — including the
    derived `_bucket` ones — come back via partition discovery and stay
    prunable by Catalyst)."""
    if fmt in ("auto", "iceberg"):
        try:
            return spark.read.table(target)
        except Exception as exc:
            if fmt == "iceberg":
                raise
            # auto falls back only when `target` is not resolvable AS a
            # catalog table (missing catalog/table, or a filesystem path
            # that can't parse as an identifier) — genuine read errors on a
            # resolved table re-raise.
            not_found = "table_or_view_not_found" in str(exc).lower()
            if not (
                not_found or _not_an_identifier(exc) or _missing_iceberg(exc)
            ):
                raise
            _LOG.info(
                "read_table: %s is not a catalog table; reading parquet", target
            )
    return spark.read.parquet(target)
