"""Stable entity-ID assignment across linkage runs.

BigMatch is a batch tool: every run writes fresh pair files keyed only by
record ids (/root/reference/app/MatchReview.py:26 pages a per-run pairs
file; /root/reference/app/CommonRL.py holds no cross-run key), so two
consecutive runs over an updated file produce clusters with no persistent
identity — downstream consumers cannot tell "entity 17 gained a record"
from "entity 17 was deleted and an unrelated entity appeared".  Production
entity resolution keeps a crosswalk: each new cluster inherits the prior
run's entity_id it overlaps most, splits mint fresh ids for the smaller
fragment, and merges retire the smaller entity's id.  This module is that
crosswalk as two map-side argmax aggregates.

Semantics (fully deterministic, oracle-twinned):

1. overlap(cluster, entity_id) = |members of the new cluster that carried
   that entity_id in the previous run| — one groupBy after an inner join
   on record id.
2. Each cluster CLAIMS its argmax entity_id (overlap DESC, entity_id ASC).
3. Each entity_id is AWARDED to at most one claiming cluster (overlap
   DESC, cluster ASC) — so a split's larger fragment keeps the id and a
   merge retires all but the strongest prior id.
4. Losing and all-new clusters mint ``new:<min member id>`` — stable
   under re-execution and disjoint from carried ids by the prefix.

Scale design: the record-id join is the only pair-scale operation (it
shuffles on record id, the natural key, and AQE broadcast-sizes the prior
crosswalk when it is the small side); both argmaxes are map-side-combined
``min(struct(...))`` aggregates over the overlap frame, whose row count is
bounded by the number of (cluster, prior-entity) incidences — no windows
over record-scale data, no skew pathology (a mega-cluster partial-
aggregates per map task).  Ties break on ids, never on hash order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stable_entity_ids(
    curr: DataFrame,
    prev: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    entity_col: str = "entity_id",
) -> DataFrame:
    """Assign persistent entity ids to a new clustering.

    ``curr``: (id_col, cluster_col) — this run's cluster labels.
    ``prev``: (id_col, entity_col) — last run's crosswalk (entity ids are
    strings; carried ids pass through, minted ids get a ``new:`` prefix).

    Output: one row per cluster —
    (cluster_col, entity_col STRING, carried BOOLEAN, overlap BIGINT)
    where overlap is the member count shared with the carried entity
    (0 for minted ids).
    """
    ov = (
        curr.join(prev, id_col)
        .groupBy(cluster_col, entity_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # 2. each cluster claims its best prior entity
    claim = (
        ov.groupBy(cluster_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("_n")).alias("nn"),
                    F.col(entity_col).alias("e"),
                )
            ).alias("b")
        )
        .select(
            F.col(cluster_col),
            F.col("b.e").alias("_e"),
            (-F.col("b.nn")).alias("_n"),
        )
    )
    # 3. each entity is awarded to its strongest claimant
    win = (
        claim.groupBy("_e")
        .agg(
            F.min(
                F.struct(
                    (-F.col("_n")).alias("nn"),
                    F.col(cluster_col).alias("c"),
                )
            ).alias("b")
        )
        .select(F.col("_e").alias("_we"), F.col("b.c").alias("_wc"))
    )
    carried = claim.join(
        win,
        (claim["_e"] == win["_we"]) & (claim[cluster_col] == win["_wc"]),
        "left_semi",
    ).select(
        F.col(cluster_col),
        F.col("_e").cast("string").alias(entity_col),
        F.lit(True).alias("carried"),
        F.col("_n").cast("long").alias("overlap"),
    )
    # 4. everyone else mints new:<min member id>
    minted = (
        curr.groupBy(cluster_col)
        .agg(F.min(F.col(id_col)).alias("_mid"))
        .join(carried.select(cluster_col), cluster_col, "left_anti")
        .select(
            F.col(cluster_col),
            F.concat(F.lit("new:"), F.col("_mid").cast("string")).alias(
                entity_col
            ),
            F.lit(False).alias("carried"),
            F.lit(0).cast("long").alias("overlap"),
        )
    )
    return carried.unionByName(minted)


def stable_entity_ids_sql(
    curr_sql: str,
    prev_sql: str,
    id_col: str = "id",
    cluster_col: str = "cluster",
    entity_col: str = "entity_id",
) -> str:
    """DuckDB twin of :func:`stable_entity_ids` — the same claim/award
    argmaxes as row_number under the identical (count DESC, id ASC)
    order, the same ``new:<min id>`` minting."""
    c, e, i = cluster_col, entity_col, id_col
    return f"""
        WITH si_ov AS (
            SELECT n.{c}, p.{e}, count(*) AS _n
            FROM ({curr_sql}) n JOIN ({prev_sql}) p USING ({i})
            GROUP BY n.{c}, p.{e}
        ),
        si_claim AS (
            SELECT {c}, {e} AS _e, _n FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY {c} ORDER BY _n DESC, {e} ASC
                ) AS rk FROM si_ov
            ) WHERE rk = 1
        ),
        si_carried AS (
            SELECT {c}, _e, _n FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY _e ORDER BY _n DESC, {c} ASC
                ) AS rk FROM si_claim
            ) WHERE rk = 1
        )
        SELECT {c}, CAST(_e AS VARCHAR) AS {e},
               TRUE AS carried, CAST(_n AS BIGINT) AS overlap
        FROM si_carried
        UNION ALL
        SELECT g.{c}, 'new:' || CAST(g._mid AS VARCHAR) AS {e},
               FALSE AS carried, CAST(0 AS BIGINT) AS overlap
        FROM (
            SELECT {c}, min({i}) AS _mid FROM ({curr_sql}) GROUP BY {c}
        ) g
        WHERE NOT EXISTS (SELECT 1 FROM si_carried x WHERE x.{c} = g.{c})
    """


def cluster_churn(
    curr: DataFrame,
    prev: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    entity_col: str = "entity_id",
) -> DataFrame:
    """Run-over-run churn report: one row per CURRENT cluster, classified
    against the previous run's clustering.

    Where :func:`stable_entity_ids` answers "what id does this cluster
    carry forward", this answers the monitoring question "how much did the
    clustering MOVE" — the number a production linkage pipeline alerts on
    (a parameter change that silently merges 4% of entities shows up here
    before any downstream join does).

    Categories (deterministic; `shared` = members that exist in prev):

        new       no member existed in the previous run
        merged    members carry >= 2 distinct previous entities
        stable    exactly one previous entity, and member sets identical
        split     fragment of one previous entity, no new members
        grown     the whole previous entity plus new members
        reshaped  one previous entity, but both lost and gained members

    Output: (cluster_col, curr_size, n_shared, n_prev_entities, category).

    Scale: the record-id inner join is the only record-scale op; the
    per-(cluster, prev-entity) overlap frame is map-side combined, and the
    category logic runs on cluster-granular rows. No windows, no skew
    pathology (mega-clusters partial-aggregate per map task).
    """
    c, e, i = cluster_col, entity_col, id_col
    csize = curr.groupBy(c).agg(F.count("*").cast("long").alias("curr_size"))
    psize = prev.groupBy(e).agg(F.count("*").cast("long").alias("_prev_size"))
    ov = (
        curr.join(prev, i)
        .groupBy(c, e)
        .agg(F.count("*").cast("long").alias("_n"))
    )
    per_c = ov.groupBy(c).agg(
        F.count("*").cast("long").alias("n_prev_entities"),
        F.sum("_n").cast("long").alias("n_shared"),
        F.min(e).alias("_one_e"),  # meaningful only when n_prev_entities == 1
        F.max("_n").cast("long").alias("_one_n"),
    )
    j = (
        csize.join(per_c, c, "left")
        .join(psize, per_c["_one_e"] == psize[e], "left")
        .select(
            csize[c],
            "curr_size",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.coalesce("n_prev_entities", F.lit(0))
            .cast("long")
            .alias("n_prev_entities"),
            "_prev_size",
        )
    )
    cat = (
        F.when(F.col("n_prev_entities") == 0, F.lit("new"))
        .when(F.col("n_prev_entities") >= 2, F.lit("merged"))
        .when(
            (F.col("n_shared") == F.col("_prev_size"))
            & (F.col("n_shared") == F.col("curr_size")),
            F.lit("stable"),
        )
        .when(F.col("n_shared") == F.col("curr_size"), F.lit("split"))
        .when(F.col("n_shared") == F.col("_prev_size"), F.lit("grown"))
        .otherwise(F.lit("reshaped"))
    )
    return j.select(
        c, "curr_size", "n_shared", "n_prev_entities", cat.alias("category")
    )


def cluster_churn_sql(
    curr_sql: str,
    prev_sql: str,
    id_col: str = "id",
    cluster_col: str = "cluster",
    entity_col: str = "entity_id",
) -> str:
    """DuckDB twin of :func:`cluster_churn` (identical joins, coalesces,
    and category CASE chain)."""
    c, e, i = cluster_col, entity_col, id_col
    return f"""
        WITH ch_csize AS (
            SELECT {c}, CAST(count(*) AS BIGINT) AS curr_size
            FROM ({curr_sql}) GROUP BY {c}
        ),
        ch_psize AS (
            SELECT {e}, CAST(count(*) AS BIGINT) AS _prev_size
            FROM ({prev_sql}) GROUP BY {e}
        ),
        ch_ov AS (
            SELECT n.{c}, p.{e}, CAST(count(*) AS BIGINT) AS _n
            FROM ({curr_sql}) n JOIN ({prev_sql}) p USING ({i})
            GROUP BY n.{c}, p.{e}
        ),
        ch_perc AS (
            SELECT {c},
                   CAST(count(*) AS BIGINT) AS n_prev_entities,
                   CAST(sum(_n) AS BIGINT) AS n_shared,
                   min({e}) AS _one_e
            FROM ch_ov GROUP BY {c}
        ),
        ch_j AS (
            SELECT s.{c}, s.curr_size,
                   CAST(coalesce(p.n_shared, 0) AS BIGINT) AS n_shared,
                   CAST(coalesce(p.n_prev_entities, 0) AS BIGINT) AS n_prev_entities,
                   z._prev_size
            FROM ch_csize s
            LEFT JOIN ch_perc p ON s.{c} = p.{c}
            LEFT JOIN ch_psize z ON p._one_e = z.{e}
        )
        SELECT {c}, curr_size, n_shared, n_prev_entities,
               CASE WHEN n_prev_entities = 0 THEN 'new'
                    WHEN n_prev_entities >= 2 THEN 'merged'
                    WHEN n_shared = _prev_size AND n_shared = curr_size THEN 'stable'
                    WHEN n_shared = curr_size THEN 'split'
                    WHEN n_shared = _prev_size THEN 'grown'
                    ELSE 'reshaped' END AS category
        FROM ch_j
    """
