"""Meta-blocking: weighted-edge pruning of a multi-key block graph.

The reference's answer to candidate explosion is manual: the user tunes
each pass's blocking fields until the pair counts look sane
(`/root/reference/app/BlockingPass.py` holds the per-pass key
choices; nothing weighs the evidence across passes).  Meta-blocking
(Papadakis et al., TKDE 2014) makes that tuning automatic and
data-driven: build the block graph from EVERY key at once, weight each
candidate edge by how many independent blocks co-fire for the pair
(CBS — common blocks scheme), and keep only edges at or above the mean
weight (WEP — weighted edge pruning).  A pair that two or three
independent keys both propose is far likelier a true match than one
proposed by a single loose key; the prune typically drops the long tail
of single-block coincidences that dominates comparator cost at scale.

Spark-first shape, all declarative:

1. assignments: one ``select`` per key expression, unioned — (id, block)
   with blank/null keys dropped (the reference's blank_flag semantics,
   `/root/reference/app/BlockingPass.py:498-499`);
2. block-size guard: singleton blocks propose nothing and mega-blocks
   are boilerplate canopies — ``HAVING 2 <= n <= max_block_rows`` before
   any pair is formed (same discipline as operators/blocking.py);
3. edges: self-join inside blocks (one shuffle on block), then
   ``groupBy(id_l, id_r).count()`` — the CBS weight.  The groupBy is
   map-side combined, so a pair proposed by k keys costs one shuffled
   row per key, never k² anything;
4. WEP prune in EXACT integer arithmetic: keep ``cbs * n_edges >=
   sum_cbs`` instead of comparing against the fractional mean — Spark
   and the DuckDB oracle agree bit-for-bit with no float hazard.  The
   (sum, count) scalar is a 1-row broadcast cross-join, so the plan
   stays lazy end to end (no driver action).

At 100 TB: everything is linear in block-pair volume, which the size
guard bounds per block; the only whole-set aggregate is the 1-row
edge-count scalar.  The edges frame is computed twice (once for the scalar, once
for the filter) — pass ``cache_handle`` to persist it across the two
uses, same contract as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def block_assignments(
    df: DataFrame,
    id_col: str,
    key_exprs: dict[str, str],
) -> DataFrame:
    """(id, block) assignments from every key expression at once.

    key_exprs maps a key name to a SQL expression string (evaluated with
    ``F.expr`` — keep it ANSI so the oracle twin can reuse it verbatim).
    Blank/null key values are dropped: a missing key proposes nothing.
    """
    parts = []
    for kname, kexpr in key_exprs.items():
        key = F.expr(kexpr).cast("string")
        parts.append(
            df.select(
                F.col(id_col).alias("id"),
                F.concat(F.lit(kname + "="), key).alias("block"),
            ).filter(key.isNotNull() & (F.trim(key) != ""))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def meta_block_pairs(
    df: DataFrame,
    id_col: str,
    key_exprs: dict[str, str],
    *,
    max_block_rows: int = 2_000,
    cache_handle: list | None = None,
) -> DataFrame:
    """CBS-weighted candidate edges after WEP pruning: (id_l, id_r, cbs)
    with cbs >= mean(cbs), the comparison done in exact integers."""
    asg = block_assignments(df, id_col, key_exprs)
    sized = (
        asg.groupBy("block")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_block_rows))
        .select("block")
    )
    kept = asg.join(sized, "block")
    a = kept.select("block", F.col("id").alias("id_l"))
    b = kept.select("block", F.col("id").alias("id_r"))
    edges = (
        a.join(b, "block")
        .filter(F.col("id_l") < F.col("id_r"))
        .groupBy("id_l", "id_r")
        .agg(F.count(F.lit(1)).alias("cbs"))
    )
    if cache_handle is not None:
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        cache_handle.append(edges)
    stats = edges.agg(
        F.sum("cbs").alias("_sum_cbs"), F.count(F.lit(1)).alias("_n_edges")
    )
    return (
        edges.crossJoin(F.broadcast(stats))
        .filter(F.col("cbs") * F.col("_n_edges") >= F.col("_sum_cbs"))
        .select("id_l", "id_r", "cbs")
    )


def block_filtering_pairs(
    df: DataFrame,
    id_col: str,
    key_exprs: dict[str, str],
    *,
    ratio: float = 0.5,
    purge_above: int = 2_000,
) -> DataFrame:
    """Block purging + block filtering (Papadakis et al., VLDB 2016 "BLAST"
    lineage): candidate pairs (id_l, id_r, n_co) that survive keeping, per
    record, only its ⌈ratio·b⌉ SMALLEST blocks (b = the record's block
    count after purging).

    Complements :func:`meta_block_pairs`: WEP prunes *edges* after pair
    formation; block filtering prunes *assignments* before any pair
    exists, so the comparison budget shrinks ahead of the self-join — at
    100 TB this is the difference between shuffling the raw block graph
    and shuffling its filtered skeleton.  The two compose (filter, then
    CBS/WEP on the survivors).

    Steps, all declarative:

    1. purge: blocks with < 2 rows propose nothing; blocks with more than
       ``purge_above`` rows are boilerplate canopies — dropped whole;
    2. filter: rank each record's surviving blocks by (size ASC, block)
       — the deterministic tie-break matters for oracle parity — and keep
       ranks <= ceil(ratio * count).  The window partitions by RECORD id,
       whose per-record block count is bounded by len(key_exprs): this is
       a bounded-width window, not a global sort;
    3. pairs: self-join on block over the kept assignments, count
       co-occurring kept blocks per pair (n_co).

    Exact arithmetic throughout: the keep bound uses integer
    ``ceil(ratio*b) = (num*b + den - 1) div den`` with ratio expressed as
    a fraction over 1e6, so Spark and DuckDB agree bit-for-bit.
    """
    num = int(round(ratio * 1_000_000))
    return _purge_filter_pairs(block_assignments(df, id_col, key_exprs), num, purge_above)


def qgram_block_pairs(
    df: DataFrame,
    id_col: str,
    field: str,
    *,
    n: int = 4,
    ratio: float = 0.5,
    purge_above: int = 2_000,
) -> DataFrame:
    """Q-gram (character n-gram) token blocking with block purging +
    per-record block filtering: candidate pairs (id_l, id_r, n_co) that
    share at least one KEPT q-gram block of the field.

    An equi pass on a key field misses every record with a typo in the
    key; a q-gram of the field survives any single edit that doesn't
    touch it, so two values within edit distance d still co-block on
    ~(len − n+1 − d·n) grams.  This is the classic q-gram blocking remedy
    (Gravano et al. 2001 applied to blocking; the reference's answer is a
    human adding ever-looser passes to parmf).  Raw q-gram blocks are far
    too dense to use bare — common substrings are mega-blocks — so the
    chain REQUIRES the purge + per-record smallest-blocks filter
    (:func:`block_filtering_pairs` semantics) to bound the pair budget:
    purge kills the boilerplate grams outright, and each record keeps
    only its ⌈ratio·b⌉ rarest grams — its most DISTINCTIVE substrings.

    Values are lowercased/trimmed first; values shorter than n chars
    contribute their whole value as the single gram (same short-input
    convention as winnowing / MinHash shingles).

    Plan shape: one generator projection (explode of an O(len) array) —
    no UDF — then the shared sized/filter/pairs chain: two shuffles plus
    the per-record bounded window.
    """
    num = int(round(ratio * 1_000_000))
    # the positional slice needs a column start index, so the gram array is
    # one SQL expression (substring(col, i, n) inside transform)
    asg = (
        df.select(
            F.col(id_col).alias("id"),
            F.expr(
                f"CASE WHEN length(regexp_replace(lower(trim(CAST({field} AS STRING))), ' +', ' ')) >= {n} "
                f"THEN transform(sequence(1, length(regexp_replace(lower(trim(CAST({field} AS STRING))), ' +', ' ')) - {n - 1}), "
                f"i -> substring(regexp_replace(lower(trim(CAST({field} AS STRING))), ' +', ' '), i, {n})) "
                f"ELSE array(regexp_replace(lower(trim(CAST({field} AS STRING))), ' +', ' ')) END"
            ).alias("_grams"),
        )
        .select("id", F.explode_outer("_grams").alias("block"))
        .filter(F.col("block").isNotNull() & (F.col("block") != ""))
        .distinct()
    )
    return _purge_filter_pairs(asg, num, purge_above)


def suffix_block_pairs(
    df: DataFrame,
    id_col: str,
    field: str,
    *,
    min_len: int = 6,
    ratio: float = 0.5,
    purge_above: int = 2_000,
) -> DataFrame:
    """Suffix-array blocking (Aizawa & Oyama 2005): candidate pairs that
    share at least one KEPT suffix (length ≥ `min_len`) of the field.

    The failure mode suffix blocking targets is PREFIX divergence —
    truncation, initials, titles, path prefixes ("dr jane smith" vs
    "jane smith"; "src/lib/util.py" vs "lib/util.py") — where every
    q-gram left of the divergence point differs but all shared suffixes
    survive intact.  Complements :func:`qgram_block_pairs` (which buys
    tolerance to edits anywhere at the cost of shorter, denser tokens).

    Same normalization (lowercase/trim/space-collapse), same short-value
    convention (values under `min_len` block whole), and the same
    REQUIRED purge + per-record smallest-blocks chain: long suffixes are
    near-unique (cheap), short ones approach q-gram density — the purge
    kills the boilerplate tails and each record keeps its ⌈ratio·b⌉
    rarest suffixes.  One generator projection (O(len − min_len) array
    per row, no UDF), then the shared two-shuffle tail.
    """
    num = int(round(ratio * 1_000_000))
    norm = f"regexp_replace(lower(trim(CAST({field} AS STRING))), ' +', ' ')"
    asg = (
        df.select(
            F.col(id_col).alias("id"),
            F.expr(
                f"CASE WHEN length({norm}) >= {min_len} "
                f"THEN transform(sequence(1, length({norm}) - {min_len - 1}), "
                f"i -> substring({norm}, i)) "
                f"ELSE array({norm}) END"
            ).alias("_sufs"),
        )
        .select("id", F.explode_outer("_sufs").alias("block"))
        .filter(F.col("block").isNotNull() & (F.col("block") != ""))
        .distinct()
    )
    return _purge_filter_pairs(asg, num, purge_above)


def suffix_block_pairs_sql(
    table: str,
    id_col: str,
    field: str,
    *,
    min_len: int = 6,
    ratio: float = 0.5,
    purge_above: int = 2_000,
) -> str:
    """DuckDB oracle twin of :func:`suffix_block_pairs`."""
    num = int(round(ratio * 1_000_000))
    norm = f"regexp_replace(lower(trim(CAST({field} AS VARCHAR))), ' +', ' ', 'g')"
    return f"""
        WITH src AS (
            SELECT {id_col} AS id,
                   CASE WHEN length({norm}) >= {min_len}
                        THEN list_transform(range(1, length({norm}) - {min_len - 2}),
                               i -> substring({norm}, CAST(i AS INT)))
                        ELSE [{norm}] END AS _sufs
            FROM {table}
        ),
        asg AS (
            SELECT DISTINCT id, unnest(_sufs) AS block FROM src
            WHERE len(_sufs) > 0
        ),
        asg2 AS (SELECT * FROM asg WHERE block IS NOT NULL AND block <> ''),
        sized AS (
            SELECT block, count(*) AS _n FROM asg2 GROUP BY block
            HAVING count(*) BETWEEN 2 AND {purge_above}
        ),
        survived AS (
            SELECT a.id, a.block, s._n FROM asg2 a JOIN sized s USING (block)
        ),
        ranked AS (
            SELECT id, block,
                   row_number() OVER (PARTITION BY id ORDER BY _n ASC, block ASC)
                       AS _rk,
                   count(*) OVER (PARTITION BY id) AS _b
            FROM survived
        ),
        kept AS (
            SELECT id, block FROM ranked
            WHERE _rk <= ({num} * _b + 999999) // 1000000
        )
        SELECT x.id AS id_l, y.id AS id_r, count(*) AS n_co
        FROM kept x JOIN kept y ON x.block = y.block AND x.id < y.id
        GROUP BY x.id, y.id
    """


def _purge_filter_pairs_sql(asg_sql: str, num: int, purge_above: int) -> str:
    """DuckDB rendering of the :func:`_purge_filter_pairs` tail over a
    prebuilt `(id, block)` subquery — the same purge → per-record
    smallest-blocks filter → pair chain the q-gram/suffix twins inline."""
    return f"""
        WITH asg2 AS (
            SELECT id, block FROM ({asg_sql})
            WHERE block IS NOT NULL AND block <> ''
        ),
        sized AS (
            SELECT block, count(*) AS _n FROM asg2 GROUP BY block
            HAVING count(*) BETWEEN 2 AND {purge_above}
        ),
        survived AS (
            SELECT a.id, a.block, s._n FROM asg2 a JOIN sized s USING (block)
        ),
        ranked AS (
            SELECT id, block,
                   row_number() OVER (PARTITION BY id ORDER BY _n ASC, block ASC)
                       AS _rk,
                   count(*) OVER (PARTITION BY id) AS _b
            FROM survived
        ),
        kept AS (
            SELECT id, block FROM ranked
            WHERE _rk <= ({num} * _b + 999999) // 1000000
        )
        SELECT x.id AS id_l, y.id AS id_r, count(*) AS n_co
        FROM kept x JOIN kept y ON x.block = y.block AND x.id < y.id
        GROUP BY x.id, y.id
    """


def _purge_filter_pairs(asg: DataFrame, num: int, purge_above: int) -> DataFrame:
    """Shared purge → per-record smallest-blocks filter → pair tail
    (the block_filtering_pairs chain over prebuilt (id, block) rows)."""
    sized = (
        asg.groupBy("block")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= purge_above))
    )
    survived = asg.join(sized, "block")
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("_n").asc(), F.col("block").asc())
    kept = (
        survived.withColumn("_rk", F.row_number().over(w))
        .withColumn("_b", F.count(F.lit(1)).over(Window.partitionBy("id")))
        .filter(F.expr(f"_rk <= ({num} * _b + 999999) div 1000000"))
        .select("id", "block")
    )
    a = kept.select("block", F.col("id").alias("id_l"))
    b = kept.select("block", F.col("id").alias("id_r"))
    return (
        a.join(b, "block")
        .filter(F.col("id_l") < F.col("id_r"))
        .groupBy("id_l", "id_r")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )


def qgram_block_pairs_sql(
    table: str,
    id_col: str,
    field: str,
    *,
    n: int = 4,
    ratio: float = 0.5,
    purge_above: int = 2_000,
) -> str:
    """DuckDB oracle twin of :func:`qgram_block_pairs` — same
    normalization, same short-value convention, same purge/filter/pair
    chain in exact integer arithmetic."""
    num = int(round(ratio * 1_000_000))
    norm = f"regexp_replace(lower(trim(CAST({field} AS VARCHAR))), ' +', ' ', 'g')"
    return f"""
        WITH src AS (
            SELECT {id_col} AS id,
                   CASE WHEN length({norm}) >= {n}
                        THEN list_transform(range(1, length({norm}) - {n - 2}),
                               i -> substring({norm}, CAST(i AS INT), {n}))
                        ELSE [{norm}] END AS _grams
            FROM {table}
        ),
        asg AS (
            SELECT DISTINCT id, unnest(_grams) AS block FROM src
            WHERE len(_grams) > 0
        ),
        asg2 AS (SELECT * FROM asg WHERE block IS NOT NULL AND block <> ''),
        sized AS (
            SELECT block, count(*) AS _n FROM asg2 GROUP BY block
            HAVING count(*) BETWEEN 2 AND {purge_above}
        ),
        survived AS (
            SELECT a.id, a.block, s._n FROM asg2 a JOIN sized s USING (block)
        ),
        ranked AS (
            SELECT id, block,
                   row_number() OVER (PARTITION BY id ORDER BY _n ASC, block ASC)
                       AS _rk,
                   count(*) OVER (PARTITION BY id) AS _b
            FROM survived
        ),
        kept AS (
            SELECT id, block FROM ranked
            WHERE _rk <= ({num} * _b + 999999) // 1000000
        )
        SELECT x.id AS id_l, y.id AS id_r, count(*) AS n_co
        FROM kept x JOIN kept y ON x.block = y.block AND x.id < y.id
        GROUP BY x.id, y.id
    """


def block_filtering_pairs_sql(
    table: str,
    id_col: str,
    key_exprs: dict[str, str],
    *,
    ratio: float = 0.5,
    purge_above: int = 2_000,
) -> str:
    """DuckDB oracle twin of :func:`block_filtering_pairs` — same purge
    bounds, same (size, block) rank order, same integer ceil."""
    num = int(round(ratio * 1_000_000))
    unions = "\nUNION ALL\n".join(
        f"""SELECT {id_col} AS id, '{kname}=' || CAST(({kexpr}) AS STRING) AS block
            FROM {table}
            WHERE ({kexpr}) IS NOT NULL AND trim(CAST(({kexpr}) AS STRING)) <> ''"""
        for kname, kexpr in key_exprs.items()
    )
    return f"""
        WITH asg AS ({unions}),
        sized AS (
            SELECT block, count(*) AS _n FROM asg GROUP BY block
            HAVING count(*) BETWEEN 2 AND {purge_above}
        ),
        survived AS (
            SELECT a.id, a.block, s._n FROM asg a JOIN sized s USING (block)
        ),
        ranked AS (
            SELECT id, block,
                   row_number() OVER (PARTITION BY id ORDER BY _n ASC, block ASC)
                       AS _rk,
                   count(*) OVER (PARTITION BY id) AS _b
            FROM survived
        ),
        kept AS (
            SELECT id, block FROM ranked
            WHERE _rk <= ({num} * _b + 999999) // 1000000
        )
        SELECT x.id AS id_l, y.id AS id_r, count(*) AS n_co
        FROM kept x JOIN kept y ON x.block = y.block AND x.id < y.id
        GROUP BY x.id, y.id
    """


def meta_block_pairs_sql(
    table: str,
    id_col: str,
    key_exprs: dict[str, str],
    *,
    max_block_rows: int = 2_000,
) -> str:
    """DuckDB oracle twin of meta_block_pairs — same key expressions,
    same size guard, same integer-exact WEP prune."""
    unions = "\nUNION ALL\n".join(
        f"""SELECT {id_col} AS id, '{kname}=' || CAST(({kexpr}) AS STRING) AS block
            FROM {table}
            WHERE ({kexpr}) IS NOT NULL AND trim(CAST(({kexpr}) AS STRING)) <> ''"""
        for kname, kexpr in key_exprs.items()
    )
    return f"""
        WITH asg AS ({unions}),
        sized AS (
            SELECT block FROM asg GROUP BY block
            HAVING count(*) BETWEEN 2 AND {max_block_rows}
        ),
        kept AS (SELECT a.* FROM asg a JOIN sized USING (block)),
        edges AS (
            SELECT x.id AS id_l, y.id AS id_r, count(*) AS cbs
            FROM kept x JOIN kept y
              ON x.block = y.block AND x.id < y.id
            GROUP BY x.id, y.id
        ),
        st AS (SELECT sum(cbs) AS sum_cbs, count(*) AS n_edges FROM edges)
        SELECT id_l, id_r, cbs FROM edges, st
        WHERE cbs * n_edges >= sum_cbs
    """


def wnp_prune(edges: DataFrame, *, cache_handle: list | None = None) -> DataFrame:
    """Weighted Node Pruning (Papadakis et al., TKDE 2014) over a CBS
    edge frame (id_l, id_r, cbs): keep an edge iff its weight is at or
    above the LOCAL mean edge weight of at least one endpoint.

    WEP (:func:`meta_block_pairs`) applies one GLOBAL mean — fine when
    edge weights are comparable corpus-wide, but a dense region (a hot
    repo, a boilerplate-heavy language) inflates the global mean and
    starves sparse regions of all their candidates.  WNP localizes the
    threshold: each node averages only its OWN incident edges, so sparse
    entities keep their best evidence while dense hubs still shed their
    weak tail.  The union (either endpoint retains) is the standard
    redefined-WNP form — it preserves recall at a small precision cost
    vs the intersection variant.

    Exact integer arithmetic (`cbs * n_node >= sum_node`), same zero-
    float-hazard discipline as the WEP prune.  Plan: one explode to
    (node, cbs) — 2 rows per edge — one groupBy(node), then two joins of
    the edge frame against the tiny per-node stats frame (AQE broadcasts
    it when small).  Linear in edge count; no global scalar, no window.
    The edge frame feeds BOTH the stats aggregation and the final join —
    pass ``cache_handle`` to persist it across the two uses (same
    contract as :func:`meta_block_pairs`); caller unpersists.
    """
    if cache_handle is not None:
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        cache_handle.append(edges)
    incident = edges.select(
        F.explode(F.array("id_l", "id_r")).alias("node"), "cbs"
    )
    stats = incident.groupBy("node").agg(
        F.sum("cbs").alias("_sum"), F.count(F.lit(1)).alias("_n")
    )
    sl = stats.select(
        F.col("node").alias("id_l"),
        F.col("_sum").alias("_sum_l"),
        F.col("_n").alias("_n_l"),
    )
    sr = stats.select(
        F.col("node").alias("id_r"),
        F.col("_sum").alias("_sum_r"),
        F.col("_n").alias("_n_r"),
    )
    return (
        edges.join(sl, "id_l")
        .join(sr, "id_r")
        .filter(
            (F.col("cbs") * F.col("_n_l") >= F.col("_sum_l"))
            | (F.col("cbs") * F.col("_n_r") >= F.col("_sum_r"))
        )
        .select("id_l", "id_r", "cbs")
    )


def wnp_pairs_sql(
    table: str,
    id_col: str,
    key_exprs: dict[str, str],
    *,
    max_block_rows: int = 2_000,
) -> str:
    """DuckDB oracle twin of block_assignments → CBS edges → wnp_prune."""
    unions = "\nUNION ALL\n".join(
        f"""SELECT {id_col} AS id, '{kname}=' || CAST(({kexpr}) AS STRING) AS block
            FROM {table}
            WHERE ({kexpr}) IS NOT NULL AND trim(CAST(({kexpr}) AS STRING)) <> ''"""
        for kname, kexpr in key_exprs.items()
    )
    return f"""
        WITH asg AS ({unions}),
        sized AS (
            SELECT block FROM asg GROUP BY block
            HAVING count(*) BETWEEN 2 AND {max_block_rows}
        ),
        kept AS (SELECT a.* FROM asg a JOIN sized USING (block)),
        edges AS (
            SELECT x.id AS id_l, y.id AS id_r, count(*) AS cbs
            FROM kept x JOIN kept y
              ON x.block = y.block AND x.id < y.id
            GROUP BY x.id, y.id
        ),
        incident AS (
            SELECT id_l AS node, cbs FROM edges
            UNION ALL SELECT id_r AS node, cbs FROM edges
        ),
        st AS (
            SELECT node, sum(cbs) AS _sum, count(*) AS _n
            FROM incident GROUP BY node
        )
        SELECT e.id_l, e.id_r, e.cbs
        FROM edges e
        JOIN st a ON a.node = e.id_l
        JOIN st b ON b.node = e.id_r
        WHERE e.cbs * a._n >= a._sum OR e.cbs * b._n >= b._sum
    """


def cbs_edges(
    df: DataFrame,
    id_col: str,
    key_exprs: dict[str, str],
    *,
    max_block_rows: int = 2_000,
) -> DataFrame:
    """CBS-weighted raw edges (id_l, id_r, cbs) — the shared front half of
    meta_block_pairs / wnp_pairs: assignments, size guard, block self-join,
    one map-side-combined groupBy."""
    asg = block_assignments(df, id_col, key_exprs)
    sized = (
        asg.groupBy("block")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_block_rows))
        .select("block")
    )
    kept = asg.join(sized, "block")
    a = kept.select("block", F.col("id").alias("id_l"))
    b = kept.select("block", F.col("id").alias("id_r"))
    return (
        a.join(b, "block")
        .filter(F.col("id_l") < F.col("id_r"))
        .groupBy("id_l", "id_r")
        .agg(F.count(F.lit(1)).alias("cbs"))
    )


def wnp_pairs(
    df: DataFrame,
    id_col: str,
    key_exprs: dict[str, str],
    *,
    max_block_rows: int = 2_000,
    cache_handle: list | None = None,
) -> DataFrame:
    """Meta-blocking with Weighted NODE Pruning: CBS edges kept when at or
    above the local mean of either endpoint (see :func:`wnp_prune`)."""
    return wnp_prune(
        cbs_edges(df, id_col, key_exprs, max_block_rows=max_block_rows),
        cache_handle=cache_handle,
    )


def rarest_token_canopy(
    df: DataFrame,
    id_col: str,
    field: str,
    *,
    purge_above: int = 2_000,
) -> DataFrame:
    """Canopy assignment by globally-rarest token: each record joins the
    canopy of its most DISTINCTIVE word — the word with the lowest corpus
    document frequency (ties broken lexicographically).

    Where :func:`qgram_block_pairs` / :func:`block_filtering_pairs` keep a
    record's ⌈ratio·b⌉ rarest blocks (overlapping canopies), this is the
    disjoint extreme: exactly ONE canopy per record, so canopies PARTITION
    the records — the cheap pre-clustering step (McCallum/Nigam/Ungar-style
    canopies with an infinitely tight T2) that bounds any downstream
    within-canopy agglomeration at Σ|canopy|², and the frequency-aware
    variant of schema-agnostic token blocking (Papadakis et al.).

    Tokens with document frequency > `purge_above` are ignored as
    boilerplate BEFORE the argmin; a record whose every token is purged
    (or that has no tokens) is left out of the result — at 100 TB those
    are exactly the records that would otherwise form a mega-canopy.

    Output: (id, canopy, canopy_df) — one row per surviving record, where
    canopy_df is the document frequency of the chosen token.

    Plan: token explode (O(words) array, no UDF) → map-side-combined
    df groupBy → broadcast-friendly frequency join → min(struct) argmin
    per record (map-side combined; no windows over record-scale data).
    """
    norm = f"regexp_replace(lower(trim(CAST({field} AS STRING))), '\\\\s+', ' ')"
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode_outer(
                F.array_distinct(F.split(F.expr(norm), " "))
            ).alias("tok"),
        )
        .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )
    dfreq = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("_df"))
        .filter(F.col("_df") <= purge_above)
    )
    return (
        toks.join(dfreq, "tok")
        .groupBy("id")
        .agg(F.min(F.struct("_df", "tok")).alias("_best"))
        .select(
            "id",
            F.col("_best.tok").alias("canopy"),
            F.col("_best._df").cast("long").alias("canopy_df"),
        )
    )


def rarest_token_canopy_sql(
    table: str,
    id_col: str,
    field: str,
    *,
    purge_above: int = 2_000,
) -> str:
    """DuckDB oracle twin of :func:`rarest_token_canopy` — same
    normalization, purge bound, and (df, token) argmin order."""
    norm = f"regexp_replace(lower(trim(CAST({field} AS VARCHAR))), '\\s+', ' ', 'g')"
    return f"""
        WITH rtc_tok AS (
            SELECT DISTINCT {id_col} AS id, rtu.tok
            FROM {table}, UNNEST(string_split({norm}, ' ')) AS rtu(tok)
            WHERE rtu.tok IS NOT NULL AND rtu.tok <> ''
        ),
        rtc_df AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS _df
            FROM rtc_tok GROUP BY tok
            HAVING count(*) <= {purge_above}
        ),
        rtc_rk AS (
            SELECT t.id, t.tok, d._df,
                   row_number() OVER (
                       PARTITION BY t.id ORDER BY d._df ASC, t.tok ASC
                   ) AS _rk
            FROM rtc_tok t JOIN rtc_df d USING (tok)
        )
        SELECT id, tok AS canopy, _df AS canopy_df
        FROM rtc_rk WHERE _rk = 1
    """


def rarest_token_canopy_pairs(
    df: DataFrame,
    id_col: str,
    field: str,
    *,
    purge_above: int = 2_000,
) -> DataFrame:
    """Candidate pairs (id_l, id_r) of records sharing a rarest-token
    canopy (:func:`rarest_token_canopy`), id_l < id_r canonical.

    Because canopies partition the records and a canopy can never exceed
    its token's document frequency (≤ `purge_above`), total pairs are
    bounded by Σ|canopy|² without any extra cap. One shuffle on the canopy
    token for the self-join; canonical ordering makes the output
    first-pass-wins-ready for the multi-pass union (J4 semantics).
    """
    asg = rarest_token_canopy(df, id_col, field, purge_above=purge_above)
    l = asg.select(F.col("id").alias("id_l"), "canopy")
    r = asg.select(F.col("id").alias("id_r"), "canopy")
    return l.join(r, "canopy").filter(F.col("id_l") < F.col("id_r")).select(
        "id_l", "id_r"
    )


def rarest_token_canopy_pairs_sql(
    table: str,
    id_col: str,
    field: str,
    *,
    purge_above: int = 2_000,
) -> str:
    """DuckDB oracle twin of :func:`rarest_token_canopy_pairs`."""
    inner = rarest_token_canopy_sql(table, id_col, field, purge_above=purge_above)
    return f"""
        SELECT x.id AS id_l, y.id AS id_r
        FROM ({inner}) x JOIN ({inner}) y
          ON x.canopy = y.canopy AND x.id < y.id
    """
