"""Host-graph centrality for web-corpus quality filtering.

Production web-text pipelines (CCNet, RefinedWeb) use crawl-level host
ranks — harmonic centrality / PageRank over the host link graph — as a
URL-quality prior: low-rank spam farms are dropped before any content is
fetched or scored. This module provides that signal Spark-first:

  host_rank       — damped PageRank over a (src_host, dst_host) edge table,
                    power iteration as repeated join + groupBy (id-only
                    shuffles; the iteration count is tiny and fixed, the
                    data never leaves the cluster).
  page_rank_cols  — the per-iteration arithmetic, shared with the SQL twin.

All arithmetic is INTEGER MICRO-UNITS (rank scaled by RANK_SCALE, integer
division throughout — the same associativity-independence trick as the PQ
ADC tables in ops/similarity.py): floating-point Σ over a groupBy is
order-dependent and would diverge between engines and between runs, while
bigint sums are exact in any order, so the result is bit-portable for the
DuckDB oracle gate AND deterministic across cluster layouts.

Scale shape (100 TB of pages → ~10^8 hosts): the edge table carries two
host strings (or pre-hashed bigint ids); each iteration is ONE shuffle on
dst plus a broadcast-or-shuffle join on src. Degrees are computed once.
For real crawls, pre-aggregate the page-level link table to distinct host
pairs first (edges_from_pages does this) — host-graph edges are ~10^9,
not ~10^12. Iteration count is fixed (default 5 — host-rank priors
converge fast and the consumer only thresholds the tail); checkpoint
every few iterations if you raise it (lineage depth grows linearly).

Dangling hosts (no outlinks) leak their rank mass — the standard
simplification; the consumer thresholds relative ranks, so the uniform
leak is immaterial and the contract stays SQL-expressible.

Reference ancestor: this is an extension tier (the reference has no graph
ops); the shape mirrors checks/values_duplicate.py's hash-groupBy
discipline — shuffle keys, never payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RANK_SCALE = 10**12          # rank micro-units: 1.0 == 10^12
RANK_DAMP_PCT = 85           # damping factor d as an integer percentage
RANK_ITERS = 5


def edges_from_pages(
    df: DataFrame, src_host_col: str, dst_host_col: str
) -> DataFrame:
    """Distinct host-pair edges from a page-level link table (drops self
    loops). Run this BEFORE host_rank on real crawls: it collapses ~10^12
    page links to ~10^9 host edges in one partial-aggregated distinct."""
    return (
        df.select(
            F.col(src_host_col).alias("src"), F.col(dst_host_col).alias("dst")
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        # host_of returns '' (not NULL) for malformed/relative urls —
        # a phantom '' node would receive rank and join every malformed
        # url downstream, so empty hosts are dropped with the NULLs
        .where((F.col("src") != "") & (F.col("dst") != ""))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def host_edges_from_pages_html(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    weighted: bool = False,
) -> DataFrame:
    """(src, dst) host edges straight from a raw pages table: outlink
    extraction (extract.with_links — one codegen regexp_extract_all) →
    host of each target → distinct host pairs (weighted=True instead
    returns (src, dst, w) with w = page-level link count per host pair,
    the input shape for host_rank(weight_col='w')). The html payload is
    read once in the scan projection and never shuffles; the exchange
    carries host strings only."""
    from data_quality_spark.ops.textops import host_of
    from data_quality_spark.pipeline.extract import with_links

    linked = with_links(df.select(url_col, html_col), html_col, "__links")
    # explode in its own projection (a generator cannot nest inside the
    # host_of expression), then extract hosts
    pairs = linked.select(
        F.col(url_col), F.explode("__links").alias("__dst_url")
    ).select(
        host_of(F.col(url_col)).alias("src_host"),
        host_of(F.col("__dst_url")).alias("dst_host"),
    )
    if not weighted:
        return edges_from_pages(pairs, "src_host", "dst_host")
    return (
        pairs.where(
            pairs["src_host"].isNotNull() & pairs["dst_host"].isNotNull()
        )
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .where(F.col("src_host") != F.col("dst_host"))
        .groupBy(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


def host_rank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = RANK_ITERS,
    damp_pct: int = RANK_DAMP_PCT,
    weight_col: str | None = None,
    teleport=None,
) -> DataFrame:
    """Damped PageRank over a host edge table, exact-integer arithmetic.

    Per iteration (all in RANK_SCALE micro-units, `div` = integer floor
    division on non-negative bigints — identical in Spark and DuckDB):

        contrib(e)   = (rank(src) * w(e)) div W(src),  W = Σ out-weights
        new_rank(h)  = base(h) + (damp_pct * Σ contrib(in-edges)) div 100

    Uniform mode (teleport=None): base(h) = ((100-damp_pct) *
    (RANK_SCALE div n)) div 100 for every node, init = RANK_SCALE div n.

    weight_col: integer edge weights (e.g. page-level link counts from
    host_edges_from_pages_html(weighted=True)) — duplicate (src, dst)
    rows sum; unweighted edges are w = 1. Weights must stay ≤ ~10^6 so
    rank × w fits bigint (rank ≤ RANK_SCALE = 10^12).

    teleport: iterable of TRUSTED seed hosts → TrustRank (Gyöngyi 2004),
    the classic host-spam damper: rank mass enters ONLY through the seeds
    (init and base are RANK_SCALE div n_seeds on seeds, 0 elsewhere), so
    hosts earn rank solely by link-distance from trust. Raises if no seed
    appears in the graph (an all-zero result would silently gate
    everything downstream).

    Returns (host, rank_units bigint, rank double = units / RANK_SCALE).
    The node set is the union of sources and destinations; dangling-host
    mass leaks (module docstring). Every join key is a host id — rank
    state is one bigint per host, edges are (src, dst, w); nothing wide
    ever shuffles, and each iteration is one shuffle on dst (the src-side
    degree/rank join broadcasts when the host table fits, else
    shuffle-joins on src)."""
    src, dst = F.col(src_col), F.col(dst_col)
    if weight_col is not None:
        e = edges.select(
            src.alias("src"), dst.alias("dst"),
            F.col(weight_col).cast("bigint").alias("__w"),
        ).groupBy("src", "dst").agg(F.sum("__w").alias("__w"))
    else:
        e = (
            edges.select(src.alias("src"), dst.alias("dst"))
            .distinct()
            .withColumn("__w", F.lit(1).cast("bigint"))
        )
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    n = nodes.count()  # one tiny job; the scalar parameterizes the plan
    if n == 0:
        # empty edge table (e.g. a snapshot with no absolute outlinks):
        # empty rank frame, not a ZeroDivisionError on the driver
        return nodes.select(
            "host",
            F.lit(0).cast("bigint").alias("rank_units"),
            F.lit(0.0).alias("rank"),
        )
    if teleport is not None:
        seeds = sorted({str(t) for t in teleport})
        n_seed = nodes.where(F.col("host").isin(seeds)).count()
        if n_seed == 0:
            raise ValueError(
                "host_rank(teleport=...): no seed host appears in the "
                f"graph (seeds: {seeds[:5]}{'...' if len(seeds) > 5 else ''})"
            )
        init_val = RANK_SCALE // n_seed
        base_val = ((100 - damp_pct) * init_val) // 100
        is_seed = F.col("host").isin(seeds)
        init_col = F.when(is_seed, F.lit(init_val)).otherwise(F.lit(0))
        base_col = F.when(is_seed, F.lit(base_val)).otherwise(F.lit(0))
    else:
        init = RANK_SCALE // n
        base = ((100 - damp_pct) * init) // 100
        init_col = F.lit(init)
        base_col = F.lit(base)
    deg = e.groupBy("src").agg(F.sum("__w").alias("__deg"))
    rank = nodes.select("host", init_col.cast("bigint").alias("__r"))
    for _ in range(iters):
        contrib = (
            e.join(rank.withColumnRenamed("host", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("host"),
                F.expr("(__r * __w) div __deg").alias("__c"),
            )
        )
        inflow = contrib.groupBy("host").agg(F.sum("__c").alias("__in"))
        rank = nodes.join(inflow, "host", "left").select(
            "host",
            (
                base_col
                + F.expr(
                    f"({damp_pct} * coalesce(__in, 0L)) div 100"
                )
            ).cast("bigint").alias("__r"),
        )
    return rank.select(
        "host",
        F.col("__r").alias("rank_units"),
        (F.col("__r") / F.lit(float(RANK_SCALE))).alias("rank"),
    )


def sql_host_rank(
    edges_sql: str,
    iters: int = RANK_ITERS,
    damp_pct: int = RANK_DAMP_PCT,
    weighted: bool = False,
    teleport=None,
) -> str:
    """DuckDB twin of host_rank: the power iteration unrolled as chained
    CTEs over the SAME integer micro-unit arithmetic (`//` = `div`).
    edges_sql must yield (src, dst) — or (src, dst, w) with weighted=True
    — with the same rows as the Spark side; teleport renders the seed
    CASE expressions."""
    if weighted:
        e_cte = (
            "e AS (SELECT src, dst, sum(w)::BIGINT AS w"
            f" FROM ({edges_sql}) GROUP BY 1, 2)"
        )
    else:
        e_cte = (
            "e AS (SELECT src, dst, 1::BIGINT AS w"
            f" FROM (SELECT DISTINCT src, dst FROM ({edges_sql})))"
        )
    ctes = [
        e_cte,
        "nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e)",
    ]
    if teleport is not None:
        seeds = ", ".join(
            "'" + str(t).replace("'", "''") + "'"
            for t in sorted({str(t) for t in teleport})
        )
        ctes += [
            "params AS (SELECT count(*) AS ns FROM nodes"
            f" WHERE host IN ({seeds}))",
            f"init AS (SELECT {RANK_SCALE} // ns AS r0,"
            f" ((100 - {damp_pct}) * ({RANK_SCALE} // ns)) // 100 AS base"
            " FROM params)",
        ]
        init_expr = (
            f"CASE WHEN host IN ({seeds})"
            " THEN (SELECT r0 FROM init) ELSE 0 END"
        )
        base_expr = (
            f"CASE WHEN n.host IN ({seeds})"
            " THEN (SELECT base FROM init) ELSE 0 END"
        )
    else:
        ctes += [
            "params AS (SELECT count(*) AS n FROM nodes)",
            f"init AS (SELECT {RANK_SCALE} // n AS r0,"
            f" ((100 - {damp_pct}) * ({RANK_SCALE} // n)) // 100 AS base"
            " FROM params)",
        ]
        init_expr = "(SELECT r0 FROM init)"
        base_expr = "(SELECT base FROM init)"
    ctes += [
        "deg AS (SELECT src, sum(w)::BIGINT AS d FROM e GROUP BY 1)",
        f"r0 AS (SELECT host, ({init_expr})::BIGINT AS r FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"r{i + 1} AS (SELECT n.host, {base_expr}"
            f" + ({damp_pct} * coalesce(f.s, 0)) // 100 AS r"
            " FROM nodes n LEFT JOIN ("
            "   SELECT e.dst AS host, sum((r.r * e.w) // deg.d)::BIGINT AS s"
            f"  FROM e JOIN r{i} r ON r.host = e.src"
            "   JOIN deg ON deg.src = e.src GROUP BY 1"
            " ) f ON f.host = n.host)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT host, r::BIGINT AS rank_units,"
        f" r / {float(RANK_SCALE)} AS rank FROM r{iters}"
    )
