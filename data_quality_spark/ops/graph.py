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
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst) host edges straight from a raw pages table: outlink
    extraction (extract.with_links — one codegen regexp_extract_all) →
    host of each target → distinct host pairs. The html payload is read
    once in the scan projection and never shuffles; the exchange carries
    host strings only."""
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
    return edges_from_pages(pairs, "src_host", "dst_host")


def host_rank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = RANK_ITERS,
    damp_pct: int = RANK_DAMP_PCT,
) -> DataFrame:
    """Damped PageRank over a host edge table, exact-integer arithmetic.

    Per iteration (all in RANK_SCALE micro-units, `div` = integer floor
    division on non-negative bigints — identical in Spark and DuckDB):

        contrib(e)   = rank(src(e)) div out_degree(src(e))
        new_rank(h)  = base + (damp_pct * Σ contrib(in-edges)) div 100
        base         = ((100 - damp_pct) * (RANK_SCALE div n)) div 100

    Returns (host, rank_units bigint, rank double = units / RANK_SCALE).
    The node set is the union of sources and destinations; dangling-host
    mass leaks (module docstring). Every join key is a host id — rank
    state is one bigint per host, edges are two ids; nothing wide ever
    shuffles, and each iteration is one shuffle on dst (the src-side
    degree/rank join broadcasts when the host table fits, else
    shuffle-joins on src)."""
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst")).distinct()
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
    init = RANK_SCALE // n
    base = ((100 - damp_pct) * init) // 100
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    rank = nodes.select("host", F.lit(init).cast("bigint").alias("__r"))
    for _ in range(iters):
        contrib = (
            e.join(rank.withColumnRenamed("host", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("host"),
                F.expr("__r div __deg").alias("__c"),
            )
        )
        inflow = contrib.groupBy("host").agg(F.sum("__c").alias("__in"))
        rank = nodes.join(inflow, "host", "left").select(
            "host",
            (
                F.lit(base)
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
) -> str:
    """DuckDB twin of host_rank: the power iteration unrolled as chained
    CTEs over the SAME integer micro-unit arithmetic (`//` = `div`).
    edges_sql must yield (src, dst) with the same rows as the Spark side."""
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e)",
        "params AS (SELECT count(*) AS n FROM nodes)",
        f"init AS (SELECT {RANK_SCALE} // n AS r0,"
        f" ((100 - {damp_pct}) * ({RANK_SCALE} // n)) // 100 AS base"
        " FROM params)",
        "deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1)",
        "r0 AS (SELECT host, (SELECT r0 FROM init) AS r FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"r{i + 1} AS (SELECT n.host, (SELECT base FROM init)"
            f" + ({damp_pct} * coalesce(f.s, 0)) // 100 AS r"
            " FROM nodes n LEFT JOIN ("
            "   SELECT e.dst AS host, sum(r.r // deg.d)::BIGINT AS s"
            f"  FROM e JOIN r{i} r ON r.host = e.src"
            "   JOIN deg ON deg.src = e.src GROUP BY 1"
            " ) f ON f.host = n.host)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT host, r::BIGINT AS rank_units,"
        f" r / {float(RANK_SCALE)} AS rank FROM r{iters}"
    )
