"""Build the crawl host-rank artifact the pipeline's host_low_rank rule
consumes (QFConfig.host_rank_path).

    python tools/build_host_ranks.py PAGES_PARQUET OUT_PARQUET \
        [--iters 5] [--damp 85] [--edges-out DIR]

Reads a pages table (url, html, ...), extracts absolute outlinks, collapses
them to distinct host edges, runs ops.graph.host_rank (exact integer
micro-unit PageRank), and writes (host, rank_units, rank) parquet. On a
real crawl run this once per snapshot; every pipeline run then
broadcast-joins the artifact (with_host_rank) — rank computation and rank
consumption are different jobs on different cadences, like the MinHash
signature index and the IVF centroids.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pages", help="pages parquet path (url, html, ...)")
    ap.add_argument("out", help="output host-rank parquet path")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--damp", type=int, default=None)
    ap.add_argument(
        "--edges-out", default=None,
        help="optionally persist the host edge table (debug / reuse)",
    )
    args = ap.parse_args()

    from data_quality_spark.ops import graph as G
    from data_quality_spark.session import get_spark

    spark = get_spark(app_name="build_host_ranks")
    pages = spark.read.parquet(args.pages)
    edges = G.host_edges_from_pages_html(pages)
    if args.edges_out:
        edges.write.mode("overwrite").parquet(args.edges_out)
        edges = spark.read.parquet(args.edges_out)
    kw = {}
    if args.iters is not None:
        kw["iters"] = args.iters
    if args.damp is not None:
        kw["damp_pct"] = args.damp
    ranks = G.host_rank(edges, **kw)
    ranks.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} host ranks -> {args.out}")


if __name__ == "__main__":
    main()
