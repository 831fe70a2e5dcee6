"""Scale-proof tier: run the heaviest registered operators at sf0.1 AND a
derived 10x corpus ("sf1"), and report the growth factor per op — the
cheapest way to catch a hidden quadratic before a real 100x scale-up
(r3 verdict task #5).

sf1 is synthesized DETERMINISTICALLY from /root/testdata/sf0.1 (no external
data): each table is unioned 10 times with shifted ids; text gets a per-copy
suffix and embeddings a small per-copy deterministic offset so duplicate
structure per row stays comparable to sf0.1 instead of becoming 10 exact
copies of everything (which would measure a different workload, not a bigger
one); event timestamps shift by a disjoint per-copy range so global-overlap
density per time unit is unchanged.

Usage: python tools/bench_scale_proof.py [out_json]
Writes a JSON report (default BENCH_SCALE_PROOF.json) and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(REPO, ".bench", "sf1")
COPIES = 10
ID_STEP = 10_000_000

# the five heaviest registered ops (r3 bench medians), each a different
# shuffle/plan shape
HEAVY = [
    "dedup_minhash_incr",   # banded join vs persisted signature index
    "dedup_semantic",       # k-means cells + within-cell pair scan
    "dedup_minhash_lsh",    # in-batch banded LSH + exact verify
    "text_clf_score",       # NB train (eager agg) + hashed-linear scoring
    "period_overlap_global",  # range-partitioned global window
    "dedup_span_removal_tok",  # token-window hash + keeper window + rebuild
    "graph_host_rank",        # iterative join+agg (integer PageRank)
    "graph_anchor_stats",     # map-side grammar extraction + distinct agg
    "sketch_token_cms",       # bounded-exchange CMS table build
    "text_len_quantiles",     # distinct-value window quantiles
    "graph_hits",             # iterative 2-shuffle L∞ power iteration
    "sim_decontaminate",      # eval-matrix single corpus scan
    "text_ngram_novelty",     # gram-hash distinct + min-owner join
]

N_REPS = 3


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1_DIR, exist_ok=True)

    def done(t):
        return os.path.exists(os.path.join(SF1_DIR, t + ".parquet"))

    if not done("documents"):
        d = spark.read.parquet(f"{SF01}/documents.parquet")
        parts = [
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_STEP))
            .withColumn(
                "text",
                F.when(
                    F.lit(i) > 0,
                    F.concat(F.col("text"), F.lit(f" copyseed{i}")),
                ).otherwise(F.col("text")),
            )
            for i in range(COPIES)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{SF1_DIR}/documents.parquet"
        )
    if not done("embeddings"):
        e = spark.read.parquet(f"{SF01}/embeddings.parquet")
        parts = []
        for i in range(COPIES):
            p = e.withColumn("vec_id", F.col("vec_id") + F.lit(i * ID_STEP))
            if i > 0:
                # small deterministic per-copy offset: copies land near, not
                # on, the originals — SemDeDup/LSH cell populations scale
                # with n instead of collapsing to exact duplicates
                p = p.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: x
                        + (F.lit(i) * (j % 7 - 3).cast("double")) * 0.003,
                    ),
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{SF1_DIR}/embeddings.parquet"
        )
    if not done("events"):
        ev = spark.read.parquet(f"{SF01}/events.parquet")
        span = ev.agg(
            F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
        ).collect()[0][0] or 0
        parts = [
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * ID_STEP))
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.unix_timestamp("ts") + F.lit(i * (span + 3600))
                ),
            )
            for i in range(COPIES)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{SF1_DIR}/events.parquet"
        )


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_SCALE_PROOF.json"
    )
    import __spark_entry__ as E
    from data_quality_spark.session import get_spark

    spark = get_spark(app_name="scale_proof")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)

    qs = E.queries()
    report = {}
    for name in HEAVY:
        fn = qs[name]
        row = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1_DIR)):
            runs, rows = [], None
            for _ in range(N_REPS):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            med = sorted(runs)[len(runs) // 2]
            row[label] = {"median_sec": round(med, 2), "rows": rows,
                          "runs": [round(x, 2) for x in runs]}
        g = row["sf1"]["median_sec"] / max(row["sf0.1"]["median_sec"], 1e-9)
        row["growth_10x_rows"] = round(g, 2)
        report[name] = row
        print(f"{name:24s} sf0.1 {row['sf0.1']['median_sec']:7.2f}s  "
              f"sf1 {row['sf1']['median_sec']:7.2f}s  growth {g:5.2f}x  "
              f"rows {row['sf0.1']['rows']} -> {row['sf1']['rows']}")

    with open(out_json, "w") as fh:
        json.dump({"copies": COPIES, "reps": N_REPS, "ops": report}, fh,
                  indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
