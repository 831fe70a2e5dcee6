"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: single-pass per-rule quality metrics over the
documents table at sf0.001 (the engine's headline shape: k rules, ONE scan).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, each with a DuckDB-runnable ANSI-SQL oracle producing identical
column names and values.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    # reference semantics: invalid casts yield NULL (never error) — Spark 4
    # defaults ANSI on, so flip it off for engine parity (SURVEY.md §1.2).
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from data_quality_spark.queries import q_rule_metrics

    _configure(spark)
    return q_rule_metrics(spark, "/root/testdata/sf0.001")


# The driver's per-round correctness gate verifies the FIRST 50 entries of
# ``queries()`` in dict order.  The registry holds 89+, so the window below is
# rotated each round until every query has at least one green driver row:
#   - slots 1-25: never driver-verified before round 4 (registered after the
#     round-3 window closed),
#   - slots 26-39: last verified in round 2 (displaced by round-3 additions),
#   - slots 40-50: canaries whose code paths changed this round (interval
#     boundary reuse, MinHash band-key packing, Bloom fixes, PQ/NB geometry
#     sidecars) plus the flagship rule_metrics.
DRIVER_PRIORITY = [
    # -- never driver-verified (rounds 1-3) --
    "text_pii_counts", "text_badwords", "text_dsir_weights",
    "text_clf_score", "text_clf_inrow", "text_mix_rates",
    "text_mix_resample", "text_mix_balance", "text_datasheet",
    "text_crawl_diff", "text_token_hist", "text_pr_curve",
    "text_quality_topfrac", "text_shard_pack", "text_ngram_repetition",
    "text_corpus_ngrams", "text_encoding_flags", "text_chunk",
    "text_decontaminate", "text_sample_stratified", "text_token_budget",
    "text_line_dedup", "text_url_canon", "text_boilerplate",
    "qf_rule_ablation",
    # -- round-2-only (no round-3 row; the rest of the r2-only set keeps
    #    its green r2 rows and rotates back in next round) --
    "doc_fingerprint", "multimodal_frames", "multimodal_meta",
    "qf_heuristic_keep", "qf_pipeline_annotate", "qf_scrub",
    "text_contamination", "text_quality_score",
    # -- round-4 additions (never driver-verified — zero rows ever) --
    "dedup_span_removal_tok", "text_url_spam", "text_fertility",
    "graph_host_rank", "text_crawl_latest", "dedup_para_minhash",
    # -- round-4 change canaries --
    "rule_metrics", "period_intersection", "period_overlap_global",
    "dedup_bloom", "dedup_para_bloom", "dedup_minhash_lsh",
    "dedup_minhash_drop", "dedup_minhash_incr", "dedup_cluster_drop",
    "sim_pq_topk", "sim_ivfpq_rerank",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_quality_spark import queries as Q
    from data_quality_spark import queries_ops as QO

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    merged = {name: wrap(fn) for name, fn in Q.CHECK_QUERIES.items()}
    merged.update({name: wrap(fn) for name, fn in QO.OPS_QUERIES.items()})
    out = {name: merged[name] for name in DRIVER_PRIORITY if name in merged}
    out.update(merged)  # remaining entries keep their registry order
    return out


def oracle_sql() -> dict[str, str]:
    from data_quality_spark import queries as Q
    from data_quality_spark import queries_ops as QO

    out = dict(Q.CHECK_ORACLES)
    out.update(QO.OPS_ORACLES)
    return out
