"""Materialized oracle for the full (model-stage) quality-filter pipeline.

The langid/perplexity stages are not SQL-expressible, so the DuckDB oracle
for `qf_pipeline_annotate` cannot recompute them in SQL. Instead the
single-process pandas reference (pipeline.oracle.annotate_pandas — the same
independent implementation the F1 gate uses) is run over the sf_dir's
documents table and its expected output is written to a parquet file; the
oracle SQL is then a plain SELECT over that file. This mirrors the
reference's golden-corpus strategy (test_df.xlsx carries hand-marked
expected outcomes; here the marks are computed by the non-Spark twin).

The Spark query and this module build the page frame from `documents` with
the SAME construction (url template, entity-escaped <main><p> wrapping), so
byte-identical extraction is part of what the oracle checks.
"""

from __future__ import annotations

import os
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from data_quality_spark.pipeline.pages import escape_text

# constants shared verbatim with the Spark-side page construction
URL_PREFIX = "https://ex.example/doc/"
HTML_PRE = "<html><body><main><p>"
HTML_POST = "</p></main></body></html>"

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
EXPECTED_DIR = os.path.join(REPO_ROOT, ".oracle")
QF_EXPECTED_PATH = os.path.join(EXPECTED_DIR, "qf_pipeline_expected.parquet")


def round_half_up(x: float, nd: int = 4) -> float:
    """Spark's F.round semantics for doubles: HALF_UP on the shortest
    decimal rendering (JVM BigDecimal.valueOf uses Double.toString; python
    repr() is the same shortest round-trip rendering)."""
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP)
    )


def pages_from_documents_pandas(docs: pd.DataFrame) -> pd.DataFrame:
    """Python twin of the Spark-side page synthesis in
    queries_ops.q_qf_pipeline_annotate: NULL text → NULL html."""
    html = [
        (HTML_PRE + escape_text(t) + HTML_POST).encode("utf-8")
        if isinstance(t, str)
        else None
        for t in docs["text"]
    ]
    return pd.DataFrame(
        {
            "url": [URL_PREFIX + str(int(d)) for d in docs["doc_id"]],
            "html": html,
            "text": docs["text"].values,
            "lang": docs["lang"].values,
        }
    )


def write_qf_expected(sf_dir: str, out_path: str = QF_EXPECTED_PATH) -> str:
    """Run the pandas reference pipeline over sf_dir/documents and persist
    the expected (url, keep, lang_pred, ppl_r, n_fired, fired) frame."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_quality_spark.pipeline.oracle import annotate_pandas

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pandas()
    ann = annotate_pandas(pages_from_documents_pandas(docs))
    out = pd.DataFrame(
        {
            "url": ann["url"].values,
            "keep": ann["keep"].values,
            "lang_pred": ann["lang_pred"].values,
            "ppl_r": [round_half_up(p) for p in ann["ppl"]],
            "n_fired": [len(f) for f in ann["fired_rules"]],
            "fired": [list(f) for f in ann["fired_rules"]],
        }
    )
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("keep", pa.bool_()),
            ("lang_pred", pa.string()),
            ("ppl_r", pa.float64()),
            ("n_fired", pa.int32()),
            ("fired", pa.list_(pa.string())),
        ]
    )
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False), out_path
    )
    return out_path
