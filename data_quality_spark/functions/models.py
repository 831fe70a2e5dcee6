"""Combined model stage: language-ID + perplexity (+ optionally the hashed
linear quality classifier) in ONE Arrow pandas UDF.

Each ArrowEvalPython stage streams its input columns JVM→Python and the
result back; with separate langid and perplexity UDFs the (large) text
column crosses the Arrow boundary twice. Fusing both models into a single
struct-returning UDF halves that traffic and removes a whole stage — the
models themselves are unchanged (same predict_batch/ppl_batch the oracle
calls), so scores stay bit-identical.

The optional classifier rides the SAME crossing: when `clf` is passed
(wlist, bias6, buckets — see ops.textops.classifier_weights_local), the
UDF also emits (clf_n_toks, clf_logit) per row via the shared
py_clf_logits fold, making the fineweb-edu / DCLM classifier filter a
map-only pipeline stage with zero extra Arrow traffic.
"""

from __future__ import annotations

import pandas as pd

from data_quality_spark.functions import langid, perplexity

MODEL_SCHEMA = "lang_pred string, lang_margin double, ppl double"
MODEL_SCHEMA_CLF = MODEL_SCHEMA + ", clf_n_toks bigint, clf_logit double"


def score_batch(texts: pd.Series, clf=None, _cache: dict | None = None
                ) -> pd.DataFrame:
    out = langid.predict_batch(texts)
    out["ppl"] = perplexity.ppl_batch(texts)
    if clf is not None:
        from data_quality_spark.ops.textops import py_clf_logits

        wlist, bias6, buckets = clf
        ns, logits = py_clf_logits(
            texts, wlist, bias6, buckets, _cache if _cache is not None else {}
        )
        out["clf_n_toks"] = ns
        out["clf_logit"] = logits
    return out


def spark_udf(clf=None):
    from pyspark.sql.functions import pandas_udf

    cache: dict = {}  # per-worker token->bucket memo, reused across batches

    @pandas_udf(MODEL_SCHEMA_CLF if clf is not None else MODEL_SCHEMA)
    def models_udf(texts: pd.Series) -> pd.DataFrame:
        return score_batch(texts, clf=clf, _cache=cache)

    return models_udf
