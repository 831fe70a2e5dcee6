"""Combined model stage: language-ID + perplexity in ONE Arrow pandas UDF.

Each ArrowEvalPython stage streams its input columns JVM→Python and the
result back; with separate langid and perplexity UDFs the (large) text
column crosses the Arrow boundary twice. Fusing both models into a single
struct-returning UDF halves that traffic and removes a whole stage — the
models themselves are unchanged (same predict_batch/ppl_batch the oracle
calls), so scores stay bit-identical.
"""

from __future__ import annotations

import pandas as pd

from data_quality_spark.functions import langid, perplexity

MODEL_SCHEMA = "lang_pred string, lang_margin double, ppl double"


def score_batch(texts: pd.Series) -> pd.DataFrame:
    out = langid.predict_batch(texts)
    out["ppl"] = perplexity.ppl_batch(texts)
    return out


def spark_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(MODEL_SCHEMA)
    def models_udf(texts: pd.Series) -> pd.DataFrame:
        return score_batch(texts)

    return models_udf
