"""HTML→text extraction — byte-stable dual path (SURVEY.md §7 hard part #1).

The extraction contract: content of ``<main>`` → one line per ``<p>`` block,
entity-unescaped (&lt; &gt; &amp; — exact inverse of the generator's escape).
NULL html → NULL text.

  * ``py_extract``     — pure-Python (oracle; also the parity pandas UDF)
  * ``native_extract`` — JVM Column chain (regexp_extract_all + transform),
    the default engine path: no Python in the hot loop, whole-stage codegen.

Equality of the two paths over the full synthetic corpus is pinned by
tests/test_pipeline.py (byte-identical per url — BASELINE.md invariant).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_MAIN = re.compile(r"<main>(.*)</main>", re.S)
_PARA = re.compile(r"<p>(.*?)</p>", re.S)


def py_unescape(s: str) -> str:
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def py_extract(html_bytes: bytes | None) -> str | None:
    if html_bytes is None:
        return None
    s = html_bytes.decode("utf-8", errors="replace")
    m = _MAIN.search(s)
    if m is None:
        return None
    return "\n".join(py_unescape(p) for p in _PARA.findall(m.group(1)))


def py_extract_batch(htmls: pd.Series) -> pd.Series:
    return htmls.map(py_extract)


def spark_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def extract_udf(htmls: pd.Series) -> pd.Series:
        return py_extract_batch(htmls)

    return extract_udf


def native_extract(html_col: Column) -> Column:
    s = F.decode(html_col, "UTF-8")
    # ONE regex pass over the (large) html: extract the FULL match (group 0,
    # "<main>…</main>") — it is "" exactly when no <main> element exists, so
    # no-match vs matched-empty is distinguishable without a second rlike
    # probe, and the inner content is a cheap substring (len - 6 - 7 tag
    # chars) instead of a second group-1 extraction.
    m0 = F.regexp_extract(s, r"(?s)<main>(.*)</main>", 0)
    inner = m0.substr(F.lit(7), F.length(m0) - 13)
    paras = F.regexp_extract_all(inner, F.lit(r"(?s)<p>(.*?)</p>"), F.lit(1))
    unescaped = F.transform(
        paras,
        lambda p: F.replace(
            F.replace(F.replace(p, F.lit("&lt;"), F.lit("<")), F.lit("&gt;"), F.lit(">")),
            F.lit("&amp;"),
            F.lit("&"),
        ),
    )
    # parity with py_extract: html WITHOUT a <main> element yields NULL (the
    # downstream coalesce then falls back to the raw text column); an EMPTY
    # <main></main> yields "".
    return (
        F.when(html_col.isNull(), F.lit(None).cast("string"))
        .when(m0 == "", F.lit(None).cast("string"))
        .otherwise(F.array_join(unescaped, "\n"))
    )
