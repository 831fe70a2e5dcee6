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
    main = F.regexp_extract(s, r"(?s)<main>(.*)</main>", 1)
    paras = F.regexp_extract_all(main, F.lit(r"(?s)<p>(.*?)</p>"), F.lit(1))
    unescaped = F.transform(
        paras,
        lambda p: F.replace(
            F.replace(F.replace(p, F.lit("&lt;"), F.lit("<")), F.lit("&gt;"), F.lit(">")),
            F.lit("&amp;"),
            F.lit("&"),
        ),
    )
    # parity with py_extract: html WITHOUT a <main> element yields NULL (so
    # downstream coalesce falls back to the raw text column), while an
    # EMPTY <main></main> yields "". regexp_extract returns "" for both
    # no-match and empty-match, so the no-match case needs its own probe —
    # rlike distinguishes "never matched" from "matched empty".
    has_main = s.rlike(r"(?s)<main>.*</main>")
    return (
        F.when(html_col.isNull(), F.lit(None).cast("string"))
        .when(~has_main, F.lit(None).cast("string"))
        .otherwise(F.array_join(unescaped, "\n"))
    )
