"""Session reporting: merged KO-row export + self-contained HTML summary.

Reference surface replaced here:
  * ``DataQualitySession.create_export_details_excel``
    (/root/reference/data_quality/data_quality_holder.py:76-85) — one sheet
    of merged KO rows per table. Excel when openpyxl is importable, CSV
    fallback otherwise (this container ships no openpyxl).
  * ``DataQualitySession.create_html_output`` → ``plot_session_results``
    (/root/reference/data_quality/src/plot.py:117-374) — Bokeh gauges +
    per-check rows + collapsible sample tables. Re-rendered as a dependency-
    free static HTML page off the same metrics: % KO gauge per table,
    per-check table sorted by n_ko (plot.py:241-242), capped sample rows.

The KO rows come from the engine's single-pass ``annotate`` frame
(fired_descriptions already merged per row with " - ", replacing the
reference's union + groupby-merge ``_create_ko_rows``, table.py:191-232);
export caps rows per table like the reference's row-sample cap.
"""

from __future__ import annotations

import html as html_mod
import os

from pyspark.sql import functions as F


def _ko_rows_pdf(table, max_rows: int):
    ann = table.annotate()
    ko = ann.where(F.size("fired_rules") > 0)
    drop = [c for c in (table.output_columns or []) if c] or None
    if drop:
        cols = drop + ["fired_descriptions", "flag_only_warning"]
    else:
        cols = [
            c
            for c in ko.columns
            if c not in ("fired_rules", "keep")
        ]
    return ko.select(*cols).limit(max_rows).toPandas()


def export_details(session, path: str, max_rows_per_table: int = 10_000) -> str:
    """Merged failing rows per table → one .xlsx (sheet per table) when
    openpyxl exists, else a directory of CSVs. Returns the written path."""
    tables = [t for t in session.tables if t.check_list]
    try:
        import openpyxl  # noqa: F401

        import pandas as pd

        out = path if path.endswith(".xlsx") else path + ".xlsx"
        with pd.ExcelWriter(out, engine="openpyxl") as xw:
            for t in tables:
                _ko_rows_pdf(t, max_rows_per_table).to_excel(
                    xw, sheet_name=str(t.name)[:31], index=False
                )
        return out
    except ImportError:
        os.makedirs(path, exist_ok=True)
        for t in tables:
            _ko_rows_pdf(t, max_rows_per_table).to_csv(
                os.path.join(path, f"{t.name}_ko_rows.csv"), index=False
            )
        return path


def _gauge(pct: float) -> str:
    color = "#2e7d32" if pct < 1 else "#f9a825" if pct < 5 else "#c62828"
    return (
        f'<div style="background:#eee;width:240px;height:14px;border-radius:7px">'
        f'<div style="background:{color};width:{min(pct, 100):.2f}%;height:14px;'
        f'border-radius:7px"></div></div>'
        f"<small>{pct:.2f}% rows KO</small>"
    )


def create_html_output(session, path: str, sample_rows: int = 20) -> str:
    """Static single-file HTML report over all session tables."""
    parts = [
        "<!doctype html><meta charset='utf-8'><title>data quality report</title>",
        "<style>body{font-family:sans-serif;margin:2em}table{border-collapse:"
        "collapse}td,th{border:1px solid #ccc;padding:4px 8px;font-size:13px}"
        "th{background:#f5f5f5}h2{margin-top:1.5em}</style>",
        "<h1>Data quality report</h1>",
    ]
    for t in session.tables:
        if not t.check_list:
            continue
        info = t.calculate_result_info()
        n_rows = max((c.n_rows for c in t.check_list), default=0)
        ann = t.annotate()
        n_ko_rows = ann.where(F.size("fired_rules") > 0).count()
        pct = 100.0 * n_ko_rows / n_rows if n_rows else 0.0
        parts.append(f"<h2>{html_mod.escape(str(t.name))}</h2>")
        parts.append(_gauge(pct))
        parts.append(
            f"<p>{info['n_checks']} checks — {info['n_ko_checks']} failing, "
            f"{info['n_warning_checks']} warning; total KO {info['total_n_ko']}</p>"
        )
        parts.append(
            "<table><tr><th>check</th><th>severity</th><th>n_ko</th>"
            "<th>n_rows</th><th>status</th></tr>"
        )
        for c in sorted(t.check_list, key=lambda c: -c.n_ko):
            status = "KO" if (c.flag_ko and c.severity == "fail") else (
                "warn" if c.flag_ko else "ok"
            )
            parts.append(
                f"<tr><td>{html_mod.escape(c.description)}</td>"
                f"<td>{c.severity}</td><td>{c.n_ko}</td>"
                f"<td>{c.n_rows}</td><td>{status}</td></tr>"
            )
        parts.append("</table>")
        sample = _ko_rows_pdf(t, sample_rows)
        if len(sample):
            parts.append("<details><summary>sample failing rows</summary>")
            parts.append(sample.to_html(index=False, border=0))
            parts.append("</details>")
    out = path if path.endswith(".html") else path + ".html"
    with open(out, "w") as f:
        f.write("\n".join(parts))
    return out
