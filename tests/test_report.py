"""Reporting + packaging + datetime-inference surfaces."""

import os
import subprocess
import sys
import zipfile

from pyspark.sql import functions as F


def _session_with_checks(spark, sf_dir):
    from data_quality_spark.session import QualitySession

    s = QualitySession(spark)
    t = s.table_from_parquet(
        f"{sf_dir}/orders.parquet", "orders", index_column="o_orderkey"
    )
    t.check_index_not_null()
    t.check_columns_between_values("o_totalprice", min_value=0, max_value=300000)
    t.run(get_rows_flag=False)
    return s


def test_html_report(spark, sf_dir, tmp_path):
    s = _session_with_checks(spark, sf_dir)
    out = s.create_html_output(str(tmp_path / "report"))
    html = open(out).read()
    assert "orders" in html and "rows KO" in html
    assert "not between 0 and 300000" in html
    # interactive surface: tabs, gauges, toggleable per-check samples,
    # sortable columns — all inline, no external JS/CSS
    assert "tabbar" in html and "showTab" in html
    assert "<svg" in html and "gauge" in html
    assert "tglSample" in html and "class='sample'" in html
    assert "sortBy" in html
    assert "cdn" not in html.lower() and "http://" not in html and "https://" not in html


def test_export_details_csv_fallback(spark, sf_dir, tmp_path):
    s = _session_with_checks(spark, sf_dir)
    out = s.create_export_details_excel(str(tmp_path / "details"))
    # no openpyxl in this container → CSV directory fallback
    files = os.listdir(out)
    assert any(f.endswith("_ko_rows.csv") for f in files)


def test_infer_datetime_format(spark):
    from data_quality_spark.rules.table import infer_datetime_format

    df = spark.createDataFrame(
        [("2024/01/0%d" % (i % 9 + 1),) for i in range(30)], "d string"
    )
    fmt = infer_datetime_format(df, "d")
    assert fmt is not None
    parsed = df.select(F.to_timestamp("d", fmt).alias("t")).where(
        F.col("t").isNotNull()
    )
    assert parsed.count() == 30


def test_py_files_zip_importable(tmp_path):
    sys.path.insert(0, "/root/repo")
    from tools.package import build

    zp = build(str(tmp_path))
    with zipfile.ZipFile(zp) as z:
        names = z.namelist()
    assert "data_quality_spark/session.py" in names
    assert "data_quality_spark/pipeline/quality_filter.py" in names
    # importable off the zip alone (what --py-files relies on)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import data_quality_spark.functions.langid as L; "
        "print(L.predict_one('the of and to in is it')[0])" % zp
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True,
        cwd=str(tmp_path), env={**os.environ, "PYTHONPATH": ""},
    )
    assert out.returncode == 0 and out.stdout.strip() == "en"


def test_html_report_over_cap_prefix(spark, sf_dir, tmp_path):
    """When a check's KO sample hits its row cap, the gauge must render the
    reference's estimation prefix ('>' when the KO bound is loose, '≈' when
    tight — plot.py:184-196) and mark the capped sample; samples must show
    only source-table columns (never engine/aux columns)."""
    from data_quality_spark.session import QualitySession

    s = QualitySession(spark)
    t = s.table_from_parquet(
        f"{sf_dir}/orders.parquet", "orders", index_column="o_orderkey"
    )
    # two checks with heavily-overlapping KO sets and a tiny cap → capped
    # samples AND a loose unique-row bound (max-min spread > 1% of rows)
    t.check_custom_condition("o_totalprice < 100000", rule_id="low", n_max_rows_output=5)
    t.check_custom_condition("o_totalprice > 200000", rule_id="high", n_max_rows_output=5)
    res = t.run(get_rows_flag=True)
    assert any(c.flag_over_max_rows for c in res)
    out = s.create_html_output(str(tmp_path / "capped"))
    html = open(out).read()
    assert "&gt;" in html.split("rows KO")[0]  # '>' prefix in the gauge text
    assert "(sample capped)" in html
    assert "fired_descriptions" not in html  # engine columns filtered
    assert "flag_only_warning" not in html

    # tight bound: a single capped check → range 0 → '≈' prefix
    s2 = QualitySession(spark)
    t2 = s2.table_from_parquet(
        f"{sf_dir}/orders.parquet", "orders", index_column="o_orderkey"
    )
    t2.check_custom_condition("o_totalprice > 1000", rule_id="big", n_max_rows_output=5)
    t2.run(get_rows_flag=True)
    html2 = open(s2.create_html_output(str(tmp_path / "capped2"))).read()
    assert "≈" in html2

    # uncapped: exact gauge, no prefix
    s3 = QualitySession(spark)
    t3 = s3.table_from_parquet(
        f"{sf_dir}/orders.parquet", "orders", index_column="o_orderkey"
    )
    t3.check_index_not_null()
    t3.run(get_rows_flag=True)
    html3 = open(s3.create_html_output(str(tmp_path / "uncapped"))).read()
    assert "≈" not in html3
