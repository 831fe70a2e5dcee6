"""data_quality_spark — a PySpark-native data-quality / web-text quality-filter engine.

Built from scratch with the capabilities of ``stefanogelli92/data_quality``
(reference at /root/reference, cited by file:line in docstrings), re-expressed
Spark-first: every declarative check compiles to a Catalyst ``Column`` expression
and ALL checks on a table evaluate in ONE partition-parallel scan (the reference
issues one full-table query per check — ``check.py:84-126``).

Public surface:
    QualitySession  — session holder (reference: data_quality_holder.py:16-85)
    QualityTable    — table + check_* API     (reference: table.py:27-844)
    Rule, RuleEngine — declarative rule core
    pipeline.quality_filter — the web-text keep/drop + scrub pipeline
"""

from data_quality_spark.session import QualitySession, get_spark
from data_quality_spark.rules.core import Rule, RuleEngine
from data_quality_spark.rules.table import QualityTable

__version__ = "0.1.0"

__all__ = [
    "QualitySession",
    "QualityTable",
    "Rule",
    "RuleEngine",
    "get_spark",
    "__version__",
]
