from data_quality_spark.rules.core import Rule, RuleEngine, is_empty, not_empty
from data_quality_spark.rules.table import QualityTable

__all__ = ["Rule", "RuleEngine", "QualityTable", "is_empty", "not_empty"]
