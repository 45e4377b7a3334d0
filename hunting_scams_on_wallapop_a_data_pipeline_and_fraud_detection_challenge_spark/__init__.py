"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference Wallapop scam-hunting pipeline
(AnaMontuengaGarcia/Hunting-Scams-on-Wallapop-A-Data-Pipeline-and-Fraud-
Detection-Challenge), re-expressed Spark-first.

Everything is DataFrames over Parquet: the reference's row-at-a-time
Python loops become declarative Catalyst plans, its dict lookups become
broadcast hash joins, its cron+ElastAlert loop becomes Structured
Streaming. See SURVEY.md for the WHAT→HOW mapping (§2 operator ids are
cited throughout docstrings).
"""

__version__ = "0.1.0"
