"""parquet_combiner_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first re-expression of the query and
data-processing capabilities of the reference system
(Yakashimaru/Parquet-combiner, studied read-only at /root/reference):
Parquet scan/sink, dedup-by-key, grouped aggregation, per-group top-K
ranking, broadcast dimension join with default-on-miss, skew-tolerant
aggregation — plus the large-scale training-data operators (dedup
families, similarity search, text analysis, multimodal plumbing) that a
100 TB pipeline needs.

Design stance (see SURVEY.md §4, §7): everything is declared through
the DataFrame/SQL API so Catalyst/Tungsten/AQE pick the physical plan;
no RDDs, no row-at-a-time Python in the hot path.
"""

__version__ = "0.1.0"

from parquet_combiner_spark.session import get_spark  # noqa: F401
