"""airflow_baseball_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
surface of the ``zjacom/airflow-baseball`` reference pipeline (studied
read-only at ``/root/reference``): sabermetric batch analytics (park
factor, wOBA, wRC, wRC+, OPS+, K%, BB%, BABIP, FIP, K/9, BB/9, HR/9),
upsert-style idempotent sinks, broadcast-join denormalization, window
top-k extracts — plus LLM-data-pipeline extensions (deduplication,
similarity search, text analysis, multimodal column plumbing) designed
for 100 TB scale.

Everything here is declarative DataFrame/SQL so Catalyst handles column
pruning, predicate pushdown, and join strategy; Python stays out of the
hot path (Pandas UDFs only where vectorized Python is genuinely needed).
"""

__version__ = "0.1.0"
