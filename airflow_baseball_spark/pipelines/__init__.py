"""Batch pipelines — one pure DataFrame→DataFrame function per reference
DAG stage, composable into a single Spark job or orchestrated by Airflow
(SURVEY.md §3)."""
