"""Sources and sinks (SURVEY.md §2 A).

The reference's I/O surface — MySQL scans (A7), keyed upserts (A8),
plain appends (A9), per-player CSV exports (A10), drop/recreate DDL
(A11) — re-expressed as schema-enforced Spark readers and partitioned
writers. Upsert semantics live in ``operators.upsert`` (the engine-side
MERGE); everything here is format plumbing.
"""

from airflow_baseball_spark.io.readers import (  # noqa: F401
    read_csv,
    read_jdbc_partitioned,
    read_json,
    read_parquet,
)
from airflow_baseball_spark.io.writers import (  # noqa: F401
    export_csv_partitioned,
    write_append,
    write_overwrite,
    write_partitioned,
)
