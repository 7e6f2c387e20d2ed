"""Relational sinks (SURVEY.md §2.1 S9).

Reference analog: /root/reference/osmdq/geom_tasks.py:21-51 loads
stage tables into Postgres (pandas ``to_sql`` over sqlalchemy, one
driver-side connection). Spark-first: ``df.write.jdbc`` — one JDBC
connection PER PARTITION writing batched inserts in parallel, which is
the shape that survives a 1000-executor job... as long as the
connection count is bounded: a 32k-partition frame must not open 32k
connections against one database, hence ``num_partitions``.

No database ships in this container, so the correctness surface is a
unit test over the writer wiring (mock writer + a real mock-URL call
that must reach Spark's JDBC layer and fail with a driver error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "error",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """Write ``df`` to a JDBC table.

    - ``batchsize`` amortizes insert round-trips (JDBC executeBatch).
    - ``num_partitions`` coalesces before the write to cap concurrent
      connections (coalesce, not repartition: no shuffle — it only
      merges partitions on the existing executors).
    - ``properties`` passes through user/password/driver etc.
    """
    props = {"batchsize": str(batchsize)}
    props.update(properties or {})
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    df.write.jdbc(url=url, table=table, mode=mode, properties=props)
