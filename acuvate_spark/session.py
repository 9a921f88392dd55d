"""SparkSession bootstrap and compatibility tuning.

Two entry paths:

* ``get_spark()`` — used by our own tests/bench; builds a local session
  sized by ``SPARK_GRAFT_CPUS``.
* ``tune(spark)`` — applied to ANY session (including the driver's)
  before reading the test tables. Everything set here must be
  runtime-settable (verified: ``spark.sql.legacy.parquet.nanosAsLong``
  and ``spark.sql.session.timeZone`` are).

Why these settings:

* ``nanosAsLong`` — the driver-generated parquet stores ``events.ts``
  as INT64 TIMESTAMP(NANOS), which Spark's vectorized reader rejects.
  With the flag on, it reads as a long; ``tables.load_table`` converts
  to a microsecond timestamp (integer ``div 1000`` — float division
  would lose precision above 2^53).
* session timezone UTC — keeps naive parquet timestamps bit-identical
  between Spark results and the DuckDB oracle.
* AQE on — runtime coalescing + skew-join handling is a core part of
  the 100 TB story (SURVEY.md §4); local runs keep the same plan shape
  the cluster would use.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Settings safe (and necessary) to apply to an externally-owned session.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Driver-generated parquet has also shipped events.ts as plain
    # TIMESTAMP(MICROS) with no UTC flag; Spark 4 infers that as
    # TIMESTAMP_NTZ, which unix_micros()/window() reject or treat
    # differently. Read it as the session-local TIMESTAMP instead —
    # with the UTC session timezone below the values are identical.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Externally-owned sessions keep Spark's default of 200 shuffle
    # partitions — wasteful scheduling at test scale; 64 + AQE
    # coalescing is right for local runs, and a cluster deployment
    # overrides it per-job anyway.
    "spark.sql.shuffle.partitions": "64",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable compatibility/perf confs; never raises."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass
    return spark


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "acuvate-spark", cpus: int | None = None) -> SparkSession:
    """Local session for tests and bench runs.

    Shuffle partitions default to the core count: at local scale the
    data fits easily, and AQE coalesces further; on a real cluster this
    would be sized to ~2-3x total cores (see README scale notes).
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    return tune(builder.getOrCreate())
