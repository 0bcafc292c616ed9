"""Pipeline observability (SURVEY.md §2a row 28).

The reference counts progress with module-global integers incremented
from worker threads (reference decompression.py:20-21,45,50-53,80) —
unsynchronized, and therefore racy. The Spark-native equivalent is the
``Observation`` API: metric expressions attached to the plan, computed
on executors during the action, merged exactly once — race-free by
construction, and they piggyback on the job (no second pass over the
data, unlike a separate ``count()``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession


def observe(df: DataFrame, name: str, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach metric expressions to a plan; read ``obs.get`` after any
    action on the returned DataFrame."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def metrics_frame(spark: SparkSession, obs: Observation, schema: str) -> DataFrame:
    """The collected metrics as a single-row DataFrame (stable schema)."""
    row = obs.get
    cols = [f.split()[0] for f in schema.split(",")]
    return spark.createDataFrame([tuple(row[c] for c in cols)], schema)
