"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every oracle-checked operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver imports this file by path; make the package importable
# regardless of the caller's working directory.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# Executor python workers don't inherit this sys.path; PYTHONPATH set
# before the JVM launches covers sessions created after this import...
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def _ensure_shipped(spark: SparkSession) -> None:
    """...and addPyFile covers sessions that already exist: ship the
    package as a zip so workers can unpickle our pandas UDFs."""
    sc = spark.sparkContext
    if getattr(sc, "_kps_shipped", False):
        return
    import shutil
    import tempfile

    zip_base = os.path.join(tempfile.gettempdir(), "kinesis_producer_spark_pkg")
    zip_path = shutil.make_archive(
        zip_base, "zip", root_dir=_REPO_ROOT, base_dir="kinesis_producer_spark"
    )
    sc.addPyFile(zip_path)
    sc._kps_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kinesis_producer_spark.operators.relational import q01_pricing_summary

    _ensure_shipped(spark)
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kinesis_producer_spark.suite import load_all

    q, _ = load_all()

    def shipped(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: shipped(fn) for name, fn in q.items()}


def oracle_sql() -> dict[str, str]:
    from kinesis_producer_spark.suite import load_all

    _, o = load_all()
    return dict(o)
