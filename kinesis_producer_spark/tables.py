"""Loaders for the driver-generated TPC-H-ish parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Money-typed columns per table. The driver regenerates fixtures between
# rounds and physical types can drift (events.ts nanos→µs already did);
# if a money column arrives as decimal(p,2) instead of double, normalize
# to double so every downstream cents-quantization (floor(x*100+0.5))
# keeps bit-identical semantics with the DuckDB oracle, which applies
# the same arithmetic to the same parquet values.
MONEY_COLUMNS: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
    "events": ("value",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown + pruning for free.

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet footer; Spark reads
    it as long (session.py sets ``nanosAsLong``) and we truncate to
    microseconds — the same truncation DuckDB applies — so both engines
    see identical timestamp values.
    """
    if name == "events":
        # set at runtime too: the driver may pass a session built without
        # this conf, and events.parquet is unreadable without it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # parquet timestamp[us] without tz → NTZ in Spark 4; cast to
            # LTZ (identity under the UTC session tz) so epoch arithmetic
            # (cast to long, unix_timestamp) and window gaps keep working.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    money = MONEY_COLUMNS.get(name, ())
    if money:
        from pyspark.sql import functions as F

        dtypes = dict(df.dtypes)
        for c in money:
            if dtypes.get(c, "").startswith("decimal"):
                df = df.withColumn(c, F.col(c).cast("double"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ensure a compute-heavy per-row stage uses every core.

    A small input (one parquet file < maxPartitionBytes) arrives as a
    single split, serializing expensive per-row work (XML parse, k·|shingles|
    hashing) on one core. When upstream parallelism is below the cluster
    default, repartition — the shuffle moves raw strings once and is
    dwarfed by the compute. At scale (splits ≫ cores) this is a no-op.

    ``target`` caps the fan-out below the cluster default for stages
    whose per-row work is LIGHT relative to scheduling cost (the
    caller derives it from input size — e.g. q147's per-round pair
    scan is ~µs/byte, where a 32-way split of a KB-scale state costs
    more task scheduling than it buys back in parallelism).
    """
    if df.isStreaming:  # micro-batch sizing is the trigger's job
        return df
    want = df.sparkSession.sparkContext.defaultParallelism
    if target is not None:
        want = max(1, min(want, target))
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
