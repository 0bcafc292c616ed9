"""Oracle-checked round-trip queries for the ETL operator library.

Pattern: build reference-shaped documents (signal XML, component
trees, concatenated blobs, tar archives, JSON record envelopes) from
fixture rows *inside the plan*, push them through the real operators,
and reduce to values DuckDB can compute directly from the fixtures.
A parser/pivot/flatten bug breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_producer_spark.functions import dsum, dsum_sql
from kinesis_producer_spark.operators.eav_pivot import melt, pivot_declared, pivot_dynamic
from kinesis_producer_spark.operators.flatten import flatten_components
from kinesis_producer_spark.operators.splitter import split_concatenated
from kinesis_producer_spark.registry import query
from kinesis_producer_spark.sinks import wrap_records
from kinesis_producer_spark.sources.xml import (
    COMPONENT_END_TAG,
    SIGNAL_END_TAG,
    parse_component_docs,
    parse_signal_messages,
)
from kinesis_producer_spark.tables import load_table

_SENSOR_XMLNS = "http://uptake.com/bhp/1/sensors"
_COMPONENT_XMLNS = "http://www.uptake.com/bhp/1/vehicleComponent"


def _signal_xml_from_events(e: DataFrame) -> DataFrame:
    """Reference-shaped signal message per event row (NS1-prefixed).

    Fans out first so the string-building projection (and everything
    downstream) runs on every core even when the input is one split."""
    from kinesis_producer_spark.sources.xml import fan_out

    e = fan_out(e)
    k = F.get_json_object("props", "$.k")
    xml = F.concat(
        F.lit(f'<NS1:message xmlns:NS1="{_SENSOR_XMLNS}"><NS1:messagePayload>'),
        F.lit("<NS1:vehicleIdentifier>veh_"),
        F.col("user_id").cast("string"),
        F.lit("</NS1:vehicleIdentifier><NS1:typeOfReading>"),
        F.col("event_type"),
        F.lit("</NS1:typeOfReading><NS1:readingTimestampUTC>"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        F.lit("</NS1:readingTimestampUTC><NS1:readingCollection>"),
        F.lit("<NS1:reading><NS1:attributeName>value</NS1:attributeName><NS1:attributeValue>"),
        F.col("value").cast("string"),
        F.lit("</NS1:attributeValue><NS1:attributeUoM>db</NS1:attributeUoM></NS1:reading>"),
        F.lit("<NS1:reading><NS1:attributeName>k</NS1:attributeName><NS1:attributeValue>"),
        k,
        F.lit("</NS1:attributeValue></NS1:reading>"),
        F.lit("</NS1:readingCollection></NS1:messagePayload></NS1:message>"),
    )
    return e.select(xml.alias("payload"))


@query(
    "q30_signal_xml_roundtrip",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n,
           {dsum_sql('value')} AS sum_value,
           CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k":\\s*([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_uom,
           MAX(STRFTIME(ts, '%Y-%m-%dT%H:%M:%S.%f')) AS max_ts
    FROM events
    GROUP BY event_type
    """,
)
def q30_signal_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → signal XML → parse → declared EAV pivot → aggregate.

    Exercises SURVEY §2a rows 9 (XML parse), 10 (declared pivot incl.
    UoM companions), 12 (envelope projection + namespace strip).
    """
    e = load_table(spark, sf_dir, "events")
    msgs = _signal_xml_from_events(e)
    parsed = parse_signal_messages(msgs, "payload", mode="FAILFAST")
    wide = pivot_declared(parsed, declared=["value", "k"], uom_for=["value"], keep_extras=False)
    return (
        wide.select(
            F.col("envelope").getItem("typeOfReading").alias("event_type"),
            F.col("envelope").getItem("readingTimestampUTC").alias("rts"),
            F.col("value").cast("double").alias("v"),
            F.col("k").cast("bigint").alias("k"),
            F.col("value_UoM").alias("uom"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("v", "sum_value"),
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("uom") == "db", 1)).alias("n_uom"),
            F.max("rts").alias("max_ts"),
        )
    )


_EAV_ORACLE = f"""
    SELECT l_returnflag,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_price,
           {dsum_sql('l_discount')} AS sum_disc,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
"""


def _lineitem_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem numeric columns as the readings-array EAV shape."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_returnflag",
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("name"),
                    F.col(c).cast("string").alias("value"),
                    F.lit(None).cast("string").alias("uom"),
                )
                for c in ["l_quantity", "l_extendedprice", "l_discount"]
            ]
        ).alias("readings"),
    )


@query("q31_eav_pivot_declared", oracle=_EAV_ORACLE)
def q31_eav_pivot_declared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise melt→declared-pivot round trip (zero shuffle on the pivot)."""
    eav = _lineitem_readings(spark, sf_dir)
    wide = pivot_declared(
        eav,
        declared=["l_quantity", "l_extendedprice", "l_discount"],
        uom_for=[],
        keep_extras=False,
    )
    return wide.groupBy("l_returnflag").agg(
        dsum(F.col("l_quantity").cast("double"), "sum_qty"),
        dsum(F.col("l_extendedprice").cast("double"), "sum_price"),
        dsum(F.col("l_discount").cast("double"), "sum_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@query("q32_eav_pivot_dynamic", oracle=_EAV_ORACLE)
def q32_eav_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same round trip through the accreting-schema (two-pass) pivot."""
    eav = _lineitem_readings(spark, sf_dir)
    wide = pivot_dynamic(eav)
    return wide.groupBy("l_returnflag").agg(
        dsum(F.col("l_quantity").cast("double"), "sum_qty"),
        dsum(F.col("l_extendedprice").cast("double"), "sum_price"),
        dsum(F.col("l_discount").cast("double"), "sum_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q33_concat_split_roundtrip",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT MD5(REGEXP_REPLACE(REGEXP_REPLACE(text, '^\\s+', ''), '\\s+$', '')
                              || CHR(10) || '{SIGNAL_END_TAG}')) AS n_distinct_payloads
    FROM documents
    GROUP BY source
    """,
)
def q33_concat_split_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one concatenated blob per source → splitter → counts.

    Exercises SURVEY §2a row 8 (concatenated-document splitter) with the
    reference's exact reassembly semantics (trim + newline + end tag).
    """
    d = load_table(spark, sf_dir, "documents")
    blobs = (
        d.select("source", F.concat(F.col("text"), F.lit(SIGNAL_END_TAG)).alias("piece"))
        .groupBy("source")
        .agg(F.concat_ws("", F.collect_list("piece")).alias("blob"))
    )
    docs = split_concatenated(blobs, "blob", SIGNAL_END_TAG, out_col="payload")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("payload")).alias("n_distinct_payloads"),
    )


@query(
    "q34_component_flatten",
    oracle="""
    WITH top_cust AS (
      SELECT c_custkey, c_name, c_acctbal, c_nationkey,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rk
      FROM customer
    )
    SELECT 'region_' || r_name AS vehicleIdentifier,
           'tpch' AS sourceSystem,
           'nat_' || CAST(n_nationkey AS VARCHAR) AS componentCode,
           n_name AS componentName,
           NULL AS acctbal,
           NULL AS parent_code,
           0 AS depth
    FROM nation JOIN region ON r_regionkey = n_regionkey
    UNION ALL
    SELECT 'region_' || r_name,
           'tpch',
           'cust_' || CAST(c_custkey AS VARCHAR),
           c_name,
           CAST(c_acctbal AS VARCHAR),
           'nat_' || CAST(n_nationkey AS VARCHAR),
           1
    FROM top_cust
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE rk <= 3
    """,
)
def q34_component_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region→nation→customer tree as vehicleComponent XML → recursive
    flatten → adjacency list (SURVEY §2a rows 13-14)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    top3 = c.withColumn(
        "rk", F.row_number().over(W.partitionBy("c_nationkey").orderBy("c_custkey"))
    ).filter(F.col("rk") <= 3)

    cust_xml = F.concat(
        F.lit("<NS1:component><NS1:componentCode>cust_"),
        F.col("c_custkey").cast("string"),
        F.lit("</NS1:componentCode><NS1:componentName>"),
        F.col("c_name"),
        F.lit(
            "</NS1:componentName><NS1:componentAttributeCollection>"
            "<NS1:attribute><NS1:attributeName>acctbal</NS1:attributeName>"
            "<NS1:attributeValue>"
        ),
        F.col("c_acctbal").cast("string"),
        F.lit(
            "</NS1:attributeValue></NS1:attribute>"
            "</NS1:componentAttributeCollection></NS1:component>"
        ),
    )
    nation_members = (
        top3.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey", "n_name", "n_regionkey")
        .agg(F.concat_ws("", F.collect_list(cust_xml)).alias("children"))
    )
    nation_xml = F.concat(
        F.lit("<NS1:component><NS1:componentCode>nat_"),
        F.col("n_nationkey").cast("string"),
        F.lit("</NS1:componentCode><NS1:componentName>"),
        F.col("n_name"),
        F.lit("</NS1:componentName><NS1:subcomponentCollection>"),
        F.col("children"),
        F.lit("</NS1:subcomponentCollection></NS1:component>"),
    )
    region_docs = (
        nation_members.join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(F.concat_ws("", F.collect_list(nation_xml)).alias("components"))
        .select(
            F.concat(
                F.lit(f'<NS1:vehicleComponent xmlns:NS1="{_COMPONENT_XMLNS}">'),
                F.lit("<NS1:vehicleIdentifier>region_"),
                F.col("r_name"),
                F.lit("</NS1:vehicleIdentifier><NS1:sourceSystem>tpch</NS1:sourceSystem>"),
                F.lit("<NS1:componentCollection>"),
                F.col("components"),
                F.lit("</NS1:componentCollection></NS1:vehicleComponent>"),
            ).alias("payload")
        )
    )
    parsed = parse_component_docs(region_docs, "payload", mode="FAILFAST")
    flat = flatten_components(
        parsed,
        field_cols=["componentCode", "componentName", "acctbal"],
        include_depth=True,
    )
    return flat.select(
        "vehicleIdentifier",
        "sourceSystem",
        "componentCode",
        "componentName",
        "acctbal",
        "parent_code",
        "depth",
    )


@query(
    "q35_tar_roundtrip",
    oracle="""
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS member_name,
           CAST(STRLEN(text) AS BIGINT) AS size,
           MD5(text) AS content_md5,
           source AS archive
    FROM documents
    """,
)
def q35_tar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one tar per source (built per-group) → tar source →
    member rows (SURVEY §2a rows 4-5)."""
    import io
    import tarfile

    import pandas as pd

    from kinesis_producer_spark.sources.tar import tar_members

    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text")

    def build_tar(pdf: pd.DataFrame) -> pd.DataFrame:
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for _, row in pdf.iterrows():
                data = row["text"].encode("utf-8")
                info = tarfile.TarInfo(name=f"doc_{row['doc_id']}.txt")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        return pd.DataFrame({"source": [pdf["source"].iloc[0]], "content": [buf.getvalue()]})

    archives = d.groupBy("source").applyInPandas(build_tar, "source string, content binary")
    members = tar_members(archives, content_col="content", archive_col="source")
    return members.select(
        "member_name",
        "size",
        F.md5("content").alias("content_md5"),
        "archive",
    )


@query(
    "q36_record_wrap_roundtrip",
    oracle="""
    SELECT doc_id, MD5(text) AS payload_md5, 'bhp' AS tenant_id, source AS partition_id,
           MD5(text) AS b64_roundtrip_md5
    FROM documents
    """,
)
def q36_record_wrap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON record envelope (SURVEY §2a rows 6, 25, 27): wrap → extract
    back via get_json_object; base64 encode/decode round trip."""
    d = load_table(spark, sf_dir, "documents")
    wrapped = wrap_records(
        d, payload_col="text", tenant_id="bhp", partition_id=F.col("source"), out_col="record"
    )
    return wrapped.select(
        "doc_id",
        F.md5(F.get_json_object("record", "$.payload")).alias("payload_md5"),
        F.get_json_object("record", "$.tenant_id").alias("tenant_id"),
        F.get_json_object("record", "$.partition_id").alias("partition_id"),
        F.md5(F.unbase64(F.base64(F.col("text").cast("binary")))).alias("b64_roundtrip_md5"),
    )


@query(
    "q37_observed_metrics",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(CASE WHEN value > 900 THEN 1 END) AS BIGINT) AS n_hot,
           CAST(COUNT(value) AS BIGINT) AS n_values,
           {dsum_sql('value')} AS sum_value
    FROM events
    """,
)
def q37_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability (SURVEY §2a row 28): the reference's thread-global
    counters (decompression.py:20-21,45,50-53) as Observation metrics —
    computed on executors during the action, merged race-free, no
    second pass over the data."""
    from kinesis_producer_spark.observability import metrics_frame, observe

    e = load_table(spark, sf_dir, "events")
    observed, obs = observe(
        e,
        "unpack_counters",
        F.count(F.lit(1)).alias("n_records"),
        F.count(F.when(F.col("value") > 900, 1)).alias("n_hot"),
        F.count("value").alias("n_values"),
        dsum("value", "sum_value"),
    )
    observed.write.mode("overwrite").format("noop").save()
    return metrics_frame(
        spark, obs, "n_records bigint, n_hot bigint, n_values bigint, sum_value bigint"
    )


@query(
    "q38_flatten_pipeline_roundtrip",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('value')} AS sum_value,
           MAX(STRFTIME(ts, '%Y-%m-%dT%H:%M:%S.%f')) AS max_rts
    FROM events
    GROUP BY event_type
    """,
)
def q38_flatten_pipeline_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flatten *pipeline* through real storage: events → signal XML
    → compacted JSON-lines on disk → flatten_day (parse, dynamic pivot,
    quoted Hive-partitioned CSV) → re-read CSV → aggregate. Exercises
    the sink/source edges q30 covers only in-plan."""
    import hashlib
    import os
    import tempfile

    from kinesis_producer_spark.pipelines import flatten_day
    from kinesis_producer_spark.sinks import write_jsonlines

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"flatten_pipe_{tag}")
    compacted, flattened = f"{root}/compacted", f"{root}/flattened"
    slice_ = "ACOUSTIC/year=2024/month=01/day=01"

    e = load_table(spark, sf_dir, "events")
    msgs = _signal_xml_from_events(e).select(
        "payload", F.lit("bhp").alias("tenant_id"), F.lit("ACOUSTIC").alias("partition_id")
    )
    write_jsonlines(msgs, f"{compacted}/{slice_}", mode="overwrite")
    flatten_day(spark, compacted, flattened, "ACOUSTIC", "2024", "01", "01")

    flat = spark.read.option("header", True).csv(f"{flattened}/{slice_}")
    return (
        flat.select(
            F.col("typeOfReading").alias("event_type"),
            F.col("value").cast("double").alias("v"),
            F.col("readingTimestampUTC").alias("rts"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("v", "sum_value"),
            F.max("rts").alias("max_rts"),
        )
    )


# ---------------------------------------------------------------------------
# q146 — greedy size-bounded batch packing (reference aws_utils.py:27-45)
# ---------------------------------------------------------------------------

_PACK_MAX = 64_000_000

_PACK_ORACLE = f"""
WITH RECURSIVE inv AS (
  SELECT p_brand AS g, p_partkey AS key,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) * 200
           + CASE WHEN p_partkey % 97 = 0 THEN 80000000 ELSE 0 END AS s
  FROM part),
objs AS (SELECT g, s, ROW_NUMBER() OVER (PARTITION BY g ORDER BY key) AS rn FROM inv),
st AS (
  SELECT g, 0 AS rn, 0 AS acc_n, CAST(0 AS BIGINT) AS acc_size, 0 AS n_closed,
         CAST(NULL AS INTEGER) AS batch_id, CAST(NULL AS BIGINT) AS s
  FROM (SELECT DISTINCT g FROM objs)
  UNION ALL
  SELECT o.g, o.rn,
    CASE WHEN st.acc_size + o.s >= {_PACK_MAX}
         THEN CASE WHEN st.acc_n = 0 THEN 0 ELSE 1 END
         ELSE st.acc_n + 1 END,
    CASE WHEN st.acc_size + o.s >= {_PACK_MAX}
         THEN CASE WHEN st.acc_n = 0 THEN CAST(0 AS BIGINT) ELSE o.s END
         ELSE st.acc_size + o.s END,
    CASE WHEN st.acc_size + o.s >= {_PACK_MAX} THEN st.n_closed + 1 ELSE st.n_closed END,
    CASE WHEN st.acc_size + o.s >= {_PACK_MAX}
         THEN CASE WHEN st.acc_n = 0 THEN st.n_closed ELSE st.n_closed + 1 END
         ELSE st.n_closed END,
    o.s
  FROM st JOIN objs o ON o.g = st.g AND o.rn = st.rn + 1)
SELECT g AS prefix, batch_id, COUNT(*) AS n_objs, CAST(SUM(s) AS BIGINT) AS total_bytes
FROM st WHERE rn > 0 GROUP BY g, batch_id
"""


@query("q146_greedy_batch_packing", oracle=_PACK_ORACLE)
def q146_greedy_batch_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's size-bounded batch packer (aws_utils.py:27-45)
    as a distributed operator: greedy sequential accumulation in
    listing order, a batch closes when adding the next object would
    reach ``max_batch_size`` (the reference uses ``>=``), and an
    oversize object arriving on an EMPTY accumulator is emitted as its
    own single-object batch without touching the accumulator —
    faithfully including that quirk (aws_utils.py:33-35: the immediate
    yield skips the reset branch, so accumulation state survives).

    The object inventory is synthesized deterministically from
    ``part`` (retail-price-derived sizes, ~1%% oversize via the %%97
    gate); the "prefix" a packing runs over is the brand, mirroring
    the reference's per-(type, day) prefixes.

    Scale: packing is inherently sequential WITHIN a prefix (each
    decision depends on the running accumulator — the same reason the
    reference streams the S3 listing), so the engine runs one
    applyInPandas group per prefix: sequential inside, parallel across
    prefixes, which is exactly the reference's process-per-day scatter
    (mp_unpack.sh:18) with Spark doing the scheduling. Spark's own
    analogue for its scans is maxPartitionBytes/openCostInBytes
    (SURVEY §2a row 2); this operator exists for when the *user's*
    data layout needs reference-identical batch boundaries.
    """
    import pandas as pd

    part = load_table(spark, sf_dir, "part")
    inv = part.select(
        F.col("p_brand").alias("g"),
        F.col("p_partkey").alias("key"),
        (
            F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("bigint") * 200
            + F.when(F.col("p_partkey") % 97 == 0, 80_000_000).otherwise(0)
        ).alias("s"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("key").reset_index(drop=True)
        acc_n, acc_size, n_closed = 0, 0, 0
        ids = []
        for s in pdf["s"]:
            if acc_size + s >= _PACK_MAX:
                if acc_n == 0:
                    ids.append(n_closed)
                    n_closed += 1
                else:
                    n_closed += 1
                    ids.append(n_closed)
                    acc_n, acc_size = 1, s
            else:
                ids.append(n_closed)
                acc_n, acc_size = acc_n + 1, acc_size + s
        pdf["batch_id"] = ids
        return pdf[["g", "batch_id", "s"]]

    packed = inv.groupBy("g").applyInPandas(pack, "g string, batch_id int, s bigint")
    return packed.groupBy(F.col("g").alias("prefix"), "batch_id").agg(
        F.count(F.lit(1)).alias("n_objs"), F.sum("s").alias("total_bytes")
    )
