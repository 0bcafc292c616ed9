"""End-to-end pipeline test (SURVEY.md §5.3): synthetic tar-of-XML →
unpack → flatten → partitioned CSV re-read → golden compare, plus the
produce stage against the recording transport."""

from __future__ import annotations

import io
import os
import sys
import tarfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kinesis_producer_spark.pipelines import (  # noqa: E402
    flatten_day,
    produce_day,
    unpack_day,
    validate_arg,
)

NS = "http://uptake.com/bhp/1/sensors"


def _signal_xml(i: int, ts: str, site: str, rms: str) -> bytes:
    return (
        f'<NS1:message xmlns:NS1="{NS}"><NS1:messagePayload>'
        f"<NS1:vehicleIdentifier>veh_{i}</NS1:vehicleIdentifier>"
        f"<NS1:typeOfReading>ACOUSTIC</NS1:typeOfReading>"
        f"<NS1:readingTimestampUTC>{ts}</NS1:readingTimestampUTC>"
        f"<NS1:readingCollection>"
        f"<NS1:reading><NS1:attributeName>SiteName</NS1:attributeName>"
        f"<NS1:attributeValue>{site}</NS1:attributeValue></NS1:reading>"
        f"<NS1:reading><NS1:attributeName>RMSTotalDB</NS1:attributeName>"
        f"<NS1:attributeValue>{rms}</NS1:attributeValue>"
        f"<NS1:attributeUoM>db</NS1:attributeUoM></NS1:reading>"
        f"</NS1:readingCollection></NS1:messagePayload></NS1:message>"
    ).encode()


@pytest.fixture()
def lake(tmp_path):
    """unprocessed-raw/ACOUSTIC/year=2022/month=03/day=07/ with 2 tars
    of 3 XML files each."""
    day_dir = tmp_path / "unprocessed-raw" / "ACOUSTIC" / "year=2022" / "month=03" / "day=07"
    day_dir.mkdir(parents=True)
    n = 0
    for a in range(2):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for _ in range(3):
                data = _signal_xml(
                    n, f"2022-03-07T0{n}:00:00", f"site_{n % 2}", f"{100 + n}.5"
                )
                info = tarfile.TarInfo(name=f"reading_{n}.xml")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                n += 1
        (day_dir / f"archive_{a}.tar").write_bytes(buf.getvalue())
    return tmp_path


def test_unpack_flatten_produce_end_to_end(spark, lake):
    src = str(lake / "unprocessed-raw")
    compacted = str(lake / "unpacked-compacted-raw")
    flattened = str(lake / "flattened-raw")

    unpack_day(spark, src, compacted, "ACOUSTIC", "2022", "03", "07")
    recs = spark.read.json(f"{compacted}/ACOUSTIC/year=2022/month=03/day=07")
    assert recs.count() == 6
    assert set(recs.columns) >= {"payload", "tenant_id", "partition_id"}
    assert recs.select("tenant_id").distinct().collect()[0][0] == "bhp"

    flatten_day(spark, compacted, flattened, "ACOUSTIC", "2022", "03", "07")
    flat = spark.read.option("header", True).csv(
        f"{flattened}/ACOUSTIC/year=2022/month=03/day=07"
    )
    assert flat.count() == 6
    rows = {r["vehicleIdentifier"]: r for r in flat.collect()}
    for i in range(6):
        assert rows[f"veh_{i}"]["RMSTotalDB"] == f"{100 + i}.5"
        assert rows[f"veh_{i}"]["RMSTotalDB_UoM"] == "db"
        assert rows[f"veh_{i}"]["SiteName"] == f"site_{i % 2}"
        assert rows[f"veh_{i}"]["typeOfReading"] == "ACOUSTIC"

    from kinesis_producer_spark.streaming.kinesis_sink import KinesisSink, RecordingTransport

    transports: list[RecordingTransport] = []

    def factory():
        t = RecordingTransport(n_shards=2)
        transports.append(t)
        return t

    sink = KinesisSink(
        stream_name="e2e-stream", transport_factory=factory, max_retries=3, backoff_s=0.0
    )
    acks = produce_day(spark, compacted, "ACOUSTIC", sink, year="2022", month="03", day="07")
    got = acks.collect()
    assert len(got) == 6
    assert all(r["status"] == "ok" for r in got)
    assert all(r["partition_key"] == "ACOUSTIC" for r in got)


def test_validate_arg_rejects_unknown_domain():
    with pytest.raises(ValueError, match="reading_type"):
        validate_arg("SONAR", ["ACOUSTIC"], "reading_type")


def test_unpack_rejects_bad_type(spark, tmp_path):
    with pytest.raises(ValueError):
        unpack_day(spark, str(tmp_path), str(tmp_path), "NOT_A_TYPE", "2022", "01", "01")
