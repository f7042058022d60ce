"""The driver's test tables have shipped `events.ts` in three different
parquet encodings across rounds — TIMESTAMP(NANOS) (read as raw longs
under nanosAsLong), un-annotated µs (Spark 4 infers TIMESTAMP_NTZ), and
tz-annotated µs (plain TIMESTAMP). A loader baked for one encoding
either crashes (unix_micros on NTZ) or silently corrupts (ns→µs integer
division applied to µs values). Pin that BOTH the batch loader and the
schema-probing streaming source normalize all three to identical
TIMESTAMP instants."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_api_spark.tables import events_stream, load_table

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
    dt.datetime(2024, 1, 1, 12, 34, 56, 654321),
    dt.datetime(2024, 2, 29, 23, 59, 59, 1),
]
EXPECT_US = [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in TS]


def _write_events(dirpath, ts_type):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS, pa.timestamp("us")).cast(ts_type),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, f"{dirpath}/events.parquet", store_schema=False)


ENCODINGS = {
    "us_naive": pa.timestamp("us"),
    "us_utc": pa.timestamp("us", tz="UTC"),
    "ns_naive": pa.timestamp("ns"),
}


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_load_table_normalizes_all_encodings(spark, tmp_path, enc):
    d = tmp_path / enc
    d.mkdir()
    _write_events(str(d), ENCODINGS[enc])
    df = load_table(spark, str(d), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = sorted(
        r[0] for r in df.selectExpr("unix_micros(ts)").collect()
    )
    assert got == sorted(EXPECT_US)


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_events_stream_normalizes_all_encodings(spark, tmp_path, enc):
    from pyspark.sql import functions as F

    from docling_api_spark.streaming.jobs import drain_stream_to_parquet

    d = tmp_path / enc
    d.mkdir()
    _write_events(str(d), ENCODINGS[enc])
    out = drain_stream_to_parquet(
        events_stream(spark, str(d)).select(F.unix_micros("ts").alias("t_us")),
        prefix=f"tsenc_{enc}",
    )
    got = sorted(r.t_us for r in out.collect())
    assert got == sorted(EXPECT_US)
