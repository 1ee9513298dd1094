"""Structured Streaming: exactly-once incremental Bronze ingestion,
watermarked window aggregations, custom stateful operator."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from autonomus_datapipeline_spark.streaming import (
    running_user_stats,
    sessionized_counts,
    stream_dir_to_bronze,
    windowed_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write_batch(src_dir, name, rows):
    (src_dir / name).write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def test_incremental_ingest_exactly_once(spark, tmp_path):
    """The reference's incremental-correctness claim (5 runs, zero duplicates,
    tex:165-166) reproduced with checkpointed availableNow file streaming."""
    src = tmp_path / "landing"
    src.mkdir()
    bronze = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(src, "b1.json", [
        {"sensor_id": "s1", "temperature": 70.0, "ts": "2024-01-01T00:00:00"},
        {"sensor_id": "s2", "temperature": 75.0, "ts": "2024-01-01T00:05:00"},
    ])
    q = stream_dir_to_bronze(spark, str(src), SCHEMA, bronze, ckpt, "sensors")
    q.awaitTermination(60)
    assert spark.read.parquet(bronze).count() == 2

    # run again with NO new files → nothing re-ingested (exactly-once)
    q = stream_dir_to_bronze(spark, str(src), SCHEMA, bronze, ckpt, "sensors")
    q.awaitTermination(60)
    assert spark.read.parquet(bronze).count() == 2

    # new file lands → only its rows are added
    _write_batch(src, "b2.json", [
        {"sensor_id": "s1", "temperature": 68.0, "ts": "2024-01-01T01:00:00"},
    ])
    q = stream_dir_to_bronze(spark, str(src), SCHEMA, bronze, ckpt, "sensors")
    q.awaitTermination(60)
    out = spark.read.parquet(bronze)
    assert out.count() == 3
    assert out.filter("_pipeline_id = 'sensors'").count() == 3
    assert set(out.columns) >= {"_ingestion_date", "_ingestion_timestamp",
                                "_pipeline_id", "_schema_version"}


def _run_stream_to_memory(df, name, mode="complete"):
    # complete mode: append-mode windows only emit once the watermark passes
    # their end, which never happens in a single availableNow batch.
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return q


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"sensor_id": "s1", "temperature": 1.0, "ts": "2024-01-01T00:10:00"},
        {"sensor_id": "s1", "temperature": 2.0, "ts": "2024-01-01T00:20:00"},
        {"sensor_id": "s1", "temperature": 3.0, "ts": "2024-01-01T01:10:00"},
        {"sensor_id": "s2", "temperature": 4.0, "ts": "2024-01-01T00:59:00"},
    ]
    _write_batch(src, "b.json", rows)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agg = windowed_counts(stream, "ts", "sensor_id", "1 hour", "2 hours")
    _run_stream_to_memory(agg, "win_counts")
    got = {
        (r["sensor_id"], str(r["window_start"])): r["n_events"]
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got[("s1", "2024-01-01 00:00:00")] == 2
    assert got[("s1", "2024-01-01 01:00:00")] == 1
    assert got[("s2", "2024-01-01 00:00:00")] == 1


def test_sessionized_counts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"sensor_id": "s1", "temperature": 1.0, "ts": "2024-01-01T00:00:00"},
        {"sensor_id": "s1", "temperature": 2.0, "ts": "2024-01-01T00:10:00"},
        {"sensor_id": "s1", "temperature": 3.0, "ts": "2024-01-01T02:00:00"},
    ]
    _write_batch(src, "b.json", rows)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agg = sessionized_counts(stream, "ts", "sensor_id", gap="30 minutes")
    _run_stream_to_memory(agg, "sess_counts")
    rows = spark.sql(
        "select * from sess_counts order by session_start"
    ).collect()
    assert [r["n_events"] for r in rows] == [2, 1]


def test_stateful_running_user_stats(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    _write_batch(src, "b1.json", [
        {"user_id": 1, "value": 10.0},
        {"user_id": 1, "value": 5.0},
        {"user_id": 2, "value": 1.0},
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    stats = running_user_stats(stream)
    q = (
        stats.writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("select * from user_stats").collect()
    }
    assert got[1] == (2, 15.0)
    assert got[2] == (1, 1.0)


def test_stream_upsert_to_table(spark, tmp_path):
    from autonomus_datapipeline_spark.streaming.ingest import stream_upsert_to_table

    src = tmp_path / "landing"
    src.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("version", T.LongType()),
    ])

    _write_batch(src, "b1.json", [
        {"k": 1, "v": "a", "version": 1},
        {"k": 2, "v": "b", "version": 1},
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    q = stream_upsert_to_table(stream, table, ckpt, ["k"], ["version"])
    q.awaitTermination(60)
    assert spark.read.parquet(table).count() == 2

    # second batch: update k=1, insert k=3; k=1's older version must lose
    _write_batch(src, "b2.json", [
        {"k": 1, "v": "a2", "version": 2},
        {"k": 3, "v": "c", "version": 1},
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    q = stream_upsert_to_table(stream, table, ckpt, ["k"], ["version"])
    q.awaitTermination(60)
    got = {r["k"]: (r["v"], r["version"]) for r in spark.read.parquet(table).collect()}
    assert got == {1: ("a2", 2), 2: ("b", 1), 3: ("c", 1)}


def test_enrich_with_static(spark, tmp_path):
    from autonomus_datapipeline_spark.streaming import aggregations

    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b.json", [
        {"sensor_id": "s1", "temperature": 1.0, "ts": "2024-01-01T00:00:00"},
        {"sensor_id": "s9", "temperature": 2.0, "ts": "2024-01-01T00:01:00"},
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    dim = spark.createDataFrame(
        [("s1", "lab"), ("s2", "roof")], ["sensor_id", "location"]
    )
    out = aggregations.enrich_with_static(stream, dim, "sensor_id")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r["sensor_id"]: r["location"]
           for r in spark.sql("select * from enriched").collect()}
    assert got == {"s1": "lab", "s9": None}


def test_interval_join_streams(spark, tmp_path):
    from autonomus_datapipeline_spark.streaming.aggregations import (
        interval_join_streams,
    )

    clicks_dir = tmp_path / "clicks"
    views_dir = tmp_path / "views"
    clicks_dir.mkdir(); views_dir.mkdir()
    click_schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("click_ts", T.TimestampType()),
    ])
    view_schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("view_ts", T.TimestampType()),
        T.StructField("page", T.StringType()),
    ])
    _write_batch(clicks_dir, "c.json", [
        {"user": "u1", "click_ts": "2024-01-01T00:05:00"},
        {"user": "u2", "click_ts": "2024-01-01T02:00:00"},
    ])
    _write_batch(views_dir, "v.json", [
        {"user": "u1", "view_ts": "2024-01-01T00:01:00", "page": "home"},   # 4 min before u1 click → match
        {"user": "u1", "view_ts": "2024-01-01T00:04:30", "page": "item"},   # 30s before → match
        {"user": "u2", "view_ts": "2024-01-01T00:00:00", "page": "home"},   # 2h before u2 click → no match
    ])
    clicks = spark.readStream.schema(click_schema).json(str(clicks_dir))
    views = spark.readStream.schema(view_schema).json(str(views_dir))
    joined = interval_join_streams(
        clicks, views, "user", "click_ts", "view_ts",
        upper="interval 10 minutes",
    ).select("l.user", "page")
    q = (
        joined.writeStream.format("memory").queryName("ij")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    rows = {(r["user"], r["page"]) for r in spark.sql("select * from ij").collect()}
    assert rows == {("u1", "home"), ("u1", "item")}


def test_parse_kafka_records_static(spark):
    from autonomus_datapipeline_spark.streaming.ingest import parse_kafka_records

    raw = spark.createDataFrame(
        [("sensor-readings", 0, 12, "2024-01-01T00:00:00",
          '{"sensor_id": "s1", "temperature": 71.5}')],
        ["topic", "partition", "offset", "timestamp", "value"],
    )
    schema = T.StructType([
        T.StructField("sensor_id", T.StringType()),
        T.StructField("temperature", T.DoubleType()),
    ])
    out = parse_kafka_records(raw, schema).collect()[0]
    assert out["sensor_id"] == "s1" and out["temperature"] == 71.5
    assert out["_kafka_topic"] == "sensor-readings"
    assert out["_kafka_offset"] == 12


def test_stream_dedup_within_watermark(spark, tmp_path):
    from autonomus_datapipeline_spark.streaming.aggregations import stream_dedup

    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b.json", [
        {"sensor_id": "s1", "temperature": 1.0, "ts": "2024-01-01T00:00:00"},
        {"sensor_id": "s1", "temperature": 1.0, "ts": "2024-01-01T00:00:30"},  # dup key
        {"sensor_id": "s2", "temperature": 2.0, "ts": "2024-01-01T00:01:00"},
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    deduped = stream_dedup(stream, ["sensor_id"], "ts")
    q = (
        deduped.writeStream.format("memory").queryName("sdd")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select sensor_id from sdd").collect()
    assert sorted(r["sensor_id"] for r in rows) == ["s1", "s2"]


# ---------------------------------------------------------------------------
# Kafka parity hardening (broker-less): the connector jar cannot run in this
# sandbox, so the kafka-source SHAPE (binary key/value, topic/partition/
# offset/timestamp/timestampType) is replayed through the file source and the
# shared parse path — covering exactly the semantics the reference's consumer
# implements (dag_generator.py:362-473: metadata propagation :400-406, offset
# tracking :408-412, commit-after-write :453-455, 5-runs-zero-dupes claim
# tex:165-166).
# ---------------------------------------------------------------------------

_KAFKA_JSON_SCHEMA = T.StructType([
    T.StructField("topic", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("key", T.StringType()),
    T.StructField("value", T.StringType()),
])


def _kafka_shaped(df):
    """Project a parsed JSON batch into the exact kafka-source schema:
    binary key/value, int timestampType."""
    return df.select(
        F.encode("key", "UTF-8").alias("key"),
        F.encode("value", "UTF-8").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
        F.lit(0).alias("timestampType"),
    )


def test_parse_kafka_records_edge_shapes(spark):
    """Offset/timestamp/value edge shapes through the shared parse path:
    tombstones (null value), malformed JSON, offset 0 and 2^62, duplicate
    offsets across partitions, sub-second timestamps, multibyte UTF-8."""
    from autonomus_datapipeline_spark.streaming.ingest import parse_kafka_records

    from datetime import datetime

    def ts(second, micro=0):
        return datetime(2024, 1, 1, 0, 0, second, micro)

    rows = [
        # (topic, partition, offset, timestamp, key, value)
        ("t", 0, 0, ts(0, 123456), "k0",
         '{"sensor_id": "s0", "temperature": 1.5}'),
        ("t", 0, 4611686018427387904, ts(1), "k1",
         '{"sensor_id": "s1", "temperature": 2.5}'),
        ("t", 1, 0, ts(2), "k2",          # same offset, other partition
         '{"sensor_id": "s2", "temperature": 3.5}'),
        ("t", 0, 7, ts(3), None, None),    # tombstone
        ("t", 1, 8, ts(4), "k4", "{not json"),  # malformed
        ("t", 1, 9, ts(5), "k5",
         '{"sensor_id": "sß→", "temperature": 4.5}'),      # multibyte utf-8
    ]
    raw = _kafka_shaped(
        spark.createDataFrame(rows, _KAFKA_JSON_SCHEMA)
    )
    schema = T.StructType([
        T.StructField("sensor_id", T.StringType()),
        T.StructField("temperature", T.DoubleType()),
    ])
    out = parse_kafka_records(raw, schema)
    got = {(r["_kafka_partition"], r["_kafka_offset"]): r for r in out.collect()}

    # No record dropped or merged: all 6 survive, keyed by (partition, offset).
    assert len(got) == 6
    assert got[(0, 0)]["sensor_id"] == "s0"
    # sub-second timestamp precision preserved
    assert got[(0, 0)]["_kafka_timestamp"].microsecond == 123456
    # offsets beyond int32 survive as long
    assert got[(0, 4611686018427387904)]["temperature"] == 2.5
    # same offset in a different partition is a distinct record
    assert got[(1, 0)]["sensor_id"] == "s2"
    # tombstone: metadata kept, parsed fields null
    assert got[(0, 7)]["sensor_id"] is None
    assert got[(0, 7)]["temperature"] is None
    # malformed JSON: metadata kept, parsed fields null (no row loss)
    assert got[(1, 8)]["sensor_id"] is None
    # multibyte round-trips through the binary cast
    assert got[(1, 9)]["sensor_id"] == "sß→"


def test_kafka_shaped_checkpoint_recovery_exactly_once(spark, tmp_path):
    """The reference's incremental claim (5 runs, zero duplicates) on the
    kafka-shaped schema: five availableNow runs over a growing offset log,
    with parse + sink + checkpoint identical to the live-broker plan. Fails
    if checkpoint resume drops OR re-ingests any (partition, offset)."""
    from autonomus_datapipeline_spark.streaming.ingest import parse_kafka_records

    src = tmp_path / "kafka_log"
    src.mkdir()
    sink = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    value_schema = T.StructType([
        T.StructField("sensor_id", T.StringType()),
        T.StructField("temperature", T.DoubleType()),
    ])

    def run_once():
        stream = _kafka_shaped(
            spark.readStream.schema(_KAFKA_JSON_SCHEMA).json(str(src))
        )
        q = (
            parse_kafka_records(stream, value_schema)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    expected = 0
    offset = 0
    for batch in range(5):
        n = batch + 1  # 1+2+3+4+5 = 15 records
        rows = []
        for _ in range(n):
            rows.append({
                "topic": "sensors",
                "partition": offset % 2,
                "offset": offset,
                "timestamp": f"2024-01-01T00:00:{offset:02d}",
                "key": f"k{offset}",
                "value": json.dumps(
                    {"sensor_id": f"s{offset}", "temperature": float(offset)}
                ),
            })
            offset += 1
        _write_batch(src, f"b{batch}.json", rows)
        expected += n
        run_once()
        out = spark.read.parquet(sink)
        assert out.count() == expected, f"run {batch}: dropped or duplicated rows"
        n_distinct = (
            out.select("_kafka_topic", "_kafka_partition", "_kafka_offset")
            .distinct()
            .count()
        )
        assert n_distinct == expected, f"run {batch}: duplicate (partition, offset)"

    # replay with NO new offsets: checkpoint resume must be a no-op
    run_once()
    assert spark.read.parquet(sink).count() == expected
    # spot-check parsed payloads survived the full path
    got = {r["sensor_id"]: r["temperature"]
           for r in spark.read.parquet(sink).collect()}
    assert got["s0"] == 0.0 and got["s14"] == 14.0


# ---------------------------------------------------------------------------
# Streaming near-dup gate (growing fingerprint index)
# ---------------------------------------------------------------------------

_BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green bottles hang quietly on the old stone wall near the river"
)
_NOVEL_TEXT = (
    "completely different content about distributed query engines "
    "shuffle partitions broadcast joins and columnar parquet readers"
)


def _doc_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )


def test_gate_batch_rejects_neardups_keeps_novel(spark):
    from autonomus_datapipeline_spark.operators.dedup import simhash
    from autonomus_datapipeline_spark.streaming.neardup import gate_batch

    corpus = spark.createDataFrame([(1, _BASE_TEXT)], _doc_schema())
    index_fp = simhash(corpus, "doc_id", "text", 64)
    batch = spark.createDataFrame(
        [
            # near-copy of the indexed doc (one word changed)
            (10, _BASE_TEXT.replace("lazy", "sleepy")),
            # novel
            (11, _NOVEL_TEXT),
            # intra-batch near-copy of 11 (one word changed) — loses to 11
            (12, _NOVEL_TEXT.replace("columnar", "vectorized")),
        ],
        _doc_schema(),
    )
    kept, matches = gate_batch(batch, index_fp, max_hamming=10)
    assert sorted(r["doc_id"] for r in kept.collect()) == [11]
    got = {(r["new_id"], r["index_id"]) for r in matches.collect()}
    assert (10, 1) in got and (12, 11) in got


def test_stream_neardup_gate_grows_index_across_batches(spark, tmp_path):
    from autonomus_datapipeline_spark.streaming.neardup import stream_neardup_gate

    src = tmp_path / "in"
    src.mkdir()
    paths = {
        "index": str(tmp_path / "index"),
        "kept": str(tmp_path / "kept"),
        "matches": str(tmp_path / "matches"),
        "ckpt": str(tmp_path / "ckpt"),
    }

    def run():
        stream = spark.readStream.schema(_doc_schema()).json(str(src))
        q = stream_neardup_gate(
            stream, paths["index"], paths["kept"], paths["matches"],
            paths["ckpt"], max_hamming=10,
        )
        q.awaitTermination(120)

    # batch 1: two novel docs (empty index) → both admitted
    _write_batch(src, "b1.json", [
        {"doc_id": 1, "text": _BASE_TEXT},
        {"doc_id": 2, "text": _NOVEL_TEXT},
    ])
    run()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()
    ) == [1, 2]

    # batch 2: a near-copy of doc 2 (admitted in a PREVIOUS batch — proves
    # the index grew) plus one genuinely new doc.
    _write_batch(src, "b2.json", [
        {"doc_id": 20, "text": _NOVEL_TEXT.replace("parquet", "orcfile")},
        {"doc_id": 21, "text": "entirely unrelated short note on tax law "
                               "amendments for municipal water utilities"},
    ])
    run()
    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()
    )
    assert kept_ids == [1, 2, 21]
    m = {(r["new_id"], r["index_id"]) for r in
         spark.read.parquet(paths["matches"]).collect()}
    assert (20, 2) in m
    # the index holds exactly the admitted docs
    idx = sorted(
        r["doc_id"] for r in spark.read.parquet(paths["index"]).collect()
    )
    assert idx == [1, 2, 21]
    # append-only sinks: batch 2 must NOT have rewritten batch 1's
    # partitions — each admitted doc lives in the partition of the batch
    # that admitted it.
    kept_by_batch = {
        r["doc_id"]: r["batch_id"]
        for r in spark.read.parquet(paths["kept"]).collect()
    }
    assert kept_by_batch[1] == kept_by_batch[2] == 0
    assert kept_by_batch[21] == 1


def test_neardup_gate_replayed_batch_is_idempotent(spark, tmp_path):
    """Structured Streaming's retry contract: a micro-batch may be
    re-delivered with the SAME batch_id after a failure. Replaying must
    not double-admit documents, double-report matches, or grow the index
    twice — the batch's sink partitions are replaced, not appended."""
    from autonomus_datapipeline_spark.streaming.neardup import (
        gate_and_append_batch,
    )

    paths = {
        "index": str(tmp_path / "index"),
        "kept": str(tmp_path / "kept"),
        "matches": str(tmp_path / "matches"),
    }
    b0 = spark.createDataFrame(
        [(1, _BASE_TEXT), (2, _NOVEL_TEXT)], _doc_schema()
    )
    b1 = spark.createDataFrame(
        [
            # near-copy of doc 2 → rejected against the batch-0 index
            (20, _NOVEL_TEXT.replace("parquet", "orcfile")),
            (21, "entirely unrelated short note on tax law amendments"),
        ],
        _doc_schema(),
    )

    def snapshot():
        return {
            name: sorted(
                tuple(r) for r in spark.read.parquet(path).collect()
            )
            for name, path in paths.items()
        }

    gate_and_append_batch(b0, 0, paths["index"], paths["kept"],
                          paths["matches"], max_hamming=10)
    gate_and_append_batch(b1, 1, paths["index"], paths["kept"],
                          paths["matches"], max_hamming=10)
    first = snapshot()
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(paths["kept"]).collect()) == [1, 2, 21]
    # replay batch 1 (same batch_id, same data) — full retry semantics
    gate_and_append_batch(b1, 1, paths["index"], paths["kept"],
                          paths["matches"], max_hamming=10)
    assert snapshot() == first
    # replay batch 0 too: its gate reads batch_id < 0 → empty index, the
    # same state the original attempt saw
    gate_and_append_batch(b0, 0, paths["index"], paths["kept"],
                          paths["matches"], max_hamming=10)
    assert snapshot() == first


def test_neardup_gate_sink_compaction_preserves_gating(spark, tmp_path):
    """compact_gate_sink folds committed batch partitions into one without
    changing sink contents, and later batches still gate correctly against
    the compacted index (compacted rows keep batch_id <= the compaction
    point, so every future `batch_id < N` read includes them)."""
    from autonomus_datapipeline_spark.streaming.neardup import (
        compact_gate_sink,
        gate_and_append_batch,
    )

    paths = {
        "index": str(tmp_path / "index"),
        "kept": str(tmp_path / "kept"),
        "matches": str(tmp_path / "matches"),
    }
    gate_and_append_batch(
        spark.createDataFrame([(1, _BASE_TEXT)], _doc_schema()), 0,
        paths["index"], paths["kept"], paths["matches"], max_hamming=10,
    )
    gate_and_append_batch(
        spark.createDataFrame([(2, _NOVEL_TEXT)], _doc_schema()), 1,
        paths["index"], paths["kept"], paths["matches"], max_hamming=10,
    )
    rows_before = sorted(
        (r["doc_id"], r["simhash"])
        for r in spark.read.parquet(paths["index"]).collect()
    )
    n = compact_gate_sink(spark, paths["index"], upto_batch_id=1)
    assert n == 2
    idx = spark.read.parquet(paths["index"])
    rows_after = sorted(
        (r["doc_id"], r["simhash"]) for r in idx.collect()
    )
    assert rows_after == rows_before
    # one physical partition left, and it's the compaction point
    assert set(r["batch_id"] for r in idx.collect()) == {1}
    # batch 2 still rejects a near-copy of compacted doc 1 and admits novelty
    gate_and_append_batch(
        spark.createDataFrame(
            [(30, _BASE_TEXT.replace("lazy", "sleepy")),
             (31, "short treatise on municipal drainage easements")],
            _doc_schema(),
        ), 2,
        paths["index"], paths["kept"], paths["matches"], max_hamming=10,
    )
    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()
    )
    assert kept_ids == [1, 2, 31]
    m = {(r["new_id"], r["index_id"]) for r in
         spark.read.parquet(paths["matches"]).collect()}
    assert (30, 1) in m


def test_compact_gate_sink_torn_run_recovers_without_duplicates(spark, tmp_path):
    """Crash-idempotency: a compaction that died after writing the
    consolidated partition but BEFORE deleting every older partition must
    be re-runnable without duplicating rows (the re-run's merge sees each
    old row twice — once consolidated, once in the surviving original —
    and collapses them)."""
    import shutil

    from autonomus_datapipeline_spark.streaming.neardup import (
        compact_gate_sink,
        gate_and_append_batch,
    )

    paths = {
        "index": str(tmp_path / "index"),
        "kept": str(tmp_path / "kept"),
        "matches": str(tmp_path / "matches"),
    }
    gate_and_append_batch(
        spark.createDataFrame([(1, _BASE_TEXT)], _doc_schema()), 0,
        paths["index"], paths["kept"], paths["matches"], max_hamming=10,
    )
    gate_and_append_batch(
        spark.createDataFrame([(2, _NOVEL_TEXT)], _doc_schema()), 1,
        paths["index"], paths["kept"], paths["matches"], max_hamming=10,
    )
    rows_before = sorted(
        (r["doc_id"], r["simhash"])
        for r in spark.read.parquet(paths["index"]).collect()
    )
    # simulate the torn first attempt: save batch 0's partition, compact,
    # then restore the old partition as the crash would have left it
    saved = str(tmp_path / "saved_batch0")
    shutil.copytree(f"{paths['index']}/batch_id=0", saved)
    compact_gate_sink(spark, paths["index"], upto_batch_id=1)
    shutil.copytree(saved, f"{paths['index']}/batch_id=0")
    # re-run (what an operator does after the crash): no duplicate rows
    n = compact_gate_sink(spark, paths["index"], upto_batch_id=1)
    assert n == 2
    idx = spark.read.parquet(paths["index"])
    assert sorted((r["doc_id"], r["simhash"]) for r in idx.collect()) == rows_before
    assert set(r["batch_id"] for r in idx.collect()) == {1}


def test_gate_raises_on_corrupt_index_instead_of_empty_gating(spark, tmp_path):
    """A genuinely unreadable index must FAIL the micro-batch (Structured
    Streaming then retries) — not silently gate against an empty index."""
    import pytest

    from autonomus_datapipeline_spark.streaming.neardup import (
        gate_and_append_batch,
    )

    index = tmp_path / "index"
    (index / "batch_id=0").mkdir(parents=True)
    (index / "batch_id=0" / "part-00000.parquet").write_bytes(b"not parquet")
    with pytest.raises(Exception):
        gate_and_append_batch(
            spark.createDataFrame([(9, _NOVEL_TEXT)], _doc_schema()), 1,
            str(index), str(tmp_path / "kept"), str(tmp_path / "matches"),
        )
    # and the sinks saw no partial admission
    import os
    assert not os.path.exists(tmp_path / "kept")


def test_gate_treats_uncommitted_index_dir_as_absent(spark, tmp_path):
    """An index directory that EXISTS but holds no committed ``batch_id=``
    partition (a crashed first index write leaving an empty dir or only
    ``_temporary`` debris) must gate against an empty index, not fail the
    read — otherwise every micro-batch retry fails deterministically and
    the stream is wedged forever on a sink that holds no data at all."""
    from autonomus_datapipeline_spark.streaming.neardup import (
        gate_and_append_batch,
    )

    index = tmp_path / "index"
    (index / "_temporary").mkdir(parents=True)
    gate_and_append_batch(
        spark.createDataFrame([(9, _NOVEL_TEXT)], _doc_schema()), 0,
        str(index), str(tmp_path / "kept"), str(tmp_path / "matches"),
    )
    kept = spark.read.parquet(str(tmp_path / "kept"))
    assert [r["doc_id"] for r in kept.collect()] == [9]
    idx = spark.read.parquet(str(index))
    assert set(r["batch_id"] for r in idx.collect()) == {0}


def test_gate_fs_injection_reaches_sink_probe(spark, tmp_path):
    """fs= threads from the stream wrapper into the foreachBatch body's
    sink-existence probe (the Spark Connect / object-store seam)."""
    from autonomus_datapipeline_spark.fsutil import LocalFS
    from autonomus_datapipeline_spark.streaming.neardup import (
        gate_and_append_batch,
        minhash_gate_and_append_batch,
    )

    class _RecordingFS(LocalFS):
        def __init__(self):
            self.calls = []

        def exists(self, path):
            self.calls.append(("exists", path))
            return super().exists(path)

        def listdir(self, path):
            self.calls.append(("listdir", path))
            return super().listdir(path)

    for body in (gate_and_append_batch, minhash_gate_and_append_batch):
        fs = _RecordingFS()
        base = tmp_path / body.__name__
        body(
            spark.createDataFrame([(9, _NOVEL_TEXT)], _doc_schema()), 0,
            str(base / "index"), str(base / "kept"), str(base / "matches"),
            fs=fs,
        )
        assert ("exists", str(base / "index")) in fs.calls


def test_stream_minhash_gate_grows_index_across_batches(spark, tmp_path):
    """MinHash-banded gate twin of the SimHash growth test: the band index
    accumulates across micro-batches, near-copies of PREVIOUSLY admitted
    docs are rejected, and sinks stay append-only per batch partition."""
    from autonomus_datapipeline_spark.streaming.neardup import (
        stream_minhash_gate,
    )

    src = tmp_path / "in"
    src.mkdir()
    paths = {
        "index": str(tmp_path / "index"),
        "kept": str(tmp_path / "kept"),
        "matches": str(tmp_path / "matches"),
        "ckpt": str(tmp_path / "ckpt"),
    }

    def run():
        stream = spark.readStream.schema(_doc_schema()).json(str(src))
        q = stream_minhash_gate(
            stream, paths["index"], paths["kept"], paths["matches"],
            paths["ckpt"],
        )
        q.awaitTermination(120)

    _write_batch(src, "b1.json", [
        {"doc_id": 1, "text": _BASE_TEXT},
        {"doc_id": 2, "text": _NOVEL_TEXT},
    ])
    run()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()
    ) == [1, 2]

    # batch 2: a near-copy of doc 2 (one word swapped — shares 3 of 4 LSH
    # bands, empirically pinned) + one genuinely new doc
    _write_batch(src, "b2.json", [
        {"doc_id": 20, "text": _NOVEL_TEXT.replace("parquet", "orcfile")},
        {"doc_id": 21, "text": "entirely unrelated short note on tax law "
                               "amendments for municipal water utilities"},
    ])
    run()
    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()
    )
    assert kept_ids == [1, 2, 21]
    m = {(r["new_id"], r["index_id"]) for r in
         spark.read.parquet(paths["matches"]).collect()}
    assert (20, 2) in m
    # index holds exactly the admitted docs' bands (4 bands per doc)
    idx = spark.read.parquet(paths["index"])
    assert sorted(
        r["doc_id"] for r in idx.select("doc_id").distinct().collect()
    ) == [1, 2, 21]
    assert idx.count() == 3 * 4
    kept_by_batch = {
        r["doc_id"]: r["batch_id"]
        for r in spark.read.parquet(paths["kept"]).collect()
    }
    assert kept_by_batch[1] == kept_by_batch[2] == 0
    assert kept_by_batch[21] == 1


def test_minhash_gate_replayed_batch_is_idempotent(spark, tmp_path):
    """Replay contract for the MinHash gate: re-delivering a batch with
    the same batch_id replaces its own partitions with byte-identical
    content — no double admission, no doubled index."""
    from autonomus_datapipeline_spark.streaming.neardup import (
        minhash_gate_and_append_batch,
    )

    paths = {
        "index": str(tmp_path / "index"),
        "kept": str(tmp_path / "kept"),
        "matches": str(tmp_path / "matches"),
    }
    b0 = spark.createDataFrame(
        [(1, _BASE_TEXT), (2, _NOVEL_TEXT)], _doc_schema()
    )
    b1 = spark.createDataFrame(
        [
            (20, _NOVEL_TEXT.replace("parquet", "orcfile")),
            (21, "entirely unrelated short note on tax law amendments"),
        ],
        _doc_schema(),
    )

    def snapshot():
        return {
            name: sorted(
                tuple(r) for r in spark.read.parquet(path).collect()
            )
            for name, path in paths.items()
        }

    minhash_gate_and_append_batch(b0, 0, paths["index"], paths["kept"],
                                  paths["matches"])
    minhash_gate_and_append_batch(b1, 1, paths["index"], paths["kept"],
                                  paths["matches"])
    first = snapshot()
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(paths["kept"]).collect()) == [1, 2, 21]
    minhash_gate_and_append_batch(b1, 1, paths["index"], paths["kept"],
                                  paths["matches"])
    assert snapshot() == first
    minhash_gate_and_append_batch(b0, 0, paths["index"], paths["kept"],
                                  paths["matches"])
    assert snapshot() == first


def test_minhash_gate_intra_batch_lower_id_wins_and_short_docs_admitted(spark, tmp_path):
    """Within one batch the smaller doc_id wins its near-dup pair; a doc
    too short to produce a bigram shingle has no bands and is admitted."""
    from autonomus_datapipeline_spark.streaming.neardup import (
        minhash_gate_and_append_batch,
    )

    paths = {
        "index": str(tmp_path / "index"),
        "kept": str(tmp_path / "kept"),
        "matches": str(tmp_path / "matches"),
    }
    b0 = spark.createDataFrame(
        [
            (5, _NOVEL_TEXT),
            (6, _NOVEL_TEXT.replace("parquet", "orcfile")),  # loses to 5
            (7, "stub"),  # single word: no bigram, no bands, admitted
        ],
        _doc_schema(),
    )
    minhash_gate_and_append_batch(b0, 0, paths["index"], paths["kept"],
                                  paths["matches"])
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(paths["kept"]).collect()) == [5, 7]
    m = {(r["new_id"], r["index_id"]) for r in
         spark.read.parquet(paths["matches"]).collect()}
    assert (6, 5) in m


def test_compact_gate_sink_on_minhash_band_index(spark, tmp_path):
    """compact_gate_sink is detector-agnostic: folding the MinHash gate's
    band index (n_bands rows per admitted doc — multi-row, unlike the
    SimHash one-fingerprint-per-doc index) must preserve every band row
    exactly once, and later batches must still gate correctly against the
    compacted index."""
    from autonomus_datapipeline_spark.streaming.neardup import (
        compact_gate_sink,
        minhash_gate_and_append_batch,
    )

    paths = {
        "index": str(tmp_path / "index"),
        "kept": str(tmp_path / "kept"),
        "matches": str(tmp_path / "matches"),
    }
    minhash_gate_and_append_batch(
        spark.createDataFrame([(1, _BASE_TEXT)], _doc_schema()), 0,
        paths["index"], paths["kept"], paths["matches"],
    )
    minhash_gate_and_append_batch(
        spark.createDataFrame([(2, _NOVEL_TEXT)], _doc_schema()), 1,
        paths["index"], paths["kept"], paths["matches"],
    )
    rows_before = sorted(
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in spark.read.parquet(paths["index"]).collect()
    )
    assert len(rows_before) == 2 * 4  # 4 bands per admitted doc
    n = compact_gate_sink(spark, paths["index"], upto_batch_id=1)
    assert n == 8
    idx = spark.read.parquet(paths["index"])
    assert sorted(
        (r["doc_id"], r["band_idx"], r["band_hash"]) for r in idx.collect()
    ) == rows_before
    assert set(r["batch_id"] for r in idx.collect()) == {1}
    # batch 2 still rejects a near-copy of compacted doc 2, admits novelty
    minhash_gate_and_append_batch(
        spark.createDataFrame(
            [(30, _NOVEL_TEXT.replace("parquet", "orcfile")),
             (31, "entirely unrelated short note on tax law amendments")],
            _doc_schema(),
        ), 2,
        paths["index"], paths["kept"], paths["matches"],
    )
    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()
    )
    assert kept_ids == [1, 2, 31]
    m = {(r["new_id"], r["index_id"]) for r in
         spark.read.parquet(paths["matches"]).collect()}
    assert (30, 2) in m
