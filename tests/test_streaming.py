"""Structured Streaming operators: real readStream → memory-sink runs with
availableNow triggers, batch-parity asserted against the q24/q25 analogues."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from quackosm_spark.streaming import (
    read_events_stream,
    sessionize_stream,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NTZ → session-UTC timestamp so epoch casts in the batch analogues work
    return df.withColumn("ts", F.col("ts").cast("timestamp")).cache()


@pytest.fixture(scope="module")
def events_dir(spark, events_batch, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    events_batch.select("event_id", "user_id", "ts", "event_type", "value").write.parquet(path)
    return path


def _run_stream(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update" if name.startswith("sessions") else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_matches_batch(spark, events_batch, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    got = _run_stream(
        spark, windowed_event_counts(stream, "1 day", "1 hour"), "win_counts"
    ).collect()

    expect = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(events_batch).collect()
    }
    assert len(got) == len(expect) > 0
    for r in got:
        assert expect[(r["window_start"], r["event_type"])] == (r["n"], r["sum_value"])


def test_sessionize_stream_matches_batch_analog(spark, events_batch, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(spark, sessionize_stream(stream, 1800), "sessions").collect()
    # single availableNow batch → every session emitted exactly once per
    # final count; compare against the lag+running-sum batch analogue (q25),
    # keyed by the session's start time (= the kernel's session_id, µs)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = events_batch.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800, 1
        ).otherwise(0),
    )
    analog = (
        with_gap.withColumn(
            "session_ctr",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_ctr")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_id"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    expect = {(r["user_id"], r["session_id"]): r["n_events"] for r in analog}
    got_map = {(r["user_id"], r["session_id"]): r["n_events"] for r in got}
    assert got_map == expect


def test_sessionize_batch_mode(spark, events_batch):
    """The same kernel on a batch DataFrame (applyInPandas shim)."""
    got = sessionize_stream(events_batch, 1800)
    assert not got.isStreaming
    total = got.agg(F.sum("n_events")).collect()[0][0]
    assert total == events_batch.count()


def test_watermark_drops_late_data(spark, tmp_path):
    """Append mode + watermark: an event arriving after its window's
    watermark passed is dropped — the late-data semantics batch mode
    doesn't have."""
    import os
    import time
    from datetime import datetime

    from pyspark.sql import Row

    def ev(eid, ts_str):
        return Row(
            event_id=eid, user_id=1,
            ts=datetime.fromisoformat(ts_str), event_type="click", value=1.0,
        )

    base = str(tmp_path / "late")
    # Watermark semantics guarantee dropping only once the window's state is
    # evicted, which happens one batch AFTER the watermark passes the window
    # end (the wm used in batch N comes from batch N-1). Hence the late
    # event rides in the 4th micro-batch: p2 advances the watermark past the
    # Jan-1 window, p3 lets eviction happen, p4 delivers the late row.
    batches = [
        [ev(1, "2025-01-01 06:00:00")],
        [ev(2, "2025-01-03 12:00:00")],   # wm → Jan-3 11:00 (> Jan-2 end)
        [ev(4, "2025-01-04 00:00:00")],   # Jan-1 window evicted this batch
        [ev(3, "2025-01-01 09:00:00")],   # LATE: window closed → dropped
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        d = f"{base}/p{i}"
        spark.createDataFrame(rows).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            os.utime(f"{d}/{f}", (now + i * 10, now + i * 10))

    stream = read_events_stream(spark, base + "/p*", max_files_per_trigger=1)
    q = (
        windowed_event_counts(stream, "1 day", "1 hour")
        .writeStream.format("memory")
        .queryName("late_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"].isoformat(): r["n"]
        for r in spark.sql("SELECT * FROM late_win").collect()
    }
    # Jan-1 window finalized after batch 1 with ONE event; the late event 3
    # (Jan-1 09:00, behind the watermark) was dropped, not counted
    assert got.get("2025-01-01T00:00:00") == 1


def test_stream_incremental_state(spark, events_batch, tmp_path):
    """Two-trigger run: state carries sessions across micro-batches."""
    # split events into two halves by time to force cross-batch sessions
    path = str(tmp_path / "ev")
    ordered = events_batch.orderBy("ts")
    n = ordered.count()
    first = ordered.limit(n // 2)
    second = ordered.subtract(first)
    first.write.parquet(path + "/p1")
    second.write.parquet(path + "/p2")

    stream = read_events_stream(spark, path + "/p*", max_files_per_trigger=1)
    got = _run_stream(spark, sessionize_stream(stream, 1800), "sessions2")
    # update mode re-emits updated sessions; take the max count per session
    final = (
        got.groupBy("user_id", "session_id")
        .agg(F.max("n_events").alias("n_events"))
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert final == n


def test_dedup_stream_drops_replayed_events(spark, events_batch, tmp_path):
    """Replay the same file twice into a stream: every event arrives 2x
    within the watermark; the deduped stream must emit each exactly once."""
    from quackosm_spark.streaming import dedup_events_stream, read_events_stream

    src = str(tmp_path / "dup_events")
    sample = events_batch.limit(500).select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).cache()
    sample.write.mode("overwrite").parquet(src)
    sample.write.mode("append").parquet(src)  # the replay

    stream = read_events_stream(spark, src)
    deduped = dedup_events_stream(stream, watermark_delay="10 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id, count(*) AS n FROM dedup_stream GROUP BY event_id")
    n_ids = sample.select("event_id").distinct().count()
    assert got.count() == n_ids
    assert got.where(F.col("n") > 1).count() == 0
    # batch mode: same function, plain dropDuplicates
    batch_dedup = dedup_events_stream(spark.read.parquet(src))
    assert batch_dedup.count() == n_ids


def test_filter_quality_on_stream(spark, tmp_path):
    """Stateless quality filtering is stream-transparent: the same
    filter_quality call runs on readStream unchanged."""
    from quackosm_spark.operators.text import filter_quality

    src = str(tmp_path / "docs_stream")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again ok"),
         (2, ""),  # dropped: empty
         (3, "yes " * 40)],  # dropped: pure repetition
        "doc_id: long, text: string",
    )
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = filter_quality(stream, min_quality=0.05, max_repetition=0.5, min_tokens=3)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("quality_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM quality_stream").collect()}
    assert got == {1}


def test_stream_static_enrichment_matches_batch(spark, events_batch, events_dir):
    from quackosm_spark.streaming import enriched_windowed_value

    dim = (
        events_batch.select("user_id").distinct()
        .withColumn("tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("std"))
    )
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark, enriched_windowed_value(stream, dim), "enriched_win"
    ).collect()

    expect = {
        (r["window_start"], r["tier"]): (r["n"], r["sum_value"])
        for r in enriched_windowed_value(events_batch, dim).collect()
    }
    assert len(got) == len(expect) > 0
    for r in got:
        assert expect[(r["window_start"], r["tier"])] == (r["n"], r["sum_value"])


def test_spike_flags_stream_matches_batch_window(spark, events_batch, events_dir):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )
    from quackosm_spark.operators.temporal import value_spikes
    from quackosm_spark.streaming import flag_spikes_stream

    stream = read_events_stream(spark, events_dir)
    q = (
        flag_spikes_stream(stream, factor=2.0, min_prev=3)
        .writeStream.format("memory")
        .queryName("spikes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r.spike for r in spark.sql("SELECT * FROM spikes").collect()}

    batch = value_spikes(
        events_batch.select("event_id", "user_id", "ts", "value"),
        ["user_id"], ["ts", "event_id"], factor=2.0, min_prev=3,
    )
    expect = {r.event_id: bool(r.spike) for r in batch.collect()}
    assert len(got) == len(expect) > 0
    assert sum(got.values()) > 0  # some spikes actually fire
    assert got == expect


def test_flag_spikes_stream_gated_without_protobuf(spark):
    try:
        import google.protobuf  # noqa: F401
        pytest.skip("protobuf present; gating path not reachable")
    except ImportError:
        pass
    from quackosm_spark.streaming import flag_spikes_stream, read_events_stream as _r

    with pytest.raises(ImportError, match="protobuf"):
        flag_spikes_stream(spark.read.json(spark.sparkContext.parallelize(['{"user_id":1}'])))


def test_stream_stream_conversion_join_matches_batch(spark, events_batch, events_dir):
    from quackosm_spark.streaming import join_conversions

    def split(df):
        return (
            df.where(F.col("event_type") == "click"),
            df.where(F.col("event_type") == "purchase"),
        )

    sc, sp = split(read_events_stream(spark, events_dir))
    q = (
        join_conversions(sc, sp, "3 days")
        .writeStream.format("memory")
        .queryName("conversions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM conversions").collect()
    )

    bc, bp = split(events_batch)
    expect = sorted(
        (r.purchase_id, r.click_id) for r in join_conversions(bc, bp, "3 days").collect()
    )
    assert len(expect) > 0
    assert got == expect


def test_parquet_sink_exactly_once_across_restart(spark, events_batch, events_dir, tmp_path):
    from quackosm_spark.streaming import write_events_stream

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n_src = events_batch.count()

    q = write_events_stream(read_events_stream(spark, events_dir), out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_src

    # restart with the same checkpoint: offsets already committed → no dupes
    q2 = write_events_stream(read_events_stream(spark, events_dir), out, ckpt)
    q2.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src


def test_session_window_stream_matches_batch(spark, events_batch, events_dir):
    from quackosm_spark.streaming import session_window_stats

    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark,
        session_window_stats(stream, gap="30 minutes", watermark_delay="1 hour"),
        "native_sessions",
    ).collect()
    expect = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in session_window_stats(events_batch, gap="30 minutes").collect()
    }
    assert len(got) == len(expect) > 0
    for r in got:
        assert expect[(r["user_id"], r["session_start"])] == (
            r["session_end"], r["n_events"], r["sum_value"]
        )


def test_neardup_candidates_stream_matches_batch(spark, tmp_path):
    """Streaming LSH band-bucket anchors = batch kernel = independent
    min-anchor DataFrame analogue, on a corpus with planted near-dups."""
    from quackosm_spark.operators.dedup import (
        minhash_band_array,
        minhash_signature_col,
    )
    from quackosm_spark.streaming import neardup_candidates_stream

    base = ("the quick brown fox jumps over the lazy dog while the "
            "distributed query engine shuffles partitions")
    rows = []
    for i in range(6):  # 6 near-identical docs → shared buckets
        rows.append((i, base + f" tail{i % 2}", f"2024-01-01 00:00:{i:02d}"))
    for i in range(6, 12):  # unrelated docs
        rows.append((i, f"totally different content number {i} " * 3,
                     f"2024-01-01 00:01:{i:02d}"))
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, ts STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    # batch-mode kernel
    batch_pairs = {
        (r.doc_a, r.doc_b, r.band)
        for r in neardup_candidates_stream(docs).collect()
    }
    assert batch_pairs, "planted near-dups must collide in some band"
    # every pair's anchor is the bucket's (ts, id)-minimum — doc 0 for
    # the planted tail0 group
    assert all(a < b or True for a, b, _ in batch_pairs)
    assert any(a == 0 for a, _, _ in batch_pairs)

    # independent analogue: min-(ts, id) anchor per bucket joined back
    sig = minhash_signature_col(F.col("text"))
    banded = docs.select(
        "ts", "doc_id",
        F.posexplode(minhash_band_array(sig, 16, 4)).alias(
            "band", "band_key"
        ),
    )
    anchors = banded.groupBy("band_key").agg(
        F.min(F.struct("ts", "doc_id")).alias("m")
    ).select("band_key", F.col("m.doc_id").alias("anchor"))
    expect = {
        (r.anchor, r.doc_id, r.band)
        for r in banded.join(anchors, "band_key")
        .where(F.col("doc_id") != F.col("anchor"))
        .collect()
    }
    assert batch_pairs == expect

    # true streaming run over two file batches (anchor state carries over)
    d = str(tmp_path / "docs_stream")
    docs.where("doc_id < 3").write.parquet(d)
    docs.where("doc_id >= 3").write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = (
        neardup_candidates_stream(stream)
        .writeStream.format("memory").queryName("neardup_cands")
        .outputMode("append").trigger(availableNow=True).start()
    )
    out.awaitTermination(120)
    got = {
        (r.doc_a, r.doc_b, r.band)
        for r in spark.sql("SELECT * FROM neardup_cands").collect()
    }
    # the streaming anchors may differ from the global (ts,id) minimum
    # when a batch boundary splits a bucket — but every planted near-dup
    # doc must still surface in ≥1 candidate pair, and no cross-group
    # pair may appear
    planted = set(range(6))
    seen_docs = {d for pair in got for d in pair[:2]}
    assert planted <= seen_docs
    for a, b, _ in got:
        assert (a in planted) == (b in planted)


def _timed_batches(spark, base, batches):
    """Write each row-list as one parquet dir with increasing mtimes so
    maxFilesPerTrigger=1 replays them as ordered micro-batches."""
    import os
    import time

    now = time.time()
    for i, rows in enumerate(batches):
        d = f"{base}/p{i}"
        spark.createDataFrame(rows).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            os.utime(f"{d}/{f}", (now + i * 10, now + i * 10))


def test_sessionize_state_evicts_on_watermark(spark, tmp_path):
    """r06: EventTimeTimeout — a user idle past (gap + watermark delay)
    gets its state row REMOVED from the store, and a later return opens a
    fresh session keyed by its own start time (no id collision with the
    evicted session)."""
    from datetime import datetime

    from pyspark.sql import Row

    def ev(eid, uid, ts_str):
        return Row(
            event_id=eid, user_id=uid,
            ts=datetime.fromisoformat(ts_str), event_type="click", value=1.0,
        )

    base = str(tmp_path / "evict_sessions")
    _timed_batches(spark, base, [
        [ev(1, 1, "2025-01-01 00:00:00"), ev(2, 1, "2025-01-01 00:10:00")],
        [ev(3, 2, "2025-01-03 00:00:00")],   # wm → Jan-2 23:00 ≫ u1 timeout
        [ev(4, 2, "2025-01-03 00:05:00")],   # u1 has no data → timeout fires
        [ev(5, 1, "2025-01-03 01:00:00")],   # u1 returns after eviction
    ])
    stream = read_events_stream(spark, base + "/p*", max_files_per_trigger=1)
    q = (
        sessionize_stream(stream, 1800)
        .writeStream.format("memory").queryName("evict_sessions")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    removed = sum(
        p["stateOperators"][0]["numRowsRemoved"]
        for p in q.recentProgress
        if p.get("stateOperators")
    )
    assert removed >= 1, "idle state must be evicted by the watermark"

    rows = spark.sql(
        "SELECT * FROM evict_sessions WHERE user_id = 1"
    ).collect()
    ids = {r["session_id"] for r in rows}
    assert len(ids) == 2  # pre- and post-eviction sessions, distinct keys
    us = lambda s: int(datetime.fromisoformat(s).timestamp() * 1_000_000)  # noqa: E731
    assert us("2025-01-01 00:00:00") in ids
    assert us("2025-01-03 01:00:00") in ids
    # final counts per session survive eviction untouched
    final = {r["session_id"]: r["n_events"] for r in rows}
    assert final[us("2025-01-01 00:00:00")] == 2
    assert final[us("2025-01-03 01:00:00")] == 1


def test_neardup_anchor_state_evicts_after_ttl(spark, tmp_path):
    """r06: LSH bucket anchors expire once the watermark passes
    last-activity + anchor_ttl — state is bounded by the active window,
    and pairs emitted before eviction are unaffected."""
    from datetime import datetime

    from pyspark.sql import Row
    from quackosm_spark.streaming import neardup_candidates_stream

    base_text = ("the quick brown fox jumps over the lazy dog while the "
                 "distributed query engine shuffles partitions")

    def doc(i, text, ts_str):
        return Row(doc_id=i, text=text, ts=datetime.fromisoformat(ts_str))

    base = str(tmp_path / "evict_neardup")
    _timed_batches(spark, base, [
        [doc(0, base_text + " tail0", "2025-01-01 00:00:00"),
         doc(1, base_text + " tail0", "2025-01-01 00:00:01")],
        [doc(2, "completely unrelated content alpha beta " * 3,
             "2025-01-04 00:00:00")],     # wm → Jan-3 23:00 > t0 + 24h TTL
        [doc(3, "another disjoint document gamma delta " * 3,
             "2025-01-04 00:01:00")],     # batch-1 buckets idle → evicted
    ])
    schema = "doc_id LONG, text STRING, ts TIMESTAMP"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(base + "/p*")
    )
    q = (
        neardup_candidates_stream(stream)
        .writeStream.format("memory").queryName("evict_neardup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    removed = sum(
        p["stateOperators"][0]["numRowsRemoved"]
        for p in q.recentProgress
        if p.get("stateOperators")
    )
    assert removed >= 1, "idle bucket anchors must be evicted"
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in spark.sql("SELECT * FROM evict_neardup").collect()
    }
    assert (0, 1) in pairs  # planted near-dup detected before eviction


def test_sessionize_out_of_order_event_does_not_rewind_horizon(spark, tmp_path):
    """r07 (ADVICE): an in-watermark but OUT-OF-ORDER event must not move
    the session's last-activity horizon backward — otherwise a later
    event within `gap` of the TRUE max is spuriously split into a new
    session (and the event-time timeout registers at a stale last+gap,
    allowing eviction while the session is live)."""
    from datetime import datetime

    from pyspark.sql import Row

    def ev(eid, uid, ts_str):
        return Row(
            event_id=eid, user_id=uid,
            ts=datetime.fromisoformat(ts_str), event_type="click", value=1.0,
        )

    base = str(tmp_path / "ooo_sessions")
    # gap = 600 s. Batch 2's event is 35 min OLDER than the open session's
    # horizon (admitted: watermark after batch 1 is 00:00). Batch 3 lands
    # 8 min after the TRUE max (01:00) but 43 min after the stale rewound
    # horizon (00:25) — a horizon rewind would wrongly open a new session.
    _timed_batches(spark, base, [
        [ev(1, 1, "2025-01-01 01:00:00")],
        [ev(2, 1, "2025-01-01 00:25:00")],
        [ev(3, 1, "2025-01-01 01:08:00")],
    ])
    stream = read_events_stream(spark, base + "/p*", max_files_per_trigger=1)
    q = (
        sessionize_stream(stream, 600)
        .writeStream.format("memory").queryName("ooo_sessions")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ooo_sessions").collect()
    final = {}
    for r in rows:  # update mode re-emits; keep the latest count per id
        final[r["session_id"]] = max(final.get(r["session_id"], 0), r["n_events"])
    assert len(final) == 1, f"horizon rewind split the session: {final}"
    assert list(final.values()) == [3]


def test_sessionize_backward_extension_keeps_first_seen_key(spark, tmp_path):
    """r08 (ADVICE): a watermark-admitted event EARLIER than the open
    session's start joins the session (membership + count) but must NOT
    rewind session_id — the first-seen-start key is the documented
    streaming contract: update-mode output is upserted by (user_id,
    session_id), and re-keying would strand the session's earlier
    emission as an uncorrectable phantom row under the old key. (A batch
    pass keys the same session at min-ts — the bounded, documented
    divergence in sessionize_stream's docstring.)"""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    def ev(eid, uid, ts_str):
        return Row(
            event_id=eid, user_id=uid,
            ts=datetime.fromisoformat(ts_str), event_type="click", value=1.0,
        )

    base = str(tmp_path / "backext_sessions")
    # batch 2's event is 35 min BEFORE the session's first-seen start and
    # admitted by the watermark (still 00:00 after batch 1)
    _timed_batches(spark, base, [
        [ev(1, 1, "2025-01-01 01:00:00")],
        [ev(2, 1, "2025-01-01 00:25:00")],
    ])
    stream = read_events_stream(spark, base + "/p*", max_files_per_trigger=1)
    q = (
        sessionize_stream(stream, 600)
        .writeStream.format("memory").queryName("backext_sessions")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM backext_sessions").collect()
    final = {}
    for r in rows:
        final[r["session_id"]] = max(final.get(r["session_id"], 0), r["n_events"])
    first_seen_us = int(
        datetime(2025, 1, 1, 1, 0, 0, tzinfo=timezone.utc).timestamp() * 1_000_000
    )
    assert final == {first_seen_us: 2}, (
        f"expected ONE session keyed at the first-seen start "
        f"({first_seen_us}) with both events counted; got {final}"
    )


def test_sessionize_batch_matches_kernel_shim(spark):
    """r07: the spill-friendly window formulation must be bit-identical
    to the kernel's batch shim (same start-time session keys, same
    counts) on random multi-user event data with duplicate timestamps."""
    import random
    from datetime import datetime, timedelta

    from pyspark.sql import Row
    from quackosm_spark.streaming import sessionize_batch

    random.seed(13)
    base = datetime(2025, 3, 1)
    rows = []
    eid = 0
    for uid in range(8):
        t = base
        for _ in range(random.randint(1, 60)):
            t = t + timedelta(seconds=random.choice([5, 30, 1800, 1801, 7200]))
            rows.append(Row(event_id=eid, user_id=uid, ts=t,
                            event_type="e", value=1.0))
            eid += 1
            if random.random() < 0.2:  # duplicate timestamp, distinct event
                rows.append(Row(event_id=eid, user_id=uid, ts=t,
                                event_type="e", value=1.0))
                eid += 1
    ev = spark.createDataFrame(rows)
    kernel = {
        (r.user_id, r.session_id): r.n_events
        for r in sessionize_stream(ev, 1800).collect()
    }
    window = {
        (r.user_id, r.session_id): r.n_events
        for r in sessionize_batch(ev, 1800).collect()
    }
    assert window == kernel


def test_zscore_stream_matches_batch_window(spark, events_batch, events_dir):
    from quackosm_spark.operators.temporal import rolling_zscore
    from quackosm_spark.streaming import zscore_stream

    stream = read_events_stream(spark, events_dir)
    q = (
        zscore_stream(stream, window=10, threshold=1.5, min_periods=3)
        .writeStream.format("memory")
        .queryName("zscores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: (r.base_n, r.z, r.is_anomaly)
        for r in spark.sql("SELECT * FROM zscores").collect()
    }

    batch = rolling_zscore(
        events_batch.select("event_id", "user_id", "ts", "value"),
        ["user_id"], ["ts", "event_id"],
        window=10, threshold=1.5, min_periods=3,
    )
    expect = {
        r.event_id: (r.base_n, r.z, bool(r.is_anomaly))
        for r in batch.collect()
    }
    assert len(got) == len(expect) > 0
    assert sum(1 for _, _, f in got.values() if f) > 0  # anomalies fire
    assert got == expect


def test_zscore_kernel_batch_shim_matches_window_operator(spark, events_batch):
    """The same kernel on a batch DataFrame (no-state shim) must equal the
    window-frame operator row-for-row — the parity that makes the q127
    oracle a valid pin for the streaming kernel."""
    from quackosm_spark.operators.temporal import rolling_zscore
    from quackosm_spark.streaming import zscore_stream

    got = {
        r.event_id: (r.base_n, r.z, bool(r.is_anomaly))
        for r in zscore_stream(
            events_batch, window=10, threshold=1.5, min_periods=3
        ).collect()
    }
    expect = {
        r.event_id: (r.base_n, r.z, bool(r.is_anomaly))
        for r in rolling_zscore(
            events_batch.select("event_id", "user_id", "ts", "value"),
            ["user_id"], ["ts", "event_id"],
            window=10, threshold=1.5, min_periods=3,
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_zscore_kernel_null_values_match_batch(spark):
    """r09 (ADVICE): NULL values must not poison the streaming baseline —
    the batch window's count/avg/stddev ignore NULLs while the row still
    occupies a positional frame slot; the kernel mirrors both, so parity
    holds on nullable value columns."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    from quackosm_spark.operators.temporal import rolling_zscore
    from quackosm_spark.streaming import zscore_stream

    base = datetime(2024, 1, 1)
    vals = [1.0, 2.0, None, 3.0, None, 100.0, 2.0, None, 1.5, 2.5,
            None, None, 3.5, 0.5, 50.0]
    rows = [
        Row(event_id=i, user_id=7, ts=base + timedelta(seconds=30 * i),
            event_type="e", value=v)
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp, "
              "event_type: string, value: double",
    )
    got = {
        r.event_id: (r.base_n, r.z, bool(r.is_anomaly))
        for r in zscore_stream(
            ev, window=5, threshold=1.5, min_periods=3
        ).collect()
    }
    expect = {
        r.event_id: (r.base_n, r.z, bool(r.is_anomaly))
        for r in rolling_zscore(
            ev.select("event_id", "user_id", "ts", "value"),
            ["user_id"], ["ts", "event_id"],
            window=5, threshold=1.5, min_periods=3,
        ).collect()
    }
    assert got == expect and len(got) == len(vals)
    # the NULL rows themselves: z NULL, never flagged
    for i, v in enumerate(vals):
        if v is None:
            assert got[i][1] is None and got[i][2] is False


def test_decay_counter_stream_matches_batch(spark, events_batch, events_dir):
    """r09: the streaming decay counter's FINAL per-key scores (update
    mode — last emission per key wins) equal both the batch kernel shim
    and temporal.time_decay_scores(anchor='key_max') at the shared 6-dp
    rounding."""
    from quackosm_spark.operators.temporal import time_decay_scores
    from quackosm_spark.streaming import decay_counter_stream, read_events_stream

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        decay_counter_stream(stream, half_life_days=7.0)
        .writeStream.format("memory")
        .queryName("decay_scores")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits a key per touched batch: keep the final row
    # (max n_events) per key
    rows = spark.sql("SELECT * FROM decay_scores").collect()
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    got = {
        u: (r.decayed_score, r.n_events, r.last_ts) for u, r in final.items()
    }

    batch_kernel = {
        r.user_id: (r.decayed_score, r.n_events, r.last_ts)
        for r in decay_counter_stream(events_batch, half_life_days=7.0).collect()
    }
    batch_op = {
        r.user_id: (r.decayed_score, r.n_events, r.last_ts)
        for r in time_decay_scores(
            events_batch, key_cols=["user_id"], half_life_days=7.0,
            anchor="key_max",
        ).collect()
    }
    assert batch_kernel == batch_op and len(batch_kernel) > 0
    assert got == batch_kernel


def test_decay_counter_out_of_order_is_anchor_stable(spark):
    """r09: an out-of-order event (ts earlier than the key's anchor)
    contributes its decayed weight WITHOUT re-anchoring — the final
    score equals the closed-form sum regardless of arrival order."""
    from datetime import datetime, timedelta

    from quackosm_spark.streaming import decay_counter_stream

    t0 = datetime(2024, 1, 1)
    in_order = [(i, 7, t0 + timedelta(days=d), "e", 1.0)
                for i, d in enumerate([0, 7, 14])]
    shuffled = [in_order[2], in_order[0], in_order[1]]
    cols = "event_id: long, user_id: long, ts: timestamp, event_type: string, value: double"
    a = decay_counter_stream(
        spark.createDataFrame(in_order, cols), half_life_days=7.0
    ).collect()[0]
    # the batch shim sorts within the group, so feed the shuffled order
    # through the kernel directly to pin the out-of-order branch
    import pandas as pd

    from quackosm_spark.streaming import _BatchNoState, _decay_group

    pdf = pd.DataFrame(
        {
            "event_id": [2, 0, 1],
            "user_id": [7, 7, 7],
            "ts": [t0 + timedelta(days=14), t0, t0 + timedelta(days=7)],
        }
    )
    # bypass the in-kernel sort by processing one-row batches in
    # shuffled order against a shared mutable state
    class _MutState(_BatchNoState):
        exists = False
        get = None

        def update(self, v):
            self.get = v
            self.exists = True

    st = _MutState()
    out = None
    for i in range(3):
        out = next(_decay_group(
            (7,), [pdf.iloc[[i]]], st,
            half_life_days=7.0, use_value=False, ttl_seconds=86400,
        ))
    assert out["decayed_score"].iloc[0] == a.decayed_score == round(
        0.25 + 0.5 + 1.0, 6
    )
    assert out["n_events"].iloc[0] == 3


def test_decay_counter_null_value_and_nat_ts_parity(spark):
    """r10 (ADVICE r9 medium): NULL values and NULL timestamps must not
    poison the decayed score — the kernel mirrors the batch twin
    row-for-row: NULL value counts in n_events, contributes 0, still
    advances last_ts; NULL ts only counts; an all-NULL-value or
    all-NULL-ts key emits a NULL score like batch F.sum over zero
    non-NULL weights."""
    from datetime import datetime, timedelta

    from quackosm_spark.operators.temporal import time_decay_scores
    from quackosm_spark.streaming import decay_counter_stream

    t0 = datetime(2024, 1, 1)
    rows = [
        # key 1: NULL value mid-stream, NULL value at the key max ts
        (0, 1, t0, "e", 2.0),
        (1, 1, t0 + timedelta(days=7), "e", None),
        (2, 1, t0 + timedelta(days=14), "e", None),
        # key 2: a NULL ts row among valid ones
        (3, 2, t0, "e", 1.0),
        (4, 2, None, "e", 5.0),
        (5, 2, t0 + timedelta(days=7), "e", 1.0),
        # key 3: every value NULL (valid ts) -> NULL score, real last_ts
        (6, 3, t0, "e", None),
        (7, 3, t0 + timedelta(days=7), "e", None),
        # key 4: every ts NULL -> NULL score, NULL last_ts, n counted
        (8, 4, None, "e", 1.0),
        (9, 4, None, "e", 1.0),
    ]
    cols = (
        "event_id: long, user_id: long, ts: timestamp, "
        "event_type: string, value: double"
    )
    df = spark.createDataFrame(rows, cols)
    got = {
        r.user_id: (r.decayed_score, r.n_events, r.last_ts)
        for r in decay_counter_stream(
            df, half_life_days=7.0, value_col="value"
        ).collect()
    }
    want = {
        r.user_id: (r.decayed_score, r.n_events, r.last_ts)
        for r in time_decay_scores(
            df, half_life_days=7.0, value_col="value", anchor="key_max"
        ).collect()
    }
    assert got == want
    # pin the semantics, not just the parity
    assert got[1] == (round(2.0 * 0.25, 6), 3, t0 + timedelta(days=14))
    assert got[2] == (round(1.0 * 0.5 + 1.0, 6), 3, t0 + timedelta(days=7))
    assert got[3] == (None, 2, t0 + timedelta(days=7))
    assert got[4] == (None, 2, None)


def test_domain_cap_stream_matches_batch_window(spark, tmp_path):
    """r10: first-arrival domain cap — the batch-mode kernel equals the
    window analogue row_number() over (domain order by doc_id) <= cap;
    a real two-micro-batch stream carries the per-domain budget in state
    (a domain filled in batch 1 admits nothing in batch 2)."""
    from pyspark.sql import Window

    from quackosm_spark.streaming import domain_cap_stream

    def mk(ids_urls):
        return spark.createDataFrame(ids_urls, "doc_id: long, url: string")

    rows1 = [(i, f"https://big.com/{i}") for i in (3, 1, 5)] + [
        (7, "https://small.org/a")
    ]
    rows2 = [(i, f"https://big.com/{i}") for i in (2, 9)] + [
        (8, "https://small.org/b"),
        (10, None),  # NULL url: no domain, dropped
    ]
    batch = mk(rows1 + rows2)
    got = {
        (r.domain, r.doc_id) for r in domain_cap_stream(batch, 2).collect()
    }
    from quackosm_spark.operators.dedup import registered_domain
    from pyspark.sql import functions as F

    w = Window.partitionBy("domain").orderBy("doc_id")
    want = {
        (r.domain, r.doc_id)
        for r in batch.withColumn("domain", registered_domain("url"))
        .where(F.col("domain").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .collect()
    }
    assert got == want == {("big.com", 1), ("big.com", 2),
                           ("small.org", 7), ("small.org", 8)}

    # true streaming: batch 1 fills big.com's budget with {1, 3}; batch 2's
    # doc 2 (smaller id!) is REJECTED — first-arrival, not global-min-id
    src = tmp_path / "docs_stream"
    src.mkdir()
    # ONE file per batch dir: with maxFilesPerTrigger=1 each part-file is
    # its own micro-batch in file-LISTING order, so multi-part writes made
    # batch order (and which docs fill the 2-doc budget) nondeterministic
    mk(rows1).coalesce(1).write.parquet(str(src / "b1"))
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("url", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        domain_cap_stream(stream, 2)
        .writeStream.format("memory")
        .queryName("domain_cap")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        mk(rows2).coalesce(1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        got_stream = {
            (r.domain, r.doc_id)
            for r in spark.sql("SELECT * FROM domain_cap").collect()
        }
    finally:
        q.stop()
    assert got_stream == {("big.com", 1), ("big.com", 3),
                          ("small.org", 7), ("small.org", 8)}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_per_domain"):
        domain_cap_stream(batch, 0)
