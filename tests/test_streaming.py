"""Structured Streaming: the tumbling-window plan produces the same
result in streaming mode as in batch mode (unified API parity)."""

import shutil

import pytest

from vector_db_ingestor_spark.streaming.windows import (
    run_windowed_stream_demo,
    tumbling_counts,
)
from vector_db_ingestor_spark.tables import load_table


def test_stream_batch_parity(spark, sf_dir, tmp_path):
    # file stream sources read directories; stage the fixture file
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(sf_dir + "/events.parquet", stream_dir / "part-0.parquet")

    batch = tumbling_counts(load_table(spark, sf_dir, "events"), window="1 hour")
    stream_out = run_windowed_stream_demo(spark, str(stream_dir))
    b = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    s = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in stream_out.collect()
    }
    assert b == s
    assert len(b) > 0


def test_stream_source_sniffs_ts_physical_type(spark, tmp_path):
    """stream_events_from_parquet must not assume the fixture's ts
    physical type: generators have shipped both timestamp[ns] and
    timestamp[us].  Reading micros as nanos collapses every event time
    ~1000x toward epoch (regression: test_stream_batch_parity went red
    when fixtures switched to [us])."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vector_db_ingestor_spark.streaming.windows import (
        _ts_unit_from_footer,
        stream_events_from_parquet,
    )

    times = [dt.datetime(2024, 1, 1, 10, 0), dt.datetime(2024, 1, 1, 11, 30)]

    def write_fixture(unit):
        d = tmp_path / f"events_{unit}"
        d.mkdir()
        table = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(times, pa.timestamp(unit)),
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": pa.array(["click", "view"]),
                "value": pa.array([1.0, 2.0], pa.float64()),
                "props": pa.array(["{}", "{}"]),
            }
        )
        pq.write_table(table, d / "part-0.parquet")
        return str(d)

    for unit in ("ns", "us"):
        path = write_fixture(unit)
        assert _ts_unit_from_footer(path) == unit
        src = stream_events_from_parquet(spark, path)
        q = (
            src.writeStream.outputMode("append")
            .format("memory")
            .queryName(f"sniff_{unit}")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r.event_id: r.ts
            for r in spark.sql(f"SELECT event_id, ts FROM sniff_{unit}").collect()
        }
        assert got == {1: times[0], 2: times[1]}, f"unit={unit}: {got}"

    # a directory MIXING units is the drift this sniff exists to catch:
    # it must raise, not silently read the other-unit files ~1000x off
    mixed = tmp_path / "events_mixed"
    mixed.mkdir()
    for unit in ("ns", "us"):
        src_dir = tmp_path / f"events_{unit}"
        (mixed / f"part-{unit}.parquet").write_bytes(
            (src_dir / "part-0.parquet").read_bytes()
        )
    with pytest.raises(ValueError, match="mixed ts units"):
        _ts_unit_from_footer(str(mixed))


def test_stream_ingest_directory(spark, tmp_path):
    import pathlib
    import shutil

    src_dir = tmp_path / "pdfs"
    src_dir.mkdir()
    for name in ("doc_a.pdf", "doc_b.pdf"):
        body = (
            b"stream\n(Sentence one about refunds. Sentence two follows! "
            b"A third sentence with more words? Plenty of text here.) Tj\nendstream"
        )
        (src_dir / name).write_bytes(body)

    from vector_db_ingestor_spark.streaming.ingest import stream_ingest_directory

    out = tmp_path / "collection"
    ckpt = tmp_path / "ckpt"
    q = stream_ingest_directory(
        spark, str(src_dir), str(out), str(ckpt),
        metadata={"category": "stream"}, chunk_size=40, overlap=8,
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) > 2
    names = {r.filename for r in rows}
    assert names == {"doc_a.pdf", "doc_b.pdf"}
    r = rows[0]
    assert r.metadata["category"] == "stream"
    assert len(r.embedding) == 64
    # exactly-once per file: draining again with the same checkpoint
    # adds nothing
    q2 = stream_ingest_directory(
        spark, str(src_dir), str(out), str(ckpt),
        metadata={"category": "stream"}, chunk_size=40, overlap=8,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == len(rows)


def test_stream_ingest_dedup_skips_duplicate_content(spark, tmp_path):
    from vector_db_ingestor_spark.streaming.ingest import stream_ingest_dedup

    body = (
        b"stream\n(Identical content in two files. More sentences follow! "
        b"Another one here? The final words.) Tj\nendstream"
    )
    src = tmp_path / "pdfs"
    src.mkdir()
    # same filename-relevant parts must differ for file-level identity,
    # but chunk_uid includes the filename — so use the SAME name in two
    # directories to prove content-level dedup
    (src / "same.pdf").write_bytes(body)
    out, ck1, ck2 = str(tmp_path / "coll"), str(tmp_path / "ck1"), str(tmp_path / "ck2")
    q = stream_ingest_dedup(spark, str(src), out, ck1, chunk_size=40, overlap=8)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    # second stream with a FRESH checkpoint re-reads the same file: the
    # file source would re-append, but the content anti-join must not
    q2 = stream_ingest_dedup(spark, str(src), out, ck2, chunk_size=40, overlap=8)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_stream_ingest_dedup_recovers_exactly_once_after_crash(spark, tmp_path):
    """Exactly-once across a mid-stream crash: the dangerous window in
    foreachBatch is AFTER the parquet append, BEFORE the checkpoint
    commit — a crash there makes Spark replay the batch on restart.
    Simulate it deterministically by deleting the last batch's commit
    marker and restarting on the same checkpoint: the replayed batch
    must anti-join away against the already-appended rows, leaving
    every chunk_uid exactly once."""
    import os

    from vector_db_ingestor_spark.streaming.ingest import stream_ingest_dedup

    src = tmp_path / "pdfs"
    src.mkdir()
    for i in range(4):
        body = (
            b"stream\n(Document number %d with several sentences. "
            b"More filler text follows! Another line here? "
            b"Final words for padding.) Tj\nendstream" % i
        )
        (src / f"doc_{i}.pdf").write_bytes(body)

    out, ck = str(tmp_path / "coll"), str(tmp_path / "ck")
    q = stream_ingest_dedup(
        spark, str(src), out, ck, chunk_size=40, overlap=8,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    clean = spark.read.parquet(out)
    n_clean = clean.count()
    assert n_clean > 0
    assert clean.select("chunk_uid").distinct().count() == n_clean

    commits = sorted(
        f for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    assert len(commits) >= 4, "expected one commit per file"
    os.remove(os.path.join(ck, "commits", commits[-1]))
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):  # local-fs checksum sidecar would block rename
        os.remove(crc)

    # restart on the same checkpoint: Spark replays the uncommitted batch
    q2 = stream_ingest_dedup(
        spark, str(src), out, ck, chunk_size=40, overlap=8,
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    recovered = spark.read.parquet(out)
    assert recovered.count() == n_clean, "replayed batch re-appended rows"
    assert recovered.select("chunk_uid").distinct().count() == n_clean
    # nothing was lost either: all four files' chunks are present
    names = {r.filename for r in recovered.select("filename").distinct().collect()}
    assert names == {f"doc_{i}.pdf" for i in range(4)}


def test_stateful_running_totals_across_microbatches(spark, sf_dir, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    with the fixture split into two files (maxFilesPerTrigger=1 -> two
    batches), the final emitted totals equal the batch aggregation."""
    import pyspark.sql.functions as F

    from vector_db_ingestor_spark.streaming.windows import (
        stateful_running_totals,
        stream_events_from_parquet,
    )

    events = load_table(spark, sf_dir, "events")
    stream_dir = tmp_path / "events_split"
    # two files => two micro-batches; deterministic split on event_id
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(stream_dir / "f0")
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(stream_dir / "f1")
    )

    src = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
            "value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir) + "/*/")
    )
    totals = stateful_running_totals(src)
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_totals_test")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 2, "expected at least two micro-batches"

    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY n_events DESC) AS rn
                FROM stateful_totals_test
            ) WHERE rn = 1
            """
        ).collect()
    }
    expected = {
        r.user_id: (r.n_events, r.total_value)
        for r in stateful_running_totals(events).collect()
    }
    assert final == expected


def test_session_window_stream_batch_parity(spark, sf_dir, tmp_path):
    """session_window aggregation produces the same sessions in
    streaming mode (complete-mode memory sink) as in batch — the
    unified-API claim for the merge-based window, not just the
    fixed-width ones."""
    import shutil

    from vector_db_ingestor_spark.streaming.windows import (
        session_windows,
        stream_events_from_parquet,
    )

    stream_dir = tmp_path / "events_sess"
    stream_dir.mkdir()
    shutil.copy(sf_dir + "/events.parquet", stream_dir / "part-0.parquet")

    batch = session_windows(
        load_table(spark, sf_dir, "events"), gap="30 minutes"
    )
    expected = {tuple(r) for r in batch.collect()}
    assert len(expected) > 0

    stream = stream_events_from_parquet(spark, str(stream_dir))
    agg = session_windows(stream, gap="30 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_stream_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM session_stream_test").collect()}
    assert got == expected


def test_stream_stream_join_parity(spark, sf_dir, tmp_path):
    """Stream-stream attribution join == its batch twin on the same
    fixture (two watermarked file streams over the events parquet)."""
    import shutil

    import pyspark.sql.functions as F

    from vector_db_ingestor_spark.streaming.windows import (
        stream_events_from_parquet,
        stream_stream_attribution,
    )

    stream_dir = tmp_path / "events_ssj"
    stream_dir.mkdir()
    shutil.copy(sf_dir + "/events.parquet", stream_dir / "part-0.parquet")

    ev = load_table(spark, sf_dir, "events")
    batch = stream_stream_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    expected = {tuple(r) for r in batch.collect()}
    assert len(expected) > 0

    s1 = stream_events_from_parquet(spark, str(stream_dir))
    s2 = stream_events_from_parquet(spark, str(stream_dir))
    joined = stream_stream_attribution(
        s1.filter(F.col("event_type") == "click"),
        s2.filter(F.col("event_type") == "purchase"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM ssj_test").collect()}
    assert got == expected


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed agg with a 10-minute watermark: an event
    arriving after its window's watermark has passed is dropped, so the
    closed window's count excludes it."""
    import os
    import time as _time

    import pyspark.sql.functions as F

    from vector_db_ingestor_spark.streaming.windows import tumbling_counts

    stream_dir = tmp_path / "late_events"
    stream_dir.mkdir()

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
                  "value DOUBLE, props STRING"
        )
        sub = tmp_path / ("stage_" + name)
        df.coalesce(1).write.parquet(str(sub))
        part = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        dest = stream_dir / name
        (sub / part).rename(dest)
        os.utime(dest, (mtime, mtime))

    import datetime as dt

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    base = _time.time()
    # batch 0: three events in the 10:00 window, then 11:00 advances the
    # watermark to 10:50 (> 10:10), closing the 10:00 window
    write_file(
        "f0.parquet",
        [
            (1, ts(10, 1), 1, "click", 1.0, "{}"),
            (2, ts(10, 3), 1, "click", 1.0, "{}"),
            (3, ts(10, 7), 2, "click", 1.0, "{}"),
            (4, ts(11, 0), 1, "click", 1.0, "{}"),
        ],
        base - 90,
    )
    # batch 1: plain event — the 10:00 window is emitted and evicted
    # here (the input-side late filter lags the eviction watermark by
    # one batch, so the drop is only guaranteed from the NEXT batch on)
    write_file(
        "f1.parquet",
        [(9, ts(11, 5), 2, "click", 1.0, "{}")],
        base - 60,
    )
    # batch 2: one LATE event for the closed 10:00 window (dropped) and
    # one fresh event at 12:00 advancing the watermark past 11:00
    write_file(
        "f2.parquet",
        [
            (5, ts(10, 2), 3, "click", 99.0, "{}"),
            (6, ts(12, 0), 2, "click", 1.0, "{}"),
        ],
        base - 30,
    )

    src = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
            "value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(stream_dir))
    )
    agg = tumbling_counts(src, window="10 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_events_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        r.window_start: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM late_events_test").collect()
    }
    # the 10:00 window was emitted with the 3 on-time events only: the
    # late event_id=5 (99.0 value) never entered it
    assert out[ts(10, 0)] == (3, 3.0)


def test_dedup_stream_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    horizon are dropped across micro-batches; state does not grow with
    history."""
    import datetime as dt
    import os
    import time as _time

    from vector_db_ingestor_spark.streaming.windows import dedup_stream

    stream_dir = tmp_path / "dup_events"
    stream_dir.mkdir()

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
                  "value DOUBLE, props STRING"
        )
        sub = tmp_path / ("stage_" + name)
        df.coalesce(1).write.parquet(str(sub))
        part = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        dest = stream_dir / name
        (sub / part).rename(dest)
        os.utime(dest, (mtime, mtime))

    def ts(m, s=0):
        return dt.datetime(2024, 1, 1, 10, m, s)

    base = _time.time()
    # batch 0: event 1 twice (same batch), event 2 once
    write_file(
        "f0.parquet",
        [
            (1, ts(0), 1, "click", 1.0, "{}"),
            (1, ts(0), 1, "click", 1.0, "{}"),
            (2, ts(1), 1, "click", 1.0, "{}"),
        ],
        base - 60,
    )
    # batch 1: event 1 AGAIN within the watermark horizon (dropped),
    # new event 3
    write_file(
        "f1.parquet",
        [
            (1, ts(2), 1, "click", 1.0, "{}"),
            (3, ts(3), 1, "click", 1.0, "{}"),
        ],
        base - 30,
    )

    src = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
            "value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    deduped = dedup_stream(src, keys=["event_id"], watermark="10 minutes")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = [r.event_id for r in spark.sql(
        "SELECT event_id FROM dedup_stream_test ORDER BY event_id").collect()]
    assert out == [1, 2, 3]

    # batch-mode fallback keeps the oracle-checkable shape
    batch = spark.createDataFrame(
        [(1, ts(0), 1, "click", 1.0, "{}"), (1, ts(2), 1, "click", 1.0, "{}")],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    assert dedup_stream(batch).count() == 1


def test_dedup_stream_state_bounded_over_soak(spark, tmp_path):
    """25-microbatch soak: dropDuplicatesWithinWatermark state must be
    bounded by the watermark horizon, not by total keys ever seen —
    the difference between a dedup that runs forever and one that OOMs.

    Each micro-batch carries 20 NEW keys (each written twice, so the
    in-batch duplicate must drop) with event times advancing 1 minute
    per batch under a 2-minute watermark: a key's state expires ~4
    batches after it arrives, so numRowsTotal should plateau around a
    few batches' keys while 500 distinct keys stream through."""
    import datetime as dt
    import os

    from vector_db_ingestor_spark.streaming.windows import dedup_stream

    n_batches, keys_per_batch = 25, 20
    src_dir = tmp_path / "soak_src"
    src_dir.mkdir()
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    schema = (
        "event_id STRING, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    for b in range(n_batches):
        ts = base + dt.timedelta(minutes=b)
        rows = []
        for k in range(keys_per_batch):
            row = (f"b{b}_k{k}", ts, b, "click", 1.0, "{}")
            rows.append(row)
            rows.append(row)  # in-batch duplicate: must be dropped
        path = str(src_dir / f"batch_{b:03d}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
        # one file per micro-batch, in arrival order
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (1_700_000_000 + b, 1_700_000_000 + b))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    deduped = dedup_stream(stream, keys=["event_id"], watermark="2 minutes")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("soak_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()

    assert len(progresses) >= n_batches - 2, (
        f"expected ~{n_batches} micro-batches, saw {len(progresses)}"
    )
    state_rows = [
        op["numRowsTotal"]
        for p in progresses
        for op in p.get("stateOperators", [])
        if op.get("numRowsTotal") is not None
    ]
    assert state_rows, "no state operator metrics reported"
    total_keys = n_batches * keys_per_batch
    # bounded: the plateau stays near (horizon batches x keys_per_batch),
    # far below total keys; un-evicted state would end at total_keys
    assert max(state_rows) <= 10 * keys_per_batch, (
        f"state grew to {max(state_rows)} rows — watermark not evicting"
    )
    assert state_rows[-1] < total_keys / 2
    # and the dedup itself held: every key exactly once downstream
    out = spark.sql("SELECT event_id FROM soak_dedup")
    assert out.count() == total_keys
    assert out.distinct().count() == total_keys


def test_stream_ingest_warc_exactly_once_per_segment(spark, tmp_path):
    """Continuous crawl ingest (round 11): .warc.gz segments stream
    exactly-once through parse -> HTML reduce -> chunk -> embed into
    the shared collection layout; a segment landing AFTER the first
    drain is picked up by the next drain, already-seen segments are
    not re-ingested."""
    import gzip

    from vector_db_ingestor_spark.streaming.ingest import stream_ingest_warc

    def rec(uri: str, body: bytes) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            + uri.encode()
            + b"\r\nWARC-Date: 2026-08-15T00:00:00Z\r\nContent-Length: "
            + str(len(body)).encode()
            + b"\r\n\r\n" + body + b"\r\n\r\n"
        )

    def seg(uri: str, text: str) -> bytes:
        html = (
            "<html><body>"
            + f"<p>{text}</p>" * 6
            + "</body></html>"
        ).encode()
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        return gzip.compress(rec(uri, http))

    raw = tmp_path / "crawl"
    raw.mkdir()
    (raw / "seg1.warc.gz").write_bytes(
        seg("http://s.example/one", "Segment one prose about pipelines.")
    )
    out, ckpt = tmp_path / "coll", tmp_path / "ckpt"
    q = stream_ingest_warc(
        spark, str(raw), str(out), str(ckpt),
        chunk_size=80, overlap=10, html_to_text=True,
    )
    q.awaitTermination(120)
    first = spark.read.parquet(str(out)).collect()
    assert first and {r.filename for r in first} == {"http://s.example/one"}
    assert all("<p>" not in r.text for r in first)

    # a new segment arrives; the old one must not be re-ingested
    (raw / "seg2.warc.gz").write_bytes(
        seg("http://s.example/two", "Segment two prose about curation.")
    )
    q2 = stream_ingest_warc(
        spark, str(raw), str(out), str(ckpt),
        chunk_size=80, overlap=10, html_to_text=True,
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    assert {r.filename for r in rows} == {
        "http://s.example/one", "http://s.example/two",
    }
    n_one = sum(r.filename.endswith("/one") for r in rows)
    assert n_one == len(first)  # exactly-once per segment


def test_stream_ingest_absorb_keeps_index_current(spark, tmp_path):
    """Round 13: the streaming add -> index-update loop.  Seed ingest +
    build_ann_index once; then files landing in the directory stream
    through append + ann_absorb, and search_ann (including the refined
    rung) serves them without a rebuild.  A fresh-checkpoint re-drain
    of the same files absorbs nothing (content anti-join idempotence),
    and starting the stream without an index is loud."""
    import pytest
    import pyspark.sql.functions as F

    from vector_db_ingestor_spark.pipeline import VectorCollection
    from vector_db_ingestor_spark.streaming.ingest import stream_ingest_absorb

    def pdf(i, tag):
        return (
            f"stream\n({tag} file number {i} about streaming absorb. "
            "More sentences follow here! Another one arrives? "
            "The final words land.) Tj\nendstream"
        ).encode()

    src = tmp_path / "pdfs"
    src.mkdir()
    for i in range(4):
        (src / f"seed_{i}.pdf").write_bytes(pdf(i, "seed"))
    out, ck = str(tmp_path / "coll"), str(tmp_path / "ck")

    coll = VectorCollection(spark, out)
    # no index yet: refuse to start
    with pytest.raises(ValueError, match="before\\s+streaming absorbs"):
        stream_ingest_absorb(spark, str(src), out, ck, kind="ivfpq")

    # seed via the foreachBatch variant: the raw streaming parquet
    # sink writes a _spark_metadata log that makes later BATCH appends
    # invisible to reads — append() refuses such a directory (guard
    # tested below)
    from vector_db_ingestor_spark.streaming.ingest import (
        stream_ingest_dedup,
        stream_ingest_directory,
    )

    q0 = stream_ingest_dedup(
        spark, str(src), out, ck, chunk_size=40, overlap=8
    )
    q0.awaitTermination(120)
    coll.build_ann_index(kind="ivfpq", n_centroids=4, m=4, ksub=8)
    base_total = coll.ann_drift_report("ivfpq").agg(F.sum("n")).first()[0]

    for i in range(2):
        (src / f"late_{i}.pdf").write_bytes(pdf(i, "late"))
    q1 = stream_ingest_absorb(
        spark, str(src), out, ck, kind="ivfpq", chunk_size=40, overlap=8
    )
    q1.awaitTermination(120)
    grown = coll.ann_drift_report("ivfpq").agg(F.sum("n")).first()[0]
    late_chunks = coll.df().filter(
        F.col("filename").startswith("late_")
    ).count()
    assert late_chunks > 0
    assert grown == base_total + late_chunks

    hits = coll.search_ann(
        "late file streaming absorb", n_results=coll.count(),
        kind="ivfpq", refine=True,
    )
    got = {r.filename for r in hits.collect()}
    assert any(f.startswith("late_") for f in got)
    assert hits.filter(F.col("text").isNull()).count() == 0

    # fresh checkpoint re-drain: file source replays everything, the
    # content anti-join absorbs nothing
    q2 = stream_ingest_absorb(
        spark, str(src), out, str(tmp_path / "ck2"), kind="ivfpq",
        chunk_size=40, overlap=8,
    )
    q2.awaitTermination(120)
    assert coll.ann_drift_report("ivfpq").agg(F.sum("n")).first()[0] == grown
    assert coll.df().count() == coll.df().dropDuplicates(["chunk_uid"]).count()

    # the _spark_metadata guard: a collection written by the raw
    # streaming parquet sink refuses batch appends (they'd be
    # invisible to reads — the log is the source of truth)
    sink_out = str(tmp_path / "sink_coll")
    q3 = stream_ingest_directory(
        spark, str(src), sink_out, str(tmp_path / "ck3"),
        chunk_size=40, overlap=8,
    )
    q3.awaitTermination(120)
    sink_coll = VectorCollection(spark, sink_out)
    assert sink_coll._has_stream_log()
    with pytest.raises(ValueError, match="_spark_metadata"):
        sink_coll.append(sink_coll.df().limit(1))
    # compact() is the sanctioned migration: rewrites through the log
    # into a plain dir, after which appends work
    before = sink_coll.count()
    sink_coll.compact(target_file_bytes=16 * 1024 * 1024)
    assert not sink_coll._has_stream_log()
    assert sink_coll.count() == before
    one = sink_coll.df().limit(1)
    sink_coll.append(one.withColumn("chunk_uid", F.lit("migrated-row")))
    assert sink_coll.count() == before + 1


def test_stream_absorb_replay_heals_unindexed_rows(spark, tmp_path):
    """ADVICE r13 (medium): the absorb's idempotence key is the INDEX,
    not the collection.  Simulate a crash between the two foreachBatch
    writes — chunks appended to the collection but never absorbed —
    then replay the same files through stream_ingest_absorb with a
    fresh checkpoint: the replay must re-absorb exactly those rows
    (collection-keyed idempotence would anti-join them away and leave
    the index silently stale forever)."""
    import pyspark.sql.functions as F

    from vector_db_ingestor_spark.pipeline import VectorCollection, build_chunks
    from vector_db_ingestor_spark.streaming.ingest import (
        stream_ingest_absorb,
        stream_ingest_dedup,
    )

    def pdf(i, tag):
        return (
            f"stream\n({tag} file number {i} about replay healing. "
            "More sentences follow here! Another one arrives? "
            "The final words land.) Tj\nendstream"
        ).encode()

    src = tmp_path / "pdfs"
    src.mkdir()
    for i in range(3):
        (src / f"seed_{i}.pdf").write_bytes(pdf(i, "seed"))
    out, ck = str(tmp_path / "coll"), str(tmp_path / "ck")

    q0 = stream_ingest_dedup(spark, str(src), out, ck, chunk_size=40, overlap=8)
    q0.awaitTermination(120)
    coll = VectorCollection(spark, out)
    coll.build_ann_index(kind="ivfpq", n_centroids=4, m=4, ksub=8)
    base_total = coll.ann_drift_report("ivfpq").agg(F.sum("n")).first()[0]

    # the "crash": new files land AND get appended to the collection,
    # but the absorb never runs (exactly the torn state a foreachBatch
    # failure between coll.append and coll.ann_absorb leaves behind)
    for i in range(2):
        (src / f"torn_{i}.pdf").write_bytes(pdf(i, "torn"))
    torn = spark.createDataFrame(
        [
            (
                f"file:{src}/torn_{i}.pdf",
                f"torn_{i}.pdf",
                len(pdf(i, "torn")),
                bytearray(pdf(i, "torn")),
            )
            for i in range(2)
        ],
        "source STRING, filename STRING, file_bytes LONG, content BINARY",
    )
    torn_chunks = build_chunks(torn, chunk_size=40, overlap=8).localCheckpoint(
        eager=True
    )
    coll.append(torn_chunks)
    n_torn = torn_chunks.count()
    assert (
        coll.ann_drift_report("ivfpq").agg(F.sum("n")).first()[0] == base_total
    )  # torn state: in the collection, not in the index

    # the replay: a fresh-checkpoint drain sees every file again; the
    # collection anti-join appends nothing, the index-keyed absorb
    # heals the torn rows exactly once
    q1 = stream_ingest_absorb(
        spark, str(src), out, str(tmp_path / "ck2"), kind="ivfpq",
        chunk_size=40, overlap=8,
    )
    q1.awaitTermination(120)
    assert (
        coll.ann_drift_report("ivfpq").agg(F.sum("n")).first()[0]
        == base_total + n_torn
    )
    assert coll.df().count() == coll.df().dropDuplicates(["chunk_uid"]).count()
    hits = coll.search_ann(
        "torn file replay healing", n_results=coll.count(), kind="ivfpq",
        refine=True,
    )
    assert any(r.filename.startswith("torn_") for r in hits.collect())
    assert hits.filter(F.col("text").isNull()).count() == 0


def test_stream_absorb_compaction_cadence_soak(spark, tmp_path):
    """Round 15 (VERDICT r14 #4 — close the maintenance loop): a
    25-micro-batch soak through stream_ingest_absorb with
    compact_every_n_batches=5.  Every absorb appends one small file per
    touched cid, so an unmaintained index grows ~O(batches x cells)
    files; the cadence-triggered, report-gated ann_compact must keep
    the file count bounded hands-off, lose no rows, and leave serving
    exact (ivf at all-cells-probed == the exact ranking)."""
    import pyspark.sql.functions as F

    from vector_db_ingestor_spark.pipeline import VectorCollection
    from vector_db_ingestor_spark.streaming.ingest import (
        stream_ingest_absorb,
        stream_ingest_dedup,
    )

    def pdf(i, tag):
        return (
            f"stream\n({tag} file number {i} about compaction cadence. "
            "More sentences follow here! Another one arrives? "
            "The final words land.) Tj\nendstream"
        ).encode()

    src = tmp_path / "pdfs"
    src.mkdir()
    for i in range(3):
        (src / f"seed_{i}.pdf").write_bytes(pdf(i, "seed"))
    out, ck = str(tmp_path / "coll"), str(tmp_path / "ck")

    q0 = stream_ingest_dedup(spark, str(src), out, ck, chunk_size=40, overlap=8)
    q0.awaitTermination(120)
    coll = VectorCollection(spark, out)
    coll.build_ann_index(kind="ivf", n_centroids=4)

    # 25 files at maxFilesPerTrigger=1 -> 25 absorb micro-batches
    for i in range(25):
        (src / f"soak_{i:02d}.pdf").write_bytes(pdf(i, "soak"))
    q1 = stream_ingest_absorb(
        spark, str(src), out, ck, kind="ivf", chunk_size=40, overlap=8,
        max_files_per_trigger=1, compact_every_n_batches=5,
    )
    q1.awaitTermination(300)

    report = coll.ann_maintenance_report("ivf")
    # no rows lost or duplicated: index totals == collection totals
    assert report["n_rows"] == coll.count()
    ids = [
        r[0]
        for r in spark.read.parquet(coll._ann_path("ivf"))
        .select("chunk_uid").collect()
    ]
    assert len(ids) == len(set(ids))
    assert set(ids) == {r[0] for r in coll.df().select("chunk_uid").collect()}
    # bounded files: 25 absorbs x up-to-4 cid files each would be ~100+
    # unmaintained; the every-5 cadence keeps at most ~1 compacted base
    # + 4 batches x 4 cells of fresh appends on top
    assert report["n_data_files"] <= 25, report
    # serving stays exact through the mid-stream swaps: all cells
    # probed == the exact cosine ranking over the collection
    ann = coll.search_ann("soak compaction cadence", n_results=5,
                          kind="ivf", nprobe=4)
    exact = coll.search("soak compaction cadence", n_results=5)
    assert (
        [(r.chunk_uid, r.rank) for r in ann.orderBy("rank").collect()]
        == [(r.chunk_uid, r.rank) for r in exact.orderBy("rank").collect()]
    )
