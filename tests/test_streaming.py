"""Structured Streaming: the tumbling-window plan produces the same
result in streaming mode as in batch mode (unified API parity)."""

import shutil

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
