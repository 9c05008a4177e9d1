"""Focused probe: the index small-files serving tax and what
``ann_compact`` buys back (round 15 — the measurement behind the
``stream_ingest_absorb(compact_every_n_batches=...)`` cadence).

Every ``ann_absorb`` micro-batch appends one small file per touched
``cid`` partition, and the nprobe-pruned serving scan pays a task per
file — so streaming cadence quietly turns an O(1)-file index into an
O(batches x cells)-file one.  This probe builds a seed index, absorbs
N micro-batches, and times warm ``search_ann`` at checkpoints, then
compacts and re-times: the latency delta IS the tax, and the
post-compact reading must match the seed-era latency (serving results
are pinned byte-identical by the e2e test; this probe pins the TIME).

Run: python scripts/probe_index_smallfiles.py [n_absorbs] [checkpoint_every]
Appends nothing; prints a markdown section to paste into SCALE_PROBE.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_ingestor_spark.pipeline import VectorCollection, build_chunks  # noqa: E402
from vector_db_ingestor_spark.session import get_spark  # noqa: E402


def fake_pdf(i: int, tag: str) -> bytes:
    body = (
        f"{tag} document number {i} about the small files serving tax. "
        "More sentences follow here! Another one arrives? "
        f"Topic drift token {i % 17} lands. The final words settle."
    ).encode() * 3
    return b"stream\n(" + body + b") Tj\nendstream"


def corpus(spark, tag: str, n: int, offset: int = 0):
    return spark.createDataFrame(
        [
            (
                f"file:/fake/{tag}{offset + i}.pdf",
                f"{tag}{offset + i}.pdf",
                len(fake_pdf(offset + i, tag)),
                bytearray(fake_pdf(offset + i, tag)),
            )
            for i in range(n)
        ],
        "source STRING, filename STRING, file_bytes LONG, content BINARY",
    )


def warm_latency(coll, reps: int = 5) -> float:
    """Warm median of the PRODUCTION serve call (one untimed warmup)."""
    coll.search_ann("small files serving tax", n_results=10, kind="ivf").collect()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        coll.search_ann(
            "small files serving tax", n_results=10, kind="ivf"
        ).collect()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    n_absorbs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("probe_index_smallfiles")
    tmp = tempfile.mkdtemp(prefix="probe_smallfiles_")
    coll = VectorCollection(spark, os.path.join(tmp, "coll"))
    coll.overwrite(build_chunks(corpus(spark, "seed", 40), chunk_size=60, overlap=10))
    coll.build_ann_index(kind="ivf", n_centroids=8)

    rows = []

    def snapshot(label):
        rep = coll.ann_maintenance_report("ivf")
        lat = warm_latency(coll)
        rows.append((label, rep["n_data_files"], rep["n_rows"], lat))
        print(
            f"{label:>22s}: files={rep['n_data_files']:4d} "
            f"rows={rep['n_rows']:5d} serve={lat * 1000:7.1f} ms",
            file=sys.stderr,
        )

    snapshot("seed (post-build)")
    for b in range(n_absorbs):
        batch = build_chunks(
            corpus(spark, "abs", 2, offset=2 * b), chunk_size=60, overlap=10
        ).localCheckpoint(eager=True)
        coll.append(batch)
        coll.ann_absorb(batch, kind="ivf")
        if (b + 1) % every == 0:
            snapshot(f"after {b + 1} absorbs")

    coll.ann_compact("ivf")
    snapshot("after ann_compact")

    print("\n| state | index data files | rows | warm search_ann (median-of-5) |")
    print("|---|---|---|---|")
    for label, files, n, lat in rows:
        print(f"| {label} | {files} | {n} | {lat * 1000:.0f} ms |")
    spark.stop()


if __name__ == "__main__":
    main()
