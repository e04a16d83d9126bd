"""Per-partition lineage + checkpoint log → partition-granular resume.

Replaces the reference's per-job metadata JSONs (scraper_metadata.json /
ingestor_metadata.json / processor_metadata.json —
/root/reference/pipelines/scraping/helpers/scraper.py:17,
ingestion/helpers/ingestor.py:5,16-19, postProcessing/helpers/processors.py:5),
which hold a single watermark for the whole job: a crash between save_data()
and save_metadata() re-scrapes everything (scraping/mirror/scrape.py:209-212).

Here every (stage, partition) completion is one immutable parquet file
written AFTER the partition's output committed, carrying lineage metrics
(rows in/out, duration, watermark) — the north rule's "per-partition lineage
rows and metrics to a checkpoint table so a killed run resumes at partition
granularity". Files are tiny and append-only; readers just scan the
directory, so concurrent markers never conflict.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

COLUMNS = [
    "run_id",
    "stage",
    "partition_id",
    "rows_in",
    "rows_out",
    "duration_s",
    "watermark",
    "input_fp",
    "status",
    "updated_at",
]


class CheckpointLog:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "_checkpoints")
        os.makedirs(self.dir, exist_ok=True)

    def mark(
        self,
        run_id: str,
        stage: str,
        partition_id: str,
        rows_in: int | None = None,
        rows_out: int | None = None,
        duration_s: float | None = None,
        watermark: str | None = None,
        input_fp: int | None = None,
        status: str = "done",
    ) -> None:
        now = dt.datetime.now(dt.timezone.utc)
        table = pa.table(
            {
                "run_id": pa.array([run_id], pa.string()),
                "stage": pa.array([stage], pa.string()),
                "partition_id": pa.array([partition_id], pa.string()),
                "rows_in": pa.array([rows_in], pa.int64()),
                "rows_out": pa.array([rows_out], pa.int64()),
                "duration_s": pa.array([duration_s], pa.float64()),
                "watermark": pa.array([watermark], pa.string()),
                "input_fp": pa.array([input_fp], pa.int64()),
                "status": pa.array([status], pa.string()),
                "updated_at": pa.array([now], pa.timestamp("us", tz="UTC")),
            }
        )
        fname = f"{stage}__{partition_id}__{now.strftime('%Y%m%dT%H%M%S%f')}.parquet"
        tmp = os.path.join(self.dir, "." + fname + ".tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.dir, fname))

    def _files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.dir, "*.parquet")))

    def completed(self, stage: str) -> set[str]:
        done = set()
        for f in self._files():
            t = pq.read_table(f, columns=["stage", "partition_id", "status"])
            for s, p, st in zip(
                t["stage"].to_pylist(), t["partition_id"].to_pylist(), t["status"].to_pylist()
            ):
                if s == stage and st == "done":
                    done.add(p)
        return done

    def completed_inputs(self, stage: str) -> dict[str, tuple]:
        """partition_id → (rows_in, input_fp) of its LATEST done mark (files
        sort chronologically, so later marks win). Lets a resume detect a
        completed partition whose INPUT has since CHANGED — late-arriving
        pages for an already-done date (count moves) OR in-place edits that
        keep the count but change content (fingerprint moves) — and
        reprocess exactly that partition instead of silently serving stale
        output. ``input_fp`` is an order-independent content fingerprint
        (bit_xor of per-row xxhash64 over every input column); marks written
        before the column existed read back as fp=None and simply force one
        reprocess."""
        out: dict[str, tuple] = {}
        for f in self._files():
            t = pq.read_table(f)
            fps = (
                t["input_fp"].to_pylist()
                if "input_fp" in t.column_names
                else [None] * t.num_rows
            )
            for s, p, st, ri, fp in zip(
                t["stage"].to_pylist(),
                t["partition_id"].to_pylist(),
                t["status"].to_pylist(),
                t["rows_in"].to_pylist(),
                fps,
            ):
                if s == stage and st == "done":
                    out[p] = (ri, fp)
        return out

    def watermark(self, stage: str, partition_id: str = "*") -> str | None:
        """Highest recorded watermark for a stage — the analog of the
        reference's last_block / last_date_ingested / since_id cursors
        (SURVEY.md §2.11)."""
        marks = []
        for f in self._files():
            t = pq.read_table(f)
            for row in t.to_pylist():
                if (
                    row["stage"] == stage
                    and row["status"] == "done"
                    and row["watermark"] is not None
                    and (partition_id == "*" or row["partition_id"] == partition_id)
                ):
                    marks.append(row["watermark"])
        return max(marks) if marks else None

    def to_spark(self, spark):
        from ..schemas import CHECKPOINTS

        files = self._files()
        if not files:
            return spark.createDataFrame([], CHECKPOINTS)
        return spark.read.parquet(self.dir)
