"""Crash-recovery fault injection for the stateful streaming patterns
(VERDICT r10 #4): checkpoint-restart evidence existed for the CDC pipeline
but the stateful patterns — q99 sessions, q138 budget quota, q141 SCD2,
q146 stream-stream LEFT OUTER interval join — had never been killed
mid-stream. Each test here runs the REAL registered query with its
_run_bounded_stream harness swapped (monkeypatch of the module global the
query body resolves at call time) for a two-phase variant that:

1. stages only the first ``kill_after`` waves, runs the streaming query to
   completion (Trigger.AvailableNow) — the process then "dies" with the
   checkpoint holding committed batches and live state (open sessions,
   partially-filled quotas, current SCD2 versions, unmatched outer-join
   rows);
2. optionally deletes the newest ``commits/<n>`` entry from the checkpoint
   (harsh mode) — the crash window where the offset WAL was written but
   the batch never committed, so restart must RE-EXECUTE that batch; the
   parquet file sink's _spark_metadata manifest is what makes the re-run
   invisible (already-committed batch ids are skipped — the exactly-once
   sink contract over the at-least-once re-execution, SURVEY §2.2);
3. stages the remaining waves and starts a NEW query on the SAME
   checkpoint + sink — Structured Streaming restores the state store and
   file-source progress and processes only the new files;
4. the caller asserts the final table equals the uninterrupted run of the
   same registered query, row for row.

The kill points are chosen mid-state on purpose: q99 dies with every
session still open (only batch0 processed — the sentinels that flush state
arrive after restart); q138 dies with the quota half-filled; q141 dies
with version-1 rows still current; q146 dies before the watermark has
evicted any unmatched click.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

import binwatch_spark.plans.pipeline_queries as pq
from binwatch_spark.plans.pipeline_queries import _stream_shuffle_partitions
from tests.conftest import SF_SMALL


def _crashy_run_bounded_stream(kill_after: int, harsh: bool):
    """A drop-in for pipeline_queries._run_bounded_stream that crashes the
    stream after ``kill_after`` staged waves and resumes from the same
    checkpoint. Mirrors _bounded_stream_core's staging contract
    (coalesce(1) per wave, maxFilesPerTrigger=1, schema from wave 0,
    scoped shuffle partitions, awaitTermination checked)."""

    def run(spark, prefix, stages, build_output):
        import atexit

        assert 0 < kill_after < len(stages)
        root = tempfile.mkdtemp(prefix=prefix + "crash_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

        def start_phase():
            stream = (
                spark.readStream.schema(stages[0][1].schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{src}/*")
            )
            q = (
                build_output(stream)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise RuntimeError("crashy stream phase timed out")

        try:
            for name, df in stages[:kill_after]:
                df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")
            with _stream_shuffle_partitions(spark):
                start_phase()  # "process dies" here, post-commit
                if harsh:
                    # crash window: offsets written, batch never committed
                    # -> restart re-executes the newest batch. The .crc
                    # sibling must go too: Hadoop's ChecksumFileSystem
                    # refuses the re-commit rename while a stale target
                    # crc exists (and Spark mis-reports that as a
                    # concurrent-query conflict).
                    commits = sorted(
                        (
                            f
                            for f in os.listdir(f"{ckpt}/commits")
                            if not f.startswith(".")
                        ),
                        key=int,
                    )
                    os.remove(f"{ckpt}/commits/{commits[-1]}")
                    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
                    if os.path.exists(crc):
                        os.remove(crc)
                for name, df in stages[kill_after:]:
                    df.coalesce(1).write.mode("overwrite").parquet(
                        f"{src}/{name}"
                    )
                start_phase()  # restart from the same checkpoint
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)
        return spark.read.parquet(sink)

    return run


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qname,kill_after,harsh",
    [
        ("q99_sessionize_stream", 1, False),
        ("q99_sessionize_stream", 1, True),
        ("q138_stream_budget_fill", 1, False),
        ("q138_stream_budget_fill", 2, True),
        ("q141_scd2_stream", 1, False),
        ("q141_scd2_stream", 2, True),
        ("q146_interval_join_outer_stream", 2, False),
        ("q146_interval_join_outer_stream", 3, True),
    ],
)
def test_crash_restart_equals_uninterrupted(
    spark, monkeypatch, qname, kill_after, harsh
):
    from binwatch_spark.plans.registry import REGISTRY

    fn = REGISTRY[qname].fn
    baseline = _rows(fn(spark, SF_SMALL))
    assert baseline  # the pattern must emit something to prove anything
    monkeypatch.setattr(
        pq, "_run_bounded_stream", _crashy_run_bounded_stream(kill_after, harsh)
    )
    recovered = _rows(fn(spark, SF_SMALL))
    assert recovered == baseline
