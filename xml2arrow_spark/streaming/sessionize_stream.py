"""Custom stateful streaming operator: gap sessionization via
``applyInPandasWithState`` — the arbitrary-state primitive the built-in
streaming aggregations can't express (per-group ordered merge + incremental
session numbering + exact integer session bounds).

Contract (the streaming twin of :func:`xml2arrow_spark.pipeline.events.
sessionize`, same output schema and values): events arrive in micro-batches
with at most ``watermark_delay`` of event-time disorder; each user's events
are BUFFERED in state, and a session is emitted exactly once, as soon as it
is *provably closed* — its last event plus the gap lies before the current
watermark, so no event that could still arrive may extend or precede it.
Emission is therefore in per-user time order and ``session_idx`` is the
same 0-based counter the batch operator assigns.

Scale shape:

- state per user = ONLY the events of not-yet-closed sessions (the
  watermark prunes everything emitted) plus one counter — bounded by
  ``watermark_delay`` + session span, not by stream length;
- the buffered merge is exact under ANY within-watermark disorder — no
  reliance on file arrival order;
- Spark does NOT pre-filter late rows for applyInPandasWithState (the
  user owns lateness), so the operator tracks the EMITTED FRONTIER (last
  emitted session end) in state: an event that would fall into emitted
  history — ``tse <= frontier + gap`` — is dropped (emitted rows are
  immutable in append mode); any later event, even one behind the
  watermark, is still integrated exactly;
- ``EventTimeTimeout`` keeps groups flushing even when a micro-batch
  carries no rows for them (the final no-data batch after a flush
  sentinel drains every remaining closed session).

A stream never "ends", so fully draining requires advancing the watermark
past the last session: ingest one sentinel row (``event_id = -1``, any
user) with an event time beyond ``last_real + delay + gap``; sentinel rows
advance the watermark but are excluded from every buffer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from xml2arrow_spark.pipeline.events import _EPOCH_US, GAP_SECONDS

__all__ = ["sessionize_stream", "run_sessionize_stream", "FLUSH_EVENT_ID"]

FLUSH_EVENT_ID = -1

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double"
)
_OUT_DDL = (
    "user_id bigint, session_idx bigint, n_events bigint, "
    "t_start_us bigint, t_end_us bigint, dur_us bigint"
)
_STATE_DDL = (
    "tses array<bigint>, eids array<bigint>, next_idx bigint, "
    "emitted_end bigint"
)


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    gap_seconds: int = GAP_SECONDS,
    watermark_delay: str = "0 seconds",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming DataFrame of closed sessions (append mode) from a parquet
    directory stream of events."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        # fully vectorized per-group body (r06): the original per-event
        # python loops (tuple buffer, session cut, emission) cost ~2 s per
        # micro-batch at 1M events/15k users; every step below is whole-
        # array numpy with IDENTICAL semantics (same (ts, event_id) sort
        # order, same gap cuts, same closed-prefix emission rule)
        import numpy as np
        import pandas as pd

        user_id = int(key[0])
        if state.exists:
            tses, eids, next_idx, emitted_end = state.get
            parts_t = [np.asarray(tses, dtype=np.int64)]
            parts_e = [np.asarray(eids, dtype=np.int64)]
        else:
            parts_t, parts_e = [], []
            next_idx, emitted_end = 0, -(1 << 62)
        for pdf in pdfs:
            # drop sentinels AND events that would fall into already-
            # EMITTED history (emitted rows are immutable); anything later
            # than frontier+gap is integrated exactly, even if it arrived
            # behind the watermark
            ts_a = pdf["tse"].to_numpy()
            eid_a = pdf["event_id"].to_numpy()
            m = (eid_a != FLUSH_EVENT_ID) & (ts_a > emitted_end + gap_us)
            if m.any():
                parts_t.append(ts_a[m].astype(np.int64))
                parts_e.append(eid_a[m].astype(np.int64))
        if parts_t:
            ts = np.concatenate(parts_t)
            eid = np.concatenate(parts_e)
            order = np.lexsort((eid, ts))  # == sorted (ts, event_id) pairs
            ts, eid = ts[order], eid[order]
        else:
            ts = eid = np.empty(0, dtype=np.int64)
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = 0
        kept_from = 0
        if ts.size:
            brk = np.flatnonzero(np.diff(ts) > gap_us) + 1
            starts = np.concatenate(([0], brk))
            ends = np.concatenate((brk, [ts.size]))  # exclusive
            last_ts = ts[ends - 1]
            # provably closed: nothing arriving >= watermark can extend it;
            # sessions are time-ordered, so the closed set is a PREFIX
            closable = last_ts + gap_us < wm_us
            closed = int(np.argmin(closable)) if not closable.all() else closable.size
            if closed:
                emitted_end = int(last_ts[closed - 1])
                kept_from = int(starts[closed]) if closed < starts.size else ts.size
        kept_ts = ts[kept_from:]
        kept_eid = eid[kept_from:]
        state.update(
            (
                kept_ts.tolist(),
                kept_eid.tolist(),
                int(next_idx) + closed,
                int(emitted_end),
            )
        )
        # re-arm ONLY while something is buffered: a drained group must
        # not re-fire on every future watermark advance (O(all users)
        # invocations per batch otherwise); new data for the group
        # triggers the function anyway
        if kept_ts.size:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        if closed:
            s0 = starts[:closed]
            e0 = ends[:closed]
            t0 = ts[s0]
            t1 = last_ts[:closed]
            yield pd.DataFrame(
                {
                    "user_id": np.full(closed, user_id, dtype=np.int64),
                    "session_idx": np.arange(
                        next_idx, next_idx + closed, dtype=np.int64
                    ),
                    "n_events": (e0 - s0).astype(np.int64),
                    "t_start_us": t0,
                    "t_end_us": t1,
                    "dur_us": t1 - t0,
                }
            )

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .withWatermark("ts", watermark_delay)
    )
    ev = stream.select(
        "user_id", "event_id", F.expr(_EPOCH_US).alias("tse"), "ts"
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        fn, _OUT_DDL, _STATE_DDL, "append", GroupStateTimeout.EventTimeTimeout
    )


def run_sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    gap_seconds: int = GAP_SECONDS,
    watermark_delay: str = "0 seconds",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Drain the source with an availableNow query into ``out_dir`` and
    return the emitted session rows."""
    from xml2arrow_spark.streaming.run import drain_available_now

    sessions = sessionize_stream(
        spark, source_dir, gap_seconds, watermark_delay,
        max_files_per_trigger=max_files_per_trigger,
    )
    return drain_available_now(spark, sessions, out_dir, _OUT_DDL, checkpoint_dir)
