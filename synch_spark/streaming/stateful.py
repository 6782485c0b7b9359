"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no equivalent (its state is the target table); these
are the north-star streaming primitives a training-data ingest pipeline
needs: keep-first-per-key (streaming dedup) implemented with explicit
grouped state so it works across micro-batches with bounded memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_sessionize(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: int,
    out_schema: str,
    flush_after_s: int | None = None,
) -> DataFrame:
    """Gap-based session windows with explicit grouped state: a session
    CLOSES when a later event of the same key arrives more than
    ``gap_s`` after the session's last event; closed sessions are
    emitted as (key, session_start, session_end, n_events). The
    still-open tail session is carried in state across micro-batches
    (a session spanning a batch boundary is one session, not two) and
    is never emitted — append-mode streams can't retract, so only
    provably-closed windows leave the operator. State per key = one
    (start, last, n) triple: O(keys), bounded.

    ``flush_after_s`` arms a processing-time timeout per key: a key idle
    that long has its tail session emitted and its state cleared (the
    liveness valve — without it a key that stops sending never closes
    its last session). Closure-by-timeout is a processing-time decision;
    an event for the key arriving later starts a NEW session even if it
    would have continued the flushed one — the standard trade-off.

    This is the operator Spark's built-in ``session_window`` aggregation
    provides for SUM/COUNT shapes; the explicit-state form exists for
    custom per-session payloads and as the extension point for
    session-scoped logic (dedup-within-session, feature extraction).

    out_schema must be "<key> <type>, session_start timestamp,
    session_end timestamp, n_events long".
    """
    gap_us = int(gap_s) * 1_000_000
    cols = [c.strip().split()[0] for c in out_schema.split(",")]

    def emit(closed):
        return pd.DataFrame(
            {
                cols[0]: [c[3] for c in closed],
                cols[1]: pd.to_datetime([c[0] for c in closed], unit="us"),
                cols[2]: pd.to_datetime([c[1] for c in closed], unit="us"),
                cols[3]: [c[2] for c in closed],
            }
        )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if flush_after_s is not None and state.hasTimedOut:
            tail = state.get
            state.remove()
            yield emit([(tail[0], tail[1], tail[2], key[0])])
            return
        chunks = list(pdfs)
        batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        # only the timestamp participates in session bounds — sort the raw
        # int64 array instead of the whole frame (the per-group Python cost
        # is the operator's hot path; pandas sort_values/groupby here was
        # ~2x the kernel). NaT must be masked BEFORE the int64 view: a
        # null ts converts to int64 min and would fabricate a "session"
        # near the datetime lower bound that crashes emit()'s
        # to_datetime (the same guard streaming_first_per_key has).
        vals = batch[ts_col]
        vals = vals[vals.notna()]
        carried = state.get if state.exists else None
        if vals.empty:
            # nothing timestamped this batch: carry state unchanged
            if carried and flush_after_s is not None:
                state.setTimeoutDuration(int(flush_after_s) * 1000)
            return
        arr = np.sort(vals.to_numpy("int64") // 1000)  # µs
        prev_last = carried[1] if carried else None
        prev = np.concatenate(
            ([prev_last if prev_last is not None else -(2**62)], arr[:-1])
        )
        new_flag = (arr - prev) > gap_us
        if prev_last is None:
            new_flag[0] = True
        # arr is sorted, so each session is a contiguous run delimited by
        # new_flag; run bounds come from the flag positions directly
        # (no per-session pandas lookups)
        starts = np.flatnonzero(np.concatenate(([True], new_flag[1:])))
        counts = np.diff(np.append(starts, arr.size))
        mins = arr[starts]
        maxs = arr[np.append(starts[1:], arr.size) - 1]
        runs = list(zip(mins.tolist(), maxs.tolist(), counts.tolist()))
        sessions = []  # (start_us, end_us, n)
        if carried and not new_flag[0]:
            # first run continues the carried session; min()/max() with
            # the carried bounds: a late (out-of-order) event that
            # continues the session must not regress session_end below
            # what the state has already seen, and an event EARLIER
            # than the carried start must widen session_start so
            # n_events always counts events inside [start, end] (the
            # upstream watermark bounds how late such events can be)
            first = runs[0]
            sessions.append(
                (min(carried[0], first[0]), max(carried[1], first[1]),
                 carried[2] + first[2])
            )
            sessions.extend(runs[1:])
        elif carried:
            sessions.append(tuple(carried))
            sessions.extend(runs)
        else:
            sessions.extend(runs)
        closed, tail = sessions[:-1], sessions[-1]
        state.update(tail)
        if flush_after_s is not None:
            state.setTimeoutDuration(int(flush_after_s) * 1000)
        if closed:
            yield emit([(c[0], c[1], c[2], key[0]) for c in closed])

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="start long, last long, n long",
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if flush_after_s is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def streaming_first_per_key(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    out_schema: str,
) -> DataFrame:
    """Emit exactly one row per key: the earliest-`ts` row of the FIRST
    micro-batch that delivers the key; everything after is dropped.

    Append-mode streams cannot retract, so once a key has emitted, a
    late-arriving row with an even earlier ts must be discarded too —
    keep-first means first-emitted, not global-min-ts (the global min is
    only guaranteed when all rows for a key share a batch, as in
    availableNow replays). State per key = one emitted flag: O(keys).

    out_schema must list the grouped columns, e.g.
    "user_id long, ts timestamp, event_type string".
    """
    cols = [c.strip().split()[0] for c in out_schema.split(",")]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return iter(())  # key already emitted; append mode can't retract
        chunks = list(pdfs)
        batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        # first occurrence of the min ts — what the stable sort + head(1)
        # computed, without sorting the whole frame. NaT maps to int64
        # MIN under view('i8'), which naive argmin would pick as the
        # "first" event; mask nulls to MAX so they lose to any real ts
        # (all-null batch: position 0, same as the old nulls-last sort)
        s = batch[ts_col]
        arr = s.to_numpy("datetime64[ns]").view("i8").copy()
        arr[s.isna().to_numpy()] = np.iinfo("i8").max
        i = int(arr.argmin())
        state.update((1,))
        yield batch.iloc[[i]][cols]

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="emitted int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """At-least-once -> effectively-once key dedup with BOUNDED state:
    Spark's dropDuplicatesWithinWatermark keeps a key's dedup state only
    until the watermark passes it, so redeliveries inside the delay
    window are suppressed and state is O(keys-per-window), not O(keys-
    ever) — the right tool when duplicates come from retries/redelivery
    (bounded lateness), while streaming_first_per_key is the unbounded-
    horizon variant with O(all keys) state.

    This is the stream-side guard for the CDC pipeline's at-least-once
    broker semantics (reference commits offsets only post-flush,
    continuous.py:120-163, so redelivery after a crash is expected)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)
