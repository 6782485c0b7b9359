"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no equivalent (its state is the target table); these
are the north-star streaming primitives a training-data ingest pipeline
needs: keep-first-per-key (streaming dedup) implemented with explicit
grouped state so it works across micro-batches with bounded memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_per_key(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    out_schema: str,
) -> DataFrame:
    """Emit exactly one row per key: the earliest-`ts` row ever seen.

    State per key = the emitted flag + its ts; later arrivals (and late
    duplicates across micro-batches) are dropped. Classic streaming
    ingest dedup: state is O(keys), not O(events).

    out_schema must list the grouped columns, e.g.
    "user_id long, ts timestamp, event_type string".
    """
    cols = [c.strip().split()[0] for c in out_schema.split(",")]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        first = batch.sort_values(ts_col, kind="mergesort").head(1)  # keeps dtypes
        first_ts = float(first[ts_col].iloc[0].timestamp())
        if state.exists:
            (seen_ts,) = state.get
            if first_ts >= seen_ts:
                return iter(())  # already emitted an earlier row
        state.update((first_ts,))
        yield first[cols]

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="seen_ts double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
