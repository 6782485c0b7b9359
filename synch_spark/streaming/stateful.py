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
        batch = pd.concat(list(pdfs), ignore_index=True)
        first = batch.sort_values(ts_col, kind="mergesort").head(1)  # keeps dtypes
        state.update((1,))
        yield first[cols]

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
