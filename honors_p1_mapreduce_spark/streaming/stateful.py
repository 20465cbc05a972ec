"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.4); this is the
north-star "custom stateful operator" shape: per-key state that
survives across micro-batches, with the update logic in Arrow-batched
pandas. The example operator keeps running per-user totals (event
count + value sum) — the streaming analog of
``events.groupBy(user).agg(...)`` — emitting the refreshed totals for
every user seen in each micro-batch (Update output mode).

State is a single fixed-width row per user (count, sum): bounded by
|users|, the 100 TB-safe state size. NoTimeout keeps the example
deterministic under AvailableNow replay (timeout semantics only fire
between triggers).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n_events bigint, total_value double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user totals over a (streaming or batch-test) events
    frame with columns (user_id, value)."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
