"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the Structured-Streaming path for operators
the built-in windowed aggs can't express).

Web/KG relevance: crawl-evidence sessionization — contiguous activity
bursts per entity become evidence snapshots (the streaming counterpart of
the batch evidence table). Also the template for any custom stateful
operator (dedup-with-memory, incremental entity stats).

State per key: the open session (start_ts, last_ts, n_events). An event
more than ``gap_seconds`` after the previous one closes the open session
(emitted) and starts a new one; the trailing session stays in state until
a later batch closes it (or a timeout would, on a live stream).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start_ts double, last_ts double, n_events long"


def sessionize_func(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap = 1800.0  # 30 min
    if state.exists:
        start_ts, last_ts, n_events = state.get
    else:
        start_ts = last_ts = None
        n_events = 0

    out_rows = []
    ts_all = []
    for pdf in pdfs:
        ts_all.extend(pdf["ts"].astype("int64").to_numpy() / 1e9)
    ts_all.sort()
    for t in ts_all:
        if last_ts is None:
            start_ts, last_ts, n_events = t, t, 1
        elif t - last_ts > gap:
            out_rows.append((user_id, start_ts, last_ts, n_events))
            start_ts, last_ts, n_events = t, t, 1
        else:
            last_ts = t
            n_events += 1

    if last_ts is not None:
        state.update((float(start_ts), float(last_ts), int(n_events)))

    if out_rows:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out_rows],
                "session_start": pd.to_datetime([r[1] for r in out_rows], unit="s"),
                "session_end": pd.to_datetime([r[2] for r in out_rows], unit="s"),
                "n_events": [r[3] for r in out_rows],
            }
        )


def sessionize_stream(events_stream):
    """events stream (user_id, ts) → completed sessions stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            sessionize_func,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
