"""Custom stateful streaming operators.

The reference keeps all state in checkpointed sinks (SURVEY.md §2.9 —
"no mapGroupsWithState-style custom state"); the engine adds the two
stateful patterns a real stream pipeline needs:

- :func:`dedup_within_watermark` — T5 upgraded: exactly-once-per-key
  within the watermark horizon via Spark's built-in
  ``dropDuplicatesWithinWatermark`` (state auto-expires with the
  watermark — bounded memory at any throughput).
- :func:`streaming_sessionize` — gap-based sessionization as an
  ``applyInPandasWithState`` operator: per-key state is the open
  session ``(start, last, n)``; a closed session is emitted as soon as
  an event arrives more than ``gap`` after the previous one. This is
  the streaming twin of ``operators/sessions.py`` (same session
  boundaries); state survives restarts via the checkpoint.

Scale: state is partitioned by the group key across executors; per-key
state here is O(1) (three longs), so the state store grows with
*distinct keys in flight*, not events. ``close_on_watermark=True``
bounds it further: idle keys' sessions close (and their state frees)
via an EVENT-TIME timeout when the watermark passes last+gap — the
production mode for churning key populations; the NoTimeout default
keeps closed-by-next-event emissions deterministic for tests.

API note: Spark 4.x also offers ``transformWithStateInPandas`` (the
StatefulProcessor API with typed state handles, timers and RocksDB).
Its Python state client imports ``google.protobuf``, which this
container does not ship (verified: the TWS driver worker crashes in
PRE_INIT on that import), so the engine standardizes on
``applyInPandasWithState`` — same semantics, one state tuple per key,
runs everywhere. Porting to a StatefulProcessor is mechanical: init →
``getValueState(SESSION_STATE_SCHEMA)``, handleInputRows → the fold
below, close → no-op.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("last_event_time", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def dedup_within_watermark(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "event_time",
    watermark: str | None = None,
) -> DataFrame:
    """T5/W1 streaming: drop duplicate keys arriving within the watermark
    horizon. State expires automatically — unlike plain
    ``dropDuplicates``, memory is bounded for unbounded streams.

    Pass ``watermark`` only when ``df`` has none yet (Spark disallows
    redefining it — ``parse_events`` output is already watermarked)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.dropDuplicatesWithinWatermark(list(keys))


def streaming_sessionize(
    events: DataFrame,
    key_col: str = "sensor_id",
    ts_col: str = "event_time",
    gap_seconds: int = 300,
    close_on_watermark: bool = False,
) -> DataFrame:
    """Gap-based sessions over a stream via ``applyInPandasWithState``.

    Default (``close_on_watermark=False``): emits one row per *closed*
    session, closed = a newer event for the SAME key arrived more than
    ``gap_seconds`` later; an idle key's open session stays in the state
    store indefinitely.

    ``close_on_watermark=True`` is the production mode: the operator
    registers an EVENT-TIME timeout at ``last + gap`` for every open
    session, so when the WATERMARK passes that point the session closes
    and emits even if the key never speaks again — sessions complete
    deterministically in event time, and state for idle keys is freed
    (bounded state under key churn at 100 TB, where "every key
    eventually sends another event" is false). Requires ``events`` to
    carry a watermark on ``ts_col``.

    The open session per key survives micro-batches and restarts via
    the checkpoint. Output mode must be ``append``.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (sid,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        if close_on_watermark and state.hasTimedOut:
            # watermark passed last+gap with no new events: close + free
            if start is not None:
                closed.append((sid, start, last, n))
            state.remove()
            if closed:
                yield pd.DataFrame(
                    {
                        "sensor_id": [c[0] for c in closed],
                        "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                        "last_event_time": [pd.Timestamp(c[2], unit="us") for c in closed],
                        "n_events": [c[3] for c in closed],
                    }
                )
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v.value) // 1000 for v in pd.to_datetime(pdf[ts_col]))
        ts.sort()
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((sid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        state.update((start, last, n))
        if close_on_watermark:
            state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "sensor_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "last_event_time": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        events.select(key_col, ts_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if close_on_watermark
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
