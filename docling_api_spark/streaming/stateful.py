"""Custom stateful streaming operator: incremental sessionization with
applyInPandasWithState.

Spark's built-in `session_window` covers windowed aggregation; this operator
is the general form — arbitrary per-key state evolved across micro-batches
(reference point: SURVEY.md §2.9 'custom stateful streaming'). State per
user is one open session (4 scalars); closed sessions are emitted as soon
as a later event proves the gap, so output latency is one micro-batch, and
state size is O(active users), independent of history length.

Batch-mode q32 (session_window + gaps-and-islands oracle) pins the session
semantics; tests assert the streaming operator's closed sessions are exactly
the batch sessions minus each user's final (still-open) one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 30 * 60 * 1_000_000

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# open-session state: (start_us, last_us, n_events, total_value)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _sessionize_group(key, pdf_iter, state: GroupState):
    import pandas as pd

    (user_id,) = key
    if state.exists:
        start_us, last_us, n_events, total_value = state.get
    else:
        start_us = last_us = None
        n_events, total_value = 0, 0.0

    closed = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("t_us")
        for t_us, value in zip(pdf["t_us"], pdf["value"]):
            t_us = int(t_us)
            if start_us is None:
                start_us, last_us, n_events, total_value = t_us, t_us, 1, float(value)
            elif t_us - last_us >= GAP_US:
                closed.append((user_id, start_us, n_events, total_value))
                start_us, last_us, n_events, total_value = t_us, t_us, 1, float(value)
            else:
                last_us = t_us
                n_events += 1
                total_value += float(value)

    if start_us is not None:
        state.update((start_us, last_us, n_events, total_value))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_us", "n_events", "total_value"]
        )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """events stream with (user_id, t_us, value) → closed-session stream.

    Requires micro-batches to deliver a user's events in non-decreasing
    event-time order across batches (true for replayed logs / file sources;
    for out-of-order sources add a watermark + sort stage upstream).
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas: the Spark-4 native stateful-processor API
# ---------------------------------------------------------------------------
COUNTER_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

# running-counter state: two integers per user
COUNTER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def _counter_group(key, pdf_iter, state: GroupState):
    """applyInPandasWithState twin of the RunningCounter processor: same
    two-integer state, same one-snapshot-per-batch emission."""
    import pandas as pd

    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        cents += int(pdf["cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_cents": [cents]}
    )


def running_counter_stream_fallback(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals via applyInPandasWithState — identical
    semantics to `running_counter_stream` on the API every Spark build
    ships (no protobuf dependency, HDFS-backed state store is fine)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _counter_group,
        COUNTER_OUTPUT_SCHEMA,
        COUNTER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """True when the transformWithStateInPandas Python runner can start —
    it hard-requires google.protobuf, which this container does not ship.
    The same import-gating contract as the docling / Pillow seams
    (pipeline/convert.py, operators/multimodal.py): the real API runs
    wherever the dep exists, the applyInPandasWithState twin is the
    fallback, and the q307 registry entry appears only where runnable.

    A REAL import, not find_spec: a present-but-broken install (partial
    wheel, missing C extension) has a spec but fails to execute — the
    gate must select the fallback there, not register an op that dies at
    its first micro-batch. The broad except is deliberate for the same
    reason (C-extension import failures are not always ImportError)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except Exception:
        return False


def running_counter_stream_auto(events_stream: DataFrame) -> DataFrame:
    """Prefer the Spark-4 stateful-processor API (typed state, timers,
    TTL); fall back to applyInPandasWithState where the TWS Python runner's
    protobuf dependency is absent. Both paths produce identical output for
    the same input batches, so the selection is an implementation detail —
    exactly the DoclingConverter-selection pattern (pipeline/convert.py)."""
    if tws_available():
        return running_counter_stream(events_stream)
    return running_counter_stream_fallback(events_stream)


def _make_counter_processor():
    """Running per-user counter as a StatefulProcessor (ValueState holding
    two integers, updated per micro-batch, snapshot emitted each batch).

    Defined inside a factory so importing this module never requires the
    transformWithState machinery (Spark >= 4.0) at import time.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            state_schema = T.StructType(
                [
                    T.StructField("n_events", T.LongType()),
                    T.StructField("total_cents", T.LongType()),
                ]
            )
            self._state = handle.getValueState("counter", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, cents = (self._state.get() or (0, 0)) if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._state.update((n, cents))
            (user_id,) = key
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return RunningCounter()


def running_counter_stream(events_stream: DataFrame) -> DataFrame:
    """events stream with (user_id, cents) → per-user running totals via
    transformWithStateInPandas (arbitrary typed state, the API that
    supersedes applyInPandasWithState in Spark 4).

    transformWithState only runs on the RocksDB state store; pin the
    provider before the query starts (HDFS-backed is the default)."""
    events_stream.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_counter_processor(),
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        outputMode="Append",  # file sinks are append-only; single-batch
        # inputs emit each user exactly once, so Append == final totals
        timeMode="None",
    )
