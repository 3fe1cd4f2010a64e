"""Custom stateful streaming operators via applyInPandasWithState.

The reference has nothing like this (batch MapReduce only); it is the
beyond-reference path for per-key logic that windowed aggregation can't
express (e.g. sessionization that must emit per-session records with
custom fields, counters with timeouts).

State is partitioned by key — scales horizontally; the watermark bounds
state size via timeouts.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: output schema of sessionize_stateful with the default user_id key
#: (kept for callers that want the shape; the operators derive the key
#: field from the input schema at call time — ADVICE r5: a renamed or
#: non-bigint key must not be silently mislabeled/miscast)
SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"


def await_stream_drain(q, timeout_seconds: float = 240.0, poll: float = 0.25) -> bool:
    """Wait until a started streaming query has CONSUMED all available
    input, then stop it.  ``trigger(availableNow=True)`` cannot
    self-terminate a stateful query that holds pending processing-time
    timeouts — the day-idle eviction these operators register keeps
    the query alive waiting on wall-clock (measured r10: an upsert
    stream stayed active 60 s+ after 8 s of real work, so every
    ``awaitTermination(N)`` on one of these burns its full N).
    Observed behavior (measured r10): such a query loops ZERO-INPUT
    batches indefinitely (batchId keeps climbing with numInputRows=0,
    isTriggerActive pinned True) servicing the armed timeouts, so
    neither query death nor trigger idleness ever happens.  Drained =
    no data available AND the LAST progress event was a zero-input
    batch whose batchId is STRICTLY AFTER the last batch that consumed
    rows (i.e. an empty batch provably ran after every data batch),
    seen on two consecutive polls, then re-confirmed once more after a
    settle delay (ADVICE r10: a timeout-servicing zero-input batch
    coinciding with a transiently-false isDataAvailable — e.g. between
    a file landing and the source listing it — must not declare drain
    early; the batchId ordering plus the settle re-check close that
    race).  Returns True if drained, False if ``timeout_seconds``
    elapsed first (the query is stopped either way)."""
    import time

    deadline = time.time() + timeout_seconds
    drained, idle = False, 0
    last_data_batch = -1
    while time.time() < deadline:
        if not q.isActive:
            drained = True
            break
        st = q.status
        lp = q.lastProgress
        if lp is not None and lp["numInputRows"] > 0:
            last_data_batch = max(last_data_batch, lp["batchId"])
        if (
            not st["isDataAvailable"]
            and lp is not None
            and lp["numInputRows"] == 0
            and lp["batchId"] > last_data_batch
        ):
            idle += 1
            if idle >= 2:
                # Settle, then re-verify: if data surfaced while we
                # were counting idle polls, resume waiting.
                time.sleep(max(poll, 0.5))
                lp2 = q.lastProgress
                if lp2 is not None and lp2["numInputRows"] > 0:
                    last_data_batch = max(last_data_batch, lp2["batchId"])
                if (
                    not q.isActive
                    or (
                        not q.status["isDataAvailable"]
                        and lp2 is not None
                        and lp2["numInputRows"] == 0
                        and lp2["batchId"] > last_data_batch
                    )
                ):
                    drained = True
                    break
                idle = 0
        else:
            idle = 0
        time.sleep(poll)
    q.stop()
    q.awaitTermination(60)
    return drained


def _key_field(events: DataFrame, user_col: str) -> StructField:
    """The output key field, named and typed from the INPUT schema —
    not assumed to be ``user_id long``."""
    f = events.schema[user_col]
    return StructField(f.name, f.dataType)


def _session_fn(gap_seconds: int, user_col: str):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user_col: [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts_us = sorted(
            int(t.value // 1000)
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
        )
        if not ts_us:
            return
        out = []
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_us[0], ts_us[0], 0
        for t in ts_us:
            # gap strictly greater than the threshold opens a session —
            # matches F.session_window (a gap of exactly the threshold
            # merges; tests/test_streaming.py::test_session_gap_boundary)
            if t - last > gap_seconds * 1_000_000:
                out.append((user_id, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    user_col: [r[0] for r in out],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                    "session_end": [pd.Timestamp(r[2], unit="us") for r in out],
                    "n_events": [r[3] for r in out],
                }
            )

    return fn


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800, user_col: str = "user_id"
) -> DataFrame:
    """Per-user sessionization with explicit state: emits each CLOSED
    session (a new event ≥ gap after the last, or state timeout).

    Streaming input → applyInPandasWithState with processing-time
    timeout.  The in-flight session lives in GroupState; output rows are
    closed sessions only (the batch session_agg covers the
    oracle-checkable variant).  The output key column is named and
    typed from ``events.schema[user_col]``."""
    out_schema = StructType(
        [_key_field(events, user_col)]
        + list(
            StructType.fromDDL(
                "session_start timestamp, session_end timestamp, n_events long"
            )
        )
    )
    return events.groupBy(user_col).applyInPandasWithState(
        _session_fn(gap_seconds, user_col),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _funnel_fn(
    steps: list,
    within_seconds: int | None,
    step_col: str,
    ts_col: str,
    user_col: str,
):
    k = len(steps)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        rows = sorted(
            (int(t.value // 1000), s)
            for pdf in pdfs
            for t, s in zip(pd.to_datetime(pdf[ts_col]), pdf[step_col])
        )
        if not rows:
            return
        if state.exists:
            st = state.get
            stage, times = st[0], list(st[1:])
        else:
            stage, times = 0, [0] * k
        out = []
        for ts_us, typ in rows:
            if stage >= k or typ != steps[stage]:
                continue
            if stage > 0:
                if ts_us <= times[stage - 1]:
                    continue
                if (
                    within_seconds is not None
                    and ts_us > times[stage - 1] + within_seconds * 1_000_000
                ):
                    continue
            times[stage] = ts_us
            stage += 1
            if stage == k:
                out.append((user_id, *times))
                stage, times = 0, [0] * k  # repeat conversions restart
        state.update((stage, *times))
        state.setTimeoutDuration(86_400_000)  # evict after a day idle
        if out:
            yield pd.DataFrame(
                {
                    user_col: [r[0] for r in out],
                    **{
                        f"step_{i}_ts": [
                            pd.Timestamp(r[i], unit="us") for r in out
                        ]
                        for i in range(1, k + 1)
                    },
                }
            )

    return fn


def funnel_stateful(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    step_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Streaming ordered funnel: emits one row per COMPLETED
    view→…→purchase chain as it happens (append mode), with the same
    greedy strict-order + conversion-window semantics as the batch
    ``funnel_steps``.  After a completion the key restarts at stage 0,
    so repeat conversions each emit.

    State per key is (stage, k step timestamps) — fixed-size, evicted
    after a day of inactivity via processing-time timeout.  Caveat
    (streaming reality): events are ordered within a micro-batch but
    the operator cannot backtrack across batches — a step arriving
    late, after a later-stage event was already processed in a prior
    batch, is not retro-fitted.  The batch operator is the
    oracle-checkable truth; this is the low-latency emitter.
    """
    k = len(steps)
    out_schema = StructType(
        [_key_field(events, user_col)]
        + [StructField(f"step_{i}_ts", TimestampType()) for i in range(1, k + 1)]
    )
    state_schema = "stage int, " + ", ".join(f"t{i} long" for i in range(1, k + 1))
    return events.groupBy(user_col).applyInPandasWithState(
        _funnel_fn(steps, within_seconds, step_col, ts_col, user_col),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _transitions_fn(step_col: str, ts_col: str, user_col: str,
                    gap_seconds: int | None):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        # NULL-ts / NULL-step rows are excluded (the batch op orders
        # NULL ts first and never emits NULL-step transitions; here a
        # NaT would decode to int64-min and a None step would make the
        # sort key heterogeneous — both dropped instead).
        rows = sorted(
            (int(t.value // 1000), s)
            for pdf in pdfs
            for t, s in zip(pd.to_datetime(pdf[ts_col]), pdf[step_col])
            if not pd.isna(t) and s is not None
        )
        if not rows:
            return
        if state.exists:
            last_us, last_step = state.get
        else:
            last_us, last_step = None, None
        out: dict = {}
        for ts_us, typ in rows:
            if last_step is not None and (
                gap_seconds is None
                or ts_us - last_us <= gap_seconds * 1_000_000
            ):
                k2 = (last_step, typ)
                out[k2] = out.get(k2, 0) + 1
            last_us, last_step = ts_us, typ
        state.update((last_us, last_step))
        state.setTimeoutDuration(86_400_000)
        if out:
            yield pd.DataFrame(
                {
                    user_col: [user_id] * len(out),
                    "from_step": [a for a, _ in out],
                    "to_step": [b for _, b in out],
                    "n": list(out.values()),
                }
            )

    return fn


def transitions_stateful(
    events: DataFrame,
    user_col: str = "user_id",
    step_col: str = "event_type",
    ts_col: str = "ts",
    gap_seconds: int | None = None,
) -> DataFrame:
    """Streaming Markov-transition counter: per key, emits PARTIAL
    (from_step, to_step, n) increments per micro-batch — sum them
    downstream (or feed a sink that does) for the running transition
    matrix; the batch ``event_transitions`` is the oracle-checkable
    truth on any prefix.  State per key is ONE (last_ts, last_step)
    pair — constant-size, evicted after a day idle; with
    ``gap_seconds`` the chain resets across session gaps (no
    transition across a boundary, matching the batch op).

    Streaming caveat (same contract as funnel_stateful): events are
    ordered within a micro-batch but not retro-fitted across batches —
    a late event older than the stored last-step is counted in arrival
    order, not event order.
    """
    from pyspark.sql.types import LongType, StringType

    out_schema = StructType(
        [
            _key_field(events, user_col),
            StructField("from_step", StringType()),
            StructField("to_step", StringType()),
            StructField("n", LongType()),
        ]
    )
    return events.groupBy(user_col).applyInPandasWithState(
        _transitions_fn(step_col, ts_col, user_col, gap_seconds),
        outputStructType=out_schema,
        stateStructType="last_us long, last_step string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _upsert_fn(ts_col: str, op_col: str, seq_col: str | None,
               key_col: str, delete_op: str):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        best = state.get if state.exists else None  # (ts_us, seq, op, payload)
        changed = False
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            for t, op, seq, pay in zip(
                ts,
                pdf[op_col],
                pdf[seq_col] if seq_col else [0] * len(pdf),
                pdf["__payload"],
            ):
                if pd.isna(t) or op is None or pd.isna(seq):
                    raise ValueError(
                        "upsert_state_stream: NULL ts/op/seq in change "
                        "record (malformed CDC row)"
                    )
                cand = (int(t.value // 1000), int(seq))
                if best is None or cand > (best[0], best[1]):
                    best = (cand[0], cand[1], op, pay)
                    changed = True
                elif cand == (best[0], best[1]) and (op, pay) != (
                    best[2],
                    best[3],
                ):
                    # exact (ts, seq) tie with a DIFFERENT op/payload:
                    # first-seen-wins would be micro-batch-arrival-order
                    # dependent, silently diverging from the batch twin
                    # compact_changelog (which fails loudly on duplicate
                    # winners).  Identical redelivery (at-least-once
                    # sources) is idempotent and passes through above.
                    raise ValueError(
                        "upsert_state_stream: conflicting change rows "
                        f"share (ts, seq)=({cand[0]}, {cand[1]}) for "
                        f"key {k!r} — supply a finer seq_col (the "
                        "compact_changelog duplicate-winner contract)"
                    )
        if state.exists or changed:
            # re-arm eviction on EVERY invocation that leaves state
            # present: Spark clears a key's timeout each time the
            # function runs, so a batch of only-stale changes would
            # otherwise drop the day-idle eviction and leak the key's
            # state forever.
            if changed:
                state.update(best)
            state.setTimeoutDuration(86_400_000)
        if changed:
            yield pd.DataFrame(
                {
                    key_col: [k],
                    "ts_us": [best[0]],
                    "op": [best[2]],
                    "payload": [best[3]],
                    "is_live": [best[2] != delete_op],
                }
            )

    return fn


def upsert_state_stream(
    changes: DataFrame,
    key_col: str,
    payload_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Streaming CDC compaction — the stream twin of
    ``scd.compact_changelog``/``apply_cdc``: per key, maintain the
    latest (ts, seq) change across micro-batches and emit the key's
    NEW CURRENT ROW whenever it advances (an upsert-view change
    stream: feed a key-value sink / foreachBatch MERGE).  Deletes emit
    with ``is_live = false`` (the tombstone the sink needs).

    The payload travels as ONE JSON column (state schemas are fixed
    structs; JSON keeps the operator payload-generic) — parse with
    ``from_json`` downstream where the schema is known.  NULL ts/op
    change rows fail loudly (the apply_cdc malformed-record
    discipline).  State per key is one (ts, seq, op, payload) tuple,
    day-idle evicted.

    Streaming caveat (the funnel/transitions contract): ordering
    within a micro-batch is by (ts, seq), but a LATE change older
    than the stored winner is correctly ignored — max-compaction is
    order-insensitive, so unlike the funnel ops the result equals the
    batch compaction on any prefix regardless of arrival order.
    Conflicting rows that TIE on (ts, seq) with different op/payload
    fail loudly (compact_changelog's duplicate-winner contract);
    identical redelivery (at-least-once sources) is idempotent.

    Output per emission: (key, ts_us, op, payload, is_live).
    """
    pay = F.to_json(F.struct(*payload_cols)).alias("__payload")
    cols = [key_col, ts_col, op_col] + ([seq_col] if seq_col else [])
    src = changes.select(*cols, pay)
    out_schema = StructType(
        [
            _key_field(changes, key_col),
            StructField("ts_us", LongType()),
            StructField("op", StringType()),
            StructField("payload", StringType()),
            StructField("is_live", BooleanType()),
        ]
    )
    return src.groupBy(key_col).applyInPandasWithState(
        _upsert_fn(ts_col, op_col, seq_col, key_col, delete_op),
        outputStructType=out_schema,
        stateStructType=(
            "ts_us long, seq long, op string, payload string"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _cusum_fn(key_col: str, order_col: str, value_col: str,
              target: int, k: int, h: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        rows = sorted(
            (int(o), int(v))
            for pdf in pdfs
            for o, v in zip(pdf[order_col], pdf[value_col])
            if not pd.isna(o) and not pd.isna(v)
        )
        if not rows:
            return
        if state.exists:
            s_hi, s_lo = state.get
        else:
            s_hi, s_lo = 0, 0
        oo, vv, hh, ll, al = [], [], [], [], []
        for o, v in rows:
            s_hi = max(0, s_hi + (v - target - k))
            s_lo = max(0, s_lo + (target - v - k))
            oo.append(o)
            vv.append(v)
            hh.append(s_hi)
            ll.append(s_lo)
            al.append(s_hi > h or s_lo > h)
        state.update((s_hi, s_lo))
        state.setTimeoutDuration(86_400_000)
        yield pd.DataFrame(
            {
                key_col: [key_id] * len(oo),
                "order": oo,
                "value": vv,
                "s_hi": hh,
                "s_lo": ll,
                "alarm": al,
            }
        )

    return fn


def cusum_stateful(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "order",
    value_col: str = "value",
    target: int = 0,
    k: int = 0,
    h: int = 0,
) -> DataFrame:
    """Streaming tabular CUSUM monitor: per key, the exact int64
    Lindley recursions

        s⁺ = max(0, s⁺ + (v − target − k)),
        s⁻ = max(0, s⁻ + (target − v − k))

    advance across micro-batches through TWO longs of state per key,
    emitting one (order, value, s_hi, s_lo, alarm) row per event —
    the batch ``streaming/windows.py:cusum_flags`` (same recursion in
    reflection closed form) is the oracle-checkable truth on any
    prefix, bit-identical because everything is integer arithmetic.
    Alarms do NOT reset the statistic (matching the batch op —
    resetting is a policy choice layered downstream).

    Streaming caveat (the funnel/transitions contract): events are
    ordered within a micro-batch but not retro-fitted across batches
    — a late event older than already-folded ones enters the
    recursion in arrival order.

    100 TB: state is two longs per key; emission is input-sized; the
    only exchange is the groupBy key hash — identical to every other
    applyInPandasWithState op here.
    """
    from pyspark.sql.types import BooleanType, LongType

    out_schema = StructType(
        [
            _key_field(events, key_col),
            StructField("order", LongType()),
            StructField("value", LongType()),
            StructField("s_hi", LongType()),
            StructField("s_lo", LongType()),
            StructField("alarm", BooleanType()),
        ]
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _cusum_fn(key_col, order_col, value_col,
                  int(target), int(k), int(h)),
        outputStructType=out_schema,
        stateStructType="s_hi long, s_lo long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
