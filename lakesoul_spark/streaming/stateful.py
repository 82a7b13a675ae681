"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference delegates event-time/stateful stream processing to the
host engine (SURVEY §2.8: watermarks/session windows are "host-engine
features"); these are the two stateful operators a training-data
ingestion stream actually needs, built the idiomatic Spark way — state
is per-key, Arrow-batched, and bounded, so the operators hold on a
1000-executor cluster:

- :func:`first_event_per_key` — streaming dedup: pass through only the
  first event seen per key (state = one marker row per key, O(#keys),
  optional processing-time TTL for unbounded key spaces).
- :func:`sessionize` — event-time sessionization with a gap timeout:
  closed sessions are emitted as soon as the watermark passes
  ``session_end + gap`` (state = one open session per key).

Both run per-key chunks through pandas, never materialize a whole
partition, and emit append-mode output, so downstream sinks (including
the LakeSoul foreachBatch sink) consume them like any other stream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_event_per_key(
    sdf: DataFrame,
    key_cols: list[str],
    *,
    order_col: str,
    ttl_ms: int | None = None,
    settle_ms: int | None = None,
) -> DataFrame:
    """Streaming dedup: emit each key's first event, drop the rest.

    **Fast path (default, ``settle_ms=None``)**: "first" = the minimum
    ``order_col`` row of the first micro-batch in which the key appears
    (if the source delivers batches in ``order_col`` order — e.g.
    sorted files with maxFilesPerTrigger — this is the global arg-min
    and the operator is deterministic and SQL-oracle-checkable). With
    OUT-OF-ORDER delivery across batches the winner is batch-dependent:
    a smaller ``order_col`` arriving in a LATER batch loses.

    **Strict mode (``settle_ms=N``)**: the candidate min-order event is
    HELD in state for a settle window of N ms of processing time; any
    smaller-order event arriving within the window (each arrival
    resets it) replaces the candidate, and the winner is emitted only
    when the window expires quietly. Late events bounded by the settle
    window can no longer flip the result — emission latency is the
    price. State per key grows by the one held row.

    State per key is a single marker (fast path: no payload), so total
    state is O(distinct keys). For unbounded key spaces pass
    ``ttl_ms``: markers expire after that much processing time and a
    key recurring later is treated as new — the standard bounded-state
    trade-off.
    """
    out_schema = sdf.schema
    cols = list(sdf.columns)

    if settle_ms is None:
        def fn(
            key, pdfs: Iterator[pd.DataFrame], state: GroupState
        ) -> Iterator[pd.DataFrame]:
            if state.hasTimedOut:
                state.remove()
                return
            first = None
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                cand = pdf.loc[[pdf[order_col].idxmin()]]
                if first is None or cand[order_col].iloc[0] < first[order_col].iloc[0]:
                    first = cand
            if not state.exists and first is not None:
                state.update((True,))
                if ttl_ms is not None:
                    state.setTimeoutDuration(ttl_ms)
                yield first[cols]
            elif state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # refresh the TTL

        return sdf.groupBy(*key_cols).applyInPandasWithState(
            fn,
            out_schema,
            "seen boolean",
            "append",
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout,
        )

    # strict mode: state = (emitted, held candidate row). The held row
    # rides as a pickled one-row frame in a binary column — the state
    # schema stays key-agnostic and the payload round-trips all types.
    import pickle

    def fn_strict(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            emitted, payload = state.get
            if emitted:
                state.remove()  # ttl expired on an already-emitted key
                return
            # settle window expired quietly → the held candidate wins
            state.update((True, b""))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pickle.loads(payload)[cols]
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[[pdf[order_col].idxmin()]]
            if best is None or cand[order_col].iloc[0] < best[order_col].iloc[0]:
                best = cand
        if best is None:
            return
        if state.exists:
            emitted, payload = state.get
            if emitted:
                if ttl_ms is not None:
                    state.setTimeoutDuration(ttl_ms)  # refresh the TTL
                return
            held = pickle.loads(payload)
            if best[order_col].iloc[0] < held[order_col].iloc[0]:
                payload = pickle.dumps(best)
            state.update((False, payload))
        else:
            state.update((False, pickle.dumps(best)))
        state.setTimeoutDuration(settle_ms)

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn_strict,
        out_schema,
        "emitted boolean, payload binary",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


SESSION_SCHEMA = (
    "session_start timestamp, session_end timestamp, n_events bigint"
)


def sessionize(
    sdf: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str,
    gap_ms: int,
) -> DataFrame:
    """Event-time session windows with a ``gap_ms`` inactivity timeout.

    Input must carry a watermark on ``ts_col`` (``withWatermark``).
    Events of one key whose timestamps are within ``gap_ms`` of each
    other belong to one session; a session closes — and is emitted as
    ``key..., session_start, session_end, n_events`` — when either a
    later in-batch event of the same key starts a new session, or the
    watermark passes ``session_end + gap_ms`` (EventTimeTimeout).

    State per key = the single open session (start, end, count): O(keys)
    bounded state regardless of stream length. Semantics match the
    batch gaps-and-islands rewrite when per-key events arrive in
    event-time order across batches (guaranteed by the watermark +
    time-ordered sources; same contract as Spark's built-in
    ``session_window``).
    """
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in sdf.schema
        if f.name in key_cols
    )
    out_schema = f"{key_fields}, {SESSION_SCHEMA}"
    gap = pd.Timedelta(milliseconds=gap_ms)

    def emit(key, sessions) -> pd.DataFrame:
        starts, ends, ns = zip(*sessions)
        out = pd.DataFrame(
            {"session_start": list(starts), "session_end": list(ends),
             "n_events": list(ns)}
        )
        for name, val in reversed(list(zip(key_cols, key))):
            out.insert(0, name, val)
        return out

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield emit(key, [(pd.Timestamp(start, unit="us"),
                              pd.Timestamp(end, unit="us"), n)])
            return
        parts = [pdf[ts_col] for pdf in pdfs]
        if not parts:
            return
        ts = pd.concat(parts, ignore_index=True).sort_values(ignore_index=True)
        if len(ts) == 0:
            return
        # vectorized gaps-and-islands over the batch (no per-event loop)
        grp = ts.groupby(ts.diff().gt(gap).cumsum())
        sessions = list(
            zip(grp.first(), grp.last(), grp.size().astype(int))
        )
        if state.exists:
            s0, e0, n0 = state.get
            s0 = pd.Timestamp(s0, unit="us")
            e0 = pd.Timestamp(e0, unit="us")
            st, en, nn = sessions[0]
            if st - e0 <= gap:  # first island continues the open session
                sessions[0] = (min(s0, st), max(e0, en), n0 + nn)
            else:
                sessions.insert(0, (s0, e0, n0))
        *closed, open_s = sessions
        # persist the open session; timestamps stored as epoch
        # microseconds (state schema is long-typed for fidelity)
        state.update((open_s[0].value // 1000, open_s[1].value // 1000,
                      int(open_s[2])))
        state.setTimeoutTimestamp(open_s[1].value // 1_000_000 + gap_ms)
        if closed:
            yield emit(key, closed)

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn,
        out_schema,
        "start long, end long, n bigint",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def latest_state_stream(
    sdf: DataFrame,
    key_cols: list[str],
    *,
    order_col: str,
    ttl_ms: int | None = None,
    engine: str = "auto",
) -> DataFrame:
    """Continuous per-key latest-state maintenance with optional TTL
    tombstones — the Spark re-expression of a Flink keyed process
    function with value state + timers (the pattern the reference's
    Flink CDC sink runs: hold the newest row per PK, emit changes
    downstream).

    Semantics: last-writer-wins by ``order_col`` per key. Output is the
    input schema plus an ``op`` column: ``'u'`` whenever a key's latest
    row CHANGES (a stale row with ``order_col`` <= the current winner
    emits nothing), and — when ``ttl_ms`` is set — ``'d'`` when a key
    receives no updates for ``ttl_ms`` processing-time ms; the key's
    state is then dropped, so the footprint is O(active keys), not
    O(all keys ever). That makes the output a CDC stream: feed it to
    the LakeSoul sink on a CDC table and downstream MOR reads track
    the live set.

    ``engine``: ``"apply"`` (default path) uses
    ``applyInPandasWithState`` + ProcessingTimeTimeout — runs
    everywhere. ``"tws"`` uses Spark 4's
    ``transformWithStateInPandas`` (typed ValueState + real timers,
    the closest Flink analog) — requires the ``protobuf`` package,
    which the TWS state client imports; ``"auto"`` picks tws when
    protobuf is importable. Both produce identical 'u' emissions; the
    TTL clock differs subtly on stale arrivals — ``apply`` must re-arm
    the timeout on EVERY invocation (Spark clears it each call), so a
    stale row extends the key's life, while ``tws`` timers are armed
    per accepted update only.

    State per key: one row. One keyed exchange; Arrow-batched Python.
    """
    from pyspark.sql.types import StructType

    in_schema: StructType = sdf.schema
    cols = [f.name for f in in_schema.fields]
    if order_col not in cols:
        raise ValueError(f"order_col {order_col!r} not in stream schema")
    for k in key_cols:
        if k not in cols:
            raise ValueError(f"key column {k!r} not in stream schema")
    if engine not in ("auto", "apply", "tws"):
        raise ValueError(f"engine must be auto|apply|tws, got {engine!r}")
    if engine == "auto":
        try:
            from google.protobuf import descriptor  # noqa: F401

            engine = "tws"
        except ImportError:
            engine = "apply"
    out_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema.fields]
        + ["op string"]
    )
    state_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema.fields
    )
    if engine == "tws":
        return _latest_state_tws(
            sdf, key_cols, cols, order_col, ttl_ms, out_ddl, state_ddl
        )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            stored = state.get
            state.remove()
            out = {c: [stored[i]] for i, c in enumerate(cols)}
            out["op"] = ["d"]
            yield pd.DataFrame(out, columns=cols + ["op"])
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[pdf[order_col].idxmax()]
            if best is None or cand[order_col] > best[order_col]:
                best = cand
        if best is None:
            return
        cur = state.getOption
        oi = cols.index(order_col)
        if cur is not None and not (best[order_col] > cur[oi]):
            # stale arrival — keep state, emit nothing. Spark CLEARS any
            # previously-set timeout on every invocation, so the TTL
            # timer must be re-armed here or the key would never expire
            # (and the 'tws' engine, whose registered timers persist,
            # would diverge)
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        state.update(tuple(best[c] for c in cols))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        out = {c: [best[c]] for c in cols}
        out["op"] = ["u"]
        yield pd.DataFrame(out, columns=cols + ["op"])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn, out_ddl, state_ddl, "update", timeout
    )


def _latest_state_tws(sdf, key_cols, cols, order_col, ttl_ms, out_ddl,
                      state_ddl):
    """transformWithStateInPandas engine for :func:`latest_state_stream`
    (typed ValueState + per-key timers; Flink-style stale-timer
    resolution: each update records its deadline and an expired timer
    only fires the tombstone if it IS the latest deadline)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_with_deadline = state_ddl + ", __deadline bigint"

    class _Latest(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._latest = handle.getValueState("latest", state_with_deadline)

        def handleInputRows(self, key, rows, timer_values):
            best = None
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                cand = pdf.loc[pdf[order_col].idxmax()]
                if best is None or cand[order_col] > best[order_col]:
                    best = cand
            if best is None:
                return
            cur = self._latest.get() if self._latest.exists() else None
            oi = cols.index(order_col)
            if cur is not None and not (best[order_col] > cur[oi]):
                return
            now = timer_values.getCurrentProcessingTimeInMs()
            deadline = (now + ttl_ms) if ttl_ms else 0
            self._latest.update(tuple(best[c] for c in cols) + (deadline,))
            if ttl_ms:
                self._handle.registerTimer(deadline)
            out = {c: [best[c]] for c in cols}
            out["op"] = ["u"]
            yield pd.DataFrame(out, columns=cols + ["op"])

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            if not self._latest.exists():
                return
            stored = self._latest.get()
            if expired_timer_info.getExpiryTimeInMs() < stored[-1]:
                return  # superseded by a newer update's timer
            out = {c: [stored[i]] for i, c in enumerate(cols)}
            out["op"] = ["d"]
            self._latest.clear()
            yield pd.DataFrame(out, columns=cols + ["op"])

        def close(self) -> None:
            pass

    return sdf.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_Latest(),
        outputStructType=out_ddl,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms else "None",
    )
