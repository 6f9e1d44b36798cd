"""Custom stateful streaming operator: per-key gap (hole) detection.

The batch engine finds holes by grid-reindexing history (operators.grid);
on an infinite stream that would need unbounded state. This operator keeps
ONE value per key — the last timestamp seen — via
``applyInPandasWithState`` and emits a hole record whenever consecutive
events are further apart than the expected cadence. State is O(keys),
batches arrive Arrow-encoded, and the grouping shuffle is on the store's
business keys — the same partitioning every other operator uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_gap_detect(
    stream: DataFrame,
    keys: tuple[str, ...],
    freq_seconds: int,
    watermark: str = "2 hours",
    ts: str = "ts",
) -> DataFrame:
    """(keys…, hole_start, hole_end, gap_seconds) for every inter-event gap
    larger than ``freq_seconds``.

    hole_start/hole_end are the first/last *missing* grid slots, matching
    the batch ``completeness_holes`` convention. Rows later than the
    ``watermark`` delay are dropped by the engine; rows that are merely
    out-of-order *within* a micro-batch are handled by sorting the whole
    group before scanning. A row that arrives in a LATER micro-batch but
    timestamps before the key's high-water mark cannot retract an
    already-emitted hole (append-mode streaming has no retractions) — it
    is counted but produces no correction, the inherent streaming/batch
    trade captured by the batch ``completeness_holes`` being the source of
    truth for history.
    """
    key_fields = [stream.schema[k] for k in keys]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("hole_start", T.TimestampType()),
            T.StructField("hole_end", T.TimestampType()),
            T.StructField("gap_seconds", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last_ts_us", T.LongType())])
    step_us = freq_seconds * 1_000_000

    def detect(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_us = state.get[0] if state.exists else None
        holes: list[tuple] = []
        # a large group arrives as MULTIPLE Arrow chunks with no ordering
        # guarantee — concatenate and sort once, then scan
        all_times = pd.concat([pd.to_datetime(p[ts]) for p in pdfs])
        for t in all_times.sort_values().astype("int64") // 1000:  # ns → µs
            if last_us is not None and t - last_us > step_us:
                holes.append(
                    (
                        *key,
                        pd.Timestamp((last_us + step_us) * 1000),
                        pd.Timestamp((t - step_us) * 1000),
                        (t - last_us) // 1_000_000,
                    )
                )
            last_us = t if last_us is None else max(last_us, t)
        if last_us is not None:
            state.update((int(last_us),))
        cols = [f.name for f in out_schema.fields]
        yield pd.DataFrame(holes, columns=cols)

    return (
        stream.withWatermark(ts, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            detect,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_cusum(
    stream: DataFrame,
    keys: tuple[str, ...],
    target_k: float,
    threshold_h: float,
    watermark: str = "2 hours",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Streaming one-sided CUSUM drift alarms — the stateful twin of the
    batch ``operators.islands.cusum_drift``: per key the state is TWO
    integers (running prefix sum of the quantized excess, and the
    running minimum of that prefix including the initial 0), so the
    sequential recurrence continues exactly across micro-batches with
    O(keys) state. The within-batch transition is numpy-vectorized
    (cumsum + minimum.accumulate), no per-row Python loop.

    Emits the same (keys…, ts_us, value, cusum_q) rows as the batch
    operator; on an in-order stream the outputs are identical (the
    oracle for both is the same SQL). Cross-batch late rows share the
    append-mode trade documented on :func:`stream_gap_detect`.

    Parity scope — NULL vs NaN: a SQL NULL contributes zero excess in
    both twins (batch ``F.round(null)`` is null and ``F.sum`` skips it)
    and both emit the row with a NULL value when the running statistic
    is above threshold — the emit path converts the pandas buffer to
    nullable Float64 so NULLs round-trip as NULLs, not NaN. A literal
    NaN DOUBLE is different: Spark's sum PROPAGATES NaN, so one NaN
    poisons the batch prefix sum for the rest of the key, while the
    Arrow→pandas edge hands the stream NaN for BOTH null and NaN inputs
    — the two are indistinguishable here, so the stream gives NaN the
    NULL treatment (zero excess, emitted as NULL). Bit-for-bit
    stream/batch parity therefore holds for NULL-or-finite inputs; a
    literal-NaN input is a documented divergence where the stream's
    behavior (ignore, don't poison) is the useful one.
    """
    import numpy as np

    kq = int(round(target_k * 1000))
    hq = int(round(threshold_h * 1000))
    key_fields = [stream.schema[k] for k in keys]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("ts_us", T.LongType()),
            T.StructField(value, T.DoubleType()),
            T.StructField("cusum_q", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("p", T.LongType()), T.StructField("pmin", T.LongType())]
    )

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        p0, pmin0 = state.get if state.exists else (0, 0)
        # stable sort: tied timestamps keep a deterministic order (pass
        # pre-sorted data or unique ts for exact batch parity)
        pdf = pd.concat(list(pdfs)).sort_values(ts, kind="mergesort")
        # HALF-AWAY-FROM-ZERO to match F.round / SQL round exactly
        # (np.round is half-to-even and would diverge on exact .5 ties).
        # NaN/null values contribute 0 to the prefix sum — the batch
        # twin's F.round(null) is null, which F.sum skips; casting NaN
        # to int64 would instead poison the state with INT64_MIN
        av = pdf[value].to_numpy(dtype="float64") * 1000
        q = np.where(
            np.isnan(av), np.float64(kq),
            np.sign(av) * np.floor(np.abs(av) + 0.5),
        )
        y = q.astype(np.int64) - kq
        ps = p0 + np.cumsum(y)
        pmins = np.minimum.accumulate(np.concatenate(([pmin0], ps)))[1:]
        s = ps - pmins
        mask = s > hq
        t_us = pd.to_datetime(pdf[ts]).astype("int64").to_numpy() // 1000
        out = pd.DataFrame(
            {
                **{k: [key[i]] * int(mask.sum()) for i, k in enumerate(keys)},
                "ts_us": t_us[mask],
                # nullable Float64: NULL inputs (NaN at this edge) emit
                # as SQL NULL, matching the batch twin's emitted rows
                value: pd.array(pdf[value].to_numpy()[mask], dtype="Float64"),
                "cusum_q": s[mask],
            }
        )
        if len(ps):
            state.update((int(ps[-1]), int(pmins[-1])))
        yield out

    return (
        stream.withWatermark(ts, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            step,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_domain_cap(
    stream: DataFrame,
    group: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming per-domain admission quota — the stateful twin of the
    batch ``operators.sampling.cap_per_group``: per group, admit
    documents until ``cap`` is reached and drop everything after, with
    ONE integer of state per group (the admitted count), so the quota
    holds across micro-batches, restarts and checkpoint resumes.

    Admission order differs from the batch op by necessity: a stream
    cannot rank against future arrivals, so the quota is FIRST-COME
    (micro-batch order, then ``id_col`` ascending within a batch — the
    within-batch sort makes each batch deterministic regardless of
    scan order). On a single-batch (availableNow) run the kept set
    therefore equals the batch SQL ``row_number() OVER (PARTITION BY
    group ORDER BY id) <= cap`` — the oracle twin; across batches the
    state continues exactly (pytest-proven via a checkpoint-resumed
    second run).

    State is O(groups); the grouping shuffle is the same hash on the
    domain key the batch op uses. Emits admitted rows with all their
    columns (append mode).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n0,) = state.get if state.exists else (0,)
        pdf = pd.concat(list(pdfs)).sort_values(id_col, kind="mergesort")
        room = cap - n0
        if room > 0:
            kept = pdf.iloc[:room]
            state.update((int(n0 + len(kept)),))
            yield kept
        # full quota: no emission, state untouched (already at cap)

    return stream.groupBy(group).applyInPandasWithState(
        admit,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
