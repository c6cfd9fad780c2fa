"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in stateful surface (windowed aggs, ``session_window``,
``dropDuplicatesWithinWatermark`` — streaming/kernel.py) covers every
operator the reference needs. This module adds the pattern those can NOT
express: per-key ORDER-DEPENDENT recursion across micro-batches, where
each event's output depends on arbitrary state folded over every earlier
event of that key.

The worked instance is an exponential moving average (EMA) tracker over a
sensor/value stream — ``ema_i = alpha*v_i + (1-alpha)*ema_{i-1}`` is a
recurrence, so no commutative/associative aggregate computes it; it needs
explicit keyed state. The same skeleton (group -> sort batch -> fold with
state -> emit + update) carries any per-key online algorithm: anomaly
scores, CUSUM change detection, rate limiters, per-source Bloom dedup.

Scale notes:
- state is O(1) per key (the running EMA + count), grouped-shuffled on the
  key — the same partitioning story as any keyed aggregation;
- batches arrive as Arrow-backed pandas frames (vectorizable; the fold
  here is per-row only because the recurrence is inherently sequential);
- the worker function is SELF-CONTAINED (locals + pandas only) so
  cloudpickle ships it by value and executors never need this repo on
  their sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def ema_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key cross-batch EMA over an event stream.

    Emits one row per input event — (key, ts, value, ema, n_seen) — where
    ``ema`` folds over every event of that key seen so far, across
    micro-batch boundaries (state survives between triggers and restarts
    via the checkpoint).

    Within a micro-batch, a key's rows are folded in ``(ts_col,
    value_col)`` order — the value tiebreak makes the fold order (and so
    every EMA) independent of file/partition layout, since ordering among
    equal (ts, value) rows cannot change the value sequence. Across
    batches, arrival order governs (late events do not rewrite history —
    the documented semantics of online EMA). NULL/NaN values are dropped
    — one missing reading must not turn every later EMA of the key into
    NaN.
    """
    a = float(alpha)
    kc, tc, vc = key_col, ts_col, value_col

    def fold(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            ema, n = state.get
        else:
            ema, n = None, 0
        outs = []
        for pdf in pdf_iter:
            pdf = pdf[pdf[vc].notna()]
            pdf = pdf.sort_values([tc, vc], kind="stable").reset_index(
                drop=True
            )
            emas = []
            for v in pdf[vc]:
                v = float(v)
                ema = v if ema is None else a * v + (1.0 - a) * ema
                n += 1
                emas.append(ema)
            outs.append(
                pd.DataFrame(
                    {
                        kc: pdf[kc],
                        tc: pdf[tc],
                        vc: pdf[vc],
                        "ema": emas,
                        "n_seen": range(n - len(emas) + 1, n + 1),
                    }
                )
            )
        state.update((ema, n))
        for out in outs:
            yield out

    out_schema = (
        f"{kc} long, {tc} timestamp, {vc} double, ema double, n_seen long"
    )
    return df.groupBy(kc).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="ema double, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    drift: int,
    threshold: int,
) -> DataFrame:
    """Per-key one-sided CUSUM drift detector across micro-batches.

    ``s_i = max(0, s_{i-1} + v_scaled_i - drift)`` with an alarm when
    ``s_i > threshold`` — the classic change-point recurrence (Page 1954)
    over an INTEGER grid: values are scaled by 100 and rounded to int64
    HALF AWAY FROM ZERO (sign * floor(|v*100| + 0.5) — mirroring SQL
    ROUND; pandas' .round() is banker's and would diverge on half-grid
    values), so state, scores and alarms are bit-exact on any engine.
    NULL/NaN values are dropped (an online detector skips missing
    readings rather than crashing or poisoning state).

    Emits one row per event: (key, ts, v_scaled, cusum, alarm). Within a
    micro-batch rows fold in (ts, value) order (value tiebreak — tied
    rows produce the same output multiset regardless of their relative
    order); across batches arrival order governs, like every online
    detector. State is one int64 per key.

    Batch replay (the oracle identity): with ``y_i = v_scaled_i - drift``
    and ``c_i = sum(y_1..y_i)``, the recurrence unrolls to
    ``s_i = c_i - least(0, min(c_1..c_i))`` — two keyed window passes, no
    recursion. The worker below is the streaming form of exactly that
    fold.
    """
    k, h = int(drift), int(threshold)
    kc, tc, vc = key_col, ts_col, value_col

    def fold(key, pdf_iter, state):
        import pandas as pd

        import numpy as np

        s = state.get[0] if state.exists else 0
        outs = []
        for pdf in pdf_iter:
            pdf = pdf[pdf[vc].notna()]
            pdf = pdf.sort_values([tc, vc], kind="stable").reset_index(
                drop=True
            )
            y = pdf[vc].to_numpy(dtype="float64") * 100.0
            scaled = pd.Series(
                (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype("int64")
            )
            ss = []
            for v in scaled:
                s = max(0, s + int(v) - k)
                ss.append(s)
            outs.append(
                pd.DataFrame(
                    {
                        kc: pdf[kc],
                        tc: pdf[tc],
                        "v_scaled": scaled,
                        "cusum": ss,
                        "alarm": [x > h for x in ss],
                    }
                )
            )
        state.update((s,))
        for out in outs:
            yield out

    out_schema = (
        f"{kc} long, {tc} timestamp, v_scaled long, cusum long, "
        "alarm boolean"
    )
    return df.groupBy(kc).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="s long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def twa_stream(
    df: DataFrame,
    key_cols: tuple[str, str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key cross-batch TIME-WEIGHTED running average (r07) — the
    streaming twin of the batch ``time_weighted_avg``: LOCF weighting
    means every event's contribution is ``last_v * (t - last_t)``, an
    order-dependent recurrence over per-key state (last observation +
    accumulated mass) that no built-in streaming aggregate expresses.

    Emits one row per event — (k1, k2, ts, value, covered_micros, twa)
    — where ``covered_micros`` is the exact integer time span since the
    key's first observation and ``twa`` the running LOCF average (NULL
    until time has elapsed). Within a micro-batch rows fold in
    ``(ts, value)`` order; ties at equal ts carry zero weight, so tie
    order cannot change the accumulators. A LATE cross-batch event
    (older than the key's last observation) contributes ZERO mass
    instead of negative mass (dt clamped at 0 — without the clamp one
    straggler would permanently corrupt the accumulator), and its
    covered span clamps at 0 likewise; NULL/NaN values are dropped.
    State is O(1) per key: (t_first, last_t, last_v, acc_vdt).
    """
    k1, k2 = key_cols
    tc, vc = ts_col, value_col

    def fold(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            t0, last_t, last_v, acc = state.get
        else:
            t0, last_t, last_v, acc = None, None, None, 0.0
        outs = []
        for pdf in pdf_iter:
            pdf = pdf[pdf[vc].notna()]
            pdf = pdf.sort_values([tc, vc], kind="stable").reset_index(
                drop=True
            )
            covered, twas = [], []
            for ts_val, v in zip(pdf[tc], pdf[vc]):
                t = int(pd.Timestamp(ts_val).value // 1000)  # ns -> us
                v = float(v)
                if t0 is None:
                    t0, last_t, last_v = t, t, v
                elif t >= last_t:
                    acc = acc + last_v * float(t - last_t)
                    last_t, last_v = t, v
                # else: STALE event — zero mass, holder unchanged
                c = max(t - t0, 0)
                covered.append(c)
                twas.append(acc / float(c) if c > 0 else None)
            outs.append(
                pd.DataFrame(
                    {
                        k1: pdf[k1],
                        k2: pdf[k2],
                        tc: pdf[tc],
                        vc: pdf[vc],
                        "covered_micros": covered,
                        "twa": twas,
                    }
                )
            )
        state.update((t0, last_t, last_v, acc))
        for out in outs:
            yield out

    out_schema = (
        f"{k1} long, {k2} string, {tc} timestamp, {vc} double, "
        "covered_micros long, twa double"
    )
    return df.groupBy(k1, k2).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="t0 long, last_t long, last_v double, acc double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_stream(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int = 8,
) -> DataFrame:
    """Per-key cross-batch KMV distinct-count sketch (r08) — the
    streaming twin of the batch ``kmv_distinct_sketch``: state holds
    the k SMALLEST md5-derived 48-bit hashes of the ids seen so far
    (a set-fold, so the result is arrival-order-INDEPENDENT — exactly
    why a batch oracle can replay the stream bit-for-bit), and each
    micro-batch emits one row per key with the running estimate.

    Output rows: (key, batch_seq, sketch_size, kmv_est) where
    batch_seq counts the key's invocations (1-based), sketch_size =
    min(k, distinct-so-far) and kmv_est = distinct-so-far exactly while
    the sketch is not full, else (k-1) * 2^48 div h_(k).

    Scale notes: state is O(k) longs per key regardless of stream
    length — the bounded-memory contract that makes KMV the streaming
    distinct counter; the same sketch merges across keys/nodes by
    union + re-truncation (see the batch query's ALL row).
    """
    kc, ic = key_col, id_col
    space = 1 << 48

    def fold(key, pdf_iter, state):
        import hashlib

        import pandas as pd

        if state.exists:
            nb, hs = state.get
            hs = list(hs)
        else:
            nb, hs = 0, []
        seen = set(hs)
        for pdf in pdf_iter:
            for u in pdf[ic]:
                if pd.isna(u):
                    continue
                h = int(
                    hashlib.md5(str(int(u)).encode()).hexdigest()[:12], 16
                )
                seen.add(h)
        hs = sorted(seen)[:k]
        nb += 1
        state.update((nb, hs))
        size = len(hs)
        est = size if size < k else (k - 1) * space // hs[k - 1]
        yield pd.DataFrame(
            {
                kc: [key[0]],
                "batch_seq": [nb],
                "sketch_size": [size],
                "kmv_est": [est],
            }
        )

    return df.groupBy(kc).applyInPandasWithState(
        fold,
        outputStructType=(
            f"{kc} string, batch_seq long, sketch_size long, kmv_est long"
        ),
        stateStructType="nb long, hs array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def median_stream(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key cross-batch EXACT running median (r10): state holds the
    sorted integer-quantized values seen so far and each micro-batch
    emits one row per key with the running median — like every operator
    here, the fold is a MULTISET accumulation (arrival-order-
    independent), so a batch oracle can replay any prefix of the stream
    bit-for-bit via order statistics.

    The median is emitted as ``median2`` = lower-middle + upper-middle
    order statistic (= 2x the interpolated median), which keeps the
    output a pure integer — no float halving, no .5 rounding hazards.

    Output rows: (key, batch_seq, n_values, median2) with batch_seq
    counting the key's invocations (1-based).

    Scale notes: exact medians need the full multiset — state is
    O(values-per-key), the documented trade for bit-exactness at this
    table's per-key cardinality; when values-per-key stops fitting the
    state store, swap the sorted list for a mergeable quantile sketch
    (KLL / t-digest) exactly as streaming_kmv_distinct swaps exact
    distinct for KMV.
    """
    kc, vc = key_col, value_col

    def fold(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            nb, vals = state.get
            vals = list(vals)
        else:
            nb, vals = 0, []
        for pdf in pdf_iter:
            for v in pdf[vc]:
                if pd.isna(v):
                    continue
                vals.append(int(v))
        vals.sort()
        nb += 1
        state.update((nb, vals))
        n = len(vals)
        med2 = (vals[(n - 1) // 2] + vals[n // 2]) if n else None
        yield pd.DataFrame(
            {
                kc: [key[0]],
                "batch_seq": [nb],
                "n_values": [n],
                "median2": [med2],
            }
        )

    return df.groupBy(kc).applyInPandasWithState(
        fold,
        outputStructType=(
            f"{kc} string, batch_seq long, n_values long, median2 long"
        ),
        stateStructType="nb long, vals array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def median_sketch_stream(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key cross-batch BOUNDED-STATE running median (r11, VERDICT
    r10 #6): the 100 TB companion to ``median_stream``, replacing its
    O(values-per-key) sorted multiset with a deterministic log-bucket
    histogram (DDSketch-style, integer-exact) whose state is O(1):

    - bucket(v) for v < 16 is the exact value (singleton buckets);
      for v >= 16 it is the dyadic range keyed by the top 4 bits —
      lo = (v >> (L-4)) << (L-4), hi = lo + 2^(L-4) - 1 with
      L = v.bit_length(). Width <= lo/8, i.e. <= 12.5% relative.
    - the state is {bucket_lo: count} — at most 16 singleton buckets
      plus 8 per magnitude level (<= 8*60 for the full long domain,
      ~500 entries worst case, independent of n). Counts are EXACT, so
      the reported bucket provably CONTAINS the true lower-median
      (rank ceil(n/2)) value — zero rank error at bucket granularity;
      the value error is the bucket width. That is the rank-error
      contract ``tests/test_streaming.py`` verifies against the exact
      ``median_stream`` leg.
    - the fold is a counter merge: order-independent and mergeable
      (unlike KLL/t-digest, whose randomized/centroid compactions are
      arrival-order-dependent and cannot be replayed by a batch SQL
      oracle — determinism is why DD-style buckets were chosen).

    Output rows: (key, batch_seq, n_values, sketch_size, med_lo,
    med_hi) — all integers; ``sketch_size`` is the post-batch state
    entry count, pinned by the state-boundedness test. Values must be
    non-negative (the quantized-cents domain; raises inside the fold
    otherwise, surfacing as a stream error rather than silent wrap).
    """
    kc, vc = key_col, value_col

    def _bucket_lo(v: int) -> int:
        if v < 16:
            return v
        shift = v.bit_length() - 4
        return (v >> shift) << shift

    def fold(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            nb, los, counts = state.get
            hist = dict(zip(los, counts))
        else:
            nb, hist = 0, {}
        for pdf in pdf_iter:
            for v in pdf[vc]:
                if pd.isna(v):
                    continue
                v = int(v)
                if v < 0:
                    raise ValueError(
                        f"median_sketch_stream: negative value {v} — "
                        "log-bucket sketch requires a non-negative domain"
                    )
                lo = _bucket_lo(v)
                hist[lo] = hist.get(lo, 0) + 1
        nb += 1
        items = sorted(hist.items())
        state.update((nb, [lo for lo, _ in items], [c for _, c in items]))
        n = sum(hist.values())
        med_lo = med_hi = None
        if n:
            target = (n + 1) // 2
            cum = 0
            for lo, c in items:
                cum += c
                if cum >= target:
                    med_lo = lo
                    med_hi = (
                        lo if lo < 16
                        else lo + (1 << (lo.bit_length() - 4)) - 1
                    )
                    break
        yield pd.DataFrame(
            {
                kc: [key[0]],
                "batch_seq": [nb],
                "n_values": [n],
                "sketch_size": [len(items)],
                "med_lo": [med_lo],
                "med_hi": [med_hi],
            }
        )

    return df.groupBy(kc).applyInPandasWithState(
        fold,
        outputStructType=(
            f"{kc} string, batch_seq long, n_values long, "
            "sketch_size long, med_lo long, med_hi long"
        ),
        stateStructType="nb long, los array<long>, counts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
