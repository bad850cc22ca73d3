"""Structured Streaming over the analytics ``events`` table.

The job-history streaming module (:mod:`.history_stream`) covers the
reference's log surface; this module covers the star-schema side: the same
windowed/sessionized aggregations the batch registry runs (q10 minute
counts, q36 user sessions) expressed as incremental streaming plans with
event-time watermarks, so late events are handled with bounded state
instead of a full recompute.

Scale notes: each operator is a single stateful aggregation keyed by
(window, dim) — state is one row per open window per key, evicted when the
watermark passes the window end. At 100 TB/day the same plans run against
a Kafka/file source unchanged; the only sizing knobs are the watermark
delay (state horizon) and ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_events_stream(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """File-source stream of events rows (new parquet shards under ``path``).

    Streaming sources need a schema up front; by default it is taken from
    the files already present (a footer-only batch read). Pass ``schema``
    (DDL string) when starting against an empty directory.
    """
    if schema is None:
        sch = spark.read.parquet(path).schema
    else:
        sch = schema
    return spark.readStream.schema(sch).parquet(path)


def event_window_counts_stream(
    events: DataFrame,
    window_duration: str = "1 minute",
    slide: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Windowed per-type event counts with an event-time watermark — the
    incremental form of the batch q10 minute rollup (plus an optional
    sliding window the batch form has no need for).

    Append-mode safe: a (window, event_type) row is emitted exactly once,
    when the watermark passes the window end; events arriving later than
    ``watermark_delay`` past the window are dropped, which is the bounded
    -state contract (batch recompute is the repair path for older data).
    Output: win_start, win_end, event_type, n, total_value.
    """
    win = F.window("ts", window_duration, slide or window_duration)
    # parquet NTZ timestamps are valid event time for batch windows but not
    # for watermarks, which require the LTZ type
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def user_sessions_stream(
    events: DataFrame,
    gap: str = "1 hour",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Per-user activity sessions under an inactivity ``gap`` — the
    streaming form of q36's ``session_window`` aggregation. A session's
    row is finalized (append mode) once the watermark passes its close;
    state is one open session per active user.
    Output: user_id, session_start, session_end, n_events.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per event
    type, exact running totals maintained across micro-batches — the shape
    for any accumulator the built-in windowed aggregations cannot express
    (monotone counters over the whole stream, CUSUM-style drift state,
    per-key model state).

    State per key is three longs (n, sum_cents, max_cents) — integer cents
    so the accumulation is exact and replay-deterministic, never a float
    running sum. Each micro-batch emits the key's updated totals, so the
    sink sees a monotone snapshot series per key (downstream takes the
    latest). State size is O(active keys), independent of stream length.

    Output: event_type, n_total, sum_cents, max_cents.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "event_type string, n_total long, sum_cents long, max_cents long"
    state_schema = "n long, s long, m long"

    def update(key, pdfs, state):
        n, s, m = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            cents = (pdf["value"] * 100).round().astype("int64")
            n += len(pdf)
            s += int(cents.sum())
            m = max(m, int(cents.max()) if len(cents) else 0)
        state.update((n, s, m))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_total": [n], "sum_cents": [s], "max_cents": [m]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def view_purchase_join_stream(
    events: DataFrame,
    max_gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each purchase joined to every view by the
    same user within ``max_gap`` BEFORE it — the streaming attribution
    form of the batch as-of join family (q19).

    Both sides carry event-time watermarks and the join condition bounds
    the event-time range, so Spark can size the state store exactly: a
    view is held for ``max_gap + watermark_delay`` and evicted once no
    future purchase can match it. Without the time-range condition a
    stream-stream join would need unbounded state — this is the canonical
    shape that scales.

    ``how="left_outer"`` additionally emits every UNCONVERTED view
    (purchase columns null) — but only once the watermark proves no
    future purchase can match it, i.e. at state-eviction time. That late
    emission is the fundamental streaming-outer-join semantics: the
    null-extended row is a *negative* claim ("no purchase within the
    gap"), which is only safe after event time has moved past
    ``view_ts + max_gap``.

    Output: user_id, view_id, purchase_id, view_ts, purchase_ts, gap_ms.
    """
    base = events.withColumn("ts", F.col("ts").cast("timestamp"))
    views = (
        base.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark_delay)
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark_delay)
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")),
        how,
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
        F.when(
            F.col("purchase_ts").isNotNull(),
            (F.unix_millis("purchase_ts") - F.unix_millis("view_ts")).cast("long"),
        ).alias("gap_ms"),
    )


def dedup_events_stream(
    events: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup: emit each event_id once, with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one state row per event_id and
    evicts it once the watermark passes the event's time plus the delay —
    the streaming form of the batch q20-style exact dedup. Duplicates
    arriving within ``watermark_delay`` of the original are suppressed;
    anything later is outside the state horizon by contract (batch dedup
    is the repair path, same as the windowed aggregations above). At
    ingest scale this is the front gate that stops replayed/duplicated
    messages from a source (e.g. at-least-once delivery) reaching the
    corpus.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def hll_register_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    p: int = 6,
) -> DataFrame:
    """Windowed distinct-user HLL sketch as a streaming register table:
    (win_start, win_end, event_type, register, max_rho).

    The register MAX is an associative, monotone aggregate, so it
    streams with ordinary bounded state — one row per (window, type,
    register), at most ``2^p`` rows per group-window regardless of event
    volume, evicted when the watermark passes the window end. This is
    the streaming form of the batch q118 sketch: approximate distinct
    counts over unbounded streams with O(2^p) memory per window, where
    exact streaming distinct would hold one state row per *user*.
    Downstream, windows roll up without raw data (same MAX merge —
    operators/sketches.hll_estimate turns any rollup into counts).
    """
    from hadoop_jobanalyzer_spark.operators.sketches import HASH_BITS, portable_hash60

    m = 1 << p
    w_bits = HASH_BITS - p
    h = portable_hash60(F.col("user_id"))
    w = F.shiftright(h, p)
    rho = F.when(w > 0, F.lit(w_bits + 1) - F.length(F.bin(w))).otherwise(
        F.lit(w_bits + 1)
    )
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withColumn("register", (h % m))
        .withColumn("rho", rho.cast("int"))
        .withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_duration).alias("win"), "event_type", "register"
        )
        .agg(F.max("rho").alias("max_rho"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "register",
            "max_rho",
        )
    )


def kmv_stream(events: DataFrame, k: int = 8) -> DataFrame:
    """Streaming KMV distinct-count sketch (``applyInPandasWithState``):
    per event type, the k smallest distinct user-id hashes maintained
    across micro-batches — the custom-state shape for sketches the
    built-in aggregates cannot express (k-th order statistic is not an
    associative builtin the way HLL's MAX is).

    The 60-bit portable hash is computed JVM-side before grouping; the
    pandas hook only merges sorted long arrays, so state per key is at
    most k longs regardless of stream length. Each micro-batch emits the
    key's refreshed sketch row; downstream takes the latest per key
    (n_distinct_hashes is monotone, so "latest" is well-defined without
    timestamps). The emitted estimate matches the batch
    ``operators/sketches.kmv_distinct`` exactly once the stream has
    drained — checked by the differential test.

    Output: event_type, n_updates, kth_min_hash, est_distinct (kth/est
    null until k distinct users were seen; n_updates is the per-key
    micro-batch counter, the monotone latest-row marker).

    Truncation to k is lossless for the sketch: every discarded hash is
    larger than the current k-th minimum, and future arrivals can only
    push that minimum down — a discarded hash can never re-enter the k
    smallest.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    from hadoop_jobanalyzer_spark.operators.sketches import HASH_SPACE, portable_hash60

    out_schema = (
        "event_type string, n_updates long, kth_min_hash long, est_distinct double"
    )
    state_schema = "mins array<long>, n long"
    numer = float((k - 1) * HASH_SPACE)  # exact: tiny significand

    def update(key, pdfs, state):
        mins, n_updates = state.get if state.exists else ([], 0)
        merged = set(mins)
        for pdf in pdfs:
            merged.update(int(h) for h in pdf["_h"])
        kept = sorted(merged)[:k]
        n_updates += 1
        state.update((kept, n_updates))
        kth = kept[k - 1] if len(kept) == k else None
        est = (numer / kth) if kth else None
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_updates": [n_updates],
                "kth_min_hash": [kth],
                "est_distinct": [est],
            }
        )

    hashed = events.select(
        "event_type", portable_hash60(F.col("user_id")).alias("_h")
    )
    return hashed.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def pattern_match_stream(
    events: DataFrame,
    steps: list[str],
    within_ms: int,
) -> DataFrame:
    """Streaming CEP: contiguous sequence pattern matching with bounded
    per-key state — the incremental form of ``operators.cep.pattern_matches``
    (MATCH_RECOGNIZE / Flink-CEP shape, which built-in Structured
    Streaming aggregations cannot express).

    State per user is exactly the last ``len(steps)-1`` events (type,
    epoch-ms, id) — a ring buffer, independent of stream length — carried
    across micro-batches so matches spanning a batch boundary are still
    found. Assumes per-key in-order delivery (the file/Kafka replay
    contract); an out-of-order source needs a watermark re-sort upstream.

    Emits one row per match: (user_id, start_event_id, start_ms), exactly
    the batch operator's output.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    k = len(steps)
    if k < 2:
        raise ValueError("pattern needs at least 2 steps")
    out_schema = "user_id long, start_event_id long, start_ms long"
    state_schema = "tys array<string>, mss array<long>, ids array<long>"

    def update(key, pdfs, state):
        tys, mss, ids = (
            (list(t) for t in state.get) if state.exists else ([], [], [])
        )
        tys, mss, ids = list(tys), list(mss), list(ids)
        hits_id, hits_ms = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            ms_col = pdf["ts"].astype("datetime64[ms]").astype("int64")
            for ty, ms, eid in zip(pdf["event_type"], ms_col, pdf["event_id"]):
                tys.append(str(ty)); mss.append(int(ms)); ids.append(int(eid))
                if len(tys) > k:
                    tys.pop(0); mss.pop(0); ids.pop(0)
                if len(tys) == k and all(t == s for t, s in zip(tys, steps)) and all(
                    mss[i + 1] - mss[i] <= within_ms for i in range(k - 1)
                ):
                    hits_id.append(ids[0]); hits_ms.append(mss[0])
        state.update((tys[-(k - 1):], mss[-(k - 1):], ids[-(k - 1):]))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(hits_id),
                "start_event_id": hits_id,
                "start_ms": hits_ms,
            }
        )

    base = events.select("user_id", "event_id", "ts", "event_type")
    return base.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def space_saving_merge(
    table: dict[str, list[int]], batch: dict[str, int], capacity: int
) -> dict[str, list[int]]:
    """Merge a batch of exact counts into a space-saving counter table
    (``key -> [est, err]``) bounded at ``capacity`` entries, in place.

    Invariants (property-tested in tests/test_sketch_props.py):
    counter mass equals total processed mass, estimates only overcount
    with ``err`` as the per-key bound, and any key whose true count
    exceeds total/capacity is tracked. Eviction picks the
    (count, key)-minimal entry — deterministic under replay — and the
    newcomer inherits the victim's count as its overcount bound
    (Metwally et al. 2005). Batch keys merge in sorted order so the
    result is independent of dict iteration order.
    """
    for item in sorted(batch):
        cnt = batch[item]
        if item in table:
            table[item][0] += cnt
        elif len(table) < capacity:
            table[item] = [cnt, 0]
        else:
            victim = min(table.items(), key=lambda kv: (kv[1][0], kv[0]))
            vcount = victim[1][0]
            del table[victim[0]]
            table[item] = [vcount + cnt, vcount]
    return table


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str = "user_id",
    capacity: int = 64,
    shards: int = 8,
) -> DataFrame:
    """Streaming heavy hitters via the space-saving sketch
    (Metwally et al. 2005): per hash shard, at most ``capacity`` counters
    maintained across micro-batches — the bounded-state answer to "which
    keys dominate the stream?" when the key domain is unbounded.

    Distribution shape: keys hash-partition into ``shards`` independent
    sketches (the md5-mod used by the batch samplers, so shard membership
    is engine-portable and replay-stable); each shard's state is three
    parallel arrays of length <= capacity.  Memory is
    O(shards * capacity) FOREVER — stream length and key cardinality
    never grow it.  The space-saving guarantee holds per shard: any key
    with true count > shard_total/capacity is tracked, estimates only
    overcount, and ``err`` bounds the overcount per key
    (est - err <= true <= est).  Eviction ties break by (count, key) so
    replays are deterministic.

    Each micro-batch emits the shard's full refreshed snapshot with a
    monotone ``n_seen`` marker; downstream keeps each shard's
    max-``n_seen`` rows (evicted keys' older rows are superseded).

    Output: shard, n_seen, key, est, err.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "shard long, n_seen long, key string, est long, err long"
    state_schema = "keys array<string>, counts array<long>, errs array<long>, n long"

    def update(key, pdfs, state):
        keys, counts, errs, n_seen = (
            state.get if state.exists else ([], [], [], 0)
        )
        table = {k: [c, e] for k, c, e in zip(keys, counts, errs)}
        for pdf in pdfs:
            n_seen += len(pdf)
            batch = {
                str(item): int(cnt)
                for item, cnt in pdf["_k"].value_counts().sort_index().items()
            }
            space_saving_merge(table, batch, capacity)
        items = sorted(table.items())
        state.update(
            (
                [k for k, _ in items],
                [v[0] for _, v in items],
                [v[1] for _, v in items],
                n_seen,
            )
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "n_seen": [n_seen] * len(items),
                "key": [k for k, _ in items],
                "est": [v[0] for _, v in items],
                "err": [v[1] for _, v in items],
            }
        )

    from hadoop_jobanalyzer_spark.operators.sampling import hash_bucket

    keyed = events.select(
        F.col(key_col).cast("string").alias("_k"),
        hash_bucket(F.col(key_col), shards).alias("_shard"),
    )
    return keyed.groupBy("_shard").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def zscore_anomaly_stream(
    events: DataFrame,
    z2_threshold: int = 9,
    min_history: int = 30,
) -> DataFrame:
    """Online anomaly detection (``applyInPandasWithState``): each event's
    value is tested against the RUNNING moments of everything that
    arrived before it for its event type — the prefix z-score, flagged
    when ``z^2 > z2_threshold`` (default |z| > 3) once at least
    ``min_history`` prior points exist.

    State per key is three exact integers (n, sum_cents, sumsq_cents), so
    replay is bit-deterministic and the test is the cross-multiplied
    integer form ``dev^2 * n > z2 * (n*Q - S^2)`` with
    ``dev = c*n - S`` — no float accumulation anywhere, which is what
    makes the stream's flags EQUAL the batch prefix-window computation
    (the differential test) instead of merely close.  Arrival order
    within a micro-batch follows (ts, event_id), matching the batch
    window's ordering.

    Output: event_type, event_id, cents, n_before, dev_num, var_num,
    is_anomaly — one row per anomalous event (append mode).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "event_type string, event_id long, cents long, n_before long, "
        "dev_num long, var_num long, is_anomaly boolean"
    )
    state_schema = "n long, s long, q long"

    def update(key, pdfs, state):
        n, s, q = state.get if state.exists else (0, 0, 0)
        out = {k: [] for k in ("event_id", "cents", "n_before", "dev_num", "var_num")}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                import math

                c = int(math.floor(val * 100))
                if n >= min_history:
                    dev = c * n - s
                    var_num = n * q - s * s
                    if var_num > 0 and dev * dev * n > z2_threshold * var_num:
                        out["event_id"].append(int(eid))
                        out["cents"].append(c)
                        out["n_before"].append(n)
                        out["dev_num"].append(dev)
                        out["var_num"].append(var_num)
                n, s, q = n + 1, s + c, q + c * c
        state.update((n, s, q))
        k = len(out["event_id"])
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * k,
                **out,
                "is_anomaly": [True] * k,
            }
        )

    base = events.select("event_type", "event_id", "ts", "value")
    return base.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def scd2_enrich_stream(events: DataFrame, scd2_dim: DataFrame) -> DataFrame:
    """Stream-static point-in-interval enrichment: every streaming event
    joins the type-2 dimension row whose `[valid_from, valid_to)`
    interval covers its event time — the streaming consumer of the SCD2
    dimension q138 builds (q174 is the batch form).

    Stream-static joins need no watermark and hold NO state: the static
    side is re-planned per micro-batch, so a dimension refresh between
    batches is picked up automatically (the lambda-free way to serve
    slowly-changing lookups to a live stream).  The equi-key rides the
    join so Spark plans a hash join with the range residual — never a
    nested loop; events outside every interval pass through
    null-extended (left join), which the caller can route to a
    quarantine sink.

    ``scd2_dim`` columns: (user_id, state, valid_from, valid_to).
    Output: event columns + (state, valid_from).
    """
    dim = scd2_dim.select(
        F.col("user_id").alias("d_user"),
        "state",
        "valid_from",
        "valid_to",
    )
    return events.join(
        dim,
        (events["user_id"] == dim["d_user"])
        & (events["ts"] >= dim["valid_from"])
        & (events["ts"] < dim["valid_to"]),
        "left",
    ).drop("d_user", "valid_to")
