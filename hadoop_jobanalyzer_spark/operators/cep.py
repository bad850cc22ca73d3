"""Complex-event-processing: contiguous sequence pattern matching.

The MATCH_RECOGNIZE shape (Flink CEP / Trino MATCH_RECOGNIZE — Spark has
no built-in) expressed with window ``lead``s: a k-step pattern over a
per-key time-ordered stream becomes k-1 leads over ONE per-key window
shuffle — no self-joins, no sequence collect. Strict contiguity semantics
(every stream event counts, like MATCH_RECOGNIZE's default) and a
per-hop time bound.

Match rows are the pattern's START events, so overlapping matches are all
reported (MATCH_RECOGNIZE ``AFTER MATCH SKIP TO NEXT ROW``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.util import epoch_ms


def pattern_matches(
    events: DataFrame,
    steps: list[str],
    within_ms: int,
    key: str = "user_id",
    ts: str = "ts",
    typ: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """All starts of the contiguous ``steps`` sequence per key.

    A match is k consecutive events (in (ts, tiebreak) order, nothing in
    between) whose types equal ``steps`` in order, with every hop at most
    ``within_ms`` apart. Returns (key, start_<tiebreak>, start_ms): one
    row per match start.

    Scale: one window shuffle on ``key``; the k-1 leads are evaluated in
    the same sort pass, and the filter collapses before anything else
    moves.
    """
    if len(steps) < 2:
        raise ValueError("pattern needs at least 2 steps")
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    df = events.select(
        key, tiebreak, ts, typ, epoch_ms(ts).alias("_ms0")
    )
    cond = F.col(typ) == steps[0]
    for i, step in enumerate(steps[1:], start=1):
        df = df.withColumn(f"_ty{i}", F.lead(typ, i).over(w)).withColumn(
            f"_ms{i}", F.lead("_ms0", i).over(w)
        )
        cond = (
            cond
            & (F.col(f"_ty{i}") == step)
            & ((F.col(f"_ms{i}") - F.col(f"_ms{i - 1}")) <= within_ms)
        )
    return df.filter(cond).select(
        key,
        F.col(tiebreak).alias(f"start_{tiebreak}"),
        F.col("_ms0").alias("start_ms"),
    )


def pattern_match_counts(
    events: DataFrame,
    steps: list[str],
    within_ms: int,
    key: str = "user_id",
) -> DataFrame:
    """Per-key match counts for keys with at least one match."""
    return (
        pattern_matches(events, steps, within_ms, key=key)
        .groupBy(key)
        .agg(F.count("*").alias("n_matches"))
    )
