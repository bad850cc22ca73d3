"""Byte-pair-encoding merge learning, Spark-shaped.

Classic BPE (Sennrich et al. 2016, public algorithm): start from
characters (plus an end-of-word marker), repeatedly merge the most
frequent adjacent symbol pair. The scale structure matters more than the
loop body: the corpus is aggregated ONCE into a (word, count) vocabulary
table — at 100 TB that is the only corpus-sized pass — and every merge
iteration runs over the vocabulary (10^5-10^6 rows), exploding adjacent
pairs, weighted-counting them (map-side partial), and rewriting the
symbol arrays of the words that contain the winning pair. The per-round
driver action fetches exactly one row (the argmax pair) — the same
barrier any iterative distributed algorithm pays (see operators/graph.py).

Ties on pair frequency break lexicographically so learned merge tables
are deterministic and engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def _merge_pair(symbols, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b within a
    symbol array — the per-word BPE rewrite. A fold with a (result,
    skip-next) accumulator; runs over vocabulary rows only, never the
    corpus."""
    merged = F.lit(a + b)
    # aggregate(): acc is the output array; merging replaces the
    # just-appended 'a' with 'ab' when the next raw symbol is 'b'. A merge
    # result can never re-merge within the same pass: as the left element
    # it is 'ab' != 'a' (b is non-empty), and the right element is always
    # a raw input symbol — so this is exactly the greedy left-to-right
    # non-overlapping merge classic BPE specifies.
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a corpus; returns
    [(left, right, weighted_count), ...] in merge order.

    One corpus pass builds the weighted vocabulary; each merge iterates
    over the vocabulary only. The vocab table is localCheckpoint-ed per
    round to truncate the growing transform lineage.
    """
    spark = df.sparkSession
    vocab = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit(EOW))
            ).alias("syms"),
            "n",
        )
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((a, b, int(cnt)))
        vocab = vocab.select(_merge_pair(F.col("syms"), a, b).alias("syms"), "n")
        vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_segment(df: DataFrame, text_col: str, merges: list[tuple[str, str, int]], out_col: str = "pieces") -> DataFrame:
    """Apply a learned merge table to a corpus: per word, start from
    characters and replay the merges in order. Corpus-sized but one pass;
    each merge is an in-row fold over the word's symbol array."""
    words = df.select(
        "*", F.split(F.col(text_col), " ").alias("_ws")
    )
    piece = F.transform(
        F.col("_ws"),
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW))),
    )
    out = words.withColumn("_pieces", piece)
    for a, b, _ in merges:
        out = out.withColumn(
            "_pieces",
            F.transform(F.col("_pieces"), lambda syms: _merge_pair(syms, a, b)),
        )
    return out.select(
        *[c for c in df.columns], F.flatten(F.col("_pieces")).alias(out_col)
    )
