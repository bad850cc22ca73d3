"""Text-analysis column expressions for the training-data-pipeline layer.

All pure Catalyst expressions over array columns — no explode in the hot
path (per-document state stays in-row, so these scale linearly with corpus
size and shuffle nothing until an aggregation asks for it), and no Python
UDFs. Each has a matching ANSI-SQL restatement in
``plans/pipeline_queries.py`` used for differential testing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pseudo language-marker sets over the synthetic corpus vocabulary. Real
# deployments swap these for per-language stopword lists; the engine-side
# mechanics (set intersection scoring + deterministic argmax) are identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a"],
    "es": ["value", "table"],
    "de": ["row", "column"],
    "fr": ["data", "query"],
    "zh": ["spark", "batch"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (corpus is single-space normalized)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def token_count(words: Column) -> Column:
    return F.size(words)


def distinct_token_count(words: Column) -> Column:
    return F.size(F.array_distinct(words))


def avg_token_len(words: Column) -> Column:
    """Mean token length as double (sum of int lengths / count — exact
    operands, so cross-engine deterministic before rounding)."""
    total = F.aggregate(
        F.transform(words, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.size(words)


def stopword_ratio(words: Column, stopwords: list[str]) -> Column:
    hits = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return hits.cast("double") / F.size(words)


def lang_scores(words: Column) -> dict[str, Column]:
    """Marker-set intersection size per language (distinct matches)."""
    return {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(words: Column) -> Column:
    """Deterministic argmax over marker scores; ties resolve in LANG_MARKERS
    order (a fixed CASE chain — mirrors the SQL oracle exactly)."""
    scores = lang_scores(words)
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def bow_fingerprint(words: Column) -> Column:
    """Bag-of-words document fingerprint: md5 over the sorted distinct token
    set — an order-insensitive dedup key (word-soup analog of the
    reference's exact-value keying)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words))))


def _ngrams(words: Column, n: int) -> Column:
    """Positional word n-grams by zipping n shifted slices of the token
    array — n-1 linear zip passes instead of an index transform doing n
    ``element_at`` probes per position (measured 3x faster at sf0.1; both
    forms are interpreted lambdas, the zip form just does far fewer
    evaluations). Docs shorter than n yield an empty array."""
    length = F.greatest(F.size(words) - (n - 1), F.lit(0))
    out = F.slice(words, 1, length)
    for i in range(1, n):
        out = F.zip_with(
            out, F.slice(words, i + 1, length), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def shingles(words: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (distinct)."""
    return F.array_distinct(_ngrams(words, n))


def shingles_seq(words: Column, n: int = 3) -> Column:
    """Word n-gram shingles in positional order (NOT deduped — winnowing
    needs the positional hash sequence)."""
    return _ngrams(words, n)


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str, ngram: int = 3, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme over word shingles):
    hash every positional shingle, slide a ``window`` over the hash
    sequence, keep the distinct per-window minima. Guarantees any shared
    run of ``window + ngram - 1`` words produces a shared fingerprint —
    the rolling-hash fingerprint family for plagiarism/near-dup detection.

    Plan shape: posexplode the positional shingles (ONE md5 per shingle,
    codegen), then a sliding ``min(...) rowsBetween(0, window-1)`` window
    partitioned by doc — never an in-row slice-per-window expression, which
    Catalyst would inline into O(windows) recomputations of the whole hash
    array. Short docs (fewer than ``window`` shingles but at least one)
    contribute their single minimum; docs without shingles contribute
    nothing. Output: one distinct row per (id, fp).
    """
    from pyspark.sql.window import Window

    from hadoop_jobanalyzer_spark.util import spread

    hashed = spread(df).select(
        F.col(id_col),
        F.posexplode(shingles_seq(tokens(text_col), ngram)).alias("_pos", "_sh"),
    ).select(
        F.col(id_col),
        F.col("_pos"),
        F.conv(F.substring(F.md5("_sh"), 1, 8), 16, 10).cast("long").alias("_h"),
    )
    slide = Window.partitionBy(id_col).orderBy("_pos").rowsBetween(0, window - 1)
    whole = Window.partitionBy(id_col)
    return (
        hashed.select(
            F.col(id_col),
            F.col("_pos"),
            F.min("_h").over(slide).alias("fp"),
            F.count("*").over(whole).alias("_n"),
        )
        # valid window starts: 1..n-window+1 (0-based: 0..n-window); a doc
        # shorter than the window keeps only pos 0 = min of everything
        .filter(F.col("_pos") <= F.greatest(F.col("_n") - window, F.lit(0)))
        .select(F.col(id_col), "fp")
        .distinct()
    )


def token_hashes(words: Column) -> Column:
    """32-bit integer hash per token (md5-prefix — identical in any engine
    with md5, unlike engine-native hash functions)."""
    return F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
    )


def simhash32(words: Column) -> Column:
    """32-bit SimHash over distinct tokens: per bit, majority vote of token
    hash bits (+1/-1), bit set when the vote is non-negative.

    In-row form (one expression per doc). The 32 ``aggregate`` lambdas are
    interpreted per element — fine for ad-hoc use on small frames; the
    corpus-scale path is :func:`simhash_table` (explode + codegen bit math +
    partial hash-agg), which produces identical values.
    """
    th = token_hashes(F.array_distinct(words))

    # factory, not default-arg capture: pyspark infers lambda arity, so the
    # merge lambda must take exactly (acc, v)
    def bit_vote(k: int):
        return lambda acc, v: acc + F.when(
            F.shiftright(v, k).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for k in range(32):
        vote = F.aggregate(th, F.lit(0).cast("long"), bit_vote(k))
        out = out + F.when(vote >= 0, F.lit(2**k).cast("long")).otherwise(F.lit(0))
    return out


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) for every doc — the corpus-scale SimHash plan.

    Distinct tokens explode once; each token gets ONE md5-derived 32-bit
    hash; the 32 bit-votes are whole-stage-codegen integer expressions
    aggregated map-side (sum of +/-1 per bit), so the only shuffle carries
    (id, 32 x long partial sums). Value-identical to :func:`simhash32`.
    """
    from hadoop_jobanalyzer_spark.util import spread

    hashed = spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("_w"),
    ).select(
        F.col(id_col),
        F.conv(F.substring(F.md5("_w"), 1, 8), 16, 10).cast("long").alias("_h"),
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{k}")
        for k in range(32)
    ]
    bits = [
        F.when(F.col(f"_v{k}") >= 0, F.lit(2**k).cast("long")).otherwise(F.lit(0))
        for k in range(32)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return hashed.groupBy(id_col).agg(*votes).select(F.col(id_col), total.alias("simhash"))


# PII scrubbing (training-data hygiene). The synthetic corpus has no PII,
# so these are exercised by unit tests with planted values rather than a
# registry query — the expressions are ordinary codegen regexps and run
# unchanged over a real corpus.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?\d[\d(). -]{7,}\d",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts (email/url/phone)."""
    text = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.regexp_count(text, F.lit(pat)) for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column | str) -> Column:
    """Replace each PII match with a typed placeholder (<EMAIL>/<URL>/
    <PHONE>). Order matters: emails first (their local part would otherwise
    survive a phone-ish digit run), then URLs, then phones."""
    text = F.col(text) if isinstance(text, str) else text
    out = text
    for kind in ("email", "url", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def normalize_text(text: Column | str) -> Column:
    """Canonical form for normalization-based exact dedup: lowercase,
    strip every character outside [a-z0-9 ], collapse whitespace runs,
    trim. Catches the near-exact duplicates raw-hash dedup misses
    (casing, punctuation, spacing variants) while staying pure codegen —
    the standard first pass before MinHash in a cleaning pipeline.
    Character-class-only regexes so the Java and RE2-family engines agree.
    """
    text = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(F.lower(text), "[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(out, " +", " "))


def cdc_boundaries(text_col: str, window: int = 8) -> Column:
    """Content-defined chunk boundary positions (the FastCDC/rolling-hash
    family, public: Muthitacharoen et al. LBFS SOSP'01): a position is a
    boundary when its LAST character's codepoint is ≡0 (mod 4) AND the
    trailing ``window``-char md5 starts with hex '0'. Boundaries depend
    only on LOCAL window content (the gate reads the window's own last
    char, never an absolute offset), so an insertion early in a document
    shifts at most one chunk — unlike fixed-width spans, where every
    later span changes — which is what makes chunk-hash dedup robust to
    edits.

    The cheap codepoint gate is the FastCDC-style fast path: AND
    short-circuits, so md5 runs on only ~1/3 of positions (measured
    p(ascii%4==0)≈0.35 on English-like text) instead of every one —
    the md5-per-position constant was this operator's dominant cost.
    Expected chunk length ≈ 16/p ≈ 45 chars. Pure in-row lambda
    expression; compute this into its own column, then derive chunks
    with ``cdc_chunks_from`` — keeping the hash scan in one place
    instead of re-evaluating it per consumer.
    """
    w = window
    return F.expr(
        f"""
        CASE WHEN length({text_col}) < {w} THEN cast(array() as array<int>)
             ELSE filter(sequence({w}, length({text_col})),
                         i -> ascii(substring({text_col}, i, 1)) % 4 = 0
                              AND substring(md5(substring({text_col}, i - {w - 1}, {w})), 1, 1) = '0')
        END
        """
    )


def cdc_chunks_from(text_col: str, bpos_col: str) -> Column:
    """Chunk substrings from precomputed boundary positions: chunk k runs
    from (previous boundary + 1) to the next boundary (the final chunk
    ends at the document end). Engine-portable — any engine applying the
    same boundary rule produces identical chunk arrays."""
    return F.expr(
        f"""
        zip_with(
          concat(array(1), transform({bpos_col}, p -> p + 1)),
          concat({bpos_col}, array(length({text_col}))),
          (s, e) -> substring({text_col}, s, e - s + 1))
        """
    )
