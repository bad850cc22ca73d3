"""BPE merge learning: differential against an independent pure-Python
reference implementation of the classic algorithm (Sennrich et al. 2016)."""

from collections import Counter

from hadoop_jobanalyzer_spark.operators.bpe import EOW, bpe_segment, learn_bpe


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Pure-Python classic BPE over a weighted vocabulary."""
    vocab = {tuple(list(w) + [EOW]): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # max count, ties lexicographic — the operator's contract
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_learn_bpe_matches_reference(spark):
    """The Sennrich example corpus: low/lower/newest/widest with weights."""
    word_counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(" ".join([w] * n) for w, n in word_counts.items())
    df = spark.createDataFrame([(text,)], ["text"])
    got = learn_bpe(df, "text", n_merges=8)
    want = _reference_bpe(word_counts, 8)
    assert got == want
    # the famous first merges: ('e','s') then ('es','t')
    assert got[0][:2] == ("e", "s") and got[1][:2] == ("es", "t")


def test_learn_bpe_repeated_symbol_greedy(spark):
    """aaaa with merge (a,a) must tile greedily: 4 a's -> 2 aa's. The
    second round ties (aa,aa)=3 with (aa,</w>)=3 and lexicographic
    tie-break picks (aa,</w>) — both implementations must agree."""
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], ["text"])
    got = learn_bpe(df, "text", n_merges=2)
    want = _reference_bpe({"aaaa": 3}, 2)
    assert got == want
    assert got[0][:2] == ("a", "a") and got[1][:2] == ("aa", EOW)


def test_bpe_segment_applies_merges(spark):
    word_counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(" ".join([w] * n) for w, n in word_counts.items())
    corpus = spark.createDataFrame([(text,)], ["text"])
    merges = learn_bpe(corpus, "text", n_merges=6)
    seg = bpe_segment(
        spark.createDataFrame([(1, "lowest low")], ["doc_id", "text"]),
        "text",
        merges,
    ).collect()[0]["pieces"]
    # replay the same merges in the reference to get expected pieces
    def apply_ref(word):
        syms = list(word) + [EOW]
        for a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms
    assert list(seg) == apply_ref("lowest") + apply_ref("low")


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_learn_bpe_matches_reference_random(spark, words):
    """Random tiny corpora over a 3-letter alphabet: merge tables must
    match the pure-Python reference exactly, ties and all."""
    counts = Counter(words)
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], ["text"])
    assert learn_bpe(df, "text", n_merges=4) == _reference_bpe(dict(counts), 4)


def test_bpe_segment_ignores_extra_spaces(spark):
    merges = [("l", "o", 2), ("lo", "w", 2)]
    seg = bpe_segment(
        spark.createDataFrame([(1, "  low   low ")], ["doc_id", "text"]),
        "text",
        merges,
    ).collect()[0]["pieces"]
    assert list(seg) == ["low", EOW, "low", EOW]
