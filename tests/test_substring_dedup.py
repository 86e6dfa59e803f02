"""Exact substring dedup (suffix-array family, Lee et al. 2022) vs a
brute-force Python oracle, plus planted-scenario span semantics.

The operator's claim: `substring_dup_spans` reproduces exactly the maximal
token spans a corpus-wide suffix array would flag as duplicated-at-length-k.
The oracle here IS that definition, computed naively (count every k-gram,
mark non-unique positions, merge touching coverage intervals)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from beacon_indexer_spark.operators import dedup as D


def _brute_spans(rows, k, min_occ=2):
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in rows}
    cnt = Counter()
    for t in toks.values():
        for p in range(len(t) - k + 1):
            cnt[tuple(t[p : p + k])] += 1
    out = {}
    for i, t in toks.items():
        marked = [
            p
            for p in range(len(t) - k + 1)
            if cnt[tuple(t[p : p + k])] >= min_occ
        ]
        spans = []
        for p in marked:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        if spans:
            out[i] = [tuple(s) for s in spans]
    return out


def _spark_spans(spark, rows, k):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {}
    for r in D.substring_dup_spans(df, "doc_id", "text", k=k).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    return {i: sorted(s) for i, s in got.items()}


def test_planted_spans(spark):
    rows = [
        (1, "a b c d e f g h i j unique tail one"),
        (2, "x y a b c d e f g h i j z w q"),
        (3, "completely different words here entirely novel stream"),
        (4, "rep rep rep rep rep rep rep rep rep rep"),
        (5, "short doc"),
    ]
    assert _spark_spans(spark, rows, 5) == _brute_spans(rows, 5)


def test_two_islands_in_one_doc(spark):
    """Two copied passages separated by unique text stay two spans; the
    merge rule (gap > k breaks) must not bridge them."""
    common1 = "alpha beta gamma delta epsilon"
    common2 = "one two three four five"
    rows = [
        (1, f"{common1} u1 u2 u3 u4 u5 u6 u7 {common2}"),
        (2, f"z1 z2 {common1} z3 z4"),
        (3, f"{common2} y1 y2 y3"),
    ]
    spans = _spark_spans(spark, rows, 5)
    assert spans == _brute_spans(rows, 5)
    assert len(spans[1]) == 2  # two disjoint islands


def test_dup_rate_coverage(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),
        (3, "totally fresh text with no duplicate run at all ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.doc_tokens, r.dup_tokens, r.dup_rate)
        for r in D.substring_dup_rate(df, "doc_id", "text", k=8).collect()
    }
    assert out[1] == (8, 8, 1.0)
    assert out[2] == (8, 8, 1.0)
    assert out[3][1] == 0 and out[3][2] == 0.0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("a b c d".split()), min_size=0, max_size=24
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_fuzz_matches_bruteforce(spark, token_lists, k):
    """Tiny-vocabulary fuzz: random corpora maximize overlapping and
    repeated k-grams, the regime where interval merging has edge cases."""
    rows = [(i, " ".join(t)) for i, t in enumerate(token_lists)]
    assert _spark_spans(spark, rows, k) == _brute_spans(rows, k)


def _brute_contamination(train_rows, test_rows, k):
    ttoks = [
        [t for t in txt.lower().split() if t] for _, txt in test_rows
    ]
    tegrams = {
        tuple(t[p : p + k])
        for t in ttoks
        for p in range(len(t) - k + 1)
    }
    out = {}
    for i, txt in train_rows:
        t = [x for x in txt.lower().split() if x]
        marked = [
            p
            for p in range(len(t) - k + 1)
            if tuple(t[p : p + k]) in tegrams
        ]
        spans = []
        for p in marked:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        if spans:
            out[i] = [tuple(s) for s in spans]
    return out


def test_decontamination_spans_and_strip(spark):
    test_rows = [(900, "the quick brown fox jumps over the lazy dog")]
    train_rows = [
        (1, "intro words then the quick brown fox jumps over the lazy"
            " dog and more text follows here"),
        (2, "no contamination in this document at all whatsoever today"),
    ]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    test = spark.createDataFrame(test_rows, ["doc_id", "text"])
    spans = D.cross_corpus_contamination_spans(
        train, test, "doc_id", "text", k=5
    )
    got = {
        r.doc_id: [(r.span_start, r.span_end)] for r in spans.collect()
    }
    assert got == {k: v for k, v in _brute_contamination(
        train_rows, test_rows, 5
    ).items()}

    out = {r.doc_id: r for r in D.strip_spans(
        train, spans, "doc_id", "text"
    ).collect()}
    assert out[1].clean_text == "intro words then and more text follows here"
    assert (out[1].orig_tokens, out[1].kept_tokens) == (17, 8)
    # untouched doc passes through (normalized join, same token stream)
    assert out[2].clean_text == train_rows[1][1]
    assert out[2].orig_tokens == out[2].kept_tokens == 9
    # removal accounting: kept = orig - covered
    covered = sum(
        r.n_tokens for r in spans.collect() if r.doc_id == 1
    )
    assert out[1].kept_tokens == out[1].orig_tokens - covered


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("a b c".split()), min_size=0, max_size=20),
        min_size=1,
        max_size=5,
    ),
    st.lists(
        st.lists(st.sampled_from("a b c".split()), min_size=0, max_size=12),
        min_size=1,
        max_size=3,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_fuzz_contamination_matches_bruteforce(spark, train_t, test_t, k):
    train_rows = [(i, " ".join(t)) for i, t in enumerate(train_t)]
    test_rows = [(100 + i, " ".join(t)) for i, t in enumerate(test_t)]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    test = spark.createDataFrame(test_rows, ["doc_id", "text"])
    got = {}
    for r in D.cross_corpus_contamination_spans(
        train, test, "doc_id", "text", k=k
    ).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    got = {i: sorted(v) for i, v in got.items()}
    assert got == _brute_contamination(train_rows, test_rows, k)


def test_keep_first_policy_spares_first_occurrence(spark):
    """Two identical docs: the lower (doc_id, pos) copy is the keeper —
    only doc 2's span is flagged; within-doc repeats keep their first
    window too."""
    rows = [
        (1, "a b c d e f g h one ending"),
        (2, "a b c d e f g h two ending"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in D.substring_dup_spans_keep_first(
            df, "doc_id", "text", k=8
        ).collect()
    }
    assert spans == {2: (0, 7)}  # pos 0 only: grams at 1,2 differ (one/two)
    # the remove-all variant flags BOTH
    both = {
        r.doc_id
        for r in D.substring_dup_spans(df, "doc_id", "text", k=8).collect()
    }
    assert both == {1, 2}
    # strip with keep-first: doc 1 intact, doc 2 loses the span
    out = {
        r.doc_id: r
        for r in D.strip_spans(
            df,
            D.substring_dup_spans_keep_first(df, "doc_id", "text", k=8),
            "doc_id",
            "text",
        ).collect()
    }
    assert out[1].kept_tokens == 10
    assert out[2].kept_tokens == 2 and out[2].clean_text == "two ending"
