"""Edge cases for the text-pipeline additions (chunking, repetition,
surprisal, quality filter) that the uniform testdata never hits: empty
documents, single-token documents, exact chunk boundaries, and the
first-failing-rule ordering of the composite filter."""

import math

from pyspark.sql import functions as F

from pythonvectordb_spark.operators.curation import quality_filter
from pythonvectordb_spark.operators.textops import (
    chunk_documents,
    repetition_stats,
    unigram_surprisal,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _chunks(spark, text, chunk=4, overlap=1):
    df = chunk_documents(_docs(spark, [(1, text)]), chunk_tokens=chunk, overlap=overlap)
    return [(r.chunk_idx, r.chunk_text, r.n_chunk_tokens) for r in
            df.orderBy("chunk_idx").collect()]


def test_chunk_boundaries(spark):
    # empty -> no chunks; short doc -> one short chunk
    assert _chunks(spark, "") == []
    assert _chunks(spark, "a b") == [(0, "a b", 2)]
    # exactly one chunk size -> exactly one chunk (no pure-suffix trailer)
    assert _chunks(spark, "a b c d") == [(0, "a b c d", 4)]
    # one past the boundary -> second chunk starts at step=3 (1 overlap)
    assert _chunks(spark, "a b c d e") == [(0, "a b c d", 4), (1, "d e", 2)]


def test_chunk_overlap_coverage(spark):
    # consecutive chunks share exactly `overlap` tokens, and stripping the
    # overlap from every chunk after the first reconstructs the document
    toks = [f"t{i}" for i in range(11)]
    got = _chunks(spark, " ".join(toks), chunk=4, overlap=2)
    rebuilt = got[0][1].split(" ")
    for _, text, _ in got[1:]:
        ts = text.split(" ")
        assert rebuilt[-2:] == ts[:2]  # shared overlap
        rebuilt += ts[2:]
    assert rebuilt == toks


def test_chunk_rejects_bad_overlap(spark):
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=4, overlap=4)


def test_repetition_stats_known_values(spark):
    rows = repetition_stats(
        _docs(spark, [(1, "a a a b"), (2, "x y"), (3, "w")])
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    r1 = by_id[1]  # 4 tokens, 2 distinct; top token 'a' x3; bigram 'a a' x2 of 3
    assert r1.n_tokens == 4
    assert r1.dup_token_frac == 0.5
    assert r1.top_token_share == 0.75
    assert abs(r1.top_bigram_share - 2 / 3) < 1e-9
    r2 = by_id[2]  # all unique; single bigram
    assert r2.dup_token_frac == 0.0 and r2.top_bigram_share == 1.0
    r3 = by_id[3]  # single token -> no bigrams -> share 0 via the guard
    assert r3.top_bigram_share == 0.0


def test_unigram_surprisal_hand_computed(spark):
    # corpus: a x3, b x1 -> p(a)=3/4, p(b)=1/4
    df = unigram_surprisal(_docs(spark, [(1, "a a b"), (2, "a")]))
    by_id = {r.doc_id: r for r in df.collect()}
    ln43, ln4 = math.log(4 / 3), math.log(4)
    assert abs(by_id[1].avg_surprisal - round((2 * ln43 + ln4) / 3, 9)) < 1e-9
    assert abs(by_id[1].max_surprisal - round(ln4, 9)) < 1e-9
    assert abs(by_id[2].avg_surprisal - round(ln43, 9)) < 1e-9


def test_quality_filter_first_failing_rule(spark):
    long_diverse = " ".join(f"w{i}" for i in range(20))
    rows = quality_filter(
        _docs(
            spark,
            [
                (1, "a b"),                          # short (2 < 10 tokens)
                (2, "a a a a a a a a a a a a"),      # low_diversity fires before
                                                     # repetitive (rule order)
                (3, " ".join(["the"] * 6 + [f"u{i}" for i in range(6)])),
                (4, long_diverse),                   # passes everything
            ],
        ),
        max_stopword_ratio=0.4,
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].reject_reason == "short" and not by_id[1].keep
    assert by_id[2].reject_reason == "low_diversity"
    assert by_id[3].reject_reason == "stopword_soup"  # ttr 0.58 passes, stop 0.5 > 0.4
    assert by_id[4].reject_reason == "ok" and by_id[4].keep


def test_quality_filter_no_shuffle(spark):
    # single-pass contract: the plan must not contain an Exchange
    df = quality_filter(_docs(spark, [(1, "a b c")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunker_no_shuffle(spark):
    # explode-only contract: fan-out without any Exchange in the plan
    df = chunk_documents(_docs(spark, [(1, "a b c d e f")]), chunk_tokens=4, overlap=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate explode" in plan


def test_pack_sequences_invariants(spark):
    from pythonvectordb_spark.operators.textops import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(3 + (i * 7) % 11))) for i in range(40)]
    rows.append((100, ""))  # empty doc: no tokens, must be dropped
    out = pack_sequences(_docs(spark, rows), seq_len=16).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == sorted(r.doc_id for r in out)
    assert all(r.doc_id != 100 for r in out)
    # reconstruct the global stream: each doc's slot starts where the
    # previous ended; seq ids derive from the running total
    cum = 0
    for r in out:
        assert r.seq_first == cum // 16
        assert r.seq_last == (cum + r.n_tok - 1) // 16
        assert r.spans_boundary == (r.seq_first != r.seq_last)
        cum += r.n_tok


def test_pack_sequences_no_global_window(spark):
    # the full-data cumsum must run under a partitioned window (keyed on
    # the range-partition id), never a partitionBy()-empty global window;
    # only the P-row offsets aggregate may be single-partition
    from pythonvectordb_spark.operators.textops import pack_sequences

    df = pack_sequences(_docs(spark, [(1, "a b"), (2, "c")]), seq_len=4)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    for line in analyzed.splitlines():
        if "windowspecdefinition" in line and "_pid" not in line:
            raise AssertionError(f"unpartitioned window over data: {line}")


def test_duplicate_spans_islands_and_cross_doc(spark):
    """ExactSubstr-shape span detection: only >= window-token runs shared
    ACROSS documents count; overlapping duplicate windows merge into one
    maximal span; disjoint shared runs stay separate islands; docs
    shorter than the window never emit."""
    from pythonvectordb_spark.operators.textops import duplicate_spans

    shared1 = "a b c d e f g h"          # 8 tokens, shared by A and B
    shared2 = "p q r s t u v w x"        # 9 tokens -> 2 windows, A and C
    docs = [
        (1, f"x {shared1} mid1 mid2 mid3 {shared2} tail1"),   # A: both spans
        (2, f"y {shared1} completely other ending here"),      # B: span 1
        (3, f"z zz {shared2} another distinct finish"),        # C: span 2
        (4, shared1),                                          # exactly 8 toks
        (5, "a b c d e f g"),                                  # 7 toks: short
        (6, "nothing in common with anything else at all ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.start_tok, r.end_tok, r.span_tokens, r.n_windows)
        for r in duplicate_spans(df, window=8).collect()
    }
    # A: tokens = x a..h mid1 mid2 mid3 p..x tail1 -> shared1 at pos 1..8,
    # shared2 at pos 12..20 (9 tokens -> windows at 12 and 13)
    assert (1, 1, 9, 8, 1) in got
    assert (1, 12, 21, 9, 2) in got
    assert (2, 1, 9, 8, 1) in got
    assert (3, 2, 11, 9, 2) in got
    assert (4, 0, 8, 8, 1) in got          # whole-doc span, exactly window
    assert not any(r[0] in (5, 6) for r in got)
    assert len(got) == 5


def test_contamination_spans_against_benchmark(spark):
    """Span-level decontamination: only corpus runs present verbatim in
    the benchmark set are reported, merged into maximal spans; corpus-
    internal duplication without a benchmark hit emits nothing."""
    from pythonvectordb_spark.operators.textops import contamination_spans

    leak = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    corpus = spark.createDataFrame(
        [
            (10, f"intro {leak} outro words here"),        # contaminated
            (11, "shared corpus only run one two three four five six"),
            (12, "shared corpus only run one two three four five six"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, f"eval question contains {leak} inside")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.start_tok, r.end_tok, r.span_tokens, r.n_windows)
        for r in contamination_spans(corpus, bench, window=8).collect()
    }
    # doc 10: leak at tokens 1..9 (9 tokens -> windows at pos 1 and 2)
    assert got == {(10, 1, 10, 9, 2)}


def test_scrub_spans_cuts_and_audits(spark):
    """Detect -> cut -> verify: spans reported by contamination_spans are
    removed token-exactly; untouched docs pass through with clean_md5 ==
    md5 of their own (token-normalized) text; a fully-leaked doc scrubs
    to the empty string."""
    import hashlib

    from pythonvectordb_spark.operators.textops import (
        contamination_spans,
        scrub_spans,
    )

    leak = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    corpus = spark.createDataFrame(
        [
            (10, f"intro {leak} outro words here"),  # leak at tokens 1..9
            (11, "totally original content with no overlap at all"),
            (12, leak),  # the whole doc IS the leak
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, f"eval question contains {leak} inside")],
        "doc_id long, text string",
    )
    spans = contamination_spans(corpus, bench, window=8)
    got = {
        r.doc_id: (r.n_tok_before, r.n_tok_after, r.n_spans, r.clean_md5)
        for r in scrub_spans(corpus, spans).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[10] == (13, 4, 1, md5("intro outro words here"))
    assert got[11] == (
        8, 8, 0, md5("totally original content with no overlap at all")
    )
    assert got[12] == (9, 0, 1, md5(""))
    assert len(got) == 3


def test_perplexity_buckets_tertile_semantics(spark):
    """Buckets are the per-language ntile of the (already-oracled)
    surprisal scores: pin against a Python ntile over the operator's
    own per-doc output, and check the head bucket really holds the
    corpus-typical (low-surprisal) docs."""
    from pythonvectordb_spark.operators.textops import (
        perplexity_buckets,
        unigram_surprisal,
    )

    rows = []
    # lang A: 7 docs, increasing share of unique (rare) tokens
    for i in range(7):
        common = ["the"] * 8
        rare = [f"rare{i}_{j}" for j in range(i)]
        rows.append((i, "A", " ".join(common + rare)))
    # lang B: 5 docs, its own vocabulary
    for i in range(5):
        rows.append((100 + i, "B", " ".join(["la"] * 6 + [f"uniq{i}_{j}" for j in range(i)])))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    per_doc = {r.doc_id: r.avg_surprisal for r in unigram_surprisal(df).collect()}

    def py_ntile(ids, n=3):
        order = sorted(ids, key=lambda i: (per_doc[i], i))
        sz, rem = divmod(len(order), n)
        out, pos = {}, 0
        for b in range(1, n + 1):
            take = sz + (1 if b <= rem else 0)
            for i in order[pos : pos + take]:
                out[i] = b
            pos += take
        return out

    exp_assign = {}
    for lang, ids in (("A", range(7)), ("B", range(100, 105))):
        exp_assign.update({i: (lang, b) for i, b in py_ntile(list(ids)).items()})
    exp = {}
    for i, (lang, b) in exp_assign.items():
        cur = exp.setdefault((lang, b), [0, None, None])
        cur[0] += 1
        s = per_doc[i]
        cur[1] = s if cur[1] is None else min(cur[1], s)
        cur[2] = s if cur[2] is None else max(cur[2], s)

    got = {
        (r.lang, r.bucket): [r.n_docs, r.lo_surprisal, r.hi_surprisal]
        for r in perplexity_buckets(df).collect()
    }
    assert got == exp
    # head bucket of lang A = the all-common-token docs
    head_ids = [i for i, lb in exp_assign.items() if lb == ("A", 1)]
    assert max(per_doc[i] for i in head_ids) <= min(
        per_doc[i] for i, lb in exp_assign.items() if lb == ("A", 3)
    )


def test_zipf_fit_recovers_planted_power_law(spark):
    """Plant an exact power law (freq = round(1000 * rank^-1)) and the
    OLS fit must recover slope ~ -1; a flat (uniform-frequency) corpus
    must fit slope 0 exactly. Also pins the top-k cap: n_fit <=
    max_rank while n_vocab counts the whole vocabulary."""
    import math

    from pythonvectordb_spark.operators.textops import zipf_fit

    # power-law corpus: token w_r appears round(1000 / r) times
    words = []
    for r in range(1, 41):
        words += [f"w{r:02d}"] * round(1000 / r)
    doc = " ".join(words)
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    row = zipf_fit(df, max_rank=30).collect()[0]
    assert row.n_vocab == 40 and row.n_fit == 30
    assert abs(row.slope - (-1.0)) < 0.02  # rounding of counts only
    assert abs(row.intercept - math.log(1000)) < 0.05

    flat = spark.createDataFrame(
        [(1, " ".join([f"u{i}" for i in range(25)] * 3))], "doc_id long, text string"
    )
    frow = zipf_fit(flat).collect()[0]
    assert frow.slope == 0.0 and frow.n_fit == 25


def test_tokenizer_fertility(spark):
    from pythonvectordb_spark.operators.textops import tokenizer_fertility

    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
    df = spark.createDataFrame(
        [
            # "ab12" splits into 2 subwords; "x!" into 2; plain words 1:1
            (1, "ab12 cd", "en"),   # words=2 subwords=3 chars=7
            (2, "x! y", "en"),      # words=2 subwords=3 chars=4
            (3, "uno dos", "es"),   # words=2 subwords=2 chars=7
        ],
        "doc_id long, text string, lang string",
    )
    rep = {r["lang"]: r.asDict() for r in tokenizer_fertility(df, pat).collect()}
    en, es = rep["en"], rep["es"]
    assert (en["n_docs"], en["n_words"], en["n_subwords"]) == (2, 4, 6)
    assert en["fertility"] == 1.5
    assert en["chars_per_subword"] == round(11 / 6, 6)
    assert (es["n_words"], es["n_subwords"], es["fertility"]) == (2, 2, 1.0)


def test_bpe_merge_pairs(spark):
    from pythonvectordb_spark.operators.textops import bpe_merge_pairs

    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
    # "aaa" contributes pair "aa" twice per occurrence; 3 docs of it -> 6
    df = spark.createDataFrame(
        [(1, "aaa aaa"), (2, "aaa ab"), (3, "b ab x")],
        "doc_id long, text string",
    )
    rows = bpe_merge_pairs(df, pat, top_n=3).collect()
    got = {r["pair"]: (r["rank"], r["n_occurrences"]) for r in rows}
    assert got["aa"] == (1, 6)  # 3 occurrences of "aaa" x 2 in-word pairs
    assert got["ab"] == (2, 2)
    # single-char words ("b", "x") contribute no pairs
    assert len(rows) == 2


def test_heaps_law_two_point_fit(spark):
    """Two buckets with known growth: d0='a b', d1='a c' gives curve
    (2 tokens, 2 vocab) -> (4, 3); the two-point OLS is exact, beta =
    ln(3/2)/ln(2) and the intercept reuses the ROUNDED slope."""
    import math

    from pythonvectordb_spark.operators.textops import heaps_law

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c")], "doc_id long, text string"
    )
    rows = {r["bucket"]: r.asDict() for r in heaps_law(docs, n_points=2).collect()}
    assert rows[0]["cum_tokens"] == 2 and rows[0]["cum_vocab"] == 2
    assert rows[1]["cum_tokens"] == 4 and rows[1]["cum_vocab"] == 3
    beta = round(math.log(3 / 2) / math.log(2), 6)
    assert rows[0]["beta"] == beta
    sx, sy = math.log(2) + math.log(4), math.log(2) + math.log(3)
    assert rows[1]["ln_k"] == round((sy - beta * sx) / 2, 6)


def test_good_turing_counts(spark):
    """'a a b' has one singleton and one doubleton: p_unseen = 1/3 and
    the bias-corrected Chao1 adds nothing (n1*(n1-1) = 0)."""
    from pythonvectordb_spark.operators.textops import good_turing

    docs = spark.createDataFrame(
        [(0, "a a b", "s1"), (1, "x x y y z z w", "s2")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r.asDict() for r in good_turing(docs).collect()}
    assert got["s1"]["n_tokens"] == 3 and got["s1"]["n_vocab"] == 2
    assert got["s1"]["n1"] == 1 and got["s1"]["n2"] == 1
    assert got["s1"]["p_unseen"] == round(1 / 3, 9)
    assert got["s1"]["chao1_vocab"] == 2.0
    # s2: w is the only singleton, three doubletons
    assert got["s2"]["n1"] == 1 and got["s2"]["n2"] == 3
    assert got["s2"]["chao1_vocab"] == 4.0


def test_truncation_stats_kept_lost_pad(spark):
    """max_len=4: a 2-token doc pads 2, a 6-token doc loses 2; the
    per-source utilization is kept/(n_docs*max_len)."""
    from pythonvectordb_spark.operators.textops import truncation_stats

    docs = spark.createDataFrame(
        [(0, "a b", "s"), (1, "a b c d e f", "s")],
        "doc_id long, text string, source string",
    )
    (r,) = truncation_stats(docs, max_len=4).collect()
    assert r["n_docs"] == 2 and r["n_truncated"] == 1
    assert r["total_tokens"] == 8 and r["kept_tokens"] == 6
    assert r["lost_tokens"] == 2 and r["pad_tokens"] == 2
    assert r["utilization"] == 0.75 and r["trunc_rate"] == 0.5


def test_pmi_collocations_exclusive_pair_wins(spark):
    """A pair that always co-occurs ('data science' x5) beats the
    min_count floor and scores ln(c_xy*N/(c_x*c_y)) = ln(4); pairs
    under the floor are dropped."""
    import math

    from pythonvectordb_spark.operators.textops import pmi_collocations

    docs = spark.createDataFrame(
        [
            (0, "data science data science data science data science data science"),
            (1, "the a the b the c the d the e"),
        ],
        "doc_id long, text string",
    )
    rows = pmi_collocations(docs, min_count=5, top_n=20).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["rank"], r["w1"], r["w2"], r["n_pair"]) == (1, "data", "science", 5)
    assert r["pmi"] == round(math.log(4), 6)


def test_source_ttr_hand_computed(spark):
    """Source A: 'x x y' -> 3 tokens, 2 types, 1 hapax; source B all
    distinct -> TTR 1.0, hapax share 1.0."""
    from pythonvectordb_spark.operators.textops import source_ttr

    df = spark.createDataFrame(
        [(1, "x x y", "A"), (2, "p q r", "B")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in source_ttr(df).collect()}
    a = got["A"]
    assert a["n_tokens"] == 3 and a["n_types"] == 2 and a["n_hapax"] == 1
    assert a["ttr"] == round(2 / 3, 9) and a["hapax_share"] == 0.5
    b = got["B"]
    assert b["ttr"] == 1.0 and b["hapax_share"] == 1.0


def test_source_js_matrix_extremes(spark):
    """Identical token mixes give JS = 0; fully disjoint vocabularies
    give JS = ln 2 (every token is private mass)."""
    import math

    from pythonvectordb_spark.operators.textops import source_js_matrix

    same = spark.createDataFrame(
        [(1, "x y", "A"), (2, "x y", "B")], "doc_id long, text string, source string"
    )
    (r,) = source_js_matrix(same).collect()
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert r["js_divergence"] == 0.0
    disjoint = spark.createDataFrame(
        [(1, "x x", "A"), (2, "y z", "B")], "doc_id long, text string, source string"
    )
    rows = source_js_matrix(disjoint).collect()
    # no common tokens -> the pair never materializes from the inner
    # join; the analytic limit is ln 2, but the operator's contract is
    # common-support pairs only (documented)
    assert rows == []
    mixed = spark.createDataFrame(
        [(1, "x y", "A"), (2, "x z", "B")], "doc_id long, text string, source string"
    )
    (r,) = source_js_matrix(mixed).collect()
    # cp=cq=1 for 'x', Np=Nq=2; common term cancels; privates: 1*ln2 each
    # klp = (2-1)*ln2 + 1*(ln(2*1*2)-ln(1*2+1*2)) = ln2 + 0 -> /2 = ln2/2
    assert r["n_common"] == 1
    assert r["js_divergence"] == round(0.5 * math.log(2.0), 6)


def test_heldout_cross_entropy_hand_computed(spark):
    """Train (even ids) 'x x y', test (odd ids) 'x z': V1=2, N1=3;
    p(x)=(2+1)/6, OOV z contributes ln 6 only:
    CE = ln6 - (1*ln3)/2; OOV mass 1/2."""
    import math

    from pythonvectordb_spark.operators.textops import heldout_cross_entropy

    df = spark.createDataFrame(
        [(2, "x x y", "A"), (1, "x z", "A")],
        "doc_id long, text string, source string",
    )
    (r,) = heldout_cross_entropy(df).collect()
    assert r["n_train_tokens"] == 3 and r["v_train"] == 2
    assert r["n_test_tokens"] == 2
    assert r["cross_entropy_nats"] == round(math.log(6.0) - math.log(3.0) / 2.0, 6)
    assert r["oov_mass"] == 0.5


def test_token_rank_drift_planted_swap(spark):
    """Even half ranks x above y, odd half reverses; z only exists in
    the odd half (NULL even rank)."""
    from pythonvectordb_spark.operators.textops import token_rank_drift

    df = spark.createDataFrame(
        [(2, "x x y", "A"), (4, "x y", "A"), (1, "y y x z", "A")],
        "doc_id long, text string, source string",
    )
    got = {r["tok"]: r for r in token_rank_drift(df, top_k=3).collect()}
    assert got["x"]["rank_even"] == 1 and got["x"]["rank_odd"] == 2
    assert got["x"]["rank_delta"] == -1
    assert got["y"]["rank_even"] == 2 and got["y"]["rank_odd"] == 1
    assert got["z"]["rank_even"] is None and got["z"]["rank_odd"] == 3
    assert got["z"]["rank_delta"] is None


def test_kneser_ney_bigrams_hand_computed(spark):
    """Corpus 'a b a b' + 'c b': bigrams ab(2) ba(1) cb(1). Left totals:
    a->3? no: c(a,.)=2 (ab twice), c(b,.)=1 (ba), c(c,.)=1 (cb).
    N1+(a,.)=1, N1+(b,.)=1, N1+(c,.)=1; continuation counts:
    N1+(.,b)=2 {a,c}, N1+(.,a)=1 {b}; types T=3."""
    from pythonvectordb_spark.operators.textops import kneser_ney_bigrams

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c b")], "doc_id long, text string"
    )
    rows = {(r.w1, r.w2): r for r in kneser_ney_bigrams(df, top_n=10).collect()}
    assert set(rows) == {("a", "b"), ("b", "a"), ("c", "b")}
    ab = rows[("a", "b")]
    assert (ab.c, ab.cw1, ab.n1r, ab.ncont) == (2, 2, 1, 2)
    # P = (2-.75)/2 + .75*1/2*2/3 = 0.625 + 0.25 = 0.875
    assert abs(ab.p_kn - 0.875) < 1e-9
    ba = rows[("b", "a")]
    # P = (1-.75)/1 + .75*1/1*1/3 = 0.25 + 0.25 = 0.5
    assert abs(ba.p_kn - 0.5) < 1e-9
    assert ab.rank == 1  # highest count wins rank 1


def _py_bpe_reference(texts, pattern, n_merges):
    """Pure-Python BPE trainer (Sennrich et al. 2016 semantics: most
    frequent adjacent pair, (count DESC, pair ASC) tie-break, greedy
    left-to-right non-overlapping rewrite) — the independent reference
    bpe_merge_table must match."""
    import re
    from collections import Counter

    words = Counter(w for t in texts for w in re.findall(pattern, t))
    seqs = {w: list(w) for w in words}
    merges = []
    for r in range(1, n_merges + 1):
        pc = Counter()
        for w, c in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        mx = max(pc.values())
        left, right = sorted(
            p for p, c in pc.items() if c == mx
        )[0]
        merges.append((r, f"{left} {right}", left + right, mx))
        for w, s in seqs.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    ns.append(left + right)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            seqs[w] = ns
    return merges, seqs, words


def test_bpe_merge_table_matches_python_reference(spark):
    """Round-6 VERDICT ask #5: the trainer's merges must match a
    pure-Python BPE reference exactly — rank, pair, merged symbol, and
    weighted occurrence count, through all rounds (later rounds merge
    MERGED symbols, exercising the multi-char pair path)."""
    from pythonvectordb_spark.operators.textops import bpe_merge_table

    texts = [
        "low low lower lowest newer new",
        "wider new newer widest low",
        "the the the then there then",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.merge_rank, r.pair, r.merged, r.n_occurrences)
        for r in bpe_merge_table(df, r"[A-Za-z]+", n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    ref, _, _ = _py_bpe_reference(texts, r"[A-Za-z]+", 8)
    assert got == ref


def test_bpe_trained_fertility_matches_python_reference(spark):
    """The fertility row's integer counts must equal the reference
    encoder's: pieces are counted on the final rewritten word table."""
    from pythonvectordb_spark.operators.textops import bpe_trained_fertility

    texts = ["aaa aaa aab abab", "abab aaa ba"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    (row,) = bpe_trained_fertility(df, r"[A-Za-z]+", n_merges=3).collect()
    _, seqs, words = _py_bpe_reference(texts, r"[A-Za-z]+", 3)
    n_words = sum(words.values())
    n_chars = sum(len(w) * c for w, c in words.items())
    n_pieces = sum(len(seqs[w]) * c for w, c in words.items())
    assert (row.n_merges, row.n_words, row.n_chars, row.n_pieces) == (
        3,
        n_words,
        n_chars,
        n_pieces,
    )
    assert abs(row.fertility_pieces - n_pieces / n_words) < 1e-6
    assert abs(row.compression - n_pieces / n_chars) < 1e-6


def test_bpe_fold_rewrite_overlap_semantics(spark):
    """The greedy non-overlap contract on the degenerate chain: merging
    (a, a) over 'a a a a a' must give 'aa aa a', never 'aa aaa' or a
    re-merge into the just-produced symbol."""
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.textops import _bpe_fold_rewrite

    df = spark.createDataFrame(
        [("a a a a a",), ("a",), ("b a a c",)], "seq string"
    )
    got = [
        r.out
        for r in df.select(
            _bpe_fold_rewrite(F.col("seq"), F.lit("a a"), F.lit("aa")).alias("out")
        ).collect()
    ]
    assert got == ["aa aa a", "a", "b aa c"]


def test_burrows_delta_identical_sources_zero(spark):
    """Two sources with identical token distributions: every z gap is
    0, so Delta(a,b) = 0; a third divergent source sits strictly
    farther from both."""
    from pythonvectordb_spark.operators.textops import burrows_delta

    base = "the cat sat on the mat and the dog ran"
    other = "zebra quark flux " * 5
    df = spark.createDataFrame(
        [(1, base, "a"), (2, base, "b"), (3, other, "c")],
        "doc_id long, text string, source string",
    )
    got = {(r.source_a, r.source_b): r.delta for r in burrows_delta(df, n_words=8).collect()}
    assert got[("a", "b")] == 0.0
    assert got[("a", "c")] > 0.0 and got[("b", "c")] > 0.0
    assert got[("a", "c")] == got[("b", "c")]


def test_bpe_encode_pieces_matches_reference_encoder(spark):
    """The piece table must equal the pure-Python reference encoder's
    weighted piece counts under the same learned merges."""
    from collections import Counter

    from pythonvectordb_spark.operators.textops import bpe_encode_pieces

    texts = ["low low lower lowest newer new", "wider new newer widest low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.piece: (r.n_occurrences, r.share)
        for r in bpe_encode_pieces(df, r"[A-Za-z]+", n_merges=5, top_n=50).collect()
    }
    _, seqs, words = _py_bpe_reference(texts, r"[A-Za-z]+", 5)
    ref = Counter()
    for w, c in words.items():
        for p in seqs[w]:
            ref[p] += c
    total = sum(ref.values())
    assert {p: n for p, (n, _) in got.items()} == dict(ref)
    for p, (n, share) in got.items():
        assert abs(share - round(n / total, 6)) < 1e-9


def test_chao1_hand_computed(spark):
    """V=4 types, F1=2 singletons, F2=1 doubleton over 7 tokens:
    chao1 = 4 + 2*1/(2*2) = 4.5, coverage = 1 - 2/7."""
    from pythonvectordb_spark.operators.textops import chao1_vocab_richness

    df = spark.createDataFrame(
        [(1, "a a a b b c d")], "doc_id long, text string"
    )
    (r,) = chao1_vocab_richness(df).collect()
    assert (r.n_tokens, r.vocab, r.f1, r.f2) == (7, 4, 2, 1)
    assert r.chao1 == 4.5
    assert abs(r.coverage - round(1 - 2 / 7, 6)) < 1e-9


def test_source_vocab_jaccard_hand_sets(spark):
    """Two four-token docs sharing one of their two 3-gram shingles:
    Jaccard = 1/3, both containments = 1/2."""
    from pythonvectordb_spark.operators.textops import source_vocab_jaccard

    df = spark.createDataFrame(
        [(1, "a b c d", "sa"), (2, "a b c x", "sb")],
        "doc_id long, text string, source string",
    )
    (r,) = source_vocab_jaccard(df).collect()
    assert (r.source_a, r.source_b) == ("sa", "sb")
    assert r.vocab_a == 2 and r.vocab_b == 2 and r.n_common == 1
    assert r.jaccard == round(1 / 3, 6)
    assert r.containment_a == 0.5 and r.containment_b == 0.5
