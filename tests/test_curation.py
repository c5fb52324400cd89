"""Corpus-curation operators: decontamination, PII redaction, stratified
sampling, cluster stats — behavioral contracts on planted fixtures (the
oracle parity runs separately through the registry)."""

from pyspark.sql import functions as F

from pythonvectordb_spark.operators.curation import (
    decontaminate,
    dup_cluster_stats,
    pii_scrub,
    stratified_sample,
)


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    """A doc containing a benchmark passage is flagged with the passage's
    shingle count; disjoint docs are not flagged; the benchmark set
    itself is not scanned as corpus."""
    bench = spark.createDataFrame(
        [(9001, "the capital of france is paris and the capital of spain is madrid")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "question the capital of france is paris answer"),  # leaked passage
            (2, "completely unrelated text about spark shuffles and joins here"),
            (3, "the capital of spain is madrid said the quiz"),    # second leak
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_shared for r in decontaminate(corpus, bench, min_common=2).collect()}
    assert set(got) == {1, 3}
    assert got[1] >= 4 and got[3] >= 3  # contiguous leaked 3-grams
    # threshold is respected: raising min_common above any overlap empties it
    assert decontaminate(corpus, bench, min_common=50).count() == 0


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob.smith@corp.co.uk today"),
            (2, "server at 192.168.1.100 answered"),
            (3, "call 555-123-4567 or 555 987 6543 now"),
            (4, "no pii in this row at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.clean_text, r.n_redacted) for r in pii_scrub(df).collect()}
    assert got[1] == ("contact <EMAIL> or <EMAIL> today", 2)
    assert got[2] == ("server at <IP> answered", 1)
    assert got[3] == ("call <PHONE> or <PHONE> now", 2)
    assert got[4] == ("no pii in this row at all", 0)


def test_stratified_sample_is_deterministic_and_rate_accurate(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.5, "de": 0.1}
    a = sorted(r.doc_id for r in stratified_sample(df, rates, strata_col="lang").collect())
    b = sorted(r.doc_id for r in stratified_sample(df, rates, strata_col="lang").collect())
    assert a == b  # content-hash gating: replayable
    got = (
        stratified_sample(df, rates, strata_col="lang")
        .groupBy("lang")
        .count()
        .collect()
    )
    per = {r.lang: r["count"] for r in got}
    assert abs(per["en"] / 1000 - 0.5) < 0.08   # md5 buckets ~ uniform
    assert abs(per["de"] / 1000 - 0.1) < 0.05
    # default_rate drops unlisted strata entirely when 0
    assert stratified_sample(df, {"fr": 1.0}, strata_col="lang").count() == 0


def test_dup_cluster_stats_histogram(spark):
    """A 3-clique + a 2-chain + singletons must produce the exact
    histogram, and n_docs must reconcile with the corpus size."""
    from pythonvectordb_spark.operators.dedup import resolve_duplicates

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(7)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4)], "id_a long, id_b long"
    )
    resolved = resolve_duplicates(docs, pairs)
    hist = {r.cluster_size: (r.n_clusters, r.n_docs) for r in dup_cluster_stats(resolved).collect()}
    assert hist == {3: (1, 3), 2: (1, 2), 1: (2, 2)}
    assert sum(nd for _, nd in hist.values()) == 7


def test_temperature_mixture_rebalances_without_upsampling(spark):
    from pythonvectordb_spark.operators.curation import temperature_mixture

    # big source: 60 docs x 20 tokens; small: 6 docs x 20 tokens
    rows = [(i, "big", "tok " * 19 + "tok") for i in range(60)]
    rows += [(100 + i, "small", "tok " * 19 + "tok") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in temperature_mixture(df, alpha=0.5).collect()}
    # tempering: small source's weight exceeds its raw token share
    assert out["small"].weight > 6 / 66
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-9
    # no upsampling: the small source is under target -> admit everything
    assert out["small"].admit_rate == 1.0
    assert out["small"].admitted_docs == 6
    # the big source is over target -> thinned, and admitted counts can
    # never exceed the source's own size
    assert 0.0 < out["big"].admit_rate < 1.0
    assert 0 <= out["big"].admitted_docs <= 60
    # alpha=1 is a no-op mixture: every source admits at rate 1
    flat = temperature_mixture(df, alpha=1.0).collect()
    assert all(r.admit_rate == 1.0 for r in flat)


def test_temperature_mixture_is_deterministic(spark):
    from pythonvectordb_spark.operators.curation import temperature_mixture

    rows = [(i, f"s{i % 5}", f"w{i} " * (5 + i % 7)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = sorted(map(tuple, temperature_mixture(df).collect()))
    b = sorted(map(tuple, temperature_mixture(df.repartition(11)).collect()))
    assert a == b


def test_importance_weights_separates_domains(spark):
    from pythonvectordb_spark.operators.curation import importance_weights

    # target docs share a distinctive vocabulary; background docs another;
    # one doc mixes both; one is empty
    rows = [
        (1, "en", "alpha beta alpha gamma beta alpha"),
        (2, "en", "beta gamma alpha beta gamma beta"),
        (3, "de", "delta epsilon zeta delta epsilon zeta"),
        (4, "de", "zeta delta epsilon zeta delta epsilon"),
        (5, "de", "alpha beta gamma delta epsilon zeta"),  # mixed
        (6, "de", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r for r in importance_weights(df, F.col("lang") == "en").collect()}
    # pure-target vocabulary scores positive, pure-background negative
    assert got[1].lr_score > 0 and got[1].selected == 1
    assert got[2].lr_score > 0 and got[2].selected == 1
    assert got[3].lr_score < 0 and got[3].selected == 0
    assert got[4].lr_score < 0 and got[4].selected == 0
    # the mixed doc sits between the pure docs
    assert got[3].lr_score < got[5].lr_score < got[1].lr_score
    # empty doc: zero tokens, zero score, not selected
    assert got[6].n_tok == 0 and got[6].lr_score == 0.0 and got[6].selected == 0
    assert len(got) == 6


def test_distribution_drift_psi_semantics(spark):
    import math

    from pythonvectordb_spark.operators.curation import distribution_drift

    a = spark.createDataFrame(
        [(i, "en" if i < 8 else "de", "s0") for i in range(10)],
        "doc_id long, lang string, source string",
    )
    # shifted: en collapses 8->2, de grows 2->8, plus a NEW category zh
    b = spark.createDataFrame(
        [(100 + i, "de" if i < 8 else ("en" if i < 9 else "zh"), "s0")
         for i in range(10)],
        "doc_id long, lang string, source string",
    )
    rows = {(r.dim, r.value): r for r in distribution_drift(a, b).collect()}
    # identical source distribution -> near-zero term (exactly 0 after
    # rounding: same counts, same smoothed shares)
    assert rows[("source", "s0")].psi_term == 0.0
    # every psi term is non-negative by construction
    assert all(r.psi_term >= 0 for r in rows.values())
    # the category present only in B exists as a row with n_a = 0 and a
    # positive, finite term (smoothing), and the big movers dominate
    zh = rows[("lang", "zh")]
    assert zh.n_a == 0 and zh.n_b == 1
    assert 0 < zh.psi_term < rows[("lang", "en")].psi_term
    # hand-compute the en term: k=3 lang categories after the union
    pa = (8 + 0.5) / (10 + 1.5)
    pb = (1 + 0.5) / (10 + 1.5)
    assert abs(rows[("lang", "en")].psi_term - round((pa - pb) * math.log(pa / pb), 6)) < 1e-9
    assert len(rows) == 4  # en, de, zh, s0


def test_cross_source_dup_matrix_symmetry_and_counts(spark):
    from pythonvectordb_spark.operators.curation import cross_source_dup_matrix

    docs = spark.createDataFrame(
        [(1, "crawlA"), (2, "crawlB"), (3, "crawlB"), (4, "crawlA")],
        "doc_id long, source string",
    )
    # pair (2,1) deliberately reversed vs (1,3): both must fold into the
    # same (crawlA, crawlB) cell; (2,3) is within-source
    pairs = spark.createDataFrame(
        [(2, 1), (1, 3), (2, 3)], "id_a long, id_b long"
    )
    got = {
        (r.source_a, r.source_b): r.n_pairs
        for r in cross_source_dup_matrix(pairs, docs).collect()
    }
    assert got == {("crawlA", "crawlB"): 2, ("crawlB", "crawlB"): 1}


def test_hash_split_matches_reference_md5_and_is_append_stable(spark):
    import hashlib

    from pythonvectordb_spark.operators.curation import hash_split

    def expected(i):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return "train" if u < 3865470566 else ("val" if u < 4080218931 else "test")

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    got = {r.doc_id: r.split for r in hash_split(df).collect()}
    assert got == {i: expected(i) for i in range(200)}
    assert {"train", "val", "test"} == set(got.values())  # all splits hit
    # append-stable: assignment of a subset is the full corpus's restriction
    sub = {r.doc_id: r.split for r in hash_split(df.filter("doc_id < 50")).collect()}
    assert sub == {i: got[i] for i in range(50)}


def test_split_leakage_counts_straddling_pairs(spark):
    import hashlib

    from pythonvectordb_spark.operators.curation import hash_split, split_leakage

    def split_of(i):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return "train" if u < 3865470566 else ("val" if u < 4080218931 else "test")

    ids = range(500)
    trains = [i for i in ids if split_of(i) == "train"]
    vals = [i for i in ids if split_of(i) == "val"]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    # one leaking pair (train x val, deliberately listed val-first) and
    # one safe pair (train x train)
    pairs = spark.createDataFrame(
        [(vals[0], trains[0]), (trains[1], trains[2])], "id_a long, id_b long"
    )
    got = {
        (r.split_a, r.split_b): (r.n_pairs, r.leak)
        for r in split_leakage(pairs, docs).collect()
    }
    assert got == {("train", "val"): (1, 1), ("train", "train"): (1, 0)}


def test_nb_classifier_confusion_matches_python_replica(spark):
    """Separable vocab classifies perfectly; an unseen-vocab doc falls
    back to the smoothing+prior decision — both pinned against a
    15-line pure-Python NB replica of the exact same arithmetic."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.curation import nb_classifier_confusion

    rows = []
    for i in range(8):  # even ids train, odd ids test
        rows.append((2 * i, "a", "apple banana cherry apple"))
        rows.append((2 * i + 1, "a", "banana apple cherry"))
    for i in range(4):
        rows.append((100 + 2 * i, "b", "dog elephant fox dog"))
        rows.append((101 + 2 * i, "b", "fox dog elephant"))
    rows.append((999, "b", "zzz yyy xxx"))  # test doc, fully unseen vocab
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    got = {
        (r.lang, r.predicted): r.n_docs
        for r in nb_classifier_confusion(df, (F.col("doc_id") % 2) == 0).collect()
    }

    # pure-Python replica
    train = [(l, t.split()) for i, l, t in rows if i % 2 == 0]
    test = [(i, l, t.split()) for i, l, t in rows if i % 2 == 1]
    nd = Counter(l for l, _ in train)
    N = sum(nd.values())
    cond = Counter((l, w) for l, ws in train for w in ws)
    tokc = Counter()
    for l, ws in train:
        tokc[l] += len(ws)
    V = len({w for _, ws in train for w in ws})
    exp = Counter()
    for _, true, ws in test:
        scores = {}
        for c in sorted(nd):
            s = sum(math.log((cond[(c, w)] + 1) / (tokc[c] + V)) for w in ws)
            scores[c] = round(math.log(nd[c] / N) + s, 6)
        pred = sorted(scores, key=lambda c: (-scores[c], c))[0]
        exp[(true, pred)] += 1
    assert got == dict(exp)
    # and the separable bulk really is classified correctly
    assert got[("a", "a")] == 8 and got[("b", "b")] >= 4


def test_cluster_aware_split_eliminates_leakage_by_construction(spark):
    import hashlib

    from pythonvectordb_spark.operators.curation import (
        cluster_aware_split,
        split_leakage,
        split_leakage_matrix,
    )
    from pythonvectordb_spark.operators.dedup import resolve_duplicates

    def split_of(x):
        u = int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)
        return "train" if u < 3865470566 else ("val" if u < 4080218931 else "test")

    ids = list(range(300))
    # a near-dup pair that straddles splits under doc-id hashing
    a = next(i for i in ids if split_of(i) == "train")
    b = next(i for i in ids if split_of(i) == "val")
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pairs = spark.createDataFrame([(min(a, b), max(a, b))], "id_a long, id_b long")

    naive = {(r.split_a, r.split_b): r.leak for r in split_leakage(pairs, docs).collect()}
    assert naive == {("train", "val"): 1}  # doc-hash split leaks

    comps = resolve_duplicates(docs, pairs)
    assigned = cluster_aware_split(comps)
    fixed = split_leakage_matrix(pairs, assigned).collect()
    assert [(r.split_a, r.split_b, r.n_pairs, r.leak) for r in fixed] == [
        (split_of(min(a, b)), split_of(min(a, b)), 1, 0)
    ]  # whole cluster inherits the component's split: no off-diagonal cell
    # and singletons keep their own-id split (append-stable for unique docs)
    got = {r.doc_id: r.split for r in assigned.collect()}
    singleton = next(i for i in ids if i not in (a, b))
    assert got[singleton] == split_of(singleton)
    assert got[a] == got[b] == split_of(min(a, b))


def test_epoch_plan_semantics(spark):
    """Equal sources split the budget evenly; under sqrt tempering a
    small source gets >1 epoch before a big one; budget conservation:
    sum(epochs * n_tokens) == budget."""
    import math

    from pythonvectordb_spark.operators.curation import epoch_plan

    # big: 9000 tokens, small: 1000 tokens -> weights 3/4, 1/4
    rows = [(i, "big", "t " * 89 + "t") for i in range(100)]      # 90 tok x 100
    rows += [(1000 + i, "small", "t " * 99 + "t") for i in range(10)]  # 100 x 10
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in epoch_plan(df, budget_tokens=8000).collect()}
    assert got["big"].n_tokens == 9000 and got["small"].n_tokens == 1000
    assert abs(got["big"].weight - 0.75) < 1e-9
    assert abs(got["small"].weight - 0.25) < 1e-9
    # epochs = B*w/n: big 8000*.75/9000 = 0.6667 (thinned), small
    # 8000*.25/1000 = 2.0 (repeated twice)
    assert abs(got["big"].epochs - 8000 * 0.75 / 9000) < 1e-6
    assert got["small"].epochs == 2.0
    assert got["big"].oversampled == 0 and got["small"].oversampled == 1
    # budget conservation across sources
    total = sum(r.epochs * r.n_tokens for r in got.values())
    assert abs(total - 8000) < 1e-2


def test_dedup_inflation_counts_copies(spark):
    from pythonvectordb_spark.operators.curation import dedup_inflation

    rows = [
        (1, "clean", "a b c d"),        # 4 unique tokens
        (2, "clean", "e f g"),          # 3 unique
        (3, "mirror", "x y z w"),       # 4 tokens...
        (4, "mirror", "x y z w"),       # ...copied
        (5, "mirror", "x y z w"),       # ...twice
        (6, "mirror", "q r"),           # 2 unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in dedup_inflation(df).collect()}
    c = got["clean"]
    assert (c.n_docs, c.unique_docs, c.n_tokens, c.unique_tokens) == (2, 2, 7, 7)
    assert c.inflation == 1.0
    m = got["mirror"]
    assert (m.n_docs, m.unique_docs, m.n_tokens, m.unique_tokens) == (4, 2, 14, 6)
    assert m.inflation == round(14 / 6, 6)


def test_unimax_epochs_water_filling(spark):
    from pythonvectordb_spark.operators.curation import unimax_epochs

    # sources of 10 / 20 / 70 tokens
    rows = [
        (1, " ".join(["a"] * 10), "small"),
        (2, " ".join(["b"] * 20), "mid"),
        (3, " ".join(["c"] * 70), "big"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def run(budget, cap=2):
        return {
            r["source"]: r.asDict()
            for r in unimax_epochs(df, budget=budget, max_epochs=cap).collect()
        }

    # budget >= cap * total: every source fully capped
    allcap = run(1000)
    assert all(v["capped"] == 1 and v["epochs"] == 2.0 for v in allcap.values())
    assert sum(v["alloc_tokens"] for v in allcap.values()) == 200.0

    # tiny budget: nobody reaches the cap, equal fair shares
    none = run(30)
    assert all(v["capped"] == 0 for v in none.values())
    assert all(v["alloc_tokens"] == 10.0 for v in none.values())

    # mixed: small is capped at 2x10=20, the rest split the remainder
    mixed = run(120)
    assert mixed["small"]["capped"] == 1 and mixed["small"]["alloc_tokens"] == 20.0
    assert mixed["mid"]["capped"] == 1 and mixed["mid"]["alloc_tokens"] == 40.0
    assert mixed["big"]["capped"] == 0 and mixed["big"]["alloc_tokens"] == 60.0
    # the water-filling invariant: the budget is exactly spent
    assert sum(v["alloc_tokens"] for v in mixed.values()) == 120.0


def test_ngram_coverage_bounds_and_identity(spark):
    """A held-out doc repeating only train text covers 1.0; one made of
    unseen words covers 0.0; short docs (<n tokens) report 0 shingles."""
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.curation import hash_split, ngram_coverage

    base = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(40)]
        + [(100, "alpha beta gamma delta"), (106, "qq ww ee rr tt"), (102, "one two")],
        "doc_id long, text string",
    )
    splits = {r["doc_id"]: r["split"] for r in hash_split(base).collect()}
    # the fixed ids 100-102 must be non-train for the assertions to bite;
    # md5 split is deterministic, so just verify the assumption explicitly
    out = {r["doc_id"]: r.asDict() for r in ngram_coverage(base, n=3).collect()}
    for d in (100, 106, 102):
        if splits[d] == "train":
            continue  # deterministic split happened to bucket it as train
        assert d in out
    if splits[100] != "train" and any(splits[i] == "train" for i in range(40)):
        assert out[100]["coverage"] == 1.0  # all 3-grams seen in train
    # 100 -> test, 106 -> val, 102 -> val under the registered md5 split
    assert splits[100] != "train" and splits[106] != "train" and splits[102] != "train"
    assert out[106]["coverage"] == 0.0  # novel vocabulary
    if splits[102] != "train":
        assert out[102]["n_shingles"] == 0 and out[102]["coverage"] == 0.0


def test_neyman_allocation_favors_variance(spark):
    """Equal-size strata: all of the budget flows toward the
    high-variance stratum; a zero-variance stratum gets nothing; the
    allocations sum to the budget."""
    from pythonvectordb_spark.operators.curation import neyman_allocation

    import datetime
    t = datetime.datetime(2024, 1, 1)
    rows = []
    # stratum "flat": constant value -> std 0 -> allocation 0
    rows += [(i, t, i, "flat", 10.0, "{}") for i in range(10)]
    # stratum "wild": alternating 0/100 -> std 50
    rows += [(100 + i, t, i, "wild", float((i % 2) * 100), "{}") for i in range(10)]
    # stratum "mild": alternating 49/51 -> std 1
    rows += [(200 + i, t, i, "mild", 50.0 + (i % 2) * 2 - 1, "{}") for i in range(10)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["stratum"]: r.asDict() for r in neyman_allocation(df, budget=102).collect()}
    assert out["flat"]["neyman_alloc"] == 0.0
    assert out["wild"]["value_std"] == 50.0 and out["mild"]["value_std"] == 1.0
    # w: wild 10*50=500, mild 10*1=10 -> wild gets 102*500/510 = 100
    assert out["wild"]["neyman_alloc"] == 100.0
    assert out["mild"]["neyman_alloc"] == 2.0
    assert sum(v["neyman_alloc"] for v in out.values()) == 102.0


def test_source_entropy_extremes(spark):
    """Uniform vocabulary -> norm_entropy 1.0; single repeated token ->
    entropy 0; the values are exact at these closed-form points."""
    import math

    from pythonvectordb_spark.operators.curation import source_entropy

    df = spark.createDataFrame(
        [
            (1, "a b c d", "uniform"),
            (2, "x x x x x x", "flat"),
            (3, "p p p q", "skewed"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r.asDict() for r in source_entropy(df).collect()}
    assert out["uniform"]["norm_entropy"] == 1.0
    assert out["uniform"]["entropy"] == round(math.log(4), 6)
    assert out["flat"]["entropy"] == 0.0 and out["flat"]["norm_entropy"] == 0.0
    # H = ln(4) - (3 ln 3)/4
    assert out["skewed"]["entropy"] == round(math.log(4) - 3 * math.log(3) / 4, 6)


def test_source_kl_matrix_identity_and_direction(spark):
    """Identical distributions give KL = 0 in both directions; a
    skewed source diverges from a uniform one in both directions."""
    from pythonvectordb_spark.operators.curation import source_kl_matrix

    docs = spark.createDataFrame(
        [(0, "a b", "x"), (1, "a b", "y"), (2, "a a a a", "z")],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["kl_ab"]
        for r in source_kl_matrix(docs).collect()
    }
    assert len(got) == 6
    assert got[("x", "y")] == 0.0 and got[("y", "x")] == 0.0
    assert got[("x", "z")] > 0.0 and got[("z", "x")] > 0.0


def test_source_lang_mi_extremes(spark):
    """Source determines language exactly -> MI = H = ln(2), NMI = 1;
    independent layout -> MI = 0."""
    from pythonvectordb_spark.operators.curation import source_lang_mi

    dep = spark.createDataFrame(
        [(0, "s1", "en"), (1, "s1", "en"), (2, "s2", "fr"), (3, "s2", "fr")],
        "doc_id long, source string, lang string",
    )
    (r,) = source_lang_mi(dep).collect()
    assert r["n_docs"] == 4 and r["n_sources"] == 2 and r["n_langs"] == 2
    assert r["mi"] == r["h_source"] == r["h_lang"] == 0.693147
    assert r["nmi"] == 1.0

    ind = spark.createDataFrame(
        [(0, "s1", "en"), (1, "s1", "fr"), (2, "s2", "en"), (3, "s2", "fr")],
        "doc_id long, source string, lang string",
    )
    (r,) = source_lang_mi(ind).collect()
    assert r["mi"] == 0.0 and r["nmi"] == 0.0


def test_quality_pass_by_source_shares(spark):
    """A source whose docs all pass reports one 'kept' row with share
    1; a source with one too-short doc splits kept/short."""
    from pythonvectordb_spark.operators.curation import quality_pass_by_source

    long_text = " ".join(f"tok{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, long_text, "clean"),
            (2, long_text + " extra", "clean"),
            (3, long_text, "mixed"),
            (4, "too short", "mixed"),
        ],
        "doc_id long, text string, source string",
    )
    got = {(r["source"], r["verdict"]): r for r in quality_pass_by_source(df).collect()}
    assert got[("clean", "kept")]["share"] == 1.0
    assert got[("mixed", "kept")]["n_docs"] == 1
    assert got[("mixed", "short")]["share"] == 0.5


def test_ngram_novelty_planted_overlap(spark):
    """Batch doc sharing one of its two 3-shingles with the corpus
    scores 0.5; an all-new doc scores 1.0; a too-short doc is NULL."""
    from pythonvectordb_spark.operators.curation import ngram_novelty

    corpus = spark.createDataFrame(
        [(1, "w x y z")], "doc_id long, text string"  # shingles: {w x y, x y z}
    )
    batch = spark.createDataFrame(
        [(11, "w x y q"), (22, "p q r s"), (33, "t u")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_novelty(corpus, batch, n=3).collect()}
    # batch 11 shingles: {w x y, x y q}; corpus has {w x y, x y z} -> 1 novel
    assert (got[11].n_shingles, got[11].n_novel) == (2, 1)
    assert abs(got[11].novelty - 0.5) < 1e-9
    assert (got[22].n_shingles, got[22].n_novel) == (2, 2)
    assert abs(got[22].novelty - 1.0) < 1e-9
    assert got[33].n_shingles == 0 and got[33].n_novel == 0
    assert got[33].novelty is None


def test_source_compressibility_uniform_alphabet(spark):
    """'abab' per source: 2 symbols, uniform -> exactly 1 bit/byte;
    a single-symbol source -> 0 bits/byte."""
    from pythonvectordb_spark.operators.curation import source_compressibility

    df = spark.createDataFrame(
        [(1, "abab", "S1"), (2, "cccc", "S2")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in source_compressibility(df).collect()}
    assert (got["S1"].n_chars, got["S1"].n_bytes, got["S1"].n_alphabet) == (4, 4, 2)
    assert abs(got["S1"].bits_per_byte - 1.0) < 1e-9
    assert got["S2"].n_alphabet == 1 and abs(got["S2"].bits_per_byte) < 1e-9


def test_nb_calibration_bins_separable(spark):
    """Cleanly separable classes: every scored doc lands in some bin
    with accuracy 1.0, and bins stay within [0, n_bins]."""
    from pythonvectordb_spark.operators.curation import nb_calibration_bins
    from pyspark.sql import functions as F

    rows = []
    for i in range(8):
        rows.append((2 * i, "en", "the cat sat on the mat the end"))
        rows.append((2 * i + 1, "de", "der hund lief durch den wald schnell"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = nb_calibration_bins(df, (F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 4 == 1)).collect()
    assert sum(r.n_docs for r in out) > 0
    assert all(0 <= r.bin <= 10 for r in out)
    assert all(r.n_correct == r.n_docs and abs(r.accuracy - 1.0) < 1e-9 for r in out)


def test_nb_auc_separable_fixture(spark):
    """Perfectly separable two-language corpus: every class's score
    ranks its own docs above the rest -> AUC 1.0 for both."""
    from pythonvectordb_spark.operators.curation import nb_auc

    rows = []
    for i in range(8):
        rows.append((2 * i, "aqua blau cyan azure", "en"))
        rows.append((2 * i + 1, "rojo verde gelb braun", "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.cls: r for r in nb_auc(df, (F.col("doc_id") % 2 >= -1) & (F.col("doc_id") < 8)).collect()}
    assert got["en"].auc == 1.0 and got["de"].auc == 1.0
    assert got["en"].n_pos == 4 and got["en"].n_neg == 4


def test_nb_auc_degenerate_single_class_is_null(spark):
    from pythonvectordb_spark.operators.curation import nb_auc

    rows = [(i, "uno dos tres", "es") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    (r,) = nb_auc(df, F.col("doc_id") % 2 == 0).collect()
    assert r.auc is None  # no negatives in the test split


def test_nb_class_f1_reconciles_with_confusion(spark):
    """Precision/recall/F1 must reconcile with the confusion matrix on
    the same split: tp, row and column sums agree."""
    from pythonvectordb_spark.operators.curation import (
        nb_class_f1,
        nb_classifier_confusion,
    )
    from pythonvectordb_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    pred = (F.col("doc_id") % 2) == 0
    conf = nb_classifier_confusion(docs, pred).collect()
    f1 = {r.cls: r for r in nb_class_f1(docs, pred).collect()}
    by_actual = {}
    by_pred = {}
    tp = {}
    for r in conf:
        by_actual[r.lang] = by_actual.get(r.lang, 0) + r.n_docs
        by_pred[r.predicted] = by_pred.get(r.predicted, 0) + r.n_docs
        if r.lang == r.predicted:
            tp[r.lang] = r.n_docs
    for cls, row in f1.items():
        assert row.n_actual == by_actual.get(cls, 0)
        assert row.n_pred == by_pred.get(cls, 0)
        assert row.tp == tp.get(cls, 0)
        if row.n_pred and row.n_actual:
            assert abs(row.f1 - round(2 * row.tp / (row.n_pred + row.n_actual), 6)) < 1e-9


def test_nb_average_precision_separable_classes(spark):
    """Disjoint class vocabularies rank perfectly: AP = 1.0 for both
    classes, prevalence = the class share."""
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.curation import nb_average_precision

    rows = [
        (i, "xx xx xx" if i % 4 < 2 else "yy yy yy",
         "aa" if i % 4 < 2 else "bb")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.cls: r
        for r in nb_average_precision(df, (F.col("doc_id") % 2) == 0).collect()
    }
    assert set(out) == {"aa", "bb"}
    for cls in ("aa", "bb"):
        assert out[cls].average_precision == 1.0
        assert out[cls].prevalence == 0.5


def test_gate_champion_challenger_separable_label(spark):
    """With a marker token that exactly determines an above-mean-length
    label, the NB gate learns it (acc 1.0) while the rule gate cannot
    (it keys on composition, not the marker), so the champion verdict
    and the McNemar counts are forced."""
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.curation import gate_champion_challenger

    # long docs (> mean chars) carry 'marker'; every doc passes the
    # rule gate's heuristics (>= 10 diverse tokens incl. stopwords)
    long_txt = "marker " + " ".join(f"w{i}" for i in range(30)) + " the a of"
    short_txt = " ".join(f"v{i}" for i in range(12)) + " the a of"
    rows = [
        (i, long_txt if i % 2 else short_txt,
         len(long_txt) if i % 2 else len(short_txt))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    (r,) = gate_champion_challenger(df).collect()
    assert r.n_test > 0 and 0 < r.n_pos_test < r.n_test
    # NB separates perfectly via the marker (and the w/v vocabularies)
    assert r.acc_nb == 1.0
    # the rule gate passes everything -> it is right exactly on the
    # positive (keep-worthy) docs
    assert abs(r.acc_rule - r.n_pos_test / r.n_test) < 1e-6
    assert r.exact_champion == "nb"
    # discordance is one-sided: NB right where rule wrong (the
    # negatives), never the reverse
    assert r.mcnemar_rule_nb_n10 == 0
    assert r.mcnemar_rule_nb_n01 == r.n_test - r.n_pos_test
    assert r.logreg_acc_ok == 1 and r.logreg_beats_rule_ok == 1
    # round-9 arms: the length label is an axis-aligned threshold on
    # n_chars, so the tree gate nails it and beats the all-keep rule
    assert r.gbt_acc_ok == 1 and r.gbt_beats_rule_ok == 1
    # no doc contains the topic term -> pos_topic is all-false, the
    # all-keep rule is wrong everywhere, single-class NB is right
    # everywhere, and the topic champion verdict is forced
    assert r.acc_rule_topic == 0.0
    assert r.acc_nb_topic == 1.0
    assert r.exact_champion_topic == "nb"
