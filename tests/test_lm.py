"""Semantics of operators/lm.py (bigram LM scoring). The sf-scaled
oracle equivalence runs in test_extra_oracles.py::q_lm_score."""

from __future__ import annotations

import pytest

from datapump_spark.operators.lm import lm_score, train_and_score, train_bigram_lm


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, "the cat sat on the mat and the cat slept") for i in range(10)],
        "doc_id long, text string",
    )


def test_in_domain_beats_gibberish(spark, corpus):
    cand = spark.createDataFrame(
        [(100, "the cat sat on the mat"),
         (101, "zyx qwv plk mnb vcx zas"),
         (102, "hi")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in train_and_score(corpus, cand).collect()}
    assert rows[100]["avg_logprob"] > rows[101]["avg_logprob"]
    assert rows[100]["ppl"] < rows[101]["ppl"]
    # < 2 tokens: present, unscored
    assert rows[102]["n_bigrams"] == 0
    assert rows[102]["avg_logprob"] is None and rows[102]["ppl"] is None


def test_probabilities_normalize(spark, corpus):
    """Sum over the model's P(w2 | w1) for every seen context == 1: the
    smoothed conditionals must be proper distributions over the FULL
    vocab (w1 ∪ w2), not just the context words."""
    uni, bi = train_bigram_lm(corpus)
    c1 = {r["w1"]: r["c1"] for r in uni.collect()}
    seen = {(r["w1"], r["w2"]): r["c2"] for r in bi.collect()}
    vocab = {w for pair in seen for w in pair}
    V = len(vocab)
    for ctx in c1:
        total = sum((seen.get((ctx, w), 0) + 1.0) / (c1[ctx] + V)
                    for w in vocab)
        assert total == pytest.approx(1.0, rel=1e-12)


def test_broadcast_model_same_result_and_plan(spark, corpus):
    cand = spark.createDataFrame(
        [(7, "the cat sat"), (8, "mat and the")], "doc_id long, text string")
    uni, bi = train_bigram_lm(corpus)
    a = sorted(map(tuple, lm_score(cand, uni, bi).collect()))
    scored_b = lm_score(cand, uni, bi, broadcast_model=True)
    b = sorted(map(tuple, scored_b.collect()))
    assert a == b
    assert "BroadcastHashJoin" in scored_b._jdf.queryExecution().executedPlan().toString()


def test_ccnet_buckets_routing(spark):
    """Head = most reference-like: in-domain docs must land in head/
    middle and the out-of-domain doc in tail; buckets partition each
    group by the cut fractions; cuts validated; layout-independent."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datapump_spark.operators.lm import ccnet_buckets

    base = ("the quick brown fox jumps over the lazy dog and then the "
            "dog naps while the fox runs far away home again")
    rows = [(i, f"{base} w{i}", "en") for i in range(12)]
    rows.append((50, "zzq qqz xxv vvx " + " ".join(
        f"blorp{j} wug{j}" for j in range(10)), "en"))   # out-of-domain
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    ref = docs.where(F.col("doc_id") < 12)

    got = {r["doc_id"]: r for r in
           ccnet_buckets(docs, reference=ref, group_cols=["lang"]).collect()}
    assert got[50]["bucket"] == "tail"
    assert max(got.values(), key=lambda r: r["ppl"])["doc_id"] == 50
    n = len(got)
    heads = sum(1 for r in got.values() if r["bucket"] == "head")
    assert 0 < heads < n
    with _pytest.raises(ValueError, match="cuts"):
        ccnet_buckets(docs, cuts=(0.7, 0.3))


def test_kn_hand_computed(spark):
    """KN bigram on a 2-sentence corpus, every branch hand-checked:
    seen bigram (discounted), unseen bigram in a seen context (backoff
    mass × continuation), unseen context (pure continuation), and a
    never-seen word (1-type floor)."""
    import math

    from datapump_spark.operators.lm import lm_score_kn, train_bigram_lm

    corpus = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id bigint, text string")
    # train bigrams: (a,b)x2 (b,a)x1 (a,c)x1 -> c1: a=3, b=1
    # followers: a->{b,c}=2, b->{a}=1 ; preceders: b<-{a}=1, a<-{b}=1,
    # c<-{a}=1 ; total distinct bigrams nb=3
    uni, bi = train_bigram_lm(corpus)
    D = 0.75

    def kn(c12, c1, nf, np_):
        pc = max(np_, 1.0) / 3.0
        return (max(c12 - D, 0) / c1 + D * nf / c1 * pc) if c1 else pc

    probe = spark.createDataFrame(
        [(10, "a b"),      # seen bigram
         (11, "a a"),      # unseen bigram, seen context (np(a)=1)
         (12, "z b"),      # unseen context -> pure continuation of b
         (13, "b z")],     # never-seen word z -> floor
        "doc_id bigint, text string")
    got = {r.doc_id: r.avg_logprob
           for r in lm_score_kn(probe, uni, bi).collect()}
    want = {10: math.log(kn(2, 3, 2, 1)),
            11: math.log(kn(0, 3, 2, 1)),
            12: math.log(kn(0, 0, 0, 1)),
            13: math.log(kn(0, 1, 1, 0))}
    for k_, v in want.items():
        assert abs(got[k_] - round(v, 6)) < 1e-9, (k_, got[k_], v)


def test_kn_orders_in_domain_below_ood(spark):
    from datapump_spark.operators.lm import lm_score_kn, train_bigram_lm

    base = ("the quick brown fox jumps over the lazy dog and then "
            "the dog naps while the fox runs far away")
    ref = spark.createDataFrame(
        [(i, base) for i in range(5)], "doc_id bigint, text string")
    uni, bi = train_bigram_lm(ref)
    probe = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "zyx wvu tsr qpo nml kji hgf edc ba")],
        "doc_id bigint, text string")
    ppl = {r.doc_id: r.ppl for r in lm_score_kn(probe, uni, bi).collect()}
    assert ppl[1] < ppl[2]


def test_ccnet_buckets_kn_smoothing(spark):
    from datapump_spark.operators.lm import ccnet_buckets

    base = ("the quick brown fox jumps over the lazy dog and then "
            "the dog naps while the fox runs far away")
    rows = [(i, f"{base} v{i}", "en") for i in range(9)]
    rows.append((50, "zyx wvu tsr qpo nml kji hgf edc", "en"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string")
    out = {r.doc_id: r.bucket
           for r in ccnet_buckets(docs, group_cols=["lang"],
                                  smoothing="kn").collect()}
    assert out[50] == "tail"                   # OOD lands in the tail
    assert sum(1 for b in out.values() if b == "head") >= 3

    import pytest as _pytest
    with _pytest.raises(ValueError, match="smoothing"):
        ccnet_buckets(docs, smoothing="wb").collect()


def test_collocations_hand_computed(spark):
    """PMI on a tiny corpus: the glued phrase scores highest, a pair of
    independent frequent words scores near zero, rare pairs pruned."""
    import math

    from datapump_spark.operators.lm import collocations

    # 'san francisco' always together (x6); filler words independent
    rows = [(i, "san francisco " + " ".join(
        ["the", "cat", "the", "dog"][j % 4] for j in range(i % 3 + 2)))
            for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = collocations(docs, min_count=5, k=10).collect()
    assert out, "no collocations found"
    top = out[0]
    assert (top.w1, top.w2) == ("san", "francisco") and top.n_pair == 6
    # verify the textbook estimator on the top pair
    toks = [t for _, txt in rows for t in txt.split()]
    n = len(toks)
    c_san, c_fr = toks.count("san"), toks.count("francisco")
    want = round(math.log(6 * n / (c_san * c_fr)), 6)
    assert abs(top.pmi - want) < 1e-9
    assert all(r.n_pair >= 5 for r in out)
