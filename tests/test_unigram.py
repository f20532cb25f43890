"""Unigram-LM tokenizer: Viterbi vs brute force, EM monotonicity,
round-trip, determinism, encode contract."""

from __future__ import annotations

import itertools
import math

import pytest

from datapump_spark.operators.unigram import (
    UnigramModel,
    _viterbi,
    corpus_loglik,
    train_unigram,
    unigram_decode_ids,
    unigram_encode,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def model(docs):
    return train_unigram(docs, vocab_size=300, seed_size=2000,
                         max_piece_len=5, em_iters=2)


def brute_force_best(word: str, logp: dict[str, float], max_len: int):
    """All segmentations by exhaustive cut enumeration — the independent
    oracle for Viterbi."""
    n = len(word)
    best, best_score = None, float("-inf")
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pieces, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                pieces.append(word[start:i]); start = i
        pieces.append(word[start:])
        if any(len(p) > max_len for p in pieces):
            continue
        score = 0.0
        for p in pieces:
            lp = logp.get(p)
            if lp is None:
                if len(p) == 1:
                    lp = -1e9
                else:
                    score = None; break
            score += lp
        if score is not None and score > best_score:
            best, best_score = pieces, score
    return best, best_score


def test_viterbi_equals_brute_force(model):
    words = ["the", "quick", "data", "pipeline", "zzqx", "a",
             "test", "stream", "xylophone"]
    for w in words:
        v = _viterbi(w, model.logp, model.max_piece_len)
        bf, bf_score = brute_force_best(w, model.logp, model.max_piece_len)
        v_score = sum(model.logp.get(p, -1e9) for p in v)
        assert bf is not None
        assert math.isclose(v_score, bf_score, rel_tol=1e-12), (w, v, bf)
        assert "".join(v) == w          # lossless


def test_vocab_contract(model):
    chars = [s for s in model.vocab if len(s) == 1]
    multis = [s for s in model.vocab if len(s) > 1]
    assert len(model.vocab) <= 300
    assert chars  # single chars always survive pruning
    # probabilities normalized
    assert math.isclose(sum(math.exp(lp) for lp in model.logp.values()),
                        1.0, rel_tol=1e-9)
    # frequent words survive as whole pieces in a text corpus
    assert any(len(s) >= 3 for s in multis)


def test_invalid_hyperparameters_rejected(docs):
    """shrink >= 1 would keep the full multi-piece set every prune round
    and loop forever — validated up front, as is a nonsensical vocab."""
    import pytest as _pytest
    for bad in (1.0, 1.5, 0.0, -0.5):
        with _pytest.raises(ValueError, match="shrink"):
            train_unigram(docs, vocab_size=300, shrink=bad)
    with _pytest.raises(ValueError, match="vocab_size"):
        train_unigram(docs, vocab_size=0)


def test_em_improves_loglik(docs):
    m1 = train_unigram(docs, vocab_size=300, seed_size=2000,
                       max_piece_len=5, em_iters=1)
    # one extra EM round on the same seed/prune path must not hurt the
    # objective (EM is monotone on a fixed vocab; pruning resets are
    # shared because the schedule is identical)
    m2 = train_unigram(docs, vocab_size=300, seed_size=2000,
                       max_piece_len=5, em_iters=3)
    ll1 = corpus_loglik(docs, m1)
    ll2 = corpus_loglik(docs, m2)
    assert ll2 >= ll1 - 1e-6, (ll1, ll2)


def test_train_determinism(docs, model):
    again = train_unigram(docs, vocab_size=300, seed_size=2000,
                          max_piece_len=5, em_iters=2)
    assert again.vocab == model.vocab
    assert all(math.isclose(again.logp[s], model.logp[s], rel_tol=1e-12)
               for s in model.logp)
    # layout-independent: same model from a repartitioned corpus
    re = train_unigram(docs.repartition(7), vocab_size=300, seed_size=2000,
                       max_piece_len=5, em_iters=2)
    assert re.vocab == model.vocab


def test_encode_contract_and_roundtrip(spark, docs, model):
    # build the round-trip text from the corpus itself so every character
    # is in the trained alphabet (the synthetic docs don't cover a-z)
    sample_text = docs.limit(1).collect()[0]["text"]
    words = [w for w in sample_text.lower().split() if w.isalnum()][:5]
    assert words
    unk_chars = sorted(set("abcdefghijklmnopqrstuvwxyz")
                       - {s for s in model.vocab if len(s) == 1})
    assert unk_chars, "corpus covers all of a-z; pick another unk probe"
    unk_word = unk_chars[0] * 2
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, ""), (3, None), (4, unk_word)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_encode(df, model).collect()}
    assert rows[2]["n_tokens"] == 0 and rows[3]["n_tokens"] == 0
    assert rows[1]["n_tokens"] > 0
    # round-trip word-by-word (spaces are the pre-tokenizer's, not ours)
    decoded = unigram_decode_ids(model, rows[1]["token_ids"])
    assert decoded == "".join(words)
    assert rows[1]["n_unk"] == 0
    # out-of-alphabet chars surface as UNK, they never crash the scan
    assert rows[4]["n_unk"] == rows[4]["n_tokens"] > 0


def test_encode_bpe_contract_parity(docs, model):
    """Same output schema as bpe_encode — drop-in swap in pipelines."""
    from datapump_spark.operators.bpe import bpe_encode, train_bpe
    b = bpe_encode(docs.limit(10), train_bpe(docs.limit(50), n_merges=20))
    u = unigram_encode(docs.limit(10), model)
    assert b.schema == u.schema
