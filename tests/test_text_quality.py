

def test_script_profile_mixed_scripts(spark):
    """Counts/fractions per Unicode script: a mixed Latin/Cyrillic/Han
    doc decomposes exactly; whitespace excluded; digits and unknown
    scripts routed to their own buckets; fractions sum to ~1."""
    from datapump_spark.operators.text import script_profile

    df = spark.createDataFrame(
        [(1, "hello мир 日本語 123"),
         (2, "   "),                        # whitespace only
         (3, "παράδειγμα")],                # greek
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in script_profile(df).collect()}

    r1 = got[1]
    assert r1["n_latin"] == 5 and r1["n_cyrillic"] == 3
    assert r1["n_han"] == 3            # 日本語 is three Han chars
    assert r1["n_digit"] == 3
    assert r1["n_chars"] == 14               # whitespace stripped
    total_frac = (sum(r1[f"frac_{s}"] for s in (
        "latin", "cyrillic", "greek", "arabic", "hebrew", "han",
        "hiragana", "katakana", "hangul", "devanagari"))
        + r1["frac_digit"] + r1["frac_other"])
    assert abs(total_frac - 1.0) < 1e-4

    assert got[2]["n_chars"] == 0 and got[2]["frac_other"] == 0.0
    assert got[3]["frac_greek"] == 1.0


def test_corpus_card_aggregates(spark, sf_dir):
    """The dataset-card rollup: groups partition the corpus, dup_rate
    reflects exact-content duplicates, token totals match a direct
    count. (Value parity vs DuckDB is gated in test_extra_oracles.)"""
    from pyspark.sql import functions as F

    from datapump_spark.queries import EXTRA_QUERIES, QUERIES, _t

    # rotation-proof lookup: the card query may sit in either registry
    # depending on the driver-gate rotation (the driver caps at 50)
    card = {**QUERIES, **EXTRA_QUERIES}["q_corpus_card"](spark, sf_dir).collect()
    docs = _t(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in card) == docs.count()
    for r in card:
        assert 0.0 <= r["dup_rate"] < 1.0
        assert 0.0 <= r["avg_quality"] <= 1.0
        assert r["total_tokens"] >= r["n_docs"]  # every doc has ≥1 token


def test_readability_hand_computed(spark):
    from datapump_spark.operators.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"),
         (2, ""),                          # empty -> NULL score
         (3, "no sentence punctuation here")],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in readability(df).collect()}
    r1 = out[1]
    # words=6, sentences=2, syllables: e-a-a-e-o-a = 6 vowel groups
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
    expect = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    assert abs(r1.flesch - expect) < 1e-9
    assert out[2].flesch is None and out[2].n_words == 0
    assert out[3].n_sentences == 1          # floored, not zero


def test_card_redaction_luhn_gated(spark):
    """Luhn decides: a valid card (bare/spaced/dashed) redacts, a
    16-digit order id that fails the checksum survives untouched."""
    from datapump_spark.operators.pii import redact_cards

    rows = [
        (1, "pay with 4111111111111111 today"),          # valid visa test
        (2, "pay with 4111 1111 1111 1111 today"),       # spaced
        (3, "card 5500-0000-0000-0004 on file"),         # dashed mc test
        (4, "order 4111111111111112 shipped"),           # Luhn-invalid
        (5, "short 411111111111 number"),                # 12 digits: no hit
        (6, "no digits at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: (r.clean_text, r.n_cards)
           for r in redact_cards(df).collect()}
    assert out[1] == ("pay with [CARD] today", 1)
    assert out[2] == ("pay with [CARD] today", 1)
    assert out[3] == ("card [CARD] on file", 1)
    assert out[4] == ("order 4111111111111112 shipped", 0)
    assert out[5] == ("short 411111111111 number", 0)
    assert out[6] == ("no digits at all here", 0)
