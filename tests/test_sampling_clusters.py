"""Tests for deterministic sampling ops and connected-components clustering."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.sampling import (
    group_cap, hash_fraction_filter, shard_assign, temperature_mix,
    weighted_mix,
)
from datapump_spark.operators.dedup_fuzzy import connected_components


def test_hash_fraction_nested(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    small = {r["doc_id"] for r in hash_fraction_filter(docs, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in hash_fraction_filter(docs, "doc_id", 0.5).collect()}
    assert small <= big           # nested: 10% sample ⊂ 50% sample
    n = docs.count()
    assert 0 < len(small) < len(big) < n


def test_group_cap(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = group_cap(docs, "source", "doc_id", 3)
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in per)
    # lowest doc_ids kept within each group
    first = capped.where(F.col("source") == "src0").select("doc_id").collect()
    want = (docs.where(F.col("source") == "src0")
            .orderBy("doc_id").limit(3).select("doc_id").collect())
    assert {r["doc_id"] for r in first} == {r["doc_id"] for r in want}


def test_shard_assign_stable_and_complete(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {(r["doc_id"], r["shard"]) for r in shard_assign(docs, "doc_id", 4).collect()}
    b = {(r["doc_id"], r["shard"]) for r in
         shard_assign(docs.repartition(7), "doc_id", 4).collect()}
    assert a == b                 # invariant to partition layout
    assert {s for _, s in a} <= set(range(4))


def test_weighted_mix_rates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = weighted_mix(docs, "source", {"src0": 1.0, "src1": 0.0}, "doc_id")
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert srcs == {"src0"}       # weight 1.0 keeps all, 0.0 and absent drop all
    n_src0 = docs.where(F.col("source") == "src0").count()
    assert out.count() == n_src0


def test_temperature_mix_rebalances(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before = {r["lang"]: r["count"] for r in
              docs.groupBy("lang").count().collect()}
    out = temperature_mix(docs, "lang", "doc_id", alpha=0.5)
    after = {r["lang"]: r["count"] for r in
             out.groupBy("lang").count().collect()}
    n_min = min(before.values())
    smallest = min(before, key=before.get)
    # the smallest group is kept whole; larger groups hit ~sqrt share
    assert after[smallest] == before[smallest]
    for lang, n in before.items():
        expect = (n_min / n) ** 0.5 * n
        assert abs(after[lang] - expect) <= max(10, 0.35 * expect)
    # alpha=1 is identity (every threshold = 10000)
    assert temperature_mix(docs, "lang", "doc_id", alpha=1.0).count() \
        == docs.count()


@pytest.mark.parametrize("cap", [2_000_000, 0])  # driver union-find / iterative
def test_connected_components_hand_graph(spark, cap):
    # components: {1,2,3} (chain), {4,5}, singleton {6}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a bigint, id_b bigint")
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id bigint")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs, nodes,
                                         driver_edge_cap=cap).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_connected_components_raises_on_nonconvergence(spark):
    # a 5-node chain has diameter 4; max_iters=1 cannot converge
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], "id_a bigint, id_b bigint")
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id bigint")
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="did not converge"):
        # driver_edge_cap=0 forces the iterative distributed path
        connected_components(pairs, nodes, max_iters=1, driver_edge_cap=0)


def test_canonical_docs_hand_graph(spark):
    from datapump_spark.operators.dedup_fuzzy import canonical_docs

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id bigint, cluster_id bigint")
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.5), (6, 0.5)],
        "doc_id bigint, quality double")
    out = {r.cluster_id: (r.doc_id, r.quality, r.cluster_size)
           for r in canonical_docs(clusters, scores).collect()}
    assert out[1] == (2, 0.9, 3)   # best quality wins; tie -> lowest id
    assert out[4] == (4, 0.1, 1)   # singleton keeps itself
    assert out[5] == (5, 0.5, 2)   # pure tie -> lowest id


def test_quality_binned_mix(spark):
    from pyspark.sql import functions as F

    from datapump_spark.operators.sampling import quality_binned_mix

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
        (F.col("id") * 37 % 101).cast("double").alias("score"))
    rates = [0.05, 0.5, 1.0]
    out = quality_binned_mix(df, "score", rates, by="source").cache()
    rows = out.collect()
    assert set(r["bin"] for r in rows) <= {0, 1, 2}
    # top bin kept whole, bottom decimated: survivor counts must be
    # strictly increasing across bins (populations are equal by design)
    per_bin = {r["bin"]: r["cnt"] for r in
               out.groupBy("bin").agg(F.count("*").alias("cnt")).collect()}
    assert per_bin[2] > per_bin[1] > per_bin.get(0, 0)
    # bin 2 ≈ a third of the corpus (rate 1.0, equal-population bins)
    assert abs(per_bin[2] - 1000 / 3) < 40
    # deterministic + layout-independent
    again = quality_binned_mix(df.repartition(13), "score", rates,
                               by="source").collect()
    key = lambda r: (r["doc_id"], r["bin"])
    assert sorted(map(key, rows)) == sorted(map(key, again))
    out.unpersist()


def test_quality_binned_mix_validates_rates(spark):
    import pytest as _pt

    from datapump_spark.operators.sampling import quality_binned_mix

    df = spark.range(3).select(F.col("id").alias("doc_id"),
                               F.col("id").cast("double").alias("s"))
    with _pt.raises(ValueError):
        quality_binned_mix(df, "s", [1.5])


def test_token_budget_mix_contract(spark):
    """Per-source token budgets: strict (never exceeded), hash-prefix
    nested across budgets, oversize docs dropped, unknown sources
    dropped, layout-independent."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datapump_spark.operators.sampling import token_budget_mix

    rows = [(i, "a", "word " * (10 if i % 2 else 20)) for i in range(40)]
    rows += [(100 + i, "b", "tok " * 5) for i in range(40)]
    rows += [(200, "c", "never picked")]          # source without a weight
    rows += [(300, "a", "x " * 10_000)]           # bigger than a's budget
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    weights = {"a": 0.5, "b": 0.5}
    out = token_budget_mix(df, "source", weights, 400, "doc_id").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) <= {"a", "b"}
    for src, budget in (("a", 200), ("b", 200)):
        assert sum(r["n_tok"] for r in by_src.get(src, [])) <= budget
    assert 300 not in {r["doc_id"] for r in out}   # oversize doc dropped
    assert out                                      # something selected

    # nested property: half the budget selects a subset
    small = {r["doc_id"] for r in
             token_budget_mix(df, "source", weights, 200, "doc_id").collect()}
    assert small <= {r["doc_id"] for r in out}

    again = {r["doc_id"] for r in
             token_budget_mix(df.repartition(7), "source", weights, 400,
                              "doc_id").collect()}
    assert again == {r["doc_id"] for r in out}
    with _pytest.raises(ValueError, match="budget_tokens"):
        token_budget_mix(df, "source", weights, 0, "doc_id")


def test_curriculum_order_exact_properties(spark, sf_dir):
    """Stages are contiguous signal quantiles (easy→hard), ord is a
    1..|stage| permutation, and the layout is partition-independent."""
    from datapump_spark.operators.sampling import curriculum_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "n_chars")
    out = curriculum_order(docs, "n_chars", n_stages=4).collect()
    by_stage = {}
    for r in out:
        by_stage.setdefault(r["stage"], []).append(r)
    assert set(by_stage) == {1, 2, 3, 4}
    # quantile contiguity: every signal in stage s <= every one in s+1
    for s in (1, 2, 3):
        assert (max(r["n_chars"] for r in by_stage[s])
                <= min(r["n_chars"] for r in by_stage[s + 1]))
    for rows in by_stage.values():
        assert sorted(r["ord"] for r in rows) == list(range(1, len(rows) + 1))
    # deterministic across layout
    again = curriculum_order(docs.repartition(7), "n_chars", 4).collect()
    key = lambda r: (r["doc_id"], r["stage"], r["ord"])
    assert sorted(map(key, again)) == sorted(map(key, out))


def test_curriculum_order_approx_scale_path(spark, sf_dir):
    """The 100 TB profile: no global-sort NTILE in the plan, stages
    agree with exact within the quantile-sketch tolerance."""
    from datapump_spark.operators.sampling import curriculum_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "n_chars")
    exact = {r["doc_id"]: r["stage"] for r in
             curriculum_order(docs, "n_chars", 4).collect()}
    approx_df = curriculum_order(docs, "n_chars", 4, strategy="approx")
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan
    approx = {r["doc_id"]: r["stage"] for r in approx_df.collect()}
    off = sum(1 for k in exact if abs(exact[k] - approx[k]) > 1)
    assert off == 0, f"{off} docs more than one stage off"
    agree = sum(1 for k in exact if exact[k] == approx[k]) / len(exact)
    assert agree > 0.95, agree


def test_curriculum_order_descending_and_validation(spark):
    from datapump_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame([(i, float(i)) for i in range(8)],
                               "doc_id long, sig double")
    desc = curriculum_order(df, "sig", 2, ascending=False).collect()
    stage_of = {r["doc_id"]: r["stage"] for r in desc}
    assert all(stage_of[i] == 1 for i in range(4, 8))   # hard first
    assert all(stage_of[i] == 2 for i in range(0, 4))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_stages"):
        curriculum_order(df, "sig", 0)
    with _pytest.raises(ValueError, match="strategy"):
        curriculum_order(df, "sig", 2, strategy="bogus")
