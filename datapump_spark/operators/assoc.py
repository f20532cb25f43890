"""Association-rule mining over basket data — pairwise support /
confidence / lift (the Agrawal-Srikant market-basket classic, restricted
to 2-itemsets, which is what production co-occurrence analyses actually
ship: "users who bought A bought B", related-items panels, co-crawl
domain affinities).

Spark-first shape: ONE self-join on the basket id generates candidate
pairs (never an item-domain cross product), guarded by a min-support
count pushed into the pair aggregation; the deduped basket-item frame
is persisted (r12) so the basket count, item supports and both join
sides read one materialization; item stats meet the pairs through
broadcast joins (they are vocabulary-sized, baskets are the big table).
All statistics are ratios of exact integer counts — engine-identical to
the 6-dp rounding, hence fully oracle-twinnable.

At 100 TB: the self-join shuffles on basket id (the natural key the data
arrives clustered by); skewed mega-baskets are the one hazard — cap
basket size upstream (a basket with 10⁴ items contributes 10⁸ pairs and
no analytic value; the cap is the standard fix).

Reference parity: absent in the reference; SURVEY §7 extended analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapump_spark.cachescope import scoped_persist


def pair_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_count: int = 2,
) -> DataFrame:
    """(antecedent, consequent, n_both, support, confidence, lift) for
    every ordered item pair co-occurring in ≥ ``min_support_count``
    baskets. Both directions are emitted (confidence is asymmetric);
    support/confidence/lift are the textbook definitions on distinct
    baskets (duplicate items within a basket count once)."""
    # The deduped basket-item table feeds the basket count, the item
    # supports, and both sides of the self-join. ReusedExchange cannot
    # cover all four consumers (the post-pruning subplans differ and the
    # self-join re-keys by basket, not (basket, item)), so persist the
    # two-column frame once instead of re-running the distinct per
    # consumer (r12, guide §1.2/§5; measured 26-Exchange plan before).
    # REJECTED r12 variant (kept as a warning): generating the ordered
    # pairs per row from groupBy(b).collect_set + a nested
    # transform/element_at comprehension removes two exchanges on paper
    # but measured 4x SLOWER end-to-end — higher-order functions are
    # interpreted per element, while the codegen'd self-join stream
    # stays vectorized (the same trade documented in fuzzy_join.py and
    # the lsh_topk round notes).
    b = scoped_persist(df.select(
        F.col(basket_col).alias("b"),
        F.col(item_col).alias("item")).distinct())
    nb = b.agg(F.countDistinct("b").cast("double").alias("__nb"))
    items = b.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item"))
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(y, "b")
        .where(F.col("x.item") < F.col("y.item"))
        .groupBy(F.col("x.item").alias("a"), F.col("y.item").alias("c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .where(F.col("n_both") >= min_support_count)
    )
    # both rule directions from ONE pass over the pair aggregate (a
    # union would re-run the self-join for each branch)
    directed = pairs.select(F.explode(F.array(
        F.struct(F.col("a").alias("antecedent"),
                 F.col("c").alias("consequent"), F.col("n_both")),
        F.struct(F.col("c").alias("antecedent"),
                 F.col("a").alias("consequent"), F.col("n_both")),
    )).alias("r")).select("r.*")
    out = (
        directed
        .join(F.broadcast(items.withColumnRenamed("item", "antecedent")
                          .withColumnRenamed("n_item", "n_ante")),
              "antecedent")
        .join(F.broadcast(items.withColumnRenamed("item", "consequent")
                          .withColumnRenamed("n_item", "n_cons")),
              "consequent")
        .crossJoin(F.broadcast(nb))
    )
    return out.select(
        "antecedent", "consequent", "n_both",
        F.round(F.col("n_both") / F.col("__nb"), 6).alias("support"),
        F.round(F.col("n_both") / F.col("n_ante"), 6).alias("confidence"),
        F.round((F.col("n_both") / F.col("n_ante"))
                / (F.col("n_cons") / F.col("__nb")), 6).alias("lift"),
    )
