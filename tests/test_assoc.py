"""Association rules: hand-computed support/confidence/lift, asymmetry,
min-support pruning, duplicate-item dedup. Oracle gate: q_assoc_rules in
test_extra_oracles."""

from __future__ import annotations

import pytest

from datapump_spark.operators.assoc import pair_rules


@pytest.fixture(scope="module")
def baskets(spark):
    # 5 baskets: A in 4, B in 3, (A,B) together in 3, C alone in 2
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"),
            (3, "A"), (3, "B"), (3, "B"),          # duplicate item
            (4, "A"), (5, "C"), (2, "C")]
    return spark.createDataFrame(rows, "bk long, item string")


def test_hand_computed_rules(baskets):
    got = {(r["antecedent"], r["consequent"]): r
           for r in pair_rules(baskets, "bk", "item",
                               min_support_count=2).collect()}
    ab = got[("A", "B")]
    assert ab["n_both"] == 3
    assert ab["support"] == round(3 / 5, 6)
    assert ab["confidence"] == round(3 / 4, 6)          # A appears in 4
    assert ab["lift"] == round((3 / 4) / (3 / 5), 6)    # B appears in 3
    ba = got[("B", "A")]
    assert ba["confidence"] == round(3 / 3, 6)          # asymmetric
    assert ba["lift"] == round(1.0 / (4 / 5), 6)
    # (A,C) co-occur once → pruned at min_support 2
    assert ("A", "C") not in got and ("C", "A") not in got


def test_min_support_and_direction_counts(baskets):
    all_rules = pair_rules(baskets, "bk", "item", min_support_count=1)
    rows = all_rules.collect()
    # every surviving unordered pair yields exactly two directed rules
    pairs = {frozenset((r["antecedent"], r["consequent"])) for r in rows}
    assert len(rows) == 2 * len(pairs)
    assert frozenset(("A", "C")) in pairs   # support 1 kept now


def test_lift_sides_agree(baskets):
    """lift is symmetric: lift(A→B) == lift(B→A) by definition."""
    got = {(r["antecedent"], r["consequent"]): r["lift"]
           for r in pair_rules(baskets, "bk", "item", 1).collect()}
    for (a, c), v in got.items():
        assert v == pytest.approx(got[(c, a)], abs=1e-6)
