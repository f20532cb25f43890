"""Learned quality classifier: logistic regression, Spark-first.

Beyond the reference (the reference has no ML surface, SURVEY §2.9): a
CCNet/fastText-style learned quality filter over document features.

Scale design (the three pieces a 100 TB run needs):

- :func:`featurize` — per-document numeric features as pure column
  expressions: whole-stage codegen, zero shuffle, column-pruned to
  (id, text). Runs at scan speed.
- :func:`score_logreg` — ``sigmoid(w·x + b)`` as a native expression.
  Weights are literals folded into the plan (no broadcast needed, no
  Python in the hot path); scoring 100 TB is a map over the scan.
- :func:`train_logreg` — batch gradient descent where **each iteration is
  ONE global aggregate**: executors compute map-side partial sums of the
  per-row gradient terms ``(σ(w·x)−y)·x_j``, and only the
  (n_features+2)-vector of sums reaches the driver. Driver state is
  O(features), independent of corpus size — the same shape MLlib's
  LogisticRegression uses (treeAggregate of gradient partials). The
  featurized input is persisted once so the text is not re-scanned per
  iteration.

Determinism: features are exact expressions; the only float
order-sensitivity is the gradient double-sum (~1e-12 relative), far below
the round-6 quantum used by the scoring oracle.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapump_spark.functions.hashing import tokens
from datapump_spark.operators.text import STOPWORDS

# Feature order is part of the contract (weights are positional).
FEATURE_NAMES = (
    "log1p_tokens",   # ln(1 + whitespace-token count): enough content
    "alpha_ratio",    # alphabetic chars / chars: not markup or noise
    "stop_ratio",     # stopword hits / tokens: natural-language-ness
    "digit_ratio",    # digit chars / chars: tables & logs score high here
    "mean_word_len",  # avg token length: gibberish drifts off [3, 10]
)

# Pinned reference weights: the direction each signal pushes (long, alpha-
# dense, stopword-bearing text up; digit-heavy and long-token text down).
# train_logreg learns weights of this shape from labels; the pinned copy
# keeps q_quality_logreg deterministic for the oracle gate.
DEFAULT_WEIGHTS = (0.55, 2.0, 3.0, -4.0, -0.12)
DEFAULT_BIAS = -3.5


def _feature_exprs(text_col: str) -> list[Column]:
    """The feature expressions, aliased per FEATURE_NAMES."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    nz_tok = F.greatest(n_tok, F.lit(1))
    nz_chars = F.greatest(F.length(c), F.lit(1))
    stop_arr = F.lit(list(STOPWORDS))
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    tok_chars = F.aggregate(toks, F.lit(0).cast("bigint"),
                            lambda acc, x: acc + F.length(x))
    feats = {
        "log1p_tokens": F.log1p(n_tok.cast("double")),
        "alpha_ratio": F.length(F.regexp_replace(c, "[^A-Za-z]", "")) / nz_chars,
        "stop_ratio": stop_hits / nz_tok,
        "digit_ratio": F.length(F.regexp_replace(c, "[^0-9]", "")) / nz_chars,
        "mean_word_len": tok_chars / nz_tok,
    }
    return [feats[n].cast("double").alias(n) for n in FEATURE_NAMES]


def featurize(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, log1p_tokens, alpha_ratio, stop_ratio, digit_ratio,
    mean_word_len). Pure column expressions — scan-speed."""
    return df.select(F.col(id_col), *_feature_exprs(text_col))


def _margin(weights, bias) -> Column:
    z = F.lit(float(bias))
    for name, w in zip(FEATURE_NAMES, weights):
        z = z + F.lit(float(w)) * F.col(name)
    return z


def score_logreg(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 weights=DEFAULT_WEIGHTS, bias: float = DEFAULT_BIAS,
                 threshold: float = 0.5) -> DataFrame:
    """(id, prob, keep): σ(w·x+b) with a keep verdict at ``threshold``.

    Documents are never dropped here — mirrors gopher_filter's contract:
    ``keep`` is a column so rejects can route to a quarantine corpus.
    """
    feat = featurize(df, id_col, text_col)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(weights, bias)))
    return feat.select(
        F.col(id_col),
        F.round(prob, 6).alias("prob"),
        (F.round(prob, 6) >= F.lit(threshold)).alias("keep"),
    )


@dataclass
class LogregModel:
    weights: tuple
    bias: float
    n_rows: int
    loss_curve: tuple  # mean log-loss after each iteration


def train_logreg(df: DataFrame, label_col: str, text_col: str = "text",
                 lr: float = 0.5, iters: int = 30,
                 l2: float = 0.0, standardize: bool = False) -> LogregModel:
    """Batch GD: one global aggregate per iteration (see module docstring).

    ``label_col`` must be 0/1 (castable to double). Returns the learned
    model; feed ``model.weights``/``model.bias`` to :func:`score_logreg`.

    ``standardize=True`` whitens features first (one extra aggregate for
    mean/std) so GD is well-conditioned at any feature scale, then folds
    the scaling back into the returned weights — callers always score on
    RAW features.
    """
    base = df.select(F.col(label_col).cast("double").alias("__y"),
                     *_feature_exprs(text_col)).persist()
    try:
        n = base.count()  # materializes the persist; also the GD divisor
        if n == 0:
            raise ValueError("train_logreg: empty input")
        mu = {name: 0.0 for name in FEATURE_NAMES}
        sd = {name: 1.0 for name in FEATURE_NAMES}
        if standardize:
            stats = base.agg(
                *[F.avg(name).alias(f"m_{name}") for name in FEATURE_NAMES],
                *[F.stddev_pop(name).alias(f"s_{name}") for name in FEATURE_NAMES],
            ).collect()[0]
            mu = {name: stats[f"m_{name}"] for name in FEATURE_NAMES}
            sd = {name: (stats[f"s_{name}"] or 0.0) or 1.0
                  for name in FEATURE_NAMES}
            scaled = base.select(
                "__y",
                *[((F.col(name) - F.lit(mu[name])) / F.lit(sd[name])).alias(name)
                  for name in FEATURE_NAMES],
            ).persist()
            base.unpersist()
            base = scaled
            base.count()
        w = [0.0] * len(FEATURE_NAMES)
        b = 0.0
        losses = []
        for _ in range(iters):
            z = _margin(w, b)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("__y")
            aggs = [F.sum(err * F.col(name)).alias(f"g_{name}")
                    for name in FEATURE_NAMES]
            aggs.append(F.sum(err).alias("g_bias"))
            # log-loss via softplus: ln(1+e^−|z|) + max(z,0) − y·z is
            # stable in both tails (no exp overflow under ANSI mode)
            aggs.append(F.sum(F.log1p(F.exp(-F.abs(z)))
                              + F.greatest(z, F.lit(0.0))
                              - F.col("__y") * z).alias("loss"))
            row = base.agg(*aggs).collect()[0]
            w = [wj - lr * (row[f"g_{name}"] / n + l2 * wj)
                 for wj, name in zip(w, FEATURE_NAMES)]
            b -= lr * row["g_bias"] / n
            losses.append(row["loss"] / n)
        # fold standardization back: score raw x with w/sd, b − Σ w·mu/sd
        w_raw = [wj / sd[name] for wj, name in zip(w, FEATURE_NAMES)]
        b_raw = b - sum(wj * mu[name] / sd[name]
                        for wj, name in zip(w, FEATURE_NAMES))
        return LogregModel(tuple(w_raw), b_raw, n, tuple(losses))
    finally:
        base.unpersist()


def sigmoid(x: float) -> float:
    """Driver-side σ for tests/reference math (overflow-safe)."""
    if x >= 0:
        return 1.0 / (1.0 + math.exp(-x))
    e = math.exp(x)
    return e / (1.0 + e)
