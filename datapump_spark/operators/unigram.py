"""Unigram-LM tokenizer (SentencePiece unigram mode, Kudo 2018) over a
distributed corpus — the second of the two production subword families
(the other, BPE, is ``operators.bpe``; both share the same distributed
shape, so a user can train either against the same corpus).

Same scale doctrine as the BPE trainer: unigram statistics are a function
of (word type, frequency) only, so the distributed part is exactly ONE
word-count aggregation (map-side-combined shuffle, capped by
``max_word_types`` via TakeOrderedAndProject) and the EM/prune loop runs
driver-side on the count table — corpus-size-independent. Encoding is a
broadcast-model Arrow scan with per-batch word→ids memoization (Zipf makes
the memo hit rate ≈ 1); nothing shuffles.

Algorithm (faithful to Kudo §3.2, with the pruning simplification noted):

1. Seed: all substrings of word types up to ``max_piece_len``, scored by
   frequency-weighted occurrence count; top ``seed_size`` kept, single
   characters always kept (they guarantee any word segments).
2. EM rounds: E-step computes each piece's EXPECTED count over all
   segmentations of every word type via forward-backward (full EM, not
   Viterbi-hard); M-step renormalizes log-probs.
3. Prune: drop the lowest-expected-count multi-char pieces until
   ``shrink`` of the vocab remains; repeat EM+prune until ``vocab_size``.
   (SentencePiece ranks by exact likelihood loss of removal; expected
   count is the standard cheap proxy — monotone in the loss for pieces
   whose mass reroutes to their characters. Divergence documented here.)
4. Encode: Viterbi best segmentation per word (ties broken toward fewer,
   then lexicographically-earlier pieces — deterministic across runs).

Correctness gates (test_unigram): Viterbi ≡ brute-force max over all
segmentations; EM monotonically increases corpus log-likelihood on a fixed
vocab; round-trip decode; determinism under repartitioning. No SQL twin
(iterative EM) — pytest-graded, encode benched as a production variant.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from datapump_spark.operators.bpe import word_counts

UNK_ID = 0


@dataclass
class UnigramModel:
    """Driver-side tokenizer state: piece → log-probability."""

    logp: dict[str, float]
    max_piece_len: int
    vocab: list[str] = field(default_factory=list)   # index = token_id - 1
    ids: dict[str, int] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.vocab:
            self.vocab = sorted(self.logp)
        if not self.ids:
            self.ids = {s: i + 1 for i, s in enumerate(self.vocab)}

    def viterbi(self, word: str) -> list[str]:
        """Best segmentation of ``word`` into vocab pieces. Characters not
        in the vocab become single-char '?' markers (encoded as UNK).
        Deterministic tie-break: higher prob, then fewer pieces, then the
        lexicographically earlier piece ending at each position."""
        return _viterbi(word, self.logp, self.max_piece_len)


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    n = len(word)
    NEG = float("-inf")
    # best[i] = (score, n_pieces, piece_ending_here) for word[:i]
    best: list[tuple[float, int, str | None]] = [(0.0, 0, None)] + \
        [(NEG, 0, None)] * n
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = -1e9        # unknown char: huge penalty, not a wall
                else:
                    continue
            if best[j][0] == NEG:
                continue
            cand = (best[j][0] + lp, best[j][1] + 1, piece)
            cur = best[i]
            if (cand[0] > cur[0]
                    or (cand[0] == cur[0] and cand[1] < cur[1])
                    or (cand[0] == cur[0] and cand[1] == cur[1]
                        and (cur[2] is None or piece < cur[2]))):
                best[i] = cand
    if best[n][0] == NEG:
        return []                    # unreachable with the unknown-char path
    out: list[str] = []
    i = n
    while i > 0:
        piece = best[i][2]
        assert piece is not None
        out.append(piece)
        i -= len(piece)
    return out[::-1]


def _forward_backward(
    word: str, weight: int, logp: dict[str, float], max_len: int,
    expected: dict[str, float],
) -> float:
    """Accumulate ``weight`` × posterior piece counts over ALL segmentations
    of ``word`` into ``expected``; returns ``weight`` × log-likelihood.
    Unknown characters contribute via the same penalty path as Viterbi so
    every word has nonzero mass."""
    n = len(word)
    NEG = float("-inf")

    def lp_of(j: int, i: int) -> float | None:
        lp = logp.get(word[j:i])
        if lp is None and i - j == 1:
            return -1e9
        return lp

    alpha = [0.0] + [NEG] * n
    for i in range(1, n + 1):
        acc = NEG
        for j in range(max(0, i - max_len), i):
            lp = lp_of(j, i)
            if lp is None or alpha[j] == NEG:
                continue
            acc = _logadd(acc, alpha[j] + lp)
        alpha[i] = acc
    total = alpha[n]
    if total == NEG:
        return 0.0
    beta = [NEG] * n + [0.0]
    for j in range(n - 1, -1, -1):
        acc = NEG
        for i in range(j + 1, min(n, j + max_len) + 1):
            lp = lp_of(j, i)
            if lp is None or beta[i] == NEG:
                continue
            acc = _logadd(acc, lp + beta[i])
        beta[j] = acc
    for j in range(n):
        for i in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or alpha[j] == NEG or beta[i] == NEG:
                continue
            post = math.exp(alpha[j] + lp + beta[i] - total)
            expected[piece] = expected.get(piece, 0.0) + weight * post
    return weight * total


def _logadd(a: float, b: float) -> float:
    if a == float("-inf"):
        return b
    if b == float("-inf"):
        return a
    m = a if a > b else b
    return m + math.log1p(math.exp(-abs(a - b)))


def train_unigram(
    df: DataFrame, text_col: str = "text", vocab_size: int = 400,
    seed_size: int = 4000, max_piece_len: int = 6, em_iters: int = 2,
    shrink: float = 0.75, max_word_types: int = 1_000_000,
) -> UnigramModel:
    """Fit a unigram tokenizer: one distributed word count, then EM+prune
    rounds on the (word type, freq) table driver-side."""
    if not 0.0 < shrink < 1.0:
        # shrink >= 1 would keep the full multi-piece set every round and
        # loop forever; <= 0 is meaningless
        raise ValueError(f"shrink must be in (0, 1), got {shrink}")
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    wc = [(r["word"], r["cnt"]) for r in
          word_counts(df, text_col, max_word_types).collect()]

    # --- seed vocab: substring counts, chars always in -------------------
    sub_counts: dict[str, float] = {}
    for w, c in wc:
        for j in range(len(w)):
            for i in range(j + 1, min(len(w), j + max_piece_len) + 1):
                s = w[j:i]
                sub_counts[s] = sub_counts.get(s, 0.0) + c
    chars = {s for s in sub_counts if len(s) == 1}
    multis = sorted(
        ((s, c) for s, c in sub_counts.items() if len(s) > 1),
        key=lambda kv: (-kv[1], kv[0]))[:max(0, seed_size - len(chars))]
    pieces = {s: sub_counts[s] for s in chars}
    pieces.update(dict(multis))
    logp = _normalize(pieces)

    # --- EM + prune until the target size --------------------------------
    while True:
        for _ in range(max(1, em_iters)):
            expected: dict[str, float] = {}
            for w, c in wc:
                _forward_backward(w, c, logp, max_piece_len, expected)
            # keep chars alive even at ~zero mass (segmentation guarantee)
            floor = 1e-6
            new = {s: max(expected.get(s, 0.0), floor if len(s) == 1 else 0.0)
                   for s in logp}
            new = {s: c for s, c in new.items() if c > 0.0}
            logp = _normalize(new)
        n_multi = sum(1 for s in logp if len(s) > 1)
        target_multi = max(0, vocab_size - sum(1 for s in logp if len(s) == 1))
        if n_multi <= target_multi:
            break
        keep = max(target_multi, int(n_multi * shrink))
        ranked = sorted(
            ((s, math.exp(lp)) for s, lp in logp.items() if len(s) > 1),
            key=lambda kv: (-kv[1], kv[0]))[:keep]
        kept = {s for s, _ in ranked} | {s for s in logp if len(s) == 1}
        logp = _normalize({s: math.exp(lp) for s, lp in logp.items()
                           if s in kept})
    return UnigramModel(logp=logp, max_piece_len=max_piece_len)


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    total = sum(counts.values())
    return {s: math.log(c / total) for s, c in counts.items() if c > 0}


def corpus_loglik(df: DataFrame, model: UnigramModel,
                  text_col: str = "text",
                  max_word_types: int = 1_000_000) -> float:
    """Corpus log-likelihood under the model (all-segmentations marginal,
    frequency-weighted over word types) — the EM objective, exposed for
    the monotonicity gate in tests."""
    wc = [(r["word"], r["cnt"]) for r in
          word_counts(df, text_col, max_word_types).collect()]
    sink: dict[str, float] = {}
    return sum(
        _forward_backward(w, c, model.logp, model.max_piece_len, sink)
        for w, c in wc)


def unigram_encode(df: DataFrame, model: UnigramModel,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, token_ids array<int>, n_tokens, n_unk) — Viterbi-encode every
    document with the broadcast model; one Arrow scan, no shuffle. Same
    output contract as ``bpe_encode`` so the two tokenizers are
    drop-in-swappable in packing/recipe pipelines."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((model.logp, model.max_piece_len,
                                       model.ids))
    out_schema = (f"{id_col} bigint, token_ids array<int>, "
                  f"n_tokens bigint, n_unk bigint")

    def encode(batches):
        logp, max_len, ids = bc.value
        memo: dict[str, list[int]] = {}
        import re
        tok_re = re.compile(r"[^a-z0-9]+")
        for pdf in batches:
            col_ids, col_n, col_unk = [], [], []
            for text in pdf[text_col]:
                out: list[int] = []
                for w in (t for t in tok_re.split((text or "").lower())
                          if t):
                    got = memo.get(w)
                    if got is None:
                        got = [ids.get(s, UNK_ID)
                               for s in _viterbi(w, logp, max_len)]
                        memo[w] = got
                    out.extend(got)
                col_ids.append(out)
                col_n.append(len(out))
                col_unk.append(sum(1 for i in out if i == UNK_ID))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "token_ids": col_ids,
                "n_tokens": col_n,
                "n_unk": col_unk,
            })

    return df.select(id_col, text_col).mapInPandas(encode, schema=out_schema)


def unigram_decode_ids(model: UnigramModel, ids: list[int]) -> str:
    """Inverse of :func:`unigram_encode` for one word's ids (UNK → '?')."""
    return "".join(
        model.vocab[i - 1] if 1 <= i <= len(model.vocab) else "?"
        for i in ids)
