"""Unigram-LM tokenizer training and encoding (Kudo, "Subword
Regularization", ACL 2018 — the SentencePiece unigram model used by
T5/LLaMA-family tokenizers; the OTHER real-world subword algorithm next
to ``llm/bpe.py``'s BPE).

Training = EM over the word-frequency dictionary:

1. ONE corpus aggregation builds the distinct-word dict with counts
   (identical shape to BPE training — classic subword trainers never
   touch the raw corpus again; Heaps' law bounds the dict).
2. Seed vocabulary: all substrings of length ≤ ``SEED_MAX_LEN`` counted
   corpus-wide (occurrences × word freq, one explode + hash agg), the
   top ``VOCAB_EXTRA`` multi-char pieces by (count, piece) plus EVERY
   single character (coverage guarantee: any word segments).
3. ``EM_ROUNDS`` rounds: the E-step runs per distinct word in an
   Arrow-batched ``mapInPandas`` (forward–backward over the word's
   segmentation lattice under current piece probs; pure function of
   (word, vocab) — embarrassingly parallel), emitting freq-weighted
   expected piece counts; the M-step is one hash agg + a
   vocab-sized driver read (≤ |vocab| rows — the bounded argmax-read
   discipline of BPE training) that renormalizes probabilities for the
   next round's closure.

Scale posture: per round, one Arrow pass over the word dict + one
|vocab|-bounded agg; no shuffle grows with the corpus. Registry keys
are rows-only: expected counts are float sums whose partition order
varies, so cross-engine hash equality is not defined (same
justification as the training-loss keys); the full EM is pinned
against a from-scratch pure-Python implementation in
tests/test_round5.py instead, and piece-set/row-count invariants hold
exactly.

``tokenizer_unigram_encode``: Viterbi best segmentation per word under
the trained probabilities (deterministic tie-break: at equal
log-likelihood prefer the longer last piece, then lexicographic),
emitting per-document token statistics — the unigram twin of
``tokenizer_bpe_encode``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.sources.tables import load_table

SEED_MAX_LEN = 4
VOCAB_EXTRA = 48  # multi-char pieces kept beyond the single-char floor
EM_ROUNDS = 3


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    return words.groupBy("word").agg(F.count("*").cast("long").alias("freq"))


def _seed_vocab(wf: DataFrame) -> DataFrame:
    """Corpus-wide substring counts (length ≤ SEED_MAX_LEN), freq-weighted."""
    subs = F.expr(
        f"""flatten(transform(sequence(1, length(word)),
              i -> transform(sequence(i, least(length(word), i + {SEED_MAX_LEN - 1})),
                     j -> substring(word, i, j - i + 1))))"""
    )
    return (
        wf.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _em_round(wf: DataFrame, vocab: dict[str, float]) -> list[tuple[str, float]]:
    """One E-step over the word dict (Arrow batches) + M-step driver
    read; returns the renormalized (piece, prob) table (|vocab| rows)."""
    items = sorted(vocab.items())
    pieces = [p for p, _ in items]
    probs = [pr for _, pr in items]
    max_len = max(len(p) for p in pieces)

    def estep(batches):
        # defined inside the round (pickled by value with its closure) —
        # executors never import this module (foreign-cwd driver rule)
        from collections import defaultdict

        import pandas as pd

        pv = dict(zip(pieces, probs))
        acc: dict[str, float] = defaultdict(float)
        for pdf in batches:
            for word, freq in zip(pdf["word"], pdf["freq"]):
                n = len(word)
                alpha = [0.0] * (n + 1)
                alpha[0] = 1.0
                for i in range(1, n + 1):
                    a = 0.0
                    for j in range(max(0, i - max_len), i):
                        pr = pv.get(word[j:i])
                        if pr:
                            a += alpha[j] * pr
                    alpha[i] = a
                if alpha[n] == 0.0:
                    continue  # unreachable with single-char coverage
                beta = [0.0] * (n + 1)
                beta[n] = 1.0
                for i in range(n - 1, -1, -1):
                    b = 0.0
                    for j in range(i + 1, min(n, i + max_len) + 1):
                        pr = pv.get(word[i:j])
                        if pr:
                            b += pr * beta[j]
                    beta[i] = b
                z = alpha[n]
                for i in range(n):
                    for j in range(i + 1, min(n, i + max_len) + 1):
                        pr = pv.get(word[i:j])
                        if pr:
                            acc[word[i:j]] += freq * alpha[i] * pr * beta[j] / z
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "ec": list(acc.values())}
            )
            acc = defaultdict(float)

    out = wf.mapInPandas(estep, schema="piece string, ec double")
    rows = (
        out.groupBy("piece").agg(F.sum("ec").alias("ec")).collect()
    )  # ≤ |vocab| rows — bounded driver read
    total = sum(r["ec"] for r in rows)
    return [(r["piece"], r["ec"] / total) for r in rows]


def _train(spark: SparkSession, sf_dir: str) -> list[tuple[str, float]]:
    wf = _word_freqs(spark, sf_dir).localCheckpoint()
    seed = _seed_vocab(wf)
    chars = seed.filter(F.length("piece") == 1)
    multi = (
        seed.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(VOCAB_EXTRA)
    )
    rows = chars.unionByName(multi).collect()  # |vocab|-bounded read
    total = sum(r["cnt"] for r in rows)
    vocab = {r["piece"]: r["cnt"] / total for r in rows}
    for _ in range(EM_ROUNDS):
        vocab = dict(_em_round(wf, vocab))
    return sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))


def tokenizer_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained unigram vocabulary: (rank, piece, prob) — rows-only (float
    partial-sum order; module docstring), EM pinned vs pure Python."""
    trained = _train(spark, sf_dir)
    return spark.createDataFrame(
        [(i + 1, p, round(pr, 6)) for i, (p, pr) in enumerate(trained)],
        schema="rank long, piece string, prob double",
    )


def tokenizer_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi-encode every document with the trained unigram model;
    per-doc (n_words, n_tokens, chars_per_token) — the unigram twin of
    tokenizer_bpe_encode. Rows-only (inherits training's float sums)."""
    trained = _train(spark, sf_dir)
    pieces = [p for p, _ in trained]
    logps = [math.log(pr) for _, pr in trained]
    max_len = max(len(p) for p in pieces)

    def encode(batches):
        import pandas as pd

        lp = dict(zip(pieces, logps))
        NEG = float("-inf")
        for pdf in batches:
            doc_ids, n_words_l, n_toks_l, n_chars_l = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in text.split(" ") if w]
                n_tok = 0
                n_chars = 0
                for w in words:
                    n = len(w)
                    best = [NEG] * (n + 1)
                    blen = [0] * (n + 1)  # length of best last piece
                    bcnt = [0] * (n + 1)
                    best[0] = 0.0
                    for i in range(1, n + 1):
                        for j in range(max(0, i - max_len), i):
                            pr = lp.get(w[j:i])
                            if pr is None or best[j] == NEG:
                                continue
                            cand = best[j] + pr
                            # tie-break: longer last piece wins
                            if cand > best[i] or (
                                cand == best[i] and i - j > blen[i]
                            ):
                                best[i] = cand
                                blen[i] = i - j
                                bcnt[i] = bcnt[j] + 1
                    n_tok += bcnt[n]
                    n_chars += n
                doc_ids.append(doc_id)
                n_words_l.append(len(words))
                n_toks_l.append(n_tok)
                n_chars_l.append(n_chars)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "n_words": n_words_l,
                    "n_tokens": n_toks_l,
                    "chars_per_token": [
                        round(c / t, 4) if t else 0.0
                        for c, t in zip(n_chars_l, n_toks_l)
                    ],
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(
        encode,
        schema="doc_id long, n_words long, n_tokens long, chars_per_token double",
    ).orderBy("doc_id")


QUERIES = {
    "tokenizer_unigram_train": tokenizer_unigram_train,
    "tokenizer_unigram_encode": tokenizer_unigram_encode,
}
ORACLE: dict[str, str] = {}  # rows-only: float partial-sum order (docstring)
