"""Multinomial Naive Bayes language classifier — trained AND scored as
pure relational plans (SURVEY.md north-star text analysis: the
fastText-style lightweight classifier every LLM curation pipeline runs
for language-ID / quality routing, here with the training pass itself
distributed and oracle-checked).

* ``ml_nb_train`` — fit on the deterministic train split
  (pmod(doc_id, 10) < 8 — the ``graph/train.py`` A3 splitter applied to
  documents): class log-priors ln(docs_c/docs) and per-token Laplace-
  smoothed log-likelihoods ln((cnt(w,c)+1)/(cnt(c)+V)). Training is two
  hash aggregations over the exploded token stream plus a |V|-sized
  vocabulary count — fully distributed, no driver-side model object.
  Output: each class's top ``TOP_TOKENS`` most-likely tokens
  (deterministic tie-break) + the prior, i.e. the inspectable head of
  the model.
* ``ml_nb_score`` — classify the HELD-OUT split with the model joined
  in relationally: per (doc, class) score = log-prior + Σ_token
  log-likelihood (unseen tokens take the smoothed floor
  ln(1/(cnt(c)+V)) via the left-join default), argmax per doc with a
  deterministic class tie-break, plus a correctness flag against the
  fixture's true lang. Scores are rounded to 6 dp before the argmax so
  sum-order last-ulp differences cannot flip near-ties across engines.

Scale posture: the model is a (vocab × classes) table — Heaps'-law
sublinear in the corpus, broadcast-gated into the scoring join
(``maybe_broadcast``); the scoring pass is explode → join → one
(doc, class) hash agg → one ranking window, all JVM. Training never
moves anything bigger than the token-count aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.plans.hints import maybe_broadcast
from flink_streaming_gnn_spark.sources.tables import load_table

SPLIT_MOD = 10
TRAIN_PARTS = 8  # pmod(doc_id, 10) < 8 → train; else score
TOP_TOKENS = 10


def _train_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(
        F.pmod("doc_id", F.lit(SPLIT_MOD)) < TRAIN_PARTS
    )
    return d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))


def _model(spark: SparkSession, sf_dir: str):
    """(likelihood df [lang, token, loglik], class df [lang, logprior,
    n_tokens_c], vocab-size 1-row df)."""
    toks = _train_tokens(spark, sf_dir)
    vocab = toks.select("token").distinct().agg(F.count("*").alias("v"))
    cls_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.pmod("doc_id", F.lit(SPLIT_MOD)) < TRAIN_PARTS)
        .groupBy("lang")
        .agg(F.count("*").alias("docs_c"))
    )
    total = cls_docs.agg(F.sum("docs_c").alias("docs"))
    classes = (
        cls_docs.crossJoin(F.broadcast(total))
        .select("lang", F.log(F.col("docs_c") / F.col("docs")).alias("logprior"))
    )
    cls_tok = toks.groupBy("lang").agg(F.count("*").alias("cnt_c"))
    counts = toks.groupBy("lang", "token").agg(F.count("*").alias("cnt"))
    lik = (
        counts.join(maybe_broadcast(cls_tok), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "token",
            F.log((F.col("cnt") + 1) / (F.col("cnt_c") + F.col("v"))).alias("loglik"),
        )
    )
    floor = (
        cls_tok.crossJoin(F.broadcast(vocab))
        .select("lang", F.log(F.lit(1.0) / (F.col("cnt_c") + F.col("v"))).alias("floor"))
    )
    return lik, classes, floor


def ml_nb_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    lik, classes, _ = _model(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.col("loglik").desc(), F.col("token"))
    return (
        lik.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_TOKENS)
        .join(maybe_broadcast(classes), "lang")
        .select(
            "lang",
            "rank",
            "token",
            F.round("loglik", 6).alias("loglik"),
            F.round("logprior", 6).alias("logprior"),
        )
        .orderBy("lang", "rank")
    )


def _per_class_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, true_lang, lang, score): every held-out doc scored
    against every class — the shared upstream of scoring, confusion
    metrics and calibration."""
    lik, classes, floor = _model(spark, sf_dir)
    test = (
        load_table(spark, sf_dir, "documents")
        .filter(F.pmod("doc_id", F.lit(SPLIT_MOD)) >= TRAIN_PARTS)
        .select("doc_id", F.col("lang").alias("true_lang"), "text")
    )
    toks = test.select(
        "doc_id", "true_lang", F.explode(F.split("text", " ")).alias("token")
    )
    # every token instance scores against every class; unseen tokens take
    # the class's smoothed floor
    scored = (
        toks.join(maybe_broadcast(floor.select("lang", "floor")), how="cross")
        .join(maybe_broadcast(lik), ["lang", "token"], "left")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            F.coalesce(F.col("loglik"), F.col("floor")).alias("ll"),
        )
    )
    return (
        scored.groupBy("doc_id", "true_lang", "lang")
        .agg(F.sum("ll").alias("sum_ll"))
        .join(maybe_broadcast(classes), "lang")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            F.round(F.col("sum_ll") + F.col("logprior"), 6).alias("score"),
        )
    )


def ml_nb_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_class = _per_class_scores(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang"))
    return (
        per_class.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("pred_lang"),
            "score",
            (F.col("lang") == F.col("true_lang")).alias("is_correct"),
        )
        .orderBy("doc_id")
    )


_TRAIN_CTES = f"""
        train AS (SELECT * FROM documents WHERE doc_id % {SPLIT_MOD} < {TRAIN_PARTS}),
        toks AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM train
        ),
        vocab AS (SELECT count(DISTINCT token) AS v FROM toks),
        classes AS (
            SELECT lang,
                   ln(count(*) / CAST((SELECT count(*) FROM train) AS DOUBLE))
                       AS logprior
            FROM train GROUP BY lang
        ),
        cls_tok AS (SELECT lang, count(*) AS cnt_c FROM toks GROUP BY lang),
        lik AS (
            SELECT t.lang, t.token,
                   ln((count(*) + 1) / CAST(ct.cnt_c + (SELECT v FROM vocab) AS DOUBLE))
                       AS loglik
            FROM toks t JOIN cls_tok ct ON ct.lang = t.lang
            GROUP BY t.lang, t.token, ct.cnt_c
        )
"""

# shared scoring CTE chain: everything through per_class (doc × class
# rounded scores) — reused by the score, confusion and calibration oracles
_SCORE_CTES = f"""{_TRAIN_CTES},
        floor_t AS (
            SELECT lang,
                   ln(1.0 / CAST(cnt_c + (SELECT v FROM vocab) AS DOUBLE)) AS floor
            FROM cls_tok
        ),
        test AS (
            SELECT doc_id, lang AS true_lang, text
            FROM documents WHERE doc_id % {SPLIT_MOD} >= {TRAIN_PARTS}
        ),
        ttoks AS (
            SELECT doc_id, true_lang, unnest(string_split(text, ' ')) AS token
            FROM test
        ),
        scored AS (
            SELECT tt.doc_id, tt.true_lang, f.lang,
                   COALESCE(l.loglik, f.floor) AS ll
            FROM ttoks tt
            CROSS JOIN floor_t f
            LEFT JOIN lik l ON l.lang = f.lang AND l.token = tt.token
        ),
        per_class AS (
            SELECT s.doc_id, s.true_lang, s.lang,
                   round(sum(s.ll) + any_value(c.logprior), 6) AS score
            FROM scored s JOIN classes c ON c.lang = s.lang
            GROUP BY s.doc_id, s.true_lang, s.lang
        )"""

QUERIES = {"ml_nb_train": ml_nb_train, "ml_nb_score": ml_nb_score}

ORACLE = {
    "ml_nb_train": f"""
        WITH {_TRAIN_CTES},
        ranked AS (
            SELECT lang, token, loglik,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY loglik DESC, token
                   ) AS BIGINT) AS rank
            FROM lik
        )
        SELECT r.lang, r.rank, r.token,
               round(r.loglik, 6) AS loglik,
               round(c.logprior, 6) AS logprior
        FROM ranked r JOIN classes c ON c.lang = r.lang
        WHERE r.rank <= {TOP_TOKENS}
        ORDER BY r.lang, r.rank
    """,
    "ml_nb_score": f"""
        WITH {_SCORE_CTES},
        best AS (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, lang
                   ) AS rn
            FROM per_class
        )
        SELECT doc_id, lang AS pred_lang, score,
               lang = true_lang AS is_correct
        FROM best WHERE rn = 1
        ORDER BY doc_id
    """,
}


def ml_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class evaluation of the NB classifier (precision / recall /
    F1 from the confusion counts) — the metrics pass every ML pipeline
    runs after scoring, closing the train → score → evaluate loop.
    Reuses ``ml_nb_score``'s predictions (the whole scoring dataflow is
    the upstream plan), joins the true labels back, and reduces to
    |classes| rows of integer confusion counts; P/R/F1 are single
    divisions on those integers, so the only rounding site is display.
    """
    preds = ml_nb_score(spark, sf_dir).select("doc_id", "pred_lang")
    truth = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    joined = preds.join(truth, "doc_id")
    per_true = joined.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count("*").cast("long").alias("n_true"),
        F.sum((F.col("pred_lang") == F.col("true_lang")).cast("long"))
        .cast("long")
        .alias("n_correct"),
    )
    per_pred = joined.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.count("*").cast("long").alias("n_pred")
    )
    m = per_true.join(per_pred, "lang", "full").fillna(
        0, subset=["n_true", "n_correct", "n_pred"]
    )
    prec = F.when(F.col("n_pred") > 0, F.col("n_correct") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_true") > 0, F.col("n_correct") / F.col("n_true")).otherwise(0.0)
    f1 = F.when(
        prec + rec > 0, 2.0 * prec * rec / (prec + rec)
    ).otherwise(0.0)
    return m.select(
        "lang",
        "n_true",
        "n_pred",
        "n_correct",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("lang")


QUERIES["ml_eval_confusion"] = ml_eval_confusion
ORACLE["ml_eval_confusion"] = f"""
    WITH preds AS ({ORACLE["ml_nb_score"]}),
    joined AS (
        SELECT p.doc_id, d.lang AS true_lang, p.pred_lang
        FROM preds p JOIN documents d ON d.doc_id = p.doc_id
    ),
    per_true AS (
        SELECT true_lang AS lang,
               CAST(count(*) AS BIGINT) AS n_true,
               CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct
        FROM joined GROUP BY true_lang
    ),
    per_pred AS (
        SELECT pred_lang AS lang, CAST(count(*) AS BIGINT) AS n_pred
        FROM joined GROUP BY pred_lang
    ),
    m AS (
        SELECT coalesce(t.lang, p.lang) AS lang,
               coalesce(t.n_true, 0) AS n_true,
               coalesce(p.n_pred, 0) AS n_pred,
               coalesce(t.n_correct, 0) AS n_correct
        FROM per_true t FULL JOIN per_pred p ON p.lang = t.lang
    )
    SELECT lang, n_true, n_pred, n_correct,
           round(CASE WHEN n_pred > 0
                      THEN n_correct / CAST(n_pred AS DOUBLE) ELSE 0 END, 6)
               AS precision,
           round(CASE WHEN n_true > 0
                      THEN n_correct / CAST(n_true AS DOUBLE) ELSE 0 END, 6)
               AS recall,
           round(CASE WHEN (CASE WHEN n_pred > 0 THEN n_correct / CAST(n_pred AS DOUBLE) ELSE 0 END)
                        + (CASE WHEN n_true > 0 THEN n_correct / CAST(n_true AS DOUBLE) ELSE 0 END) > 0
                      THEN 2.0 * (CASE WHEN n_pred > 0 THEN n_correct / CAST(n_pred AS DOUBLE) ELSE 0 END)
                               * (CASE WHEN n_true > 0 THEN n_correct / CAST(n_true AS DOUBLE) ELSE 0 END)
                           / ((CASE WHEN n_pred > 0 THEN n_correct / CAST(n_pred AS DOUBLE) ELSE 0 END)
                            + (CASE WHEN n_true > 0 THEN n_correct / CAST(n_true AS DOUBLE) ELSE 0 END))
                      ELSE 0 END, 6) AS f1
    FROM m
    ORDER BY lang
"""


N_CAL_BINS = 10


def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error (ECE) for the NB
    classifier — "when the model says 80%, is it right 80% of the
    time?", the third leg of the evaluation stool next to
    ``ml_eval_confusion`` (Guo et al. 2017 formulation). The softmax
    confidence of the argmax class is computed from the shared per-class
    scores (both engines start from the identical ROUNDED score grid, so
    the exp/softmax arithmetic sees the same inputs), docs fall into 10
    fixed-width confidence bins, and each bin reports count, mean
    confidence and empirical accuracy; ECE = Σ (n_b/N)·|acc_b − conf_b|
    rides the same bounded frame as a window sum.

    Shape: the scoring dataflow (one corpus pass) + two windows over the
    ≤|classes| rows per doc + a 10-row aggregate. Confidence binning is
    floor(conf·10) clamped into the last bin."""
    per_class = _per_class_scores(spark, sf_dir)
    wd = Window.partitionBy("doc_id")
    wr = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang"))
    staged = per_class.withColumn("smax", F.max("score").over(wd))
    picked = (
        staged.withColumn("rn", F.row_number().over(wr))
        .withColumn(
            # rounded to 6 dp BEFORE the floor(conf*10) binning: the softmax
            # denominator is a float sum whose addition order is
            # engine-dependent, so an unrounded conf within an ulp of a 0.1
            # boundary could land in different bins per engine (ADVICE r5)
            "conf",
            F.round(
                1.0 / F.sum(F.exp(F.col("score") - F.col("smax"))).over(wd), 6
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.least(F.floor(F.col("conf") * N_CAL_BINS), F.lit(N_CAL_BINS - 1))
            .cast("long")
            .alias("bin"),
            "conf",
            (F.col("lang") == F.col("true_lang")).cast("long").alias("correct"),
        )
    )
    bins = picked.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("conf"), 6).alias("avg_confidence"),
        F.round(F.avg("correct"), 6).alias("accuracy"),
    )
    wall = Window.partitionBy()
    return bins.select(
        "bin",
        "n_docs",
        "avg_confidence",
        "accuracy",
        F.round(
            F.sum(
                F.col("n_docs")
                * F.abs(F.col("accuracy") - F.col("avg_confidence"))
            ).over(wall)
            / F.sum("n_docs").over(wall),
            6,
        ).alias("ece"),
    ).orderBy("bin")


QUERIES["ml_calibration_bins"] = ml_calibration_bins
ORACLE["ml_calibration_bins"] = f"""
    WITH {_SCORE_CTES},
    staged AS (
        SELECT doc_id, true_lang, lang, score,
               max(score) OVER (PARTITION BY doc_id) AS smax
        FROM per_class
    ),
    conf_t AS (
        SELECT doc_id, true_lang, lang, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, lang) AS rn,
               round(1.0 / sum(exp(score - smax))
                         OVER (PARTITION BY doc_id), 6) AS conf
        FROM staged
    ),
    picked AS (
        SELECT CAST(least(CAST(floor(conf * {N_CAL_BINS}) AS BIGINT),
                          {N_CAL_BINS - 1}) AS BIGINT) AS bin,
               conf,
               CASE WHEN lang = true_lang THEN 1 ELSE 0 END AS correct
        FROM conf_t WHERE rn = 1
    ),
    bins AS (
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(conf), 6) AS avg_confidence,
               round(avg(CAST(correct AS DOUBLE)), 6) AS accuracy
        FROM picked GROUP BY bin
    )
    SELECT bin, n_docs, avg_confidence, accuracy,
           round(sum(n_docs * abs(accuracy - avg_confidence)) OVER ()
                 / sum(n_docs) OVER (), 6) AS ece
    FROM bins
    ORDER BY bin
"""
