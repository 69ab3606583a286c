"""Model evaluation at corpus scale, fully distributed: exact ROC-AUC
(:func:`binary_auc`), exact average precision
(:func:`average_precision`), threshold confusion metrics
(:func:`classification_report`), and ANN recall@k
(:func:`topk_recall`).

Extension tier (the reference has no model evaluation): closes the loop
on the training-pipeline classifiers (textstats.py::logreg_train /
logreg_train_hashed / linear_score) — a quality classifier is only
usable once its ranking power is measured on held-out data, and at
corpus scale that measurement must not collect scores to the driver or
funnel them through a single-partition global window.

``binary_auc`` computes the exact Mann-Whitney / rank-sum AUC:

    AUC = [ sum_s p_s * N_<(s)  +  1/2 * sum_s p_s * n_s ] / (P * N)

where the sums run over DISTINCT scores (p_s / n_s = positives /
negatives at score s, N_<(s) = negatives strictly below s). The
grouping collapses the n-row score column to its distinct values
before any ordering work, and the one ordered pass is the distributed
prefix-sum (window.py::global_cumsum — range-repartition + partition-
local running sum + a P-row offset fold-in), so no stage ever sees a
single-partition window. Everything up to the final division is BIGINT
arithmetic (the 1/2 is cleared by doubling both sides), so the result
is exact and engine-independent — the DuckDB oracle reproduces it
bit-for-bit.

Ties are handled by the trapezoidal (average-rank) convention, the one
sklearn.metrics.roc_auc_score implements; a score column with heavy
ties (integer heuristics, quantized model outputs) is the expected
input. Scores may be any orderable numeric type; prefer exact types
(ints, decimals) when cross-engine determinism of the GROUPING matters
— computed floats can split tie groups differently across engines
(queries.py float-stability policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .window import global_cumsum


def binary_auc(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` against binary ``label_col``
    (anything castable to 0/1 long). Returns one row
    ``(auc double, n_pos bigint, n_neg bigint)``; ``auc`` is NULL when
    either class is empty (AUC is undefined, not 0). The NULL is an
    explicit guard, not NULL-from-division-by-zero, so the contract
    holds under ``spark.sql.ansi.enabled=true`` (the Spark 4 default
    for sessions not built by this repo's session factory) as well.

    Scale shape: one shuffle to group by distinct score, the
    distributed prefix-sum over the (bounded) distinct-score table,
    one final scalar aggregate. Nothing is proportional to the row
    count past the first groupBy.
    """
    lbl = F.col(label_col).cast("long")
    # NULL scores are unrankable — drop them (they would otherwise sort
    # as the lowest tie group, silently skewing the statistic)
    agg = (
        scored.where(F.col(score_col).isNotNull())
        .groupBy(F.col(score_col).alias("__s"))
        .agg(
            F.sum(lbl).alias("__p"),
            (F.count(F.lit(1)) - F.sum(lbl)).alias("__n"),
        )
    )
    cum = global_cumsum(agg, "__n", ["__s"], name="__cum_n")
    # 2*numerator = sum p * (2*N_<  +  n_ties); all-long arithmetic
    num2 = F.sum(
        F.col("__p") * (F.lit(2) * (F.col("__cum_n") - F.col("__n")) + F.col("__n"))
    )
    return (
        cum.agg(
            num2.alias("__num2"),
            F.sum("__p").alias("n_pos"),
            F.sum("__n").alias("n_neg"),
        )
        .select(
            # explicit guard (not NULL-by-zero-division) so the
            # NULL-when-undefined contract survives ANSI mode
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.col("__num2").cast("double")
                / (F.lit(2).cast("double") * F.col("n_pos") * F.col("n_neg")),
            ).alias("auc"),
            "n_pos",
            "n_neg",
        )
    )


def average_precision(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Exact average precision (area under the precision-recall curve,
    step-interpolated): AP = sum_n (R_n - R_{n-1}) * P_n over the
    distinct-score thresholds in DESCENDING order — the public
    scikit-learn ``average_precision_score`` definition, with tied
    scores collapsing to one threshold (both engines and the reference
    definition agree on that convention).

    Returns one row ``(ap double, n_pos bigint, n_neg bigint)``; ``ap``
    is NULL when there are no positives (explicitly guarded, so the
    contract holds under ANSI mode too — same policy as
    :func:`binary_auc`).

    Same scale shape as :func:`binary_auc`: group to distinct scores,
    two descending distributed prefix-sums (cumulative positives /
    cumulative total at each threshold), one scalar aggregate. The
    per-threshold numerator ``p_s * cumP(s)`` stays BIGINT-exact; only
    the final sum of per-threshold ratios is floating (same float-
    stability footing as any SUM(double) oracle query — callers should
    ROUND the result).
    """
    lbl = F.col(label_col).cast("long")
    # NULL scores are unrankable — drop them (same contract as binary_auc)
    agg = (
        scored.where(F.col(score_col).isNotNull())
        .groupBy(F.col(score_col).alias("__s"))
        .agg(
            F.sum(lbl).alias("__p"),
            F.count(F.lit(1)).alias("__t"),
        )
    )
    desc = [F.col("__s").desc()]
    # both prefix-sums share the descending-score order: the fused
    # global_cumsum runs them over ONE range exchange / window pass
    # (r14; was two chained calls = two exchanges + two offset jobs)
    cum = global_cumsum(agg, ["__p", "__t"], desc, name=["__cum_p", "__cum_t"])
    term = (F.col("__p") * F.col("__cum_p")).cast("double") / F.col(
        "__cum_t"
    ).cast("double")
    return (
        cum.agg(
            F.sum(term).alias("__num"),
            F.sum("__p").alias("n_pos"),
            (F.sum("__t") - F.sum("__p")).alias("n_neg"),
        )
        .select(
            F.when(
                F.col("n_pos") > 0,
                F.col("__num") / F.col("n_pos").cast("double"),
            ).alias("ap"),
            "n_pos",
            "n_neg",
        )
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "qid",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of an approximate top-k result frame against the exact
    reference frame — the standard ANN quality metric, computed
    per query: ``(query_col, n_exact, n_hit, recall)``.

    Both inputs are (query, neighbor) result frames as produced by the
    similarity tier (``cosine_topk`` / ``ivf_topk`` / ``pq_topk`` /
    ``knn_join``); extra columns (scores, ranks) are ignored. Scale
    shape: one left-semi equi-join on (query, id) + two per-query
    counts — candidate-proportional, never all-pairs, and queries with
    zero approximate hits still appear (left join, recall 0.0).
    """
    a = approx.select(query_col, id_col).distinct()
    e = exact.select(query_col, id_col).distinct()
    tot = e.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_exact"))
    hit = (
        e.join(a, [query_col, id_col], "left_semi")
        .groupBy(query_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        tot.join(hit, query_col, "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)))
        .withColumn(
            "recall",
            F.col("n_hit").cast("double") / F.col("n_exact").cast("double"),
        )
    )


def classification_report(
    scored: DataFrame,
    threshold: float,
    score_col: str = "score",
    label_col: str = "label",
    digits: int = 9,
) -> DataFrame:
    """Confusion counts and derived metrics at ``score >= threshold``:
    one row ``(tp, fp, fn, tn, dropped, accuracy, precision, recall,
    f1)``. One scalar aggregate over the scored frame — a single
    map-side-combinable pass, no shuffle beyond the final 1-row
    exchange.

    Rows with a NULL score or NULL label are excluded from all four
    confusion counts (they have no defined prediction/truth) and
    reported in ``dropped``, so ``tp+fp+fn+tn+dropped`` always equals
    the input row count — the discrepancy is visible, not silent.

    Ratios are ROUND()ed to ``digits`` (cross-engine float-stability
    policy); undefined ratios (empty denominator) are NULL, not 0 —
    guarded explicitly, so the contract holds under
    ``spark.sql.ansi.enabled=true`` (the Spark 4 default outside this
    repo's session factory), where a bare division would raise
    DIVIDE_BY_ZERO instead.
    """
    y = F.col(label_col).cast("long")
    pred = (F.col(score_col) >= F.lit(threshold)).cast("long")
    valid = F.col(score_col).isNotNull() & y.isNotNull()
    cell = lambda c: F.coalesce(F.sum(F.when(valid, c)), F.lit(0))  # noqa: E731
    counts = scored.agg(
        cell(pred * y).alias("tp"),
        cell(pred * (1 - y)).alias("fp"),
        cell((1 - pred) * y).alias("fn"),
        cell((1 - pred) * (1 - y)).alias("tn"),
        F.coalesce(
            F.sum(F.when(~valid, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        ).alias("dropped"),
    )
    tp, fp, fn, tn = (F.col(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    total = tp + fp + fn + tn
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    # a NULL prec/rec nulls the f1 condition, which F.when treats as
    # false -> NULL result, exactly the undefined-metric contract
    return counts.select(
        "tp",
        "fp",
        "fn",
        "tn",
        "dropped",
        F.round(F.when(total > 0, (tp + tn) / total), digits).alias("accuracy"),
        F.round(prec, digits).alias("precision"),
        F.round(rec, digits).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)), digits
        ).alias("f1"),
    )
