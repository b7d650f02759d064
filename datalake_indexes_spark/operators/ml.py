"""ML hooks — the demo's model-fit / feature-importance surface on MLlib
(``maco/machine_learning.py:9-51`` uses AutoGluon TabularPredictor; the
engine substitutes Spark MLlib so the capability — "did enrichment improve
RMSE, which feature mattered" — survives without the AutoML dependency.
Optional module: not part of the oracle-checked engine core).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_and_evaluate(
    df: DataFrame,
    target_column: str,
    feature_columns: list[str],
    test_fraction: float = 0.2,
    seed: int = 42,
) -> dict:
    """Train a regressor on the (possibly enriched) dataset and report test
    RMSE (machine_learning.py:20-41: train/test split + MSE printout).

    Numeric features are imputed with the column mean (demo:576
    ``fillna(df.mean())``); returns {"rmse", "n_train", "n_test", "model"}.
    """
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    casted = df.select(
        F.col(target_column).cast("double").alias("__label"),
        *[F.col(c).cast("double").alias(c) for c in feature_columns],
    ).filter(F.col("__label").isNotNull())
    means = casted.select(
        *[F.avg(c).alias(c) for c in feature_columns]
    ).collect()[0]
    filled = casted.select(
        "__label",
        *[F.coalesce(F.col(c), F.lit(means[c] or 0.0)).alias(c) for c in feature_columns],
    )
    train, test = filled.randomSplit([1 - test_fraction, test_fraction], seed=seed)
    assembler = VectorAssembler(inputCols=feature_columns, outputCol="__features")
    model = GBTRegressor(
        featuresCol="__features", labelCol="__label", maxIter=20, seed=seed
    ).fit(assembler.transform(train))
    preds = model.transform(assembler.transform(test))
    rmse = RegressionEvaluator(
        labelCol="__label", predictionCol="prediction", metricName="rmse"
    ).evaluate(preds)
    return {
        "rmse": rmse,
        "n_train": train.count(),
        "n_test": test.count(),
        "model": model,
    }


def permutation_importance(
    df: DataFrame,
    target_column: str,
    feature_columns: list[str],
    seed: int = 42,
) -> DataFrame:
    """Permutation feature importance (machine_learning.py:43-51): RMSE
    degradation when one feature column is shuffled.

    The shuffle is a content-hash-bucketed within-group permutation: rows
    are bucketed by ``xxhash64`` of their content, each bucket is sorted by
    a second content hash and the feature values cyclically rotated by one
    (``applyInPandas``, Arrow-batched).  No row-id join is involved — in
    particular NOT ``monotonically_increasing_id`` alignment across two
    independently-partitioned frames, whose id sets need not intersect —
    so every row survives the permutation by construction, and the result
    is deterministic (content hashes, not partition-dependent ``rand``).

    Returns (feature, base_rmse, permuted_rmse, importance).
    """
    import numpy as np
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler

    fit = fit_and_evaluate(df, target_column, feature_columns, seed=seed)
    base_rmse = fit["rmse"]
    model = fit["model"]
    evaluator = RegressionEvaluator(
        labelCol="__label", predictionCol="prediction", metricName="rmse"
    )
    assembler = VectorAssembler(inputCols=feature_columns, outputCol="__features")

    casted = df.select(
        F.col(target_column).cast("double").alias("__label"),
        *[F.col(c).cast("double").alias(c) for c in feature_columns],
    ).filter(F.col("__label").isNotNull())
    means = casted.select(*[F.avg(c).alias(c) for c in feature_columns]).collect()[0]
    filled = casted.select(
        "__label",
        *[F.coalesce(F.col(c), F.lit(means[c] or 0.0)).alias(c) for c in feature_columns],
    ).cache()
    # scale pandas-group count with input size (~10k rows per group):
    # a fixed bucket count would funnel n/64 rows into single executors at
    # large n (OOM + parallelism collapse), while too many buckets at
    # small n leaves single-row groups unpermuted (np.roll identity).
    # Content-hash bucketing keeps the permutation deterministic either way.
    n_buckets = max(64, -(-filled.count() // 10_000))

    def _permuter(feat: str):
        def _permute(pdf):
            pdf = pdf.sort_values("__h", kind="mergesort", ignore_index=True)
            pdf[feat] = np.roll(pdf[feat].to_numpy(), 1)
            return pdf.drop(columns=["__b", "__h"])

        return _permute

    rows = []
    for i, feat in enumerate(feature_columns):
        salted = filled.withColumn(
            "__b",
            F.pmod(F.xxhash64(*filled.columns, F.lit(seed + i)), F.lit(n_buckets)).cast(
                "int"
            ),
        ).withColumn("__h", F.xxhash64(*filled.columns, F.lit(seed + i + 7919)))
        permuted = salted.groupBy("__b").applyInPandas(_permuter(feat), filled.schema)
        preds = model.transform(assembler.transform(permuted))
        p_rmse = evaluator.evaluate(preds)
        rows.append((feat, float(base_rmse), float(p_rmse), float(p_rmse - base_rmse)))
    filled.unpersist()
    return df.sparkSession.createDataFrame(
        rows, "feature string, base_rmse double, permuted_rmse double, importance double"
    )


def winsorize(
    df: DataFrame,
    cols: list[str],
    p_low: float = 0.01,
    p_high: float = 0.99,
) -> DataFrame:
    """Percentile clamping (winsorization) of numeric feature columns —
    the standard robust-cleaning step before model fitting or scaling:
    values below the ``p_low`` quantile snap up to it, values above
    ``p_high`` snap down.

    Returns ``df`` with the listed columns clamped in place.  One
    scalar aggregation computes all 2·|cols| exact quantiles in a single
    pass (collected to the driver — 2·|cols| doubles, not data), then
    the clamp is a literal ``greatest/least`` projection inside
    whole-stage codegen; at 100 TB swap ``percentile`` for
    ``approx_percentile`` and nothing else changes.
    """
    aggs = []
    for c in cols:
        aggs.append(F.percentile(F.col(c), F.lit(float(p_low))).alias(f"__lo_{c}"))
        aggs.append(F.percentile(F.col(c), F.lit(float(p_high))).alias(f"__hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = df
    for c in cols:
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        if lo is None or hi is None:  # all-null column: nothing to clamp
            continue
        out = out.withColumn(
            c, F.least(F.greatest(F.col(c), F.lit(lo)), F.lit(hi))
        )
    return out


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    n_folds: int = 5,
    smoothing: float = 20.0,
) -> DataFrame:
    """Leakage-free target encoding: each row's category is replaced by
    the smoothed mean of the TARGET over all OTHER folds — the standard
    high-cardinality categorical encoder for tree/linear models, with
    the out-of-fold discipline that stops the encoding from memorizing
    its own row's label.

    fold = md5(id) % n_folds (deterministic, reproducible across runs
    and engines); encoded value for a row in fold f of category c:

        ((sum_c - sum_{c,f}) + smoothing * global_mean)
        / ((cnt_c - cnt_{c,f}) + smoothing)

    — the Bayesian-smoothed mean that degrades gracefully to the global
    mean for categories concentrated in one fold.  Returns
    (id, category, fold, encoded), rounded to 6.

    Scale shape: two map-side-combinable aggregates ((cat, fold) and
    global), one broadcast join of the (cat, fold) stats back onto the
    rows — the data is scanned twice and never shuffled by anything
    wider than the category key.
    """
    fold = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_folds
    ).cast("int")
    rows = df.select(
        F.col(id_col), F.col(cat_col).alias("category"),
        F.col(target_col).cast("double").alias("__t"), fold.alias("fold"),
    )
    per_fold = rows.groupBy("category", "fold").agg(
        F.sum("__t").alias("__fs"), F.count(F.lit(1)).alias("__fc")
    )
    per_cat = per_fold.groupBy("category").agg(
        F.sum("__fs").alias("__cs"), F.sum("__fc").alias("__cc")
    )
    gmean = rows.agg(F.avg("__t")).collect()[0][0]
    stats = per_fold.join(per_cat, "category").select(
        "category",
        "fold",
        (
            (F.col("__cs") - F.col("__fs") + F.lit(smoothing * float(gmean)))
            / (F.col("__cc") - F.col("__fc") + F.lit(smoothing))
        ).alias("__enc"),
    )
    return rows.join(F.broadcast(stats), ["category", "fold"]).select(
        id_col, "category", "fold", F.round("__enc", 6).alias("encoded")
    )


def robust_scale(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Median/IQR standardization — the outlier-immune cousin of z-score
    scaling: (x - median) / (q3 - q1) per column.  Columns with zero IQR
    (constant or near-constant) scale to 0.0 rather than dividing by
    zero.  Same single-pass scalar-quantile shape as :func:`winsorize`;
    swap in ``approx_percentile`` at 100 TB.
    """
    aggs = []
    for c in cols:
        aggs.append(F.percentile(F.col(c), F.lit(0.5)).alias(f"__med_{c}"))
        aggs.append(F.percentile(F.col(c), F.lit(0.25)).alias(f"__q1_{c}"))
        aggs.append(F.percentile(F.col(c), F.lit(0.75)).alias(f"__q3_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = df
    for c in cols:
        med, q1, q3 = row[f"__med_{c}"], row[f"__q1_{c}"], row[f"__q3_{c}"]
        if med is None:
            continue
        iqr = q3 - q1
        if iqr == 0:
            out = out.withColumn(c, F.when(F.col(c).isNotNull(), F.lit(0.0)))
        else:
            out = out.withColumn(c, (F.col(c) - F.lit(med)) / F.lit(iqr))
    return out


def cv_folds(
    df: DataFrame,
    k: int = 5,
    stratum_col: str | None = None,
    id_col: str = "doc_id",
    exact: bool = True,
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment —
    (id, stratum, fold) with folds balanced within every stratum.

    ``exact=True`` (the CV contract): rank each stratum by md5(id) — a
    uniform, engine-exact shuffle of the ids — and assign
    ``fold = (rank - 1) % k``, so per-stratum fold sizes differ by at
    most one row.  No RNG: the same corpus yields the same folds on
    every run, engine, and partitioning, which is what makes a CV score
    comparable across experiments (and lets a DuckDB twin replay the
    assignment bit-for-bit).

    ``exact=False`` (the 100-TB tier): ``fold = md5_bucket(id) % k`` —
    a pure scan-level expression, NO shuffle, balanced in expectation
    (±O(sqrt(n/k)) per fold).  Use it when strata are petabyte-sized and
    the window sort below is the bottleneck.

    Scale shape (exact): ONE window partitioned by stratum — the same
    shape as :func:`..text_analysis.stratified_sample_exact`; per-stratum
    work is that stratum's row count, and the language histogram is the
    known skew.  For a pathological mono-stratum corpus flip to
    ``exact=False``.
    """
    from pyspark.sql import Window

    from datalake_indexes_spark.functions.hashes import md5_bucket

    if k < 2:
        raise ValueError("cv_folds needs k >= 2")
    stratum = (
        F.col(stratum_col).cast("string") if stratum_col else F.lit("__all__")
    )
    if not exact:
        return df.select(
            F.col(id_col).alias("doc_id"),
            stratum.alias("stratum"),
            (md5_bucket(id_col, 10000) % k).cast("int").alias("fold"),
        )
    w = Window.partitionBy(stratum).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        stratum.alias("stratum"),
        ((F.row_number().over(w) - 1) % k).cast("int").alias("fold"),
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of the listed numeric columns in ONE
    aggregation pass — k(k-1)/2 ``corr`` aggregates, all map-side
    combined, no self-join and no per-pair scan.  Long form
    (col_1, col_2, corr) with col_1 < col_2, rounded to 6."""
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            pairs.append((a, b))
            aggs.append(F.round(F.corr(F.col(a), F.col(b)), 6).alias(f"__c_{a}_{b}"))
    row = df.agg(*aggs).collect()[0]
    out = [(a, b, row[f"__c_{a}_{b}"]) for a, b in pairs]
    return df.sparkSession.createDataFrame(
        out, "col_1 string, col_2 string, corr double"
    )


def nb_token_counts(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = 512,
) -> DataFrame:
    """(cls, bucket, cnt) — the trainable half of the hashed Naive Bayes
    model: per-class hashed-unigram counts.  ADDITIVE over disjoint
    document sets (sum partials from any split of the corpus and you get
    the full-corpus model — the property the streaming twin folds on)."""
    from datalake_indexes_spark.functions.hashes import md5_bucket

    return (
        docs.select(
            F.col(label_col).alias("cls"),
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
            ).alias("__w"),
        )
        .select("cls", md5_bucket(F.col("__w"), n_buckets).alias("bucket"))
        .groupBy("cls", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def nb_class_docs(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """(cls, n_docs) — the prior half of the model; additive like
    :func:`nb_token_counts`."""
    return docs.groupBy(F.col(label_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def nb_scores_with_model(
    docs: DataFrame,
    token_counts: DataFrame,
    class_docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """The full per-(doc, class) NB score frame — (doc_id, label, cls,
    __n, __score) with ``__score`` = log-conditional sum + log prior,
    rounded(6) so both engines decide argmax/margin boundaries
    identically.  :func:`nb_classify_with_model` cuts this to the
    argmax; :func:`nb_calibration_report` reads the top-2 margin."""
    from datalake_indexes_spark.functions.hashes import md5_bucket

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("label"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("__w"),
    ).select(
        "doc_id", "label", md5_bucket(F.col("__w"), n_buckets).alias("bucket")
    )

    tot = class_docs.agg(F.sum("n_docs").alias("__td"))
    priors = class_docs.crossJoin(F.broadcast(tot)).select(
        "cls", F.log(F.col("n_docs") / F.col("__td")).alias("__prior")
    )

    cls_tot = token_counts.groupBy("cls").agg(F.sum("cnt").alias("__tc"))
    grid = class_docs.select("cls").crossJoin(
        docs.sparkSession.range(n_buckets).select(
            F.col("id").cast("long").alias("bucket")
        )
    )
    cond = (
        grid.join(F.broadcast(token_counts), ["cls", "bucket"], "left")
        .join(F.broadcast(cls_tot), "cls")
        .select(
            "cls",
            "bucket",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                / (F.col("__tc") + F.lit(alpha * n_buckets))
            ).alias("__logp"),
        )
    )

    return (
        words.join(F.broadcast(cond), "bucket")
        .groupBy("doc_id", "label", "cls")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__logp").alias("__s"))
        .join(F.broadcast(priors), "cls")
        .withColumn("__score", F.round(F.col("__s") + F.col("__prior"), 6))
        .drop("__s", "__prior")
    )


def nb_classify_with_model(
    docs: DataFrame,
    token_counts: DataFrame,
    class_docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """Score ``docs`` against an externally supplied NB model — the
    inference-with-shipped-weights shape (see
    :func:`hashed_nb_classify` for the semantics; that function is this
    one applied to its own training counts).  The conditional table is
    densified to the full classes x buckets grid here, so partial count
    tables (e.g. a streaming fold) still contribute the smoothed floor
    for never-seen buckets."""
    from pyspark.sql import Window

    scored = nb_scores_with_model(
        docs,
        token_counts,
        class_docs,
        label_col=label_col,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        alpha=alpha,
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("__score"), F.desc("cls")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "doc_id",
            "label",
            F.col("cls").alias("pred_label"),
            F.col("__n").alias("n_words"),
            (F.col("cls") == F.col("label")).alias("correct"),
        )
    )


def nb_calibration_report(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    alpha: float = 1.0,
    bin_width: float = 2.0,
    n_bins: int = 8,
) -> DataFrame:
    """Reliability report for the hashed-NB classifier — (bin, margin_lo,
    n_docs, avg_margin, accuracy), one row per occupied confidence bin.
    Confidence is the top-2 LOG-SCORE MARGIN (best minus runner-up),
    binned at fixed ``bin_width``, last bin open-ended: a well-behaved
    classifier shows accuracy rising monotonically with margin, and the
    selection threshold a curation pipeline applies ("keep docs the
    quality model is sure about") should sit where this table says
    accuracy clears the target, not at an arbitrary score.

    The margin deliberately replaces a softmax probability: both
    engines difference the same rounded(6) scores — exact decimal
    arithmetic, no cross-engine ``exp`` in sight — so bin edges are
    decided identically (the floor/least chain is the deterministic
    part; avg/accuracy carry the +1e-9 rounding nudge).

    Scale shape: rides :func:`nb_scores_with_model` (broadcast model,
    one doc-keyed aggregate); the top-2 window sees |classes| rows per
    doc; the report is one groupBy over at most ``n_bins`` keys.
    """
    from pyspark.sql import Window

    scored = nb_scores_with_model(
        docs,
        nb_token_counts(
            docs, label_col=label_col, text_col=text_col, n_buckets=n_buckets
        ),
        nb_class_docs(docs, label_col=label_col),
        label_col=label_col,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        alpha=alpha,
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("__score"), F.desc("cls"))
    top2 = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 2)
        .groupBy("doc_id", "label")
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("__score"))).alias("__s1"),
            F.max(F.when(F.col("__rn") == 1, F.col("cls"))).alias("__pred"),
            F.max(F.when(F.col("__rn") == 2, F.col("__score"))).alias("__s2"),
        )
    )
    margin = F.col("__s1") - F.coalesce(
        F.col("__s2"), F.col("__s1") - F.lit(bin_width * n_bins)
    )
    binned = top2.select(
        F.least(
            F.floor(margin / F.lit(bin_width)), F.lit(n_bins - 1)
        ).cast("long").alias("bin"),
        margin.alias("__margin"),
        (F.col("__pred") == F.col("label")).cast("double").alias("__ok"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__margin") + F.lit(1e-9), 6).alias("avg_margin"),
            F.round(F.avg("__ok") + F.lit(1e-9), 6).alias("accuracy"),
        )
        .select(
            "bin",
            F.round(F.col("bin") * F.lit(bin_width), 6).alias("margin_lo"),
            "n_docs",
            "avg_margin",
            "accuracy",
        )
    )


def hashed_nb_classify(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """(doc_id, label, pred_label, n_words, correct) — multinomial Naive
    Bayes over hashed unigram features (the fastText-style hashing trick:
    a fixed ``n_buckets``-dimensional feature space independent of
    vocabulary size), trained on the labelled corpus and applied back to
    every document — the quality/domain/language classifier-inference
    shape a curation pipeline runs with externally trained weights.

    Training: per-class bucket counts with Laplace ``alpha``; the
    conditional table is the DENSE classes x buckets grid (missing
    pairs still contribute the smoothed floor — a sparse join would
    silently drop those terms).  Scoring: each document's bucket stream
    joins the broadcast conditional table (one row per class per gram),
    sums log-conditionals per (doc, class), adds the log prior, and the
    argmax — rounded to 6 first so both engines decide boundaries
    identically, ties broken by class name descending — is the
    prediction.

    Scale shape: the model (classes x n_buckets grid, priors) is
    model-constant-sized and broadcast; training is one aggregate with
    map-side combine onto at most classes x n_buckets reduce keys; the
    per-(doc, class) score re-keys by doc_id immediately.  Zero UDFs,
    no driver-side loops; the only window partitions by doc_id over
    |classes| rows.
    """
    return nb_classify_with_model(
        docs,
        nb_token_counts(
            docs, label_col=label_col, text_col=text_col, n_buckets=n_buckets
        ),
        nb_class_docs(docs, label_col=label_col),
        label_col=label_col,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        alpha=alpha,
    )
