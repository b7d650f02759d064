"""Keyword relevance search — BM25 and TF-IDF scoring over the document
corpus (training-data-pipeline operators beyond the reference surface:
the retrieval half of a data-curation / RAG stack).

Everything is native expressions + two tiny aggregates; the corpus is
scanned once and only rows containing a query term ever reach a shuffle.

Scale shape (100 TB): the per-(doc, term) frequency aggregate is keyed by
doc_id — uniform by construction — and only over documents that contain
at least one query term (the explode is filtered before the shuffle).
Document-frequency and corpus statistics are scalar-sized aggregates
broadcast back; the final top-k is a distributed TakeOrderedAndProject
(`orderBy().limit()`), never a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k: (doc_id, score, rank) for the ``k`` documents most
    relevant to the bag of ``query_terms``.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the non-negative BM25+ idf),
    tf-normalization with the usual k1/b length correction against the
    corpus mean document length.  Scores are rounded to 4 decimals for
    cross-engine comparability; ranking happens on the unrounded score
    with doc_id as the deterministic tie-break.
    """
    terms = sorted(set(query_terms))
    words = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        words.alias("__w"),
        F.size(words).cast("double").alias("__dl"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )

    term_arr = F.array(*[F.lit(t) for t in terms])
    tf = (
        base.select(
            "doc_id",
            "__dl",
            F.explode(F.filter("__w", lambda w: F.array_contains(term_arr, w))).alias(
                "__term"
            ),
        )
        .groupBy("doc_id", "__term")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"), F.first("__dl").alias("__dl"))
    )
    df_ = tf.groupBy("__term").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    return _bm25_rank(tf, df_, stats, k=k, k1=k1, b=b)


def _bm25_rank(
    tf: DataFrame, df_: DataFrame, stats: DataFrame, k: int, k1: float, b: float
) -> DataFrame:
    """Shared BM25 scoring tail: (doc_id, __term, __tf, __dl) x per-term
    __df x 1-row (__n, __avgdl) -> ranked top-k."""
    scored = (
        tf.join(F.broadcast(df_), "__term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(1.0 + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)),
        )
        .withColumn(
            "__contrib",
            F.col("__idf")
            * (F.col("__tf") * (k1 + 1.0))
            / (F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.sum("__contrib").alias("__score"))
    )
    topk = scored.orderBy(F.desc("__score"), F.asc("doc_id")).limit(k)
    # rank the k survivors (k rows — the window is trivially small)
    w = Window.orderBy(F.desc("__score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", F.round("__score", 4).alias("score"), "rank"
    )


def tfidf_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Plain tf-idf cosine-free relevance (Σ tf·ln(N/df)) — the cheap
    baseline next to :func:`bm25_topk`, same shuffle shape."""
    terms = sorted(set(query_terms))
    words = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("__w"))
    stats = base.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    term_arr = F.array(*[F.lit(t) for t in terms])
    tf = (
        base.select(
            "doc_id",
            F.explode(F.filter("__w", lambda w: F.array_contains(term_arr, w))).alias(
                "__term"
            ),
        )
        .groupBy("doc_id", "__term")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    df_ = tf.groupBy("__term").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    scored = (
        tf.join(F.broadcast(df_), "__term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__contrib", F.col("__tf") * F.log(F.col("__n") / F.col("__df")))
        .groupBy("doc_id")
        .agg(F.sum("__contrib").alias("__score"))
    )
    topk = scored.orderBy(F.desc("__score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("__score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", F.round("__score", 4).alias("score"), "rank"
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    k_each: int = 20,
    c: float = 60.0,
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: fuse the BM25 keyword
    ranking with the exact-cosine vector ranking for one query
    (``query_terms`` + the stored embedding of ``query_vec_id``) into
    ``rrf_score = Σ_lists 1/(c + rank)`` and return the fused top-``k``.

    RRF (Cormack et al., SIGIR'09) needs only the two rank lists, never
    the incomparable raw scores — which is exactly what makes it the
    standard fusion for lexical+vector stacks.  Scale shape: both inputs
    are already distributed top-k operators that return ≤ ``k_each`` rows,
    so the fusion itself is a k_each-vs-k_each full-outer join on the
    driver-sized survivors — negligible next to the two retrievals, and
    each retrieval keeps its own scale story (posting pushdown / IVF
    pruning slot in transparently by swapping the list producers).

    Documents absent from one list contribute 0 from that list (the
    standard convention); ties break on doc_id.
    """
    from datalake_indexes_spark.operators.similarity import cosine_topk

    kw = bm25_topk(docs, query_terms, k=k_each).select(
        "doc_id", F.col("rank").cast("int").alias("__kw_rank")
    )
    q = embeddings.filter(F.col(vec_id_col) == query_vec_id)
    vec = cosine_topk(embeddings, q, k=k_each, vec_col=vec_col, id_col=vec_id_col).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").cast("int").alias("__v_rank")
    )
    fused = (
        kw.join(vec, "doc_id", "full_outer")
        .withColumn(
            "__rrf",
            F.coalesce(1.0 / (F.lit(c) + F.col("__kw_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("__v_rank")), F.lit(0.0)),
        )
    )
    topk = fused.orderBy(F.desc("__rrf"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("__rrf"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id",
        F.round("__rrf", 6).alias("rrf_score"),
        F.col("rank").cast("int").alias("rank"),
    )


def build_text_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
    positional: bool = False,
) -> None:
    """Materialize the document inverted index for repeated keyword
    queries: ``postings`` = (term, doc_id, tf, dl) repartitioned by term
    and SORTED by term within partitions — a term probe prunes row groups
    via parquet min/max statistics, the same layout discipline the cell
    index uses for token probes — plus the per-term document-frequency
    table and the 1-row corpus stats (N, avgdl).

    Offline-build / online-probe lifecycle: the full-corpus explode and
    the (doc, term) aggregate are paid ONCE here; every subsequent query
    reads only the probed terms' row groups and never touches raw text.
    """
    import os

    words = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        words.alias("__w"),
        F.size(words).cast("double").alias("dl"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("__w").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    n_part = n_partitions or docs.sparkSession.sparkContext.defaultParallelism
    (
        tf.repartition(n_part, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "postings"))
    )
    (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "df"))
    )
    stats.write.mode("overwrite").parquet(os.path.join(path, "stats"))
    if positional:
        # positional layer for phrase/proximity queries: (term, doc_id,
        # positions array, dl), same term-sorted row-group discipline as
        # postings but a SEPARATE file so bag-of-words probes never pay
        # for position payloads
        pos = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.posexplode(F.split(F.col(text_col), " ")).alias(
                    "pos", "term"
                ),
            )
            .groupBy("doc_id", "term")
            .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        )
        (
            pos.repartition(n_part, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(os.path.join(path, "positions"))
        )


def bm25_topk_indexed(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 against a :func:`build_text_index` structure — identical
    results to :func:`bm25_topk` (shares its oracle), but the corpus side
    is an IN-list probe of the postings parquet (PushedFilters on term;
    row groups outside the probed terms are skipped via the sorted
    layout), so query cost scales with posting-list length, not corpus
    size."""
    import os

    terms = sorted(set(query_terms))
    postings = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("term").isin(terms))
        .select(
            "doc_id",
            F.col("term").alias("__term"),
            F.col("tf").alias("__tf"),
            F.col("dl").alias("__dl"),
        )
    )
    df_ = (
        spark.read.parquet(os.path.join(path, "df"))
        .filter(F.col("term").isin(terms))
        .select(F.col("term").alias("__term"), F.col("df").alias("__df"))
    )
    stats = spark.read.parquet(os.path.join(path, "stats")).select(
        F.col("n").alias("__n"), F.col("avgdl").alias("__avgdl")
    )
    return _bm25_rank(postings, df_, stats, k=k, k1=k1, b=b)


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    max_df_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All document pairs with tf-idf cosine similarity >= ``threshold``
    — the weighted-lexical complement to MinHash/SimHash near-dup
    (those measure SET overlap; this measures how much the overlap
    matters, down-weighting ubiquitous words by idf).

    (doc_id_1, doc_id_2, cosine), each unordered pair once.

    Scale shape: the pair space is generated per TERM from the inverted
    (term, doc, weight) postings — fanout df² per term — so terms with
    document frequency above ``max_df_frac``·N are dropped first: by
    construction those are the near-stopwords whose idf ≈ 0 contributes
    nothing to the numerator anyway, and they are exactly the keys that
    would explode the self-join (the same hot-key cap discipline as
    n-gram dedup and inclusion discovery).  After the cap the join is a
    term equi-join with uniform (d1, d2) aggregation; norms broadcast.
    """
    words = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("__w"))
    n_docs = base.count()
    tf = (
        base.select("doc_id", F.explode("__w").alias("__term"))
        .groupBy("doc_id", "__term")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    df_ = tf.groupBy("__term").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    kept = df_.filter(F.col("__df") <= max_df_frac * n_docs)
    w = (
        tf.join(F.broadcast(kept), "__term")
        .withColumn("__w", F.col("__tf") * F.log(F.lit(float(n_docs)) / F.col("__df")))
    )
    # zero-norm documents (every surviving term at idf 0 — e.g. a word in
    # every document) carry no signal and would divide by zero: out.
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__norm")
    ).filter(F.col("__norm") > 0)
    w = w.join(F.broadcast(norms.select("doc_id")), "doc_id")
    a = w.select("__term", F.col("doc_id").alias("doc_id_1"), F.col("__w").alias("__w1"))
    b = w.select("__term", F.col("doc_id").alias("doc_id_2"), F.col("__w").alias("__w2"))
    dots = (
        a.join(b, "__term")
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.sum(F.col("__w1") * F.col("__w2")).alias("__dot"))
    )
    return (
        dots.join(
            F.broadcast(norms.select(F.col("doc_id").alias("doc_id_1"), F.col("__norm").alias("__n1"))),
            "doc_id_1",
        )
        .join(
            F.broadcast(norms.select(F.col("doc_id").alias("doc_id_2"), F.col("__norm").alias("__n2"))),
            "doc_id_2",
        )
        .withColumn("cosine", F.col("__dot") / (F.col("__n1") * F.col("__n2")))
        .filter(F.col("cosine") >= threshold)
        .select("doc_id_1", "doc_id_2", F.round("cosine", 4).alias("cosine"))
    )


def _mincover_rank(occ: DataFrame, terms: list[str], k: int) -> DataFrame:
    """Shared MinCover ranking over an occurrence frame (doc_id, __word,
    __pos) — the back half of :func:`proximity_topk`, its indexed probe
    and the streaming twin (``streaming/text_index_stream.py``)."""
    if len(terms) == 1:  # any occurrence covers the "phrase"
        per_doc = occ.groupBy("doc_id").agg(
            F.lit(1).cast("long").alias("min_span")
        )
        topk = per_doc.orderBy(F.asc("min_span"), F.asc("doc_id")).limit(k)
        rw = Window.orderBy(F.asc("min_span"), F.asc("doc_id"))
        return topk.withColumn("rank", F.row_number().over(rw)).select(
            "doc_id", "min_span", "rank"
        )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lasts = [
        F.max(F.when(F.col("__word") == t, F.col("__pos"))).over(w).alias(f"__l{i}")
        for i, t in enumerate(terms)
    ]
    spans = occ.select("doc_id", "__pos", *lasts).withColumn(
        "__span",
        F.col("__pos")
        - F.least(*[F.col(f"__l{i}") for i in range(len(terms))])
        + F.lit(1),
    )
    per_doc = (
        spans.filter(
            F.greatest(
                *[F.col(f"__l{i}").isNull().cast("int") for i in range(len(terms))]
            )
            == 0
        )
        .groupBy("doc_id")
        .agg(F.min("__span").cast("long").alias("min_span"))
    )
    topk = per_doc.orderBy(F.asc("min_span"), F.asc("doc_id")).limit(k)
    rw = Window.orderBy(F.asc("min_span"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(rw)).select(
        "doc_id", "min_span", "rank"
    )


def proximity_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Phrase-proximity ranking: among documents containing EVERY query
    term, the ``k`` with the smallest covering span — the minimum number
    of consecutive words containing at least one occurrence of each term
    (the classic MinCover proximity measure; span == |terms| means the
    terms appear adjacent in some order).  (doc_id, min_span, rank),
    ties on doc_id.  The conjunctive complement to :func:`bm25_topk`'s
    bag-of-words scoring: "spark join window" as a phrase-ish query, not
    three independent signals.

    Min-cover without a UDF: per document, the merged term-occurrence
    list carries, at each occurrence position p, the LAST occurrence of
    every individual term at-or-before p (one conditional running max
    per term over a single ordered window — |terms| is query-sized, so
    the column count is bounded).  The span ending at p is
    ``p - least(those) + 1`` once every term has appeared; the document's
    min over p is exact.  One shuffle keyed by doc_id (the window), one
    aggregate, then the sanctioned orderBy().limit(k) + k-row rank.
    """
    terms = sorted(set(query_terms))
    term_arr = F.array(*[F.lit(t) for t in terms])
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("__pos", "__word"),
    ).filter(F.array_contains(term_arr, F.col("__word")))
    return _mincover_rank(occ, terms, k)


def proximity_topk_indexed(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
) -> DataFrame:
    """MinCover proximity against a ``build_text_index(positional=True)``
    structure — identical results to :func:`proximity_topk` (shares its
    oracle), but the corpus side is an IN-list probe of the positional
    parquet (PushedFilters on term; the sorted layout skips every row
    group outside the probed terms), so query cost scales with the
    probed terms' posting-list lengths, not corpus size.  The same
    offline-build / online-probe lifecycle as :func:`bm25_topk_indexed`,
    extended with positions."""
    import os

    terms = sorted(set(query_terms))
    occ = (
        spark.read.parquet(os.path.join(path, "positions"))
        .filter(F.col("term").isin(terms))
        .select(
            "doc_id",
            F.col("term").alias("__word"),
            F.explode("positions").alias("__pos"),
        )
    )
    return _mincover_rank(occ, terms, k)
