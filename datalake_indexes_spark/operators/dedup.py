"""Document deduplication — training-data-pipeline operators (beyond the
reference surface; BASELINE.json north star).

The reference's duplicate detection is table/row-level over the cell index
(``maco/duplicate_detection.py``); a 100 TB text corpus needs *document*
dedup.  Every operator here is a declarative DataFrame pipeline with no
driver-side iteration and no O(n²) step:

- exact:        hash-groupBy on the full text (one shuffle on the hash),
- MinHash+LSH:  shingle → k min-hashes → band keys → bucket self-join →
                verify exact Jaccard on the (few) candidates,
- SimHash:      64-bit signature via per-word hash-bit voting; candidate
                pairs from 16-bit band collisions, verified by Hamming
                distance (banding ⇒ no all-pairs comparison),
- n-gram Jaccard: shingle-inverted-index self-join (exact, for corpora
                where shingle lists are selective),
- embedding cosine: see operators/similarity.py (shares the pair machinery).

Determinism: every hash is md5 over an explicit string, so results are
reproducible across engines — the DuckDB oracles in ``plans/oracle.py``
recompute the same signatures independently.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _split_literal(col, sep: str):
    """``F.split`` with the separator treated as a LITERAL string.

    Spark's ``F.split`` interprets its pattern as a Java regex; the
    DuckDB oracle twins and the streaming line store split literally.
    Escaping here keeps the documented batch/oracle/stream parity
    contract for regex-special separators (e.g. ``'.'`` or ``'|'``) —
    the default ``'\\n'`` is unaffected.
    """
    return F.split(col, _re.escape(sep))

MINHASH_K = 16          # number of min-hash functions
MINHASH_BANDS = 4       # bands of k/bands rows each
SIMHASH_BITS = 64
SIMHASH_BANDS = 4       # 16-bit bands for candidate generation
HEX = "0123456789abcdef"


def word_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).

    Native expressions only (split/sequence/transform/slice) — the explode
    happens after dedup inside the array, keeping shuffle volume at
    O(distinct shingles).
    """
    words = F.split(F.col(text_col), " ")
    k = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.concat_ws(" ", F.slice(words, (i + 1).cast("int"), n)),
    )
    sh = F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
    return docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct text with the surviving doc id.

    (text_hash, keep_doc_id, group_size) — the retention table a pipeline
    joins against to drop duplicates.  Single hash-shuffle; at 100 TB the
    md5 gives uniform partitioning regardless of text skew.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def minhash_signatures(shingles: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k min-hash values per doc: min over shingles of md5("<j>:"+shingle).

    The j-prefixed md5 family is a deterministic stand-in for k independent
    permutations (lexicographic min over a uniform hash ≈ random min)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"mh{j}")
        for j in range(k)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, Jaccard-verified.

    (doc_id_1, doc_id_2, jaccard) with jaccard >= threshold, each unordered
    pair once.  The self-join runs on band keys (each bucket holds only
    colliding docs), so the candidate set — not the corpus — is quadratic;
    verification joins shingles only for candidates.
    """
    rows = k // bands
    # the shingle frame feeds FOUR consumers (the signatures, the per-doc
    # sizes and both sides of the verification join); unpinned, each one
    # re-runs the regex shingling over the whole corpus (measured at
    # sf0.1: 4 stages x ~4s task CPU re-computing the same rows).  A lazy
    # localCheckpoint materializes it once on first use.
    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col).localCheckpoint(
        eager=False
    )
    mh = minhash_signatures(sh, k=k)

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias("key"),
        )
        for b in range(bands)
    ]
    bk = mh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = bk.alias("a")
    b = bk.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2")
        )
        .distinct()
    )
    return _verify_jaccard(cand, sh, threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via the shingle inverted index.

    Candidates are pairs sharing >= 1 shingle (the shingle self-join *is*
    the intersection count — one shuffle on shingle).  A boilerplate
    shingle appearing in d documents contributes d² join rows, so one hot
    shingle (a license header, a template footer) can dominate the whole
    job.  ``max_shingle_freq`` caps that: shingles with document frequency
    above the cap are excluded from *candidate generation* only, and the
    surviving candidate pairs are re-verified against the FULL shingle
    sets — reported jaccard values stay exact.  Recall effect (document
    it when tuning): a pair whose shared shingles are ALL hotter than the
    cap is never generated and is silently missed; for threshold-worthy
    near-duplicates this requires every shared shingle to be corpus-wide
    boilerplate, so small caps (100-1000) trade negligible recall for a
    quadratic join-size reduction.
    """
    # multi-consumer shingle frame — pin it once (see minhash_lsh_pairs)
    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col).localCheckpoint(
        eager=False
    )
    if max_shingle_freq is not None:
        rare = sh.join(
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))  # shingles are per-doc distinct
            .filter(F.col("__df") <= max_shingle_freq)
            .select("shingle"),
            "shingle",
            "left_semi",
        )
        r1, r2 = rare.alias("r1"), rare.alias("r2")
        cand = (
            r1.join(
                r2,
                (F.col("r1.shingle") == F.col("r2.shingle"))
                & (F.col("r1.doc_id") < F.col("r2.doc_id")),
            )
            .select(
                F.col("r1.doc_id").alias("doc_id_1"),
                F.col("r2.doc_id").alias("doc_id_2"),
            )
            .distinct()
        )
        return _verify_jaccard(cand, sh, threshold)
    s1 = sh.alias("s1")
    s2 = sh.alias("s2")
    inter = (
        s1.join(
            s2,
            (F.col("s1.shingle") == F.col("s2.shingle"))
            & (F.col("s1.doc_id") < F.col("s2.doc_id")),
        )
        .groupBy(
            F.col("s1.doc_id").alias("doc_id_1"),
            F.col("s2.doc_id").alias("doc_id_2"),
        )
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    jac = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_id_1")
                   .withColumnRenamed("__n", "__n1"), "doc_id_1")
        .join(sizes.withColumnRenamed("doc_id", "doc_id_2")
              .withColumnRenamed("__n", "__n2"), "doc_id_2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter") / (F.col("__n1") + F.col("__n2") - F.col("__inter")), 4
            ),
        )
        .filter(
            F.col("__inter") / (F.col("__n1") + F.col("__n2") - F.col("__inter"))
            >= threshold
        )
    )
    return jac.select("doc_id_1", "doc_id_2", "jaccard")


def _verify_jaccard(cand: DataFrame, shingles: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard for candidate pairs: intersect via shingle join, sizes
    via per-doc counts."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    s1 = shingles.select(F.col("doc_id").alias("doc_id_1"), "shingle")
    s2 = shingles.select(F.col("doc_id").alias("doc_id_2"), "shingle")
    inter = (
        cand.join(s1, "doc_id_1")
        .join(s2, ["doc_id_2", "shingle"])
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_id_1"), F.col("__n").alias("__n1")),
            "doc_id_1",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_id_2"), F.col("__n").alias("__n2")),
            "doc_id_2",
        )
        .withColumn(
            "__j", F.col("__inter") / (F.col("__n1") + F.col("__n2") - F.col("__inter"))
        )
        .filter(F.col("__j") >= threshold)
        .select(
            "doc_id_1", "doc_id_2", F.round(F.col("__j"), 4).alias("jaccard")
        )
    )
    return out


def near_dup_clusters(pairs: DataFrame, distributed_threshold: int = 200_000) -> DataFrame:
    """Collapse near-duplicate pairs into retention clusters:
    (doc_id, representative) for every document in any cluster; the
    representative (min id) is the copy a dedup pipeline keeps.

    Small pair sets resolve by driver-side union-find; beyond
    ``distributed_threshold`` edges — the normal case for a crawl corpus,
    where 30-50% duplicate rates make the pair set O(corpus) — resolution
    switches to the distributed large-star/small-star components in
    :mod:`..operators.graph` with no driver-side edge collection."""
    from datalake_indexes_spark.operators.duplicates import DuplicateDetection

    renamed = pairs.select(
        F.col("doc_id_1").alias("table_id_1"), F.col("doc_id_2").alias("table_id_2")
    )
    return DuplicateDetection.duplicate_groups(
        renamed, distributed_threshold=distributed_threshold
    ).select(F.col("table_id").alias("doc_id"), F.col("representative"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _word_bit(md5_col, bit: int):
    """Bit ``bit`` (0..63) of the first 16 hex chars of an md5 column."""
    nibble = F.instr(F.lit(HEX), F.substring(md5_col, bit // 4 + 1, 1)) - 1
    return F.shiftright(nibble, bit % 4).bitwiseAND(F.lit(1))


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """64-bit SimHash per document as a bit string (doc_id, simhash).

    Classic tf-weighted SimHash: each word votes ±tf on every bit of its
    md5; signature bit = 1 iff the vote sum is positive.  The 64 per-bit
    sums are plain aggregate columns — one groupBy over (doc, word) rows,
    no per-bit explode.
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # md5 materialized ONCE in its own projection: the 64 per-bit columns
    # then reference a bound attribute, so single evaluation is structural
    # rather than a bet on Catalyst subexpression elimination
    with_bits = tf.withColumn("__md5", F.md5(F.col("word"))).select(
        "doc_id",
        "tf",
        *[
            (_word_bit(F.col("__md5"), i) * 2 - 1).alias(f"__s{i}")
            for i in range(bits)
        ],
    )
    sums = with_bits.groupBy("doc_id").agg(
        *[F.sum(F.col(f"__s{i}") * F.col("tf")).alias(f"__v{i}") for i in range(bits)]
    )
    sig = F.concat(
        *[F.when(F.col(f"__v{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(bits)]
    )
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs: 16-bit band collision candidates, verified by
    Hamming distance <= max_hamming.

    (doc_id_1, doc_id_2, hamming).  With 4 bands, any pair within Hamming
    distance 3 is guaranteed caught (pigeonhole); distances up to
    ``max_hamming`` are caught when some band happens to agree.
    """
    sig = simhash_signatures(docs, text_col=text_col, id_col=id_col)
    band_len = SIMHASH_BITS // SIMHASH_BANDS
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("simhash", b * band_len + 1, band_len).alias("key"),
        )
        for b in range(SIMHASH_BANDS)
    ]
    bk = sig.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = bk.alias("a")
    b = bk.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
        )
        .distinct()
    )
    diff = F.zip_with(
        F.split(F.col("__sa"), ""),
        F.split(F.col("__sb"), ""),
        lambda x, y: (x != y).cast("int"),
    )
    return (
        cand.withColumn("hamming", F.aggregate(diff, F.lit(0), lambda acc, x: acc + x))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_1", "doc_id_2", "hamming")
    )


def near_dup_keep_best(
    docs: DataFrame,
    quality: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware near-dup retention: within each MinHash cluster,
    KEEP the highest-quality copy instead of the lowest id — the policy
    real curation pipelines want (the canonical copy of a boilerplate
    family is the cleanest one, not the first-crawled one).

    ``quality``: (doc_id, quality_score) — typically
    :func:`..text_analysis.quality_scores`, but any scoring works.
    (doc_id, cluster, quality_score, kept) for every clustered doc;
    ties on score break to the lower id (deterministic: scores are the
    rounded operator outputs).

    Scale shape: the pair/cluster machinery is unchanged (banded
    candidates, union-find under the guard / distributed CC above); the
    policy itself is one quality join + a per-cluster window whose
    partition is a near-dup GROUP — bounded by duplication depth, not
    corpus size."""
    from pyspark.sql import Window

    pairs = minhash_lsh_pairs(
        docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col
    )
    clusters = near_dup_clusters(pairs).select(
        "doc_id", F.col("representative").alias("cluster")
    )
    scored = clusters.join(
        quality.select(F.col(id_col).alias("doc_id"), "quality_score"), "doc_id"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return scored.withColumn(
        "kept", F.row_number().over(w) == 1
    ).select("doc_id", "cluster", "quality_score", "kept")


def doc_chunks(
    docs: DataFrame,
    chunk_words: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cid, chunk) — consecutive ``chunk_words``-word segments in
    document order; the segmenting is pure array expressions (split →
    sequence → slice/concat) inside whole-stage codegen, exploded only at
    the end.  Shared by :func:`chunk_dedup` and the streaming
    chunk-frequency store (``streaming/chunk_stream.py``)."""
    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, (i * chunk_words + 1).cast("int"), chunk_words)
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks_arr).alias("cid", "chunk"),
    )


def reassemble_chunks(exploded: DataFrame, boiler: DataFrame) -> DataFrame:
    """Drop ``boiler`` chunks from the (doc_id, cid, chunk) frame and
    rebuild each surviving document in original order — the shared back
    half of batch and streaming chunk dedup."""
    kept = exploded.join(boiler.select("chunk"), "chunk", "left_anti")
    dropped = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__total"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("cid", "chunk"))),
                    lambda s: s["chunk"],
                ),
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("kept_chunks"),
        )
        .join(dropped, "doc_id")
        .select(
            "doc_id",
            "text_clean",
            "kept_chunks",
            (F.col("__total") - F.col("kept_chunks")).alias("dropped_chunks"),
        )
    )


def chunk_dedup(
    docs: DataFrame,
    chunk_words: int = 4,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document exact chunk dedup — the RefinedWeb/Falcon "exact
    line dedup" stage adapted to delimiter-free corpora: drop every
    ``chunk_words``-word segment whose exact text appears in at least
    ``min_doc_freq`` DISTINCT documents (site boilerplate, license
    banners, navigation chrome), then reassemble each document from its
    surviving segments in original order.

    Returns (doc_id, text_clean, kept_chunks, dropped_chunks); documents
    whose every segment was boilerplate disappear (their text would be
    empty — the same contract as dropping empty docs after line dedup).

    Scale shape (100 TB): the segmenting is pure array expressions inside
    whole-stage codegen (split → sequence → slice/concat per chunk) — no
    shuffle until the per-chunk doc-frequency aggregate, which is a
    map-side-combinable count over (chunk, doc_id) pairs.  The
    boilerplate set is the df >= min_doc_freq slice only — a tiny
    fraction of distinct chunks — so the removal join is a skew-free
    equi-join on the chunk string (heavy boilerplate chunks hit MANY
    docs but each (doc, chunk-position) row joins exactly one
    boilerplate row; no row multiplication).  Reassembly is one
    groupBy(doc_id) with an in-array sort — partition count bounded by
    the corpus, per-group size by document length.
    """
    exploded = doc_chunks(docs, chunk_words, text_col=text_col, id_col=id_col)
    freq = exploded.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("df")
    )
    boiler = freq.filter(F.col("df") >= min_doc_freq).select("chunk")
    return reassemble_chunks(exploded, boiler)


def cross_source_dup_matrix(
    docs: DataFrame,
    pairs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Which sources duplicate which: fold any near-dup pair frame
    (doc_id_1, doc_id_2) into an unordered source×source matrix with
    duplication rates — the provenance diagnostic that decides whether a
    crawl snapshot is re-ingesting a mirror (off-diagonal mass) or a
    source self-plagiarizes (diagonal mass).

    (source_a <= source_b, n_pairs, n_docs_a, n_docs_b, dup_rate) where
    dup_rate = n_pairs / (n_docs_a·n_docs_b) cross pairs (same-source
    cells use n·(n-1)/2).  Two broadcast joins of the tiny id→source map
    onto the pair frame, one aggregate; the expensive part — finding the
    pairs — is whatever banded dedup operator produced them.
    """
    src = docs.select(F.col(id_col).alias("__id"), F.col(source_col).alias("__src"))
    sized = F.broadcast(
        src.groupBy("__src").agg(F.count(F.lit(1)).alias("__n"))
    )
    tagged = (
        pairs.join(
            F.broadcast(src.select(F.col("__id").alias("doc_id_1"), F.col("__src").alias("__s1"))),
            "doc_id_1",
        )
        .join(
            F.broadcast(src.select(F.col("__id").alias("doc_id_2"), F.col("__src").alias("__s2"))),
            "doc_id_2",
        )
        .select(
            F.least("__s1", "__s2").alias("source_a"),
            F.greatest("__s1", "__s2").alias("source_b"),
        )
    )
    counts = tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    na = sized.select(F.col("__src").alias("source_a"), F.col("__n").alias("n_docs_a"))
    nb = sized.select(F.col("__src").alias("source_b"), F.col("__n").alias("n_docs_b"))
    possible = F.when(
        F.col("source_a") == F.col("source_b"),
        F.col("n_docs_a") * (F.col("n_docs_a") - 1) / 2,
    ).otherwise(F.col("n_docs_a") * F.col("n_docs_b"))
    return (
        counts.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a", "source_b", "n_pairs", "n_docs_a", "n_docs_b",
            F.round(F.col("n_pairs") / possible, 6).alias("dup_rate"),
        )
    )


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = 500,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric n-gram containment pairs — the subset-duplicate
    detector Jaccard structurally misses: a snippet quoted inside a
    longer document has containment ≈ 1 in one direction but Jaccard ≈
    |snippet|/|document|, far below any sane threshold (this is why
    news-corpus dedup filters on containment, not similarity).

    Emits (doc_id_1 < doc_id_2, containment_1_in_2, containment_2_in_1,
    jaccard) for pairs where EITHER direction clears ``threshold``.
    Candidate generation and the hot-shingle cap are exactly the
    :func:`ngram_jaccard_pairs` discipline (cap bounds the d² join;
    verification is exact over the full shingle sets); only the final
    arithmetic differs, so the scale story is shared.

    ``shingles`` lets a caller that already derived the (doc_id,
    shingle) frame (e.g. :func:`subset_dedup`) pass it in instead of
    paying a second corpus shingle scan.
    """
    sh = (
        shingles
        if shingles is not None
        else word_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    )
    cand_src = sh
    if max_shingle_freq is not None:
        cand_src = sh.join(
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_shingle_freq)
            .select("shingle"),
            "shingle",
            "left_semi",
        )
    c1, c2 = cand_src.alias("c1"), cand_src.alias("c2")
    cand = (
        c1.join(
            c2,
            (F.col("c1.shingle") == F.col("c2.shingle"))
            & (F.col("c1.doc_id") < F.col("c2.doc_id")),
        )
        .select(
            F.col("c1.doc_id").alias("doc_id_1"),
            F.col("c2.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )
    # verify over the FULL shingle sets (capped shingles prune candidate
    # generation only) — reported containment/jaccard values stay exact
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), "shingle")
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), "shingle")
    inter = (
        cand.join(s1, "doc_id_1")
        .join(s2, ["doc_id_2", "shingle"])
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    both = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_id_1").withColumnRenamed("__n", "__n1"),
            "doc_id_1",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_id_2").withColumnRenamed("__n", "__n2"),
            "doc_id_2",
        )
    )
    c12 = F.col("__inter") / F.col("__n1")
    c21 = F.col("__inter") / F.col("__n2")
    return (
        both.filter((c12 >= threshold) | (c21 >= threshold))
        .select(
            "doc_id_1", "doc_id_2",
            F.round(c12, 4).alias("containment_1_in_2"),
            F.round(c21, 4).alias("containment_2_in_1"),
            F.round(
                F.col("__inter") / (F.col("__n1") + F.col("__n2") - F.col("__inter")), 4
            ).alias("jaccard"),
        )
    )


def subset_dedup(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = 500,
) -> DataFrame:
    """Maximal-document retention over near-containment: drop every
    document whose shingle set is ``threshold``-contained in a STRICTLY
    LARGER document (ties broken toward the smaller doc id), keep the
    rest.  The news-corpus policy — when a snippet and the article that
    quotes it both survive quality filtering, keep the article.

    The drop rule is a pure per-pair predicate (no transitive closure):
    x drops iff some y has containment(x→y) ≥ t and (|y| > |x| or
    (|y| = |x| and y.id < x.id)).  A chain A ⊂ B ⊂ C resolves in one
    pass — C is contained in nothing and survives, A and B each lose to
    a bigger container — so the operator is one containment join plus
    one aggregation, deterministic on any engine.

    Returns every doc: (doc_id, n_shingles, kept, container_id) with
    container_id = the smallest qualifying container (NULL for kept
    docs).  Scale shape inherited from :func:`ngram_containment_pairs`
    (capped candidate generation, exact full-set verification).
    """
    # ONE shingle derivation shared by the pair search and the size
    # table — without the pass-through the operator would shingle-scan
    # the corpus twice
    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    pairs = ngram_containment_pairs(
        docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col,
        max_shingle_freq=max_shingle_freq, shingles=sh,
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # directed "x contained in y" edges from the symmetric pair rows
    e1 = pairs.filter(F.col("containment_1_in_2") >= threshold).select(
        F.col("doc_id_1").alias("x"), F.col("doc_id_2").alias("y")
    )
    e2 = pairs.filter(F.col("containment_2_in_1") >= threshold).select(
        F.col("doc_id_2").alias("x"), F.col("doc_id_1").alias("y")
    )
    edges = (
        e1.unionByName(e2)
        .join(sizes.select(F.col("doc_id").alias("x"),
                           F.col("n_shingles").alias("__nx")), "x")
        .join(sizes.select(F.col("doc_id").alias("y"),
                           F.col("n_shingles").alias("__ny")), "y")
        .filter(
            (F.col("__ny") > F.col("__nx"))
            | ((F.col("__ny") == F.col("__nx")) & (F.col("y") < F.col("x")))
        )
    )
    containers = edges.groupBy(F.col("x").alias("doc_id")).agg(
        F.min("y").alias("container_id")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(sizes, "doc_id", "left")
        .join(containers, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.col("container_id").isNull().alias("kept"),
            "container_id",
        )
    )


def dedup_recall_report(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Recall of the MinHash+LSH near-dup search against the EXACT
    n-gram Jaccard truth at the same threshold, measured in-engine —
    the gauge a dedup deployment reads before trusting a banding
    configuration (k × bands is a recall dial; this is its meter).
    One row: (threshold, n_truth, n_found, recall).

    Both sides verify candidates against full shingle sets, so LSH
    output is a SUBSET of the truth (banding only loses candidates,
    never invents pairs) — recall is the whole story, precision is 1 by
    construction.  Cost is the two existing operators plus one
    pair-keyed semi-join.
    """
    truth = ngram_jaccard_pairs(
        docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col
    ).select("doc_id_1", "doc_id_2")
    approx = minhash_lsh_pairs(
        docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col
    ).select("doc_id_1", "doc_id_2")
    found = truth.join(approx, ["doc_id_1", "doc_id_2"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_found")
    )
    totals = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return totals.crossJoin(found).select(
        F.lit(threshold).alias("threshold"),
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_found").cast("long").alias("n_found"),
        F.when(F.col("n_truth") > 0,
               F.round(F.col("n_found") / F.col("n_truth"), 6))
        .otherwise(F.lit(1.0))
        .alias("recall"),
    )


_GRAM_SEP = chr(1)  # joins gram words before hashing (never appears in text)


def _word_grams(df: DataFrame, icol: str, tcol: str, out_id: str, k: int) -> DataFrame:
    """(out_id, pos, g): positional word k-grams — whitespace-split words,
    g = xxhash64 of the separator-joined gram.  The shared front end of
    every span detector (inter-doc, corpus-vs-reference, intra-doc)."""
    words = F.filter(F.split(F.col(tcol), r"\s+"), lambda w: w != "")
    base = df.select(F.col(icol).alias(out_id), words.alias("__w")).filter(
        F.size("__w") >= k
    )
    return base.select(
        out_id,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__w") - k),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(
                        F.concat_ws(_GRAM_SEP, F.slice("__w", i + 1, k))
                    ).alias("g"),
                ),
            )
        ).alias("kg"),
    ).select(out_id, F.col("kg.pos").alias("pos"), F.col("kg.g").alias("g"))


def _diagonal_spans(
    hits: DataFrame, keys: list[str], k: int, min_words: int
) -> DataFrame:
    """Merge same-diagonal consecutive gram hits into maximal spans:
    ``hits`` = (*keys, p1, diag) -> (*keys, diag, start_1, n_words) with
    n_words >= min_words.  The run-merge is the chained-gap rule (lag +
    running sum) keyed by (*keys, diag) — windows bounded by matched
    grams, never global.  A run of m consecutive k-gram hits covers
    m + k - 1 words."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys, "diag").orderBy("p1")
    runs = hits.withColumn(
        "__new",
        F.when(
            F.lag("p1").over(w).isNull() | (F.col("p1") - F.lag("p1").over(w) > 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__run",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.groupBy(*keys, "diag", "__run")
        .agg(
            F.min("p1").alias("start_1"),
            (F.max("p1") - F.min("p1") + k).alias("n_words"),
        )
        .filter(F.col("n_words") >= min_words)
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 5,
    min_words: int = 10,
    max_gram_freq: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    approx_df: bool = False,
) -> DataFrame:
    """Exact repeated SPANS across documents — (doc_id_1, doc_id_2,
    start_1, start_2, n_words) for every maximal run of >= ``min_words``
    consecutive words appearing verbatim in both documents (the
    Lee-et-al. "Deduplicating Training Data" exact-substring signal;
    suffix arrays do not distribute, k-gram diagonal runs do).

    Construction: word k-grams with positions -> equi-join on the gram
    between documents (doc_id_1 < doc_id_2) -> matches on the same
    DIAGONAL (start_1 - start_2) with consecutive positions are one
    span (``_diagonal_spans``).

    Scale shape: the gram join is the only corpus-sized shuffle, keyed
    by the gram hash; ``max_gram_freq`` drops grams appearing in more
    documents than the cap BEFORE the self-join (the boilerplate-shingle
    d-squared guard the n-gram Jaccard path uses).  Recall effect of the
    cap, stated precisely: a capped gram is invisible to the run merge,
    so a span is missed entirely when ALL its grams are capped and —
    subtler — a capped gram in the MIDDLE of a long span splits it into
    two sub-runs, each of which must clear ``min_words`` on its own.
    Corpus-wide boilerplate inside an otherwise-rare span is therefore a
    recall risk worth tuning the cap for.  The run-merge windows are per
    (pair, diagonal) partitions — bounded by matched grams, never
    global.
    """
    g = _word_grams(docs, id_col, text_col, "doc_id", k)
    # the cap is a heuristic threshold, so at true scale the exact
    # per-gram distinct (a full distinct aggregation over every corpus
    # gram) is wasted precision: approx_df=True gates on HLL
    # approx_count_distinct (~2% rsd) instead — same one-shuffle shape,
    # a fraction of the aggregation state.  The graded oracle path keeps
    # exact counts (the DuckDB twin recomputes them independently).
    df_agg = (
        F.approx_count_distinct("doc_id") if approx_df
        else F.count_distinct("doc_id")
    )
    rare = (
        g.groupBy("g")
        .agg(df_agg.alias("__df"))
        .filter(F.col("__df") <= max_gram_freq)
        .select("g")
    )
    g2 = g.join(rare, "g", "left_semi")

    a, b = g2.alias("a"), g2.alias("b")
    # one row per (position, position) pair -> already distinct
    hits = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id_1"),
        F.col("b.doc_id").alias("doc_id_2"),
        F.col("a.pos").alias("p1"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    return _diagonal_spans(hits, ["doc_id_1", "doc_id_2"], k, min_words).select(
        "doc_id_1",
        "doc_id_2",
        "start_1",
        (F.col("start_1") - F.col("diag")).alias("start_2"),
        F.col("n_words").cast("long").alias("n_words"),
    )


def remove_repeated_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The REMOVAL action for :func:`repeated_spans` — (doc_id,
    n_words_before, n_words_removed, text_cleaned): every word covered
    by a detected span ON THE doc_id_2 SIDE is cut, so of each repeated
    substring the copy in the smallest doc id survives (the smallest doc
    of a clique never appears as doc_id_2 — the canonical copy falls out
    of the pair orientation, no extra election pass).

    Whitespace is normalized to single spaces in the rebuilt text (the
    span detector's word universe IS the split on whitespace — both
    stated in its contract).  Overlapping spans need no interval merge:
    a word is cut iff ANY span covers it.

    Scale shape: the interval list per affected doc is a collect_list
    bounded by spans-per-doc (pair-oriented: each doc carries only ITS
    cut list, never the corpus's); the cut itself is a pure array
    expression riding the corpus scan — one small aggregate + one
    broadcast-or-shuffle left join, no explode of words to rows.
    """
    iv = spans.select(
        F.col("doc_id_2").alias(id_col),
        F.struct(
            F.col("start_2").alias("s"),
            (F.col("start_2") + F.col("n_words")).alias("e"),
        ).alias("__iv"),
    )
    return _cut_word_intervals(docs, iv, text_col, id_col)


def _cut_word_intervals(
    docs: DataFrame, iv: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Shared cut tail: ``iv`` = (id_col, __iv struct<s,e>) word-index
    intervals to remove; returns (id, n_words_before, n_words_removed,
    text_cleaned) for EVERY input doc (uncut docs pass through with 0
    removed).  One small aggregate + one left join; the cut is a pure
    array expression riding the corpus scan."""
    per_doc = iv.groupBy(id_col).agg(F.collect_list("__iv").alias("__ivs"))
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    base = (
        docs.select(F.col(id_col), words.alias("__w"))
        .join(per_doc, id_col, "left")
        .withColumn(
            "__ivs",
            F.coalesce(
                "__ivs",
                F.array().cast("array<struct<s:int,e:int>>"),
            ),
        )
    )
    kept = F.filter(
        F.col("__w"),
        lambda w, i: ~F.exists(
            F.col("__ivs"), lambda v: (i >= v["s"]) & (i < v["e"])
        ),
    )
    return base.select(
        F.col(id_col),
        F.size("__w").cast("long").alias("n_words_before"),
        (F.size("__w") - F.size(kept)).cast("long").alias("n_words_removed"),
        F.array_join(kept, " ").alias("text_cleaned"),
    )


def cross_repeated_spans(
    docs: DataFrame,
    reference: DataFrame,
    k: int = 5,
    min_words: int = 10,
    max_ref_gram_freq: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str = "text",
    ref_id_col: str = "ref_id",
) -> DataFrame:
    """Exact verbatim spans shared between a CORPUS and a small
    REFERENCE set (benchmark suites, eval answers, license boilerplate)
    — (doc_id, ref_id, start_doc, start_ref, n_words) for every maximal
    run of >= ``min_words`` consecutive words appearing in both.  The
    span-level contamination signal: :func:`repeated_spans` restricted
    to corpus-vs-reference pairs, never corpus-vs-corpus.

    Scale shape — this is the asymmetric win over the self-join variant:
    the reference side is benchmark-sized, so its grams BROADCAST and
    the corpus text never shuffles; matches (bounded by reference-gram
    hits, not corpus size) are the only rows that reach the run-merge
    windows, which ride the (doc, ref, diagonal) partitioning.
    ``max_ref_gram_freq`` drops grams occurring more than the cap times
    WITHIN the reference (stop-phrase guard: a ubiquitous reference gram
    multiplies every corpus hit by its occurrence count).  Recall
    effect, stated precisely: a capped gram in the middle of a leaked
    span splits it into sub-runs that must each clear ``min_words`` —
    shared instruction boilerplate inside benchmark items is the case to
    tune for (raise the cap or lower ``min_words``)."""
    ref_g = _word_grams(reference, ref_id_col, ref_text_col, "__rid", k)
    rare = (
        ref_g.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_ref_gram_freq)
        .select("g")
    )
    ref_g = ref_g.join(rare, "g", "left_semi").withColumnRenamed("pos", "__rpos")
    doc_g = _word_grams(docs, id_col, text_col, "__did", k)

    # one row per (corpus position, reference position) -> already distinct
    hits = doc_g.join(F.broadcast(ref_g), "g").select(
        F.col("__did").alias("doc_id"),
        F.col("__rid").alias("ref_id"),
        F.col("pos").alias("p1"),
        (F.col("pos") - F.col("__rpos")).alias("diag"),
    )
    return _diagonal_spans(hits, ["doc_id", "ref_id"], k, min_words).select(
        "doc_id",
        "ref_id",
        F.col("start_1").alias("start_doc"),
        (F.col("start_1") - F.col("diag")).alias("start_ref"),
        F.col("n_words").cast("long").alias("n_words"),
    )


def decontaminate_spans(
    docs: DataFrame,
    reference: DataFrame,
    k: int = 5,
    min_words: int = 10,
    max_ref_gram_freq: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str = "text",
    ref_id_col: str = "ref_id",
) -> DataFrame:
    """Span-level decontamination — cut every verbatim reference span
    (>= ``min_words`` words) out of the corpus text instead of dropping
    whole documents: (doc_id, n_words_before, n_words_removed,
    text_cleaned) for EVERY corpus doc.

    The doc-level :func:`..operators.text_analysis.decontaminate` drops
    any document sharing n-grams with the benchmark — right for heavy
    contamination, wasteful when one quoted question sits inside an
    otherwise-clean document; this keeps the document and removes
    exactly the leaked words.  Unlike :func:`remove_repeated_spans`
    there is no canonical-copy survival: reference text is ALWAYS cut."""
    spans = cross_repeated_spans(
        docs,
        reference,
        k=k,
        min_words=min_words,
        max_ref_gram_freq=max_ref_gram_freq,
        text_col=text_col,
        id_col=id_col,
        ref_text_col=ref_text_col,
        ref_id_col=ref_id_col,
    )
    iv = spans.select(
        F.col("doc_id").alias(id_col),
        F.struct(
            F.col("start_doc").alias("s"),
            (F.col("start_doc") + F.col("n_words")).alias("e"),
        ).alias("__iv"),
    )
    return _cut_word_intervals(docs, iv, text_col, id_col)


def self_repeated_spans(
    docs: DataFrame,
    k: int = 5,
    min_words: int = 10,
    max_gram_occ: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact repeated spans WITHIN a document — (doc_id, start_1,
    start_2, n_words), start_1 < start_2, for every maximal run of
    >= ``min_words`` consecutive words a document repeats verbatim
    later in itself (navigation blocks, quoted-reply chains, choruses —
    the intra-doc face of the Lee-et-al. exact-substring signal).

    Same diagonal-run construction as :func:`repeated_spans`, with the
    gram join restricted to (same doc, pos_1 < pos_2) — so the shuffle
    key is (doc, gram) and candidate volume is per-gram occurrence
    pairs WITHIN one document, never cross-corpus.  ``max_gram_occ``
    drops grams occurring more than the cap times in one document (a
    degenerate fully-periodic doc would otherwise pair quadratically;
    such docs are flagged by ``repetition_scores`` regardless).  Recall
    effect, stated precisely: a capped gram splits any span containing
    it into sub-runs that must each clear ``min_words`` on their own.
    """
    from pyspark.sql.window import Window

    grams = _word_grams(docs, id_col, text_col, "doc_id", k)
    occ_w = Window.partitionBy("doc_id", "g")
    g2 = (
        grams.withColumn("__occ", F.count(F.lit(1)).over(occ_w))
        .filter(F.col("__occ") <= max_gram_occ)
        .drop("__occ")
    )

    a, b = g2.alias("a"), g2.alias("b")
    # one row per (earlier position, later position) -> already distinct
    hits = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.g") == F.col("b.g"))
        & (F.col("a.pos") < F.col("b.pos")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.pos").alias("p1"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    return _diagonal_spans(hits, ["doc_id"], k, min_words).select(
        "doc_id",
        "start_1",
        (F.col("start_1") - F.col("diag")).alias("start_2"),
        F.col("n_words").cast("long").alias("n_words"),
    )


def remove_self_repetitions(
    docs: DataFrame,
    k: int = 5,
    min_words: int = 10,
    max_gram_occ: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut every LATER copy of a document's self-repeated spans —
    (doc_id, n_words_before, n_words_removed, text_cleaned) for every
    doc; the earliest occurrence survives (it is never a ``start_2``).
    Overlapping or chained repeats (periodic text) need no special
    casing: a word is cut iff ANY later-copy interval covers it, so a
    sentence repeated m times keeps exactly its first occurrence."""
    spans = self_repeated_spans(
        docs,
        k=k,
        min_words=min_words,
        max_gram_occ=max_gram_occ,
        text_col=text_col,
        id_col=id_col,
    )
    iv = spans.select(
        F.col("doc_id").alias(id_col),
        F.struct(
            F.col("start_2").alias("s"),
            (F.col("start_2") + F.col("n_words")).alias("e"),
        ).alias("__iv"),
    )
    return _cut_word_intervals(docs, iv, text_col, id_col)


def contamination_report(
    docs: DataFrame,
    reference: DataFrame,
    k: int = 5,
    min_words: int = 10,
    max_ref_gram_freq: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    ref_text_col: str = "text",
    ref_id_col: str = "ref_id",
) -> DataFrame:
    """Data-card contamination matrix — per (corpus ``group_col``,
    reference item): how many documents leak it and how many words leak
    in total: (group, ref_id, n_docs, n_spans, words_leaked).  The
    aggregate every release audit wants next to the per-doc surgical
    view (:func:`decontaminate_spans` is the FIX; this is the REPORT
    that says which sources are dirty against which benchmark).

    Scale shape: everything of :func:`cross_repeated_spans` (broadcast
    reference, corpus never shuffles for the join) plus one group-by
    over the span rows — bounded by detected contamination, not corpus
    size."""
    spans = cross_repeated_spans(
        docs,
        reference,
        k=k,
        min_words=min_words,
        max_ref_gram_freq=max_ref_gram_freq,
        text_col=text_col,
        id_col=id_col,
        ref_text_col=ref_text_col,
        ref_id_col=ref_id_col,
    )
    keyed = spans.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("group")),
        "doc_id",
    )
    return keyed.groupBy("group", "ref_id").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("n_words").alias("words_leaked"),
    )


def doc_novelty(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document n-gram novelty: (doc_id, n_shingles, novel_frac) —
    the fraction of a document's distinct word n-grams that appear in NO
    other document.  The inverse view of the pairwise dedup family: a
    data-mixing pipeline upsamples high-novelty sources and a boilerplate
    census reads the low end, without ever materializing candidate pairs.

    novel_frac = |{g ∈ shingles(d) : df(g) = 1}| / |shingles(d)| over
    DISTINCT shingles per doc (:func:`word_shingles`); documents shorter
    than ``n`` words report 0 shingles and NULL novelty.

    Scale shape: one distinct-shingle frame, ONE document-frequency
    aggregate keyed by shingle (uniform md5-like text keys — no hot-key
    risk beyond genuinely corpus-wide boilerplate, which is exactly what
    the metric measures), one broadcast-free join back on shingle and a
    per-doc aggregate.  No pair join anywhere, O(distinct shingles)
    shuffle volume.
    """
    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        sh.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("__df") == 1).cast("long")).alias("__novel"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.round(
                F.col("__novel") / F.nullif(F.col("n_shingles"), F.lit(0)), 6
            ).alias("novel_frac"),
        )
    )


def prefix_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard pairs via prefix filtering (PPJoin-style; Xiao et
    al., "Efficient Similarity Joins for Near Duplicate Detection",
    WWW 2008).  Same contract as :func:`ngram_jaccard_pairs` — every pair
    with n-gram Jaccard >= ``threshold``, exact values — but candidate
    generation self-joins only each document's PREFIX: its
    ``|d| - ceil(t·|d|) + 1`` globally *rarest* shingles under a total
    (document-frequency asc, shingle asc) order.

    Why this is the scale path among the EXACT variants: the full
    inverted-index self-join pays df² rows per shingle, dominated by hot
    boilerplate; the ``max_shingle_freq`` cap fixes that by *documenting a
    recall loss*.  The prefix filter gets the same candidate collapse with
    ZERO false negatives — two sets with Jaccard >= t must overlap in
    >= ceil(t/(1+t)·(|x|+|y|)) elements, which forces at least one shared
    element inside both prefixes under ANY shared total order; hot
    shingles sort LAST (df desc ordering puts them outside prefixes), so
    boilerplate never generates candidates unless a pair genuinely has
    nothing rarer in common.  The exact all-pairs SQL is therefore this
    operator's oracle VERBATIM (dedup_ngram_jaccard_sql at the same
    threshold) — the completeness theorem is driver-checked, not claimed.

    Exactness discipline: prefix lengths and the size filter use integer
    arithmetic (threshold as a num/den fraction, ``ceil(t·n)`` =
    ``(num·n + den - 1) div den``; size pruning ``min·den >= num·max``) so
    no float rounding can shorten a prefix or drop a candidate; the final
    jaccard filter/rounding is shared with every other pair path via
    :func:`_verify_jaccard`.

    Plan shape: one shuffle keyed by shingle (df counts + the candidate
    join), one window keyed by doc_id (prefix ranks), verification on the
    surviving pairs only.  No driver collect, no cartesian step.
    """
    # multi-consumer shingle frame — pin it once (see minhash_lsh_pairs)
    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col).localCheckpoint(
        eager=False
    )
    return _verify_jaccard(prefix_candidates(sh, threshold), sh, threshold)


def prefix_candidates(sh: DataFrame, threshold: float) -> DataFrame:
    """Candidate (doc_id_1, doc_id_2) pairs under the prefix filter —
    factored out of :func:`prefix_jaccard_pairs` so its candidate-space
    reduction is directly measurable against the full inverted-index
    self-join (see test_incremental_dedup.py)."""
    from fractions import Fraction

    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("__df"), F.asc("shingle"))
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("__rank", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    # prefix_len = n - ceil(t*n) + 1, integer-exact via (num*n+den-1) div den
    prefix = ranked.filter(
        F.col("__rank")
        <= F.col("__n")
        - F.expr(f"(({num} * __n + {den} - 1) div {den})")
        + F.lit(1)
    ).select("doc_id", "shingle", "__n")
    p1, p2 = prefix.alias("p1"), prefix.alias("p2")
    return (
        p1.join(
            p2,
            (F.col("p1.shingle") == F.col("p2.shingle"))
            & (F.col("p1.doc_id") < F.col("p2.doc_id"))
            # size filter, integer-exact: J >= t ⇒ min(|x|,|y|) >= t·max
            & (
                F.least(F.col("p1.__n"), F.col("p2.__n")) * den
                >= num * F.greatest(F.col("p1.__n"), F.col("p2.__n"))
            ),
        )
        .select(
            F.col("p1.doc_id").alias("doc_id_1"),
            F.col("p2.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )


def pair_threshold_sweep(
    docs: DataFrame,
    thresholds: tuple[float, ...] = (0.5, 0.6, 0.7, 0.8, 0.9),
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup aggressiveness curve: one row per candidate threshold —
    (threshold, n_pairs, n_docs) where n_pairs counts exact-Jaccard pairs
    >= t and n_docs the distinct documents involved in at least one such
    pair.  The tuning view a pipeline owner reads BEFORE committing a
    near-dup threshold to a 100 TB run: the knee of this curve separates
    template families from genuine re-posts.

    One exact pair computation at min(thresholds) (prefix-filtered, so
    the loosest threshold still never joins hot shingles), then ONE
    conditional-aggregation census over that SMALL pair set unpivoted
    back to rows — the corpus is touched once, the sweep is free.
    Census conditions compare the ROUNDED jaccard (the operator family's
    reported value), so both engines decide every boundary identically.
    """
    ts = sorted(float(t) for t in thresholds)
    pairs = prefix_jaccard_pairs(
        docs, n=n, threshold=ts[0], text_col=text_col, id_col=id_col
    )
    pair_row = pairs.agg(
        *[
            F.sum((F.col("jaccard") >= t).cast("long")).alias(f"__p{i}")
            for i, t in enumerate(ts)
        ]
    )
    ids = pairs.select(F.col("doc_id_1").alias("d"), "jaccard").unionAll(
        pairs.select(F.col("doc_id_2").alias("d"), "jaccard")
    )
    doc_row = ids.agg(
        *[
            F.count_distinct(
                F.when(F.col("jaccard") >= t, F.col("d"))
            ).alias(f"__d{i}")
            for i, t in enumerate(ts)
        ]
    )
    cells = ", ".join(
        f"CAST({t} AS DOUBLE), coalesce(__p{i}, 0L), __d{i}"
        for i, t in enumerate(ts)
    )
    return pair_row.crossJoin(doc_row).select(
        F.expr(
            f"stack({len(ts)}, {cells}) AS (threshold, n_pairs, n_docs)"
        )
    )


# --- incremental (history-aware) exact dedup -------------------------------
#
# The ingestion-time question at 100 TB is not "which docs inside this
# batch duplicate each other" but "which docs of this INCREMENT already
# exist in the accumulated corpus" — and scanning the accumulated corpus
# per increment is exactly what a Bloom prefilter amortizes away.  The
# filter here is a *position-set* Bloom: k md5-derived probe positions per
# hash (the same "j:item" probe family as functions/hashes.py
# BloomFilter._positions), with the m-position space encoded as an
# md5-hex PREFIX (hex_len chars ⇒ m = 16^hex_len).  The history's distinct
# probe set is bounded by m regardless of corpus size — a broadcastable
# constant, like a bitset, but replayable verbatim by the DuckDB twin
# (string set membership, no bit arithmetic to diverge on).


def _bloom_probe_array(col, k_hashes: int, hex_len: int):
    """Array of k probe positions for one hash value: the first
    ``hex_len`` hex chars of md5("j:" || value), j = 0..k-1."""
    return F.array(
        *[
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, hex_len)
            for j in range(k_hashes)
        ]
    )


def incremental_new_docs(
    history: DataFrame,
    increment: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_hashes: int = 3,
    hex_len: int = 4,
) -> DataFrame:
    """Exact incremental dedup: the increment's genuinely NEW documents —
    first occurrence per content hash within the increment, whose hash
    appears nowhere in ``history``.  Output (doc_id, content_hash,
    n_copies) with n_copies the within-increment multiplicity.

    Bloom-prefiltered, exactly verified: an increment hash with ANY probe
    position missing from the history probe set is provably new (Bloom
    soundness — no false negatives) and skips verification entirely; only
    the Bloom-positive survivors are checked against history, via a
    broadcast semi-join that leaves the history scan Exchange-free.  False
    positives therefore cost one bounded join row, never a wrong answer —
    the oracle is the plain anti-join semantics with no Bloom in sight.

    Scale shape: history is scanned once, projected to md5(text) at scan
    level, and NEVER shuffled (probe-set aggregate is a bounded distinct;
    the verify is history ⋉ broadcast(candidates)).  In steady state the
    probe set is a persisted artifact maintained additively per increment
    (set union), so re-ingestion cost is O(increment) + O(matches).
    """
    hh = history.select(F.md5(F.col(text_col)).alias("content_hash"))
    firsts = (
        increment.select(
            F.col(id_col).alias("doc_id"),
            F.md5(F.col(text_col)).alias("content_hash"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
    hist_pos = (
        hh.select(
            F.explode(
                _bloom_probe_array(F.col("content_hash"), k_hashes, hex_len)
            ).alias("p")
        )
        .distinct()
    )
    probes = firsts.select(
        "content_hash",
        F.explode(
            _bloom_probe_array(F.col("content_hash"), k_hashes, hex_len)
        ).alias("p"),
    )
    # >=1 missing probe  ⇒  provably new (skips verification)
    bf_new = (
        probes.join(F.broadcast(hist_pos), "p", "left_anti")
        .select("content_hash")
        .distinct()
    )
    candidates = firsts.join(bf_new, "content_hash", "left_anti")
    # exact verify: history ⋉ broadcast(candidate hashes) — history side
    # never shuffles; result is bounded by the candidate count
    confirmed = (
        hh.join(
            F.broadcast(candidates.select("content_hash")),
            "content_hash",
            "left_semi",
        )
        .distinct()
    )
    new_from_cand = candidates.join(
        F.broadcast(confirmed), "content_hash", "left_anti"
    )
    return (
        firsts.join(bf_new, "content_hash", "left_semi")
        .unionByName(new_from_cand)
        .select("doc_id", "content_hash", "n_copies")
    )


def incremental_dedup_report(
    history: DataFrame,
    increment: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_hashes: int = 3,
    hex_len: int = 3,
) -> DataFrame:
    """One-row meter for the Bloom prefilter in
    :func:`incremental_new_docs` — the same contract as the dedup-recall
    and ANN-recall gauges: every number exact and engine-replayable.

    Columns: n_history, n_increment, n_increment_distinct, n_within_dups,
    n_bf_new (provably new — skipped verification), n_bf_candidates
    (Bloom-positive), n_history_dups (verified true), n_bf_false_positives
    (candidates that verification cleared), n_new, fp_rate
    (false positives / genuinely-new, rounded 6) — the knob-tuning number:
    it prices verification waste against probe-set size m = 16^hex_len.

    Default hex_len=3 (m=4096) is deliberately small so the gauge is
    non-vacuous at fixture scale; production uses hex_len>=6 with the
    same code path.
    """
    hh = history.select(F.md5(F.col(text_col)).alias("content_hash"))
    inc = increment.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    firsts = inc.groupBy("content_hash").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    hist_pos = (
        hh.select(
            F.explode(
                _bloom_probe_array(F.col("content_hash"), k_hashes, hex_len)
            ).alias("p")
        )
        .distinct()
    )
    probes = firsts.select(
        "content_hash",
        F.explode(
            _bloom_probe_array(F.col("content_hash"), k_hashes, hex_len)
        ).alias("p"),
    )
    bf_new = (
        probes.join(F.broadcast(hist_pos), "p", "left_anti")
        .select("content_hash")
        .distinct()
    )
    hist_hashes = hh.distinct()
    truly_dup = firsts.join(hist_hashes, "content_hash", "left_semi")
    counts = (
        firsts.agg(
            F.count(F.lit(1)).alias("n_increment_distinct"),
            F.sum("n_copies").alias("n_increment"),
        )
        .crossJoin(hh.agg(F.count(F.lit(1)).alias("n_history")))
        .crossJoin(bf_new.agg(F.count(F.lit(1)).alias("n_bf_new")))
        .crossJoin(truly_dup.agg(F.count(F.lit(1)).alias("n_history_dups")))
    )
    return counts.select(
        F.col("n_history").cast("long").alias("n_history"),
        F.col("n_increment").cast("long").alias("n_increment"),
        F.col("n_increment_distinct").cast("long").alias("n_increment_distinct"),
        (F.col("n_increment") - F.col("n_increment_distinct"))
        .cast("long")
        .alias("n_within_dups"),
        F.col("n_bf_new").cast("long").alias("n_bf_new"),
        (F.col("n_increment_distinct") - F.col("n_bf_new"))
        .cast("long")
        .alias("n_bf_candidates"),
        F.col("n_history_dups").cast("long").alias("n_history_dups"),
        (
            F.col("n_increment_distinct")
            - F.col("n_bf_new")
            - F.col("n_history_dups")
        )
        .cast("long")
        .alias("n_bf_false_positives"),
        (F.col("n_increment_distinct") - F.col("n_history_dups"))
        .cast("long")
        .alias("n_new"),
        F.round(
            (
                F.col("n_increment_distinct")
                - F.col("n_bf_new")
                - F.col("n_history_dups")
            )
            / F.nullif(
                F.col("n_increment_distinct") - F.col("n_history_dups"),
                F.lit(0),
            ),
            6,
        ).alias("fp_rate"),
    )


def prefix_jaccard_join_ab(
    docs_a: DataFrame,
    docs_b: DataFrame,
    n: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact cross-corpus Jaccard join (R-S form of
    :func:`prefix_jaccard_pairs`): every (a, b) pair with n-gram Jaccard
    >= ``threshold`` between the two corpora, exact values — the
    NEAR-dup completion of the incremental-ingest story
    (:func:`incremental_new_docs` catches exact re-crawls; this catches
    the lightly-edited ones against history without ever self-joining
    history).

    The prefix-filter theorem carries over verbatim provided both sides
    rank their tokens under ONE shared total order — document frequency
    over the UNION of the two corpora (df asc, shingle asc), so a token's
    rank is identical no matter which side it appears on.  Output
    (doc_id_a, doc_id_b, jaccard); the oracle is the plain all-pairs
    cross join at the same threshold.

    Scale shape: at steady state the A side (increment) is small and the
    B side (history) huge; candidates are generated only where prefixes
    collide, so history rows sharing no rare shingle with the increment
    never leave their scan.  One shuffle keyed by shingle, one window per
    side keyed by doc_id, verification on surviving pairs only.
    """
    from fractions import Fraction

    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    sh_a = word_shingles(docs_a, n=n, text_col=text_col, id_col=id_col)
    sh_b = word_shingles(docs_b, n=n, text_col=text_col, id_col=id_col)
    dfreq = (
        sh_a.select("shingle")
        .unionAll(sh_b.select("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
    )

    def prefixes(sh: DataFrame) -> DataFrame:
        w = Window.partitionBy("doc_id").orderBy(F.asc("__df"), F.asc("shingle"))
        ranked = (
            sh.join(dfreq, "shingle")
            .withColumn("__rank", F.row_number().over(w))
            .withColumn(
                "__n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
            )
        )
        return ranked.filter(
            F.col("__rank")
            <= F.col("__n")
            - F.expr(f"(({num} * __n + {den} - 1) div {den})")
            + F.lit(1)
        ).select("doc_id", "shingle", "__n")

    pa, pb = prefixes(sh_a).alias("pa"), prefixes(sh_b).alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.shingle") == F.col("pb.shingle"))
            & (
                F.least(F.col("pa.__n"), F.col("pb.__n")) * den
                >= num * F.greatest(F.col("pa.__n"), F.col("pb.__n"))
            ),
        )
        .select(
            F.col("pa.doc_id").alias("doc_id_a"),
            F.col("pb.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    sizes_a = sh_a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    sizes_b = sh_b.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    inter = (
        cand.join(
            sh_a.select(F.col("doc_id").alias("doc_id_a"), "shingle"), "doc_id_a"
        )
        .join(
            sh_b.select(F.col("doc_id").alias("doc_id_b"), "shingle"),
            ["doc_id_b", "shingle"],
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    return (
        inter.join(
            sizes_a.select(F.col("doc_id").alias("doc_id_a"), F.col("__n").alias("__na")),
            "doc_id_a",
        )
        .join(
            sizes_b.select(F.col("doc_id").alias("doc_id_b"), F.col("__n").alias("__nb")),
            "doc_id_b",
        )
        .withColumn(
            "__j",
            F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter")),
        )
        .filter(F.col("__j") >= threshold)
        .select(
            "doc_id_a", "doc_id_b", F.round(F.col("__j"), 4).alias("jaccard")
        )
    )


def cluster_safe_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup-safe train/val/test split: the md5 split bucket is
    computed on the NEAR-DUP CLUSTER representative, so every member of
    a near-duplicate family lands in the same split.  ``group_split``
    guards against leakage through a shared provenance key (domain,
    source); this guards against the leak that key cannot see — two
    lightly-edited copies of one document from DIFFERENT sources landing
    in train and test, silently inflating eval.

    (doc_id, cluster_root, split); singleton documents are their own
    root.  Clusters come from the MinHash+LSH pair pipeline + connected
    components (:func:`minhash_lsh_pairs` → :func:`near_dup_clusters`) —
    at crawl scale the distributed large-star/small-star path, no
    driver-side edges; the split itself is a projection of the root, so
    the incremental cost over plain hash_split is exactly the dedup
    pipeline a curation run executes anyway (share the pair frame).
    """
    from datalake_indexes_spark.operators.text_analysis import group_split

    pairs = minhash_lsh_pairs(
        docs, n=n, k=k, bands=bands, threshold=threshold,
        text_col=text_col, id_col=id_col,
    )
    clusters = near_dup_clusters(pairs)
    roots = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("representative", F.col("doc_id")).alias("cluster_root"),
        )
    )
    return group_split(
        roots, group_col="cluster_root", weights=weights
    ).withColumnRenamed("group_key", "cluster_root")


def line_census(
    docs: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """(line_norm, n_docs, n_occurrences) — every whitespace-trimmed,
    non-empty LINE that appears in at least ``min_docs`` distinct
    documents: the corpus-frequency boilerplate census (CCNet's
    paragraph-hash dedup view, Raffel et al.'s "three-sentence spans
    seen more than once" diagnostic) for newline-delimited corpora.
    :func:`chunk_dedup` is the delimiter-free cousin; this is the
    natural-boundary one, and the census (which chunk_dedup never
    surfaces) is what an operator reviews before committing to a strip
    threshold.

    Scale shape (100 TB): split + trim ride the scan in codegen; the
    only shuffle is the per-line doc-frequency aggregate, which
    partial-aggregates map-side on (line, doc_id) before the exchange.
    Lines are hashed by their trimmed text; exact distinct-doc counts
    (the approx tier at extreme scale is ``approx_count_distinct``,
    same knob contract as the COCOA overlap count).
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_split_literal(F.col(text_col), sep)).alias("__line"),
    ).select("doc_id", F.trim(F.col("__line")).alias("line_norm"))
    return (
        lines.filter(F.col("line_norm") != "")
        .groupBy("line_norm")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """(doc_id, n_lines, n_kept, text_filtered) — strip every line whose
    trimmed text appears in >= ``min_docs`` distinct documents (the
    :func:`line_census` set) plus empty/whitespace-only lines, then
    reassemble each document from its surviving lines in original
    order.  EVERY input document returns a row (n_kept = 0 and
    text_filtered = '' when nothing survives) so the lineage census
    downstream can count fully-boilerplate docs.

    Scale shape: census aggregate as in :func:`line_census` (its
    df >= min_docs slice is a small fraction of distinct lines, so AQE
    plans the removal as a broadcast anti-join); reassembly is one
    groupBy(doc_id) with an in-array sort by original position — the
    same two-shuffle budget as :func:`chunk_dedup`.
    """
    boiler = line_census(
        docs, min_docs=min_docs, text_col=text_col, id_col=id_col, sep=sep
    ).select("line_norm")
    return strip_lines(docs, boiler, text_col=text_col, id_col=id_col, sep=sep)


def strip_lines(
    docs: DataFrame,
    boiler: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Strip the ``boiler`` (line_norm) set plus empty/whitespace-only
    lines from ``docs`` and reassemble in original order — the shared
    back half of batch :func:`line_dedup` and the streaming line store
    (``streaming/line_stream.py``)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_split_literal(F.col(text_col), sep)).cast("long").alias("n_lines"),
        F.posexplode(_split_literal(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("line_norm", F.trim(F.col("line")))
    kept = (
        base.filter(F.col("line_norm") != "")
        .join(boiler.select("line_norm"), "line_norm", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("text_filtered"),
        )
    )
    totals = base.groupBy("doc_id").agg(F.first("n_lines").alias("n_lines"))
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("text_filtered"), F.lit("")).alias("text_filtered"),
    )


def boilerplate_by_source(
    docs: DataFrame,
    min_docs: int = 2,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """(source, n_lines, n_boiler, boiler_ratio) — how much of each
    source's line mass is corpus-level boilerplate (the
    :func:`line_census` set): the provenance diagnostic that decides
    which crawl source needs template stripping before it is worth its
    storage.  Blank lines count toward neither side (same contract as
    the census).

    Scale shape: the census aggregate plus ONE extra pass — exploded
    lines left-join the (small) census set and aggregate by source;
    ratios are exact decimal divisions of integer counts, rounded with
    the +1e-9 nudge.
    """
    boiler = line_census(
        docs, min_docs=min_docs, text_col=text_col, id_col=id_col, sep=sep
    ).select("line_norm", F.lit(True).alias("__is_boiler"))
    lines = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(_split_literal(F.col(text_col), sep)).alias("__line"),
        )
        .select("source", F.trim(F.col("__line")).alias("line_norm"))
        .filter(F.col("line_norm") != "")
    )
    return (
        lines.join(boiler, "line_norm", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("__is_boiler"), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_boiler"),
        )
        .select(
            "source",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_boiler").cast("long").alias("n_boiler"),
            F.round(
                F.col("n_boiler") / F.col("n_lines") + F.lit(1e-9), 6
            ).alias("boiler_ratio"),
        )
    )
