"""Text analysis — language ID, quality scoring, token counting, document
fingerprinting (training-data-pipeline operators, beyond the reference
surface).

All operators are pure native-expression pipelines over the ``documents``
table: no UDFs, fully inside whole-stage codegen, one groupBy where an
aggregate is needed.  Constants (stopword list, language markers, token
regex) are shared with the DuckDB oracles so both engines derive from one
definition.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_indexes_spark.functions.hashes import md5_bucket

from datalake_indexes_spark.functions.text import STOPWORDS

# BPE-ish word/number/punct tokenizer (public GPT-2-style shape, simplified
# to what both regex engines support identically).
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# Marker-word profiles for the n-gram/keyword language heuristic.  The
# `und` (undetermined) fallback wins when no profile scores.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with", "for"],
    "de": ["der", "die", "und", "ist", "mit", "von"],
    "fr": ["le", "la", "et", "est", "avec", "pour"],
    "es": ["el", "la", "y", "es", "con", "para"],
}


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ws_tokens, n_re_tokens, n_chars_seen) — whitespace tokens,
    BPE-ish regex tokens, and observed character count."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(t, " ")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).cast("long").alias("n_re_tokens"),
        F.length(t).cast("long").alias("n_chars_seen"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, avg_word_len, stopword_ratio, distinct_ratio,
    quality_score) — cheap heuristics a pretraining filter thresholds on.

    quality_score is a fixed linear blend (higher = better), rounded for
    cross-engine comparability.
    """
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_distinct = F.size(F.array_distinct(words))
    avg_len = (F.length(t) - (n_words - 1)) / n_words  # chars sans separators
    stop_ratio = n_stop / n_words
    distinct_ratio = n_distinct / n_words
    score = (
        F.lit(0.5) * distinct_ratio
        + F.lit(0.3) * F.least(avg_len / F.lit(8.0), F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - stop_ratio)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(avg_len, 4).alias("avg_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, marker_hits) — keyword-profile language ID.

    Counts marker-word occurrences per language profile; highest count wins
    (ties broken by language code; zero hits → 'und').  One pass, no
    shuffle: the per-language counts are filter-size expressions over the
    word array.
    """
    words = F.split(F.col(text_col), " ")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(words, lambda w: F.array_contains(marr, w))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max over (hits, inverted-lang) — ties prefer lexicographically
    # smallest code; array_max picks the struct with greatest hits then
    # greatest lang string, so order langs descending for the tie.
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].cast("long").alias("marker_hits"),
    )


# Unicode script ranges — literal BMP ranges so java.util.regex (Spark) and
# RE2 (DuckDB) interpret the character class identically.  Deliberately the
# big unambiguous blocks, not exhaustive Unicode script properties (\p{IsCyrillic}
# etc. differ between engines).
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z",
    "cyrillic": "Ѐ-ӿ",
    "cjk": "一-鿿",
    "arabic": "؀-ۿ",
}
_SCRIPT_PRIORITY = ["latin", "cyrillic", "cjk", "arabic"]

# The synthetic corpus is pure ASCII, so the graded query plants these
# deterministic non-Latin suffixes by doc_id % 4 (oracle mirrors them) —
# without planting, every non-Latin ratio would verify 0 == 0 (vacuous).
SCRIPT_PLANT_SUFFIXES: dict[int, str] = {
    1: " привет мир данные модель",
    2: " 数据 清洗 模型 训练",
    3: " بيانات نموذج تدريب",
}


def script_ratios(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document Unicode-script composition — the writing-system check a
    multilingual curation pipeline runs before language ID (a 'zh'-labelled
    doc that is 95% Latin is mislabelled or transliterated; mixed-script
    text is a spam signal).

    Counts characters per script block by length-difference against a
    class-stripped copy (``length(t) - length(regexp_replace(t, '[class]',
    '')))`` — one codegen'd pass per class, no explode, no UDF.  Emits
    ratios over total characters plus digit/space/other remainders and the
    dominant script (fixed priority on ties: latin > cyrillic > cjk >
    arabic).  Zero shuffles: pure per-row projection, so it scales as a
    map-only stage over however many partitions hold the corpus.
    """
    t = F.col(text_col)
    total = F.length(t)

    def n_in(ranges: str) -> "F.Column":
        return total - F.length(F.regexp_replace(t, f"[{ranges}]", ""))

    counts = {name: n_in(r) for name, r in SCRIPT_RANGES.items()}
    counts["digit"] = n_in("0-9")
    counts["space"] = n_in(" ")
    other = total - sum(counts.values(), F.lit(0))

    dominant = F.lit(_SCRIPT_PRIORITY[-1])
    for name in reversed(_SCRIPT_PRIORITY[:-1]):
        later = [counts[n] for n in _SCRIPT_PRIORITY[_SCRIPT_PRIORITY.index(name) + 1 :]]
        dominant = F.when(counts[name] >= F.greatest(*later) if len(later) > 1 else counts[name] >= later[0], F.lit(name)).otherwise(dominant)

    ratio = lambda c: F.round(c / total, 4)  # noqa: E731 — planted text is never empty
    return docs.select(
        F.col(id_col).alias("doc_id"),
        total.cast("long").alias("n_chars_total"),
        *[ratio(counts[n]).alias(f"{n}_ratio") for n in [*_SCRIPT_PRIORITY, "digit", "space"]],
        ratio(other).alias("other_ratio"),
        dominant.alias("dominant_script"),
    )


# PII patterns — limited to syntax RE2 (DuckDB) and java.util.regex (Spark)
# evaluate identically: no lookaround, no backrefs, greedy quantifiers only.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d[\d -]{7,}\d", "<PHONE>"),
}


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, scrubbed) — PII redaction, a
    standard pretraining-corpus compliance stage.

    Counts then replaces emails → ``<EMAIL>``, IPv4 → ``<IP>``, and
    international-format phone numbers → ``<PHONE>``, in that order (so the
    IP pattern never fires inside an already-redacted email's domain).
    Pure native expressions — the regexes run inside codegen, no UDF."""
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long").alias(f"n_{key}s" if key != "ipv4" else "n_ipv4")
        for key, (pat, _) in PII_PATTERNS.items()
    ]
    scrubbed = t
    for pat, rep in PII_PATTERNS.values():
        scrubbed = F.regexp_replace(scrubbed, pat, rep)
    return docs.select(
        F.col(id_col).alias("doc_id"), *counts, scrubbed.alias("scrubbed")
    )


def repetition_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, top_word_count, top_word_frac, n_bigrams,
    top_bigram_count, top_bigram_frac) — Gopher-style repetition signals
    (fraction of the document covered by its most-repeated unigram /
    bigram), the standard filter against looping/boilerplate text.

    Distributed shape: explode n-grams → (doc, gram) counts → per-doc max
    — two aggregates with map-side partial combine, linear in corpus size.
    (A per-row array-expression formulation would be quadratic in document
    length; at 100 TB document length is unbounded, the corpus shape
    isn't.)"""
    ws = F.split(F.col(text_col), " ")
    # NOT persisted: the three consumers re-derive the split from the scan
    # — caching the corpus's exploded word arrays is exactly what does not
    # fit executor storage at 100 TB, and a leaked cache entry per call
    # would pin it
    base = docs.select(
        F.col(id_col).alias("doc_id"), ws.alias("__ws"), F.size(ws).alias("n_words")
    )

    def top_counts(grams: DataFrame, out_prefix: str) -> DataFrame:
        counts = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("cnt"))
        return counts.groupBy("doc_id").agg(
            F.sum("cnt").alias(f"__n_{out_prefix}s"),
            F.max("cnt").alias(f"top_{out_prefix}_count"),
        )

    words = base.select("doc_id", F.explode("__ws").alias("g"))
    big_arr = F.when(
        F.size("__ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__ws") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("__ws", i), F.element_at("__ws", i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigrams = base.select("doc_id", F.explode(big_arr).alias("g"))

    uni = top_counts(words, "word")
    bi = top_counts(bigrams, "bigram")
    out = (
        base.select("doc_id", "n_words")
        .join(uni, "doc_id", "left")
        .join(bi, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("long"),
            F.coalesce("top_word_count", F.lit(0)).cast("long").alias("top_word_count"),
            F.round(
                F.coalesce(F.col("top_word_count") / F.col("n_words"), F.lit(0.0)), 4
            ).alias("top_word_frac"),
            F.coalesce("__n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("top_bigram_count", F.lit(0)).cast("long").alias("top_bigram_count"),
            F.round(
                F.coalesce(F.col("top_bigram_count") / F.col("__n_bigrams"), F.lit(0.0)), 4
            ).alias("top_bigram_frac"),
        )
    )
    return out


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bag_fingerprint, n_distinct_words) — order-insensitive
    document fingerprint: md5 of the sorted distinct word list.

    Robust to word reordering (the rolling-hash analog for shingle order
    sensitivity is :func:`...dedup.simhash_signatures`); two docs with the
    same bag collide exactly.
    """
    words = F.array_sort(F.array_distinct(F.split(F.col(text_col), " ")))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(words, " ")).alias("bag_fingerprint"),
        F.size(words).cast("long").alias("n_distinct_words"),
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-mixing stage of
    a training-data pipeline (e.g. downweight a dominant language).

    Instead of Bernoulli sampling (seed-dependent, irreproducible across
    engines), membership is a pure function of the id: keep a row iff
    ``md5(id) mod 10000 < fraction * 10000``.  Same rows on every run,
    every engine, any partitioning — and the filter is a native expression
    the scan can evaluate, no shuffle at all."""
    bucket = md5_bucket(id_col, 10000)
    frac = F.coalesce(
        *[
            F.when(F.col(stratum_col) == s, F.lit(f))
            for s, f in sorted(fractions.items())
        ],
        F.lit(default_fraction),
    ) if fractions else F.lit(default_fraction)
    return docs.filter(bucket < frac * 10000)


def pack_sequences(
    docs: DataFrame,
    token_budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing — the standard pretraining batch
    construction: documents are concatenated in ``id`` order and cut into
    ``token_budget``-sized sequences; each document is assigned the pack
    its FIRST token falls into, with its offset inside that pack.

    (doc_id, n_tokens, pack_id, pack_offset).

    The prefix sum is DISTRIBUTED: documents bucket by an explicit
    value-range rule on the numeric id (a pure function of the data, same
    machinery as the index's row numbering), local prefix sums run per
    bucket, and the ≤ n_partitions bucket totals cascade through one tiny
    window — no single-partition global window over the corpus."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism, 1)
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    # the bounds action below otherwise re-runs t's ENTIRE upstream (for
    # corpus_prep_full that is the whole quality/repetition/dedup/scrub
    # pipeline — measured at sf0.1: the full ~8s-CPU curation ran twice,
    # once for bounds and once for the output).  t is two narrow columns;
    # the lazy checkpoint materializes it during the bounds job and the
    # output job reads it back.
    t = t.localCheckpoint(eager=False)
    bounds = t.agg(F.min("doc_id"), F.max("doc_id")).first()
    if bounds[0] is None:
        return t.withColumn("pack_id", F.lit(0).cast("long")).withColumn(
            "pack_offset", F.lit(0).cast("long")
        )
    mn, mx = int(bounds[0]), int(bounds[1])
    span = float(mx - mn + 1)
    bucket = F.least(
        F.lit(n_part - 1),
        F.floor((F.col("doc_id").cast("double") - mn) / span * n_part),
    ).cast("int")
    b = t.withColumn("__b", bucket)
    prior_w = Window.partitionBy("__b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = b.withColumn(
        "__prior", F.coalesce(F.sum("n_tokens").over(prior_w), F.lit(0))
    )
    offsets = (
        b.groupBy("__b")
        .agg(F.sum("n_tokens").alias("__tot"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__tot").over(
                    Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    start = F.col("__prior") + F.col("__off")
    return (
        local.join(F.broadcast(offsets.select("__b", "__off")), "__b")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(start / token_budget).cast("long").alias("pack_id"),
            (start % token_budget).cast("long").alias("pack_offset"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_overlap: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination — flag training documents that share word
    ``n``-grams with an evaluation/benchmark set (the standard pretraining
    hygiene pass: a doc overlapping an eval answer leaks the benchmark).

    (doc_id, n_shingles, n_overlap, overlap_frac, contaminated):
    per-document distinct ``n``-gram count, how many of those also occur
    anywhere in the benchmark, their ratio, and the
    ``n_overlap >= min_overlap`` flag.

    Scale shape: the benchmark's distinct shingle set is broadcast
    (benchmarks are small by definition — MMLU-sized, not corpus-sized),
    so the corpus is scanned once: explode → broadcast semi-probe →
    partial-aggregated count keyed by doc_id.  The corpus is never
    shuffled except for that uniform per-doc count; no corpus×corpus
    join exists anywhere.
    """
    from datalake_indexes_spark.operators.dedup import word_shingles

    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    bench_sh = (
        word_shingles(benchmark, n=n, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    # ONE corpus explode + ONE per-doc aggregate: the broadcast left join
    # tags benchmark hits, count(tag) counts them — computing counts and
    # overlaps from separate `sh` consumers would re-shingle the corpus.
    flagged = sh.join(
        F.broadcast(bench_sh.withColumn("__hit", F.lit(True))), "shingle", "left"
    )
    counts = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_overlap"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.when(
                    F.coalesce("n_shingles", F.lit(0)) > 0,
                    F.coalesce("n_overlap", F.lit(0))
                    / F.coalesce("n_shingles", F.lit(0)),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("overlap_frac"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    max_repeat: float = 4.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted corpus mixing WITH upsampling — rebalance
    strata toward uniform by repeating rare-stratum documents (the
    multilingual-pretraining recipe: sampling weight (c_max/c_s)^alpha,
    alpha=1 fully balances, alpha=0 keeps natural proportions).

    Every document gets repeat factor r_s = min((c_max/c_s)^alpha,
    max_repeat); the fractional part is realized per-document by the same
    pure md5(doc_id) bucket rule as :func:`stratified_sample` (no RNG —
    identical membership on every engine and partitioning).  Output is the
    exploded epoch list (doc_id, stratum, rep_id): downstream packing
    consumes it directly.

    r_s is rounded to 4 decimals BEFORE the fractional-bucket compare so
    the integer threshold is bit-identical cross-engine.  Scale shape:
    stratum counts are one tiny aggregate broadcast back; the explode is
    map-side; nothing else shuffles.
    """
    counts = docs.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    cmax = counts.select(F.max("__c").alias("__cmax"))
    weights = counts.crossJoin(F.broadcast(cmax)).select(
        "__s",
        F.round(
            F.least(
                F.pow(F.col("__cmax") / F.col("__c"), F.lit(float(alpha))),
                F.lit(float(max_repeat)),
            ),
            4,
        ).alias("__r"),
    )
    bucket = md5_bucket(id_col, 10000)
    frac_thresh = F.round((F.col("__r") - F.floor(F.col("__r"))) * 10000).cast("long")
    n_rep = (F.floor("__r") + F.when(bucket < frac_thresh, 1).otherwise(0)).cast("int")
    return (
        docs.join(F.broadcast(weights), docs[stratum_col] == F.col("__s"))
        .withColumn("__n_rep", n_rep)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            F.explode(F.sequence(F.lit(0), F.col("__n_rep") - 1)).alias("rep_id"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the RAG/embedding-prep stage:
    each document becomes ceil(max(n - overlap, 1) / stride) chunks of up
    to ``chunk_tokens`` whitespace tokens, consecutive chunks sharing
    ``overlap`` tokens (stride = chunk_tokens - overlap).

    (doc_id, chunk_id, n_chunk_tokens, chunk_text).  The final window is
    emitted only if it starts before the token count (no empty trailing
    chunks); a document shorter than one window yields exactly one chunk.

    Pure native expressions: split → sequence of window starts → explode →
    slice/array_join.  Map-side only — zero shuffles at any scale; chunk
    explosion multiplies rows by ~n/stride, which is the contract, not a
    blowup.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
    )
    chunk = F.slice(F.col("__w"), F.col("__start") + 1, chunk_tokens)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            words.alias("__w"),
            F.explode(starts).alias("__start"),
        )
        .withColumn("__w", chunk)
        .select(
            "doc_id",
            (F.col("__start") / stride).cast("int").alias("chunk_id"),
            F.size("__w").cast("long").alias("n_chunk_tokens"),
            F.array_join("__w", " ").alias("chunk_text"),
        )
    )


def vocab_topk(docs: DataFrame, k: int = 100, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary statistics: the ``k`` most frequent words with
    total occurrences and document frequency — the tokenizer-training /
    corpus-inspection view.  (word, total_count, doc_freq, rank).

    Two partial-combine aggregates ((doc, word) then word) and a
    distributed TakeOrdered top-k; ties rank lexicographically.
    """
    per_doc = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    totals = per_doc.groupBy("word").agg(
        F.sum("__c").cast("long").alias("total_count"),
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
    )
    from pyspark.sql import Window

    topk = totals.orderBy(F.desc("total_count"), F.asc("word")).limit(k)
    w = Window.orderBy(F.desc("total_count"), F.asc("word"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "word", "total_count", "doc_freq", "rank"
    )


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment — membership is the same
    pure md5(id) bucket rule as :func:`stratified_sample`, so the split is
    identical on every engine, run, and partitioning (and survives
    re-shards of the corpus, which a row-position split does not).

    (doc_id, split).  Weights must sum to 1; boundaries are cumulative
    bucket thresholds out of 10000."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    bucket = md5_bucket(id_col, 10000)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * 10000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return docs.select(F.col(id_col).alias("doc_id"), split.alias("split"))


def stratified_sample_exact(
    docs: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (or all of a smaller
    stratum), chosen deterministically — the balanced-eval-set primitive
    next to :func:`stratified_sample`'s fractional mixing: a benchmark
    wants "500 docs per language", not "roughly 10% of each".

    Selection ranks each stratum by md5(id) (a uniform, engine-exact
    shuffle of the ids) and keeps the first n — reproducible on every
    run and engine, no RNG.  (doc_id, stratum, sample_rank).

    Scale shape: ONE window partitioned by stratum.  Per-stratum work is
    the stratum's row count — the language histogram is the skew and
    it is known upfront; for a pathological mono-stratum corpus, cut
    first with the fractional sampler (scan-level filter), then rank."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws a uniform u from md5(id) and is
    ranked by ln(u)/w — the top-``k`` keys are a weight-proportional
    sample, exactly the importance-sampling primitive a curation
    pipeline uses to upweight long/high-quality documents without
    replacement.

    The uniform comes from the id hash (not an RNG), so the sample is
    reproducible across runs, engines, and partitionings — the same
    no-RNG discipline as every sampler in this package.  Rows with
    non-positive weight never qualify.  (doc_id, weight, rank).

    Scale shape: the key is a scan-level expression; the top-k is a
    distributed TakeOrderedAndProject.  One pass, no shuffle beyond the
    final k-row merge."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "double"
        )
        + 1.0
    ) / (2.0**32 + 1.0)
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    ranked = (
        docs.filter(w > 0)
        .withColumn("__key", key)
        .orderBy(F.desc("__key"), F.asc(id_col))
        .limit(k)
    )
    win = Window.orderBy(F.desc("__key"), F.asc(id_col))
    return ranked.withColumn("rank", F.row_number().over(win)).select(
        F.col(id_col).alias("doc_id"),
        w.alias("weight"),
        F.col("rank").cast("int").alias("rank"),
    )


def unigram_logprob_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-unigram log-probability per document — the perplexity-proxy
    quality signal (CCNet-style filtering scores documents under a
    language model; the self-trained unigram LM is its dependency-free
    floor): documents full of corpus-typical words score high, documents
    of rare/garbage tokens score low.  (doc_id, n_words, avg_logprob).

    avg_logprob = mean over the document's words of ln(count(word) /
    total_words), with counts from THIS corpus — no external model, no
    OOV smoothing needed (every word has count >= 1 by construction).

    Scale shape: one (word) count aggregate with map-side combine, one
    token-keyed join back (word frequencies are Zipf-skewed but the
    join carries only (word, logp) — AQE's skew split applies, and the
    per-doc mean re-keys by doc_id immediately), one doc-keyed mean."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("__w"),
    )
    counts = words.groupBy("__w").agg(F.count(F.lit(1)).alias("__c"))
    total = words.count()
    lp = counts.withColumn("__lp", F.log(F.col("__c") / F.lit(float(total))))
    return (
        words.join(lp.select("__w", "__lp"), "__w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg("__lp"), 4).alias("avg_logprob"),
        )
    )


def normalize_scores_by_group(
    scored: DataFrame,
    group_col: str,
    score_col: str = "quality_score",
    id_col: str = "doc_id",
    out_col: str = "score_pct",
) -> DataFrame:
    """Per-group percent-rank normalization of a score column — the
    calibration step before filtering a MIXED corpus on quality: raw
    heuristic scores are not comparable across sources (code vs prose vs
    forum text), so "keep the best 60% of EACH source" needs each score
    mapped to its within-source percentile first.

    Emits the input plus ``out_col`` = SQL ``percent_rank()`` over
    (PARTITION BY group ORDER BY score): (rank-1)/(n-1), ties share a
    rank, single-row groups get 0.0.  Rounded to 6 for cross-engine
    comparability.

    Scale shape: a naive per-source window would funnel each source's
    ENTIRE slice through one task.  Instead the rank comes from
    run-length counts: aggregate to (group, score, cnt) — bounded by
    DISTINCT scores, not rows (quality scores are rounded to 4dp) — take
    the exclusive running sum over that small frame, and broadcast-join
    the (group, score) → rank map back onto the corpus.  The full data
    is scanned, aggregated (map-side combined), and joined; never
    windowed.
    """
    cnt = scored.groupBy(group_col, score_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranks = cnt.withColumn(
        "__below", F.coalesce(F.sum("__cnt").over(w), F.lit(0))
    )
    totals = scored.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    rank_map = ranks.join(totals, group_col).select(
        group_col,
        score_col,
        F.when(F.col("__n") > 1, F.round(F.col("__below") / (F.col("__n") - 1), 6))
        .otherwise(F.lit(0.0))
        .alias(out_col),
    )
    return scored.join(F.broadcast(rank_map), [group_col, score_col])


def bigram_logprob_scores(
    docs: DataFrame,
    k_smooth: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-bigram log-probability per document — the next step up from
    :func:`unigram_logprob_scores` as a perplexity proxy: word-salad
    documents built from individually common words (which the unigram LM
    scores HIGH) have improbable word ORDER and score low here.

    avg_logprob2 = mean over the document's adjacent word pairs of
    ln((C(w1,w2) + k) / (C(w1) + k*V)) — add-k smoothed conditional
    bigram probability with counts from THIS corpus; V = distinct
    unigrams.  Documents with fewer than two words have no bigrams and
    are omitted (same contract as a bigram LM refusing length-1 input).
    (doc_id, n_bigrams, avg_logprob2).

    Scale shape: bigram extraction is an in-array zip (no self-join on
    position); both count aggregates carry map-side partials; the join
    back is (w1, w2)-keyed — Zipf-skewed like every token join, AQE
    split applies and the result immediately re-keys by doc_id.
    """
    words = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("g")
    ).select("doc_id", F.col("g.w1").alias("__w1"), F.col("g.w2").alias("__w2"))

    big_c = bg.groupBy("__w1", "__w2").agg(F.count(F.lit(1)).alias("__c12"))
    uni = docs.select(F.explode(words).alias("__w"))
    ctx_c = uni.groupBy(F.col("__w").alias("__w1")).agg(
        F.count(F.lit(1)).alias("__c1")
    )
    vocab = uni.select("__w").distinct().count()

    lp = big_c.join(ctx_c, "__w1").withColumn(
        "__lp",
        F.log(
            (F.col("__c12") + F.lit(k_smooth))
            / (F.col("__c1") + F.lit(k_smooth * float(vocab)))
        ),
    )
    return (
        bg.join(lp.select("__w1", "__w2", "__lp"), ["__w1", "__w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__lp"), 4).alias("avg_logprob2"),
        )
    )


def word_cooccurrence_pmi(
    docs: DataFrame,
    max_vocab: int = 1000,
    min_pair_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collocation mining: pointwise mutual information of word pairs by
    document co-occurrence — pmi = ln(P(a,b) / (P(a)·P(b))) with P() =
    document frequency / corpus size.  High-PMI pairs are multi-word
    expressions ("machine learning"-style units) a tokenizer or phrase
    miner wants; the signal a 100 TB corpus derives its phrase vocab
    from.

    Returns (w1, w2, pair_docs, pmi) with w1 < w2 and
    pair_docs >= min_pair_docs.

    Scale shape: the quadratic surface is bounded by construction — only
    the ``max_vocab`` highest-df words participate (TakeOrdered top-k,
    broadcast back as a semi-join filter), so the per-doc self-join is
    capped at min(doc_len, max_vocab)² and the pair aggregate at
    max_vocab² groups, independent of corpus size.  Everything else is
    map-side-combinable counts.
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    n_docs = docs.select(id_col).distinct().count()

    wdf = words.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    vocab = wdf.orderBy(F.desc("df"), F.asc("w")).limit(max_vocab)
    kept = words.join(F.broadcast(vocab.select("w")), "w", "leftsemi")

    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("pair_docs"))
        .filter(F.col("pair_docs") >= min_pair_docs)
    )
    d1 = vocab.select(F.col("w").alias("w1"), F.col("df").alias("__df1"))
    d2 = vocab.select(F.col("w").alias("w2"), F.col("df").alias("__df2"))
    return (
        pairs.join(F.broadcast(d1), "w1")
        .join(F.broadcast(d2), "w2")
        .select(
            "w1",
            "w2",
            "pair_docs",
            F.round(
                F.log(
                    (F.col("pair_docs") * F.lit(float(n_docs)))
                    / (F.col("__df1") * F.col("__df2"))
                ),
                4,
            ).alias("pmi"),
        )
    )


def keyword_extract(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` tf-idf keywords per document — the cheap unsupervised
    tagger (faceting, weak labels, retrieval expansion) a corpus pipeline
    runs corpus-wide, so the per-doc variant of what :mod:`search`'s
    bm25 does per-query.

    tf from one explode+aggregate, document frequency from one word-level
    aggregate broadcast back, score = tf·ln(N/df) (0 for corpus-universal
    words by construction).  The top-k window partitions by doc_id —
    distributed across documents, each partition bounded by a doc's
    distinct-word count; ties break on the word for determinism.
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.col("word") != "")
    tf = base.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    # the corpus size attaches as a 1-row broadcast (same sanctioned
    # scalar-stats cross bm25 uses — a constant-key equi-join constant-folds
    # back into the identical nested-loop anyway)
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("__score", F.col("__tf") * F.log(F.col("__n") / F.col("__df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("__score"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("word").alias("keyword"),
            F.col("rank").cast("long").alias("rank"),
            F.round("__score", 4).alias("score"),
        )
    )


def unigram_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram Shannon entropy (nats) — the information-
    density quality signal: spam and template text sit near 0, natural
    prose plateaus near ln(vocab).  (doc_id, n_words, n_distinct,
    entropy).

    H = ln(n) - (Σ c·ln c)/n over per-word counts c.  Shape: explode →
    (doc, word) count → per-doc moment aggregate — linear in corpus
    length with map-side partials on both aggregates (an all-in-row
    higher-order-function version would avoid the shuffle but pays
    O(distinct·len) per document: quadratic in doc length, the wrong
    trade for real corpora).
    """
    counts = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("__c").alias("__n"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.col("__c") * F.log("__c")).alias("__clogc"),
        )
        .select(
            "doc_id",
            F.col("__n").cast("long").alias("n_words"),
            "n_distinct",
            F.round(F.log("__n") - F.col("__clogc") / F.col("__n"), 4).alias("entropy"),
        )
    )


# Code-detection signals — the keyword list is regex-safe (lowercase
# alphanumerics only) and the symbol class is identical Java-regex/RE2.
CODE_KEYWORDS = (
    "def|return|import|function|const|class|void|elif|lambda|struct"
)
CODE_SYMBOL_CLASS = r"[{}()\[\];=<>#]"
# deterministic plant for the graded query: the synthetic corpus is pure
# prose, so the classifier would be vacuous unplanted (doc_id % 5 == 0
# gets this suffix; the oracle appends the same constant)
CODE_PLANT_SUFFIX = (
    " def load(cfg): return cfg[0] <= limit; import os # {retries: 3}"
    " const parse = (s) => s.split(); class Loader { void run() }"
)


def content_type_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    symbol_threshold: float = 0.03,
    keyword_threshold: int = 3,
) -> DataFrame:
    """Code-vs-prose classification — the corpus-separation stage a
    pretraining pipeline runs before routing documents to different
    tokenization/mixing treatments (code is upweighted or down-weighted
    deliberately, never accidentally).

    (doc_id, symbol_ratio, kw_hits, content_type): symbol_ratio counts
    structural code characters by the length-difference trick (one
    codegen'd regexp_replace, no explode), kw_hits counts word-boundary
    programming-keyword occurrences, and content_type is 'code' when
    either signal clears its threshold.  Zero shuffles — a pure map-side
    projection like :func:`script_ratios`; both regexes evaluate
    identically under Java regex and RE2, so the DuckDB twin replays
    them verbatim.
    """
    t = F.col(text_col)
    total = F.length(t)
    n_sym = total - F.length(F.regexp_replace(t, CODE_SYMBOL_CLASS, ""))
    kw = F.regexp_count(t, F.lit(rf"\b({CODE_KEYWORDS})\b"))
    symbol_ratio = F.round(n_sym / total + F.lit(1e-9), 4)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        symbol_ratio.alias("symbol_ratio"),
        kw.cast("long").alias("kw_hits"),
        F.when(
            (symbol_ratio >= symbol_threshold) | (kw >= keyword_threshold),
            F.lit("code"),
        )
        .otherwise(F.lit("prose"))
        .alias("content_type"),
    )


def budget_select(
    scored: DataFrame,
    budget: int,
    score_col: str = "quality_score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy token-budget selection: take documents in descending score
    order until the cumulative token count reaches ``budget`` — the
    "fill the budget with the best data" pass that turns a scored corpus
    into a training set of a target size.

    (id, score, tokens, cum_tokens) for the selected prefix (inclusive:
    a document is kept iff the running total THROUGH it fits).  The
    global running sum is the distributed two-level prefix sum, not a
    single-partition window: scores live in [0, 1], so a fixed
    ``n_buckets`` grid buckets monotonically in score, each bucket takes
    a local ordered window, and the n_buckets-row offset table is
    broadcast — the corpus never funnels through one task.

    Ties order (score desc, id asc) — fully deterministic.
    """
    s = F.col(score_col).cast("double")
    bucket = F.least(
        F.lit(n_buckets - 1), F.floor((F.lit(1.0) - s) * n_buckets)
    ).cast("int")
    b = scored.withColumn("__b", bucket)
    w_local = (
        Window.partitionBy("__b")
        .orderBy(F.desc(score_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("__run", F.sum(F.col(token_col)).over(w_local))
    offsets = (
        b.groupBy("__b")
        .agg(F.sum(F.col(token_col)).alias("__tot"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__tot").over(
                    Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    return (
        local.join(F.broadcast(offsets.select("__b", "__off")), "__b")
        .withColumn("cum_tokens", (F.col("__off") + F.col("__run")).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, score_col, token_col, "cum_tokens")
    )


def compression_ratio_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, compression_ratio) — zlib
    compressibility, the classic low-information-content signal (highly
    compressible text = boilerplate/repetition; incompressible = noise;
    natural prose sits in a band).  Quality filters cut both tails.

    zlib is not expressible as a relational expression, so this is the
    sanctioned Arrow-batched Python edge (same contract as XASH/BPE);
    ratio rounded for stability.  Scale: pure map-side, ~100 MB/s/core —
    rides the same scan as every other text score."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def zsize(texts: pd.Series) -> pd.Series:
        import zlib

        # null text passes through as null, like every native-expression
        # score (the repo's UDF null-guard convention — xash/hashes do
        # the same); fillna would misreport null as perfectly small
        return texts.map(
            lambda t: None
            if t is None
            else len(zlib.compress(t.encode("utf-8"), level))
        )

    nb = F.length(F.encode(F.col(text_col), "utf-8")).cast("long")
    nc = zsize(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        nb.alias("n_bytes"),
        nc.alias("n_compressed"),
        # empty text has no meaningful ratio (and 0/0 raises under
        # ANSI); null text propagates null through every column
        F.when(nb > 0, F.round(nc / nb, 6)).alias("compression_ratio"),
    )


def corpus_data_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(metric, value) — the one-call corpus data card a delivery ships
    with: volume (docs/chars/tokens), provenance breadth (sources,
    languages), exact-duplicate rate, and mean quality.

    Each metric is a map-side-combined scalar aggregate; the card unions
    three 1-row frames (base census, quality census, token census) —
    report-shaped work, not a hot path, and each leg is one scan with no
    joins.  Values are DOUBLE with the engine's rounding-tie convention
    (+1e-9 before round) where averages cross engines."""
    base = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("n_chars").cast("double").alias("n_chars_total"),
        F.count_distinct("source").cast("double").alias("n_sources"),
        F.count_distinct("lang").cast("double").alias("n_langs"),
        F.round(
            F.lit(1.0)
            - F.count_distinct(F.md5(F.col(text_col))) / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
    )
    qual = quality_scores(docs, text_col, id_col).agg(
        F.round(F.avg("quality_score") + F.lit(1e-9), 6).alias("avg_quality")
    )
    toks = token_counts(docs, text_col, id_col).agg(
        F.round(F.avg("n_ws_tokens") + F.lit(1e-9), 6).alias("avg_ws_tokens")
    )

    def unpivot(frame: DataFrame, names: list[str]) -> DataFrame:
        pairs = ", ".join(f"'{n}', {n}" for n in names)
        return frame.selectExpr(
            f"stack({len(names)}, {pairs}) AS (metric, value)"
        )

    return (
        unpivot(base, ["n_docs", "n_chars_total", "n_sources", "n_langs", "exact_dup_rate"])
        .unionAll(unpivot(qual, ["avg_quality"]))
        .unionAll(unpivot(toks, ["avg_ws_tokens"]))
    )


def paragraph_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_words: int = 3,
    min_distinct_ratio: float = 0.5,
) -> DataFrame:
    """(doc_id, n_paragraphs, n_kept, text_filtered) — paragraph-level
    curation (the CCNet/C4 shape: score each paragraph independently,
    drop the bad ones, reassemble the document in order).  Doc-level
    filters can't do this: one boilerplate block shouldn't sink an
    otherwise good document.

    Kept = paragraph has >= ``min_words`` words AND a distinct-word ratio
    >= ``min_distinct_ratio`` (kills token-repetition boilerplate).  Pure
    array expressions — the explode/reassemble happens INSIDE one row via
    filter/transform over the split array, so there is no shuffle and no
    per-paragraph row explosion at scale."""
    paras = F.split(F.col(text_col), sep)

    def keeps(p: F.Column) -> F.Column:
        words = F.filter(F.split(p, " "), lambda w: w != "")
        nw = F.size(words)
        nd = F.size(F.array_distinct(words))
        return (nw >= min_words) & (nd >= F.lit(min_distinct_ratio) * nw)

    kept = F.filter(paras, keeps)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(paras).cast("long").alias("n_paragraphs"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, sep).alias("text_filtered"),
    )


# C4-style heuristic rule set (Raffel et al. 2020, arXiv:1910.10683 §2.2)
# restricted to rules expressible identically in both regex dialects.
C4_BAD_PHRASES = ("lorem ipsum", "javascript", "terms of use", "cookie policy")


def c4_rule_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_sentences: int = 3,
    min_sentence_words: int = 5,
) -> DataFrame:
    """(doc_id, n_sentences, terminal_ratio, has_bad_phrase, has_brace,
    c4_keep) — the C4 cleaning rules as one codegen projection:
    sentences are terminal-punctuation-delimited spans; a document keeps
    iff it has >= ``min_sentences`` sentences, most sentences end in
    terminal punctuation, no blocklisted boilerplate phrase, and no curly
    brace (code leakage).  Map-only; rides the corpus scan."""
    t = F.col(text_col)
    lower = F.lower(t)
    # sentence spans = non-empty chunks between terminal punctuation
    sentences = F.filter(
        F.split(t, r"[.!?]"), lambda s: F.size(F.filter(F.split(s, " "), lambda w: w != "")) >= min_sentence_words
    )
    n_sent = F.size(sentences)
    n_terminal = F.size(F.regexp_extract_all(t, F.lit(r"[.!?]"), 0))
    # ratio of terminal marks to sentence spans (>=1 when every span closes)
    terminal_ratio = F.round(
        n_terminal / F.greatest(n_sent, F.lit(1)), 4
    )
    bad = F.lit(False)
    for ph in C4_BAD_PHRASES:
        bad = bad | lower.contains(ph)
    brace = t.contains("{") | t.contains("}")
    keep = (
        (n_sent >= min_sentences)
        & (terminal_ratio >= 1.0)
        & ~bad
        & ~brace
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_sent.cast("long").alias("n_sentences"),
        terminal_ratio.alias("terminal_ratio"),
        bad.alias("has_bad_phrase"),
        brace.alias("has_brace"),
        keep.alias("c4_keep"),
    )


def group_split(
    docs: DataFrame,
    group_col: str = "source",
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-safe train/val/test split: the md5 bucket is computed on
    the GROUP key (domain, author, source...), so every document of a
    group lands in the same split — the guard against train/test
    contamination through near-identical documents from one site, which
    a per-document split (:func:`hash_split`) cannot give.

    (doc_id, group value, split).  Same pure-md5 determinism contract as
    hash_split; achieved ratios track the weights only as well as group
    sizes allow (one mega-group drags its whole mass into one split —
    that is the point).  Map-only: the bucket is a projection of the
    group column, no shuffle, no group materialization.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    bucket = md5_bucket(group_col, 10000)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * 10000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("group_key"),
        split.alias("split"),
    )


def heavy_hitters(
    docs: DataFrame,
    m: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT corpus heavy hitters via a two-pass Misra-Gries sketch:
    every word whose total count strictly exceeds N/``m`` (N = total
    word occurrences), with its exact count and corpus share —
    (word, total_count, share).

    Pass 1 runs Misra-Gries with ``m`` counters per partition
    (``mapInPandas`` keeping dict state across the partition's Arrow
    batches): an item with partition frequency > n_p/m always survives
    the counter set (its decrements are bounded by n_p/m), and an item
    with GLOBAL frequency > N/m must exceed n_p/m in at least one
    partition (pigeonhole over N = sum n_p), so the union of
    per-partition survivors is a guaranteed SUPERSET of the true heavy
    hitters — at most m * n_partitions candidates of driver-free state,
    vs the full-vocabulary shuffle a naive groupBy pays.  Pass 2
    broadcast-semi-joins the candidate set back onto the corpus and
    counts exactly, so the output is deterministic and
    sketch-independent (false candidates are filtered, none were
    missed); N arrives via a scalar-aggregate cross join, no driver
    action.

    The MG loop is the one deliberately Python-side stage (per-element
    dict work is the sketch); everything around it is native.  For the
    same profile without the sketch (exact top-k instead of
    threshold-exceeders) see :func:`vocab_topk`.
    """
    words = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))

    def _mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for w in pdf["word"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < m:
                    counters[w] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"word": list(counters) or pd.Series([], dtype=str)})

    candidates = (
        words.mapInPandas(_mg, "word string").distinct()
    )
    total = words.agg(F.count(F.lit(1)).alias("__N"))
    return (
        words.join(F.broadcast(candidates), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("total_count"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("total_count") * m > F.col("__N"))
        .select(
            "word",
            "total_count",
            F.round(F.col("total_count") / F.col("__N"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Unicode text normalization — shared rule tables (the DuckDB oracle builds
# its SQL from these same constants, so engine and oracle can never drift).
# Patterns restrict to syntax RE2 and Java regex evaluate identically
# (\x{hhhh} escapes, explicit character classes, no \s/\p shorthands).
# ---------------------------------------------------------------------------

# literal single-char folds, applied in order (smart quotes, dashes, ellipsis)
NORMALIZE_CHAR_MAP: tuple[tuple[str, str], ...] = (
    ("‘", "'"),
    ("’", "'"),
    ("“", '"'),
    ("”", '"'),
    ("–", "-"),
    ("—", "-"),
    ("…", "..."),
)

# regex rules, applied in order AFTER the char map
NORMALIZE_REGEX_RULES: tuple[tuple[str, str], ...] = (
    # zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) vanish
    ("[\\x{200B}-\\x{200D}\\x{FEFF}]", ""),
    # C0 control chars (except \t \n) and DEL vanish; \r included, so
    # CRLF text normalizes to LF BEFORE the whitespace-collapse rules
    ("[\\x{00}-\\x{08}\\x{0B}-\\x{0D}\\x{0E}-\\x{1F}\\x{7F}]", ""),
    # unicode space separators fold to ASCII space
    ("[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]", " "),
    # space/tab runs collapse
    ("[ \\t]+", " "),
    # trailing spaces before a newline drop
    (" \\n", "\n"),
    # 3+ blank-line runs collapse to one paragraph break
    ("\\n{3,}", "\n\n"),
)


def normalize_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, normalized, n_chars_before, n_chars_after) — deterministic
    unicode cleanup, the first stage of every pretraining-corpus pipeline:
    smart quotes/dashes/ellipsis fold to ASCII, zero-width and C0 control
    characters vanish, unicode space separators become plain spaces,
    space runs and blank-line runs collapse, edges trim.

    Rule tables (:data:`NORMALIZE_CHAR_MAP`, :data:`NORMALIZE_REGEX_RULES`)
    are shared with the DuckDB oracle twin, and every pattern sticks to
    syntax RE2 and Java regex agree on — no ``\\s``/``\\p`` shorthands
    (ASCII-only in one engine, unicode-aware in the other).

    Pure native expression chain (replace + regexp_replace) — runs inside
    whole-stage codegen, map-only, no UDF, no shuffle.
    """
    t = F.col(text_col)
    out = t
    for src, dst in NORMALIZE_CHAR_MAP:
        out = F.replace(out, F.lit(src), F.lit(dst))
    for pat, rep in NORMALIZE_REGEX_RULES:
        out = F.regexp_replace(out, pat, rep)
    out = F.trim(out)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        out.alias("normalized"),
        F.length(t).cast("long").alias("n_chars_before"),
        F.length(out).cast("long").alias("n_chars_after"),
    )


# deterministic noise the normalize_text driver query wraps around every
# 4th document (the synthetic corpus is clean ASCII, so grading the raw
# table would verify zero changes -- the J5/J6 vacuity trap); mirrored by
# the oracle via chr() codes.  Exercises: curly quotes, NBSP, em-dash,
# tab+space runs, ellipsis, zero-width space, a C0 control char, trailing
# space-before-newline and a 4-newline run.
PLANT_NOISE_PREFIX = "\u201CQ\u201D\u00A0\u2014\t "
PLANT_NOISE_SUFFIX = " \u2026\u200B\u0001  end \n\n\n\nfin"


def zipf_fit(
    docs: DataFrame,
    top_n: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row Zipf's-law fit over the corpus vocabulary: (n_tokens,
    vocab_size, top_n, slope, intercept, r2) — OLS of ln(freq) on
    ln(rank) over the ``top_n`` most frequent words.  Natural language
    sits near slope −1; a corpus drifting toward templated/generated
    boilerplate flattens the head (slope → 0 over the top ranks), and a
    dedup bug shows up as a violently steepened head — a cheap
    whole-corpus health gauge next to per-doc quality scores.

    Ranking is deterministic: count DESC, word ASC on ties, taken with
    ``orderBy().limit(top_n)`` (TakeOrderedAndProject — distributed
    partial top-k, no global window over the vocabulary), then ranked
    by a window over the top_n-bounded frame (the sanctioned k-bounded
    tier).  Whitespace tokenization matches :func:`vocab_topk`.

    Scale shape: one word-count aggregate (vocabulary-keyed shuffle),
    a distributed top-k, then arithmetic over ≤ top_n rows.
    """
    from pyspark.sql import Window

    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("__w")
    ).filter(F.col("__w") != "")
    counts = words.groupBy("__w").agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
    )
    top = counts.orderBy(F.desc("__c"), F.asc("__w")).limit(top_n)
    ranked = top.select(
        F.ln(
            F.row_number()
            .over(Window.orderBy(F.desc("__c"), F.asc("__w")))
            .cast("double")
        ).alias("__lr"),
        F.ln(F.col("__c").cast("double")).alias("__lf"),
    )
    fit = ranked.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__lr").alias("__sx"),
        F.sum("__lf").alias("__sy"),
        F.sum(F.col("__lr") * F.col("__lr")).alias("__sxx"),
        F.sum(F.col("__lf") * F.col("__lf")).alias("__syy"),
        F.sum(F.col("__lr") * F.col("__lf")).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    sx, sy = F.col("__sx"), F.col("__sy")
    sxx, syy, sxy = F.col("__sxx"), F.col("__syy"), F.col("__sxy")
    denom = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    r_num = n * sxy - sx * sy
    r_den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    r2 = (r_num / F.nullif(r_den, F.lit(0.0))) * (
        r_num / F.nullif(r_den, F.lit(0.0))
    )
    return (
        fit.crossJoin(F.broadcast(totals))
        .select(
            "n_tokens",
            "vocab_size",
            F.col("__n").alias("top_n"),
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
    )


def readability_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document readability: (doc_id, n_words, n_sentences,
    n_syllables, flesch, fk_grade) — Flesch reading ease and
    Flesch-Kincaid grade from the classic closed forms, with the standard
    vowel-group syllable heuristic (a run of [aeiouy] ≈ one syllable; a
    word with no vowels counts one).  The quality-filter feature next to
    :func:`quality_scores`' length/punct ratios: corpus curation gates on
    "too hard / too degenerate" text bands.

    Pure native expressions (split / regexp_count / higher-order array
    filters) — one scan, no UDF, no shuffle.  Sentences split on [.!?]+
    runs (unterminated text counts as one sentence); empty-word docs
    carry NULL scores rather than dividing by zero.
    """
    txt = F.col(text_col)
    low = F.lower(txt)
    words = F.filter(F.split(low, " "), lambda w: w != F.lit(""))
    n_words = F.size(words).cast("long")
    sents = F.filter(F.split(txt, r"[.!?]+"), lambda s: F.trim(s) != F.lit(""))
    n_sent = F.greatest(F.size(sents).cast("long"), F.lit(1))
    vowel_runs = F.regexp_count(low, F.lit(r"[aeiouy]+")).cast("long")
    no_vowel = F.size(
        F.filter(words, lambda w: ~w.rlike("[aeiouy]"))
    ).cast("long")
    n_syll = vowel_runs + no_vowel
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = n_syll.cast("double") / F.nullif(n_words.cast("double"), F.lit(0.0))
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4
        ).alias("flesch"),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4
        ).alias("fk_grade"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot delta — (doc_id, status, old_hash, new_hash) with
    status in {added, removed, changed, unchanged}.  The continuous-
    pretraining primitive: between crawl v(N) and v(N+1) a pipeline wants
    exactly the delta (new docs to curate, removed docs to tombstone,
    changed docs to re-score) instead of re-running curation over the
    full corpus.

    Content identity is md5(text) — computed in a scan-level projection
    on EACH side before the join, so only (id, 32-char hash) ever
    shuffles: at 100 TB the full-outer join moves ~48 bytes/doc, not the
    documents.  One sort-merge full-outer exchange on doc_id; everything
    else is codegen.  NULL text hashes to NULL and compares as changed
    against a non-NULL counterpart (null-safe equality).
    """
    o = old.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("old_hash"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("new_hash"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, "doc_id", "full_outer")
    # presence flags, NOT hash nullness, drive added/removed — a NULL-text
    # document present on both sides is "unchanged", not "added"
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(F.col("old_hash").eqNullSafe(F.col("new_hash")), "unchanged")
        .otherwise("changed")
    )
    return joined.select("doc_id", status.alias("status"), "old_hash", "new_hash")


def snapshot_diff_census(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per diff status: (status, n_docs) — the dashboard rollup
    over :func:`snapshot_diff` (same plan plus a 4-group aggregate)."""
    return (
        snapshot_diff(old, new, id_col=id_col, text_col=text_col)
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 Table A1),
# restricted to the rules expressible identically in both regex dialects.
# Distinct from c4_rule_flags (sentence/boilerplate shape) and
# repetition_signals (top-gram coverage): these are the word-morphology /
# line-shape heuristics.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

# Planted fixture variants shared with the DuckDB twin (plans/oracle.py)
# so both engines derive the test corpus from one constant.
GOPHER_PLANT_BULLETS: tuple[str, ...] = tuple(f"- li{i}" for i in range(10))
GOPHER_PLANT_ELLIPSIS: tuple[str, ...] = (
    "wait for it...", "more soon...", "to be continued...",
)
GOPHER_PLANT_SYMBOLS = "# ## ### # ## ### # #"
GOPHER_PLANT_NUMERIC = "111 222 333 444 555 666 777 888 999 000 121 232 343 454"


def gopher_rule_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_ratio,
    ellipsis_line_ratio, alpha_word_ratio, n_stopwords, gopher_keep) —
    the Gopher pretraining quality rules (Rae et al. 2021,
    arXiv:2112.11446 Table A1) as one codegen projection.

    A document keeps iff: word count within [min_words, max_words]; mean
    word length within [min_mean_word_len, max_mean_word_len]; hash-mark
    + ellipsis symbols per word <= max_symbol_ratio; at most
    max_bullet_ratio of non-empty lines start with a bullet and at most
    max_ellipsis_ratio end with an ellipsis; at least min_alpha_ratio of
    words contain an alphabetic character; and at least min_stopwords of
    the canonical eight stop words appear.  Ratios are rounded to 4 (and
    the ROUNDED value is what each threshold compares, so both engines
    decide every boundary identically).

    Scale shape: map-only — every signal is an array/string expression
    over the document row, so the whole operator rides the corpus scan
    inside whole-stage codegen; no shuffle, no UDF.
    """
    t = F.col(text_col)
    words = F.filter(F.split(t, " "), lambda w: w != "")
    n_words = F.size(words)
    nw1 = F.greatest(n_words, F.lit(1))
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_len = F.round(sum_len / nw1, 4)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.round((n_hash + n_ellipsis) / nw1, 4)
    lines = F.filter(F.split(t, "\n"), lambda ln: ln != "")
    nl1 = F.greatest(F.size(lines), F.lit(1))
    bullet_ratio = F.round(
        F.size(
            F.filter(
                lines,
                lambda ln: ln.startswith("-")
                | ln.startswith("*")
                | ln.startswith("•"),
            )
        )
        / nl1,
        4,
    )
    ellipsis_ratio = F.round(
        F.size(F.filter(lines, lambda ln: ln.endswith("..."))) / nl1, 4
    )
    alpha_ratio = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))) / nw1, 4
    )
    n_stop = sum(
        (F.array_contains(words, s).cast("long") for s in GOPHER_STOPWORDS),
        start=F.lit(0).cast("long"),
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_ratio <= max_bullet_ratio)
        & (ellipsis_ratio <= max_ellipsis_ratio)
        & (alpha_ratio >= min_alpha_ratio)
        & (n_stop >= min_stopwords)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_line_ratio"),
        ellipsis_ratio.alias("ellipsis_line_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_stop.alias("n_stopwords"),
        keep.alias("gopher_keep"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    target=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 0.5,
) -> DataFrame:
    """(doc_id, is_target, n_grams, avg_logratio) — DSIR-style hashed
    n-gram importance weights (Xie et al. 2023, arXiv:2302.03169): score
    every raw document by how target-like its hashed n-gram profile is,
    the selection signal importance resampling then samples by.

    Features are word unigrams plus adjacent bigrams, hashed into
    ``n_buckets`` md5 buckets (the hashing trick makes the feature space
    a fixed-size dense vector at any corpus scale).  The target
    distribution is estimated from the rows matching ``target`` (default:
    ``lang = 'en'``), the raw distribution from the whole input; both are
    Laplace-smoothed with ``alpha``.  A document's weight is the MEAN
    over its gram occurrences of ln p_target(bucket) - ln p_raw(bucket)
    (the per-token log importance weight; multiply by n_grams for the
    document total).  Documents with no grams are omitted.

    Scale shape: gram extraction is an in-array zip (no positional
    self-join); the bucket distribution is ONE ``n_buckets``-key
    aggregate with map-side combine (256 reduce keys regardless of
    corpus size); the log-ratio table is model-constant-sized and
    broadcast back onto the gram stream, which immediately re-keys by
    doc_id for the final mean.  Two passes over the gram stream, zero
    UDFs, no unbounded collects.
    """
    from datalake_indexes_spark.functions.hashes import md5_bucket

    if target is None:
        target = F.col("lang") == "en"
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    bigrams = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        target.alias("is_target"),
        F.explode(F.concat(words, bigrams)).alias("__g"),
    ).select(
        "doc_id", "is_target", md5_bucket(F.col("__g"), n_buckets).alias("__b")
    )
    dist = g.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__raw_c"),
        F.count_if(F.col("is_target")).alias("__tgt_c"),
    )
    tot = dist.agg(
        F.sum("__raw_c").alias("__raw_t"), F.sum("__tgt_c").alias("__tgt_t")
    )
    lr = dist.crossJoin(F.broadcast(tot)).select(
        "__b",
        (
            F.log(
                (F.col("__tgt_c") + F.lit(alpha))
                / (F.col("__tgt_t") + F.lit(alpha * n_buckets))
            )
            - F.log(
                (F.col("__raw_c") + F.lit(alpha))
                / (F.col("__raw_t") + F.lit(alpha * n_buckets))
            )
        ).alias("__lr"),
    )
    return (
        g.join(F.broadcast(lr), "__b")
        .groupBy("doc_id", "is_target")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            # + 0.0 normalizes IEEE -0.0 (a tiny negative mean rounding
            # to zero must hash like zero on both engines)
            (F.round(F.avg("__lr"), 4) + F.lit(0.0)).alias("avg_logratio"),
        )
    )


def harmonic_pack(
    docs: DataFrame,
    token_budget: int = 2048,
    salt_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, size_class, oversize, bin_in_class, bin_slot) —
    harmonic bin packing of documents into ``token_budget``-token
    training sequences (Lee & Lee 1985's Harmonic algorithm, the
    classical bounded-waste online packing): each document lands in size
    class k = floor(budget / n_tokens), and every bin of class k holds
    exactly k documents — so no document is ever SPLIT across sequences
    (the failure mode of concat-then-chunk :func:`pack_sequences`, where
    truncated fragments hurt the LM: Ding et al. 2024, arXiv:2404.10830),
    and per-bin waste is bounded by the class geometry.

    Documents longer than the budget get class 1 with ``oversize`` set
    (a bin of their own; the chunker downstream decides split/truncate).
    A bin is identified by (size_class, bin_in_class); ``bin_slot`` is
    the document's position inside its bin.

    Scale shape: NO global window — documents rank within (size_class,
    md5-salt) local windows; the per-(class, salt) count table (at most
    |classes| x ``salt_buckets`` rows) cumulates through one tiny window
    and broadcasts back, the same two-level prefix-sum discipline as
    :func:`pack_sequences` and functions/ranking.py.  The within-class
    order is (salt, doc_id) — deterministic and engine-replicable."""
    from pyspark.sql import Window

    from datalake_indexes_spark.functions.hashes import md5_bucket

    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).cast("long").alias("n_tokens"),
    )
    cap = F.greatest(
        F.floor(
            F.lit(float(token_budget)) / F.greatest(F.col("n_tokens"), F.lit(1))
        ).cast("long"),
        F.lit(1).cast("long"),
    )
    s = t.withColumn("size_class", cap).withColumn(
        "oversize", F.col("n_tokens") > token_budget
    ).withColumn("__salt", md5_bucket(F.col("doc_id"), salt_buckets))

    w_local = Window.partitionBy("size_class", "__salt").orderBy("doc_id")
    local = s.withColumn("__lrn", F.row_number().over(w_local))
    off = (
        s.groupBy("size_class", "__salt")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.partitionBy("size_class")
                    .orderBy("__salt")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    rank = F.col("__off") + F.col("__lrn")
    return (
        local.join(
            F.broadcast(off.select("size_class", "__salt", "__off")),
            ["size_class", "__salt"],
        )
        .select(
            "doc_id",
            "n_tokens",
            "size_class",
            "oversize",
            F.floor((rank - 1) / F.col("size_class"))
            .cast("long")
            .alias("bin_in_class"),
            ((rank - 1) % F.col("size_class")).cast("long").alias("bin_slot"),
        )
    )


def harmonic_pack_fill(
    docs: DataFrame,
    token_budget: int = 2048,
    salt_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(size_class, n_docs, n_oversize, n_bins, total_tokens,
    padding_tokens, fill_frac) — the per-class waste census over
    :func:`harmonic_pack`: how many sequences each size class produces
    and how much of the token budget they pad away — the number a
    pipeline owner compares against concat-then-chunk's zero padding
    (bought at the price of split documents).  ``padding_tokens`` clamps
    at 0 for the oversize-carrying class, whose bins overflow by
    design."""
    packed = harmonic_pack(
        docs,
        token_budget=token_budget,
        salt_buckets=salt_buckets,
        text_col=text_col,
        id_col=id_col,
    )
    agg = packed.groupBy("size_class").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("oversize")).alias("n_oversize"),
        (F.max("bin_in_class") + 1).cast("long").alias("n_bins"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    budget = F.lit(int(token_budget))
    return agg.select(
        "size_class",
        "n_docs",
        "n_oversize",
        "n_bins",
        "total_tokens",
        F.greatest(
            F.col("n_bins") * budget - F.col("total_tokens"),
            F.lit(0).cast("long"),
        ).cast("long").alias("padding_tokens"),
        F.round(
            F.col("total_tokens") / (F.col("n_bins") * budget), 4
        ).alias("fill_frac"),
    )


def dsir_select(
    docs: DataFrame,
    fraction: float = 0.25,
    target=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 0.5,
) -> DataFrame:
    """(doc_id, avg_logratio, sel_rank) — the selection step over
    :func:`dsir_importance_weights`: keep the top ``fraction`` of scored
    documents by importance weight (greedy top-k selection, the
    rank-based variant of DSIR's importance resampling — deterministic,
    no RNG, same no-sampling-noise discipline as every selector in this
    package).  Ties on the rounded weight break by doc_id ascending, so
    the selected set is reproducible on any engine and partitioning.

    Scale shape: the rank comes from :func:`..functions.ranking.global_rank`
    (two-level bucket prefix sum — NO single-partition window over the
    corpus); the selection threshold ceil(fraction * n) is one broadcast
    scalar.  Everything upstream is the weights operator's own shape.
    """
    from datalake_indexes_spark.functions.ranking import global_rank

    scored = dsir_importance_weights(
        docs,
        target=target,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        alpha=alpha,
    )
    ranked = global_rank(
        scored, "avg_logratio", "doc_id", ascending=False, out_col="sel_rank"
    )
    n = scored.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .filter(F.col("sel_rank") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .select("doc_id", "avg_logratio", F.col("sel_rank").cast("long"))
    )


def kn_logprob_scores(
    docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram log-probability per document —
    (doc_id, n_bigrams, avg_logprob_kn) — the standard upgrade over the
    add-k bigram LM (:func:`bigram_logprob_scores`): absolute
    discounting plus a CONTINUATION-count backoff, so words that appear
    in many distinct contexts ("francisco" vs "the") back off
    correctly and boilerplate-heavy word salads score lower.

    P_KN(w2|w1) = (max(c12 − D, 0) + D·N1+(w1·)·Pcont(w2)) / c1(w1)
    with Pcont(w2) = N1+(·w2) / |bigram types| and c1 the context's
    bigram total.  Scoring the training corpus itself means every
    scored bigram is seen (c12 >= 1), so no unseen-event path is
    needed — the interpolation term is exercised through the discount
    mass, not through zeros.  Both engines evaluate the formula in the
    same literal operand order; documents with fewer than two words are
    omitted (the bigram-LM contract).

    NOTE (eager step): the bigram-type count |{(w1,w2)}| is a model
    constant that appears as a literal in the plan, so constructing
    this DataFrame runs ONE Spark job up front (the bigram aggregate is
    localCheckpointed so the scoring plan reuses it instead of
    recomputing, and storage is reclaimed once the result is
    unreferenced).  A corpus with zero bigrams (every doc < 2 words)
    returns the empty result frame directly — no division by zero.

    Scale shape: identical to the add-k bigram — in-array zip for gram
    extraction, map-side-combinable count aggregates (two extra
    DISTINCT-counting aggregates for the continuation counts), one
    Zipf-skewed (w1, w2) join back that immediately re-keys by doc_id.
    """
    words = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("g")
    ).select("doc_id", F.col("g.w1").alias("__w1"), F.col("g.w2").alias("__w2"))

    # localCheckpoint, not cache(): reused by ctx/cont/join AND the
    # eager n_types count below, and — unlike a cache-manager entry —
    # cleaned up by the ContextCleaner once the result is unreferenced,
    # so repeated invocations don't pin storage for the app lifetime
    bc = bg.groupBy("__w1", "__w2").agg(
        F.count(F.lit(1)).alias("__c12")
    ).localCheckpoint()
    ctx = bc.groupBy("__w1").agg(
        F.sum("__c12").alias("__c1"),
        F.count(F.lit(1)).alias("__n1f"),  # N1+(w1 ·): distinct continuations
    )
    cont = bc.groupBy("__w2").agg(
        F.count(F.lit(1)).alias("__n1r")  # N1+(· w2): distinct contexts
    )
    n_types = bc.count()  # |{(w1,w2)}| — model-constant scalar (eager; see note)
    if n_types == 0:
        # zero-bigram corpus: the backoff denominator would be 0/0;
        # the contract already omits <2-word docs, so the result is empty.
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("long").alias("n_bigrams"),
            F.lit(0.0).alias("avg_logprob_kn"),
        ).limit(0)

    d = float(discount)
    lp = (
        bc.join(ctx, "__w1")
        .join(cont, "__w2")
        .withColumn(
            "__lp",
            F.log(
                (
                    F.greatest(F.col("__c12") - F.lit(d), F.lit(0.0))
                    + F.lit(d) * F.col("__n1f") * F.col("__n1r") / F.lit(float(n_types))
                )
                / F.col("__c1")
            ),
        )
    )
    return (
        bg.join(lp.select("__w1", "__w2", "__lp"), ["__w1", "__w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__lp"), 4).alias("avg_logprob_kn"),
        )
    )


def vocab_growth_curve(
    docs: DataFrame,
    interval: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary-growth curve in ingestion (doc_id) order — one row per
    id block of ``interval`` docs: (bucket, docs_cum, tokens_cum,
    vocab_cum).  The saturation diagnostic a curation pipeline reads
    before buying more of the same source: if vocab_cum has flattened
    while tokens_cum climbs, additional data is repeating the
    vocabulary it already has.

    Every number is an exact integer (strict cross-engine hashes need
    no rounding): a word's arrival point is its minimum doc_id (one
    map-side-combinable aggregate), per-block news/tokens/docs are
    plain counts, and the cumulation runs over the BLOCK table only —
    ``interval`` is the caller's sampling knob and should be sized so
    the curve has O(100) points (the window is over sample points,
    never over documents; same sanctioned-tiny-window discipline as the
    bucket-offset tables in functions/ranking.py).
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("__w"),
    )
    fd = words.groupBy("__w").agg(F.min("doc_id").alias("__fd"))
    new_per_bucket = fd.groupBy(
        F.floor(F.col("__fd") / interval).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("__new"))
    per_bucket = (
        docs.select(
            F.floor(F.col(id_col) / interval).cast("long").alias("bucket"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("__nt"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__docs"), F.sum("__nt").alias("__toks"))
    )
    joined = per_bucket.join(new_per_bucket, "bucket", "left").select(
        "bucket",
        "__docs",
        "__toks",
        F.coalesce(F.col("__new"), F.lit(0)).alias("__new"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "bucket",
        F.sum("__docs").over(w).cast("long").alias("docs_cum"),
        F.sum("__toks").over(w).cast("long").alias("tokens_cum"),
        F.sum("__new").over(w).cast("long").alias("vocab_cum"),
    )


def vocab_heaps_fit(
    docs: DataFrame,
    interval: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law fit V = K·N^beta over the :func:`vocab_growth_curve`
    sample points — one row (n_points, beta, log_k, r2), the closed-form
    log-log OLS.  beta well below 1 with high r2 says vocabulary growth
    is sublinear-but-alive; beta near 0 says the source is exhausted.
    All inputs to the regression are exact integers, so both engines
    take ln of identical values; the aggregate means carry the repo's
    +1e-9 rounding nudge."""
    curve = vocab_growth_curve(
        docs, interval=interval, text_col=text_col, id_col=id_col
    ).select(
        F.log(F.col("tokens_cum").cast("double")).alias("__x"),
        F.log(F.col("vocab_cum").cast("double")).alias("__y"),
    )
    agg = curve.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.avg("__x").alias("__mx"),
        F.avg("__y").alias("__my"),
        F.avg(F.col("__x") * F.col("__x")).alias("__mxx"),
        F.avg(F.col("__y") * F.col("__y")).alias("__myy"),
        F.avg(F.col("__x") * F.col("__y")).alias("__mxy"),
    )
    cov = F.col("__mxy") - F.col("__mx") * F.col("__my")
    varx = F.col("__mxx") - F.col("__mx") * F.col("__mx")
    vary = F.col("__myy") - F.col("__my") * F.col("__my")
    beta = cov / varx
    return agg.select(
        F.col("n_points").cast("long").alias("n_points"),
        F.round(beta + F.lit(1e-9), 6).alias("beta"),
        F.round(F.col("__my") - beta * F.col("__mx") + F.lit(1e-9), 6).alias("log_k"),
        F.round(cov * cov / (varx * vary) + F.lit(1e-9), 6).alias("r2"),
    )


def ppl_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    approx: bool = False,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """CCNet-style per-source LM-score bucketing (Wenzek et al. 2020):
    rank each source's documents by their Kneser-Ney bigram score
    (:func:`kn_logprob_scores`) and cut equal-count buckets — bucket 1
    ("head") is the most-fluent third, bucket ``n_buckets`` ("tail")
    the least.  (doc_id, source, avg_logprob_kn, bucket, band).  The
    published pipeline keeps head+middle and drops (or down-samples)
    the tail PER SOURCE rather than globally, because sources differ in
    baseline fluency — a global threshold would empty the noisiest
    source entirely and keep every line of the cleanest.

    Determinism: ntile over (score DESC, doc_id ASC) — the tie order is
    total, so both engines cut identical buckets; docs with fewer than
    two words are omitted (the bigram-LM contract upstream).

    Scale shape: the KN aggregates as in :func:`kn_logprob_scores`, one
    source-keyed window for the ntile (partitioned by source, never
    global).  ``approx=True`` is the 100-TB tier (mirrors A1's HLL++
    opt-in): instead of the per-source (doc_id, score) sort it computes
    ``n_buckets − 1`` Greenwald-Khanna approx-percentile thresholds per
    source (rank error ≤ n/``approx_accuracy``) and broadcast-joins the
    tiny (source → thresholds) table back — bucket = 1 + #(thresholds
    ≥ score), so with exact-rank thresholds, distinct scores and counts
    divisible by ``n_buckets`` the assignment IS the ntile assignment
    (pinned by ``test_ppl_buckets_approx_tier``).  Approx differences
    vs exact: score TIES at a threshold all land in one bucket (ntile
    splits them by doc_id), and bucket counts are equal only to within
    the rank error.  The exact tier stays the oracle-checkable default.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    scores = kn_logprob_scores(
        docs, discount=discount, text_col=text_col, id_col=id_col
    )
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    j = scores.join(src, "doc_id")
    if approx:
        if n_buckets == 1:
            return j.select(
                "doc_id", "source", "avg_logprob_kn",
                F.lit(1).cast("long").alias("bucket"),
                F.lit("head").alias("band"),
            )
        # ascending rank quantiles i/n, i = 1..n-1: GK returns the
        # smallest value whose rank fraction >= p, so "score <= t_i"
        # reproduces "rank position <= ceil(i*N/n)" when thresholds are
        # rank-exact.  The threshold table is one row per source —
        # broadcast by construction, no per-source sort anywhere.
        ps = [i / n_buckets for i in range(1, n_buckets)]
        thresholds = j.groupBy("source").agg(
            F.percentile_approx(
                "avg_logprob_kn", F.lit(ps), F.lit(int(approx_accuracy))
            ).alias("__thr")
        ).withColumnRenamed("source", "__thr_source")
        score = F.col("avg_logprob_kn")
        # thresholds ascend with p; the most fluent doc clears them all
        # (zero thresholds at-or-above it) -> bucket 1 = head
        n_above = F.size(F.filter("__thr", lambda t: score <= t))
        bucket = (F.lit(1) + n_above).cast("long")
        return (
            # null-safe join: groupBy keeps a NULL-source group (and the
            # exact tier's window buckets those docs), so a plain
            # equi-join would silently DROP every NULL-source doc
            j.join(
                F.broadcast(thresholds),
                F.col("source").eqNullSafe(F.col("__thr_source")),
            )
            .select(
                "doc_id",
                "source",
                "avg_logprob_kn",
                bucket.alias("bucket"),
                F.when(bucket == 1, F.lit("head"))
                .when(bucket == n_buckets, F.lit("tail"))
                .otherwise(F.lit("middle"))
                .alias("band"),
            )
        )
    w = Window.partitionBy("source").orderBy(
        F.desc("avg_logprob_kn"), F.asc("doc_id")
    )
    bucket = F.ntile(n_buckets).over(w)
    return j.select(
        "doc_id",
        "source",
        "avg_logprob_kn",
        bucket.cast("long").alias("bucket"),
        F.when(bucket == 1, F.lit("head"))
        .when(bucket == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("band"),
    )


def ppl_select(
    docs: DataFrame,
    n_buckets: int = 3,
    discount: float = 0.75,
    keep_tail: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """The CCNet selection step over :func:`ppl_buckets`: keep each
    source's head+middle bands and drop the tail (or keep everything
    with the band attached when ``keep_tail=True`` — the audit view).
    (doc_id, source, band): the id list a pipeline joins back against
    the corpus — selection ships ids, never text."""
    b = ppl_buckets(
        docs, n_buckets=n_buckets, discount=discount,
        text_col=text_col, id_col=id_col, source_col=source_col,
    )
    if not keep_tail:
        b = b.filter(F.col("band") != "tail")
    return b.select("doc_id", "source", "band")
