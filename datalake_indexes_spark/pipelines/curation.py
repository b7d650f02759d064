"""Declarative curation-pipeline runner (extension surface).

`plans/queries.py` grades several FIXED curation compositions
(`corpus_prep`, `_v2`, `_v3`, `corpus_delivery`); this module is the
generic surface behind them: a pipeline is a LIST OF STAGE DICTS
(`{"stage": <name>, ...params}`), each stage a registered
filter/transform over the running documents frame, and the runner
returns both the surviving frame and a per-stage census (docs in/out —
the funnel report every data card wants).

Design rules:

- **One lazy plan.** Stages compose DataFrame → DataFrame; nothing is
  materialized between stages.  The census is computed as ONE extra
  aggregate over a union of per-stage survivor markers — not an action
  per stage — so the report costs one corpus scan, and only when asked.
- **Filters keep the document frame's schema.**  A stage may CONSULT a
  derived frame (quality scores, near-dup pairs...) but always returns
  the surviving subset of the input documents, so stages compose in any
  order.
- **Determinism.**  Every underlying operator is deterministic (md5
  draws, fixed thresholds), so a pipeline spec is a reproducible corpus
  definition — rerunning it on the same snapshot yields byte-identical
  survivors.

Stage registry (params beyond ``stage`` are passed through):

- ``quality_min``: keep docs with quality_score >= ``min_score``
- ``c4_rules``: keep docs passing the C4 heuristic rule set
- ``langs``: keep docs whose detected language is in ``keep``
- ``max_repetition``: keep docs with top-bigram fraction <= ``max_frac``
- ``pii_scrub``: TRANSFORM — replace text with the scrubbed version
- ``normalize``: TRANSFORM — unicode-normalize the text (the usual
  FIRST stage: quote/dash folds, control strip, space collapse)
- ``dedup_exact``: keep the earliest copy of each exact text
- ``dedup_minhash``: drop near-duplicates (keep the smaller doc_id of
  each detected pair)
- ``decontaminate``: drop docs sharing >= ``min_overlap`` n-grams with a
  benchmark frame (passed as ``benchmark``)
- ``decontaminate_spans``: cut verbatim benchmark spans out of the text
  (keep the doc), dropping docs left under ``min_remaining_words``
- ``span_dedup``: cut spans duplicated across documents, keeping the
  smallest-id copy (transform; every doc survives, possibly shorter)
- ``self_span_cleanup``: cut later copies of the spans a doc repeats
  inside itself (transform; the doc always survives)
- ``domain_cap``: keep at most ``cap`` docs per registered domain
  (needs a ``url`` column)
- ``group_split_keep``: keep one split of a leakage-safe group split
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class CurationResult:
    docs: DataFrame        # survivors, input schema preserved
    census: DataFrame      # (stage_idx, stage, docs_in, docs_out, dropped)

    def unpersist(self) -> "CurationResult":
        """Release frames cached by ``run_curation(persist_stages=True)``
        (no-op otherwise — unpersist on an uncached frame is free)."""
        for df in getattr(self, "_cached", []):
            df.unpersist()
        return self


def _keep_ids(docs: DataFrame, ids: DataFrame, id_col: str) -> DataFrame:
    return docs.join(ids.select(id_col).distinct(), id_col, "left_semi")


def _stage_quality_min(docs, id_col, text_col, min_score: float = 0.5):
    from datalake_indexes_spark.operators.text_analysis import quality_scores

    scored = quality_scores(docs, text_col=text_col, id_col=id_col)
    keep = scored.filter(F.col("quality_score") >= min_score).select(
        F.col("doc_id").alias(id_col)
    )
    return _keep_ids(docs, keep, id_col)


def _stage_c4_rules(docs, id_col, text_col):
    from datalake_indexes_spark.operators.text_analysis import c4_rule_flags

    flags = c4_rule_flags(docs, text_col=text_col, id_col=id_col)
    keep = flags.filter(F.col("c4_keep")).select(F.col("doc_id").alias(id_col))
    return _keep_ids(docs, keep, id_col)


def _stage_langs(docs, id_col, text_col, keep: list[str] = ("en",)):
    from datalake_indexes_spark.operators.text_analysis import language_id

    lid = language_id(docs, text_col=text_col, id_col=id_col)
    kept = lid.filter(F.col("pred_lang").isin(list(keep))).select(
        F.col("doc_id").alias(id_col)
    )
    return _keep_ids(docs, kept, id_col)


def _stage_max_repetition(docs, id_col, text_col, max_frac: float = 0.2):
    from datalake_indexes_spark.operators.text_analysis import repetition_scores

    rep = repetition_scores(docs, text_col=text_col, id_col=id_col)
    keep = rep.filter(F.col("top_bigram_frac") <= max_frac).select(
        F.col("doc_id").alias(id_col)
    )
    return _keep_ids(docs, keep, id_col)


def _stage_pii_scrub(docs, id_col, text_col):
    from datalake_indexes_spark.operators.text_analysis import pii_scrub

    scrubbed = pii_scrub(docs, text_col=text_col, id_col=id_col).select(
        F.col("doc_id").alias(id_col), F.col("scrubbed")
    )
    return docs.drop(text_col).join(scrubbed, id_col).withColumnRenamed(
        "scrubbed", text_col
    )


def _stage_normalize(docs, id_col, text_col):
    # TRANSFORM — deterministic unicode cleanup (quotes/dashes/ellipsis
    # fold, control/zero-width strip, space collapse); map-only, so the
    # stage adds zero shuffles to the composed plan
    from datalake_indexes_spark.operators.text_analysis import normalize_text

    normed = normalize_text(docs, text_col=text_col, id_col=id_col).select(
        F.col("doc_id").alias(id_col), F.col("normalized")
    )
    return docs.drop(text_col).join(normed, id_col).withColumnRenamed(
        "normalized", text_col
    )


def _stage_dedup_exact(docs, id_col, text_col):
    # reuse the graded operator (map-side-combinable min aggregate —
    # lighter than a per-hash-partition sort, and the single source of
    # the earliest-copy semantics the census oracle mirrors)
    from datalake_indexes_spark.operators.dedup import exact_duplicate_groups

    keep = exact_duplicate_groups(docs, text_col=text_col, id_col=id_col).select(
        F.col("keep_doc_id").alias(id_col)
    )
    return _keep_ids(docs, keep, id_col)


def _stage_dedup_minhash(docs, id_col, text_col, n: int = 3, threshold: float = 0.7):
    from datalake_indexes_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col
    )
    losers = pairs.select(F.col("doc_id_2").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def _stage_decontaminate(docs, id_col, text_col, benchmark=None,
                         n: int = 5, min_overlap: int = 3):
    from datalake_indexes_spark.operators.text_analysis import decontaminate

    if benchmark is None:
        raise ValueError("decontaminate stage needs a `benchmark` frame")
    flagged = decontaminate(
        docs, benchmark, n=n, min_overlap=min_overlap,
        text_col=text_col, id_col=id_col,
    )
    keep = flagged.filter(~F.col("contaminated")).select(
        F.col("doc_id").alias(id_col)
    )
    return _keep_ids(docs, keep, id_col)


def _stage_decontaminate_spans(docs, id_col, text_col, benchmark=None,
                               k: int = 5, min_words: int = 10,
                               max_ref_gram_freq: int = 100,
                               min_remaining_words: int = 1):
    """TRANSFORM + filter: cut verbatim benchmark spans out of the text
    (span-level decontamination — keeps the document, removes the leaked
    words), then drop docs the CUT left under ``min_remaining_words``
    words (a fully-leaked doc becomes empty and is useless downstream).
    Docs that were never cut pass through whatever their length — an
    empty doc in is an empty doc out, like every other transform stage
    (length policy belongs to quality stages, not this one)."""
    from datalake_indexes_spark.operators.dedup import decontaminate_spans

    if benchmark is None:
        raise ValueError("decontaminate_spans stage needs a `benchmark` frame")
    cleaned = decontaminate_spans(
        docs, benchmark, k=k, min_words=min_words,
        max_ref_gram_freq=max_ref_gram_freq,
        text_col=text_col, id_col=id_col,
    ).select(
        F.col(id_col),
        F.col("text_cleaned"),
        F.col("n_words_removed").alias("__cut"),
        (F.col("n_words_before") - F.col("n_words_removed")).alias("__left"),
    )
    # null text is never cut (null in -> null out): coalesce keeps it
    keep = (F.coalesce(F.col("__cut"), F.lit(0)) == 0) | (
        F.col("__left") >= min_remaining_words
    )
    return (
        docs.drop(text_col)
        .join(cleaned.filter(keep), id_col)
        .withColumnRenamed("text_cleaned", text_col)
        .drop("__left", "__cut")
    )


def _stage_span_dedup(docs, id_col, text_col, k: int = 5,
                      min_words: int = 10, max_gram_freq: int = 100):
    """TRANSFORM: cut spans duplicated ACROSS documents, keeping the
    copy in the smallest doc id (pair orientation — see
    remove_repeated_spans); every doc survives, possibly shorter."""
    from datalake_indexes_spark.operators.dedup import (
        remove_repeated_spans,
        repeated_spans,
    )

    spans = repeated_spans(
        docs, k=k, min_words=min_words, max_gram_freq=max_gram_freq,
        text_col=text_col, id_col=id_col,
    )
    cleaned = remove_repeated_spans(
        docs, spans, text_col=text_col, id_col=id_col
    ).select(F.col(id_col), F.col("text_cleaned"))
    return (
        docs.drop(text_col)
        .join(cleaned, id_col)
        .withColumnRenamed("text_cleaned", text_col)
    )


def _stage_self_span_cleanup(docs, id_col, text_col, k: int = 5,
                             min_words: int = 10, max_gram_occ: int = 50):
    """TRANSFORM: cut later copies of each doc's internally repeated
    spans (quoted-reply chains, navigation blocks) — the text shrinks,
    the doc always survives."""
    from datalake_indexes_spark.operators.dedup import remove_self_repetitions

    cleaned = remove_self_repetitions(
        docs, k=k, min_words=min_words, max_gram_occ=max_gram_occ,
        text_col=text_col, id_col=id_col,
    ).select(F.col(id_col), F.col("text_cleaned"))
    return (
        docs.drop(text_col)
        .join(cleaned, id_col)
        .withColumnRenamed("text_cleaned", text_col)
    )


def _stage_domain_cap(docs, id_col, text_col, cap: int = 100,
                      url_col: str = "url"):
    from datalake_indexes_spark.operators.web import domain_quota_cap

    keep = domain_quota_cap(docs, cap=cap, url_col=url_col, id_col=id_col)
    return _keep_ids(docs, keep.withColumnRenamed("doc_id", id_col), id_col)


def _stage_group_split_keep(docs, id_col, text_col, group_col: str = "source",
                            split: str = "train",
                            weights: dict[str, float] | None = None):
    from datalake_indexes_spark.operators.text_analysis import group_split

    splits = group_split(docs, group_col=group_col, weights=weights,
                         id_col=id_col)
    keep = splits.filter(F.col("split") == split).select(
        F.col("doc_id").alias(id_col)
    )
    return _keep_ids(docs, keep, id_col)


def _stage_gopher_rules(docs, id_col, text_col, **kw):
    """Keep documents passing the Gopher rule set (text_analysis.py
    gopher_rule_flags); threshold kwargs pass through."""
    from datalake_indexes_spark.operators.text_analysis import gopher_rule_flags

    flags = gopher_rule_flags(docs, text_col=text_col, id_col=id_col, **kw)
    keep = flags.filter(F.col("gopher_keep")).select(
        F.col("doc_id").alias(id_col)
    )
    return _keep_ids(docs, keep, id_col)


def _stage_dsir_top_fraction(docs, id_col, text_col, fraction: float = 0.5,
                             target_lang: str = "en", n_buckets: int = 256):
    """Keep the top ``fraction`` of documents by DSIR importance weight
    toward ``target_lang`` (text_analysis.py dsir_select)."""
    from datalake_indexes_spark.operators.text_analysis import dsir_select

    keep = dsir_select(
        docs,
        fraction=fraction,
        target=F.col("lang") == target_lang,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
    ).select(F.col("doc_id").alias(id_col))
    return _keep_ids(docs, keep, id_col)


def _stage_nb_langs(docs, id_col, text_col, keep: list[str] = ("en",),
                    label_col: str = "lang", n_buckets: int = 512):
    """Keep documents whose TRAINED-classifier prediction is in ``keep``
    (ml.py hashed_nb_classify) — the learned alternative to the marker
    heuristic ``langs`` stage."""
    from datalake_indexes_spark.operators.ml import hashed_nb_classify

    pred = hashed_nb_classify(
        docs,
        label_col=label_col,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
    )
    kept = pred.filter(F.col("pred_label").isin(list(keep))).select(
        F.col("doc_id").alias(id_col)
    )
    return _keep_ids(docs, kept, id_col)


STAGES = {
    "quality_min": _stage_quality_min,
    "c4_rules": _stage_c4_rules,
    "gopher_rules": _stage_gopher_rules,
    "dsir_top_fraction": _stage_dsir_top_fraction,
    "nb_langs": _stage_nb_langs,
    "langs": _stage_langs,
    "max_repetition": _stage_max_repetition,
    "pii_scrub": _stage_pii_scrub,
    "normalize": _stage_normalize,
    "dedup_exact": _stage_dedup_exact,
    "dedup_minhash": _stage_dedup_minhash,
    "decontaminate": _stage_decontaminate,
    "decontaminate_spans": _stage_decontaminate_spans,
    "span_dedup": _stage_span_dedup,
    "self_span_cleanup": _stage_self_span_cleanup,
    "domain_cap": _stage_domain_cap,
    "group_split_keep": _stage_group_split_keep,
}


def run_curation(
    docs: DataFrame,
    stages: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_stages: bool = False,
) -> CurationResult:
    """Compose the configured stages over ``docs`` and return survivors +
    the per-stage funnel census.

    The census unions one tiny (stage_idx, marker-count) aggregate per
    stage boundary — len(stages)+1 count aggregates over progressively
    smaller frames, assembled lazily; reading ``census`` costs the
    funnel's scans (each boundary re-runs its prefix — O(k²) stage
    executions), reading only ``docs`` costs just the final plan.
    ``persist_stages=True`` caches each intermediate frame so the census
    costs one execution per stage instead; call ``result.unpersist()``
    when done (survivors keep flowing either way — MEMORY_AND_DISK
    caches evict under pressure, they never fail the job).
    """
    frames = [docs]
    cached = []
    cur = docs
    for spec in stages:
        spec = dict(spec)
        name = spec.pop("stage")
        if name not in STAGES:
            raise ValueError(
                f"unknown curation stage {name!r}; known: {sorted(STAGES)}"
            )
        cur = STAGES[name](cur, id_col, text_col, **spec)
        if persist_stages:
            cur = cur.persist()
            cached.append(cur)
        frames.append(cur)

    counts = None
    for i, frame in enumerate(frames):
        c = frame.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(i).alias("__i"), "n"
        )
        counts = c if counts is None else counts.unionByName(c)
    names = ["input"] + [s["stage"] for s in stages]
    labels = F.array(*[F.lit(n) for n in names])
    census = (
        counts.withColumn("stage", labels[F.col("__i")])
        .withColumn("docs_out", F.col("n"))
        .withColumn(
            # global-order window over len(stages)+1 rows — driver-tiny
            "docs_in",
            F.coalesce(F.lag("n").over(Window.orderBy("__i")), F.col("n")),
        )
        .select(
            F.col("__i").alias("stage_idx"),
            "stage",
            "docs_in",
            "docs_out",
            (F.col("docs_in") - F.col("docs_out")).alias("dropped"),
        )
    )
    result = CurationResult(docs=cur, census=census)
    result._cached = cached
    return result


def drop_audit(
    docs: DataFrame,
    stages: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document curation lineage: (doc_id, dropped_at) with
    ``dropped_at`` = the FIRST stage that removed the doc, or
    ``'survived'`` — the "why is doc X missing from the corpus?" answer
    the census's aggregate funnel can't give.  Transform stages
    (pii_scrub/normalize) never drop, so they pass through the audit.

    Scale shape: the composed funnel runs once per stage boundary (the
    same O(k) cost profile as the census), each boundary reduced to an
    id-marker frame; the audit is then k broadcast-sized id joins onto
    the input's id column and one chained CASE.  Output is one row per
    INPUT document — the id column only, never the text.
    """
    cur = docs
    marks: list[tuple[str, DataFrame]] = []
    for i, spec in enumerate(stages):
        spec = dict(spec)
        name = spec.pop("stage")
        if name not in STAGES:
            raise ValueError(
                f"unknown curation stage {name!r}; known: {sorted(STAGES)}"
            )
        cur = STAGES[name](cur, id_col, text_col, **spec)
        marks.append(
            (name, cur.select(F.col(id_col)).withColumn(f"__s{i}", F.lit(1)))
        )
    audit = docs.select(F.col(id_col).alias("doc_id"))
    for i, (_, m) in enumerate(marks):
        audit = audit.join(
            m.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else m,
            "doc_id",
            "left",
        )
    dropped = None
    for i, (name, _) in enumerate(marks):
        cond = F.col(f"__s{i}").isNull()
        dropped = (
            F.when(cond, F.lit(name))
            if dropped is None
            else dropped.when(cond, F.lit(name))
        )
    label = F.lit("survived") if dropped is None else dropped.otherwise("survived")
    return audit.select("doc_id", label.alias("dropped_at"))
