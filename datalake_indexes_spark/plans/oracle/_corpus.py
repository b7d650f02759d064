"""Corpus lifecycle (prep/sample/pack/split) oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec

from datalake_indexes_spark.plans.oracle._common import _LINE_PLANT_CTE
from datalake_indexes_spark.plans.oracle._dedup import _minhash_pairs_ctes, decontaminate_sql
from datalake_indexes_spark.plans.oracle._text import text_dsir_weights_sql, text_ppl_buckets_sql, text_quality_sql, text_repetition_sql, text_token_counts_sql

def corpus_prep_sql(quality_threshold: float = 0.55, jaccard_threshold: float = 0.7) -> str:
    """Composed corpus-prep twin: quality filter + near-dup drop."""
    return f"""
WITH RECURSIVE {_minhash_pairs_ctes(threshold=jaccard_threshold)},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r
),
drop_docs AS (
  SELECT node AS doc_id FROM reach GROUP BY node
  HAVING least(node, min(r)) != node
),
quality AS (SELECT * FROM ({text_quality_sql()}) q)
SELECT q.doc_id, q.n_words, q.quality_score
FROM quality q ANTI JOIN drop_docs d ON q.doc_id = d.doc_id
WHERE q.quality_score >= {quality_threshold}
"""


def corpus_prep_full_sql(
    quality_threshold: float = 0.55,
    repetition_cap: float = 0.2,
    token_budget: int = 2048,
) -> str:
    """Full-curation twin: quality + repetition filters, earliest-keep
    exact dedup, PII scrub, then the packing prefix sum over survivors."""
    from datalake_indexes_spark.operators.text_analysis import PII_PATTERNS

    email, e_rep = PII_PATTERNS["email"]
    ipv4, i_rep = PII_PATTERNS["ipv4"]
    phone, p_rep = PII_PATTERNS["phone"]
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(d.text, "
        f"'{email}', '{e_rep}', 'g'), '{ipv4}', '{i_rep}', 'g'), "
        f"'{phone}', '{p_rep}', 'g')"
    )
    return f"""
WITH q AS (
  SELECT doc_id FROM ({text_quality_sql()}) WHERE quality_score >= {quality_threshold}
),
r AS (
  SELECT doc_id FROM ({text_repetition_sql()}) WHERE top_bigram_frac <= {repetition_cap}
),
keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
surv AS (
  SELECT d.doc_id, {scrub} AS text
  FROM documents d
  JOIN q USING (doc_id) JOIN r USING (doc_id) JOIN keep USING (doc_id)
),
t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM surv
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(prior // {token_budget} AS BIGINT) AS pack_id,
       CAST(prior % {token_budget} AS BIGINT) AS pack_offset
FROM c
"""


def corpus_budget_select_sql(budget: int = 20_000) -> str:
    """Twin of :func:`..operators.text_analysis.budget_select` over
    quality_scores: a plain global window here (the oracle runs at test
    scale; the engine does the two-level distributed prefix sum)."""
    return f"""
WITH q AS ({text_quality_sql()}),
s AS (
  SELECT doc_id, quality_score, CAST(n_words AS BIGINT) AS n_tokens FROM q
),
c AS (
  SELECT *, CAST(sum(n_tokens) OVER (
              ORDER BY quality_score DESC, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM s
)
SELECT doc_id, quality_score, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {budget}
"""


def corpus_sample_sql(fractions: dict[str, float], default_fraction: float = 1.0) -> str:
    """Stratified-sample twin: the md5-bucket membership rule is a pure
    function of doc_id, so both engines select the same rows."""
    cases = " ".join(
        f"WHEN lang = '{s}' THEN {f}" for s, f in sorted(fractions.items())
    )
    return f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
      < (CASE {cases} ELSE {default_fraction} END) * 10000
"""


def corpus_pack_sql(token_budget: int = 2048) -> str:
    """Packing twin — plain window prefix sum (the oracle need not be
    distributed; the engine's bucketed cascade must produce identical
    numbers)."""
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(prior // {token_budget} AS BIGINT) AS pack_id,
       CAST(prior % {token_budget} AS BIGINT) AS pack_offset
FROM c
"""


def corpus_mix_sql(
    alpha: float = 0.5, max_repeat: float = 4.0, stratum: str = "lang"
) -> str:
    """Temperature-mix twin: per-stratum repeat factor (c_max/c_s)^alpha
    rounded to 4 decimals, fractional part realized by the md5(doc_id)
    bucket rule, exploded to (doc_id, stratum, rep_id)."""
    return f"""
WITH c AS (SELECT {stratum} AS s, CAST(count(*) AS DOUBLE) AS cnt FROM documents GROUP BY 1),
w AS (
  SELECT s, round(least(pow((SELECT max(cnt) FROM c) / cnt, {alpha}), {max_repeat}), 4) AS r
  FROM c
),
d AS (
  SELECT doc_id, {stratum} AS stratum, r,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS bucket
  FROM documents JOIN w ON {stratum} = s
),
reps AS (
  SELECT doc_id, stratum,
         CAST(floor(r) AS INT)
         + CASE WHEN bucket < CAST(round((r - floor(r)) * 10000) AS BIGINT)
                THEN 1 ELSE 0 END AS n_rep
  FROM d
)
SELECT doc_id, stratum, CAST(t.i AS INT) AS rep_id
FROM reps, UNNEST(range(n_rep)) AS t(i)
"""


def corpus_chunk_sql(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """Chunking twin: same 0-based window starts (stride = chunk_tokens -
    overlap, last window only if it starts before n - overlap, minimum one
    window), 1-based inclusive list slicing on both engines."""
    stride = chunk_tokens - overlap
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (
  SELECT doc_id, w,
         unnest(range(0, greatest(len(w) - {overlap}, 1), {stride})) AS start
  FROM w
)
SELECT doc_id,
       CAST(start // {stride} AS INT) AS chunk_id,
       CAST(len(w[CAST(start + 1 AS INT):CAST(start + {chunk_tokens} AS INT)]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(w[CAST(start + 1 AS INT):CAST(start + {chunk_tokens} AS INT)], ' ') AS chunk_text
FROM s
"""


def corpus_split_sql(weights: dict[str, float] | None = None) -> str:
    """hash_split twin: same md5 bucket rule and cumulative boundaries."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(weights)
    acc, cases = 0.0, []
    for name in names[:-1]:
        acc += weights[name]
        cases.append(f"WHEN bucket < {int(round(acc * 10000))} THEN '{name}'")
    return f"""
SELECT doc_id, CASE {' '.join(cases)} ELSE '{names[-1]}' END AS split
FROM (
  SELECT doc_id,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS bucket
  FROM documents
)
"""


def corpus_prep_v2_sql(
    quality_threshold: float = 0.55,
    repetition_cap: float = 0.2,
    token_budget: int = 2048,
    modulus: int = 17,
    n: int = 5,
    min_overlap: int = 3,
) -> str:
    """Curation-v2 twin: held-out benchmark, quality/repetition filters,
    corpus-only earliest-keep dedup, decontamination, train split, PII
    scrub, packing prefix sum."""
    from datalake_indexes_spark.operators.text_analysis import PII_PATTERNS

    email, e_rep = PII_PATTERNS["email"]
    ipv4, i_rep = PII_PATTERNS["ipv4"]
    phone, p_rep = PII_PATTERNS["phone"]
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(d.text, "
        f"'{email}', '{e_rep}', 'g'), '{ipv4}', '{i_rep}', 'g'), "
        f"'{phone}', '{p_rep}', 'g')"
    )
    return f"""
WITH q AS (
  SELECT doc_id FROM ({text_quality_sql()}) WHERE quality_score >= {quality_threshold}
),
r AS (
  SELECT doc_id FROM ({text_repetition_sql()}) WHERE top_bigram_frac <= {repetition_cap}
),
keep AS (
  SELECT min(doc_id) AS doc_id FROM documents
  WHERE doc_id % {modulus} <> 0 GROUP BY md5(text)
),
clean AS (
  SELECT doc_id FROM ({decontaminate_sql(n, min_overlap, modulus)})
  WHERE NOT contaminated
),
train AS (
  SELECT doc_id FROM ({corpus_split_sql()}) WHERE split = 'train'
),
surv AS (
  SELECT d.doc_id, {scrub} AS text
  FROM documents d
  JOIN q USING (doc_id) JOIN r USING (doc_id) JOIN keep USING (doc_id)
  JOIN clean USING (doc_id) JOIN train USING (doc_id)
  WHERE d.doc_id % {modulus} <> 0
),
t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM surv
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(prior // {token_budget} AS BIGINT) AS pack_id,
       CAST(prior % {token_budget} AS BIGINT) AS pack_offset
FROM c
"""


def corpus_sample_exact_sql(n_per_stratum: int) -> str:
    """Exact-n stratified-sample twin: same md5 shuffle order, same
    per-stratum rank cut."""
    return f"""
SELECT doc_id, lang AS stratum,
       CAST(row_number() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS sample_rank
FROM documents
QUALIFY sample_rank <= {n_per_stratum}
"""


def corpus_sample_weighted_sql(k: int = 100) -> str:
    """A-ES weighted-sample twin: identical md5 uniform and ln(u)/w key."""
    return f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
            / (4294967296.0 + 1.0)) / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight,
       CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INT) AS rank
FROM keyed
QUALIFY rank <= {k}
"""


def _v3_ctes(k: int, bands: int, threshold: float) -> str:
    """Shared CTE block for the curation-v3 family: MinHash pairs →
    closure clusters, quality scores, keep-best drop set, unigram
    log-probs.  Callers append their own final SELECT."""
    from datalake_indexes_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""{_minhash_pairs_ctes(k, bands, threshold)},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r
),
clus AS (
  SELECT node AS doc_id, least(node, min(r)) AS cluster
  FROM reach GROUP BY node
),
qb AS (
  SELECT doc_id, string_split(text, ' ') AS w, length(text) AS nc FROM documents
),
qm AS (
  SELECT doc_id,
         (nc - (len(w) - 1)) * 1.0 / len(w) AS avg_len,
         len(list_filter(w, x -> list_contains([{stops}], x))) * 1.0 / len(w) AS stop_ratio,
         len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio
  FROM qb
),
q AS (
  SELECT doc_id,
         round(0.5 * distinct_ratio + 0.3 * least(avg_len / 8.0, 1.0)
               + 0.2 * (1.0 - stop_ratio), 4) AS quality_score
  FROM qm
),
dropped AS (
  SELECT doc_id FROM (
    SELECT c.doc_id,
           row_number() OVER (PARTITION BY c.cluster
             ORDER BY q.quality_score DESC, c.doc_id) AS rk
    FROM clus c JOIN q USING (doc_id)
  ) WHERE rk > 1
),
lw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w2 FROM documents
),
ltot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM lw),
lfreq AS (SELECT w2, ln(count(*) / ltot.t) AS l FROM lw, ltot GROUP BY w2, ltot.t),
lp AS (
  SELECT doc_id, round(avg(l), 4) AS avg_logprob
  FROM lw JOIN lfreq USING (w2) GROUP BY doc_id
)"""


def corpus_prep_v3_sql(
    quality_min: float = 0.52,
    logprob_min: float = -3.408,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> str:
    """Curation-v3 twin: quality + unigram-logprob gates on the ROUNDED
    operator outputs (threshold comparisons are engine-exact), keep-best
    near-dup drop via the recursive closure, md5 train shard."""
    return f"""
WITH RECURSIVE {_v3_ctes(k, bands, threshold)}
SELECT d.doc_id, d.lang, q.quality_score, lp.avg_logprob
FROM documents d
JOIN q USING (doc_id)
JOIN lp USING (doc_id)
WHERE q.quality_score >= {quality_min}
  AND lp.avg_logprob >= {logprob_min}
  AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
  AND ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 8000
"""


def corpus_audit_sql(
    quality_min: float = 0.52,
    logprob_min: float = -3.408,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> str:
    """Twin of the curation drop ledger: one row per INPUT doc with the
    first pipeline stage that rejected it ('kept' if it survived)."""
    return f"""
WITH RECURSIVE {_v3_ctes(k, bands, threshold)}
SELECT d.doc_id, q.quality_score, lp.avg_logprob,
  CASE
    WHEN q.quality_score < {quality_min} THEN 'quality'
    WHEN lp.avg_logprob < {logprob_min} THEN 'logprob'
    WHEN d.doc_id IN (SELECT doc_id FROM dropped) THEN 'near_dup'
    WHEN ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 >= 8000
      THEN 'eval_shard'
    ELSE 'kept'
  END AS stage
FROM documents d
JOIN q USING (doc_id)
JOIN lp USING (doc_id)
"""


def corpus_delivery_sql(n_shards: int = 8) -> str:
    """Twin of the curate-then-ship composition: curation-v3 survivors
    bucketed by the content-addressed shard rule, per-shard census."""
    return f"""
WITH kept AS (
{corpus_prep_v3_sql()}
)
SELECT shard_id, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM (
  SELECT CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {n_shards} AS INTEGER) AS shard_id,
         d.n_chars
  FROM documents d JOIN kept ON d.doc_id = kept.doc_id
)
GROUP BY shard_id
"""


def corpus_data_card_sql() -> str:
    """Twin of :func:`..operators.text_analysis.corpus_data_card` —
    quality/token legs reuse the per-doc twins as subqueries."""
    return f"""
WITH q AS ({text_quality_sql()}),
t AS ({text_token_counts_sql()})
SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM documents
UNION ALL SELECT 'n_chars_total', CAST(sum(n_chars) AS DOUBLE) FROM documents
UNION ALL SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM documents
UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) FROM documents
UNION ALL SELECT 'exact_dup_rate',
  round(1 - count(DISTINCT md5(text)) * 1.0 / count(*), 6) FROM documents
UNION ALL SELECT 'avg_quality', round(avg(quality_score) + 1e-9, 6) FROM q
UNION ALL SELECT 'avg_ws_tokens', round(avg(n_ws_tokens) + 1e-9, 6) FROM t
"""


def corpus_group_split_sql(
    train: float = 0.8, val: float = 0.1
) -> str:
    """Twin of :func:`..operators.text_analysis.group_split` on source."""
    t = int(round(train * 10000))
    v = int(round((train + val) * 10000))
    return f"""
SELECT doc_id,
       source AS group_key,
       CASE WHEN CAST(('0x' || substring(md5(source), 1, 8)) AS BIGINT)
                 % 10000 < {t} THEN 'train'
            WHEN CAST(('0x' || substring(md5(source), 1, 8)) AS BIGINT)
                 % 10000 < {v} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def corpus_pipeline_census_sql(
    quality_threshold: float = 0.55, repetition_cap: float = 0.2
) -> str:
    """Twin of the declarative runner's funnel census for the graded
    3-stage config (sequential composition matters: each stage counts
    against the PREVIOUS stage's survivors)."""
    return f"""
WITH q AS (
  SELECT doc_id FROM ({text_quality_sql()})
  WHERE quality_score >= {quality_threshold}
),
r AS (
  SELECT doc_id FROM ({text_repetition_sql()})
  WHERE top_bigram_frac <= {repetition_cap}
),
s1 AS (SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)),
s2 AS (SELECT s1.doc_id, s1.text FROM s1 JOIN r USING (doc_id)),
s3 AS (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY md5(text)),
c0 AS (SELECT count(*) AS n FROM documents),
c1 AS (SELECT count(*) AS n FROM s1),
c2 AS (SELECT count(*) AS n FROM s2),
c3 AS (SELECT count(*) AS n FROM s3)
SELECT 0 AS stage_idx, 'input' AS stage, c0.n AS docs_in, c0.n AS docs_out,
       0 AS dropped FROM c0
UNION ALL
SELECT 1, 'quality_min', c0.n, c1.n, c0.n - c1.n FROM c0, c1
UNION ALL
SELECT 2, 'max_repetition', c1.n, c2.n, c1.n - c2.n FROM c1, c2
UNION ALL
SELECT 3, 'dedup_exact', c2.n, c3.n, c2.n - c3.n FROM c2, c3
"""


def corpus_drop_audit_sql(
    quality_threshold: float = 0.55, repetition_cap: float = 0.2
) -> str:
    """Twin of the per-document drop audit for the graded 3-stage config:
    first failing stage wins; quality and repetition are per-doc
    independent, dedup keepers are computed over the stage-2 survivors
    exactly like the runner composes them."""
    return f"""
WITH q AS (
  SELECT doc_id FROM ({text_quality_sql()})
  WHERE quality_score >= {quality_threshold}
),
r AS (
  SELECT doc_id FROM ({text_repetition_sql()})
  WHERE top_bigram_frac <= {repetition_cap}
),
s2 AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN q USING (doc_id) JOIN r USING (doc_id)
),
keepers AS (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY md5(text))
SELECT d.doc_id,
       CASE WHEN q.doc_id IS NULL THEN 'quality_min'
            WHEN r.doc_id IS NULL THEN 'max_repetition'
            WHEN k.doc_id IS NULL THEN 'dedup_exact'
            ELSE 'survived' END AS dropped_at
FROM documents d
LEFT JOIN q ON q.doc_id = d.doc_id
LEFT JOIN r ON r.doc_id = d.doc_id
LEFT JOIN keepers k ON k.doc_id = d.doc_id
"""


def doc_novelty_sql(n: int = 3, modulus: int = 6) -> str:
    """Novelty twin over the planted-duplication corpus (every
    ``modulus``-th doc is replaced by a shared boilerplate text, mirrored
    by the query): distinct word n-grams per doc, df = 1 share."""
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = 0
              THEN 'shared boilerplate header applies to every mirrored document in this synthetic corpus'
              ELSE text END AS text
  FROM documents
),
w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM planted
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[pos + 1 : pos + {n}], ' ') AS shingle
  FROM (
    SELECT doc_id, ws, unnest(range(0, len(ws) - {n} + 1)) AS pos
    FROM w WHERE len(ws) >= {n}
  )
),
dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
per_doc AS (
  SELECT sh.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS novel
  FROM sh JOIN dfc USING (shingle) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
       round(p.novel * 1.0 / nullif(p.n_shingles, 0), 6) AS novel_frac
FROM planted d LEFT JOIN per_doc p USING (doc_id)
"""


def pareto_report_sql(
    targets: tuple[float, ...] = (0.5, 0.8, 0.9, 0.95, 0.99),
) -> str:
    """Pareto twin over per-document character weight — an INDEPENDENT
    derivation: plain global cumulative window (fine at oracle scale)
    vs the engine's two-level bucket prefix sum; agreement proves the
    decomposition."""
    arms = "\n  UNION ALL\n  ".join(
        f"SELECT CAST({t!r} AS DOUBLE) AS target_share,"
        f" min(rnk) AS n_keys,"
        f" min_by(cum_share, rnk) AS share"
        f" FROM ranked WHERE cum_share >= {t!r}"
        for t in targets
    )
    return f"""
WITH per_key AS (
  SELECT doc_id AS k, CAST(len(text) AS DOUBLE) AS w FROM documents
),
ranked AS (
  SELECT row_number() OVER (ORDER BY w DESC, k ASC) AS rnk,
         sum(w) OVER (ORDER BY w DESC, k ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / (SELECT sum(w) FROM per_key) AS cum_share
  FROM per_key
),
tot AS (SELECT count(*) AS n FROM per_key),
hits AS (
  {arms}
)
SELECT h.target_share,
       CAST(h.n_keys AS BIGINT) AS n_keys,
       round(h.share, 6) AS share_reached,
       round(h.n_keys * 1.0 / t.n, 6) AS key_frac
FROM hits h, tot t
ORDER BY h.target_share
"""


def snapshot_diff_sql(
    rm_mod: int = 13,
    rm_res: int = 5,
    add_mod: int = 11,
    add_res: int = 3,
    chg_mod: int = 7,
    chg_res: int = 2,
) -> str:
    """Twin of :func:`..operators.text_analysis.snapshot_diff` over the
    deterministically derived snapshot pair: old drops doc_id %
    add_mod == add_res (-> added) and upper-cases doc_id % chg_mod ==
    chg_res (-> changed); new drops doc_id % rm_mod == rm_res (->
    removed)."""
    return f"""
WITH old_snap AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {chg_mod} = {chg_res} THEN upper(text)
                  ELSE text END) AS old_hash
  FROM documents WHERE doc_id % {add_mod} <> {add_res}
),
new_snap AS (
  SELECT doc_id, md5(text) AS new_hash
  FROM documents WHERE doc_id % {rm_mod} <> {rm_res}
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.old_hash IS NOT DISTINCT FROM n.new_hash THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.old_hash, n.new_hash
FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
"""


def snapshot_diff_census_sql(**kw) -> str:
    """Rollup twin: one row per diff status over the same snapshot pair."""
    return (
        "SELECT status, count(*) AS n_docs FROM ("
        + snapshot_diff_sql(**kw)
        + ") GROUP BY status"
    )


def _harmonic_pack_cte(token_budget: int, salt_buckets: int) -> str:
    """Shared per-doc harmonic-pack CTE chain (twin of
    :func:`..operators.text_analysis.harmonic_pack`): same size-class
    rule, same (md5-salt, doc_id) within-class order, same two-level
    offset composition."""
    return f"""t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         greatest(CAST(floor({token_budget}.0 / greatest(n_tokens, 1))
                       AS BIGINT), 1) AS size_class,
         n_tokens > {token_budget} AS oversize,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {salt_buckets} AS salt
  FROM t
),
l AS (
  SELECT *, row_number() OVER (
           PARTITION BY size_class, salt ORDER BY doc_id) AS lrn
  FROM c
),
o AS (SELECT size_class, salt, count(*) AS cnt FROM c GROUP BY 1, 2),
o2 AS (
  SELECT size_class, salt,
         coalesce(sum(cnt) OVER (
           PARTITION BY size_class ORDER BY salt
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM o
),
packed AS (
  SELECT l.doc_id, l.n_tokens, l.size_class, l.oversize,
         CAST(floor((o2.off + l.lrn - 1) * 1.0 / l.size_class)
              AS BIGINT) AS bin_in_class,
         CAST((o2.off + l.lrn - 1) % l.size_class AS BIGINT) AS bin_slot
  FROM l JOIN o2 USING (size_class, salt)
)"""


def corpus_pack_harmonic_sql(
    token_budget: int = 64, salt_buckets: int = 32
) -> str:
    """Per-document harmonic pack assignment."""
    return (
        "WITH "
        + _harmonic_pack_cte(token_budget, salt_buckets)
        + "\nSELECT * FROM packed"
    )


def corpus_pack_fill_sql(token_budget: int = 64, salt_buckets: int = 32) -> str:
    """Twin of :func:`..operators.text_analysis.harmonic_pack_fill` —
    the per-class waste census over the shared packed CTE."""
    return (
        "WITH "
        + _harmonic_pack_cte(token_budget, salt_buckets)
        + f"""
SELECT size_class, n_docs, n_oversize, n_bins, total_tokens,
       CAST(greatest(n_bins * {token_budget} - total_tokens, 0) AS BIGINT)
         AS padding_tokens,
       round(total_tokens * 1.0 / (n_bins * {token_budget}), 4) AS fill_frac
FROM (
  SELECT size_class, count(*) AS n_docs,
         count(*) FILTER (oversize) AS n_oversize,
         CAST(max(bin_in_class) + 1 AS BIGINT) AS n_bins,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM packed GROUP BY size_class
)"""
    )


def corpus_select_dsir_sql(
    fraction: float = 0.25, n_buckets: int = 256, alpha: float = 0.5
) -> str:
    """Twin of :func:`..operators.text_analysis.dsir_select` — rank over
    the shared DSIR weights query, threshold at ceil(fraction * n)."""
    inner = text_dsir_weights_sql(n_buckets=n_buckets, alpha=alpha)
    return f"""
WITH scores AS ({inner}),
r AS (
  SELECT doc_id, avg_logratio,
         row_number() OVER (ORDER BY avg_logratio DESC, doc_id) AS sel_rank
  FROM scores
),
n AS (SELECT count(*) AS n FROM scores)
SELECT doc_id, avg_logratio, CAST(sel_rank AS BIGINT) AS sel_rank
FROM r, n WHERE sel_rank <= ceil(n * {fraction})
"""


def corpus_cluster_split_sql(
    train: float = 0.8,
    val: float = 0.1,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> str:
    """Twin of :func:`..operators.dedup.cluster_safe_split`: the trusted
    MinHash-pairs + transitive-closure component chain, split bucket on
    the cluster root (singletons root at themselves) via the shared md5
    rule."""
    t = int(round(train * 10000))
    v = int(round((train + val) * 10000))
    root = "coalesce(c.root, d.doc_id)"
    bucket = (
        f"CAST(('0x' || substring(md5(CAST({root} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % 10000"
    )
    return f"""
WITH RECURSIVE {_minhash_pairs_ctes(k, bands, threshold)},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r
),
comp AS (
  SELECT node AS doc_id, least(node, min(r)) AS root
  FROM reach GROUP BY node
)
SELECT d.doc_id, {root} AS cluster_root,
       CASE WHEN {bucket} < {t} THEN 'train'
            WHEN {bucket} < {v} THEN 'val'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


def corpus_select_ppl_sql(n_buckets: int = 3, discount: float = 0.75) -> str:
    """Twin of :func:`..operators.text_analysis.ppl_select`: the
    bucketing chain filtered to head+middle, ids + band only."""
    inner = text_ppl_buckets_sql(n_buckets=n_buckets, discount=discount)
    return f"""
SELECT doc_id, source, band FROM ({inner}) __b WHERE band != 'tail'
"""


def corpus_boilerplate_by_source_sql(min_docs: int = 2) -> str:
    """Twin of :func:`..operators.dedup.boilerplate_by_source` over the
    planted multi-line fixture."""
    return f"""
WITH {_LINE_PLANT_CTE},
plsrc AS (
  SELECT p.doc_id, d.source, p.text
  FROM planted p JOIN documents d USING (doc_id)
),
lines AS (
  SELECT doc_id, source,
         trim(unnest(string_split(text, chr(10)))) AS line_norm
  FROM plsrc
),
freq AS (
  SELECT line_norm FROM lines WHERE line_norm <> ''
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_docs}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN line_norm IN (SELECT line_norm FROM freq)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       round(sum(CASE WHEN line_norm IN (SELECT line_norm FROM freq)
                 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) + 1e-9, 6)
         AS boiler_ratio
FROM lines WHERE line_norm <> ''
GROUP BY source
"""


