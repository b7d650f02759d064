"""Text analysis / search / LM-scoring oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec

from datalake_indexes_spark.plans.oracle._common import _LINE_PLANT_CTE, _sql_str
from datalake_indexes_spark.plans.oracle._dedup import _simhash_cte

def text_simhash_sql() -> str:
    return f"WITH {_simhash_cte()} SELECT doc_id, simhash FROM sig"


def text_token_counts_sql() -> str:
    from datalake_indexes_spark.operators.text_analysis import TOKEN_REGEX

    return f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_re_tokens,
       length(text) AS n_chars_seen
FROM documents
"""


def text_bpe_counts_sql(n_merges: int = 64, max_types: int = 50_000) -> str:
    """BPE subword token counts twin — a full in-SQL replay of
    :func:`..functions.bpe.train_bpe` + ``apply_bpe`` (greedy apply ==
    training replay; tests/test_bpe.py pins that parity).

    Training is ``n_merges`` unrolled rounds, the same move the
    pagerank/HITS twins use for iteration: each round counts adjacent
    symbol pairs weighted by word frequency (every position, overlaps
    included, exactly the engine's ``zip(symbols, symbols[1:])``), picks
    the (count DESC, pair ASC) argmax with the engine's
    ``best_count >= 2`` stop (an empty argmax makes the round a no-op,
    mirroring the Python ``break``), and rewrites every word's symbol
    list leftmost-greedy.  Greedy non-overlap is exact in one window
    pass: two ADJACENT match positions force a == b, so within each
    island of consecutive matches the real merge starts are the even
    offsets from the island start.

    Symbol lists stay keyed by word — two distinct words can never
    share a list (lists concatenate back to word + '</w>'), so the
    engine's regroup-by-sequence is the identity and after the final
    round ``len(syms)`` IS the word's encoded length; per-document
    counts are one words->doc join away.  Assumes every corpus word
    sits inside the ``max_types`` frequency cap (true at the graded
    SFs — the synthetic corpus has ~31 word types); the engine encodes
    capped-out words with the same ranks anyway.
    """
    # the explicit ASCII class shared with functions/bpe.py (WS_CLASS):
    # RE2's \\s omits \\x0B and Python str.split() is Unicode-wide, so
    # all three surfaces spell the class out to pin identical word
    # boundaries on any corpus
    ws = "[ \\t\\n\\x0B\\f\\r]+"
    parts = [
        f"""WITH w AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(regexp_split_to_array(text, '{ws}')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
),
types AS MATERIALIZED (
  SELECT word, freq FROM w ORDER BY freq DESC, word LIMIT {max_types}
),
v0 AS MATERIALIZED (
  SELECT word, freq, list_append(string_split(word, ''), '</w>') AS syms
  FROM types
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT a, b, sum(freq) AS c FROM (
    SELECT syms[j] AS a, syms[j + 1] AS b, freq FROM (
      SELECT unnest(range(1, len(syms))) AS j, syms, freq FROM v{i - 1})
  ) GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT a, b, a || b AS ab FROM p{i} WHERE c >= 2 ORDER BY c DESC, a, b LIMIT 1
),
s{i} AS MATERIALIZED (
  SELECT word, freq, j, ab, syms,
         hit AND ((j - min(j) OVER (PARTITION BY word, isl)) % 2 = 0) AS strt
  FROM (
    SELECT *, CASE WHEN hit THEN j - (row_number() OVER
        (PARTITION BY word, hit ORDER BY j)) END AS isl
    FROM (
      SELECT word, freq, syms, ab, j,
             (j < len(syms) AND syms[j] = a AND syms[j + 1] = b) AS hit
      FROM (SELECT unnest(range(1, len(syms) + 1)) AS j, word, freq, syms,
                   a, b, ab
            FROM v{i - 1}, b{i})))
),
v{i} AS MATERIALIZED (
  SELECT word, min(freq) AS freq,
         list(CASE WHEN strt THEN ab ELSE syms[j] END ORDER BY j) AS syms
  FROM (SELECT *, coalesce(lag(strt) OVER (PARTITION BY word ORDER BY j),
                           FALSE) AS gone
        FROM s{i})
  WHERE NOT gone GROUP BY word
  UNION ALL
  SELECT word, freq, syms FROM v{i - 1}
  WHERE (SELECT count(*) FROM b{i}) = 0
)"""
        )
    body = ",\n".join(parts)
    return f"""
{body},
wl AS MATERIALIZED (SELECT word, len(syms) AS n FROM v{n_merges}),
dw AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '{ws}')) AS word
  FROM documents
),
dt AS (
  SELECT dw.doc_id, CAST(sum(wl.n) AS BIGINT) AS n
  FROM dw JOIN wl USING (word) GROUP BY dw.doc_id
)
SELECT d.doc_id, coalesce(dt.n, CAST(0 AS BIGINT)) AS n_bpe_tokens
FROM documents d LEFT JOIN dt USING (doc_id)
"""


def text_quality_sql() -> str:
    from datalake_indexes_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w, length(text) AS nc FROM documents
),
m AS (
  SELECT doc_id,
         len(w) AS n_words,
         (nc - (len(w) - 1)) * 1.0 / len(w) AS avg_len,
         len(list_filter(w, x -> list_contains([{stops}], x))) * 1.0 / len(w) AS stop_ratio,
         len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio
  FROM base
)
SELECT doc_id, n_words,
       round(avg_len, 4) AS avg_word_len,
       round(stop_ratio, 4) AS stopword_ratio,
       round(distinct_ratio, 4) AS distinct_ratio,
       round(0.5 * distinct_ratio + 0.3 * least(avg_len / 8.0, 1.0)
             + 0.2 * (1.0 - stop_ratio), 4) AS quality_score
FROM m
"""


def text_langid_sql() -> str:
    from datalake_indexes_spark.operators.text_analysis import LANG_MARKERS

    lang_rows = " UNION ALL ".join(
        "SELECT doc_id, '{lang}' AS lang, len(list_filter(w, x -> list_contains([{m}], x))) AS hits FROM base".format(
            lang=lang, m=", ".join(f"'{w}'" for w in markers)
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    )
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
scores AS ({lang_rows}),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rk
  FROM scores
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang,
       hits AS marker_hits
FROM best WHERE rk = 1
"""


def text_pii_scrub_sql() -> str:
    """PII redaction twin — patterns shared with the engine
    (text_analysis.PII_PATTERNS), restricted to syntax RE2 and Java regex
    evaluate identically."""
    from datalake_indexes_spark.operators.text_analysis import PII_PATTERNS

    email, e_rep = PII_PATTERNS["email"]
    ipv4, i_rep = PII_PATTERNS["ipv4"]
    phone, p_rep = PII_PATTERNS["phone"]
    return f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR)
                   || '@example.com' || ' or 10.0.'
                   || CAST(doc_id % 256 AS VARCHAR) || '.7'
                   || ' or +1 555 20' || CAST(doc_id % 90 + 10 AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{ipv4}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{email}', '{e_rep}', 'g'),
           '{ipv4}', '{i_rep}', 'g'),
           '{phone}', '{p_rep}', 'g') AS scrubbed
FROM p
"""


def text_script_ratios_sql() -> str:
    """Unicode-script composition twin — ranges and planted suffixes shared
    with the engine (text_analysis.SCRIPT_RANGES / SCRIPT_PLANT_SUFFIXES);
    literal BMP ranges evaluate identically under RE2 and Java regex."""
    from datalake_indexes_spark.operators.text_analysis import (
        SCRIPT_PLANT_SUFFIXES,
        SCRIPT_RANGES,
    )

    plant = " ".join(
        f"WHEN {m} THEN text || '{sfx}'" for m, sfx in SCRIPT_PLANT_SUFFIXES.items()
    )
    count_cols = ",\n         ".join(
        f"len(text) - len(regexp_replace(text, '[{r}]', '', 'g')) AS n_{name}"
        for name, r in {**SCRIPT_RANGES, "digit": "0-9", "space": " "}.items()
    )
    return f"""
WITH p AS (
  SELECT doc_id, CASE doc_id % 4 {plant} ELSE text END AS text FROM documents
),
c AS (
  SELECT doc_id, len(text) AS total,
         {count_cols}
  FROM p
)
SELECT doc_id, CAST(total AS BIGINT) AS n_chars_total,
       round(n_latin / total, 4) AS latin_ratio,
       round(n_cyrillic / total, 4) AS cyrillic_ratio,
       round(n_cjk / total, 4) AS cjk_ratio,
       round(n_arabic / total, 4) AS arabic_ratio,
       round(n_digit / total, 4) AS digit_ratio,
       round(n_space / total, 4) AS space_ratio,
       round((total - n_latin - n_cyrillic - n_cjk - n_arabic - n_digit - n_space) / total, 4) AS other_ratio,
       CASE WHEN n_latin >= greatest(n_cyrillic, n_cjk, n_arabic) THEN 'latin'
            WHEN n_cyrillic >= greatest(n_cjk, n_arabic) THEN 'cyrillic'
            WHEN n_cjk >= n_arabic THEN 'cjk' ELSE 'arabic' END AS dominant_script
FROM c
"""


def text_keywords_sql(k: int = 3) -> str:
    """tf-idf keyword twin: same tf/df/N definition, same ln scoring,
    same word tie-break."""
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, count(*) AS tf FROM w WHERE word != '' GROUP BY 1, 2
),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf * ln(n.n_docs / CAST(dfreq.df AS DOUBLE)) AS score
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
)
SELECT doc_id, word AS keyword, rank, round(score, 4) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def text_entropy_sql() -> str:
    """Entropy twin: same word split (empty tokens included), same
    H = ln(n) - Σ c·ln(c)/n formula."""
    return """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS c FROM w GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       count(*) AS n_distinct,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
FROM c GROUP BY doc_id
"""


def text_repetition_sql() -> str:
    """Gopher-style repetition twin: most-repeated unigram/bigram coverage
    per document."""
    return """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
wc AS (SELECT doc_id, g, count(*) AS cnt
       FROM (SELECT doc_id, unnest(ws) AS g FROM w) GROUP BY ALL),
uni AS (SELECT doc_id, sum(cnt) AS n_words, max(cnt) AS top_word FROM wc GROUP BY doc_id),
bgl AS (SELECT doc_id, CASE WHEN len(ws) >= 2
            THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
            ELSE [] END AS bgs FROM w),
bc AS (SELECT doc_id, g, count(*) AS cnt
       FROM (SELECT doc_id, unnest(bgs) AS g FROM bgl) GROUP BY ALL),
bi AS (SELECT doc_id, sum(cnt) AS n_bigrams, max(cnt) AS top_bigram FROM bc GROUP BY doc_id)
SELECT u.doc_id,
       CAST(u.n_words AS BIGINT) AS n_words,
       CAST(u.top_word AS BIGINT) AS top_word_count,
       round(u.top_word * 1.0 / u.n_words, 4) AS top_word_frac,
       CAST(coalesce(bi.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(bi.top_bigram, 0) AS BIGINT) AS top_bigram_count,
       round(coalesce(bi.top_bigram * 1.0 / bi.n_bigrams, 0.0), 4) AS top_bigram_frac
FROM uni u LEFT JOIN bi USING (doc_id)
"""


def text_fingerprint_sql() -> str:
    return """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fingerprint,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_words
FROM documents
"""


def _search_tf_ctes(terms: list[str]) -> str:
    term_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
  FROM documents
),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, any_value(dl) AS dl
  FROM (SELECT doc_id, dl, unnest(w) AS term FROM base)
  WHERE term IN ({term_list})
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term)"""


def bm25_topk_sql(terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    """Okapi BM25 twin — identical idf/tf-normalization formulas; rank on
    the unrounded score, doc_id tie-break."""
    return f"""
WITH {_search_tf_ctes(terms)},
scored AS (
  SELECT doc_id,
         sum(ln(1 + (n - df + 0.5) / (df + 0.5))
             * tf * ({k1} + 1.0)
             / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score, rank
FROM (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def tfidf_topk_sql(terms: list[str], k: int = 10) -> str:
    return f"""
WITH {_search_tf_ctes(terms)},
scored AS (
  SELECT doc_id, sum(tf * ln(n / df)) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score, rank
FROM (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def vocab_topk_sql(k: int = 50) -> str:
    return f"""
WITH pd AS (
  SELECT doc_id, word, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY doc_id, word
),
t AS (
  SELECT word, CAST(sum(c) AS BIGINT) AS total_count,
         CAST(count(*) AS BIGINT) AS doc_freq
  FROM pd GROUP BY word
)
SELECT word, total_count, doc_freq, rank
FROM (SELECT *, CAST(row_number() OVER (ORDER BY total_count DESC, word) AS INT) AS rank
      FROM t)
WHERE rank <= {k}
"""


def hybrid_rrf_sql(
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    k_each: int = 20,
    c: float = 60.0,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Reciprocal-rank-fusion twin: the BM25 rank list (same CTEs as the
    bm25 oracle) full-outer-joined with the exact-cosine rank list for
    the stored query embedding; rrf = Σ 1/(c + rank), absent lists
    contribute 0; fused ties break on doc_id."""
    return f"""
WITH {_search_tf_ctes(terms)},
kw_scored AS (
  SELECT doc_id,
         sum(ln(1 + (n - df + 0.5) / (df + 0.5))
             * tf * ({k1} + 1.0)
             / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats
  GROUP BY doc_id
),
kw AS (
  SELECT doc_id, rnk AS kw_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
    FROM kw_scored)
  WHERE rnk <= {k_each}
),
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {query_vec_id}),
vec AS (
  SELECT doc_id, rnk AS v_rank FROM (
    SELECT e.vec_id AS doc_id,
           row_number() OVER (
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qe) DESC,
                      e.vec_id) AS rnk
    FROM embeddings e, q WHERE e.vec_id != {query_vec_id})
  WHERE rnk <= {k_each}
),
fused AS (
  SELECT coalesce(kw.doc_id, vec.doc_id) AS doc_id,
         coalesce(1.0 / ({c} + kw.kw_rank), 0) + coalesce(1.0 / ({c} + vec.v_rank), 0) AS s
  FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
)
SELECT doc_id, round(s, 6) AS rrf_score,
       CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
FROM fused
QUALIFY rank <= {k}
"""


def text_tfidf_pairs_sql(threshold: float = 0.5, max_df_frac: float = 0.5) -> str:
    """Sparse tf-idf cosine-pair twin: same df cap, same weights, same
    per-term pair generation."""
    return f"""
WITH base AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM base GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
kept AS (SELECT term, df FROM df, nd WHERE df <= {max_df_frac} * nd.n),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(nd.n / kept.df) AS w
  FROM tf JOIN kept USING (term) CROSS JOIN nd
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_1, doc_id_2, round(dot / (n1.nrm * n2.nrm), 4) AS cosine
FROM dots
JOIN norms n1 ON n1.doc_id = doc_id_1
JOIN norms n2 ON n2.doc_id = doc_id_2
WHERE dot / (n1.nrm * n2.nrm) >= {threshold}
"""


def text_unigram_logprob_sql() -> str:
    """Unigram log-probability twin: same self-trained corpus LM, same
    per-document mean."""
    return """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM words),
lp AS (
  SELECT w, ln(count(*) / tot.t) AS l
  FROM words, tot GROUP BY w, tot.t
)
SELECT doc_id, count(*) AS n_words, round(avg(l), 4) AS avg_logprob
FROM words JOIN lp USING (w)
GROUP BY doc_id
"""


def text_quality_normalized_sql() -> str:
    """Twin of :func:`..operators.text_analysis.normalize_scores_by_group`
    — per-source percent_rank of the quality score (the run-length-count
    formulation must equal the window-function definition exactly)."""
    from datalake_indexes_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w, length(text) AS nc FROM documents
),
m AS (
  SELECT doc_id,
         (nc - (len(w) - 1)) * 1.0 / len(w) AS avg_len,
         len(list_filter(w, x -> list_contains([{stops}], x))) * 1.0 / len(w) AS stop_ratio,
         len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio
  FROM base
),
q AS (
  SELECT doc_id,
         round(0.5 * distinct_ratio + 0.3 * least(avg_len / 8.0, 1.0)
               + 0.2 * (1.0 - stop_ratio), 4) AS quality_score
  FROM m
)
SELECT d.doc_id, d.source, q.quality_score,
       round(percent_rank() OVER (PARTITION BY d.source ORDER BY q.quality_score), 6)
         AS score_pct
FROM documents d JOIN q USING (doc_id)
"""


def text_content_type_sql(
    symbol_threshold: float = 0.03, keyword_threshold: int = 3
) -> str:
    """Twin of :func:`..operators.text_analysis.content_type_scores` over
    the same planted code suffixes (shared constants; RE2 and Java regex
    evaluate both patterns identically — note DuckDB needs the 'g' flag
    where Spark's regexp_replace is global by default)."""
    from datalake_indexes_spark.operators.text_analysis import (
        CODE_KEYWORDS,
        CODE_PLANT_SUFFIX,
        CODE_SYMBOL_CLASS,
    )

    kw_pat = "\\b(" + CODE_KEYWORDS + ")\\b"
    return (
        """
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || '"""
        + CODE_PLANT_SUFFIX
        + """' ELSE text END AS t
  FROM documents
),
scored AS (
  SELECT doc_id,
         round((length(t) - length(regexp_replace(t, '"""
        + CODE_SYMBOL_CLASS
        + """', '', 'g'))) * 1.0 / length(t) + 1e-9, 4) AS symbol_ratio,
         CAST(len(regexp_extract_all(t, '"""
        + kw_pat
        + """')) AS BIGINT) AS kw_hits
  FROM planted
)
SELECT doc_id, symbol_ratio, kw_hits,
       CASE WHEN symbol_ratio >= """
        + str(symbol_threshold)
        + """ OR kw_hits >= """
        + str(keyword_threshold)
        + """ THEN 'code' ELSE 'prose' END AS content_type
FROM scored
"""
    )


def text_bigram_logprob_sql(k_smooth: float = 0.5) -> str:
    """Twin of :func:`..operators.text_analysis.bigram_logprob_scores` —
    add-k smoothed corpus-bigram conditionals (denominator = total
    unigram occurrences of the context word, V = distinct unigrams)."""
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
uni AS (SELECT unnest(w) AS w1 FROM ws),
ctx AS (SELECT w1, count(*) AS c1 FROM uni GROUP BY w1),
v AS (SELECT count(DISTINCT w1) AS vb FROM uni),
words AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos, unnest(w) AS word
  FROM ws
),
bg AS (
  SELECT a.doc_id, a.word AS w1, b.word AS w2
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
lp AS (
  SELECT bc.w1, bc.w2,
         ln((c12 + {k_smooth}) / (c1 + {k_smooth} * vb)) AS l
  FROM bc JOIN ctx USING (w1), v
)
SELECT doc_id, count(*) AS n_bigrams, round(avg(l), 4) AS avg_logprob2
FROM bg JOIN lp USING (w1, w2)
GROUP BY doc_id
"""


def text_pmi_sql(max_vocab: int = 1000, min_pair_docs: int = 2) -> str:
    """Twin of :func:`..operators.text_analysis.word_cooccurrence_pmi`."""
    return f"""
WITH words AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
wdf AS (SELECT w, count(*) AS df FROM words GROUP BY w),
vocab AS (SELECT w, df FROM wdf ORDER BY df DESC, w ASC LIMIT {max_vocab}),
kept AS (SELECT wo.doc_id, wo.w FROM words wo JOIN vocab USING (w)),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS pair_docs
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
  HAVING count(*) >= {min_pair_docs}
)
SELECT p.w1, p.w2, p.pair_docs,
       round(ln((p.pair_docs * nd.n) / (v1.df * v2.df)), 4) AS pmi
FROM pairs p
JOIN vocab v1 ON v1.w = p.w1
JOIN vocab v2 ON v2.w = p.w2, nd
"""


def text_canonicalize_sql() -> str:
    """Twin of :func:`..functions.text.canonicalize_text_col` over event
    props (digit/punctuation-rich JSON strings): same literal transform
    chain — note DuckDB regexp_replace needs the 'g' flag where Spark
    replaces all matches by default."""
    acc = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
    fold = "aaaaaaceeeeiiiinooooouuuuyy"
    return f"""
SELECT event_id,
       trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             translate(lower(props), '{acc}', '{fold}'),
             '[0-9]', '0', 'g'),
           '[^a-z0 ]', ' ', 'g'),
         ' +', ' ', 'g')) AS canon,
       md5(trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             translate(lower(props), '{acc}', '{fold}'),
             '[0-9]', '0', 'g'),
           '[^a-z0 ]', ' ', 'g'),
         ' +', ' ', 'g'))) AS canon_hash
FROM events
"""


def text_paragraph_filter_sql(
    min_words: int = 3, min_distinct_ratio: float = 0.5
) -> str:
    """Twin of :func:`..operators.text_analysis.paragraph_filter` over the
    planted-paragraph fixture."""
    return f"""
WITH planted AS (
  SELECT doc_id,
         text || chr(10) || 'good paragraph the data model runs well'
              || chr(10)
              || CASE WHEN doc_id % 2 = 0 THEN 'spam spam spam spam'
                      ELSE 'a b' END AS text
  FROM documents
),
sp AS (
  SELECT doc_id, string_split(text, chr(10)) AS paras FROM planted
),
ke AS (
  SELECT doc_id, paras,
         list_filter(paras, p ->
           len(list_filter(string_split(p, ' '), w -> w <> '')) >= {min_words}
           AND len(list_distinct(list_filter(string_split(p, ' '), w -> w <> '')))
               >= {min_distinct_ratio} * len(list_filter(string_split(p, ' '), w -> w <> ''))
         ) AS kept
  FROM sp
)
SELECT doc_id,
       CAST(len(paras) AS BIGINT) AS n_paragraphs,
       CAST(len(kept) AS BIGINT) AS n_kept,
       array_to_string(kept, chr(10)) AS text_filtered
FROM ke
"""


def text_c4_filters_sql(
    min_sentences: int = 3, min_sentence_words: int = 5
) -> str:
    """Twin of :func:`..operators.text_analysis.c4_rule_flags` over the
    planted sentence/boilerplate fixture."""
    from datalake_indexes_spark.operators.text_analysis import C4_BAD_PHRASES

    bad = " OR ".join(f"contains(lower(text), '{p}')" for p in C4_BAD_PHRASES)
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN text || '. The data runs well every day.'
                        || ' The model trains fast on data. It works.'
           WHEN 1 THEN text || ' lorem ipsum dolor'
           WHEN 2 THEN text || ' if (x) {{ return 1; }}'
           ELSE text END AS text
  FROM documents
),
m AS (
  SELECT doc_id, text,
         len(list_filter(string_split_regex(text, '[.!?]'), s ->
             len(list_filter(string_split(s, ' '), w -> w <> '')) >= {min_sentence_words}
         )) AS n_sentences,
         len(regexp_extract_all(text, '[.!?]')) AS n_terminal,
         ({bad}) AS has_bad_phrase,
         (contains(text, '{{') OR contains(text, '}}')) AS has_brace
  FROM planted
)
SELECT doc_id,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       round(n_terminal * 1.0 / greatest(n_sentences, 1), 4) AS terminal_ratio,
       has_bad_phrase,
       has_brace,
       (n_sentences >= {min_sentences}
        AND round(n_terminal * 1.0 / greatest(n_sentences, 1), 4) >= 1.0
        AND NOT has_bad_phrase AND NOT has_brace) AS c4_keep
FROM m
"""


def heavy_hitters_sql(m: int = 200) -> str:
    """Heavy-hitter twin: the sketch is an engine-side candidate
    optimization the exact filter erases, so the oracle is the plain
    threshold aggregate."""
    return f"""
WITH words AS MATERIALIZED (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
tot AS (SELECT count(*) AS n FROM words)
SELECT word, count(*) AS total_count,
       round(count(*) * 1.0 / any_value(t.n), 6) AS share
FROM words, tot t
GROUP BY word
HAVING count(*) * {m} > any_value(t.n)
"""


def normalize_text_sql() -> str:
    """Unicode-normalization twin: replace/regexp chains generated from
    the engine's shared rule tables (NORMALIZE_CHAR_MAP /
    NORMALIZE_REGEX_RULES), planted noise mirrored via chr() codes."""
    from datalake_indexes_spark.operators.text_analysis import (
        NORMALIZE_CHAR_MAP,
        NORMALIZE_REGEX_RULES,
        PLANT_NOISE_PREFIX,
        PLANT_NOISE_SUFFIX,
    )

    expr = "text"
    for src, dst in NORMALIZE_CHAR_MAP:
        expr = f"replace({expr}, {_sql_str(src)}, {_sql_str(dst)})"
    for pat, rep in NORMALIZE_REGEX_RULES:
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', {_sql_str(rep)}, 'g')"
    expr = f"trim({expr})"
    return f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN {_sql_str(PLANT_NOISE_PREFIX)} || text || {_sql_str(PLANT_NOISE_SUFFIX)}
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       {expr} AS normalized,
       CAST(len(text) AS BIGINT) AS n_chars_before,
       CAST(len({expr}) AS BIGINT) AS n_chars_after
FROM p
"""


def zipf_fit_sql(top_n: int = 1000) -> str:
    """Zipf twin: same whitespace tokenization as vocab_topk, same
    deterministic (count DESC, word ASC) top-n, same ln-ln OLS closed
    form."""
    return f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
counts AS (
  SELECT w, count(*) AS c FROM words WHERE w <> '' GROUP BY 1
),
totals AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab_size
  FROM counts
),
top AS (
  SELECT w, c FROM counts ORDER BY c DESC, w ASC LIMIT {int(top_n)}
),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS DOUBLE)) AS lr,
         ln(CAST(c AS DOUBLE)) AS lf
  FROM top
),
fit AS (
  SELECT count(*) AS n, sum(lr) AS sx, sum(lf) AS sy,
         sum(lr * lr) AS sxx, sum(lf * lf) AS syy, sum(lr * lf) AS sxy
  FROM ranked
)
SELECT t.n_tokens, t.vocab_size, CAST(f.n AS BIGINT) AS top_n,
       round((CAST(f.n AS DOUBLE) * f.sxy - f.sx * f.sy)
             / nullif(CAST(f.n AS DOUBLE) * f.sxx - f.sx * f.sx, 0.0), 6) AS slope,
       round((f.sy - ((CAST(f.n AS DOUBLE) * f.sxy - f.sx * f.sy)
                      / nullif(CAST(f.n AS DOUBLE) * f.sxx - f.sx * f.sx, 0.0))
                     * f.sx) / CAST(f.n AS DOUBLE), 6) AS intercept,
       round(((CAST(f.n AS DOUBLE) * f.sxy - f.sx * f.sy)
              / nullif(sqrt((CAST(f.n AS DOUBLE) * f.sxx - f.sx * f.sx)
                            * (CAST(f.n AS DOUBLE) * f.syy - f.sy * f.sy)), 0.0))
             * ((CAST(f.n AS DOUBLE) * f.sxy - f.sx * f.sy)
                / nullif(sqrt((CAST(f.n AS DOUBLE) * f.sxx - f.sx * f.sx)
                              * (CAST(f.n AS DOUBLE) * f.syy - f.sy * f.sy)), 0.0)), 6) AS r2
FROM fit f, totals t
"""


def readability_scores_sql() -> str:
    """Readability twin: same word/sentence splits, same vowel-run
    syllable heuristic, same closed forms (coefficients written
    identically so the doubles match)."""
    return """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words,
         len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                         x -> trim(x) <> '')) AS raw_sent,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vruns
  FROM documents
),
c AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(greatest(raw_sent, 1) AS BIGINT) AS n_sentences,
         CAST(vruns + len(list_filter(words,
              w -> NOT regexp_matches(w, '[aeiouy]'))) AS BIGINT) AS n_syllables
  FROM w
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
             - 84.6 * (n_syllables * 1.0 / nullif(n_words * 1.0, 0.0)), 4) AS flesch,
       round(0.39 * (n_words * 1.0 / n_sentences)
             + 11.8 * (n_syllables * 1.0 / nullif(n_words * 1.0, 0.0))
             - 15.59, 4) AS fk_grade
FROM c
"""


def text_gopher_filters_sql(
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 1,
) -> str:
    """Twin of :func:`..operators.text_analysis.gopher_rule_flags` over
    the planted bullet/ellipsis/symbol/numeral fixture (doc_id % 5
    variants, shared constants)."""
    from datalake_indexes_spark.operators.text_analysis import (
        GOPHER_PLANT_BULLETS,
        GOPHER_PLANT_ELLIPSIS,
        GOPHER_PLANT_NUMERIC,
        GOPHER_PLANT_SYMBOLS,
        GOPHER_STOPWORDS,
    )

    def nl_append(lines: tuple[str, ...]) -> str:
        return "text || " + " || ".join(
            f"chr(10) || '{ln}'" for ln in lines
        )

    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE CAST(doc_id % 5 AS INTEGER)
           WHEN 0 THEN {nl_append(GOPHER_PLANT_BULLETS)}
           WHEN 1 THEN {nl_append(GOPHER_PLANT_ELLIPSIS)}
           WHEN 2 THEN text || ' {GOPHER_PLANT_SYMBOLS}'
           WHEN 3 THEN text || ' {GOPHER_PLANT_NUMERIC}'
           ELSE text END AS text
  FROM documents
),
m AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), w -> w <> '') AS ws,
         list_filter(string_split(text, chr(10)), l -> l <> '') AS ls
  FROM planted
),
r AS (
  SELECT doc_id,
         len(ws) AS n_words,
         greatest(len(ws), 1) AS nw1,
         round(coalesce(list_sum(list_transform(ws, w -> len(w))), 0) * 1.0
               / greatest(len(ws), 1), 4) AS mean_word_len,
         round(((len(text) - len(replace(text, '#', '')))
                + (len(text) - len(replace(text, '...', ''))) / 3.0)
               / greatest(len(ws), 1), 4) AS symbol_ratio,
         round(len(list_filter(ls, l -> starts_with(l, '-')
                                     OR starts_with(l, '*')
                                     OR starts_with(l, '•'))) * 1.0
               / greatest(len(ls), 1), 4) AS bullet_line_ratio,
         round(len(list_filter(ls, l -> ends_with(l, '...'))) * 1.0
               / greatest(len(ls), 1), 4) AS ellipsis_line_ratio,
         round(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) * 1.0
               / greatest(len(ws), 1), 4) AS alpha_word_ratio,
         len(list_filter([{stop_list}], s -> list_contains(ws, s)))
           AS n_stopwords
  FROM m
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       mean_word_len, symbol_ratio, bullet_line_ratio,
       ellipsis_line_ratio, alpha_word_ratio,
       CAST(n_stopwords AS BIGINT) AS n_stopwords,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND mean_word_len >= {min_mean_word_len}
        AND mean_word_len <= {max_mean_word_len}
        AND symbol_ratio <= {max_symbol_ratio}
        AND bullet_line_ratio <= {max_bullet_ratio}
        AND ellipsis_line_ratio <= {max_ellipsis_ratio}
        AND alpha_word_ratio >= {min_alpha_ratio}
        AND n_stopwords >= {min_stopwords}) AS gopher_keep
FROM r
"""


def text_dsir_weights_sql(n_buckets: int = 256, alpha: float = 0.5) -> str:
    """Twin of :func:`..operators.text_analysis.dsir_importance_weights`
    with target = (lang = 'en') — same md5 bucket rule, same Laplace
    smoothing, same per-gram mean."""
    ab = alpha * n_buckets
    return f"""
WITH ws AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
),
uni AS (
  SELECT doc_id, is_target, unnest(w) AS g FROM ws
),
pos AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS p,
         unnest(w) AS g
  FROM ws
),
big AS (
  SELECT a.doc_id, w2.is_target, a.g || ' ' || b.g AS g
  FROM pos a
  JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  JOIN (SELECT doc_id, is_target FROM ws) w2 ON w2.doc_id = a.doc_id
),
gb AS (
  SELECT doc_id, is_target,
         ('0x' || substring(md5(g), 1, 8))::BIGINT % {n_buckets} AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)
),
dist AS (
  SELECT b, count(*) AS raw_c, count(*) FILTER (is_target) AS tgt_c
  FROM gb GROUP BY b
),
tot AS (SELECT sum(raw_c) AS raw_t, sum(tgt_c) AS tgt_t FROM dist),
lr AS (
  SELECT b,
         ln((tgt_c + {alpha}) / (tgt_t + {ab}))
           - ln((raw_c + {alpha}) / (raw_t + {ab})) AS l
  FROM dist, tot
)
SELECT doc_id, is_target, count(*) AS n_grams,
       round(avg(l), 4) + 0.0 AS avg_logratio
FROM gb JOIN lr USING (b)
GROUP BY doc_id, is_target
"""


def search_proximity_sql(query_terms: list[str], k: int = 10) -> str:
    """Twin of :func:`..operators.search.proximity_topk`: identical
    merged-occurrence running-max MinCover (0-based positions, same
    whitespace tokenization as the BM25 twins)."""
    terms = sorted(set(query_terms))
    in_list = ", ".join(f"'{t}'" for t in terms)
    lasts = ",\n         ".join(
        f"max(CASE WHEN word = '{t}' THEN pos END) OVER win AS l{i}"
        for i, t in enumerate(terms)
    )
    least = ", ".join(f"l{i}" for i in range(len(terms)))
    notnull = " AND ".join(f"l{i} IS NOT NULL" for i in range(len(terms)))
    return f"""
WITH occ AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos, w[CAST(t.i + 1 AS INT)] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(range(len(w))) AS t(i)
  WHERE w[CAST(t.i + 1 AS INT)] IN ({in_list})
),
m AS (
  SELECT doc_id, pos,
         {lasts}
  FROM occ
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
p AS (
  SELECT doc_id, CAST(min(pos - least({least}) + 1) AS BIGINT) AS min_span
  FROM m WHERE {notnull} GROUP BY doc_id
)
SELECT doc_id, min_span, rank
FROM (SELECT *, row_number() OVER (ORDER BY min_span, doc_id) AS rank FROM p)
WHERE rank <= {k}
"""


def text_boilerplate_lines_sql(min_docs: int = 2) -> str:
    """Twin of :func:`..operators.dedup.line_census` over the planted
    multi-line fixture: trimmed non-empty lines appearing in >=
    ``min_docs`` distinct documents, with doc- and occurrence-counts."""
    return f"""
WITH {_LINE_PLANT_CTE},
lines AS (
  SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS line_norm
  FROM planted
)
SELECT line_norm,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences
FROM lines WHERE line_norm <> ''
GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_docs}
"""


def text_line_dedup_sql(min_docs: int = 2) -> str:
    """Twin of :func:`..operators.dedup.line_dedup`: strip census lines
    plus whitespace-only lines, reassemble surviving lines in original
    order; every document keeps a row (empty string when nothing
    survives)."""
    return f"""
WITH {_LINE_PLANT_CTE},
lines AS (
  SELECT doc_id,
         CAST(generate_subscripts(l, 1) AS BIGINT) AS pos,
         unnest(l) AS line,
         trim(unnest(l)) AS line_norm
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM planted)
),
freq AS (
  SELECT line_norm FROM lines WHERE line_norm <> ''
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_docs}
),
kept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text_filtered
  FROM lines
  WHERE line_norm <> '' AND line_norm NOT IN (SELECT line_norm FROM freq)
  GROUP BY doc_id
),
base AS (
  SELECT doc_id, CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines
  FROM planted
)
SELECT b.doc_id, b.n_lines,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(k.text_filtered, '') AS text_filtered
FROM base b LEFT JOIN kept k USING (doc_id)
"""


def text_kn_logprob_sql(discount: float = 0.75) -> str:
    """Twin of :func:`..operators.text_analysis.kn_logprob_scores`:
    interpolated Kneser-Ney bigram conditionals — absolute discount,
    continuation-count backoff, identical literal operand order."""
    d = float(discount)
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos, unnest(w) AS word
  FROM ws
),
bg AS (
  SELECT a.doc_id, a.word AS w1, b.word AS w2
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1f FROM bc GROUP BY w1),
cont AS (SELECT w2, count(*) AS n1r FROM bc GROUP BY w2),
t AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM bc),
lp AS (
  SELECT bc.w1, bc.w2,
         ln((greatest(c12 - {d}, 0.0) + {d} * n1f * n1r / n_types) / c1) AS l
  FROM bc JOIN ctx USING (w1) JOIN cont USING (w2), t
)
SELECT doc_id, count(*) AS n_bigrams, round(avg(l), 4) AS avg_logprob_kn
FROM bg JOIN lp USING (w1, w2)
GROUP BY doc_id
"""


def text_ppl_buckets_sql(n_buckets: int = 3, discount: float = 0.75) -> str:
    """Twin of :func:`..operators.text_analysis.ppl_buckets`: the
    Kneser-Ney per-doc chain of :func:`text_kn_logprob_sql`, joined
    back to each document's source, equal-count ntile per source over
    the total (score DESC, doc_id ASC) order, head/middle/tail band."""
    d = float(discount)
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos, unnest(w) AS word
  FROM ws
),
bg AS (
  SELECT a.doc_id, a.word AS w1, b.word AS w2
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1f FROM bc GROUP BY w1),
cont AS (SELECT w2, count(*) AS n1r FROM bc GROUP BY w2),
t AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM bc),
lp AS (
  SELECT bc.w1, bc.w2,
         ln((greatest(c12 - {d}, 0.0) + {d} * n1f * n1r / n_types) / c1) AS l
  FROM bc JOIN ctx USING (w1) JOIN cont USING (w2), t
),
sc AS (
  SELECT doc_id, round(avg(l), 4) AS avg_logprob_kn
  FROM bg JOIN lp USING (w1, w2)
  GROUP BY doc_id
),
bkt AS (
  SELECT sc.doc_id, d.source, sc.avg_logprob_kn,
         CAST(ntile({n_buckets}) OVER (PARTITION BY d.source
             ORDER BY sc.avg_logprob_kn DESC, sc.doc_id) AS BIGINT) AS bucket
  FROM sc JOIN documents d USING (doc_id)
)
SELECT doc_id, source, avg_logprob_kn, bucket,
       CASE WHEN bucket = 1 THEN 'head'
            WHEN bucket = {n_buckets} THEN 'tail'
            ELSE 'middle' END AS band
FROM bkt
"""


def _vocab_curve_cte(interval: int) -> str:
    """Shared curve CTE chain for the vocab-growth twins."""
    return f"""words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
fd AS (SELECT w, min(doc_id) AS fdoc FROM words GROUP BY w),
nb AS (SELECT CAST(floor(fdoc / {interval}) AS BIGINT) AS bucket,
              count(*) AS nw FROM fd GROUP BY 1),
pb AS (
  SELECT CAST(floor(doc_id / {interval}) AS BIGINT) AS bucket,
         count(*) AS nd, sum(len(string_split(text, ' '))) AS nt
  FROM documents GROUP BY 1
),
curve AS (
  SELECT pb.bucket,
         CAST(sum(nd) OVER win AS BIGINT) AS docs_cum,
         CAST(sum(nt) OVER win AS BIGINT) AS tokens_cum,
         CAST(sum(coalesce(nw, 0)) OVER win AS BIGINT) AS vocab_cum
  FROM pb LEFT JOIN nb USING (bucket)
  WINDOW win AS (ORDER BY pb.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)"""


def vocab_growth_curve_sql(interval: int = 10) -> str:
    """Twin of :func:`..operators.text_analysis.vocab_growth_curve` —
    integer-exact cumulative docs/tokens/vocabulary per id block."""
    return f"""
WITH {_vocab_curve_cte(interval)}
SELECT bucket, docs_cum, tokens_cum, vocab_cum FROM curve
"""


def vocab_heaps_fit_sql(interval: int = 10) -> str:
    """Twin of :func:`..operators.text_analysis.vocab_heaps_fit` —
    closed-form log-log OLS over the curve points."""
    return f"""
WITH {_vocab_curve_cte(interval)},
pts AS (
  SELECT ln(CAST(tokens_cum AS DOUBLE)) AS x,
         ln(CAST(vocab_cum AS DOUBLE)) AS y
  FROM curve
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_points,
         avg(x) AS mx, avg(y) AS my,
         avg(x * x) AS mxx, avg(y * y) AS myy, avg(x * y) AS mxy
  FROM pts
)
SELECT n_points,
       round((mxy - mx * my) / (mxx - mx * mx) + 1e-9, 6) AS beta,
       round(my - (mxy - mx * my) / (mxx - mx * mx) * mx + 1e-9, 6) AS log_k,
       round((mxy - mx * my) * (mxy - mx * my)
             / ((mxx - mx * mx) * (myy - my * my)) + 1e-9, 6) AS r2
FROM agg
"""


