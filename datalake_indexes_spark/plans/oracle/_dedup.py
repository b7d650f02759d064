"""Corpus deduplication / decontamination oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec


def _shingle_cte(n: int = 3) -> str:
    """Distinct word n-gram shingles per document (twin of
    operators/dedup.py word_shingles)."""
    gram = " || ' ' || ".join(f"w[CAST(i+{j+1} AS INT)]" for j in range(n))
    return f"""__words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM __words, UNNEST(range(greatest(len(w)-{n - 1}, 0))) AS t(i)
)"""


def dedup_exact_sql() -> str:
    return """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS group_size
FROM documents GROUP BY md5(text)
"""


def _jaccard_ctes() -> str:
    return """sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_id_1, c.doc_id_2, count(*) AS i
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_id_1
  JOIN sh s2 ON s2.doc_id = c.doc_id_2 AND s2.shingle = s1.shingle
  GROUP BY 1, 2
)"""


def _jaccard_select(threshold: float) -> str:
    return f"""SELECT i.doc_id_1, i.doc_id_2,
       round(i.i * 1.0 / (n1.n + n2.n - i.i), 4) AS jaccard
FROM inter i
JOIN sizes n1 ON n1.doc_id = i.doc_id_1
JOIN sizes n2 ON n2.doc_id = i.doc_id_2
WHERE i.i * 1.0 / (n1.n + n2.n - i.i) >= {threshold}"""


def _minhash_pairs_ctes(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    """CTE chain ending in ``pairs(doc_id_1, doc_id_2, jaccard)`` — shared
    by the pair query and the cluster query."""
    rows = k // bands
    mins = ", ".join(f"min(md5('{j}:' || shingle)) AS mh{j}" for j in range(k))
    band_sel = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM mh".format(
            b=b, key=" || ".join(f"mh{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    return f"""{_shingle_cte()},
mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
{_jaccard_ctes()},
pairs AS (
{_jaccard_select(threshold)}
)"""


def dedup_minhash_lsh_sql(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    return f"""
WITH {_minhash_pairs_ctes(k, bands, threshold)}
SELECT doc_id_1, doc_id_2, jaccard FROM pairs
"""


def dedup_neardup_est_sql(k: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    """Twin of the streaming near-dup semantics (neardup_pairs_est):
    band-collision candidates verified by the SIGNATURE-estimated Jaccard
    (fraction of agreeing minhash components) — what the stream computes
    against its persisted signature store instead of re-shingling
    history."""
    rows = k // bands
    mins = ", ".join(f"min(md5('{j}:' || shingle)) AS mh{j}" for j in range(k))
    band_sel = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM mh".format(
            b=b, key=" || ".join(f"mh{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN x.mh{j} = y.mh{j} THEN 1 ELSE 0 END" for j in range(k)
    )
    return f"""
WITH {_shingle_cte()},
mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_id_1, c.doc_id_2,
       round(({agree}) * 1.0 / {k}, 4) AS est_jaccard
FROM cand c
JOIN mh x ON x.doc_id = c.doc_id_1
JOIN mh y ON y.doc_id = c.doc_id_2
WHERE ({agree}) * 1.0 / {k} >= {threshold}
"""


def dedup_ngram_jaccard_sql(threshold: float = 0.7) -> str:
    return f"""
WITH {_shingle_cte()},
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
),
{_jaccard_ctes()}
{_jaccard_select(threshold)}
"""


def dedup_ngram_capped_sql(threshold: float = 0.7, max_freq: int = 50) -> str:
    """Twin of the hot-shingle-capped path: candidates only from shingles
    with document frequency <= max_freq; verification (and the reported
    jaccard) over the FULL shingle sets."""
    return f"""
WITH {_shingle_cte()},
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_freq}
),
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  WHERE s1.shingle IN (SELECT shingle FROM rare)
),
{_jaccard_ctes()}
{_jaccard_select(threshold)}
"""


def dedup_recall_report_sql(threshold: float = 0.7) -> str:
    """Twin of :func:`..operators.dedup.dedup_recall_report`: minhash
    pairs from the shared CTE chain, truth from an independent exact
    shingle self-join, one recall row."""
    return f"""
WITH {_minhash_pairs_ctes(threshold=threshold)},
t_inter AS (
  SELECT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2, count(*) AS i
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_id_1, i.doc_id_2
  FROM t_inter i
  JOIN sizes n1 ON n1.doc_id = i.doc_id_1
  JOIN sizes n2 ON n2.doc_id = i.doc_id_2
  WHERE i.i * 1.0 / (n1.n + n2.n - i.i) >= {threshold}
),
found AS (
  SELECT count(*) AS n_found FROM truth JOIN pairs USING (doc_id_1, doc_id_2)
),
tot AS (SELECT count(*) AS n_truth FROM truth)
SELECT {threshold} AS threshold,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_found AS BIGINT) AS n_found,
       CASE WHEN n_truth > 0 THEN round(n_found * 1.0 / n_truth, 6)
            ELSE 1.0 END AS recall
FROM tot CROSS JOIN found
"""


def dedup_containment_sql(threshold: float = 0.8, max_freq: int = 500) -> str:
    """Twin of :func:`..operators.dedup.ngram_containment_pairs`:
    capped-shingle candidate generation, FULL-set verification, pair kept
    when either directional containment clears the threshold."""
    return f"""
WITH {_shingle_cte()},
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_freq}
),
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  WHERE s1.shingle IN (SELECT shingle FROM rare)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_id_1, c.doc_id_2, count(*) AS i
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_id_1
  JOIN sh s2 ON s2.doc_id = c.doc_id_2 AND s2.shingle = s1.shingle
  GROUP BY 1, 2
)
SELECT i.doc_id_1, i.doc_id_2,
       round(i.i * 1.0 / n1.n, 4) AS containment_1_in_2,
       round(i.i * 1.0 / n2.n, 4) AS containment_2_in_1,
       round(i.i * 1.0 / (n1.n + n2.n - i.i), 4) AS jaccard
FROM inter i
JOIN sizes n1 ON n1.doc_id = i.doc_id_1
JOIN sizes n2 ON n2.doc_id = i.doc_id_2
WHERE i.i * 1.0 / n1.n >= {threshold} OR i.i * 1.0 / n2.n >= {threshold}
"""


def dedup_subset_sql(threshold: float = 0.8, max_freq: int = 500) -> str:
    """Twin of :func:`..operators.dedup.subset_dedup`: containment pairs
    → directed contained-in-larger edges → smallest qualifying container
    per dropped doc; kept docs have no container."""
    return f"""
WITH {_shingle_cte()},
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_freq}
),
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  WHERE s1.shingle IN (SELECT shingle FROM rare)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_id_1, c.doc_id_2, count(*) AS i
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_id_1
  JOIN sh s2 ON s2.doc_id = c.doc_id_2 AND s2.shingle = s1.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_id_1, i.doc_id_2, i.i, n1.n AS n1, n2.n AS n2
  FROM inter i
  JOIN sizes n1 ON n1.doc_id = i.doc_id_1
  JOIN sizes n2 ON n2.doc_id = i.doc_id_2
),
edges AS (
  SELECT doc_id_1 AS x, doc_id_2 AS y, n1 AS nx, n2 AS ny FROM pairs
  WHERE i * 1.0 / n1 >= {threshold}
  UNION ALL
  SELECT doc_id_2, doc_id_1, n2, n1 FROM pairs
  WHERE i * 1.0 / n2 >= {threshold}
),
containers AS (
  SELECT x AS doc_id, min(y) AS container_id FROM edges
  WHERE ny > nx OR (ny = nx AND y < x) GROUP BY x
)
SELECT d.doc_id, coalesce(s.n, 0) AS n_shingles,
       c.container_id IS NULL AS kept,
       coalesce(c.container_id, -1) AS container_id
FROM documents d
LEFT JOIN sizes s ON s.doc_id = d.doc_id
LEFT JOIN containers c ON c.doc_id = d.doc_id
"""


def dedup_clusters_sql(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    """Near-dup retention clusters over the MinHash pairs: connected
    components via a recursive transitive-closure CTE (cluster sizes are
    bounded by near-dup group sizes, so the closure stays tiny)."""
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
)
SELECT node AS doc_id, least(node, min(r)) AS representative
FROM reach GROUP BY node
"""


def _simhash_cte(bits: int = 64) -> str:
    sums = ", ".join(
        f"sum(tf * (2 * (((strpos('0123456789abcdef', substr(h, {i // 4 + 1}, 1)) - 1 "
        f">> {i % 4}) & 1)) - 1)) AS v{i}"
        for i in range(bits)
    )
    bit_concat = " || ".join(
        f"(CASE WHEN v{i} > 0 THEN '1' ELSE '0' END)" for i in range(bits)
    )
    return f"""__tf AS (
  SELECT doc_id, word, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1, 2
),
__wb AS (SELECT doc_id, tf, md5(word) AS h FROM __tf),
__sums AS (SELECT doc_id, {sums} FROM __wb GROUP BY doc_id),
sig AS (SELECT doc_id, {bit_concat} AS simhash FROM __sums)"""


def dedup_simhash_sql(max_hamming: int = 8, bands: int = 4) -> str:
    band_len = 64 // bands
    band_sel = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, substr(simhash, {b * band_len + 1}, {band_len}) AS key FROM sig"
        for b in range(bands)
    )
    return f"""
WITH {_simhash_cte()},
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_id_1, doc_id_2,
       CAST(bit_count(xor(sa::BIT, sb::BIT)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sa::BIT, sb::BIT)) <= {max_hamming}
"""


def dedup_source_matrix_sql(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    """Source-matrix twin over the same MinHash pair CTEs."""
    return f"""
WITH {_minhash_pairs_ctes(k, bands, threshold)},
src AS (SELECT doc_id, source FROM documents),
sized AS (SELECT source, count(*) AS n FROM src GROUP BY 1),
tagged AS (
  SELECT least(s1.source, s2.source) AS source_a,
         greatest(s1.source, s2.source) AS source_b
  FROM pairs p
  JOIN src s1 ON s1.doc_id = p.doc_id_1
  JOIN src s2 ON s2.doc_id = p.doc_id_2
),
counts AS (
  SELECT source_a, source_b, count(*) AS n_pairs FROM tagged GROUP BY 1, 2
)
SELECT source_a, source_b, n_pairs,
       na.n AS n_docs_a, nb.n AS n_docs_b,
       round(n_pairs / (CASE WHEN source_a = source_b
                             THEN na.n * (na.n - 1) / 2.0
                             ELSE CAST(na.n AS DOUBLE) * nb.n END), 6) AS dup_rate
FROM counts
JOIN sized na ON na.source = counts.source_a
JOIN sized nb ON nb.source = counts.source_b
"""


def dedup_embedding_cosine_sql(threshold: float = 0.4, n_planes: int = 4) -> str:
    """Oracle for the LSH-blocked cosine dedup.  Replicates the *same*
    hyperplane blocking (identical md5-seeded planes inlined as literals),
    so Spark and DuckDB agree pair-for-pair on the approximate result —
    the approximation itself is the operator's contract, not a looseness
    in the check."""
    from datalake_indexes_spark.operators.similarity import hyperplanes

    planes = hyperplanes(64, n_planes)
    sig_bits = " || ".join(
        "(CASE WHEN list_dot_product(e::DOUBLE[], {arr}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)".format(
            arr="[" + ", ".join(repr(w) for w in plane) + "]"
        )
        for plane in planes
    )
    return f"""
WITH u AS (SELECT vec_id, embedding AS e, {sig_bits} AS sig FROM embeddings)
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       round(list_cosine_similarity(a.e::DOUBLE[], b.e::DOUBLE[]), 4) AS cosine
FROM u a JOIN u b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e::DOUBLE[], b.e::DOUBLE[]) >= {threshold}
"""


def decontaminate_sql(n: int = 5, min_overlap: int = 3, modulus: int = 17) -> str:
    """Decontamination twin: doc_id % modulus == 0 rows are the benchmark,
    the rest are the graded corpus; distinct word n-gram overlap."""
    gram = " || ' ' || ".join(f"w[CAST(i+{j + 1} AS INT)]" for j in range(n))
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % {modulus} <> 0),
bench AS (SELECT text FROM documents WHERE doc_id % {modulus} = 0),
cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
csh AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM cw, UNNEST(range(greatest(len(w) - {n - 1}, 0))) AS t(i)
),
bw AS (SELECT string_split(text, ' ') AS w FROM bench),
bsh AS (
  SELECT DISTINCT {gram} AS shingle
  FROM bw, UNNEST(range(greatest(len(w) - {n - 1}, 0))) AS t(i)
),
counts AS (SELECT doc_id, count(*) AS n_shingles FROM csh GROUP BY doc_id),
overl AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM csh WHERE shingle IN (SELECT shingle FROM bsh)
  GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(coalesce(n.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(CASE WHEN coalesce(n.n_shingles, 0) > 0
                  THEN coalesce(o.n_overlap, 0) / n.n_shingles
                  ELSE 0 END, 4) AS overlap_frac,
       coalesce(o.n_overlap, 0) >= {min_overlap} AS contaminated
FROM corpus c
LEFT JOIN counts n USING (doc_id)
LEFT JOIN overl o USING (doc_id)
"""


def semantic_dedup_sql(n_centroids: int = 16, threshold: float = 0.4) -> str:
    """SemDeDup twin: same deterministic seed centroids and
    keep-lowest-id-within-cluster rule."""
    return f"""
WITH cents AS (
  SELECT vec_id AS centroid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {n_centroids}
),
assign AS (
  SELECT vec_id, centroid, e FROM (
    SELECT e.vec_id, c.centroid, e.embedding::DOUBLE[] AS e,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
                      c.centroid) AS rk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rk = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b
    ON a.centroid = b.centroid AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.e, b.e) >= {threshold}
)
SELECT a.vec_id, a.centroid,
       a.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
FROM assign a
"""


def dedup_embedding_multiprobe_sql(
    threshold: float = 0.4, n_tables: int = 4, n_planes: int = 6, dim: int = 64
) -> str:
    """OR-amplified LSH twin: the same per-table md5-seeded hyperplanes
    inlined as literals; a pair qualifies on collision in ANY table."""
    from datalake_indexes_spark.operators.similarity import hyperplanes

    sig_exprs = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=f"simsearch:{t}")
        bits = " || ".join(
            "(CASE WHEN list_dot_product(e::DOUBLE[], {arr}::DOUBLE[]) >= 0 "
            "THEN '1' ELSE '0' END)".format(
                arr="[" + ", ".join(repr(w) for w in plane) + "]"
            )
            for plane in planes
        )
        sig_exprs.append(f"{bits} AS s{t}")
    any_collide = " OR ".join(f"a.s{t} = b.s{t}" for t in range(n_tables))
    return f"""
WITH u AS (SELECT vec_id, embedding AS e, {", ".join(sig_exprs)} FROM embeddings),
cand AS (
  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         a.e AS ea, b.e AS eb
  FROM u a JOIN u b ON a.vec_id < b.vec_id AND ({any_collide})
)
SELECT vec_id_1, vec_id_2,
       round(list_cosine_similarity(ea::DOUBLE[], eb::DOUBLE[]), 4) AS cosine
FROM cand
WHERE list_cosine_similarity(ea::DOUBLE[], eb::DOUBLE[]) >= {threshold}
"""


def dedup_keep_best_sql(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    """Quality-aware retention twin: the recursive-closure clusters with
    the quality formula joined on, best-per-cluster by (score desc, id)."""
    from datalake_indexes_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
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
)
SELECT c.doc_id, c.cluster, q.quality_score,
       (row_number() OVER (PARTITION BY c.cluster
          ORDER BY q.quality_score DESC, c.doc_id) = 1) AS kept
FROM clus c JOIN q USING (doc_id)
"""


def dedup_chunks_sql(chunk_words: int = 4, min_doc_freq: int = 2) -> str:
    """Twin of :func:`..operators.dedup.chunk_dedup` — cross-document
    exact chunk (pseudo-line) dedup with in-order reassembly."""
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos, unnest(w) AS word
  FROM ws
),
chunks AS (
  SELECT doc_id, (pos - 1) // {chunk_words} AS cid,
         string_agg(word, ' ' ORDER BY pos) AS chunk
  FROM words GROUP BY doc_id, (pos - 1) // {chunk_words}
),
freq AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk),
kept AS (
  SELECT c.doc_id, c.cid, c.chunk FROM chunks c
  WHERE c.chunk NOT IN (SELECT chunk FROM freq WHERE df >= {min_doc_freq})
),
totals AS (SELECT doc_id, count(*) AS total FROM chunks GROUP BY doc_id)
SELECT k.doc_id,
       string_agg(k.chunk, ' ' ORDER BY k.cid) AS text_clean,
       count(*) AS kept_chunks,
       any_value(t.total) - count(*) AS dropped_chunks
FROM kept k JOIN totals t USING (doc_id)
GROUP BY k.doc_id
"""


def dedup_repeated_spans_sql(
    span: str, k: int = 5, min_words: int = 10, max_gram_freq: int = 100,
    modulus: int = 7,
) -> str:
    """Twin of :func:`..operators.dedup.repeated_spans` over the
    planted-span fixture (gram equality on the joined string; the engine
    joins on xxhash64 of the same string — identical modulo a ~2^-64
    collision)."""
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = 0
              THEN text || ' ' || '{span}' ELSE text END AS text
  FROM documents
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM planted
),
gpos AS (
  SELECT doc_id, ws,
         unnest(range(0, greatest(len(ws) - {k} + 1, 0))) AS pos
  FROM w WHERE len(ws) >= {k}
),
g AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ws, pos + 1, pos + {k}), chr(1)) AS gram
  FROM gpos
),
rare AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram
  ) WHERE df <= {max_gram_freq}
),
g2 AS (SELECT g.doc_id, g.pos, g.gram FROM g JOIN rare USING (gram)),
hits AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1,
         a.pos - b.pos AS diag
  FROM g2 a JOIN g2 b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
r AS (
  SELECT *,
         CASE WHEN p1 - lag(p1) OVER win IS NULL
                   OR p1 - lag(p1) OVER win > 1
              THEN 1 ELSE 0 END AS nb
  FROM hits
  WINDOW win AS (PARTITION BY d1, d2, diag ORDER BY p1)
),
rr AS (
  SELECT *, sum(nb) OVER (PARTITION BY d1, d2, diag ORDER BY p1
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM r
)
SELECT d1 AS doc_id_1, d2 AS doc_id_2,
       CAST(min(p1) AS INT) AS start_1,
       CAST(min(p1) - diag AS INT) AS start_2,
       CAST(max(p1) - min(p1) + {k} AS BIGINT) AS n_words
FROM rr GROUP BY d1, d2, diag, run
HAVING max(p1) - min(p1) + {k} >= {min_words}
"""


def dedup_span_removal_sql(
    span: str, k: int = 5, min_words: int = 10, max_gram_freq: int = 100,
    modulus: int = 7,
) -> str:
    """Twin of :func:`..operators.dedup.remove_repeated_spans` composed
    over the span-detection twin (z[1]/z[2] = zipped word/index)."""
    spans_sql = dedup_repeated_spans_sql(
        span, k=k, min_words=min_words, max_gram_freq=max_gram_freq,
        modulus=modulus,
    )
    return f"""
WITH spans AS ({spans_sql}),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = 0
              THEN text || ' ' || '{span}' ELSE text END AS text
  FROM documents
),
iv AS (
  SELECT doc_id_2 AS doc_id,
         start_2 AS s, start_2 + n_words AS e
  FROM spans
),
per_doc AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS ivs FROM iv GROUP BY doc_id
),
w AS (
  SELECT p.doc_id,
         list_filter(string_split_regex(p.text, '\\s+'), x -> x <> '') AS ws,
         coalesce(per_doc.ivs, []) AS ivs
  FROM planted p LEFT JOIN per_doc USING (doc_id)
),
cut AS (
  SELECT doc_id, ws, ivs,
         list_transform(
           list_filter(
             list_zip(ws, range(0, len(ws))),
             z -> len(list_filter(ivs, v -> z[2] >= v.s AND z[2] < v.e)) = 0
           ),
           z -> z[1]
         ) AS kept
  FROM w
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words_before,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_words_removed,
       coalesce(array_to_string(kept, ' '), '') AS text_cleaned
FROM cut
"""


def dedup_cross_spans_sql(
    q1: str, q2: str, k: int = 5, min_words: int = 10,
    max_ref_gram_freq: int = 100,
) -> str:
    """Twin of :func:`..operators.dedup.cross_repeated_spans` over the
    benchmark-contamination fixture (Q1 suffixed on doc_id%7==0, Q2
    prefixed on doc_id%11==3; reference = the two sentences, Q1 behind a
    nonsense 3-word header so start_ref > 0 is exercised)."""
    return f"""
WITH reference AS (
  SELECT CAST(0 AS BIGINT) AS ref_id, 'xqa xqb xqc {q1}' AS text
  UNION ALL SELECT CAST(1 AS BIGINT), '{q2}'
),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 3 THEN '{q2}' || ' ' || t1 ELSE t1 END AS text
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN text || ' ' || '{q1}' ELSE text END AS t1
    FROM documents
  )
),
wd AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM planted
),
wr AS (
  SELECT ref_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM reference
),
gd AS (
  SELECT doc_id,
         unnest(range(0, greatest(len(ws) - {k} + 1, 0))) AS pos, ws
  FROM wd WHERE len(ws) >= {k}
),
gd2 AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ws, pos + 1, pos + {k}), chr(1)) AS gram
  FROM gd
),
gr AS (
  SELECT ref_id,
         unnest(range(0, greatest(len(ws) - {k} + 1, 0))) AS pos, ws
  FROM wr WHERE len(ws) >= {k}
),
gr2 AS (
  SELECT ref_id, pos,
         array_to_string(list_slice(ws, pos + 1, pos + {k}), chr(1)) AS gram
  FROM gr
),
rare AS (
  SELECT gram FROM (
    SELECT gram, count(*) AS n FROM gr2 GROUP BY gram
  ) WHERE n <= {max_ref_gram_freq}
),
gr3 AS (SELECT gr2.* FROM gr2 JOIN rare USING (gram)),
hits AS (
  SELECT DISTINCT d.doc_id, r.ref_id, d.pos AS p1, d.pos - r.pos AS diag
  FROM gd2 d JOIN gr3 r ON d.gram = r.gram
),
rn AS (
  SELECT *,
         CASE WHEN p1 - lag(p1) OVER win IS NULL
                   OR p1 - lag(p1) OVER win > 1
              THEN 1 ELSE 0 END AS nb
  FROM hits
  WINDOW win AS (PARTITION BY doc_id, ref_id, diag ORDER BY p1)
),
rr AS (
  SELECT *, sum(nb) OVER (PARTITION BY doc_id, ref_id, diag ORDER BY p1
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM rn
)
SELECT doc_id, ref_id,
       CAST(min(p1) AS INT) AS start_doc,
       CAST(min(p1) - diag AS INT) AS start_ref,
       CAST(max(p1) - min(p1) + {k} AS BIGINT) AS n_words
FROM rr GROUP BY doc_id, ref_id, diag, run
HAVING max(p1) - min(p1) + {k} >= {min_words}
"""


def decontaminate_spans_sql(
    q1: str, q2: str, k: int = 5, min_words: int = 10,
    max_ref_gram_freq: int = 100,
) -> str:
    """Twin of :func:`..operators.dedup.decontaminate_spans` composed
    over the cross-span twin (cut on the DOC side, no canonical
    survival)."""
    spans_sql = dedup_cross_spans_sql(
        q1, q2, k=k, min_words=min_words, max_ref_gram_freq=max_ref_gram_freq,
    )
    return f"""
WITH spans AS ({spans_sql}),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 3 THEN '{q2}' || ' ' || t1 ELSE t1 END AS text
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN text || ' ' || '{q1}' ELSE text END AS t1
    FROM documents
  )
),
iv AS (
  SELECT doc_id, start_doc AS s, start_doc + n_words AS e FROM spans
),
per_doc AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS ivs FROM iv GROUP BY doc_id
),
w AS (
  SELECT p.doc_id,
         list_filter(string_split_regex(p.text, '\\s+'), x -> x <> '') AS ws,
         coalesce(per_doc.ivs, []) AS ivs
  FROM planted p LEFT JOIN per_doc USING (doc_id)
),
cut AS (
  SELECT doc_id, ws, ivs,
         list_transform(
           list_filter(
             list_zip(ws, range(0, len(ws))),
             z -> len(list_filter(ivs, v -> z[2] >= v.s AND z[2] < v.e)) = 0
           ),
           z -> z[1]
         ) AS kept
  FROM w
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words_before,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_words_removed,
       coalesce(array_to_string(kept, ' '), '') AS text_cleaned
FROM cut
"""


def dedup_self_spans_sql(
    sent: str, k: int = 5, min_words: int = 10, max_gram_occ: int = 50,
    modulus: int = 13, residue: int = 5,
) -> str:
    """Twin of :func:`..operators.dedup.self_repeated_spans` over the
    twice-appended-sentence fixture (gram equality on the joined string,
    occurrence cap per (doc, gram) as a window count)."""
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = {residue}
              THEN text || ' ' || '{sent}' || ' zzfill ' || '{sent}'
              ELSE text END AS text
  FROM documents
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM planted
),
gpos AS (
  SELECT doc_id, ws,
         unnest(range(0, greatest(len(ws) - {k} + 1, 0))) AS pos
  FROM w WHERE len(ws) >= {k}
),
g AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ws, pos + 1, pos + {k}), chr(1)) AS gram
  FROM gpos
),
g2 AS (
  SELECT doc_id, pos, gram FROM (
    SELECT *, count(*) OVER (PARTITION BY doc_id, gram) AS occ FROM g
  ) WHERE occ <= {max_gram_occ}
),
hits AS (
  SELECT DISTINCT a.doc_id, a.pos AS p1, a.pos - b.pos AS diag
  FROM g2 a JOIN g2 b
    ON a.doc_id = b.doc_id AND a.gram = b.gram AND a.pos < b.pos
),
rn AS (
  SELECT *,
         CASE WHEN p1 - lag(p1) OVER win IS NULL
                   OR p1 - lag(p1) OVER win > 1
              THEN 1 ELSE 0 END AS nb
  FROM hits
  WINDOW win AS (PARTITION BY doc_id, diag ORDER BY p1)
),
rr AS (
  SELECT *, sum(nb) OVER (PARTITION BY doc_id, diag ORDER BY p1
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM rn
)
SELECT doc_id,
       CAST(min(p1) AS INT) AS start_1,
       CAST(min(p1) - diag AS INT) AS start_2,
       CAST(max(p1) - min(p1) + {k} AS BIGINT) AS n_words
FROM rr GROUP BY doc_id, diag, run
HAVING max(p1) - min(p1) + {k} >= {min_words}
"""


def dedup_self_removal_sql(
    sent: str, k: int = 5, min_words: int = 10, max_gram_occ: int = 50,
    modulus: int = 13, residue: int = 5,
) -> str:
    """Twin of :func:`..operators.dedup.remove_self_repetitions`
    composed over the self-span twin (cut the start_2 side)."""
    spans_sql = dedup_self_spans_sql(
        sent, k=k, min_words=min_words, max_gram_occ=max_gram_occ,
        modulus=modulus, residue=residue,
    )
    return f"""
WITH spans AS ({spans_sql}),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = {residue}
              THEN text || ' ' || '{sent}' || ' zzfill ' || '{sent}'
              ELSE text END AS text
  FROM documents
),
iv AS (
  SELECT doc_id, start_2 AS s, start_2 + n_words AS e FROM spans
),
per_doc AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS ivs FROM iv GROUP BY doc_id
),
w AS (
  SELECT p.doc_id,
         list_filter(string_split_regex(p.text, '\\s+'), x -> x <> '') AS ws,
         coalesce(per_doc.ivs, []) AS ivs
  FROM planted p LEFT JOIN per_doc USING (doc_id)
),
cut AS (
  SELECT doc_id, ws, ivs,
         list_transform(
           list_filter(
             list_zip(ws, range(0, len(ws))),
             z -> len(list_filter(ivs, v -> z[2] >= v.s AND z[2] < v.e)) = 0
           ),
           z -> z[1]
         ) AS kept
  FROM w
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words_before,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_words_removed,
       coalesce(array_to_string(kept, ' '), '') AS text_cleaned
FROM cut
"""


def contamination_report_sql(
    q1: str, q2: str, k: int = 5, min_words: int = 10,
    max_ref_gram_freq: int = 100,
) -> str:
    """Twin of :func:`..operators.dedup.contamination_report` over the
    cross-span twin joined back to the documents' source column."""
    spans_sql = dedup_cross_spans_sql(
        q1, q2, k=k, min_words=min_words, max_ref_gram_freq=max_ref_gram_freq,
    )
    return f"""
WITH spans AS ({spans_sql})
SELECT d.source AS \"group\", s.ref_id,
       CAST(count(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(s.n_words) AS BIGINT) AS words_leaked
FROM spans s JOIN documents d ON s.doc_id = d.doc_id
GROUP BY d.source, s.ref_id
"""


_INCR_SPLIT_CTES = """hist AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
),
inc AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM hist WHERE doc_id % 7 = 1
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
hh AS (SELECT md5(text) AS content_hash FROM hist),
firsts AS (
  SELECT md5(text) AS content_hash, min(doc_id) AS doc_id,
         count(*) AS n_copies
  FROM inc GROUP BY 1
)"""


def dedup_incremental_sql() -> str:
    """Twin of :func:`..operators.dedup.incremental_new_docs` over the
    registry's planted history/increment split (history = doc_id%5<>0;
    increment = the %5==0 docs plus re-crawled history copies (%7==1,
    id+1e6) and within-increment copies (%10==0, id+2e6)).  The Bloom
    prefilter is exactness-transparent (verified positives, sound
    negatives), so the twin is the plain first-per-hash anti-join — the
    whole point of grading this key strictly."""
    return f"""
WITH {_INCR_SPLIT_CTES}
SELECT f.doc_id, f.content_hash, CAST(f.n_copies AS BIGINT) AS n_copies
FROM firsts f
LEFT JOIN (SELECT DISTINCT content_hash FROM hh) h USING (content_hash)
WHERE h.content_hash IS NULL
"""


def dedup_incremental_report_sql(k_hashes: int = 3, hex_len: int = 3) -> str:
    """Twin of :func:`..operators.dedup.incremental_dedup_report`: the
    position-set Bloom is replayed verbatim — k probe positions per hash
    are the first ``hex_len`` hex chars of md5('j:' || hash) (the same
    probe family as functions/hashes.py BloomFilter), membership is
    string-set membership, so the false-positive count is deterministic
    and engine-identical."""
    return f"""
WITH {_INCR_SPLIT_CTES},
hpos AS (
  SELECT DISTINCT substr(md5(CAST(j AS VARCHAR) || ':' || content_hash),
                         1, {hex_len}) AS p
  FROM hh, UNNEST(range({k_hashes})) AS t(j)
),
nprobe AS (
  SELECT f.content_hash,
         substr(md5(CAST(j AS VARCHAR) || ':' || f.content_hash),
                1, {hex_len}) AS p
  FROM firsts f, UNNEST(range({k_hashes})) AS t(j)
),
bf_new AS (
  SELECT DISTINCT content_hash FROM nprobe
  WHERE p NOT IN (SELECT p FROM hpos)
),
truly_dup AS (
  SELECT f.content_hash FROM firsts f
  JOIN (SELECT DISTINCT content_hash FROM hh) h USING (content_hash)
),
c AS (
  SELECT (SELECT count(*) FROM hh) AS n_history,
         (SELECT sum(n_copies) FROM firsts) AS n_increment,
         (SELECT count(*) FROM firsts) AS n_increment_distinct,
         (SELECT count(*) FROM bf_new) AS n_bf_new,
         (SELECT count(*) FROM truly_dup) AS n_history_dups
)
SELECT CAST(n_history AS BIGINT) AS n_history,
       CAST(n_increment AS BIGINT) AS n_increment,
       CAST(n_increment_distinct AS BIGINT) AS n_increment_distinct,
       CAST(n_increment - n_increment_distinct AS BIGINT) AS n_within_dups,
       CAST(n_bf_new AS BIGINT) AS n_bf_new,
       CAST(n_increment_distinct - n_bf_new AS BIGINT) AS n_bf_candidates,
       CAST(n_history_dups AS BIGINT) AS n_history_dups,
       CAST(n_increment_distinct - n_bf_new - n_history_dups AS BIGINT)
         AS n_bf_false_positives,
       CAST(n_increment_distinct - n_history_dups AS BIGINT) AS n_new,
       round(CAST(n_increment_distinct - n_bf_new - n_history_dups AS DOUBLE)
             / nullif(n_increment_distinct - n_history_dups, 0), 6) AS fp_rate
FROM c
"""


def dedup_threshold_sweep_sql(
    thresholds: tuple[float, ...] = (0.5, 0.6, 0.7, 0.8, 0.9), n: int = 3
) -> str:
    """Twin of :func:`..operators.dedup.pair_threshold_sweep` over the
    planted partial-overlap corpus (every %4==0 doc gains a truncated
    copy at 50/70/90% word length, cycling by (doc_id div 4) % 3 — so the
    curve actually bends).  Pair set = exact all-pairs jaccard at
    min(thresholds) with the UNROUNDED filter; census per threshold on
    the ROUNDED jaccard — identical boundary decisions in both engines."""
    ts = sorted(float(t) for t in thresholds)
    lo = ts[0]
    gram = " || ' ' || ".join(f"w[CAST(i+{j+1} AS INT)]" for j in range(n))
    vals = ", ".join(f"(CAST({t} AS DOUBLE))" for t in ts)
    return f"""
WITH docs_p AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         array_to_string(
           list_slice(string_split(text, ' '), 1,
             CAST(((5 + 2 * ((doc_id // 4) % 3))
                   * len(string_split(text, ' '))) // 10 AS INT)),
           ' ') AS text
  FROM documents WHERE doc_id % 4 = 0
),
__words AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs_p),
sh AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM __words, UNNEST(range(greatest(len(w)-{n - 1}, 0))) AS t(i)
),
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
),
{_jaccard_ctes()},
pairs AS (
{_jaccard_select(lo)}
),
ts(threshold) AS (VALUES {vals})
SELECT t.threshold,
       (SELECT CAST(count(*) AS BIGINT) FROM pairs p
        WHERE p.jaccard >= t.threshold) AS n_pairs,
       (SELECT CAST(count(DISTINCT u.d) AS BIGINT) FROM (
          SELECT doc_id_1 AS d, jaccard FROM pairs
          UNION ALL
          SELECT doc_id_2 AS d, jaccard FROM pairs) u
        WHERE u.jaccard >= t.threshold) AS n_docs
FROM ts t
"""


def dedup_incremental_neardup_sql(threshold: float = 0.7, n: int = 3) -> str:
    """Twin of :func:`..operators.dedup.prefix_jaccard_join_ab` over the
    planted history/increment split: plain all-pairs cross-corpus n-gram
    Jaccard (no prefix filter — its completeness is what the strict hash
    grades)."""
    gram = " || ' ' || ".join(f"w[CAST(i+{j+1} AS INT)]" for j in range(n))
    return f"""
WITH {_INCR_SPLIT_CTES},
wa AS (SELECT doc_id, string_split(text, ' ') AS w FROM inc),
sa AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM wa, UNNEST(range(greatest(len(w)-{n - 1}, 0))) AS t(i)
),
wb AS (SELECT doc_id, string_split(text, ' ') AS w FROM hist),
sb AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM wb, UNNEST(range(greatest(len(w)-{n - 1}, 0))) AS t(i)
),
cand AS (
  SELECT DISTINCT sa.doc_id AS doc_id_a, sb.doc_id AS doc_id_b
  FROM sa JOIN sb ON sa.shingle = sb.shingle
),
na AS (SELECT doc_id, count(*) AS n FROM sa GROUP BY doc_id),
nb AS (SELECT doc_id, count(*) AS n FROM sb GROUP BY doc_id),
i AS (
  SELECT c.doc_id_a, c.doc_id_b, count(*) AS o
  FROM cand c
  JOIN sa ON sa.doc_id = c.doc_id_a
  JOIN sb ON sb.doc_id = c.doc_id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.doc_id_a, i.doc_id_b,
       round(i.o * 1.0 / (na.n + nb.n - i.o), 4) AS jaccard
FROM i
JOIN na ON na.doc_id = i.doc_id_a
JOIN nb ON nb.doc_id = i.doc_id_b
WHERE i.o * 1.0 / (na.n + nb.n - i.o) >= {threshold}
"""


