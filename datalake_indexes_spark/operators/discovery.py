"""Inclusion-dependency discovery — which lake columns are (nearly)
contained in which others, by distinct-value overlap.

This is the schema-level discovery complement to MATE: MATE answers
"which tables join with MY input"; inclusion dependencies answer "which
column pairs across the WHOLE lake look like FK→PK edges" (the SPIDER /
many-IND-discovery problem, D3L/Aurum territory).  A ≼ B at containment
c means c of A's distinct values appear in B — candidate foreign keys,
candidate unionable columns, lineage hints.

Scale design: the self-join runs over PER-COLUMN DISTINCT tokens (each
token contributes at most (#columns containing it)² pairs, not
(#rows)²), and tokens present in more than ``max_token_cols`` columns
are dropped BEFORE the join — stopword-like tokens ("0", "yes", "")
appear in nearly every column, carry zero inclusion signal, and are
exactly the keys that would quadratically blow up the pair space at a
million-column lake.  The cap is the documented recall tradeoff (same
discipline as the hot-shingle cap in n-gram dedup); everything after it
is uniform: pair counting is a (colA, colB) aggregate with map-side
combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def inclusion_dependencies(
    index,
    min_distinct: int = 5,
    min_containment: float = 0.8,
    max_token_cols: int = 64,
) -> DataFrame:
    """(table_a, col_a, table_b, col_b, n_distinct_a, n_common,
    containment): ordered pairs of distinct columns where at least
    ``min_containment`` of A's distinct tokens also occur in B, A has at
    least ``min_distinct`` distinct tokens, and same-table pairs are
    excluded (intra-table dependencies are schema design, not
    discovery)."""
    dcells = (
        index.cells.select("table_id", "col_id", "tokenized")
        .distinct()
    )
    # token spread cap: stopword-ish tokens out before the pair join
    spread = dcells.groupBy("tokenized").agg(F.count(F.lit(1)).alias("__cols"))
    capped = dcells.join(
        spread.filter(F.col("__cols") <= max_token_cols).select("tokenized"),
        "tokenized",
    )
    # distinct counts over the SAME capped universe the pair counts use,
    # so containment is a true fraction (capped tokens neither count as
    # evidence nor dilute the denominator)
    col_counts = capped.groupBy("table_id", "col_id").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    a, b = capped.alias("a"), capped.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tokenized") == F.col("b.tokenized"))
            & (F.col("a.table_id") != F.col("b.table_id")),
        )
        .groupBy(
            F.col("a.table_id").alias("table_a"),
            F.col("a.col_id").alias("col_a"),
            F.col("b.table_id").alias("table_b"),
            F.col("b.col_id").alias("col_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    counts_a = col_counts.select(
        F.col("table_id").alias("table_a"),
        F.col("col_id").alias("col_a"),
        "n_distinct",
    )
    return (
        common.join(F.broadcast(counts_a), ["table_a", "col_a"])
        .filter(F.col("n_distinct") >= min_distinct)
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.col("n_distinct"), 4),
        )
        .filter(F.col("containment") >= min_containment)
        .select(
            "table_a",
            "col_a",
            "table_b",
            "col_b",
            F.col("n_distinct").alias("n_distinct_a"),
            "n_common",
            "containment",
        )
    )


def union_search(
    index,
    query_table_id: int,
    k: int = 10,
    min_distinct: int = 5,
    min_jaccard: float = 0.2,
    max_token_cols: int | None = 64,
) -> DataFrame:
    """Table-union search: rank lake tables by how unionable they are
    with ``query_table_id`` — the discovery question next to MATE's
    joinability ("which tables hold MORE ROWS like mine" vs "which
    tables join with mine").  Column alignment is value-based: two
    columns match by the Jaccard similarity of their capped distinct-
    token sets (the symmetric counterpart of
    :func:`inclusion_dependencies`' containment); a candidate table's
    score sums each query column's BEST match there.

    (table_id, n_matched_cols, score, rank) for the top-``k`` candidate
    tables; ties break on table_id.

    Scale shape: identical to inclusion discovery — per-column distinct
    tokens, spread-capped before the token equi-join, then uniform
    (query_col, lake_table, lake_col) aggregates.  The per-query-column
    max and per-table sum run over column-pair rows (schema-sized, not
    data-sized).

    ``max_token_cols=None`` disables the spread cap — the EXACT search
    whose token equi-join is quadratic in the hottest token's column
    spread; :func:`union_search_recall_report` is the meter that says
    what the cap costs against it."""
    dcells = index.cells.select("table_id", "col_id", "tokenized").distinct()
    if max_token_cols is None:
        capped = dcells
    else:
        spread = dcells.groupBy("tokenized").agg(
            F.count(F.lit(1)).alias("__cols")
        )
        capped = dcells.join(
            spread.filter(F.col("__cols") <= max_token_cols).select("tokenized"),
            "tokenized",
        )
    counts = capped.groupBy("table_id", "col_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    qcells = capped.filter(F.col("table_id") == query_table_id).select(
        F.col("col_id").alias("q_col"), "tokenized"
    )
    qcounts = counts.filter(F.col("table_id") == query_table_id).select(
        F.col("col_id").alias("q_col"), F.col("__n").alias("__qn")
    )
    common = (
        capped.filter(F.col("table_id") != query_table_id)
        .join(qcells, "tokenized")
        .groupBy("q_col", "table_id", "col_id")
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    pair_scores = (
        common.join(F.broadcast(qcounts), "q_col")
        .join(counts, ["table_id", "col_id"])
        .filter((F.col("__qn") >= min_distinct) & (F.col("__n") >= min_distinct))
        .withColumn(
            "__jac",
            F.col("__common") / (F.col("__qn") + F.col("__n") - F.col("__common")),
        )
        .filter(F.col("__jac") >= min_jaccard)
    )
    best = pair_scores.groupBy("q_col", "table_id").agg(
        F.max("__jac").alias("__best")
    )
    ranked = (
        best.groupBy("table_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched_cols"),
            F.round(F.sum("__best"), 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("table_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("table_id"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))


def union_search_recall_report(
    index,
    query_table_id: int,
    k: int = 10,
    min_distinct: int = 5,
    min_jaccard: float = 0.2,
    max_token_cols: int = 64,
) -> DataFrame:
    """Recall of the spread-capped union search against the EXACT
    (uncapped) search at the same k — the meter for the cap that bounds
    the token equi-join's quadratic term, the same contract
    :func:`..operators.dedup.dedup_recall_report` gives MinHash banding.
    One row: (k, max_token_cols, n_truth, n_found, recall) where truth
    is the uncapped top-k table set and found is its overlap with the
    capped top-k.  Unlike LSH banding the cap is not one-sided (removing
    a stopword-ish token changes Jaccard on both sides), so this meters
    set agreement, not subset recall.  Cost: the two searches (the
    uncapped one is the expensive side — run this as a gauge, not in
    the per-query path)."""
    truth = union_search(
        index, query_table_id, k=k, min_distinct=min_distinct,
        min_jaccard=min_jaccard, max_token_cols=None,
    ).select("table_id")
    capped = union_search(
        index, query_table_id, k=k, min_distinct=min_distinct,
        min_jaccard=min_jaccard, max_token_cols=max_token_cols,
    ).select("table_id")
    found = truth.join(capped, "table_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_found")
    )
    totals = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return totals.crossJoin(found).select(
        F.lit(int(k)).cast("long").alias("k"),
        F.lit(int(max_token_cols)).cast("long").alias("max_token_cols"),
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_found").cast("long").alias("n_found"),
        F.when(
            F.col("n_truth") > 0,
            F.round(F.col("n_found") / F.col("n_truth"), 6),
        )
        .otherwise(F.lit(1.0))
        .alias("recall"),
    )


def column_minhash_signatures(
    index, k: int = 32, max_token_cols: int = 64
) -> DataFrame:
    """Per-column k-value MinHash signature over the capped distinct-
    token set — the sketch that makes discovery sub-quadratic: Jaccard
    between two columns is estimated by signature agreement, so column
    similarity needs k small values per column instead of the columns'
    full token sets.  (table_id, col_id, sig array<string>, n_distinct).

    Same j-prefixed md5 family as document MinHash (deterministic,
    engine-independent); the spread cap removes stopword-ish tokens
    first, identical to the exact path, so estimates converge to the
    exact operator's Jaccard, not to a different target."""
    dcells = index.cells.select("table_id", "col_id", "tokenized").distinct()
    spread = dcells.groupBy("tokenized").agg(F.count(F.lit(1)).alias("__cols"))
    capped = dcells.join(
        spread.filter(F.col("__cols") <= max_token_cols).select("tokenized"),
        "tokenized",
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("tokenized")))).alias(f"__m{j}")
        for j in range(k)
    ] + [F.count(F.lit(1)).alias("n_distinct")]
    sigs = capped.groupBy("table_id", "col_id").agg(*aggs)
    return sigs.select(
        "table_id",
        "col_id",
        F.array(*[F.col(f"__m{j}") for j in range(k)]).alias("sig"),
        "n_distinct",
    )


def union_search_approx(
    index,
    query_table_id: int,
    k: int = 10,
    sig_k: int = 32,
    bands: int = 8,
    min_distinct: int = 5,
    min_jaccard: float = 0.2,
    max_token_cols: int = 64,
) -> DataFrame:
    """Sketch-based :func:`union_search` — the 100 TB path.

    The exact operator joins per-column distinct tokens against the
    query's tokens: cost grows with the lake's total distinct-cell
    count.  This variant compares k-value MinHash signatures instead —
    after the one-time signature build (an index-time artifact in a real
    deployment), candidate generation is an LSH band join on signature
    slices (columns sharing at least one of ``bands`` bands), and the
    Jaccard ESTIMATE is the match fraction of the two signatures.  Work
    scales with columns-sharing-a-band, never with cell count; recall
    follows the standard band-collision curve (1-(1-j^(k/b))^b).

    Same output shape as the exact operator with ``score`` summing
    estimated Jaccards — estimates converge to the exact scores as
    ``sig_k`` grows (pinned against the exact operator in tests)."""
    rows = sig_k // bands
    # one execution of the signature build: the band join references it
    # from both sides (and in a real deployment it is a persisted
    # index-time artifact, not recomputed per query)
    sigs = (
        column_minhash_signatures(index, k=sig_k, max_token_cols=max_token_cols)
        .filter(F.col("n_distinct") >= min_distinct)
        .localCheckpoint(eager=False)
    )
    banded = sigs.select(
        "table_id",
        "col_id",
        "sig",
        F.posexplode(
            F.array(*[
                F.concat_ws("|", F.slice("sig", b * rows + 1, rows))
                for b in range(bands)
            ])
        ).alias("band", "key"),
    )
    q = banded.filter(F.col("table_id") == query_table_id).select(
        F.col("col_id").alias("q_col"), F.col("sig").alias("q_sig"), "band", "key"
    )
    cand = (
        banded.filter(F.col("table_id") != query_table_id)
        .join(q, ["band", "key"])
        .select("q_col", "table_id", "col_id", "sig", "q_sig")
        .distinct()
    )
    est = cand.withColumn(
        "__jac",
        F.size(
            F.filter(
                F.arrays_zip("sig", "q_sig"), lambda s: s["sig"] == s["q_sig"]
            )
        )
        / F.lit(float(sig_k)),
    ).filter(F.col("__jac") >= min_jaccard)
    best = est.groupBy("q_col", "table_id").agg(F.max("__jac").alias("__best"))
    ranked = (
        best.groupBy("table_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched_cols"),
            F.round(F.sum("__best"), 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("table_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("table_id"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))


_INT_RE = "-?[0-9]+"
_DEC_RE = "-?[0-9]+\\.[0-9]+"
_DATE_RE = "[0-9]{4}-[0-9]{2}-[0-9]{2}( [0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?)?"


def semantic_types(df: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Semantic-type profiling of a raw table: for every column, the
    fraction of (non-null, stringified) values matching integer /
    decimal / ISO-date shapes, and the dominant type under ``threshold``
    (integer > decimal > date > text priority) — the schema-inference
    pass a discovery UI or an ingestion validator runs on untyped lake
    files (everything in a CSV lake arrives as strings; this recovers
    what the strings ARE).

    (col_name, n_values, frac_int, frac_dec, frac_date, sem_type).

    One scan: the row is unpivoted to (col_name, val) pairs map-side
    (schema-sized expansion) and a single aggregate computes every
    fraction with map-side combine; the regexes are anchored full-match
    native expressions — no UDFs."""
    pairs = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(c).cast("string").alias("val"),
            )
            for c in df.columns
        ])
    )
    long = df.select(pairs.alias("p")).select("p.col_name", "p.val").filter(
        F.col("val").isNotNull()
    )
    frac = lambda pat: F.round(  # noqa: E731
        F.avg(F.col("val").rlike(f"^{pat}$").cast("double")), 4
    )
    out = long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_values"),
        frac(_INT_RE).alias("frac_int"),
        frac(_DEC_RE).alias("frac_dec"),
        frac(_DATE_RE).alias("frac_date"),
    )
    sem = (
        F.when(F.col("frac_int") >= threshold, F.lit("integer"))
        .when(F.col("frac_dec") >= threshold, F.lit("decimal"))
        .when(F.col("frac_date") >= threshold, F.lit("date"))
        .otherwise(F.lit("text"))
    )
    return out.withColumn("sem_type", sem)


def domain_clusters(
    index,
    rounds: int = 8,
    min_distinct: int = 5,
    min_jaccard: float = 0.2,
    max_token_cols: int = 64,
) -> DataFrame:
    """Cluster lake tables into DOMAINS: tables whose columns share value
    vocabularies (Jaccard >= ``min_jaccard``) are connected, and each
    table is labeled with the smallest table_id reachable through such
    edges within ``rounds`` hops of min-label propagation — so a lake of
    orders-ish, customer-ish, logs-ish tables falls into its natural
    groups (the "which tables belong together" view a catalog UI leads
    with).  (table_id, domain).

    Contract: the label is exactly ``rounds`` synchronous min-label
    iterations over the similarity graph — deterministic and
    SQL-replicable (the oracle unrolls the identical iterations), and
    equal to true connected components whenever the graph's diameter is
    below ``rounds`` (the convergence case, asserted in tests; the
    large-star/small-star operator in :mod:`.graph` is the
    unbounded-diameter path).

    Scale shape: the pair scores reuse the capped-universe machinery;
    each propagation round is one edges ⋈ labels equi-join + min
    aggregate over TABLE-sized rows (schema-sized, not data-sized)."""
    pair_scores = (
        _column_pair_jaccards(index, min_distinct, max_token_cols)
        .filter(F.col("__jac") >= min_jaccard)
        .select("table_a", "table_b")
        .distinct()
    )
    # one execution of the pair pipeline: every propagation round joins
    # against these edges, so without the checkpoint the capped-universe
    # scan would re-run `rounds` times
    edges = (
        pair_scores.unionByName(
            pair_scores.select(
                F.col("table_b").alias("table_a"), F.col("table_a").alias("table_b")
            )
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = index.cells.select(F.col("table_id")).distinct().localCheckpoint(eager=False)
    labels = nodes.withColumn("domain", F.col("table_id"))
    for _ in range(rounds):
        nbr = (
            edges.join(labels, edges.table_b == labels.table_id)
            .groupBy(F.col("table_a").alias("table_id"))
            .agg(F.min("domain").alias("__nbr"))
        )
        labels = (
            labels.join(nbr, "table_id", "left")
            .select(
                "table_id",
                F.least(F.col("domain"), F.coalesce("__nbr", F.col("domain"))).alias(
                    "domain"
                ),
            )
            .localCheckpoint(eager=False)
        )
    return labels


def _column_pair_jaccards(
    index, min_distinct: int, max_token_cols: int
) -> DataFrame:
    """(table_a, col_a, table_b, col_b, __jac) for every cross-table
    column pair over the capped distinct-token universe — the shared
    core of :func:`union_search` and :func:`domain_clusters`."""
    dcells = index.cells.select("table_id", "col_id", "tokenized").distinct()
    spread = dcells.groupBy("tokenized").agg(F.count(F.lit(1)).alias("__cols"))
    capped = dcells.join(
        spread.filter(F.col("__cols") <= max_token_cols).select("tokenized"),
        "tokenized",
    )
    counts = capped.groupBy("table_id", "col_id").agg(F.count(F.lit(1)).alias("__n"))
    a, b = capped.alias("a"), capped.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tokenized") == F.col("b.tokenized"))
            & (F.col("a.table_id") != F.col("b.table_id")),
        )
        .groupBy(
            F.col("a.table_id").alias("table_a"),
            F.col("a.col_id").alias("col_a"),
            F.col("b.table_id").alias("table_b"),
            F.col("b.col_id").alias("col_b"),
        )
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    ca = counts.select(
        F.col("table_id").alias("table_a"), F.col("col_id").alias("col_a"),
        F.col("__n").alias("__na"),
    )
    cb = counts.select(
        F.col("table_id").alias("table_b"), F.col("col_id").alias("col_b"),
        F.col("__n").alias("__nb"),
    )
    return (
        common.join(F.broadcast(ca), ["table_a", "col_a"])
        .join(F.broadcast(cb), ["table_b", "col_b"])
        .filter((F.col("__na") >= min_distinct) & (F.col("__nb") >= min_distinct))
        .withColumn(
            "__jac",
            F.col("__common") / (F.col("__na") + F.col("__nb") - F.col("__common")),
        )
    )


def tables_with_all_tokens(index, tokens: list[str]) -> "DataFrame":
    """Conjunctive token search over the lake: tables whose cells contain
    EVERY query token (after the index tokenization) — the "which tables
    mention all of these entities" discovery probe.

    (table_id, n_hit_cols, n_hit_cells): how many distinct columns and
    cells participate, for ranking.  One broadcast IN-filter over the
    cell scan, one per-table aggregate with a distinct-token count
    equal to the query arity — no joins wider than the token list.
    """
    from datalake_indexes_spark.functions.text import tokenize_py

    toks = sorted({tokenize_py(t) for t in tokens})
    hit = index.cells.filter(F.col("tokenized").isin(toks))
    return (
        hit.groupBy("table_id")
        .agg(
            F.count_distinct("tokenized").alias("__nt"),
            F.count_distinct("col_id").alias("n_hit_cols"),
            F.count(F.lit(1)).alias("n_hit_cells"),
        )
        .filter(F.col("__nt") == len(toks))
        .select("table_id", "n_hit_cols", "n_hit_cells")
    )


def functional_dependencies(index, min_det_distinct: int = 2) -> DataFrame:
    """Exact single-column functional-dependency profiling per lake table:
    for every ordered column pair (det, dep) within a table, does each
    distinct det value map to exactly one distinct dep value?  The
    classic data-profiling primitive (TANE/Metanome territory) behind key
    detection, normalization hints, and schema matching — reference
    scope is the cell index itself (maco builds it but never profiles
    it); this is the discovery layer on top.

    (table_id, det_col, dep_col, n_det_distinct, holds) for ALL pairs —
    consumers filter ``holds``; emitting the refuted pairs too keeps the
    result auditable (an FD that ALMOST holds, n_det_distinct high, is a
    dirty-data signal).  Pairs whose determinant has fewer than
    ``min_det_distinct`` distinct values are dropped: a constant column
    vacuously "determines" everything.

    Scale shape: cells self-join on the (table_id, row_id) key — one
    shuffle of 2× the cell index, equi-join only — then two hash
    aggregates with map-side partials.  The c² column-pair expansion per
    row is the irreducible cost of exact FD profiling; at a truly wide
    lake you'd run this on a row sample first (the aggregate shape is
    unchanged) and verify survivors exactly.  No windows, no broadcast
    of anything unbounded, no driver loops.
    """
    cells = index.cells.select("table_id", "row_id", "col_id", "tokenized")
    a = cells.select(
        "table_id", "row_id",
        F.col("col_id").alias("det_col"), F.col("tokenized").alias("__lv"),
    )
    b = cells.select(
        "table_id", "row_id",
        F.col("col_id").alias("dep_col"), F.col("tokenized").alias("__rv"),
    )
    per_lhs = (
        a.join(b, ["table_id", "row_id"])
        .filter(F.col("det_col") != F.col("dep_col"))
        .groupBy("table_id", "det_col", "dep_col", "__lv")
        .agg(F.count_distinct("__rv").alias("__n_dep"))
    )
    return (
        per_lhs.groupBy("table_id", "det_col", "dep_col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_det_distinct"),
            (F.max("__n_dep") == 1).alias("holds"),
        )
        .filter(F.col("n_det_distinct") >= min_det_distinct)
    )


def join_cardinalities(
    index,
    max_token_cols: int = 64,
    min_rows: int = 10,
) -> DataFrame:
    """Inner-equi-join cardinality between every cross-table column pair:
    |A ⋈ B| = Σ_token cnt_A(token)·cnt_B(token) — the what-if-I-joined
    profile a lake UI shows next to the FK candidates
    :func:`inclusion_dependencies` surfaces (high containment with a
    pathological fan-out is exactly what you want to see BEFORE running
    the join).

    The sum-of-products over per-column token counts is the same
    skew-proof trick as J6's duplicate relations: row multiplicity
    multiplies instead of materializing.  Tokens spread across more than
    ``max_token_cols`` columns are dropped before the pair join (the
    stopword-token discipline shared with inclusion_dependencies), so
    reported sizes are lower bounds over the informative-token universe —
    the cap is the documented trade, not an accident.  Pairs below
    ``min_rows`` joined rows are suppressed.
    """
    counts = index.cells.groupBy("table_id", "col_id", "tokenized").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    spread = counts.groupBy("tokenized").agg(F.count(F.lit(1)).alias("__cols"))
    capped = counts.join(
        spread.filter(F.col("__cols") <= max_token_cols).select("tokenized"),
        "tokenized",
    )
    a = capped.select(
        "tokenized",
        F.col("table_id").alias("table_a"), F.col("col_id").alias("col_a"),
        F.col("__cnt").alias("__ca"),
    )
    b = capped.select(
        "tokenized",
        F.col("table_id").alias("table_b"), F.col("col_id").alias("col_b"),
        F.col("__cnt").alias("__cb"),
    )
    return (
        a.join(b, "tokenized")
        .filter(F.col("table_a") < F.col("table_b"))
        .groupBy("table_a", "col_a", "table_b", "col_b")
        .agg(
            F.sum(F.col("__ca") * F.col("__cb")).alias("join_rows"),
            F.count(F.lit(1)).cast("long").alias("n_common_tokens"),
        )
        .filter(F.col("join_rows") >= min_rows)
    )


def json_key_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Profile a semi-structured JSON column: one row per object key with
    presence, coverage, distinct-value count, and the majority value
    type — the schema-discovery pass for the ``props``-style payload
    columns a 100 TB event lake carries (which keys exist?  how often?
    what type are they really?).

    (key, n_present, coverage, n_distinct, top_type) with top_type ∈
    {int, float, bool, null, string} classified by anchored regex over
    the value's JSON text (engine-agnostic — the DuckDB twin classifies
    the same strings).

    One scan: ``from_json`` to ``map<string,string>`` + explode is the
    whole parse (native, codegen); per-key aggregates get map-side
    combine.  The row total for coverage is the sanctioned 1-row
    broadcast (same shape as bm25's corpus stats).  ``n_distinct`` is
    exact here; at lake scale swap in ``approx_count_distinct`` — the
    plan shape is unchanged.
    """
    kv = df.select(
        F.explode(F.from_json(F.col(json_col), "map<string,string>")).alias(
            "key", "value"
        )
    )
    typed = kv.withColumn(
        "__type",
        F.when(F.col("value").isNull(), F.lit("null"))
        .when(F.col("value").rlike(r"^-?[0-9]+$"), F.lit("int"))
        .when(F.col("value").rlike(r"^-?[0-9]+\.[0-9]+$"), F.lit("float"))
        .when(F.col("value").isin("true", "false"), F.lit("bool"))
        .otherwise(F.lit("string")),
    )
    # single aggregation: per-type counts ride the same groupBy as the
    # presence/distinct stats (conditional sums), so the parsed frame is
    # scanned ONCE and the majority type falls out in closed form — no
    # second shuffle, no window, no re-parse of the JSON at lake scale
    types = ["bool", "float", "int", "null", "string"]
    stats = typed.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.count_distinct("value").alias("n_distinct"),
        *[
            F.sum((F.col("__type") == t).cast("long")).alias(f"__n_{t}")
            for t in types
        ],
    )
    best = F.greatest(*[F.col(f"__n_{t}") for t in types])
    top_type = F.lit(types[-1])
    # ascending type order + first-match when chain = (count desc, type
    # asc) tie-break, same rule the DuckDB twin's ordered first() applies
    for t in reversed(types[:-1]):
        top_type = F.when(F.col(f"__n_{t}") == best, F.lit(t)).otherwise(top_type)
    total = df.select(F.count(F.lit(1)).alias("__total"))
    return (
        stats.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_present",
            F.round(
                F.col("n_present") / F.col("__total") + F.lit(1e-9), 4
            ).alias("coverage"),
            "n_distinct",
            top_type.alias("top_type"),
        )
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 10,
) -> DataFrame:
    """Re-identification risk profile before a dataset release: group by
    the quasi-identifier columns and report every equivalence class,
    flagging classes smaller than ``k`` (k-anonymity violations) and —
    when ``sensitive_col`` is given — classes whose sensitive attribute
    never varies (l-diversity = 1: membership alone discloses the
    value, however large the class).

    One row per class: (qi_value '|'-joined, group_size, n_sensitive,
    at_risk).  Single hash aggregate with map-side combine — group-size
    skew is irrelevant because counting is associative; nothing beyond
    the class table (bounded by the QI cardinality product, not the row
    count) ever leaves the aggregation.
    """
    qi = F.concat_ws("|", *[F.col(c).cast("string") for c in qi_cols])
    aggs = [F.count(F.lit(1)).alias("group_size")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"))
    out = df.groupBy(qi.alias("qi_value")).agg(*aggs)
    if sensitive_col is None:
        out = out.withColumn("n_sensitive", F.lit(None).cast("long"))
    risk = F.col("group_size") < k
    if sensitive_col is not None:
        risk = risk | (F.col("n_sensitive") <= 1)
    return out.select(
        "qi_value", "group_size", "n_sensitive", risk.alias("at_risk")
    )


def suppress_small_groups(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 10,
    mask: str = "*",
) -> DataFrame:
    """The remediation half of :func:`k_anonymity_report`: rows in
    quasi-identifier classes smaller than ``k`` get every QI column
    masked (suppression — the always-sound baseline when no
    generalization hierarchy is defined), so the released table is
    k-anonymous by construction and a ``suppressed`` flag records what
    was touched.

    The class-size attach is one aggregate + one broadcast-friendly
    equi-join on the QI key (class table is QI-cardinality-sized); the
    masking itself is a map-side projection.  Row order and non-QI
    columns pass through untouched.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in qi_cols])
    sizes = (
        df.groupBy(key.alias("__qi"))
        .agg(F.count(F.lit(1)).alias("__sz"))
        .filter(F.col("__sz") < k)
        .select("__qi")
    )
    # NO broadcast hint: with near-unique quasi-identifiers the sub-k
    # class table is O(rows) — forcing a broadcast here is the classic
    # composed-pipeline scale bug.  AQE still broadcasts when it is
    # actually small; the join stays a uniform QI-keyed equi-join.
    flagged = df.withColumn("__qi", key).join(
        sizes.withColumn("__hit", F.lit(True)), "__qi", "left"
    )
    suppressed = F.coalesce(F.col("__hit"), F.lit(False))
    out_cols = [
        (
            F.when(suppressed, F.lit(mask)).otherwise(F.col(c).cast("string")).alias(c)
            if c in qi_cols
            else F.col(c)
        )
        for c in df.columns
    ]
    return flagged.select(*out_cols, suppressed.alias("suppressed"))


def dp_group_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private group counts: Laplace(1/ε) noise on each
    class count (counts have sensitivity 1), clamped at 0 — the released
    histogram a governance pipeline publishes instead of raw class
    sizes.  (group_value '|'-joined, noisy_count).

    The noise uniform is md5(seed|group)-derived, so a given (seed,
    group) releases ONE fixed draw — deterministic across engines (the
    DuckDB twin replays it bit-for-bit) and immune to the
    average-many-queries attack a fresh-noise-per-read implementation
    invites; rotate ``seed`` only when the privacy budget is charged
    again.  Inverse-CDF Laplace from the uniform; one hash aggregate +
    a map-side noise projection, nothing scans twice.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    counts = df.groupBy(key.alias("group_value")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "|"), F.col("group_value"))), 1, 8),
            16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    centered = u - F.lit(0.5)
    lap = (
        -F.lit(1.0 / epsilon)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        "group_value",
        F.greatest(
            F.lit(0).cast("long"),
            F.round(F.col("__n") + lap + F.lit(1e-9)).cast("long"),
        ).alias("noisy_count"),
    )


def dp_group_sums(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    epsilon: float = 1.0,
    seed: str = "dp-sum",
) -> DataFrame:
    """Differentially-private group sums with explicit clipping:
    contributions are clamped to [lo, hi] (the caller-declared
    sensitivity bound — unbounded-sensitivity DP sums do not exist),
    then Laplace(max(|lo|,|hi|)/ε) noise is added per class.
    (group_value, noisy_sum).

    Same seeded one-draw-per-(seed, class) contract as
    :func:`dp_group_counts`; pair with it for a DP mean
    (noisy_sum / noisy_count) under ε_total = ε_sum + ε_count.
    Clipping is a map-side projection, the rest one hash aggregate.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    clipped = F.least(F.greatest(F.col(value_col).cast("double"), F.lit(lo)), F.lit(hi))
    sums = df.groupBy(key.alias("group_value")).agg(
        F.sum(clipped).alias("__s")
    )
    sens = max(abs(lo), abs(hi))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "|"), F.col("group_value"))), 1, 8),
            16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    centered = u - F.lit(0.5)
    lap = (
        -F.lit(sens / epsilon)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return sums.select(
        "group_value",
        F.round(F.col("__s") + lap + F.lit(1e-9), 4).alias("noisy_sum"),
    )


def pseudonymize_columns(
    df: DataFrame,
    cols: list[str],
    secret: str,
    prefix_len: int = 16,
) -> DataFrame:
    """Deterministic keyed pseudonymization of identifier columns:
    each value v becomes ``substr(md5(secret || '|' || v), prefix_len)``
    — the governance release step between suppression (drops rows) and
    DP noise (perturbs aggregates): joins and group-bys on the
    pseudonymized key still work (same input → same token, across tables
    and across runs sharing the secret), but the raw identifier never
    leaves the engine.

    Pure map-side projection (one md5 per cell, codegen) — a free rider
    on any scan at lake scale.  NULLs stay NULL (a pseudonymized NULL
    would otherwise become a linkable constant token).  Re-keying = run
    again with a new secret; unlinkability across releases follows from
    distinct secrets.  The secret must be handled like any credential —
    md5 here is a keyed codebook against casual re-identification, not a
    cryptographic MAC; swap in a real HMAC via a pandas UDF if the
    threat model demands one (same column contract).
    """
    out = df
    for c in cols:
        token = F.substring(
            F.md5(F.concat_ws("|", F.lit(secret), F.col(c).cast("string"))),
            1,
            prefix_len,
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNull(), F.lit(None).cast("string")).otherwise(token)
        )
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """One-row release audit for a prospective data publication: group
    by the quasi-identifier combination and report what anonymity the
    release ACTUALLY has — the governance check between
    :func:`pseudonymize_columns` (which hides direct identifiers) and
    the decision to ship (quasi-identifiers can still re-identify via
    linkage; Sweeney 2002).

    Columns: ``k_required`` (the policy), ``n_rows``, ``n_groups``,
    ``k_anonymity`` (min equivalence-class size — the k the release
    satisfies), ``n_rows_below_k`` / ``frac_rows_below_k`` (re-identify-
    able exposure under the policy), and, when ``sensitive_col`` is
    given, ``l_diversity`` (min distinct sensitive values within any
    class — k-anonymous classes with one sensitive value still leak it;
    Machanavajjhala 2007).

    NULL quasi-values form their own class (they are real, linkable
    values to an adversary).  Scale shape: ONE map-side-combinable
    groupBy over the quasi columns, then one aggregate over the class
    table (class-count-sized, not data-sized); ``frac_rows_below_k`` is
    a single IEEE division of exact longs — bit-stable cross-engine.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("__l"))
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out_aggs = [
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("__n").cast("long").alias("k_anonymity"),
        F.coalesce(
            F.sum(F.when(F.col("__n") < k, F.col("__n"))), F.lit(0)
        ).cast("long").alias("n_rows_below_k"),
    ]
    if sensitive_col is not None:
        out_aggs.append(F.min("__l").cast("long").alias("l_diversity"))
    rep = classes.agg(*out_aggs).select(
        F.lit(int(k)).cast("long").alias("k_required"),
        "*",
    )
    return rep.withColumn(
        "frac_rows_below_k",
        F.col("n_rows_below_k").cast("double") / F.col("n_rows").cast("double"),
    )


def shuffle_skew_report(
    df: DataFrame, key_cols: list[str], round_to: int = 4
) -> DataFrame:
    """One-row shuffle-skew diagnostic for a prospective groupBy/join key:
    (n_rows, n_keys, avg_per_key, p50_per_key, p99_per_key, max_per_key,
    skew_ratio, hottest_key) — the pre-flight check before keying a
    100 TB shuffle on a column.  ``skew_ratio`` (max/avg) ≫ 1 says one
    task will straggle: salt the key, or let AQE skew-split and verify
    it fired.

    Two hash aggregates (per-key counts, then stats over the key-count
    table — whose size is key cardinality, not row count) plus the
    sanctioned 1-row broadcast to attach the hottest key (deterministic:
    ties break on the smallest key string)."""
    # NULL components get a sentinel BEFORE concat — concat_ws silently
    # collapses NULL into "", which would merge NULL and empty-string
    # keys in the very skew stats being reported (they hash to different
    # shuffle partitions in the real groupBy).  Same ' null' sentinel as
    # categorical_association.
    counts = (
        df.select(
            F.concat_ws(
                "|",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit(" null"))
                    for c in key_cols
                ],
            ).alias("key")
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hottest = (
        counts.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(1)
        .select(F.col("key").alias("hottest_key"), F.col("cnt").alias("max_per_key"))
    )
    summary = counts.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.avg("cnt"), round_to).alias("avg_per_key"),
        F.round(F.expr("percentile(cnt, 0.5)"), round_to).alias("p50_per_key"),
        F.round(F.expr("percentile(cnt, 0.99)"), round_to).alias("p99_per_key"),
    )
    return summary.crossJoin(F.broadcast(hottest)).select(
        "n_rows",
        "n_keys",
        "avg_per_key",
        "p50_per_key",
        "p99_per_key",
        "max_per_key",
        F.round(F.col("max_per_key") / (F.col("n_rows") / F.col("n_keys")), round_to).alias(
            "skew_ratio"
        ),
        "hottest_key",
    )


def _level(col: str) -> "F.Column":
    """Collision-free categorical level key: NULL -> 'n', value x ->
    'v'+str(x).  A plain ' null' sentinel would merge a genuine string
    value ' null' with NULLs; prefixing every real value removes the
    collision entirely.  Internal grouping key only — never emitted."""
    c = F.col(col)
    return F.when(c.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), c.cast("string"))
    )


def categorical_association(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 4,
    max_levels: int = 1000,
) -> DataFrame:
    """One-row chi-square test of association between two categorical
    columns: (n, dof, chi2, cramers_v) -- the categorical-categorical
    counterpart of COCOA's numeric/one-hot correlation (is `lang`
    independent of `source`?  is a column pair worth a combined index?).

    ONE scan: the observed contingency table o(a,b) is a single
    map-side-combinable aggregate; everything downstream (margins,
    n, the full |A|x|B| expected grid -- zero-observed cells still
    contribute (0-e)^2/e, which a join on observed cells alone would
    silently drop) is arithmetic over the collected table, which is
    category-cardinality-bounded -- the sanctioned driver-side tier.
    (The previous form launched three eager jobs plus three scans in
    the returned plan: six passes over a corpus-sized input for the
    same one-row answer.)  Cramer's V = sqrt(chi2 / (n * min(|A|-1,
    |B|-1))) normalizes to [0, 1] for comparability across pairs.
    NULL categories count as their own level (they are real values to
    an indexer).  The chi2 sum runs in Spark over the grid built FROM
    the collected cells so rounding follows the same half-up F.round
    the oracle mirrors.

    The "category-cardinality-bounded" contract is ENFORCED, not
    assumed: a one-aggregate ``approx_count_distinct`` probe raises
    above ``max_levels`` per side BEFORE anything is collected — the
    same never-collect-unbounded discipline as the union-find edge
    guard (duplicates.py) — so pointing this at a free-text column
    fails fast instead of OOMing the driver on the contingency table.
    Raise ``max_levels`` only when the |A|x|B| grid is genuinely small
    enough to broadcast (the grid costs |A|x|B| rows).
    """
    a = _level(col_a)
    b = _level(col_b)
    pairs = df.select(a.alias("__a"), b.alias("__b"))
    card = pairs.agg(
        F.approx_count_distinct("__a").alias("ka"),
        F.approx_count_distinct("__b").alias("kb"),
    ).collect()[0]
    # approx_count_distinct is an HLL estimate (~5% rsd): a hard compare
    # would spuriously reject legit columns whose true cardinality sits
    # just under max_levels.  Only the cheap sketch probe gets slack; a
    # sketch inside the slack band is confirmed with an EXACT distinct
    # count (still one bounded aggregate) before deciding, so the raise
    # is never an estimator artifact and slightly-over columns can't
    # slip through on a low estimate either.
    slack = 1.10
    if card["ka"] > max_levels * slack or card["kb"] > max_levels * slack:
        raise ValueError(
            f"categorical_association: ~{card['ka']} x ~{card['kb']} estimated "
            f"category levels (approx_count_distinct, ~5% rsd) exceed "
            f"max_levels={max_levels}; the contingency table is not "
            "category-bounded (is this really a categorical column?). "
            "Raise max_levels only if the |A|x|B| grid is truly broadcastable."
        )
    if card["ka"] > max_levels / slack or card["kb"] > max_levels / slack:
        exact = pairs.agg(
            F.countDistinct("__a").alias("ka"),
            F.countDistinct("__b").alias("kb"),
        ).collect()[0]
        if exact["ka"] > max_levels or exact["kb"] > max_levels:
            raise ValueError(
                f"categorical_association: {exact['ka']} x {exact['kb']} exact "
                f"category levels exceed max_levels={max_levels}; the "
                "contingency table is not category-bounded (is this really a "
                "categorical column?). Raise max_levels only if the |A|x|B| "
                "grid is truly broadcastable."
            )
    cells = pairs.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("o")).collect()

    ra: dict[str, int] = {}
    cb: dict[str, int] = {}
    for r in cells:
        ra[r["__a"]] = ra.get(r["__a"], 0) + r["o"]
        cb[r["__b"]] = cb.get(r["__b"], 0) + r["o"]
    n = float(sum(ra.values()))
    k_a, k_b = len(ra), len(cb)
    spark = df.sparkSession
    obs = spark.createDataFrame(
        [(r["__a"], r["__b"], r["o"]) for r in cells], "__a string, __b string, o long"
    )
    ra_df = spark.createDataFrame(list(ra.items()), "__a string, ra long")
    cb_df = spark.createDataFrame(list(cb.items()), "__b string, cb long")
    grid = (
        F.broadcast(ra_df)
        .crossJoin(F.broadcast(cb_df))
        .join(obs, ["__a", "__b"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .withColumn("__e", F.col("ra") * F.col("cb") / F.lit(n))
    )
    chi = grid.agg(
        F.sum(F.pow(F.col("o") - F.col("__e"), 2) / F.col("__e")).alias("chi2")
    )
    dof = (k_a - 1) * (k_b - 1)
    denom = n * max(min(k_a - 1, k_b - 1), 1)
    return chi.select(
        F.lit(int(n)).cast("long").alias("n"),
        F.lit(dof).cast("long").alias("dof"),
        F.round(F.col("chi2"), round_to).alias("chi2"),
        F.round(F.sqrt(F.col("chi2") / F.lit(denom)), round_to).alias("cramers_v"),
    )


def cascade_forget(
    tables: dict[str, DataFrame],
    root: str,
    root_key: str,
    subjects: DataFrame,
    fk_edges: list[tuple[str, str, str, str]],
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Right-to-be-forgotten cascade: delete every row belonging to the
    requested subjects from ``tables[root]`` and propagate the deletion
    through the declared FK graph — a child row is removed iff its
    foreign key points at a parent row that was itself removed.  The
    erasure primitive a training-data lake needs to honor deletion
    requests (GDPR art. 17 / CCPA) without orphaning referential chains:
    forgetting a customer must also forget their orders and those
    orders' line items, or the "deleted" subject remains reconstructable
    from the children.

    ``fk_edges`` rows are ``(child, fk_col, parent, parent_key_col)``:
    ``child.fk_col`` references ``parent.parent_key_col``.  ``subjects``
    is a one-column frame of root-key values (a deletion-request list).
    Returns ``(cleaned, census)`` — the cleaned tables (lazy filtered
    views, nothing written; callers materialize via their own sink) and a census
    frame ``(table_name, rows_before, rows_deleted, rows_after)`` with
    one row per input table, untouched tables reporting 0 deletions.

    Semantics pinned down:

    - Cascade is ROW-driven, not value-driven: a subject key absent from
      the root table deletes nothing downstream (matches SQL ``ON DELETE
      CASCADE``, which fires per deleted parent row).
    - NULL foreign keys never match a deleted parent (SQL join
      semantics) — orphan-by-NULL rows survive, as they would under
      ``ON DELETE CASCADE``.
    - A child with several incoming edges is deleted if ANY edge points
      at a deleted parent row (markers OR-ed, no double count).
    - Tables with no path from ``root`` keep all rows; a cycle among
      reachable tables raises (cascade over a cyclic FK graph needs a
      fixpoint, which SQL engines refuse too).

    Scale shape: the subject list is broadcast (deletion requests are
    ~10³-10⁶ keys next to a 100 TB lake); pushed key sets (e.g. every
    order key of the deleted customers) flow through ordinary equi-joins
    sized by AQE.  Census and cleaned view share one marker join per
    table — counting deletions costs no extra scan over performing them.
    The whole cascade is lazy: nothing runs until the caller writes the
    cleaned tables or collects the census.
    """
    for child, _, parent, _ in fk_edges:
        if child not in tables or parent not in tables:
            raise ValueError(f"fk edge references unknown table: {child}->{parent}")
    if root not in tables:
        raise ValueError(f"unknown root table {root!r}")

    # reachable subgraph: only edges whose parent can ever see deletions
    reach = {root}
    while True:
        grew = {c for c, _, p, _ in fk_edges if p in reach and c not in reach}
        if not grew:
            break
        reach |= grew

    # structural cycle check up front (Kahn over the reachable subgraph):
    # an edge back INTO an already-cascaded table (incl. the root) must
    # refuse loudly, not silently drop — re-entrant deletions need a
    # fixpoint this operator deliberately doesn't compute
    live = [(c, p) for c, _, p, _ in fk_edges if p in reach]
    indeg = {n: 0 for n in reach}
    for c, _ in live:
        indeg[c] += 1
    frontier = sorted(n for n, d in indeg.items() if d == 0)
    ordered = 0
    while frontier:
        n = frontier.pop()
        ordered += 1
        for c, p in live:
            if p == n:
                indeg[c] -= 1
                if indeg[c] == 0:
                    frontier.append(c)
    if ordered != len(reach):
        cyc = sorted(n for n, d in indeg.items() if d > 0)
        raise ValueError(f"FK cycle among reachable tables: {cyc}")
    if indeg[root] != 0:  # unreachable given the check above, kept for clarity
        raise ValueError("root table has incoming FK edges from the cascade")

    subj = (
        subjects.select(F.col(subjects.columns[0]).cast("string").alias("__fk_val"))
        .distinct()
    )

    # deleted-rows view per reachable table, children after all their
    # (reachable) parents — resolved in dependency order, per the sort above
    deleted: dict[str, DataFrame] = {}
    marked: dict[str, DataFrame] = {}

    def _mark(table: str, pushes: list[DataFrame]) -> None:
        """Left-join each pushed key set as a 0/1 marker, OR them."""
        m = tables[table]
        flags = []
        for i, push in enumerate(pushes):
            flag = f"__del_{i}"
            m = m.join(push.withColumnRenamed("__fk_val", f"__fk_{i}").withColumn(flag, F.lit(1)),
                       m[_mark_keys[table][i]].cast("string") == F.col(f"__fk_{i}"),
                       "left").drop(f"__fk_{i}")
            flags.append(flag)
        any_del = F.greatest(*[F.coalesce(F.col(fl), F.lit(0)) for fl in flags]) if len(flags) > 1 else F.coalesce(F.col(flags[0]), F.lit(0))
        marked[table] = m.withColumn("__del", any_del).drop(*flags)
        deleted[table] = marked[table].filter(F.col("__del") == 1).drop("__del")

    _mark_keys: dict[str, list[str]] = {root: [root_key]}
    _mark(root, [F.broadcast(subj)])

    pending = [(c, fk, p, pk) for (c, fk, p, pk) in fk_edges if p in reach]
    while pending:
        # a child is ready when every one of ITS pending incoming edges
        # has a resolved parent
        ready = sorted(
            c
            for c in {c for c, _, _, _ in pending}
            if all(p in deleted for cc, _, p, _ in pending if cc == c)
        )
        if not ready:
            raise ValueError(f"FK cycle among reachable tables: {sorted({c for c, *_ in pending})}")
        for child in ready:
            mine = [(fk, p, pk) for cc, fk, p, pk in pending if cc == child]
            _mark_keys[child] = [fk for fk, _, _ in mine]
            pushes = [
                deleted[p].select(F.col(pk).cast("string").alias("__fk_val")).distinct()
                for _, p, pk in mine
            ]
            _mark(child, pushes)
        pending = [e for e in pending if e[0] not in deleted]

    cleaned: dict[str, DataFrame] = {}
    census_rows = []
    for name in sorted(tables):
        if name in marked:
            cleaned[name] = marked[name].filter(F.col("__del") == 0).drop("__del")
            census_rows.append(
                marked[name].agg(
                    F.lit(name).alias("table_name"),
                    F.count(F.lit(1)).cast("long").alias("rows_before"),
                    F.sum("__del").cast("long").alias("rows_deleted"),
                )
            )
        else:
            cleaned[name] = tables[name]
            census_rows.append(
                tables[name].agg(
                    F.lit(name).alias("table_name"),
                    F.count(F.lit(1)).cast("long").alias("rows_before"),
                    F.lit(0).cast("long").alias("rows_deleted"),
                )
            )
    census = census_rows[0]
    for extra in census_rows[1:]:
        census = census.unionByName(extra)
    census = census.select(
        "table_name",
        "rows_before",
        F.coalesce("rows_deleted", F.lit(0)).alias("rows_deleted"),
        (F.col("rows_before") - F.coalesce("rows_deleted", F.lit(0))).alias("rows_after"),
    ).orderBy("table_name")
    return cleaned, census


def categorical_mutual_info(
    df: DataFrame, col_a: str, col_b: str, round_to: int = 6
) -> DataFrame:
    """One-row mutual information between two categorical columns:
    (n, mi, h_a, h_b, nmi) — the information-theoretic complement of
    :func:`categorical_association`'s chi2 (chi2 answers "is there ANY
    dependence"; MI measures HOW MUCH knowing one column tells you about
    the other, in nats, and normalized MI = mi/sqrt(h_a·h_b) makes it
    comparable across column pairs like Cramér's V).

    MI = Σ_observed (o/n)·ln(n·o/(ra·cb)) — zero-observed cells
    contribute exactly 0, so unlike chi2 the full |A|×|B| expected grid
    is never needed and the whole computation stays distributed: one
    contingency aggregate, two margin re-aggregates of IT (not of the
    input), broadcast-joined back.  NULL categories count as their own
    level.  One scan of the input, shuffles keyed by category values
    (category-cardinality-bounded), no collect, no cross join.
    """
    a = _level(col_a)
    b = _level(col_b)
    cells = (
        df.select(a.alias("__a"), b.alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    ra = cells.groupBy("__a").agg(F.sum("o").alias("ra"))
    cb = cells.groupBy("__b").agg(F.sum("o").alias("cb"))
    joined = cells.join(F.broadcast(ra), "__a").join(F.broadcast(cb), "__b")
    n = F.sum("o")
    # margins multiply as DOUBLES: ra*cb as int64 overflows once margins
    # pass ~3e9 rows (real at corpus scale); both engines round the
    # product once, so parity holds below 2^53 and degrades together above
    mi_term = (
        F.col("o")
        * F.ln(
            F.col("o").cast("double")
            / (F.col("ra").cast("double") * F.col("cb").cast("double"))
        )
    )
    # Σ o·ln(o/(ra·cb)) + ln(n)·Σo, all divided by n at the end — one
    # aggregate, and the ln(n) factor lands once (n·o/(ra·cb) split out)
    agg = joined.agg(
        n.alias("__n"),
        F.sum(mi_term).alias("__mi_part"),
    )
    ha = (
        ra.agg(
            F.sum("ra").alias("__n"),
            F.sum(F.col("ra") * F.ln(F.col("ra").cast("double"))).alias("__s"),
        )
        .select(
            (F.ln(F.col("__n").cast("double")) - F.col("__s") / F.col("__n")).alias("h_a")
        )
    )
    hb = (
        cb.agg(
            F.sum("cb").alias("__n"),
            F.sum(F.col("cb") * F.ln(F.col("cb").cast("double"))).alias("__s"),
        )
        .select(
            (F.ln(F.col("__n").cast("double")) - F.col("__s") / F.col("__n")).alias("h_b")
        )
    )
    nd = F.col("__n").cast("double")
    mi = F.col("__mi_part") / nd + F.ln(nd)
    out = (
        agg.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            F.col("__n").alias("n"),
            F.round(mi, round_to).alias("mi"),
            F.round("h_a", round_to).alias("h_a"),
            F.round("h_b", round_to).alias("h_b"),
            F.round(
                mi
                / F.nullif(
                    F.sqrt(F.col("h_a") * F.col("h_b")), F.lit(0.0)
                ),
                round_to,
            ).alias("nmi"),
        )
    )
    return out


def pareto_report(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    targets: tuple[float, ...] = (0.5, 0.8, 0.9, 0.95, 0.99),
) -> DataFrame:
    """Concentration (Pareto) report: for each coverage target, how many
    of the heaviest keys it takes to cover that share of the total
    weight — "the top N domains hold 80% of the tokens", the question
    every data-mixing and quota-capping decision starts from.

    (target_share, n_keys, share_reached, key_frac): ``n_keys`` = the
    smallest prefix of keys (weight desc, key asc — fully deterministic)
    whose cumulative share ≥ target; ``share_reached`` its exact share;
    ``key_frac`` = n_keys / total keys.

    Scale shape: one per-key weight aggregate, then the cumulative rank
    runs as a TWO-LEVEL prefix sum — keys bucket by floor(log2(weight))
    (monotone with the weight order, so bucket offsets + within-bucket
    ordered windows compose to the global order), the bucket offset
    table is broadcast — the key frame never funnels through one task,
    the same pattern as budget_select.  The final report is
    len(targets) rows from a broadcast threshold join.  Zero/negative
    weights sort last in a single catch-all bucket.
    """
    w = F.col("__w")
    per_key = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.sum(F.col(weight_col).cast("double")).alias("__w")
    )
    bucket = F.when(w > 0, -F.floor(F.log2(w))).otherwise(F.lit(10**9)).cast("long")
    b = per_key.withColumn("__b", bucket)
    w_local = (
        Window.partitionBy("__b")
        .orderBy(F.desc("__w"), F.asc("__k"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("__run_w", F.sum("__w").over(w_local)).withColumn(
        "__run_n", F.count(F.lit(1)).over(w_local)
    )
    offsets = (
        b.groupBy("__b")
        .agg(F.sum("__w").alias("__tw"), F.count(F.lit(1)).alias("__tn"))
        .withColumn(
            "__off_w",
            F.coalesce(
                F.sum("__tw").over(
                    Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
        .withColumn(
            "__off_n",
            F.coalesce(
                F.sum("__tn").over(
                    Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    totals = per_key.agg(
        F.sum("__w").alias("__total_w"), F.count(F.lit(1)).alias("__total_n")
    )
    ranked = (
        local.join(F.broadcast(offsets.select("__b", "__off_w", "__off_n")), "__b")
        .crossJoin(F.broadcast(totals))
        .select(
            (F.col("__off_n") + F.col("__run_n")).cast("long").alias("__rank"),
            ((F.col("__off_w") + F.col("__run_w")) / F.col("__total_w")).alias(
                "__cum_share"
            ),
            "__total_n",
        )
    )
    # one filtered aggregate per target (len(targets) is a constant):
    # keeps the plan equi/aggregate-only — a cum_share >= target theta
    # join would plan as a nested loop over the full key frame.  The
    # aggregates land eagerly (len(targets) scalar rows — the sanctioned
    # driver-side tier) so the ranked frame is persisted for exactly the
    # union's one execution and released before returning.
    ranked = ranked.persist()
    try:
        out = None
        for t in targets:
            hit = ranked.filter(F.col("__cum_share") >= float(t)).agg(
                F.lit(float(t)).alias("target_share"),
                F.min("__rank").alias("n_keys"),
                F.min_by("__cum_share", "__rank").alias("__share"),
                F.first("__total_n").alias("__tn"),
            )
            out = hit if out is None else out.unionByName(hit)
        rows = out.collect()
    finally:
        ranked.unpersist()
    spark = df.sparkSession
    report = spark.createDataFrame(
        [
            (
                r["target_share"],
                r["n_keys"],
                r["__share"],
                (r["n_keys"] / r["__tn"]) if r["n_keys"] is not None else None,
            )
            for r in rows
        ],
        "target_share double, n_keys long, share_reached double, key_frac double",
    )
    # round in Spark (HALF_UP) so the report matches the oracle's rounding
    # convention, not Python's banker's rounding
    return report.select(
        "target_share",
        "n_keys",
        F.round("share_reached", 6).alias("share_reached"),
        F.round("key_frac", 6).alias("key_frac"),
    ).orderBy("target_share")


def join_paths(
    deps: DataFrame,
    src_table: int,
    dst_table: int,
    max_hops: int = 4,
    min_containment: float = 0.999,
) -> DataFrame:
    """Join-path discovery over the inclusion-dependency graph: every
    acyclic column-level path from ``src_table`` to ``dst_table`` within
    ``max_hops`` — (hops, path) with path =
    "tA.cA>tB.cB|tB.cC>tC.cD|…" — the "how do I even join these two
    tables" answer a dataset-search UI builds its join wizard from
    (Aurum-style discovery; the reference's joinability search ranks
    single hops, this composes them).

    ``deps`` is :func:`inclusion_dependencies` output (or any frame with
    table_a/col_a/table_b/col_b/containment); edges keep pairs at
    ``min_containment`` or above.  Cycle rule: a path never revisits a
    table (tracked as an array column, checked with array_contains).

    Scale shape: the edge list is CATALOG-sized (column pairs, not
    rows); each hop is one equi-join of the frontier against the edges —
    ``max_hops`` joins total in one lazy plan, no per-hop action, no
    collect.  Frontier width is bounded by the acyclic path count, which
    the hop cap controls; the caller picks the cap exactly like a graph
    traversal depth limit.
    """
    if max_hops < 1:
        raise ValueError("join_paths: max_hops must be >= 1")
    # the edge list is referenced once per hop plus the seed frontier —
    # unpinned, EVERY reference re-runs the whole upstream dependency
    # mining (an all-pairs token join over the lake; measured at sf0.01:
    # 164 jobs / 18.7s warm for a 4-hop query, ~5x the one-pass cost).
    # Catalog-sized, so the checkpoint is pennies.
    edges = (
        deps.filter(F.col("containment") >= min_containment)
        .select("table_a", "col_a", "table_b", "col_b")
        .distinct()
        .localCheckpoint(eager=False)
    )
    step = F.format_string(
        "%d.%d>%d.%d",
        F.col("table_a"), F.col("col_a"), F.col("table_b"), F.col("col_b"),
    )
    frontier = (
        edges.filter(F.col("table_a") == src_table)
        .select(
            F.col("table_b").alias("__end"),
            step.alias("path"),
            F.array(F.lit(src_table), F.col("table_b")).alias("__seen"),
            F.lit(1).cast("int").alias("hops"),
        )
    )
    results = frontier.filter(F.col("__end") == dst_table).select("hops", "path")
    for h in range(2, max_hops + 1):
        grow = (
            frontier.filter(F.col("__end") != dst_table)
            .join(edges, F.col("__end") == F.col("table_a"))
            .filter(~F.array_contains(F.col("__seen"), F.col("table_b")))
            .select(
                F.col("table_b").alias("__end"),
                F.concat_ws("|", F.col("path"), step).alias("path"),
                F.array_append(F.col("__seen"), F.col("table_b")).alias("__seen"),
                F.lit(h).cast("int").alias("hops"),
            )
        )
        results = results.unionByName(
            grow.filter(F.col("__end") == dst_table).select("hops", "path")
        )
        frontier = grow
    return results
