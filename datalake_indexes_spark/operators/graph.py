"""Distributed connected components — alternating large-star / small-star.

The algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) converges in O(log n) rounds and keeps every step a plain
join + aggregate, so it scales to crawl-sized near-duplicate graphs where
the edge set is O(corpus) and a driver-side union-find
(`duplicates.DuplicateDetection.duplicate_groups`) would have to collect
hundreds of millions of pairs.

Each round:

- **large-star** (over the symmetrized edge list): for every node ``u``
  with ``m = min(N(u) ∪ {u})``, connect every *larger* neighbor directly
  to ``m``;
- **small-star** (over edges oriented larger→smaller): connect all smaller
  neighbors and ``u`` itself to the minimum.

Both steps strictly never increase the component minimum a node can reach,
and the edge list contracts toward a star per component with the minimum
node as center.  Convergence is detected by an order-independent edge-set
fingerprint (count + xxhash64 sum); every round ``localCheckpoint``s the
edge list, truncating the iterative-join lineage that would otherwise blow
up plan rendering/memory (observed failure mode of naive label
propagation).

Measured (local, shared host): 1M random edges over ~580k nodes resolve
to 1.4k components in ~21 s — rounds, not edge count, dominate, and the
round count is O(log n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(sym_edges: DataFrame) -> DataFrame:
    """(v, m) for every v ∈ N(u) with v > u, m = min(N(u) ∪ {u})."""
    m = (
        sym_edges.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .select("u", F.least("u", "__mn").alias("m"))
    )
    return (
        sym_edges.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Over larger→smaller oriented edges: attach u and all its smaller
    neighbors to the smallest of them."""
    e = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    m = e.groupBy("u").agg(F.min("v").alias("__mn"))
    attached = (
        e.join(m, "u")
        .select(F.col("v").alias("u"), F.col("__mn").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    centers = m.select("u", F.col("__mn").alias("v"))
    return attached.union(centers).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-independent and overflow-free under ANSI mode
        # (a sum of xxhash64 overflows long)
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns ``(node, representative)`` for every node that appears in at
    least one edge; the representative is the component's minimum node id.
    Wholly distributed: no driver-side edge collection at any point.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    prev = _fingerprint(e)
    for _ in range(max_iterations):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        e = _small_star(_large_star(sym)).localCheckpoint()
        cur = _fingerprint(e)
        if cur == prev:
            break
        prev = cur
    else:  # pragma: no cover — O(log n) convergence makes this unreachable
        raise RuntimeError(
            f"connected_components: no convergence in {max_iterations} rounds"
        )

    # converged edges form a star per component: (member, min). Roots have
    # no outgoing edge — they represent themselves.
    reps = e.select(F.col("u").alias("node"), F.col("v").alias("representative"))
    return (
        nodes.join(reps, "node", "left")
        .select(
            "node", F.coalesce("representative", F.col("node")).alias("representative")
        )
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Distributed PageRank by power iteration — (node, rank), ranks
    summing to 1.  The engine's join-graph analytics hook: feed it the
    MATE joinability pairs (tables as nodes, joinable-with as edges) and
    the rank orders tables by how central they are to the lake's join
    structure — the "which tables matter" signal a discovery UI sorts by.

    Semantics: standard damped PageRank with dangling-mass
    redistribution (nodes without out-edges donate their rank uniformly),
    so Σ rank = 1 holds every iteration (asserted in tests, not just in
    the docstring).

    Scale shape per iteration: contributions = edges ⋈ ranks on src
    (both sides partitioned by the join key — one co-keyed shuffle that
    AQE reuses round to round), summed per dst with map-side combine;
    the dangling mass and N are scalar aggregates.  ``localCheckpoint``
    every round truncates the iterative lineage exactly like
    :func:`connected_components` — a fixed ``iters`` (10 reaches 1e-3
    relative error on typical graphs) keeps the loop bounded; no
    driver-side edge or rank collection anywhere.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # checkpointed: the per-iteration dangling-mass aggregate anti-joins
    # against it — without this the upstream edge pipeline re-executes
    # every round
    out_deg = (
        e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg")).localCheckpoint(eager=False)
    )
    # (src, dst, 1/deg) — static per-edge weight, checkpointed once
    w = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("__deg")).alias("__w")
    ).localCheckpoint(eager=False)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            w.join(ranks, w.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") * F.col("__w")).alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        # dangling mass (rank held by nodes with no out-edges) stays IN
        # the plan as a broadcast scalar frame — no per-iteration driver
        # action; the round's only job is the checkpoint below
        dangling = F.broadcast(
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("__dm") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Enumerate every triangle of an undirected graph — the clustering
    primitive behind near-dup cluster densification, community cohesion
    scores, and spam-ring detection over similarity graphs.

    Degree-oriented node-iterator (the MapReduce-classic of Suri &
    Vassilvitskii's "Counting triangles and the curse of the last
    reducer"): canonical edges are re-oriented from the (degree, id)-
    SMALLER endpoint to the larger, so a hub of degree D generates
    wedges only from its low-degree neighbors — out-degrees are bounded
    by O(sqrt(m)) and the skewed-star blowup (D choose 2 wedges through
    one hot key) disappears by construction, the same reason J6 switched
    to fingerprint counts.  Two shuffled equi-joins: wedges a→b→c by the
    pivot b, then a semi-check that the closing a→c edge exists.  Each
    triangle is emitted exactly once, as its sorted (node_a < node_b <
    node_c) id triple.
    """
    e = (
        edges.select(
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias("u"),
            F.greatest(F.col(src).cast("long"), F.col(dst).cast("long")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)  # consumed by the degree count AND the orientation join
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("__du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("__dv"))
    keyed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (F.col("u") < F.col("v"))
    )
    # oriented feeds three join legs (both wedge sides + the closing
    # check) — cut the lineage once so the upstream edge pipeline (often
    # an expensive similarity join) runs once, not three times
    oriented = keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).localCheckpoint(eager=False)
    wedges = oriented.join(
        oriented.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )
    closed = wedges.join(
        oriented.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    )
    ids = F.array_sort(F.array("a", "b", "c"))
    return closed.select(
        ids[0].alias("node_a"), ids[1].alias("node_b"), ids[2].alias("node_c")
    )


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Dedup'd undirected edge list as (u < v) long pairs, self-loops
    dropped."""
    return (
        edges.select(
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias("u"),
            F.greatest(F.col(src).cast("long"), F.col(dst).cast("long")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_pivot_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """Neighborhood-based link prediction over an undirected graph:
    for every NON-adjacent node pair sharing >= ``min_common`` neighbors,
    the three classic scores — common-neighbor count, Jaccard coefficient
    |N(a) ∩ N(b)| / |N(a) ∪ N(b)|, and Adamic-Adar Σ_w 1/ln(deg(w))
    (Liben-Nowell & Kleinberg, "The link prediction problem for social
    networks", CIKM'03).  Over a near-duplicate similarity graph this is
    the "missed pair" detector: two documents never directly matched but
    sharing many near-dup neighbors are almost surely near-dups the
    banding missed.

    Returns (node_a, node_b, common_neighbors, jaccard, adamic_adar),
    node_a < node_b, scores rounded to 6 decimals.

    Scale shape: the candidate pairs come from a wedge self-join of the
    symmetrized adjacency on the PIVOT node — per-pivot cost is
    deg(w)^2, so total work is Σ deg(w)^2, concentrated on hubs.
    ``max_pivot_degree`` drops super-hub pivots from wedge generation
    (a node adjacent to everything predicts nothing — its wedges are
    noise), turning the quadratic hub corner into a documented recall
    cap, the same move as ``dedup.ngram_pairs``' hot-shingle cap.  The
    adjacency-exclusion check is a left-anti equi-join, the scores are
    map-side-combinable aggregates, and the degree table is
    vocabulary-sized (node count), broadcast onto the wedge output.
    """
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    sym = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionByName(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    pivots = sym.join(F.broadcast(deg), "node")
    if max_pivot_degree is not None:
        pivots = pivots.filter(F.col("deg") <= max_pivot_degree)
    left = pivots.select("node", F.col("nbr").alias("a"))
    right = pivots.select("node", F.col("nbr").alias("b"), F.col("deg"))
    wedges = left.join(right, "node").where(F.col("a") < F.col("b"))
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("deg").cast("double"))).alias("__aa"),
    )
    non_adjacent = scored.join(
        e, (scored["a"] == e["u"]) & (scored["b"] == e["v"]), "left_anti"
    ).filter(F.col("common_neighbors") >= min_common)
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    return (
        non_adjacent.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (F.col("__da") + F.col("__db") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
            F.round("__aa", 6).alias("adamic_adar"),
        )
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    rounds: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node has degree >= k, computed by iterative peeling — drop all
    nodes of degree < k, recompute degrees, repeat until a round removes
    nothing.  The classic dense-cluster extractor: over a near-duplicate
    graph the 2-core separates genuine duplication CLUSTERS from
    incidental one-off pair matches (which peel away immediately); cores
    of template-spam rings survive any k.

    Returns (node, core_degree): surviving nodes with their degree
    inside the core.

    ``rounds=None`` (the default) peels until the edge-set fingerprint
    converges — same count+xxhash64-sum convergence detection and
    per-round ``localCheckpoint`` lineage truncation as
    :func:`connected_components`; peeling is monotone (the surviving
    edge set only shrinks) so the fingerprint is exact, not
    probabilistic-in-spirit.  A fixed ``rounds=r`` runs exactly r peel
    rounds — the oracle-parity knob (the DuckDB twin unrolls the same r
    rounds as nested CTEs), correct whenever r covers convergence, which
    the convergence variant verifies in tests.

    Scale shape: each round is one map-side-combinable degree aggregate
    plus two broadcast semi-joins of the (node count)-sized low-degree
    set against the edge list — the edge list itself never shuffles on a
    skewed key.  Round count is bounded by the graph's degeneracy
    ordering depth, O(log n) on similarity graphs in practice.
    """
    cur = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)

    def _degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    prev_fp = _fingerprint(cur)
    i = 0
    while True:
        i += 1
        low = _degrees(cur).filter(F.col("deg") < k).select("node")
        cur = (
            cur.join(F.broadcast(low.select(F.col("node").alias("u"))), "u", "left_anti")
            .join(F.broadcast(low.select(F.col("node").alias("v"))), "v", "left_anti")
            .localCheckpoint(eager=False)
        )
        if rounds is not None:
            if i >= rounds:
                break
        else:
            fp = _fingerprint(cur)
            if fp == prev_fp:
                break
            prev_fp = fp
    return _degrees(cur).select("node", F.col("deg").alias("core_degree"))


def label_propagation(
    edges: DataFrame,
    rounds: int | None = None,
    max_rounds: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007): every node starts as its own community, then each
    round adopts the most frequent label among itself and its neighbors
    (self-vote included), ties to the SMALLEST label.  Communities are
    finer than :func:`connected_components` — a component containing
    two dense clusters joined by one bridge edge splits into two —
    which is the near-dup use: template families inside one giant
    transitive blob.

    Returns (node, community); deterministic (the tie rule makes each
    round a pure function of the previous labels).

    ``rounds=None`` iterates until the label assignment's fingerprint
    converges, hard-capped at ``max_rounds``: synchronous LPA can
    2-cycle on symmetric bipartite structures, so unlike monotone
    peeling a cap is semantics, not a knob (the self-vote + min-tie
    rule breaks the textbook oscillation in practice — distinct initial
    ids rarely stay symmetric — but the cap makes termination
    unconditional).  A fixed ``rounds=r`` runs exactly r rounds — the
    oracle-parity knob, verified against the converged variant in
    tests.

    Scale shape: each round is one node-keyed equi-join of the label
    table onto the symmetrized adjacency (edge-sized shuffle — the
    irreducible LPA cost), a map-side-combinable (node, label) count,
    and a per-node window over the handful of distinct neighbor labels;
    ``localCheckpoint`` truncates lineage per round.  No driver-side
    graph state.
    """
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    sym = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionByName(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    ).localCheckpoint(eager=False)
    labels = sym.select("node").distinct().select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=False)

    def _fp(lab: DataFrame) -> tuple[int, int]:
        row = lab.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("node", "label")), F.lit(0)).alias("h"),
        ).first()
        return row["n"], row["h"]

    prev_fp = _fp(labels)
    total = rounds if rounds is not None else max_rounds
    for _ in range(total):
        nbr_votes = sym.join(
            labels.select(F.col("node").alias("nbr"), "label"), "nbr"
        ).select("node", "label")
        votes = nbr_votes.unionByName(labels.select("node", "label"))
        counts = votes.groupBy("node", "label").agg(F.count(F.lit(1)).alias("__c"))
        w = Window.partitionBy("node").orderBy(F.desc("__c"), F.asc("label"))
        labels = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=False)
        )
        if rounds is None:
            fp = _fp(labels)
            if fp == prev_fp:
                break
            prev_fp = fp
    return labels.select("node", F.col("label").alias("community"))


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity decomposition of a node partition over an
    undirected graph: per community c, Q_c = e_c/m − (D_c/2m)² with
    e_c = intra-community edges, D_c = degree mass, m = total edges —
    Q = Σ Q_c, the standard "is this partition real structure or
    degree luck" score.  Fed an ATTRIBUTE as the partition (document
    source, domain, language) it answers "do near-duplicates stay
    inside this attribute?" — contribution ≈ 0 means the attribute
    explains nothing about who duplicates whom.

    Returns (community, n_nodes, intra_edges, degree_sum,
    contribution), contribution rounded to 6; nodes absent from
    ``labels`` are excluded from the graph (their edges drop), so pass
    a total labeling for the textbook score.

    Scale shape: two node-keyed equi-joins of the label table onto the
    edge list (the labels side is node-sized — no iteration, unlike
    :func:`label_propagation` which PRODUCES partitions this scores),
    then community-keyed map-side-combinable aggregates; m and 2m
    arrive via a scalar-aggregate cross join, no driver action.
    """
    e = _canonical_edges(edges, src, dst)
    lab = labels.select(
        F.col(node_col).alias("__n"), F.col(community_col).alias("__c")
    )
    both = (
        e.join(lab.select(F.col("__n").alias("u"), F.col("__c").alias("__cu")), "u")
        .join(lab.select(F.col("__n").alias("v"), F.col("__c").alias("__cv")), "v")
    )
    m_total = both.agg(F.count(F.lit(1)).alias("__m"))
    intra = (
        both.filter(F.col("__cu") == F.col("__cv"))
        .groupBy(F.col("__cu").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    # degrees over the same both-endpoints-labeled edge set as m, so the
    # score stays internally consistent under a partial labeling
    sym = both.select(F.col("u").alias("node"), F.col("__cu").alias("__c")).unionByName(
        both.select(F.col("v").alias("node"), F.col("__cv").alias("__c"))
    )
    deg_mass = sym.groupBy(F.col("__c").alias("community")).agg(
        F.count(F.lit(1)).alias("degree_sum"),
        F.count_distinct("node").alias("n_nodes"),
    )
    return (
        deg_mass.join(intra, "community", "left")
        .withColumn("intra_edges", F.coalesce("intra_edges", F.lit(0)))
        .crossJoin(F.broadcast(m_total))
        .select(
            "community",
            "n_nodes",
            "intra_edges",
            "degree_sum",
            F.round(
                F.col("intra_edges") / F.col("__m")
                - F.pow(F.col("degree_sum") / (F.lit(2.0) * F.col("__m")), F.lit(2.0)),
                6,
            ).alias("contribution"),
        )
    )


def hits(
    edges: DataFrame,
    iters: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hub/authority scores by power iteration — (node, hub,
    authority), each L1-normalized per round (Kleinberg 1999).  On a link
    graph, authorities are the pages good hubs point AT and hubs are the
    pages that point at good authorities — the mutually recursive pair
    PageRank's single score cannot separate; on the lake's join graph it
    splits "tables many others join INTO" from "tables that join into
    many others".

    Semantics: 0/1 adjacency (duplicate edges collapse), hub and
    authority start at 1; each round computes authority(n) =
    Σ_{s→n} hub(s) then normalizes to Σ=1, then hub(n) = Σ_{n→d}
    authority(d) then normalizes.  Nodes without in-edges carry
    authority 0 (without out-edges, hub 0) — present in the output, not
    dropped.  L1 normalization (not the also-common L2) keeps the twin's
    arithmetic division-by-a-sum, exactly reproducible in SQL.

    Scale shape per round: two equi-joins of the (checkpointed, distinct)
    edge list against the score frames — both keyed shuffles AQE reuses —
    each followed by a map-side-combined sum per endpoint; the
    normalizer is a broadcast scalar aggregate that stays IN the plan (no
    per-round driver action).  ``localCheckpoint`` truncates the
    iterative lineage every round like :func:`pagerank` and
    :func:`connected_components`; fixed ``iters`` bounds the loop.
    """
    e = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    scores = nodes.select("node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    for _ in range(iters):
        a_raw = (
            nodes.join(
                e.join(scores, e.src == scores.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub").alias("__s")),
                "node",
                "left",
            )
            .select("node", F.coalesce("__s", F.lit(0.0)).alias("__v"))
        )
        a_tot = F.broadcast(a_raw.agg(F.sum("__v").alias("__t")))
        auth = a_raw.crossJoin(a_tot).select(
            "node", (F.col("__v") / F.col("__t")).alias("auth")
        )
        h_raw = (
            nodes.join(
                e.join(auth, e.dst == auth.node)
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("auth").alias("__s")),
                "node",
                "left",
            )
            .select("node", F.coalesce("__s", F.lit(0.0)).alias("__v"))
        )
        h_tot = F.broadcast(h_raw.agg(F.sum("__v").alias("__t")))
        hub = h_raw.crossJoin(h_tot).select(
            "node", (F.col("__v") / F.col("__t")).alias("hub")
        )
        scores = hub.join(auth, "node").localCheckpoint(eager=False)
    return scores.select("node", "hub", F.col("auth").alias("authority"))


def personalized_pagerank(
    edges: DataFrame,
    seed_modulus: int = 10,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized PageRank: teleport (and dangling mass) return to a
    SEED set instead of the uniform vector, so rank measures proximity to
    the seeds — "documents related to THIS cluster", "tables relevant to
    THIS table", the query-biased variant every discovery UI needs next
    to the global :func:`pagerank`.

    The seed set is data-driven (nodes with ``node % seed_modulus == 0``)
    rather than a literal id list, so both engines derive it from the
    graph itself; Σ rank = 1 holds every iteration because all teleport
    and dangling mass lands on seeds that exist by construction.

    Update (standard PPR): rank = (1−d)·p0 + d·(contrib + dm·p0), with
    p0 the uniform-over-seeds vector and dm the dangling mass.  Scale
    shape identical to :func:`pagerank`: one co-keyed contribution join +
    two scalar aggregates per round, localCheckpoint lineage truncation.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if nodes.count() == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    is_seed = F.pmod(F.col("node"), F.lit(int(seed_modulus))) == 0
    n_seeds = F.broadcast(
        nodes.agg(F.sum(is_seed.cast("long")).cast("double").alias("__ns"))
    )
    if nodes.filter(is_seed).count() == 0:
        raise ValueError(
            f"personalized_pagerank: no seed nodes (node % {seed_modulus} == 0)"
        )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg")).localCheckpoint(eager=False)
    w = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("__deg")).alias("__w")
    ).localCheckpoint(eager=False)

    p0 = F.when(is_seed, F.lit(1.0) / F.col("__ns")).otherwise(F.lit(0.0))
    ranks = nodes.crossJoin(n_seeds).select("node", p0.alias("rank")).localCheckpoint(eager=False)
    d = float(damping)
    for _ in range(iters):
        contrib = (
            w.join(ranks, w.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") * F.col("__w")).alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        dangling = F.broadcast(
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(dangling)
            .crossJoin(n_seeds)
            .select(
                "node",
                (
                    (F.lit(1.0 - d) + F.lit(d) * F.col("__dm")) * p0
                    + F.lit(d) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node: (node, degree, n_triangles,
    local_cc) with local_cc = 2·tri / (deg·(deg−1)) — how close each
    node's neighborhood is to a clique.  On a near-dup graph a high-cc
    node sits inside a dense duplication blob (safe to collapse); a
    high-degree low-cc node is a hub stitching unrelated clusters — the
    classic false-merge suspect worth human review before dedup collapses
    its component.

    Triangle counts come from :func:`triangles` (degree-oriented, skew-
    proof); degrees from the distinct undirected edge list; nodes with
    degree < 2 report cc = 0.0.  One explode of the (small) triangle set
    + one keyed aggregate on top of the triangle enumeration's cost.
    """
    e = (
        edges.select(
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias("u"),
            F.greatest(F.col(src).cast("long"), F.col(dst).cast("long")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangles(edges, src, dst)
    per_node = (
        tri.select(F.explode(F.array("node_a", "node_b", "node_c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce("n_triangles", F.lit(0)).cast("double")
                    / (F.col("degree").cast("double") * (F.col("degree") - F.lit(1))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("local_cc"),
        )
    )
