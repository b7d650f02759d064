"""Unit semantics for DQ validation, inclusion-dependency discovery, and
rolling time-series features; the `lake_validate` / `inclusion_deps` /
`events_rolling` oracle keys cover the corpus-scale versions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
class TestValidate:
    def test_row_rule_null_is_violation(self, spark):
        from datalake_indexes_spark.operators.validate import validate_rows

        df = spark.createDataFrame(
            [(1, 5.0), (2, -1.0), (3, None)], "id long, bal double"
        )
        out = validate_rows(df, {"bal_nonneg": F.col("bal") >= 0}, id_col="id")
        assert sorted(r.entity_id for r in out.collect()) == [2, 3]

    def test_reference_and_existence(self, spark):
        from datalake_indexes_spark.operators.validate import (
            validate_existence,
            validate_reference,
        )

        parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        child = spark.createDataFrame(
            [(10, 1), (11, 1), (12, 9), (13, None)], "id long, fk long"
        )
        fk = validate_reference(child, parent, "fk", "k", rule="fk", id_col="id")
        # only the orphan; NULL fk is exempt
        assert [r.entity_id for r in fk.collect()] == [12]
        cov = validate_existence(parent, child, "k", "fk", rule="covered")
        assert sorted(r.entity_id for r in cov.collect()) == [2, 3]


@pytest.mark.spark
class TestInclusionDeps:
    def test_finds_planted_fk_and_respects_cap(self, spark):
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.discovery import inclusion_dependencies

        cells = []
        # table 1 col 0: "PK" domain v0..v9
        cells += [(1, 0, i, f"v{i}") for i in range(10)]
        # table 2 col 0: FK fully contained in table 1 col 0
        cells += [(2, 0, i, f"v{i % 8}") for i in range(20)]
        # table 2 col 1: disjoint domain
        cells += [(2, 1, i, f"w{i}") for i in range(10)]
        # a stopword token present in EVERY column (capped out)
        for t, c in ((1, 0), (2, 0), (2, 1)):
            cells.append((t, c, 99, "common"))
        idx = LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        out = inclusion_dependencies(
            idx, min_distinct=5, min_containment=0.8, max_token_cols=2
        ).collect()
        deps = {(r.table_a, r.col_a, r.table_b, r.col_b): r for r in out}
        # FK direction found with containment 1.0 over the capped universe
        assert deps[(2, 0, 1, 0)].containment == 1.0
        assert deps[(2, 0, 1, 0)].n_distinct_a == 8  # "common" not counted
        # reverse direction is weaker — 8 of 10 capped tokens (and would
        # drop out at a 0.9 bar)
        assert deps[(1, 0, 2, 0)].containment == 0.8
        # disjoint column contributes nothing
        assert not any(k[:2] == (2, 1) for k in deps)


@pytest.mark.spark
class TestRollingFeatures:
    def test_frames_and_leakage(self, spark):
        from datalake_indexes_spark.operators.events import rolling_features

        ev = spark.createDataFrame(
            [(i, 1, i * 1000, float(i + 1)) for i in range(5)],
            "event_id long, user_id long, ts_us long, value double",
        )
        rows = {r.event_id: r for r in rolling_features(ev).collect()}
        assert math.isnan(rows[0].prev_value) and math.isnan(rows[0].trail_mean)
        assert rows[3].prev_value == 3.0
        # trailing mean of rows 0,1,2 (values 1,2,3) — current row excluded
        assert rows[3].trail_mean == 2.0
        # window caps at 3 preceding: rows 1,2,3 -> mean 3.0
        assert rows[4].trail_mean == 3.0
        assert rows[4].run_max == 5.0
        assert [rows[i].seq for i in range(5)] == [1, 2, 3, 4, 5]

    def test_single_window_exec(self, spark):
        """All four features evaluate in one sorted WindowExec run —
        no per-feature re-shuffle."""
        from datalake_indexes_spark.operators.events import rolling_features

        ev = spark.range(100).selectExpr(
            "id AS event_id", "id % 7 AS user_id", "id AS ts_us",
            "CAST(id AS DOUBLE) AS value",
        )
        plan = rolling_features(ev)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


@pytest.mark.spark
class TestUnionSearch:
    def test_ranks_same_domain_table_first(self, spark):
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.discovery import union_search

        cells = []
        # query table 0: two columns with distinct domains
        cells += [(0, 0, i, f"a{i}") for i in range(10)]
        cells += [(0, 1, i, f"b{i}") for i in range(10)]
        # table 1: near-clone of table 0 (high unionability, both cols)
        cells += [(1, 0, i, f"a{i}") for i in range(8)]
        cells += [(1, 1, i, f"b{i}") for i in range(8)]
        # table 2: overlaps col 0 only, weakly
        cells += [(2, 0, i, f"a{i}") for i in range(3)] + [
            (2, 0, 10 + i, f"z{i}") for i in range(7)
        ]
        # table 3: disjoint
        cells += [(3, 0, i, f"q{i}") for i in range(10)]
        idx = LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        out = union_search(idx, 0, k=5, min_jaccard=0.1).collect()
        assert [r.table_id for r in out][0] == 1
        assert out[0].n_matched_cols == 2
        got = {r.table_id for r in out}
        assert 3 not in got  # disjoint never surfaces
        # clone score: jaccard 8/10 per column, twice
        assert abs(out[0].score - 2 * (8 / 10)) < 1e-9


@pytest.mark.spark
class TestColumnHistograms:
    def test_buckets_and_constant_column(self, spark):
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.cocoa import column_histograms

        cells = (
            # col 0: values 0..9 -> one per bucket at nbins=10
            [(1, 0, i, str(i)) for i in range(10)]
            # col 1: constant -> all in bucket 0
            + [(1, 1, i, "7") for i in range(4)]
            # col 2: non-numeric -> excluded entirely
            + [(1, 2, i, t) for i, t in enumerate(["x", "y"])]
            # col 3: max value folds into last bucket
            + [(1, 3, 0, "0"), (1, 3, 1, "10")]
        )
        idx = LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        out = column_histograms(idx, nbins=10).collect()
        by = {}
        for r in out:
            by.setdefault(r.col_id, {})[r.bucket] = r
        assert set(by[0]) == set(range(10)) and all(
            r.n == 1 for r in by[0].values()
        )
        assert by[0][3].bucket_lo == 2.7  # 0 + 3*(9-0)/10
        assert set(by[1]) == {0} and by[1][0].n == 4
        assert 2 not in by
        assert set(by[3]) == {0, 9}  # max lands in the LAST bucket


@pytest.mark.spark
class TestUnionSearchApprox:
    def test_sketch_agrees_with_exact(self, spark):
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.discovery import (
            union_search,
            union_search_approx,
        )

        cells = []
        # query table 0: two 40-token columns
        cells += [(0, 0, i, f"a{i}") for i in range(40)]
        cells += [(0, 1, i, f"b{i}") for i in range(40)]
        # table 1: 30/40 overlap on both columns (strong union candidate)
        cells += [(1, 0, i, f"a{i}") for i in range(30)]
        cells += [(1, 1, i, f"b{i}") for i in range(30)]
        # table 2: weak overlap col 0 only
        cells += [(2, 0, i, f"a{i}") for i in range(8)] + [
            (2, 0, 100 + i, f"z{i}") for i in range(30)
        ]
        # table 3: disjoint
        cells += [(3, 0, i, f"q{i}") for i in range(40)]
        idx = LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        exact = union_search(idx, 0, k=5, min_jaccard=0.1).collect()
        approx = union_search_approx(
            idx, 0, k=5, sig_k=64, bands=16, min_jaccard=0.1
        ).collect()
        # deterministic md5 family: this is a fixed result, not a flaky one
        assert approx[0].table_id == exact[0].table_id == 1
        assert approx[0].n_matched_cols == 2
        # estimated score within sketch tolerance of the exact score
        assert abs(approx[0].score - exact[0].score) < 0.3
        assert all(r.table_id != 3 for r in approx)  # disjoint can't collide

    def test_signature_shape(self, spark):
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.discovery import (
            column_minhash_signatures,
        )

        cells = [(1, 0, i, f"t{i}") for i in range(20)]
        idx = LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        row = column_minhash_signatures(idx, k=16).collect()[0]
        assert len(row.sig) == 16 and row.n_distinct == 20
        # identical input -> identical signature (deterministic family)
        again = column_minhash_signatures(idx, k=16).collect()[0]
        assert row.sig == again.sig


@pytest.mark.spark
class TestSemanticTypes:
    def test_shapes_and_priority(self, spark):
        from datalake_indexes_spark.operators.discovery import semantic_types

        df = spark.createDataFrame(
            [
                ("1", "1.5", "2024-01-02", "abc", None),
                ("-42", "-0.25", "1999-12-31 23:59:59", "2", "x"),
                ("7", "3.0", "2000-06-15", "def", "y"),
            ],
            "ints string, decs string, dates string, mixed string, sparse string",
        )
        out = {r.col_name: r for r in semantic_types(df).collect()}
        assert out["ints"].sem_type == "integer" and out["ints"].frac_int == 1.0
        assert out["decs"].sem_type == "decimal"
        assert out["dates"].sem_type == "date"  # date and datetime forms
        assert out["mixed"].sem_type == "text"  # 1/3 integer < threshold
        assert out["sparse"].n_values == 2  # NULLs excluded from the base


@pytest.mark.spark
class TestDomainClusters:
    def test_transitive_domains_and_singleton(self, spark):
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.discovery import domain_clusters

        cells = []
        # chain 0-1-2: 0 shares vocab A with 1, 1 shares vocab B with 2
        cells += [(0, 0, i, f"a{i}") for i in range(10)]
        cells += [(1, 0, i, f"a{i}") for i in range(10)]
        cells += [(1, 1, i, f"b{i}") for i in range(10)]
        cells += [(2, 0, i, f"b{i}") for i in range(10)]
        # pair 5-6
        cells += [(5, 0, i, f"x{i}") for i in range(10)]
        cells += [(6, 0, i, f"x{i}") for i in range(10)]
        # singleton 9
        cells += [(9, 0, i, f"q{i}") for i in range(10)]
        idx = LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        got = {r.table_id: r.domain for r in domain_clusters(idx, rounds=4).collect()}
        # transitive closure: 2 reaches 0 through 1 even with no shared vocab
        assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 9: 9}


class TestFunctionalDependencies:
    def test_planted_fd_directions_and_constant_guard(self, spark):
        """col0 -> col1 holds (each id maps to one name), col1 -> col0
        fails (name 'b' maps to two ids), and the constant col2 is
        dropped by min_det_distinct."""
        from types import SimpleNamespace

        from datalake_indexes_spark.operators.discovery import (
            functional_dependencies,
        )

        rows = []
        data = [("1", "a", "k"), ("2", "b", "k"), ("3", "b", "k"), ("1", "a", "k")]
        for row_id, vals in enumerate(data):
            for col_id, v in enumerate(vals):
                rows.append((7, row_id, col_id, v))
        cells = spark.createDataFrame(
            rows, "table_id int, row_id long, col_id int, tokenized string"
        )
        out = {
            (r.det_col, r.dep_col): (r.holds, r.n_det_distinct)
            for r in functional_dependencies(SimpleNamespace(cells=cells)).collect()
        }
        assert out[(0, 1)] == (True, 3)
        assert out[(1, 0)] == (False, 2)
        # constant determinant filtered; constant as dependent still graded
        assert (2, 0) not in out and out[(0, 2)][0] is True


class TestJoinCardinalities:
    def test_sum_of_products_equals_real_join(self, spark):
        """The Σ cnt·cnt profile must equal the materialized inner-join
        row count, including the duplicate-value fan-out."""
        from types import SimpleNamespace

        from datalake_indexes_spark.operators.discovery import join_cardinalities

        # table 0 col 0: [x, x, y, z]; table 1 col 0: [x, y, y, y, w]
        vals = {0: ["x", "x", "y", "z"], 1: ["x", "y", "y", "y", "w"]}
        rows = [
            (t, r, 0, v) for t, col in vals.items() for r, v in enumerate(col)
        ]
        cells = spark.createDataFrame(
            rows, "table_id int, row_id long, col_id int, tokenized string"
        )
        out = join_cardinalities(
            SimpleNamespace(cells=cells), min_rows=1
        ).collect()
        assert len(out) == 1
        got = out[0]
        # real join: x pairs 2*1, y pairs 1*3 -> 5 rows, 2 common tokens
        assert (got.join_rows, got.n_common_tokens) == (5, 2)


def test_json_key_profile_types_and_coverage(spark):
    """Majority type per key, coverage against ALL rows (including rows
    where the key is absent), nulls counted as present but excluded from
    n_distinct, ties broken toward the lexicographically first type."""
    from datalake_indexes_spark.operators.discovery import json_key_profile

    rows = [
        (1, '{"a": 1, "b": "x"}'),
        (2, '{"a": 2, "b": "y", "c": true}'),
        (3, '{"a": 2.5, "b": null}'),
        (4, '{"a": 3}'),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    out = {r["key"]: r for r in json_key_profile(df, "props").collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert a["n_present"] == 4 and a["coverage"] == 1.0
    assert a["top_type"] == "int" and a["n_distinct"] == 4  # "2" vs "2.5"
    assert b["n_present"] == 3 and b["coverage"] == 0.75
    assert b["n_distinct"] == 2  # null excluded
    assert b["top_type"] == "string"
    assert c["n_present"] == 1 and c["top_type"] == "bool"


def test_k_anonymity_report_flags(spark):
    """Small class -> k risk; large class with constant sensitive value
    -> l-diversity risk; large diverse class is safe."""
    from datalake_indexes_spark.operators.discovery import k_anonymity_report

    rows = (
        [("us", "a", i * 1.0) for i in range(5)]          # big + diverse
        + [("us", "b", 7.0)] * 4                           # big + constant
        + [("de", "a", 1.0)]                               # singleton
    )
    df = spark.createDataFrame(rows, "country string, seg string, val double")
    out = {r["qi_value"]: r for r in
           k_anonymity_report(df, ["country", "seg"], "val", k=3).collect()}
    assert not out["us|a"]["at_risk"] and out["us|a"]["n_sensitive"] == 5
    assert out["us|b"]["at_risk"] and out["us|b"]["n_sensitive"] == 1
    assert out["de|a"]["at_risk"] and out["de|a"]["group_size"] == 1
    # without a sensitive column only the size rule applies
    out2 = {r["qi_value"]: r for r in
            k_anonymity_report(df, ["country", "seg"], k=3).collect()}
    assert not out2["us|b"]["at_risk"] and out2["us|b"]["n_sensitive"] is None


def test_suppress_small_groups_masks_only_risky(spark):
    """Sub-k rows get EVERY QI col masked and flagged; others pass
    through with native values stringified only for QI cols."""
    from datalake_indexes_spark.operators.discovery import suppress_small_groups

    rows = [("us", 1, 10.0), ("us", 1, 11.0), ("us", 1, 12.0), ("de", 2, 9.0)]
    df = spark.createDataFrame(rows, "country string, region int, val double")
    out = {(r["val"]): r for r in
           suppress_small_groups(df, ["country", "region"], k=2).collect()}
    assert out[9.0]["country"] == "*" and out[9.0]["region"] == "*"
    assert out[9.0]["suppressed"] is True
    assert out[10.0]["country"] == "us" and out[10.0]["region"] == "1"
    assert out[10.0]["suppressed"] is False
    # after suppression every surviving (country, region) class has >= k
    # members or is the masked class
    from collections import Counter
    sizes = Counter((r["country"], r["region"]) for r in out.values())
    assert all(n >= 2 or key == ("*", "*") for key, n in sizes.items())
    assert sizes[("*", "*")] == 1


def test_dp_group_counts_properties(spark):
    """Determinism (same seed -> same release), seed rotation changes
    draws, noise is Laplace-bounded-ish and clamped at zero."""
    from datalake_indexes_spark.operators.discovery import dp_group_counts

    rows = [(f"g{i % 7}", i) for i in range(200)] + [("tiny", 0)]
    df = spark.createDataFrame(rows, "grp string, x long")
    a = {r["group_value"]: r["noisy_count"]
         for r in dp_group_counts(df, ["grp"], epsilon=1.0).collect()}
    b = {r["group_value"]: r["noisy_count"]
         for r in dp_group_counts(df, ["grp"], epsilon=1.0).collect()}
    assert a == b  # fixed seed: one release, replayed identically
    c = {r["group_value"]: r["noisy_count"]
         for r in dp_group_counts(df, ["grp"], epsilon=1.0, seed="dp2").collect()}
    assert c != a  # budget-charged rotation draws fresh noise
    assert all(v >= 0 for v in a.values())
    # with eps=1 the true count 29ish gets noise of a few units, not 100s
    assert all(abs(v - (29 if k != "tiny" else 1)) < 25
               for k, v in a.items() if k != "tiny")


def test_dp_group_sums_clipping_and_determinism(spark):
    """Clipping bounds each contribution (an outlier moves the released
    sum by at most hi), and the draw is seed-deterministic."""
    from datalake_indexes_spark.operators.discovery import dp_group_sums

    base = [("a", 10.0)] * 20 + [("b", 10.0)] * 20
    outlier = base + [("a", 1_000_000.0)]
    df1 = spark.createDataFrame(base, "grp string, v double")
    df2 = spark.createDataFrame(outlier, "grp string, v double")
    r1 = {r["group_value"]: r["noisy_sum"] for r in
          dp_group_sums(df1, ["grp"], "v", lo=0.0, hi=50.0).collect()}
    r2 = {r["group_value"]: r["noisy_sum"] for r in
          dp_group_sums(df2, ["grp"], "v", lo=0.0, hi=50.0).collect()}
    assert r2["b"] == r1["b"]  # untouched group: identical release
    assert abs(r2["a"] - r1["a"]) <= 50.0  # outlier clipped to hi
    # same seed -> same release
    assert r1 == {r["group_value"]: r["noisy_sum"] for r in
                  dp_group_sums(df1, ["grp"], "v", lo=0.0, hi=50.0).collect()}


def test_fk_consistent_sample_preserves_children(spark):
    """Every sampled parent keeps ALL its children; no orphan children."""
    from datalake_indexes_spark.operators.sampling import fk_consistent_sample

    parents = spark.range(100).select(F.col("id").alias("pk"))
    children = (
        spark.range(400)
        .select((F.col("id") % 100).alias("fk"), F.col("id").alias("cid"))
    )
    out = fk_consistent_sample(
        parents, {"kids": (children, "fk")}, "pk", fraction=0.3
    )
    sampled_keys = {r["pk"] for r in out["parent"].collect()}
    kid_rows = out["kids"].collect()
    assert {r["fk"] for r in kid_rows} == sampled_keys  # no orphans, none lost
    # each surviving parent keeps its FULL child set (4 each here)
    from collections import Counter

    per_parent = Counter(r["fk"] for r in kid_rows)
    assert all(v == 4 for v in per_parent.values())
    # deterministic: same sample on re-run over re-partitioned input
    again = fk_consistent_sample(
        parents.repartition(7), {"kids": (children, "fk")}, "pk", 0.3
    )
    assert {r["pk"] for r in again["parent"].collect()} == sampled_keys


def test_pseudonymize_properties(spark):
    """Deterministic tokens, NULL passthrough, join-preservation across
    tables sharing the secret, and re-keying under a new secret."""
    from datalake_indexes_spark.operators.discovery import pseudonymize_columns

    a = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (None, "carol")], "uid int, name string"
    )
    b = spark.createDataFrame([(1, 9.5), (2, 1.5)], "uid int, score double")
    pa = pseudonymize_columns(a, ["uid"], "s3cret")
    pb = pseudonymize_columns(b, ["uid"], "s3cret")
    # joinable on the token exactly like on the raw key
    assert pa.join(pb, "uid").count() == 2
    rows = {r["name"]: r["uid"] for r in pa.collect()}
    assert rows["alice"] != "1" and len(rows["alice"]) == 16
    # NULL stays NULL (not a linkable constant)
    assert rows["carol"] is None
    # new secret -> disjoint token space (unlinkable releases)
    pa2 = pseudonymize_columns(a, ["uid"], "other")
    toks1 = {r["uid"] for r in pa.collect()} - {None}
    toks2 = {r["uid"] for r in pa2.collect()} - {None}
    assert toks1.isdisjoint(toks2)


def test_shuffle_skew_report_hand_example(spark):
    """Planted hot key: 10 rows of 'hot', 1 each of 5 cold keys."""
    from datalake_indexes_spark.operators.discovery import shuffle_skew_report

    rows = [("hot",)] * 10 + [(f"c{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, "k string")
    r = shuffle_skew_report(df, ["k"]).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_per_key"]) == (15, 6, 10)
    assert r["hottest_key"] == "hot"
    assert r["avg_per_key"] == 2.5
    assert r["skew_ratio"] == 4.0
    assert r["p50_per_key"] == 1.0


@pytest.mark.spark
class TestJoinPaths:
    def _deps(self, spark, rows):
        return spark.createDataFrame(
            rows, "table_a int, col_a int, table_b int, col_b int, containment double"
        )

    def test_enumerates_acyclic_paths(self, spark):
        from datalake_indexes_spark.operators.discovery import join_paths

        deps = self._deps(spark, [
            (0, 0, 1, 0, 1.0),   # 0 -> 1
            (1, 1, 2, 0, 1.0),   # 1 -> 2
            (0, 1, 2, 1, 1.0),   # direct 0 -> 2
            (2, 0, 0, 0, 1.0),   # back edge (cycle bait)
            (1, 0, 3, 0, 0.5),   # below containment threshold
        ])
        out = sorted((r.hops, r.path) for r in
                     join_paths(deps, 0, 2, max_hops=3).collect())
        assert out == [
            (1, "0.1>2.1"),
            (2, "0.0>1.0|1.1>2.0"),
        ]

    def test_hop_cap_and_no_revisit(self, spark):
        from datalake_indexes_spark.operators.discovery import join_paths

        # ring 0->1->2->3->0: only path 0->3 is 3 hops; cap 2 finds none
        ring = [(i, 0, (i + 1) % 4, 0, 1.0) for i in range(4)]
        deps = self._deps(spark, ring)
        assert join_paths(deps, 0, 3, max_hops=2).count() == 0
        three = join_paths(deps, 0, 3, max_hops=5).collect()
        # exactly one acyclic route despite the cycle
        assert [(r.hops, r.path) for r in three] == [(3, "0.0>1.0|1.0>2.0|2.0>3.0")]

    def test_invalid_hops_raise(self, spark):
        from datalake_indexes_spark.operators.discovery import join_paths

        deps = self._deps(spark, [(0, 0, 1, 0, 1.0)])
        with pytest.raises(ValueError, match="max_hops"):
            join_paths(deps, 0, 1, max_hops=0)


class TestKAnonymityAudit:
    def test_planted_classes(self, spark):
        """Known equivalence classes: sizes 3/2/1 with a NULL quasi class
        of its own, and one class whose sensitive value never varies."""
        from datalake_indexes_spark.operators.discovery import k_anonymity_audit

        rows = [
            # class (a, x): 3 rows, sensitive {10, 10, 20} -> l = 2
            ("a", "x", 10), ("a", "x", 10), ("a", "x", 20),
            # class (a, y): 2 rows, one sensitive value -> l = 1
            ("a", "y", 5), ("a", "y", 5),
            # class (NULL, x): its own class, 1 row -> k_anonymity = 1
            (None, "x", 7),
        ]
        df = spark.createDataFrame(rows, "q1 string, q2 string, s long")
        r = k_anonymity_audit(df, ["q1", "q2"], k=2, sensitive_col="s").collect()[0]
        assert (r.k_required, r.n_rows, r.n_groups) == (2, 6, 3)
        assert r.k_anonymity == 1          # the NULL singleton class
        assert r.n_rows_below_k == 1
        assert r.l_diversity == 1          # the (a, y) class leaks s
        assert r.frac_rows_below_k == 1 / 6

    def test_without_sensitive_and_all_safe(self, spark):
        from datalake_indexes_spark.operators.discovery import k_anonymity_audit

        rows = [("a", 1)] * 4 + [("b", 2)] * 5
        df = spark.createDataFrame(rows, "q string, v long")
        r = k_anonymity_audit(df, ["q"], k=3).collect()[0]
        assert (r.k_anonymity, r.n_rows_below_k, r.frac_rows_below_k) == (4, 0, 0.0)
        assert "l_diversity" not in r.asDict()
