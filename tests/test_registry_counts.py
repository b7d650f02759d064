"""Close-ritual guard: documented registry counts == the live registry.

Round-7 verdict nit #3: docs drifted to "260 keys, 258 oracled" while the
registry held 261/259 because a key landed after the doc fix.  This test
makes that class of drift a pytest failure: the canonical count lines in
README.md, PLANS.md and the verify skill must match
``len(QUERIES)`` / ``len(ORACLES)`` exactly.

Each doc keeps ONE canonical marker phrasing (asserted on its LAST
occurrence, so historical narrative mentions of older counts are fine):

- README.md        ``N driver\nqueries, M DuckDB-oracled``  (round-state para)
- PLANS.md         ``**N keys, M oracled**``                 (session close)
- verify SKILL.md  ``(N queries as of round``                (gate section)
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _live_counts() -> tuple[int, int]:
    from datalake_indexes_spark.plans.queries import ORACLES, QUERIES

    return len(QUERIES), len(ORACLES)


def _last_match(path: Path, pattern: str) -> tuple[int, ...]:
    text = path.read_text()
    matches = re.findall(pattern, text, flags=re.S)
    assert matches, f"no count marker matching {pattern!r} in {path.name}"
    last = matches[-1]
    return tuple(int(g) for g in (last if isinstance(last, tuple) else (last,)))


def test_readme_counts_match_registry():
    n_q, n_o = _live_counts()
    got = _last_match(
        REPO / "README.md", r"(\d+) driver\s+queries,\s*(\d+) DuckDB-oracled"
    )
    assert got == (n_q, n_o), (
        f"README.md says {got[0]} queries / {got[1]} oracled; "
        f"registry has {n_q}/{n_o} — update the round-state paragraph"
    )


def test_plans_counts_match_registry():
    n_q, n_o = _live_counts()
    got = _last_match(REPO / "PLANS.md", r"\*\*(\d+) keys, (\d+) oracled\*\*")
    assert got == (n_q, n_o), (
        f"PLANS.md says {got[0]} keys / {got[1]} oracled; "
        f"registry has {n_q}/{n_o} — update the session-close line"
    )


def test_verify_skill_count_matches_registry():
    n_q, _ = _live_counts()
    skill = REPO / ".claude" / "skills" / "verify" / "SKILL.md"
    got = _last_match(skill, r"\((\d+) queries as of round")
    assert got == (n_q,), (
        f"verify SKILL.md says {got[0]} queries; registry has {n_q} — "
        f"update the correctness-gate section"
    )


def test_every_query_has_callable_and_oracle_is_subset():
    from datalake_indexes_spark.plans.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    missing_oracle = sorted(set(QUERIES) - set(ORACLES))
    # the two documented rows-only residuals are the accepted floor
    assert missing_oracle == ["ml_pca_project", "text_compressibility"], (
        f"non-oracled keys changed: {missing_oracle} — update this pin AND "
        f"the docs if a new rows-only key is genuinely non-SQL-expressible"
    )
