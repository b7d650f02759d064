"""Cell tokenization — the engine's single text-normalization definition.

Semantics follow the reference tokenizer (``maco/util.py:11-31``
``get_cleaned_text``): drop non-ASCII bytes, fold every non-alphanumeric run
to a single space, lowercase, strip a fixed 32-word stopword list, trim, and
truncate to 200 chars (``maco/data_handler.py:32,406``).

The same normalization is emitted in two dialects so the Spark engine and the
DuckDB oracle are guaranteed to agree:

- :func:`tokenize_col` — a native Spark ``Column`` expression chain (stays in
  whole-stage codegen; no Python UDF in the hot path),
- :func:`tokenize_sql` — the identical chain as SQL text for a given dialect
  (``"spark"`` or ``"duckdb"``; DuckDB needs the explicit ``'g'`` regexp flag).

Known deviation from the reference (documented + PINNED by adversarial
goldens in ``tests/test_tokenizer.py``): the reference removes stopwords by
sequential ``str.replace`` per stopword (order-dependent, space-sharing);
we apply a word-boundary regex twice.  The two differ exactly when (a) the
input contains two or more ADJACENT stopwords — the reference keeps
sequential-replace survivors (``"a a"`` → ``"a"``), the regex form usually
removes the run (and leaves its own survivor on 4+ same-word runs) — or
(b) the input IS a single bare stopword, which the reference keeps (it only
replaces stopwords adjacent to a space) and we drop.  Engine and oracle
share the regex form, so correctness checks are internally consistent; a
bit-exact Python port of the reference (:func:`clean_text_ref`) is kept for
golden-parity tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# maco/util.py:14-16 — fixed stopword list (order matters only for the
# reference's sequential-replace quirk, not for our regex form).
STOPWORDS: list[str] = [
    "a", "the", "of", "on", "in", "an", "and", "is", "at", "are", "as",
    "be", "but", "by", "for", "it", "no", "not", "or", "such", "that",
    "their", "there", "these", "to", "was", "with", "they", "will",
    "v", "ve", "d",
]

# maco/data_handler.py:32 — MAX_TOKEN_LENGTH
MAX_TOKEN_LENGTH = 200

# Null-ish canonical tokens: mate.py:185-190 uses {'', 'nan', 'unknown'};
# data_handler.py:687-689 additionally treats {'null', 'none'} on read-back.
NULLISH_TOKENS: list[str] = ["", "nan", "unknown", "null", "none"]

_STOPWORD_ALT = "|".join(STOPWORDS)
# one space, a stopword, one space — replacement re-inserts a single space.
_STOPWORD_PATTERN = f" ({_STOPWORD_ALT}) "
_NON_ASCII = "[^\\x00-\\x7F]"
_NON_ALNUM = "[^a-zA-Z0-9]+"


def tokenize_col(col: Column | str) -> Column:
    """Native Spark expression chain implementing the tokenizer (P1-P3)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    s = F.regexp_replace(s, _NON_ASCII, "")
    s = F.lower(F.regexp_replace(s, _NON_ALNUM, " "))
    # pad so ^/$ stopwords match; two passes cover consecutive stopwords
    s = F.concat(F.lit(" "), s, F.lit(" "))
    s = F.regexp_replace(s, _STOPWORD_PATTERN, " ")
    s = F.regexp_replace(s, _STOPWORD_PATTERN, " ")
    s = F.trim(s)
    # NULL cells tokenize to the empty token (explicit, dialect-independent)
    return F.coalesce(F.substring(s, 1, MAX_TOKEN_LENGTH), F.lit(""))


def tokenize_arrow(arr):
    """The identical tokenizer chain over a ``pyarrow`` string array —
    RE2-vectorized for executor-side batch work (the index build
    tokenizes only each batch's *unique* raw strings through this and
    expands with a take).

    Parity with :func:`tokenize_col` is exact on this chain's domain:
    after the non-ASCII strip the string is pure ASCII, where Java
    regex, RE2 and Python ``re`` agree on every pattern used here
    (verified cell-for-cell over all testdata SFs plus adversarial
    goldens in tests/test_tokenizer.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    s = pc.replace_substring_regex(arr, _NON_ASCII, "")
    s = pc.utf8_lower(pc.replace_substring_regex(s, _NON_ALNUM, " "))
    s = pc.binary_join_element_wise(pa.scalar(" "), s, pa.scalar(" "), "")
    s = pc.replace_substring_regex(s, _STOPWORD_PATTERN, " ")
    s = pc.replace_substring_regex(s, _STOPWORD_PATTERN, " ")
    s = pc.utf8_trim_whitespace(s)
    s = pc.utf8_slice_codeunits(s, 0, MAX_TOKEN_LENGTH)
    return pc.fill_null(s, "")


def tokenize_sql(expr: str, dialect: str = "duckdb") -> str:
    """The identical tokenizer as SQL text (for the DuckDB oracle)."""
    if dialect == "duckdb":
        # DuckDB string literals keep backslashes verbatim; RE2 sees \x00
        def rr(e: str, pat: str, rep: str) -> str:
            return f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
        cast = f"CAST({expr} AS VARCHAR)"
        non_ascii = _NON_ASCII
    elif dialect == "spark":
        # Spark SQL string literals process backslash escapes -> double them
        def rr(e: str, pat: str, rep: str) -> str:
            return f"regexp_replace({e}, '{pat}', '{rep}')"
        cast = f"CAST({expr} AS STRING)"
        non_ascii = _NON_ASCII.replace("\\", "\\\\")
    else:  # pragma: no cover
        raise ValueError(f"unknown dialect: {dialect}")

    s = rr(cast, non_ascii, "")
    s = f"lower({rr(s, _NON_ALNUM, ' ')})"
    s = f"' ' || {s} || ' '"
    s = rr(f"({s})", _STOPWORD_PATTERN, " ")
    s = rr(s, _STOPWORD_PATTERN, " ")
    return f"coalesce(substring(trim({s}), 1, {MAX_TOKEN_LENGTH}), '')"


def null_canonicalize_col(col: Column | str, extended: bool = False) -> Column:
    """P4 — map null-ish tokens to NULL.

    ``extended=False`` matches the MATE input prep set ('', 'nan',
    'unknown'); ``extended=True`` adds 'null'/'none' (read-back set).
    """
    c = F.col(col) if isinstance(col, str) else col
    tokens = NULLISH_TOKENS if extended else NULLISH_TOKENS[:3]
    return F.when(c.isin(tokens), F.lit(None)).otherwise(c)


def null_canonicalize_sql(expr: str, extended: bool = False) -> str:
    tokens = NULLISH_TOKENS if extended else NULLISH_TOKENS[:3]
    in_list = ", ".join(f"'{t}'" for t in tokens)
    return f"(CASE WHEN {expr} IN ({in_list}) THEN NULL ELSE {expr} END)"


# ---------------------------------------------------------------------------
# Reference-parity Python implementation (golden tests / pandas fallback)
# ---------------------------------------------------------------------------

_RE_NON_ALNUM = re.compile(r"[\W_]+")
_RE_SPACES = re.compile(r" +")


def clean_text_ref(text: object) -> str:
    """Bit-exact Python equivalent of the reference tokenizer
    (maco/util.py:11-31), kept for parity tests only — the engine hot path
    uses :func:`tokenize_col`."""
    folded = str(text).encode("ascii", "ignore").decode("ascii")
    cleaned = _RE_NON_ALNUM.sub(" ", folded).lower()
    out = _RE_SPACES.sub(" ", cleaned).strip()
    for w in STOPWORDS:
        out = out.replace(f" {w} ", " ")
        if out.startswith(f"{w} "):
            out = out[len(w) + 1:]
        if out.endswith(f" {w}"):
            out = out[: -(len(w) + 1)]
    # reference then strips punctuation chars — a no-op here because the
    # \W fold above already removed them; kept out intentionally.
    return out


_PY_NON_ASCII = re.compile(_NON_ASCII)
_PY_NON_ALNUM = re.compile(_NON_ALNUM)
_PY_STOPWORD = re.compile(_STOPWORD_PATTERN)


def tokenize_py(text: object) -> str:
    """Driver-side twin of :func:`tokenize_col` (same regex chain — ``re.sub``
    and Java ``regexp_replace`` share non-overlapping restart semantics).

    Diverges from :func:`clean_text_ref` only on runs of consecutive
    stopwords (the documented deviation in the module docstring).
    """
    if text is None:
        return ""
    s = _PY_NON_ASCII.sub("", str(text))
    s = _PY_NON_ALNUM.sub(" ", s).lower()
    s = f" {s} "
    s = _PY_STOPWORD.sub(" ", s)
    s = _PY_STOPWORD.sub(" ", s)
    return s.strip()[:MAX_TOKEN_LENGTH]


_ACCENTED = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
_FOLDED = "aaaaaaceeeeiiiinooooouuuuyy"


def canonicalize_text_col(
    col: Column,
    lower: bool = True,
    fold_accents: bool = True,
    digits_to_zero: bool = True,
    strip_punct: bool = True,
) -> Column:
    """CCNet-style text canonicalization for dedup keys: lowercase,
    Latin-1 accent folding (literal ``translate`` map — deterministic and
    DuckDB-replicable, unlike locale-dependent unicode normalizers),
    digits → ``0`` (version/date churn stops defeating exact dedup),
    punctuation → space, whitespace squashed + trimmed.  Pure native
    expressions; every step stays in whole-stage codegen."""
    out = col
    if lower:
        out = F.lower(out)
    if fold_accents:
        out = F.translate(out, _ACCENTED, _FOLDED)
    if digits_to_zero:
        out = F.regexp_replace(out, "[0-9]", "0")
    if strip_punct:
        out = F.regexp_replace(out, "[^a-z0 ]", " ")
    out = F.trim(F.regexp_replace(out, " +", " "))
    return out
