"""Cell-index build — one declarative job per lake (SURVEY.md §3.A).

The reference builds its inverted index with a per-file Python loop that
stringifies, tokenizes, hashes and COPYs row-by-row
(``maco/data_handler.py:258-420``).  Here the whole build is a Spark
pipeline: stringify + tokenize as native expressions, wide→long unpivot via
``stack``, XASH via one Arrow-batched pandas UDF, and the per-row super key
as a ``bit_or`` aggregation — no driver-side iteration, scales with
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_indexes_spark.functions.text import tokenize_col
from datalake_indexes_spark.functions.xash import xash_pandas_udf
from datalake_indexes_spark.index.lake_index import LakeIndex
from datalake_indexes_spark.sources.catalog import LakeTableSpec


_NUMERIC_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double")


def with_global_row_number(df: DataFrame, order_by: list[str], out_col: str = "row_id") -> DataFrame:
    """Deterministic 0-based global row number by a total order — distributed.

    A bare ``row_number() OVER (ORDER BY ...)`` collapses to a single
    partition.  When the leading order key is numeric, rows are bucketed by
    an explicit value-range rule — a *pure function of the data*, unlike
    ``repartitionByRange``'s sampled boundaries — so local ranks and the
    per-bucket offset aggregate can live in ONE lazy plan with no cache and
    no driver-side collect (the only eager work is a narrow min/max scan).
    Bucket skew only affects parallelism, never the assigned numbers.

    Non-numeric leading keys fall back to sampled range partitioning, where
    the cache + offset collect is what pins the sampled assignment.
    """
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    first = order_by[0]
    dtype = dict(df.dtypes).get(first, "")
    if dtype in _NUMERIC_TYPES:
        mn, mx = df.agg(F.min(first), F.max(first)).first()
        if mn is not None:
            span = float(mx) - float(mn) + 1.0
            # monotone non-decreasing in the key, so bucket boundaries
            # respect the sort order; nulls sort first (Spark asc default)
            bucket = F.least(
                F.lit(n_part - 1),
                F.floor((F.col(first).cast("double") - float(mn)) / span * n_part),
            ).cast("int")
            b = df.withColumn("__pid", F.when(F.col(first).isNull(), -1).otherwise(bucket))
            local = b.withColumn(
                "__local_rn",
                F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by)),
            )
            counts = b.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
            offsets = counts.withColumn(
                "__offset",
                F.coalesce(
                    F.sum("__cnt").over(
                        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            return (
                local.join(F.broadcast(offsets.select("__pid", "__offset")), "__pid")
                .withColumn(
                    out_col, (F.col("__offset") + F.col("__local_rn") - 1).cast("long")
                )
                .drop("__pid", "__local_rn", "__offset")
            )

    ranged = df.repartitionByRange(n_part, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.withColumn(
        "__local_rn",
        F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by)),
    )
    # repartitionByRange samples its boundaries; pin the partitioning so the
    # offsets computed below and the final join see the same assignment
    ranged = ranged.cache()
    counts = (
        ranged.groupBy("__pid").count().orderBy("__pid").collect()
    )
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["count"]
    offset_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    return (
        ranged.join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, (F.col("__offset") + F.col("__local_rn") - 1).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )


def unpivot_to_cells(
    df: DataFrame, spec: LakeTableSpec, hash_udf=None, tok_hash_udf=None
) -> DataFrame:
    """P7 — wide→long: one output row per cell, tokenized (P1-P3).

    Tokenization runs as native expressions *before* the stack so every
    column stays inside whole-stage codegen.

    With ``hash_udf`` the output additionally carries the per-ROW super
    key (``super_key_hi``/``super_key_lo``) computed entirely inside the
    map stage: every cell of a physical row is produced by the same scan
    task (the stack is row-local), so the OR-fold over the row's cell
    hashes is a native column expression over the wide format — no
    window, no aggregation, NO SHUFFLE.  The previous shape (hash the
    long format, then ``bit_or`` over a (table_id, row_id) window)
    shuffled every tokenized cell and sorted it per row; this one only
    needs a shuffle if the caller wants the output clustered.
    """
    cols = df.select(*dict.fromkeys([*spec.order_by, *spec.cols]))
    if spec.row_id_expr is not None:
        # the catalog vouches the key is the dense 0-based ordinal — row_id
        # is a projection, no row-numbering job at all
        wide = cols.withColumn("row_id", F.col(spec.row_id_expr).cast("long"))
    else:
        wide = with_global_row_number(cols, list(spec.order_by))
    n = len(spec.cols)
    if tok_hash_udf is not None:
        # fused tokenize+hash (guide §4.2): one Arrow crossing per column;
        # tokenization and hashing run only over each batch's unique raw
        # values inside the UDF.  The JVM keeps the cast (its string
        # formatting is part of the token contract).
        wide = wide.select(
            "row_id",
            *[
                tok_hash_udf(F.col(c).cast("string")).alias(f"__s_{i}")
                for i, c in enumerate(spec.cols)
            ],
        )
        hi, lo = F.col("__s_0.hi"), F.col("__s_0.lo")
        for i in range(1, n):
            hi = hi.bitwiseOR(F.col(f"__s_{i}.hi"))
            lo = lo.bitwiseOR(F.col(f"__s_{i}.lo"))
        stack_args = ", ".join(f"{i}, __s_{i}.tok" for i in range(n))
        return (
            wide.withColumn("super_key_hi", hi)
            .withColumn("super_key_lo", lo)
            .selectExpr(
                "row_id",
                "super_key_hi",
                "super_key_lo",
                f"stack({n}, {stack_args}) as (col_id, tokenized)",
            )
            .withColumn("table_id", F.lit(spec.table_id))
            .select(
                "table_id", "col_id", "row_id", "tokenized",
                "super_key_hi", "super_key_lo",
            )
        )
    tokenized_cols = [
        tokenize_col(F.col(c)).alias(f"__tok_{i}") for i, c in enumerate(spec.cols)
    ]
    wide = wide.select("row_id", *tokenized_cols)
    stack_args = ", ".join(f"{i}, __tok_{i}" for i in range(n))
    if hash_udf is not None:
        hashed = wide.select(
            "row_id",
            *[F.col(f"__tok_{i}") for i in range(n)],
            *[hash_udf(F.col(f"__tok_{i}")).alias(f"__h_{i}") for i in range(n)],
        )
        hi, lo = F.col("__h_0.hi"), F.col("__h_0.lo")
        for i in range(1, n):
            hi = hi.bitwiseOR(F.col(f"__h_{i}.hi"))
            lo = lo.bitwiseOR(F.col(f"__h_{i}.lo"))
        hashed = hashed.withColumn("super_key_hi", hi).withColumn("super_key_lo", lo)
        return (
            hashed.selectExpr(
                "row_id",
                "super_key_hi",
                "super_key_lo",
                f"stack({n}, {stack_args}) as (col_id, tokenized)",
            )
            .withColumn("table_id", F.lit(spec.table_id))
            .select(
                "table_id", "col_id", "row_id", "tokenized",
                "super_key_hi", "super_key_lo",
            )
        )
    return (
        wide.selectExpr(
            "row_id",
            f"stack({n}, {stack_args}) as (col_id, tokenized)",
        )
        .withColumn("table_id", F.lit(spec.table_id))
        .select("table_id", "col_id", "row_id", "tokenized")
    )


def build_keyed_cells(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    specs: dict[str, LakeTableSpec],
    hash_size: int = 128,
    rotation: bool = True,
    number_of_ones: int = 5,
    hash_function=None,
) -> DataFrame:
    """The denormalized keyed cell view (cells + per-row super key) built
    SHUFFLE-FREE: per-table wide-format hash + native OR-fold inside the
    scan stage (see :func:`unpivot_to_cells`), unioned across the lake.

    Output partitioning is the scan partitioning — callers that want the
    (table_id, row_id)-clustered layout (exchange-free row joins against
    the cached index) add one explicit ``repartition("table_id",
    "row_id")``, which replaces the old window shuffle 1:1 but drops the
    window's per-row sort+aggregate entirely.
    """
    hash_udf = None
    tok_hash_udf = None
    if hash_function is not None:
        from datalake_indexes_spark.functions.hashes import hash_pandas_udf

        hash_udf = hash_pandas_udf(hash_function)
    else:
        from datalake_indexes_spark.functions.xash import tokenize_xash_pandas_udf

        tok_hash_udf = tokenize_xash_pandas_udf(
            hash_size=hash_size, rotation=rotation, number_of_ones=number_of_ones
        )
    active = [(n, s) for n, s in specs.items() if n in tables]
    if not active:
        raise ValueError("build_keyed_cells: no tables to index (empty lake)")
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(active), 8) or 1) as pool:
        parts = list(
            pool.map(
                lambda ns: unpivot_to_cells(
                    tables[ns[0]], ns[1], hash_udf=hash_udf,
                    tok_hash_udf=tok_hash_udf,
                ),
                active,
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def lake_headers(spark: SparkSession, tables: dict[str, DataFrame],
                 specs: dict[str, LakeTableSpec]) -> DataFrame:
    """(table_id, col_id, header, header_tokenized) for the active lake —
    driver-side metadata, one tiny createDataFrame."""
    header_rows = []
    for name, spec in specs.items():
        if name not in tables:
            continue
        for col_id, col in enumerate(spec.cols):
            header_rows.append((spec.table_id, col_id, col))
    return spark.createDataFrame(
        header_rows, "table_id int, col_id int, header string"
    ).withColumn("header_tokenized", tokenize_col(F.col("header")))


def row_keys_for(cells: DataFrame, hash_udf, distinct_tokens: bool = False) -> DataFrame:
    """Per-row super keys from any (hi, lo) hash UDF: OR-fold over the
    row's cell hashes (data_handler.py:280-283) — supports the reference's
    pluggable ``hash_function`` knob (data_handler.py:89,109).

    ``distinct_tokens=True`` runs the Python hash over the *global distinct
    token set* only and joins the pair back onto cells — the Arrow crossing
    shrinks from O(cells) to O(vocabulary), at the price of a full-lake
    shuffle join on the token string.  Measured at sf0.1 (4.7M cells, 166k
    vocabulary, local[32]): distinct-token 2.1-3.7s vs per-cell memo UDF
    0.7-1.1s — the memo already makes Python work O(vocabulary-per-worker)
    and the columnar Arrow crossing is cheaper than two extra shuffles, so
    the per-cell path is the default.  Flip to True only when the hash
    itself dominates (near-unique vocabulary with an expensive hash_fn,
    where per-worker memos never hit).
    """
    if distinct_tokens:
        hashed = (
            cells.select("tokenized")
            .distinct()
            .withColumn("__h", hash_udf(F.col("tokenized")))
        )
        keyed = cells.join(hashed, "tokenized")
    else:
        keyed = cells.withColumn("__h", hash_udf(F.col("tokenized")))
    return keyed.groupBy("table_id", "row_id").agg(
        F.bit_or(F.col("__h.hi")).alias("super_key_hi"),
        F.bit_or(F.col("__h.lo")).alias("super_key_lo"),
    )


def token_stats_for(
    cells: DataFrame, threshold: int = 100_000, cap: int = 1024
) -> DataFrame:
    """(tokenized, cnt) for the ``cap`` hottest tokens with ≥ ``threshold``
    postings — the index-time statistic behind MATE's hot-token salting
    (a token-equi shuffle join funnels each of these through one task).
    One map-side-combined aggregation; the output is ≤ cap rows."""
    return (
        cells.groupBy("tokenized")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
        .orderBy(F.desc("cnt"), F.asc("tokenized"))
        .limit(cap)
    )


def build_index(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    specs: dict[str, LakeTableSpec],
    with_super_keys: bool = True,
    hash_size: int = 128,
    rotation: bool = True,
    number_of_ones: int = 5,
    hash_function=None,
    with_token_stats: bool = False,
    hot_token_threshold: int = 100_000,
) -> LakeIndex:
    """Build the full LakeIndex from raw lake tables.

    Mirrors ``DataHandler.update_index`` (data_handler.py:641-651) as one
    declarative job: cells = union of per-table unpivots; super keys =
    ``bit_or(xash(token))`` per row (data_handler.py:280-283); headers and
    table_info as side aggregates.
    """
    # per-table prep (row numbering triggers one small collect each) runs
    # in parallel threads — Spark schedules the 10 jobs concurrently
    # instead of serializing their startup latency
    from concurrent.futures import ThreadPoolExecutor

    active = [(n, s) for n, s in specs.items() if n in tables]
    with ThreadPoolExecutor(max_workers=min(len(active), 8) or 1) as pool:
        cell_parts = list(
            pool.map(lambda ns: unpivot_to_cells(tables[ns[0]], ns[1]), active)
        )
    header_rows = []
    for name, spec in active:
        for col_id, col in enumerate(spec.cols):
            header_rows.append((spec.table_id, col_id, col))

    if not cell_parts:
        raise ValueError("build_index: no tables to index (empty lake)")
    cells = cell_parts[0]
    for part in cell_parts[1:]:
        cells = cells.unionByName(part)

    headers = spark.createDataFrame(
        header_rows, "table_id int, col_id int, header string"
    ).withColumn("header_tokenized", tokenize_col(F.col("header")))

    table_names = spark.createDataFrame(
        [(spec.table_id, name) for name, spec in specs.items() if name in tables],
        "table_id int, dataset_name string",
    )
    table_info = (
        cells.groupBy("table_id")
        .agg(
            F.max("row_id").alias("max_row_id"),
            F.max("col_id").cast("int").alias("max_col_id"),
        )
        .join(F.broadcast(table_names), "table_id")
        .select("table_id", "dataset_name", "max_row_id", "max_col_id")
    )

    if with_super_keys:
        if hash_function is not None:
            from datalake_indexes_spark.functions.hashes import hash_pandas_udf

            hash_udf = hash_pandas_udf(hash_function)
        else:
            hash_udf = xash_pandas_udf(
                hash_size=hash_size, rotation=rotation, number_of_ones=number_of_ones
            )
        row_keys = row_keys_for(cells, hash_udf)
    else:
        row_keys = (
            cells.groupBy("table_id", "row_id")
            .agg(
                F.lit(0).cast("long").alias("super_key_hi"),
                F.lit(0).cast("long").alias("super_key_lo"),
            )
        )

    from datalake_indexes_spark.operators.cocoa import is_numeric_flags

    return LakeIndex(
        cells=cells,
        row_keys=row_keys,
        column_headers=headers,
        table_info=table_info,
        col_flags=is_numeric_flags(cells),
        token_stats=(
            token_stats_for(cells, threshold=hot_token_threshold)
            if with_token_stats
            else None
        ),
    )
