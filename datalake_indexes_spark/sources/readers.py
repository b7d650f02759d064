"""Lake file readers — format dispatch (SURVEY.md §2.1 S1-S6).

The reference sniffs CSV dialects with ``csv.Sniffer`` and falls back to
latin-1 (``maco/data_handler.py:567-624``); we sniff the delimiter from a
one-line driver-side sample and hand the real read to Spark's vectorized
CSV/JSON/Parquet sources so scans stay JVM-side with pushdown intact.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession

_CSV_DELIMS = [",", ";", "\t", "|"]


def _sniff_delimiter(spark: SparkSession, path: str) -> str:
    """Pick the CSV delimiter from the first line (S1)."""
    head = spark.read.text(path).limit(1).collect()
    if not head:
        return ","
    line = head[0][0]
    try:
        return csv.Sniffer().sniff(line, delimiters="".join(_CSV_DELIMS)).delimiter
    except csv.Error:
        counts = {d: line.count(d) for d in _CSV_DELIMS}
        return max(counts, key=counts.get)


def read_arff(spark: SparkSession, path: str) -> DataFrame:
    """ARFF reader (S5, data_handler.py:518-547): driver-side parse of the
    @attribute header + CSV data section into an all-string DataFrame.
    ARFF files are small curated datasets — driver parsing then
    parallelizing is the right shape (no distributed ARFF source exists)."""
    import csv as _csv
    import re as _re

    # attribute names may be 'single'- or "double"-quoted (ARFF spec)
    attr_re = _re.compile(
        r"@attribute\s+(?:'([^']*)'|\"([^\"]*)\"|(\S+))", _re.IGNORECASE
    )
    cols: list[str] = []
    rows: list[list[str | None]] = []
    in_data = False
    with open(path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            low = line.lower()
            if low.startswith("@attribute"):
                m = attr_re.match(line)
                if m:
                    cols.append(next(g for g in m.groups() if g is not None))
            elif low.startswith("@data"):
                in_data = True
            elif in_data:
                vals = next(_csv.reader([line], quotechar="'"))
                rows.append([None if v == "?" else v for v in vals[: len(cols)]])
    if not cols:
        raise ValueError(f"no @attribute declarations in {path}")
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(rows, schema)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read one lake file, dispatching on extension (S1-S5).

    All columns are read as strings for CSV/TSV (the reference stringifies
    everything anyway; native-typed sources keep their types and are
    stringified at indexing time).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        return spark.read.parquet(path)
    if ext == ".orc":
        return spark.read.orc(path)
    if ext == ".avro":
        return read_avro(spark, path)
    if ext == ".json":
        return spark.read.json(path)
    if ext in (".tsv",):
        return spark.read.option("header", True).option("sep", "\t").csv(path)
    if ext == ".arff":
        return read_arff(spark, path)
    if ext in (".csv", ".txt"):
        sep = _sniff_delimiter(spark, path)
        return (
            spark.read.option("header", True)
            .option("sep", sep)
            .option("encoding", "UTF-8")
            .csv(path)
        )
    raise ValueError(f"unsupported lake file format: {path}")


def read_lake_folder(spark: SparkSession, folder: str) -> dict[str, DataFrame]:
    """Enumerate a folder into {table_name: DataFrame} (S6).

    Unreadable files are skipped and reported, mirroring the reference's
    error counters (data_handler.py:387-401).

    This is the few-curated-tables path (one DataFrame per table).  For the
    reference's many-small-files regime (~1M GitTables), use
    :func:`datalake_indexes_spark.sources.folder_ingest.build_index_from_folder`,
    which ingests the whole folder as ONE job with no per-table driver work.
    """
    out: dict[str, DataFrame] = {}
    errors: list[str] = []
    for fname in sorted(os.listdir(folder)):
        path = os.path.join(folder, fname)
        if not os.path.isfile(path):
            continue
        name = os.path.splitext(fname)[0]
        try:
            out[name] = read_table(spark, path)
        except Exception:  # noqa: BLE001 — quarantine bad files, keep going
            errors.append(path)
    if errors:
        print(f"read_lake_folder: skipped {len(errors)} unreadable files: {errors[:5]}")
    return out


def avro_available(spark: SparkSession) -> bool:
    """Whether the spark-avro module is on the session's classpath.
    Avro has been an EXTERNAL Spark module since 2.4 — clusters add
    ``org.apache.spark:spark-avro_2.13:<version>`` via ``--packages``;
    this container ships without it."""
    try:
        spark.read.format("avro").schema("x int").load(
            "/nonexistent-avro-probe"
        ).schema
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source: avro" not in str(e)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro source (curated reader path, same dispatch tier as ORC).

    Gated: raises a clear, actionable error when the external spark-avro
    module is absent instead of Spark's generic deploy hint."""
    if not avro_available(spark):
        raise NotImplementedError(
            "Avro support needs the external spark-avro package on the "
            "classpath (spark.jars.packages=org.apache.spark:spark-avro_"
            "2.13:<spark-version>); it is not bundled in this environment"
        )
    return spark.read.format("avro").load(path)
