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
    if ext == ".xlsx":
        return read_xlsx(spark, path)
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


def read_xlsx(spark: SparkSession, path: str, sheet_index: int = 0) -> DataFrame:
    """XLSX reader — pure stdlib (an .xlsx IS a zip of XML parts:
    ``xl/worksheets/sheetN.xml`` + the shared-string table), same
    driver-parse-then-parallelize tier as ARFF: spreadsheets are small
    curated inputs, not lake-scale data.

    First row = header; all values stringified (the indexing pipeline
    stringifies anyway); shared and inline strings resolved; sparse
    rows padded by the cell references (A1 notation), so gaps land in
    the right columns.  Formulas contribute their cached values."""
    import re
    import xml.etree.ElementTree as ET
    import zipfile

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", ns):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                )))
        sheets = sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if sheet_index >= len(sheets):
            raise ValueError(f"{path}: no sheet index {sheet_index}")
        root = ET.fromstring(zf.read(sheets[sheet_index]))

    def col_idx(ref: str) -> int:
        i = 0
        for ch in ref:
            if ch.isalpha():
                i = i * 26 + (ord(ch.upper()) - 64)
            else:
                break
        return i - 1

    rows: list[list[str | None]] = []
    width = 0
    for row in root.iter(
        "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}row"
    ):
        vals: dict[int, str] = {}
        for c in row:
            ref = c.get("r", "")
            idx = col_idx(ref) if ref else len(vals)
            ctype = c.get("t", "n")
            v = c.find("m:v", ns)
            if ctype == "inlineStr":
                is_el = c.find("m:is", ns)
                text = "".join(
                    t.text or "" for t in (is_el.iter(
                        "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                    ) if is_el is not None else [])
                )
            elif v is None:
                continue
            elif ctype == "s":
                text = shared[int(v.text)]
            else:
                text = v.text or ""
            vals[idx] = text
        if vals:
            width = max(width, max(vals) + 1)
            rows.append(vals)  # type: ignore[arg-type]
    dense = [[r.get(i) for i in range(width)] for r in rows]
    if not dense:
        raise ValueError(f"{path}: empty sheet")
    header = [h if h else f"col_{i}" for i, h in enumerate(dense[0])]
    schema = ", ".join(f"`{h}` string" for h in header)
    return spark.createDataFrame(dense[1:], schema)
