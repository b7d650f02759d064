"""Source readers (S1-S6): dialect sniffing, format dispatch, folder
ingestion with quarantine."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from datalake_indexes_spark.sources.readers import read_lake_folder, read_table


@pytest.fixture(scope="module")
def lake_dir():
    d = tempfile.mkdtemp(prefix="lakefiles_")
    with open(f"{d}/comma.csv", "w") as f:
        f.write("name,value\nalpha,1\nbeta,2\n")
    with open(f"{d}/semi.csv", "w") as f:
        f.write("name;value\ngamma;3\ndelta;4\n")
    with open(f"{d}/tabbed.tsv", "w") as f:
        f.write("name\tvalue\nepsilon\t5\n")
    with open(f"{d}/objects.json", "w") as f:
        f.write('{"name": "zeta", "value": 6}\n{"name": "eta", "value": 7}\n')
    with open(f"{d}/weather.arff", "w") as f:
        f.write(
            "% comment\n@relation weather\n"
            "@attribute outlook {sunny,rainy}\n@attribute temp numeric\n"
            "@data\nsunny,85\nrainy,?\n"
        )
    with open(f"{d}/broken.xyz", "w") as f:
        f.write("not a table")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.spark
def test_csv_comma_sniffed(spark, lake_dir):
    df = read_table(spark, f"{lake_dir}/comma.csv")
    assert df.columns == ["name", "value"]
    assert df.count() == 2


@pytest.mark.spark
def test_csv_semicolon_sniffed(spark, lake_dir):
    df = read_table(spark, f"{lake_dir}/semi.csv")
    assert df.columns == ["name", "value"]
    assert [r["name"] for r in df.orderBy("name").collect()] == ["delta", "gamma"]


@pytest.mark.spark
def test_tsv_and_json(spark, lake_dir):
    assert read_table(spark, f"{lake_dir}/tabbed.tsv").count() == 1
    j = read_table(spark, f"{lake_dir}/objects.json")
    assert sorted(j.columns) == ["name", "value"]
    assert j.count() == 2


@pytest.mark.spark
def test_arff(spark, lake_dir):
    df = read_table(spark, f"{lake_dir}/weather.arff")
    assert df.columns == ["outlook", "temp"]
    rows = df.orderBy("outlook").collect()
    assert rows[0]["temp"] is None  # '?' -> NULL
    assert rows[1]["temp"] == "85"


@pytest.mark.spark
def test_folder_ingestion_quarantines_bad_files(spark, lake_dir):
    tables = read_lake_folder(spark, lake_dir)
    assert set(tables) == {"comma", "semi", "tabbed", "objects", "weather"}


@pytest.mark.spark
def test_read_table_orc(spark, tmp_path):
    from datalake_indexes_spark.sources.readers import read_table

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, name string"
    )
    path = str(tmp_path / "t.orc")
    df.write.orc(path)
    back = read_table(spark, path)
    assert sorted(map(tuple, back.collect())) == [(1, "alpha"), (2, "beta")]


def test_avro_gated(spark, tmp_path):
    """Avro is an external Spark module absent from this container: the
    dispatch must fail with the actionable gate error, not Spark's
    generic deploy hint.  (On a cluster with spark-avro the same path
    reads the file — avro_available flips the gate.)"""
    import pytest as _pytest

    from datalake_indexes_spark.sources.readers import avro_available, read_table

    p = tmp_path / "t.avro"
    p.write_bytes(b"Obj\x01")  # header magic only; never reached when gated
    if avro_available(spark):
        _pytest.skip("spark-avro present in this environment")
    with _pytest.raises(NotImplementedError, match="spark-avro"):
        read_table(spark, str(p))


def _write_xlsx(path, rows, shared_strings=True):
    """Minimal real xlsx: zip with content types, workbook, sheet, and a
    shared-string table — written with stdlib only, same parts a real
    writer emits."""
    import zipfile

    strings: list[str] = []

    def sref(s):
        if s not in strings:
            strings.append(s)
        return strings.index(s)

    def colref(i):
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(65 + r) + out
        return out

    body = []
    for rn, row in enumerate(rows, start=1):
        cells = []
        for ci, val in enumerate(row):
            if val is None:
                continue
            ref = f"{colref(ci)}{rn}"
            if isinstance(val, str) and shared_strings:
                cells.append(f'<c r="{ref}" t="s"><v>{sref(val)}</v></c>')
            elif isinstance(val, str):
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>{val}</t></is></c>'
                )
            else:
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
        body.append(f'<row r="{rn}">{"".join(cells)}</row>')
    M = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = f'<worksheet xmlns="{M}"><sheetData>{"".join(body)}</sheetData></worksheet>'
    sst = (
        f'<sst xmlns="{M}" count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/workbook.xml", f'<workbook xmlns="{M}"/>')
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        if shared_strings:
            zf.writestr("xl/sharedStrings.xml", sst)


def test_xlsx_reader_shared_and_sparse(spark, tmp_path):
    from datalake_indexes_spark.sources.readers import read_table

    p = str(tmp_path / "t.xlsx")
    _write_xlsx(
        p,
        [
            ["name", "city", "score"],
            ["ada", "london", 7],
            ["grace", None, 9],        # sparse row: gap stays in column 1
            ["ada", "london", 3],      # shared strings reused
        ],
    )
    df = read_table(spark, p)
    assert df.columns == ["name", "city", "score"]
    rows = {tuple(r) for r in df.collect()}
    assert ("ada", "london", "7") in rows
    assert ("grace", None, "9") in rows
    assert len(rows) == 3


def test_xlsx_inline_strings(spark, tmp_path):
    from datalake_indexes_spark.sources.readers import read_xlsx

    p = str(tmp_path / "i.xlsx")
    _write_xlsx(p, [["a", "b"], ["x", 1]], shared_strings=False)
    df = read_xlsx(spark, p)
    assert df.columns == ["a", "b"]
    assert df.collect()[0][0] == "x"
