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
