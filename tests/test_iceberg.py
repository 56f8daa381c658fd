"""Iceberg binding (sources/iceberg.py): the sandbox has no Iceberg
jar, so the contract under test is the detection + parquet fallback and
the exact conf the cataloged deployment feeds to get_spark."""

import pytest

from kelos_on_kafka_spark.sources import iceberg

SF = "/root/testdata/sf0.001"


def test_iceberg_not_on_classpath_here(spark):
    assert iceberg.iceberg_available(spark) is False


def test_read_pages_parquet_fallback(spark):
    df = iceberg.read_pages(spark, f"{SF}/documents.parquet")
    assert df.count() > 0


def test_read_pages_table_ref_requires_runtime(spark):
    with pytest.raises(RuntimeError, match="catalog table"):
        iceberg.read_pages(spark, "local.db.pages")


def test_write_pages_parquet_fallback(spark, tmp_path):
    src = iceberg.read_pages(spark, f"{SF}/documents.parquet").limit(10)
    out = str(tmp_path / "pages_pq")
    iceberg.write_pages(src, out)
    assert spark.read.parquet(out).count() == 10


def test_iceberg_conf_shape():
    conf = iceberg.iceberg_conf(catalog="cc", warehouse="/w")
    assert conf["spark.sql.catalog.cc"] == iceberg.CATALOG_IMPL
    assert conf["spark.sql.catalog.cc.type"] == "hadoop"
    assert conf["spark.sql.catalog.cc.warehouse"] == "/w"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]
