"""Z-order layout (plans/layout.zorder_key / write_zordered): the key
matches a pure-Python Morton interleave, and a z-ordered parquet write
measurably tightens per-row-group min/max stats on BOTH dimensions —
the data-skipping property itself, asserted from the file footers."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kelos_on_kafka_spark.plans import layout


def _py_morton(vals, bits):
    key = 0
    for b in range(bits):
        for ci, v in enumerate(vals):
            key |= ((v >> b) & 1) << (b * len(vals) + ci)
    return key


def test_zorder_key_matches_python_morton(spark):
    rows = [(i, (i * 37) % 251, (i * 101) % 251) for i in range(300)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = {
        r.i: r.z
        for r in df.select(
            "i", layout.zorder_key(["x", "y"], bits=8).alias("z")
        ).collect()
    }
    for i, x, y in rows:
        assert got[i] == _py_morton([x, y], 8), (i, x, y)
    with pytest.raises(ValueError, match="exceeds"):
        layout.zorder_key(["x", "y"], bits=32)


def _avg_rowgroup_ranges(path, cols):
    spans = {c: [] for c in cols}
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in spans and col.statistics is not None:
                    spans[name].append(
                        col.statistics.max - col.statistics.min
                    )
    return {c: sum(v) / len(v) for c, v in spans.items()}


def test_write_zordered_tightens_stats_on_both_dims(spark, tmp_path):
    n = 20_000
    rows = [(i, (i * 7919) % 256, (i * 104729) % 256) for i in range(n)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    nat = str(tmp_path / "natural")
    zod = str(tmp_path / "zordered")
    # small parquet blocks -> many row groups, so the comparison
    # measures layout quality, not file-count boundary effects
    df.repartition(4).write.option("parquet.block.size", 65536).parquet(
        nat
    )  # arrival order, 4 files
    layout.write_zordered(
        df, zod, ["x", "y"], bits=8, n_files=4,
        writer_options={"parquet.block.size": 65536},
    )

    nat_r = _avg_rowgroup_ranges(nat, ["x", "y"])
    z_r = _avg_rowgroup_ranges(zod, ["x", "y"])
    # arrival order: every row group spans ~the full [0,256) domain on
    # both dims; z-order: contiguous Morton segments bound both dims.
    # Segments straddling quadrant boundaries keep the per-dim factor
    # modest at this row-group count — assert each dim improves and the
    # combined area shrinks by >= 2x (the actual skipping win scales
    # with the product of the per-dim ranges)
    assert z_r["x"] < 0.7 * nat_r["x"], (z_r, nat_r)
    assert z_r["y"] < 0.7 * nat_r["y"], (z_r, nat_r)
    assert (z_r["x"] + z_r["y"]) < 0.5 * (nat_r["x"] + nat_r["y"]), (
        z_r,
        nat_r,
    )
    # row preservation
    assert spark.read.parquet(zod).count() == n
    got = sorted(
        map(tuple, spark.read.parquet(zod).select("i", "x", "y").collect())
    )
    assert got == sorted(rows)


def test_write_zordered_rejects_out_of_range_values(spark, tmp_path):
    """Silent bit truncation would destroy the clustering without an
    error — the write validates the domain precondition first."""
    df = spark.createDataFrame(
        [(i, i * 1000, i) for i in range(100)], "i long, x long, y long"
    )
    with pytest.raises(ValueError, match="does not fit in 8 bits"):
        layout.write_zordered(
            df, str(tmp_path / "z"), ["x", "y"], bits=8
        )
