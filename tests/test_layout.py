"""Z-order layout: key correctness + real data-skipping evidence from
parquet footers."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.sinks import layout as L


def test_zorder_key_interleaves_bits(spark):
    # x=0b11, y=0b01 at bits=2, cols [x, y]:
    # pos0 = x bit0 (1), pos1 = y bit0 (1), pos2 = x bit1 (1),
    # pos3 = y bit1 (0) -> 0b0111 = 7
    df = spark.createDataFrame([Row(x=3, y=1)])
    r = df.select(
        L.zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()[0]
    assert r.z == 7


def test_zorder_key_validation(spark):
    with pytest.raises(ValueError, match="at least 1"):
        L.zorder_key([], bits=4)
    with pytest.raises(ValueError, match="<= 62"):
        L.zorder_key([F.lit(1), F.lit(2)], bits=32)
    # single column degenerates to the gridded value itself (range
    # clustering — Delta allows single-column ZORDER BY)
    row = (
        spark.range(1)
        .select(L.zorder_key([F.lit(7).cast("bigint")], bits=4).alias("k"))
        .first()
    )
    assert row["k"] == 7


def test_scale_to_grid_endpoints_and_monotone(spark):
    df = spark.createDataFrame([Row(v=v) for v in [10, 20, 55, 100]])
    out = df.select(
        "v",
        L.scale_to_grid(
            F.col("v"), F.lit(10), F.lit(100), bits=4
        ).alias("g"),
    ).orderBy("v").collect()
    gs = [r.g for r in out]
    assert gs[0] == 0 and gs[-1] == 15  # endpoints hit the grid bounds
    assert gs == sorted(gs)  # monotone
    assert all(0 <= g <= 15 for g in gs)


def test_with_zorder_key_locality(spark):
    """Neighbors in (x, y) space must be near each other in key space:
    the average key distance of (x,y)-adjacent points must be far below
    that of random pairs (the whole point of Morton interleaving)."""
    pts = [Row(x=x, y=y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts)
    rows = L.with_zorder_key(df, ["x", "y"], bits=4).collect()
    key = {(r.x, r.y): r.zkey for r in rows}
    adjacent = [
        abs(key[(x, y)] - key[(x + 1, y)])
        for x in range(15)
        for y in range(16)
    ]
    span = max(key.values()) - min(key.values())
    assert sum(adjacent) / len(adjacent) < span / 8


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    """The real contract, checked against real parquet footers: after
    Z-ordering on (a, b), every file's min/max range is narrow on BOTH
    columns, while a linear sort on `a` leaves `b` unpruned (each file
    spans ~the full b range)."""
    pa = pytest.importorskip("pyarrow.parquet")

    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 200).alias("a"),
        # decorrelated second dimension
        F.pmod(F.col("id") * 7919 + 13, F.lit(200)).alias("b"),
        F.col("id").alias("payload"),
    )

    zpath = os.path.join(str(tmp_path), "zorder")
    lpath = os.path.join(str(tmp_path), "linear")
    L.write_zordered(df, zpath, ["a", "b"], bits=8, num_files=16)
    (
        df.repartitionByRange(16, F.col("a"))
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def avg_span(path, col):
        spans = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pa.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.names.index(col)
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    # linear layout: 'a' tightly clustered, 'b' spans ~everything
    assert avg_span(lpath, "a") < 40
    assert avg_span(lpath, "b") > 150
    # z-order: BOTH dimensions bounded well below the full 0..199 range
    assert avg_span(zpath, "a") < 120
    assert avg_span(zpath, "b") < 120

    # and the data survives the rewrite intact
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("payload")).collect()[0][0] == n * (n - 1) // 2


class TestCompaction:
    def test_compacts_many_small_files_and_preserves_data(
        self, spark, tmp_path
    ):
        from metadata_driven_data_pipeline_spark.sinks import maintenance as M

        path = str(tmp_path / "frag")
        df = spark.range(50_000).select(
            F.col("id"), (F.col("id") % 7).alias("grp")
        )
        df.repartition(64).write.mode("overwrite").parquet(path)
        before = M.table_file_stats(spark, path)
        assert before["files"] >= 60

        res = M.compact_small_files(
            spark, path, target_bytes=before["bytes"] // 4
        )
        assert res["after"]["files"] <= 6
        # byte-for-byte data preservation
        back = spark.read.parquet(path)
        assert back.count() == 50_000
        assert back.agg(F.sum("id")).collect()[0][0] == 50_000 * 49_999 // 2

    def test_sorted_compaction_tightens_file_stats(self, spark, tmp_path):
        pa = pytest.importorskip("pyarrow.parquet")
        from metadata_driven_data_pipeline_spark.sinks import maintenance as M

        path = str(tmp_path / "sorted")
        spark.range(40_000).select(
            F.pmod(F.col("id") * 7919, F.lit(1000)).alias("k"),
            F.col("id"),
        ).repartition(32).write.mode("overwrite").parquet(path)

        stats = M.table_file_stats(spark, path)
        M.compact_small_files(
            spark, path, target_bytes=stats["bytes"] // 4, sort_by=["k"]
        )
        spans = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pa.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.names.index("k")
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            spans.append(hi - lo)
        # range-partitioned + sorted: each file covers a narrow k slice
        assert sum(spans) / len(spans) < 400
