"""Storage-layout utilities: partition pruning, bucketed co-location."""

from __future__ import annotations

from lms_erp_data_integration_spark.catalog import Catalog
from lms_erp_data_integration_spark.pipeline.layout import (
    bucketed_table,
    prune_report,
    write_layout,
)
from pyspark.sql import functions as F


def test_partition_layout_prunes(spark, sf_dir, tmp_path):
    docs = Catalog(spark, sf_dir).documents
    out = str(tmp_path / "docs_by_lang")
    write_layout(docs, out, partition_cols=["lang"])
    rep = prune_report(spark, out, "lang = 'en'")
    assert rep["read_files"] < rep["total_files"]
    # values survive the layout round-trip
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.where("lang = 'en'").count() == docs.where("lang = 'en'").count()


def test_bucketed_join_no_shuffle(spark, sf_dir):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped below
    cat = Catalog(spark, sf_dir)
    # disable broadcast so the small test tables exercise the
    # sort-merge path that bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed_table(cat.orders, spark, "b_orders", "o_custkey", 4)
        bucketed_table(
            cat.customer.select(F.col("c_custkey").alias("o_custkey"), "c_name"),
            spark,
            "b_customer",
            "o_custkey",
            4,
        )
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: sort-merge with NO hash exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_compaction_plan_and_rewrite(spark, sf_dir, tmp_path):
    from lms_erp_data_integration_spark.pipeline.layout import (
        compact_table,
        compaction_plan,
        list_table_files,
    )

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(40).write.parquet(src)
    inv = list_table_files(spark, src)
    assert inv.count() == 40
    total = inv.agg(__import__("pyspark").sql.functions.sum("bytes")).first()[0]

    plan = compaction_plan(spark, src, target_file_bytes=total // 4)
    rows = plan.collect()
    # every tiny file is grouped, groups are contiguous and ~4 of them
    assert all(r["group_id"] is not None for r in rows)
    n_groups = len({r["group_id"] for r in rows})
    assert 3 <= n_groups <= 6
    # big-enough files stay untouched: lower the small-file floor below
    # every file size (1 byte) so no file qualifies as small and the
    # plan must leave all files ungrouped
    noop = compaction_plan(
        spark, src, target_file_bytes=total // 4, small_file_bytes=1
    )
    assert all(r["group_id"] is None for r in noop.collect())

    stats = compact_table(spark, src, dst, target_file_bytes=total // 4)
    assert stats["files_before"] == 40
    assert stats["files_after"] <= 6
    # content preserved
    assert spark.read.parquet(dst).count() == orders.count()


def test_compaction_plan_interleaved_large_files(spark, tmp_path):
    """Large files interleaved with small ones must not inflate the
    running total: the cumulative sum bins SMALL-file bytes only, so
    smalls on either side of a big file still pack into full groups
    with contiguous ids (regression: big bytes used to push every
    following small file into its own under-filled group)."""
    from lms_erp_data_integration_spark.pipeline.layout import (
        compaction_plan,
    )

    d = tmp_path / "mixed"
    d.mkdir()
    # names sort: f00..f09; evens big (1000 B), odds small (10 B)
    for i in range(10):
        size = 1000 if i % 2 == 0 else 10
        (d / f"f{i:02d}.parquet").write_bytes(b"\0" * size)
    plan = compaction_plan(
        spark, str(d), target_file_bytes=20, small_file_bytes=100
    )
    rows = {r["file"].rsplit("/", 1)[-1]: r["group_id"] for r in plan.collect()}
    assert all(rows[f"f{i:02d}.parquet"] is None for i in range(0, 10, 2))
    # 5 smalls x 10 B at 20 B/group -> groups 0,0,1,1,2 in name order
    got = [rows[f"f{i:02d}.parquet"] for i in range(1, 10, 2)]
    assert got == [0, 0, 1, 1, 2], got


def test_zorder_write_prunes_2d_box(spark, tmp_path):
    """Z-order clustering: a 2-D box predicate must prune strictly
    more files than a linear sort on one key, because each z-ordered
    file covers a compact rectangle while linear files span the full
    range of the second column. Content must survive the rewrite."""
    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.pipeline.layout import (
        prune_report,
        write_zorder,
    )

    grid = (
        spark.range(0, 128 * 128)
        .select(
            (F.col("id") % 128).alias("x"),
            (F.col("id") / 128).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    lin, zo = str(tmp_path / "linear"), str(tmp_path / "zorder")
    # linear layout: range-partitioned+sorted on x only
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(lin)
    )
    write_zorder(grid, zo, ["x", "y"], n_files=16)
    box = "x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20"
    rl, rz = prune_report(spark, lin, box), prune_report(spark, zo, box)
    assert rz["total_files"] >= 8
    # the box predicate touches a small corner: z-order reads fewer
    # files than the x-only sort, which prunes on x but not y
    assert rz["read_files"] < rl["read_files"]
    # and the clustered copy is lossless
    assert spark.read.parquet(zo).count() == 128 * 128
    assert (
        spark.read.parquet(zo).agg(F.sum("payload")).first()[0]
        == grid.agg(F.sum("payload")).first()[0]
    )


def test_zorder_value_interleave_exact():
    """Morton interleave of known 2-bit coordinates: (x=0b11, y=0b01)
    -> bits x1 y1 x0 y0 = 0b1011 = 11."""
    from lms_erp_data_integration_spark.pipeline.layout import (
        zorder_value,
    )
    from lms_erp_data_integration_spark.session import get_spark

    spark = get_spark(master="local[2]", shuffle_partitions=2)
    df = spark.createDataFrame([(3, 1)], "a int, b int").select(
        zorder_value(["a", "b"], bits=2).alias("z")
    )
    assert df.first()["z"] == 0b1011


def test_rowgroup_stats_and_skipping_effectiveness(spark, tmp_path):
    from lms_erp_data_integration_spark.pipeline.layout import (
        rowgroup_stats,
        skipping_effectiveness,
    )
    from pyspark.sql import functions as F

    # clustered: each of 4 files covers a disjoint k range
    clustered = str(tmp_path / "clustered")
    spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).repartitionByRange(4, "k").write.parquet(clustered)
    st = rowgroup_stats(spark, clustered, ["k"])
    rows = st.collect()
    assert rows and all(r["column"] == "k" for r in rows)
    eff = skipping_effectiveness(st, "k").collect()[0]
    # disjoint ranges, self-pairs excluded (r5 ADVICE): a perfectly
    # clustered layout overlaps NO other row group
    n_groups = st.count()
    assert eff["n_pairs"] == n_groups * (n_groups - 1)
    assert eff["n_overlapping"] == 0
    assert eff["overlap_frac"] == 0.0

    # shuffled: every file spans the full k range -> all pairs overlap
    shuffled = str(tmp_path / "shuffled")
    spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).repartition(4).write.parquet(shuffled)
    st2 = rowgroup_stats(spark, shuffled, ["k"])
    eff2 = skipping_effectiveness(st2, "k").collect()[0]
    assert eff2["overlap_frac"] == 1.0

    # single row group: no other group to overlap -> 0 pairs, and
    # overlap_frac is a defined 0.0, never NULL (r6 ADVICE)
    single = str(tmp_path / "single")
    spark.range(100).select(F.col("id").alias("k")).coalesce(1).write.parquet(single)
    st3 = rowgroup_stats(spark, single, ["k"])
    assert st3.count() == 1
    eff3 = skipping_effectiveness(st3, "k").collect()[0]
    assert eff3["n_pairs"] == 0
    assert eff3["overlap_frac"] == 0.0
