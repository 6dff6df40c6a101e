"""Versioned snapshot table: atomic publish, time travel, pointer behavior."""

import pytest

from projet_data_infrastructure_spark.streaming.versioned import (
    latest_version,
    read_snapshot,
    snapshot_exists,
    write_snapshot,
)


def test_publish_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    assert not snapshot_exists(path)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path)

    v1 = write_snapshot(spark.range(3), path)
    v2 = write_snapshot(spark.range(10), path)
    assert (v1, v2) == (1, 2)
    assert latest_version(path) == 2
    assert read_snapshot(spark, path).count() == 10
    assert read_snapshot(spark, path, version=1).count() == 3  # immutable history


def test_reader_never_sees_partial_state(spark, tmp_path):
    # a published snapshot is untouched by an in-flight writer: the new
    # version lands in its own directory before the pointer flips.
    path = str(tmp_path / "tbl")
    write_snapshot(spark.range(5), path)
    df = read_snapshot(spark, path)
    write_snapshot(spark.range(100), path)  # concurrent publish
    assert df.count() == 5  # the handle resolved v1 and still reads it
    assert read_snapshot(spark, path).count() == 100


def test_compact_and_vacuum(spark, tmp_path):
    from projet_data_infrastructure_spark.streaming.versioned import (
        compact_snapshot,
        latest_version,
        read_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )

    target = str(tmp_path / "t")
    df = spark.range(1000).repartition(16)
    write_snapshot(df, target)  # v1: 16 fragments
    import glob

    n_before = len(glob.glob(f"{target}/v=1/*.parquet"))
    assert n_before >= 16
    v2 = compact_snapshot(spark, target, target_files=1)
    assert v2 == 2 and latest_version(target) == 2
    assert len(glob.glob(f"{target}/v=2/*.parquet")) == 1
    # identical content, history intact
    assert read_snapshot(spark, target).count() == 1000
    assert read_snapshot(spark, target, version=1).count() == 1000

    write_snapshot(spark.range(5), target)  # v3
    dropped = vacuum_snapshots(target, keep_last=2)
    assert dropped == [1]
    assert read_snapshot(spark, target, version=2).count() == 1000  # kept
    assert read_snapshot(spark, target).count() == 5


def test_ensure_lake_table_bootstraps_once(spark, tmp_path):
    from projet_data_infrastructure_spark.streaming.versioned import (
        ensure_lake_table,
        read_snapshot,
        write_snapshot,
    )

    target = str(tmp_path / "lake_t")
    assert ensure_lake_table(spark, target, "id long, name string") is False
    snap = read_snapshot(spark, target)
    assert snap.count() == 0 and snap.columns == ["id", "name"]
    # second call: table exists, no new version published
    write_snapshot(spark.range(3).selectExpr("id", "'x' AS name"), target)
    assert ensure_lake_table(spark, target, "id long, name string") is True
    assert read_snapshot(spark, target).count() == 3


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    """insert/delete/update classification, unchanged rows suppressed, and
    null-valued data columns compared safely."""
    from projet_data_infrastructure_spark.streaming.versioned import (
        snapshot_diff,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        "id long, name string, score int",
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "C", 30), (4, "d", 41), (5, "e", 50)],
        "id long, name string, score int",
    )
    v1 = write_snapshot(old, path)
    v2 = write_snapshot(new, path)
    out = {r.id: r._change_type for r in snapshot_diff(spark, path, v1, v2, ["id"]).collect()}
    assert out == {1: "delete", 3: "update", 4: "update", 5: "insert"}
    # id 2 (identical incl. the NULL) must NOT appear
