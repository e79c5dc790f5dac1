"""Round-11 reader seams: object-store routing (pyarrow.fs) for the two
footer passes, recursive/partitioned pruning, UTC-equivalent session
zones, and the evolving reader's merged-path nanos detection, partition
columns, and bounds pushdown (round-10 verdict items 1/3 + all four
round-10 ADVICE findings).

The sandbox has no real S3; remote-scheme behavior is proven the way
test_object_store.py proves Spark's: ``file://`` URIs exercise the full
``pyarrow.fs.FileSystem.from_uri`` -> list -> remote-footer-read ->
respell pipeline (LocalFileSystem is just another pyarrow filesystem on
that path), and unknown schemes pin the conservative skip."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iot_data_pipeline_spark.sources.readers import (
    _list_parquet_files,
    _pafs_for,
    _prune_files_for_ts_bounds,
    _session_tz_is_utc,
    read_parquet_evolving,
    read_table,
)


def _split_events(sf_dir: str, root: str, n_files: int = 8) -> pa.Table:
    """Write events as an n-file date-ordered corpus under root."""
    src = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    os.makedirs(root, exist_ok=True)
    n = src.num_rows
    cut = [round(k * n / n_files) for k in range(n_files + 1)]
    for k in range(n_files):
        pq.write_table(
            src.slice(cut[k], cut[k + 1] - cut[k]),
            os.path.join(root, f"part-{k:03d}.parquet"),
        )
    return src


def test_session_tz_is_utc_equivalence():
    for tz in ("UTC", "Etc/UTC", "GMT", "Zulu", "+00:00", "-00", "UTC+0",
               "GMT+00:00", "+0000"):
        assert _session_tz_is_utc(tz), tz
    for tz in ("Asia/Tokyo", "Pacific/Kiritimati", "+01:00", "UTC+09:00",
               "Africa/Abidjan", "Europe/London", ""):
        assert not _session_tz_is_utc(tz), tz


def test_pruner_via_file_uri(spark, sf_dir, tmp_path):
    """file:// URI drives the whole pyarrow.fs pipeline: from_uri,
    FileSelector listing, filesystem= footer reads, URI respell. The
    pruned read answers identically to the post-filter form."""
    d = str(tmp_path)
    _split_events(sf_dir, os.path.join(d, "events.parquet"))
    lo, hi = "2024-01-10", "2024-01-12"
    pruned = _prune_files_for_ts_bounds(
        spark,
        f"file://{d}/events.parquet",
        "events",
        {"ts": [(">=", lo), ("<", hi)]},
    )
    assert pruned is not None and 0 < len(pruned) < 8
    assert all(p.startswith("file://") or p.startswith("/") for p in pruned)
    bnd = read_table(spark, f"file://{d}", "events", bounds={"ts": (lo, hi)})
    post = read_table(spark, d, "events").filter(
        (F.col("ts") >= lo) & (F.col("ts") < hi)
    )
    assert bnd.count() == post.count() > 0


def test_pruner_skips_unknown_scheme(spark):
    """Spark-only schemes pyarrow cannot resolve (viewfs://) skip
    conservatively -- pruning is an optimization, never a failure."""
    pruned = _prune_files_for_ts_bounds(
        spark,
        "viewfs://testcell/data/events.parquet",
        "events",
        {"ts": [("<", "2035-01-01")]},
    )
    assert pruned is None


def test_pruner_utc_equivalent_session_still_prunes(spark, sf_dir, tmp_path):
    """Round-10 ADVICE: the exact-string "UTC" gate forfeited pruning for
    equivalent zones. Etc/UTC prunes; a genuinely offset zone skips."""
    d = str(tmp_path)
    _split_events(sf_dir, os.path.join(d, "events.parquet"))
    preds = {"ts": [(">=", "2024-01-10"), ("<", "2024-01-12")]}
    try:
        spark.conf.set("spark.sql.session.timeZone", "Etc/UTC")
        assert _prune_files_for_ts_bounds(
            spark, f"{d}/events.parquet", "events", preds
        )
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert (
            _prune_files_for_ts_bounds(
                spark, f"{d}/events.parquet", "events", preds
            )
            is None
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_pruner_recursive_partitioned_layout(spark, sf_dir, tmp_path):
    """Partitioned/nested layouts prune too (the round-10 pass listed
    non-recursively and silently skipped them), and the explicit-file
    read keeps inferring the partition column (basePath)."""
    src = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    d = str(tmp_path)
    root = os.path.join(d, "events.parquet")
    n = src.num_rows
    cut = [round(k * n / 8) for k in range(9)]
    for k in range(8):
        pdir = os.path.join(root, f"shard={k % 2}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(
            src.slice(cut[k], cut[k + 1] - cut[k]),
            os.path.join(pdir, f"part-{k:03d}.parquet"),
        )
    lo, hi = "2024-01-10", "2024-01-12"
    pruned = _prune_files_for_ts_bounds(
        spark, root, "events", {"ts": [(">=", lo), ("<", hi)]}
    )
    assert pruned is not None and 0 < len(pruned) < 8
    bnd = read_table(spark, d, "events", bounds={"ts": (lo, hi)})
    assert "shard" in bnd.columns, "partition column must survive pruning"
    post = read_table(spark, d, "events").filter(
        (F.col("ts") >= lo) & (F.col("ts") < hi)
    )
    assert bnd.count() == post.count() > 0
    assert (
        bnd.filter(F.col("shard").isNull()).count() == 0
    ), "partition values must not NULL-backfill"


def test_pruner_hidden_segments_excluded(spark, sf_dir, tmp_path):
    """The pruner must never hand Spark a file its own listing would
    hide: _-/.-prefixed files and directories are excluded, so the
    pruned read equals the directory read."""
    d = str(tmp_path)
    root = os.path.join(d, "events.parquet")
    src = _split_events(sf_dir, root)
    # decoys Spark's listing hides: would double rows if included
    pq.write_table(src, os.path.join(root, "_tmp.parquet"))
    hdir = os.path.join(root, "_temporary")
    os.makedirs(hdir)
    pq.write_table(src, os.path.join(hdir, "part-x.parquet"))
    fs, p = _pafs_for(root)
    files = _list_parquet_files(fs, p)
    assert len(files) == 8, files
    full = read_table(spark, d, "events")
    bnd = read_table(
        spark, d, "events", bounds={"ts": (None, "2035-01-01")}
    )
    assert bnd.count() == full.count() == src.num_rows


CONTRACT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _ts_table(ids, unit: str, tz: str | None = None) -> pa.Table:
    base = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in micros
    scale = {"us": 1, "ns": 1000}[unit]
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "ts": pa.array(
                [(base + i * 86_400_000_000) * scale for i in ids],
                pa.timestamp(unit, tz=tz),
            ),
            "v": pa.array([float(i) for i in ids], pa.float64()),
        }
    )


def test_evolving_merged_homogeneous_nanos_lake(spark, tmp_path):
    """Round-10 ADVICE (medium): a lake whose every generation is
    TIMESTAMP(NANOS) merges fine -- each footer surfaces the same BIGINT
    under nanosAsLong -- and the merged path then seconds-cast the nanos.
    Pin: values decode to the true instants."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    pq.write_table(_ts_table([0, 1], "ns"), f"{root}/gen1.parquet")
    pq.write_table(_ts_table([2, 3], "ns"), f"{root}/gen2.parquet")
    out = read_parquet_evolving(spark, root, CONTRACT)
    rows = {r["id"]: r["ts"] for r in out.collect()}
    assert len(rows) == 4
    assert rows[0].year == 2023 and rows[0].month == 11
    assert (rows[1] - rows[0]).days == 1


def test_evolving_mixed_ns_int64_same_column_raises(spark, tmp_path):
    """timestamp[ns] in one file, plain int64 in another, SAME column:
    both surface BIGINT, the merge succeeds, but per-file semantics
    differ -- no single cast is correct. Fail loud, never guess."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    pq.write_table(_ts_table([0, 1], "ns"), f"{root}/gen1.parquet")
    plain = pa.table(
        {
            "id": pa.array([2, 3], pa.int64()),
            "ts": pa.array([1_700_000_000, 1_700_086_400], pa.int64()),
            "v": pa.array([2.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(plain, f"{root}/gen2.parquet")
    with pytest.raises(ValueError, match="timestamp\\[ns\\]"):
        read_parquet_evolving(spark, root, CONTRACT)


def test_evolving_partitioned_lake_keeps_partition_columns(spark, tmp_path):
    """Round-10 ADVICE (medium): the schema-group fallback read explicit
    file paths without basePath, so a partitioned evolving lake's
    partition keys silently NULL-backfilled. Pin: real values."""
    contract = T.StructType(
        CONTRACT.fields + [T.StructField("region", T.StringType())]
    )
    root = str(tmp_path / "lake")
    for region, tbl in (
        ("eu", _ts_table([0, 1], "us", tz="UTC")),
        ("us", _ts_table([2, 3], "ns")),  # value-type change -> fallback
    ):
        pdir = f"{root}/region={region}"
        os.makedirs(pdir)
        pq.write_table(tbl, f"{pdir}/part-0.parquet")
    out = read_parquet_evolving(spark, root, contract)
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[0]["region"] == "eu" and rows[2]["region"] == "us"
    assert rows[2]["ts"].year == 2023, "nanos generation must decode exactly"


def test_evolving_bounds_pushdown_both_branches(spark, tmp_path):
    """Round-10 verdict item 3: bounds wired through the fallback --
    raw-column predicates in EVERY Union branch (PushedFilters twice in
    the formatted plan), correct rows across a us/ns generation split,
    and footer file-pruning on the same metadata pass."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    pq.write_table(_ts_table([0, 1], "us", tz="UTC"), f"{root}/g1a.parquet")
    pq.write_table(_ts_table([10, 11], "us", tz="UTC"), f"{root}/g1b.parquet")
    pq.write_table(_ts_table([2, 3], "ns"), f"{root}/g2a.parquet")
    pq.write_table(_ts_table([12, 13], "ns"), f"{root}/g2b.parquet")
    lo, hi = "2023-11-14", "2023-11-20"  # ids 0..5 window
    out = read_parquet_evolving(spark, root, CONTRACT, bounds={"ts": (lo, hi)})
    assert sorted(r["id"] for r in out.collect()) == [0, 1, 2, 3]
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\n]*)", plan)
    assert len(pushed) >= 2, plan
    assert sum("ts" in p for p in pushed) >= 2, (
        f"bounds must push into BOTH Union branches: {pushed}"
    )
    # file pruning on the same footer pass: the out-of-range file of
    # each generation never reaches the scan
    read_files = " ".join(out.inputFiles())
    assert "g1b" not in read_files and "g2b" not in read_files, read_files
    assert "g1a" in read_files and "g2a" in read_files, read_files


def test_evolving_bounds_generation_missing_column(spark, tmp_path):
    """A generation written before the bounded column existed can match
    no bound (its values are contract NULLs): it contributes zero rows,
    and the read still succeeds."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    old = pa.table(
        {
            "id": pa.array([100, 101], pa.int64()),
            "v": pa.array([1.5, 2.5], pa.float32()),  # type change -> fallback
        }
    )
    pq.write_table(old, f"{root}/g0.parquet")
    pq.write_table(_ts_table([0, 1], "us", tz="UTC"), f"{root}/g1.parquet")
    unbounded = read_parquet_evolving(spark, root, CONTRACT)
    assert unbounded.count() == 4
    out = read_parquet_evolving(
        spark, root, CONTRACT, bounds={"ts": ("2023-11-14", None)}
    )
    assert sorted(r["id"] for r in out.collect()) == [0, 1]


def test_evolving_fallback_via_file_uri(spark, tmp_path):
    """The fallback's listing + footer reads run through pyarrow.fs: a
    file:// URI (formerly NotImplementedError) reads identically."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    pq.write_table(_ts_table([0, 1], "us", tz="UTC"), f"{root}/g1.parquet")
    pq.write_table(_ts_table([2, 3], "ns"), f"{root}/g2.parquet")
    out = read_parquet_evolving(spark, f"file://{root}", CONTRACT)
    assert sorted(r["id"] for r in out.collect()) == [0, 1, 2, 3]


def _split_lineitem(sf_dir: str, root: str, statsless: tuple[int, ...] = (),
                    per_column=None) -> None:
    src = pq.read_table(f"{sf_dir}/lineitem.parquet").sort_by("l_shipdate")
    os.makedirs(root)
    n = src.num_rows
    cut = [round(k * n / 8) for k in range(9)]
    for k in range(8):
        stats = True
        if k in statsless:
            stats = per_column if per_column is not None else False
        pq.write_table(
            src.slice(cut[k], cut[k + 1] - cut[k]),
            os.path.join(root, f"part-{k:03d}.parquet"),
            write_statistics=stats,
        )


def test_stats_absent_mix_prunes_around(spark, sf_dir, tmp_path):
    """Round-11 probe band (tools/stats_absence_probe.py): files written
    with statistics disabled are KEPT unconditionally while the
    stats-bearing out-of-range files around them still prune, and the
    bounded result matches the post-filter form exactly."""
    d = str(tmp_path)
    root = os.path.join(d, "lineitem.parquet")
    _split_lineitem(sf_dir, root, statsless=(2, 5))
    lo, hi = "1996-01-01", "1996-07-01"
    preds = {"l_shipdate": [(">=", lo), ("<", hi)]}
    keep = _prune_files_for_ts_bounds(spark, root, "lineitem", preds)
    assert keep is not None and len(keep) < 8
    kept = {os.path.basename(p) for p in keep}
    assert {"part-002.parquet", "part-005.parquet"} <= kept, kept
    bnd = read_table(spark, d, "lineitem", bounds={"l_shipdate": (lo, hi)})
    post = read_table(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    assert bnd.count() == post.count() > 0


def test_pruner_all_statsless_degrades(spark, sf_dir, tmp_path):
    """No file carries stats -> pruning degrades to None (full read),
    never to a wrong answer."""
    d = str(tmp_path)
    root = os.path.join(d, "lineitem.parquet")
    _split_lineitem(sf_dir, root, statsless=tuple(range(8)))
    lo, hi = "1996-01-01", "1996-07-01"
    keep = _prune_files_for_ts_bounds(
        spark, root, "lineitem", {"l_shipdate": [(">=", lo), ("<", hi)]}
    )
    assert keep is None
    bnd = read_table(spark, d, "lineitem", bounds={"l_shipdate": (lo, hi)})
    post = read_table(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    assert bnd.count() == post.count() > 0


def test_mixed_encoding_bounded_subset(spark, sf_dir, tmp_path):
    """Round-11 probe band: a single table directory MIXING us-UTC and
    nanos encodings of the same ts column fails LOUD when the column
    materializes (r10 posture held), but a bound that file-prunes the
    read to a homogeneous subset succeeds and is exact -- pruning only
    drops files that provably cannot match, so every matching row lives
    in the surviving subset."""
    import pyarrow.compute as pc

    src = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    n = src.num_rows
    d = str(tmp_path)
    root = os.path.join(d, "events.parquet")
    os.makedirs(root)
    i = src.column_names.index("ts")
    for g, (sl, unit, tz) in enumerate(
        ((src.slice(0, n // 2), "us", "UTC"), (src.slice(n // 2), "ns", None))
    ):
        sl = sl.set_column(i, "ts", sl.column("ts").cast(pa.timestamp(unit, tz=tz)))
        m = sl.num_rows
        for k in range(2):
            pq.write_table(
                sl.slice(k * m // 2, m // 2 + (m % 2) * k),
                os.path.join(root, f"g{g}-part{k}.parquet"),
            )
    with pytest.raises(Exception, match="DATA_TYPE_MISMATCH|convert"):
        read_table(spark, d, "events").agg(F.min("ts")).collect()
    q1 = src.column("ts")[n // 4].as_py().strftime("%Y-%m-%d %H:%M:%S")
    bnd = read_table(spark, d, "events", bounds={"ts": (None, q1)})
    exp = pc.sum(pc.less(src.column("ts"), src.column("ts")[n // 4])).as_py()
    assert bnd.count() == exp > 0


def test_hadoop_scheme_aliases_and_respell():
    """Spark object-store tables are usually named s3a:// (the Hadoop
    connector); the footer passes alias that to pyarrow's s3:// handle
    (same bytes, different client) and respell results back in the
    caller's scheme so Spark reads through its own connector. In this
    sandbox from_uri's region lookup has no network, so resolution lands
    on the conservative (None, None) skip -- structurally pinned here;
    never an exception."""
    from iot_data_pipeline_spark.sources.readers import (
        _SCHEME_ALIASES,
        _respell,
    )

    assert _SCHEME_ALIASES["s3a"] == "s3"
    assert _SCHEME_ALIASES["s3n"] == "s3"
    assert "wasb" not in _SCHEME_ALIASES  # authority layout differs
    assert (
        _respell(
            "s3a://bucket/t.parquet",
            "bucket/t.parquet",
            "bucket/t.parquet/p.parquet",
        )
        == "s3a://bucket/t.parquet/p.parquet"
    )
    assert _respell(
        "file:///d/t.parquet", "/d/t.parquet", "/d/t.parquet/p.parquet"
    ) == ("file:///d/t.parquet/p.parquet")
    assert _respell(
        "/d/t.parquet", "/d/t.parquet", "/d/t.parquet/p.parquet"
    ) == ("/d/t.parquet/p.parquet")
    # bare-file table: the root IS the file
    assert (
        _respell("s3a://b/f.parquet", "b/f.parquet", "b/f.parquet")
        == "s3a://b/f.parquet"
    )
    # no-network resolution failure -> conservative skip, not an error
    fs, p = _pafs_for("s3a://bucket/t.parquet")
    assert (fs, p) == (None, None) or p == "bucket/t.parquet"


def test_azure_scheme_posture():
    """Round-12 posture decision (r11 verdict item 3): pyarrow >= 16
    resolves ``abfs://``/``abfss://`` natively (AzureFileSystem), so
    those URIs get footer passes -- and ``_respell`` must keep the
    ``container@account.host`` AUTHORITY, which is NOT part of the
    fs-local path (the round-11 scheme-prefix rebuild silently dropped
    the account from every pruned re-read URI). The legacy blob-endpoint
    ``wasb://`` and fsspec-style ``az://`` spellings are unresolvable
    and skip footer passes conservatively."""
    from iot_data_pipeline_spark.sources.readers import _respell

    uri = "abfs://cont@acct.dfs.core.windows.net/lake/tbl"
    fs, root = _pafs_for(uri)
    if fs is not None:  # pyarrow built with Azure support
        assert type(fs).__name__ == "AzureFileSystem"
        assert root == "cont/lake/tbl"
        # authority survives the respell of a listed file
        assert (
            _respell(uri, root, "cont/lake/tbl/x=1/part-0.parquet")
            == "abfs://cont@acct.dfs.core.windows.net/lake/tbl/x=1/part-0.parquet"
        )
    # unresolvable Azure spellings: conservative skip, never an exception
    assert _pafs_for("wasb://c@a.blob.core.windows.net/t") == (None, None)
    assert _pafs_for("az://cont/t") == (None, None)
    # a path that escaped its root is a logic error -> loud, not guessed
    with pytest.raises(ValueError, match="not under table root"):
        _respell(uri, "cont/lake/tbl", "cont/other/part-0.parquet")


def test_pruner_keeps_extensionless_files(spark, sf_dir, tmp_path):
    """Round-11 probe: Spark's directory listing reads EVERY visible
    file -- Hive-written parquet is classically extensionless
    (``000000_0``) -- but the pruner's listing filtered on ``*.parquet``,
    so an extensionless data file silently vanished from every pruned
    explicit-file read (measured: 200 in-bounds rows -> 100). Pin: the
    listing matches Spark's semantics and the bounded read is exact."""
    src = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    n = src.num_rows
    d = str(tmp_path)
    root = os.path.join(d, "events.parquet")
    os.makedirs(root)
    cut = [round(k * n / 4) for k in range(5)]
    names = ["part-0.parquet", "part-1.parquet", "000000_0", "000001_0"]
    for k, name in enumerate(names):
        pq.write_table(
            src.slice(cut[k], cut[k + 1] - cut[k]), os.path.join(root, name)
        )
    fs, p = _pafs_for(root)
    files = _list_parquet_files(fs, p)
    assert len(files) == 4, files
    # bounds covering the back half: both extensionless files carry rows
    lo = src.column("ts")[cut[2]].as_py().strftime("%Y-%m-%d %H:%M:%S")
    keep = _prune_files_for_ts_bounds(
        spark, root, "events", {"ts": [(">=", lo)]}
    )
    assert keep is not None, "date-split corpus must prune"
    assert any(os.path.basename(f) == "000000_0" for f in keep), keep
    bnd = read_table(spark, d, "events", bounds={"ts": (lo, None)})
    post = read_table(spark, d, "events").filter(F.col("ts") >= lo)
    assert bnd.count() == post.count() > 0
    read_files = " ".join(bnd.inputFiles())
    assert "000001_0" in read_files, read_files


def test_evolving_fallback_reads_extensionless_generation(spark, tmp_path):
    """The schema-group fallback's listing has the same contract: an
    extensionless generation file (Hive writer) must contribute its
    rows, not silently vanish from the unioned read."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    pq.write_table(_ts_table([0, 1], "us", tz="UTC"), f"{root}/g1.parquet")
    pq.write_table(_ts_table([2, 3], "ns"), f"{root}/000000_0")
    out = read_parquet_evolving(spark, root, CONTRACT)
    assert sorted(r["id"] for r in out.collect()) == [0, 1, 2, 3]


def test_nanos_bounds_beyond_horizon_saturate(spark, tmp_path):
    """Round-11 probe: a bound past the int64-nanos horizon (2262-04-11)
    overflowed the micros*1000 literal -- ARITHMETIC_OVERFLOW under ANSI,
    and under ANSI-off a silent wrap that kept 0 of the matching rows
    (and the mirrored lo-bound kept rows it must not). Every stored
    nanos value fits int64 by construction, so the comparison saturates
    to a constant instead."""
    d = str(tmp_path)
    root = os.path.join(d, "events.parquet")
    os.makedirs(root)
    pq.write_table(_ts_table([0, 1], "ns"), f"{root}/a.parquet")
    pq.write_table(_ts_table([2, 3], "ns"), f"{root}/b.parquet")
    assert dict(spark.read.parquet(root).dtypes)["ts"] == "bigint"
    cases = (
        ({"ts": ("1970-01-01", "2300-01-01")}, 4),  # hi beyond: open
        ({"ts": ("2290-01-01", None)}, 0),  # lo beyond: empty
        ({"ts": (("=", "2300-06-01"),)}, 0),  # = beyond: empty
        ({"ts": (None, "1600-01-01")}, 0),  # hi below -horizon: empty
        ({"ts": ("1600-01-01", "2023-11-16")}, 2),  # lo below: open
    )
    for bounds, want in cases:
        got = read_table(spark, d, "events", bounds=bounds).count()
        assert got == want, (bounds, got, want)


def test_nanos_saturation_classifier():
    from iot_data_pipeline_spark.sources.readers import _nanos_saturation

    assert _nanos_saturation("2300-01-01", True) == "high"
    assert _nanos_saturation("1600-01-01", True) == "low"
    assert _nanos_saturation("2262-04-11 23:00:00", True) is None
    assert _nanos_saturation("2024-01-01", True) is None
    assert _nanos_saturation(1234, True) is None  # non-string: Spark-side
    # non-UTC sessions: one-day margin, sliver raises (a tz can shift
    # the true literal by up to ~14h either way)
    assert _nanos_saturation("2300-01-01", False) == "high"
    assert _nanos_saturation("2024-01-01", False) is None
    with pytest.raises(ValueError, match="horizon"):
        _nanos_saturation("2262-04-11 12:00:00", False)


def test_discrete_bound_literals_rewrite_exactly(spark, tmp_path):
    """Round-11 probe: ``lit(v).cast(dtype)`` is lossy on discrete
    dtypes -- out-of-range DECIMAL bounds cast to NULL under ANSI-off
    (silently kept 0 rows; ANSI: loud), fractional bounds on integers
    truncate toward zero (``< 2.5`` dropped v=2, ``>= 2.5`` kept it),
    sub-day bounds on DATE columns truncate to the day (dropped the
    whole matching day). Bounds now rewrite to equivalent exact
    comparisons (_normalize_bound)."""
    from datetime import date
    from decimal import Decimal

    d = str(tmp_path)
    root = os.path.join(d, "lineitem.parquet")
    os.makedirs(root)
    t = pa.table(
        {
            "l_quantity": pa.array(list(range(100)), pa.int64()),
            "l_shipdate": pa.array(
                [date(1996, 1, 1 + i % 28) for i in range(100)], pa.date32()
            ),
            "l_extendedprice": pa.array(
                [Decimal(f"{100 + i}.50") for i in range(100)],
                pa.decimal128(12, 2),
            ),
        }
    )
    pq.write_table(t.slice(0, 50), f"{root}/a.parquet")
    pq.write_table(t.slice(50), f"{root}/b.parquet")
    raw = spark.read.parquet(root)
    assert dict(raw.dtypes)["l_shipdate"] == "date"
    cases = (
        ({"l_quantity": (None, 2.5)}, 3),  # v < 2.5 == v <= 2
        ({"l_quantity": (2.5, None)}, 97),  # v >= 2.5 == v >= 3
        ({"l_quantity": (("=", 2.5),)}, 0),  # unrepresentable =: empty
        ({"l_quantity": (None, 1e20)}, 100),  # beyond int64: open
        ({"l_quantity": (1e20, None)}, 0),  # beyond int64: empty
        ({"l_extendedprice": (None, 1e11)}, 100),  # beyond DECIMAL(12,2)
        ({"l_extendedprice": (1e11, None)}, 0),
        ({"l_extendedprice": (None, "150.505")}, 51),  # v <= 150.50
        ({"l_extendedprice": ("150.505", None)}, 49),  # v >= 150.51
        # sub-day bound on a DATE column: v <= Jan 3 / v >= Jan 4
        ({"l_shipdate": (None, "1996-01-03 12:00:00")}, 12),
        ({"l_shipdate": ("1996-01-03 12:00:00", None)}, 88),
        ({"l_shipdate": (("=", "1996-01-03 12:00:00"),)}, 0),
        # exactly-representable bounds keep their semantics
        ({"l_quantity": (2, 5)}, 3),
        ({"l_shipdate": ("1996-01-03", None)}, 92),
    )
    for bounds, want in cases:
        got = read_table(spark, d, "lineitem", bounds=bounds).count()
        assert got == want, (bounds, got, want)
    # wide decimals: the floor needs ~60 significant digits -- the
    # default decimal context (28) would round or raise
    from iot_data_pipeline_spark.sources.readers import _normalize_bound

    wide = "19999999999999999999.123456789012345678"
    assert _normalize_bound("<", Decimal(wide), "decimal(38,18)")[0] == "<"
    assert _normalize_bound("<", wide + "5", "decimal(38,18)")[0] == "<="
    assert _normalize_bound("<", "1e21", "decimal(38,18)") == ("drop",)
    # the rewritten comparisons stay bare attribute-vs-literal: pushed
    bnd = read_table(spark, d, "lineitem", bounds={"l_quantity": (None, 2.5)})
    plan = bnd._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters: ["
    )[1].split("]")[0], plan


def test_evolving_composed_uri_extensionless_bounds(spark, tmp_path):
    """Round-11 composition pin: file:// URI x extensionless Hive files
    x bounds, through the schema-group fallback. Each generation
    file-prunes from its own footers, the IN-window extensionless file
    contributes its rows (it formerly vanished from the listing), and
    the OUT-window file of each generation never reaches the scan."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    pq.write_table(_ts_table([0, 1], "us", tz="UTC"), f"{root}/g1a.parquet")
    pq.write_table(_ts_table([20, 21], "us", tz="UTC"), f"{root}/000000_0")
    pq.write_table(_ts_table([2, 3], "ns"), f"{root}/000001_0")
    pq.write_table(_ts_table([22, 23], "ns"), f"{root}/g2b.parquet")
    out = read_parquet_evolving(
        spark,
        f"file://{root}",
        CONTRACT,
        bounds={"ts": ("2023-11-14", "2023-11-20")},
    )
    assert sorted(r["id"] for r in out.collect()) == [0, 1, 2, 3]
    files = " ".join(out.inputFiles())
    assert "g1a" in files and "000001_0" in files, files
    assert "g2b" not in files and "000000_0" not in files, files


def test_evolving_case_colliding_contract_columns_fail_loudly(spark, tmp_path):
    """Round-11 probe: a generation carrying BOTH "Id" and "ID" (a
    case-sensitive-session scan of a sloppy writer) silently aligned
    whichever column enumerated last onto the contract's "id" --
    arbitrary data selection, where read_table rejects the identical
    footer loudly. Pin the same posture; non-contract collisions and
    merely case-VARIANT single columns still align fine."""
    contract = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    root = str(tmp_path / "lake")
    os.makedirs(root)
    t = pa.table(
        {
            "Id": pa.array([1, 2], pa.int64()),
            "ID": pa.array([100, 200], pa.int64()),
            "v": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    pq.write_table(t, f"{root}/g1.parquet")
    was = spark.conf.get("spark.sql.caseSensitive")
    try:
        spark.conf.set("spark.sql.caseSensitive", "true")
        with pytest.raises(ValueError, match="differing only by case"):
            read_parquet_evolving(spark, root, contract).collect()
    finally:
        spark.conf.set("spark.sql.caseSensitive", was)
    # a single case-variant column still aligns
    root2 = str(tmp_path / "lake2")
    os.makedirs(root2)
    t2 = pa.table(
        {
            "ID": pa.array([1, 2], pa.int64()),
            "v": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    pq.write_table(t2, f"{root2}/g1.parquet")
    out = read_parquet_evolving(spark, root2, contract)
    assert sorted((r["id"], r["v"]) for r in out.collect()) == [(1, 1.0), (2, 2.0)]


def test_evolving_merged_path_file_prunes(spark, tmp_path):
    """The MERGED (mergeSchema-success) path file-prunes bounded contract
    timestamp columns too: an added-column evolving lake is multi-file
    by definition, and on NTZ encodings the pushed predicate never
    becomes a row-group filter -- the footer pass is the only scan
    pruning the read gets. Evolution (NULL backfill of the new column)
    must survive the pruned re-read."""
    contract = T.StructType(
        CONTRACT.fields + [T.StructField("extra", T.StringType())]
    )
    root = str(tmp_path / "lake")
    os.makedirs(root)
    # four date-disjoint files; gen2 adds a column (merge succeeds);
    # ts stays NTZ microseconds (the encoding parquet declines to
    # row-filter)
    for k, ids in enumerate(([0, 1], [10, 11], [20, 21], [30, 31])):
        t = _ts_table(ids, "us")
        if k >= 2:
            t = t.append_column(
                "extra", pa.array([f"g{k}"] * 2, pa.string())
            )
        pq.write_table(t, f"{root}/part-{k}.parquet")
    lo, hi = "2023-11-14", "2023-11-30"  # ids 0..15 window
    out = read_parquet_evolving(spark, root, contract, bounds={"ts": (lo, hi)})
    rows = sorted((r["id"], r["extra"]) for r in out.collect())
    assert rows == [(0, None), (1, None), (10, None), (11, None)]
    read_files = " ".join(out.inputFiles())
    assert "part-2" not in read_files and "part-3" not in read_files
    assert "part-0" in read_files and "part-1" in read_files


def _date32_orders(sf_dir: str, root: str, n_files: int = 4) -> None:
    """Write orders as an n-file o_orderdate-ordered DATE32 corpus (the
    Hive/Trino writer default encoding for date-granular columns)."""
    src = pq.read_table(f"{sf_dir}/orders.parquet").sort_by("o_orderdate")
    idx = src.schema.get_field_index("o_orderdate")
    src = src.set_column(
        idx, "o_orderdate", src.column(idx).cast(pa.date32())
    )
    os.makedirs(root, exist_ok=True)
    n = src.num_rows
    cut = [round(k * n / n_files) for k in range(n_files + 1)]
    for k in range(n_files):
        pq.write_table(
            src.slice(cut[k], cut[k + 1] - cut[k]),
            os.path.join(root, f"part-{k:03d}.parquet"),
            store_schema=False,
        )


def test_date32_canonical_column_normalizes_and_prunes(spark, sf_dir, tmp_path):
    """Round-12 probe axis (SCALE.md section 7e): a DATE32-encoded
    canonical timestamp column (a) normalizes to TIMESTAMP at the read
    boundary (midnight UTC -- the contract's logical type, so downstream
    date_trunc/interval/projection types stay layout-invariant), and
    (b) FILE-prunes from its date footer statistics (previously
    _stat_to_micros returned None on datetime.date stats -> keep-all)."""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    _date32_orders(sf_dir, f"{d}/orders.parquet")
    df = read_table(spark, d, "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"
    lo, hi = "1995-01-01", "1995-06-01"
    bounded = read_table(
        spark, d, "orders", bounds={"o_orderdate": (lo, hi)}
    )
    post = df.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    assert bounded.count() == post.count() > 0
    # the pruner must actually drop out-of-range files
    read_files = bounded.inputFiles()
    assert 0 < len(read_files) < 4
    # values identical to the timestamp-encoded layout
    canon = read_table(spark, sf_dir, "orders", bounds={"o_orderdate": (lo, hi)})
    assert sorted(r["o_orderkey"] for r in bounded.collect()) == sorted(
        r["o_orderkey"] for r in canon.collect()
    )


def test_date_bounds_datetime_spelling_exact(spark, sf_dir, tmp_path):
    """Round-11 ADVICE: _normalize_bound's date rewrite gated on str, so
    a datetime bound with sub-day time still silently truncated through
    lit().cast('date'). Both spellings must now agree exactly."""
    from datetime import datetime

    d = str(tmp_path / "sf")
    os.makedirs(d)
    _date32_orders(sf_dir, f"{d}/orders.parquet", n_files=2)
    # noon bound: '< 1995-06-02 12:00' must KEEP the whole day 1995-06-02
    s_rows = read_table(
        spark, d, "orders",
        bounds={"o_orderdate": ((">=", "1995-01-01"), ("<", "1995-06-02 12:00:00"))},
    ).count()
    dt_rows = read_table(
        spark, d, "orders",
        bounds={"o_orderdate": (
            (">=", datetime(1995, 1, 1)), ("<", datetime(1995, 6, 2, 12)))},
    ).count()
    truth = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-06-02 12:00:00")
    ).count()
    assert s_rows == dt_rows == truth > 0


def test_nanos_saturation_datetime_spelling():
    """Round-11 ADVICE: the horizon classifier gated on str literals, so
    a datetime bound beyond the int64-nanos horizon reached the *1000
    multiply (overflow / silent wrap). Datetime and pandas spellings now
    classify identically to their string forms."""
    from datetime import datetime

    import pandas as pd

    from iot_data_pipeline_spark.sources.readers import _nanos_saturation

    assert _nanos_saturation(datetime(2300, 1, 1), True) == "high"
    assert _nanos_saturation(pd.Timestamp("2300-01-01"), True) == "high"
    assert _nanos_saturation(datetime(1400, 1, 1), True) == "low"
    assert _nanos_saturation(datetime(2000, 1, 1), True) is None
    # parity with the string spellings
    assert _nanos_saturation("2300-01-01", True) == "high"
    assert _nanos_saturation("1400-01-01", True) == "low"


def _partitioned_mixed_events(tmp_path) -> str:
    """events table with hive-partition VALUES spanning types: batch=01
    (int-like, early ts) next to batch=abc (string, late ts)."""
    root = str(tmp_path / "sf" / "events.parquet")
    base = 1_700_000_000_000_000
    for d, ids in (("batch=01", [0, 1]), ("batch=abc", [30, 31])):
        os.makedirs(f"{root}/{d}", exist_ok=True)
        tab = pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "ts": pa.array(
                    [base + i * 86_400_000_000 for i in ids],
                    pa.timestamp("us"),
                ),
                "value": pa.array([float(i) for i in ids], pa.float64()),
            }
        )
        pq.write_table(tab, f"{root}/{d}/part-0.parquet", store_schema=False)
    return str(tmp_path / "sf")


def test_pruned_read_partition_type_parity(spark, tmp_path):
    """Round-12 found-and-fixed: Spark infers a partition column's TYPE
    from the values in the file index, so a bounds-PRUNED explicit-file
    read re-ran inference over only the surviving values -- a table with
    batch=01 next to batch=abc answered string '01' unbounded but int 1
    bounded (different value AND type from the same table). The pruned
    read must be bit-identical to the whole-table read."""
    d = _partitioned_mixed_events(tmp_path)
    full = read_table(spark, d, "events")
    assert dict(full.dtypes)["batch"] == "string"
    lo, hi = "2023-11-14", "2023-11-17"
    bnd = read_table(spark, d, "events", bounds={"ts": (lo, hi)})
    assert dict(bnd.dtypes)["batch"] == "string"
    assert len(bnd.inputFiles()) == 1  # pruning itself must survive
    assert sorted((r["id"], r["batch"]) for r in bnd.collect()) == [
        (0, "01"),
        (1, "01"),
    ]


def test_evolving_fallback_partition_type_parity(spark, tmp_path):
    """Same hazard through the evolving reader's schema-group fallback:
    each generation read alone re-inferred partition types from its own
    values. Generations under k=01 (µs) and k=abc (NANOS -- forces the
    CANNOT_MERGE_SCHEMAS fallback) must surface k exactly as the
    whole-lake string inference would."""
    root = str(tmp_path / "lake")
    base = 1_700_000_000_000_000
    for d, ids, unit in (("k=01", [0, 1], "us"), ("k=abc", [10, 11], "ns")):
        os.makedirs(f"{root}/{d}", exist_ok=True)
        scale = 1000 if unit == "ns" else 1
        tab = pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "ts": pa.array(
                    [(base + i * 86_400_000_000) * scale for i in ids],
                    pa.timestamp(unit),
                ),
                "v": pa.array([float(i) for i in ids], pa.float64()),
            }
        )
        pq.write_table(tab, f"{root}/{d}/part-0.parquet", store_schema=False)
    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("k", T.StringType()),
        ]
    )
    df = read_parquet_evolving(spark, root, contract)
    assert sorted((r["id"], r["k"]) for r in df.collect()) == [
        (0, "01"),
        (1, "01"),
        (10, "abc"),
        (11, "abc"),
    ]
    # bounded: prunes to the µs generation, k spelling still exact
    bnd = read_parquet_evolving(
        spark, root, contract, bounds={"ts": ("2023-11-14", "2023-11-17")}
    )
    assert sorted((r["id"], r["k"]) for r in bnd.collect()) == [
        (0, "01"),
        (1, "01"),
    ]


def test_pruner_skips_empty_row_groups_exactly(spark, tmp_path):
    """Round-12 found-and-fixed: a 0-row row group (a streaming writer's
    empty-batch flush) carries no statistics, and the stats-less
    keep-gate force-kept its whole file -- an entirely-empty file could
    never be pruned, silently degrading file pruning to keep-everything
    on corpora with such artifacts. Empty row groups now skip exactly
    (they provably contain no matching row); empty files prune."""
    root = str(tmp_path / "sf" / "events.parquet")
    os.makedirs(root)
    base = 1_700_000_000_000_000

    def tab(ids):
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "ts": pa.array(
                    [base + i * 86_400_000_000 for i in ids],
                    pa.timestamp("us"),
                ),
                "value": pa.array([float(i) for i in ids], pa.float64()),
            }
        )

    # file A: 0-row row group SANDWICHED between data groups (early ts)
    w = pq.ParquetWriter(f"{root}/a.parquet", tab([0]).schema)
    w.write_table(tab([0, 1]))
    w.write_table(tab([]))
    w.write_table(tab([2, 3]))
    w.close()
    pq.write_table(tab([30, 31]), f"{root}/b.parquet")  # late ts
    pq.write_table(tab([]), f"{root}/c.parquet")  # entirely empty
    d = str(tmp_path / "sf")
    lo, hi = "2023-12-13", "2023-12-16"  # only file B's range
    bnd = read_table(spark, d, "events", bounds={"ts": (lo, hi)})
    post = read_table(spark, d, "events").filter(
        (F.col("ts") >= lo) & (F.col("ts") < hi)
    )
    assert bnd.count() == post.count() == 2
    files = " ".join(bnd.inputFiles())
    assert "b.parquet" in files and len(bnd.inputFiles()) == 1
    # a bound matching file A keeps it (data groups still gate exactly;
    # base is 22:13Z, so ids 0,1,2 land inside [11-14, 11-17))
    lo2, hi2 = "2023-11-14", "2023-11-17"
    bnd2 = read_table(spark, d, "events", bounds={"ts": (lo2, hi2)})
    assert bnd2.count() == 3
    assert "a.parquet" in " ".join(bnd2.inputFiles())


def _partitioned_ts_table(spark, root: str, groups, coalesce: int = 1):
    """Write a partitioned events table via the ENGINE session (so the
    writer-side confs under test apply); groups = ((ids, batch), ...)."""
    rows = [(i, b) for ids, b in groups for i in ids]
    base = 1_700_000_000_000_000
    df = (
        spark.createDataFrame(rows, "id long, batch string")
        .withColumn(
            "ts",
            F.timestamp_micros(
                F.col("id") * F.lit(86_400_000_000) + F.lit(base)
            ),
        )
        .withColumn("value", F.col("id").cast("double"))
    )
    df.coalesce(coalesce).write.mode("overwrite").partitionBy("batch").parquet(root)


def test_engine_written_timestamps_are_prunable(spark, tmp_path):
    """Round-12 found-and-fixed: Spark's own default
    spark.sql.parquet.outputTimestampType is legacy INT96, whose min/max
    statistics are untrustworthy by parquet spec (pyarrow hides them) --
    so every timestamp-bearing lake the ENGINE ITSELF wrote was immune
    to its own file pruner. The session now pins TIMESTAMP_MICROS:
    footers carry INT64 with ordered stats, and a bounded re-read of an
    engine-written zone actually prunes."""
    d = str(tmp_path / "sf")
    root = f"{d}/events.parquet"
    _partitioned_ts_table(
        spark, root, (([0, 1], "early"), ([30, 31], "late")), coalesce=2
    )
    import glob as _glob

    f0 = _glob.glob(f"{root}/batch=early/*.parquet")[0]
    rg = pq.ParquetFile(f0).metadata.row_group(0)
    phys = {
        rg.column(i).path_in_schema: rg.column(i).physical_type
        for i in range(rg.num_columns)
    }
    assert phys["ts"] == "INT64", phys  # not INT96
    assert rg.column(list(phys).index("ts")).statistics.has_min_max
    bnd = read_table(
        spark, d, "events", bounds={"ts": ("2023-11-14", "2023-11-17")}
    )
    assert bnd.count() == 2
    assert len(bnd.inputFiles()) < len(
        read_table(spark, d, "events").inputFiles()
    ), "engine-written zone must file-prune under bounds"


def test_pruned_read_globmeta_and_escaped_partition_dirs(spark, tmp_path):
    """Round-12 found-and-fixed: Spark's multi-path read GLOB-expands
    every explicit path. Spark's own writer percent-escapes glob chars
    in partition dir names, but Hive's escaping set differs -- a
    foreign-written dir with a literal [ crashed the bounded read
    (PATH_NOT_FOUND) and a literal * re-globbed. Engine explicit lists
    are now glob-escaped; Spark-escaped specials (space, =, unicode, %)
    keep round-tripping through the pruned path too."""
    d = str(tmp_path / "sf")
    root = f"{d}/events.parquet"
    _partitioned_ts_table(
        spark,
        root,
        (([0, 1], "a b"), ([30, 31], "x=y"), ([60, 61], "плюс+%")),
    )
    # foreign writer: rename to literal glob metachars
    import glob as _glob

    [esc] = _glob.glob(f"{root}/batch=x%3Dy")
    os.rename(esc, f"{root}/batch=x[1]")
    full = read_table(spark, d, "events")
    assert full.count() == 6
    # narrow bound -> explicit read of the literal-[ dir (was PATH_NOT_FOUND)
    bnd = read_table(
        spark, d, "events", bounds={"ts": ("2023-12-13", "2023-12-16")}
    )
    assert sorted((r["id"], r["batch"]) for r in bnd.collect()) == [
        (30, "x[1]"),
        (31, "x[1]"),
    ]
    assert len(bnd.inputFiles()) == 1
    # Spark-escaped specials round-trip through the pruned path
    bnd2 = read_table(
        spark, d, "events", bounds={"ts": ("2023-11-14", "2023-11-17")}
    )
    assert sorted(set(r["batch"] for r in bnd2.collect())) == ["a b"]
    assert len(bnd2.inputFiles()) == 1


def test_pruner_distributed_branch_above_64_files(spark, sf_dir, tmp_path):
    """The footer passes DISTRIBUTE above 64 files (parallelize + pickled
    pyarrow filesystem) -- the branch a 100 TB table always takes, and
    the only branch no small fixture exercises. 72 date-ordered files:
    the distributed pass must prune exactly like the driver-side one,
    through a file:// URI so the pickled-fs path is the one under test."""
    d = str(tmp_path)
    root = os.path.join(d, "events.parquet")
    _split_events(sf_dir, root, n_files=72)
    lo, hi = "2024-01-10", "2024-01-12"
    pruned = _prune_files_for_ts_bounds(
        spark,
        f"file://{root}",
        "events",
        {"ts": [(">=", lo), ("<", hi)]},
    )
    assert pruned is not None and 0 < len(pruned) < 72
    bnd = read_table(spark, f"file://{d}", "events", bounds={"ts": (lo, hi)})
    post = read_table(spark, d, "events").filter(
        (F.col("ts") >= lo) & (F.col("ts") < hi)
    )
    assert bnd.count() == post.count() > 0
    assert len(bnd.inputFiles()) == len(pruned)


def test_evolving_nested_type_evolution(spark, tmp_path):
    """Round-12 found-and-fixed (the queued nested-evolution axis):
    contract alignment used a whole-column ``.cast``, which Spark
    resolves POSITIONALLY on structs and only when field counts match --
    a generation whose struct GAINED a field made the whole lake
    unreadable (CAST_WITHOUT_SUGGESTION), and reordered struct fields
    would have swapped values silently. Alignment now recurses BY NAME
    (parquet's own semantics): missing nested fields NULL-backfill,
    extra ones drop, array elements and map values recurse."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    g1 = pa.table(
        {
            "id": pa.array([0, 1], pa.int64()),
            "tags": pa.array([[1, 2], [3]], pa.list_(pa.int32())),
            "meta": pa.array(
                [{"a": 1}, {"a": 2}], pa.struct([("a", pa.int32())])
            ),
        }
    )
    g2 = pa.table(
        {
            "id": pa.array([10], pa.int64()),
            "tags": pa.array([[10]], pa.list_(pa.int64())),
            # field ADDED and declared order reversed vs the contract
            "meta": pa.array(
                [{"b": "x", "a": 10}],
                pa.struct([("b", pa.string()), ("a", pa.int64())]),
            ),
        }
    )
    pq.write_table(g1, f"{root}/g1.parquet", store_schema=False)
    pq.write_table(g2, f"{root}/g2.parquet", store_schema=False)
    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.LongType())),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("a", T.LongType()),
                        T.StructField("b", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    df = read_parquet_evolving(spark, root, contract)
    rows = sorted(
        (r["id"], list(r["tags"]), r["meta"].asDict()) for r in df.collect()
    )
    assert rows == [
        (0, [1, 2], {"a": 1, "b": None}),
        (1, [3], {"a": 2, "b": None}),
        (10, [10], {"a": 10, "b": "x"}),
    ]


def test_evolving_nested_nanos_decode_and_mix(spark, tmp_path):
    """Round-12 found-and-fixed: ``nanosAsLong`` applies INSIDE structs
    (probed: struct<ts: timestamp[ns]> surfaces as struct<ts: bigint>),
    so a homogeneous nested-nanos lake through the merged path
    seconds-cast the nanos -- silent near-epoch corruption, the nested
    twin of the round-10 top-level find. The merged-path detector now
    walks DOTTED paths; a nested ns/int64 mix fails loud by path."""
    base_ns = 1_700_000_000_000_000_000  # 2023-11-14T22:13:20Z
    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "meta",
                T.StructType([T.StructField("ts", T.TimestampType())]),
            ),
        ]
    )
    root = str(tmp_path / "ns_lake")
    os.makedirs(root)
    for i, name in ((0, "g1"), (1, "g2")):
        t = pa.table(
            {
                "id": pa.array([i], pa.int64()),
                "meta": pa.array(
                    [{"ts": base_ns + i * 1_000_000_000}],
                    pa.struct([("ts", pa.timestamp("ns"))]),
                ),
            }
        )
        pq.write_table(t, f"{root}/{name}.parquet", store_schema=False)
    df = read_parquet_evolving(spark, root, contract)
    assert sorted(str(r["meta"]["ts"]) for r in df.collect()) == [
        "2023-11-14 22:13:20",
        "2023-11-14 22:13:21",
    ]
    # ns/int64 MIX at a nested path: loud, named by dotted path
    root2 = str(tmp_path / "mix_lake")
    os.makedirs(root2)
    t1 = pa.table(
        {
            "id": pa.array([0], pa.int64()),
            "meta": pa.array(
                [{"ts": base_ns}], pa.struct([("ts", pa.timestamp("ns"))])
            ),
        }
    )
    t2 = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "meta": pa.array(
                [{"ts": 1_700_000_000}], pa.struct([("ts", pa.int64())])
            ),
        }
    )
    pq.write_table(t1, f"{root2}/g1.parquet", store_schema=False)
    pq.write_table(t2, f"{root2}/g2.parquet", store_schema=False)
    with pytest.raises(ValueError, match="meta.ts"):
        read_parquet_evolving(spark, root2, contract).collect()


def test_evolving_map_key_nanos_decode(spark, tmp_path):
    """Round-12 ADVICE closed: ``nanosAsLong`` applies to map KEYS too
    (probed: map<timestamp[ns], v> surfaces as map<bigint, v>), and the
    nanos detector/nested cast recursed into struct fields, array
    elements, and map VALUES only -- a nanos-backed timestamp map key
    fell through to the plain positional cast, the same silent
    seconds-misread class at the key position. Keys now recurse via
    transform_keys with '{k}' footer paths."""
    base_ns = 1_700_000_000_000_000_000  # 2023-11-14T22:13:20Z
    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "m", T.MapType(T.TimestampType(), T.LongType())
            ),
        ]
    )
    root = str(tmp_path / "nskey_lake")
    os.makedirs(root)
    for i, name in ((0, "g1"), (1, "g2")):
        t = pa.table(
            {
                "id": pa.array([i], pa.int64()),
                "m": pa.array(
                    [[(base_ns + i * 1_000_000_000, i)]],
                    pa.map_(pa.timestamp("ns"), pa.int64()),
                ),
            }
        )
        pq.write_table(t, f"{root}/{name}.parquet", store_schema=False)
    df = read_parquet_evolving(spark, root, contract)
    got = sorted(
        (r["id"], str(k), v)
        for r in df.collect()
        for k, v in r["m"].items()
    )
    assert got == [
        (0, "2023-11-14 22:13:20", 0),
        (1, "2023-11-14 22:13:21", 1),
    ]
    # ns/int64 MIX at the key path: loud, named by the dotted {k} path
    root2 = str(tmp_path / "nskey_mix")
    os.makedirs(root2)
    t1 = pa.table(
        {
            "id": pa.array([0], pa.int64()),
            "m": pa.array(
                [[(base_ns, 0)]], pa.map_(pa.timestamp("ns"), pa.int64())
            ),
        }
    )
    t2 = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "m": pa.array(
                [[(1_700_000_000, 1)]], pa.map_(pa.int64(), pa.int64())
            ),
        }
    )
    pq.write_table(t1, f"{root2}/g1.parquet", store_schema=False)
    pq.write_table(t2, f"{root2}/g2.parquet", store_schema=False)
    with pytest.raises(ValueError, match=r"m\{k\}"):
        read_parquet_evolving(spark, root2, contract).collect()


def test_evolving_map_struct_key_by_name(spark, tmp_path):
    """Round-12 ADVICE twin: a STRUCT-typed map key whose generation
    reordered/widened the struct hit the positional cast at the key
    position (silent value swap / CAST_WITHOUT_SUGGESTION); keys now
    recurse the by-name alignment exactly like struct values."""
    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "m",
                T.MapType(
                    T.StructType(
                        [
                            T.StructField("a", T.LongType()),
                            T.StructField("b", T.StringType()),
                        ]
                    ),
                    T.LongType(),
                ),
            ),
        ]
    )
    root = str(tmp_path / "structkey_lake")
    os.makedirs(root)
    g1 = pa.table(
        {
            "id": pa.array([0], pa.int64()),
            # declared order REVERSED vs the contract: positional cast
            # would swap a<->b (and crash on the string->long leg)
            "m": pa.array(
                [[({"b": "x", "a": 7}, 5)]],
                pa.map_(
                    pa.struct([("b", pa.string()), ("a", pa.int64())]),
                    pa.int64(),
                ),
            ),
        }
    )
    g2 = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            # field b MISSING: NULL-backfills inside the key struct
            "m": pa.array(
                [[({"a": 9}, 6)]],
                pa.map_(pa.struct([("a", pa.int64())]), pa.int64()),
            ),
        }
    )
    pq.write_table(g1, f"{root}/g1.parquet", store_schema=False)
    pq.write_table(g2, f"{root}/g2.parquet", store_schema=False)
    df = read_parquet_evolving(spark, root, contract)
    got = sorted(
        (r["id"], k.asDict(), v)
        for r in df.collect()
        for k, v in r["m"].items()
    )
    assert got == [
        (0, {"a": 7, "b": "x"}, 5),
        (1, {"a": 9, "b": None}, 6),
    ]


def test_explicit_files_schema_cache_and_loud_fallback(spark, tmp_path):
    """Round-12 ADVICE closed (two findings at _read_explicit_files):

    - the partition-type parity pass re-listed the WHOLE table on every
      pruned read; the schema is now cached per table root for the
      process lifetime (clear_lake_schema_cache after an in-place
      rewrite that changes partition-value spellings);
    - the broad fallback when that pass fails now WARNS instead of
      silently reverting to subset-local partition-type inference.
    """
    import warnings

    from iot_data_pipeline_spark.sources.readers import (
        _LAKE_SCHEMA_CACHE,
        _read_explicit_files,
        clear_lake_schema_cache,
    )

    root = str(tmp_path / "cached_tbl")
    os.makedirs(f"{root}/a=1")
    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    pq.write_table(t, f"{root}/a=1/p.parquet")
    df = _read_explicit_files(spark, root, [f"{root}/a=1/p.parquet"])
    assert dict(df.dtypes)["a"] == "int"
    assert root in _LAKE_SCHEMA_CACHE
    # cache is CONSULTED on the next read: poison the entry and observe
    # the partition type follow it (no monkeypatching of spark.read)
    _LAKE_SCHEMA_CACHE[root] = {"x": T.LongType(), "a": T.StringType()}
    df2 = _read_explicit_files(spark, root, [f"{root}/a=1/p.parquet"])
    assert dict(df2.dtypes)["a"] == "string"
    clear_lake_schema_cache()
    df3 = _read_explicit_files(spark, root, [f"{root}/a=1/p.parquet"])
    assert dict(df3.dtypes)["a"] == "int"

    # loud fallback: a table ROOT carrying a glob metachar defeats the
    # whole-table metadata pass (Spark glob-expands the root; the
    # engine's directory-path read of such a table fails the same way,
    # so this only arises on explicit-file entry points) -- the subset
    # still reads correctly, with a RuntimeWarning naming the hazard
    # instead of the old silent revert
    gd = str(tmp_path / "tbl[1]")
    os.makedirs(f"{gd}/a=1")
    pq.write_table(t, f"{gd}/a=1/p.parquet")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        df4 = _read_explicit_files(spark, gd, [f"{gd}/a=1/p.parquet"])
        assert sorted(r["x"] for r in df4.collect()) == [1, 2]
    msgs = [str(x.message) for x in w if x.category is RuntimeWarning]
    assert any("partition-type parity" in m for m in msgs)


def test_stale_schema_cache_reinfers_on_type_flipping_spelling(
    spark, tmp_path
):
    """Round-14 ADVICE closed: the schema cache's documented staleness
    had a SILENT-NULL failure mode -- a directory added after the
    cached inference with a spelling the cached type cannot hold
    (cached INT for ``a``, new dir ``a=1x``) cast to NULL, where an
    uncached read re-infers STRING. The pruned read now revalidates
    the subset's spellings against the cached types and re-infers once
    when one cannot cast; a probe-vs-Spark disagreement is memoized so
    it costs one extra listing total, not one per read."""
    from iot_data_pipeline_spark.sources import readers as R

    root = str(tmp_path / "flip_tbl")
    os.makedirs(f"{root}/a=1")
    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    pq.write_table(t, f"{root}/a=1/p.parquet")
    R.clear_lake_schema_cache()
    df = R._read_explicit_files(spark, root, [f"{root}/a=1/p.parquet"])
    assert dict(df.dtypes)["a"] == "int"  # cache now holds INT for a

    # the staleness event: a NEW directory with a non-integer spelling
    os.makedirs(f"{root}/a=1x")
    pq.write_table(t, f"{root}/a=1x/p.parquet")
    df2 = R._read_explicit_files(
        spark, root, [f"{root}/a=1/p.parquet", f"{root}/a=1x/p.parquet"]
    )
    assert dict(df2.dtypes)["a"] == "string"
    got = sorted((r["a"], r["x"]) for r in df2.collect())
    assert got == [("1", 1), ("1", 2), ("1x", 1), ("1x", 2)]  # no NULLs
    # and the refreshed cache entry types the whole table STRING
    assert isinstance(R._LAKE_SCHEMA_CACHE[root]["a"], T.StringType)

    # memo: the same flip-triggering spelling does not re-list again --
    # poison the cache back to INT and mark the spelling as already
    # revalidated; the read must TRUST the (poisoned) cache, proving no
    # second inference pass fired
    R._LAKE_SCHEMA_CACHE[root] = {"x": T.LongType(), "a": T.IntegerType()}
    df3 = R._read_explicit_files(
        spark, root, [f"{root}/a=1/p.parquet", f"{root}/a=1x/p.parquet"]
    )
    assert dict(df3.dtypes)["a"] == "int"  # cache trusted: memo hit
    R.clear_lake_schema_cache()


def test_spelling_castability_probe():
    """Unit band for the conservative driver-side cast probe."""
    from iot_data_pipeline_spark.sources.readers import _spelling_casts

    assert _spelling_casts("42", T.IntegerType())
    assert not _spelling_casts("1x", T.IntegerType())
    assert not _spelling_casts("1.5", T.LongType())  # Spark toInt: null
    assert _spelling_casts("1.5", T.DoubleType())
    assert _spelling_casts("1.5", T.DecimalType(10, 2))
    assert not _spelling_casts("abc", T.DecimalType(10, 2))
    assert _spelling_casts("2026-01-01", T.DateType())
    assert not _spelling_casts("01/02/2026", T.DateType())
    # hive percent-encoding decodes before probing
    assert _spelling_casts("2026-01-01 00%3A00%3A00", T.TimestampType())
    assert _spelling_casts("__HIVE_DEFAULT_PARTITION__", T.IntegerType())
    assert _spelling_casts("anything", T.StringType())
    assert _spelling_casts("anything", None)  # unknown column: trust
    # exotic cached types are explicit intent, never re-inferred
    assert _spelling_casts("zzz", T.BinaryType())
