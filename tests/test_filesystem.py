"""Filesystem abstraction: local + HDFS parquet discovery (data/filesystem.py)."""

import subprocess

import numpy as np
import pytest

from bagel_tpu.data import filesystem as fsmod


def test_local_list_and_open(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name in ("b.parquet", "a.parquet", "notes.txt"):
        p = tmp_path / name
        if name.endswith(".parquet"):
            pq.write_table(pa.table({"x": [1, 2]}), p)
        else:
            p.write_text("x")
    entries = fsmod.list_dir(str(tmp_path))
    assert sorted(e.split("/")[-1] for e in entries) == [
        "a.parquet", "b.parquet", "notes.txt",
    ]
    fr = fsmod.open_parquet(str(tmp_path / "a.parquet"))
    assert fr.read_row_group(0).num_rows == 2


def test_hdfs_ls_parses_cli_output(monkeypatch):
    fake = (
        "Found 3 items\n"
        "-rw-r--r--   3 user grp  123 2026-01-01 00:00 hdfs://nn/data/0.parquet\n"
        "-rw-r--r--   3 user grp  456 2026-01-01 00:00 hdfs://nn/data/1.parquet\n"
        "drwxr-xr-x   - user grp    0 2026-01-01 00:00 hdfs://nn/data/sub\n"
    )

    class R:
        stdout = fake

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    got = fsmod.hdfs_ls("hdfs://nn/data")
    assert got == [
        "hdfs://nn/data/0.parquet",
        "hdfs://nn/data/1.parquet",
        "hdfs://nn/data/sub",
    ]


def test_split_hdfs_uri():
    from bagel_tpu.data.filesystem import split_hdfs_uri

    # authority in the URI wins; path must come back absolute — a relative
    # 'nn:9000/data/x.parquet' would resolve against the HDFS home dir
    host, port, path = split_hdfs_uri("hdfs://namenode:9000/data/x.parquet")
    assert (host, port, path) == ("namenode", 9000, "/data/x.parquet")

    host, port, path = split_hdfs_uri("hdfs:///data/x.parquet")
    assert host == "default" and port == 0 and path == "/data/x.parquet"

    import os

    os.environ["BAGEL_HDFS_HOST"] = "hdfs://nn2"
    try:
        host, port, path = split_hdfs_uri("hdfs:///d/y.parquet")
        assert host == "nn2" and path == "/d/y.parquet"
    finally:
        del os.environ["BAGEL_HDFS_HOST"]


def test_get_parquet_data_paths_repeat_and_shard(tmp_path, monkeypatch):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d1 = tmp_path / "d1"
    d2 = tmp_path / "d2"
    for d, k in ((d1, 2), (d2, 1)):
        d.mkdir()
        for i in range(k):
            pq.write_table(pa.table({"x": [i]}), d / f"{i}.parquet")

    # single process: repeat-to-count semantics
    got = fsmod.get_parquet_data_paths([str(d1), str(d2)], [5, 2])
    assert len(got) == 7
    assert sum(1 for p in got if "/d2/" in p or p.startswith(str(d2))) == 2

    # two "ranks": dirs are sharded, lists exchanged via allgather hook
    def fake_allgather(local):
        return [local, ["from-rank-1.parquet"]]

    got = fsmod.get_parquet_data_paths(
        [str(d1), str(d2)], [2, 1], rank=0, world_size=2,
        allgather=fake_allgather,
    )
    assert got[-1] == "from-rank-1.parquet"
    assert len(got) == 3  # 2 from d1 (rank 0's shard) + 1 gathered
