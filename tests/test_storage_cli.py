"""Storage adapter (Lance-or-Parquet) and crawl CLI entry tests."""

from __future__ import annotations

import pyarrow as pa


def test_storage_roundtrip(tmp_path, images_table):
    import ray.data as rd

    from sidecar import storage

    path = str(tmp_path / "images_out")
    storage.write_table(rd.from_arrow(images_table), path)
    back = storage.read_images(path).to_pandas().sort_values("image_id")
    src = images_table.to_pandas().sort_values("image_id")
    assert list(back["image_id"]) == list(src["image_id"])
    assert list(back["phash"]) == list(src["phash"])


def test_storage_small_arrow_roundtrip(tmp_path):
    from sidecar import storage

    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = storage.write_arrow(t, str(tmp_path / "small"))
    assert storage.read_arrow(p).equals(t)


def test_storage_lance_branch(tmp_path, images_table):
    """Exercises the Lance side of the adapter THE DAY pylance appears in
    the environment (skip-marked until then): Dataset write_table →
    read_images over a .lance dir, and the driver-side write_arrow /
    read_arrow dataset round trip.  The Parquet fallback of the same calls
    is covered unconditionally by the two tests above."""
    import pytest

    from sidecar import storage

    if not storage.HAVE_LANCE:
        pytest.skip("pylance not installed in this environment")

    import ray.data as rd

    path = str(tmp_path / "imgs.lance")
    storage.write_table(rd.from_arrow(images_table), path)
    assert storage.FORMAT == "lance"
    back = storage.read_images(path).to_pandas().sort_values("image_id")
    assert len(back) == images_table.num_rows
    assert sorted(back.columns) == sorted(images_table.column_names)

    import pyarrow as pa

    t = pa.table({"a": [1, 2, 3]})
    p = storage.write_arrow(t, str(tmp_path / "small_lance"))
    assert storage.read_arrow(p).equals(t)


def test_crawl_cli_main(tmp_path):
    """The ray-job-submit entry: runs inside the existing Ray session
    (guarded init) and prints a JSON summary."""
    from sidecar.crawl import main

    summary = main([
        "--n-seeds", "12", "--max-epochs", "1",
        "--out-dir", str(tmp_path / "crawl"),
    ])
    assert summary["epochs_run"] == 1
    assert summary["urls_seen"] > 0
    assert summary["metrics"][0]["sidecar_rows"] > 0


def test_crawl_cli_explicit_flag_beats_config_file(tmp_path):
    """An explicitly-given CLI flag wins over the config file even when its
    value equals the argparse default (sentinel-default merge)."""
    import json

    from sidecar.crawl import CrawlConfig, main

    cfgf = tmp_path / "cfg.json"
    cfgf.write_text(json.dumps({"n_seeds": 12, "max_epochs": 5,
                                "num_fetch_partitions": 4}))
    out = str(tmp_path / "c")
    s = main(["--config", str(cfgf), "--max-epochs", "3",  # == default!
              "--n-hosts", "5", "--out-dir", out])
    # file's n_seeds=12 and num_fetch_partitions pass through; explicit
    # --max-epochs 3 beats the file's 5 even though 3 is the default
    want = CrawlConfig(n_seeds=12, n_hosts=5, max_epochs=3,
                       num_fetch_partitions=4, out_dir=out)
    assert s["lineage_id"] == want.lineage_id()
    assert s["epochs_run"] <= 3
