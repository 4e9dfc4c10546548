"""binaryFile asset-ingest source (sources/binary_files.py): listing
-> typed frame -> parquet landing, with payload fidelity and metadata
pruning checked through the engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigbugdata_spark.plans import inspect as I
from bigbugdata_spark.sources.binary_files import land_assets, read_assets


@pytest.fixture()
def asset_dir(tmp_path):
    d = tmp_path / "assets"
    (d / "sub").mkdir(parents=True)
    payloads = {
        "cat.jpg": b"\xff\xd8fakejpegbytes",
        "dog.png": b"\x89PNGfake",
        "talk.wav": b"RIFFfakewav",
        "clip.mp4": b"\x00\x00fakemp4",
        "notes.txt": b"plain text",
        "sub/deep.jpeg": b"\xff\xd8deeper",
        # same basename as the root cat.jpg: ids must NOT collide
        "sub/cat.jpg": b"\xff\xd8subcat",
        # dotfile: Hadoop's default path filter HIDES it from the
        # listing entirely (never reaches the frame) — written here to
        # pin that exclusion
        "sub/.hidden": b"dot",
    }
    for name, data in payloads.items():
        (d / name).write_bytes(data)
    return str(d), payloads


def test_read_assets_types_and_payload_fidelity(spark, asset_dir):
    path, payloads = asset_dir
    rows = {r["asset_id"]: r for r in read_assets(spark, path).collect()}
    assert set(rows) == {
        "cat", "dog", "talk", "clip", "notes", "sub/deep", "sub/cat",
    }
    assert rows["cat"]["modality"] == "image"
    assert rows["sub/deep"]["modality"] == "image"  # recursive lookup
    assert rows["talk"]["modality"] == "audio"
    assert rows["clip"]["modality"] == "video"
    assert rows["notes"]["modality"] == "unknown"
    # byte-for-byte payload fidelity and correct lengths; the two
    # cat.jpg files stay distinct assets with distinct payloads
    assert bytes(rows["cat"]["payload"]) == payloads["cat.jpg"]
    assert bytes(rows["sub/cat"]["payload"]) == payloads["sub/cat.jpg"]
    assert rows["talk"]["n_bytes"] == len(payloads["talk.wav"])


def test_glob_filter_prunes_at_listing(spark, asset_dir):
    path, _ = asset_dir
    only_jpg = read_assets(spark, path, glob="*.jpg")
    assert {r["asset_id"] for r in only_jpg.collect()} == {"cat", "sub/cat"}


def test_landing_roundtrip_and_metadata_pruning(spark, asset_dir, tmp_path):
    path, payloads = asset_dir
    out = str(tmp_path / "landed")
    land_assets(read_assets(spark, path), out, n_partitions=2)
    landed = spark.read.parquet(out)
    # payload fidelity through the landing write
    got = {
        r["asset_id"]: bytes(r["payload"])
        for r in landed.select("asset_id", "payload").collect()
    }
    assert got["dog"] == payloads["dog.png"]
    assert landed.count() == len(payloads) - 1  # the hidden dotfile
    # metadata-only queries prune the payload column at the scan
    meta = landed.groupBy("modality").agg(F.sum("n_bytes").alias("b"))
    cols = I.read_columns(meta)
    assert cols and all("payload" not in c for c in cols)
