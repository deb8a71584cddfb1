"""Python DataSource WRITER face: df.write through the custom connector
lands JSON-lines with two-phase commit (temp files + rename + _SUCCESS
manifest), and the round-trip equals the source relation."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from python_btc_etl_spark.catalog import load
from python_btc_etl_spark.sources.pyds import register


def test_writer_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    register(spark)
    out = str(tmp_path / "sink")
    df = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    df.write.format("synthetic_bars").mode("append").option("path", out).save()

    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert files, os.listdir(out)
    # no uncommitted temp files remain
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["total"] == df.count()
    assert sorted(x["file"] for x in manifest["files"]) == sorted(files)

    back = (
        spark.read.schema(df.schema)
        .json([os.path.join(out, f) for f in files])
    )
    assert back.count() == df.count()
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0


def test_writer_overwrite_replaces(spark, sf_dir, tmp_path):
    register(spark)
    out = str(tmp_path / "sink2")
    df = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    df.write.format("synthetic_bars").mode("append").option("path", out).save()
    first = set(f for f in os.listdir(out) if f.endswith(".jsonl"))

    half = df.filter(F.col("r_regionkey") < 2)
    half.write.format("synthetic_bars").mode("overwrite").option("path", out).save()
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    # old committed files were removed by overwrite-commit
    assert not (set(files) & first)
    back = spark.read.schema(half.schema).json(
        [os.path.join(out, f) for f in files]
    )
    assert back.count() == half.count() == 2


def test_writer_path_containing_tmp_and_part_tokens(spark, sf_dir, tmp_path):
    """Regression: commit() must transform only the BASENAME when building
    final file names. A sink directory containing '.tmp' or '/.part-' in
    its own path used to be rewritten by the whole-path str.replace,
    renaming committed files into a different (nonexistent) directory."""
    register(spark)
    out = str(tmp_path / "out.tmp" / ".part-x" / "job")
    df = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    df.write.format("synthetic_bars").mode("append").option("path", out).save()

    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert files, os.listdir(out)
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["total"] == df.count()
    back = spark.read.schema(df.schema).json([os.path.join(out, f) for f in files])
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
