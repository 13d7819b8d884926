"""CLI end-to-end: config YAML + image dir → parquet feature table
(reference test/test_cli.py:8-37 semantics: exit code, timing JSON,
output present)."""

import json
import os


def test_cli_end_to_end(spark, tmp_path):
    import yaml

    d = tmp_path / "imgs"
    d.mkdir()
    for i in ("A", "B", "C"):
        for c in (1, 2):
            (d / f"test{i}_{c}.tiff").write_bytes(b"\x00")

    config = {
        "loading": {
            "format": "tiff",
            "kwargs": {
                "regex": r"^.*/test(?P<rec>.+)_(?P<channel>[0-9])\.tiff$",
                "channels": ["1", "2"],
            },
            "attach": "scip_spark.sources.filescan:synthetic_reader",
            "path_cols": ["1", "2"],
        },
        "pipeline": {
            "mask": {"methods": ["circle"]},
            "feature_extraction": {"nchannels": 2, "families": ["intensity", "bbox"]},
        },
    }
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(yaml.safe_dump(config))
    out = str(tmp_path / "out")
    timing = str(tmp_path / "timing.json")

    from scip_spark.cli import main

    rc = main([out, str(cfg), str(d), "--timing", timing])
    assert rc == 0

    feat = spark.read.parquet(out).toPandas()
    assert len(feat) == 3
    assert any(c.startswith("feat_intensity_") for c in feat.columns)

    t = json.load(open(timing))
    assert t["runtime"] > 0
