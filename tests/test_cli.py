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


def test_cli_master_passthrough(monkeypatch, tmp_path):
    """--master must reach the session builder; cluster mode without
    --master must pass the 'launcher' sentinel (spark-submit's master
    wins); local mode passes None (local[$SPARK_GRAFT_CPUS] default)."""
    import yaml

    import scip_spark.cli as cli

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(yaml.safe_dump({"loading": {"format": "tiff"}}))

    seen = {}

    def fake_get_spark(app_name, master=None, **kw):
        seen["master"] = master
        raise RuntimeError("stop-after-session")

    monkeypatch.setattr("scip_spark.session.get_spark", fake_get_spark)
    base = [str(tmp_path / "out"), str(cfg), str(tmp_path)]
    for argv, want in [
        (base + ["--master", "spark://h:7077"], "spark://h:7077"),
        (base + ["--mode", "cluster"], "launcher"),
        (base + ["--mode", "cluster", "--master", "yarn"], "yarn"),
        (base, None),
    ]:
        seen.clear()
        try:
            cli.main(argv)
        except RuntimeError as e:
            assert "stop-after-session" in str(e)
        assert seen["master"] == want, (argv, seen)


def test_get_spark_launcher_sentinel_skips_master(monkeypatch):
    """get_spark('launcher') must NOT call builder.master() — under
    spark-submit an explicit .master() would clobber the launcher's."""
    import scip_spark.session as S

    calls = []

    class FakeBuilder:
        def appName(self, n):
            calls.append(("appName", n))
            return self

        def master(self, m):
            calls.append(("master", m))
            return self

        def config(self, *a, **k):
            calls.append(("config",))
            return self

        def getOrCreate(self):
            raise RuntimeError("stop-before-jvm")

    class FakeSession:
        builder = FakeBuilder()

    monkeypatch.setattr(S, "SparkSession", FakeSession)
    try:
        S.get_spark("t", master="launcher")
    except RuntimeError:
        pass
    assert not any(c[0] == "master" for c in calls), calls
    calls.clear()
    try:
        S.get_spark("t", master="spark://x:7077")
    except RuntimeError:
        pass
    assert ("master", "spark://x:7077") in calls
