"""End-to-end checkpointed job (jobs/run_pipeline.py): full run, then a
kill-mid-job simulation that must resume without recomputing early stages."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))


def test_full_run_and_resume(spark, sf_dir, tmp_path):
    from run_pipeline import build_args, run

    out = str(tmp_path / "run1")
    args = build_args(["--sf-dir", sf_dir, "--out", out, "--cpus", "4"])
    res = run(spark, args)
    assert res["resumed_stages"] == []
    assert res["pages"] > 0
    assert res["joined_rows"] > 0
    assert res["tile_rows"] > 0
    assert set(res["stages"]) == {"pages", "indexed", "pip", "tiles"}

    # rerun against the same root: everything resumes, nothing recomputes,
    # identical outputs
    res2 = run(spark, args)
    assert res2["resumed_stages"] == ["pages", "indexed", "pip", "tiles"]
    assert res2["joined_rows"] == res["joined_rows"]
    assert res2["wall_sec"] < res["wall_sec"]


def test_kill_midway_resume(spark, sf_dir, tmp_path, monkeypatch):
    from run_pipeline import build_args, run
    from shapefile_rs_spark.lineage import CheckpointedPipeline

    out = str(tmp_path / "run2")
    args = build_args(["--sf-dir", sf_dir, "--out", out, "--cpus", "4"])

    # simulated kill: the pip stage dies on its first attempt
    original = CheckpointedPipeline.run_stage
    state = {"killed": False}

    def flaky(self, stage, build, partition_by=None):
        if stage == "pip" and not state["killed"]:
            state["killed"] = True
            raise RuntimeError("simulated executor loss mid-join")
        return original(self, stage, build, partition_by)

    monkeypatch.setattr(CheckpointedPipeline, "run_stage", flaky)
    with pytest.raises(RuntimeError):
        run(spark, args)
    monkeypatch.setattr(CheckpointedPipeline, "run_stage", original)

    res = run(spark, args)
    # pages + indexed committed before the kill -> resumed; pip/tiles computed
    assert res["resumed_stages"] == ["pages", "indexed"]
    assert res["joined_rows"] > 0
