"""CLI launcher parity (reference GoNonratAnnotationPipeline.main:55-81):
`--goaFileSplitter <in> <out>` standalone splitter and the default full
pipeline run, driven through __main__.main."""

from __future__ import annotations

import os

from go_nonrat_annotation_pipeline_spark.__main__ import main
from go_nonrat_annotation_pipeline_spark.pipeline.fixtures import write_mouse_gaf


def test_goa_file_splitter_mode(spark, tmp_path, capsys):
    gaf = write_mouse_gaf(str(tmp_path / "in.gaf"))
    out_dir = str(tmp_path / "split")
    assert main(["--goaFileSplitter", gaf, out_dir]) == 0
    out = capsys.readouterr().out
    assert "lines read: 12" in out
    # mouse rows land in their own partition → pruned per-species reads
    assert os.path.isdir(os.path.join(out_dir, "species_type_key=2"))


def test_splitter_usage_error():
    assert main(["--goaFileSplitter", "only-one-arg"]) == 2


def test_full_run_demo_mode(tmp_path, capsys):
    store = str(tmp_path / "store")
    assert main(["run", "--store", store]) == 0
    out = capsys.readouterr().out
    assert "seeded new FULL_ANNOT store" in out
    assert "rat-ISO stale deleted:" in out
    assert "count iso: 0 -> 4 (+4)" in out


def test_cli_compact(spark, tmp_path, capsys):
    from go_nonrat_annotation_pipeline_spark.__main__ import main

    path = str(tmp_path / "frag")
    spark.range(5_000).repartition(32).write.parquet(path)
    assert main(["compact", path, "--target-mb", "64"]) == 0
    out = capsys.readouterr().out
    assert "32 ->" in out
    assert spark.read.parquet(path).count() == 5_000
