"""Command-line entry point mirroring the reference's launcher surface
(GoNonratAnnotationPipeline.main:55-81 + run.sh):

    # standalone taxon splitter (--goaFileSplitter <in> <out>)
    python -m go_nonrat_annotation_pipeline_spark --goaFileSplitter in.gaf.gz out_dir

    # full pipeline run (default mode; fixtures demo when no --gaf given)
    python -m go_nonrat_annotation_pipeline_spark run \
        [--gaf FILE ...] [--store DIR] [--audit DIR]

The splitter mode is S4+S5 (GoaFileSplitter.java:17-71 +
AllSpeciesFileSplitter.java:75-142): one schema-based scan, taxon
semi-join against the species dimension, species-partitioned parquet
out, per-species counters printed — the reference's manual writer map
replaced by a single shuffle-free partitioned write.

The run mode is §3.2: per-species jobs in reference order (chinchilla
read-back last), MERGE upsert into the FULL_ANNOT store, threshold-
guarded stale deletes, and the reference-style counter / before-after
report (GoNonratAnnotationPipeline.java:180-283).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

from pyspark.sql import functions as F

from .pipeline.config import CHINCHILLA, MOUSE, PipelineConfig
from .pipeline.fixtures import MGI_REF, build_dims, seed_full_annot, write_mouse_gaf
from .pipeline.gaf import filter_allowed_taxa, read_gaf, split_by_species, with_taxon_id
from .pipeline.run import SpeciesJob, run_pipeline
from .pipeline.sink import AnnotStore
from .session import get_spark


def cmd_split(in_path: str, out_dir: str) -> int:
    """S4/S5 splitter (reference `--goaFileSplitter` arg)."""
    spark = get_spark("goa-file-splitter")
    species = build_dims(spark).species
    gaf = read_gaf(spark, in_path)
    kept = filter_allowed_taxa(gaf, species)
    split_by_species(kept, species, out_dir)

    # GoaFileSplitter.java:69-70 counters: lines read / written
    total = gaf.count()
    per_species = (
        with_taxon_id(kept)
        .join(
            F.broadcast(
                species.select(
                    F.col("taxonomic_id").alias("taxon_id"),
                    "species_type_key",
                    "common_name",
                )
            ),
            "taxon_id",
        )
        .groupBy("species_type_key", "common_name")
        .agg(F.count("*").alias("lines"))
        .orderBy("species_type_key")
        .collect()
    )
    written = sum(r["lines"] for r in per_species)
    print(f"lines read: {total}")
    print(f"lines written: {written}  (skipped: {total - written})")
    for r in per_species:
        print(f"  species {r['species_type_key']} ({r['common_name']}): {r['lines']}")
    print(f"split written to {out_dir} (partitioned by species_type_key)")
    return 0


def cmd_run(gaf_paths: list[str], store_dir: str, audit_dir: str | None) -> int:
    """Full pipeline (reference default mode)."""
    spark = get_spark("annotation-pipeline")
    cfg = PipelineConfig()
    dims = build_dims(spark)

    if not gaf_paths:  # fixtures demo — same inputs as the E2E golden test
        demo = tempfile.mkdtemp(prefix="gaf_demo_")
        gaf_paths = [write_mouse_gaf(os.path.join(demo, "mgi.gaf"))]
        print(f"no --gaf given; using bundled mouse fixture {gaf_paths[0]}")

    store = AnnotStore(spark, store_dir)
    if os.path.exists(store_dir):
        print(f"using existing FULL_ANNOT store at {store_dir}")
    else:
        store.seed(seed_full_annot(spark, cfg))
        print(f"seeded new FULL_ANNOT store at {store_dir}")

    jobs = [
        SpeciesJob(MOUSE, MGI_REF, cfg.mouse_sources, gaf_paths),
        SpeciesJob(CHINCHILLA, 0, None, None),  # read-back, always last
    ]
    report = run_pipeline(spark, cfg, dims, store, jobs, audit_dir=audit_dir)

    # reference-style run report (GoNonratAnnotationPipeline.java:180-283)
    for sp in report.species:
        print(f"species {sp.species_type_key}:")
        for k in sorted(sp.counters):
            print(f"  {k}: {sp.counters[k]}")
        if sp.upsert:
            u = sp.upsert
            print(
                f"  inserted {u.inserted}  updated {u.updated}"
                f"  up-to-date {u.touched}"
            )
        print(f"  stale deleted: {sp.stale_deleted}")
    print(f"rat-ISO stale deleted: {report.iso_stale_deleted}")
    for key in sorted(report.counts_before):
        b, a = report.counts_before[key], report.counts_after.get(key, 0)
        print(f"count {key}: {b} -> {a} ({a - b:+d})")
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # reference arg style: --goaFileSplitter <in> <out>
    if argv[:1] == ["--goaFileSplitter"]:
        if len(argv) != 3:
            print("usage: --goaFileSplitter <in.gaf[.gz]> <out_dir>", file=sys.stderr)
            return 2
        return cmd_split(argv[1], argv[2])

    p = argparse.ArgumentParser(prog="go_nonrat_annotation_pipeline_spark")
    sub = p.add_subparsers(dest="cmd")
    r = sub.add_parser("run", help="full annotation pipeline")
    r.add_argument("--gaf", nargs="*", default=[], help="input GAF file(s)")
    r.add_argument("--store", default="./full_annot_store")
    r.add_argument("--audit", default=None, help="audit side-output dir (S9)")
    s = sub.add_parser("split", help="taxon splitter (same as --goaFileSplitter)")
    s.add_argument("input")
    s.add_argument("out_dir")
    c = sub.add_parser("compact", help="small-file compaction on a parquet dir")
    c.add_argument("path")
    c.add_argument("--target-mb", type=int, default=256)
    c.add_argument("--partition-col", default=None)
    args = p.parse_args(argv or ["run"])
    if args.cmd == "split":
        return cmd_split(args.input, args.out_dir)
    if args.cmd == "compact":
        from .sources.maintenance import compact_parquet, parquet_file_count

        spark = get_spark("compact")
        before = parquet_file_count(args.path)
        after = compact_parquet(
            spark, args.path, args.target_mb * 1024 * 1024, args.partition_col
        )
        print(f"compacted {args.path}: {before} -> {after} files")
        return 0
    return cmd_run(args.gaf, args.store, args.audit)


if __name__ == "__main__":
    raise SystemExit(main())
