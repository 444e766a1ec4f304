"""spark-submit job entry: the production validation run.

    spark-submit --py-files dist/mds_provider_spark.zip \
        tools/run_validation.py \
        --clips /path/to/clips_parquet --transcripts /path/to/transcripts \
        --out /path/to/run_output [--n-parts 32] [--group-size 8] \
        [--pcm files|rows|off] [--run-id myrun]

Resumable: re-running with the same --out skips committed groups
(plans/checkpoint.py). On a cluster, --clips/--out are object-store
paths and the commit markers ride the Iceberg snapshot instead.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", required=True)
    p.add_argument("--transcripts", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--n-parts", type=int, default=32)
    p.add_argument("--group-size", type=int, default=8)
    p.add_argument("--pcm", choices=["files", "rows", "off"], default="files")
    p.add_argument("--run-id", default=None)
    p.add_argument("--min-snr-db", type=float, default=30.0)
    p.add_argument("--baseline", default=None,
                   help="baseline snapshot parquet (SNAPSHOT_SCHEMA) for "
                        "distribution-drift detection; findings land in "
                        "<out>/drift and the current snapshot in <out>/snapshot")
    p.add_argument("--drift-cols", default="sr_hz,dur_ms",
                   help="comma-separated columns for the drift snapshot")
    p.add_argument("--emit-clean", action="store_true",
                   help="also write the validated copy (rows no violation "
                        "touched) to <out>/clean inside each group commit — "
                        "the quarantine gate downstream pipelines consume")
    p.add_argument("--emit-snapshot", action="store_true",
                   help="write this table's drift snapshot to <out>/snapshot "
                        "even without a baseline (bootstraps the first run)")
    p.add_argument("--manifest", default=None,
                   help="incremental revalidation: path to the partition-"
                        "fingerprint manifest (parquet). When it exists, "
                        "partitions whose two-fold fingerprint changed (or "
                        "are new) have their commit markers invalidated so "
                        "the resume revalidates EXACTLY those groups; "
                        "unchanged partitions skip via their markers. The "
                        "manifest is rewritten after a successful run. "
                        "First run (no manifest yet) validates everything "
                        "and bootstraps it.")
    p.add_argument("--fingerprint-cols",
                   default="clip_id,sr_hz,dur_ms,codec,transcript",
                   help="columns hashed into the partition fingerprints "
                        "(exclude heavy binary columns; bytes changes "
                        "without metadata changes need a content column "
                        "like a checksum to be visible)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from mds_provider_spark.plans.runner import ValidationRun
    from mds_provider_spark.sources import fixtures as FX

    spark = SparkSession.builder.appName("mds-validation-run").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    clips = spark.read.parquet(args.clips)
    ts = spark.read.parquet(args.transcripts) if args.transcripts else None

    kwargs = dict(
        spark=spark,
        out_dir=args.out,
        n_parts=args.n_parts,
        group_size=args.group_size,
        min_snr_db=args.min_snr_db,
        emit_clean=args.emit_clean,
    )
    if args.run_id:
        kwargs["run_id"] = args.run_id
    if args.pcm != "off":
        # ref_waveform is the fixture reference; production swaps in the
        # dataset's reference-waveform provider here.
        kwargs["ref_wave_fn"] = FX.ref_waveform
        kwargs["pcm_strategy"] = args.pcm
        if args.pcm == "files":
            kwargs["clips_path"] = args.clips

    drift_cols = tuple(c for c in args.drift_cols.split(",") if c)
    if args.baseline:
        from mds_provider_spark import schema as S

        kwargs["baseline_snapshot"] = spark.read.schema(S.SNAPSHOT_SCHEMA).parquet(
            args.baseline
        )
        kwargs["drift_cols"] = drift_cols

    incremental: dict = {}
    if args.manifest:
        import os

        from mds_provider_spark.operators import incremental as INC
        from mds_provider_spark.plans.checkpoint import CommitLog

        fp_cols = [c for c in args.fingerprint_cols.split(",") if c]
        # persist: the manifest-scale result is needed twice (delta now,
        # manifest rewrite after the run) — without it the full-table
        # fingerprint scan would run twice per incremental invocation
        cur_fp = INC.partition_fingerprints(
            clips, "part_id", fp_cols
        ).persist()
        if os.path.exists(args.manifest):
            base_fp = spark.read.parquet(args.manifest)
            delta = INC.partition_delta(cur_fp, base_fp)
            by_status: dict = {}
            for r in delta.collect():  # manifest-scale: one row per part
                if r["part"] is None:
                    # NULL part_id rows are outside the group universe
                    # (the runner scans part_id IN (group parts) — a
                    # not_null(part_id) rule owns them), and NULL never
                    # matches itself across the delta join anyway
                    continue
                by_status.setdefault(r["status"], []).append(int(r["part"]))
            dirty = sorted(
                by_status.get("added", []) + by_status.get("changed", [])
            )
            log = CommitLog(args.out)
            invalidated = log.invalidate_parts(dirty)
            removed = sorted(by_status.get("removed", []))
            if removed:
                # the table no longer has these parts; drop their stale
                # outputs so verdict readers don't resurrect them
                log.clear_parts("violations", removed)
                log.clear_parts("verdicts", removed)
                log.invalidate_parts(removed)
            incremental = {
                "manifest": args.manifest,
                "n_parts_unchanged": len(by_status.get("unchanged", [])),
                "dirty_parts": dirty,
                "removed_parts": removed,
                "groups_invalidated": invalidated,
            }
        else:
            incremental = {"manifest": args.manifest, "bootstrap": True}

    run = ValidationRun(**kwargs)
    summary = run.run(clips, ts)
    if args.manifest:
        # write-after-success: a crashed run leaves the old manifest, so
        # the next invocation re-derives the same dirty set and the
        # already-invalidated groups simply resume — convergent.
        cur_fp.write.mode("overwrite").parquet(args.manifest)
        cur_fp.unpersist()
        summary["incremental"] = incremental

    if args.emit_snapshot and not args.baseline:
        # bootstrap: write the current snapshot so the NEXT run can drift
        # against it (with --baseline the runner already writes it)
        import os

        from mds_provider_spark.operators import drift as DR

        DR.snapshot(clips, list(drift_cols), run.run_id).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.out, "snapshot"))
        summary["snapshot_written"] = True

    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
