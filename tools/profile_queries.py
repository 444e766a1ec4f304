"""Per-query profiling harness for the optimization rounds (guide §1).

NOT part of the frozen bench contract — bench.py stays untouched. This
tool reproduces bench.py's time_queries() methodology (one local[N]
session, SPARK_GRAFT_SKIP_LEDGER=1, df.count() action, clearCache
between queries) and adds:

  * cold + warm timing per query (warm rerun isolates planning/codegen
    fixed cost from execution cost at these tiny scale factors);
  * optional ``--plans DIR`` dump of .explain("formatted") per query
    (the judge-facing before/after artifacts under plans/r07/);
  * optional ``--suffix`` for the plan file names (_before/_after).

Usage:
  python tools/profile_queries.py [sf_dir] [--plans plans/r07 --suffix _before] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "q1_pricing_summary", "q3_top_orders", "stats_profile_lineitem",
    "uniqueness_lineitem_pk", "referential_orphans", "events_rule_violations",
    "drift_quantiles_lineitem", "ann_topk_embeddings", "text_stats_documents",
    "pii_redaction_documents", "dedup_exact_documents", "simhash_dedup_documents",
    "minhash_dedup_documents", "embedding_near_dup", "contamination_documents",
    "pack_documents", "audio_quality_clips", "segment_clips_features",
    "sessionize_events", "heavy_hitters_events", "clip_consistency_rules",
    "loudness_normalize_clips", "filterbank_clips", "audio_fingerprint_dedup",
    "label_noise_clips", "audio_dedup_materialize", "duration_integrity_clips",
    "audio_split_leakage", "paragraph_dedup_documents", "pq_ann_embeddings",
    "pack_documents_tokens", "boundary_multipolygon_embeddings",
    "group_split_documents", "embedding_drift_labels",
    "audio_embedding_drift_clips",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SKIP_LEDGER", "1")
    args = list(sys.argv[1:])
    plans_dir = None
    suffix = ""
    warm = True
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    if "--no-warm" in args:
        warm = False
        args.remove("--no-warm")
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    names = args or BENCH_QUERIES

    import __spark_entry__ as entrymod
    from mds_provider_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile-queries", parallelism=cpus,
                      shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
    try:
        for name in names:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            built = time.monotonic() - t0
            df.count()
            cold = time.monotonic() - t0
            if plans_dir:
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted")
                except Exception:
                    import contextlib
                    import io

                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    plan = buf.getvalue()
                with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                    f.write(plan)
            entry = {"build_s": round(built, 3), "cold_s": round(cold, 3)}
            if warm:
                spark.catalog.clearCache()
                t0 = time.monotonic()
                df2 = qs[name](spark, sf_dir)
                df2.count()
                entry["warm_s"] = round(time.monotonic() - t0, 3)
            spark.catalog.clearCache()
            out[name] = entry
            print(json.dumps({name: entry}), flush=True)
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "profile": out}))


if __name__ == "__main__":
    main()
