"""Single-node throughput: the reference's mechanism vs this engine.

mds-provider validates by walking each record with
``jsonschema.Draft6Validator.iter_errors`` in one Python process
(mds/schemas.py ≈L170–220) — no parallelism, no columnar execution.
This harness runs THAT EXACT mechanism (same jsonschema package, same
draft, format checker on) and the engine's compiled RuleSet over the
same records on the same machine, and reports rows/sec for both.

    python tools/reference_shootout.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA = {
    "type": "object",
    "required": ["clip_id", "transcript"],
    "properties": {
        "clip_id": {"type": "string", "format": "uuid"},
        "sr_hz": {"type": "integer", "enum": [8000, 16000, 22050, 44100, 48000]},
        "dur_ms": {"type": "integer", "exclusiveMinimum": 0},
        "codec": {"type": "string", "enum": ["pcm_s16le", "wav", "flac", "opus", "mp3"]},
        "transcript": {"type": "string", "minLength": 1},
    },
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    import jsonschema

    from mds_provider_spark.schema_compiler import from_json_schema
    from mds_provider_spark.session import get_spark
    from mds_provider_spark.sources import fixtures as FX

    # ---- build the records once (not timed for either side) ----------
    faults = FX.default_fault_plan(n)
    spark = get_spark("shootout", parallelism=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    clips = (
        FX.generate_clips(spark, n, n_parts=8, seed=42, faults=faults,
                          sr_choices=[8000, 16000], dur_choices=[80, 120])
        .drop("bytes")  # metadata-rule comparison; reference never did PCM
        .cache()
    )
    records = [r.asDict() for r in clips.collect()]
    for rec in records:
        for k in list(rec):
            if rec[k] is None:
                del rec[k]  # jsonschema 'required' semantics: absent key

    # ---- reference mechanism: per-record draft-6 walk -----------------
    validator = jsonschema.Draft6Validator(
        SCHEMA, format_checker=jsonschema.FormatChecker()
    )
    t0 = time.monotonic()
    ref_violations = 0
    for rec in records:
        for _err in validator.iter_errors(rec):
            ref_violations += 1
    ref_sec = time.monotonic() - t0

    # ---- engine: same schema compiled to one Catalyst projection ------
    rs, _ = from_json_schema(SCHEMA, key_col="clip_id")
    rs.violations(clips).count()  # warm (plan compile + JIT)
    t0 = time.monotonic()
    eng_violations = rs.violations(clips).count()
    eng_sec = time.monotonic() - t0

    # single-core engine variant for the strictly-apples comparison
    spark.stop()
    spark1 = get_spark("shootout-1", parallelism=1, shuffle_partitions=4)
    spark1.sparkContext.setLogLevel("ERROR")
    clips1 = (
        FX.generate_clips(spark1, n, n_parts=8, seed=42, faults=faults,
                          sr_choices=[8000, 16000], dur_choices=[80, 120])
        .drop("bytes").cache()
    )
    clips1.count()
    rs1, _ = from_json_schema(SCHEMA, key_col="clip_id")
    rs1.violations(clips1).count()
    t0 = time.monotonic()
    rs1.violations(clips1).count()
    eng1_sec = time.monotonic() - t0
    spark1.stop()

    print(f"rows: {n}")
    print(f"reference (jsonschema Draft6 per-record, 1 thread): "
          f"{ref_sec:7.2f}s  {n/ref_sec:10.0f} rows/s  violations={ref_violations}")
    print(f"engine    (compiled rules, local[1]):               "
          f"{eng1_sec:7.2f}s  {n/eng1_sec:10.0f} rows/s")
    print(f"engine    (compiled rules, local[8]):               "
          f"{eng_sec:7.2f}s  {n/eng_sec:10.0f} rows/s  violations={eng_violations}")
    print(f"speedup single-core: {ref_sec/eng1_sec:5.1f}x   "
          f"local[8]: {ref_sec/eng_sec:5.1f}x")


if __name__ == "__main__":
    main()
