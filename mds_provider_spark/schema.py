"""Canonical schemas + rule-id scheme for the engine.

The rule_id scheme ``<kind>:<column>`` is the stable contract mandated by
BASELINE.json ("same rule IDs, same offending clip_ids") — the analog of
mds-provider's DataValidationError path/message shape
(mds/schemas.py ≈L220–300, DataValidationError.describe).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- inputs

# Primary input (BASELINE.json input_hint): audio clip + transcript pairs.
CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
    ]
)

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("transcript_ref", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
    ]
)

SR_HZ_ENUM = [8000, 16000, 22050, 44100, 48000]
CODEC_ENUM = ["pcm_s16le", "wav", "flac", "opus", "mp3"]

# ---------------------------------------------------------------- outputs

VIOLATIONS_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.StringType()),
        T.StructField("clip_id", T.StringType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
    ]
)

VERDICTS_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("status", T.StringType()),  # pass | fail
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_violations", T.LongType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("committed_at_batch", T.LongType()),
        T.StructField("clips_per_sec", T.DoubleType()),
        T.StructField("rows", T.LongType()),
    ]
)

SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.StringType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("quantiles", T.ArrayType(T.DoubleType())),
        T.StructField("null_rate", T.DoubleType()),
        T.StructField("approx_distinct", T.LongType()),
        T.StructField("min_val", T.DoubleType()),
        T.StructField("max_val", T.DoubleType()),
    ]
)

# ---------------------------------------------------------------- rule ids

UUID_RE = r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"

# kind tags (SURVEY.md §7 naming scheme, fixed)
MISSING_FIELD = "missing_field"
BAD_ENUM = "bad_enum"
OUT_OF_RANGE = "out_of_range"
BAD_FORMAT = "bad_format"
EMPTY_TEXT = "empty_transcript"
BAD_TYPE = "bad_type"
BAD_SHAPE = "bad_shape"
DUPLICATE_ID = "duplicate_id"
REFERENTIAL_ORPHAN = "referential_orphan"
TRANSCRIPT_MISMATCH = "transcript_mismatch"
BAD_PCM = "bad_pcm"
DRIFT = "drift"
COMBINATOR = "combinator"  # anyOf/oneOf/not/dependencies-schema mismatches
INCONSISTENT = "inconsistent"  # cross-field consistency (rate bands, value-dependent enums)


def rule_id(kind: str, column: str) -> str:
    return f"{kind}:{column}"
