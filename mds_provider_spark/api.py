"""High-level facade — the switch-over surface for mds-provider users.

Maps the reference's entry points (SURVEY.md §3) onto the engine:

  DataValidator.trips(ref) / .validate(instance)   (mds/schemas.py)
      -> Validator(ruleset).validate(df) -> ValidationResult
  Client.get_trips(...)                            (mds/api.py)
      -> spark.read (Iceberg/parquet/json payloads) — ingestion is a scan
  Database.load_trips(...)                         (mds/db.py)
      -> ValidationRun (plans/runner.py): checkpointed writes + lineage

One object, three calls: build rules, validate, inspect.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from mds_provider_spark import rules as R
from mds_provider_spark.functions import audio
from mds_provider_spark.operators import referential as REF
from mds_provider_spark.operators import uniqueness as U


@dataclass
class ValidationResult:
    """The distributed analog of the reference's error iterator: lazy
    DataFrames instead of a generator of DataValidationError objects."""

    violations: DataFrame
    verdicts: DataFrame

    def is_valid(self) -> bool:
        """Payload-valid ⇔ no violations (DataValidator semantics)."""
        return self.violations.isEmpty()

    def describe(self, n: int = 100) -> list[str]:
        """Human-readable lines (DataValidationError.describe analog)."""
        return [
            f"{r.rule_id} @ {r.clip_id}: {r.message}"
            for r in self.violations.limit(n).collect()
        ]


@dataclass
class Validator:
    """Compile-once, validate-many (Schema fetch/cache analog)."""

    ruleset: R.RuleSet = field(default_factory=R.mds_clip_rules)
    ref_wave_fn: audio.RefWaveFn | None = None
    min_snr_db: float = 30.0

    @classmethod
    def clips(cls, ref_wave_fn: audio.RefWaveFn | None = None) -> "Validator":
        """Named constructor parity with DataValidator.trips/.status_changes."""
        return cls(ruleset=R.mds_clip_rules(), ref_wave_fn=ref_wave_fn)

    @classmethod
    def from_schema(
        cls,
        schema: dict,
        key_col: str,
        part_col: str = "part_id",
        unique=None,
        strict: bool = True,
        **kwargs,
    ) -> "Validator":
        """``DataValidator(schema_document)`` parity: compile an MDS
        JSON-Schema document — nested GeoJSON objects and object-arrays
        included — straight into a Validator (mds/schemas.py builds its
        validator from the fetched schema doc the same way)."""
        from mds_provider_spark.schema_compiler import from_json_schema

        rs, _ = from_json_schema(
            schema, key_col=key_col, part_col=part_col, unique=unique, strict=strict
        )
        return cls(ruleset=rs, **kwargs)

    def validate(
        self, df: DataFrame, transcripts: DataFrame | None = None
    ) -> ValidationResult:
        v = self.ruleset.violations(df)
        for uk in self.ruleset.unique_keys:
            v = v.unionByName(
                U.duplicate_violations(
                    df, list(uk.cols),
                    key_col=self.ruleset.key_col, part_col=self.ruleset.part_col,
                )
            )
        if transcripts is not None:
            v = v.unionByName(REF.referential_violations(df, transcripts))
            v = v.unionByName(REF.transcript_mismatch_violations(df, transcripts))
        if self.ref_wave_fn is not None:
            v = v.unionByName(
                audio.pcm_violations(df, self.ref_wave_fn, self.min_snr_db)
            )
        verd = self.ruleset.verdicts_from_violations(df, v)
        return ValidationResult(violations=v, verdicts=verd)
