"""Config file handling — parity with mds/files.py ConfigFile (≈L10–55).

The reference reads a JSON config with per-provider sections and merges a
section into Provider kwargs. Engine analog: engine/run configs with
defaults + section overlay, used to parameterize rule sets, partition
counts, SNR thresholds, and Spark conf overrides.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any


@dataclass
class ConfigFile:
    path: str

    def _load(self) -> dict:
        with open(self.path) as f:
            return json.load(f)

    def section(self, name: str, defaults: dict[str, Any] | None = None) -> dict[str, Any]:
        """Section merged over top-level defaults (reference semantics:
        section keys win; unknown sections are an explicit error)."""
        raw = self._load()
        base = {k: v for k, v in raw.items() if not isinstance(v, dict)}
        if defaults:
            base = {**defaults, **base}
        if name not in raw or not isinstance(raw[name], dict):
            raise KeyError(f"config section {name!r} not found in {self.path}")
        return {**base, **raw[name]}

    def sections(self) -> list[str]:
        return [k for k, v in self._load().items() if isinstance(v, dict)]
