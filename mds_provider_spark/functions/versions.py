"""Version gating — parity with mds/versions.py (Version,
UnsupportedVersionError, Version.supported; ≈L10–100).

Driver-side config objects (SURVEY.md §2.8 F4): version comparison never
touches row data in this engine — payload-level version checks compile to
the filter in sources/payloads.py. This class exists so engine configs
and rule-set registries can gate the same way the reference gates API
calls.
"""

from __future__ import annotations

import functools
import re


class UnsupportedVersionError(ValueError):
    def __init__(self, version: "Version", lo: "Version", hi: "Version"):
        super().__init__(f"version {version} outside supported range [{lo}, {hi}]")
        self.version = version


@functools.total_ordering
class Version:
    """Semver-ish x.y[.z] with total ordering."""

    _RE = re.compile(r"^(\d+)\.(\d+)(?:\.(\d+))?$")

    def __init__(self, text: "str | Version"):
        if isinstance(text, Version):
            self.tuple = text.tuple
            return
        m = self._RE.match(str(text).strip())
        if not m:
            raise ValueError(f"unparseable version: {text!r}")
        self.tuple = (int(m.group(1)), int(m.group(2)), int(m.group(3) or 0))

    SUPPORTED_LO = (0, 2, 0)
    SUPPORTED_HI = (0, 4, 99)

    @property
    def supported(self) -> bool:
        return self.SUPPORTED_LO <= self.tuple <= self.SUPPORTED_HI

    def raise_if_unsupported(self) -> "Version":
        if not self.supported:
            raise UnsupportedVersionError(
                self,
                Version(".".join(map(str, self.SUPPORTED_LO))),
                Version(".".join(map(str, self.SUPPORTED_HI))),
            )
        return self

    def __eq__(self, other) -> bool:
        return self.tuple == Version(other).tuple

    def __lt__(self, other) -> bool:
        return self.tuple < Version(other).tuple

    def __hash__(self) -> int:
        return hash(self.tuple)

    def __str__(self) -> str:
        return ".".join(map(str, self.tuple))

    def __repr__(self) -> str:
        return f"Version({str(self)!r})"
