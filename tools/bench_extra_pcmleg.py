"""Isolated clips_validation leg timing (guide §1.4) — NOT the frozen bench.

Reuses bench.py's own validate_clips()/materialize_clips() so the
methodology is identical to the frozen contract; runs only the requested
parallelism legs so a kernel change can be A/B'd in ~1 minute instead of
a full bench pass.

Usage: python tools/bench_extra_pcmleg.py [par ...]   (default: 8)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (frozen module, imported read-only)


def main() -> None:
    pars = [int(a) for a in sys.argv[1:]] or [8]
    bench.materialize_clips()
    out = {}
    for p in pars:
        out[f"local{p}"] = bench.validate_clips(p, repeats=3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
