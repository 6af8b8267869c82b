"""Build ``tools/bench_quiet_ref.json`` — the per-query quiet-window
reference ``bench.py`` uses to self-annotate shared-disk/host-steal
outliers (one sanctioned retry + a ``window_notes`` entry in the output
JSON, VERDICT r4 #2).

The reference is the per-query MINIMUM across every recorded bench run:
the driver artifacts ``BENCH_r*.json`` (whose ``parsed`` field holds the
bench JSON line) plus any extra run files passed as arguments (raw
bench.py output, one JSON line). The minimum across windows IS the
best-known-quiet number — any single run can be contaminated by host
steal, but no run can be faster than the box allows.

Usage: ``python tools/build_quiet_ref.py [extra_run.json ...]``
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tools", "bench_quiet_ref.json")


def _queries_from(path: str) -> dict[str, float]:
    """Per-query MINIMUM over every bench run recorded in the file.

    Driver artifacts hold several runs (``parsed`` = the median run plus a
    ``samples`` list with each repeat's own parsed line); the spec is the
    min across EVERY recorded run, so all of them are harvested (r6: the
    earlier version read only the median run, leaving refs ~1.5x looser
    than the best recorded window for the noisiest queries)."""
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return {}
    if not isinstance(doc, dict):
        return {}
    out: dict[str, float] = {}

    def _fold(qs) -> None:
        if not isinstance(qs, dict):
            return
        for name, sec in qs.items():
            if isinstance(sec, (int, float)) and (
                name not in out or sec < out[name]
            ):
                out[name] = sec

    _fold(doc.get("queries"))
    parsed = doc.get("parsed")
    if isinstance(parsed, dict):
        _fold(parsed.get("queries"))
    for sample in doc.get("samples") or []:
        if isinstance(sample, dict) and isinstance(sample.get("parsed"), dict):
            _fold(sample["parsed"].get("queries"))
    return out


def main() -> None:
    sources = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    sources += [a for a in sys.argv[1:]]
    ref: dict[str, float] = {}
    used: list[str] = []
    for src in sources:
        qs = _queries_from(src)
        if not qs:
            continue
        used.append(os.path.basename(src))
        for name, sec in qs.items():
            if isinstance(sec, (int, float)) and (
                name not in ref or sec < ref[name]
            ):
                ref[name] = sec
    payload = {
        "note": "per-query min across recorded bench runs — the "
        "best-known-quiet reference for bench.py's outlier retry",
        "sources": used,
        "queries": ref,
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"wrote": OUT, "n_queries": len(ref), "sources": used}))


if __name__ == "__main__":
    main()
