#!/usr/bin/env python
"""Round-over-round benchmark regression diff.

Analog of the reference's scripts/benchmark_compare.c (old-vs-new
benchmark diff): per-op and per-family throughput numbers are recorded
into tools/bench_history.json keyed by round, and `diff` flags any
metric that regressed by more than the threshold (default 15% — the
r3 wideband B=32 regression was caught by hand; this automates it).

Usage:
    python tools/bench_compare.py record <round> name=value [name=value ...]
    python tools/bench_compare.py record <round> --json '<json line>'
        (accepts the {"metric": ..., "msps"/"wideband_msps"/"value": N}
         lines the bench_* tools print)
    python tools/bench_compare.py diff <old_round> <new_round> [--threshold 0.15]
        exit 0 = no regressions beyond threshold, 1 = regressions found
    python tools/bench_compare.py show [round]
"""
import json
import pathlib
import sys

HISTORY = pathlib.Path(__file__).resolve().parent / "bench_history.json"
_VALUE_KEYS = ("msps", "wideband_msps", "value", "kframes_per_s", "gmacs")


def _load():
    if HISTORY.exists():
        return json.loads(HISTORY.read_text())
    return {}


def _save(hist):
    HISTORY.write_text(json.dumps(hist, indent=1, sort_keys=True) + "\n")


def record(rnd, pairs):
    hist = _load()
    hist.setdefault(rnd, {}).update(pairs)
    _save(hist)
    for k, v in sorted(pairs.items()):
        print(f"recorded {rnd}: {k} = {v}")


def _parse_json_line(line):
    d = json.loads(line)
    name = d.get("metric", "metric")
    for k in _VALUE_KEYS:
        if k in d:
            return {name: float(d[k])}
    raise ValueError(f"no value key in {line!r} (looked for {_VALUE_KEYS})")


def diff(old, new, threshold=0.15):
    hist = _load()
    if old not in hist or new not in hist:
        print(f"missing round(s): have {sorted(hist)}", file=sys.stderr)
        return 2
    a, b = hist[old], hist[new]
    regressions = []
    rows = []
    for name in sorted(set(a) | set(b)):
        va, vb = a.get(name), b.get(name)
        if va is None:
            rows.append((name, "-", f"{vb:.1f}", "NEW", ""))
        elif vb is None:
            # rounds record incrementally; an unmeasured metric is not
            # a regression, just unmeasured this round
            rows.append((name, f"{va:.1f}", "-", "unmeas", ""))
        else:
            rel = (vb - va) / va
            flag = ""
            if rel < -threshold:
                flag = "REGRESSION"
                regressions.append((name, f"{rel * 100:+.1f}%"))
            rows.append((name, f"{va:.1f}", f"{vb:.1f}",
                         f"{rel * 100:+.1f}%", flag))
    w = max(len(r[0]) for r in rows) if rows else 10
    print(f"{'metric':{w}s} {old:>12s} {new:>12s} {'delta':>8s}")
    for name, va, vb, d, flag in rows:
        print(f"{name:{w}s} {va:>12s} {vb:>12s} {d:>8s} {flag}")
    if regressions:
        print(f"\n{len(regressions)} regression(s) beyond "
              f"{threshold * 100:.0f}%:", file=sys.stderr)
        for name, msg in regressions:
            print(f"  {name}: {msg}", file=sys.stderr)
        return 1
    print(f"\nno regressions beyond {threshold * 100:.0f}%")
    return 0


# history-key -> tests/baseline_perop.json key, where the names differ
_CRATIO_ALIASES = {
    "symsync_B256": "symsync_k2",
    "symtrack_B256": "symtrack",
    "eqlms13_trained_B256": "eqlms13_trained",
    "eqrls13_trained_B256": "eqrls13_trained",
}


def cratio(rnd, floor=1.0):
    """TPU-vs-reference-C ratio check (VERDICT r4 item 1): every per-op
    metric recorded for `rnd` that has a reference-C baseline in
    tests/baseline_perop.json must be >= `floor` x the C number.
    Exit 1 if any op falls below."""
    base_path = (pathlib.Path(__file__).resolve().parent.parent /
                 "tests/baseline_perop.json")
    base = json.loads(base_path.read_text())
    hist = _load()
    if rnd not in hist:
        print(f"missing round {rnd}: have {sorted(hist)}",
              file=sys.stderr)
        return 2
    vals = hist[rnd]
    below = []
    rows = []
    for name, v in sorted(vals.items()):
        ckey = _CRATIO_ALIASES.get(name, name)
        c = base.get(ckey)
        if c is None or c <= 0:
            continue
        ratio = v / c
        rows.append((name, v, c, ratio))
        if ratio < floor:
            below.append((name, ratio))
    w = max((len(r[0]) for r in rows), default=10)
    print(f"{'metric':{w}s} {'tpu':>10s} {'ref C':>10s} {'ratio':>9s}")
    for name, v, c, r in rows:
        flag = "  BELOW-C" if r < floor else ""
        print(f"{name:{w}s} {v:>10.1f} {c:>10.3f} {r:>8.1f}x{flag}")
    if below:
        print(f"\n{len(below)} op(s) below {floor}x reference C:",
              file=sys.stderr)
        for name, r in below:
            print(f"  {name}: {r:.2f}x", file=sys.stderr)
        return 1
    print(f"\nall measured ops >= {floor}x reference C")
    return 0


def main(argv):
    if not argv:
        print(__doc__)
        return 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "cratio":
        floor = 1.0
        if "--floor" in rest:
            j = rest.index("--floor")
            floor = float(rest[j + 1])
            rest = rest[:j] + rest[j + 2:]
        return cratio(rest[0], floor)
    if cmd == "record":
        rnd = rest[0]
        pairs = {}
        i = 1
        while i < len(rest):
            if rest[i] == "--json":
                pairs.update(_parse_json_line(rest[i + 1]))
                i += 2
            else:
                k, v = rest[i].split("=", 1)
                pairs[k] = float(v)
                i += 1
        record(rnd, pairs)
        return 0
    if cmd == "diff":
        thr = 0.15
        if "--threshold" in rest:
            j = rest.index("--threshold")
            thr = float(rest[j + 1])
            rest = rest[:j] + rest[j + 2:]
        return diff(rest[0], rest[1], thr)
    if cmd == "show":
        hist = _load()
        if rest:
            print(json.dumps(hist.get(rest[0], {}), indent=1, sort_keys=True))
        else:
            print(json.dumps(hist, indent=1, sort_keys=True))
        return 0
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
