#!/usr/bin/env python3
"""Bench regression gate: compare two Bench JSON lines per query.

Usage: bench_diff.py OLD.json NEW.json [threshold]

Exits 1 if any query shared by both runs slowed down by more than
`threshold` (default 1.5x), so round-over-round regressions are caught
without a judge. New/removed queries are reported informationally.
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    # driver-format wrapper: {"parsed": {...}} or the JSON line embedded
    # (possibly [info]-prefixed) in a "tail" capture
    doc = json.loads(text)
    if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
        return doc["parsed"]
    for line in doc.get("tail", "").splitlines():
        i = line.find('{"metric"')
        if i >= 0 and '"queries"' in line:
            return json.loads(line[i:])
    # tail captures can truncate the LINE HEAD (driver wrappers keep the
    # last N bytes): recover any balanced {...} object following a known
    # key and rebuild a minimal doc
    tail = doc.get("tail", "")
    def obj_after(key):
        i = tail.find('"%s":{' % key)
        if i < 0:
            return None
        j = tail.index("{", i)
        depth = 0
        for k in range(j, len(tail)):
            depth += {"{": 1, "}": -1}.get(tail[k], 0)
            if depth == 0:
                return json.loads(tail[j:k + 1])
        return None
    queries = obj_after("queries")
    if queries is not None:
        out = {"queries": queries, "value": sum(v for v in queries.values() if v >= 0)}
        for key in ("calib", "calib_start", "probe_34m", "peak_task_mem"):
            o = obj_after(key)
            if o is not None:
                out[key] = o
        return out
    raise SystemExit(f"no bench JSON line in {path}")


def expand_aliases(doc):
    """r11+: the graded queries dict is keyed by tail ALIASES; the
    alias->name map rides in-band as "alias". Re-key to full names so
    pre-r11 records compare directly."""
    amap = doc.get("alias") or {}
    if amap and "queries" in doc:
        doc["queries"] = {amap.get(k, k): v for k, v in doc["queries"].items()}
    return doc


def main():
    old, new = expand_aliases(load(sys.argv[1])), expand_aliases(load(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    regressed = []
    for name in sorted(set(oq) & set(nq)):
        ratio = nq[name] / oq[name] if oq[name] > 0 else float("inf")
        flag = ""
        if ratio > threshold:
            regressed.append(name)
            flag = f"  <-- REGRESSION (>{threshold}x)"
        print(f"{name:28s} {oq[name]:8.2f}s -> {nq[name]:8.2f}s  ({ratio:5.2f}x){flag}")
    for name in sorted(set(nq) - set(oq)):
        print(f"{name:28s}     new -> {nq[name]:8.2f}s")
    for name in sorted(set(oq) - set(nq)):
        print(f"{name:28s} {oq[name]:8.2f}s -> removed")
    print(f"total{'':23s} {old.get('value', 0):8.2f}s -> {new.get('value', 0):8.2f}s")
    # calibration probes (fixed-size compute): a ratio far above 1.0 on
    # these means the NEW run's box was contended, not the code slower.
    # calib_start/calib cover the ends of the timed window; probe_34m is
    # the per-query trace that catches TRANSIENT contention in between
    # (round 4's driver run was contended during the dedup block only —
    # end-of-run probes looked clean while dedup timings ran 2-3x hot).
    def cal(v):
        # r9+ format: [start, end] arrays per probe; earlier: scalar
        return min(v) if isinstance(v, list) else v

    for key in ("calib_start", "calib"):
        oc, nc = old.get(key) or {}, new.get(key) or {}
        for probe in sorted(set(oc) | set(nc)):
            if probe in oc and probe in nc and cal(oc[probe]) > 0:
                print(f"{key} {probe:22s} {cal(oc[probe]):8.2f}s -> {cal(nc[probe]):8.2f}s  ({cal(nc[probe])/cal(oc[probe]):5.2f}x)")
            elif probe in nc:
                print(f"{key} {probe:22s}     new -> {cal(nc[probe]):8.2f}s")
    op, np_ = old.get("probe_34m") or {}, new.get("probe_34m") or {}
    if np_:
        base = min(np_.values())
        hot = {q: v for q, v in np_.items() if v > 2.0 * base}
        if hot:
            print(f"probe_34m: {len(hot)} queries ran on a contended box "
                  f"(probe > 2x the run's floor {base:.3f}s):")
            for q, v in sorted(hot.items(), key=lambda kv: -kv[1]):
                print(f"  {q:28s} probe {v:6.3f}s ({v/base:4.1f}x floor)"
                      + (f", was {op[q]:6.3f}s" if q in op else ""))
        else:
            print(f"probe_34m: per-query probes flat (floor {base:.3f}s) — "
                  "no transient contention detected")
    if regressed:
        print(f"FAIL: {len(regressed)} regressed: {', '.join(regressed)}")
        sys.exit(1)
    print("OK: no per-query regression above threshold")


if __name__ == "__main__":
    main()
