"""Per-query bench regression guard.

Compares a fresh bench.py JSON line against the most recent recorded
BENCH_r*.json and exits non-zero if any query regressed more than 2x
its baseline (plus a small absolute slack so scheduler jitter on
sub-0.5s queries cannot trip the gate).  BENCH_r02 is the first round
that produced numbers, so from round 3 on the 2x bar has a concrete
per-query value — this is that bar, enforced before round close.

Run:  python tools/bench_guard.py NEW_JSON_FILE [BASELINE_FILE]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

FACTOR = 2.0
SLACK_SEC = 0.3


def _known_query_names() -> set[str] | None:
    """The bench's query-name universe, for sanity-checking recovered
    keys (r10 advice item 3).  Lazy: importing bench pulls pyspark;
    only the tail-recovery fallback pays that cost.  None = could not
    resolve (don't filter)."""
    try:
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        import bench
        return set(bench.HEADLINE) | {"crawl_json_sum"}
    except Exception:
        return None


def _unwrap(data: dict) -> dict:
    """Driver-recorded BENCH_r*.json nests bench.py's line under
    'parsed'; a raw bench.py line is already flat.  Some driver logs
    carry parsed=null with the JSON line only in a (front-truncated)
    'tail' string — recover the per-query dict by regex in that case
    (the queries map sits at the end, so truncation never clips it)."""
    if not isinstance(data, dict):
        return {}
    inner = data.get("parsed", data)
    if isinstance(inner, dict):
        return _merge_sidecar(inner)
    tail = data.get("tail")
    if isinstance(tail, str):
        qm = re.search(r'"queries": \{(.*?)\}', tail)
        if qm:
            body = qm.group(1)
        else:
            # Front-truncation can clip the '"queries": {' opener
            # itself (seen in BENCH_r09.json) — the tail then STARTS
            # mid-map, so every pair before the first '}' still
            # belongs to the queries map.  Partial per-query coverage
            # beats silently falling back to a rounds-old baseline.
            body = tail.split("}", 1)[0]
        qs = {k: float(v) for k, v in
              re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', body)}
        if qs:
            # If truncation landed inside a DIFFERENT nested object,
            # the recovered pairs are foreign keys — intersect with
            # the known query-name universe before trusting them.
            known = _known_query_names()
            if known is not None:
                qs = {k: v for k, v in qs.items() if k in known}
        if qs:
            vm = re.search(r'"value": ([0-9.]+)', tail)
            return {"queries": qs,
                    "value": float(vm.group(1)) if vm else None}
    return {}


def _merge_sidecar(inner: dict) -> dict:
    """bench.py trims the stdout per-query map to fit the driver's
    log capture and writes the complete full-precision map to a
    sidecar ('queries_full').  Use the sidecar when it provably
    belongs to the same run: the sidecar is overwritten per run, so
    an old baseline's pointer may reference a NEWER run's file — the
    totals must match before trusting it."""
    side_rel = inner.get("queries_full")
    if not (isinstance(side_rel, str) and inner.get("queries_omitted")):
        return inner
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (side_rel, os.path.join(repo_root, side_rel)):
        try:
            side = json.load(open(cand))
        except (OSError, ValueError):
            continue
        if (isinstance(side, dict) and side.get("queries")
                and side.get("value") == inner.get("value")
                and len(side["queries"]) == inner.get("n_queries")):
            merged = dict(inner)
            merged["queries"] = side["queries"]
            return merged
    return inner


def latest_baseline(repo_root: str) -> str | None:
    cands = glob.glob(os.path.join(repo_root, "BENCH_r*.json"))
    best, best_n = None, -1
    for p in cands:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            data = _unwrap(json.load(open(p)))
        except (OSError, ValueError):
            continue
        if not data.get("queries"):      # DNF rounds carry no timings
            continue
        n = int(m.group(1))
        if n > best_n:
            best, best_n = p, n
    return best


def main() -> int:
    new_path = sys.argv[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_path = sys.argv[2] if len(sys.argv) > 2 else latest_baseline(repo_root)
    if base_path is None:
        print("bench_guard: no baseline BENCH_r*.json with timings; skipping")
        return 0
    new = _unwrap(json.load(open(new_path)))
    base = _unwrap(json.load(open(base_path)))
    nq, bq = new.get("queries", {}), base.get("queries", {})
    if new.get("errors"):
        print(f"bench_guard: FAIL — bench reported errors: "
              f"{sorted(new['errors'])}")
        return 1
    # Normalize by the median per-query ratio: the baseline was recorded
    # on the driver's machine-state-of-the-day, and a uniformly slower
    # (or faster) environment shifts EVERY query by the same factor —
    # that is drift, not regression.  A real regression is a query that
    # slowed relative to the rest of the bench.
    ratios = sorted(nq[n] / bq[n] for n in bq
                    if n in nq and bq[n] > 0)
    med = ratios[len(ratios) // 2] if ratios else 1.0
    med = max(med, 1.0)     # a faster machine must not hide regressions
    bad = []
    # A trimmed stdout line whose sidecar could not be merged has
    # legitimately-absent cheap queries; only genuinely-full new maps
    # can prove a query VANISHED.
    new_trimmed = bool(new.get("queries_omitted")) and \
        len(nq) < (new.get("n_queries") or len(nq))
    for name, old_t in sorted(bq.items()):
        t = nq.get(name)
        if t is None:
            if new_trimmed:
                continue
            bad.append(f"{name}: missing from new bench (baseline {old_t}s)")
        elif t > FACTOR * med * old_t + SLACK_SEC:
            bad.append(f"{name}: {t}s vs baseline {old_t}s "
                       f"(> {FACTOR}x past the bench-wide median "
                       f"drift {med:.2f}x, + {SLACK_SEC}s)")
    if bad:
        print(f"bench_guard: FAIL vs {os.path.basename(base_path)}:")
        for b in bad:
            print("  " + b)
        return 1
    print(f"bench_guard: OK — {len(bq)} queries within {FACTOR}x of "
          f"{os.path.basename(base_path)} (total {new.get('value')}s vs "
          f"{base.get('value')}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
