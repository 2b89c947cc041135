"""Round-N prep: derive the next queries() ordering from the driver's
latest correctness log.

Reads the highest CORRECTNESS_r{N}.json (written by the driver at
round close), diffs it against the current surface and every
_CHECKED_R* tuple already in __spark_entry__.py, and prints
ready-to-paste _CHECKED_R{N} and _FRONT_R{N+1} tuples:

* _CHECKED_R{N}  — exactly the keys the driver checked this round.
* _FRONT_R{N+1}  — every query with NO driver row in any round, to
  run first next round.  Remember to MANUALLY prepend any
  driver-red row being re-fronted after a fix (the tool only sees
  never-checked rows).

Run:  python tools/make_front.py
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import __spark_entry__ as entry  # noqa: E402


def _tuple_src(name: str, items: list[str]) -> str:
    body = ", ".join(f'"{x}"' for x in items) + ("," if items else "")
    return f"{name} = (\n" + textwrap.fill(
        body, 72, initial_indent="    ", subsequent_indent="    ") + "\n)"


def main() -> None:
    import glob
    import re
    logs = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not logs:
        sys.exit("no CORRECTNESS_r*.json yet — run after a driver gate.")
    path = logs[-1]
    n = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
    rn = list(json.load(open(path)))
    q = list(entry.queries())
    checked = set(rn)
    for name in dir(entry):
        if name.startswith("_CHECKED_R"):
            checked |= set(getattr(entry, name))
    never = [x for x in q if x not in checked]
    print(f"# driver checked {len(rn)} queries in r{n:02d}; "
          f"{len(never)} of {len(q)} still have no driver row\n")
    print(_tuple_src(f"_CHECKED_R{n:02d}", rn))
    print()
    print(_tuple_src(f"_FRONT_R{n + 1:02d}", never))
    stale = [x for x in rn if x not in q]
    if stale:
        print(f"\n# WARNING: driver checked {stale} but queries() no "
              "longer has them")
    # Staleness rotation report (VERDICT r06 item 1): last driver
    # round per query, oldest first — the rows the next front should
    # rotate into the ~50-query budget after the never/changed block.
    last = {}
    rounds = []
    for name in sorted(x for x in dir(entry)
                       if x.startswith("_CHECKED_R")):
        rounds.append((name, set(getattr(entry, name))))
    rounds.append((f"_CHECKED_R{n:02d}", set(rn)))
    for name, keys in rounds:
        for k in keys:
            last[k] = name
    order = sorted((x for x in q if x in last),
                   key=lambda x: (last[x], x))
    from collections import Counter
    print("\n# last-driver-round distribution:",
          dict(Counter(last[x] for x in order)))
    print("# 50 stalest (oldest round first) — rotation candidates:")
    print(_tuple_src("_STALEST_50", order[:50]))


if __name__ == "__main__":
    main()
