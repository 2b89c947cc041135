"""Round-6 prep: derive the next queries() ordering from the driver's
round-5 correctness log.

Reads CORRECTNESS_r05.json (written by the driver at round close),
diffs it against the current surface, and prints ready-to-paste
_CHECKED_R05 and _FRONT_R06 tuples for __spark_entry__.py:

* _CHECKED_R05 — exactly the keys the driver checked this round.
* _FRONT_R06  — every query with NO driver row in rounds 1-5 (the
  r05b additions plus anything the 50-query budget missed), to run
  first next round.

Run:  python tools/make_front_r06.py
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
    path = os.path.join(repo, "CORRECTNESS_r05.json")
    if not os.path.exists(path):
        sys.exit("CORRECTNESS_r05.json not written yet — run after the "
                 "round-5 driver gate.")
    r05 = list(json.load(open(path)))
    q = list(entry.queries())
    checked = (set(entry._CHECKED_R01) | set(entry._CHECKED_R02)
               | set(entry._CHECKED_R03) | set(entry._CHECKED_R04)
               | set(r05))
    never = [n for n in q if n not in checked]
    print(f"# driver checked {len(r05)} queries in r05; "
          f"{len(never)} of {len(q)} still have no driver row\n")
    print(_tuple_src("_CHECKED_R05", r05))
    print()
    print(_tuple_src("_FRONT_R06", never))
    stale = [n for n in r05 if n not in q]
    if stale:
        print(f"\n# WARNING: driver checked {stale} but queries() no "
              "longer has them")


if __name__ == "__main__":
    main()
