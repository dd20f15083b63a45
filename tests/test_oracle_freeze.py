"""Oracle-SQL freeze check (r12 verdict What's-wrong #1 / next-round #2).

The DuckDB oracle text in ``__spark_entry__.py`` is the ground truth the
driver's differential gate replays Spark against. A change that edits an
operator AND its oracle in the same diff passes that gate BY
CONSTRUCTION — the exact channel a value-changing rewrite (honest or
not) slips through. bootstrap_mean_ci's r12 RNG-stream change used it
(disclosed, driver-accepted, re-baselined — its CURRENT stream is what
this file pins).

Discipline enforced here: every oracle's SQL is pinned by sha256 in
``tests/oracle_sql_pins.json``. During OPTIMIZATION rounds the pins must
not move — a performance rewrite must leave every declared result, and
therefore every oracle, byte-identical. A BUILD round that legitimately
adds or re-baselines a query regenerates the snapshot in its own commit
(``python tests/test_oracle_freeze.py --regen``), making the semantic
change explicit and reviewable instead of implicit in a 9k-line file's
diff noise.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PINS = os.path.join(HERE, "oracle_sql_pins.json")


def _current() -> dict[str, str]:
    sys.path.insert(0, os.path.dirname(HERE))
    import __spark_entry__ as E

    return {
        k: hashlib.sha256(v.encode()).hexdigest()
        for k, v in E.oracle_sql().items()
    }


def test_oracle_sql_matches_pinned_snapshot():
    with open(PINS) as fh:
        pinned = json.load(fh)
    cur = _current()
    changed = sorted(
        k for k in pinned if k in cur and cur[k] != pinned[k]
    )
    removed = sorted(k for k in pinned if k not in cur)
    assert not changed and not removed, (
        f"oracle SQL changed={changed} removed={removed}: declared query "
        "semantics moved. If this is a deliberate BUILD-round re-baseline, "
        "regenerate the snapshot (python tests/test_oracle_freeze.py "
        "--regen) in the same commit and say so in the round log; an "
        "OPTIMIZATION round must keep every oracle byte-identical."
    )
    # additions are allowed (build rounds register new queries) — they
    # just need pinning so the NEXT round's freeze covers them
    unpinned = sorted(k for k in cur if k not in pinned)
    assert not unpinned, (
        f"new oracle entries lack pins: {unpinned} — run "
        "python tests/test_oracle_freeze.py --regen and commit the snapshot"
    )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        cur = _current()
        with open(PINS, "w") as fh:
            json.dump(dict(sorted(cur.items())), fh, indent=1)
        print(f"pinned {len(cur)} oracle entries -> {PINS}")
    else:
        print(__doc__)
