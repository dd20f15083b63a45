"""Registry-rotation invariant (round-3 verdict task 7).

The driver checks at most the first 50 ``queries()`` entries per round
(observed: CORRECTNESS_r02 == registry slots 1-50 at the time). To make
the cross-round rotation mechanical instead of comment-enforced, this
test loads every CORRECTNESS_r*.json committed so far and asserts that
every registry entry WITHOUT a fully-green (rows+schema+hash — or, for
no-oracle entries, rows-only) driver row sits inside slots 1-50, i.e.
will be checked by the next driver run.
"""

import glob
import json
import os

import __spark_entry__ as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _rows():
    out = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(f) as fh:
            for name, row in json.load(fh).items():
                out.setdefault(name, []).append(row)
    return out


def _proven(name, rows, oracle_backed):
    for row in rows:
        if oracle_backed:
            if row.get("err"):
                continue
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                return True
        else:
            # Rows-only entries can never hash-match; the driver records
            # them as err="no_oracle" with the observed row count. A
            # clean run (row count present, no other error) IS their
            # proof — the strongest check the driver defines for them —
            # so they rotate out of the window like everything else.
            if row.get("err") not in (None, "no_oracle"):
                continue
            if row.get("rows_match") or row.get("spark_rows") is not None:
                return True
    return False


def test_unproven_entries_fit_driver_window():
    names = list(E.queries())
    oracles = set(E.oracle_sql())
    rows = _rows()
    unproven = [
        n for n in names if not _proven(n, rows.get(n, []), n in oracles)
    ]
    assert len(unproven) <= DRIVER_WINDOW, (
        f"{len(unproven)} unproven entries exceed the {DRIVER_WINDOW}-slot "
        f"driver window; rotation cannot finish in one round: {unproven}"
    )
    window = set(names[:DRIVER_WINDOW])
    stranded = [n for n in unproven if n not in window]
    assert not stranded, (
        "registry entries lacking a green CORRECTNESS row must occupy "
        f"slots 1-{DRIVER_WINDOW} so the next driver run proves them; "
        f"stranded past the window: {stranded}"
    )


def test_standing_rotation_fills_window_with_stalest_evidence():
    """r11 verdict What's-missing #1: the window is now a STANDING
    policy — pinned (additions + changed-code) first, never-green
    next, then the oldest-newest-green fill derived from the committed
    artifacts. Re-derive the expected composition independently from
    the artifacts and assert the actual window equals it, so a future
    hand edit that strands stale evidence fails loudly."""
    names = list(E.queries())
    window = names[:DRIVER_WINDOW]
    oracles = set(E.oracle_sql())
    rows = _rows()

    newest: dict[str, int] = {}
    import re

    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        with open(f) as fh:
            for name, row in json.load(fh).items():
                green = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and not row.get("err")
                ) or (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                )
                if green:
                    newest[name] = max(newest.get(name, 0), rnd)

    pinned = [n for n in E._R13_PINNED if n in names]
    taken = set(pinned)
    unproven = [n for n in names if n not in newest and n not in taken]
    taken.update(unproven)
    fill = sorted(
        (n for n in names if n not in taken),
        key=lambda n: (newest[n], n),
    )
    expected = (pinned + unproven + fill)[:DRIVER_WINDOW]
    assert window == expected, (
        "queries() slots 1-50 must equal pinned + never-green + "
        "stalest-evidence fill (standing rotation policy)"
    )
    # every pinned or never-green name must actually fit — otherwise
    # the round adds more debt than the window can prove
    assert len(pinned) + len(unproven) <= DRIVER_WINDOW
    # and the fill must leave no STALER name outside the window than
    # any non-pinned name inside it (the no-strand property)
    in_fill = [n for n in window if n in set(fill)]
    out_fill = [n for n in fill if n not in set(window)]
    if in_fill and out_fill:
        assert max(newest[n] for n in in_fill) <= min(
            newest[n] for n in out_fill
        )
    _ = oracles, rows  # independence of the oracle split is deliberate


def test_registry_counts_match_docstring():
    names = list(E.queries())
    oracles = set(E.oracle_sql())
    assert len(names) == 333
    assert len(oracles) == 325
    assert set(oracles) <= set(names)


def test_round_addition_counts_derived_not_prose(tmp_path):
    """Per-round addition counts are DERIVED from the committed
    CORRECTNESS artifacts, never stated numerically in registry prose —
    the r8 docstring said "the 12 round-8 additions" while the window
    carried 15 first-green names (r8 verdict What's-wrong #3). This
    asserts (a) the derived first-green composition for the closed
    rounds, and (b) that the docstring carries no per-round count to
    drift again."""
    import re

    first_seen: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        with open(f) as fh:
            for name in json.load(fh):
                first_seen.setdefault(name, rnd)
    counts: dict[int, int] = {}
    for name, rnd in first_seen.items():
        counts[rnd] = counts.get(rnd, 0) + 1
    # closed-round windows (the driver checks 50 slots per round): the
    # r8 window = 15 first-green additions + 35 re-earns of names first
    # green in earlier rounds.
    assert counts.get(8) == 15
    assert sum(1 for f in first_seen.values() if f == 8) == 15
    assert counts.get(9) == 19  # r9 window: 19 first-green + 31 re-earns
    # the survey's window-composition sentence must carry the DERIVED
    # r9 split (the r9 prose drifted to "6 additions + 10 changed + 34
    # stalest" while the artifact held 19+31 — r9 verdict What's-wrong
    # #1); this pins the corrected paragraph to the artifact numbers.
    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        survey = fh.read()
    assert "19 first-green r9 additions + 31 re-earns" in survey
    # the registry docstring must not state a numeric per-round
    # addition count ("the NN round-K additions") — this test owns it
    doc = E.__doc__ or ""
    assert not re.search(r"\b\d+\s+round-\d+\s+additions", doc), (
        "registry docstring states a numeric per-round addition count; "
        "derive it here instead (r8 verdict task 6)"
    )
