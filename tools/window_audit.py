"""Mechanical staleness guard for the driver's 50-slot correctness window
(VERDICT r6 item 3 — the r6 window comment tracked this by hand; this makes
it a CI-style check).

Reads every ``CORRECTNESS_r*.json`` plus the live registry ordering
(``load_all()``) and fails if the *plan* for the upcoming round leaves an
evidence hole:

1. **Never measured** — a registered query with zero driver rows across all
   rounds must sit inside the upcoming window (first ``WINDOW`` entries of
   ``load_all()``).
2. **Stale** — a query whose latest driver row is older than
   ``MAX_AGE_ROUNDS`` rounds behind the latest judged round must be in the
   window (or explicitly grandfathered below).
3. **Oracle upgraded** — a query whose latest driver row recorded
   ``no_oracle`` while the registry now carries a value oracle must be in
   the window: the upgrade is unproven at the driver until re-measured.
4. **Red** — a query whose latest driver row failed (rows/schema/hash
   mismatch or a non-``no_oracle`` error) must be in the window.

Exit 0 = every invariant holds for the upcoming round's window; exit 1
prints each violation. Run from the repo root (or anywhere — paths are
repo-relative to this file). Wired into pytest via
``tests/test_window_audit.py`` so a registry edit that silently squeezes
the guard out fails the suite, not a judging round.

Staleness semantics — deliberate two-tier design (r8 review considered and
rejected tightening rule 2 to the upcoming round): the HARD rule fails on
evidence that is already ``MAX_AGE_ROUNDS`` old against the *existing*
CORRECTNESS files, which means a cohort can momentarily reach age
MAX_AGE_ROUNDS when a round lands and the NEXT build is then forced to
refresh it — a hard floor with one-round grace. Counting age against the
upcoming round instead would flag the next cohort the moment a round's
file lands, i.e. the suite would be red at every judging checkpoint in
steady state (the build that fixes it hasn't started yet). The tighter
refresh-at-age-4 convention the builds actually follow is surfaced by
``forecast()`` below — advisory, printed on every run, so the build phase
sees the mandatory load and free-slot count up front.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50
MAX_AGE_ROUNDS = 4

# Queries allowed to stay rows-only forever (engine-specific sketches whose
# exact twin carries the value evidence) — exempt from rule 3.
ROWS_ONLY_BY_DESIGN = {"agg_approx_distinct"}


def load_driver_history() -> tuple[int, dict[str, tuple[int, dict]]]:
    """(latest_round, {query: (latest_round_measured, latest_row)})."""
    latest: dict[str, tuple[int, dict]] = {}
    max_round = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        max_round = max(max_round, rnd)
        with open(f) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            # max by PARSED round number, not file order: lexicographic
            # sorting would let r9 beat r10 (or a stray non-padded r1 beat
            # r01) and silently corrupt the staleness audit (ADVICE r7).
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, row)
    return max_round, latest


def audit() -> list[str]:
    sys.path.insert(0, REPO)
    from dbt_decodable_spark.queries import load_all

    registry = load_all()
    names = list(registry)
    window = set(names[:WINDOW])
    max_round, latest = load_driver_history()

    problems: list[str] = []
    for name, qdef in registry.items():
        got = latest.get(name)
        if got is None:
            if name not in window:
                problems.append(
                    f"NEVER-MEASURED outside window: {name} has no driver "
                    f"row in any of rounds 1-{max_round}"
                )
            continue
        rnd, row = got
        is_no_oracle = row.get("err") == "no_oracle"
        failed = (not is_no_oracle) and (
            row.get("err") is not None
            or row.get("rows_match") is False
            or row.get("schema_match") is False
            or row.get("hash_match") is False
        )
        if failed and name not in window:
            problems.append(
                f"RED outside window: {name} latest driver row (r{rnd}) "
                f"failed: {row}"
            )
        if (
            is_no_oracle
            and qdef.oracle is not None
            and name not in window
            and name not in ROWS_ONLY_BY_DESIGN
        ):
            problems.append(
                f"ORACLE-UPGRADED outside window: {name} latest driver row "
                f"(r{rnd}) is no_oracle but the registry now has a value "
                f"oracle — the upgrade is unproven at the driver"
            )
        if max_round - rnd >= MAX_AGE_ROUNDS and name not in window:
            problems.append(
                f"STALE outside window: {name} last driver-measured r{rnd} "
                f"(latest judged round r{max_round}, max age "
                f"{MAX_AGE_ROUNDS})"
            )
    return problems


def forecast() -> list[str]:
    """Non-failing lookahead: rows that will hit the staleness bound at the
    round AFTER the upcoming one (i.e., the NEXT round's mandatory window
    load). Prints the slot arithmetic the next round must start from —
    the r7→r8 squeeze (45 mandatory rows, 5 free slots) showed this must
    be known before any new query is registered."""
    sys.path.insert(0, REPO)
    from dbt_decodable_spark.queries import load_all

    registry = load_all()
    max_round, latest = load_driver_history()
    # After the upcoming round (r{max+1}) lands, rows in the current window
    # refresh to age 0 and everything else ages one. The NEXT round's
    # (r{max+2}) build must then put every row whose evidence would reach
    # age MAX_AGE_ROUNDS into its window: rows NOT in the current window
    # with rnd <= (max_round + 2) - MAX_AGE_ROUNDS.
    names = list(registry)
    window = set(names[:WINDOW])
    due = sorted(
        name
        for name, (rnd, _) in latest.items()
        if name in registry
        and name not in window
        and (max_round + 2) - rnd >= MAX_AGE_ROUNDS
    )
    out = []
    if due:
        out.append(
            f"forecast: {len(due)} row(s) become window-mandatory for the "
            f"r{max_round + 2} build (evidence age {MAX_AGE_ROUNDS} when "
            f"r{max_round + 2} lands); free slots then: {WINDOW - len(due)} "
            f"— gate new registry additions on this."
        )
        out.extend(f"  due-next-round: {n}" for n in due)
    else:
        out.append("forecast: no rows age out next round")
    # second horizon: assuming the upcoming round measures its planned
    # window and the next round measures the first-horizon dues, rows
    # whose evidence would reach MAX_AGE_ROUNDS at r{max+3} are everything
    # measured at r{max+3-MAX_AGE_ROUNDS} that neither window refreshes —
    # printed so a build never learns about a 50-row cohort one round late
    due1 = set(due)
    window = set(names[:WINDOW])
    due2 = sorted(
        name
        for name, (rnd, _) in latest.items()
        if name in registry
        and name not in window
        and name not in due1
        and (max_round + 3) - rnd >= MAX_AGE_ROUNDS
    )
    if due2:
        out.append(
            f"forecast+2: {len(due2)} row(s) follow at the "
            f"r{max_round + 3} build; free slots then: {WINDOW - len(due2)}"
        )
    return out


def main() -> int:
    problems = audit()
    if problems:
        for p in problems:
            print(p)
        print(f"\nwindow_audit: {len(problems)} violation(s)")
        return 1
    print("window_audit: OK — upcoming window covers every evidence hole")
    for line in forecast():
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
