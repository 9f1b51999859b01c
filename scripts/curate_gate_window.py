"""Generate the 50-slot gate window from attestation debt — no hand-curation.

The driver's correctness gate runs exactly ``list(queries())[:50]``;
``catalog.GATE_PRIORITY`` pins that window.  Rounds 2-4 curated it by hand
and round 4 shipped a stale window (the rotation-debt guard caught it but
the suite went red).  This script IS the curation policy, mechanised
(round-4 judge ask #2):

  1. flagship ``q1_pricing_summary`` always occupies slot 1 (re-attested
     every round so the headline query never accrues debt);
  2. the remaining 49 slots go to the entries with the OLDEST effective
     attestation, where effective = max(last green driver round from the
     committed CORRECTNESS_r*.json files, first_seen from
     tests/fixtures/entry_first_seen.json);
  3. ties (same round) break by registration order, so the window is
     deterministic for a given repo state.

With 150-odd entries and a 50-slot window a full rotation takes 3 rounds,
so this policy alone keeps rounds-since-attestation < 3 for every entry —
``tests/test_catalog_parity.py::test_gate_window_matches_generator``
asserts committed == generated, turning rotation debt into a tautology.

Usage:
    python scripts/curate_gate_window.py            # print the window
    python scripts/curate_gate_window.py --check    # exit 1 on drift
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

FLAGSHIP = "q1_pricing_summary"
WINDOW = 50


def attestation_history(root: str = _ROOT) -> tuple[dict[str, int], int]:
    """(last green driver round per entry, upcoming round number)."""
    hist: dict[str, int] = {}
    rounds: list[int] = []
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name, res in json.load(open(f)).items():
            ok = (
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match") in (True, None)
                and not res.get("err")
            )
            if ok:
                hist[name] = max(hist.get(name, 0), rnd)
    return hist, (max(rounds) + 1 if rounds else 1)


def generate_window(root: str = _ROOT) -> list[str]:
    from aroa_etl_spark.plans import catalog

    hist, _upcoming = attestation_history(root)
    first_seen = json.load(
        open(os.path.join(root, "tests", "fixtures", "entry_first_seen.json"))
    )
    names = list(catalog._REGISTRY)  # registration order = stable tiebreak
    missing = sorted(n for n in names if n not in first_seen)
    if missing:
        raise SystemExit(
            f"entries missing from tests/fixtures/entry_first_seen.json: {missing}"
        )
    reg_pos = {n: i for i, n in enumerate(names)}

    def effective(n: str) -> int:
        return max(hist.get(n, 0), first_seen[n])

    rest = sorted(
        (n for n in names if n != FLAGSHIP),
        key=lambda n: (effective(n), reg_pos[n]),
    )
    window = [FLAGSHIP] + rest[: WINDOW - 1]
    # only oracle-backed entries may occupy gate slots (the driver's
    # hash gate needs an oracle; rows-only entries would weaken the window)
    oracles = catalog.oracle_sql()
    no_oracle = [n for n in window if n not in oracles]
    if no_oracle:
        raise SystemExit(f"gate window admitted oracle-less entries: {no_oracle}")
    return window


def main() -> int:
    from aroa_etl_spark.plans import catalog

    window = generate_window()
    if "--check" in sys.argv:
        committed = list(catalog.GATE_PRIORITY)
        if committed != window:
            gen = set(window)
            com = set(committed)
            print("DRIFT: committed GATE_PRIORITY != generated window")
            print(f"  only committed: {sorted(com - gen)}")
            print(f"  only generated: {sorted(gen - com)}")
            if com == gen:
                print("  (same set, different order)")
            return 1
        print("GATE_PRIORITY matches the generated window (50/50).")
        return 0
    hist, upcoming = attestation_history()
    print(f"# generated gate window for round {upcoming} "
          f"(oldest-attestation-first + flagship)")
    for n in window:
        print(f'    "{n}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
