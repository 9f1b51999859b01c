"""Print / check the 50-slot gate window — thin wrapper over the catalog.

Since round 6 the window is computed AT IMPORT TIME by
``aroa_etl_spark.plans.catalog`` itself (``generate_window()`` over the
on-disk ``CORRECTNESS_r*.json`` files + ``tests/fixtures/
entry_first_seen.json``), so ``catalog.GATE_PRIORITY`` can never go stale
when the driver drops a new CORRECTNESS file after the end-of-round
snapshot (the round-5 failure mode: a committed static list is one round
behind by construction).  Policy, unchanged since round 5:

  1. flagship ``q1_pricing_summary`` always occupies slot 1;
  2. the remaining 49 slots go to the entries with the OLDEST effective
     attestation (max(last green driver round, first_seen));
  3. ties break by registration order — deterministic for a repo state.

Capacity bound: with N registry entries and 49 rotating slots/round, the
steady-state attestation debt is ceil((N-1)/49) rounds
(``catalog.rotation_debt_limit()``); ``tests/test_catalog_parity.py::
test_gate_rotation_debt`` enforces exactly that bound.

Usage:
    python scripts/curate_gate_window.py            # print the window
    python scripts/curate_gate_window.py --check    # exit 1 on drift
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from aroa_etl_spark.plans import catalog  # noqa: E402

attestation_history = catalog.attestation_history
generate_window = catalog.generate_window


def main() -> int:
    window = generate_window(_ROOT)
    if "--check" in sys.argv:
        live = list(catalog.GATE_PRIORITY)
        if live != window:
            gen = set(window)
            com = set(live)
            print("DRIFT: catalog.GATE_PRIORITY != generated window")
            print(f"  only live:      {sorted(com - gen)}")
            print(f"  only generated: {sorted(gen - com)}")
            if com == gen:
                print("  (same set, different order)")
            return 1
        print("GATE_PRIORITY matches the generated window (50/50).")
        return 0
    hist, upcoming = attestation_history(_ROOT)
    print(f"# generated gate window for round {upcoming} "
          f"(oldest-attestation-first + flagship)")
    for n in window:
        print(f'    "{n}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
