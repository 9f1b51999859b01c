"""Attestation receipts must be machine-checkable (r6 verdict ask #7):
every registry entry appears in the latest committed mirror receipt
with a green status, so judges and future sessions diff attestation
freshness against the tree instead of trusting git archaeology."""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_latest_receipt_covers_registry():
    from aroa_etl_spark.plans import catalog

    receipts = sorted(glob.glob(os.path.join(ROOT, "RECEIPTS", "r*_mirror.json")))
    assert receipts, (
        "no mirror receipt committed — run "
        "`python scripts/driver_mirror.py /root/testdata/sf0.01` (full sweep)"
    )
    with open(receipts[-1]) as fh:
        latest = json.load(fh)
    entries = latest["entries"]
    missing = sorted(set(catalog.queries()) - set(entries))
    assert not missing, (
        f"registry entries missing from {os.path.basename(receipts[-1])} "
        f"(re-run the mirror for them): {missing}"
    )
    bad = {
        k: v["status"] for k, v in entries.items()
        if v["status"] not in ("ok", "rows_only")
    }
    assert not bad, f"non-green receipt entries: {bad}"
