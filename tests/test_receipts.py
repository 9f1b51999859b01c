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


def _driver_attestation_rounds() -> dict[str, int]:
    """name -> newest round where CORRECTNESS_r{N}.json has the entry
    green (rows+schema+hash, no error)."""
    newest: dict[str, int] = {}
    for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        n = int(os.path.basename(f).split("_r")[1].split(".")[0])
        with open(f) as fh:
            recs = json.load(fh)
        for name, rec in recs.items():
            if not isinstance(rec, dict) or rec.get("err"):
                continue
            if rec.get("rows_match") and rec.get("hash_match", True):
                newest[name] = max(newest.get(name, 0), n)
    return newest


def test_receipt_freshness_bound():
    """No entry's newest attestation (driver CORRECTNESS round or mirror
    receipt round) may be older than current_round − rotation_debt_limit()
    (r7 verdict ask #2: receipts previously stayed 'green' forever even
    if never re-run)."""
    from aroa_etl_spark.plans import catalog

    driver_rounds = _driver_attestation_rounds()
    current = max(
        [int(os.path.basename(f).split("_r")[1].split(".")[0])
         for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))] or [0]
    ) + 1
    max_age = catalog.rotation_debt_limit()
    bound = current - max_age

    newest: dict[str, int] = dict(driver_rounds)
    for path in sorted(glob.glob(os.path.join(ROOT, "RECEIPTS", "r*_mirror.json"))):
        with open(path) as fh:
            receipt = json.load(fh)
        file_round = receipt.get("round", 0)
        for name, rec in receipt.get("entries", {}).items():
            if rec.get("status") not in ("ok", "rows_only"):
                continue
            # per-entry round (merged receipts carry the attestation
            # round forward); pre-r8 receipts lack it — fall back to
            # the file's round, which for a full sweep is exact
            r = rec.get("round", file_round)
            newest[name] = max(newest.get(name, 0), r)

    stale = {
        name: newest.get(name, 0)
        for name in catalog.queries()
        if newest.get(name, 0) < bound
    }
    assert not stale, (
        f"entries whose newest attestation is older than round {bound} "
        f"(current {current}, max age {max_age}); re-run "
        f"`python scripts/driver_mirror.py /root/testdata/sf0.01 <names>` "
        f"for: {sorted(stale.items())[:20]}"
    )
