"""Synthetic raw ENC-style fixture: 8 transcriptions of 2 documents with
the engineered conflicts documented in FIXTURES.md §1 (spelling variants,
title prefixes, nulls, '-' markers, 'Unklar' QA markers, multi-value
cells, single-digit months)."""

from __future__ import annotations

import json


def _payload(
    categories=None,
    number=None,
    imp=(None, None, None, None),
    pob=None,
    bd=(None, None, None),
    first=None,
    last=None,
) -> str:
    return json.dumps(
        {
            "prisoner_category_repeat": [
                {"prisoner_category": c} for c in (categories or [None])
            ],
            "prisoner_number_repeat": [{"prisoner_number": number}],
            "imprisonment_repeat": [
                {
                    "imprisonment_year": imp[0],
                    "imprisonment_month": imp[1],
                    "imprisonment_day": imp[2],
                    "imprisonment_camp": imp[3],
                }
            ],
            "place_of_birth_repeat": [{"place_of_birth": p} for p in (pob or [None])],
            "birthdate_repeat": [
                {"birthdate_year": bd[0], "birthdate_month": bd[1], "birthdate_day": bd[2]}
            ],
            "first_name_repeat": [{"first_name": f} for f in (first or [None])],
            "last_name_repeat": [{"last_name": last}],
        }
    )


RAW_ROWS = [
    # (row_id, workflow_id, document_id, json_data)
    (0, "wo_001", "do_001", _payload(["2", "3", "4", "5", "6"], "111",
        ("1943", "08", "20", "Unklar"), ["Frankfurt"], ("1900", "04", "09"),
        ["Dr.Alice"], "Muller")),
    (1, "wo_001", "do_001", _payload([None], "111",
        (None, None, None, "Unklar"), ["Frandfurt", "Main"], ("1900", "04", "09"),
        ["Dr. Alice"], "Dr. Müller")),
    (2, "wo_001", "do_001", _payload(["2", "3", "4", "5", "6", "7"], "112",
        ("1944", "8", "20", None), ["Frankfurter"], ("1900", "04", "09"),
        ["Alice "], "Mueller")),
    (3, "wo_001", "do_002", _payload([None], "1",
        ("1944", None, None, "Unklar"), ["-"], (None, None, None),
        ["Bob1 Bob2"], "Schmidt")),
    (4, "wo_001", "do_002", _payload([None], "1",
        ("1943", "08", "20", "Bu"), ["-"], (None, None, None),
        ["Bob1"], "Schmïdt")),
    (5, "wo_001", "do_002", _payload([None], "2",
        ("1943", "04", "30", "Bu"), ["-"], (None, None, None),
        ["Bob1", "Bob2"], None)),
    (6, "wo_001", "do_002", _payload(["1"], "3",
        ("1943", "08", "20", "Unklar"), ["Stadt"], (None, None, None),
        ["Bob1"], None)),
    (7, "wo_001", "do_002", _payload(["1"], None,
        ("1944", "01", "20", "Unklar"), ["Stadt"], (None, None, None),
        ["Bob1"], None)),
]


def raw_enc_df(spark):
    return spark.createDataFrame(
        RAW_ROWS, ["row_id", "workflow_id", "document_id", "json_data"]
    )
