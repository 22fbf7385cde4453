"""Struct-typed Arrow schema for OCDS-style records (FIXTURES.md F2;
field inventory SURVEY §1.1, /root/reference/index.js:85-86 +
lib/extract.js consumption sites).

The reference's documents are DYNAMIC — every access is hasOwnProperty-
guarded — while Arrow structs are fixed-with-nulls. ``strip_nones``
restores absent-vs-null equivalence after the Arrow->Python conversion so
the emission kernel sees exactly the dict shapes the oracle sees
(SURVEY §1.4 'nullable Arrow columns ... replace hasOwnProperty guards').
"""

from __future__ import annotations

import pyarrow as pa

_IDENTIFIER = pa.struct(
    [("id", pa.string()), ("scheme", pa.string()), ("legalName", pa.string())]
)

PARTY_TYPE = pa.struct(
    [
        ("id", pa.string()),
        ("name", pa.string()),
        ("roles", pa.list_(pa.string())),
        (
            "details",
            pa.struct(
                [
                    ("type", pa.string()),
                    ("govLevel", pa.string()),
                    ("classification", pa.string()),
                ]
            ),
        ),
        ("govLevel", pa.string()),
        (
            "memberOf",
            pa.list_(
                pa.struct(
                    [("id", pa.string()), ("name", pa.string()), ("initials", pa.string())]
                )
            ),
        ),
        ("contactPoint", pa.struct([("id", pa.string()), ("name", pa.string())])),
        (
            "address",
            pa.struct(
                [
                    ("countryName", pa.string()),
                    ("region", pa.string()),
                    ("locality", pa.string()),
                ]
            ),
        ),
        ("identifier", _IDENTIFIER),
        ("additionalIdentifiers", pa.list_(_IDENTIFIER)),
        ("initials", pa.string()),
    ]
)

ITEM_TYPE = pa.struct(
    [
        ("id", pa.string()),
        ("description", pa.string()),
        ("quantity", pa.float64()),
        ("valueMxIMSS", pa.float64()),
        ("classification", pa.struct([("description", pa.string())])),
        (
            "unit",
            pa.struct(
                [
                    (
                        "value",
                        pa.struct(
                            [
                                ("amount", pa.float64()),
                                ("amountOverpriceMxIMSS", pa.float64()),
                                ("valueAverageMxIMSS", pa.float64()),
                            ]
                        ),
                    )
                ]
            ),
        ),
    ]
)

CONTRACT_TYPE = pa.struct(
    [
        ("id", pa.string()),
        ("value", pa.struct([("amount", pa.float64())])),
        ("period", pa.struct([("startDate", pa.string())])),
        ("items", pa.list_(ITEM_TYPE)),
    ]
)

_SOURCE = pa.list_(pa.struct([("id", pa.string())]))

COMPILED_RELEASE_TYPE = pa.struct(
    [
        ("ocid", pa.string()),
        ("source", _SOURCE),
        ("parties", pa.list_(PARTY_TYPE)),
        ("contracts", pa.list_(CONTRACT_TYPE)),
        (
            "awards",
            pa.list_(
                pa.struct(
                    [
                        ("value", pa.struct([("amount", pa.float64())])),
                        ("suppliers", pa.list_(pa.struct([("id", pa.string())]))),
                    ]
                )
            ),
        ),
    ]
)

RELEASE_TYPE = pa.struct(
    [
        ("date", pa.string()),
        ("parties", pa.list_(PARTY_TYPE)),
        (
            "contracts",
            pa.list_(pa.struct([("id", pa.string()), ("items", pa.list_(ITEM_TYPE))])),
        ),
        ("source", _SOURCE),
        ("sourceRun", _SOURCE),
    ]
)

OCDS_RECORDS_SCHEMA = pa.schema(
    [
        ("ocid", pa.string()),
        ("compiledRelease", COMPILED_RELEASE_TYPE),
        ("releases", pa.list_(RELEASE_TYPE)),
    ]
)


def strip_nones(obj):
    """Recursively drop None-valued dict keys (absent-vs-null equivalence
    after Arrow struct -> Python conversion)."""
    if isinstance(obj, dict):
        return {k: strip_nones(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, list):
        return [strip_nones(v) for v in obj]
    return obj
