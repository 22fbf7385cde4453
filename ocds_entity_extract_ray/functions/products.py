"""Product-id normalization (/root/reference/lib/extract.js:142-153)."""

from __future__ import annotations


def get_product_id(item_id: str | None) -> str:
    """Normalize a contract-item id to the dotted catalog form.

    Faithful to extract.js:142-153: keep ids that already contain a dot at
    position > 0; ids of length >= 12 get dots inserted at 3/6/10; shorter
    ids pass through; empty/missing -> ''.
    """
    if not item_id:
        return ""
    s = str(item_id)
    if s.find(".") > 0:
        return s
    if len(s) >= 12:
        return s[0:3] + "." + s[3:6] + "." + s[6:10] + "." + s[10:]
    return s


def strip_dots(item_id: str | None) -> str:
    """Dot-insensitive compare key (extract.js:1302,1328)."""
    return str(item_id).replace(".", "") if item_id else ""
