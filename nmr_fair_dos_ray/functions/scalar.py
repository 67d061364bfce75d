"""Scalar functions with the reference's semantics (utils.py / domain layer).

Each function documents the reference location whose observable behavior it
reproduces. They are plain Python scalars usable inside ``map_batches``
closures; the vectorized call sites live in pipelines/.
"""

from __future__ import annotations

import base64
import json
import re
from datetime import datetime

# --------------------------------------------------------------- base64 ----
# reference: src/nmr_FAIR_DOs/utils.py:130-167 (encodeInBase64/decodeFromBase64)


def encode_in_base64(value: str) -> str:
    if value is None or value == "":
        raise ValueError("cannot base64-encode empty value")
    return base64.b64encode(value.encode("utf-8")).decode("ascii")


def decode_from_base64(value: str) -> str:
    if value is None or value == "":
        raise ValueError("cannot base64-decode empty value")
    return base64.b64decode(value.encode("ascii")).decode("utf-8")


# ------------------------------------------------------------- datetime ----
# reference: src/nmr_FAIR_DOs/utils.py:170-211 (parseDateTime): ISO-8601 first,
# then fallback formats, else raise.

_DT_FORMATS = [
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%d.%m.%Y",
    "%d/%m/%Y",
]


def parse_datetime(value: str) -> datetime:
    if not value or not isinstance(value, str):
        raise ValueError(f"not a datetime string: {value!r}")
    v = value.strip()
    try:
        return datetime.fromisoformat(v.replace("Z", "+00:00"))
    except ValueError:
        pass
    for fmt in _DT_FORMATS:
        try:
            return datetime.strptime(v, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable datetime: {value!r}")


# ------------------------------------------------------------------ DOI ----
# reference idiom: `.replace("https://doi.org/", "")`
# (src/nmr_FAIR_DOs/repositories/chemotion.py:318,335; nmrxiv.py:382,460)


def strip_doi_prefix(value: str) -> str:
    return (value or "").replace("https://doi.org/", "")


# ------------------------------------------------------------- JSON try ----
# reference: src/nmr_FAIR_DOs/domain/pid_record_entry.py:69-78 — string entry
# values are eagerly json.loads-ed, silently kept as string on failure. This
# changes equality/dedup semantics, so it is preserved exactly.


def try_parse_json(value):
    if not isinstance(value, str):
        return value
    s = value.strip()
    if not s or s[0] not in "[{\"0123456789tfn-":
        return value
    try:
        return json.loads(s)
    except (json.JSONDecodeError, ValueError):
        return value


# ---------------------------------------------------- URL similarity -------
# reference: src/nmr_FAIR_DOs/utils.py:281-340 (checkTextIsSimilar):
# aggressive URL normalization then equality.

_SCHEME_RE = re.compile(r"^https?://")
_EXT_RE = re.compile(r"\.(html|json|xml|txt|pdf)$")


def normalize_url_for_similarity(text: str) -> str:
    s = (text or "").strip().lower()
    s = _SCHEME_RE.sub("", s)
    if s.startswith("www."):
        s = s[4:]
    s = s.rstrip("/")
    s = _EXT_RE.sub("", s)
    if s.endswith("/legalcode"):
        s = s[: -len("/legalcode")]
    s = s.replace("/licenses/", "/license/")
    s = s.rstrip("/")
    return s


def text_is_similar(a: str, b: str) -> bool:
    return normalize_url_for_similarity(a) == normalize_url_for_similarity(b)


# ----------------------------------------------------------- SPDX-ish ------
# reference: src/nmr_FAIR_DOs/utils.py:214-278 (parseSPDXLicenseURL): scan the
# SPDX license list with ~6 match rules (id, name, seeAlso URLs, fuzzy URL
# similarity), memoized. Offline here: the license table is a broadcast side
# table (SURVEY.md §2.6 J3); this function runs the match rules against it.

_DEFAULT_LICENSES = [
    # (licenseId, name, seeAlso...)
    ("CC-BY-4.0", "Creative Commons Attribution 4.0 International",
     ["https://creativecommons.org/licenses/by/4.0/legalcode"]),
    ("CC-BY-SA-4.0", "Creative Commons Attribution Share Alike 4.0 International",
     ["https://creativecommons.org/licenses/by-sa/4.0/legalcode"]),
    ("CC0-1.0", "Creative Commons Zero v1.0 Universal",
     ["https://creativecommons.org/publicdomain/zero/1.0/legalcode"]),
    ("MIT", "MIT License", ["https://opensource.org/license/mit/"]),
    ("Apache-2.0", "Apache License 2.0", ["https://www.apache.org/licenses/LICENSE-2.0"]),
    ("GPL-3.0-only", "GNU General Public License v3.0 only",
     ["https://www.gnu.org/licenses/gpl-3.0-standalone.html"]),
    ("BSD-3-Clause", "BSD 3-Clause License", ["https://opensource.org/license/bsd-3-clause/"]),
]


def spdx_license_table() -> list[tuple[str, str, list[str]]]:
    return list(_DEFAULT_LICENSES)


def normalize_license(value: str, table: list[tuple[str, str, list[str]]] | None = None) -> str | None:
    """-> canonical SPDX JSON URL (reference returns
    https://spdx.org/licenses/<id>.json) or None if unmatched."""
    if not value:
        return None
    table = table if table is not None else _DEFAULT_LICENSES
    v = value.strip()
    vl = v.lower()
    vn = normalize_url_for_similarity(v)
    for lic_id, name, see_also in table:
        if vl == lic_id.lower() or vl == name.lower():
            return f"https://spdx.org/licenses/{lic_id}.json"
        for url in see_also:
            if text_is_similar(v, url):
                return f"https://spdx.org/licenses/{lic_id}.json"
        if vn and vn == normalize_url_for_similarity(f"https://spdx.org/licenses/{lic_id}"):
            return f"https://spdx.org/licenses/{lic_id}.json"
    return None
