"""Scalar / text functions mirroring the reference's utils + domain helpers."""

from nmr_fair_dos_ray.functions.scalar import (  # noqa: F401
    decode_from_base64,
    encode_in_base64,
    normalize_license,
    normalize_url_for_similarity,
    parse_datetime,
    strip_doi_prefix,
    try_parse_json,
)
