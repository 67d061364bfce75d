"""Deterministic raw-repository envelope synthesis (extraction-pipeline input).

The reference harvests nested JSON resources over HTTP — schema.org JSON-LD
from Chemotion (reference: src/nmr_FAIR_DOs/repositories/chemotion.py:128-222)
and ``{"original": ..., "bioschema": ...}`` envelopes from NMRXiv
(src/nmr_FAIR_DOs/repositories/nmrxiv.py:155-319). This sandbox has no
network, so the extraction pipeline's input corpus is synthesized
deterministically from the ``documents`` table: one envelope per doc_id, with
every branch of the mapper family (M1-M11) exercised by doc_id modulus. The
same spec is reimplemented independently in SQL by ``oracle_sql()`` — the
synthesis here is test scaffolding, NOT an engine hot path (per-row dict
building + json.dumps is deliberate; at scale this stage is replaced by
reading real harvested JSON).

Spec (d = doc_id; all derived values below are FROZEN — the SQL oracle
mirrors them):

* doi = ``10.80/nmr.<d>``, pid = base64(doi), name = ``nmr record <d>``
* kind = d % 3 → 0: Chemotion Dataset, 1: Chemotion Study, 2: NMRXiv
* NMRXiv subtype letter = "DSP"[(d//3) % 3]
* created_at present iff d%5 != 0, rendered from 2024-01-01 + 7·d minutes in
  format d%4 of [ISO-T, ISO-space, date-only, dotted]; updated_at present iff
  d%2 == 0, from created + 1 day, format (d+1)%4
* license raw by d%5 over [MIT id, CC-BY-4.0 id, CC-BY-SA seeAlso URL,
  Apache name, unmatchable]
* invalid envelope iff d%17 == 0 (Chemotion: @type "Text"; NMRXiv: no doi)
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pyarrow as pa
from ray.data import Dataset

_EPOCH = datetime(2024, 1, 1)
_FMTS = ["%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%d.%m.%Y"]
_LICENSES = [
    "MIT",
    "CC-BY-4.0",
    "https://creativecommons.org/licenses/by-sa/4.0/legalcode",
    "Apache License 2.0",
    "not-a-license",
]
_SOLVENTS = ["CDCl3", "DMSO-d6", "D2O", "unknownium"]
_NUCLEI = ["1H", "13C"]


def _render(ts: datetime, fmt_idx: int) -> str:
    return ts.strftime(_FMTS[fmt_idx])


def _chemotion_contacts(d: int, env: dict) -> None:
    """Contact field variants exercising M6 (dict vs list, dedup-in-field,
    cross-field duplicates deduped later by addEntry value-dedup)."""
    a, b = f"0000-A{d}", f"0000-B{d}"
    m = d % 4
    if m == 0:
        env["creator"] = {"identifier": f"0000-C{d}"}
    elif m == 1:
        env["author"] = {"identifier": a}
    elif m == 2:
        env["author"] = [{"identifier": a}, {"@id": a}]
        env["creator"] = {"@id": a}
    else:
        env["author"] = [{"identifier": a}, {"identifier": b}]


def build_envelope(d: int) -> dict:
    """-> {"envelope_id", "repo", "payload"} for doc_id ``d`` (pure)."""
    doi = f"10.80/nmr.{d}"
    name = f"nmr record {d}"
    created = _EPOCH + timedelta(minutes=7 * d)
    modified = created + timedelta(days=1)
    lic = _LICENSES[d % 5]
    invalid = d % 17 == 0
    kind = d % 3

    if kind < 2:  # ---------------------------------------------- Chemotion
        env: dict = {
            "@id": f"https://doi.org/{doi}",
            "@type": "Text" if invalid else ("Dataset" if kind == 0 else "Study"),
            "name": name,
            "description": "VERBOSE-DESCRIPTION-SHOULD-NEVER-APPEAR",
        }
        _chemotion_contacts(d, env)
        if d % 5 != 0:
            env["dateCreated"] = _render(created, d % 4)
        if d % 2 == 0:
            env["dateModified"] = _render(modified, (d + 1) % 4)
        if kind == 0:
            env["url"] = f"https://chemotion.example/ds/{d}"
            env["identifier"] = f"CHEM:D{d}"
            env["license"] = lic
            if d % 7 == 0:
                env["measurementTechnique"] = {"@id": "https://chem.example/method/nmr"}
            if d % 10 == 0:
                env["isPartOf"] = {"dateCreated": _render(created, 0)}
            elif d % 10 == 5:
                env["isPartOf"] = {"datePublished": _render(created, 0)}
        else:
            env["includedInDataCatalog"] = {"license": lic}
            about: dict = {
                "name": f"about {d}",
                "url": f"https://chemotion.example/study/{d}",
                "identifier": f"CHEM:S{d}",
            }
            if d % 6 == 1:
                about["image"] = f"https://img.example/{d}.png"
            part: dict = {}
            if d % 2 == 1:
                part["molecularWeight"] = {"value": float((d % 90) + 1)}
            if d % 4 < 2:
                part["url"] = f"https://pubchem.example/c{d}"
            if part:
                about["hasBioChemEntityPart"] = [part]
            if d % 5 < 4:
                about["subjectOf"] = [{"@id": f"https://doi.org/10.80/nmr.{d - 1}"}]
            env["about"] = [about]
        return {"envelope_id": d, "repo": "chemotion", "payload": json.dumps(env)}

    # ------------------------------------------------------------- NMRXiv
    letter = "DSP"[(d // 3) % 3]
    original: dict = {
        "identifier": f"NMRXIV:{letter}{d}",
        "name": name,
        "owner": {"email": f"o{d}@x.org"},
        "description": "VERBOSE-DESCRIPTION-SHOULD-NEVER-APPEAR",
        "sdf": "SDF-BLOB-SHOULD-NEVER-APPEAR",
    }
    if not invalid:
        original["doi"] = doi
    if d % 5 != 0:
        original["created_at"] = _render(created, d % 4)
    if d % 2 == 0:
        original["updated_at"] = _render(modified, (d + 1) % 4)
    if d % 4 != 3:
        original["license"] = {"spdx_id": lic}
    if d % 4 < 2:
        original["authors"] = (
            [{"orcid_id": f"0000-N{d}"}] if d % 2 == 0 else [{"email": f"u{d}@x.org"}]
        )
    if d % 6 < 3:
        original["download_url"] = f"https://nmrxiv.example/dl/{d}"
    if d % 4 < 2:
        original["public_url"] = f"https://nmrxiv.example/r/{d}"

    bioschema: dict = {
        "@id": f"https://doi.org/{doi}",
        "@type": {"D": "Dataset", "S": "Study", "P": "Project"}[letter],
        "url": f"https://nmrxiv.example/b/{d}",
        "description": "VERBOSE-DESCRIPTION-SHOULD-NEVER-APPEAR",
    }
    if d % 4 == 3:
        bioschema["license"] = "https://creativecommons.org/licenses/by/4.0/legalcode"

    mw = float((d % 90) + 1)
    if letter == "D":
        if d % 2 == 0:
            bioschema["measurementTechnique"] = {"url": f"https://nmr.example/method/m{d % 3}"}
        elif d % 8 == 1:
            bioschema["measurementTechnique"] = {"name": "no-url-method"}
        if d % 6 == 0:
            original["dataset_photo_url"] = f"https://img.example/d{d}.png"
        variables: list = [{"name": "NMR solvent", "value": _SOLVENTS[d % 4]}]
        if d % 2 == 0:
            variables.append(
                {"name": "acquisition nucleus", "value": _NUCLEI[(d // 2) % 2]}
            )
        if d % 5 < 3:
            variables.append(
                {"name": "irridation frequency", "value": f"{300 + (d % 8) * 100} MHz"}
            )
        if d % 5 == 2:
            variables.append(
                {"name": "nuclear magnetic resonance pulse sequence", "value": "zg30"}
            )
        if d % 7 == 3:
            variables.append({"name": "junk"})  # no value → skipped (M17 guard)
        bioschema["variableMeasured"] = variables
        ipart: dict = {
            "name": f"part{d}",
            "description": "VERBOSE-DESCRIPTION-SHOULD-NEVER-APPEAR",
        }
        biochem: dict = {}
        if d % 2 == 1:
            biochem["molecularWeight"] = mw
        if d % 4 < 2:
            biochem["url"] = f"https://pubchem.example/c{d}"
        if d % 8 == 5:
            biochem["chemicalFormula"] = "C6H6"
        if biochem:
            ipart["hasBioChemEntityPart"] = biochem
        bioschema["isPartOf"] = [ipart]
    elif letter == "S":
        original["study_preview_urls"] = []  # validity guard field
        photos = [f"https://img.example/s{d}a.png"]
        if d % 2 == 0:
            photos.append(f"https://img.example/s{d}b.png")
        original["study_photo_urls"] = photos
        if d % 2 == 1:
            part = {"molecularWeight": mw}
            if d % 4 == 1:
                part["url"] = f"https://pubchem.example/c{d}"
            bioschema["about"] = {"hasBioChemEntityPart": [part]}
        elif d % 8 == 2:
            original["molecules"] = [{"molecular_weight": mw}]
        if d >= 2:
            bioschema["hasPart"] = [{"@id": f"https://doi.org/10.80/nmr.{d - 2}"}]
    else:  # Project
        if d % 6 == 0:
            original["photo_url"] = f"https://img.example/p{d}.png"
        if d >= 1:
            bioschema["hasPart"] = [{"@id": f"https://doi.org/10.80/nmr.{d - 1}"}]

    payload = json.dumps({"original": original, "bioschema": bioschema})
    return {"envelope_id": d, "repo": "nmrxiv", "payload": payload}


def envelope_created(doc_ids) -> "pa.Array":
    """Vectorized creation timestamp of each envelope — the same pure
    function of doc_id that ``build_envelope`` embeds as ``dateCreated``
    (``_EPOCH + 7 min × d``). This is the SOURCE-side time attribute the
    harvest window filters on (the reference's listers take from/until
    parameters and filter server-side; here the lister filters before any
    payload is synthesized or parsed)."""
    import numpy as np

    d = np.asarray(doc_ids, np.int64)
    delta = (d * (7 * 60 * 1_000_000)).astype("timedelta64[us]")
    return pa.array(np.datetime64(_EPOCH, "us") + delta, pa.timestamp("us"))


def synthesize_envelopes(
    sf_dir: str,
    start: datetime | None = None,
    end: datetime | None = None,
    repo: str | None = None,
) -> Dataset:
    """documents → (envelope_id, repo, payload) Dataset, one row per doc.

    Reads ONLY doc_id (column-pruned); the envelope content is a pure
    function of doc_id so the corpus is reproducible across runs/oracles.

    ``start``/``end`` bound the envelopes' creation time (half-open
    ``[start, end)``) and ``repo`` restricts the source — both applied
    BEFORE payload synthesis, the analog of the reference listers' server-
    side date/repository filters (S1/S3): a harvest window never pays for
    rows outside it.
    """
    import os

    from nmr_fair_dos_ray.sources import sized_read_parquet

    docs = sized_read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    if start is not None or end is not None or repo is not None:
        def window(batch: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.compute as _pc

            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            created = envelope_created(ids)
            mask = pa.array(np.ones(batch.num_rows, bool))
            if start is not None:
                mask = _pc.and_(mask, _pc.greater_equal(
                    created, pa.scalar(start, pa.timestamp("us"))))
            if end is not None:
                mask = _pc.and_(mask, _pc.less(
                    created, pa.scalar(end, pa.timestamp("us"))))
            if repo is not None:
                # source dispatch is a pure function of doc_id (kind = d%3)
                is_chem = (ids % 3) < 2
                mask = _pc.and_(mask, pa.array(
                    is_chem if repo == "chemotion" else ~is_chem))
            return batch.filter(mask)

        docs = docs.map_batches(window, batch_format="pyarrow")

    def make(batch: pa.Table) -> pa.Table:
        rows = [build_envelope(int(d)) for d in batch["doc_id"].to_pylist()]
        return pa.table(
            {
                "envelope_id": pa.array([r["envelope_id"] for r in rows], pa.int64()),
                "repo": pa.array([r["repo"] for r in rows], pa.string()),
                "payload": pa.array([r["payload"] for r in rows], pa.string()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow")
