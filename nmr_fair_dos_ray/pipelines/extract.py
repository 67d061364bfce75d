"""Resource-extraction mapper family (M1-M11) — raw JSON envelopes → long
format, Ray-Data-native.

The reference's per-repository mappers turn nested repository JSON into
PIDRecord multimaps via ~1,270 LoC of imperative dict-walking with callback
side-effects (reference: src/nmr_FAIR_DOs/repositories/chemotion.py:88-658,
nmrxiv.py:115-1163). Here the whole family is ONE stateless ``map_batches``
stage over an envelopes Dataset ``(envelope_id, repo, payload)`` that emits a
union of typed rows:

* ``kind='entry'``  — long-format record entries ``(pid, key, name,
  value_json)`` (the shape pipelines/records.py already consumes: dedup-merge
  A1, flatten M12, argmax A2/A3),
* ``kind='edge'``   — the reference's ``addRelationship`` callback calls as
  data: ``(pid=source, presumed_target, key, name, value_json)`` rows pushed
  toward a presumed target PID (resolved later by records.resolve_edges J1;
  reverse isMetadataFor edges come from records.bidirectional_edges),
* ``kind='error'``  — M17 validity-guard dead letters ``(envelope_id, repo,
  error)``; the reference collects these in a module-global ``errors`` list
  (src/nmr_FAIR_DOs/lib.py:63,326-341).

Per-row Python here is intentional: JSON extraction is inherently row-wise
(parse → navigate → branch); the stage stays embarrassingly parallel, carries
no state besides the broadcast terminology vocab, and at 100 TB scales by
adding map_batches concurrency (swap json.loads for a faster parser without
touching the dataflow). Dispatch is registry-based (§2.11 extension surface —
the reference's AbstractRepository protocol,
src/nmr_FAIR_DOs/repositories/AbstractRepository.py:32-178): register a new
repo type with :func:`register_extractor`, no pipeline edits.
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from nmr_fair_dos_ray.functions.scalar import (
    encode_in_base64,
    normalize_license,
    parse_datetime,
    strip_doi_prefix,
)

# ------------------------------------------------------------ key constants
KEY_KIP = "21.T11148/076759916209e5d62bd5"
KEY_DO_TYPE = "21.T11148/1c699a5d1b4ad3ba4956"
KEY_DO_LOCATION = "21.T11148/b8457812905b83046284"
KEY_CONTACT = "21.T11148/1a73af9e7ae00182733b"
KEY_EMAIL_CONTACT = "21.T11148/e117a4a29bfd07438c1e"
KEY_DATE_MODIFIED = "21.T11148/397d831aa3a9d18eb52c"
KEY_DATE_CREATED = "21.T11148/aafd5fb4c7222e2d950a"
KEY_RESOURCE_TYPE = "21.T11969/b736c3898dd1f6603e2c"
KEY_NAME = "21.T11148/6ae999552a0d2dca14d6"
KEY_LANDING_PAGE = "21.T11969/8710d753ad10f371189b"
KEY_IDENTIFIER = "21.T11148/f3f0cbaa39fa9966b279"
KEY_NMR_METHOD = "21.T11969/7a19f6d5c8e63dd6bfcb"
KEY_LICENSE = "21.T11148/2f314c8fe5fb6a0063a8"
KEY_LOCATION_PREVIEW = "21.T11148/7fdada5846281ef5d461"
KEY_COMPOUND = "21.T11969/d15381199a44a16dc88d"
KEY_HAS_METADATA = "21.T11148/d0773859091aeb451528"
KEY_IS_METADATA_FOR = "21.T11148/4fe7cde52629b61e3b82"
KEY_PRIMARY_SOURCE = "21.T11148/a753134738da82809fc1"
KEY_MW = "21.T11969/6c4d3deac9a49b65886a"
KEY_PUBCHEM = "21.T11969/f9cb9b53273ce0da7739"
KEY_SOLVENT = "21.T11969/92b4c6b461709b5b36f5"
KEY_NUCLEUS = "21.T11969/1058eae15dac10260bb6"
KEY_FREQUENCY = "21.T11969/1e6e84562ace3b58558d"
KEY_PULSE_SEQ = "21.T11969/3303cd9e3dda7afd6000"

VAL_KIP = "21.T11148/b9b76f887845e32d29f7"
VAL_DO_TYPE_JSON = "21.T11148/ca9fd0b2414177b79ac2"
VAL_DO_TYPE_HTML = "21.T11148/010acb220a9c2c8c0ee6"


def canon_value(value) -> str:
    """Canonical value_json: strings pass through, everything else is
    compact sorted-key JSON (the reference stringifies dict values on entry,
    src/nmr_FAIR_DOs/domain/pid_record_entry.py:41-67)."""
    if isinstance(value, str):
        return value
    return json.dumps(value, sort_keys=True, separators=(",", ":"))


class PIDRecordBuilder:
    """Long-format PIDRecord under construction, reproducing addEntry's
    per-key value-dedup (first name wins) — reference:
    src/nmr_FAIR_DOs/domain/pid_record.py:71-135."""

    def __init__(self, pid: str):
        self.pid = pid
        self._rows: list[list[str]] = []  # [key, value_json, name]
        self._seen: set[tuple[str, str]] = set()

    def add(self, key: str, value, name: str) -> None:
        vj = canon_value(value)
        if (key, vj) in self._seen:
            return
        self._seen.add((key, vj))
        self._rows.append([key, vj, name])

    def exists(self, key: str) -> bool:
        return any(r[0] == key for r in self._rows)

    def values(self, key: str) -> list[str]:
        return [r[1] for r in self._rows if r[0] == key]

    def entries(self, key: str) -> list[tuple[str, str, str]]:
        return [(r[0], r[1], r[2]) for r in self._rows if r[0] == key]

    def update(self, key: str, value) -> None:
        """updateEntry: replace the value(s) of ``key`` (add if missing) —
        reference pid_record.py:174-230."""
        self.delete(key)
        self.add(key, value, None)  # reference passes name=None here

    def delete(self, key: str) -> None:
        self._rows = [r for r in self._rows if r[0] != key]
        self._seen = {s for s in self._seen if s[0] != key}

    def rows(self) -> list[tuple[str, str, str, str]]:
        return [(self.pid, k, n, v) for k, v, n in self._rows]


class Edge:
    """One pushed-entry row of an addRelationship call (J1 input shape)."""

    __slots__ = ("source_pid", "presumed_target", "key", "name", "value_json")

    def __init__(self, source_pid, presumed_target, key, value, name):
        self.source_pid = source_pid
        self.presumed_target = presumed_target
        self.key = key
        self.name = name
        self.value_json = canon_value(value)


# ------------------------------------------------- T2/J5: terminology cache
#: Offline analog of the reference's terminology service
#: (src/nmr_FAIR_DOs/connectors/terminology.py:30-330): exact-label search
#: over an ontology GRAPH, candidates validated per ontology
#: (validateCHEBI) and disambiguated via the _findParent child-enumeration
#: heuristic — full search/validate/disambiguate depth, offline because the
#: sandbox has no network. The graph is broadcast once; the memo cache lives
#: per actor (cache-first semi-join pattern).
from nmr_fair_dos_ray.state.ontology import (  # noqa: E402
    PARENT_ATOM,
    PARENT_NMR_SOLVENT,
    OntologySearcher,
    default_ontology,
)


class TerminologyLookup:
    """Stateful ontology lookup: broadcast graph + per-actor memoization.

    Reference: src/nmr_FAIR_DOs/connectors/terminology.py:30-330 caches
    remote ontology searches in instance state; here the ontology graph is
    broadcast-shareable plain data and the memo cache lives for the actor's
    lifetime, so repeated terms (Zipf-distributed in real corpora) never
    re-run search/validate/disambiguate."""

    def __init__(self, searcher: OntologySearcher | None = None):
        self._searcher = searcher if searcher is not None else default_ontology()
        self._memo: dict[tuple[str, str, str], str | None] = {}

    def search(self, term: str, ontology: str, parent: str) -> str | None:
        k = (ontology, parent, term.strip().lower())
        if k not in self._memo:
            self._memo[k] = self._searcher.search_for_term(
                term, ontology, parent
            )
        return self._memo[k]


# ----------------------------------------------------------- license helper
def _license_url(value: str) -> str:
    """normalize_license with the reference's no-match fallback: the INPUT
    string is returned verbatim (src/nmr_FAIR_DOs/utils.py:278)."""
    return normalize_license(value) or value


def _iso(value: str) -> str:
    return parse_datetime(value).isoformat()


# ---------------------------------------------------------------- Chemotion
def extract_contact_field(field_name: str, obj: dict) -> list[str]:
    """M6 — identifier-or-@id from a dict or list field, deduped in-field
    (reference: src/nmr_FAIR_DOs/repositories/chemotion.py:224-302)."""
    out: list[str] = []

    def one(el: dict) -> str | None:
        if "identifier" in el:
            return el["identifier"]
        if "@id" in el:
            return el["@id"]
        return None

    field = obj.get(field_name)
    if isinstance(field, list):
        for el in field:
            ident = one(el)
            if ident is not None and ident not in out:
                out.append(ident)
    elif isinstance(field, dict):
        ident = one(field)
        if ident is not None and ident not in out:
            out.append(ident)
    return out


def _chemotion_generic(content: dict) -> PIDRecordBuilder:
    """M3 (reference: chemotion.py:304-382)."""
    fdo = PIDRecordBuilder(encode_in_base64(strip_doi_prefix(content["@id"])))
    fdo.add(KEY_KIP, VAL_KIP, "Kernel Information Profile")
    fdo.add(KEY_DO_TYPE, VAL_DO_TYPE_JSON, "digitalObjectType")
    fdo.add(
        KEY_DO_LOCATION,
        f"https://dx.doi.org/{strip_doi_prefix(content['@id'])}",
        "digitalObjectLocation",
    )
    contacts: list[str] = []
    for f in ("author", "creator", "contributor"):
        contacts.extend(extract_contact_field(f, content))
    for c in contacts:
        fdo.add(KEY_CONTACT, "https://orcid.org/" + c, "contact")
    if content.get("dateModified") is not None:
        fdo.add(KEY_DATE_MODIFIED, _iso(content["dateModified"]), "dateModified")
    if content.get("dateCreated") is not None:
        fdo.add(KEY_DATE_CREATED, _iso(content["dateCreated"]), "dateCreated")
    return fdo


def _chemotion_dataset(ds: dict) -> tuple[PIDRecordBuilder, list[Edge]]:
    """M4 (reference: chemotion.py:384-459)."""
    if ds.get("@type") != "Dataset":
        raise ValueError("not a dataset")
    fdo = _chemotion_generic(ds)
    fdo.add(KEY_RESOURCE_TYPE, "Dataset", "resourceType")
    fdo.add(KEY_NAME, ds["name"], "name")
    fdo.add(KEY_LANDING_PAGE, ds["url"], "landingPageLocation")
    fdo.add(KEY_IDENTIFIER, ds["identifier"], "identifier")
    if "measurementTechnique" in ds:
        fdo.add(KEY_NMR_METHOD, ds["measurementTechnique"]["@id"], "NMR method")
    fdo.add(KEY_LICENSE, _license_url(ds["license"]), "license")
    if "isPartOf" in ds and not fdo.exists(KEY_DATE_CREATED):
        parent = ds["isPartOf"]
        if "dateCreated" in parent:
            fdo.add(KEY_DATE_CREATED, _iso(parent["dateCreated"]), "dateCreated")
        elif "datePublished" in parent:
            fdo.add(KEY_DATE_CREATED, _iso(parent["datePublished"]), "dateCreated")
    return fdo, []


def _chemotion_study(study: dict) -> tuple[PIDRecordBuilder, list[Edge]]:
    """M5 incl. subjectOf relationship emission (reference:
    chemotion.py:461-658); the addRelationship callback becomes edge rows."""
    if "@id" not in study or study.get("@type") != "Study":
        raise ValueError("not a study")
    fdo = _chemotion_generic(study)
    fdo.add(KEY_RESOURCE_TYPE, "Study", "resourceType")
    fdo.add(
        KEY_LICENSE, _license_url(study["includedInDataCatalog"]["license"]), "license"
    )
    about = study.get("about")
    if not isinstance(about, list) or len(about) == 0:
        raise ValueError("Study does not contain any datasets")
    edges: list[Edge] = []
    for entry in about:
        if "image" in entry:
            fdo.add(KEY_LOCATION_PREVIEW, entry["image"], "locationPreview")
        if "hasBioChemEntityPart" in entry:
            parts = entry["hasBioChemEntityPart"]
            if not isinstance(parts, list):
                parts = [parts]
            for part in parts:
                value: dict = {}
                mw = part.get("molecularWeight")
                if isinstance(mw, dict) and mw.get("value") is not None:
                    value[KEY_MW] = float(mw["value"])
                if part.get("url") is not None:
                    value[KEY_PUBCHEM] = part["url"]
                if value:
                    fdo.add(KEY_COMPOUND, value, "characterizedCompound")
        if "name" in entry:
            fdo.add(KEY_NAME, entry["name"], "name")
        if "url" in entry:
            fdo.add(KEY_LANDING_PAGE, entry["url"], "landingPageLocation")
        if "identifier" in entry:
            fdo.add(KEY_IDENTIFIER, entry["identifier"], "identifier")
        for dataset in entry.get("subjectOf", []):
            presumed = encode_in_base64(strip_doi_prefix(dataset["@id"]))
            if not fdo.exists(KEY_DATE_CREATED) and "dateCreated" in dataset:
                fdo.add(KEY_DATE_CREATED, _iso(dataset["dateCreated"]), "dateCreated")
            edges.append(
                Edge(fdo.pid, presumed, KEY_HAS_METADATA, fdo.pid, "hasMetadata")
            )
            for k, v, n in fdo.entries(KEY_LOCATION_PREVIEW):
                edges.append(Edge(fdo.pid, presumed, k, v, n))
            for k, v, n in fdo.entries(KEY_COMPOUND):
                edges.append(Edge(fdo.pid, presumed, k, v, n))
    return fdo, edges


def extract_chemotion(
    resource: dict, terminology: TerminologyLookup | None = None
) -> tuple[PIDRecordBuilder, list[Edge]]:
    """M1 type dispatch (reference: chemotion.py:88-126)."""
    if not resource or not isinstance(resource, dict):
        raise ValueError("Resource cannot be empty and must be a dict.")
    t = resource.get("@type")
    if t == "Dataset":
        return _chemotion_dataset(resource)
    if t == "Study":
        return _chemotion_study(resource)
    raise ValueError("Invalid resource from Chemotion repository.")


# ------------------------------------------------------------------- NMRXiv
def prune_descriptions(resource):
    """M11 — null description/sdf recursively through hasPart/isPartOf/
    samples/studies (reference: nmrxiv.py:1114-1163). Pure (copies)."""
    if not isinstance(resource, dict):
        return resource
    resource = dict(resource)
    if "description" in resource:
        resource["description"] = None
    if "sdf" in resource:
        resource["sdf"] = None
    for key in ("hasPart", "isPartOf", "samples", "studies"):
        if key not in resource:
            continue
        val = resource[key]
        parts = [prune_descriptions(p) for p in val] if isinstance(val, list) else [
            prune_descriptions(val)
        ]
        resource[key] = parts
    return resource


def _nmrxiv_generic(resource: dict) -> PIDRecordBuilder:
    """M7 (reference: nmrxiv.py:321-470)."""
    orig, bio = resource["original"], resource["bioschema"]
    fdo = PIDRecordBuilder(encode_in_base64(orig["doi"]))
    fdo.add(KEY_KIP, VAL_KIP, "Kernel Information Profile")
    fdo.add(KEY_DO_TYPE, VAL_DO_TYPE_JSON, "digitalObjectType")
    if orig.get("created_at") is not None:
        fdo.add(KEY_DATE_CREATED, _iso(orig["created_at"]), "dateCreated")
    if orig.get("updated_at") is not None:
        fdo.add(KEY_DATE_MODIFIED, _iso(orig["updated_at"]), "dateModified")
    if "name" in orig:
        fdo.add(KEY_NAME, orig["name"], "name")
    fdo.add(KEY_IDENTIFIER, strip_doi_prefix(orig["doi"]), "identifier")
    lic = orig.get("license")
    if isinstance(lic, dict) and lic.get("spdx_id") is not None:
        fdo.add(KEY_LICENSE, _license_url(lic["spdx_id"]), "license")
    elif bio.get("license") is not None:
        fdo.add(KEY_LICENSE, _license_url(bio["license"]), "license")
    if isinstance(orig.get("authors"), list):
        for author in orig["authors"]:
            if "orcid_id" in author:
                fdo.add(
                    KEY_CONTACT, "https://orcid.org/" + author["orcid_id"], "contact"
                )
            elif "email" in author:
                fdo.add(KEY_EMAIL_CONTACT, author["email"], "emailContact")
    elif "owner" in orig and "email" in orig["owner"]:
        fdo.add(KEY_EMAIL_CONTACT, orig["owner"]["email"], "emailContact")
    elif "users" in orig:
        for user in orig["users"]:
            if "email" in user:
                fdo.add(KEY_EMAIL_CONTACT, user["email"], "emailContact")
    if orig.get("download_url") is not None:
        fdo.add(KEY_DO_LOCATION, orig["download_url"], "digitalObjectLocation")
    else:
        fdo.add(
            KEY_DO_LOCATION,
            f"https://dx.doi.org/{strip_doi_prefix(orig['doi'])}",
            "digitalObjectLocation",
        )
    return fdo


def _compound_value(part: dict) -> dict:
    value: dict = {}
    if part.get("molecularWeight") is not None:
        value[KEY_MW] = float(part["molecularWeight"])
    if part.get("url") is not None:
        value[KEY_PUBCHEM] = part["url"]
    return value


def _nmrxiv_dataset(
    resource: dict, term: TerminologyLookup
) -> tuple[PIDRecordBuilder, list[Edge]]:
    """M8 incl. terminology lookups (reference: nmrxiv.py:472-696)."""
    orig, bio = resource["original"], resource["bioschema"]
    if (
        not isinstance(orig, dict)
        or not orig["identifier"].startswith("NMRXIV:D")
        or bio.get("@type") != "Dataset"
    ):
        raise ValueError("not an NMRXiv dataset")
    fdo = _nmrxiv_generic(resource)
    fdo.add(KEY_RESOURCE_TYPE, "Dataset", "resourceType")
    mt = bio.get("measurementTechnique")
    if isinstance(mt, dict) and "url" in mt:
        fdo.add(KEY_NMR_METHOD, mt["url"], "NMR method")
    if orig.get("public_url") is not None:
        fdo.add(KEY_LANDING_PAGE, orig["public_url"], "landingPageLocation")
    elif bio.get("url") is not None:
        fdo.add(KEY_LANDING_PAGE, bio["url"], "landingPageLocation")
    if orig.get("dataset_photo_url") is not None:
        fdo.add(KEY_LOCATION_PREVIEW, orig["dataset_photo_url"], "locationPreview")
    if isinstance(bio.get("variableMeasured"), list):
        for variable in bio["variableMeasured"]:
            if "name" not in variable or "value" not in variable:
                continue
            name, values = variable["name"], variable["value"]
            if values is None:
                continue
            if not isinstance(values, list):
                values = [values]
            for value in values:
                if not isinstance(value, str):
                    continue
                if name == "NMR solvent":
                    hit = term.search(value, "chebi", PARENT_NMR_SOLVENT)
                    if hit is not None:
                        fdo.add(KEY_SOLVENT, hit, "NMR solvent")
                elif name == "acquisition nucleus":
                    hit = term.search(value, "chebi", PARENT_ATOM)
                    if hit is not None:
                        fdo.add(KEY_NUCLEUS, hit, "Aquisition Nucleus")
                elif name == "irridation frequency":
                    fdo.add(KEY_FREQUENCY, value, "Nominal Proton Frequency")
                elif name == "nuclear magnetic resonance pulse sequence":
                    fdo.add(KEY_PULSE_SEQ, value, "Pulse Sequence Name")
    if bio.get("isPartOf") is not None and isinstance(bio["isPartOf"], list):
        for part in bio["isPartOf"]:
            if "name" in part:
                fdo.update(KEY_NAME, f"{orig['name']}-{part['name']}")
            if "hasBioChemEntityPart" in part:
                biochem = part["hasBioChemEntityPart"]
                value = _compound_value(biochem)
                if value:
                    fdo.add(KEY_COMPOUND, value, "characterizedCompound")
                formula = biochem.get("chemicalFormula")
                if formula and len(formula) > 1:
                    fdo.delete(KEY_NAME)
                    fdo.add(KEY_NAME, f"{orig['name']}-{formula}", "name")
    return fdo, []


def _nmrxiv_sample(resource: dict) -> tuple[PIDRecordBuilder, list[Edge]]:
    """M9 incl. hasPart relationship emission (reference: nmrxiv.py:698-971)."""
    orig, bio = resource["original"], resource["bioschema"]
    if not isinstance(orig, dict) or not orig["identifier"].startswith("NMRXIV:S"):
        raise ValueError("no original study")
    if not isinstance(bio, dict):
        raise ValueError("no bioschema study")
    if "study_preview_urls" not in orig:
        raise ValueError("original_study has no study preview url")
    if bio.get("@type") != "Study":
        raise ValueError("bioschema_study @type is not Study")
    fdo = _nmrxiv_generic(resource)
    fdo.add(KEY_RESOURCE_TYPE, "Study", "resourceType")
    if orig.get("public_url") is not None:
        fdo.add(KEY_LANDING_PAGE, orig["public_url"], "landingPageLocation")
    elif bio.get("url") is not None:
        fdo.add(KEY_LANDING_PAGE, bio["url"], "landingPageLocation")
    if orig.get("study_photo_urls") is not None:
        for url in orig["study_photo_urls"]:
            fdo.add(KEY_LOCATION_PREVIEW, url, "locationPreview")
    compound_entries: list[tuple[str, dict]] = []
    about = bio.get("about")
    if isinstance(about, dict) and about.get("hasBioChemEntityPart") is not None:
        for part in about["hasBioChemEntityPart"]:
            if not part:
                continue
            value = _compound_value(part)
            if value:
                compound_entries.append((KEY_COMPOUND, value))
    elif orig.get("molecules") is not None:
        for molecule in orig["molecules"]:
            compound_entries.append(
                (KEY_COMPOUND, {KEY_MW: molecule["molecular_weight"]})
            )
    for k, v in compound_entries:
        fdo.add(k, v, "characterizedCompound")
    edges: list[Edge] = []
    if bio.get("hasPart") is not None:
        for part in bio["hasPart"]:
            if not part or "@id" not in part:
                continue
            presumed = encode_in_base64(strip_doi_prefix(part["@id"]))
            edges.append(
                Edge(fdo.pid, presumed, KEY_HAS_METADATA, fdo.pid, "hasMetadata")
            )
            for v in fdo.values(KEY_LOCATION_PREVIEW):
                edges.append(
                    Edge(fdo.pid, presumed, KEY_LOCATION_PREVIEW, v, "locationPreview")
                )
            for k, v in compound_entries:
                edges.append(Edge(fdo.pid, presumed, k, v, "characterizedCompound"))
    return fdo, edges


def _nmrxiv_project(resource: dict) -> tuple[PIDRecordBuilder, list[Edge]]:
    """M10 (reference: nmrxiv.py:973-1112)."""
    orig, bio = resource["original"], resource["bioschema"]
    if not isinstance(orig, dict) or not orig["identifier"].startswith("NMRXIV:P"):
        raise ValueError("not an NMRXiv project")
    fdo = _nmrxiv_generic(resource)
    fdo.add(KEY_RESOURCE_TYPE, "Project", "resourceType")
    if orig.get("public_url") is not None:
        fdo.add(KEY_LANDING_PAGE, orig["public_url"], "landingPageLocation")
    elif bio.get("url") is not None:
        fdo.add(KEY_LANDING_PAGE, bio["url"], "landingPageLocation")
    if orig.get("photo_url") is not None:
        fdo.add(KEY_LOCATION_PREVIEW, orig["photo_url"], "locationPreview")
    edges: list[Edge] = []
    if bio.get("hasPart") is not None:
        for study in bio["hasPart"]:
            if "@id" not in study:
                continue
            presumed = encode_in_base64(strip_doi_prefix(study["@id"]))
            edges.append(
                Edge(fdo.pid, presumed, KEY_HAS_METADATA, fdo.pid, "hasMetadata")
            )
    return fdo, edges


def extract_nmrxiv(
    resource: dict, terminology: TerminologyLookup | None = None
) -> tuple[PIDRecordBuilder, list[Edge]]:
    """M2 type dispatch + M11 pruning (reference: nmrxiv.py:115-153)."""
    if not resource or not isinstance(resource, dict):
        raise ValueError("Invalid resource.")
    if "original" not in resource or "bioschema" not in resource:
        raise ValueError("Resource is missing original or bioschema data.")
    if "doi" not in resource["original"]:
        raise ValueError("Resource has no DOI.")
    resource = {
        "original": prune_descriptions(resource["original"]),
        "bioschema": prune_descriptions(resource["bioschema"]),
    }
    term = terminology if terminology is not None else TerminologyLookup()
    letter = resource["original"]["identifier"].replace("NMRXIV:", "")[0]
    if letter == "D":
        return _nmrxiv_dataset(resource, term)
    if letter == "S":
        return _nmrxiv_sample(resource)
    if letter == "P":
        return _nmrxiv_project(resource)
    raise ValueError("Resource is neither a dataset nor a sample nor a project.")


# --------------------------------------------------- §2.11 extractor registry
Extractor = Callable[[dict, TerminologyLookup], tuple[PIDRecordBuilder, list[Edge]]]

EXTRACTORS: dict[str, Extractor] = {
    "chemotion": extract_chemotion,
    "nmrxiv": extract_nmrxiv,
}


def register_extractor(repo: str, fn: Extractor) -> None:
    """Add a repository type without touching pipeline code (the reference's
    repository registry, src/nmr_FAIR_DOs/lib.py:66-117)."""
    EXTRACTORS[repo] = fn


# ----------------------------------------------------- M15/J2: repo FAIR-DOs
def repository_fdo_rows(repo: str) -> list[tuple[str, str, str, str]]:
    """Constant per-repository FAIR-DO (reference: chemotion.py:660-705,
    nmrxiv.py:1165-1210; dateCreated entry dropped — it is now()-dependent
    there, which is unreproducible by design)."""
    base = {
        "chemotion": "https://chemotion.example",
        "nmrxiv": "https://nmrxiv.example",
    }[repo]
    pid = encode_in_base64(base)
    name = {"chemotion": "Chemotion", "nmrxiv": "NMRXiv"}[repo]
    rows = [
        (KEY_KIP, VAL_KIP, "Kernel Information Profile"),
        (KEY_DO_TYPE, VAL_DO_TYPE_HTML, "digitalObjectType"),
        (KEY_DO_LOCATION, base, "digitalObjectLocation"),
        (KEY_LANDING_PAGE, base, "landingPageLocation"),
        (KEY_NAME, name, "name"),
        (KEY_RESOURCE_TYPE, "Repository", "resourceType"),
    ]
    return [(pid, k, n, v) for k, v, n in rows]


def repository_fdo_pid(repo: str) -> str:
    return repository_fdo_rows(repo)[0][0]


# ------------------------------------------------------------ the Ray stage
_OUT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("envelope_id", pa.int64()),
        ("repo", pa.string()),
        ("pid", pa.string()),
        ("key", pa.string()),
        ("name", pa.string()),
        ("value_json", pa.string()),
        ("presumed_target", pa.string()),
        ("error", pa.string()),
    ]
)


class ExtractStage:
    """map_batches callable: envelopes → union of entry/edge/error rows.

    Stateless apart from the terminology memo cache (per-actor, T2 pattern);
    registry dispatch per row (M1/M2). Dead-letters instead of raising (M17 —
    the reference's errors list, lib.py:326-341)."""

    def __init__(self, primary_source: bool = True):
        self._term = TerminologyLookup()
        self._primary_source = primary_source

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in _OUT_SCHEMA}

        def put(kind, eid, repo, pid=None, key=None, name=None, value_json=None,
                presumed=None, error=None):
            cols["kind"].append(kind)
            cols["envelope_id"].append(eid)
            cols["repo"].append(repo)
            cols["pid"].append(pid)
            cols["key"].append(key)
            cols["name"].append(name)
            cols["value_json"].append(value_json)
            cols["presumed_target"].append(presumed)
            cols["error"].append(error)

        eids = batch["envelope_id"].to_pylist()
        repos = batch["repo"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for eid, repo, payload in zip(eids, repos, payloads):
            extractor = EXTRACTORS.get(repo)
            if extractor is None:
                put("error", eid, repo, error=f"unknown repo {repo!r}")
                continue
            try:
                resource = json.loads(payload)
            except (json.JSONDecodeError, ValueError) as e:
                put("error", eid, repo, error=f"unparseable payload: {e}")
                continue
            try:
                fdo, edges = extractor(resource, self._term)
            except (ValueError, KeyError, TypeError) as e:
                put("error", eid, repo, error=str(e) or type(e).__name__)
                continue
            if self._primary_source:
                # lib.py:312 — every mapped record points at its repo FDO
                fdo.add(
                    KEY_PRIMARY_SOURCE, repository_fdo_pid(repo), "hadPrimarySource"
                )
            for pid, key, name, value_json in fdo.rows():
                put("entry", eid, repo, pid=pid, key=key, name=name,
                    value_json=value_json)
            for e in edges:
                put("edge", eid, repo, pid=e.source_pid, key=e.key, name=e.name,
                    value_json=e.value_json, presumed=e.presumed_target)
        return pa.table(cols, schema=_OUT_SCHEMA)


def extract_records(envelopes: Dataset, primary_source: bool = True) -> Dataset:
    """The Ray-native create_pidRecords_from_scratch front half (§3.1):
    one streaming map_batches, no shared state, no callbacks."""
    import functools

    return envelopes.map_batches(
        functools.partial(_extract_batch, primary_source=primary_source),
        batch_format="pyarrow",
    )


def _extract_batch(batch: pa.Table, *, primary_source: bool) -> pa.Table:
    # task-level entry point (picklable, stateless) — ExtractStage instances
    # are also usable directly as an actor-pool stage for huge corpora
    stage = ExtractStage(primary_source=primary_source)
    return stage(batch)


# ------------------------------------------------------------ contract slice
def _envelopes(sf_dir: str) -> Dataset:
    from nmr_fair_dos_ray.sources.envelopes import synthesize_envelopes

    return synthesize_envelopes(sf_dir)


def q_extract_entries(sf_dir: str):
    """Full long-format entries table from the extraction pipeline."""
    out = extract_records(_envelopes(sf_dir))
    entries = out.filter(expr="kind == 'entry'").select_columns(
        ["pid", "key", "name", "value_json"]
    )
    df = entries.to_pandas()
    return df.sort_values(["pid", "key", "value_json"]).reset_index(drop=True)


def q_extract_edges(sf_dir: str):
    """addRelationship pushes as rows (J1 input)."""
    out = extract_records(_envelopes(sf_dir))
    edges = out.filter(expr="kind == 'edge'").select_columns(
        ["pid", "presumed_target", "key", "name", "value_json"]
    )
    df = edges.to_pandas()
    return df.sort_values(
        ["pid", "presumed_target", "key", "value_json"]
    ).reset_index(drop=True)


def q_extract_errors(sf_dir: str):
    """M17 dead-letter rollup: error count per repo."""
    from ray.data.aggregate import Count

    out = extract_records(_envelopes(sf_dir))
    errs = (
        out.filter(expr="kind == 'error'")
        .groupby("repo")
        .aggregate(Count(alias_name="n_errors"))
    )
    df = errs.to_pandas()
    return df.sort_values("repo").reset_index(drop=True)


def q_extract_resolved(sf_dir: str):
    """End-to-end §3.1 back half: extracted edges resolved against extracted
    records by the two-key priority join (J1), rolled up by relation/outcome."""
    from ray.data.aggregate import Count

    from nmr_fair_dos_ray.pipelines.records import resolve_edges

    out = extract_records(_envelopes(sf_dir)).materialize()
    records = out.filter(expr="kind == 'entry'").select_columns(
        ["pid", "key", "name", "value_json"]
    )
    edges = (
        out.filter(expr="kind == 'edge'")
        .select_columns(["pid", "presumed_target", "name"])
        .rename_columns({"pid": "source_pid", "name": "relation"})
    )
    resolved = resolve_edges(edges, records)
    agg = resolved.groupby(["relation", "resolved_by"]).aggregate(
        Count(alias_name="n_edges")
    )
    df = agg.to_pandas()
    return df.sort_values(["relation", "resolved_by"]).reset_index(drop=True)


def q_repo_fdo(sf_dir: str):
    """M15 constant repository FAIR-DOs + J2 get-or-create: union the
    constant rows with extracted records, dedup-merge, return the repo-FDO
    slice. When a repo FDO pid already has entries, merge keeps one row per
    (pid,key,value) — the get-or-create semantics as data."""
    import pandas as pd

    from nmr_fair_dos_ray.pipelines.records import dedup_merge

    const_rows = repository_fdo_rows("chemotion") + repository_fdo_rows("nmrxiv")
    const = rd.from_items(
        [
            {"pid": p, "key": k, "name": n, "value_json": v}
            for (p, k, n, v) in const_rows
        ]
    )
    out = extract_records(_envelopes(sf_dir))
    records = out.filter(expr="kind == 'entry'").select_columns(
        ["pid", "key", "name", "value_json"]
    )
    merged = dedup_merge(records.union(const))
    repo_pids = sorted({p for (p, _, _, _) in const_rows})

    def keep_repo(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.is_in(b["pid"], value_set=pa.array(repo_pids)))

    df = merged.map_batches(keep_repo, batch_format="pyarrow").to_pandas()
    return df.sort_values(["pid", "key", "value_json"]).reset_index(drop=True)


def q_flatten_records(sf_dir: str):
    """M12 ES-doc flattening over the extraction output: DTR-renamed fields,
    dict-value ``key.subkey`` explosion, distinct-value collapse,
    always-as-list coercion, and the per-record ``timestamp`` field
    (reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:41-124).
    Returns the SQL-comparable slice (pid, field, n_values, as_list); the
    wall-clock timestamp fallback is pinned to the oracle's constant."""
    from nmr_fair_dos_ray.oracle_extract import FLATTEN_NOW_ISO
    from nmr_fair_dos_ray.pipelines.records import flatten_records

    out = extract_records(_envelopes(sf_dir))
    entries = out.filter(expr="kind == 'entry'").select_columns(
        ["pid", "key", "name", "value_json"]
    )
    flat = flatten_records(entries, now_iso=FLATTEN_NOW_ISO).select_columns(
        ["pid", "field", "n_values", "as_list"]
    )
    df = flat.to_pandas()
    return df.sort_values(["pid", "field"]).reset_index(drop=True)


def q_type_api_fixes(sf_dir: str):
    """M13 Type-API rewrapping applied to the extraction output; returns the
    affected rows (the reference's workaround keys only)."""
    from nmr_fair_dos_ray.pipelines.records import TYPE_API_FIXES, apply_type_api_fixes

    out = extract_records(_envelopes(sf_dir))
    entries = out.filter(expr="kind == 'entry'").select_columns(
        ["pid", "key", "value_json"]
    )
    fixed = entries.map_batches(apply_type_api_fixes, batch_format="pyarrow")

    def keep_fixed(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(
            pc.is_in(b["key"], value_set=pa.array(sorted(TYPE_API_FIXES)))
        )

    df = fixed.map_batches(keep_fixed, batch_format="pyarrow").to_pandas()
    return df.sort_values(["pid", "key", "value_json"]).reset_index(drop=True)
