"""Offline ontology search / validate / disambiguate (T2/J5 depth).

Ports the reference terminology connector's full candidate-resolution logic
(reference: src/nmr_FAIR_DOs/connectors/terminology.py:77-330) over an
offline ontology-graph fixture instead of the OLS HTTP API the sandbox
cannot reach:

- ``searchForTerm``: exact-label candidate search, optionally restricted to
  descendants of a parent term (the API's ``allChildrenOf``), each candidate
  validated by an ontology-specific node predicate (terminology.py:96-105),
  single survivor returned directly, multiple survivors disambiguated by
  ``_findParent`` (terminology.py:148-180).
- ``_validateCHEBI`` (terminology.py:310-330): a CHEBI node is a usable
  chemical entity iff it carries at least one of inchikey / smiles / inchi /
  mass / formula.
- ``_findParent`` (terminology.py:255-307): prefer a candidate that has
  another candidate among its children; else the candidate with the most
  children; else None.
- the query-keyed result cache (terminology.py:111-114,170-180 — keyed by
  query alone, not (query, ontology, parent); reproduced faithfully).

The graph itself is plain data (nodes with property dicts + child edges) —
broadcast once via ``ray.put`` and shared by every lookup actor, exactly the
pattern :class:`~nmr_fair_dos_ray.pipelines.extract.TerminologyLookup` uses.
"""

from __future__ import annotations

CHEBI_PROPERTY_KEYS = (
    "http://purl.obolibrary.org/obo/chebi/inchikey",
    "http://purl.obolibrary.org/obo/chebi/smiles",
    "http://purl.obolibrary.org/obo/chebi/inchi",
    "http://purl.obolibrary.org/obo/chebi/mass",
    "http://purl.obolibrary.org/obo/chebi/formula",
)


def validate_chebi(node: dict) -> bool:
    """terminology.py:310-330: atom-or-chemical-properties check."""
    return any(k in node for k in CHEBI_PROPERTY_KEYS)


class OntologySearcher:
    """Exact-term ontology search with validation + parent disambiguation.

    ``nodes``: ``{iri: {"label": str, "ontology": str, **properties}}``.
    ``children``: ``{iri: [child_iri, ...]}`` (direct children).
    """

    #: terminology.py:69-75 — per-ontology default validators
    validation_functions = {"chebi": validate_chebi}

    def __init__(self, nodes: dict[str, dict], children: dict[str, list[str]]):
        self.nodes = nodes
        self.children = {k: list(v) for k, v in children.items()}
        # exact-label index per ontology (the search API's exact=true +
        # ontology filter); labels matched case-insensitively
        self._by_label: dict[tuple[str, str], list[str]] = {}
        for iri, node in nodes.items():
            key = (node.get("ontology", ""), str(node.get("label", "")).strip().lower())
            self._by_label.setdefault(key, []).append(iri)
        for v in self._by_label.values():
            v.sort()  # deterministic candidate order (HTTP result order analog)
        self._desc_memo: dict[str, frozenset[str]] = {}
        self.cache: dict[str, str] = {}

    # -------------------------------------------------------- graph helpers
    def _descendants(self, iri: str) -> frozenset[str]:
        """Transitive children of ``iri`` (allChildrenOf semantics), memoized."""
        if iri in self._desc_memo:
            return self._desc_memo[iri]
        seen: set[str] = set()
        stack = list(self.children.get(iri, ()))
        while stack:
            c = stack.pop()
            if c in seen:
                continue
            seen.add(c)
            stack.extend(self.children.get(c, ()))
        out = frozenset(seen)
        self._desc_memo[iri] = out
        return out

    def _find_parent(self, entities: list[str]) -> str | None:
        """terminology.py:255-307 — candidate-containment first, then most
        children, else None (also the empty-candidates path)."""
        if not entities:
            return None
        kids = {e: self.children.get(e, []) for e in entities}
        for entity in entities:
            for child in kids[entity]:
                if child in entities:
                    return entity
        max_children = 0
        parent = None
        for entity in entities:
            if len(kids[entity]) > max_children:
                max_children = len(kids[entity])
                parent = entity
        return parent

    # --------------------------------------------------------------- search
    def search_for_term(
        self,
        query: str,
        ontology: str,
        parent: str | None = None,
        validate_node=None,
    ) -> str | None:
        """terminology.py:77-182, synchronously over the offline graph."""
        if validate_node is None:
            validate_node = self.validation_functions.get(
                ontology, lambda node: True
            )
        if query in self.cache:  # reference caches by query alone
            return self.cache[query]

        candidates = self._by_label.get(
            (ontology, query.strip().lower()), []
        )
        if parent is not None:
            allowed = self._descendants(parent)
            candidates = [c for c in candidates if c in allowed]
        if not candidates:
            return None

        entities = [
            iri for iri in candidates
            if iri in self.nodes and validate_node(self.nodes[iri])
        ]
        if len(entities) == 1:
            self.cache[query] = entities[0]
            return entities[0]
        result = self._find_parent(entities)
        if result is None:
            return None
        self.cache[query] = result
        return result


# --------------------------------------------------------------- fixture
#: public CHEBI identifiers used by the extraction pipeline's solvent /
#: nucleus lookups — the same IRIs the round-1 flat vocab mapped to, now as
#: a real graph so search routes through validate + disambiguate.
PARENT_NMR_SOLVENT = "http://purl.obolibrary.org/obo/CHEBI_197449"
PARENT_ATOM = "http://purl.obolibrary.org/obo/CHEBI_33250"

_OBO = "http://purl.obolibrary.org/obo/"
_P_FORMULA = "http://purl.obolibrary.org/obo/chebi/formula"
_P_MASS = "http://purl.obolibrary.org/obo/chebi/mass"


def default_ontology() -> OntologySearcher:
    """Deterministic offline CHEBI-ish graph: the extraction vocabulary plus
    validation-failure and ambiguity cases the unit tests exercise."""
    nodes = {
        PARENT_NMR_SOLVENT: {"label": "NMR solvent", "ontology": "chebi"},
        PARENT_ATOM: {"label": "atom", "ontology": "chebi"},
        f"{_OBO}CHEBI_85365": {
            "label": "CDCl3", "ontology": "chebi", _P_FORMULA: "CHCl3"},
        f"{_OBO}CHEBI_91502": {
            "label": "DMSO-d6", "ontology": "chebi", _P_FORMULA: "C2H6OS"},
        f"{_OBO}CHEBI_41981": {
            "label": "D2O", "ontology": "chebi", _P_FORMULA: "D2O"},
        f"{_OBO}CHEBI_49637": {
            "label": "1H", "ontology": "chebi", _P_MASS: "1.008"},
        f"{_OBO}CHEBI_36928": {
            "label": "13C", "ontology": "chebi", _P_MASS: "13.003"},
        # label collision: a deprecated duplicate of CDCl3 with NO chemical
        # properties — validateCHEBI must reject it, leaving one survivor
        f"{_OBO}CHEBI_85365_dep": {"label": "CDCl3", "ontology": "chebi"},
    }
    children = {
        PARENT_NMR_SOLVENT: [
            f"{_OBO}CHEBI_85365", f"{_OBO}CHEBI_91502", f"{_OBO}CHEBI_41981",
            f"{_OBO}CHEBI_85365_dep",
        ],
        PARENT_ATOM: [f"{_OBO}CHEBI_49637", f"{_OBO}CHEBI_36928"],
    }
    return OntologySearcher(nodes, children)
