"""RDF/XML triple extraction source.

Reference semantics (``Art-Knowledge-Graph-AWS/ingestion/DataIngestionBatch.py:19-64``,
= ``Art-Knowledge-Graph-Local/ingestion/data_ingestion_batch.py:22-88``):

* parse each RDF/XML file into triples,
* resolve node labels with precedence
  ``skos:prefLabel > skos:altLabel > rdfs:label > dc:title > dcterms:title > URI tail``,
* predicate → local name (text after last ``#`` or ``/``),
* keep only predicates in
  ``{prefLabel, altLabel, note, isRelatedTo, sameAs, creator, depicts}``,
* drop ``hexBinary``-typed literals, drop blank subject/object, dedup.

The reference parses on the driver (admitted non-distributed at
``…AWS/ingestion/DataIngestionBatch.py:95``). Here: ``binaryFile`` source →
one row per file → ``mapInPandas`` parsing on the executors → explode to
triples; the keep-set filter is applied inside the parser (cheap manual
pushdown — SURVEY.md §4) and re-applied relationally, and the dedup is a
DataFrame ``dropDuplicates`` so it is global across files.

Two parser backends, same semantics:

* rdflib (full RDF/XML), preferred when importable;
* a dependency-free stdlib ``xml.etree.ElementTree`` parser for the
  striped RDF/XML subset Europeana EDM actually uses (node elements
  with ``rdf:about``/``rdf:nodeID``, property elements with
  ``rdf:resource`` / nested nodes / literals carrying ``xml:lang`` and
  ``rdf:datatype``) — so ingestion runs end-to-end with no extra
  packages installed.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEEP_PREDICATES = frozenset(
    {"prefLabel", "altLabel", "note", "isRelatedTo", "sameAs", "creator", "depicts"}
)

#: label-resolution precedence (URIs are public vocabulary constants)
LABEL_PREDICATES = (
    "http://www.w3.org/2004/02/skos/core#prefLabel",
    "http://www.w3.org/2004/02/skos/core#altLabel",
    "http://www.w3.org/2000/01/rdf-schema#label",
    "http://purl.org/dc/elements/1.1/title",
    "http://purl.org/dc/terms/title",
)

try:  # optional; not in this container
    import rdflib  # type: ignore

    HAVE_RDFLIB = True
except Exception:  # pragma: no cover
    HAVE_RDFLIB = False


def local_name(uri: str) -> str:
    """Text after the last ``#`` else last ``/`` (predicate local-naming)."""
    return uri.rsplit("/", 1)[-1].rsplit("#", 1)[-1]


def extract_triples_from_graph(g) -> list[dict]:  # pragma: no cover - needs rdflib
    """rdflib graph → rows ``{subject, predicate, object, lang}`` with the
    reference's label precedence / keep-set / hexBinary / blank rules."""
    from rdflib import Literal, URIRef

    def resolve_label(node) -> str:
        if isinstance(node, Literal):
            return str(node)
        for p in LABEL_PREDICATES:
            v = g.value(node, URIRef(p))
            if v is not None:
                return str(v)
        return local_name(str(node)) if isinstance(node, URIRef) else ""

    rows = []
    for s, p, o in g:
        pred = local_name(str(p))
        if pred not in KEEP_PREDICATES:
            continue
        if isinstance(o, Literal) and o.datatype and "hexBinary" in str(o.datatype):
            continue
        subj = resolve_label(s)
        obj = resolve_label(o)
        if not subj.strip() or not obj.strip():
            continue
        lang = o.language if isinstance(o, Literal) else None
        rows.append(
            {"subject": subj, "predicate": pred, "object": obj, "lang": lang}
        )
    return rows


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


def _tag_uri(tag: str) -> str:
    """ElementTree ``{namespace}local`` → the RDF/XML URI (namespace and
    local name concatenate directly — hash namespaces end in ``#``,
    slash namespaces in ``/``)."""
    return tag[1:].replace("}", "", 1) if tag.startswith("{") else tag


def parse_rdfxml_raw(
    data: bytes | str,
) -> list[tuple[str, str, str, bool, str | None, str | None]]:
    """Stdlib parser for the striped RDF/XML subset EDM files use.

    Returns raw triples ``(subject, predicate, object, object_is_literal,
    lang, datatype)`` — subjects/URI-objects as URIs (blank nodes as
    ``_:id``), literal objects as their text. Handles: node elements
    with ``rdf:about``/``rdf:nodeID`` (typed ones emit ``rdf:type``),
    property elements with ``rdf:resource``, nested node elements, and
    literals with ``xml:lang`` / ``rdf:datatype``. RDF/XML exotica the
    EDM shape never uses (``parseType``, containers, reification,
    ``xml:base``) is out of scope — use rdflib for such inputs.
    """
    root = ET.fromstring(data)
    out: list[tuple[str, str, str, bool, str | None, str | None]] = []
    blank_count = [0]

    def node_id(elem: ET.Element) -> str:
        about = elem.get(f"{{{_RDF_NS}}}about")
        if about is not None:
            return about
        nid = elem.get(f"{{{_RDF_NS}}}nodeID")
        if nid is not None:
            return f"_:{nid}"
        blank_count[0] += 1
        return f"_:gen{blank_count[0]}"

    def walk_node(elem: ET.Element) -> str:
        s = node_id(elem)
        tag = _tag_uri(elem.tag)
        if tag != f"{_RDF_NS}Description":
            out.append((s, f"{_RDF_NS}type", tag, False, None, None))
        for prop in elem:
            p = _tag_uri(prop.tag)
            res = prop.get(f"{{{_RDF_NS}}}resource")
            nested = [c for c in prop]
            if res is not None:
                out.append((s, p, res, False, None, None))
            elif nested:
                for child in nested:
                    out.append((s, p, walk_node(child), False, None, None))
            else:
                out.append(
                    (
                        s,
                        p,
                        prop.text or "",
                        True,
                        prop.get(_XML_LANG),
                        prop.get(f"{{{_RDF_NS}}}datatype"),
                    )
                )
        return s

    for top in root:
        walk_node(top)
    return out


def rows_from_raw_triples(
    raw: list[tuple[str, str, str, bool, str | None, str | None]],
) -> list[dict]:
    """Raw triples → labeled keep-set rows, mirroring
    ``extract_triples_from_graph`` exactly (label precedence, keep-set,
    hexBinary drop, blank drop) so both parser backends agree."""
    # first literal value per (subject, label-predicate), document order
    # (rdflib's g.value picks an arbitrary one; document order is the
    # deterministic choice)
    labels: dict[str, dict[str, str]] = {}
    for s, p, o, is_lit, _lang, _dt in raw:
        if is_lit and p in LABEL_PREDICATES:
            labels.setdefault(s, {}).setdefault(p, o)

    def resolve(node: str) -> str:
        by_pred = labels.get(node)
        if by_pred:
            for p in LABEL_PREDICATES:
                if p in by_pred:
                    return by_pred[p]
        return "" if node.startswith("_:") else local_name(node)

    rows = []
    for s, p, o, is_lit, lang, dt in raw:
        pred = local_name(p)
        if pred not in KEEP_PREDICATES:
            continue
        if is_lit and dt and "hexBinary" in dt:
            continue
        subj = resolve(s)
        obj = o if is_lit else resolve(o)
        if not subj.strip() or not obj.strip():
            continue
        rows.append(
            {
                "subject": subj,
                "predicate": pred,
                "object": obj,
                "lang": lang if is_lit else None,
            }
        )
    return rows


def parse_rdfxml_rows(data: bytes | str) -> list[dict]:
    """One RDF/XML document → labeled keep-set rows, on the best
    available backend (rdflib when importable, stdlib subset parser
    otherwise)."""
    if HAVE_RDFLIB:  # pragma: no cover - rdflib absent in this container
        import rdflib

        g = rdflib.Graph()
        g.parse(data=data, format="xml")
        return extract_triples_from_graph(g)
    return rows_from_raw_triples(parse_rdfxml_raw(data))


def read_rdfxml_triples(spark: SparkSession, path: str) -> DataFrame:
    """Distributed RDF/XML → triple table ``(subject, predicate, object, lang)``.

    ``binaryFile`` rows → per-executor parse (rdflib if installed, else
    the stdlib EDM-subset parser) → global ``dropDuplicates`` (the
    reference dedups per-frame only; global is strictly more correct for
    a multi-file corpus). Parallelism = files; at scale set
    ``spark.sql.files.maxPartitionBytes`` small enough that large RDF
    dumps split across tasks, or pre-shard the dump.
    """
    files = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"subject": [], "predicate": [], "object": [], "lang": []}
            for content in pdf["content"]:
                for row in parse_rdfxml_rows(bytes(content)):
                    for k in out:
                        out[k].append(row[k])
            yield pd.DataFrame(out)

    triples = files.mapInPandas(
        _parse, schema="subject string, predicate string, object string, lang string"
    )
    # global dedup across files (reference dedups per-frame only)
    return triples.dropDuplicates(["subject", "predicate", "object", "lang"])


def keepset_filter(
    df: DataFrame,
    pred_col: str = "predicate",
    subj_col: str = "subject",
    obj_col: str = "object",
    keep: frozenset[str] = KEEP_PREDICATES,
) -> DataFrame:
    """The relational core of the RDF reader, as a standalone operator:
    keep-set membership + blank-drop + dedup
    (``…AWS/ingestion/DataIngestionBatch.py:26,49-52,60``)."""
    return (
        df.filter(F.col(pred_col).isin(*sorted(keep)))
        .filter((F.trim(F.col(subj_col)) != "") & (F.trim(F.col(obj_col)) != ""))
        .dropDuplicates([subj_col, pred_col, obj_col])
    )
