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
one row per file → ``mapInPandas`` wrapping rdflib on the executors →
explode to triples; the keep-set filter is passed INTO the parser (cheap
manual pushdown — SURVEY.md §4) and re-applied relationally, and the dedup
is a DataFrame ``dropDuplicates`` so it is global across files.
"""

from __future__ import annotations

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


def read_rdfxml_triples(spark: SparkSession, path: str) -> DataFrame:
    """Distributed RDF/XML → triple table ``(subject, predicate, object, lang)``.

    Requires rdflib on the executors; raises ``NotImplementedError``
    otherwise (this container has no rdflib — the pure functions above are
    unit-tested instead, and ``q_rdf_filter_keepset`` exercises the
    relational core of these semantics on synthetic tables).
    """
    if not HAVE_RDFLIB:  # pragma: no cover
        raise NotImplementedError(
            "rdflib not installed; RDF/XML parsing is gated (SURVEY.md §2.1)"
        )

    files = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import rdflib

        for pdf in batches:
            out = {"subject": [], "predicate": [], "object": [], "lang": []}
            for content in pdf["content"]:
                g = rdflib.Graph()
                g.parse(data=bytes(content), format="xml")
                for row in extract_triples_from_graph(g):
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
