"""Generic (non-RDF) XML record reader.

Reference: driver-side ``xmltodict`` parse with records under a repeated
row tag and single-record dict→list promotion
(``Art-Knowledge-Graph-Local/ingestion/data_ingestion_batch.py:91-106``).

Engine strategy: try Spark 4's native XML source first (distributed,
pushdown-capable); fall back to an Arrow-batched ``mapInPandas`` over
``binaryFile`` rows wrapping ``xmltodict`` — one file per row, so files
are the unit of parallelism (same trade the reference made, but executed
on executors instead of the driver).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:  # optional; not in this container
    import xmltodict  # type: ignore

    _HAVE_XMLTODICT = True
except Exception:  # pragma: no cover
    _HAVE_XMLTODICT = False


def read_xml_records(
    spark: SparkSession, path: str, row_tag: str = "record"
) -> DataFrame:
    """Read XML records distributed. Prefers the native Spark 4 XML source."""
    try:
        return (
            spark.read.format("xml").option("rowTag", row_tag).load(path)
        )
    except Exception:
        return _read_xml_fallback(spark, path, row_tag)


def _read_xml_fallback(
    spark: SparkSession, path: str, row_tag: str
) -> DataFrame:
    """binaryFile → mapInPandas(xmltodict/regex) → one row per record as a
    map<string,string> JSON column (schema applied downstream)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        for pdf in batches:
            out = {"path": [], "record_json": []}
            for _, r in pdf.iterrows():
                text = bytes(r["content"]).decode("utf-8", errors="replace")
                for rec in parse_xml_records(text, row_tag):
                    out["path"].append(r["path"])
                    out["record_json"].append(json.dumps(rec, sort_keys=True))
            yield pd.DataFrame(out)

    return files.mapInPandas(_parse, schema="path string, record_json string")


def parse_xml_records(text: str, row_tag: str) -> list[dict]:
    """Parse records under ``row_tag``; dict→list promotion for the
    single-record case (reference ``:101-102``). Pure function so it is
    unit-testable without Spark."""
    if _HAVE_XMLTODICT:  # pragma: no cover - not in container
        doc = xmltodict.parse(text)
        root = next(iter(doc.values()))
        recs = root.get(row_tag) if isinstance(root, dict) else None
        if recs is None:
            return []
        if isinstance(recs, dict):
            recs = [recs]
        return [dict(r) for r in recs]
    # dependency-free fallback: flat <row_tag><field>value</field>… records
    records = []
    for m in re.finditer(rf"<{row_tag}(?:\s[^>]*)?>(.*?)</{row_tag}>", text, re.S):
        body = m.group(1)
        rec = {
            fm.group(1): _unescape(fm.group(2).strip())
            for fm in re.finditer(r"<([\w:.-]+)(?:\s[^>]*)?>(.*?)</\1>", body, re.S)
        }
        records.append(rec)
    return records


def _unescape(s: str) -> str:
    for a, b in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"),
    ]:
        s = s.replace(a, b)
    return s
