"""Optional Neo4j property-graph sink (batched UNWIND MERGE).

Reference behavior being re-expressed:

* AWS variant: 500-row ``UNWIND $batch MERGE`` with APOC dynamic labels
  (``Art-Knowledge-Graph-AWS/GRAPH/graph_builder.py:27-54``).
* Local variant: per-triple ``MERGE (h:{Label} {name})-[:REL]->(t:{Label})``
  with f-string label interpolation
  (``Art-Knowledge-Graph-Local/Graph/graph_builder.py:41-93``).

Defects NOT reproduced (SURVEY.md §2.11):

* #3 — duplicate ``YIELD node`` variable in the APOC call (Cypher compile
  error): we emit one statement per label-group instead.
* #6 — Cypher injection via interpolated labels/rel-types: identifiers
  cannot be parameterized in Cypher, so every interpolated identifier goes
  through ``sanitize_identifier`` (strict allow-list) first.

The sink itself runs ``foreachPartition`` with MERGE-only statements, so
Spark task retries are idempotent (SURVEY.md §7 hard-point 4). The neo4j
driver is optional — everything except ``write_graph`` is pure and
unit-tested without it.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame

try:  # optional; not in this container
    import neo4j  # type: ignore  # noqa: F401

    HAVE_NEO4J = True
except Exception:  # pragma: no cover
    HAVE_NEO4J = False

_IDENT_RE = re.compile(r"[^A-Za-z0-9_]")


def sanitize_identifier(name: str, default: str = "Entity") -> str:
    """Strict allow-list for interpolated Cypher identifiers (labels and
    relationship types): non ``[A-Za-z0-9_]`` chars are dropped, a leading
    digit is prefixed, empty input falls back to ``default``. This is the
    fix for the reference's injection-prone f-string interpolation
    (``…Local/Graph/graph_builder.py:68,75,85-87``)."""
    cleaned = _IDENT_RE.sub("", (name or "").strip())
    if not cleaned:
        return default
    if cleaned[0].isdigit():
        cleaned = "_" + cleaned
    return cleaned


def sanitize_identifier_col(col, default: str = "Entity"):
    """Column-expression twin of :func:`sanitize_identifier` (identical
    semantics, asserted by a shared unit test) — JVM-side so distributed
    exports never pay a per-row Python round-trip."""
    from pyspark.sql import functions as F

    cleaned = F.regexp_replace(
        F.trim(F.coalesce(col, F.lit(""))), "[^A-Za-z0-9_]", ""
    )
    prefixed = F.when(
        cleaned.rlike("^[0-9]"), F.concat(F.lit("_"), cleaned)
    ).otherwise(cleaned)
    return F.when(prefixed == "", F.lit(default)).otherwise(prefixed)


def merge_nodes_cypher(label: str) -> str:
    """Batched node upsert for one (sanitized) label group."""
    lbl = sanitize_identifier(label)
    return (
        "UNWIND $batch AS row "
        f"MERGE (n:`{lbl}` {{name: row.name}})"
    )


def merge_edges_cypher(rel_type: str) -> str:
    """Batched edge upsert for one (sanitized) relationship-type group.

    Node MERGE first (label-less, keyed on name — the AWS variant's
    convention, ``…AWS/GRAPH/graph_builder.py:37-38``) then the edge."""
    rel = sanitize_identifier(rel_type, default="RELATED")
    return (
        "UNWIND $batch AS row "
        "MERGE (h {name: row.src}) "
        "MERGE (t {name: row.dst}) "
        f"MERGE (h)-[r:`{rel}`]->(t)"
    )


def _chunks(rows: Iterator, size: int):
    buf = []
    for r in rows:
        buf.append(r)
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def is_transient_bolt_error(exc: BaseException) -> bool:
    """Duck-typed retriable-bolt-error check (no neo4j import needed):
    the driver's ``TransientError``/``ServiceUnavailable``/
    ``SessionExpired`` class names, or an ``is_retryable()`` hook (the
    neo4j 5.x exception protocol). Everything else — constraint
    violations, syntax errors, auth — fails fast."""
    name = type(exc).__name__
    if name in ("TransientError", "ServiceUnavailable", "SessionExpired"):
        return True
    retryable = getattr(exc, "is_retryable", None)
    return bool(retryable()) if callable(retryable) else False


def write_graph(
    edges: DataFrame,
    uri: str | None = None,
    auth: tuple[str, str] | None = None,
    batch_size: int = 500,
    driver_factory=None,
    max_batch_retries: int = 3,
) -> None:
    """Write an ``edges(src, dst, relationship)`` DataFrame to Neo4j with
    size-``batch_size`` UNWIND batches per partition (the AWS variant's
    bootstrap default, ``…AWS/EMR-config/EMR_bootstrap.sh:17``).

    MERGE-only ⇒ re-running a failed Spark task re-applies upserts, so the
    sink is idempotent under task retry (SURVEY §7 hard-point 4); each
    UNWIND batch is additionally attempted up to ``max_batch_retries``
    times IN TOTAL (i.e. ``max_batch_retries - 1`` retries after the
    first failure) on TRANSIENT bolt errors (leader switch, connection
    drop —
    ``is_transient_bolt_error``) with the same backoff discipline as the
    LLM client, in a FRESH session per attempt (the old session may be
    poisoned by the failure). Non-transient errors fail the task
    immediately and surface through Spark's own task-retry machinery —
    which is safe for the same MERGE-idempotence reason.

    ``driver_factory`` is an optional zero-arg callable, run ON EACH
    EXECUTOR, returning a driver with the neo4j interface
    (``.session()`` context manager whose sessions have
    ``.run(cypher, batch=...)``, and ``.close()``). Default builds the
    real ``neo4j.GraphDatabase.driver(uri, auth)`` and requires the
    driver package; injecting a factory makes the partition wiring
    testable (and swappable for another bolt-compatible store) without
    a server.
    """
    if driver_factory is None:
        if not HAVE_NEO4J:
            raise NotImplementedError(
                "neo4j driver not installed; pass driver_factory or install "
                "neo4j (SURVEY.md §2.1)"
            )
        if uri is None or auth is None:
            raise ValueError("uri and auth are required with the default driver")

        def driver_factory():  # pragma: no cover - needs a neo4j server
            import neo4j as _n

            return _n.GraphDatabase.driver(uri, auth=auth)

    def _write_partition(rows: Iterator) -> None:
        from big_data___knowledge_graph_construction_with_llm_spark.llm_client import call_with_retry_sync

        driver = driver_factory()

        def _run_batch(cypher: str, batch: list[dict]) -> None:
            # fresh session per attempt: one (auto-commit) tx per batch,
            # and a transient failure never reuses a poisoned session
            with driver.session() as session:
                session.run(cypher, batch=batch)

        try:
            for chunk in _chunks(rows, batch_size):
                by_rel: dict[str, list[dict]] = {}
                for r in chunk:
                    by_rel.setdefault(r["relationship"], []).append(
                        {"src": r["src"], "dst": r["dst"]}
                    )
                for rel, batch in sorted(by_rel.items()):
                    call_with_retry_sync(
                        _run_batch,
                        merge_edges_cypher(rel),
                        batch,
                        max_retries=max_batch_retries,
                        is_rate_limit=is_transient_bolt_error,
                        # bolt errors carry no LLM-style "XmY.Zs" wait
                        # directives — a duration-looking token in a bolt
                        # message must not become a half-hour sleep
                        wait_parser=None,
                        failure_label="transient bolt error",
                    )
        finally:
            driver.close()

    edges.foreachPartition(_write_partition)


def export_neo4j_bulk_csv(
    vertices: DataFrame, edges: DataFrame, path: str
) -> None:
    """Export the graph in ``neo4j-admin database import`` CSV layout —
    the bulk path for graphs too large for transactional MERGE (the
    bolt sink above upserts ~10⁴ rows/s/connection; admin import loads
    ~10⁶/s offline, which at a 100 TB-corpus graph is the only viable
    initial load; the MERGE sink remains the incremental-update path).

    Layout written (header as its OWN single-line file — neo4j-admin
    treats only the first line of the first file in a group as a
    header, so per-part-file headers would be ingested as data rows):

    - ``{path}/nodes_header.csv`` + ``{path}/nodes/part-*.csv`` —
      ``name:ID,label:LABEL``; ONE row per node id, multiple labels
      joined with ``;`` (the admin-import multi-label convention —
      emitting one row per (id, label) would abort on duplicate ids)
    - ``{path}/rels_header.csv`` + ``{path}/rels/part-*.csv`` —
      ``:START_ID,:END_ID,:TYPE``

    Quoting is RFC4180 (doubled quotes, ``escape='"'``) — Spark's
    default backslash escaping mis-parses under neo4j-admin. Types
    default to ``RELATED`` (same fallback as ``merge_edges_cypher``, so
    a bulk load + incremental MERGEs agree); labels default to
    ``Entity``. All sanitization is ``sanitize_identifier_col`` —
    JVM-side, no per-row Python. Load with::

        neo4j-admin database import full \\
          --nodes "nodes_header.csv,nodes/part-.*" \\
          --relationships "rels_header.csv,rels/part-.*" ...
    """
    from pyspark.sql import functions as F

    from big_data___knowledge_graph_construction_with_llm_spark import fsutil

    root = path.rstrip("/")
    csv_opts = {"header": False, "escape": '"'}
    (
        vertices.select(
            F.col("id").alias("name"),
            sanitize_identifier_col(F.col("label")).alias("_lbl"),
        )
        .groupBy("name")
        .agg(F.array_join(F.sort_array(F.collect_set("_lbl")), ";").alias("labels"))
        .write.mode("overwrite")
        .options(**csv_opts)
        .csv(f"{root}/nodes")
    )
    (
        edges.select(
            F.col("src"),
            F.col("dst"),
            sanitize_identifier_col(
                F.col("relationship"), default="RELATED"
            ).alias("type"),
        )
        .distinct()
        .write.mode("overwrite")
        .options(**csv_opts)
        .csv(f"{root}/rels")
    )
    # headers go through the Hadoop FileSystem API so they land NEXT TO
    # the part files whatever the scheme (hdfs://, s3a://, file:/) —
    # a driver-local open() would silently write them to the driver's
    # disk for any remote destination, orphaning the data files
    spark = vertices.sparkSession
    fsutil.write_text(spark, f"{root}/nodes_header.csv", "name:ID,label:LABEL\n")
    fsutil.write_text(spark, f"{root}/rels_header.csv", ":START_ID,:END_ID,:TYPE\n")
