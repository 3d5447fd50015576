"""PySpark-native knowledge-graph construction & analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``martapacchiarotti/Big-Data---Knowledge-graph-construction-with-LLM``
(an ELT pipeline that turns heterogeneous open data into LLM-extracted
typed triplets and a property graph), extended with the LLM-training-data
operators (dedup, similarity search, multimodal columns, text analysis)
required for 100 TB scale.

Everything is declared through the DataFrame / SQL API so Catalyst + AQE
pick the physical strategy; Python UDFs appear only where the semantics
genuinely cannot be expressed relationally (rdflib RDF/XML parsing,
xmltodict fallback, the pluggable LLM-extraction stage), and then always
as Arrow-batched ``mapInPandas`` stages.
"""

from big_data___knowledge_graph_construction_with_llm_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
