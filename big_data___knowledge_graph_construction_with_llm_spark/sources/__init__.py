"""Source readers (CSV/TSV/JSON/XML/RDF-XML/parquet) and sinks."""
