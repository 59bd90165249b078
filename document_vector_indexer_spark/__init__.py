"""document_vector_indexer_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``ArielGurten/Document-Vector-Indexer``
(``/root/reference/index_documents.py``): document cleaning, chunking
(fixed-overlap / sentence-grouped / paragraph), embedding, and the full
relational + vector + streaming query surface a pgvector-backed RAG
store implies downstream — plus LLM-training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns), each
designed for 100 TB scale on a real cluster.

Layout:
    session    — SparkSession factory (AQE, UTC, tuned shuffle partitions)
    io         — table registry + explicit schemas for the test corpus
    functions/ — pure column-expression libraries (text, vector)
    operators/ — DataFrame-level operators (chunking, dedup, similarity,
                 embedding, as-of join, text analysis, multimodal)
    plans/     — end-to-end pipelines (the reference's main() as one
                 declarative DataFrame chain)
    sources/   — connectors (binary documents, pgvector sink)
    streaming/ — windowed/stateful streaming operators + batch analogs
"""

__version__ = "0.1.0"
