"""DataFrame-level operators (chunking, dedup, similarity, embedding, joins)."""
