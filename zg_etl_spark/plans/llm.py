"""LLM-training-data pipeline queries (dedup / similarity / text analysis)
over the documents and embeddings tables — filled in as the operators land."""

QUERIES: dict = {}
ORACLE: dict = {}
