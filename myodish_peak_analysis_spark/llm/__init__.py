"""LLM-data-pipeline operators (dedup, text analysis, similarity search,
multimodal plumbing) over the documents/embeddings tables."""
