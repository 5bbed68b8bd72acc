"""DataFrame-first operators: index build/merge, retrieval, scoring, BM25,
dedup, similarity search, text analysis, multimodal plumbing."""
