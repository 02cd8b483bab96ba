"""Relational operators: enrichment join, dimension dedup, the dedup
family, similarity search, batch analytics, multimodal plumbing."""
