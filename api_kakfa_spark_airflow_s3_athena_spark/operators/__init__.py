"""Scale-oriented dataset operators: dedup, similarity search,
multimodal column plumbing."""
