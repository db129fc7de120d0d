"""Training-data-pipeline operators: dedup, similarity search, text
analysis, stream-shaped windows, multimodal plumbing."""
