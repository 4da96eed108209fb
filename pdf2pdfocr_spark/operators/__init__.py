"""Large-scale training-data-pipeline operators over the extraction output
(and the driver's flat documents/embeddings tables): deduplication,
similarity search, text analysis, multimodal plumbing."""
