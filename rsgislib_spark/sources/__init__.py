"""Data sources: parquet/Iceberg-style table loading, image LUT catalog,
multimodal binary-payload plumbing."""
