"""LLM-training-data pipeline operators (north-star extensions,
BASELINE.json): deduplication, similarity search, text analysis —
DataFrame-native, designed for 100 TB corpora."""
