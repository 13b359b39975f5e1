"""Corpus sources/sinks: synthetic generator, parquet/JSONL IO, schemas."""
