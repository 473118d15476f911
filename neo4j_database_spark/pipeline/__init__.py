"""Training-data pipeline operators: dedup, similarity, text, multimodal.

Not present in the reference (SURVEY.md §2.9) — mandated extensions for
LLM-data-pipeline workloads at 100 TB. Everything stays in built-in
JVM-side expressions (higher-order array functions, hash functions);
Python appears only in the multimodal decode stubs where a real codec
library would sit.
"""
