"""Spark ML pipelines mirroring the reference's scikit-learn models."""
