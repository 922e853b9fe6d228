"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side Spark expressions (no Python UDFs): language ID, quality
scoring, token counting, document fingerprinting, cleanup functions.
"""
