"""ocr_inference_spark — a PySpark-native page-to-text span-extraction engine.

Brand-new implementation (NOT a port) with the query and data-processing
capabilities of the reference pipeline (buda-base/ocr-inference): line
detection on binarized page images (connected components + projection
profile), deskew, baseline dewarping, reading-order sort, per-line CTC text
recognition, and ordered span-sequence re-emission — all expressed as a
declarative DataFrame plan whose only Python hot path is a single fused
Arrow-batched ``mapInPandas`` kernel.

Layout:
- ``schemas``     explicit StructType schemas (never inferred)
- ``imgcodec``    pure-NumPy PNG encode/decode for media span payloads
- ``kernels/``    pure-NumPy image/sequence kernels (unit-testable, no Spark)
- ``model``       deterministic recognition "network" + broadcast plumbing
- ``render``      deterministic fixture page renderer (ground truth known)
- ``fixtures``    interleaved documents/pages/golden-spans builders
- ``pipeline``    the Spark job: spans table -> ordered span sequences
- ``checkpoint``  per-partition lineage/metrics table + resumable runs
- ``dedup``       exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
- ``similarity``  embedding cosine top-k (brute force + LSH-bucketed)
- ``text/``       language-ID, quality scoring, token counts, fingerprints
"""

__version__ = "0.1.0"
