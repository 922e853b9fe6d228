"""Pure-NumPy image/sequence kernels.

These are the "physical operators" of the engine (SURVEY.md §2.9): every
function here is deterministic, side-effect free, and operates on NumPy
arrays only — no Spark imports — so each is unit-testable in
microseconds and composable inside the single fused ``mapInPandas``
page kernel (pipeline.py).
"""
