"""Encoding conversion (C4 analogue).

The reference transliterates Wylie <-> Tibetan Unicode via the pyewts
library (BDRC/inference.py:640-649,696-705). pyewts is not available in
this environment and Tibetan script is outside our synthetic charset, so
the engine ships a deterministic, exactly reversible *stand-in*
transliteration pair with the same API shape: a rule-based digraph
scheme over the synthetic alphabet (vowels gain a trailing apostrophe,
digits gain a '#' prefix). Round-trip is exact — pinned by tests — and
both directions are pure JVM regexp expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_translit(col) -> Column:
    """'unicode' -> 'wylie-ish': a->a' e->e' i->i' o->o' u->u', d -> #d."""
    out = F.regexp_replace(col, r"([aeiou])", r"$1'")
    return F.regexp_replace(out, r"([0-9])", r"#$1")


def from_translit(col) -> Column:
    """Exact inverse of to_translit."""
    out = F.regexp_replace(col, r"#([0-9])", r"$1")
    return F.regexp_replace(out, r"([aeiou])'", r"$1")
