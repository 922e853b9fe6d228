"""CTC decoding: greedy and beam, pure NumPy, deterministic.

Reimplements (from the published CTC formulation, Graves et al. 2006,
and the reference's observable behavior — BDRC/inference.py:75-118,
379-398) the decode step: collapse repeated argmax frames, drop blanks.
The beam variant is a standard prefix beam search over log-probs with
optional top-k beam output (top_k_beams=10, beam width 64 —
BDRC/inference.py:83,690-693). Confidence is exp(score/len)
(BDRC/inference.py:707-720).
"""

from __future__ import annotations

import math

import numpy as np

BLANK = 0
BEAM_WIDTH = 64  # reference: BDRC/inference.py:83
TOP_K_BEAMS = 10  # reference: BDRC/inference.py:690-693


def log_softmax(logits: np.ndarray) -> np.ndarray:
    """(T, V) raw scores -> log-probabilities, numerically stable.
    Kept in float32 when the input is float32 (half the bandwidth)."""
    m = logits.max(axis=1, keepdims=True)
    z = logits - m
    return z - np.log(np.exp(z).sum(axis=1, keepdims=True, dtype=z.dtype))


def greedy_decode(logits: np.ndarray) -> tuple[np.ndarray, float]:
    """(T, V) -> (char-id sequence, total log-prob of the greedy path)."""
    logp = log_softmax(logits)
    path = logp.argmax(axis=1)
    score = float(logp[np.arange(len(path)), path].sum())
    # collapse repeats, then drop blanks
    keep = np.ones(len(path), dtype=bool)
    keep[1:] = path[1:] != path[:-1]
    collapsed = path[keep]
    return collapsed[collapsed != BLANK].astype(np.int32), score


def beam_decode(
    logits: np.ndarray,
    beam_width: int = BEAM_WIDTH,
    top_k: int = TOP_K_BEAMS,
    lm: dict[tuple[int, ...], float] | None = None,
    lm_alpha: float = 0.8,
    space_id: int | None = None,
) -> list[tuple[tuple[int, ...], float]]:
    """Prefix beam search. Returns up to ``top_k`` (sequence, log-prob)
    pairs, best first. Deterministic: ties broken by sequence.

    ``lm`` enables shallow LM fusion (the KenLM hook of the reference,
    BDRC/inference.py:95-106,386-398): a unigram table mapping a word
    (tuple of char ids) to a log-prob, applied with weight ``lm_alpha``
    whenever a word completes at ``space_id``; unseen words receive the
    table's floor (min score - 2). The LM term biases pruning and the
    final ranking but the reported score stays acoustic+LM, matching
    shallow-fusion semantics.
    """
    logp = log_softmax(logits)
    T, V = logp.shape
    floor = (min(lm.values()) - 2.0) if lm else 0.0

    def lm_word_score(prefix: tuple[int, ...]) -> float:
        """Score of the word ending at prefix's tail (called at a space)."""
        if not lm:
            return 0.0
        j = len(prefix)
        while j > 0 and prefix[j - 1] != space_id:
            j -= 1
        word = prefix[j:]
        if not word:
            return 0.0
        return lm_alpha * lm.get(word, floor)

    # beams: prefix -> (logp ending in blank, logp ending in non-blank)
    beams: dict[tuple[int, ...], tuple[float, float]] = {(): (0.0, -math.inf)}
    for t in range(T):
        nxt: dict[tuple[int, ...], tuple[float, float]] = {}

        def add(prefix, pb, pnb):
            opb, opnb = nxt.get(prefix, (-math.inf, -math.inf))
            nxt[prefix] = (np.logaddexp(opb, pb), np.logaddexp(opnb, pnb))

        frame = logp[t]
        for prefix, (pb, pnb) in beams.items():
            total = np.logaddexp(pb, pnb)
            # blank extends, prefix unchanged
            add(prefix, total + frame[BLANK], -math.inf)
            for c in range(1, V):
                p = frame[c]
                if lm and space_id is not None and c == space_id:
                    p = p + lm_word_score(prefix)
                if prefix and prefix[-1] == c:
                    # same char: repeat (no growth) or after-blank (growth)
                    add(prefix, -math.inf, pnb + p)
                    add(prefix + (c,), -math.inf, pb + p)
                else:
                    add(prefix + (c,), -math.inf, total + p)
        pruned = sorted(
            nxt.items(),
            key=lambda kv: (-np.logaddexp(kv[1][0], kv[1][1]), kv[0]),
        )[:beam_width]
        beams = dict(pruned)

    def final_score(prefix, pb, pnb) -> float:
        s = float(np.logaddexp(pb, pnb))
        if lm and space_id is not None:
            s += lm_word_score(prefix)  # close the trailing word
        return s

    final = sorted(
        ((prefix, final_score(prefix, pb, pnb)) for prefix, (pb, pnb) in beams.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return final[:top_k]


def parse_arpa_unigrams(arpa_text: str) -> dict[str, float]:
    """Extract the \\1-grams: section of an ARPA LM file as
    {token: log10-prob} (C14 — reference: parse_arpa_unigrams,
    BDRC/utils.py:395-427; the reference keeps tokens only, we keep the
    log-probs too so the table feeds shallow fusion directly). Section
    ends at the next backslash header; blank/# lines skipped. Sentinel
    tokens (<s>, </s>, <unk>) are dropped — they never complete from CTC
    output. Takes the file CONTENT (driver reads once, broadcasts)."""
    out: dict[str, float] = {}
    in_1grams = False
    for line in arpa_text.splitlines():
        line = line.strip()
        if line == r"\1-grams:":
            in_1grams = True
            continue
        if in_1grams and line.startswith("\\"):
            break
        if in_1grams and line and not line.startswith("#"):
            parts = line.split()  # <logprob> <token> [<backoff>]
            if len(parts) >= 2 and parts[1] not in ("<s>", "</s>", "<unk>"):
                try:
                    out[parts[1]] = float(parts[0])
                except ValueError:
                    continue
    return out


def arpa_unigram_lm(arpa_text: str, encode) -> dict[tuple[int, ...], float]:
    """ARPA file content -> shallow-fusion table (char-id tuple ->
    natural-log prob). ARPA stores log10; fusion uses ln."""
    return {
        tuple(int(i) for i in encode(tok)): lp * math.log(10.0)
        for tok, lp in parse_arpa_unigrams(arpa_text).items()
    }


def build_unigram_lm(word_counts: dict[str, int], encode) -> dict[tuple[int, ...], float]:
    """Word frequency table -> {char-id tuple: log-prob} for shallow
    fusion. ``encode`` maps a word string to char ids (glyphs.encode_text).
    The table is tiny and broadcast-friendly (the reference ships its
    KenLM file to every worker the same way, BDRC/utils.py:105-159)."""
    total = sum(word_counts.values())
    return {
        tuple(int(i) for i in encode(w)): math.log(c / total)
        for w, c in word_counts.items()
    }


def ctc_confidence(logit_score: float, text_len: int) -> float:
    """exp(score / len) (reference: BDRC/inference.py:707-720)."""
    if text_len <= 0:
        return 0.0
    return float(math.exp(logit_score / text_len))
