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
    BDRC/inference.py:95-106,386-398), applied with weight ``lm_alpha``
    whenever a word completes at ``space_id``. Two table shapes:

    - a plain dict mapping a word (tuple of char ids) to a log-prob —
      unigram fusion; unseen words receive the table's floor
      (min score - 2).
    - an :class:`NGramLM` — bigram Katz-backoff fusion (the reference's
      KenLM is an n-gram backoff model; we score the completed word
      conditioned on the previous word, backing off to the unigram).

    The LM term biases pruning and the final ranking but the reported
    score stays acoustic+LM, matching shallow-fusion semantics.
    """
    logp = log_softmax(logits)
    T, V = logp.shape
    is_ngram = isinstance(lm, NGramLM)
    floor = (min(lm.values()) - 2.0) if (lm and not is_ngram) else 0.0

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
        if is_ngram:
            # previous word = the span between the two preceding spaces
            k = j - 1  # prefix[k] is the space closing the previous word
            i = k
            while i > 0 and prefix[i - 1] != space_id:
                i -= 1
            prev = prefix[i:k] if k > 0 else ()
            return lm_alpha * lm.word_logp(word, prev or None)
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


class NGramLM:
    """Bigram Katz-backoff LM over char-id-tuple words (the public ARPA
    backoff formulation used by SRILM/KenLM — the reference wires a
    KenLM n-gram into decode_beams, BDRC/inference.py:95-106):

        P(w2 | w1) = P_2(w1, w2)            if the bigram is listed,
                     bo(w1) + P_1(w2)       otherwise (log domain).

    All probabilities natural-log. Tiny and picklable — broadcast to
    executors exactly like the unigram table."""

    __slots__ = ("uni", "bo", "bi", "floor")

    def __init__(
        self,
        unigrams: dict[tuple[int, ...], float],
        backoffs: dict[tuple[int, ...], float],
        bigrams: dict[tuple[tuple[int, ...], tuple[int, ...]], float],
    ):
        self.uni = unigrams
        self.bo = backoffs
        self.bi = bigrams
        self.floor = (min(unigrams.values()) - 2.0) if unigrams else 0.0

    def word_logp(
        self, word: tuple[int, ...], prev: tuple[int, ...] | None = None
    ) -> float:
        if prev is not None:
            p = self.bi.get((prev, word))
            if p is not None:
                return p
            return self.bo.get(prev, 0.0) + self.uni.get(word, self.floor)
        return self.uni.get(word, self.floor)


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


_ARPA_SENTINELS = ("<s>", "</s>", "<unk>")


def parse_arpa_ngrams(
    arpa_text: str,
) -> tuple[dict[str, tuple[float, float]], dict[tuple[str, str], float]]:
    """Parse the \\1-grams: and \\2-grams: sections of an ARPA file
    (public format: SRILM ngram-format(5), also what KenLM reads).

    Returns ``(unigrams, bigrams)`` where unigrams maps token ->
    (log10-prob, log10-backoff — 0.0 when the file omits it) and
    bigrams maps (w1, w2) -> log10-prob. Sentinel-only entries are
    dropped on the unigram side; bigrams keep <s>/<\\s> context rows
    out too since CTC output never contains them."""
    unigrams: dict[str, tuple[float, float]] = {}
    bigrams: dict[tuple[str, str], float] = {}
    section = 0
    for line in arpa_text.splitlines():
        line = line.strip()
        if line.startswith("\\"):
            section = {"\\1-grams:": 1, "\\2-grams:": 2}.get(line, -1)
            continue
        if not line or line.startswith("#") or section <= 0:
            continue
        parts = line.split()
        try:
            lp = float(parts[0])
        except (ValueError, IndexError):
            continue
        if section == 1 and len(parts) >= 2:
            tok = parts[1]
            if tok in _ARPA_SENTINELS:
                continue
            bo = 0.0
            if len(parts) >= 3:
                try:
                    bo = float(parts[2])
                except ValueError:
                    bo = 0.0
            unigrams[tok] = (lp, bo)
        elif section == 2 and len(parts) >= 3:
            w1, w2 = parts[1], parts[2]
            if w1 in _ARPA_SENTINELS or w2 in _ARPA_SENTINELS:
                continue
            bigrams[(w1, w2)] = lp
    return unigrams, bigrams


def arpa_bigram_lm(arpa_text: str, encode) -> NGramLM:
    """ARPA file content -> :class:`NGramLM` for bigram shallow fusion
    (char-id-tuple words, natural-log probs)."""
    ln10 = math.log(10.0)
    unigrams, bigrams = parse_arpa_ngrams(arpa_text)

    def key(tok: str) -> tuple[int, ...]:
        return tuple(int(i) for i in encode(tok))

    uni = {key(t): lp * ln10 for t, (lp, _) in unigrams.items()}
    bo = {key(t): b * ln10 for t, (_, b) in unigrams.items() if b != 0.0}
    bi = {(key(a), key(b_)): lp * ln10 for (a, b_), lp in bigrams.items()}
    return NGramLM(uni, bo, bi)


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
