"""Deterministic language identification shaped like pycld2's output
(reference: warc_metadata_sidecar.py:105-126 ``find_language``):

    {'reliable': bool, 'text-bytes': int,
     'languages': [{'name','code','text-covered','score'}, ...]}   or None

The reference strips control/surrogate/unassigned chars (BAD_CHARS, :31),
runs cld2 bestEffort, drops 'Unknown' entries and returns None when nothing
is known; we reproduce those semantics with an embedded stopword/CJK model
(no C libraries in the sandbox) using pure integer arithmetic so results are
bit-identical across processes and parallelism levels.

Vectorization: lowercase+tokenize via pyarrow compute, one ``pc.is_in``
membership pass per language over the flattened token array, per-row counts
via ``np.add.reduceat``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# reference BAD_CHARS = \p{Cc}|\p{Cs}|\p{Cn} (warc_metadata_sidecar.py:31);
# surrogates can't appear in valid str, so control chars are the practical set.
BAD_CHARS = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
_BAD_CHARS_RE2 = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]"

_LEXICONS: dict[str, tuple[str, set[str]]] = {
    "en": ("ENGLISH", {
        "the", "and", "of", "to", "a", "in", "is", "it", "that", "was", "for",
        "on", "are", "with", "as", "his", "they", "at", "be", "this", "have",
        "from", "or", "had", "by", "not", "but", "what", "were", "when", "we",
        "there", "can", "an", "your", "which", "their", "said", "will", "page",
    }),
    "es": ("SPANISH", {
        "el", "la", "de", "que", "y", "en", "un", "una", "ser", "se", "no",
        "haber", "por", "con", "su", "para", "como", "estar", "tener", "le",
        "lo", "todo", "pero", "más", "hacer", "o", "poder", "decir", "este",
        "ir", "otro", "ese", "si", "me", "ya", "ver", "porque", "dar", "los",
        "las", "del", "al", "es", "página",
    }),
    "de": ("GERMAN", {
        "der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich",
        "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine", "als",
        "auch", "es", "an", "werden", "aus", "er", "hat", "dass", "sie",
        "nach", "wird", "bei", "einer", "um", "am", "sind", "noch", "wie",
        "einem", "über", "seite",
    }),
    "fr": ("FRENCH", {
        "le", "de", "un", "être", "et", "à", "il", "avoir", "ne", "je", "son",
        "que", "se", "qui", "ce", "dans", "en", "du", "elle", "au", "pour",
        "pas", "vous", "par", "sur", "faire", "plus", "dire", "me", "on",
        "mon", "lui", "nous", "comme", "mais", "avec", "tout", "y", "aller",
        "les", "des", "est", "la",
    }),
}
_LANGS = list(_LEXICONS)  # stable order: en, es, de, fr
_CJK = ("zh", "Chinese", r"[一-鿿]")


def _entries_from_counts(
    counts: dict[str, int], n_tokens: int, cjk_chars: int, n_chars: int, text_bytes: int
) -> dict | None:
    """Deterministic cld2-shaped result from integer hit counts."""
    scored: list[tuple[int, str, str]] = []
    for code in _LANGS:
        if counts.get(code, 0) > 0:
            scored.append((counts[code], _LEXICONS[code][0], code))
    if cjk_chars > 0 and n_chars > 0 and cjk_chars * 5 >= n_chars:
        scored.append((cjk_chars, _CJK[1].upper(), _CJK[0]))
    if not scored:
        return None
    scored.sort(key=lambda t: (-t[0], t[2]))
    scored = scored[:3]  # cld2 returns exactly 3 slots; we emit the non-Unknown
    total = sum(c for c, _, _ in scored)
    langs = []
    for hits, name, code in scored:
        covered = (hits * 100) // total if total else 0
        langs.append({
            "name": name,
            "code": code,
            "text-covered": int(covered),
            "score": float(hits * 1000 // max(1, n_tokens + cjk_chars)),
        })
    reliable = bool(scored[0][0] >= 2 and langs[0]["text-covered"] >= 60)
    return {"reliable": reliable, "text-bytes": int(text_bytes), "languages": langs}


def find_language(payload: bytes | str) -> dict | None:
    """Scalar detector with the reference's return shape (:105-126).

    Delegates to the batch kernel on a 1-element array so scalar and batch
    are bit-identical BY CONSTRUCTION — independent tokenizers diverged on
    edge cases (Nl number-letters like 'Ⅻ', Turkish İ casefolding) where
    Python's [^\\W\\d_]+ and Arrow's \\p{L} disagree."""
    text = payload.decode("utf-8", "replace") if isinstance(payload, bytes) else payload
    return find_language_batch(pa.array([text], type=pa.string()))[0]


def find_language_batch(texts: pa.Array, mask: np.ndarray | None = None) -> np.ndarray:
    """Vectorized language-ID over an Arrow string array → object ndarray of
    cld2-shaped dicts (or None).  ``mask`` limits work to text-gated rows."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    n = len(arr)
    out = np.full(n, None, dtype=object)
    if n == 0:
        return out
    arr = arr.fill_null("") if arr.null_count else arr
    # apply the mask BEFORE the expensive kernels: blanking off-mask rows up
    # front skips their share of the regex-clean/lower/tokenize/lexicon-scan
    # work (the dominant cost on image-heavy batches where only a few
    # caption rows are gated in) while keeping every array length-aligned;
    # masked-in rows see exactly their own text, so results are unchanged
    if mask is not None and not mask.all():
        arr = pc.if_else(pa.array(mask), arr, "")
    clean = pc.replace_substring_regex(arr, _BAD_CHARS_RE2, "")
    nbytes = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    nchars = pc.utf8_length(clean).to_numpy(zero_copy_only=False).astype(np.int64)
    lower = pc.utf8_lower(clean)
    toks = pc.split_pattern_regex(lower, r"[^\p{L}]+")  # letters-only tokens
    flat_all = pc.list_flatten(toks)  # flattened ONCE; reused for the mask
    nonempty = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
    flat = flat_all.filter(pa.array(nonempty))  # drop empties from splitting
    row_sizes_all = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    ends_all = np.cumsum(row_sizes_all)
    kept_cum = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
    ends = kept_cum[ends_all]
    starts = np.concatenate([[0], ends[:-1]])
    n_tokens = ends - starts
    counts: dict[str, np.ndarray] = {}
    nflat = len(flat)
    for code, (_, lex) in _LEXICONS.items():
        hits = pc.is_in(flat, value_set=pa.array(sorted(lex))).to_numpy(zero_copy_only=False)
        hits = hits.astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(hits)]) if nflat else np.zeros(1, dtype=np.int64)
        counts[code] = csum[ends] - csum[starts]
    cjk = pc.count_substring_regex(clean, _CJK[2]).to_numpy(zero_copy_only=False).astype(np.int64)
    todo = np.ones(n, dtype=bool) if mask is None else mask
    for i in np.flatnonzero(todo):
        out[i] = _entries_from_counts(
            {c: int(counts[c][i]) for c in _LANGS},
            int(n_tokens[i]), int(cjk[i]), int(nchars[i]), int(nbytes[i]),
        )
    return out
