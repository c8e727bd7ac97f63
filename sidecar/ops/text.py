"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID, and document fingerprinting.

Each operator is a single vectorized ``map_batches`` over zero-copy Arrow;
token semantics are defined as *split on a single space* so the DuckDB oracle
(``string_split(text, ' ')``) is bit-equivalent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from sidecar.detect.language import find_language_batch


def read_documents(sf_dir: str, columns=("doc_id", "text")):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def token_count(sf_dir: str) -> "rd.Dataset":
    """doc_id, n_tokens — whitespace(single-space) token count."""

    def f(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text").fill_null(""), " ")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            }
        )

    return read_documents(sf_dir).map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
             "this", "with", "for", "as", "on", "at", "by", "from")


def quality_score(sf_dir: str) -> "rd.Dataset":
    """doc_id, n_chars, n_tokens, avg_token_len, n_stopwords, n_punct —
    the quality-feature family (length, mean token length, stopword count,
    punctuation-char count); counts are exact ints, the single ratio is one
    IEEE division so the oracle hashes bit-equal."""
    sw = set(STOPWORDS)

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text").fill_null("")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(pc.list_value_length(pc.split_pattern(text, " ")), pa.int64())
        # chars excluding the (n_tokens-1) separators, per token, as float64
        avg = pc.divide(
            pc.cast(pc.add(pc.subtract(n_chars, n_tokens), 1), pa.float64()),
            pc.cast(n_tokens, pa.float64()),
        )
        n_stop = pa.array(
            [sum(1 for t in (s or "").split(" ") if t in sw)
             for s in text.to_pylist()], pa.int64())
        n_punct = pc.cast(
            pc.count_substring_regex(text, "[^A-Za-z0-9 ]"), pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "avg_token_len": avg,
                "n_stopwords": n_stop,
                "n_punct": n_punct,
            }
        )

    return read_documents(sf_dir).map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def lang_detect(sf_dir: str) -> "rd.Dataset":
    """doc_id, detected_code, reliable — deterministic n-gram/stopword
    language-ID (the engine's cld2 analog; no SQL oracle — model output)."""

    def f(batch: pa.Table) -> pa.Table:
        res = find_language_batch(batch.column("text").fill_null(""))
        codes = [r["languages"][0]["code"] if r else None for r in res]
        reliable = [bool(r["reliable"]) if r else None for r in res]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "detected_code": pa.array(codes, pa.string()),
                "reliable": pa.array(reliable, pa.bool_()),
            }
        )

    return read_documents(sf_dir).map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint(sf_dir: str) -> "rd.Dataset":
    """doc_id, fp — md5 content fingerprint (matches DuckDB ``md5(text)``)."""

    def f(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        fps = [md5((t or "").encode()).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"), "fp": pa.array(fps, pa.string())})

    return read_documents(sf_dir).map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def lang_counts(sf_dir: str) -> "rd.Dataset":
    """lang, n — grouped counts with per-batch partial pre-aggregation before
    the (tiny) global groupby — the scale pattern for counters (A1)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(batch.column("lang").to_pylist()).value_counts()
        return pa.table({"lang": s.index.astype(str), "partial_n": s.values.astype(np.int64)})

    from ray.data.aggregate import Sum

    return (
        read_documents(sf_dir, columns=("doc_id", "lang"))
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(Sum("partial_n", alias_name="n"))
    )


def token_count_regex(sf_dir: str) -> "rd.Dataset":
    """doc_id, n_tokens_re — BPE-ish tokenization: count of
    ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]`` matches.  Arrow's
    ``count_substring_regex`` and DuckDB's ``regexp_extract_all`` are both
    RE2, so the counts are bit-equal (verified incl. unicode)."""
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens_re": pc.cast(
                pc.count_substring_regex(batch.column("text").fill_null(""), pat),
                pa.int64()),
        })

    return read_documents(sf_dir).map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def winnow_fingerprint(sf_dir: str, k: int = 5, w: int = 5) -> "rd.Dataset":
    """doc_id, fp — winnowing fingerprints (the MOSS rolling-hash scheme):
    hash every char k-gram, slide a w-window, keep the window minimum,
    emit the DISTINCT set per document.  Near-identical documents share most
    fingerprints, which is what makes this the standard copy-detection
    primitive.  Hashes are 8-hex-char md5 prefixes compared lexicographically
    so the DuckDB window-min oracle is bit-equal."""

    def f(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        ids, fps = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            t = text or ""
            n = len(t)
            m = n - k + 1
            if m < w:
                continue
            hs = [md5(t[i:i + k].encode()).hexdigest()[:8] for i in range(m)]
            seen = set()
            for j in range(m - w + 1):
                seen.add(min(hs[j:j + w]))
            for fp in seen:
                ids.append(doc_id)
                fps.append(fp)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string())})

    return read_documents(sf_dir).map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
