"""The sidecar extraction pipeline: IMAGES-shaped Dataset → SIDECAR Dataset.

Ray-Data-native restatement of the reference's per-record loop
(warc_metadata_sidecar.py:205-283):

    filter empty payloads (F3) → mime+puid sniff (F5) → text gate (F6)
    → charset (F7) / language (F8) / soft-404 (F9, html+200 only)
    → image decode + phash/w/h/fmt (ST8, new) → nullable SIDECAR columns (F10)

Everything is ONE vectorized ``map_batches`` stage over zero-copy Arrow —
the per-record orchestration in the reference becomes boolean masks over
columns.  Stateless, so it runs as Ray tasks (cheap, elastic); image decode
is the only per-row loop (inherent, like any image library) and is bounded
to the image-typed rows of the batch.

Work-dedup by payload digest (reference DIGEST_CACHE, :39,231-246) is done
as a *within-batch memo* plus deterministic detectors: re-computing a digest
seen in another batch yields byte-identical metadata, so output equals the
reference's cache semantics without shuffling image bytes across the cluster
(A3 discussion in SURVEY.md §2.5).  ``sidecar_dataset_dedup_digest`` is the
explicit groupby(payload_digest) compute-once plan (extract once per distinct
payload, broadcast the metadata back) for when extraction dwarfs hashing.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sidecar import schemas
from sidecar.canon import iso_to_ts14  # noqa: F401  (re-exported for pipelines)
from sidecar.detect.language import find_language_batch

_TEXT_RE = r"(text|html|xml)"  # reference TEXT_FORMAT_MIMES (:33)


def _digest_batch(binary: pa.Array) -> np.ndarray:
    """sha1 per payload, 'sha1:<hex>' like WARC-Payload-Digest (:220)."""
    arr = binary.combine_chunks() if isinstance(binary, pa.ChunkedArray) else binary
    sha1 = hashlib.sha1
    return np.array(
        ["sha1:" + sha1(v.as_py() or b"").hexdigest() for v in arr], dtype=object
    )


def _lang_dict_to_struct(d: dict | None) -> dict | None:
    if d is None:
        return None
    return {
        "reliable": d["reliable"],
        "text_bytes": d["text-bytes"],
        "languages": [
            {
                "name": x["name"],
                "code": x["code"],
                "text_covered": x["text-covered"],
                "score": x["score"],
            }
            for x in d["languages"]
        ],
    }


def extract_sidecar_batch(batch: pa.Table, registry=None) -> pa.Table:
    """The core per-batch transform (pyarrow in / pyarrow out).

    Detectors are resolved THROUGH the §2.9 registry
    (sidecar/detect/protocol.py): the five built-ins run under their
    canonical names (replaceable without editing this module), then any
    user-registered extras append their columns.  ``registry`` is the
    driver-time snapshot a pipeline ships in its closure (None = this
    process's registry — correct for direct calls and built-ins-only)."""
    from sidecar.detect import protocol as proto

    if registry is None:
        registry = proto.snapshot()

    n = batch.num_rows
    payload = batch.column("bytes").combine_chunks()
    caption = batch.column("caption").combine_chunks()
    image_id = batch.column("image_id")
    url = batch.column("url") if "url" in batch.column_names else pa.nulls(n, pa.string())
    ts = batch.column("ts") if "ts" in batch.column_names else pa.nulls(n, pa.string())
    status = (
        batch.column("status").to_numpy(zero_copy_only=False)
        if "status" in batch.column_names
        else np.full(n, 200, dtype=np.int64)
    )

    # F3: empty-payload filter (reference :213-215).  fill_null: a NULL
    # payload cell counts as empty — without it the comparison yields an
    # object array holding None and every downstream boolean & raises
    nonempty = pc.fill_null(pc.greater(pc.binary_length(payload), 0), False) \
        .to_numpy(zero_copy_only=False).astype(bool)
    ctx = proto.DetectCtx(payload=payload, caption=caption.fill_null(""),
                          nonempty=nonempty, status=status)

    # F5: mime + puid (runs first; populates ctx.mime_*)
    mime_det = registry["mime"]
    mime_cols = mime_det.run(ctx, mime_det.applies_to(ctx))
    # the gate and downstream detectors read ctx.mime_fido/mime_magic; a
    # registry-swapped mime detector (§2.9) need not mutate ctx, so fall
    # back to the RETURNED columns — the protocol's actual contract
    if ctx.mime_fido is None and "mime_fido" in mime_cols:
        ctx.mime_fido = np.array(mime_cols["mime_fido"].to_pylist(), dtype=object)
    if ctx.mime_magic is None and "mime_magic" in mime_cols:
        ctx.mime_magic = np.array(mime_cols["mime_magic"].to_pylist(), dtype=object)

    # F6: text gate over the joined mime strings (reference :250,255)
    joined = np.array(
        [" ".join(x for x in (f, m) if x)
         for f, m in zip(ctx.mime_fido, ctx.mime_magic)],
        dtype=object,
    )
    ctx.mime_joined = joined
    ctx.is_text = (
        pc.match_substring_regex(pa.array(joined, type=pa.string()), _TEXT_RE)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    ) & nonempty
    ctx.html = np.array(["html" in j for j in joined], dtype=bool)
    # decoded payload text for text rows (reference :259-260)
    ctx.text = pa.array(
        [
            (payload[i].as_py() or b"").decode("utf-8", "replace")
            if ctx.is_text[i] else ""
            for i in range(n)
        ],
        type=pa.string(),
    )
    ctx.digests = _digest_batch(payload)

    def run(name: str) -> dict:
        det = registry[name]
        return det.run(ctx, det.applies_to(ctx))

    charset_cols = run("charset")    # F7
    lang_cols = run("language")      # F8 (+ caption generalization)
    s404_cols = run("soft404")       # F9
    image_cols = run("image")        # ST8 (within-batch digest memo = A3)

    out = pa.table(
        {
            "image_id": image_id,
            "url": url,
            "ts": ts,
            "mime_fido": mime_cols["mime_fido"],
            "mime_magic": mime_cols["mime_magic"],
            "puid": mime_cols["puid"],
            "charset": charset_cols["charset"],
            "languages": lang_cols["languages"],
            "caption_languages": lang_cols["caption_languages"],
            "soft404": s404_cols["soft404"],
            "phash": image_cols["phash"],
            "w": image_cols["w"],
            "h": image_cols["h"],
            "fmt": image_cols["fmt"],
            "payload_digest": pa.array(ctx.digests, type=pa.string()),
            "is_text": pa.array(ctx.is_text),
            # caption rides along so the per-row caption-equality invariant
            # (input_hint) is checkable on the engine's own output
            "caption": caption,
        }
    )
    # user-registered extra detectors (§2.9): columns appended as returned
    for nm, det in registry.items():
        if nm in proto.BUILTIN_NAMES:
            continue
        for cname, col in det.run(ctx, det.applies_to(ctx)).items():
            out = out.append_column(cname, col)
    # pass-through columns: fetch-partition id, and the source record id
    # (WARC-Concurrent-ID parity — the reference copies the source record's
    # WARC-Record-ID, warc_metadata_sidecar.py:223)
    for passthru in ("part", "lineno", "concurrent_id", "warcinfo_id"):
        if passthru in batch.column_names:
            out = out.append_column(passthru, batch.column(passthru))
    # F10/:270-271 — a record with no metadata at all is skipped entirely;
    # with a non-empty payload we always have a mime, so only empty payloads drop.
    return out.filter(pa.array(nonempty))


def sidecar_dataset(images_ds, *, batch_size: int = 1024, concurrency=None):
    """IMAGES Dataset → SIDECAR Dataset (lazy; the caller consumes/streams).

    Stateless tasks by default; pass ``concurrency`` to pin an actor pool.
    batch_size is small because rows carry image payloads (memory-aware,
    SURVEY.md §4.2).
    """
    from sidecar.detect import protocol as proto

    reg = proto.snapshot()  # ship the DRIVER's registry to the workers

    def extract_with_registry(batch: pa.Table) -> pa.Table:
        return extract_sidecar_batch(batch, registry=reg)

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return images_ds.map_batches(
        extract_with_registry,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        **kwargs,
    )


PAYLOAD_DERIVED_COLS = (
    "mime_fido", "mime_magic", "puid", "charset", "languages", "soft404",
    "phash", "w", "h", "fmt", "is_text", "payload_digest",
)  # columns that depend only on the payload bytes — the cacheable part

# dedup-digest step-4 gate: broadcast the per-distinct-digest metadata as a
# driver dict only when its materialized Arrow size fits a worker heap;
# beyond that (billions of distinct payloads) step 4 becomes the
# hash-partitioned join in _dedup_digest_join — same auto-gate shape as
# dedup.embedding_near_dup and merge_cdxj.
DIGEST_META_BROADCAST_MAX_BYTES = 512 << 20


def _assemble_from_lookup(batch: pa.Table, digests, lk: dict) -> pa.Table:
    """Shared step-4 row assembly: original-row columns + the payload-derived
    metadata for each row's digest from ``lk`` (a digest → metadata-row
    dict — the ray.put broadcast in the default plan, a per-partition local
    dict in the join fallback).  Rows whose digest has no metadata are
    dropped (≡ extract's empty-payload filter)."""
    n = batch.num_rows
    caption = batch.column("caption").combine_chunks()
    url = batch.column("url") if "url" in batch.column_names else pa.nulls(n, pa.string())
    ts = batch.column("ts") if "ts" in batch.column_names else pa.nulls(n, pa.string())
    hit = [lk.get(d) for d in digests]
    keep = np.array([h is not None for h in hit], dtype=bool)  # ≡ nonempty filter

    def col(name):
        return [h[name] for h, k in zip(hit, keep) if k]

    is_text = np.array(col("is_text"), dtype=bool)
    cap_kept = caption.filter(pa.array(keep)).fill_null("")
    cap_mask = (~is_text) & (
        pc.greater(pc.utf8_length(cap_kept), 0).to_numpy(zero_copy_only=False))
    caption_languages = find_language_batch(cap_kept, mask=cap_mask)
    out = pa.table({
        "image_id": batch.column("image_id").filter(pa.array(keep)),
        "url": url.filter(pa.array(keep)) if n else url,
        "ts": ts.filter(pa.array(keep)) if n else ts,
        "mime_fido": pa.array(col("mime_fido"), pa.string()),
        "mime_magic": pa.array(col("mime_magic"), pa.string()),
        "puid": pa.array(col("puid"), pa.string()),
        "charset": pa.array(col("charset"), type=schemas.CHARSET_T),
        "languages": pa.array(col("languages"), type=schemas.LANGUAGES_T),
        "caption_languages": pa.array(
            [_lang_dict_to_struct(x) for x in caption_languages],
            type=schemas.LANGUAGES_T),
        "soft404": pa.array(col("soft404"), pa.float64()),
        "phash": pa.array(col("phash"), pa.int64()),
        "w": pa.array(col("w"), pa.int32()),
        "h": pa.array(col("h"), pa.int32()),
        "fmt": pa.array(col("fmt"), pa.string()),
        "payload_digest": pa.array([d for d, k in zip(digests, keep) if k],
                                   pa.string()),
        "is_text": pa.array(is_text),
        "caption": cap_kept,
    })
    for passthru in ("part", "lineno", "concurrent_id", "warcinfo_id"):
        if passthru in batch.column_names:
            out = out.append_column(
                passthru, batch.column(passthru).filter(pa.array(keep)))
    return out


def sidecar_dataset_dedup_digest(images_ds, *, batch_size: int = 1024,
                                 num_parts: int = 64,
                                 broadcast: "bool | str" = "auto"):
    """The EXPLICIT compute-once-per-digest plan (reference DIGEST_CACHE →
    SURVEY.md A3: groupby(payload_digest), extract once per distinct payload,
    fan results back to every row).

    ``sidecar_dataset`` already matches the reference's cache SEMANTICS via
    deterministic detectors (+ a within-batch memo); this variant additionally
    matches its WORK profile — each distinct payload is extracted exactly
    once — which is the right plan when extraction dwarfs hashing (model
    scoring, OCR) and the corpus has heavy exact duplication (mirrors).

    Plan, keeping payload shuffles minimal:
      1. per-block first-occurrence dedup (vectorized) — at most one payload
         per (block × digest) continues;
      2. coarse-partition groupby on the digest hash → global keep-first
         (the only stage where payload bytes cross the wire, one per
         surviving candidate);
      3. ``extract_sidecar_batch`` over the distinct representatives only;
      4. the payload-derived metadata (small, no bytes) is collected and
         broadcast once via ``ray.put``; a final shuffle-free pass over the
         ORIGINAL rows re-hashes (cheap) and assembles each row from the
         lookup, computing only the row-specific fields (caption language)
         in place.  ``broadcast="auto"`` (default) materializes the metadata
         dataset and picks by its measured Arrow size vs
         ``DIGEST_META_BROADCAST_MAX_BYTES``: at a scale where the metadata
         outgrows a broadcast (billions of distinct payloads), step 4
         becomes ``_dedup_digest_join`` — a tagged-union hash-partitioned
         join on payload_digest where the original rows ship WITHOUT their
         bytes (digest + row-specific columns only) — the upstream stages
         are unchanged and outputs are identical (asserted in tests).

    Output rows equal ``sidecar_dataset``'s (order aside) — asserted in
    tests on corpora with duplicate payloads and distinct captions.
    """
    from zlib import crc32

    import pandas as pd

    import ray
    import ray.data as rd  # noqa: F401  (type context)

    def reps(batch: pa.Table) -> pa.Table:
        digests = _digest_batch(batch.column("bytes"))
        first = (~pd.Series(digests).duplicated()).to_numpy()
        sub = batch.filter(pa.array(first))
        d = digests[first]
        part = np.array([crc32(x.encode()) % num_parts for x in d], dtype=np.int64)
        return sub.append_column("dpart", pa.array(part, pa.int64()))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        sha1 = hashlib.sha1
        # direct comprehension over the values (no Series.map lambda
        # dispatch); raw .digest() — the hash is only a dedup key here
        d = [sha1(b or b"").digest() for b in g["bytes"].to_numpy()]
        return g.loc[~pd.Series(d).duplicated().to_numpy()].drop(columns=["dpart"])

    uniq = (
        images_ds.map_batches(reps, batch_format="pyarrow",
                              batch_size=batch_size, zero_copy_batch=True)
        .groupby("dpart")
        .map_groups(keep_first, batch_format="pandas")
    )
    reg = __import__("sidecar.detect.protocol",
                     fromlist=["protocol"]).snapshot()

    def extract_with_registry(b: pa.Table) -> pa.Table:
        return extract_sidecar_batch(b, registry=reg)

    meta = (uniq.map_batches(extract_with_registry, batch_format="pyarrow",
                             batch_size=batch_size, zero_copy_batch=True)
            .select_columns(list(PAYLOAD_DERIVED_COLS)))
    if broadcast == "auto":
        meta = meta.materialize()
        broadcast = meta.size_bytes() <= DIGEST_META_BROADCAST_MAX_BYTES

    if not broadcast:
        return _dedup_digest_join(images_ds, meta, batch_size=batch_size,
                                  num_parts=num_parts)

    lookup: dict[str, dict] = {}
    for b in meta.iter_batches(batch_format="pyarrow", batch_size=None):
        tbl = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for row in tbl.to_pylist():
            lookup[row["payload_digest"]] = row
    lookup_ref = ray.put(lookup)

    def assemble(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        digests = _digest_batch(batch.column("bytes"))
        return _assemble_from_lookup(batch, digests, lk)

    return images_ds.map_batches(assemble, batch_format="pyarrow",
                                 batch_size=batch_size, zero_copy_batch=True)


def _dedup_digest_join(images_ds, meta, *, batch_size: int, num_parts: int):
    """``sidecar_dataset_dedup_digest`` step 4 at metadata-outgrows-broadcast
    scale: tagged-union co-partition join on payload_digest (same pattern as
    ``_tfidf_topk_partitioned`` / the relational large×large join).

    The original rows ship WITHOUT their payload bytes — the row side is
    (digest, image_id, url, ts, caption, passthrough) only, hashed to the
    same crc32 partition as the metadata rows; the per-partition group then
    assembles via a partition-local digest dict.  Nothing corpus-sized is
    ever on the driver, and the only payload-byte shuffle remains step 2's
    keep-first (one representative per surviving candidate)."""
    src = images_ds.schema().base_schema
    passthrus = [c for c in ("part", "lineno", "concurrent_id", "warcinfo_id")
                 if c in src.names]
    id_type = src.field("image_id").type
    caption_type = src.field("caption").type
    url_type = src.field("url").type if "url" in src.names else pa.string()
    ts_type = src.field("ts").type if "ts" in src.names else pa.string()
    has_url, has_ts = "url" in src.names, "ts" in src.names

    META_FIELDS = [
        ("mime_fido", pa.string()), ("mime_magic", pa.string()),
        ("puid", pa.string()), ("charset", schemas.CHARSET_T),
        ("languages", schemas.LANGUAGES_T), ("soft404", pa.float64()),
        ("phash", pa.int64()), ("w", pa.int32()), ("h", pa.int32()),
        ("fmt", pa.string()), ("is_text", pa.bool_()),
    ]
    union_schema = pa.schema(
        [("dpart", pa.int64()), ("is_meta", pa.bool_()),
         ("payload_digest", pa.string()), ("image_id", id_type),
         ("url", url_type), ("ts", ts_type), ("caption", caption_type)]
        + META_FIELDS
        + [(c, src.field(c).type) for c in passthrus])

    def _part(digs) -> pa.Array:
        # digests are 'sha1:<hex>' — already uniform hashes, so the partition
        # key comes from their OWN first 8 hex chars (chars 5:13), the same
        # content-hash-prefix convention as dedup.fp_rows_batch: no per-row
        # re-hashing, and one convention shared by row_rows and meta_rows
        return pa.array(
            np.array([int(d[5:13], 16) % num_parts for d in digs],
                     dtype=np.int64), pa.int64())

    def row_rows(batch: pa.Table) -> pa.Table:
        digests = _digest_batch(batch.column("bytes"))
        n = batch.num_rows
        cols = {
            "dpart": _part(digests),
            "is_meta": pa.array(np.zeros(n, dtype=bool)),
            "payload_digest": pa.array(digests, pa.string()),
            "image_id": batch.column("image_id"),
            "url": batch.column("url") if has_url else pa.nulls(n, url_type),
            "ts": batch.column("ts") if has_ts else pa.nulls(n, ts_type),
            "caption": batch.column("caption"),
        }
        for nm, t in META_FIELDS:
            cols[nm] = pa.nulls(n, t)
        for c in passthrus:
            cols[c] = batch.column(c)
        return pa.table(cols, schema=union_schema)

    def meta_rows(batch: pa.Table) -> pa.Table:
        digs = batch.column("payload_digest").to_pylist()
        n = batch.num_rows
        cols = {
            "dpart": _part(digs),
            "is_meta": pa.array(np.ones(n, dtype=bool)),
            "payload_digest": batch.column("payload_digest"),
            "image_id": pa.nulls(n, id_type),
            "url": pa.nulls(n, url_type),
            "ts": pa.nulls(n, ts_type),
            "caption": pa.nulls(n, caption_type),
        }
        for nm, t in META_FIELDS:
            cols[nm] = batch.column(nm)
        for c in passthrus:
            cols[c] = pa.nulls(n, src.field(c).type)
        return pa.table(cols, schema=union_schema)

    def join_group(g: pa.Table) -> pa.Table:
        is_meta = g.column("is_meta").combine_chunks()
        meta_t = g.filter(is_meta)
        rows_t = g.filter(pc.invert(is_meta))
        lk = {r["payload_digest"]: r
              for r in meta_t.select(list(PAYLOAD_DERIVED_COLS)).to_pylist()}
        digests = rows_t.column("payload_digest").to_pylist()
        return _assemble_from_lookup(rows_t, digests, lk)

    union = (meta.map_batches(meta_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
             .union(images_ds.map_batches(row_rows, batch_format="pyarrow",
                                          batch_size=batch_size,
                                          zero_copy_batch=True)))
    return union.groupby("dpart").map_groups(join_group,
                                             batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Reference-conformance serializers (golden-file form only; data stays Arrow)
# ---------------------------------------------------------------------------

MIME_TITLE = "Identified-Payload-Type:"
PUID_TITLE = "Preservation-Identifier:"
CHARSET_TITLE = "Charset-Detected:"
LANGUAGE_TITLE = "Languages-cld2:"
SOFT404_TITLE = "Soft-404-Detected:"


def _lang_struct_to_ref(d: dict | None) -> dict | None:
    if d is None:
        return None
    return {
        "reliable": d["reliable"],
        "text-bytes": d["text_bytes"],
        "languages": [
            {
                "name": x["name"],
                "code": x["code"],
                "text-covered": x["text_covered"],
                "score": x["score"],
            }
            for x in d["languages"]
        ],
    }


def sidecar_row_to_payload(row: dict) -> str:
    """SIDECAR row → the reference's newline-joined 'Title: value' payload
    (create_string_payload, warc_metadata_sidecar.py:151-164), including the
    skip rules: charset needs truthy encoding, soft404 uses ``is not None``."""
    mime_dict = {}
    if row.get("mime_fido"):
        mime_dict["fido"] = row["mime_fido"]
    if row.get("mime_magic"):
        mime_dict["python-magic"] = row["mime_magic"]
    payload = []
    if mime_dict:
        payload.append(f"{MIME_TITLE} {json.dumps(mime_dict)}")
    if row.get("puid"):
        payload.append(f"{PUID_TITLE} {row['puid']}")
    cs = row.get("charset")
    if cs and cs.get("encoding"):
        payload.append(
            f"{CHARSET_TITLE} "
            + json.dumps({"encoding": cs["encoding"], "confidence": cs["confidence"]})
        )
    lang = _lang_struct_to_ref(row.get("languages"))
    if lang:
        payload.append(f"{LANGUAGE_TITLE} {json.dumps(lang)}")
    if row.get("soft404") is not None:
        payload.append(f"{SOFT404_TITLE} {row['soft404']}")
    return "\n".join(payload)


def create_warcinfo_payload(new_file: str, operator=None, publisher=None) -> dict:
    """Run manifest analog of the reference warcinfo payload
    (create_warcinfo_payload, warc_metadata_sidecar.py:134-148); hostname/ip
    pinned to deterministic values (no sockets in tests)."""
    payload = {
        "software": "sidecar-ray/0.1.0",
        "hostname": "localhost",
        "ip": "127.0.0.1",
        "conformsTo": "http://bibnum.bnf.fr/WARC/WARC_ISO_28500_version1_latestdraft.pdf",
        "description": "WARC metdata sidecar for " + new_file,  # sic — reference typo kept (:142)
    }
    if publisher:
        payload["publisher"] = publisher
    if operator:
        payload["operator"] = operator
    return payload
