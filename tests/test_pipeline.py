"""End-to-end sidecar pipeline contracts, ported from the reference's e2e
fixtures (tests/test_warc_metadata_sidecar.py:109-233) to table form
(FIXTURES.md §3)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from sidecar import pipeline, schemas, synth


def _run(table: pa.Table) -> pa.Table:
    ds = pipeline.sidecar_dataset(rd.from_arrow(table))
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    out = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in batches]
    )
    return out.combine_chunks()


def test_e2e_text_row():
    # ≈ text.warc (:118-142): html response → mime, charset, language, soft404
    cap = "the cat and the dog went to the page and said this was that"
    t = pa.Table.from_pylist(
        [{
            "image_id": "t1",
            "bytes": f"<!DOCTYPE html><html><body>{cap}</body></html>".encode(),
            "w": 0, "h": 0, "fmt": "html", "caption": cap, "phash": 0,
        }],
        schema=synth.IMAGES_SCHEMA,
    )
    row = _run(t).to_pylist()[0]
    assert row["mime_magic"] == "text/html" and row["puid"] == "fmt/471"
    assert row["charset"]["encoding"] == "ascii"
    assert row["languages"]["languages"][0]["code"] == "en"
    assert row["soft404"] is not None and row["is_text"]


def test_e2e_image_row_never_runs_text_detectors():
    # ≈ gif.warc (:155-175): image → charset/languages/soft404 must be null
    t = synth.make_images_table(40, seed=7)
    out = _run(t)
    for row in out.to_pylist():
        if row["fmt"] in ("png", "ppm", "b16"):
            assert row["charset"] is None
            assert row["languages"] is None
            assert row["soft404"] is None


def test_e2e_empty_payload_skipped():
    # ≈ the reference's empty-payload skip (:213-215)
    t = pa.Table.from_pylist(
        [
            {"image_id": "e", "bytes": b"", "w": 0, "h": 0, "fmt": "text",
             "caption": "", "phash": 0},
            {"image_id": "ok", "bytes": b"some text", "w": 0, "h": 0,
             "fmt": "text", "caption": "", "phash": 0},
        ],
        schema=synth.IMAGES_SCHEMA,
    )
    out = _run(t)
    assert out.num_rows == 1 and out.to_pylist()[0]["image_id"] == "ok"


def test_digest_dedup_same_metadata():
    # ≈ digest_multiples.warc (:199-233): identical payloads → identical
    # metadata rows (compute-once semantics; deterministic detectors make
    # recompute == cache hit)
    body = b"<!DOCTYPE html><html>the page was not found sorry</html>"
    rows = [
        {"image_id": f"d{i}", "bytes": body, "w": 0, "h": 0, "fmt": "html",
         "caption": "", "phash": 0}
        for i in range(5)
    ]
    out = _run(pa.Table.from_pylist(rows, schema=synth.IMAGES_SCHEMA)).to_pylist()
    assert len(out) == 5
    assert len({r["payload_digest"] for r in out}) == 1
    first = {k: v for k, v in out[0].items() if k != "image_id"}
    for r in out[1:]:
        assert {k: v for k, v in r.items() if k != "image_id"} == first


def test_golden_payload_serialization():
    # ≈ warc.warc.meta.gz golden (F10, :151-164) — exact text form with the
    # skip rules (no charset line when encoding falsy, soft404 only when set)
    cap = "the cat and the dog"
    t = pa.Table.from_pylist(
        [{"image_id": "g", "bytes": f"<html><body>{cap} page not found</body></html>".encode(),
          "w": 0, "h": 0, "fmt": "html", "caption": cap, "phash": 0}],
        schema=synth.IMAGES_SCHEMA,
    )
    row = _run(t).to_pylist()[0]
    payload = pipeline.sidecar_row_to_payload(row)
    lines = payload.split("\n")
    assert lines[0].startswith("Identified-Payload-Type: {\"fido\": \"text/html\"")
    assert lines[1] == "Preservation-Identifier: fmt/96"
    assert lines[2].startswith("Charset-Detected: {\"encoding\": \"ascii\"")
    assert lines[3].startswith("Languages-cld2: {\"reliable\":")
    assert lines[4].startswith("Soft-404-Detected: 0.8")
    # image rows: mime lines only
    img = synth.make_row("imgx", seed=1)
    while img["fmt"] not in ("png", "ppm"):
        img = synth.make_row(img["image_id"] + "x", seed=1)
    out = _run(pa.Table.from_pylist([img], schema=synth.IMAGES_SCHEMA)).to_pylist()[0]
    p2 = pipeline.sidecar_row_to_payload(out)
    assert "Charset-Detected" not in p2 and "Soft-404" not in p2
    assert "Identified-Payload-Type" in p2


def test_sidecar_schema_stable():
    out = _run(synth.make_images_table(10, seed=3))
    assert out.schema.names == schemas.SIDECAR.names


def test_determinism_across_parallelism(images_table):
    # same table through 1 block vs 8 blocks → identical sorted output
    a = _run(images_table).sort_by("image_id")
    b_ds = pipeline.sidecar_dataset(rd.from_arrow(images_table).repartition(8))
    batches = list(b_ds.iter_batches(batch_format="pyarrow"))
    b = pa.concat_tables(
        [x if isinstance(x, pa.Table) else pa.Table.from_batches([x]) for x in batches]
    ).combine_chunks().sort_by("image_id")
    assert a.equals(b)


def test_dedup_digest_plan_equals_plain_extract():
    """A3 parity: the explicit compute-once-per-digest plan produces the
    same rows as the plain per-row extraction, on a corpus with heavy exact
    payload duplication and DISTINCT captions (the per-row fields must not
    be cached along with the payload-derived ones)."""
    import pandas as pd
    import ray.data as rd

    from sidecar.pipeline import sidecar_dataset, sidecar_dataset_dedup_digest

    base = [synth.make_row(f"dd-{i % 7}", seed=7) for i in range(40)]
    rows = []
    for i, r in enumerate(base):  # same payloads, unique ids+captions
        r = dict(r)
        r["image_id"] = f"row-{i:03d}"
        r["caption"] = f"unique caption words {i} for row"
        rows.append(r)
    tbl = pa.Table.from_pylist(rows, schema=synth.IMAGES_SCHEMA)

    def norm(ds):
        df = ds.to_pandas().sort_values("image_id").reset_index(drop=True)
        for c in ("charset", "languages", "caption_languages"):
            df[c] = df[c].map(lambda v: str(v))
        return df

    a = norm(sidecar_dataset(rd.from_arrow(tbl)))
    b = norm(sidecar_dataset_dedup_digest(rd.from_arrow(tbl)))
    pd.testing.assert_frame_equal(a, b)
    assert a["payload_digest"].nunique() < len(a)  # duplication actually present

    # the metadata-outgrows-broadcast twin (step 4 = hash-partitioned join
    # on payload_digest; driver never holds the digest→metadata dict) emits
    # identical rows — exercised both via broadcast=False and via the auto
    # gate forced to 0 bytes
    c = norm(sidecar_dataset_dedup_digest(rd.from_arrow(tbl), broadcast=False))
    pd.testing.assert_frame_equal(a, c[a.columns.tolist()] if
                                  list(c.columns) != list(a.columns) else c)

    from sidecar import pipeline as pl
    orig = pl.DIGEST_META_BROADCAST_MAX_BYTES
    try:
        pl.DIGEST_META_BROADCAST_MAX_BYTES = 0
        d = norm(sidecar_dataset_dedup_digest(rd.from_arrow(tbl)))
    finally:
        pl.DIGEST_META_BROADCAST_MAX_BYTES = orig
    pd.testing.assert_frame_equal(a, d[a.columns.tolist()] if
                                  list(d.columns) != list(a.columns) else d)


def test_extract_tolerates_null_payload():
    """A NULL bytes cell counts as empty payload (dropped by F3) instead of
    poisoning the boolean masks with None."""
    import pyarrow as pa

    from sidecar.pipeline import extract_sidecar_batch

    batch = pa.table({
        "image_id": pa.array(["a", "b"], pa.string()),
        "bytes": pa.array([b"hello world text", None], pa.binary()),
        "w": pa.array([0, 0], pa.int32()),
        "h": pa.array([0, 0], pa.int32()),
        "fmt": pa.array(["text", "text"], pa.string()),
        "caption": pa.array(["hi", "yo"], pa.string()),
        "phash": pa.array([0, 0], pa.int64()),
    })
    out = extract_sidecar_batch(batch)
    assert out.num_rows == 1
    assert out.column("image_id").to_pylist() == ["a"]


def test_flagship_memo_parity():
    """memoize_flagship serves the SAME rows as the uncached plan (bench-only
    cache, VERDICT r4 #5); memo cleared afterwards so other tests see the
    uncached plan."""
    from sidecar import flagship as fsmod

    sf = "/root/testdata/sf0.001"
    try:
        fresh = (pa.concat_tables(
            fsmod.flagship(sf).iter_batches(batch_format="pyarrow",
                                            batch_size=None))
            .combine_chunks().sort_by("image_id"))
        handle = fsmod.memoize_flagship(sf)
        assert fsmod.flagship(sf) is handle          # served from the memo
        memod = (pa.concat_tables(
            fsmod.flagship(sf).iter_batches(batch_format="pyarrow",
                                            batch_size=None))
            .combine_chunks().sort_by("image_id"))
        assert fresh.equals(memod)
    finally:
        fsmod.invalidate_flagship_memo()
