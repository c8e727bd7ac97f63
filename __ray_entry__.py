"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the sidecar package) calls ``ray.init()`` / ``ray.shutdown()``.

Hash-stability rules used throughout (see sidecar/ops/*):
- float aggregates emitted as integer cents (round(x*100)::BIGINT) in both
  engines — float round() differs at the last ulp between engines;
- hash-valued columns are md5 hex strings / bitstrings (never uint64);
- timestamps compared as epoch-microsecond int64;
- ANN / near-dup results return int id columns only.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from sidecar.storage import read_parquet_clean

# Shared CTE prefix for the shingle-based dedup oracles: word-3-gram
# shingles from single-space tokenization (identical to sidecar.ops.dedup).
_SHINGLES_CTE = """
toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i))
"""

_MINHASH_CTE = _SHINGLES_CTE + """,
mh AS (SELECT doc_id, p, min(md5(p::VARCHAR || '|' || s)) AS mh
       FROM sh, unnest(generate_series(0, 7)) AS t(p) GROUP BY doc_id, p)
"""


def _scratch_dir(tag: str) -> str:
    """Per-PROCESS scratch dir under a fixed parent: concurrent invocations
    (bench + pytest, or two drivers) each get their own tree, so one run's
    rmtree can never delete parquet/Lance files another lazily-built Dataset
    is still reading.  No leak either: siblings whose owning pid is dead are
    removed, and this process's own dir is recreated fresh."""
    import os
    import shutil

    parent = f"/tmp/graft_{tag}"
    os.makedirs(parent, exist_ok=True)
    mine = os.path.join(parent, f"pid{os.getpid()}")
    for d in os.listdir(parent):
        full = os.path.join(parent, d)
        if full == mine:
            continue
        pid = d.removeprefix("pid")
        alive = False
        if pid.isdigit():
            try:
                os.kill(int(pid), 0)  # portable liveness probe (no signal)
                alive = True
            except ProcessLookupError:
                alive = False
            except PermissionError:  # exists, owned by someone else
                alive = True
        if not alive:
            shutil.rmtree(full, ignore_errors=True)
    shutil.rmtree(mine, ignore_errors=True)
    return mine


def _synth_url_ts(doc_ids) -> tuple[list[str], list[str]]:
    """doc_id → (url, ts14) with SURT-exercising features (mixed case, www
    prefix, non-default port, unsorted query); SQL-reproducible."""
    urls = [
        f"https://{'www.' if x % 8 == 0 else ''}Example{x % 10}.COM"
        f"{':8080' if x % 9 == 0 else ''}/Path/{x}?b=2&a=1"
        for x in doc_ids
    ]
    tss = [str(20210301000000 + int(x)) for x in doc_ids]
    return urls, tss


def _synth_cdxj_sidecar(batch, *, only_meta: bool = False):
    """doc_id → deterministic SIDECAR-shaped rows exercising every CDXJ
    serialization/merge quirk (present-if-found keys, magic-preferred mime,
    charset truthy-skip, alpha-3 skip of codes with no 3-letter form,
    soft-404 0.0 dropped at merge).  Field rules are pure doc_id arithmetic
    so the DuckDB oracle can rebuild the exact JSON strings."""
    import numpy as np
    import pyarrow as pa

    from sidecar import schemas

    d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    if only_meta:  # rows the meta CDXJ covers; x%7==0 stays unmatched
        d = d[(d % 7) != 0]
    urls, tss = _synth_url_ts(d)
    en = {"name": "ENGLISH", "code": "en", "text_covered": 99, "score": 1200.0}
    xx = {"name": "UNKNOWN", "code": "xx", "text_covered": 1, "score": 10.0}
    ja = {"name": "Japanese", "code": "ja", "text_covered": 95, "score": 800.0}
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "ts": pa.array(tss, pa.string()),
        "mime_fido": pa.array(
            ["text/html" if x % 3 == 0 else None for x in d], pa.string()),
        "mime_magic": pa.array(
            ["text/plain" if x % 2 == 0 else None for x in d], pa.string()),
        "puid": pa.array(
            [f"fmt/{x % 50}" if x % 4 != 0 else None for x in d], pa.string()),
        "charset": pa.array(
            [{"encoding": "utf-8", "confidence": 0.5} if x % 2 == 0 else None
             for x in d], type=schemas.CHARSET_T),
        "languages": pa.array(
            [{"reliable": True, "text_bytes": 100 + int(x % 7),
              "languages": [en, xx] if x % 6 == 0 else [ja]}
             if x % 3 == 0 else None for x in d], type=schemas.LANGUAGES_T),
        "soft404": pa.array(
            [0.0 if x % 5 == 0 else (0.5 if x % 5 == 1 else None) for x in d],
            pa.float64()),
    })


def _synth_meta_sidecar(batch):
    return _synth_cdxj_sidecar(batch, only_meta=True)


# Shared SQL prefix rebuilding _synth_url_ts + the SURT of those urls.
_SYNTH_URL_CTE = """
u AS (SELECT doc_id AS x,
             'https://' || CASE WHEN doc_id % 8 = 0 THEN 'www.' ELSE '' END
               || 'Example' || (doc_id % 10)::VARCHAR || '.COM'
               || CASE WHEN doc_id % 9 = 0 THEN ':8080' ELSE '' END
               || '/Path/' || doc_id::VARCHAR || '?b=2&a=1' AS url,
             'com,example' || (doc_id % 10)::VARCHAR
               || CASE WHEN doc_id % 9 = 0 THEN ':8080' ELSE '' END
               || ')/path/' || doc_id::VARCHAR || '?a=1&b=2' AS surt,
             (20210301000000 + doc_id)::VARCHAR AS ts
      FROM documents)
"""

# The CDXJ JSON fragments of _synth_cdxj_sidecar, serialized exactly as
# sidecar_row_to_cdxj_json / json.dumps does (key order, ', ' separators).
_SYNTH_FRAG_CTE = _SYNTH_URL_CTE + """,
frag AS (SELECT x, url, surt, ts,
    CASE WHEN x % 3 = 0 AND x % 2 = 0 THEN
           '"Identified-Payload-Type": {"fido": "text/html", "python-magic": "text/plain"}'
         WHEN x % 3 = 0 THEN '"Identified-Payload-Type": {"fido": "text/html"}'
         WHEN x % 2 = 0 THEN '"Identified-Payload-Type": {"python-magic": "text/plain"}'
    END AS f_ipt,
    CASE WHEN x % 4 <> 0 THEN
           '"Preservation-Identifier": "fmt/' || (x % 50)::VARCHAR || '"'
    END AS f_puid,
    CASE WHEN x % 2 = 0 THEN
           '"Charset-Detected": {"encoding": "utf-8", "confidence": 0.5}'
    END AS f_cs,
    CASE WHEN x % 6 = 0 THEN
           '"Languages-cld2": {"reliable": true, "text-bytes": '
             || (100 + x % 7)::VARCHAR
             || ', "languages": [{"name": "ENGLISH", "code": "en", "text-covered": 99, "score": 1200.0}, {"name": "UNKNOWN", "code": "xx", "text-covered": 1, "score": 10.0}]}'
         WHEN x % 3 = 0 THEN
           '"Languages-cld2": {"reliable": true, "text-bytes": '
             || (100 + x % 7)::VARCHAR
             || ', "languages": [{"name": "Japanese", "code": "ja", "text-covered": 95, "score": 800.0}]}'
    END AS f_lang,
    CASE WHEN x % 5 = 0 THEN '"Soft-404-Detected": 0.0'
         WHEN x % 5 = 1 THEN '"Soft-404-Detected": 0.5'
    END AS f_s404
    FROM u)
"""


# crawl_sql_exact's shared configuration: the Ray crawl, the DuckDB replay
# and the pytest 3-way contract all read THIS dict (scaled up in round 4 per
# VERDICT #4: ~10^3 fetched rows, 16 hosts, budget 24, hot host at 60% of
# link traffic so the budget stage's skew handling and the multi-shard seen
# set run at non-toy cardinality).  Exactness precondition: every URL the
# crawl can rank must carry a DISTINCT priority within its host (the
# engine's url_hash tie-break is blake2b, not SQL-computable) — asserted
# for this config by test_md5_graph_priorities_tie_free.
_CRAWL_SQL_CFG = dict(n_seeds=400, n_hosts=16, budget_per_host=24,
                      max_epochs=3, max_depth=3, seed=42, graph="md5",
                      hot_frac=6)


def _crawl_exact_sql(n_seeds: int, n_hosts: int, budget_per_host: int,
                     seed: int, hot_frac: int, max_epochs: int = 3,
                     max_depth: int = 3, **_ignored) -> str:
    """The full crawl loop (dedup → seen anti-join → robots → per-host
    budget top-k → fetch) replayed in pure SQL over the md5 graph —
    parameterized template of the round-3 hand-expanded query.  Valid for
    max_epochs <= 3 seeded at depth 0 (depth can reach at most epochs-1 <
    max_depth=3, so the Ray side's depth gate never binds and the SQL needs
    no depth filter)."""
    H, S, B, HOT = n_hosts, n_seeds, budget_per_host, hot_frac
    E = max_epochs
    if E > 3:  # not assert: must survive python -O
        raise ValueError("template models <=3 epochs (no depth-gate CTE)")
    if max_depth < E:
        # the template has NO depth-gate CTE: it is exact only while the Ray
        # crawl's depth gate never binds, i.e. max_depth >= max_epochs
        # (depth reaches at most epochs-1).  A smaller max_depth would make
        # the replay silently diverge — refuse instead.
        raise ValueError(
            f"template requires max_depth >= max_epochs "
            f"(got max_depth={max_depth} < max_epochs={E}): the SQL has no "
            f"depth-gate CTE, the Ray crawl would prune deeper links")
    sep = "|| chr(31) ||"
    host_expr = (f"CASE WHEN rj % 10 < {HOT} THEN 'hot.example.com' "
                 f"ELSE printf('host%02d.example.com', (1 + rj % {H - 1})::INT) END")
    parts = [f"""
        WITH hostlist AS (
          SELECT CASE WHEN i = 0 THEN 'hot.example.com'
                      ELSE printf('host%02d.example.com', i::INT) END AS host
          FROM generate_series(0, {H - 1}) t(i)),
        robr AS (
          SELECT host,
                 (r % 4 = 0) AS has_rules,
                 (r % 10)::VARCHAR AS d,
                 ((r >> 4) % 2 = 0) AS has_allow,
                 ((r >> 5) % 4 = 0) AS anchored
          FROM (SELECT host,
                       md5_number_upper('{seed}' {sep} 'robots'
                                        {sep} host) AS r
                FROM hostlist)),
        seeds AS (
          SELECT i AS seed_id,
                 md5_number_upper('{seed}' {sep} 'seed'
                                  {sep} i::VARCHAR) AS r
          FROM generate_series(0, {S - 1}) t(i)),
        c0 AS (
          SELECT 'https://' || host || '/seed/' || seed_id::VARCHAR AS url,
                 'http://' || host || '/seed/' || seed_id::VARCHAR AS canon,
                 host, 0 AS depth, seed_id, NULL::VARCHAR AS pid
          FROM (SELECT seed_id,
                       CASE WHEN r % {H} = 0 THEN 'hot.example.com'
                            ELSE printf('host%02d.example.com',
                                        (r % {H})::INT) END AS host
                FROM seeds)),
        c0p AS (
          SELECT *, (md5_number_upper('{seed}' {sep} 'prio'
                                      {sep} url)
                     % 1000000000) / 1e9 AS priority
          FROM c0),
        r0 AS (
          SELECT *, row_number() OVER (
              PARTITION BY host
              ORDER BY priority DESC, depth, seed_id, url) AS rn
          FROM c0p),
        sel0 AS (SELECT url, canon, host, depth, seed_id, pid, priority
                 FROM r0 WHERE rn <= {B}),
        left0 AS (SELECT url, canon, host, depth, seed_id, pid, priority
                  FROM r0 WHERE rn > {B})"""]
    for e in range(1, E):
        p = e - 1
        seen_union = "\n                              UNION ALL ".join(
            f"SELECT url FROM sel{i}" for i in range(e))
        parts.append(f""",
        l{p} AS (
          SELECT seed_id, depth + 1 AS depth,
                 md5_number_upper('{seed}' {sep} 'link' {sep}
                                  canon {sep} j::VARCHAR) AS rj
          FROM (SELECT canon, depth, seed_id,
                       (md5_number_upper('{seed}' {sep} 'links'
                                         {sep} canon)
                        % 9)::BIGINT AS fan
                FROM sel{p}),
               generate_series(0, 8) g(j)
          WHERE j < fan),
        links{p} AS (
          SELECT 'https://' || host || '/page/' || pid AS url,
                 'http://' || host || '/page/' || pid AS canon,
                 host, depth, seed_id, pid
          FROM (SELECT seed_id, depth,
                       {host_expr} AS host,
                       (CASE WHEN (rj >> 8) % 10 < 3 THEN rj % 40
                             ELSE rj % 100000 END)::VARCHAR AS pid
                FROM l{p})),
        c{e}p AS (
          SELECT *, (md5_number_upper('{seed}' {sep} 'prio'
                                      {sep} url)
                     % 1000000000) / 1e9 AS priority
          FROM (SELECT url, canon, host, depth, seed_id, pid FROM links{p}
                UNION ALL
                SELECT url, canon, host, depth, seed_id, pid FROM left{p})),
        d{e} AS (
          SELECT * FROM c{e}p
          QUALIFY row_number() OVER (
              PARTITION BY url
              ORDER BY priority DESC, depth, seed_id) = 1),
        a{e} AS (
          SELECT c.* FROM d{e} c JOIN robr r USING (host)
          WHERE c.url NOT IN ({seen_union})
            AND (c.pid IS NULL OR NOT (r.has_rules AND
                 (CASE WHEN r.anchored THEN c.pid = r.d
                       ELSE starts_with(c.pid, r.d)
                            AND NOT (r.has_allow
                                     AND starts_with(c.pid, r.d || '0'))
                  END))))""")
        if e < E - 1:
            parts.append(f""",
        r{e} AS (
          SELECT *, row_number() OVER (
              PARTITION BY host
              ORDER BY priority DESC, depth, seed_id, url) AS rn
          FROM a{e}),
        sel{e} AS (SELECT url, canon, host, depth, seed_id, pid, priority
                   FROM r{e} WHERE rn <= {B}),
        left{e} AS (SELECT url, canon, host, depth, seed_id, pid, priority
                    FROM r{e} WHERE rn > {B})""")
        else:
            parts.append(f""",
        sel{e} AS (
          SELECT url, canon FROM a{e}
          QUALIFY row_number() OVER (
              PARTITION BY host
              ORDER BY priority DESC, depth, seed_id, url) <= {B})""")
    finals = "\n        UNION ALL ".join(
        f"SELECT url, canon{' AS url_canon' if i == 0 else ''}, "
        f"{i}::BIGINT{' AS epoch' if i == 0 else ''} FROM sel{i}"
        for i in range(E))
    parts.append(f"\n        {finals}\n    ")
    return "".join(parts)


def _image_rows_only(batch):
    """Keep only decodable image rows (codecs.IMAGE_FMTS) of an IMAGES batch."""
    import pyarrow as pa
    import pyarrow.compute as pc_

    from sidecar.codecs import IMAGE_FMTS

    mask = pc_.is_in(batch.column("fmt"),
                     value_set=pa.array(sorted(IMAGE_FMTS)))
    return batch.filter(mask)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0.

    documents → deterministic image+caption rows (synthetic fetcher) →
    sidecar extraction (mime+puid, charset, language, soft-404, phash/w/h/fmt)
    as one vectorized map_batches over zero-copy Arrow.
    """
    from sidecar.flagship import flagship

    return flagship("/root/testdata/sf0.001")


# Oracle-backed queries deliberately parked OUTSIDE the driver's 50-row
# CORRECTNESS window.  Empty since round 4: the four trivial relational
# rows (union / except / systematic sample / distinct count) are merged
# into the single rel_setops_combo row, so ALL oracle-backed queries fit
# the window and the driver gate retains full oracle coverage (ADVICE r3).
_TAIL_ORACLES: tuple = ()
_DRIVER_WINDOW = 50


# rows-only entries promoted to the FRONT of the post-window tail: if the
# driver's snapshot window ever grows past _DRIVER_WINDOW, the live-detector
# pipelines gain rows-only driver evidence first (VERDICT r3 residual #3)
_TAIL_PRIORITY = ("sidecar_extract", "multimodal_image_stats", "crawl_demo")


def _driver_order(qs: dict) -> dict:
    """Reorder queries so every oracle-backed entry (minus the declared
    ``_TAIL_ORACLES``) lands inside the driver's ``_DRIVER_WINDOW``-row
    CORRECTNESS snapshot; rows-only entries follow, ``_TAIL_PRIORITY``
    first (VERDICT r2 #1, r3 residual #3)."""
    with_oracle = set(oracle_sql())
    head = [k for k in qs if k in with_oracle and k not in _TAIL_ORACLES]
    if len(head) > _DRIVER_WINDOW:  # not assert: must survive python -O
        raise ValueError(
            f"{len(head)} oracle-backed queries exceed the driver's "
            f"{_DRIVER_WINDOW}-row window; park more in _TAIL_ORACLES")
    taken = set(head)
    tail = [k for k in _TAIL_PRIORITY if k in qs and k not in taken]
    taken.update(tail)
    return {k: qs[k] for k in head + tail
            + [k for k in qs if k not in taken]}


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus the
    training-data operator families (dedup / similarity / text / multimodal).
    Each callable takes ``sf_dir`` and returns a Dataset / DataFrame / Table.

    Ordering contract: the driver snapshots only the first 50 entries into
    CORRECTNESS_r{N}.json, so ``_driver_order`` puts every oracle-backed
    entry inside that window (enforced by tools/validate_queries.py).
    """
    from sidecar.flagship import flagship, images_dataset
    from sidecar.ops import dedup, multimodal, prep, relational, similarity, text

    def sidecar_extract(sf_dir: str):
        # drop the binary payload column for the rows-only check
        return flagship(sf_dir).drop_columns(["charset", "languages",
                                              "caption_languages"])

    def sidecar_extract_dedup(sf_dir: str):
        """The explicit A3 compute-once-per-digest plan (groupby payload
        digest → extract distinct payloads → broadcast metadata back);
        row-equal to sidecar_extract (asserted in tests)."""
        from sidecar.pipeline import sidecar_dataset_dedup_digest

        return sidecar_dataset_dedup_digest(images_dataset(sf_dir)) \
            .drop_columns(["charset", "languages", "caption_languages"])

    def cdxj_project(sf_dir: str):
        from sidecar.cdxj import cdxj_from_sidecar

        return cdxj_from_sidecar(flagship(sf_dir))

    def mm_image_stats(sf_dir: str):
        return multimodal.image_decode_stats(
            images_dataset(sf_dir).map_batches(
                _image_rows_only, batch_format="pyarrow", zero_copy_batch=True))

    def mm_phash_neardup(sf_dir: str):
        """Perceptual near-dup over image rows ∪ their lossy (b16)
        re-encodes: each base/re-encode pair differs by ≤7 phash bits, so the
        banded plan must recover them (verified exactly vs brute force in
        tests; rows-only here — phash of synthetic payloads isn't SQL).
        The (id, phash) manifest comes from the FUSED one-decode stage
        (fused ≡ literal base ∪ reencode plan, asserted in tests)."""
        base = images_dataset(sf_dir).map_batches(
            _image_rows_only, batch_format="pyarrow", zero_copy_batch=True)
        stats = multimodal.image_decode_stats_with_b16(base)
        return multimodal.phash_neardup(None, stats_ds=stats)

    def mm_phash_components(sf_dir: str):
        """Cluster assembly over the perceptual pair graph (rows-only; the
        base ∪ re-encode construction guarantees every base/re-encode pair
        lands in one component — asserted exactly in tests)."""
        base = images_dataset(sf_dir).map_batches(
            _image_rows_only, batch_format="pyarrow", zero_copy_batch=True)
        stats = multimodal.image_decode_stats_with_b16(base)
        return multimodal.phash_components(None, stats_ds=stats)

    def mm_audio_features(sf_dir: str):
        """Audio feature-extract PLUMBING over opaque binary payloads (the
        decode itself is a deterministic fake — no audio libs in this
        container; the actor-pool stage, schema and batch sizing are real).
        Rows-only."""
        return images_dataset(sf_dir).map_batches(
            multimodal.AudioFeatureStage,
            fn_constructor_kwargs={"fake": True},
            batch_format="pyarrow", batch_size=64, zero_copy_batch=True,
            concurrency=(1, 4))

    def mm_video_frame_sample(sf_dir: str):
        """Video frame-index sampling PLUMBING (deterministic fake decode,
        real Ray-side stage).  Rows-only."""
        return images_dataset(sf_dir).map_batches(
            multimodal.VideoFrameSample,
            fn_constructor_kwargs={"fake": True, "every_n": 30},
            batch_format="pyarrow", batch_size=64, zero_copy_batch=True,
            concurrency=(1, 4))

    def mm_image_resize(sf_dir: str):
        """Nearest-neighbor 32x32 thumbnailing through the actor-pool
        decode→resize→re-encode stage (ST8 family); returns the resized
        manifest with the payload bytes dropped for the rows-only driver
        check (pixel-exact recomposition is asserted in tests)."""
        return multimodal.image_resize(
            images_dataset(sf_dir).map_batches(
                _image_rows_only, batch_format="pyarrow",
                zero_copy_batch=True),
            out_w=32, out_h=32, concurrency=(1, 4),
        ).drop_columns(["bytes"])

    def crawl_demo(sf_dir: str):
        """Deterministic 2-epoch crawl (frontier shuffles, seen-set shards,
        politeness actors) — sf_dir-independent; returns the final URL-seen
        set as sorted hex hashes (bit-for-bit reproducible, tests assert it
        equals the single-threaded oracle's)."""
        import pyarrow as pa

        from sidecar.crawl import CrawlConfig, run_crawl

        out = _scratch_dir("crawl_demo")  # per-process, stale pids reaped
        # shard/actor counts sized to the tiny demo workload (hash
        # partitioning makes the result identical at any shard count —
        # the bit-for-bit tests run the same config at multiple levels)
        res = run_crawl(CrawlConfig(n_seeds=40, max_epochs=2, out_dir=out,
                                    num_seen_shards=2, num_policy_actors=2,
                                    num_fetch_partitions=4),
                        collect_order=False)
        return pa.table({"url_hash": pa.array([f"{h:016x}" for h in res["seen"]],
                                              pa.string())})

    def crawl_sql_exact(sf_dir: str):
        """The REAL 3-epoch crawl loop (frontier dedup → seen anti-join →
        robots filter → per-host budget top-k → fetch+sidecar parquet) over
        the SQL-reproducible md5 graph — the driver replays the ENTIRE crawl
        in DuckDB (md5_number_upper == little-endian first-8 md5 bytes, see
        synth._h_md5) and hash-compares the fetched (url, url_canon, epoch)
        set.  This is the north_rule's "reproduces the crawl ordering and
        final URL-seen set" contract as a driver-EXACT row; the blake2b twin
        (crawl_demo) stays bit-for-bit-tested in pytest."""
        import os

        import pyarrow as pa
        import pyarrow.compute as pc_

        from sidecar import storage
        from sidecar.crawl import CrawlConfig, run_crawl

        # per-process dir under a fixed parent (a bare mkdtemp per call
        # leaked one multi-MB crawl tree per bench/driver invocation; a
        # FIXED dir raced concurrent invocations)
        out = _scratch_dir("crawl_sql_exact")
        run_crawl(CrawlConfig(out_dir=out, num_seen_shards=4,
                              num_policy_actors=2, num_fetch_partitions=8,
                              **_CRAWL_SQL_CFG),
                  collect_order=False, collect_seen=False)

        def project(batch: pa.Table) -> pa.Table:
            epoch = pc_.subtract(
                pc_.cast(batch.column("ts"), pa.int64()),
                pa.scalar(20210101000000, pa.int64()))
            return pa.table({
                "url": batch.column("url"),
                "url_canon": batch.column("image_id"),
                "epoch": epoch,
            })

        cols = ["image_id", "url", "ts"]
        side = f"{out}/sidecar"
        if storage.HAVE_LANCE:  # run_crawl writes one Lance dataset per epoch
            import ray.data as rd

            epochs = [rd.read_lance(os.path.join(side, d), columns=cols)
                      for d in sorted(os.listdir(side))]
            ds = epochs[0]
            for e in epochs[1:]:
                ds = ds.union(e)
        else:
            ds = read_parquet_clean(side, columns=cols)
        return ds.map_batches(project, batch_format="pyarrow",
                              zero_copy_batch=True)

    def cdxj_merge_demo(sf_dir: str):
        """Left-outer CDXJ enrichment merge (J1): meta CDXJ from the sidecar
        pipeline joined onto an original-index CDXJ of the same URLs."""
        import json as _json

        import pyarrow as pa

        from sidecar.cdxj import merge_cdxj
        from sidecar.canon import surt

        meta = cdxj_project(sf_dir)

        def original_rows(batch: pa.Table) -> pa.Table:
            # CDXJ columns built directly (no line-serialize + re-parse
            # round trip); doc_id is the only column read
            ids = batch.column("doc_id").to_pylist()
            urls = [f"https://example.com/doc/{x}" for x in ids]
            return pa.table({
                "surt": pa.array([surt(u) for u in urls], pa.string()),
                "ts": pa.array(["20210101000000"] * len(ids), pa.string()),
                "json": pa.array(
                    [_json.dumps({"url": u, "status": "200"}) for u in urls],
                    pa.string()),
            })

        original = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
            original_rows, batch_format="pyarrow", zero_copy_batch=True)
        return merge_cdxj(meta, original)

    def cdxj_project_exact(sf_dir: str):
        """The real cdxj_from_sidecar projection (S5/S6 + F13 + F12 JSON
        serialization) over deterministic SQL-reproducible sidecar rows —
        the hash-exact twin of the rows-only cdxj_project (which runs over
        live detector output)."""
        from sidecar.cdxj import cdxj_from_sidecar

        side = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"]).map_batches(
            _synth_cdxj_sidecar, batch_format="pyarrow", zero_copy_batch=True)
        return cdxj_from_sidecar(side)

    def cdxj_merge_exact(sf_dir: str):
        """The real merge_cdxj left-outer enrichment (J1 + merge_cdxj.py:30-56
        quirks) with both sides deterministic: meta = projected synthetic
        sidecar rows (doc_id%7!=0 only), original = all docs.  Exercises
        magic-preferred mime, alpha-3 conversion + skip, charset encoding,
        soft-404-0.0-dropped, and unmatched passthrough — hash-exact."""
        import json as _json

        import pyarrow as pa
        import pyarrow.compute as pc_

        from sidecar.canon import surt as _surt
        from sidecar.cdxj import cdxj_from_sidecar, merge_cdxj

        docs = f"{sf_dir}/documents.parquet"
        meta = cdxj_from_sidecar(
            read_parquet_clean(docs, columns=["doc_id"]).map_batches(
                _synth_meta_sidecar, batch_format="pyarrow",
                zero_copy_batch=True))

        def original(batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_pylist()
            urls, tss = _synth_url_ts(d)
            return pa.table({
                "surt": pa.array([_surt(u) for u in urls], pa.string()),
                "ts": pa.array(tss, pa.string()),
                "json": pa.array(
                    [_json.dumps({"url": u, "status": "200"}) for u in urls],
                    pa.string()),
            })

        orig = read_parquet_clean(docs, columns=["doc_id"]).map_batches(
            original, batch_format="pyarrow", zero_copy_batch=True)

        def cast_matched(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index("matched")
            return batch.set_column(
                i, "matched", pc_.cast(batch.column("matched"), pa.int64()))

        return merge_cdxj(meta, orig).map_batches(
            cast_matched, batch_format="pyarrow", zero_copy_batch=True)

    def rel_setops_combo(sf_dir: str):
        """Four small relational ops in ONE driver row, so every
        oracle-backed query fits the 50-row CORRECTNESS window with none
        parked (ADVICE r3): UNION distinct, broadcast anti-join EXCEPT,
        systematic sample, and the two-level exact COUNT(DISTINCT).  Each
        op keeps its full result, tagged (op, k, v)."""
        import pyarrow as pa
        import pyarrow.compute as pc_
        import ray.data as rd

        def tag(op: str, kcol: str, vcol: "str | None" = None):
            def f(batch: pa.Table) -> pa.Table:
                n = batch.num_rows
                v = (batch.column(vcol) if vcol
                     else pa.array([0] * n, pa.int64()))
                return pa.table({
                    "op": pa.array([op] * n, pa.string()),
                    "k": pc_.cast(batch.column(kcol), pa.int64()),
                    "v": v,
                })
            return f

        un = relational.union_nations(sf_dir).map_batches(
            tag("union_nations", "nationkey"), batch_format="pyarrow",
            zero_copy_batch=True)
        ex = relational.except_customers(sf_dir).map_batches(
            tag("except_customers", "c_custkey"), batch_format="pyarrow",
            zero_copy_batch=True)
        sy = relational.systematic_sample(sf_dir).map_batches(
            tag("systematic_sample", "o_orderkey", "o_totalprice_cents"),
            batch_format="pyarrow", zero_copy_batch=True)
        dc_tbl = relational.distinct_count_custkey(sf_dir)
        dc = rd.from_arrow(pa.table({
            "op": pa.array(["distinct_count"], pa.string()),
            "k": dc_tbl.column("n_distinct"),
            "v": pa.array([0], pa.int64()),
        }))
        return un.union(ex).union(sy).union(dc)

    return _driver_order({
        # --- text analysis (documents) -----------------------------------
        "text_token_count": text.token_count,
        "text_quality_score": text.quality_score,
        "text_fingerprint": text.fingerprint,
        "text_lang_counts": text.lang_counts,
        "text_lang_detect": text.lang_detect,                 # rows-only (model)
        "text_token_count_regex": text.token_count_regex,
        # both token counters fused into one hash-exact driver row (the
        # window slot freed goes to multimodal_image_stats_exact); the
        # standalone entries above stay graded rows-only
        "text_token_counts_combo": text.token_counts_combo,
        "text_winnow_fingerprint": text.winnow_fingerprint,
        "text_tfidf_topk": text.tfidf_topk,
        "text_bigram_topk": text.bigram_topk,
        "text_mask_terms": text.mask_terms,
        "text_repetition_ratio": text.repetition_ratio,
        # --- dedup family ------------------------------------------------
        "dedup_exact": dedup.exact_dedup,
        "dedup_minhash_sig": dedup.minhash_signatures,
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs,
        # rows-only: the splitmix64 one-hash-many-permutations production
        # family (MINHASH_FAMILIES) — not SQL-expressible; recall of
        # injected exact dups is pytest-asserted (test_minhash_family)
        "dedup_minhash_lsh_splitmix":
            lambda sf: dedup.minhash_lsh_pairs(sf, family="splitmix64"),
        "dedup_simhash": dedup.simhash,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_embedding_cosine": dedup.embedding_near_dup,
        "dedup_embedding_lsh": dedup.embedding_near_dup_lsh,  # rows-only (approx)
        "dedup_lsh_components": dedup.lsh_components,
        "dedup_minhash_estimates": dedup.minhash_jaccard_estimates,
        "dedup_decontam": dedup.decontaminate,
        "dedup_passage": dedup.passage_dedup,
        "prep_corpus": prep.prep_corpus,
        "prep_source_balance": prep.source_balance,
        "prep_token_budget": prep.token_budget,
        "prep_pairs": lambda sf_dir: prep.prep_pairs(images_dataset(sf_dir)),
        "prep_images": lambda sf_dir: prep.prep_images(
            images_dataset(sf_dir).map_batches(
                _image_rows_only, batch_format="pyarrow", zero_copy_batch=True)),
        # --- similarity search (embeddings) ------------------------------
        "sim_ann_topk": similarity.ann_topk,
        "sim_ann_ivf": similarity.ann_topk_ivf,               # rows-only (approx)
        "sim_ann_int8_rerank": similarity.ann_topk_int8,      # rows-only (approx)
        "sim_kmeans": similarity.kmeans,                      # rows-only (iterative)
        "sim_quantize_int8": similarity.quantize_int8,        # rows-only (round ties)
        # --- relational core (groupby/join/sort/window) ------------------
        "rel_pricing_summary": relational.pricing_summary,
        "rel_top_revenue_orders": relational.top_revenue_orders,
        "rel_events_windowed": relational.events_windowed,
        "rel_customer_order_stats": relational.customer_order_stats,
        "rel_supplier_part_join": relational.supplier_part_join,
        "rel_asof_last_order": relational.asof_last_order,
        "rel_setops_combo": rel_setops_combo,
        "rel_sessionize": relational.sessionize,
        "rel_events_sliding": relational.events_sliding,
        "rel_running_totals": relational.running_totals,
        "rel_order_gaps": relational.order_gaps,
        "rel_stratified_sample": relational.stratified_sample,
        "rel_mode_segment": relational.mode_segment,
        "rel_pivot_events": relational.pivot_events,
        "rel_range_join_acctbal": relational.range_join_acctbal,
        "rel_group_topk": relational.group_topk_orders,
        "rel_nation_quantiles": relational.nation_acctbal_quantiles,
        "rel_semi_join_orders": relational.semi_join_big_orders,
        "rel_pricing_rollup": relational.pricing_rollup,
        "rel_orders_lineitem_join": relational.orders_lineitem_join,
        "rel_left_join_order_counts": relational.customers_order_counts_left,
        "rel_global_rank_sample": relational.global_rank_sample,
        "rel_small_qty_lineitems": relational.small_qty_lineitems,
        "rel_approx_distinct": relational.approx_distinct_custkey,  # rows-only (sketch)
        # --- crawl engine: driver-EXACT row (whole crawl replayed in SQL) --
        "crawl_sql_exact": crawl_sql_exact,
        # --- crawl/sidecar engine (rows-only: synthesized payload path) --
        "sidecar_extract": sidecar_extract,
        "sidecar_extract_dedup": sidecar_extract_dedup,
        "cdxj_project": cdxj_project,
        "cdxj_project_exact": cdxj_project_exact,
        "cdxj_merge": cdxj_merge_demo,
        "cdxj_merge_exact": cdxj_merge_exact,
        "multimodal_image_stats": mm_image_stats,
        # driver-exact decode twin: real codec decode over constant-gradient
        # payloads whose channel sums are closed-form in doc_id (VERDICT r4 #6)
        "multimodal_image_stats_exact": multimodal.image_stats_exact,
        "multimodal_phash_neardup": mm_phash_neardup,
        "multimodal_phash_components": mm_phash_components,
        "multimodal_audio_features": mm_audio_features,
        "multimodal_video_frame_sample": mm_video_frame_sample,
        "multimodal_image_resize": mm_image_resize,
        "crawl_demo": crawl_demo,
    })


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (views pre-registered).  Keys
    absent here (lang_detect, the approximate variants, the synthetic-payload
    pipelines) get the driver's weaker rows-only check."""
    return {
        # text_token_count + text_token_count_regex merged into the combo row
        # below (window slot freed for multimodal_image_stats_exact, r4 #6);
        # the standalone queries stay graded rows-only
        "text_token_counts_combo": r"""
            SELECT doc_id,
                   len(string_split(coalesce(text, ''), ' '))::BIGINT AS n_tokens,
                   len(regexp_extract_all(coalesce(text, ''),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens_re
            FROM documents
        """,
        "text_quality_score": """
            SELECT doc_id,
                   length(coalesce(text, ''))::BIGINT AS n_chars,
                   len(string_split(coalesce(text, ''), ' '))::BIGINT AS n_tokens,
                   (length(coalesce(text, '')) - len(string_split(coalesce(text, ''), ' ')) + 1)::DOUBLE
                       / len(string_split(coalesce(text, ''), ' ')) AS avg_token_len,
                   len(list_filter(string_split(coalesce(text, ''), ' '),
                       x -> x IN ('the','a','an','and','of','to','in','is','it',
                                  'that','this','with','for','as','on','at',
                                  'by','from')))::BIGINT AS n_stopwords,
                   len(regexp_extract_all(coalesce(text, ''),
                       '[^A-Za-z0-9 ]'))::BIGINT AS n_punct
            FROM documents
        """,
        "text_fingerprint": """
            SELECT doc_id, md5(coalesce(text, '')) AS fp FROM documents
        """,
        # The ST8 decode path's hash-exact row: the Ray side really encodes
        # (png/ppm/b16 codecs) and really decodes inside map_batches; the
        # oracle reproduces w/h/fmt and per-channel pixel sums in closed form
        # from doc_id (gradient construction in multimodal.py:
        # _gradient_images_batch; b16's v→v|1 quantization adds one per even
        # value — (h+1)//2 evens per column when base is even, h//2 when odd).
        "multimodal_image_stats_exact": """
            WITH p AS (
                SELECT doc_id AS d,
                       8 + (doc_id % 5) AS h,
                       8 + ((doc_id // 5) % 5) AS w,
                       doc_id % 200 AS br,
                       (7 * doc_id) % 200 AS bg,
                       (13 * doc_id) % 200 AS bb,
                       CASE doc_id % 3 WHEN 0 THEN 'png'
                                       WHEN 1 THEN 'ppm'
                                       ELSE 'b16' END AS fmt
                FROM documents
            )
            SELECT 'img-' || d AS image_id,
                   w::BIGINT AS w,
                   h::BIGINT AS h,
                   fmt,
                   (w * (h * br + (h * (h - 1)) // 2
                         + CASE WHEN fmt = 'b16' THEN
                             CASE WHEN br % 2 = 0 THEN (h + 1) // 2
                                  ELSE h // 2 END
                           ELSE 0 END))::BIGINT AS sum_r,
                   (w * (h * bg + (h * (h - 1)) // 2
                         + CASE WHEN fmt = 'b16' THEN
                             CASE WHEN bg % 2 = 0 THEN (h + 1) // 2
                                  ELSE h // 2 END
                           ELSE 0 END))::BIGINT AS sum_g,
                   (w * (h * bb + (h * (h - 1)) // 2
                         + CASE WHEN fmt = 'b16' THEN
                             CASE WHEN bb % 2 = 0 THEN (h + 1) // 2
                                  ELSE h // 2 END
                           ELSE 0 END))::BIGINT AS sum_b
            FROM p
        """,
        "text_lang_counts": """
            SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang
        """,
        "text_winnow_fingerprint": """
            WITH pos AS (
                SELECT doc_id, i,
                       substr(md5(substr(coalesce(text, ''), i, 5)), 1, 8) AS h,
                       length(coalesce(text, '')) AS L
                FROM documents,
                     unnest(generate_series(1, length(coalesce(text, '')) - 4)) AS t(i)
            ),
            wins AS (
                SELECT doc_id, i, L,
                       min(h) OVER (PARTITION BY doc_id ORDER BY i
                                    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
                FROM pos
            )
            SELECT DISTINCT doc_id, fp FROM wins WHERE i <= L - 8
        """,
        "text_repetition_ratio": """
            WITH toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
                          FROM documents),
            g AS (SELECT doc_id, greatest(len(w) - 2, 0) AS n,
                         CASE WHEN len(w) >= 3 THEN (
                             SELECT count(DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                             FROM unnest(generate_series(1, len(w) - 2)) AS t(i)
                         ) ELSE 0 END AS d
                  FROM toks)
            SELECT doc_id, n::BIGINT AS n_grams, d::BIGINT AS n_distinct,
                   CASE WHEN n = 0 THEN NULL
                        ELSE 1.0 - d::DOUBLE / n END AS rep_ratio
            FROM g
        """,
        "dedup_exact": """
            SELECT md5(coalesce(text, '')) AS fp,
                   min(doc_id) AS keep_doc_id,
                   count(*)::BIGINT AS n_dups
            FROM documents GROUP BY 1
        """,
        "dedup_minhash_sig": f"""
            WITH {_MINHASH_CTE}
            SELECT doc_id,
                   min(CASE WHEN p = 0 THEN mh END) AS mh0,
                   min(CASE WHEN p = 1 THEN mh END) AS mh1,
                   min(CASE WHEN p = 2 THEN mh END) AS mh2,
                   min(CASE WHEN p = 3 THEN mh END) AS mh3,
                   min(CASE WHEN p = 4 THEN mh END) AS mh4,
                   min(CASE WHEN p = 5 THEN mh END) AS mh5,
                   min(CASE WHEN p = 6 THEN mh END) AS mh6,
                   min(CASE WHEN p = 7 THEN mh END) AS mh7
            FROM mh GROUP BY doc_id
        """,
        "dedup_minhash_lsh": f"""
            WITH {_MINHASH_CTE},
            bands AS (SELECT doc_id, b, md5(string_agg(mh, '|' ORDER BY p)) AS bucket
                      FROM mh, unnest(generate_series(0, 3)) AS t(b)
                      WHERE p // 2 = b GROUP BY doc_id, b)
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        """,
        "dedup_simhash": f"""
            WITH {_SHINGLES_CTE},
            hx AS (SELECT doc_id, substr(md5(s), 1, 16) AS hex FROM sh),
            bits AS (SELECT doc_id, j,
                            ((strpos('0123456789abcdef', substr(hex, 1 + j // 4, 1)) - 1)
                              >> (3 - (j % 4))) & 1 AS bit
                     FROM hx, unnest(generate_series(0, 63)) AS t(j)),
            votes AS (SELECT doc_id, j, sum(2 * bit - 1) AS v FROM bits GROUP BY doc_id, j)
            SELECT doc_id,
                   string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
            FROM votes GROUP BY doc_id
        """,
        "dedup_ngram_jaccard": f"""
            WITH {_SHINGLES_CTE},
            cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT doc_a, doc_b, jaccard
            FROM (SELECT doc_a, doc_b,
                         i::DOUBLE / (ca.c + cb.c - i) AS jaccard
                  FROM inter
                  JOIN cnt ca ON ca.doc_id = inter.doc_a
                  JOIN cnt cb ON cb.doc_id = inter.doc_b)
            WHERE jaccard >= 0.5
        """,
        "dedup_embedding_cosine": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        """,
        "sim_ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
            s AS (SELECT q.query_id, e.vec_id,
                         list_cosine_similarity(qe, e.embedding::DOUBLE[]) AS score
                  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
            SELECT query_id, vec_id FROM s
            QUALIFY row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, vec_id) <= 10
        """,
        "rel_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity) * 100)::BIGINT AS sum_qty_cents,
                   round(sum(l_extendedprice) * 100)::BIGINT AS sum_base_price_cents,
                   round(sum(l_extendedprice * (1 - l_discount)) * 100)::BIGINT AS sum_disc_price_cents,
                   count(*)::BIGINT AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "rel_top_revenue_orders": """
            WITH rev AS (SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS r
                         FROM lineitem GROUP BY 1)
            SELECT rev.l_orderkey AS o_orderkey,
                   round(r * 100)::BIGINT AS revenue_cents, c.c_mktsegment
            FROM rev
            JOIN orders o ON o.o_orderkey = rev.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY round(r * 100)::BIGINT DESC, rev.l_orderkey
            LIMIT 20
        """,
        "rel_events_windowed": """
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) * 3600 AS win,
                   count(*)::BIGINT AS n_events,
                   round(sum(value) * 100)::BIGINT AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "rel_customer_order_stats": """
            SELECT o_custkey, count(*)::BIGINT AS n_orders,
                   min(epoch_us(o_orderdate)) AS first_date_us,
                   max(epoch_us(o_orderdate)) AS last_date_us,
                   round(sum(o_totalprice) * 100)::BIGINT AS total_price_cents
            FROM orders GROUP BY 1
        """,
        "rel_setops_combo": """
            SELECT 'union_nations' AS op, nationkey AS k, 0::BIGINT AS v
            FROM (SELECT c_nationkey AS nationkey FROM customer
                  UNION SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT 'except_customers', c_custkey, 0::BIGINT
            FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
                  EXCEPT
                  SELECT c_custkey FROM customer
                  WHERE c_mktsegment = 'BUILDING')
            UNION ALL
            SELECT 'systematic_sample', o_orderkey,
                   round(o_totalprice * 100)::BIGINT
            FROM orders WHERE o_orderkey % 100 = 0
            UNION ALL
            SELECT 'distinct_count', count(DISTINCT o_custkey)::BIGINT,
                   0::BIGINT
            FROM orders
        """,
        "rel_sessionize": """
            WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
            lagd AS (SELECT user_id, ts_us, event_id,
                            CASE WHEN lag(ts_us) OVER w IS NULL
                                   OR ts_us - lag(ts_us) OVER w > 1800000000
                                 THEN 1 ELSE 0 END AS new_s
                     FROM e WINDOW w AS (PARTITION BY user_id
                                         ORDER BY ts_us, event_id)),
            sess AS (SELECT user_id, ts_us, event_id,
                            sum(new_s) OVER (PARTITION BY user_id
                                             ORDER BY ts_us, event_id
                                             ROWS UNBOUNDED PRECEDING) AS sid
                     FROM lagd)
            SELECT user_id, min(ts_us) AS session_start_us,
                   count(*)::BIGINT AS n_events,
                   max(ts_us) - min(ts_us) AS duration_us
            FROM sess GROUP BY user_id, sid
        """,
        "rel_events_sliding": """
            SELECT event_type, win_start, count(*)::BIGINT AS n_events FROM (
                SELECT event_type,
                       (epoch_us(ts) // 3600000000) * 3600 AS win_start
                FROM events
                UNION ALL
                SELECT event_type,
                       ((epoch_us(ts) - 1800000000) // 3600000000) * 3600 + 1800
                           AS win_start
                FROM events
            ) GROUP BY 1, 2
        """,
        "rel_running_totals": """
            SELECT event_type, event_id,
                   (row_number() OVER w)::BIGINT AS running_n,
                   round((sum(value) OVER w) * 100)::BIGINT AS running_value_cents
            FROM events
            WINDOW w AS (PARTITION BY event_type
                         ORDER BY epoch_us(ts), event_id
                         ROWS UNBOUNDED PRECEDING)
        """,
        "rel_order_gaps": """
            SELECT o_custkey, o_orderkey, gap_us FROM (
                SELECT o_custkey, o_orderkey,
                       epoch_us(o_orderdate)
                         - lag(epoch_us(o_orderdate)) OVER w AS gap_us
                FROM orders
                WINDOW w AS (PARTITION BY o_custkey
                             ORDER BY epoch_us(o_orderdate), o_orderkey)
            ) WHERE gap_us IS NOT NULL
        """,
        "rel_stratified_sample": """
            SELECT o_orderkey, o_orderpriority,
                   round(o_totalprice * 100)::BIGINT AS o_totalprice_cents
            FROM orders
            -- key reduced mod 2^32 before the multiply, in UBIGINT: the
            -- product then fits 64 unsigned bits (identical result mod
            -- 2^32; an unreduced BIGINT multiply overflows for large keys)
            WHERE (((o_orderkey::UBIGINT % 4294967296) * 2654435761)
                   % 4294967296) % 1000 <
                  CASE o_orderpriority
                       WHEN '1-URGENT' THEN 400
                       WHEN '2-HIGH' THEN 250
                       WHEN '3-MEDIUM' THEN 150
                       WHEN '4-NOT SPECIFIED' THEN 100
                       WHEN '5-LOW' THEN 50
                       ELSE 0 END
        """,
        "rel_mode_segment": """
            SELECT c_nationkey, c_mktsegment AS top_segment, n_customers
            FROM (SELECT c_nationkey, c_mktsegment,
                         count(*)::BIGINT AS n_customers
                  FROM customer GROUP BY 1, 2)
            QUALIFY row_number() OVER (
                PARTITION BY c_nationkey
                ORDER BY n_customers DESC, c_mktsegment) = 1
        """,
        "rel_pivot_events": """
            SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view
            FROM events GROUP BY 1
        """,
        "rel_range_join_acctbal": """
            SELECT s.s_suppkey, count(*)::BIGINT AS n_close_customers
            FROM supplier s JOIN customer c
              ON c.c_acctbal BETWEEN s.s_acctbal - 10.0 AND s.s_acctbal + 10.0
            GROUP BY s.s_suppkey
        """,
        "rel_asof_last_order": """
            WITH ranked AS (
                SELECT e.event_id, e.user_id, o.o_orderkey,
                       row_number() OVER (PARTITION BY e.event_id
                                          ORDER BY o.o_orderdate DESC,
                                                   o.o_orderkey DESC) AS rn
                FROM events e JOIN orders o
                  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
            SELECT event_id, user_id, o_orderkey AS last_orderkey
            FROM ranked WHERE rn = 1
        """,
        "prep_corpus": """
            WITH q AS (SELECT doc_id, coalesce(text, '') AS text FROM documents
                       WHERE length(coalesce(text, '')) >= 50),
            fp AS (SELECT md5(text) AS f, min(doc_id) AS keep FROM q GROUP BY 1),
            kept AS (SELECT doc_id, text FROM q
                     WHERE doc_id IN (SELECT keep FROM fp)),
            toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM kept),
            sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                   FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)),
            mh AS (SELECT doc_id, p, min(md5(p::VARCHAR || '|' || s)) AS mh
                   FROM sh, unnest(generate_series(0, 7)) AS t(p)
                   GROUP BY doc_id, p),
            bands AS (SELECT doc_id, b, md5(string_agg(mh, '|' ORDER BY p)) AS bucket
                      FROM mh, unnest(generate_series(0, 3)) AS t(b)
                      WHERE p // 2 = b GROUP BY doc_id, b),
            pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                      FROM bands a JOIN bands b
                        ON a.b = b.b AND a.bucket = b.bucket
                       AND a.doc_id < b.doc_id)
            SELECT doc_id, len(w)::BIGINT AS n_tokens FROM toks
            WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
        """,
        "rel_group_topk": """
            SELECT o_custkey, o_orderkey,
                   round(o_totalprice * 100)::BIGINT AS o_totalprice_cents,
                   (row_number() OVER (
                        PARTITION BY o_custkey
                        ORDER BY round(o_totalprice * 100)::BIGINT DESC,
                                 o_orderkey))::BIGINT AS rank
            FROM orders QUALIFY rank <= 3
        """,
        "rel_nation_quantiles": """
            SELECT c_nationkey::BIGINT AS c_nationkey,
                   count(*)::BIGINT AS n_customers,
                   quantile_disc(round(c_acctbal * 100)::BIGINT, 0.5)
                       AS median_bal_cents,
                   quantile_disc(round(c_acctbal * 100)::BIGINT, 0.9)
                       AS p90_bal_cents
            FROM customer GROUP BY 1
        """,
        "rel_semi_join_orders": """
            SELECT o_orderkey,
                   round(o_totalprice * 100)::BIGINT AS o_totalprice_cents
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_quantity >= 47.0)
        """,
        "text_tfidf_topk": """
            WITH t AS (SELECT doc_id,
                              unnest(string_split(coalesce(text, ''), ' ')) AS term
                       FROM documents),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t GROUP BY 1, 2),
            df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM t GROUP BY 1)
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   (row_number() OVER (
                        PARTITION BY tf.doc_id
                        ORDER BY tf.tf::DOUBLE / df.df DESC, tf.term))::BIGINT AS rank
            FROM tf JOIN df USING (term)
            QUALIFY rank <= 5
        """,
        "text_bigram_topk": """
            WITH toks AS (SELECT string_split(coalesce(text, ''), ' ') AS w
                          FROM documents),
            bg AS (SELECT w[i] || ' ' || w[i+1] AS s
                   FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i))
            SELECT s, count(*)::BIGINT AS n FROM bg
            GROUP BY s ORDER BY n DESC, s LIMIT 100
        """,
        "text_mask_terms": r"""
            SELECT doc_id,
                   regexp_replace(coalesce(text, ''),
                                  '\b(customer|value)\b', '[MASK]', 'g')
                       AS scrubbed,
                   len(regexp_extract_all(coalesce(text, ''),
                       '\b(customer|value)\b'))::BIGINT AS n_masked
            FROM documents
        """,
        "rel_small_qty_lineitems": """
            SELECT l.l_orderkey, l.l_linenumber::BIGINT AS l_linenumber,
                   l.l_partkey,
                   round(l.l_quantity * 100)::BIGINT AS l_quantity_cents
            FROM lineitem l
            JOIN (SELECT l_partkey, count(*)::DOUBLE AS n,
                         sum(l_quantity) AS s
                  FROM lineitem GROUP BY 1) p
              ON p.l_partkey = l.l_partkey
            WHERE l.l_quantity * 5.0 * p.n < p.s
        """,
        "rel_global_rank_sample": """
            WITH r AS (SELECT o_orderkey,
                              row_number() OVER (ORDER BY epoch_us(o_orderdate),
                                                 o_orderkey) AS rn
                       FROM orders)
            SELECT o_orderkey, rn::BIGINT AS rn FROM r WHERE rn % 1000 = 0
        """,
        "rel_left_join_order_counts": """
            SELECT c.c_custkey, coalesce(o.n, 0)::BIGINT AS n_orders
            FROM customer c LEFT JOIN (
                SELECT o_custkey, count(*)::BIGINT AS n FROM orders GROUP BY 1
            ) o ON o.o_custkey = c.c_custkey
        """,
        "rel_orders_lineitem_join": """
            SELECT l.l_orderkey, l.l_linenumber::BIGINT AS l_linenumber,
                   round(l.l_quantity * 100)::BIGINT AS l_quantity_cents,
                   o.o_orderpriority
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        """,
        "rel_pricing_rollup": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   round(sum(l_quantity) * 100)::BIGINT AS sum_qty_cents,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "dedup_minhash_estimates": f"""
            WITH {_MINHASH_CTE},
            sig AS (SELECT doc_id, p, mh FROM mh),
            bands AS (SELECT doc_id, b, md5(string_agg(mh, '|' ORDER BY p)) AS bucket
                      FROM mh, unnest(generate_series(0, 3)) AS t(b)
                      WHERE p // 2 = b GROUP BY doc_id, b),
            pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                      FROM bands a JOIN bands b
                        ON a.b = b.b AND a.bucket = b.bucket
                       AND a.doc_id < b.doc_id)
            SELECT p.doc_a, p.doc_b,
                   sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END)::BIGINT AS n_agree
            FROM pairs p
            JOIN sig sa ON sa.doc_id = p.doc_a
            JOIN sig sb ON sb.doc_id = p.doc_b AND sb.p = sa.p
            GROUP BY 1, 2
        """,
        "prep_source_balance": """
            SELECT doc_id, source FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ) <= 15
        """,
        "prep_token_budget": """
            SELECT doc_id, source, n_tokens FROM (
                SELECT doc_id, source,
                       len(string_split(coalesce(text, ''), ' '))::BIGINT
                         AS n_tokens
                FROM documents)
            QUALIFY sum(n_tokens) OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                ROWS UNBOUNDED PRECEDING) <= 1000
        """,
        "dedup_decontam": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            grams AS (
                SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS g
                FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
            ),
            test AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0),
            hits AS (
                SELECT DISTINCT d.doc_id, d.g
                FROM grams d JOIN test USING (g)
                WHERE d.doc_id % 17 <> 0
            )
            SELECT doc_id, count(*)::BIGINT AS n_shared
            FROM hits GROUP BY doc_id
        """,
        "dedup_passage": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            chunks AS (
                SELECT doc_id, i AS idx,
                       CAST(ceil(len(ws) / 10.0) AS BIGINT) AS n_chunks,
                       array_to_string(ws[(i-1)*10+1 : i*10], ' ') AS passage
                FROM w, unnest(generate_series(1, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS t(i)
            ),
            kept AS (
                SELECT * FROM chunks
                QUALIFY row_number() OVER (PARTITION BY passage ORDER BY doc_id, idx) = 1
            )
            SELECT doc_id, any_value(n_chunks) AS n_chunks,
                   count(*)::BIGINT AS n_kept,
                   string_agg(passage, ' ' ORDER BY idx) AS text_deduped
            FROM kept GROUP BY doc_id
        """,
        "dedup_lsh_components": f"""
            WITH RECURSIVE {_MINHASH_CTE},
            bands AS (SELECT doc_id, b, md5(string_agg(mh, '|' ORDER BY p)) AS bucket
                      FROM mh, unnest(generate_series(0, 3)) AS t(b)
                      WHERE p // 2 = b GROUP BY doc_id, b),
            pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                      FROM bands a JOIN bands b
                        ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
            edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach(a, b) AS (SELECT a, b FROM edges
                            UNION SELECT r.a, e.b FROM reach r
                                  JOIN edges e ON r.b = e.a)
            SELECT a AS doc_id, least(a, min(b)) AS component_id
            FROM reach GROUP BY a
        """,
        "cdxj_project_exact": f"""
            WITH {_SYNTH_FRAG_CTE}
            SELECT surt, ts,
                   '{{' || array_to_string(
                       list_filter([f_ipt, f_puid, f_cs, f_lang, f_s404],
                                   f -> f IS NOT NULL), ', ') || '}}'
                       AS "json"
            FROM frag
        """,
        "cdxj_merge_exact": f"""
            WITH {_SYNTH_FRAG_CTE},
            enrich AS (SELECT x, url, surt, ts, (x % 7 <> 0) AS m,
                CASE WHEN x % 7 <> 0 AND x % 2 = 0 THEN '"mime-detected": "text/plain"'
                     WHEN x % 7 <> 0 AND x % 3 = 0 THEN '"mime-detected": "text/html"'
                END AS e_mime,
                CASE WHEN x % 7 <> 0 AND x % 4 <> 0 THEN
                       '"puid": "fmt/' || (x % 50)::VARCHAR || '"'
                END AS e_puid,
                CASE WHEN x % 7 <> 0 AND x % 2 = 0 THEN '"charset": "utf-8"'
                END AS e_cs,
                CASE WHEN x % 7 <> 0 AND x % 6 = 0 THEN '"languages": "eng"'
                     WHEN x % 7 <> 0 AND x % 3 = 0 THEN '"languages": "jpn"'
                END AS e_lang,
                CASE WHEN x % 7 <> 0 AND x % 5 = 1 THEN '"soft-404-detected": 0.5'
                END AS e_s404
                FROM frag),
            fr AS (SELECT surt, ts, url, m,
                          list_filter([e_mime, e_puid, e_cs, e_lang, e_s404],
                                      f -> f IS NOT NULL) AS fs
                   FROM enrich)
            SELECT surt, ts,
                   '{{"url": "' || url || '", "status": "200"'
                     || CASE WHEN len(fs) > 0
                             THEN ', ' || array_to_string(fs, ', ')
                             ELSE '' END || '}}' AS "json",
                   m::BIGINT AS matched
            FROM fr
        """,
        # The whole 3-epoch crawl replayed in SQL (no tables — the graph is
        # pure md5 arithmetic; DuckDB md5_number_upper == synth._h_md5).
        # Per epoch: dedup-by-url keep-best → anti-join vs fetched → robots
        # (prefix / allow-override / $-anchored rules on the page id) →
        # per-host top-k by (priority DESC, depth, seed_id, url).  Priorities
        # are URL-determined and collision-free per host (tests assert), so
        # the engine's url_hash tie-break never fires.
        "crawl_sql_exact": _crawl_exact_sql(**_CRAWL_SQL_CFG),
        "rel_supplier_part_join": """
            SELECT l.l_suppkey, l.l_partkey,
                   round(sum(l.l_quantity) * 100)::BIGINT AS sum_qty_cents,
                   s.s_nationkey, p.p_brand
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2, 4, 5
        """,
    }
