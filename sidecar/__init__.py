"""sidecar — a Ray-Data-native crawl-frontier + metadata-sidecar engine.

A from-scratch re-expression of the query/data-processing capabilities of
``unt-libraries/warc-metadata-sidecar`` (reference at /root/reference, read-only)
as idiomatic Ray Data pipelines:

- per-record metadata extraction (mime+PUID, charset, language, soft-404,
  perceptual hash) as vectorized ``map_batches`` stages over zero-copy Arrow
  (reference: warc_metadata_sidecar.py:167-303),
- sidecar → CDXJ projection (reference: sidecar2cdxj.py:40-61),
- CDXJ left-outer enrichment join (reference: merge_cdxj.py:104-138),
- plus the crawl loop mandated by BASELINE.json:north_rule — sharded
  bloom+cuckoo URL-seen set, per-host politeness token buckets, priority
  frontier as groupby(host)/sort shuffles — and large-scale training-data
  operators (dedup, ANN, text analysis).

All detectors are deterministic, hermetic, pure-Python/numpy re-implementations
shaped like the reference's C-library outputs (fido/chardet/pycld2/soft404),
which makes the bit-for-bit reproducibility contract testable.
"""

__version__ = "0.1.0"
