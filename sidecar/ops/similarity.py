"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Baseline: brute-force cosine top-k — the query matrix is tiny and broadcast
once via ``ray.put``; each ``map_batches`` task matmuls its block against it
and emits a per-block partial top-k, so the driver-side final merge sees at
most (num_blocks × k × num_queries) rows, never the full score matrix.

Scale path: IVF — k-means-style coarse quantizer (deterministic seeded
centroids), vectors shuffled once by nearest-centroid cell, queries probe
only ``n_probe`` cells.  Approximate → rows-only correctness check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _load_queries(sf_dir: str, query_ids: tuple[int, ...]) -> tuple[np.ndarray, np.ndarray]:
    """(ids, row-normalized float64 query matrix) — queries are rows of the
    embeddings table itself (self-contained, no external data)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mask = np.isin(ids, np.array(query_ids, dtype=np.int64))
    Q = np.array(t.filter(pa.array(mask)).column("embedding").to_pylist(), dtype=np.float64)
    nrm = np.linalg.norm(Q, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return ids[mask], Q / nrm


def ann_topk(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3),
             k: int = 10) -> "rd.Dataset":
    """query_id, vec_id — the k nearest neighbors (cosine, self excluded) of
    each query vector.  Only int id columns are returned so the oracle
    compare is float-rounding-proof; scores stay internal."""
    qids, Q = _load_queries(sf_dir, query_ids)
    q_ref = ray.put((qids, Q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qi, Qn = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        E = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        nrm = np.linalg.norm(E, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        S = Qn @ (E / nrm).T  # num_queries x block_rows
        out_q, out_v, out_s = [], [], []
        kk = min(k + 1, S.shape[1])  # +1: self may be in this block
        for row, qid in enumerate(qi):
            idx = np.argpartition(-S[row], kk - 1)[:kk]
            for j in idx:
                if ids[j] != qid:
                    out_q.append(qid)
                    out_v.append(ids[j])
                    out_s.append(S[row, j])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        top = g.nlargest(k, "score", keep="all").sort_values(
            ["score", "vec_id"], ascending=[False, True]).head(k)
        return top[["query_id", "vec_id"]]

    return (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def ann_topk_ivf(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3),
                 k: int = 10, n_cells: int = 16, n_probe: int = 4,
                 seed: int = 42) -> "rd.Dataset":
    """IVF variant: assign vectors to seeded random-unit centroids (one
    shuffle keyed by cell), probe the n_probe nearest cells per query.
    Approximate; recall vs ``ann_topk`` is asserted >0 in tests, and the
    driver records a rows-only check."""
    qids, Q = _load_queries(sf_dir, query_ids)
    dim = Q.shape[1]
    rng = np.random.Generator(np.random.PCG64(seed))
    C = rng.standard_normal((n_cells, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    probe_cells = {int(q): set(np.argsort(-(C @ Q[i]))[:n_probe].tolist())
                   for i, q in enumerate(qids)}
    refs = ray.put((qids, Q, C, probe_cells))

    def assign(batch: pa.Table) -> pa.Table:
        _, _, Cc, _ = ray.get(refs)
        E = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        nrm = np.linalg.norm(E, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        cell = np.argmax((E / nrm) @ Cc.T, axis=1).astype(np.int64)
        return pa.table({"cell": pa.array(cell, pa.int64()),
                         "vec_id": batch.column("vec_id"),
                         "embedding": batch.column("embedding")})

    def search_cell(g: pd.DataFrame) -> pd.DataFrame:
        qi, Qn, _, probes = ray.get(refs)
        cell = int(g["cell"].iloc[0])
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        E = np.array(g["embedding"].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(E, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        S = Qn @ (E / nrm).T
        out_q, out_v, out_s = [], [], []
        for row, qid in enumerate(qi):
            if cell not in probes[int(qid)]:
                continue
            kk = min(k + 1, S.shape[1])
            idx = np.argpartition(-S[row], kk - 1)[:kk]
            for j in idx:
                if ids[j] != qid:
                    out_q.append(int(qid))
                    out_v.append(int(ids[j]))
                    out_s.append(S[row, j])
        return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int64"),
                             "vec_id": pd.Series(out_v, dtype="int64"),
                             "score": pd.Series(out_s, dtype="float64")})

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        top = g.nlargest(k, "score", keep="all").sort_values(
            ["score", "vec_id"], ascending=[False, True]).head(k)
        return top[["query_id", "vec_id"]]

    return (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .map_groups(search_cell, batch_format="pandas")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )
