"""General relational operators over the TPC-H-ish tables — the engine's
groupby / join / sort / top-k / windowed-aggregate surface, exercised on
`lineitem` / `orders` / `customer` / `events`.

These are the same Ray Data primitives the crawl engine uses (SURVEY.md §2:
A1/A4 aggregation, J1 broadcast join, §2.6 sort/top-k) demonstrated on
standard relational shapes, each with an exact DuckDB oracle.

Scale rules applied throughout:
- column-pruned `read_parquet` (never read what the query doesn't touch);
- per-batch partial aggregation before every global groupby, so the shuffle
  moves one row per (block × key), not per input row;
- broadcast (ray.put) for small build sides instead of a shuffle join;
- float aggregates emitted as integer cents (round(x*100)::BIGINT) in BOTH
  engines: float round() differs at the last ulp across engines and sum
  orders, which would break exact value-hash comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from sidecar.storage import read_parquet_clean


def _cents(col: "pa.ChunkedArray | pa.Array") -> "pa.Array":
    """Float aggregate → integer cents: round(x*100) as int64.

    Float columns round-tripped through two engines differ in the last ulp
    (sum order, round() implementations), which breaks the driver's exact
    value-hash; integer cents are hash-stable.  Matches DuckDB's
    ``round(x * 100)::BIGINT`` except exactly at .5 ties, which FP-noise
    makes unreachable for real aggregates.
    """
    return pc.cast(pc.round(pc.multiply(col, 100)), pa.int64())


def pricing_summary(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus) sums/avg/count.

    Partial per-batch aggregation (pandas groupby inside map_batches) then a
    tiny global groupby over ~(flags x statuses x blocks) rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            p_qty=("l_quantity", "sum"),
            p_base=("l_extendedprice", "sum"),
            p_disc=("disc_price", "sum"),
            p_cnt=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty_cents": _cents(batch.column("sum_qty")),
            "sum_base_price_cents": _cents(batch.column("sum_base_price")),
            "sum_disc_price_cents": _cents(batch.column("sum_disc_price")),
            "count_order": batch.column("count_order"),
        })

    return (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("p_qty", alias_name="sum_qty"),
            Sum("p_base", alias_name="sum_base_price"),
            Sum("p_disc", alias_name="sum_disc_price"),
            Sum("p_cnt", alias_name="count_order"),
        )
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    )


NUM_AGG_PARTS = 64  # coarse shuffle partitions for high-cardinality groupbys
if NUM_AGG_PARTS & (NUM_AGG_PARTS - 1):
    raise ValueError("NUM_AGG_PARTS must stay a power of two: _jpart uses "
                     "bit_wise_and, which equals % only then")


def _jpart(key_i64: "pa.ChunkedArray | pa.Array") -> "pa.Array":
    """int64 key → coarse shuffle partition, the ONE definition of the
    ``key % NUM_AGG_PARTS`` rule for Arrow columns (numpy sites use
    ``% NUM_AGG_PARTS`` directly; the module-load guard above keeps the two
    idioms equal)."""
    return pc.cast(pc.bit_wise_and(key_i64, NUM_AGG_PARTS - 1), pa.int64())


def top_revenue_orders(sf_dir: str, k: int = 20) -> "pd.DataFrame":
    """Top-k orders by lineitem revenue, enriched with customer segment.

    Coarse-partition aggregate + post-top-k enrichment: per-order sums need a
    shuffle, but a key-cardinality groupby (~1.5M keys at sf=1) pays per-key
    dispatch — instead the shuffle key is ``l_orderkey % NUM_AGG_PARTS`` (64
    groups at ANY scale; each order lives wholly in one partition so
    per-partition sums are complete), the per-order sum + partial top-k run
    vectorized inside each group task, and the driver merges 64×k candidate
    rows.  The orders→customer enrichment runs AFTER top-k on exactly k rows
    (predicate-pushdown point reads) — no broadcast of the full orders table,
    unlike a join-then-rank plan.
    """
    import pyarrow.parquet as pq

    def add_part(batch: pa.Table) -> pa.Table:
        key = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(key % NUM_AGG_PARTS, pa.int64()),
            "l_orderkey": pa.array(key, pa.int64()),
            "rev": pa.array(price * (1 - disc), pa.float64()),
        })

    def sum_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_orderkey", sort=False)["rev"].sum()
        cents = np.round(s.to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"o_orderkey": s.index.to_numpy(), "revenue_cents": cents})
        return df.sort_values(["revenue_cents", "o_orderkey"],
                              ascending=[False, True]).head(k)

    top = (
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(sum_topk, batch_format="pandas")
        .to_pandas()  # ≤ 64 × k rows by construction
        .sort_values(["revenue_cents", "o_orderkey"], ascending=[False, True])
        .head(k).reset_index(drop=True)
    )

    keys = top["o_orderkey"].tolist()
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"],
                           filters=[("o_orderkey", "in", keys)])
    o2c = dict(zip(orders.column("o_orderkey").to_pylist(),
                   orders.column("o_custkey").to_pylist()))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"],
                         filters=[("c_custkey", "in",
                                   sorted(set(o2c.values())))])
    c2seg = dict(zip(cust.column("c_custkey").to_pylist(),
                     cust.column("c_mktsegment").to_pylist()))
    top["c_mktsegment"] = [c2seg[o2c[kk]] for kk in keys]
    return top


def events_windowed(sf_dir: str, window_s: int = 3600) -> "rd.Dataset":
    """Tumbling-window aggregate over the events stream: per (event_type,
    hour-bucket) count + rounded value sum.  The window key is computed
    vectorized per batch; the groupby shuffles only (type, window, partials).
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        us = df["ts"].values.astype("datetime64[us]").astype("int64")
        df["win"] = (us // (window_s * 1_000_000)) * window_s  # epoch-s window start
        g = df.groupby(["event_type", "win"], as_index=False).agg(
            p_n=("value", "size"), p_sum=("value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "win": batch.column("win"),
            "n_events": batch.column("n_events"),
            "sum_value_cents": _cents(batch.column("sum_value")),
        })

    return (
        read_parquet_clean(f"{sf_dir}/events.parquet",
                        columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "win"])
        .aggregate(Sum("p_n", alias_name="n_events"),
                   Sum("p_sum", alias_name="sum_value"))
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    )


def customer_order_stats(sf_dir: str) -> "rd.Dataset":
    """Per-customer order stats (count, min/max date as epoch-µs ints,
    rounded total) — a plain distributed groupby with mixed aggregate kinds;
    dates go through int64 so both engines hash identical scalars."""

    def to_us(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("o_orderdate"), pa.int64())
        return pa.table({"o_custkey": batch.column("o_custkey"),
                         "date_us": us,
                         "o_totalprice": batch.column("o_totalprice")})

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "n_orders": batch.column("n_orders"),
            "first_date_us": batch.column("first_date_us"),
            "last_date_us": batch.column("last_date_us"),
            "total_price_cents": _cents(batch.column("total_price")),
        })

    return (
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(
            Count(alias_name="n_orders"),
            Min("date_us", alias_name="first_date_us"),
            Max("date_us", alias_name="last_date_us"),
            Sum("o_totalprice", alias_name="total_price"),
        )
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    )


def supplier_part_join(sf_dir: str) -> "rd.Dataset":
    """Shuffle-free two-small-side enrichment of a lineitem aggregate:
    per (l_suppkey, l_partkey) quantity sum, enriched with supplier nation
    and part brand from broadcast lookups."""
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    s2n = dict(zip(sup.column("s_suppkey").to_pylist(), sup.column("s_nationkey").to_pylist()))
    p2b = dict(zip(part.column("p_partkey").to_pylist(), part.column("p_brand").to_pylist()))
    side = ray.put((s2n, p2b))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["l_suppkey", "l_partkey"], as_index=False)["l_quantity"].sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def enrich(batch: pa.Table) -> pa.Table:
        s2n_, p2b_ = ray.get(side)
        sk = batch.column("l_suppkey").to_pylist()
        pk = batch.column("l_partkey").to_pylist()
        return pa.table({
            "l_suppkey": pa.array(sk, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
            "sum_qty_cents": _cents(batch.column("sum_qty")),
            "s_nationkey": pa.array([s2n_.get(x) for x in sk], pa.int64()),
            "p_brand": pa.array([p2b_.get(x) for x in pk], pa.string()),
        })

    return (
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                        columns=["l_suppkey", "l_partkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_suppkey", "l_partkey"])
        .aggregate(Sum("l_quantity", alias_name="sum_qty"))
        .map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
    )


def asof_last_order(sf_dir: str) -> "rd.Dataset":
    """As-of join (an operator Ray Data lacks natively): for each event, the
    most recent order of the same user with o_orderdate <= event ts
    (ties on date broken by max orderkey; events with no prior order drop —
    inner semantics keep the output int64-clean for the hash compare).

    Plan: tag + union both sides into one dataset, ONE shuffle keyed by a
    coarse ``user % NUM_AGG_PARTS`` partition (64 tasks at any scale — per-
    USER map_groups would dispatch one pandas call per tiny group, the
    pathology frontier.py's budget stage documents), then ONE lexsort +
    grouped forward-fill inside the partition: sort (key, t_us,
    orders-before-events, id), forward-fill the last order row position with
    ``np.maximum.accumulate``, and keep matches whose filled order shares the
    event's key.  Exactly equivalent to a per-user searchsorted — orders at
    the same (key, t) sort before events (<= semantics) and ascending by id
    (max-orderkey tie-break) — with zero per-user dispatch.
    """

    def ev_rows(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64())
        n = batch.num_rows
        key = pc.cast(batch.column("user_id"), pa.int64())
        return pa.table({
            "jpart": _jpart(key),
            "key": key,
            "is_order": pa.array([0] * n, pa.int64()),
            "t_us": us,
            "id": pc.cast(batch.column("event_id"), pa.int64()),
        })

    def ord_rows(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("o_orderdate"), pa.int64())
        n = batch.num_rows
        key = pc.cast(batch.column("o_custkey"), pa.int64())
        return pa.table({
            "jpart": _jpart(key),
            "key": key,
            "is_order": pa.array([1] * n, pa.int64()),
            "t_us": us,
            "id": pc.cast(batch.column("o_orderkey"), pa.int64()),
        })

    def asof_partition(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy()
        t = g["t_us"].to_numpy()
        is_order = g["is_order"].to_numpy()
        ids = g["id"].to_numpy()
        # primary key last in lexsort; orders (is_order=1) before events at
        # the same (key, t) — "order date <= event ts" includes equality —
        # and orders ascending by id so the forward-fill lands on max id
        order = np.lexsort((ids, -is_order, t, key))
        k = key[order]
        io = is_order[order]
        di = ids[order]
        pos = np.where(io == 1, np.arange(len(k)), -1)
        last = np.maximum.accumulate(pos) if len(k) else pos
        ev = io == 0
        li = last[ev]
        ok = li >= 0
        # sorted by key first ⇒ the nearest preceding order row either
        # shares the event's key (valid as-of match) or belongs to an
        # earlier key (no prior order for this user)
        ok[ok] = k[li[ok]] == k[ev][ok]
        return pd.DataFrame({
            "event_id": di[ev][ok],
            "user_id": k[ev][ok],
            "last_orderkey": di[li[ok]],
        })

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"]) \
        .map_batches(ev_rows, batch_format="pyarrow", zero_copy_batch=True)
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_rows, batch_format="pyarrow", zero_copy_batch=True)
    return (ev.union(orders).groupby("jpart")
            .map_groups(asof_partition, batch_format="pandas"))


def union_nations(sf_dir: str) -> "rd.Dataset":
    """Set op: distinct nation keys present in customer UNION supplier —
    `ds.union` then a per-block-partial distinct (no full shuffle: partials
    are tiny)."""

    def proj(col: str):
        def f(batch: pa.Table) -> pa.Table:
            vals = batch.column(col).to_numpy(zero_copy_only=False)
            return pa.table({"nationkey": pa.array(np.unique(vals), pa.int64())})
        return f

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_nationkey"]) \
        .map_batches(proj("c_nationkey"), batch_format="pyarrow", zero_copy_batch=True)
    sup = read_parquet_clean(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"]) \
        .map_batches(proj("s_nationkey"), batch_format="pyarrow", zero_copy_batch=True)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1]

    return cust.union(sup).groupby("nationkey").map_groups(first, batch_format="pandas")


def except_customers(sf_dir: str, min_bal: float = 5000.0,
                     segment: str = "BUILDING") -> "rd.Dataset":
    """Set op (EXCEPT / broadcast anti-join): high-balance customers minus
    the ``segment`` customers.  The subtract side is broadcast once via
    ray.put; the probe side streams through map_batches — the anti-join
    plan for any small-side EXCEPT at scale."""
    import pyarrow.parquet as pq_

    side = pq_.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_mktsegment"])
    seg = np.unique(side.filter(pc.equal(side.column("c_mktsegment"), segment))
                    .column("c_custkey").to_numpy(zero_copy_only=False))
    seg_ref = ray.put(seg)

    def anti(batch: pa.Table) -> pa.Table:
        s = ray.get(seg_ref)
        keep_bal = pc.greater(batch.column("c_acctbal"), min_bal)
        sub = batch.filter(keep_bal)
        vals = sub.column("c_custkey").to_numpy(zero_copy_only=False)
        keep = ~np.isin(vals, s)
        return pa.table({"c_custkey": pa.array(vals[keep], pa.int64())})

    return read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"]) \
        .map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


def systematic_sample(sf_dir: str, every: int = 100) -> "rd.Dataset":
    """Deterministic systematic sample: every `every`-th order by key — the
    reproducible sampling primitive (random_shuffle/sample are available in
    Ray Data but are not oracle-checkable)."""

    def f(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        keep = (keys % every) == 0
        return pa.table({
            "o_orderkey": pa.array(keys[keep], pa.int64()),
            "o_totalprice_cents": _cents(
                pa.array(batch.column("o_totalprice").to_numpy(
                    zero_copy_only=False)[keep])),
        })

    return read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"]) \
        .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sessionize(sf_dir: str, gap_s: int = 1800) -> "rd.Dataset":
    """Session windows over the events log: per user, events separated by
    more than ``gap_s`` start a new session.  One shuffle keyed by a coarse
    ``user % NUM_AGG_PARTS`` partition (per-USER map_groups would dispatch
    one pandas call per tiny group — the frontier.py budget-stage
    pathology); inside the partition, ONE lexsort by (user, ts, event_id)
    and boundary vectorization: a session starts where the user changes or
    the gap exceeds gap_us, and per-session start/count/duration fall out
    of the boundary indices (Ray Data has no event-time windows natively —
    this is the documented pattern: co-partition by key, sort inside).

    Output: user_id, session_start_us, n_events, duration_us (all int64 —
    exactly hashable against the SQL lag/cumsum-window oracle).
    """
    gap_us = gap_s * 1_000_000

    def sessions_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        n = len(ts)
        if n == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "session_start_us": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "duration_us": pd.Series([], dtype="int64"),
            })
        new = np.ones(n, dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], n] - 1
        return pd.DataFrame({
            "user_id": u[starts],
            "session_start_us": ts[starts],
            "n_events": (np.r_[starts[1:], n] - starts).astype(np.int64),
            "duration_us": ts[ends] - ts[starts],
        })

    def proj(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64())
        return pa.table({
            "jpart": _jpart(uid),
            "user_id": uid,
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
        })

    return (
        read_parquet_clean(f"{sf_dir}/events.parquet",
                        columns=["user_id", "event_id", "ts"])
        .map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("jpart")
        .map_groups(sessions_of_partition, batch_format="pandas")
    )


def events_sliding(sf_dir: str, window_s: int = 3600, slide_s: int = 1800) -> "rd.Dataset":
    """Sliding-window count: per event_type, 1h windows sliding every 30min —
    each event lands in window_s/slide_s grids.  Implemented as the union of
    K offset tumbling grids computed in one vectorized pass per batch
    (partial counts), then a tiny global groupby."""
    k = window_s // slide_s

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        us = df["ts"].values.astype("datetime64[us]").astype("int64")
        frames = []
        for i in range(k):
            off = i * slide_s * 1_000_000
            win = ((us - off) // (window_s * 1_000_000)) * window_s + i * slide_s
            frames.append(pd.DataFrame({"event_type": df["event_type"],
                                        "win_start": win}))
        allf = pd.concat(frames)
        g = allf.groupby(["event_type", "win_start"], as_index=False).size()
        g = g.rename(columns={"size": "p_n"})
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "win_start"])
        .aggregate(Sum("p_n", alias_name="n_events"))
    )


def running_totals(sf_dir: str) -> "rd.Dataset":
    """Stateful-streaming shape (§2.8): per event_type running event count
    and value sum in event-time order.  One shuffle keyed by type; the
    running state is a vectorized cumsum over the sorted group — order
    dependence is explicit (ts, then event_id), which is what makes the
    prefix sums bit-identical to the SQL window oracle (both engines add
    doubles left-to-right in the same order)."""

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "value": batch.column("value"),
        })

    def totals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"])
        return pd.DataFrame({
            "event_type": g["event_type"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "running_n": np.arange(1, len(g) + 1, dtype=np.int64),
            "running_value_cents": np.round(
                g["value"].to_numpy().cumsum() * 100).astype(np.int64),
        })

    return (
        read_parquet_clean(f"{sf_dir}/events.parquet",
                        columns=["event_type", "event_id", "ts", "value"])
        .map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(totals, batch_format="pandas")
    )


def group_topk_orders(sf_dir: str, k: int = 3) -> "rd.Dataset":
    """Top-k-per-group (window rank): each customer's k highest-value orders
    with their rank.  Two-level plan: a per-batch partial top-k (only k rows
    per (customer × block) survive to the shuffle) then a per-group final
    top-k — the shuffle volume is bounded by k × |customers| regardless of
    order count, unlike a global window sort."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["o_totalprice_cents"] = _cents(batch.column("o_totalprice")).to_pandas()
        df = (df.sort_values(["o_custkey", "o_totalprice_cents", "o_orderkey"],
                             ascending=[True, False, True])
              .groupby("o_custkey", sort=False).head(k))
        return pa.Table.from_pandas(
            df[["o_custkey", "o_orderkey", "o_totalprice_cents"]],
            preserve_index=False).replace_schema_metadata(None)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice_cents", "o_orderkey"],
                          ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["o_custkey", "o_orderkey", "o_totalprice_cents", "rank"]]

    return (
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .map_groups(final_topk, batch_format="pandas")
    )


def nation_acctbal_quantiles(sf_dir: str) -> "rd.Dataset":
    """Per-nation discrete quantiles of customer account balance: n, median
    and p90 in integer cents — exact order statistics, not interpolated, so
    the values are elements of the input and hash-stable.  The discrete rule
    matches DuckDB's ``quantile_disc``: sorted[ceil(q*n) - 1].

    One shuffle keyed by nation (25 groups); within the group the quantile is
    a vectorized sort + index.  At web scale with billions of rows per key
    this becomes a two-pass t-digest/histogram sketch; the exact per-group
    sort is correct while a group fits a worker (~10^8 rows)."""

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": pc.cast(batch.column("c_nationkey"), pa.int64()),
            "bal_cents": _cents(batch.column("c_acctbal")),
        })

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sort(g["bal_cents"].to_numpy())
        n = len(s)

        def disc(q: float) -> int:
            return int(s[min(n - 1, int(np.ceil(q * n)) - 1)])

        return pd.DataFrame({
            "c_nationkey": [np.int64(g["c_nationkey"].iloc[0])],
            "n_customers": np.array([n], dtype=np.int64),
            "median_bal_cents": np.array([disc(0.5)], dtype=np.int64),
            "p90_bal_cents": np.array([disc(0.9)], dtype=np.int64),
        })

    return (
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                        columns=["c_nationkey", "c_acctbal"])
        .map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_nationkey")
        .map_groups(quantiles, batch_format="pandas")
    )


def semi_join_big_orders(sf_dir: str, min_qty: float = 47.0) -> "rd.Dataset":
    """Semi-join (EXISTS): orders having at least one lineitem with
    l_quantity >= min_qty.  The existence side reduces to a distinct-key
    ARRAY (per-batch partial distinct, then one driver-side np.unique over
    the concatenated partials — at most |matching orders| int64s, no row
    data, no per-row Python), broadcast once via ray.put; the probe side
    streams through a vectorized np.isin filter.  The same
    broadcast-semi-join plan as the seen-set anti-join (SURVEY.md J3), with
    polarity flipped; at a scale where even the key array outgrows a
    broadcast, co-partition both sides on the key like
    orders_lineitem_join."""

    def distinct_keys(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch.column("l_quantity"), min_qty)
        keys = batch.filter(m).column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(np.unique(keys), pa.int64())})

    chunks = [b.column("k").to_numpy(zero_copy_only=False)
              for b in (read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                                        columns=["l_orderkey", "l_quantity"])
                        .map_batches(distinct_keys, batch_format="pyarrow",
                                     zero_copy_batch=True)
                        .iter_batches(batch_format="pyarrow", batch_size=None))]
    keys_ref = ray.put(np.unique(np.concatenate(chunks)) if chunks
                       else np.array([], dtype=np.int64))

    def semi(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        keep = np.isin(ok, ks)
        return pa.table({
            "o_orderkey": pa.array(ok[keep], pa.int64()),
            "o_totalprice_cents": _cents(
                pa.array(batch.column("o_totalprice").to_numpy(
                    zero_copy_only=False)[keep])),
        })

    return read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"]) \
        .map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)


def small_qty_lineitems(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q17 shape: lineitems whose quantity is below 20% of their
    part's average quantity — the correlated-aggregate filter, as the
    two-phase broadcast plan: per-part (count, sum) aggregates first
    (partial per batch, tiny groupby), broadcast via ray.put, then one
    shuffle-free filtering pass.

    The predicate is evaluated CROSS-MULTIPLIED in exact arithmetic —
    ``qty·5·n_part < sum_qty_part`` instead of ``qty < 0.2·avg`` — because
    avg differs in the last ulp between engines (sum order, division) and
    would flip boundary rows; quantities are integer-valued doubles, so
    both products are exact in float64 and the comparison is bit-stable."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_partkey", as_index=False).agg(
            p_n=("l_quantity", "size"), p_s=("l_quantity", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    # the per-part aggregate stays distributed; the driver only concatenates
    # its (key, n, sum) Arrow columns into sorted numpy arrays — no per-row
    # Python dict building — and broadcasts the object ref once
    kc, nc, sc = [], [], []
    for b in (read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_quantity"])
              .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
              .groupby("l_partkey")
              .aggregate(Sum("p_n", alias_name="n"), Sum("p_s", alias_name="s"))
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        kc.append(b.column("l_partkey").to_numpy(zero_copy_only=False))
        nc.append(b.column("n").to_numpy(zero_copy_only=False))
        sc.append(b.column("s").to_numpy(zero_copy_only=False))
    if not kc:  # empty lineitem table: same guard as customers_order_counts
        kc = [np.array([], dtype=np.int64)]
        nc = sc = [np.array([], dtype=np.int64)]
    k_all = np.concatenate(kc)
    order = np.argsort(k_all)
    stats_ref = ray.put((k_all[order],
                         np.concatenate(nc)[order].astype(np.float64),
                         np.concatenate(sc)[order].astype(np.float64)))

    def small(batch: pa.Table) -> pa.Table:
        k_sorted, n_arr, s_arr = ray.get(stats_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k_sorted, pk)  # every partkey is present
        n = n_arr[idx]
        s = s_arr[idx]
        keep = qty * 5.0 * n < s
        return pa.table({
            "l_orderkey": pa.array(ok[keep], pa.int64()),
            "l_linenumber": pa.array(ln[keep].astype(np.int64), pa.int64()),
            "l_partkey": pa.array(pk[keep], pa.int64()),
            "l_quantity_cents": _cents(pa.array(qty[keep])),
        })

    return read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_linenumber", "l_partkey",
                                    "l_quantity"]) \
        .map_batches(small, batch_format="pyarrow", zero_copy_batch=True)


def global_rank_sample(sf_dir: str, every: int = 1000) -> "rd.Dataset":
    """o_orderkey, rn — every ``every``-th order in GLOBAL
    (o_orderdate, o_orderkey) sort order, with its global rank.

    The distributed global-rank plan: range-partition by a data-independent
    key (calendar month of o_orderdate — a natural range partitioning that
    needs no sampling pass), sort within each partition, and turn local
    ranks global by adding the broadcast prefix-count of all lower
    partitions (per-bucket counts are a per-batch partial + tiny driver
    cumsum).  No single node ever holds more than one month; the only
    all-to-all is the bucket groupby.  Correct because the partition key is
    a prefix of the sort key."""

    def to_bucket(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False)
        month = (us // (86_400_000_000 * 32)).astype(np.int64)  # ~month-grain
        return pa.table({
            "bucket": pa.array(month, pa.int64()),
            "t_us": pa.array(us, pa.int64()),
            "o_orderkey": pc.cast(batch.column("o_orderkey"), pa.int64()),
        })

    def bucket_counts(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch.column("bucket").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    base = read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(to_bucket, batch_format="pyarrow", zero_copy_batch=True)

    counts: dict[int, int] = {}
    for b in base.map_batches(bucket_counts, batch_format="pyarrow",
                              zero_copy_batch=True).iter_batches(
                                  batch_format="pyarrow", batch_size=None):
        for k, n in zip(b.column("bucket").to_pylist(), b.column("n").to_pylist()):
            counts[k] = counts.get(k, 0) + n
    offsets = {}
    acc = 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    off_ref = ray.put(offsets)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["t_us", "o_orderkey"])
        rn = np.arange(1, len(g) + 1, dtype=np.int64) + offs[int(g["bucket"].iloc[0])]
        keep = rn % every == 0
        return pd.DataFrame({"o_orderkey": g["o_orderkey"].to_numpy()[keep],
                             "rn": rn[keep]})

    return base.groupby("bucket").map_groups(rank_bucket, batch_format="pandas")


def customers_order_counts_left(sf_dir: str) -> "rd.Dataset":
    """Left-outer join: EVERY customer with their order count — zero for
    customers with no orders (the rows an inner join silently drops).

    The aggregate side collapses to (custkey, n) — one int per customer with
    ≥1 order — via per-batch partials + groupby; that small side broadcasts
    (ray.put) and the probe (customer) side streams through a vectorized
    lookup, exactly the J1 broadcast plan with left-outer pass-through
    semantics (cdxj merge's unmatched-probe rule, merge_cdxj.py:79-81,
    generalized to a relational operator)."""

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch.column("o_custkey").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"o_custkey": pa.array(u, pa.int64()),
                         "p_n": pa.array(c.astype(np.int64), pa.int64())})

    kc, nc = [], []
    for b in (read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
              .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
              .groupby("o_custkey").aggregate(Sum("p_n", alias_name="n"))
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        kc.append(b.column("o_custkey").to_numpy(zero_copy_only=False))
        nc.append(b.column("n").to_numpy(zero_copy_only=False))
    k_all = np.concatenate(kc) if kc else np.array([], dtype=np.int64)
    order = np.argsort(k_all)
    counts_ref = ray.put((k_all[order],
                          (np.concatenate(nc)[order] if kc
                           else np.array([], dtype=np.int64)).astype(np.int64)))

    def left_join(batch: pa.Table) -> pa.Table:
        k_sorted, n_arr = ray.get(counts_ref)
        keys = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k_sorted, keys)
        idx_c = np.minimum(idx, max(len(k_sorted) - 1, 0))
        hit = (idx < len(k_sorted)) & (k_sorted[idx_c] == keys) \
            if len(k_sorted) else np.zeros(len(keys), dtype=bool)
        return pa.table({
            "c_custkey": pa.array(keys, pa.int64()),
            "n_orders": pa.array(np.where(hit, n_arr[idx_c] if len(k_sorted)
                                          else 0, 0).astype(np.int64),
                                 pa.int64()),
        })

    return read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"]) \
        .map_batches(left_join, batch_format="pyarrow", zero_copy_batch=True)


def distinct_count_custkey(sf_dir: str) -> "pa.Table":
    """n_distinct — exact COUNT(DISTINCT o_custkey), the two-level distinct
    plan: per-block partial ``np.unique`` (each block forwards at most its
    distinct keys), coarse-partition global dedup (64 groups at any
    cardinality), per-partition counts summed on the driver (64 ints)."""

    def partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({
            "part": pa.array(u % NUM_AGG_PARTS, pa.int64()),
            "k": pa.array(u, pa.int64()),
        })

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p_n": [np.int64(g["k"].nunique())]})

    total = (
        read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(count_distinct, batch_format="pandas")
        .to_pandas()["p_n"].sum()
    )
    return pa.table({"n_distinct": pa.array([int(total)], pa.int64())})


HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a public-domain 64-bit mixer with
    full avalanche; deterministic across processes (unlike builtin hash)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bitlen64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (binary-search shifts — exact,
    no float log)."""
    x = x.copy()
    r = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        r[big] += s
        x = np.where(big, x >> np.uint64(s), x)
    return r + (x > 0)


def _hll_registers(keys: np.ndarray) -> np.ndarray:
    """Register maxima for a batch of int64 keys — fully vectorized
    (splitmix64 hash, shift-based register index, binary-search bit length,
    np.maximum.at merge); no per-key Python."""
    regs = np.zeros(HLL_M, dtype=np.int8)
    if len(keys) == 0:
        return regs
    h = _splitmix64(keys.astype(np.uint64))
    j = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)  # uint64 shift drops the top HLL_P bits
    # rank = leading zeros of the 64-bit suffix + 1; all-zero suffix caps
    # at (64 - HLL_P) + 1 as in the scalar definition
    rank = np.where(rest > 0, (64 - _bitlen64(rest)) + 1, (64 - HLL_P) + 1)
    np.maximum.at(regs, j, rank.astype(np.int8))
    return regs


def approx_distinct_custkey(sf_dir: str) -> "pa.Table":
    """n_approx — HyperLogLog distinct estimate of o_custkey (m=256).

    The sketch pattern for COUNT DISTINCT at 100 TB: per-block register
    maxima (256 bytes each) are the ONLY thing shuffled — merge = elementwise
    max, order-independent and retry-idempotent, so the estimate is
    deterministic at any parallelism.  Approximate (±1.04/√m ≈ 6.5%) ⇒
    rows-only driver check; the error bound and determinism are asserted in
    tests against the exact operator above.
    """

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.unique(batch.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({"regs": pa.array([_hll_registers(keys).tolist()],
                                          pa.list_(pa.int8()))})

    regs = np.zeros(HLL_M, dtype=np.int8)
    for b in (read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
              .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        for r in b.column("regs").to_pylist():
            regs = np.maximum(regs, np.array(r, dtype=np.int8))

    est = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M / np.sum(
        np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * HLL_M and zeros:  # small-range linear counting
        est = HLL_M * np.log(HLL_M / zeros)
    return pa.table({"n_approx": pa.array([int(round(est))], pa.int64())})


def orders_lineitem_join(sf_dir: str) -> "rd.Dataset":
    """General large×large inner hash join (no pre-aggregation): every
    lineitem row joined to its order's priority — the shuffle-join shape for
    when NEITHER side fits a broadcast.

    Plan: tag each side, union into one Dataset, ONE shuffle keyed by a
    coarse partition of the join key (64 groups at any scale — the same
    co-partitioning trick as the as-of join), then a vectorized pandas merge
    inside each partition.  Each key's rows from both sides land in the same
    partition by construction, so the per-partition merge is exact.  Output
    is row-level (one row per lineitem), proving the join itself rather
    than a joined aggregate."""

    def ord_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "jpart": pa.array((k % NUM_AGG_PARTS).astype(np.int64), pa.int64()),
            "key": pa.array(k, pa.int64()),
            "side": pa.array(np.zeros(len(k), dtype=np.int64)),
            "lineno": pa.array(np.zeros(len(k), dtype=np.int64)),
            "qty_cents": pa.array(np.zeros(len(k), dtype=np.int64)),
            "o_orderpriority": batch.column("o_orderpriority"),
        })

    def li_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        n = len(k)
        return pa.table({
            "jpart": pa.array((k % NUM_AGG_PARTS).astype(np.int64), pa.int64()),
            "key": pa.array(k, pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int64)),
            "lineno": pc.cast(batch.column("l_linenumber"), pa.int64()),
            "qty_cents": _cents(batch.column("l_quantity")),
            "o_orderpriority": pa.array([""] * n, pa.string()),
        })

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        orders = g[g["side"] == 0][["key", "o_orderpriority"]]
        items = g[g["side"] == 1][["key", "lineno", "qty_cents"]]
        out = items.merge(orders, on="key", how="inner")
        return pd.DataFrame({
            "l_orderkey": out["key"].to_numpy(),
            "l_linenumber": out["lineno"].to_numpy(),
            "l_quantity_cents": out["qty_cents"].to_numpy(),
            "o_orderpriority": out["o_orderpriority"].to_numpy(),
        })

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(ord_rows, batch_format="pyarrow", zero_copy_batch=True)
    items = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber", "l_quantity"]) \
        .map_batches(li_rows, batch_format="pyarrow", zero_copy_batch=True)
    return (orders.union(items)
            .groupby("jpart")
            .map_groups(join_partition, batch_format="pandas"))


def pricing_rollup(sf_dir: str) -> "pd.DataFrame":
    """ROLLUP aggregate: lineitem quantity/count at three grouping levels —
    (returnflag, linestatus), (returnflag), and grand total — with 'ALL' as
    the rolled-up sentinel (hash-stable across engines, unlike SQL NULL).

    The scale plan computes ONLY the finest level distributed (the same
    partial-aggregate + small groupby as pricing_summary); the coarser
    levels are derived from the finest RESULT (a handful of rows) on the
    driver — never a second pass over the data.  Sums roll up exactly
    because the finest level is already integer cents."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            p_qty=("l_quantity", "sum"), p_cnt=("l_quantity", "size"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    finest = (
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                        columns=["l_returnflag", "l_linestatus", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("p_qty", alias_name="sum_qty"),
                   Sum("p_cnt", alias_name="n_rows"))
        .to_pandas()  # |flags| × |statuses| rows
    )
    finest["sum_qty_cents"] = np.round(finest["sum_qty"] * 100).astype(np.int64)
    finest = finest[["l_returnflag", "l_linestatus", "sum_qty_cents", "n_rows"]]
    lvl1 = (finest.groupby("l_returnflag", as_index=False)
            .agg(sum_qty_cents=("sum_qty_cents", "sum"), n_rows=("n_rows", "sum")))
    lvl1["l_linestatus"] = "ALL"
    lvl0 = pd.DataFrame({
        "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
        "sum_qty_cents": [finest["sum_qty_cents"].sum()],
        "n_rows": [finest["n_rows"].sum()],
    })
    out = pd.concat([finest, lvl1, lvl0], ignore_index=True)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["sum_qty_cents"] = out["sum_qty_cents"].astype(np.int64)
    return out[["l_returnflag", "l_linestatus", "sum_qty_cents", "n_rows"]]


def range_join_acctbal(sf_dir: str, band: float = 10.0) -> "rd.Dataset":
    """Range (band) join: per supplier, how many customers hold an account
    balance within ±band — the bucketed-range shuffle plan Ray Data lacks
    natively: both sides are bucketed by floor(bal/band); the probe
    (supplier) side is REPLICATED to its bucket ±1 so every in-band pair
    co-locates in exactly the build row's bucket (counted once — the build
    row lives in one bucket).  Within a bucket the match is a vectorized
    interval check.  Suppliers with no in-band customer drop (inner join).
    """

    def cust_rows(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(np.floor(bal / band).astype(np.int64)),
            "side": pa.array(np.zeros(len(bal), dtype=np.int64)),
            "key": pc.cast(batch.column("c_custkey"), pa.int64()),
            "bal": pa.array(bal, pa.float64()),
        })

    def supp_rows(batch: pa.Table) -> pa.Table:
        bal = batch.column("s_acctbal").to_numpy(zero_copy_only=False)
        key = batch.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        b0 = np.floor(bal / band).astype(np.int64)
        buckets = np.concatenate([b0 - 1, b0, b0 + 1])
        return pa.table({
            "bucket": pa.array(buckets),
            "side": pa.array(np.ones(3 * len(bal), dtype=np.int64)),
            "key": pa.array(np.tile(key, 3), pa.int64()),
            "bal": pa.array(np.tile(bal, 3), pa.float64()),
        })

    def match_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cust = g[g["side"] == 0]
        supp = g[g["side"] == 1]
        if cust.empty or supp.empty:
            return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                                 "p_n": pd.Series([], dtype="int64")})
        # count only pairs whose CUSTOMER lives in this bucket (it does by
        # construction) — each pair counted exactly once across buckets
        cb = np.sort(cust["bal"].to_numpy())
        sk = supp["key"].to_numpy()
        sb = supp["bal"].to_numpy()
        lo = np.searchsorted(cb, sb - band, side="left")
        hi = np.searchsorted(cb, sb + band, side="right")
        # restrict to customers in THIS bucket: cb is already only this bucket
        n = hi - lo
        keep = n > 0
        return pd.DataFrame({"s_suppkey": sk[keep], "p_n": n[keep]})

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"]) \
        .map_batches(cust_rows, batch_format="pyarrow", zero_copy_batch=True)
    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_acctbal"]) \
        .map_batches(supp_rows, batch_format="pyarrow", zero_copy_batch=True)
    return (
        cust.union(supp)
        .groupby("bucket")
        .map_groups(match_bucket, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("p_n", alias_name="n_close_customers"))
    )


def order_gaps(sf_dir: str) -> "rd.Dataset":
    """o_custkey, o_orderkey, gap_us — the LAG window family: time between
    each customer's consecutive orders (microseconds, so the compare is
    integer-exact).  First order per customer is dropped (its lag is NULL).

    Plan: one shuffle on a COARSE partition key (custkey % 64), then a
    vectorized in-task pass — sort by (custkey, ts, orderkey), np.diff, mask
    customer boundaries — instead of per-customer ``map_groups`` dispatch
    (64 tasks regardless of customer count; the per-key-dispatch version is
    ~50× slower on high-cardinality keys).  Order dependence is explicit:
    ties on (ts) break by orderkey, matching the SQL window's ORDER BY."""

    def proj(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey")
        return pa.table({
            "part": _jpart(ck),
            "o_custkey": ck,
            "o_orderkey": batch.column("o_orderkey"),
            "ts_us": pc.cast(batch.column("o_orderdate"), pa.int64()),
        })

    def gaps(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "ts_us", "o_orderkey"])
        cust = g["o_custkey"].to_numpy()
        ts = g["ts_us"].to_numpy()
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        keep = np.ones(len(g), dtype=bool)
        keep[0] = False
        keep[1:] = cust[1:] == cust[:-1]  # drop each customer's first order
        # fresh metadata-free Arrow table (not pandas) so no downstream
        # operator sees an unhashable b'pandas' schema blob
        return pa.table({
            "o_custkey": pa.array(cust[keep], pa.int64()),
            "o_orderkey": pa.array(g["o_orderkey"].to_numpy()[keep], pa.int64()),
            "gap_us": pa.array(gap[keep], pa.int64()),
        })

    return (
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderkey", "o_orderdate"])
        .map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(gaps, batch_format="pandas")
    )


# Per-stratum sampling rates (permille) for stratified_sample: higher
# priorities keep more rows — the "rebalance the mixture" knob.
STRATA_PERMILLE = {
    "1-URGENT": 400,
    "2-HIGH": 250,
    "3-MEDIUM": 150,
    "4-NOT SPECIFIED": 100,
    "5-LOW": 50,
}
_KNUTH = 2654435761  # Knuth multiplicative hash constant (golden-ratio)


def stratified_sample(sf_dir: str) -> "rd.Dataset":
    """o_orderkey, o_orderpriority, o_totalprice_cents — deterministic
    STRATIFIED sample: each stratum (order priority) keeps a different
    fraction of its rows, selected by a stable integer hash — the
    source-mixture rebalancing primitive (vs ``systematic_sample``'s single
    global rate).

    The hash is Knuth's multiplicative scheme ``(key·2654435761) mod 2^32``
    — pure integer arithmetic, so it is bit-identical in numpy and ANSI SQL
    (no md5 per-row loop) and the whole operator is a shuffle-free
    vectorized filter: sampling 100 TB touches each block exactly once and
    moves nothing.  The key is reduced mod 2^32 BEFORE the multiply (the
    product then fits 64 unsigned bits on both engines — mathematically
    identical mod 2^32, but an unreduced int64 multiply would wrap
    differently than SQL for keys above ~3.5e9, i.e. exactly the 100-TB
    key range)."""
    strata = list(STRATA_PERMILLE)
    quotas = np.array([STRATA_PERMILLE[s] for s in strata], dtype=np.int64)

    def f(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        prio = np.asarray(batch.column("o_orderpriority"))
        quota = np.select([prio == s for s in strata], quotas, default=0)
        h = ((keys.astype(np.uint64) % np.uint64(1 << 32))
             * np.uint64(_KNUTH)) % np.uint64(1 << 32)
        keep = (h % np.uint64(1000)).astype(np.int64) < quota
        return pa.table({
            "o_orderkey": pa.array(keys[keep], pa.int64()),
            "o_orderpriority": pa.array(prio[keep], pa.string()),
            "o_totalprice_cents": _cents(
                pa.array(batch.column("o_totalprice").to_numpy(
                    zero_copy_only=False)[keep])),
        })

    return read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"]) \
        .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def mode_segment(sf_dir: str) -> "rd.Dataset":
    """c_nationkey, top_segment, n_customers — per-group MODE/argmax: each
    nation's most common market segment (ties break to the lexicographically
    smallest segment, so the result is deterministic).

    Two-level plan: per-batch partial (nation, segment) counts collapse each
    block to ≤ |nations|×|segments| rows before the shuffle, the global
    groupby sums partials, and the tiny per-nation argmax runs as
    ``map_groups`` — the exchange carries counter rows only, never
    customers, so cardinality at 100 TB is bounded by the key-pair count."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_nationkey": batch.column("c_nationkey").to_numpy(
                zero_copy_only=False),
            "c_mktsegment": np.asarray(batch.column("c_mktsegment")),
        })
        g = df.groupby(["c_nationkey", "c_mktsegment"], as_index=False).size()
        return pa.table({
            "c_nationkey": pa.array(g["c_nationkey"].to_numpy(), pa.int64()),
            "c_mktsegment": pa.array(g["c_mktsegment"], pa.string()),
            "p_n": pa.array(g["size"].to_numpy(), pa.int64()),
        })

    def argmax(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["n_customers", "c_mktsegment"],
                          ascending=[False, True])
        top = g.iloc[0]
        return pa.table({
            "c_nationkey": pa.array([int(top["c_nationkey"])], pa.int64()),
            "top_segment": pa.array([str(top["c_mktsegment"])], pa.string()),
            "n_customers": pa.array([int(top["n_customers"])], pa.int64()),
        })

    return (
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey", "c_mktsegment"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Sum("p_n", alias_name="n_customers"))
        .groupby("c_nationkey")
        .map_groups(argmax, batch_format="pandas")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
_DAY_US = 86_400_000_000


def pivot_events(sf_dir: str) -> "rd.Dataset":
    """day_us, n_click, n_error, n_purchase, n_signup, n_view — PIVOT: the
    event log turned into one row per UTC day with a count column per event
    type (the long→wide reshape; the column set is the fixed known type
    vocabulary, as pivot requires).

    Per-batch partial pivot (vectorized indicator sums per day) collapses
    each block to ≤ |days| rows carrying 5 counters; the single groupby sums
    partials — at 100 TB the exchange is days × 6 ints, independent of event
    count."""

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        day = (us // _DAY_US) * _DAY_US
        et = np.asarray(batch.column("event_type"))
        days, inv = np.unique(day, return_inverse=True)
        cols = {"day_us": pa.array(days, pa.int64())}
        for t in EVENT_TYPES:
            cnt = np.bincount(inv, weights=(et == t), minlength=len(days))
            cols[f"n_{t}"] = pa.array(cnt.astype(np.int64), pa.int64())
        return pa.table(cols)

    return (
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day_us")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES])
    )
