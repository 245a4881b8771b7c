"""Generate a ~10x scale tier from the driver's sf0.1 parquet tables.

The driver ships sf{0.001,0.01,0.1} only; the 100-TB argument needs at
least one measured scaling point beyond sf0.1. This tool replicates each
fact table N times (default 10 -> "sf1") with per-copy key shifts so that

* join fan-out stays constant per copy (custkey/orderkey/partkey/suppkey
  shift together across customer/orders/lineitem/part/supplier),
* group-by cardinality on keyed columns grows linearly while date/derived
  groups densify linearly — both realistic scale-up modes,
* dedup/similarity workloads stay honest: document text is perturbed per
  copy (a copy-tag token appended, n_chars recomputed) and embeddings get
  a small deterministic per-copy rotation, so the scaled corpus is not 10
  identical copies (which would blow every LSH bucket quadratically by
  construction of the DATA, not the algorithm).

Dimension tables (region, nation) keep one copy — their keys are the FK
vocabulary, exactly as TPC-H scale factors behave.

Deterministic: no RNG, shifts and perturbations derive from (copy, id).
Output dir defaults to /root/repo/.scale/sf1 (gitignored).

Usage: python tools/make_scale_data.py [--copies 10] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# Key strides: one per key family, larger than the max key at sf0.1 so
# shifted copies never collide; powers of ten keep md5/hash bucketing
# uniform and shifted IDs human-readable (copy = id // stride).
STRIDE = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def _copy_sql(table: str, select: str, copies: int, out: str) -> None:
    sql = f"""
    COPY (
      SELECT {select}
      FROM read_parquet('{SRC}/{table}.parquet'), range({copies}) t(i)
    ) TO '{out}/{table}.parquet' (FORMAT PARQUET)
    """
    duckdb.sql(sql)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale",
            "sf1",
        ),
    )
    args = ap.parse_args()
    n, out = args.copies, args.out
    os.makedirs(out, exist_ok=True)

    # dims: single copy
    for t in ("region", "nation"):
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    _copy_sql(
        "customer",
        f"c_custkey + i*{STRIDE['custkey']} AS c_custkey,"
        " c_name, c_nationkey, c_acctbal, c_mktsegment",
        n,
        out,
    )
    _copy_sql(
        "supplier",
        f"s_suppkey + i*{STRIDE['suppkey']} AS s_suppkey,"
        " s_name, s_nationkey, s_acctbal",
        n,
        out,
    )
    _copy_sql(
        "part",
        f"p_partkey + i*{STRIDE['partkey']} AS p_partkey,"
        " p_name, p_brand, p_type, p_size, p_retailprice",
        n,
        out,
    )
    _copy_sql(
        "orders",
        f"o_orderkey + i*{STRIDE['orderkey']} AS o_orderkey,"
        f" o_custkey + i*{STRIDE['custkey']} AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
        n,
        out,
    )
    _copy_sql(
        "lineitem",
        f"l_orderkey + i*{STRIDE['orderkey']} AS l_orderkey,"
        f" l_partkey + i*{STRIDE['partkey']} AS l_partkey,"
        f" l_suppkey + i*{STRIDE['suppkey']} AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate",
        n,
        out,
    )
    _copy_sql(
        "events",
        f"event_id + i*{STRIDE['event_id']} AS event_id, ts,"
        f" user_id + i*{STRIDE['user_id']} AS user_id,"
        " event_type, value, props",
        n,
        out,
    )
    # documents: perturb text per copy (copy 0 byte-identical to source)
    # and recompute n_chars so text-derived stats stay consistent.
    _copy_sql(
        "documents",
        f"doc_id + i*{STRIDE['doc_id']} AS doc_id,"
        " CASE WHEN i = 0 THEN text"
        "      ELSE text || ' rev' || CAST(i AS VARCHAR)"
        "                 || 'x' || CAST(doc_id % 97 AS VARCHAR) END AS text,"
        " lang, source,"
        " CASE WHEN i = 0 THEN n_chars"
        "      ELSE length(text || ' rev' || CAST(i AS VARCHAR)"
        "                 || 'x' || CAST(doc_id % 97 AS VARCHAR)) END"
        " AS n_chars",
        n,
        out,
    )

    # embeddings: numpy perturbation (deterministic, per (copy, vec_id)).
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = tbl.column("vec_id").to_numpy()
    labels = tbl.column("label").to_numpy()
    emb = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    out_ids, out_labels, out_vecs = [], [], []
    for i in range(n):
        if i == 0:
            pert = emb
        else:
            # Small deterministic offset: distinct per copy and vector,
            # magnitude ~1e-2 so copies are near but not exact neighbors.
            phase = ((vec_ids[:, None] * 31 + i * 7 + np.arange(dim)[None, :]) % 13) - 6
            pert = emb + phase.astype(np.float32) * 2e-3
        out_ids.append(vec_ids + i * STRIDE["vec_id"])
        out_labels.append(labels)
        out_vecs.append(pert)
    all_vecs = np.concatenate(out_vecs)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(all_vecs.reshape(-1), type=pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    scaled = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "embedding": arr,
            "label": pa.array(np.concatenate(out_labels), type=pa.int32()),
        }
    )
    pq.write_table(scaled, f"{out}/embeddings.parquet")

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        c = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {c} rows")


if __name__ == "__main__":
    main()
