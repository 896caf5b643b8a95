#!/usr/bin/env python3
"""Prototype 2: staged-CTE DuckDB SQL for the minhash-LSH and hyperplane
ANN pipelines, validated against Python ports of the Scala kernels.
Stages avalanche/mix through projected columns so SQL size stays linear."""
import duckdb, sys
from proto_oracle import (M64, MASK, hash64, to_signed, GOLD, C1, mix,
                          shingle_hashes, minhash_bands, plane_component,
                          hyperplane_bucket, sql_fnv, sql_avalanche,
                          sql_to_signed)

FNV_SEED = 0xcbf29ce484222325
C2 = 0xc4ceb9fe1a85ec53


def mulmod_sql(h, c):
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (f"((({h}) * {lo}::HUGEINT + "
            f"(((({h}) % 4294967296) * {hi}::HUGEINT) % 4294967296) * 4294967296)"
            f" % 18446744073709551616::HUGEINT)")


def xs33(x):
    return f"xor(({x}), ({x}) // 8589934592::HUGEINT)"


def staged_avalanche(prev_cte, in_col, out_col, keep, tag):
    """Chain of 5 one-column CTE stages computing out_col=avalanche(in_col).
    Returns (sql_fragment, last_cte_name)."""
    ks = ", ".join(keep)
    s = []
    a, b, c, d = f"_{tag}a", f"_{tag}b", f"_{tag}c", f"_{tag}d"
    s.append(f"{a} AS (SELECT {ks}, {xs33(in_col)} AS {a}v FROM {prev_cte})")
    s.append(f"{b} AS (SELECT {ks}, {mulmod_sql(a + 'v', 0xff51afd7ed558ccd)} AS {b}v FROM {a})")
    s.append(f"{c} AS (SELECT {ks}, {xs33(b + 'v')} AS {c}v FROM {b})")
    s.append(f"{d} AS (SELECT {ks}, {mulmod_sql(c + 'v', 0xc4ceb9fe1a85ec53)} AS {d}v FROM {c})")
    s.append(f"_{tag}e AS (SELECT {ks}, {xs33(d + 'v')} AS {out_col} FROM {d})")
    return ",\n".join(s), f"_{tag}e"


def staged_mix(prev_cte, a_col, b_col, out_col, keep, tag):
    """mix(a,b) = avalanche((a*GOLD + b) mod 2^64), staged."""
    ks = ", ".join(keep)
    pre = (f"_{tag}m AS (SELECT {ks}, ({mulmod_sql(a_col, GOLD)} + {b_col}) "
           f"% 18446744073709551616::HUGEINT AS _{tag}mv FROM {prev_cte})")
    av, last = staged_avalanche(f"_{tag}m", f"_{tag}mv", out_col, keep, tag)
    return pre + ",\n" + av, last


TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0)"
H64 = sql_avalanche(sql_fnv("t"))


def shingle_sql():
    """CTE chain: documents -> (doc_id, sh) with sh = sorted distinct signed
    shingle hashes (n=3), matching ShingleHash.shingleHashes."""
    parts = [
        f"_hs AS (SELECT doc_id, list_transform({TOKS}, t -> {H64}) AS hs FROM documents)",
        # one row per shingle start position i (1-based; needs len >= 3)
        "_sp AS (SELECT doc_id, unnest(range(1, len(hs) - 1)) AS i, hs FROM _hs WHERE len(hs) >= 3)",
        "_s0 AS (SELECT doc_id, i, hs[i] AS t1, hs[i+1] AS t2, hs[i+2] AS t3 FROM _sp)",
    ]
    m1, last = staged_mix("_s0", str(GOLD) + "::HUGEINT", "t1", "m1", ["doc_id", "i", "t2", "t3"], "x1")
    parts.append(m1)
    m2, last = staged_mix(last, "m1", "t2", "m2", ["doc_id", "i", "t3"], "x2")
    parts.append(m2)
    m3, last = staged_mix(last, "m2", "t3", "m3", ["doc_id", "i"], "x3")
    parts.append(m3)
    parts.append(
        f"_sh AS (SELECT doc_id, list_sort(list(DISTINCT {sql_to_signed('m3')})) AS sh "
        f"FROM {last} GROUP BY doc_id)")
    return ",\n".join(parts)


def minhash_sql():
    """CTE chain (after _sh): banded (doc_id, band, bucket) matching
    ShingleHash.minhashBands(sh, 4, 4)."""
    parts = [
        # unsigned shingle values, one row per (doc, shingle, k) hash index
        "_su AS (SELECT doc_id, CASE WHEN s < 0 THEN s + 18446744073709551616::HUGEINT "
        "ELSE s::HUGEINT END AS su FROM (SELECT doc_id, unnest(sh) AS s FROM _sh))",
        f"_mk AS (SELECT doc_id, su, unnest(range(1, 17)) AS k FROM _su)",
        f"_m0 AS (SELECT doc_id, k, (su + (k::HUGEINT * {GOLD}::HUGEINT) "
        f"% 18446744073709551616::HUGEINT) % 18446744073709551616::HUGEINT AS hv FROM _mk)",
    ]
    av, last = staged_avalanche("_m0", "hv", "ph", ["doc_id", "k"], "mh")
    parts.append(av)
    parts.append(
        f"_min AS (SELECT doc_id, k, min({sql_to_signed('ph')}) AS mn FROM {last} GROUP BY doc_id, k)")
    # minima list ordered by k (k = 1..16); band b uses minima[b*4+1 .. b*4+4]
    parts.append("_ml AS (SELECT doc_id, list(mn ORDER BY k) AS ml FROM _min GROUP BY doc_id)")
    parts.append("_bb AS (SELECT doc_id, unnest(range(0, 4)) AS band, ml FROM _ml)")
    parts.append(
        "_b0 AS (SELECT doc_id, band, "
        "CASE WHEN ml[band*4+1] < 0 THEN ml[band*4+1] + 18446744073709551616::HUGEINT ELSE ml[band*4+1]::HUGEINT END AS v1, "
        "CASE WHEN ml[band*4+2] < 0 THEN ml[band*4+2] + 18446744073709551616::HUGEINT ELSE ml[band*4+2]::HUGEINT END AS v2, "
        "CASE WHEN ml[band*4+3] < 0 THEN ml[band*4+3] + 18446744073709551616::HUGEINT ELSE ml[band*4+3]::HUGEINT END AS v3, "
        "CASE WHEN ml[band*4+4] < 0 THEN ml[band*4+4] + 18446744073709551616::HUGEINT ELSE ml[band*4+4]::HUGEINT END AS v4 "
        "FROM _bb)")
    f1, last = staged_mix("_b0", str(FNV_SEED) + "::HUGEINT", "v1", "f1", ["doc_id", "band", "v2", "v3", "v4"], "b1")
    parts.append(f1)
    f2, last = staged_mix(last, "f1", "v2", "f2", ["doc_id", "band", "v3", "v4"], "b2")
    parts.append(f2)
    f3, last = staged_mix(last, "f2", "v3", "f3", ["doc_id", "band", "v4"], "b3")
    parts.append(f3)
    f4, last = staged_mix(last, "f3", "v4", "f4", ["doc_id", "band"], "b4")
    parts.append(f4)
    parts.append(f"_banded AS (SELECT doc_id, band, {sql_to_signed('f4')} AS bucket FROM {last})")
    return ",\n".join(parts)


def plane_sql():
    """(p, pcs): hyperplane component lists, pcs[i+1] = planeComponent(p, i)."""
    parts = [
        "_pd AS (SELECT p, i, ((p+1)::HUGEINT * " + str(GOLD) + "::HUGEINT "
        "+ (i+1)::HUGEINT * " + str(C1) + "::HUGEINT) % 18446744073709551616::HUGEINT AS seed "
        "FROM (SELECT unnest(range(0, 6)) AS p), (SELECT unnest(range(0, 64)) AS i))",
    ]
    av, last = staged_avalanche("_pd", "seed", "ph", ["p", "i"], "pl")
    parts.append(av)
    parts.append(
        f"_pc AS (SELECT p, i, (CAST(ph // 2048 AS DOUBLE) / 4503599627370496.0) * 2.0 - 1.0 AS pc FROM {last})")
    parts.append("_pcs AS (SELECT p, list(pc ORDER BY i) AS pcs FROM _pc GROUP BY p)")
    return ",\n".join(parts)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")

    docs = con.execute(
        f"SELECT doc_id, {TOKS} FROM documents ORDER BY doc_id").fetchall()

    # --- shingle hashes ---
    q = "WITH " + shingle_sql() + " SELECT doc_id, sh FROM _sh ORDER BY doc_id"
    got = {r[0]: r[1] for r in con.execute(q).fetchall()}
    bad = 0
    for doc_id, toks in docs:
        exp = shingle_hashes(" ".join(toks))
        if exp and got.get(doc_id) != exp:
            bad += 1
            if bad <= 2:
                print(f"shingle MISMATCH {doc_id}: sql={got.get(doc_id)[:2] if got.get(doc_id) else None} py={exp[:2]}")
    print(f"shingle_hashes: {'OK' if bad == 0 else f'{bad} bad'} ({len(got)} docs with shingles)")

    # --- minhash bands ---
    q2 = ("WITH " + shingle_sql() + ",\n" + minhash_sql() +
          " SELECT doc_id, band, bucket FROM _banded ORDER BY doc_id, band")
    got2 = {}
    for doc_id, band, bucket in con.execute(q2).fetchall():
        got2.setdefault(doc_id, []).append(bucket)
    bad = 0
    for doc_id, toks in docs:
        sh = shingle_hashes(" ".join(toks))
        if not sh:
            continue
        exp = minhash_bands(sh)
        if got2.get(doc_id) != exp:
            bad += 1
            if bad <= 2:
                print(f"minhash MISMATCH {doc_id}: sql={got2.get(doc_id)} py={exp}")
    print(f"minhash_bands: {'OK' if bad == 0 else f'{bad} bad'}")

    # --- hyperplane buckets ---
    q3 = ("WITH " + plane_sql() + ", _v AS (SELECT vec_id, embedding FROM embeddings), "
          "_proj AS (SELECT vec_id, p, list_reduce(list_prepend(0.0, "
          "list_transform(range(1, 1 + len(embedding)), "
          "i -> CAST(embedding[i] AS DOUBLE) * pcs[i])), (a, b) -> a + b) AS proj "
          "FROM _v, _pcs) "
          "SELECT vec_id, CAST(sum(CASE WHEN proj >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket "
          "FROM _proj GROUP BY vec_id ORDER BY vec_id")
    got3 = {r[0]: r[1] for r in con.execute(q3).fetchall()}
    vecs = con.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    bad = 0
    for vec_id, emb in vecs:
        if got3[vec_id] != hyperplane_bucket(emb):
            bad += 1
            if bad <= 2:
                print(f"bucket MISMATCH {vec_id}: sql={got3[vec_id]} py={hyperplane_bucket(emb)}")
    print(f"hyperplane_bucket: {'OK' if bad == 0 else f'{bad} bad'} ({len(vecs)} vecs)")


if __name__ == "__main__":
    main()
