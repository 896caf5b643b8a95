#!/usr/bin/env python3
"""Prototype: express graft's 64-bit hash kernels (FNV-1a + avalanche,
simhash, shingle/minhash, hyperplane LSH) in pure DuckDB SQL and check
them byte-for-byte against a Python port of the Scala expressions.
Builder-side experiment only."""
import duckdb, sys

M64 = 1 << 64
MASK = M64 - 1

# ---- python port of the Scala kernels (unsigned mod 2^64 domain) ----

def fnv(s: str) -> int:
    h = 0xcbf29ce484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001b3) & MASK
    return h

def avalanche(x: int) -> int:
    h = x & MASK
    h ^= h >> 33
    h = (h * 0xff51afd7ed558ccd) & MASK
    h ^= h >> 33
    h = (h * 0xc4ceb9fe1a85ec53) & MASK
    h ^= h >> 33
    return h

def hash64(s: str) -> int:
    return avalanche(fnv(s))

def to_signed(x: int) -> int:
    return x - M64 if x >= (1 << 63) else x

def simhash64(toks):
    votes = [0] * 64
    for t in toks:
        h = hash64(t)
        for k in range(64):
            votes[k] += 1 if (h >> k) & 1 else -1
    sig = 0
    for k in range(64):
        if votes[k] > 0:
            sig |= 1 << k
    return to_signed(sig)

GOLD = 0x9e3779b97f4a7c15
C1 = 0xff51afd7ed558ccd

def mix(a: int, b: int) -> int:
    return avalanche(((a * GOLD) + b) & MASK)

def shingle_hashes(text: str, n=3):
    toks = [t for t in text.split() if t]
    out = set()
    for i in range(len(toks) - n + 1):
        h = GOLD
        for k in range(n):
            h = mix(h, hash64(toks[i + k]))
        out.add(to_signed(h))
    return sorted(out)

def minhash_bands(sh_signed, bands=4, rows=4):
    nh = bands * rows
    minima = [(1 << 63) - 1] * nh  # signed Long.MaxValue
    for s in sh_signed:
        su = s & MASK
        for k in range(nh):
            h = to_signed(avalanche((su + (k + 1) * GOLD) & MASK))
            if h < minima[k]:
                minima[k] = h
    out = []
    for b in range(bands):
        h = 0xcbf29ce484222325
        for r in range(rows):
            h = mix(h, minima[b * rows + r] & MASK)
        out.append(to_signed(h))
    return out

def plane_component(p: int, d: int) -> float:
    h = avalanche(((p + 1) * GOLD + (d + 1) * C1) & MASK)
    return ((h >> 11) / float(1 << 52)) * 2.0 - 1.0

def hyperplane_bucket(v, planes=6) -> int:
    bucket = 0
    for p in range(planes):
        proj = 0.0
        for i, x in enumerate(v):
            proj += float(x) * plane_component(p, i)
        if proj >= 0:
            bucket |= 1 << p
    return bucket

# ---- SQL snippet builders (mirror what the Scala oracleSql will emit) ----

def sql_mulmod(h, c):
    """(h * c) mod 2^64 for HUGEINT h < 2^64 and 64-bit constant c."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (f"((({h}) * {lo}::HUGEINT + "
            f"(((({h}) % 4294967296) * {hi}::HUGEINT) % 4294967296) * 4294967296)"
            f" % 18446744073709551616::HUGEINT)")

def sql_xorshift33(x):
    return f"xor(({x}), ({x}) // 8589934592::HUGEINT)"

def sql_avalanche(x):
    # needs x materialized (no side effects) — expand via nested replace
    a = sql_xorshift33(x)
    b = sql_mulmod(a, 0xff51afd7ed558ccd)
    c = sql_xorshift33(b)
    d = sql_mulmod(c, 0xc4ceb9fe1a85ec53)
    return sql_xorshift33(d)

def sql_fnv(tok):
    """FNV-1a over the chars of an ASCII token expression."""
    return (f"list_reduce(list_prepend(14695981039346656037::HUGEINT, "
            f"list_transform(range(1, length({tok})+1), "
            f"i -> CAST(unicode(({tok})[i]) AS HUGEINT))), "
            f"(h, b) -> (xor(h, b) * 1099511628211::HUGEINT) "
            f"% 18446744073709551616::HUGEINT)")

def sql_hash64(tok):
    return sql_avalanche(sql_fnv(tok))

def sql_to_signed(x):
    return (f"CAST(CASE WHEN ({x}) >= 9223372036854775808::HUGEINT "
            f"THEN ({x}) - 18446744073709551616::HUGEINT ELSE ({x}) END AS BIGINT)")

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")

    # 1. token hash64 on first tokens of each doc
    rows = con.execute(
        "SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS toks FROM documents ORDER BY doc_id").fetchall()
    print(f"docs: {len(rows)}")

    h64 = sql_hash64("t")
    q = (f"SELECT doc_id, list_transform("
         f"list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0), "
         f"t -> {sql_to_signed(h64)}) AS hs FROM documents ORDER BY doc_id")
    sql_hashes = {r[0]: r[1] for r in con.execute(q).fetchall()}
    bad = 0
    for doc_id, toks in rows:
        exp = [to_signed(hash64(t)) for t in toks]
        if sql_hashes[doc_id] != exp:
            bad += 1
            if bad < 3:
                print(f"hash64 MISMATCH doc {doc_id}: {sql_hashes[doc_id][:3]} vs {exp[:3]}")
    print(f"hash64: {'OK' if bad == 0 else f'{bad} mismatches'}")

    # 2. simhash64 per doc
    pows = ", ".join(str(1 << k) + "::HUGEINT" for k in range(64))
    sig = (f"list_sum(list_transform([{pows}], p -> CASE WHEN "
           f"2 * len(list_filter(hs, h -> (h // p) % 2 = 1)) > len(hs) "
           f"THEN p ELSE 0::HUGEINT END))")
    q2 = (f"WITH t AS (SELECT doc_id, list_transform("
          f"list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0), "
          f"t -> {h64}) AS hs FROM documents) "
          f"SELECT doc_id, {sql_to_signed(f'coalesce({sig}, 0)')} AS fp FROM t ORDER BY doc_id")
    sql_sims = {r[0]: r[1] for r in con.execute(q2).fetchall()}
    bad = 0
    for doc_id, toks in rows:
        if sql_sims[doc_id] != simhash64(toks):
            bad += 1
    print(f"simhash64: {'OK' if bad == 0 else f'{bad} mismatches'}")

if __name__ == "__main__":
    main()
