package graft.operators

/**
 * DuckDB-SQL reformulations of the 64-bit hash kernels
 * (graft.functions.{ShingleHash, SimHash64, VectorFunctions}) so the
 * LSH / ANN / simhash queries get full value-level oracle rows instead
 * of rows-only checks.
 *
 * DuckDB BIGINTs overflow-check rather than wrap, so the mod-2⁶⁴
 * arithmetic runs in HUGEINT (128-bit) with explicit `% 2⁶⁴`
 * reductions; each 64×64 multiplication splits the constant 32/32 so
 * no intermediate exceeds 128 bits. Avalanche/mix chains are staged
 * through projected CTE columns — inlining them would nest each input
 * subexpression ~72× (exponential SQL blowup); as one-column stages
 * the SQL size stays linear in chain length.
 *
 * Corpus assumptions (validated by the gate itself — any drift turns
 * the row red, it cannot pass silently): documents are printable
 * ASCII, so DuckDB `unicode(char)` == the UTF-8 byte the Scala kernels
 * hash, and RE2 `\s` == the kernels' isSpace class (the corpus has no
 * vertical tabs or non-ASCII whitespace; checked per round).
 */
object HashOracleSql {

  private val M64 = "18446744073709551616::HUGEINT" // 2^64
  private val Gold = BigInt("9e3779b97f4a7c15", 16) // golden-ratio odd
  private val C1 = BigInt("ff51afd7ed558ccd", 16) // avalanche const 1
  private val C2 = BigInt("c4ceb9fe1a85ec53", 16) // avalanche const 2
  private val FnvSeed = BigInt("cbf29ce484222325", 16)
  private val FnvPrime = BigInt("100000001b3", 16)

  /** (h * c) mod 2⁶⁴ for HUGEINT h < 2⁶⁴ and 64-bit constant c: split c
   * into 32-bit halves so every partial product fits HUGEINT. */
  private def mulmod(h: String, c: BigInt): String = {
    val hi = c >> 32
    val lo = c & 0xFFFFFFFFL
    s"((($h) * ${lo}::HUGEINT + (((($h) % 4294967296) * ${hi}::HUGEINT)" +
      s" % 4294967296) * 4294967296) % $M64)"
  }

  /** x XOR (x >>> 33) — the avalanche xorshift (2^33 = 8589934592). */
  private def xs33(x: String): String =
    s"xor(($x), ($x) // 8589934592::HUGEINT)"

  /** FNV-1a over the chars of an ASCII token expression `tok`. */
  private def fnv(tok: String): String =
    s"list_reduce(list_prepend(${FnvSeed}::HUGEINT, " +
      s"list_transform(range(1, length($tok)+1), " +
      s"i -> CAST(unicode(($tok)[i]) AS HUGEINT))), " +
      s"(h, b) -> (xor(h, b) * ${FnvPrime}::HUGEINT) % $M64)"

  /** Unsigned HUGEINT in [0, 2⁶⁴) → two's-complement signed BIGINT. */
  private def toSigned(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808::HUGEINT " +
      s"THEN ($x) - $M64 ELSE ($x) END AS BIGINT)"

  /** Signed BIGINT column → unsigned HUGEINT in [0, 2⁶⁴). */
  private def toUnsigned(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN ($x) + $M64 ELSE ($x)::HUGEINT END)"

  /** ASCII whitespace tokenizer — TextFunctions.tokens' `\s+` split. */
  private val Toks =
    """list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0)"""

  /** CTE stages computing out = avalanche(in) via 5 one-column hops.
   * Returns (cte list sql, last cte name). `keep` = carried columns. */
  private def stagedAvalanche(prev: String, in: String, out: String,
      keep: Seq[String], tag: String): (String, String) = {
    val ks = keep.mkString(", ")
    val (a, b, c, d, e) =
      (s"_${tag}a", s"_${tag}b", s"_${tag}c", s"_${tag}d", s"_${tag}e")
    val sql = Seq(
      s"$a AS (SELECT $ks, ${xs33(in)} AS ${a}v FROM $prev)",
      s"$b AS (SELECT $ks, ${mulmod(a + "v", C1)} AS ${b}v FROM $a)",
      s"$c AS (SELECT $ks, ${xs33(b + "v")} AS ${c}v FROM $b)",
      s"$d AS (SELECT $ks, ${mulmod(c + "v", C2)} AS ${d}v FROM $c)",
      s"$e AS (SELECT $ks, ${xs33(d + "v")} AS $out FROM $d)"
    ).mkString(",\n")
    (sql, e)
  }

  /** out = mix(a, b) = avalanche((a*GOLD + b) mod 2⁶⁴), staged. */
  private def stagedMix(prev: String, aCol: String, bCol: String,
      out: String, keep: Seq[String], tag: String): (String, String) = {
    val ks = keep.mkString(", ")
    val pre = s"_${tag}m AS (SELECT $ks, (${mulmod(aCol, Gold)} + $bCol) " +
      s"% $M64 AS _${tag}mv FROM $prev)"
    val (av, last) = stagedAvalanche(s"_${tag}m", s"_${tag}mv", out, keep, tag)
    (pre + ",\n" + av, last)
  }

  /** CTE chain ending in `_hs<tag>(doc_id, hs)`: hs = per-token
   * hash64(t) = avalanche(fnv1a(t)) list in token order (unsigned
   * HUGEINT), matching ShingleHash.hashRange / SimHash64.hash64.
   * Tokens are unnested to rows so the FNV char fold is computed ONCE
   * per token as a projected column and avalanched through the staged
   * CTEs — inlining the fold inside a transform lambda re-evaluates it
   * ~32× per hash (each avalanche stage duplicates its argument).
   * Every doc_id survives (LEFT JOIN back): zero-token docs carry []. */
  private def tokenHashCtes(tag: String): (String, String) = {
    val (av, last) =
      stagedAvalanche(s"_tf$tag", "fv", "h64", Seq("doc_id", "pos"), s"tk$tag")
    val sql = Seq(
      s"_tks$tag AS (SELECT doc_id, $Toks AS toks FROM documents)",
      s"_tok$tag AS (SELECT doc_id, unnest(toks) AS t, " +
        s"unnest(range(1, len(toks)+1)) AS pos FROM _tks$tag)",
      s"_tf$tag AS (SELECT doc_id, pos, ${fnv("t")} AS fv FROM _tok$tag)",
      av,
      s"_hs0$tag AS (SELECT doc_id, list(h64 ORDER BY pos) AS hs " +
        s"FROM $last GROUP BY doc_id)",
      s"_hs$tag AS (SELECT d.doc_id, coalesce(h.hs, []) AS hs " +
        s"FROM documents d LEFT JOIN _hs0$tag h USING (doc_id))"
    ).mkString(",\n")
    (sql, s"_hs$tag")
  }

  /** CTE chain: documents → `_sh(doc_id, sh)`, sh = sorted distinct
   * signed word-3-shingle hashes — ShingleHash.shingleHashes(text, 3). */
  private def shingleCtes: String = {
    val parts = Seq.newBuilder[String]
    val (tokSql, hsName) = tokenHashCtes("s")
    parts += tokSql
    // one row per 1-based shingle start i; needs >= 3 tokens
    parts += "_sp AS (SELECT doc_id, unnest(range(1, len(hs) - 1)) AS i, " +
      s"hs FROM $hsName WHERE len(hs) >= 3)"
    parts += "_s0 AS (SELECT doc_id, i, hs[i] AS t1, hs[i+1] AS t2, " +
      "hs[i+2] AS t3 FROM _sp)"
    val (m1, l1) = stagedMix("_s0", s"$Gold::HUGEINT", "t1", "m1",
      Seq("doc_id", "i", "t2", "t3"), "x1")
    parts += m1
    val (m2, l2) = stagedMix(l1, "m1", "t2", "m2", Seq("doc_id", "i", "t3"), "x2")
    parts += m2
    val (m3, l3) = stagedMix(l2, "m2", "t3", "m3", Seq("doc_id", "i"), "x3")
    parts += m3
    parts += s"_sh AS (SELECT doc_id, list_sort(list(DISTINCT ${toSigned("m3")})) " +
      s"AS sh FROM $l3 GROUP BY doc_id)"
    parts.result().mkString(",\n")
  }

  /** CTE chain (after [[shingleCtes]]): `_banded(doc_id, band, bucket)`
   * — ShingleHash.minhashBands(sh, 4, 4) posexploded. */
  private def minhashCtes: String = {
    val parts = Seq.newBuilder[String]
    parts += "_su AS (SELECT doc_id, " + toUnsigned("s") + " AS su " +
      "FROM (SELECT doc_id, unnest(sh) AS s FROM _sh))"
    parts += "_mk AS (SELECT doc_id, su, unnest(range(1, 17)) AS k FROM _su)"
    parts += s"_m0 AS (SELECT doc_id, k, (su + (k::HUGEINT * $Gold::HUGEINT) " +
      s"% $M64) % $M64 AS hv FROM _mk)"
    val (av, lAv) = stagedAvalanche("_m0", "hv", "ph", Seq("doc_id", "k"), "mh")
    parts += av
    parts += s"_min AS (SELECT doc_id, k, min(${toSigned("ph")}) AS mn " +
      s"FROM $lAv GROUP BY doc_id, k)"
    // minima ordered by k (1..16); band b folds minima[b*4+1 .. b*4+4]
    parts += "_ml AS (SELECT doc_id, list(mn ORDER BY k) AS ml FROM _min GROUP BY doc_id)"
    parts += "_bb AS (SELECT doc_id, unnest(range(0, 4)) AS band, ml FROM _ml)"
    parts += "_b0 AS (SELECT doc_id, band, " +
      (1 to 4).map(r => toUnsigned(s"ml[band*4+$r]") + s" AS v$r").mkString(", ") +
      " FROM _bb)"
    var last = "_b0"
    var acc = s"$FnvSeed::HUGEINT"
    for (r <- 1 to 4) {
      val keep = Seq("doc_id", "band") ++ ((r + 1) to 4).map(x => s"v$x")
      val (mx, l) = stagedMix(last, acc, s"v$r", s"f$r", keep, s"b$r")
      parts += mx
      last = l
      acc = s"f$r"
    }
    parts += s"_banded AS (SELECT doc_id, band, ${toSigned("f4")} AS bucket FROM $last)"
    parts.result().mkString(",\n")
  }

  /** CTE chain: `_fp(doc_id, fp)` — SimHash64 over whitespace tokens
   * (majority vote per bit over token hash64s; empty docs → 0). */
  private def simhashCtes: String = {
    val pows = (0 until 64).map(k => s"${BigInt(1) << k}::HUGEINT").mkString(", ")
    val sig = s"list_sum(list_transform([$pows], p -> CASE WHEN " +
      "2 * len(list_filter(hs, h -> (h // p) % 2 = 1)) > len(hs) " +
      "THEN p ELSE 0::HUGEINT END))"
    val (tokSql, hsName) = tokenHashCtes("f")
    tokSql + ",\n" +
      s"_fp AS (SELECT doc_id, ${toSigned(s"coalesce($sig, 0)")} AS fp FROM $hsName)"
  }

  /** CTE chain: `_pcs(p, pcs)` — hyperplane component lists,
   * pcs[i+1] = VectorFunctions planeComponent(p, i), 6 planes × 64 dims. */
  private def planeCtes: String = {
    val parts = Seq.newBuilder[String]
    parts += s"_pd AS (SELECT p, i, ((p+1)::HUGEINT * $Gold::HUGEINT " +
      s"+ (i+1)::HUGEINT * $C1::HUGEINT) % $M64 AS seed " +
      "FROM (SELECT unnest(range(0, 6)) AS p), (SELECT unnest(range(0, 64)) AS i))"
    val (av, last) = stagedAvalanche("_pd", "seed", "ph", Seq("p", "i"), "pl")
    parts += av
    // (h >>> 11) / 2^52 * 2 - 1 — top-53-bit uniform in [-1, 1)
    parts += "_pc AS (SELECT p, i, (CAST(ph // 2048 AS DOUBLE) / " +
      s"4503599627370496.0) * 2.0 - 1.0 AS pc FROM $last)"
    parts += "_pcs AS (SELECT p, list(pc ORDER BY i) AS pcs FROM _pc GROUP BY p)"
    parts.result().mkString(",\n")
  }

  /** `_bk(vec_id, bucket)` — hyperplane LSH signature per vector: bit
   * p = sign(v · h_p), sequential-fold projection like the kernel. */
  private def bucketCtes: String =
    planeCtes + ",\n" +
      "_proj AS (SELECT vec_id, p, list_reduce(list_prepend(0.0, " +
      "list_transform(range(1, 1 + len(embedding)), " +
      "i -> CAST(embedding[i] AS DOUBLE) * pcs[i])), (a, b) -> a + b) AS proj " +
      "FROM embeddings, _pcs),\n" +
      "_bk AS (SELECT vec_id, CAST(sum(CASE WHEN proj >= 0 THEN 1 << p " +
      "ELSE 0 END) AS BIGINT) AS bucket FROM _proj GROUP BY vec_id)"

  // ------------------------------------------------------- full queries

  /** Shared CTE chain ending in `_rr(id_a, id_b, n_inter, n_union)`:
   * banded minhash candidates → exact-Jaccard counts over the hashed
   * shingle sets (candidate survives when n_inter*2 >= n_union). */
  private def minhashPairCtes: String =
    s"""$shingleCtes,
$minhashCtes,
_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM _banded a JOIN _banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id),
_rr AS (
  SELECT p.id_a, p.id_b,
    len(list_intersect(sa.sh, sb.sh)) AS n_inter,
    len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS n_union
  FROM _pairs p
  JOIN _sh sa ON sa.doc_id = p.id_a
  JOIN _sh sb ON sb.doc_id = p.id_b)"""

  /** Oracle for Dedup.dedupMinhashLsh: banded minhash candidates →
   * exact-Jaccard rerank over the hashed shingle sets, j >= 0.5. */
  def minhashLsh: String =
    s"""WITH
$minhashPairCtes
SELECT id_a, id_b, round(CAST(n_inter AS DOUBLE) / n_union, 6) AS jaccard
FROM _rr WHERE n_inter * 2 >= n_union"""

  /** Oracle for Dedup.dedupClustersLsh: transitive closure (recursive
   * CTE) over the LSH near-dup pair graph — the same value-level pair
   * oracle as [[minhashLsh]], then min-reachable-id labeling. */
  def minhashLshClusters: String =
    s"""WITH RECURSIVE
$minhashPairCtes,
_lp AS (SELECT id_a, id_b FROM _rr WHERE n_inter * 2 >= n_union),
_edges AS (SELECT id_a AS a, id_b AS b FROM _lp
           UNION SELECT id_b, id_a FROM _lp),
_reach(a, b) AS (
  SELECT a, b FROM _edges
  UNION
  SELECT r.a, e.b FROM _reach r JOIN _edges e ON r.b = e.a)
SELECT a AS doc_id, least(a, min(b)) AS cluster_id
FROM _reach GROUP BY a"""

  /** Oracle for Dedup.dedupSimhash: 4×16-bit band blocking over the
   * simhash signature, Hamming <= 3 pairs. */
  def simhashPairs: String = {
    val bandDiv = "CASE band WHEN 0 THEN 1::HUGEINT WHEN 1 THEN 65536::HUGEINT " +
      "WHEN 2 THEN 4294967296::HUGEINT ELSE 281474976710656::HUGEINT END"
    s"""WITH
$simhashCtes,
_bands AS (SELECT doc_id, fp, ${toUnsigned("fp")} AS fpu,
  unnest(range(0, 4)) AS band FROM _fp),
_bb AS (SELECT doc_id, fp, band,
  CAST((fpu // ($bandDiv)) % 65536 AS BIGINT) AS bucket FROM _bands),
_cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS sa, b.fp AS sb
  FROM _bb a JOIN _bb b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM _cand WHERE bit_count(xor(sa, sb)) <= 3"""
  }

  /** Oracle for TextAnalysis.textFingerprintSimhash. */
  def simhashFingerprint: String =
    s"""WITH
$simhashCtes
SELECT doc_id, fp AS fp_simhash FROM _fp"""

  /** Oracle for Similarity.simAnnLsh: bucket + 1-bit multi-probe
   * candidates, exact cosine rerank, top 10 per query. */
  def annLsh: String = {
    val flips = (0 until 6).map(p => s"xor(b.bucket, ${1L << p})").mkString(", ")
    s"""WITH
$bucketCtes,
_probes AS (
  SELECT b.vec_id AS query_id,
    unnest([b.bucket, $flips]) AS bucket
  FROM _bk b WHERE b.vec_id < 5),
_cand AS (
  SELECT DISTINCT p.query_id, n.vec_id AS neighbor_id
  FROM _probes p JOIN _bk n USING (bucket)
  WHERE n.vec_id <> p.query_id),
_scored AS (
  SELECT c.query_id, c.neighbor_id,
    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                           CAST(v.embedding AS DOUBLE[])) AS cos
  FROM _cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings v ON v.vec_id = c.neighbor_id),
_ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
  ORDER BY cos DESC, neighbor_id) AS rank FROM _scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
  round(cos, 6) AS cos
FROM _ranked WHERE rank <= 10"""
  }

  /** One Lloyd assignment step as a CTE: rows of `src(vec_id, embedding)`
   * each mapped to the highest-cosine (tie: lowest cid) centroid in
   * `cent(cid, cvec)` — Similarity.ivfAssign / the fit loop's assign. */
  private def assignCte(name: String, src: String, cent: String): String =
    s"""$name AS (SELECT vec_id, embedding, cid FROM (
  SELECT s.vec_id, s.embedding, c.cid,
    row_number() OVER (PARTITION BY s.vec_id ORDER BY
      list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
                             CAST(c.cvec AS DOUBLE[])) DESC, c.cid) AS rn
  FROM $src s, $cent c) WHERE rn = 1)"""

  /** Centroid update as a CTE: per-dimension mean of assigned vectors,
   * rounded to float32 like the Spark side's asFloatArray — the cast
   * absorbs double-summation-order last-bit differences. */
  private def updateCte(name: String, assigned: String): String =
    s"""$name AS (SELECT cid, list_transform(list(m ORDER BY i),
    x -> CAST(x AS REAL)) AS cvec FROM (
  SELECT cid, i, avg(CAST(embedding[i] AS DOUBLE)) AS m FROM (
    SELECT cid, embedding, unnest(range(1, 1 + len(embedding))) AS i
    FROM $assigned) GROUP BY cid, i) GROUP BY cid)"""

  /** Oracle for Dedup.dedupSemantic: the SAME unrolled-Lloyd quantizer
   * as [[annIvf]] (identical seeds/rounds, so both engines agree on the
   * cell assignment bit-for-bit), then within-cell lower-id pairs at
   * cosine ≥ 0.4, keeper = argmax cosine with lowest-id tie-break. */
  def semDedup: String =
    s"""WITH
_samp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0),
_c0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid, embedding AS cvec
  FROM (SELECT * FROM _samp ORDER BY vec_id LIMIT 16)),
${assignCte("_a1", "_samp", "_c0")},
${updateCte("_c1", "_a1")},
${assignCte("_a2", "_samp", "_c1")},
${updateCte("_c2", "_a2")},
${assignCte("_lists", "embeddings", "_c2")},
_pairs AS (
  SELECT b.vec_id AS dup_id, a.vec_id AS keeper_id,
    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) AS cos
  FROM _lists a JOIN _lists b ON a.cid = b.cid AND a.vec_id < b.vec_id),
_best AS (SELECT *, row_number() OVER (PARTITION BY dup_id
    ORDER BY cos DESC, keeper_id) AS rn
  FROM _pairs WHERE cos >= 0.4)
SELECT dup_id, keeper_id, round(cos, 6) AS cos FROM _best WHERE rn = 1"""

  /** The shared IVF core: unrolled 2-round Lloyd on the 1/3 sample
   * (seeds = 16 lowest-id sample vectors), full-table assignment
   * (`_lists`), 3-probe cells per query (`_probes`) — reused verbatim
   * by [[annIvf]] and [[annIvfPq]] so the two oracles cannot drift. */
  private def ivfCoreCtes: String =
    s"""_samp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0),
_c0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid, embedding AS cvec
  FROM (SELECT * FROM _samp ORDER BY vec_id LIMIT 16)),
${assignCte("_a1", "_samp", "_c0")},
${updateCte("_c1", "_a1")},
${assignCte("_a2", "_samp", "_c1")},
${updateCte("_c2", "_a2")},
${assignCte("_lists", "embeddings", "_c2")},
_probes AS (SELECT query_id, cid FROM (
  SELECT e.vec_id AS query_id, c.cid,
    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                             CAST(c.cvec AS DOUBLE[])) DESC, c.cid) AS pr
  FROM embeddings e, _c2 c WHERE e.vec_id < 5) WHERE pr <= 3)"""

  /** Oracle for Similarity.simAnnIvf: the full DataFrame-native IVF —
   * deterministic seeds (16 lowest-id sample vectors), 2 unrolled Lloyd
   * rounds on the 1/3 sample, full-table assignment, 3-probe search. */
  def annIvf: String =
    s"""WITH
$ivfCoreCtes,
_scored AS (
  SELECT p.query_id, l.vec_id AS neighbor_id,
    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                           CAST(l.embedding AS DOUBLE[])) AS cos
  FROM _probes p
  JOIN _lists l USING (cid)
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE l.vec_id <> p.query_id),
_ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
  ORDER BY cos DESC, neighbor_id) AS rank FROM _scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
  round(cos, 6) AS cos
FROM _ranked WHERE rank <= 10"""

  /** Oracle for Similarity.simAnnPq — the full spherical-PQ chain,
   * value-level: per-subspace (two 32-dim halves) unrolled 2-round
   * cosine-Lloyd codebook fits on the 1/3 sample (the [[annIvf]]
   * assign/update CTEs, parameterized by slice), full-table encoding
   * (= the same argmax CTE over the sliced table), per-query LUT
   * scores, approx = s0 + s1 (that addition order on both engines),
   * top-50 candidate cut by (approx DESC, neighbor_id), exact-cosine
   * rerank to top-10. Every float op is the shared bit-exact cosine
   * fold, so cos AND approx_score compare value-for-value. */
  def annPq: String = {
    s"""WITH
$pqSubCtes,
_pqapprox AS (
  SELECT l0.query_id, k0.vec_id AS neighbor_id, l0.s + l1.s AS approx
  FROM _pqcode0 k0
  JOIN _pqcode1 k1 USING (vec_id)
  JOIN _pqlut0 l0 ON l0.cid = k0.cid
  JOIN _pqlut1 l1 ON l1.cid = k1.cid AND l1.query_id = l0.query_id
  WHERE k0.vec_id <> l0.query_id),
_pqcand AS (SELECT query_id, neighbor_id, approx FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY approx DESC, neighbor_id) AS crank FROM _pqapprox)
  WHERE crank <= 50),
_pqexact AS (
  SELECT c.query_id, c.neighbor_id, c.approx,
    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                           CAST(v.embedding AS DOUBLE[])) AS cos
  FROM _pqcand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings v ON v.vec_id = c.neighbor_id),
_pqranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
  ORDER BY cos DESC, neighbor_id) AS rank FROM _pqexact)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
  round(cos, 6) AS cos, round(approx, 6) AS approx_score
FROM _pqranked WHERE rank <= 10"""
  }

  /** The shared PQ block (two 32-dim subspaces: codebook fits, codes,
   * per-query LUTs) — reused verbatim by [[annPq]] and [[annIvfPq]]. */
  private def pqSubCtes: String =
    (0 until 2).map { m =>
      val lo = 1 + m * 32
      val hi = (m + 1) * 32
      s"""_pqs$m AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM embeddings),
_pqsamp$m AS (SELECT vec_id, embedding FROM _pqs$m WHERE vec_id % 3 = 0),
_pqc0_$m AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid, embedding AS cvec
  FROM (SELECT * FROM _pqsamp$m ORDER BY vec_id LIMIT 8)),
${assignCte(s"_pqa1_$m", s"_pqsamp$m", s"_pqc0_$m")},
${updateCte(s"_pqc1_$m", s"_pqa1_$m")},
${assignCte(s"_pqa2_$m", s"_pqsamp$m", s"_pqc1_$m")},
${updateCte(s"_pqc2_$m", s"_pqa2_$m")},
${assignCte(s"_pqcode$m", s"_pqs$m", s"_pqc2_$m")},
_pqlut$m AS (SELECT q.vec_id AS query_id, c.cid,
  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                         CAST(c.cvec AS DOUBLE[])) AS s
  FROM _pqs$m q, _pqc2_$m c WHERE q.vec_id < 5)"""
    }.mkString(",\n")

  /** Oracle for Similarity.simAnnIvfPq — the composed IVF-ADC chain
   * (the FAISS IVFADC shape): the [[ivfCoreCtes]] quantizer restricts
   * candidates to each query's 3 probed cells, the [[pqSubCtes]] codes
   * + LUTs score exactly those candidates (approx = s0 + s1, the
   * engine's addition order), top-50 cut by (approx DESC, neighbor_id),
   * exact-cosine rerank to top-10. Both building blocks are shared
   * verbatim with annIvf/annPq, so the composition cannot drift from
   * its parts. */
  def annIvfPq: String =
    s"""WITH
$ivfCoreCtes,
$pqSubCtes,
_cands AS (
  SELECT p.query_id, l.vec_id AS neighbor_id
  FROM _probes p JOIN _lists l USING (cid)
  WHERE l.vec_id <> p.query_id),
_approx AS (
  SELECT c.query_id, c.neighbor_id, l0.s + l1.s AS approx
  FROM _cands c
  JOIN _pqcode0 k0 ON k0.vec_id = c.neighbor_id
  JOIN _pqcode1 k1 ON k1.vec_id = c.neighbor_id
  JOIN _pqlut0 l0 ON l0.cid = k0.cid AND l0.query_id = c.query_id
  JOIN _pqlut1 l1 ON l1.cid = k1.cid AND l1.query_id = c.query_id),
_cut AS (SELECT query_id, neighbor_id, approx FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY approx DESC, neighbor_id) AS crank FROM _approx)
  WHERE crank <= 50),
_exact AS (
  SELECT c.query_id, c.neighbor_id, c.approx,
    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                           CAST(v.embedding AS DOUBLE[])) AS cos
  FROM _cut c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings v ON v.vec_id = c.neighbor_id),
_rankedf AS (SELECT *, row_number() OVER (PARTITION BY query_id
  ORDER BY cos DESC, neighbor_id) AS rank FROM _exact)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
  round(cos, 6) AS cos, round(approx, 6) AS approx_score
FROM _rankedf WHERE rank <= 10"""

  /** Oracle for Curation.deconNgramOverlap: the same staged word-3-
   * shingle-hash CTEs as the LSH oracles ([[shingleCtes]] → `_sh`),
   * then distinct benchmark shingles (docs with id % 50 = 0) joined
   * against each candidate doc's shingle rows — value-level overlap
   * counts and contamination ratio. */
  def deconOverlap: String =
    s"""WITH
$shingleCtes,
_bsh AS (SELECT DISTINCT unnest(sh) AS s FROM _sh WHERE doc_id % 50 = 0),
_tr AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s
        FROM _sh WHERE doc_id % 50 <> 0),
_hit AS (SELECT doc_id, n_shingles, count(*) AS n_contaminated
         FROM _tr JOIN _bsh USING (s) GROUP BY doc_id, n_shingles)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
  CAST(n_contaminated AS BIGINT) AS n_contaminated,
  round(CAST(n_contaminated AS DOUBLE) / n_shingles, 6) AS contamination
FROM _hit"""

  /** Oracle for Curation.pipelineCurate — the composed chain: the
   * text_quality predicate, the dedup_exact_keep_first digest window,
   * decon_ngram_overlap's shingle-overlap CTEs at a ≥50% integer
   * cross-multiplied threshold, and sample_weighted's mixing rates
   * (`mix32Sql` passed in from Curation so the hash constant lives in
   * exactly one place per engine). */
  def pipelineCurate(mix32Sql: String): String =
    s"""WITH
$shingleCtes,
_bsh AS (SELECT DISTINCT unnest(sh) AS s FROM _sh WHERE doc_id % 50 = 0),
_tr AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s
        FROM _sh WHERE doc_id % 50 <> 0),
_contam AS (SELECT doc_id FROM (
  SELECT doc_id, n_shingles, count(*) AS n_contaminated
  FROM _tr JOIN _bsh USING (s) GROUP BY doc_id, n_shingles)
  WHERE n_contaminated * 2 >= n_shingles),
_q AS (SELECT doc_id, lang, source, n_chars, text FROM documents
  WHERE len(list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0))
          BETWEEN 20 AND 100000
    AND CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
          AS DOUBLE) / length(text) < 0.1),
_d AS (SELECT doc_id, lang, source, n_chars FROM (
  SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM _q)
  WHERE doc_id = keep_id)
SELECT doc_id, lang, source, n_chars FROM _d
WHERE doc_id % 50 <> 0
  AND doc_id NOT IN (SELECT doc_id FROM _contam)
  AND ($mix32Sql) % 100 <
    CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
                WHEN 'src2' THEN 25 ELSE 10 END"""

  /** Oracle for Curation.pipelineCurateModel — the staged chain with
   * the heuristic gate CTE swapped for the NB block's `sv > 0` (the
   * SAME labels/weights text_quality_model verifies); dedup, decon and
   * mixing stages are shared verbatim with [[pipelineCurate]]. */
  def pipelineCurateModel(mix32Sql: String, buckets: Int): String =
    s"""WITH
$shingleCtes,
_bsh AS (SELECT DISTINCT unnest(sh) AS s FROM _sh WHERE doc_id % 50 = 0),
_tr AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s
        FROM _sh WHERE doc_id % 50 <> 0),
_contam AS (SELECT doc_id FROM (
  SELECT doc_id, n_shingles, count(*) AS n_contaminated
  FROM _tr JOIN _bsh USING (s) GROUP BY doc_id, n_shingles)
  WHERE n_contaminated * 2 >= n_shingles),
${nbCtesHeuristic(buckets, mix32Sql)},
_q AS (SELECT d.doc_id, d.lang, d.source, d.n_chars, d.text
       FROM documents d JOIN _qout o ON o.doc_id = d.doc_id
       WHERE o.sv > 0),
_d AS (SELECT doc_id, lang, source, n_chars FROM (
  SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM _q)
  WHERE doc_id = keep_id)
SELECT doc_id, lang, source, n_chars FROM _d
WHERE doc_id % 50 <> 0
  AND doc_id NOT IN (SELECT doc_id FROM _contam)
  AND ($mix32Sql) % 100 <
    CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
                WHEN 'src2' THEN 25 ELSE 10 END"""

  /** Oracle for RelationalQueries.qKmvDistinct — the KMV sketch
   * (graft.functions.KmvDistinct, k=256) on lineitem part keys per
   * return flag: avalanche each distinct key, keep the k smallest
   * DISTINCT hashes per group in unsigned order (hash collisions merge,
   * exactly like the sketch's duplicate-free insert), then the
   * estimator — exact hash count below k, else round((k−1)/u) with
   * u = ((kth >>> 11) + 0.5) / 2⁵³ (KmvSketch.scala `finish`). */
  /** `text_cms_counts` oracle: the Count-Min sketch's point estimates
   * rebuilt from first principles — row-j counter of a term = the SUM
   * of exact counts over ALL terms colliding in that (row, bucket)
   * cell, estimate = min over rows. Term hash = avalanche(fnv1a(t))
   * ([[graft.functions.SimHash64.hash64]]); row-j bucket =
   * avalanche((h + (j+1)·GOLD) mod 2⁶⁴) mod w — the minhash
   * permutation family, same staged HUGEINT chains as above. */
  def cmsCounts(depth: Int, width: Int): String = {
    val (av1, l1) = stagedAvalanche("_cf", "fv", "h64", Seq("t", "exact_cnt"), "ch")
    val (av2, l2) =
      stagedAvalanche("_cg0", "gv0", "gv", Seq("t", "exact_cnt", "j"), "cg")
    s"""WITH
_ct0 AS (SELECT unnest($Toks) AS t FROM documents),
_ct AS (SELECT t, CAST(count(*) AS BIGINT) AS exact_cnt FROM _ct0 GROUP BY t),
_cf AS (SELECT t, exact_cnt, ${fnv("t")} AS fv FROM _ct),
$av1,
_cj AS (SELECT t, exact_cnt, h64, unnest(range(1, ${depth + 1})) AS j FROM $l1),
_cg0 AS (SELECT t, exact_cnt, j,
  (h64 + (j::HUGEINT * $Gold::HUGEINT) % $M64) % $M64 AS gv0 FROM _cj),
$av2,
_cb AS (SELECT t, exact_cnt, j, gv % $width AS b FROM $l2),
_cell AS (SELECT j, b, sum(exact_cnt) AS cellv FROM _cb GROUP BY j, b),
_est AS (SELECT t, exact_cnt, min(cellv) AS est
  FROM _cb JOIN _cell USING (j, b) GROUP BY t, exact_cnt)
SELECT t AS term, exact_cnt, CAST(est AS BIGINT) AS cms_est,
  CAST(est - exact_cnt AS BIGINT) AS overcount FROM _est"""
  }

  /** Oracle for Curation.curateDsir — DSIR hashed-unigram importance
   * log-weights: per-doc term counts hashed once per distinct
   * (doc, term) through the staged fnv+avalanche chain, bucket = the
   * unsigned hash's low bits (`% buckets`, power of two — identical to
   * the Scala side's signed `& (buckets-1)`), target/raw bucket models
   * Laplace-smoothed, score = Σ cnt·λ. */
  def dsirScore(buckets: Int): String = {
    val (av, last) =
      stagedAvalanche("_qf", "fv", "h64", Seq("doc_id", "cnt"), "qd")
    s"""WITH
_q0 AS (SELECT doc_id, unnest($Toks) AS t FROM documents),
_qc AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS cnt
        FROM _q0 GROUP BY 1, 2),
_qf AS (SELECT doc_id, cnt, ${fnv("t")} AS fv FROM _qc),
$av,
_qb AS (SELECT doc_id, h64 % $buckets AS bkt, sum(cnt) AS cnt
        FROM $last GROUP BY 1, 2),
_qs AS (SELECT doc_id, source = 'src0' AS is_target FROM documents),
_qfit AS (SELECT bkt, sum(cnt) AS raw,
          sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS tgt
          FROM _qb JOIN _qs USING (doc_id) GROUP BY bkt),
_qtot AS (SELECT sum(raw) AS rawtot, sum(tgt) AS tgttot FROM _qfit),
_qlam AS (SELECT bkt,
          ln((tgt + 1.0) / (tgttot + $buckets))
            - ln((raw + 1.0) / (rawtot + $buckets)) AS lam
          FROM _qfit, _qtot),
_qsc AS (SELECT doc_id, sum(cnt) AS n_tokens, sum(cnt * lam) AS s
         FROM _qb JOIN _qlam USING (bkt) GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  round(s, 6) AS dsir_logw, s > 0 AS target_like FROM _qsc"""
  }

  /** Oracle for TextAnalysis.textQualityModel — the trained
   * hashed-n-gram quality classifier replayed end to end: heuristic
   * labels + deterministic train split re-derived, unigram+bigram
   * features hashed through the staged fnv+avalanche chain into
   * `buckets` cells (unsigned `%` == the kernel's signed `&` on a
   * power of two), naive-Bayes log-count-ratio weights over the train
   * slice (every bucket materialized via range() so absent buckets get
   * the smoothed weight, exactly like the Scala arrays), then
   * per-document dot + bias + sigmoid. The dot product folds from 0.0
   * in ascending bucket order with the bias added last — the EXACT
   * summation sequence of QualityKernels.score, stated as an ordered
   * list_reduce so neither engine's aggregate ordering enters the
   * doubles (the textLmScore discipline). A drift anywhere — labels,
   * split, hashing, smoothing, or inference — turns the row red. */
  /** Heuristic-gate labels: the train class is the C4-style gate's own
   * output (the CCNet reference-corpus recipe; held-out accuracy here
   * measures MIMICRY of the gate — the planted twin below measures
   * generalization). */
  def qualityModelScore(buckets: Int, mix32Sql: String): String =
    nbScoreSql(buckets, heuristicSrcCte(mix32Sql))

  private def heuristicSrcCte(mix32Sql: String): String =
    s"""SELECT doc_id, text AS qtext,
  (len($Toks) BETWEEN 20 AND 100000
    AND CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
          AS DOUBLE) / length(text) < 0.1) AS label,
  ($mix32Sql) % 100 < 50 AS is_train FROM documents"""

  /** Planted labels: a generator-known doc-class bit (doc_id parity)
   * drives a class-marker SUFFIX appended to the text (passed verbatim,
   * leading spaces included) — labels the model cannot derive from the
   * heuristic gate (r15 verdict #3). */
  def qualityModelScorePlanted(buckets: Int, mix32Sql: String,
      posSuffix: String, negSuffix: String): String =
    nbScoreSql(buckets,
      s"""SELECT doc_id,
  text || CASE WHEN doc_id % 2 = 0 THEN '$posSuffix'
               ELSE '$negSuffix' END AS qtext,
  doc_id % 2 = 0 AS label,
  ($mix32Sql) % 100 < 50 AS is_train FROM documents""")

  /** Shared NB fit+score replay over a caller-provided labeled corpus
   * `srcCte` projecting `(doc_id, qtext, label, is_train)`: hashed
   * unigram+bigram bucket masses over the TRAIN slice → log-count-ratio
   * weights + bias → per-document canonical-order dot + sigmoid. */
  private def nbScoreSql(buckets: Int, srcCte: String): String =
    s"""WITH
${nbCtes(buckets, srcCte)}
SELECT doc_id, is_train, label, CAST(n_grams AS BIGINT) AS n_grams,
  round(sv, 6) AS score, round(1.0 / (1.0 + exp(-sv)), 6) AS prob,
  sv > 0 AS predicted FROM _qout"""

  /** The NB CTE BLOCK (no WITH, no final SELECT), ending in
   * `_qout(doc_id, is_train, label, n_grams, sv)` — composable into
   * larger oracles (the subwordCtes/bpeCtes convention); the
   * model-gated curation chain swaps its heuristic gate for
   * `sv > 0` over this block. */
  private[operators] def nbCtes(buckets: Int, srcCte: String): String = {
    val (av, last) =
      stagedAvalanche("_qmf", "fv", "h64", Seq("doc_id", "cnt"), "qz")
    val qtoks =
      """list_filter(regexp_split_to_array(qtext, '\s+'), t -> len(t) > 0)"""
    s"""_qps AS ($srcCte),
_qmt AS (SELECT doc_id, $qtoks AS toks FROM _qps),
_qlab AS (SELECT t.doc_id, len(t.toks) AS ntoks, p.label, p.is_train
  FROM _qmt t JOIN _qps p ON p.doc_id = t.doc_id),
_qg0 AS (SELECT doc_id, unnest(toks) AS g FROM _qmt),
_qg1 AS (SELECT doc_id,
  unnest(list_transform(range(1, greatest(len(toks), 1)),
    i -> toks[i] || ' ' || toks[i + 1])) AS g FROM _qmt),
_qgg AS (SELECT doc_id, g FROM _qg0 UNION ALL SELECT doc_id, g FROM _qg1),
_qmc AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt
         FROM _qgg GROUP BY 1, 2),
_qmf AS (SELECT doc_id, cnt, ${fnv("g")} AS fv FROM _qmc),
$av,
_qmb AS (SELECT doc_id, h64 % $buckets AS bkt, sum(cnt) AS cnt
         FROM $last GROUP BY 1, 2),
_qfit AS (SELECT bkt,
  sum(CASE WHEN label THEN cnt ELSE 0 END) AS pos,
  sum(CASE WHEN NOT label THEN cnt ELSE 0 END) AS neg
  FROM _qmb JOIN _qlab USING (doc_id) WHERE is_train GROUP BY bkt),
_qmtot AS (SELECT coalesce(sum(pos), 0) AS postot,
  coalesce(sum(neg), 0) AS negtot FROM _qfit),
_qmn AS (SELECT sum(CASE WHEN label THEN 1 ELSE 0 END) AS npos,
  sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS nneg
  FROM _qlab WHERE is_train),
_qmw AS (SELECT b.bkt,
  ln((coalesce(f.pos, 0) + 1.0) / (postot + $buckets))
    - ln((coalesce(f.neg, 0) + 1.0) / (negtot + $buckets)) AS w
  FROM (SELECT unnest(range(0, $buckets)) AS bkt) b
  LEFT JOIN _qfit f USING (bkt), _qmtot),
_qbias AS (SELECT ln((npos + 1.0) / (nneg + 1.0)) AS bias FROM _qmn),
_qmsc AS (SELECT doc_id,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list(cnt * w ORDER BY bkt)), (acc, x) -> acc + x) AS dot
          FROM _qmb JOIN _qmw USING (bkt) GROUP BY doc_id),
_qout AS (SELECT l.doc_id, l.is_train, l.label,
  CASE WHEN l.ntoks > 0 THEN 2 * l.ntoks - 1 ELSE 0 END AS n_grams,
  coalesce(s.dot, 0) + bias AS sv
  FROM _qlab l LEFT JOIN _qmsc s ON s.doc_id = l.doc_id, _qbias)"""
  }

  /** The heuristic-labeled NB block with its srcCte inlined — what the
   * model-gated pipeline composes (labels must be the SAME ones
   * text_quality_model trains on, or the chain would gate on a
   * different model than the one the driver verified). */
  private[operators] def nbCtesHeuristic(buckets: Int,
      mix32Sql: String): String =
    nbCtes(buckets, heuristicSrcCte(mix32Sql))

  /** Oracle for Dedup.dedupContainmentPairs — df-capped shingle
   * postings self-joined; C(A→B) = |capped(A) ∩ B| / |capped(A)| at a
   * ≥50% integer-cross-multiplied threshold. Both the numerator and
   * the denominator live in the capped ("informative") shingle space,
   * so C = 1 ⇔ every informative shingle of A appears in B. */
  def containmentPairs(cap: Int): String =
    s"""WITH
$shingleCtes,
_cu AS (SELECT doc_id, unnest(sh) AS s FROM _sh),
_cdf AS (SELECT s, count(*) AS df FROM _cu GROUP BY s),
_ck AS (SELECT _cu.doc_id, _cu.s FROM _cu JOIN _cdf USING (s)
        WHERE df <= $cap),
_csz AS (SELECT doc_id, count(*) AS n_sh FROM _ck GROUP BY doc_id),
_cp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM _ck a JOIN _ck b USING (s) WHERE a.doc_id <> b.doc_id
        GROUP BY 1, 2)
SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common,
  CAST(z.n_sh AS BIGINT) AS n_sh_a,
  round(CAST(n_common AS DOUBLE) / z.n_sh, 6) AS containment
FROM _cp JOIN _csz z ON z.doc_id = _cp.id_a
WHERE n_common * 2 >= z.n_sh"""

  def kmvDistinct: String = {
    val k = 256
    val (av, last) =
      stagedAvalanche("_kv0", "kv", "h64", Seq("l_returnflag"), "kv")
    s"""WITH
_kvk AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem
  WHERE l_partkey IS NOT NULL),
_kv0 AS (SELECT l_returnflag, ${toUnsigned("l_partkey")} AS kv FROM _kvk),
$av,
_kvh AS (SELECT DISTINCT l_returnflag, h64 FROM $last),
_kvr AS (SELECT l_returnflag, h64, row_number() OVER (
  PARTITION BY l_returnflag ORDER BY h64) AS rn FROM _kvh),
_kvagg AS (SELECT l_returnflag, count(*) AS nh,
  max(CASE WHEN rn = $k THEN h64 END) AS kth
  FROM _kvr GROUP BY l_returnflag),
_kvex AS (SELECT l_returnflag, count(*) AS exact_distinct FROM _kvk
  GROUP BY l_returnflag)
SELECT a.l_returnflag,
  CASE WHEN a.nh < $k THEN a.nh
       ELSE CAST(round(${k - 1}::DOUBLE /
         ((CAST(a.kth // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0))
         AS BIGINT)
  END AS kmv_distinct,
  x.exact_distinct
FROM _kvagg a JOIN _kvex x USING (l_returnflag)"""
  }
}
