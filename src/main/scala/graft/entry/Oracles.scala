package graft.entry

/** DuckDB oracle SQL for every SQL-expressible query in [[DocQueries]].
  * Each statement reproduces the Spark semantics exactly: same md5-based
  * hashing (engine-portable), same normalization regex, same tie-breaks,
  * same output column names/types (aggregates CAST to match Spark), same
  * ORDER BY. Iterative fixpoints (PPR, LPA) have no SQL oracle — they are
  * pinned by committed networkx goldens instead (src/test/resources/
  * goldens) and get the driver's rows-only check.
  */
object Oracles {

  /** Shared prelude: documents → normalized docs, per-chunk tokens,
    * adjacent-token triples, chunk-entity sets, per-doc tokens, shingles,
    * fact edges. Mirrors graft.extract.Extract + graft.graph.GraphBuild.
    */
  private val prelude: String = """
WITH RECURSIVE docs AS (
  SELECT doc_id, text, n_chars,
         concat('chunk-', md5(text)) AS chunk_id,
         trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')) AS norm
  FROM documents
),
chunksd AS (SELECT DISTINCT chunk_id, norm FROM docs),
toks0 AS (
  SELECT chunk_id,
         unnest(regexp_split_to_array(norm, ' +')) AS tok,
         generate_subscripts(regexp_split_to_array(norm, ' +'), 1) AS pos
  FROM chunksd
),
toks AS (SELECT * FROM toks0 WHERE tok <> ''),
dtoks0 AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(norm, ' +')) AS tok,
         generate_subscripts(regexp_split_to_array(norm, ' +'), 1) AS pos
  FROM docs
),
dtoks AS (SELECT * FROM dtoks0 WHERE tok <> ''),
triples AS (
  SELECT DISTINCT t1.chunk_id, t1.tok AS subj, t2.tok AS pred, t3.tok AS obj
  FROM toks t1
  JOIN toks t2 ON t2.chunk_id = t1.chunk_id AND t2.pos = t1.pos + 1
  JOIN toks t3 ON t3.chunk_id = t1.chunk_id AND t3.pos = t1.pos + 2
),
chunk_ents AS (
  -- UNION ALL + outer DISTINCT on purpose: under WITH RECURSIVE (needed
  -- for q24), DuckDB 1.0 stops deduplicating a bare UNION across branches
  -- of a non-recursive CTE — observed 2x row counts.
  SELECT DISTINCT chunk_id, entity FROM (
    SELECT chunk_id, subj AS entity FROM triples
    UNION ALL
    SELECT chunk_id, obj AS entity FROM triples)
),
fe AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS weight FROM (
    SELECT concat('entity-', md5(subj)) AS src, concat('entity-', md5(obj)) AS dst
    FROM triples WHERE subj <> obj
    UNION ALL
    SELECT concat('entity-', md5(obj)), concat('entity-', md5(subj))
    FROM triples WHERE subj <> obj
  ) GROUP BY src, dst
),
symarcs AS (
  SELECT src, dst, sum(weight) AS weight FROM (
    SELECT src, dst, weight FROM fe
    UNION ALL
    SELECT dst AS src, src AS dst, weight FROM fe
  ) GROUP BY src, dst
),
ents AS (SELECT DISTINCT concat('entity-', md5(entity)) AS v FROM chunk_ents),
dsh AS (
  SELECT DISTINCT d1.doc_id, concat(d1.tok, ' ', d2.tok, ' ', d3.tok) AS sh
  FROM dtoks d1
  JOIN dtoks d2 ON d2.doc_id = d1.doc_id AND d2.pos = d1.pos + 1
  JOIN dtoks d3 ON d3.doc_id = d1.doc_id AND d3.pos = d1.pos + 2
)
"""

  private def q(body: String): String = prelude + body

  /** q41's oracle body: the h-index k-core iteration unrolled `rounds`
    * times — init c₀ = degree over the deduplicated undirected arc set,
    * then cᵢ(v) = H({cᵢ₋₁(u) : u ∈ N(v)}) with H = max(least(rank,
    * value)) over the descending neighbor values, isolated vertices 0.
    *
    * Every round CTE is `AS MATERIALIZED`: each kc_i is referenced once,
    * so DuckDB would otherwise INLINE the whole 24-deep chain into one
    * nested plan whose optimization blows up super-linearly (>10 min on a
    * 31-vertex graph, measured; 4 s materialized).
    */
  private def kcoreUnrolled(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """, ua AS MATERIALIZED (SELECT DISTINCT src, dst FROM symarcs WHERE src <> dst),
        |kc0 AS MATERIALIZED (
        |  SELECT e.v, coalesce(d.c, 0) AS c FROM ents e LEFT JOIN (
        |    SELECT src AS v, count(*) AS c FROM ua GROUP BY src) d ON d.v = e.v)""".stripMargin)
    for (i <- 1 to rounds) {
      sb.append(
        s""",
           |kc$i AS MATERIALIZED (
           |  SELECT e.v, coalesce(h.h, 0) AS c FROM ents e LEFT JOIN (
           |    SELECT nb.v, max(least(nb.rn, nb.nc)) AS h FROM (
           |      SELECT a.src AS v, c.c AS nc,
           |             row_number() OVER (PARTITION BY a.src ORDER BY c.c DESC) AS rn
           |      FROM ua a JOIN kc${i - 1} c ON c.v = a.dst) nb
           |    GROUP BY nb.v) h ON h.v = e.v)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT v AS entity_id, CAST(c AS BIGINT) AS coreness
         |FROM kc$rounds ORDER BY entity_id""".stripMargin)
    sb.toString
  }

  /** q19's LSH planes inlined as SQL literals so DuckDB recomputes the
    * same sign buckets: the planes are deterministic hash-seeded unit
    * float vectors ([[graft.extract.Embeddings.hashUnit]]); Double
    * .toString round-trips the exact float-widened value, so the duck
    * dot products use the identical terms as the Spark expression
    * (summation order may differ — sign decisions are ~0.1 magnitude,
    * far above reorder noise). Mirrors Ann.lshTopK(nPlanes=8, tables=4,
    * dim=64) as invoked by qAnnLsh.
    */
  private val lshPlaneValues: String =
    (for (t <- 0 until 4; j <- 0 until 8) yield {
      val v = graft.extract.Embeddings.hashUnit(s"lsh$t:$j", 64)
      s"($t, $j, [${v.map(f => f.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }).mkString(",\n")

  /** q15's MinHash mixing constants, inlined from the SAME generator the
    * Spark side uses ([[graft.ops.Dedup.mixConsts]]) so both engines run
    * the identical (aᵢ·h1 + bᵢ·h2 + cᵢ) mod P arithmetic.
    */
  private val minHashMixValues: String =
    graft.ops.Dedup.mixConsts(16).zipWithIndex
      .map { case ((a, b, c), i) => s"($i, $a, $b, $c)" }.mkString(", ")

  /** q32's IVF centroids, inlined exactly like [[lshPlaneValues]]. */
  private val ivfCentroidValues: String =
    (0 until 16).map { j =>
      val v = graft.ops.Ann.ivfCentroid("ivf", j, 64)
      s"($j, [${v.map(f => f.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n")

  private val enStop = graft.ops.TextMetrics.enStop.map(s => s"'$s'").mkString(", ")
  private val deStop = graft.ops.TextMetrics.deStop.map(s => s"'$s'").mkString(", ")
  private val frStop = graft.ops.TextMetrics.frStop.map(s => s"'$s'").mkString(", ")

  val sql: Map[String, String] = Map(
    "q01_text_processing" -> q(
      "SELECT doc_id, norm FROM docs ORDER BY doc_id"),

    "q02_chunk_ids" -> q(
      "SELECT doc_id, chunk_id FROM docs ORDER BY doc_id"),

    "q03_normalize_answer" -> q(
      """SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
        |  '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g'),
        |  '\b(a|an|the)\b', ' ', 'g'),
        |  '\s+', ' ', 'g')) AS norm_answer
        |FROM docs ORDER BY doc_id""".stripMargin),

    "q04_entities" -> q(
      """SELECT entity, concat('entity-', md5(entity)) AS entity_id
        |FROM (SELECT DISTINCT entity FROM chunk_ents) ORDER BY entity""".stripMargin),

    "q05_triples" -> q(
      "SELECT chunk_id, subj, pred, obj FROM triples ORDER BY chunk_id, subj, pred, obj"),

    "q06_fact_edges" -> q(
      "SELECT src, dst, weight FROM fe ORDER BY src, dst"),

    "q07_passage_edges" -> q(
      """SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM (
        |  SELECT DISTINCT chunk_id AS src, concat('entity-', md5(entity)) AS dst
        |  FROM chunk_ents) ORDER BY src, dst""".stripMargin),

    "q08_entity_df" -> q(
      """SELECT entity, count(DISTINCT chunk_id) AS df FROM chunk_ents
        |GROUP BY entity ORDER BY entity""".stripMargin),

    "q09_minmax" -> q(
      """SELECT doc_id, round(CASE WHEN mx = mn THEN 1.0
        |  ELSE CAST(n_chars - mn AS DOUBLE) / (mx - mn) END, 9) AS mm
        |FROM (SELECT doc_id, n_chars, min(n_chars) OVER () AS mn,
        |             max(n_chars) OVER () AS mx FROM documents)
        |ORDER BY doc_id""".stripMargin),

    "q10_topk_docs" -> q(
      """SELECT doc_id, n_chars, rank FROM (
        |  SELECT doc_id, n_chars,
        |         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM documents) WHERE rank <= 5 ORDER BY rank""".stripMargin),

    "q11_graph_stats" -> q(
      """SELECT
        |  (SELECT count(DISTINCT chunk_id) FROM triples) AS n_chunks,
        |  (SELECT count(*) FROM (SELECT DISTINCT subj, pred, obj FROM triples)) AS n_facts,
        |  (SELECT count(DISTINCT entity) FROM chunk_ents) AS n_entities,
        |  (SELECT count(*) FROM fe) AS n_fact_edges""".stripMargin),

    "q12_upsert_antijoin" -> q(
      """SELECT doc_id FROM docs WHERE md5(text) NOT IN
        |  (SELECT md5(text) FROM documents WHERE doc_id % 3 = 0)
        |ORDER BY doc_id""".stripMargin),

    "q13_delete_refcount" -> q(
      """SELECT entity FROM (
        |  SELECT ce.entity, max(CASE WHEN d.doc_id >= 100 THEN 1 ELSE 0 END) AS survives
        |  FROM chunk_ents ce JOIN docs d ON d.chunk_id = ce.chunk_id
        |  GROUP BY ce.entity)
        |WHERE survives = 0 ORDER BY entity""".stripMargin),

    "q14_dedup_exact" -> q(
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper, count(*) AS dup_count
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin),

    // q15 — universal-hash MinHash: ONE md5 per shingle split into 32-bit
    // halves, then 16 (a·h1 + b·h2 + c) mod P slots (constants inlined
    // from graft.ops.Dedup.mixConsts — identical literals on both
    // engines). 20-bit × 32-bit products stay ≤ 2^52: DuckDB's
    // overflow-checked BIGINT multiply never trips.
    "q15_minhash_lsh" -> q(
      s""", mixc(i, ma, mb, mc) AS (VALUES $minHashMixValues),
        |mhh AS (SELECT doc_id,
        |               CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h1,
        |               CAST(concat('0x', substr(md5(sh), 9, 8)) AS BIGINT) AS h2
        |        FROM dsh),
        |mins AS (SELECT doc_id, i, min((ma * h1 + mb * h2 + mc) % 1000000007) AS mh
        |         FROM mhh CROSS JOIN mixc GROUP BY doc_id, i),
        |bandtab AS (SELECT doc_id, (i // 4) AS band,
        |                   md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY i)) AS bh
        |            FROM mins GROUP BY doc_id, (i // 4))
        |SELECT a, b, count(*) AS shared_bands FROM (
        |  SELECT l.doc_id AS a, r.doc_id AS b, l.band
        |  FROM bandtab l
        |  JOIN bandtab r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id)
        |GROUP BY a, b ORDER BY a, b""".stripMargin),

    "q16_simhash" -> q(
      """SELECT doc_id AS "key",
        |  CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        |FROM (
        |  SELECT doc_id, j,
        |         sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h
        |        FROM dtoks)
        |  CROSS JOIN range(32) r(j)
        |  GROUP BY doc_id, j)
        |GROUP BY doc_id ORDER BY "key"""".stripMargin),

    // q16b — naive all-pairs hamming filter; the Spark side uses the
    // pigeonhole band equi-join, whose output is identical by construction.
    "q16b_simhash_pairs" -> q(
      """, sims AS (
        |  SELECT doc_id AS key,
        |    CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM (
        |    SELECT doc_id, j,
        |           sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |    FROM (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h
        |          FROM dtoks)
        |    CROSS JOIN range(32) r(j)
        |    GROUP BY doc_id, j)
        |  GROUP BY doc_id)
        |SELECT l.key AS a, r.key AS b,
        |       CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS hamming
        |FROM sims l JOIN sims r ON l.key < r.key
        |WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
        |ORDER BY a, b""".stripMargin),

    "q17_ngram_jaccard" -> q(
      """, dshf AS (
        |  SELECT d.doc_id, d.sh FROM dsh d
        |  JOIN (SELECT sh FROM dsh GROUP BY sh HAVING count(*) <= 100) k ON k.sh = d.sh)
        |SELECT a, b, round(CAST(i AS DOUBLE) / (na + nb - i), 9) AS jaccard FROM (
        |  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS i
        |  FROM dshf l JOIN dshf r ON l.sh = r.sh AND l.doc_id < r.doc_id
        |  GROUP BY l.doc_id, r.doc_id) inter
        |JOIN (SELECT doc_id, count(*) AS na FROM dshf GROUP BY doc_id) sa ON sa.doc_id = a
        |JOIN (SELECT doc_id, count(*) AS nb FROM dshf GROUP BY doc_id) sb ON sb.doc_id = b
        |WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
        |ORDER BY a, b""".stripMargin),

    "q19_ann_lsh" -> s"""
      |WITH pl0(t, j, w) AS (VALUES
      |$lshPlaneValues),
      |pl AS (SELECT t, j, unnest(w) AS w, generate_subscripts(w, 1) AS i FROM pl0),
      |ev AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings),
      |dots AS (SELECT e.vec_id, p.t, p.j, sum(CAST(e.x AS DOUBLE) * p.w) AS d
      |         FROM ev e JOIN pl p ON p.i = e.i GROUP BY e.vec_id, p.t, p.j),
      |buckets0 AS (SELECT vec_id, t,
      |              sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END) AS bucket
      |            FROM dots GROUP BY vec_id, t),
      |-- hot-bucket cap (mirrors Ann.capBuckets maxBucket=1024): a
      |-- (table, bucket) group past the cap is dropped before the self-join
      |buckets AS (SELECT b.* FROM buckets0 b
      |            JOIN (SELECT t, bucket FROM buckets0 GROUP BY t, bucket
      |                  HAVING count(*) <= 1024) ok
      |              ON ok.t = b.t AND ok.bucket = b.bucket),
      |cand AS (SELECT DISTINCT l.vec_id AS qid, r.vec_id AS kid
      |         FROM buckets l JOIN buckets r ON r.t = l.t AND r.bucket = l.bucket AND l.vec_id <> r.vec_id),
      |nrm AS (SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nv FROM ev GROUP BY vec_id),
      |cd AS (SELECT c.qid, c.kid, sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
      |       FROM cand c JOIN ev a ON a.vec_id = c.qid JOIN ev b ON b.vec_id = c.kid AND b.i = a.i
      |       GROUP BY c.qid, c.kid),
      |scored AS (SELECT cd.qid, cd.kid, cd.dot / (na.nv * nb.nv) AS score
      |           FROM cd JOIN nrm na ON na.vec_id = cd.qid JOIN nrm nb ON nb.vec_id = cd.kid)
      |SELECT qid, kid, rank FROM (
      |  SELECT qid, kid, CAST(row_number() OVER (PARTITION BY qid
      |    ORDER BY score DESC, CAST(kid AS VARCHAR) ASC) AS INTEGER) AS rank
      |  FROM scored) WHERE rank <= 10
      |ORDER BY qid, rank""".stripMargin,

    // q32 — IVF ANN: nearest-centroid cells (row_number d DESC, j ASC ==
    // Spark's first-index argmax), nProbe=4 probed cells per query, exact
    // cosine + top-10 inside the probed cells. Centroid literals inlined
    // from Ann.ivfCentroid; assignment margins (≥1e-5) dwarf summation
    // noise, see DocQueries.qAnnIvf.
    "q32_ann_ivf" -> s"""
      |WITH cent0(j, w) AS (VALUES
      |$ivfCentroidValues),
      |cent AS (SELECT j, unnest(w) AS w, generate_subscripts(w, 1) AS i FROM cent0),
      |ev AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings),
      |dots AS (SELECT e.vec_id, c.j, sum(CAST(e.x AS DOUBLE) * c.w) AS d
      |         FROM ev e JOIN cent c ON c.i = e.i GROUP BY e.vec_id, c.j),
      |ranked AS (SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
      |             ORDER BY d DESC, j ASC) AS rn FROM dots),
      |cells AS (SELECT vec_id, j AS cell FROM ranked WHERE rn = 1),
      |probes AS (SELECT vec_id, j AS cell FROM ranked WHERE rn <= 4),
      |cand AS (SELECT p.vec_id AS qid, c.vec_id AS kid
      |         FROM probes p JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.vec_id),
      |nrm AS (SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nv FROM ev GROUP BY vec_id),
      |cd AS (SELECT c.qid, c.kid, sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
      |       FROM cand c JOIN ev a ON a.vec_id = c.qid JOIN ev b ON b.vec_id = c.kid AND b.i = a.i
      |       GROUP BY c.qid, c.kid),
      |scored AS (SELECT cd.qid, cd.kid, cd.dot / (na.nv * nb.nv) AS score
      |           FROM cd JOIN nrm na ON na.vec_id = cd.qid JOIN nrm nb ON nb.vec_id = cd.kid)
      |SELECT qid, kid, rank FROM (
      |  SELECT qid, kid, CAST(row_number() OVER (PARTITION BY qid
      |    ORDER BY score DESC, CAST(kid AS VARCHAR) ASC) AS INTEGER) AS rank
      |  FROM scored) WHERE rank <= 10
      |ORDER BY qid, rank""".stripMargin,

    // q31 — embedding near-dup groups: exact cosine pairs at τ=0.42
    // (min margin to any pair score 3.4e-5 across sf tables — no
    // threshold flips from summation order), then min-label transitive
    // closure (q24's reach pattern) for the component keeper.
    "q31_embed_dedup" -> """
      |WITH RECURSIVE ev AS (
      |  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nv
      |        FROM ev GROUP BY vec_id),
      |d AS (SELECT a.vec_id AS qa, b.vec_id AS qb,
      |             sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
      |      FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
      |      GROUP BY 1, 2),
      |pairs AS (SELECT qa, qb FROM d
      |          JOIN nrm na ON na.vec_id = d.qa
      |          JOIN nrm nb ON nb.vec_id = d.qb
      |          WHERE dot / (na.nv * nb.nv) >= 0.42),
      |arcs AS (SELECT qa AS src, qb AS dst FROM pairs
      |         UNION ALL SELECT qb, qa FROM pairs),
      |verts AS (SELECT DISTINCT vec_id AS v FROM embeddings),
      |reach(v, m) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT a.dst, r.m FROM reach r JOIN arcs a ON a.src = r.v)
      |SELECT v AS vec_id, min(m) AS keeper FROM reach GROUP BY v
      |ORDER BY vec_id""".stripMargin,

    "q18_cosine_topk" -> """
      |WITH ev AS (
      |  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |),
      |nrm AS (SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nv
      |        FROM ev GROUP BY vec_id),
      |dots AS (
      |  SELECT a.vec_id AS qid, b.vec_id AS kid,
      |         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
      |  FROM ev a JOIN ev b ON a.i = b.i
      |  WHERE a.vec_id < 8 AND a.vec_id <> b.vec_id
      |  GROUP BY a.vec_id, b.vec_id),
      |scored AS (
      |  SELECT d.qid, d.kid, d.dot / (qa.nv * qb.nv) AS score
      |  FROM dots d JOIN nrm qa ON qa.vec_id = d.qid JOIN nrm qb ON qb.vec_id = d.kid)
      |SELECT qid, kid, rank FROM (
      |  SELECT qid, kid,
      |         CAST(row_number() OVER (PARTITION BY qid
      |           ORDER BY score DESC, CAST(kid AS VARCHAR) ASC) AS INTEGER) AS rank
      |  FROM scored) WHERE rank <= 10
      |ORDER BY qid, rank""".stripMargin,

    "q20_lang_id" -> q(
      s"""SELECT d.doc_id, CASE
         |  WHEN en > de AND en > fr AND en > 0 THEN 'en'
         |  WHEN de > en AND de > fr AND de > 0 THEN 'de'
         |  WHEN fr > en AND fr > de AND fr > 0 THEN 'fr'
         |  ELSE 'und' END AS pred_lang
         |FROM docs d LEFT JOIN (
         |  SELECT doc_id,
         |    CAST(count(*) FILTER (tok IN ($enStop)) AS DOUBLE) / count(*) AS en,
         |    CAST(count(*) FILTER (tok IN ($deStop)) AS DOUBLE) / count(*) AS de,
         |    CAST(count(*) FILTER (tok IN ($frStop)) AS DOUBLE) / count(*) AS fr
         |  FROM dtoks GROUP BY doc_id) r ON r.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin),

    "q21_quality" -> q(
      s"""SELECT d.doc_id,
         |  CAST(coalesce(t.n, 0) AS INTEGER) AS n_tokens,
         |  round(coalesce(t.avg_len, 0.0), 9) AS avg_token_len,
         |  round(coalesce(t.sw, 0.0), 9) AS stopword_ratio,
         |  round(CASE WHEN length(d.text) > 0 THEN
         |    CAST(length(regexp_replace(d.text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
         |      / length(d.text) ELSE 0.0 END, 9) AS alnum_ratio
         |FROM docs d LEFT JOIN (
         |  SELECT doc_id, count(*) AS n,
         |    CAST(sum(length(tok)) AS DOUBLE) / count(*) AS avg_len,
         |    CAST(count(*) FILTER (tok IN ($enStop)) AS DOUBLE) / count(*) AS sw
         |  FROM dtoks GROUP BY doc_id) t ON t.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin),

    "q22_token_counts" -> q(
      """SELECT d.doc_id,
        |  CAST(coalesce(w.n, 0) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(d.text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS INTEGER)
        |    AS subword_tokens
        |FROM docs d LEFT JOIN (
        |  SELECT doc_id, count(*) AS n FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(text, ' +')) AS tok FROM docs)
        |  WHERE tok <> '' GROUP BY doc_id) w ON w.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    "q23_fingerprint" -> q(
      """SELECT d.doc_id, md5(d.norm) AS doc_fp, f.mfp AS min_shingle_fp
        |FROM docs d LEFT JOIN (
        |  SELECT d1.doc_id, min(md5(concat_ws(' ', d1.tok, d2.tok, d3.tok, d4.tok,
        |                                           d5.tok, d6.tok, d7.tok, d8.tok))) AS mfp
        |  FROM dtoks d1
        |  JOIN dtoks d2 ON d2.doc_id = d1.doc_id AND d2.pos = d1.pos + 1
        |  JOIN dtoks d3 ON d3.doc_id = d1.doc_id AND d3.pos = d1.pos + 2
        |  JOIN dtoks d4 ON d4.doc_id = d1.doc_id AND d4.pos = d1.pos + 3
        |  JOIN dtoks d5 ON d5.doc_id = d1.doc_id AND d5.pos = d1.pos + 4
        |  JOIN dtoks d6 ON d6.doc_id = d1.doc_id AND d6.pos = d1.pos + 5
        |  JOIN dtoks d7 ON d7.doc_id = d1.doc_id AND d7.pos = d1.pos + 6
        |  JOIN dtoks d8 ON d8.doc_id = d1.doc_id AND d8.pos = d1.pos + 7
        |  GROUP BY d1.doc_id) f ON f.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    "q24_connected_components" -> q(
      """, arcs AS (SELECT src, dst FROM symarcs),
        |reach(v, m) AS (
        |  SELECT v, v FROM ents
        |  UNION
        |  SELECT a.dst, r.m FROM reach r JOIN arcs a ON a.src = r.v)
        |SELECT v AS entity_id, min(m) AS component FROM reach
        |GROUP BY v ORDER BY entity_id""".stripMargin),

    "q25_triangles" -> q(
      """SELECT e.v AS entity_id, CAST(coalesce(t.c, 0) AS BIGINT) AS triangles
        |FROM ents e LEFT JOIN (
        |  SELECT v, count(*) AS c FROM (
        |    WITH und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
        |                 FROM fe WHERE src <> dst GROUP BY 1, 2),
        |    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |            FROM und e1
        |            JOIN und e2 ON e2.a = e1.b
        |            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        |    SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |  GROUP BY v) t ON t.v = e.v
        |ORDER BY entity_id""".stripMargin),

    // q27b — 10 rounds of synchronous weighted min-tie LPA as a recursive
    // CTE with an iteration counter. Zero-weight self-loops give every
    // vertex a row each round WITHOUT changing winners (positive neighbor
    // sums always beat the 0-weight self vote; isolated vertices keep
    // their label) — this keeps the recursive term down to the single
    // allowed reference to the recursive CTE. Spark may stop before round
    // 10 when no label changes; the fixpoint is stable under recomputation
    // so round-10 labels are identical (validated vs the Spark output).
    "q27b_lpa" -> q(
      """, av AS (SELECT src, dst, weight FROM symarcs
        |       UNION ALL
        |       SELECT v, v, CAST(0 AS DOUBLE) FROM ents),
        |lab(i, vid, label) AS (
        |  SELECT 0, v, v FROM ents
        |  UNION ALL
        |  SELECT i + 1, vid, label FROM (
        |    SELECT t.i AS i, t.vid AS vid, t.label AS label,
        |           row_number() OVER (PARTITION BY t.i, t.vid
        |             ORDER BY t.w DESC, t.label ASC) AS rn
        |    FROM (SELECT l.i AS i, a.dst AS vid, l.label AS label,
        |                 sum(a.weight) AS w
        |          FROM lab l JOIN av a ON a.src = l.vid
        |          WHERE l.i < 10
        |          GROUP BY l.i, a.dst, l.label) t) WHERE rn = 1)
        |SELECT vid AS entity_id, label FROM lab WHERE i = 10
        |ORDER BY entity_id""".stripMargin),

    // q27c — PPR as a VALUE-level oracle: a FIXED 30-sweep power iteration
    // (no early stop) is expressible as a recursive CTE, unlike q27's
    // tol-converged fixpoint. Same update rule as the engine/networkx:
    //   x'(v) = α·(Σ_{u→v} x(u)·w/outW(u) + danglesum·p(v)) + (1−α)·p(v)
    // α=0.5, seed = highest-df entity (df desc, entity asc). The 0-weight
    // self-loops give every vertex a row each round without changing
    // contributions (q27b's trick), and dangling vertices (no out-arcs →
    // ow IS NULL) feed the per-round danglesum via a window over the
    // single recursive reference. round(,9) absorbs summation-order noise.
    "q27c_ppr_fixed" -> q(
      """, av2 AS (SELECT src, dst, weight FROM symarcs
        |        UNION ALL
        |        SELECT v, v, CAST(0 AS DOUBLE) FROM ents),
        |od AS (SELECT src, sum(weight) AS ow FROM symarcs GROUP BY src),
        |seedv AS (SELECT concat('entity-', md5(entity)) AS v FROM (
        |            SELECT entity FROM (
        |              SELECT entity, count(DISTINCT chunk_id) AS df
        |              FROM chunk_ents GROUP BY entity)
        |            ORDER BY df DESC, entity ASC LIMIT 1)),
        |pv AS (SELECT e.v,
        |              CASE WHEN e.v IN (SELECT v FROM seedv)
        |                   THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS p
        |       FROM ents e),
        |pr(i, v, x) AS (
        |  SELECT 0, p.v, p.p FROM pv p
        |  UNION ALL
        |  SELECT g.i + 1, g.vid,
        |         CAST(0.5 * (g.contrib + g.ds * p2.p) + 0.5 * p2.p AS DOUBLE)
        |  FROM (
        |    SELECT e.i AS i, e.dst AS vid,
        |           sum(CASE WHEN e.weight = 0 OR e.ow IS NULL THEN CAST(0 AS DOUBLE)
        |                    ELSE e.x * e.weight / e.ow END) AS contrib,
        |           max(e.ds) AS ds
        |    FROM (
        |      SELECT l.i, l.x, a.src, a.dst, a.weight, o.ow,
        |             sum(CASE WHEN o.src IS NULL THEN l.x ELSE CAST(0 AS DOUBLE) END)
        |               OVER (PARTITION BY l.i) AS ds
        |      FROM pr l
        |      JOIN av2 a ON a.src = l.v
        |      LEFT JOIN od o ON o.src = a.src
        |      WHERE l.i < 30
        |    ) e
        |    GROUP BY e.i, e.dst
        |  ) g JOIN pv p2 ON p2.v = g.vid)
        |SELECT v AS entity_id, round(x, 9) AS score FROM pr WHERE i = 30
        |ORDER BY entity_id""".stripMargin),

    // q33 — global PageRank: q27c's fixed-sweep CTE with a UNIFORM reset
    // p(v) = 1/N (20 sweeps). Dangling/isolated vertices now matter from
    // sweep 0 (they carry 1/N mass) — same window-danglesum machinery.
    "q33_pagerank_global" -> q(
      """, av2 AS (SELECT src, dst, weight FROM symarcs
        |        UNION ALL
        |        SELECT v, v, CAST(0 AS DOUBLE) FROM ents),
        |od AS (SELECT src, sum(weight) AS ow FROM symarcs GROUP BY src),
        |pv AS (SELECT e.v,
        |              CAST(1 AS DOUBLE) / (SELECT count(*) FROM ents) AS p
        |       FROM ents e),
        |pr(i, v, x) AS (
        |  SELECT 0, p.v, p.p FROM pv p
        |  UNION ALL
        |  SELECT g.i + 1, g.vid,
        |         CAST(0.5 * (g.contrib + g.ds * p2.p) + 0.5 * p2.p AS DOUBLE)
        |  FROM (
        |    SELECT e.i AS i, e.dst AS vid,
        |           sum(CASE WHEN e.weight = 0 OR e.ow IS NULL THEN CAST(0 AS DOUBLE)
        |                    ELSE e.x * e.weight / e.ow END) AS contrib,
        |           max(e.ds) AS ds
        |    FROM (
        |      SELECT l.i, l.x, a.src, a.dst, a.weight, o.ow,
        |             sum(CASE WHEN o.src IS NULL THEN l.x ELSE CAST(0 AS DOUBLE) END)
        |               OVER (PARTITION BY l.i) AS ds
        |      FROM pr l
        |      JOIN av2 a ON a.src = l.v
        |      LEFT JOIN od o ON o.src = a.src
        |      WHERE l.i < 20
        |    ) e
        |    GROUP BY e.i, e.dst
        |  ) g JOIN pv p2 ON p2.v = g.vid)
        |SELECT v AS entity_id, round(x, 9) AS score FROM pr WHERE i = 20
        |ORDER BY entity_id""".stripMargin),

    // q35 — weighted HITS over the DIRECTED subj→obj entity graph, fixed
    // 20 sweeps, L2-normalized after each half-step. One recursive
    // reference (innermost a-gather); the a-norm / h-gather / h-norm are
    // layered subqueries + windows over it. The 0-weight self-loops give
    // every vertex a row per sweep AND smuggle the vertex's own
    // normalized authority through the h-aggregation (the d2.src=d2.dst
    // row), so the state (h, a) stays one row per vertex per sweep.
    // round(,9) absorbs summation-order noise (q27c design).
    "q35_hits" -> q(
      """, dfe AS (
        |  SELECT src, dst, CAST(count(*) AS DOUBLE) AS weight FROM (
        |    SELECT concat('entity-', md5(subj)) AS src,
        |           concat('entity-', md5(obj)) AS dst
        |    FROM triples WHERE subj <> obj)
        |  GROUP BY src, dst),
        |dav AS (SELECT src, dst, weight FROM dfe
        |        UNION ALL
        |        SELECT v, v, CAST(0 AS DOUBLE) FROM ents),
        |hs(i, v, h, a) AS (
        |  SELECT 0, e.v, CAST(1 AS DOUBLE), CAST(0 AS DOUBLE) FROM ents e
        |  UNION ALL
        |  SELECT s2.i + 1, s2.v,
        |         s2.h1 / (CASE WHEN s2.nh = 0 THEN 1 ELSE s2.nh END),
        |         s2.a_self
        |  FROM (
        |    SELECT t.i, t.v, t.h1, t.a_self,
        |           sqrt(sum(t.h1 * t.h1) OVER (PARTITION BY t.i)) AS nh
        |    FROM (
        |      SELECT u.i AS i, d2.src AS v,
        |             sum(d2.weight * u.a1n) AS h1,
        |             max(CASE WHEN d2.src = d2.dst THEN u.a1n END) AS a_self
        |      FROM (
        |        SELECT g.i, g.v,
        |               g.a1 / (CASE WHEN g.na = 0 THEN 1 ELSE g.na END) AS a1n
        |        FROM (
        |          SELECT w.i, w.v, w.a1,
        |                 sqrt(sum(w.a1 * w.a1) OVER (PARTITION BY w.i)) AS na
        |          FROM (
        |            SELECT l.i AS i, d.dst AS v, sum(d.weight * l.h) AS a1
        |            FROM hs l JOIN dav d ON d.src = l.v
        |            WHERE l.i < 20
        |            GROUP BY l.i, d.dst) w) g) u
        |      JOIN dav d2 ON d2.dst = u.v
        |      GROUP BY u.i, d2.src) t) s2)
        |SELECT v AS entity_id, round(h, 9) AS hub, round(a, 9) AS authority
        |FROM hs WHERE i = 20 ORDER BY entity_id""".stripMargin),

    // q37 — multi-source BFS shortest hops from the 5 highest-df entity
    // seeds. Exact integers; the UNION-dedup recursion terminates via
    // the same 64-round bound the Spark job uses (web-graph diameters
    // are far below it; unreachable stays NULL on both sides).
    "q37_bfs_hops" -> q(
      """, seeds AS (SELECT concat('entity-', md5(entity)) AS v FROM (
        |    SELECT entity FROM (
        |      SELECT entity, count(DISTINCT chunk_id) AS df
        |      FROM chunk_ents GROUP BY entity)
        |    ORDER BY df DESC, entity ASC LIMIT 5)),
        |bfs(v, d) AS (
        |  SELECT v, 0 FROM seeds
        |  UNION
        |  SELECT a.dst, b.d + 1 FROM bfs b JOIN symarcs a ON a.src = b.v
        |  WHERE b.d < 64)
        |SELECT e.v AS entity_id, CAST(min(b.d) AS BIGINT) AS hops
        |FROM ents e LEFT JOIN bfs b ON b.v = e.v
        |GROUP BY e.v ORDER BY entity_id""".stripMargin),

    // q38 — strongly connected components of the directed subj→obj
    // entity graph: scc(v) = min u with v→*u AND u→*v, via one
    // reachability closure self-joined for mutuality (every vertex
    // carries its reflexive (v,v) row, so singletons keep themselves).
    "q38_scc" -> q(
      """, dfe2 AS (
        |  SELECT DISTINCT concat('entity-', md5(subj)) AS src,
        |                  concat('entity-', md5(obj)) AS dst
        |  FROM triples WHERE subj <> obj),
        |r(s, v) AS (
        |  SELECT v, v FROM ents
        |  UNION
        |  SELECT rr.s, a.dst FROM r rr JOIN dfe2 a ON a.src = rr.v)
        |SELECT a.s AS entity_id, min(a.v) AS scc
        |FROM r a JOIN r b ON b.s = a.v AND b.v = a.s
        |GROUP BY a.s ORDER BY entity_id""".stripMargin),

    // q39 — bow-tie decomposition against the LARGEST SCC (count desc,
    // id asc tie-break): core / in (reaches core) / out (reachable from
    // core) / other. Reuses q38's reachability closure; the reflexive
    // (v,v) rows make core ⊆ in ∩ out, so the CASE precedence decides.
    "q39_bowtie" -> q(
      """, dfe2 AS (
        |  SELECT DISTINCT concat('entity-', md5(subj)) AS src,
        |                  concat('entity-', md5(obj)) AS dst
        |  FROM triples WHERE subj <> obj),
        |r(s, v) AS (
        |  SELECT v, v FROM ents
        |  UNION
        |  SELECT rr.s, a.dst FROM r rr JOIN dfe2 a ON a.src = rr.v),
        |sccs AS (
        |  SELECT a.s AS v, min(a.v) AS scc
        |  FROM r a JOIN r b ON b.s = a.v AND b.v = a.s
        |  GROUP BY a.s),
        |giant AS (
        |  SELECT scc FROM (
        |    SELECT scc, count(*) AS c FROM sccs GROUP BY scc
        |    ORDER BY c DESC, scc ASC LIMIT 1)),
        |core AS (SELECT v FROM sccs WHERE scc = (SELECT scc FROM giant)),
        |fwd AS (SELECT DISTINCT r.v FROM r JOIN core c ON r.s = c.v),
        |bwd AS (SELECT DISTINCT r.s AS v FROM r JOIN core c ON r.v = c.v)
        |SELECT e.v AS entity_id,
        |       CASE WHEN e.v IN (SELECT v FROM core) THEN 'core'
        |            WHEN e.v IN (SELECT v FROM bwd) THEN 'in'
        |            WHEN e.v IN (SELECT v FROM fwd) THEN 'out'
        |            ELSE 'other' END AS part
        |FROM ents e ORDER BY entity_id""".stripMargin),

    // q40 — exact neighborhood function (distance distribution) of the
    // directed entity graph: min-hop per reachable ordered pair via the
    // bounded closure (h-carrying variant of q38's recursion — UNION
    // dedups (s,v,h) triples, the h < 64 bound terminates cycles),
    // grouped into #pairs per distance.
    "q40_neighborhood" -> q(
      """, dfe2 AS (
        |  SELECT DISTINCT concat('entity-', md5(subj)) AS src,
        |                  concat('entity-', md5(obj)) AS dst
        |  FROM triples WHERE subj <> obj),
        |r(s, v, h) AS (
        |  SELECT v, v, 0 FROM ents
        |  UNION
        |  SELECT rr.s, a.dst, rr.h + 1 FROM r rr JOIN dfe2 a ON a.src = rr.v
        |  WHERE rr.h < 64),
        |d AS (SELECT s, v, min(h) AS h FROM r GROUP BY s, v)
        |SELECT CAST(h AS BIGINT) AS hops, count(*) AS pairs
        |FROM d GROUP BY h ORDER BY hops""".stripMargin),

    // q41 — k-core coreness: the Montresor h-index iteration unrolled as
    // chained CTEs (closed-form per round, q27c/q33/q35 design). 24
    // rounds is far past the fixpoint on every sf's entity graph — the
    // driver's value compare pits the Spark FIXPOINT against the
    // 24-round unrolled output, so a data change that needed more
    // rounds would fail the gate loudly rather than drift.
    "q41_kcore" -> q(kcoreUnrolled(24)),

    // q42 — exact inbound harmonic centrality: Σ 1/d(u,v) over q40's
    // min-hop closure, unreached vertices 0. The HyperBall `harm`
    // column is the sketch twin (spec-anchored; sketches have no SQL).
    "q42_harmonic" -> q(
      """, dfe2 AS (
        |  SELECT DISTINCT concat('entity-', md5(subj)) AS src,
        |                  concat('entity-', md5(obj)) AS dst
        |  FROM triples WHERE subj <> obj),
        |r(s, v, h) AS (
        |  SELECT v, v, 0 FROM ents
        |  UNION
        |  SELECT rr.s, a.dst, rr.h + 1 FROM r rr JOIN dfe2 a ON a.src = rr.v
        |  WHERE rr.h < 64),
        |d AS (SELECT s, v, min(h) AS h FROM r GROUP BY s, v)
        |SELECT e.v AS entity_id, CAST(coalesce(hh.h, 0.0) AS DOUBLE) AS harmonic
        |FROM ents e LEFT JOIN (
        |  SELECT v, sum(1.0 / h) AS h FROM d WHERE h > 0 GROUP BY v) hh
        |  ON hh.v = e.v
        |ORDER BY entity_id""".stripMargin),

    // q46 — the sketch-path tolerance gate: rows are the EXACT cumulative
    // neighborhood curve (q40's closure, running-sum window); the two
    // booleans are computed Spark-side (deterministic HLL within ±5% of
    // exact for the N(t) curve and the total harmonic mass) and pinned to
    // literal TRUE here — a sketch regression past the committed
    // tolerance breaks the value hash loudly.
    "q46_hyperball" -> q(
      """, dfe2 AS (
        |  SELECT DISTINCT concat('entity-', md5(subj)) AS src,
        |                  concat('entity-', md5(obj)) AS dst
        |  FROM triples WHERE subj <> obj),
        |r(s, v, h) AS (
        |  SELECT v, v, 0 FROM ents
        |  UNION
        |  SELECT rr.s, a.dst, rr.h + 1 FROM r rr JOIN dfe2 a ON a.src = rr.v
        |  WHERE rr.h < 64),
        |d AS (SELECT s, v, min(h) AS h FROM r GROUP BY s, v),
        |e AS (SELECT h, count(*) AS c FROM d GROUP BY h)
        |SELECT CAST(h AS BIGINT) AS hops,
        |       CAST(sum(c) OVER (ORDER BY h) AS BIGINT) AS pairs_cum,
        |       TRUE AS curve_ok, TRUE AS harm_ok
        |FROM e ORDER BY hops""".stripMargin),

    // q47 — deterministic random walks, replayed EXACTLY: same dst-sorted
    // adjacency index, same first-8-md5-hex-digits step hash (the q15
    // portable-md5 pattern), same mod-outdeg choice. Dead ends stop.
    "q47_walks" -> q(
      """, dfe3 AS (
        |  SELECT DISTINCT concat('entity-', md5(subj)) AS src,
        |                  concat('entity-', md5(obj)) AS dst
        |  FROM triples WHERE subj <> obj),
        |wadj AS (SELECT src, dst,
        |                row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
        |         FROM dfe3),
        |wdeg AS (SELECT src, count(*) AS deg FROM wadj GROUP BY src),
        |wk(start, walk, step, v) AS (
        |  SELECT v, w.walk, CAST(0 AS BIGINT), v
        |  FROM ents CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) w(walk)
        |  UNION ALL
        |  SELECT wk.start, wk.walk, wk.step + 1, a.dst
        |  FROM wk
        |  JOIN wdeg d ON d.src = wk.v
        |  JOIN wadj a ON a.src = wk.v
        |   AND a.idx = CAST(concat('0x', substr(md5(concat_ws('|', 'w', wk.start,
        |         CAST(wk.walk AS VARCHAR), CAST(wk.step + 1 AS VARCHAR))), 1, 8)) AS BIGINT)
        |       % d.deg
        |  WHERE wk.step < 8)
        |SELECT start AS start_id, walk, step, v AS vid
        |FROM wk ORDER BY start_id, walk, step""".stripMargin),

    // q51 — skip-gram pairs over the q47 walk corpus (window 2): the
    // identical walk replay (q47's recursive CTE), self-joined on the
    // walk id with 0 < |Δstep| <= 2, counted per (center, context).
    "q51_skipgrams" -> q(
      """, dfe3 AS (
        |  SELECT DISTINCT concat('entity-', md5(subj)) AS src,
        |                  concat('entity-', md5(obj)) AS dst
        |  FROM triples WHERE subj <> obj),
        |wadj AS (SELECT src, dst,
        |                row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
        |         FROM dfe3),
        |wdeg AS (SELECT src, count(*) AS deg FROM wadj GROUP BY src),
        |wk(start, walk, step, v) AS (
        |  SELECT v, w.walk, CAST(0 AS BIGINT), v
        |  FROM ents CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) w(walk)
        |  UNION ALL
        |  SELECT wk.start, wk.walk, wk.step + 1, a.dst
        |  FROM wk
        |  JOIN wdeg d ON d.src = wk.v
        |  JOIN wadj a ON a.src = wk.v
        |   AND a.idx = CAST(concat('0x', substr(md5(concat_ws('|', 'w', wk.start,
        |         CAST(wk.walk AS VARCHAR), CAST(wk.step + 1 AS VARCHAR))), 1, 8)) AS BIGINT)
        |       % d.deg
        |  WHERE wk.step < 8)
        |SELECT a.v AS center_id, b.v AS context_id, count(*) AS pairs
        |FROM wk a JOIN wk b
        |  ON a.start = b.start AND a.walk = b.walk
        | AND a.step <> b.step AND abs(a.step - b.step) <= 2
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // q50 — top-30 trigram shingles by document frequency (dsh is
    // doc-distinct by construction, so count(*) == df).
    "q50_ngram_stats" -> q(
      """, ngd AS (SELECT sh, count(*) AS df FROM dsh GROUP BY sh)
        |SELECT sh, df,
        |       CAST(row_number() OVER (ORDER BY df DESC, sh ASC) AS INT) AS rank
        |FROM ngd ORDER BY df DESC, sh ASC LIMIT 30""".stripMargin),

    // q49 — 30-minute-gap sessionization. floor(epoch()) matches Spark's
    // timestamp→long truncation (bare CAST in DuckDB ROUNDS the fraction).
    "q49_sessionize" -> q(
      """, sev AS (SELECT user_id, event_id, ts,
        |                 CAST(floor(epoch(ts)) AS BIGINT) AS tsec
        |          FROM events),
        |sfl AS (SELECT user_id, event_id, ts, tsec,
        |          CASE WHEN lag(tsec) OVER w IS NULL
        |                 OR tsec - lag(tsec) OVER w > 1800 THEN 1 ELSE 0 END
        |            AS new_session
        |        FROM sev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sse AS (SELECT user_id, event_id, tsec,
        |          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
        |        FROM sfl)
        |SELECT user_id, CAST(session AS BIGINT) AS session,
        |       count(*) AS n_events, min(event_id) AS first_event,
        |       max(tsec) - min(tsec) AS duration_sec
        |FROM sse GROUP BY user_id, session ORDER BY user_id, session""".stripMargin),

    // q48 — BM25 top-20 (k1=1.2, b=0.75, Lucene idf). Per-(doc,term)
    // doubles are pure functions of identical integer stats (bitwise
    // equal across engines); the per-doc sum is FIXED-POINT micros, so
    // ordering and the hash gate are exact, not fp-order-lucky.
    "q48_bm25" -> q(
      """, btf AS (SELECT doc_id, tok AS term, count(*) AS tf
        |          FROM dtoks GROUP BY doc_id, tok),
        |bdl AS (SELECT doc_id, count(*) AS dl FROM dtoks GROUP BY doc_id),
        |bdf AS (SELECT term, count(*) AS df FROM btf GROUP BY term),
        |bg AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM docs) AS n,
        |              (SELECT avg(dl) FROM bdl) AS avgdl),
        |bidf AS (SELECT term, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
        |         FROM bdf CROSS JOIN bg),
        |bq(term) AS (VALUES ('slow'), ('stream'), ('filter'), ('join')),
        |bs AS (
        |  SELECT t.doc_id,
        |         CAST(round(i.idf * (t.tf * 2.2) /
        |           (t.tf + 1.2 * (0.25 + 0.75 * d.dl / g.avgdl)) * 1e6) AS BIGINT)
        |           AS sm
        |  FROM btf t
        |  JOIN bdl d ON d.doc_id = t.doc_id
        |  JOIN bidf i ON i.term = t.term
        |  JOIN bq ON bq.term = t.term
        |  CROSS JOIN bg g),
        |bsum AS (SELECT doc_id, sum(sm) AS score_micro FROM bs GROUP BY doc_id)
        |SELECT doc_id, CAST(score_micro AS BIGINT) AS score_micro,
        |       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INT)
        |         AS rank
        |FROM bsum ORDER BY score_micro DESC, doc_id ASC LIMIT 20""".stripMargin),

    // q43 — local clustering coefficient: q25's triangle CTE + symarcs
    // degrees, lcc = 2T/(d(d-1)) rounded like the Spark side, 0 below
    // degree 2.
    "q43_clustering" -> q(
      """, undx AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
        |           FROM fe WHERE src <> dst GROUP BY 1, 2),
        |trix AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |         FROM undx e1
        |         JOIN undx e2 ON e2.a = e1.b
        |         JOIN undx e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tcnt AS (SELECT v, count(*) AS c FROM (
        |           SELECT x AS v FROM trix UNION ALL
        |           SELECT y FROM trix UNION ALL
        |           SELECT z FROM trix) GROUP BY v),
        |degx AS (SELECT src AS v, count(*) AS d FROM symarcs GROUP BY src)
        |SELECT e.v AS entity_id,
        |       CAST(CASE WHEN coalesce(dg.d, 0) >= 2
        |            THEN round(2.0 * coalesce(t.c, 0) / (dg.d * (dg.d - 1.0)), 9)
        |            ELSE 0.0 END AS DOUBLE) AS lcc
        |FROM ents e
        |LEFT JOIN tcnt t ON t.v = e.v
        |LEFT JOIN degx dg ON dg.v = e.v
        |ORDER BY entity_id""".stripMargin),

    // q44 — directed-arc reciprocity over q40's dfe2 arc set.
    "q44_reciprocity" -> q(
      """, dfe2 AS (
        |  SELECT DISTINCT concat('entity-', md5(subj)) AS src,
        |                  concat('entity-', md5(obj)) AS dst
        |  FROM triples WHERE subj <> obj)
        |SELECT (SELECT count(*) FROM dfe2) AS n_arcs,
        |       (SELECT count(*) FROM dfe2 a
        |        WHERE EXISTS (SELECT 1 FROM dfe2 b
        |                      WHERE b.src = a.dst AND b.dst = a.src)) AS n_recip,
        |       CAST(round((SELECT count(*) FROM dfe2 a
        |         WHERE EXISTS (SELECT 1 FROM dfe2 b
        |                       WHERE b.src = a.dst AND b.dst = a.src))
        |         * 1.0 / (SELECT count(*) FROM dfe2), 9) AS DOUBLE) AS reciprocity""".stripMargin),

    // q45 — degree assortativity: Pearson r of endpoint degrees over the
    // symmetrized arc set, spelled as guarded covar_pop/√(var·var). A
    // regular graph (sf0.1's complete entity graph) has zero degree
    // variance → r undefined: defined=false + 0.0 sentinel (never NULL —
    // a NULL double round-trips as NaN and NaN ≠ NaN breaks value-hash
    // comparators; plain corr also throws under Spark ANSI there).
    // Normalization-invariant, so engines agree to summation-order
    // noise, absorbed by round 9.
    "q45_assortativity" -> q(
      """, degx AS (SELECT src AS v, count(*) AS d FROM symarcs GROUP BY src),
        |mom AS (
        |  SELECT covar_pop(ds.d, dd.d) AS cv,
        |         var_pop(ds.d) AS vs, var_pop(dd.d) AS vd
        |  FROM symarcs a
        |  JOIN degx ds ON ds.v = a.src
        |  JOIN degx dd ON dd.v = a.dst)
        |SELECT (coalesce(vs, 0) > 0 AND coalesce(vd, 0) > 0) AS defined,
        |       CAST(CASE WHEN vs > 0 AND vd > 0
        |            THEN round(cv / sqrt(vs * vd), 9) ELSE 0.0 END AS DOUBLE)
        |       AS assortativity
        |FROM mom""".stripMargin),

    // q27 — the tol-CONVERGED full-graph PPR, value-checked against a
    // COMMITTED GOLDEN parquet (round-3 verdict ask #4): a converged
    // fixpoint has no closed-form SQL, so the oracle reads the committed
    // artifact and the driver hash-compares the live query against it.
    // The golden's own provenance is independently validated — scripts/
    // check_q27_golden.py re-derives the graph in DuckDB (same SQL as the
    // value-matched q05/q06/q07 oracles) and recomputes converged PPR in
    // networkx: max |golden − networkx| = 5.0e-10 at both sf (exactly the
    // round-9 granularity); PprSpec pins the live query to the golden in
    // `sbt test`. Dispatch keys on an md5 fingerprint of the documents
    // table (sf0.001 and sf0.01 have the same ROW COUNT, different text),
    // so running at an unknown sf yields zero rows — a visible failure,
    // never a silent pass. Regenerate: sbt "Test/runMain graft.GenQ27Golden".
    "q27_ppr" -> """
      |WITH fp AS (
      |  SELECT md5(string_agg(doc_id || '|' || md5(text), ',' ORDER BY doc_id)) AS h
      |  FROM documents)
      |SELECT key, score FROM read_parquet(
      |    '/root/repo/src/test/resources/goldens/q27_sf0.001.parquet/*.parquet')
      |  WHERE (SELECT h FROM fp) = '168838718712ad35ebcb39b22cfbacda'
      |UNION ALL
      |SELECT key, score FROM read_parquet(
      |    '/root/repo/src/test/resources/goldens/q27_sf0.01.parquet/*.parquet')
      |  WHERE (SELECT h FROM fp) = '486571b645d130d4474e780cd131072a'
      |UNION ALL
      |SELECT key, score FROM read_parquet(
      |    '/root/repo/src/test/resources/goldens/q27_sf0.1.parquet/*.parquet')
      |  WHERE (SELECT h FROM fp) = '831ea9d2e1640d34f43fe75fea4aa2a8'
      |ORDER BY score DESC, key ASC""".stripMargin,

    "q26_degrees" -> q(
      """SELECT src AS entity_id, round(sum(weight), 6) AS wdegree,
        |       count(*) AS degree
        |FROM symarcs GROUP BY src ORDER BY entity_id""".stripMargin),

    "q30_openie_stats" -> q(
      """SELECT round(avg(length(entity)), 9) AS avg_ent_chars,
        |       round(avg(len(string_split(entity, ' '))), 9) AS avg_ent_words
        |FROM chunk_ents""".stripMargin),

    // q34 — html tag strip: the byte-scan kernel ≡ RE2's '<[^>]*>'
    // global replace (identical semantics: no backtracking is involved,
    // '[^>]*' cannot cross a '>').
    "q34_html_strip" -> """
      |SELECT doc_id,
      |  regexp_replace('<html lang="' || lang || '"><body>' || chr(10) ||
      |    '<p class="d">' || text || '</p><br/></body></html>',
      |    '<[^>]*>', '', 'g') AS extracted
      |FROM documents ORDER BY doc_id""".stripMargin,

    // q36 — host-level link rollup: deterministic urls + deterministic
    // doc→doc links (i→i+1, i→2i, i→⌊i/3⌋ where the target exists),
    // hosts via the same '://([^/:?#]*)' extraction the byte-scan kernel
    // implements, aggregated to the (src_host, dst_host) domain graph.
    "q36_host_graph" -> """
      |WITH d AS (
      |  SELECT doc_id,
      |         'https://h' || (doc_id % 97) || '.example.org/p/' || doc_id AS url
      |  FROM documents),
      |links AS (
      |  SELECT src_id, dst_id FROM (
      |    SELECT doc_id AS src_id, doc_id + 1 AS dst_id FROM d
      |    UNION ALL
      |    SELECT doc_id, doc_id * 2 FROM d
      |    UNION ALL
      |    SELECT doc_id, doc_id // 3 FROM d)
      |  WHERE src_id <> dst_id)
      |SELECT lower(regexp_extract(ds.url, '://([^/:?#]*)', 1)) AS src_host,
      |       lower(regexp_extract(dd.url, '://([^/:?#]*)', 1)) AS dst_host,
      |       count(*) AS links
      |FROM links l
      |JOIN d ds ON ds.doc_id = l.src_id
      |JOIN d dd ON dd.doc_id = l.dst_id
      |GROUP BY 1, 2
      |ORDER BY src_host, dst_host""".stripMargin,

    // q52 — the q46-style sketch tolerance gate: exact per-type distinct
    // users + est_ok pinned TRUE (Spark computes TRUE iff the lgK=12 HLL
    // estimate is within ±5% of exact; ~1.6% standard error).
    "q52_distinct_sketch" -> """
      |SELECT event_type, count(DISTINCT user_id) AS exact_users, TRUE AS est_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q28_json_extract" -> """
      |SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin,

    "q29_window_agg" -> """
      |SELECT date_trunc('hour', ts) AS hour, event_type,
      |       count(*) AS n, round(sum(value), 6) AS total
      |FROM events GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY hour, event_type""".stripMargin
  )
}
