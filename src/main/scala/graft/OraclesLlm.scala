package graft

/** DuckDB oracle SQL for the LLM-pipeline rows, plus the shared SQL CTE builders (PCA sweeps, DSIR census, Hamming pack/shortlist/curve, graph supersteps). */
private[graft] object OraclesLlm {


  // ------------------------------------------------------------- oracle SQL

  /** Shared CTE chain for the PCA oracles: quantize → relational Gram →
    * exact-integer centering → mirror to the full symmetric covariance →
    * one |c| ≤ 1e6 rescale → 12 unrolled power-iteration sweeps, each a
    * mat-vec plus a sign-wrapped |w| ≤ 1e5 rescale (DuckDB `//` floors
    * while Spark `div` truncates — the `CASE WHEN x < 0 THEN -((-x)//sc)`
    * form makes both truncate toward zero). Ends at CTE `w12`.
    */
  /** The shared scale-then-sweep tail of the power-iteration oracles:
    * from a `cov (j, k, c)` CTE — one |c| ≤ 1e6 rescale, diagonal start,
    * 12 mat-vec sweeps each with the sign-wrapped |w| ≤ 1e5 rescale
    * (DuckDB `//` floors, the CASE form truncates toward zero like
    * Spark `div`/Scala `/`).
    */
  private val pcaSweepSql: String = {
    val scale =
      """,
        |csc AS (SELECT max(abs(c)) // 1000000 + 1 AS sc FROM cov),
        |cs AS MATERIALIZED (SELECT j, k,
        |    CASE WHEN c < 0 THEN -((-c) // sc) ELSE c // sc END AS c
        |  FROM cov CROSS JOIN csc),
        |w0 AS MATERIALIZED (SELECT j AS pos, c AS w FROM cs WHERE j = k)""".stripMargin
    val sweeps = (1 to 12).map { t =>
      s""",
         |m$t AS (SELECT cs.j AS pos, sum(cs.c * w${t - 1}.w) AS m FROM cs JOIN w${t - 1} ON w${t - 1}.pos = cs.k GROUP BY 1),
         |sc$t AS (SELECT max(abs(m)) // 100000 + 1 AS sc FROM m$t),
         |w$t AS MATERIALIZED (SELECT pos, CASE WHEN m < 0 THEN -((-m) // sc) ELSE m // sc END AS w FROM m$t CROSS JOIN sc$t)""".stripMargin
    }.mkString
    scale + sweeps
  }

  /** Shared CTE chain of the DSIR importance oracles: tokenize → md5
    * bucket grid → target/raw census → smoothed bit-resolution llr.
    */
  private val importanceSqlCtes: String =
    """WITH t AS (SELECT doc_id, lang = 'en' AS tgt, unnest(string_split(lower(text), ' ')) AS w FROM documents),
      |t2 AS (SELECT doc_id, tgt, w FROM t WHERE length(w) > 0),
      |g AS (SELECT doc_id, tgt, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 1024 AS b, count(*) AS c
      |      FROM t2 GROUP BY 1, 2, 3),
      |cen AS (SELECT b, sum(CASE WHEN tgt THEN c ELSE 0 END) AS tgt_c,
      |               sum(CASE WHEN tgt THEN 0 ELSE c END) AS raw_c
      |        FROM g GROUP BY 1),
      |tot AS (SELECT sum(tgt_c) AS rt, sum(raw_c) AS rr FROM cen),
      |llr AS (SELECT b,
      |    (length(bin(CAST((tgt_c + 1) * (rr + 1024) AS BIGINT))) - 1)
      |  - (length(bin(CAST((raw_c + 1) * (rt + 1024) AS BIGINT))) - 1) AS llr
      |  FROM cen CROSS JOIN tot)""".stripMargin

  /** The two packed sign words of the binary sketch, as margin-carrying
    * SQL select-list lines (shifts below bit 32 — engine-safe) — shared
    * by every Hamming-tier oracle; callers splice it into a
    * `SELECT vec_id, <this> FROM e` CTE before `.stripMargin` runs.
    */
  private val binPackColsSql: String =
    """CAST(list_sum(list_transform(range(0, 32), j ->
      |    CASE WHEN vq[j + 1] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS blo,
      |  CAST(list_sum(list_transform(range(0, 32), j ->
      |    CASE WHEN vq[j + 33] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bhi""".stripMargin

  /** Shared CTE chain for the two-stage binary-search oracles: sign
    * sketches → Hamming shortlist-16 (`short`) → exact cosine over all
    * query-corpus pairs (`exsc`, reused as ground truth by the recall
    * row) → shortlist-restricted re-rank (`rr`).
    */
  private val hammingShortlistSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
      |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
      |b AS (SELECT vec_id,
      |  ${binPackColsSql}
      |  FROM e),
      |hq AS (SELECT vec_id AS qid, blo AS qlo, bhi AS qhi FROM b WHERE vec_id % 50 = 0),
      |hs AS (SELECT qid, b.vec_id AS nid,
      |    bit_count(xor(b.blo, qlo)) + bit_count(xor(b.bhi, qhi)) AS ham
      |  FROM b CROSS JOIN hq WHERE b.vec_id <> qid),
      |short AS (SELECT qid, nid FROM (SELECT qid, nid,
      |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid ASC) AS rank FROM hs)
      |  WHERE rank <= 16),
      |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
      |exsc AS (SELECT qid, en.vec_id AS nid,
      |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
      |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
      |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
      |rr AS (SELECT exsc.qid, exsc.nid, cos,
      |    row_number() OVER (PARTITION BY exsc.qid ORDER BY cos DESC, exsc.nid ASC) AS rank
      |  FROM exsc JOIN short ON short.qid = exsc.qid AND short.nid = exsc.nid)""".stripMargin

  /** The recall-vs-shortlist sweep oracle (llm_hamming_curve): sketches →
    * ONE Hamming rank pass (`hr`) → per-breadth shortlist cuts re-ranked
    * by exact cosine → recall@3 of each against the shared exact truth.
    * Breadths are k × {2, 4, 8} = 6/12/24 at k = 3, mirroring the IVF
    * probe sweep.
    */
  private val hammingCurveSql: String = {
    val breadths = Seq(6, 12, 24)
    val rrCtes = breadths.map { sl =>
      s"""rr$sl AS (SELECT qid, nid FROM (
         |  SELECT exsc.qid, exsc.nid,
         |    row_number() OVER (PARTITION BY exsc.qid ORDER BY cos DESC, exsc.nid ASC) AS rank
         |  FROM exsc JOIN hr ON hr.qid = exsc.qid AND hr.nid = exsc.nid AND hr.hrank <= $sl)
         |  WHERE rank <= 3),
         |h$sl AS (SELECT count(*) AS n_hits FROM truth JOIN rr$sl USING (qid, nid))"""
        .stripMargin
    }.mkString(",\n")
    val legs = breadths.map { sl =>
      s"""SELECT 'hamming_sl$sl' AS path, CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST(n_truth AS BIGINT) AS n_truth,
         |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
         |FROM h$sl CROSS JOIN tot""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
       |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
       |b AS (SELECT vec_id,
       |  ${binPackColsSql}
       |  FROM e),
       |hq AS (SELECT vec_id AS qid, blo AS qlo, bhi AS qhi FROM b WHERE vec_id % 50 = 0),
       |hs AS (SELECT qid, b.vec_id AS nid,
       |    bit_count(xor(b.blo, qlo)) + bit_count(xor(b.bhi, qhi)) AS ham
       |  FROM b CROSS JOIN hq WHERE b.vec_id <> qid),
       |hr AS (SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid ASC) AS hrank FROM hs),
       |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
       |exsc AS (SELECT qid, en.vec_id AS nid,
       |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
       |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
       |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
       |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM exsc)
       |  WHERE rank <= 3),
       |tot AS (SELECT count(*) AS n_truth FROM truth),
       |$rrCtes
       |$legs""".stripMargin
  }

  private val pcaPowerSqlPrefix: String = {
    val head =
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |g AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |s AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM e),
        |cov0 AS (SELECT g.j, g.k, CAST(n.n * g.g - sj.s * sk.s AS BIGINT) AS c
        |  FROM g JOIN s sj ON sj.j = g.j JOIN s sk ON sk.j = g.k CROSS JOIN n),
        |cov AS MATERIALIZED (
        |  SELECT j, k, c FROM cov0
        |  UNION ALL
        |  SELECT k AS j, j AS k, c FROM cov0 WHERE j <> k)""".stripMargin
    head + pcaSweepSql
  }

  /** The G'-eigensolve oracle head (llm_pca_shifted_power): integer
    * per-dim means with the sign-wrapped truncating division, Gram of
    * the SHIFTED grid, mirrored to the full symmetric matrix — then the
    * identical scale-and-sweep tail. This is the billion-row production
    * path ([[graft.llm.Pca.componentFromShiftedGram]]): no N²-scale
    * centering anywhere, so every stored magnitude stays a factor N
    * below the one-pass form's.
    */
  private val pcaShiftedPowerSqlPrefix: String = {
    val head =
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |n AS (SELECT count(*) AS n FROM e),
        |s0 AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |mm AS (SELECT j, CASE WHEN s < 0 THEN -((-s) // n.n) ELSE s // n.n END AS m
        |      FROM s0 CROSS JOIN n),
        |sh AS (SELECT u.vec_id, u.pos, u.v - mm.m AS v
        |      FROM u JOIN mm ON mm.j = u.pos - 1),
        |g0 AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM sh a JOIN sh b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |cov AS MATERIALIZED (
        |  SELECT j, k, g AS c FROM g0
        |  UNION ALL
        |  SELECT k AS j, j AS k, g AS c FROM g0 WHERE j <> k)""".stripMargin
    head + pcaSweepSql
  }


  /** DuckDB replay of [[llm.Graphs.pageRankPpb]] over the synthetic
    * arithmetic-neighbour doc graph: one MATERIALIZED CTE per superstep
    * (without the hint DuckDB re-inlines each multiply-referenced step —
    * the llm_bpe_train lesson), exact BIGINT `//` arithmetic.
    */
  private def pagerankOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (SELECT doc.doc_id,
         |    CAST(150000000 + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS rank_ppb
         |  FROM documents doc LEFT JOIN (
         |    SELECT e.dst AS dst, sum(r.rank_ppb // d.deg) AS c
         |    FROM e JOIN r${k - 1} r ON e.src = r.doc_id
         |    JOIN d ON d.src = e.src
         |    GROUP BY e.dst) s ON doc.doc_id = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |d AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT doc_id, CAST(1000000000 AS BIGINT) AS rank_ppb FROM documents),
       |$steps
       |SELECT doc_id, rank_ppb FROM r$iters""".stripMargin
  }

  /** The shared synthetic-graph CTE prefix (edges + out-degrees). */
  private val graphCtes: String =
    s"""nn AS (SELECT count(*) AS n FROM documents),
       |e AS MATERIALIZED (
       |  SELECT doc_id AS src, (doc_id * 7 + 3) % nn.n AS dst FROM documents, nn
       |  UNION ALL
       |  SELECT doc_id AS src, (doc_id * 13 + 5) % nn.n AS dst FROM documents, nn
       |  UNION ALL
       |  SELECT doc_id AS src, (doc_id * 3 + 1) % nn.n AS dst FROM documents, nn
       |    WHERE doc_id % 2 = 0)""".stripMargin

  /** DuckDB replay of [[llm.Graphs.trustRankPpb]]: seed-scaled teleport
    * (doc_id % 97 seeds), otherwise the pagerankOracle superstep shape.
    */
  private def trustrankOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (SELECT t.doc_id,
         |    CAST(t.tele + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS rank_ppb
         |  FROM tele t LEFT JOIN (
         |    SELECT e.dst AS dst, sum(r.rank_ppb // d.deg) AS c
         |    FROM e JOIN r${k - 1} r ON e.src = r.doc_id
         |    JOIN d ON d.src = e.src
         |    GROUP BY e.dst) s ON t.doc_id = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |d AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |ss AS (SELECT count(*) AS s FROM documents WHERE doc_id % 97 = 0),
       |tele AS MATERIALIZED (SELECT doc_id,
       |  CAST(CASE WHEN doc_id % 97 = 0 THEN (150000000 * nn.n) // ss.s ELSE 0 END AS BIGINT) AS tele
       |  FROM documents, nn, ss),
       |r0 AS (SELECT doc_id, CAST(1000000000 AS BIGINT) AS rank_ppb FROM documents),
       |$steps
       |SELECT doc_id, rank_ppb FROM r$iters""".stripMargin
  }

  /** DuckDB replay of [[llm.Graphs.labelPropagation]]: symmetrized
    * edges, then one CTE per superstep — (node, label) counts, top-1 by
    * (cnt DESC, label ASC), isolated nodes keep their label.
    */
  private def lpaOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""c$k AS (SELECT s.u AS doc_id, p.community, count(*) AS cnt
         |  FROM sym s JOIN l${k - 1} p ON s.v = p.doc_id
         |  GROUP BY s.u, p.community),
         |p$k AS (SELECT doc_id, community FROM c$k
         |  QUALIFY row_number() OVER (PARTITION BY doc_id
         |    ORDER BY cnt DESC, community ASC) = 1),
         |l$k AS MATERIALIZED (SELECT p.doc_id,
         |    CAST(COALESCE(pk.community, p.community) AS BIGINT) AS community
         |  FROM l${k - 1} p LEFT JOIN p$k pk ON p.doc_id = pk.doc_id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |sym AS MATERIALIZED (SELECT src AS u, dst AS v FROM e
       |  UNION ALL SELECT dst AS u, src AS v FROM e),
       |l0 AS (SELECT doc_id, CAST(doc_id AS BIGINT) AS community FROM documents),
       |$steps
       |SELECT doc_id, community FROM l$iters""".stripMargin
  }

  /** DuckDB replay of [[llm.Graphs.bfsDistance]]: each superstep is the
    * frontier join + min fold over (previous ∪ relaxed) distances.
    */
  private def seedDistanceOracle(maxDepth: Int): String = {
    val steps = (1 to maxDepth).map { k =>
      s"""d$k AS MATERIALIZED (SELECT doc_id, CAST(min(dist) AS BIGINT) AS dist FROM (
         |    SELECT doc_id, dist FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS doc_id, p.dist + 1 AS dist
         |    FROM e JOIN d${k - 1} p ON e.src = p.doc_id
         |  ) GROUP BY doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |d0 AS (SELECT doc_id, CAST(0 AS BIGINT) AS dist FROM documents WHERE doc_id % 97 = 0),
       |$steps
       |SELECT doc_id, dist FROM d$maxDepth""".stripMargin
  }

  /** Shared by llm_ivfpq_search and llm_ivf_pruned_probe: the pruned
    * probe returns exactly the join-based probe's rows, so both rows
    * replay the same training + cell-restricted ADC chain.
    */
  private val ivfPqSearchSql: String =
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e
        |  UNION ALL SELECT vec_id, 2 AS sub, fq AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |cellsc AS (SELECT vec_id, cid AS cell FROM sel WHERE sub = 2),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM rf WHERE sub = 2 AND vec_id % 50 = 0 AND rn <= 2),
        |qh AS (SELECT vec_id AS qid, sub, vq FROM en WHERE sub < 2 AND vec_id % 50 = 0),
        |lut AS (SELECT qh.qid, qh.sub, cent.cid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qh.vq)), i -> qh.vq[i] * cent.cv[i])) AS BIGINT) AS ld
        |  FROM qh JOIN cent ON qh.sub = cent.sub),
        |qn AS (SELECT vec_id AS qid, fnorm FROM fn WHERE vec_id % 50 = 0),
        |sc AS (SELECT probes.qid, p.vec_id AS nid,
        |    CAST(l0.ld + l1.ld AS DOUBLE) / (sqrt(CAST(qn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS approx_cos
        |  FROM p JOIN cellsc ON cellsc.vec_id = p.vec_id
        |       JOIN probes ON probes.cell = cellsc.cell
        |       JOIN lut l0 ON l0.sub = 0 AND l0.qid = probes.qid AND l0.cid = p.code0
        |       JOIN lut l1 ON l1.sub = 1 AND l1.qid = probes.qid AND l1.cid = p.code1
        |       JOIN qn ON qn.qid = probes.qid
        |  WHERE p.vec_id <> probes.qid),
        |rk AS (SELECT qid, nid, approx_cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY approx_cos DESC, nid ASC) AS rank FROM sc)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, approx_cos FROM rk WHERE rank <= 3""".stripMargin

  /** Shared by llm_bm25 and llm_bm25_index: the persisted-index probe
    * returns exactly the inline path's rows, so both rows replay the
    * same tokenize + Okapi-score + rank chain.
    */
  private val bm25Sql: String =
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |qt AS (SELECT DISTINCT query_id, word FROM
        |  (SELECT doc_id AS query_id, unnest(ws[1:5]) AS word FROM w WHERE doc_id % 97 = 0)),
        |qw AS (SELECT DISTINCT word FROM qt),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc GROUP BY query_id, nid),
        |r AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, score_micro
        |FROM r WHERE rank <= 5""".stripMargin

  /** Shared by llm_phrase_search (persisted-index probe) and
    * llm_phrase_update (additive fold): both must reproduce the
    * full-corpus slot-vote phrase chain exactly.
    */
  private val phraseSql: String =
      """WITH d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word, generate_subscripts(ws, 1) AS p FROM d),
        |q AS (SELECT doc_id AS query_id, ws[2:4] AS qs FROM d WHERE doc_id % 89 = 0),
        |qw AS (SELECT query_id, unnest(qs) AS word, generate_subscripts(qs, 1) AS i FROM q),
        |nw AS (SELECT query_id, count(*) AS n_words FROM qw GROUP BY 1),
        |hits AS (SELECT qw.query_id, tok.nid, tok.p - qw.i AS s FROM tok JOIN qw USING (word)),
        |cand AS (SELECT query_id, nid, s, count(*) AS k_i FROM hits GROUP BY 1, 2, 3),
        |occ AS (SELECT c.query_id, c.nid, CAST(count(*) AS BIGINT) AS n_occurrences
        |  FROM cand c JOIN nw USING (query_id) WHERE c.k_i = nw.n_words GROUP BY 1, 2),
        |ranked AS (SELECT query_id, nid, n_occurrences,
        |  row_number() OVER (PARTITION BY query_id ORDER BY n_occurrences DESC, nid ASC) AS rank FROM occ)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, n_occurrences
        |FROM ranked WHERE rank <= 5""".stripMargin

  def registry: Map[String, String] = Map(

    "llm_exact_dedup" ->
      """SELECT doc_id, md5(text) AS content_key,
        |  doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
        |FROM documents""".stripMargin,
    "llm_minhash_neardup" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id)
        |SELECT id_a, id_b, jaccard FROM cand WHERE jaccard >= 0.5""".stripMargin,
    // llm_minhash_recall oracle: the full band chain + the brute
    // sample-restricted truth + the hit/recall summary row
    "llm_minhash_recall" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |smp AS (SELECT doc_id, shingles FROM hs
        |  ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT), doc_id LIMIT 64),
        |found AS (SELECT id_a AS qid, id_b AS nid FROM cand
        |  WHERE jaccard >= 0.5 AND (id_a IN (SELECT doc_id FROM smp) OR id_b IN (SELECT doc_id FROM smp))),
        |truth AS (SELECT DISTINCT least(s.doc_id, c.doc_id) AS qid, greatest(s.doc_id, c.doc_id) AS nid
        |  FROM smp s JOIN hs c ON s.doc_id <> c.doc_id
        |    AND len(c.shingles) * 2 >= len(s.shingles) AND len(c.shingles) <= len(s.shingles) * 2
        |  WHERE CAST(len(list_intersect(s.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(s.shingles, c.shingles))) >= 0.5),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN found USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'minhash_bands' AS path, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin,
    // llm_simhash_neardup oracle: brute all-pairs hamming over the 60-bit
    // fingerprint chain — the block decomposition is provably lossless at
    // radius 3 < 4 blocks, so exact equality is the contract
    "llm_simhash_neardup" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |f AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), k ->
        |  CASE WHEN list_sum(list_transform(shash, h ->
        |      CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        |    THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)) AS BIGINT) AS sh FROM hs)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM f a JOIN f b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin,
    "llm_simhash" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash FROM sh)
        |SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 31), k ->
        |  CASE WHEN list_sum(list_transform(shash, h ->
        |      CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        |    THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)) AS BIGINT) AS simhash
        |FROM hs""".stripMargin,
    "llm_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash FROM sh),
        |b AS (SELECT d.lang, d.source, hs.doc_id, hs.shingles FROM hs JOIN documents d USING (doc_id) WHERE len(hs.shingles) > 0)
        |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
        |  CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |FROM b a JOIN b c ON a.lang = c.lang AND a.source = c.source AND a.doc_id < c.doc_id
        |WHERE CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.shingles, c.shingles))) >= 0.5""".stripMargin,
    "llm_text_stats" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash FROM sh)
        |SELECT hs.doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpeish_tokens,
        |  (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |        WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |   CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |             BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |   CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |  ) / 3.0 AS quality,
        |  list_min(shash) AS fingerprint,
        |  md5(text) AS content_key
        |FROM hs JOIN w ON hs.doc_id = w.doc_id JOIN documents d ON d.doc_id = hs.doc_id""".stripMargin,
    // llm_quality_cut oracle: same score formula as llm_text_stats, same
    // floor(q*1e6) quantize, threshold off the descending cumulative
    // histogram with integer-exact k = ceil(n*pct/100)
    "llm_quality_cut" ->
      """WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents),
        |s AS (SELECT doc_id, CAST(floor((
        |    (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |          WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |     CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |               BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |     CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |    ) / 3.0) * 1000000.0) AS BIGINT) AS score_micro FROM w),
        |h AS (SELECT score_micro, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY score_micro),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |cum AS (SELECT score_micro, sum(c) OVER (ORDER BY score_micro DESC ROWS UNBOUNDED PRECEDING) AS cum FROM h),
        |t AS (SELECT max(score_micro) AS threshold FROM cum CROSS JOIN n WHERE cum >= (n * 20 + 99) // 100)
        |SELECT doc_id, score_micro, threshold, score_micro >= threshold AS keep
        |FROM s CROSS JOIN t""".stripMargin,
    "llm_langid" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |h AS (SELECT doc_id,
        |  CAST(len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is','it','for','on'], w))) AS BIGINT) AS en_hits,
        |  CAST(len(list_filter(ws, w -> list_contains(['le','la','et','les','des','un','une','du','est','dans'], w))) AS BIGINT) AS fr_hits,
        |  CAST(len(list_filter(ws, w -> list_contains(['der','die','und','das','ist','nicht','ein','mit','den','von'], w))) AS BIGINT) AS de_hits
        |FROM w)
        |SELECT doc_id, en_hits, fr_hits, de_hits,
        |  CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
        |       WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
        |       WHEN de_hits > 0 THEN 'de' ELSE 'unknown' END AS pred_lang
        |FROM h""".stripMargin,
    // llm_script_detect oracle: same \x{...} block ranges (RE2 and Java
    // regex read them identically), exact integer counts, fixed-precedence
    // dominant verdict
    "llm_script_detect" ->
      """WITH s AS (SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN 'привет мир это документ на русском языке'
        |       WHEN doc_id % 13 = 0 THEN '你好世界这是一份中文文档测试'
        |       WHEN doc_id % 17 = 0 THEN 'مرحبا بالعالم هذا نص عربي'
        |       ELSE text || CASE WHEN doc_id % 5 = 0 THEN ' αβγδε' ELSE '' END END AS t2
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2, '[A-Za-z\x{00C0}-\x{024F}]', 0)) AS BIGINT) AS n_latin,
        |  CAST(len(regexp_extract_all(t2, '[\x{0400}-\x{04FF}]', 0)) AS BIGINT) AS n_cyrillic,
        |  CAST(len(regexp_extract_all(t2, '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]', 0)) AS BIGINT) AS n_cjk,
        |  CAST(len(regexp_extract_all(t2, '[\x{0600}-\x{06FF}]', 0)) AS BIGINT) AS n_arabic,
        |  CAST(len(regexp_extract_all(t2, '[\x{0370}-\x{03FF}]', 0)) AS BIGINT) AS n_greek
        |FROM s),
        |m AS (SELECT *, greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_greek) AS mx FROM c)
        |SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_arabic, n_greek,
        |  CASE WHEN n_latin = mx AND mx > 0 THEN 'latin'
        |       WHEN n_cyrillic = mx AND mx > 0 THEN 'cyrillic'
        |       WHEN n_cjk = mx AND mx > 0 THEN 'cjk'
        |       WHEN n_arabic = mx AND mx > 0 THEN 'arabic'
        |       WHEN n_greek = mx AND mx > 0 THEN 'greek'
        |       ELSE 'none' END AS script
        |FROM m""".stripMargin,
    "llm_ann_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |q AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, vq AS nv, norm2 AS nn FROM en),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_sq_encode oracle: per-dimension min/max over the quantized
    // grid, then floor-division codes for the %25 sample. DuckDB
    // subscripts are 1-based → pos - 1 matches Spark's posexplode;
    // numerator is non-negative so `//` (truncation) IS floor.
    "llm_sq_encode" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos)
        |SELECT u.vec_id, CAST(u.pos - 1 AS BIGINT) AS pos, b.mn, b.mx,
        |  CASE WHEN b.mx = b.mn THEN CAST(0 AS BIGINT)
        |       ELSE CAST(((u.v - b.mn) * 255) // (b.mx - b.mn) AS BIGINT) END AS code
        |FROM u JOIN b USING (pos) WHERE u.vec_id % 25 = 0""".stripMargin,
    // llm_sq_search oracle: the same train+encode chain, 255-scaled exact
    // integer reconstruction (rv = mn*255 + code*(mx-mn); the 255 cancels
    // in cosine), then the brute ranking law over (query, reconstruction)
    "llm_sq_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos),
        |enc AS (SELECT u.vec_id, list(CASE WHEN b.mx = b.mn THEN b.mn * 255
        |      ELSE b.mn * 255 + (((u.v - b.mn) * 255) // (b.mx - b.mn)) * (b.mx - b.mn) END ORDER BY u.pos) AS rv
        |  FROM u JOIN b USING (pos) GROUP BY u.vec_id),
        |rn AS (SELECT vec_id AS nid, rv, CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS rn2 FROM enc),
        |q AS (SELECT vec_id AS qid, vq AS qv, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS qn FROM e WHERE vec_id % 50 = 0),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * rv[i])) AS BIGINT) AS dp, qn, rn2
        |  FROM rn CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_sq_recall oracle: brute truth + the sq_search chain + the hit
    // count / recall summary row
    "llm_sq_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos),
        |enc AS (SELECT u.vec_id, list(CASE WHEN b.mx = b.mn THEN b.mn * 255
        |      ELSE b.mn * 255 + (((u.v - b.mn) * 255) // (b.mx - b.mn)) * (b.mx - b.mn) END ORDER BY u.pos) AS rv
        |  FROM u JOIN b USING (pos) GROUP BY u.vec_id),
        |rn AS (SELECT vec_id AS nid, rv, CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS rn2 FROM enc),
        |sscored AS (SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * rv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) AS cos
        |  FROM rn CROSS JOIN bq WHERE nid <> qid),
        |sq AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM sscored)
        |  WHERE rank <= 3),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN sq USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'sq_adc' AS path, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin,
    // llm_rp_project oracle: the multiply–xorshift sign derivation
    // replayed as a relational CTE chain (one row per flattened (j,k)
    // index), then the projection as an explicit unnest × sign join ×
    // group-by — structurally independent of the Spark side's literal
    // sign vectors, so a mixer transcription error on either side fails
    // the hash compare. DuckDB's 1-based j maps via (j-1).
    "llm_rp_project" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |s0 AS (SELECT generate_series AS idx, (2654435761 * generate_series) % 2147483648 AS h FROM generate_series(0, 1023)),
        |s1 AS (SELECT idx, xor(h, h >> 13) AS h FROM s0),
        |s2 AS (SELECT idx, (h * 1274126177) % 2147483648 AS h FROM s1),
        |sg AS (SELECT idx, xor(h, h >> 16) % 3 - 1 AS s FROM s2),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS j FROM e WHERE vec_id % 25 = 0),
        |ks AS (SELECT generate_series AS k FROM generate_series(0, 15))
        |SELECT u.vec_id, CAST(ks.k AS BIGINT) AS k, CAST(sum(u.v * sg.s) AS BIGINT) AS y
        |FROM u CROSS JOIN ks JOIN sg ON sg.idx = (u.j - 1) * 16 + ks.k
        |GROUP BY u.vec_id, ks.k""".stripMargin,
    // llm_bin_sketch oracle: the sign pack replayed per 32-bit word —
    // shifts stay below bit 32 (an engine-checked 1<<63 overflows BIGINT)
    "llm_bin_sketch" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings)
        |SELECT vec_id,
        |  ${binPackColsSql}
        |FROM e WHERE vec_id % 25 = 0""".stripMargin,
    // llm_hamming_topk oracle: popcount of the XORed words, (ham ASC,
    // nid ASC) tie law
    "llm_hamming_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |b AS (SELECT vec_id,
        |  ${binPackColsSql}
        |  FROM e),
        |q AS (SELECT vec_id AS qid, blo AS qlo, bhi AS qhi FROM b WHERE vec_id % 50 = 0),
        |s AS (SELECT qid, b.vec_id AS nid,
        |    CAST(bit_count(xor(b.blo, qlo)) + bit_count(xor(b.bhi, qhi)) AS BIGINT) AS ham
        |  FROM b CROSS JOIN q WHERE b.vec_id <> qid),
        |r AS (SELECT qid, nid, ham,
        |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid ASC) AS rank FROM s)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, ham FROM r WHERE rank <= 3""".stripMargin,
    // llm_hamming_recall oracle: exact cosine truth (the brute chain) vs
    // the Hamming top-3, counted by semi-join — what 1 bit/dim costs
    "llm_hamming_recall" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |b AS (SELECT vec_id,
        |  ${binPackColsSql}
        |  FROM e),
        |hq AS (SELECT vec_id AS qid, blo AS qlo, bhi AS qhi FROM b WHERE vec_id % 50 = 0),
        |hs AS (SELECT qid, b.vec_id AS nid,
        |    bit_count(xor(b.blo, qlo)) + bit_count(xor(b.bhi, qhi)) AS ham
        |  FROM b CROSS JOIN hq WHERE b.vec_id <> qid),
        |hm AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid ASC) AS rank FROM hs)
        |  WHERE rank <= 3),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN hm USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'hamming64' AS path, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin,
    // llm_hamming_rerank oracle: sketch → Hamming shortlist-16 → exact
    // cosine re-rank to top-3, each stage replayed relationally
    "llm_hamming_rerank" ->
      (hammingShortlistSql + """
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos
        |FROM rr WHERE rank <= 3""".stripMargin),
    // llm_hamming_rerank_recall oracle: the same two-stage chain scored
    // against exact cosine truth
    "llm_hamming_rerank_recall" ->
      (hammingShortlistSql + """,
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM exsc)
        |  WHERE rank <= 3),
        |rr3 AS (SELECT qid, nid FROM rr WHERE rank <= 3),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN rr3 USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'hamming64_rerank16' AS path, CAST(n_hits AS BIGINT) AS n_hits,
        |  CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin),
    // llm_hamming_curve oracle: one Hamming rank pass, three shortlist
    // cuts, each re-ranked by exact cosine and scored against the same
    // exact truth — the relational replay of the shortlist sweep
    "llm_hamming_curve" -> hammingCurveSql,
    // llm_hamming_wide oracle: the 96-dim wrap, three packed words, and
    // the same (ham ASC, nid ASC) law — the word-array tier replayed
    "llm_hamming_wide" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS v0 FROM embeddings),
        |wv AS (SELECT vec_id, v0 || v0[1:32] AS vq FROM e),
        |b AS (SELECT vec_id,
        |  CAST(list_sum(list_transform(range(0, 32), j ->
        |    CASE WHEN vq[j + 1] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS w0,
        |  CAST(list_sum(list_transform(range(0, 32), j ->
        |    CASE WHEN vq[j + 33] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS w1,
        |  CAST(list_sum(list_transform(range(0, 32), j ->
        |    CASE WHEN vq[j + 65] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS w2
        |  FROM wv),
        |q AS (SELECT vec_id AS qid, w0 AS q0, w1 AS q1, w2 AS q2 FROM b WHERE vec_id % 50 = 0),
        |s AS (SELECT qid, b.vec_id AS nid,
        |    CAST(bit_count(xor(b.w0, q0)) + bit_count(xor(b.w1, q1)) + bit_count(xor(b.w2, q2)) AS BIGINT) AS ham
        |  FROM b CROSS JOIN q WHERE b.vec_id <> qid),
        |r AS (SELECT qid, nid, ham,
        |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid ASC) AS rank FROM s)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, ham FROM r WHERE rank <= 3""".stripMargin,
    // llm_rp_topk oracle: both sides projected with the same mixer-CTE
    // signs, then the brute ranking law over the 16-dim integer dots
    "llm_rp_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |s0 AS (SELECT generate_series AS idx, (2654435761 * generate_series) % 2147483648 AS h FROM generate_series(0, 1023)),
        |s1 AS (SELECT idx, xor(h, h >> 13) AS h FROM s0),
        |s2 AS (SELECT idx, (h * 1274126177) % 2147483648 AS h FROM s1),
        |sg AS (SELECT idx, xor(h, h >> 16) % 3 - 1 AS s FROM s2),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS j FROM e),
        |ks AS (SELECT generate_series AS k FROM generate_series(0, 15)),
        |py AS (SELECT u.vec_id, ks.k, CAST(sum(u.v * sg.s) AS BIGINT) AS y
        |  FROM u CROSS JOIN ks JOIN sg ON sg.idx = (u.j - 1) * 16 + ks.k
        |  GROUP BY u.vec_id, ks.k),
        |p AS (SELECT vec_id, list(y ORDER BY k) AS rp FROM py GROUP BY vec_id),
        |pn AS (SELECT vec_id, rp, CAST(list_sum(list_transform(rp, x -> x * x)) AS BIGINT) AS rpn2 FROM p),
        |q AS (SELECT vec_id AS qid, rp AS qv, rpn2 AS qn FROM pn WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, rp AS nv, rpn2 AS nn FROM pn),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp, qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_rp_recall oracle: brute truth in the ORIGINAL space + the
    // projected ranking at dOut = 16 and 32 + one summary row per dOut
    "llm_rp_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |s0a AS (SELECT generate_series AS idx, (2654435761 * generate_series) % 2147483648 AS h FROM generate_series(0, 1023)),
        |s1a AS (SELECT idx, xor(h, h >> 13) AS h FROM s0a),
        |s2a AS (SELECT idx, (h * 1274126177) % 2147483648 AS h FROM s1a),
        |sg16 AS (SELECT idx, xor(h, h >> 16) % 3 - 1 AS s FROM s2a),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS j FROM e),
        |k16 AS (SELECT generate_series AS k FROM generate_series(0, 15)),
        |py16 AS (SELECT u.vec_id, k16.k, CAST(sum(u.v * sg16.s) AS BIGINT) AS y
        |  FROM u CROSS JOIN k16 JOIN sg16 ON sg16.idx = (u.j - 1) * 16 + k16.k
        |  GROUP BY u.vec_id, k16.k),
        |p16 AS (SELECT vec_id, list(y ORDER BY k) AS rp FROM py16 GROUP BY vec_id),
        |pn16 AS (SELECT vec_id, rp, CAST(list_sum(list_transform(rp, x -> x * x)) AS BIGINT) AS rpn2 FROM p16),
        |q16 AS (SELECT vec_id AS qid, rp AS qv, rpn2 AS qn FROM pn16 WHERE vec_id % 50 = 0),
        |s16 AS (SELECT qid, pn16.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * pn16.rp[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(pn16.rpn2 AS DOUBLE))) AS cos
        |  FROM pn16 CROSS JOIN q16 WHERE pn16.vec_id <> qid),
        |r16 AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM s16)
        |  WHERE rank <= 3),
        |s0b AS (SELECT generate_series AS idx, (2654435761 * generate_series) % 2147483648 AS h FROM generate_series(0, 2047)),
        |s1b AS (SELECT idx, xor(h, h >> 13) AS h FROM s0b),
        |s2b AS (SELECT idx, (h * 1274126177) % 2147483648 AS h FROM s1b),
        |sg32 AS (SELECT idx, xor(h, h >> 16) % 3 - 1 AS s FROM s2b),
        |k32 AS (SELECT generate_series AS k FROM generate_series(0, 31)),
        |py32 AS (SELECT u.vec_id, k32.k, CAST(sum(u.v * sg32.s) AS BIGINT) AS y
        |  FROM u CROSS JOIN k32 JOIN sg32 ON sg32.idx = (u.j - 1) * 32 + k32.k
        |  GROUP BY u.vec_id, k32.k),
        |p32 AS (SELECT vec_id, list(y ORDER BY k) AS rp FROM py32 GROUP BY vec_id),
        |pn32 AS (SELECT vec_id, rp, CAST(list_sum(list_transform(rp, x -> x * x)) AS BIGINT) AS rpn2 FROM p32),
        |q32 AS (SELECT vec_id AS qid, rp AS qv, rpn2 AS qn FROM pn32 WHERE vec_id % 50 = 0),
        |s32 AS (SELECT qid, pn32.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * pn32.rp[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(pn32.rpn2 AS DOUBLE))) AS cos
        |  FROM pn32 CROSS JOIN q32 WHERE pn32.vec_id <> qid),
        |r32 AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM s32)
        |  WHERE rank <= 3),
        |h16 AS (SELECT count(*) AS n_hits FROM truth JOIN r16 USING (qid, nid)),
        |h32 AS (SELECT count(*) AS n_hits FROM truth JOIN r32 USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'rp16' AS path, CAST(h16.n_hits AS BIGINT) AS n_hits, CAST(tot.n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN tot.n_truth = 0 THEN 0.0 ELSE CAST(h16.n_hits AS DOUBLE) / tot.n_truth END AS recall
        |FROM h16 CROSS JOIN tot
        |UNION ALL
        |SELECT 'rp32' AS path, CAST(h32.n_hits AS BIGINT) AS n_hits, CAST(tot.n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN tot.n_truth = 0 THEN 0.0 ELSE CAST(h32.n_hits AS DOUBLE) / tot.n_truth END AS recall
        |FROM h32 CROSS JOIN tot""".stripMargin,
    // llm_gram_matrix oracle: the Gram/covariance replayed RELATIONALLY —
    // an unnest self-join within vec_id grouped on (j, k), structurally
    // independent of the Spark side's single-buffer aggregator, plus the
    // exact-integer centering ncov = N·G − S_j·S_k
    "llm_gram_matrix" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |g AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |s AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM e)
        |SELECT CAST(g.j AS BIGINT) AS j, CAST(g.k AS BIGINT) AS k,
        |  CAST(g.g AS BIGINT) AS g,
        |  CAST(n.n * g.g - sj.s * sk.s AS BIGINT) AS ncov
        |FROM g JOIN s sj ON sj.j = g.j JOIN s sk ON sk.j = g.k CROSS JOIN n""".stripMargin,
    // llm_gram_shifted oracle: integer means with the sign-wrapped
    // truncating division (DuckDB `//` floors, the CASE form truncates
    // toward zero like Scala Long `/`), then the Gram of the SHIFTED
    // values and the centering over the residual sums — ncov must equal
    // llm_gram_matrix's ncov exactly (shift invariance), while g pins the
    // actual two-pass computation, not just the final covariance
    "llm_gram_shifted" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |n AS (SELECT count(*) AS n FROM e),
        |s0 AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |m AS (SELECT j, CASE WHEN s < 0 THEN -((-s) // n.n) ELSE s // n.n END AS m
        |      FROM s0 CROSS JOIN n),
        |w AS (SELECT u.vec_id, u.pos, u.v - m.m AS v
        |      FROM u JOIN m ON m.j = u.pos - 1),
        |g AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM w a JOIN w b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |sr AS (SELECT pos - 1 AS j, sum(v) AS s FROM w GROUP BY 1)
        |SELECT CAST(g.j AS BIGINT) AS j, CAST(g.k AS BIGINT) AS k,
        |  CAST(g.g AS BIGINT) AS g,
        |  CAST(n.n * g.g - sj.s * sk.s AS BIGINT) AS ncov
        |FROM g JOIN sr sj ON sj.j = g.j JOIN sr sk ON sk.j = g.k CROSS JOIN n""".stripMargin,
    // llm_gram_incremental oracle: IDENTICAL to llm_gram_matrix by
    // design — the Spark side merges two disjoint-half fits, the oracle
    // computes the whole corpus directly; equal hashes ARE the
    // base+delta ≡ full-refit merge law
    "llm_gram_incremental" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |g AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |s AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM e)
        |SELECT CAST(g.j AS BIGINT) AS j, CAST(g.k AS BIGINT) AS k,
        |  CAST(g.g AS BIGINT) AS g,
        |  CAST(n.n * g.g - sj.s * sk.s AS BIGINT) AS ncov
        |FROM g JOIN s sj ON sj.j = g.j JOIN s sk ON sk.j = g.k CROSS JOIN n""".stripMargin,
    // llm_pca_power oracle: the full 12-sweep integer power iteration
    // unrolled as CTEs — sign-wrapped `//` everywhere a numerator can be
    // negative (DuckDB `//` floors, Spark div truncates; the sign-abs form
    // makes both truncate), covariance mirrored from the upper triangle,
    // |c| rescaled to ≤ 1e6 once and |w| to ≤ 1e5 per sweep
    "llm_pca_power" ->
      (pcaPowerSqlPrefix + """
        |SELECT CAST(pos AS BIGINT) AS pos, CAST(w AS BIGINT) AS w FROM w12""".stripMargin),
    // llm_pca_shifted_power oracle: the same 12-sweep chain over the
    // SHIFTED Gram (means → shifted grid → Gram, no N²-scale centering)
    "llm_pca_shifted_power" ->
      (pcaShiftedPowerSqlPrefix + """
        |SELECT CAST(pos AS BIGINT) AS pos, CAST(w AS BIGINT) AS w FROM w12""".stripMargin),
    // llm_pca_project oracle: the same derived w8 joined back against the
    // unnested %5 sample — one integer dot per vector
    "llm_pca_project" ->
      (pcaPowerSqlPrefix + """
        |SELECT u.vec_id, CAST(sum(u.v * w12.w) AS BIGINT) AS y
        |FROM u JOIN w12 ON w12.pos = u.pos - 1
        |WHERE u.vec_id % 5 = 0 GROUP BY 1""".stripMargin),
    // llm_mmr_rerank oracle: brute top-8 candidates, m²-per-query pairwise
    // sims, then the k = 3 greedy unrolled as three pick CTEs with the
    // (score DESC, nid ASC) tie law at every step
    "llm_mmr_rerank" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS MATERIALIZED (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS n2 FROM e),
        |q AS (SELECT vec_id AS qid, vq AS qv, n2 AS qn FROM en WHERE vec_id % 50 = 0),
        |scored AS (SELECT qid, en.vec_id AS nid, en.vq AS nv, en.n2 AS nn,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.n2 AS DOUBLE))) AS rel
        |  FROM en CROSS JOIN q WHERE en.vec_id <> qid),
        |cand AS MATERIALIZED (SELECT qid, nid, nv, nn, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rnk FROM scored)
        |  WHERE rnk <= 8),
        |sims AS MATERIALIZED (SELECT a.qid, a.nid AS a, b.nid AS b,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(a.nv)), i -> a.nv[i] * b.nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE))) AS sim
        |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid <> b.nid),
        |p1 AS MATERIALIZED (SELECT qid, nid, rel AS score FROM (
        |    SELECT qid, nid, rel, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rnk FROM cand)
        |  WHERE rnk = 1),
        |c2 AS (SELECT c.qid, c.nid, c.rel - s.sim AS score
        |  FROM cand c JOIN p1 ON p1.qid = c.qid AND c.nid <> p1.nid
        |  JOIN sims s ON s.qid = c.qid AND s.a = c.nid AND s.b = p1.nid),
        |p2 AS MATERIALIZED (SELECT qid, nid, score FROM (
        |    SELECT qid, nid, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rnk FROM c2)
        |  WHERE rnk = 1),
        |c3 AS (SELECT c.qid, c.nid, c.rel - greatest(s1.sim, s2.sim) AS score
        |  FROM cand c
        |  JOIN p1 ON p1.qid = c.qid JOIN p2 ON p2.qid = c.qid
        |  JOIN sims s1 ON s1.qid = c.qid AND s1.a = c.nid AND s1.b = p1.nid
        |  JOIN sims s2 ON s2.qid = c.qid AND s2.a = c.nid AND s2.b = p2.nid
        |  WHERE c.nid <> p1.nid AND c.nid <> p2.nid),
        |p3 AS (SELECT qid, nid, score FROM (
        |    SELECT qid, nid, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rnk FROM c3)
        |  WHERE rnk = 1)
        |SELECT qid, CAST(1 AS BIGINT) AS mmr_rank, nid, score FROM p1
        |UNION ALL SELECT qid, CAST(2 AS BIGINT), nid, score FROM p2
        |UNION ALL SELECT qid, CAST(3 AS BIGINT), nid, score FROM p3""".stripMargin,
    // llm_score_calibrate oracle: the same min-rank / pooled-position law
    // via window functions — rank() IS min-rank under ties, and the
    // pooled value at position p is position-unique regardless of the
    // row_number tiebreak (equal scores share the value)
    "llm_score_calibrate" ->
      """WITH w AS (SELECT doc_id, source, text, string_split(lower(text), ' ') AS ws FROM documents),
        |sc AS (SELECT doc_id, source, CAST(floor((
        |   CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |        WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |   CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |             BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |   CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |  ) / 3.0 * 1000000) AS BIGINT) AS score_micro FROM w),
        |r AS (SELECT *, CAST(rank() OVER (PARTITION BY source ORDER BY score_micro) AS BIGINT) AS src_rank,
        |       CAST(count(*) OVER (PARTITION BY source, score_micro) AS BIGINT) AS ce,
        |       count(*) OVER (PARTITION BY source) AS n_s, count(*) OVER () AS n FROM sc),
        |m AS (SELECT *, CAST(((2 * (src_rank - 1) + ce - 1) * n) // (2 * n_s) + 1 AS BIGINT) AS mapped_rank FROM r),
        |pooled AS (SELECT score_micro AS calib_micro, row_number() OVER (ORDER BY score_micro, doc_id) AS pos FROM sc)
        |SELECT doc_id, source, score_micro, src_rank, mapped_rank, calib_micro
        |FROM m JOIN pooled ON pooled.pos = m.mapped_rank WHERE doc_id % 20 = 0""".stripMargin,
    // llm_calibrate_ks oracle: the midrank calibrate chain + per-source
    // and pooled window cums + the cross-multiplied max gap
    "llm_calibrate_ks" ->
      """WITH w AS (SELECT doc_id, source, text, string_split(lower(text), ' ') AS ws FROM documents),
        |sc AS (SELECT doc_id, source, CAST(floor(((CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |        WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |   CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |             BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |   CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |  ) / 3.0) * 1000000) AS BIGINT) AS score_micro FROM w),
        |r AS (SELECT *, CAST(rank() OVER (PARTITION BY source ORDER BY score_micro) AS BIGINT) - 1 AS cs,
        |       CAST(count(*) OVER (PARTITION BY source, score_micro) AS BIGINT) AS ce,
        |       count(*) OVER (PARTITION BY source) AS n_s0, count(*) OVER () AS n0 FROM sc),
        |m AS (SELECT *, CAST(((2 * cs + ce - 1) * n0) // (2 * n_s0) + 1 AS BIGINT) AS mapped_rank FROM r),
        |pooled AS (SELECT score_micro AS calib_micro, row_number() OVER (ORDER BY score_micro, doc_id) AS pos FROM sc),
        |cal AS (SELECT m.source, pooled.calib_micro AS v FROM m JOIN pooled ON pooled.pos = m.mapped_rank),
        |h AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY 1, 2),
        |cums AS (SELECT source, v, CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum FROM h),
        |g AS (SELECT v, CAST(sum(c) AS BIGINT) AS gc FROM h GROUP BY 1),
        |gcum AS (SELECT v, CAST(sum(gc) OVER (ORDER BY v) AS BIGINT) AS gcum FROM g),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM h GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |ks AS (SELECT cums.source, ns.n_s, n.n,
        |    CAST(max(abs(cum * n.n - gcum.gcum * ns.n_s)) AS BIGINT) AS ks_scaled
        |  FROM cums JOIN gcum ON gcum.v = cums.v JOIN ns ON ns.source = cums.source CROSS JOIN n
        |  GROUP BY 1, 2, 3)
        |SELECT source, n_s, ks_scaled, CAST(ks_scaled * 1000000 // (n_s * n) AS BIGINT) AS ks_micro
        |FROM ks""".stripMargin,
    // llm_cluster_split oracle: the llm_dedup_clusters recursive-CC chain,
    // then the cluster-root hash split (%100 < 80) and the cross-split
    // near-dup pair audit (0 by construction — clusters move whole)
    "llm_cluster_split" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |asg AS (SELECT doc_id, cluster_id,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80
        |       THEN 'train' ELSE 'test' END AS split
        |  FROM comp),
        |cross_pairs AS (SELECT CAST(count(*) AS BIGINT) AS n_cross FROM pairs
        |  JOIN asg a ON a.doc_id = pairs.id_a JOIN asg b ON b.doc_id = pairs.id_b
        |  WHERE a.split <> b.split)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
        |  (SELECT n_cross FROM cross_pairs) AS n_cross_pairs
        |FROM asg GROUP BY 1""".stripMargin,
    // llm_best_of_cluster oracle: the recursive-CC chain + the quality
    // score + the per-cluster (score DESC, id ASC) election at rank 1,
    // multi-member clusters only
    "llm_best_of_cluster" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sc0 AS (SELECT w.doc_id, CAST(floor((
        |   CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |        WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |   CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |             BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |   CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |  ) / 3.0 * 1000000) AS BIGINT) AS score_micro
        |  FROM w JOIN documents d ON d.doc_id = w.doc_id),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |sized AS (SELECT doc_id, cluster_id,
        |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM comp),
        |ranked AS (SELECT s.cluster_id, s.cluster_size, s.doc_id, sc0.score_micro,
        |    row_number() OVER (PARTITION BY s.cluster_id
        |      ORDER BY sc0.score_micro DESC, s.doc_id ASC) AS rnk
        |  FROM sized s JOIN sc0 ON sc0.doc_id = s.doc_id
        |  WHERE s.cluster_size >= 2)
        |SELECT cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
        |  doc_id AS rep_id, score_micro AS rep_score,
        |  CAST(cluster_size - 1 AS BIGINT) AS n_dropped
        |FROM ranked WHERE rnk = 1""".stripMargin,
    // llm_label_centroids oracle: per-label integer sum-vectors via
    // unnest + (label, pos) group, pair cosine over exact integer dots —
    // sums, not means: cosine is scale-invariant, zero division
    "llm_label_centroids" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT label, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |s AS (SELECT label, pos, CAST(sum(v) AS BIGINT) AS s FROM u GROUP BY 1, 2),
        |c AS (SELECT label, list(s ORDER BY pos) AS sv FROM s GROUP BY 1),
        |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |cn AS (SELECT c.label, sv, n,
        |    CAST(list_sum(list_transform(sv, x -> x * x)) AS BIGINT) AS sn
        |  FROM c JOIN n ON n.label = c.label)
        |SELECT CAST(a.label AS BIGINT) AS label_a, CAST(b.label AS BIGINT) AS label_b,
        |  a.n AS n_a, b.n AS n_b,
        |  CAST(CAST(list_sum(list_transform(generate_series(1, len(a.sv)), i -> a.sv[i] * b.sv[i])) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(a.sn AS DOUBLE)) * sqrt(CAST(b.sn AS DOUBLE))) AS cos
        |FROM cn a JOIN cn b ON a.label < b.label""".stripMargin,
    // llm_image_phash oracle: the aHash replayed from the synthetic
    // pattern formula alone — NN indices, integer mean threshold
    // (64·g ≥ Σ, ties up), two-word packing (no shift past bit 31),
    // xor+popcount hamming; the decoded rasters never leave Spark
    "llm_image_phash" ->
      """WITH imgs AS (
        |  SELECT CAST(i AS BIGINT) AS id, CAST(i AS BIGINT) AS seed, 16 + i*3 AS w, 16 + i*2 AS h FROM generate_series(1, 4) t(i)
        |  UNION ALL SELECT 103, 3, 26, 22),
        |cells AS (SELECT id, cy*8 + cx AS k,
        |    ((cx*w)//8*(7 + seed*5)) % 256 + ((cy*h)//8*(11 + seed*3)) % 256
        |      + (((cx*w)//8 + (cy*h)//8) * (1 + seed)) % 256 AS g
        |  FROM imgs, generate_series(0, 7) gx(cx), generate_series(0, 7) gy(cy)),
        |sums AS (SELECT id, CAST(sum(g) AS BIGINT) AS s FROM cells GROUP BY 1),
        |bits AS (SELECT cells.id, k, CASE WHEN g*64 >= s THEN 1 ELSE 0 END AS bit
        |  FROM cells JOIN sums ON sums.id = cells.id),
        |hashes AS (SELECT id,
        |    CAST(sum(CASE WHEN k >= 32 THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN k < 32 THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY 1)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming,
        |  bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 8 AS near
        |FROM hashes a JOIN hashes b ON a.id < b.id""".stripMargin,
    // llm_image_phash_scale oracle: the same formula-replayed hashes for
    // every document row, brute all-pairs at radius ≤ 3 (= what the
    // lossless block join must equal), folded to the hamming histogram
    "llm_image_phash_scale" ->
      """WITH imgs AS (SELECT doc_id AS id, doc_id % 256 AS seed,
        |    16 + (doc_id // 256) % 5 AS w, 16 + (doc_id // 256) % 3 AS h FROM documents),
        |cells AS (SELECT id, cy*8 + cx AS k,
        |    ((cx*w)//8*(7 + seed*5)) % 256 + ((cy*h)//8*(11 + seed*3)) % 256
        |      + (((cx*w)//8 + (cy*h)//8) * (1 + seed)) % 256 AS g
        |  FROM imgs, generate_series(0, 7) gx(cx), generate_series(0, 7) gy(cy)),
        |sums AS (SELECT id, CAST(sum(g) AS BIGINT) AS s FROM cells GROUP BY 1),
        |bits AS (SELECT cells.id, k, CASE WHEN g*64 >= s THEN 1 ELSE 0 END AS bit
        |  FROM cells JOIN sums ON sums.id = cells.id),
        |hashes AS (SELECT id,
        |    CAST(sum(CASE WHEN k >= 32 THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN k < 32 THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY 1),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
        |    bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
        |  FROM hashes a JOIN hashes b ON a.id < b.id)
        |SELECT CAST(hamming AS BIGINT) AS hamming, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(id_a + id_b) AS BIGINT) AS id_checksum
        |FROM pairs WHERE hamming <= 3 GROUP BY 1""".stripMargin,
    // llm_token_fertility oracle: the same two token censuses grouped by
    // declared lang, ratios as exact integer micros
    "llm_token_fertility" ->
      """WITH w AS (SELECT lang, n_chars,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bp
        |FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_ws) AS BIGINT) AS sum_ws_tokens,
        |  CAST(sum(n_bp) AS BIGINT) AS sum_bpeish_tokens,
        |  CAST(sum(n_chars) * 1000000 // sum(n_ws) AS BIGINT) AS chars_per_ws_micro,
        |  CAST(sum(n_chars) * 1000000 // sum(n_bp) AS BIGINT) AS chars_per_bpeish_micro
        |FROM w GROUP BY 1""".stripMargin,
    // llm_lang_confusion oracle: the langid stopword census + declared
    // lang, grouped to the confusion matrix with basis-point shares
    "llm_lang_confusion" ->
      """WITH w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
        |h AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is','it','for','on'], w))) AS BIGINT) AS en_hits,
        |  CAST(len(list_filter(ws, w -> list_contains(['le','la','et','les','des','un','une','du','est','dans'], w))) AS BIGINT) AS fr_hits,
        |  CAST(len(list_filter(ws, w -> list_contains(['der','die','und','das','ist','nicht','ein','mit','den','von'], w))) AS BIGINT) AS de_hits
        |FROM w),
        |p AS (SELECT doc_id, lang,
        |  CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
        |       WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
        |       WHEN de_hits > 0 THEN 'de' ELSE 'unknown' END AS pred_lang
        |FROM h),
        |conf AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS t FROM p GROUP BY 1)
        |SELECT conf.lang, pred_lang, n, CAST(n * 10000 // t AS BIGINT) AS pct_bp
        |FROM conf JOIN tot ON tot.lang = conf.lang""".stripMargin,
    // llm_mmr_ivf oracle: the 2-iteration k-means cell chain feeding
    // cell-pruned top-8 candidates, then the k = 3 greedy unrolled
    // with the (score DESC, nid ASC) tie law per pick
    "llm_mmr_ivf" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |c AS (SELECT en.vec_id AS nid, vq AS nv, norm2 AS nn, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |q0 AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |iscored AS (SELECT qid, nid, nv, nn,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS rel
        |  FROM c JOIN q0 USING (cell) WHERE nid <> qid),
        |cand AS MATERIALIZED (SELECT qid, nid, nv, nn, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rnk FROM iscored)
        |  WHERE rnk <= 8),
        |sims AS MATERIALIZED (SELECT a.qid, a.nid AS a, b.nid AS b,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(a.nv)), i -> a.nv[i] * b.nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE))) AS sim
        |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid <> b.nid),
        |p1 AS MATERIALIZED (SELECT qid, nid, rel AS score FROM (
        |    SELECT qid, nid, rel, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rnk FROM cand)
        |  WHERE rnk = 1),
        |c2 AS (SELECT cnd.qid, cnd.nid, cnd.rel - s.sim AS score
        |  FROM cand cnd JOIN p1 ON p1.qid = cnd.qid AND cnd.nid <> p1.nid
        |  JOIN sims s ON s.qid = cnd.qid AND s.a = cnd.nid AND s.b = p1.nid),
        |p2 AS MATERIALIZED (SELECT qid, nid, score FROM (
        |    SELECT qid, nid, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rnk FROM c2)
        |  WHERE rnk = 1),
        |c3 AS (SELECT cnd.qid, cnd.nid, cnd.rel - greatest(s1.sim, s2.sim) AS score
        |  FROM cand cnd
        |  JOIN p1 ON p1.qid = cnd.qid JOIN p2 ON p2.qid = cnd.qid
        |  JOIN sims s1 ON s1.qid = cnd.qid AND s1.a = cnd.nid AND s1.b = p1.nid
        |  JOIN sims s2 ON s2.qid = cnd.qid AND s2.a = cnd.nid AND s2.b = p2.nid
        |  WHERE cnd.nid <> p1.nid AND cnd.nid <> p2.nid),
        |p3 AS (SELECT qid, nid, score FROM (
        |    SELECT qid, nid, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rnk FROM c3)
        |  WHERE rnk = 1)
        |SELECT qid, CAST(1 AS BIGINT) AS mmr_rank, nid, score FROM p1
        |UNION ALL SELECT qid, CAST(2 AS BIGINT), nid, score FROM p2
        |UNION ALL SELECT qid, CAST(3 AS BIGINT), nid, score FROM p3""".stripMargin,
    // llm_retrieval_eval oracle: the brute ranking law + label joins +
    // all-integer MRR (1e6 // first relevant rank, 0-when-none)
    "llm_retrieval_eval" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, label, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS n2 FROM e),
        |q AS (SELECT vec_id AS qid, vq AS qv, n2 AS qn, label AS qlabel FROM en WHERE vec_id % 50 = 0),
        |scored AS (SELECT qid, qlabel, en.vec_id AS nid, en.label AS nlabel,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.n2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN q WHERE en.vec_id <> qid),
        |ranked AS (SELECT qid, qlabel, nid, nlabel,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM scored)
        |SELECT qid,
        |  CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_3,
        |  CAST(coalesce(min(CASE WHEN nlabel = qlabel THEN rank END), 0) AS BIGINT) AS first_rel_rank,
        |  CAST(coalesce(1000000 // min(CASE WHEN nlabel = qlabel THEN rank END), 0) AS BIGINT) AS rr_micro
        |FROM ranked WHERE rank <= 3 GROUP BY 1""".stripMargin,
    // llm_mad_outliers oracle: the same histogram-median law — lower
    // median = min v with cum >= (n+1)//2, deviation histogram derived
    // from the value histogram, k = 2 fence
    "llm_mad_outliers" ->
      """WITH h AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM h),
        |med AS (SELECT min(v) AS med FROM cum CROSS JOIN n WHERE cum >= (n + 1) // 2),
        |dh AS (SELECT abs(h.v - med.med) AS dv, CAST(sum(c) AS BIGINT) AS c FROM h CROSS JOIN med GROUP BY 1),
        |dcum AS (SELECT dv, CAST(sum(c) OVER (ORDER BY dv) AS BIGINT) AS cum FROM dh),
        |mad AS (SELECT min(dv) AS mad FROM dcum CROSS JOIN n WHERE cum >= (n + 1) // 2),
        |outl AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_outliers FROM dh CROSS JOIN mad WHERE dv > 2 * mad)
        |SELECT n.n AS n_rows, med.med AS median, mad.mad AS mad, outl.n_outliers
        |FROM n CROSS JOIN med CROSS JOIN mad CROSS JOIN outl""".stripMargin,
    // llm_mad_by_source oracle: the keyed histogram-median law — per-key
    // lower medians via partitioned window cumsum, k = 2 fence
    "llm_mad_by_source" ->
      """WITH h AS (SELECT source, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
        |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT source, v, CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum FROM h),
        |med AS (SELECT cum.source, min(v) AS med FROM cum JOIN n ON n.source = cum.source
        |  WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |dh AS (SELECT h.source, abs(h.v - med.med) AS dv, CAST(sum(c) AS BIGINT) AS c
        |  FROM h JOIN med ON med.source = h.source GROUP BY 1, 2),
        |dcum AS (SELECT source, dv, CAST(sum(c) OVER (PARTITION BY source ORDER BY dv) AS BIGINT) AS cum FROM dh),
        |mad AS (SELECT dcum.source, min(dv) AS mad FROM dcum JOIN n ON n.source = dcum.source
        |  WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |outl AS (SELECT dh.source, CAST(sum(c) AS BIGINT) AS n_outliers
        |  FROM dh JOIN mad ON mad.source = dh.source WHERE dv > 2 * mad GROUP BY 1)
        |SELECT n.source, n.n AS n_rows, med.med AS median, mad.mad AS mad,
        |  coalesce(outl.n_outliers, CAST(0 AS BIGINT)) AS n_outliers
        |FROM n JOIN med ON med.source = n.source JOIN mad ON mad.source = n.source
        |LEFT JOIN outl ON outl.source = n.source""".stripMargin,
    // llm_kanon_audit oracle: the four-rung census joined back per record,
    // CASE cascade to the first rung reaching k = 5, histogram
    "llm_kanon_audit" ->
      """WITH d AS (SELECT doc_id, lang, source, n_chars // 100 AS bin100, n_chars // 1000 AS bin1000 FROM documents),
        |l0 AS (SELECT lang, source, bin100, count(*) AS c FROM d GROUP BY 1, 2, 3),
        |l1 AS (SELECT lang, source, bin1000, count(*) AS c FROM d GROUP BY 1, 2, 3),
        |l2 AS (SELECT lang, bin1000, count(*) AS c FROM d GROUP BY 1, 2),
        |l3 AS (SELECT lang, count(*) AS c FROM d GROUP BY 1),
        |lv AS (SELECT d.doc_id,
        |    CASE WHEN l0.c >= 5 THEN 0 WHEN l1.c >= 5 THEN 1 WHEN l2.c >= 5 THEN 2
        |         WHEN l3.c >= 5 THEN 3 ELSE 4 END AS anon_level
        |  FROM d
        |  JOIN l0 ON l0.lang = d.lang AND l0.source = d.source AND l0.bin100 = d.bin100
        |  JOIN l1 ON l1.lang = d.lang AND l1.source = d.source AND l1.bin1000 = d.bin1000
        |  JOIN l2 ON l2.lang = d.lang AND l2.bin1000 = d.bin1000
        |  JOIN l3 ON l3.lang = d.lang)
        |SELECT CAST(anon_level AS BIGINT) AS anon_level, CAST(count(*) AS BIGINT) AS n_docs
        |FROM lv GROUP BY 1""".stripMargin,
    // llm_ann_filtered oracle: identical brute ranking, corpus
    // pre-restricted by the metadata predicate
    "llm_ann_filtered" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |allowed AS (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |q AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, vq AS nv, norm2 AS nn FROM en JOIN allowed ON en.vec_id = allowed.doc_id),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    "llm_ann_lsh" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |eb AS (SELECT vec_id, vq, norm2,
        |  CAST(CASE WHEN vq[1] >= vq[33] THEN 1 ELSE 0 END
        |     + CASE WHEN vq[2] >= vq[34] THEN 2 ELSE 0 END
        |     + CASE WHEN vq[3] >= vq[35] THEN 4 ELSE 0 END
        |     + CASE WHEN vq[4] >= vq[36] THEN 8 ELSE 0 END
        |     + CASE WHEN vq[5] >= vq[37] THEN 16 ELSE 0 END
        |     + CASE WHEN vq[6] >= vq[38] THEN 32 ELSE 0 END AS BIGINT) AS bucket FROM en),
        |q AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn, bucket FROM eb WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, vq AS nv, norm2 AS nn, bucket FROM eb),
        |scored AS (SELECT qid, c.bucket, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c JOIN q USING (bucket) WHERE nid <> qid),
        |ranked AS (SELECT qid, bucket, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, bucket, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // trained-IVF oracle: re-derives the 2-iteration deterministic k-means
    // (seed = vec_id%25, integer floor-mean centroid updates) before the
    // assign/probe/re-rank — training itself is oracle-checked
    "llm_ann_ivf" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |c AS (SELECT en.vec_id AS nid, vq AS nv, norm2 AS nn, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |q AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |scored AS (
        |  SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos
        |  FROM c JOIN q USING (cell) WHERE nid <> qid),
        |ranked AS (
        |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_ivf_sq_search oracle: the full 2-iteration k-means cell
    // chain (identical to llm_ann_ivf) + the SQ8 encode/reconstruct
    // chain (identical to llm_sq_search), composed: probed cells
    // restrict, reconstructions rank
    "llm_ivf_sq_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos),
        |enc AS (SELECT u.vec_id, list(CASE WHEN b.mx = b.mn THEN b.mn * 255
        |      ELSE b.mn * 255 + (((u.v - b.mn) * 255) // (b.mx - b.mn)) * (b.mx - b.mn) END ORDER BY u.pos) AS rv
        |  FROM u JOIN b USING (pos) GROUP BY u.vec_id),
        |rn AS (SELECT vec_id AS nid, rv, CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS rn2 FROM enc),
        |c AS (SELECT rn.nid, rv, rn2, cell FROM rn JOIN cells ON rn.nid = cells.nid),
        |q AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |scored AS (
        |  SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * rv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) AS cos
        |  FROM c JOIN q USING (cell) WHERE nid <> qid),
        |ranked AS (
        |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_ivf_sq_recall oracle: brute truth + the composed
    // ivf_sq chain + the hit-count summary row
    "llm_ivf_sq_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos),
        |enc AS (SELECT u.vec_id, list(CASE WHEN b.mx = b.mn THEN b.mn * 255
        |      ELSE b.mn * 255 + (((u.v - b.mn) * 255) // (b.mx - b.mn)) * (b.mx - b.mn) END ORDER BY u.pos) AS rv
        |  FROM u JOIN b USING (pos) GROUP BY u.vec_id),
        |rn AS (SELECT vec_id AS nid, rv, CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS rn2 FROM enc),
        |c AS (SELECT rn.nid, rv, rn2, cell FROM rn JOIN cells ON rn.nid = cells.nid),
        |q AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |scored AS (
        |  SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * rv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) AS cos
        |  FROM c JOIN q USING (cell) WHERE nid <> qid),
        |ranked AS (
        |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
        |  FROM scored),
        |isq AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM scored)
        |  WHERE rank <= 3),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS bnid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS bcos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, bnid AS nid FROM (SELECT qid, bnid,
        |    row_number() OVER (PARTITION BY qid ORDER BY bcos DESC, bnid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN isq USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'ivf_sq' AS path, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin,
    // recall gate: re-derives brute truth + all three approximate paths
    // and counts hit-set intersections (exact integer work)
    "llm_ann_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |eb AS (SELECT vec_id, vq, norm2,
        |  CAST(CASE WHEN vq[1] >= vq[33] THEN 1 ELSE 0 END
        |     + CASE WHEN vq[2] >= vq[34] THEN 2 ELSE 0 END
        |     + CASE WHEN vq[3] >= vq[35] THEN 4 ELSE 0 END
        |     + CASE WHEN vq[4] >= vq[36] THEN 8 ELSE 0 END
        |     + CASE WHEN vq[5] >= vq[37] THEN 16 ELSE 0 END
        |     + CASE WHEN vq[6] >= vq[38] THEN 32 ELSE 0 END AS BIGINT) AS bucket FROM en),
        |lq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn, bucket FROM eb WHERE vec_id % 50 = 0),
        |lscored AS (SELECT qid, eb.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * eb.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(eb.norm2 AS DOUBLE))) AS cos
        |  FROM eb JOIN lq USING (bucket) WHERE eb.vec_id <> qid),
        |lsh AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM lscored)
        |  WHERE rank <= 3),
        |mpq AS (SELECT qid, qv, qn,
        |    unnest(list_concat([bucket], list_transform(generate_series(0, 5), m -> xor(bucket, CAST(1 AS BIGINT) << m)))) AS bucket
        |  FROM lq),
        |mscored AS (SELECT qid, eb.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * eb.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(eb.norm2 AS DOUBLE))) AS cos
        |  FROM eb JOIN mpq USING (bucket) WHERE eb.vec_id <> qid),
        |mp AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM mscored)
        |  WHERE rank <= 3),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |ic AS (SELECT en.vec_id AS nid, vq AS nv, norm2 AS nn, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |iq AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |iscored AS (SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos
        |  FROM ic JOIN iq USING (cell) WHERE nid <> qid),
        |ivf AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM iscored)
        |  WHERE rank <= 3),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
        |SELECT 'lsh' AS path,
        |  CAST((SELECT count(*) FROM truth SEMI JOIN lsh USING (qid, nid)) AS BIGINT) AS n_hits,
        |  n_truth,
        |  CAST((SELECT count(*) FROM truth SEMI JOIN lsh USING (qid, nid)) AS DOUBLE) / n_truth AS recall
        |FROM nt
        |UNION ALL
        |SELECT 'lsh_multiprobe',
        |  CAST((SELECT count(*) FROM truth SEMI JOIN mp USING (qid, nid)) AS BIGINT),
        |  n_truth,
        |  CAST((SELECT count(*) FROM truth SEMI JOIN mp USING (qid, nid)) AS DOUBLE) / n_truth
        |FROM nt
        |UNION ALL
        |SELECT 'ivf',
        |  CAST((SELECT count(*) FROM truth SEMI JOIN ivf USING (qid, nid)) AS BIGINT),
        |  n_truth,
        |  CAST((SELECT count(*) FROM truth SEMI JOIN ivf USING (qid, nid)) AS DOUBLE) / n_truth
        |FROM nt""".stripMargin,
    // llm_ivf_probe_curve oracle: one training replay, probe sets per
    // nProbe from the same ranked assignment, per-p hit counting
    "llm_ivf_probe_curve" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |ic AS (SELECT en.vec_id AS nid, vq AS nv, norm2 AS nn, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |plist AS (SELECT unnest([1, 2, 4]) AS p),
        |probesp AS (SELECT p, vec_id AS qid, cid AS cell FROM ranked_assign CROSS JOIN plist
        |  WHERE rn <= p AND vec_id % 50 = 0),
        |iqp AS (SELECT p, en.vec_id AS qid, vq AS qv, norm2 AS qn, probesp.cell
        |  FROM en JOIN probesp ON en.vec_id = probesp.qid),
        |iscoredp AS (SELECT p, qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos
        |  FROM ic JOIN iqp USING (cell) WHERE nid <> qid),
        |ivfp AS (SELECT p, qid, nid FROM (SELECT p, qid, nid,
        |    row_number() OVER (PARTITION BY p, qid ORDER BY cos DESC, nid ASC) AS rank FROM iscoredp)
        |  WHERE rank <= 3),
        |hits AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM truth JOIN ivfp USING (qid, nid) GROUP BY p),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS c FROM truth)
        |SELECT 'ivf_p' || CAST(plist.p AS VARCHAR) AS path,
        |  coalesce(hits.c, 0) AS n_hits, tt.c AS n_truth,
        |  CAST(coalesce(hits.c, 0) AS DOUBLE) / tt.c AS recall
        |FROM plist LEFT JOIN hits ON plist.p = hits.p CROSS JOIN tt""".stripMargin,
    "llm_embed_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |b AS (SELECT en.vec_id AS id, label, vq, norm2 FROM en JOIN embeddings USING (vec_id))
        |SELECT a.id AS id_a, c.id AS id_b, CAST(a.label AS INT) AS block,
        |  CAST(CAST(list_sum(list_transform(generate_series(1, len(a.vq)), i -> a.vq[i] * c.vq[i])) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE))) AS cos
        |FROM b a JOIN b c ON a.label = c.label AND a.id < c.id
        |WHERE CAST(CAST(list_sum(list_transform(generate_series(1, len(a.vq)), i -> a.vq[i] * c.vq[i])) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE))) >= 0.45""".stripMargin,
    // llm_image_decode: the oracle re-derives each PNG's pixel sum
    // ARITHMETICALLY from the generator formula — the Spark side must
    // round-trip the actual encoded bytes through a real decoder to match
    "llm_image_decode" ->
      """WITH imgs AS (
        |  SELECT i AS id, 16 + i*3 AS w, 16 + i*2 AS h
        |  FROM generate_series(1, 4) AS t(i)
        |), px AS (
        |  SELECT id, ((x*7+id)%256) + ((y*11)%256) + ((x+y)%256) AS v
        |  FROM imgs, generate_series(0, 100) gx(x), generate_series(0, 100) gy(y)
        |  WHERE x < w AND y < h
        |)
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded,
        |  CAST(16+id*3 AS INT) AS width, CAST(16+id*2 AS INT) AS height,
        |  CAST(sum(v) AS BIGINT) AS pixel_sum
        |FROM px GROUP BY id
        |UNION ALL SELECT 99, false, -1, -1, -1""".stripMargin,
    // llm_image_resize: out dims + nearest-neighbor source indices are
    // pure integer arithmetic, so the resized pixel sum re-derives from
    // the pattern formula alone — no image library on the oracle side
    "llm_image_resize" ->
      """WITH imgs AS (
        |  SELECT i AS id, 16 + i*3 AS w, 16 + i*2 AS h FROM generate_series(1, 4) AS t(i)
        |), od AS (
        |  SELECT id, w, h,
        |    CASE WHEN greatest(w, h) <= 12 THEN w ELSE greatest(1, w * 12 // greatest(w, h)) END AS ow,
        |    CASE WHEN greatest(w, h) <= 12 THEN h ELSE greatest(1, h * 12 // greatest(w, h)) END AS oh
        |  FROM imgs
        |), px AS (
        |  SELECT id, w, h, ow, oh,
        |    (((x * w) // ow) * 7 + id) % 256 + (((y * h) // oh) * 11) % 256
        |      + ((x * w) // ow + (y * h) // oh) % 256 AS v
        |  FROM od, generate_series(0, 100) gx(x), generate_series(0, 100) gy(y)
        |  WHERE x < ow AND y < oh
        |)
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded,
        |  CAST(w AS INT) AS in_width, CAST(h AS INT) AS in_height,
        |  CAST(ow AS INT) AS out_width, CAST(oh AS INT) AS out_height,
        |  CAST(sum(v) AS BIGINT) AS out_pixel_sum
        |FROM px GROUP BY id, w, h, ow, oh
        |UNION ALL SELECT 99, false, -1, -1, -1, -1, -1""".stripMargin,
    // llm_audio_decode: the oracle re-derives each WAV's sample count and
    // Σ sample² ARITHMETICALLY from the generator formula — the Spark side
    // must round-trip the actual RIFF/WAVE bytes through a real decoder
    "llm_audio_decode" ->
      """WITH cfg AS (
        |  SELECT * FROM (VALUES (1, 601, 1), (2, 702, 1), (3, 803, 1), (4, 800, 2)) AS t(id, n, ch)
        |), px AS (
        |  SELECT id, ch, n, ((i*31 + id*7) % 2003) - 1001 AS v
        |  FROM cfg, generate_series(0, 2000) g(i) WHERE i < n
        |)
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded,
        |  CAST(8000 AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
        |  CAST(n AS BIGINT) AS n_samples, CAST(sum(v*v) AS BIGINT) AS sum_sq
        |FROM px GROUP BY id, ch, n
        |UNION ALL SELECT 99, false, -1, -1, -1, -1""".stripMargin,
    // llm_audio_adpcm oracle: the IMA two-table state machine replayed
    // sample-by-sample as a recursive CTE (step/index tables verbatim
    // from the IMA 1992 recommended practice) over the formula-derived
    // header state and nibble stream — an independent decode, not a
    // pinned constant. The recursion ranges over (id, ch): mono ids 1-3
    // have ch=0 only, stereo ids 11-13 run both channels' formulas
    // independently (per-channel energies sum) — correct word
    // de-interleave is the ONLY way the engine reproduces them.
    "llm_audio_adpcm" ->
      """WITH RECURSIVE
        |cfg AS (
        |  SELECT id, ch, nch, n,
        |    CAST((id*7 + ch*11) % 2003 - 1001 AS INT) AS p0,
        |    CAST((id*5 + ch*7) % 60 AS INT) AS s0
        |  FROM (
        |    SELECT id, 0 AS ch, 1 AS nch, 400 + 37*id AS n
        |    FROM generate_series(1, 3) g(id)
        |    UNION ALL
        |    SELECT id, ch, 2 AS nch, 300 + 41*(id - 10) AS n
        |    FROM generate_series(11, 13) g(id), generate_series(0, 1) c(ch)
        |  ) b),
        |st AS (
        |  SELECT id, ch, 0 AS k, p0 AS pred, s0 AS sidx,
        |    CAST(p0 AS BIGINT)*p0 AS acc FROM cfg
        |  UNION ALL
        |  SELECT id, ch, k + 1,
        |    greatest(-32768, least(32767,
        |      CASE WHEN (nib & 8) > 0 THEN pred - delta ELSE pred + delta END)) AS pred,
        |    greatest(0, least(88, sidx +
        |      [-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8][nib + 1])) AS sidx,
        |    acc + CAST(greatest(-32768, least(32767,
        |      CASE WHEN (nib & 8) > 0 THEN pred - delta ELSE pred + delta END)) AS BIGINT)
        |        * greatest(-32768, least(32767,
        |      CASE WHEN (nib & 8) > 0 THEN pred - delta ELSE pred + delta END)) AS acc
        |  FROM (
        |    SELECT st.id, st.ch, st.k, st.pred, st.sidx, st.acc, cfg.n,
        |      CAST((st.k*13 + st.id*5 + st.ch*3) % 16 AS INT) AS nib,
        |      (st_tab.s >> 3)
        |        + CASE WHEN ((st.k*13 + st.id*5 + st.ch*3) % 16 & 4) > 0 THEN st_tab.s ELSE 0 END
        |        + CASE WHEN ((st.k*13 + st.id*5 + st.ch*3) % 16 & 2) > 0 THEN st_tab.s >> 1 ELSE 0 END
        |        + CASE WHEN ((st.k*13 + st.id*5 + st.ch*3) % 16 & 1) > 0 THEN st_tab.s >> 2 ELSE 0 END AS delta
        |    FROM st JOIN cfg USING (id, ch)
        |    JOIN LATERAL (SELECT [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
        |      41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,
        |      279,307,337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282,
        |      1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,
        |      5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,
        |      18500,20350,22385,24623,27086,29794,32767][st.sidx + 1] AS s) st_tab ON true
        |    WHERE st.k + 1 < cfg.n) q)
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded, CAST(8000 AS INT) AS sample_rate,
        |  CAST(max(nch) AS INT) AS channels, CAST(sum(n) AS BIGINT) AS n_samples,
        |  CAST(sum(acc) AS BIGINT) AS sum_sq
        |FROM st JOIN cfg USING (id, ch) WHERE k = n - 1
        |GROUP BY id
        |UNION ALL SELECT 99, false, -1, -1, -1, -1
        |""".stripMargin,
    // llm_audio_g711 oracle: recomputes the G.711 compand→expand round
    // trip per sample — µ-law (bias 132, exponent/mantissa extraction)
    // and A-law (negative bias -8, seg boundaries 255/511/...) exactly as
    // the ITU tables specify; verified sample-by-sample against the JDK
    // codec before pinning. sum(r²) over the round-tripped samples must
    // equal the engine's transcoded-PCM energy.
    "llm_audio_g711" ->
      """WITH cfg AS (SELECT * FROM (VALUES
        |    (1, 1, 601, 'ulaw'), (2, 2, 702, 'ulaw'), (3, 3, 803, 'ulaw'),
        |    (11, 1, 601, 'alaw'), (12, 2, 702, 'alaw'), (13, 3, 803, 'alaw'))
        |  t(id, seed, n, codec)),
        |s AS (SELECT id, codec, ((i*31 + seed*7) % 2003) - 1001 AS v
        |      FROM cfg, generate_series(0, 1000) g(i) WHERE i < n),
        |ux AS (SELECT id, codec, v, least(abs(v), 32635) + 132 AS x1,
        |         CASE WHEN v >= 0 THEN v ELSE -v - 8 END AS lin FROM s),
        |ee AS (SELECT *, CAST(floor(log2(x1)) AS INT) - 7 AS ue,
        |         CASE WHEN lin <= 255 THEN 0
        |              ELSE CAST(floor(log2(lin)) AS INT) - 7 END AS aseg FROM ux),
        |mm AS (SELECT *, (x1 >> (ue + 3)) & 15 AS um,
        |         CASE WHEN aseg < 2 THEN (lin >> 4) & 15
        |              ELSE (lin >> (aseg + 3)) & 15 END AS am FROM ee),
        |rr AS (SELECT id, codec,
        |         CASE WHEN codec = 'ulaw'
        |           THEN (CASE WHEN v < 0 THEN -1 ELSE 1 END) *
        |                (((um * 8 + 132) << ue) - 132)
        |           ELSE (CASE WHEN v >= 0 THEN 1 ELSE -1 END) *
        |                (CASE WHEN aseg = 0 THEN (am << 4) + 8
        |                      WHEN aseg = 1 THEN (am << 4) + 264
        |                      ELSE ((am << 4) + 264) << (aseg - 1) END) END AS r
        |       FROM mm)
        |SELECT CAST(id AS BIGINT) AS media_id, codec, true AS decoded,
        |  CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(r*r) AS BIGINT) AS sum_sq
        |FROM rr GROUP BY id, codec
        |UNION ALL SELECT 99, 'junk', false, -1, -1, -1, -1""".stripMargin,
    // llm_video_frames oracle: structural facts (frame count, raster
    // dims) are exact; pixel_sum pins the GOLDEN decoded sums measured
    // once on this JDK's ImageIO (deterministic for a fixed JDK), so a
    // silent decoder change fails the hash outright. The pattern sums
    // (655200/1425408/2711520) bound the JPEG error at ~0.1%.
    "llm_video_frames" ->
      """WITH cfg AS (SELECT * FROM (VALUES
        |  (1, 3, 40, 28, 655713),
        |  (2, 4, 48, 32, 1424018),
        |  (3, 5, 56, 36, 2709614)) t(id, nf, w, h, ps))
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded,
        |  CAST(nf AS INT) AS n_frames, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, CAST(ps AS BIGINT) AS pixel_sum
        |FROM cfg
        |UNION ALL SELECT 99, false, -1, -1, -1, -1""".stripMargin,
    "llm_multimodal" ->
      """SELECT doc_id AS media_id, 'text-as-image-stub' AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  lower(substr(hex(encode(text)), 1, 16)) AS head8_hex,
        |  CAST(floor(((n_chars % 640) + 32) * least(1.0, 256.0 / greatest((n_chars % 640) + 32, ((n_chars * 7) % 480) + 32))) AS INT) AS out_width,
        |  CAST(floor((((n_chars * 7) % 480) + 32) * least(1.0, 256.0 / greatest((n_chars % 640) + 32, ((n_chars * 7) % 480) + 32))) AS INT) AS out_height,
        |  CAST(greatest(n_chars * 10 - 1, 0) // 1000 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    // Connected components via recursive transitive closure over the same
    // MinHash-LSH pair pipeline the llm_minhash_neardup oracle derives;
    // component id = min reachable doc id.
    "llm_dedup_clusters" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |  doc_id = cluster_id AS is_canonical
        |FROM comp""".stripMargin,
    "llm_quality_gopher" ->
      """WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws,
        |    string_split(text, chr(10)) AS lines FROM documents),
        |g AS (SELECT *, CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
        |    ELSE list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1]) END AS g2 FROM w),
        |sig AS (SELECT doc_id, text, ws,
        |  1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) AS dup_line_frac,
        |  CASE WHEN len(g2) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(g2),
        |     x -> len(list_filter(g2, y -> y = x)))) AS DOUBLE) / len(g2) END AS top_bigram_frac,
        |  CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
        |    / len(ws) AS symbol_word_ratio,
        |  CAST(len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*'))) AS DOUBLE)
        |    / len(lines) AS bullet_line_frac,
        |  CAST(len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is','it','for','on'], x))) AS DOUBLE)
        |    / len(ws) AS stopword_frac
        |  FROM g)
        |SELECT doc_id, dup_line_frac, top_bigram_frac, symbol_word_ratio, bullet_line_frac, stopword_frac,
        |  (len(ws) BETWEEN 50 AND 100000)
        |  AND (CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws) BETWEEN 3.0 AND 10.0)
        |  AND symbol_word_ratio < 0.1 AND dup_line_frac < 0.3
        |  AND len(list_intersect(ws, ['the','a','of','and','to','in','is','it','for','on'])) >= 2 AS gopher_keep
        |FROM sig""".stripMargin,
    "llm_pii_scrub" ->
      """WITH p AS (SELECT doc_id, text || ' contact user' || doc_id || '@example.com call +1 555 ' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.0.0.' || CAST(doc_id % 250 AS VARCHAR) AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text2, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(text2, '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}')) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}', '<PHONE>', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS scrubbed
        |FROM p""".stripMargin,
    "llm_hash_sample" ->
      """WITH r AS (SELECT doc_id, lang, source,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |  FROM documents)
        |SELECT doc_id, lang, source FROM r
        |WHERE b < CASE lang WHEN 'en' THEN 10 WHEN 'fr' THEN 100 ELSE 40 END""".stripMargin,
    "llm_incremental_dedup" ->
      """WITH w AS (SELECT doc_id, text, doc_id % 5 = 0 AS isnew,
        |    string_split(lower(text), ' ') AS ws FROM documents),
        |ck AS (SELECT doc_id, isnew, md5(text) AS c FROM w),
        |sh AS (SELECT doc_id, isnew, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, isnew, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, isnew, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, isnew, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id, c.doc_id AS oid
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key
        |  WHERE a.isnew AND NOT c.isnew),
        |near AS (SELECT DISTINCT cand.id FROM cand
        |  JOIN hs a ON a.doc_id = cand.id JOIN hs c ON c.doc_id = cand.oid
        |  WHERE CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.shingles, c.shingles))) >= 0.5),
        |ex AS (SELECT DISTINCT n.doc_id AS id FROM ck n
        |  JOIN ck o ON n.c = o.c AND NOT o.isnew WHERE n.isnew)
        |SELECT w.doc_id,
        |  w.doc_id IN (SELECT id FROM ex) AS dup_exact,
        |  w.doc_id IN (SELECT id FROM near) AS dup_near,
        |  NOT (w.doc_id IN (SELECT id FROM ex)) AND NOT (w.doc_id IN (SELECT id FROM near)) AS keep
        |FROM w WHERE isnew""".stripMargin,
    "llm_domain_mix" ->
      """WITH w AS (SELECT doc_id, source, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens FROM w GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM w),
        |wt AS (SELECT * FROM (VALUES ('src0', CAST(5000 AS BIGINT)), ('src1', CAST(2000 AS BIGINT))) v(source, w_bp)),
        |r AS (SELECT ps.source,
        |    least(CAST(10000 AS BIGINT), (total_tokens * coalesce(w_bp, 100) // 10000) * 10000 // src_tokens) AS rate_bp
        |  FROM ps CROSS JOIN tot LEFT JOIN wt ON ps.source = wt.source)
        |SELECT w.doc_id, w.source, w.n_tokens,
        |  CAST(('0x' || substr(md5(CAST(w.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < r.rate_bp AS keep
        |FROM w JOIN r ON w.source = r.source""".stripMargin,
    // llm_domain_mix_temp oracle: √-damped shares — s = floor(sqrt(src
    // tokens)) exact integer (IEEE sqrt is correctly rounded in both
    // engines), then the same integer basis-point chain as domain_mix
    "llm_domain_mix_temp" ->
      """WITH d AS (SELECT doc_id, source, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE doc_id % 3 = 0 OR source IN ('src0', 'src1')),
        |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS st FROM d GROUP BY source),
        |pss AS (SELECT source, st, CAST(floor(sqrt(CAST(st AS DOUBLE))) AS BIGINT) AS s FROM ps),
        |tot AS (SELECT CAST(sum(st) AS BIGINT) AS tt, CAST(sum(s) AS BIGINT) AS ss FROM pss),
        |r AS (SELECT source, st, s * 10000 // ss AS w_bp,
        |    least(CAST(10000 AS BIGINT), (tt * (s * 10000 // ss) // 10000) * 10000 // st) AS rate_bp
        |  FROM pss CROSS JOIN tot)
        |SELECT d.doc_id, d.source, d.n_tokens, r.w_bp,
        |  CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < r.rate_bp AS keep
        |FROM d JOIN r ON d.source = r.source""".stripMargin,
    "llm_vocab_census" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |t2 AS (SELECT doc_id, word FROM t WHERE length(word) > 0),
        |tf AS (SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences FROM t2 GROUP BY word),
        |dfq AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM t2 GROUP BY word)
        |SELECT tf.word, n_occurrences, n_docs FROM tf JOIN dfq USING (word)
        |ORDER BY n_occurrences DESC, word ASC LIMIT 100""".stripMargin,
    // pack-group modulus derived from the SAME formula as the engine
    // (max(32, ceil(n/500k))), not a hardcoded 32 — engine and oracle stay
    // in lockstep when the corpus outgrows 16M docs
    "llm_seq_pack" ->
      """WITH g AS (SELECT GREATEST(32, CAST(ceil(count(*) / 500000.0) AS BIGINT)) AS n FROM documents),
        |w AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % (SELECT n FROM g) AS pack_group,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id) AS cum FROM w)
        |SELECT doc_id, CAST(pack_group AS BIGINT) AS pack_group, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS start_block,
        |  CAST((cum - 1) // 512 AS BIGINT) AS end_block
        |FROM c""".stripMargin,
    "llm_line_dedup" ->
      """WITH s AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'all rights reserved by example corp' ELSE '' END AS t2
        |  FROM documents),
        |l AS (SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
        |  FROM (SELECT doc_id, string_split(t2, chr(10)) AS ls FROM s)),
        |b AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS nd FROM l GROUP BY line) WHERE nd >= 10),
        |t AS (SELECT doc_id, pos, line, line IN (SELECT line FROM b) AS isb FROM l)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN isb THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
        |  coalesce(string_agg(CASE WHEN isb THEN NULL ELSE line END, chr(10) ORDER BY pos), '') AS cleaned_text
        |FROM t GROUP BY doc_id""".stripMargin,
    "llm_decontaminate" ->
      """WITH ev AS (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 100 = 0),
        |snips AS (SELECT doc_id // 100 AS ref, array_to_string((string_split(lt, ' '))[1:12], ' ') AS snip FROM ev),
        |tr AS (SELECT d.doc_id, CASE WHEN d.doc_id % 20 = 1 THEN d.text || ' ' || s.snip ELSE d.text END AS t2
        |  FROM documents d JOIN snips s ON s.ref = d.doc_id % 5 WHERE d.doc_id % 100 <> 0),
        |eg AS (SELECT DISTINCT unnest(g8) AS g FROM (
        |  SELECT CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT string_split(lt, ' ') AS ws FROM ev))),
        |tg AS (SELECT doc_id, unnest(g8) AS g FROM (
        |  SELECT doc_id, CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM tr))),
        |h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tg SEMI JOIN eg USING (g) GROUP BY doc_id)
        |SELECT tr.doc_id, coalesce(h.n, 0) AS n_eval_grams, coalesce(h.n, 0) > 0 AS contaminated
        |FROM tr LEFT JOIN h ON tr.doc_id = h.doc_id""".stripMargin,
    // llm_contamination_report oracle: BOTH benchmark families' salted
    // leaks independently recomputed (family A head snips keyed %5,
    // family B word-3 snips keyed (id+2)%5), inverted to the per-EVAL
    // view: distinct-gram totals, hit grams, distinct leaking train docs,
    // benchmark tag.
    "llm_contamination_report" ->
      """WITH evA AS (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 100 = 0),
        |evB AS (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 100 = 50),
        |snA AS (SELECT doc_id // 100 AS refA, array_to_string((string_split(lt, ' '))[1:12], ' ') AS snipA FROM evA),
        |snB AS (SELECT doc_id // 100 AS refB, array_to_string((string_split(lt, ' '))[3:14], ' ') AS snipB FROM evB),
        |tr AS (
        |  SELECT d.doc_id,
        |    CASE WHEN d.doc_id % 20 = 1 OR d.doc_id % 20 = 7 THEN d.text || ' ' || a.snipA
        |         WHEN d.doc_id % 20 = 13 THEN d.text || ' ' || b.snipB
        |         ELSE d.text END AS t2
        |  FROM documents d
        |  JOIN snA a ON a.refA = d.doc_id % 5
        |  JOIN snB b ON b.refB = (d.doc_id + 2) % 5
        |  WHERE d.doc_id % 100 <> 0 AND d.doc_id % 100 <> 50),
        |ev AS (SELECT * FROM evA UNION ALL SELECT * FROM evB),
        |egd AS (SELECT doc_id AS eval_id, unnest(g8) AS g FROM (
        |  SELECT doc_id, CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT doc_id, string_split(lt, ' ') AS ws FROM ev))),
        |tg AS (SELECT doc_id, unnest(g8) AS g FROM (
        |  SELECT doc_id, CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM tr))),
        |hit AS (SELECT eval_id, CAST(count(DISTINCT egd.g) AS BIGINT) AS n_hit_grams,
        |    CAST(count(DISTINCT tg.doc_id) AS BIGINT) AS n_train_docs
        |  FROM egd JOIN tg ON egd.g = tg.g GROUP BY eval_id),
        |tot AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_grams FROM egd GROUP BY eval_id)
        |SELECT tot.eval_id, tot.n_grams,
        |  coalesce(hit.n_hit_grams, 0) AS n_hit_grams,
        |  coalesce(hit.n_train_docs, 0) AS n_train_docs,
        |  coalesce(hit.n_hit_grams, 0) > 0 AS burned,
        |  CASE WHEN tot.eval_id % 100 = 0 THEN 'benchA' ELSE 'benchB' END AS benchmark
        |FROM tot LEFT JOIN hit ON tot.eval_id = hit.eval_id
        |""".stripMargin,
    // llm_corpus_diff oracle: same synthetic refresh + md5-prefix content
    // hashes, full-outer joined on the id
    "llm_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h_old FROM documents),
        |v2d AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS t2
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL SELECT i AS doc_id, 'fresh crawl doc ' || CAST(i AS VARCHAR) AS t2
        |  FROM generate_series(-20, -1) g(i)),
        |v2 AS (SELECT doc_id, CAST(('0x' || substr(md5(t2), 1, 15)) AS BIGINT) AS h_new FROM v2d)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, h_old, h_new,
        |  CASE WHEN h_old IS NULL THEN 'added'
        |       WHEN h_new IS NULL THEN 'removed'
        |       WHEN h_old = h_new THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin,
    // llm_corpus_drift oracle: same v2 perturbation as llm_corpus_diff,
    // same one-division-per-rate IEEE sequence, same (drift, word) cut
    "llm_corpus_drift" ->
      """WITH v2d AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS t2
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL SELECT i AS doc_id, 'fresh crawl doc ' || CAST(i AS VARCHAR) AS t2
        |  FROM generate_series(-20, -1) g(i)),
        |t1 AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |t1f AS (SELECT word FROM t1 WHERE len(word) > 0),
        |t2 AS (SELECT unnest(string_split(lower(t2), ' ')) AS word FROM v2d),
        |t2f AS (SELECT word FROM t2 WHERE len(word) > 0),
        |cc1 AS (SELECT word, CAST(count(*) AS BIGINT) AS c1 FROM t1f GROUP BY word),
        |cc2 AS (SELECT word, CAST(count(*) AS BIGINT) AS c2 FROM t2f GROUP BY word),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM t1f),
        |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM t2f),
        |j AS (SELECT coalesce(cc1.word, cc2.word) AS word,
        |    coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
        |  FROM cc1 FULL OUTER JOIN cc2 ON cc1.word = cc2.word),
        |r AS (SELECT word, c1, c2,
        |    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS r1,
        |    CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS r2
        |  FROM j CROSS JOIN n1 CROSS JOIN n2)
        |SELECT word, c1, c2, r1, r2, abs(r1 - r2) AS drift
        |FROM r ORDER BY drift DESC, word ASC LIMIT 20""".stripMargin,
    // llm_chunking oracle: same window/stride arithmetic over the same
    // filtered token list; DuckDB list slice [a:b] is inclusive = Spark
    // slice(ws, a, 32) = elements a..a+31
    "llm_chunking" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |st AS (SELECT doc_id, ws, unnest(CASE WHEN len(ws) < 1 THEN [] ELSE generate_series(0, len(ws) - 1, 24) END) AS start FROM w)
        |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start_token,
        |  CAST(least(32, len(ws) - start) AS BIGINT) AS n_tokens,
        |  array_to_string(ws[start + 1:start + 32], ' ') AS chunk_text
        |FROM st""".stripMargin,
    // llm_bpe_train oracle: the same 6 merge steps replayed as chained
    // CTE blocks (mechanically generated per step — census → pair count →
    // pinned-tie-break top pair → greedy run-parity application), with
    // MATERIALIZED hints so multiply-referenced steps evaluate once
    "llm_bpe_train" ->
      """WITH w0 AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wc FROM w0 WHERE len(word) > 1 GROUP BY word),
        |d0 AS MATERIALIZED (SELECT word, wc, list_transform(generate_series(1, len(word)), i -> word[i:i]) AS syms FROM wf),
        |p1 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d0),
        |n1 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p1),
        |t1 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n1 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m1 AS MATERIALIZED (SELECT n1.*, t1.a, t1.b, (sym = a AND nxt = b) AS cand FROM n1 CROSS JOIN t1),
        |c1 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m1 WHERE cand),
        |ap1 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c1) WHERE (pos - h) % 2 = 0),
        |d1 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m1 m
        |  LEFT JOIN ap1 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap1 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p2 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d1),
        |n2 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p2),
        |t2 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n2 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m2 AS MATERIALIZED (SELECT n2.*, t2.a, t2.b, (sym = a AND nxt = b) AS cand FROM n2 CROSS JOIN t2),
        |c2 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m2 WHERE cand),
        |ap2 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c2) WHERE (pos - h) % 2 = 0),
        |d2 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m2 m
        |  LEFT JOIN ap2 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap2 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p3 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d2),
        |n3 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p3),
        |t3 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n3 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m3 AS MATERIALIZED (SELECT n3.*, t3.a, t3.b, (sym = a AND nxt = b) AS cand FROM n3 CROSS JOIN t3),
        |c3 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m3 WHERE cand),
        |ap3 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c3) WHERE (pos - h) % 2 = 0),
        |d3 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m3 m
        |  LEFT JOIN ap3 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap3 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p4 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d3),
        |n4 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p4),
        |t4 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n4 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m4 AS MATERIALIZED (SELECT n4.*, t4.a, t4.b, (sym = a AND nxt = b) AS cand FROM n4 CROSS JOIN t4),
        |c4 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m4 WHERE cand),
        |ap4 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c4) WHERE (pos - h) % 2 = 0),
        |d4 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m4 m
        |  LEFT JOIN ap4 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap4 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p5 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d4),
        |n5 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p5),
        |t5 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n5 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m5 AS MATERIALIZED (SELECT n5.*, t5.a, t5.b, (sym = a AND nxt = b) AS cand FROM n5 CROSS JOIN t5),
        |c5 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m5 WHERE cand),
        |ap5 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c5) WHERE (pos - h) % 2 = 0),
        |d5 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m5 m
        |  LEFT JOIN ap5 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap5 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p6 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d5),
        |n6 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p6),
        |t6 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n6 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m6 AS MATERIALIZED (SELECT n6.*, t6.a, t6.b, (sym = a AND nxt = b) AS cand FROM n6 CROSS JOIN t6),
        |c6 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m6 WHERE cand),
        |ap6 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c6) WHERE (pos - h) % 2 = 0),
        |d6 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m6 m
        |  LEFT JOIN ap6 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap6 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc)
        |SELECT CAST(1 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t1 UNION ALL SELECT CAST(2 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t2 UNION ALL SELECT CAST(3 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t3 UNION ALL SELECT CAST(4 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t4 UNION ALL SELECT CAST(5 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t5 UNION ALL SELECT CAST(6 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t6""".stripMargin,
    // llm_sessionize oracle: identical lag/cumsum session algebra in
    // epoch-us integers, decimal value sums
    "llm_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
        |c AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_seq FROM f)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ts_us) AS BIGINT) AS start_us,
        |  CAST(max(ts_us) AS BIGINT) AS end_us,
        |  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM c GROUP BY user_id, session_seq""".stripMargin,
    // llm_funnel oracle: identical chained min-after-strictly-after steps
    "llm_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |s1 AS (SELECT user_id, CAST(min(ts_us) AS BIGINT) AS t1_us FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, CAST(min(ts_us) AS BIGINT) AS t2_us FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE event_type = 'click' AND ts_us > t1_us GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, CAST(min(ts_us) AS BIGINT) AS t3_us FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE event_type = 'purchase' AND ts_us > t2_us GROUP BY e.user_id)
        |SELECT s1.user_id, t1_us, t2_us, t3_us,
        |  CAST(CASE WHEN t3_us IS NOT NULL THEN 3 WHEN t2_us IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,
    // llm_retention oracle: identical epoch-day cohort/offset counts
    "llm_retention" ->
      """WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, CAST(min(day) AS BIGINT) AS cohort_day FROM d GROUP BY user_id)
        |SELECT cohort_day, CAST(day - cohort_day AS BIGINT) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM d JOIN c ON d.user_id = c.user_id
        |GROUP BY cohort_day, day - cohort_day""".stripMargin,
    // llm_unicode_nfc oracle: identical salts built from chr() codepoints,
    // DuckDB's own nfc_normalize as the independent Unicode implementation
    "llm_unicode_nfc" ->
      """WITH s AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769) ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' A' || chr(778) || ' ngstro' || chr(776) || 'm' ELSE '' END AS t2
        |  FROM documents)
        |SELECT doc_id, CAST(length(t2) AS BIGINT) AS n_chars_before,
        |  CAST(length(nfc_normalize(t2)) AS BIGINT) AS n_chars_after,
        |  t2 <> nfc_normalize(t2) AS changed,
        |  nfc_normalize(t2) AS normalized
        |FROM s""".stripMargin,
    // llm_bpe_encode oracle: the same 6 materialized merge steps, final
    // dict state selected instead of the merge table
    "llm_bpe_encode" ->
      """WITH w0 AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wc FROM w0 WHERE len(word) > 1 GROUP BY word),
        |d0 AS MATERIALIZED (SELECT word, wc, list_transform(generate_series(1, len(word)), i -> word[i:i]) AS syms FROM wf),
        |p1 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d0),
        |n1 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p1),
        |t1 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n1 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m1 AS MATERIALIZED (SELECT n1.*, t1.a, t1.b, (sym = a AND nxt = b) AS cand FROM n1 CROSS JOIN t1),
        |c1 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m1 WHERE cand),
        |ap1 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c1) WHERE (pos - h) % 2 = 0),
        |d1 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m1 m
        |  LEFT JOIN ap1 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap1 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p2 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d1),
        |n2 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p2),
        |t2 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n2 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m2 AS MATERIALIZED (SELECT n2.*, t2.a, t2.b, (sym = a AND nxt = b) AS cand FROM n2 CROSS JOIN t2),
        |c2 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m2 WHERE cand),
        |ap2 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c2) WHERE (pos - h) % 2 = 0),
        |d2 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m2 m
        |  LEFT JOIN ap2 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap2 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p3 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d2),
        |n3 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p3),
        |t3 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n3 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m3 AS MATERIALIZED (SELECT n3.*, t3.a, t3.b, (sym = a AND nxt = b) AS cand FROM n3 CROSS JOIN t3),
        |c3 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m3 WHERE cand),
        |ap3 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c3) WHERE (pos - h) % 2 = 0),
        |d3 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m3 m
        |  LEFT JOIN ap3 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap3 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p4 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d3),
        |n4 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p4),
        |t4 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n4 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m4 AS MATERIALIZED (SELECT n4.*, t4.a, t4.b, (sym = a AND nxt = b) AS cand FROM n4 CROSS JOIN t4),
        |c4 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m4 WHERE cand),
        |ap4 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c4) WHERE (pos - h) % 2 = 0),
        |d4 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m4 m
        |  LEFT JOIN ap4 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap4 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p5 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d4),
        |n5 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p5),
        |t5 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n5 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m5 AS MATERIALIZED (SELECT n5.*, t5.a, t5.b, (sym = a AND nxt = b) AS cand FROM n5 CROSS JOIN t5),
        |c5 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m5 WHERE cand),
        |ap5 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c5) WHERE (pos - h) % 2 = 0),
        |d5 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m5 m
        |  LEFT JOIN ap5 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap5 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p6 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d5),
        |n6 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p6),
        |t6 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n6 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m6 AS MATERIALIZED (SELECT n6.*, t6.a, t6.b, (sym = a AND nxt = b) AS cand FROM n6 CROSS JOIN t6),
        |c6 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m6 WHERE cand),
        |ap6 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c6) WHERE (pos - h) % 2 = 0),
        |d6 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m6 m
        |  LEFT JOIN ap6 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap6 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc)
        |SELECT word, wc, CAST(len(syms) AS BIGINT) AS n_tokens,
        |  array_to_string(syms, ' ') AS tokens FROM d6""".stripMargin,
    // llm_rag_pipeline oracle: chunk slices, the same h64(token:d)
    // hashing-trick projection, then the standard integer brute ranking
    "llm_rag_pipeline" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |st AS (SELECT doc_id, ws, unnest(CASE WHEN len(ws) < 1 THEN [] ELSE generate_series(0, len(ws) - 1, 24) END) AS start FROM w),
        |ch AS (SELECT doc_id * 1024 + (start // 24) AS cid, ws[start + 1:start + 32] AS cws FROM st),
        |e AS (SELECT cid, list_transform(generate_series(0, 15), d ->
        |    CAST(list_sum(list_transform(cws, w2 ->
        |      ((CAST(('0x' || substr(md5(w2), 1, 15)) AS BIGINT) % 1000000007)
        |        * (2 * d + 1) + 7919 * d) % 1000000007 % 2001 - 1000)) AS BIGINT)) AS vq
        |  FROM ch),
        |en AS (SELECT cid, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |q AS (SELECT cid AS qid, vq AS qv, norm2 AS qn FROM en WHERE cid % (1024 * 173) = 0 AND norm2 > 0),
        |c AS (SELECT cid AS nid, vq AS nv, norm2 AS nn FROM en WHERE norm2 > 0),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_bm25 oracle: identical rational-idf BM25 with the SAME IEEE op
    // sequence (left-assoc multiplies, each division written once) and
    // the same micro-quantize-then-integer-sum, so scores are bit-exact
    "llm_bm25" -> bm25Sql,
    // llm_bm25_index oracle: the standing-index probe tokenizes NOTHING
    // in-query and returns exactly the inline rows (deterministic build)
    // — so the oracle IS bm25Sql
    "llm_bm25_index" -> bm25Sql,
    // llm_bm25_update oracle: the additive fold of the held-out batch
    // must equal a full rebuild over the whole corpus — so the oracle IS
    // the full-corpus BM25 chain, unchanged
    "llm_bm25_update" -> bm25Sql,
    // llm_query_expand oracle: the bm25Sql chain up to the ranked
    // feedback docs (rank <= 5 — the same rows the llm_bm25 oracle
    // emits), then corpus-wide tf/df over ALL words, Okapi impact per
    // (feedback doc, term) with the identical IEEE op sequence, original
    // query terms anti-joined out, integer sum per (query, term), top-10
    // on (sum DESC, term ASC) — DuckDB's default binary VARCHAR
    // collation matches Spark's UTF8String order
    "llm_query_expand" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |qt AS (SELECT DISTINCT query_id, word FROM
        |  (SELECT doc_id AS query_id, unnest(ws[1:5]) AS word FROM w WHERE doc_id % 97 = 0)),
        |qw AS (SELECT DISTINCT word FROM qt),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc GROUP BY query_id, nid),
        |r AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg),
        |fb AS (SELECT query_id, nid FROM r WHERE rank <= 5),
        |tf2 AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |df2 AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM tok) GROUP BY 1),
        |cand AS (SELECT fb.query_id, tf2.word, tf2.tf, df2.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM fb JOIN tf2 USING (nid) JOIN df2 USING (word) JOIN dl USING (nid) CROSS JOIN stats),
        |notq AS (SELECT cand.* FROM cand LEFT JOIN qt
        |  ON cand.query_id = qt.query_id AND cand.word = qt.word WHERE qt.word IS NULL),
        |scq AS (SELECT query_id, word,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM notq),
        |ex AS (SELECT query_id, word, CAST(sum(term_micro) AS BIGINT) AS expansion_micro FROM scq GROUP BY 1, 2),
        |rx AS (SELECT query_id, word, expansion_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY expansion_micro DESC, word ASC) AS rank FROM ex)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, word AS term, expansion_micro
        |FROM rx WHERE rank <= 10""".stripMargin,
    // llm_snippets oracle: the bm25Sql chain through the ranked top-5
    // (fb), then keyword-in-context over ONLY the result docs — 0-based
    // positions (generate_subscripts − 1: the head clamp makes the
    // offset load-bearing, as in proximity), start votes deduped per
    // (query, doc, start, word), best start by (count DESC, start ASC)
    // via QUALIFY, snippet = the 1-based W-token slice from start + 1
    "llm_snippets" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |qt AS (SELECT DISTINCT query_id, word FROM
        |  (SELECT doc_id AS query_id, unnest(ws[1:5]) AS word FROM w WHERE doc_id % 97 = 0)),
        |qw AS (SELECT DISTINCT word FROM qt),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc GROUP BY query_id, nid),
        |r AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg),
        |fb AS (SELECT query_id, nid FROM r WHERE rank <= 5),
        |ptok AS (SELECT doc_id AS nid, unnest(ws) AS word, generate_subscripts(ws, 1) - 1 AS p FROM w
        |  WHERE doc_id IN (SELECT nid FROM fb)),
        |hits AS (SELECT qt.query_id, ptok.nid, ptok.word,
        |  unnest(generate_series(greatest(0, ptok.p - 7), ptok.p)) AS s
        |  FROM ptok JOIN qt ON ptok.word = qt.word JOIN fb ON fb.query_id = qt.query_id AND fb.nid = ptok.nid),
        |votes AS (SELECT DISTINCT query_id, nid, word, s FROM hits),
        |cnt AS (SELECT query_id, nid, s, CAST(count(*) AS BIGINT) AS c FROM votes GROUP BY 1, 2, 3),
        |best AS (SELECT query_id, nid, c AS n_query_words, CAST(s AS BIGINT) AS snippet_start FROM cnt
        |  QUALIFY row_number() OVER (PARTITION BY query_id, nid ORDER BY c DESC, s ASC) = 1)
        |SELECT b.query_id, b.nid AS doc_id, b.snippet_start, b.n_query_words,
        |  array_to_string(w.ws[CAST(b.snippet_start + 1 AS BIGINT) : CAST(b.snippet_start + 8 AS BIGINT)], ' ') AS snippet
        |FROM best b JOIN w ON w.doc_id = b.nid""".stripMargin,
    // llm_snippets_multi oracle: the llm_snippets chain through the hit
    // positions, then the SAME greedy chain — best window by (count
    // DESC, start ASC) via QUALIFY, each next pick restricted to starts
    // ≥ 8 from every earlier pick — plus per-snippet 0-based match
    // offsets (string_agg ordered ascending ≡ Spark's sorted array_join)
    "llm_snippets_multi" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |qt AS (SELECT DISTINCT query_id, word FROM
        |  (SELECT doc_id AS query_id, unnest(ws[1:5]) AS word FROM w WHERE doc_id % 97 = 0)),
        |qw AS (SELECT DISTINCT word FROM qt),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc GROUP BY query_id, nid),
        |r AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg),
        |fb AS (SELECT query_id, nid FROM r WHERE rank <= 5),
        |ptok AS (SELECT doc_id AS nid, unnest(ws) AS word, generate_subscripts(ws, 1) - 1 AS p FROM w
        |  WHERE doc_id IN (SELECT nid FROM fb)),
        |phits AS (SELECT qt.query_id, ptok.nid, ptok.word, CAST(ptok.p AS BIGINT) AS p
        |  FROM ptok JOIN qt ON ptok.word = qt.word JOIN fb ON fb.query_id = qt.query_id AND fb.nid = ptok.nid),
        |hits AS (SELECT query_id, nid, word, unnest(generate_series(greatest(0, p - 7), p)) AS s FROM phits),
        |votes AS (SELECT DISTINCT query_id, nid, word, s FROM hits),
        |cnt AS (SELECT query_id, nid, s, CAST(count(*) AS BIGINT) AS c FROM votes GROUP BY 1, 2, 3),
        |b1 AS (SELECT query_id, nid, c, s FROM cnt
        |  QUALIFY row_number() OVER (PARTITION BY query_id, nid ORDER BY c DESC, s ASC) = 1),
        |c2 AS (SELECT cnt.query_id, cnt.nid, cnt.s, cnt.c FROM cnt JOIN b1 USING (query_id, nid)
        |  WHERE abs(cnt.s - b1.s) >= 8),
        |b2 AS (SELECT query_id, nid, c, s FROM c2
        |  QUALIFY row_number() OVER (PARTITION BY query_id, nid ORDER BY c DESC, s ASC) = 1),
        |c3 AS (SELECT c2.query_id, c2.nid, c2.s, c2.c FROM c2 JOIN b2 USING (query_id, nid)
        |  WHERE abs(c2.s - b2.s) >= 8),
        |b3 AS (SELECT query_id, nid, c, s FROM c3
        |  QUALIFY row_number() OVER (PARTITION BY query_id, nid ORDER BY c DESC, s ASC) = 1),
        |chosen AS (SELECT query_id, nid, c, s, 1 AS snippet_rank FROM b1
        |  UNION ALL SELECT query_id, nid, c, s, 2 FROM b2
        |  UNION ALL SELECT query_id, nid, c, s, 3 FROM b3),
        |offs AS (SELECT ch.query_id, ch.nid, ch.snippet_rank, ch.s,
        |    string_agg(CAST(pt.p - ch.s AS VARCHAR), ',' ORDER BY pt.p - ch.s) AS match_offsets
        |  FROM chosen ch JOIN phits pt ON pt.query_id = ch.query_id AND pt.nid = ch.nid
        |    AND pt.p >= ch.s AND pt.p <= ch.s + 7
        |  GROUP BY 1, 2, 3, 4)
        |SELECT ch.query_id, ch.nid AS doc_id, CAST(ch.snippet_rank AS BIGINT) AS snippet_rank,
        |  CAST(ch.s AS BIGINT) AS snippet_start, CAST(ch.c AS BIGINT) AS n_query_words,
        |  o.match_offsets,
        |  array_to_string(w.ws[CAST(ch.s + 1 AS BIGINT) : CAST(ch.s + 8 AS BIGINT)], ' ') AS snippet
        |FROM chosen ch
        |JOIN offs o ON o.query_id = ch.query_id AND o.nid = ch.nid AND o.snippet_rank = ch.snippet_rank
        |JOIN w ON w.doc_id = ch.nid""".stripMargin,
    // llm_prf_search oracle: the llm_query_expand chain through rx (the
    // ranked expansion terms), then the RM3 interpolated weights —
    // original terms at 600000 // |q| micro each, expansion at
    // (400000 · e) // Σe — and the weighted second pass: per matched
    // term (weight · impact) // 10⁶ with the SAME Okapi IEEE op
    // sequence, integer-summed per (query, doc), ranked top-5. All
    // divisions are over non-negative BIGINTs, so DuckDB's flooring //
    // ≡ Spark's truncating DIV throughout.
    "llm_prf_search" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |qt AS (SELECT DISTINCT query_id, word FROM
        |  (SELECT doc_id AS query_id, unnest(ws[1:5]) AS word FROM w WHERE doc_id % 97 = 0)),
        |qw AS (SELECT DISTINCT word FROM qt),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc GROUP BY query_id, nid),
        |r AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg),
        |fb AS (SELECT query_id, nid FROM r WHERE rank <= 5),
        |tf2 AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |df2 AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM tok) GROUP BY 1),
        |cand AS (SELECT fb.query_id, tf2.word, tf2.tf, df2.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM fb JOIN tf2 USING (nid) JOIN df2 USING (word) JOIN dl USING (nid) CROSS JOIN stats),
        |notq AS (SELECT cand.* FROM cand LEFT JOIN qt
        |  ON cand.query_id = qt.query_id AND cand.word = qt.word WHERE qt.word IS NULL),
        |scq AS (SELECT query_id, word,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM notq),
        |ex AS (SELECT query_id, word, CAST(sum(term_micro) AS BIGINT) AS expansion_micro FROM scq GROUP BY 1, 2),
        |rx AS (SELECT query_id, word, expansion_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY expansion_micro DESC, word ASC) AS rank FROM ex),
        |ex10 AS (SELECT query_id, word, expansion_micro FROM rx WHERE rank <= 10),
        |sexp AS (SELECT query_id, CAST(sum(expansion_micro) AS BIGINT) AS s_exp FROM ex10 GROUP BY 1),
        |nq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_q FROM qt GROUP BY 1),
        |wq2 AS (
        |  SELECT qt.query_id, qt.word, CAST(600000 // nq.n_q AS BIGINT) AS weight_micro FROM qt JOIN nq USING (query_id)
        |  UNION ALL
        |  SELECT e.query_id, e.word, CAST(CASE WHEN s.s_exp > 0 THEN (400000 * e.expansion_micro) // s.s_exp ELSE 0 END AS BIGINT)
        |  FROM ex10 e JOIN sexp s USING (query_id)),
        |m2 AS (SELECT nid, tok.word FROM tok JOIN (SELECT DISTINCT word FROM wq2) ww ON tok.word = ww.word),
        |tf3 AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m2 GROUP BY 1, 2),
        |df3 AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m2) GROUP BY 1),
        |t3 AS (SELECT wq2.query_id, tf3.nid, tf3.tf, df3.df, dl.dl, stats.n_docs, stats.total_tokens, wq2.weight_micro
        |  FROM tf3 JOIN df3 USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN wq2 ON tf3.word = wq2.word
        |  WHERE tf3.nid <> wq2.query_id),
        |sc3 AS (SELECT query_id, nid,
        |    (weight_micro * CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT)) // 1000000 AS w_term
        |  FROM t3),
        |agg3 AS (SELECT query_id, nid, CAST(sum(w_term) AS BIGINT) AS score_micro FROM sc3 GROUP BY 1, 2),
        |r3 AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg3)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, score_micro
        |FROM r3 WHERE rank <= 5""".stripMargin,
    // llm_drift_retrain oracle: both phases replayed from scratch —
    // phase 1 gates the shifted batches (vq → 3·vq + 41 on vec_id % 7 =
    // 0; reversed tokens on doc_id % 53 = 0) against the frozen
    // artifacts (SQ bounds over the base corpus; the base vocabulary);
    // phase 2 retrains (SQ bounds over base ∪ batch₁; vocabulary ∪
    // batch₁ words) and gates a second same-distribution batch
    // (% 7 = 1 / % 53 = 1). Same saturation/OOV bp arithmetic as the
    // llm_index_drift oracle; thresholds 500 bp on both legs.
    "llm_drift_retrain" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |squ AS (SELECT unnest(vq) AS v, generate_subscripts(vq, 1) - 1 AS j FROM e),
        |sqb AS (SELECT j, min(v) AS mn, max(v) AS mx FROM squ GROUP BY 1),
        |sat_base1 AS (SELECT CAST(sum(CASE WHEN code IN (0, 255) THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS bp FROM
        |  (SELECT CASE WHEN mx = mn THEN 0 ELSE greatest(0, least(255, ((v - mn) * 255) // (mx - mn))) END AS code FROM squ JOIN sqb USING (j))),
        |b1 AS (SELECT list_transform(vq, v -> v * 3 + 41) AS vq FROM e WHERE vec_id % 7 = 0),
        |squ1 AS (SELECT unnest(vq) AS v, generate_subscripts(vq, 1) - 1 AS j FROM b1),
        |sat_batch1 AS (SELECT CAST(sum(CASE WHEN code IN (0, 255) THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS bp FROM
        |  (SELECT CASE WHEN mx = mn THEN 0 ELSE greatest(0, least(255, ((v - mn) * 255) // (mx - mn))) END AS code FROM squ1 JOIN sqb USING (j))),
        |squA AS (SELECT v, j FROM squ UNION ALL SELECT v, j FROM squ1),
        |sqb2 AS (SELECT j, min(v) AS mn, max(v) AS mx FROM squA GROUP BY 1),
        |sat_base2 AS (SELECT CAST(sum(CASE WHEN code IN (0, 255) THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS bp FROM
        |  (SELECT CASE WHEN mx = mn THEN 0 ELSE greatest(0, least(255, ((v - mn) * 255) // (mx - mn))) END AS code FROM squA JOIN sqb2 USING (j))),
        |b2 AS (SELECT list_transform(vq, v -> v * 3 + 41) AS vq FROM e WHERE vec_id % 7 = 1),
        |squ2 AS (SELECT unnest(vq) AS v, generate_subscripts(vq, 1) - 1 AS j FROM b2),
        |sat_batch2 AS (SELECT CAST(sum(CASE WHEN code IN (0, 255) THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS bp FROM
        |  (SELECT CASE WHEN mx = mn THEN 0 ELSE greatest(0, least(255, ((v - mn) * 255) // (mx - mn))) END AS code FROM squ2 JOIN sqb2 USING (j))),
        |vocab AS (SELECT DISTINCT w FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), w -> len(w) > 0)) AS w FROM documents)),
        |bt1 AS (SELECT unnest(list_transform(list_filter(string_split(lower(text), ' '), w -> len(w) > 0), w -> reverse(w))) AS w FROM documents WHERE doc_id % 53 = 0),
        |oov1 AS (SELECT count(*) AS t, sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS o FROM bt1 LEFT JOIN vocab v ON bt1.w = v.w),
        |vocab2 AS (SELECT DISTINCT w FROM (SELECT w FROM vocab UNION ALL SELECT w FROM bt1)),
        |bt2 AS (SELECT unnest(list_transform(list_filter(string_split(lower(text), ' '), w -> len(w) > 0), w -> reverse(w))) AS w FROM documents WHERE doc_id % 53 = 1),
        |oov2 AS (SELECT count(*) AS t, sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS o FROM bt2 LEFT JOIN vocab2 v ON bt2.w = v.w)
        |SELECT CAST(1 AS BIGINT) AS phase, 'sq_sat_delta_bp' AS gate_check, CAST(sb.bp - s0.bp AS BIGINT) AS observed, CAST(500 AS BIGINT) AS threshold, (sb.bp - s0.bp) > 500 AS triggered FROM sat_batch1 sb CROSS JOIN sat_base1 s0
        |UNION ALL SELECT CAST(1 AS BIGINT), 'bm25_oov_bp', CAST(CASE WHEN t = 0 THEN 0 ELSE o * 10000 // t END AS BIGINT), CAST(500 AS BIGINT), (CASE WHEN t = 0 THEN 0 ELSE o * 10000 // t END) > 500 FROM oov1
        |UNION ALL SELECT CAST(2 AS BIGINT), 'sq_sat_delta_bp', CAST(sb.bp - s0.bp AS BIGINT), CAST(500 AS BIGINT), (sb.bp - s0.bp) > 500 FROM sat_batch2 sb CROSS JOIN sat_base2 s0
        |UNION ALL SELECT CAST(2 AS BIGINT), 'bm25_oov_bp', CAST(CASE WHEN t = 0 THEN 0 ELSE o * 10000 // t END AS BIGINT), CAST(500 AS BIGINT), (CASE WHEN t = 0 THEN 0 ELSE o * 10000 // t END) > 500 FROM oov2""".stripMargin,
    // llm_phrase_search oracle: the same slot-vote algebra — token
    // positions join phrase slots, each hit votes for its implied start
    // s = p − i, a start matches iff all n slots voted (1-based DuckDB
    // subscripts cancel in the subtraction, so s aligns with Spark's
    // 0-based posexplode)
    "llm_phrase_search" -> phraseSql,
    // llm_phrase_update oracle: the additive fold of the held-out 10%
    // batch into the 90% standing positional index must equal a full
    // rebuild over the whole corpus — so the oracle IS the full-corpus
    // phrase chain, unchanged
    "llm_phrase_update" -> phraseSql,
    // llm_bm25_delete oracle: subtractive tombstone delete from the
    // standing index ≡ a from-scratch rebuild over the SURVIVING corpus
    // — the corpus-side CTEs score documents WHERE doc_id % 11 <> 0
    // while the query set still derives from the FULL document table (a
    // deleted doc's query text remains a valid query)
    "llm_bm25_delete" ->
      """WITH wq0 AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents WHERE doc_id % 97 = 0),
        |qt AS (SELECT DISTINCT doc_id AS query_id, unnest(ws[1:5]) AS word FROM wq0),
        |qw AS (SELECT DISTINCT word FROM qt),
        |w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents WHERE doc_id % 11 <> 0),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc GROUP BY query_id, nid),
        |r AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, score_micro
        |FROM r WHERE rank <= 5""".stripMargin,
    // llm_prox_rank oracle: the bm25Sql chain through the ranked top-20
    // (cand, with scores), then proximity start votes over ONLY the
    // candidate docs (0-based positions — generate_subscripts − 1, the
    // head clamp makes the offset load-bearing as in proximity/snippets),
    // a window wins when its distinct-word count reaches the query's,
    // boosted = score + 100000·n_windows (pure integer), re-ranked
    // (boosted DESC, doc ASC) top-5
    "llm_prox_rank" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |qt AS (SELECT DISTINCT query_id, word FROM
        |  (SELECT doc_id AS query_id, unnest(ws[1:5]) AS word FROM w WHERE doc_id % 97 = 0)),
        |qw AS (SELECT DISTINCT word FROM qt),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc GROUP BY query_id, nid),
        |r AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg),
        |cand AS (SELECT query_id, nid, score_micro FROM r WHERE rank <= 20),
        |ptok AS (SELECT doc_id AS nid, unnest(ws) AS word, generate_subscripts(ws, 1) - 1 AS p FROM w
        |  WHERE doc_id IN (SELECT nid FROM cand)),
        |hits AS (SELECT qt.query_id, ptok.nid, ptok.word,
        |  unnest(generate_series(greatest(0, ptok.p - 7), ptok.p)) AS s
        |  FROM ptok JOIN qt ON ptok.word = qt.word
        |  JOIN cand ON cand.query_id = qt.query_id AND cand.nid = ptok.nid),
        |votes AS (SELECT DISTINCT query_id, nid, word, s FROM hits),
        |occ AS (SELECT query_id, nid, s, count(*) AS k_i FROM votes GROUP BY 1, 2, 3),
        |nq2 AS (SELECT query_id, count(*) AS n_words FROM qt GROUP BY 1),
        |wins AS (SELECT o.query_id, o.nid, CAST(count(*) AS BIGINT) AS n_windows
        |  FROM occ o JOIN nq2 USING (query_id) WHERE o.k_i = nq2.n_words GROUP BY 1, 2),
        |boosted AS (SELECT c.query_id, c.nid, c.score_micro,
        |    CAST(coalesce(wn.n_windows, 0) AS BIGINT) AS n_windows,
        |    CAST(c.score_micro + 100000 * coalesce(wn.n_windows, 0) AS BIGINT) AS boosted_micro
        |  FROM cand c LEFT JOIN wins wn ON c.query_id = wn.query_id AND c.nid = wn.nid),
        |rb AS (SELECT query_id, nid, score_micro, n_windows, boosted_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY boosted_micro DESC, nid ASC) AS rank FROM boosted)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, score_micro, n_windows, boosted_micro
        |FROM rb WHERE rank <= 5""".stripMargin,
    // llm_index_lifecycle oracle: the full chain (build 90% → fold 10%
    // → delete % 7 → re-add % 21 → probe) must equal a from-scratch
    // score of the NET corpus — doc_id % 7 <> 0 OR % 21 = 0 — while the
    // query set still derives from the FULL document table (same
    // contract as llm_bm25_delete)
    "llm_index_lifecycle" ->
      """WITH wq0 AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents WHERE doc_id % 97 = 0),
        |qt AS (SELECT DISTINCT doc_id AS query_id, unnest(ws[1:5]) AS word FROM wq0),
        |qw AS (SELECT DISTINCT word FROM qt),
        |w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents
        |  WHERE doc_id % 7 <> 0 OR doc_id % 21 = 0),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc GROUP BY query_id, nid),
        |r AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, score_micro
        |FROM r WHERE rank <= 5""".stripMargin,
    // llm_proximity_search oracle: the same start-vote algebra — each
    // 0-based hit position (generate_subscripts − 1, matching Spark's
    // posexplode; the head clamp makes the offset load-bearing here,
    // unlike the phrase's cancelling subtraction) votes for the ≤ 6
    // starts it covers, votes dedupe per (query, doc, start, word), and
    // a start matches iff its distinct-word count reaches the query's
    "llm_proximity_search" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word, generate_subscripts(ws, 1) - 1 AS p FROM d),
        |q AS (SELECT doc_id AS query_id, ws[2:4] AS qs FROM d WHERE doc_id % 89 = 0),
        |qw AS (SELECT DISTINCT query_id, unnest(qs) AS word FROM q),
        |nw AS (SELECT query_id, count(*) AS n_words FROM qw GROUP BY 1),
        |hits AS (SELECT qw.query_id, tok.nid, tok.word,
        |  unnest(generate_series(greatest(0, tok.p - 5), tok.p)) AS s
        |  FROM tok JOIN qw USING (word)),
        |votes AS (SELECT DISTINCT query_id, nid, word, s FROM hits),
        |occ AS (SELECT query_id, nid, s, count(*) AS k_i FROM votes GROUP BY 1, 2, 3),
        |mt AS (SELECT o.query_id, o.nid, CAST(count(*) AS BIGINT) AS n_windows
        |  FROM occ o JOIN nw USING (query_id) WHERE o.k_i = nw.n_words GROUP BY 1, 2),
        |ranked AS (SELECT query_id, nid, n_windows,
        |  row_number() OVER (PARTITION BY query_id ORDER BY n_windows DESC, nid ASC) AS rank FROM mt)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, n_windows
        |FROM ranked WHERE rank <= 5""".stripMargin,
    // llm_bm25_auto oracle: the per-batch strategy pick dispatches
    // between two bit-identical branches, so the auto row shares the
    // same plain-BM25 SQL — the hash match IS "the pick changed nothing"
    "llm_bm25_auto" -> bm25Sql,
    // llm_bm25_maxscore oracle: MaxScore is an exact optimization — the
    // pruned probe must reproduce the plain chain bit-for-bit
    "llm_bm25_maxscore" -> bm25Sql,
    // llm_hybrid_search oracle: brute dense top-10 (llm_ann_topk shape)
    // + BM25 top-10 over the shared query set, fused by pure-integer RRF
    "llm_hybrid_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |q AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, vq AS nv, norm2 AS nn FROM en),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |dense AS (SELECT qid, nid, rank FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored) WHERE rank <= 10),
        |w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |qt AS (SELECT DISTINCT query_id, word FROM
        |  (SELECT doc_id AS query_id, unnest(ws[1:5]) AS word FROM w WHERE doc_id % 50 = 0)),
        |qw AS (SELECT DISTINCT word FROM qt),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc2 AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc2 GROUP BY query_id, nid),
        |sparse AS (SELECT query_id AS qid, nid, rank FROM (SELECT query_id, nid,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg)
        |  WHERE rank <= 10),
        |fused AS (SELECT coalesce(dense.qid, sparse.qid) AS query_id,
        |    coalesce(dense.nid, sparse.nid) AS nid,
        |    CAST(coalesce(1000000 // (60 + dense.rank), 0)
        |      + coalesce(1000000 // (60 + sparse.rank), 0) AS BIGINT) AS rrf_micro
        |  FROM dense FULL OUTER JOIN sparse
        |    ON dense.qid = sparse.qid AND dense.nid = sparse.nid),
        |r AS (SELECT query_id, nid, rrf_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, nid ASC) AS rank FROM fused)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, rrf_micro
        |FROM r WHERE rank <= 5""".stripMargin,
    // llm_ngram_lm oracle: same add-one-smoothed bigram training, same
    // one-division-one-multiply-one-floor per token, same integer means
    "llm_ngram_lm" ->
      """WITH w AS (SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |bgidx AS (SELECT id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w WHERE len(ws) >= 2),
        |bg AS (SELECT id, ws[i] AS w1, ws[i + 1] AS w2 FROM bgidx),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
        |v AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM (SELECT unnest(ws) AS word FROM w)),
        |sc AS (SELECT bg.id,
        |    CAST(floor((CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)) * 1000000000.0) AS BIGINT) AS ppb
        |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
        |pd AS (SELECT id, CAST(count(*) AS BIGINT) AS n_bigrams, CAST(sum(ppb) AS BIGINT) AS sum_ppb FROM sc GROUP BY id),
        |pd2 AS (SELECT id, n_bigrams, CAST(sum_ppb // n_bigrams AS BIGINT) AS mean_prob_ppb FROM pd),
        |cm AS (SELECT CAST(sum(sum_ppb) // sum(n_bigrams) AS BIGINT) AS corpus_mean FROM pd)
        |SELECT id AS doc_id, n_bigrams, mean_prob_ppb,
        |  CASE WHEN mean_prob_ppb >= corpus_mean THEN 'head' ELSE 'tail' END AS bucket
        |FROM pd2 CROSS JOIN cm""".stripMargin,
    // llm_domain_budget oracle: the naive per-source running-sum window
    // the bucketed per-group decomposition must reproduce exactly
    "llm_domain_budget" ->
      """WITH h AS (SELECT source, doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |b AS (SELECT DISTINCT source,
        |    400 + (CAST(substr(source, 4) AS BIGINT) % 3) * 300 AS budget FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY hh, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM h)
        |SELECT c.source, doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
        |  cum - n_tokens < budget AS keep
        |FROM c JOIN b ON c.source = b.source""".stripMargin,
    // llm_rolling_dedup oracle: a FULL re-cluster of the unioned corpus —
    // the incremental path must reproduce it exactly (same pair set: LSH
    // candidates depend only on per-doc signatures, so old-old, new-old
    // and new-new pairs partition the full run's pairs)
    "llm_rolling_dedup" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id, doc_id % 5 = 0 AS is_new FROM comp""".stripMargin,
    // llm_semantic_dedup oracle: replays the llm_ann_ivf k-means training
    // (identical CTE chain), pairs within cells by exact integer cosine,
    // closes components with the recursive-CTE reach
    "llm_semantic_dedup" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |mem AS (SELECT en.vec_id AS nid, vq, norm2, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |pr AS (SELECT a.nid AS id_a, b.nid AS id_b
        |  FROM mem a JOIN mem b ON a.cell = b.cell AND a.nid < b.nid
        |  WHERE CAST(CAST(list_sum(list_transform(generate_series(1, len(a.vq)), i -> a.vq[i] * b.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) >= 0.35),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pr UNION SELECT id_b, id_a FROM pr),
        |reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT eg.u, reach.r FROM edges eg JOIN reach ON reach.id = eg.v),
        |comp AS (SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY cluster_id)
        |SELECT comp.vec_id, comp.cluster_id, sz.cluster_size,
        |  comp.vec_id = comp.cluster_id AS is_canonical
        |FROM comp JOIN sz USING (cluster_id)""".stripMargin,
    // llm_span_dedup oracle: positional 8-gram keys re-derived via the
    // Σ-form of the dual-modulus rolling hash (per-word md5 → polynomial
    // combination with interpolated power tables — independent of the
    // engine's O(1) recurrence), then corpus document frequency and
    // gaps-and-islands runs. 1-based subscripts: only run LENGTHS are
    // compared, so the base offset cancels.
    "llm_span_dedup" ->
      s"""WITH s AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0 THEN ' the quick brown fox jumps over the lazy dog again' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' all rights reserved this document is provided without any warranty' ELSE '' END AS t2
        |  FROM documents),
        |w AS (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM s),
        |wh AS (SELECT doc_id, list_transform(ws, x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS wh FROM w),
        |pw AS (SELECT [${plans.RollingGrams.powTable(plans.RollingGrams.B1, 8, plans.RollingGrams.P1).mkString(", ")}] AS pw1,
        |    [${plans.RollingGrams.powTable(plans.RollingGrams.B2, 8, plans.RollingGrams.P2).mkString(", ")}] AS pw2),
        |gl AS (SELECT doc_id, CASE WHEN len(wh) < 8 THEN CAST([] AS BIGINT[])
        |  ELSE list_transform(generate_series(1, len(wh)-7), i ->
        |    (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P1}) * pw1[j+1]) % ${plans.RollingGrams.P1})) % ${plans.RollingGrams.P1}) * ${plans.RollingGrams.P2}
        |  + (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P2}) * pw2[j+1]) % ${plans.RollingGrams.P2})) % ${plans.RollingGrams.P2})) END AS gs
        |  FROM wh CROSS JOIN pw),
        |g AS (SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS h FROM gl),
        |dupg AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |d AS (SELECT doc_id, pos FROM g SEMI JOIN dupg USING (h)),
        |runs AS (SELECT doc_id, pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM d),
        |rl AS (SELECT doc_id, grp, count(*) AS rl FROM runs GROUP BY doc_id, grp),
        |st AS (SELECT doc_id, CAST(sum(rl) AS BIGINT) AS n_dup_spans,
        |    CAST(max(rl) AS BIGINT) AS max_dup_run FROM rl GROUP BY doc_id),
        |ns AS (SELECT doc_id, CAST(CASE WHEN len(ws) >= 8 THEN len(ws) - 7 ELSE 0 END AS BIGINT) AS n_spans FROM w)
        |SELECT ns.doc_id, ns.n_spans, coalesce(st.n_dup_spans, 0) AS n_dup_spans,
        |  coalesce(st.max_dup_run, 0) AS max_dup_run
        |FROM ns LEFT JOIN st ON ns.doc_id = st.doc_id""".stripMargin,
    "llm_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'train'
        |       WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    // llm_url_ops oracle: the same regex chain in the RE2 dialect (\1
    // backreference, 'g' flags) + the md5-hash domain ranking
    // llm_url_ops oracle: canonicalize chain + public-suffix-aware domain
    // (same embedded suffix subset — shared DATA, publicsuffix.org) + the
    // window-form cap; the engine's bounded top-k aggregate must agree on
    // the kept set, with NULL rank beyond the cap (the agg form doesn't
    // rank what it drops)
    "llm_url_ops" ->
      s"""WITH u AS (SELECT doc_id,
        |    'HTTPS://' || CASE WHEN doc_id % 11 = 0
        |      THEN 'WWW.Site' || CAST(doc_id % 3 AS VARCHAR) || '.CO.UK'
        |      ELSE 'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM' END
        |    || '/Path' || CAST(doc_id AS VARCHAR) ||
        |    '?utm_source=feed&id=' || CAST(doc_id % 30 AS VARCHAR) || '&fbclid=xyz#frag' AS url
        |  FROM documents),
        |p AS (SELECT doc_id, url, regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0) AS pfx FROM u),
        |c1 AS (SELECT doc_id, lower(pfx) || substr(url, length(pfx) + 1) AS c FROM p),
        |c2 AS (SELECT doc_id, regexp_replace(c, '#.*$$', '') AS c FROM c1),
        |c3 AS (SELECT doc_id, regexp_replace(c, '([?&])(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*', '\\1', 'g') AS c FROM c2),
        |c4 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(c, '&{2,}', '&', 'g'), '\\?&', '?'), '[?&]+$$', '') AS canon_url FROM c3),
        |hx AS (SELECT doc_id, canon_url,
        |    regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
        |  FROM c4),
        |d AS (SELECT doc_id, canon_url, hh,
        |    CASE WHEN regexp_extract(host, '[^.]+\\.[^.]+$$', 0) IN (${llm.TextOps.MultiLabelSuffixes.map(x => s"'$x'").mkString(", ")})
        |           AND regexp_extract(host, '[^.]+\\.[^.]+\\.[^.]+$$', 0) != ''
        |      THEN regexp_extract(host, '[^.]+\\.[^.]+\\.[^.]+$$', 0)
        |      ELSE regexp_extract(host, '[^.]+\\.[^.]+$$', 0) END AS domain
        |  FROM hx),
        |r AS (SELECT doc_id, canon_url, domain,
        |    row_number() OVER (PARTITION BY domain ORDER BY hh, doc_id) AS rn FROM d)
        |SELECT doc_id, canon_url, domain,
        |  CASE WHEN rn <= 40 THEN CAST(rn AS BIGINT) END AS domain_rank,
        |  rn <= 40 AS kept
        |FROM r""".stripMargin,
    // llm_salted_join oracle: the PLAIN equi-join + grouped distinct-list.
    // The engine's salted join (+ two-phase salted collect_set) must be
    // row-identical — salting changes the physical distribution only.
    "llm_salted_join" ->
      """WITH big AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 8 THEN 'hot'
        |         ELSE 'cold' || CAST(doc_id % 10 AS VARCHAR) END AS skew_key
        |  FROM documents),
        |dim(skew_key, tier) AS (SELECT * FROM (VALUES
        |  ('hot', 'tier-a'), ('cold8', 'tier-b'), ('cold9', 'tier-c')) v(k, t)),
        |j AS (SELECT b.doc_id, b.skew_key, d.tier
        |  FROM big b JOIN dim d USING (skew_key))
        |SELECT skew_key, tier, CAST(count(*) AS BIGINT) AS n_docs,
        |  array_to_string(list_sort(list(DISTINCT doc_id % 100)), ',') AS buckets
        |FROM j GROUP BY skew_key, tier""".stripMargin,
    // llm_quantile_sketch oracle: replays the integer log-linear bucket
    // algebra (bitlen via length(bin(v)) — the HLL rank trick) and the
    // exact value-domain percentile it is audited against.
    "llm_quantile_sketch" ->
      """WITH v AS (SELECT CAST(length(text) AS BIGINT) AS v FROM documents),
        |hb AS (SELECT v, CAST(length(bin(v)) AS BIGINT) AS b FROM v WHERE v >= 1),
        |hist AS (SELECT b * 16 + (v * 16) // (1::BIGINT << (b - 1)) - 16 AS bucket_id,
        |    count(*) AS c FROM hb GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM hist),
        |cum AS (SELECT bucket_id, sum(c) OVER (ORDER BY bucket_id) AS cum FROM hist),
        |qs AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS q),
        |pick AS (SELECT q, min(bucket_id) AS bk
        |  FROM qs, cum, tot WHERE cum.cum * 100 >= q * tot.n GROUP BY q),
        |skv AS (SELECT q, (1::BIGINT << (bk // 16 - 1))
        |    + ((bk % 16) * (1::BIGINT << (bk // 16 - 1))) // 16 AS sketch_v FROM pick),
        |vh AS (SELECT v, count(*) AS c FROM v WHERE v >= 1 GROUP BY v),
        |vc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vh),
        |ex AS (SELECT q, min(v) AS exact_v FROM qs, vc, tot
        |  WHERE vc.cum * 100 >= q * tot.n GROUP BY q)
        |SELECT s.q, s.sketch_v, e.exact_v,
        |  abs(s.sketch_v - e.exact_v) * 16 <= e.exact_v AS within_bound
        |FROM skv s JOIN ex e USING (q)""".stripMargin,
    // llm_weighted_quantile oracle: token-weighted bucket mass + the
    // token-weighted exact value-domain percentile.
    "llm_weighted_quantile" ->
      """WITH d AS (SELECT CAST(length(text) AS BIGINT) AS v,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok FROM documents),
        |hb AS (SELECT v, tok, CAST(length(bin(v)) AS BIGINT) AS b FROM d WHERE v >= 1),
        |hist AS (SELECT b * 16 + (v * 16) // (1::BIGINT << (b - 1)) - 16 AS bucket_id,
        |    sum(tok) AS c FROM hb GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM hist),
        |cum AS (SELECT bucket_id, sum(c) OVER (ORDER BY bucket_id) AS cum FROM hist),
        |qs AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS q),
        |pick AS (SELECT q, min(bucket_id) AS bk
        |  FROM qs, cum, tot WHERE cum.cum * 100 >= q * tot.n GROUP BY q),
        |skv AS (SELECT q, (1::BIGINT << (bk // 16 - 1))
        |    + ((bk % 16) * (1::BIGINT << (bk // 16 - 1))) // 16 AS sketch_v FROM pick),
        |vh AS (SELECT v, sum(tok) AS c FROM d WHERE v >= 1 GROUP BY v),
        |vc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vh),
        |ex AS (SELECT q, min(v) AS exact_v FROM qs, vc, tot
        |  WHERE vc.cum * 100 >= q * tot.n GROUP BY q)
        |SELECT s.q, s.sketch_v, e.exact_v,
        |  abs(s.sketch_v - e.exact_v) * 16 <= e.exact_v AS within_bound
        |FROM skv s JOIN ex e USING (q)""".stripMargin,
    // llm_winsorize oracle: same sketch-bound derivation (P1/P99 bucket
    // lower bounds) and clamp.
    "llm_winsorize" ->
      """WITH v AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS v FROM documents),
        |hb AS (SELECT v, CAST(length(bin(v)) AS BIGINT) AS b FROM v WHERE v >= 1),
        |hist AS (SELECT b * 16 + (v * 16) // (1::BIGINT << (b - 1)) - 16 AS bucket_id,
        |    count(*) AS c FROM hb GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM hist),
        |cum AS (SELECT bucket_id, sum(c) OVER (ORDER BY bucket_id) AS cum FROM hist),
        |qs AS (SELECT CAST(unnest([1, 99]) AS BIGINT) AS q),
        |pick AS (SELECT q, min(bucket_id) AS bk
        |  FROM qs, cum, tot WHERE cum.cum * 100 >= q * tot.n GROUP BY q),
        |skv AS (SELECT q, (1::BIGINT << (bk // 16 - 1))
        |    + ((bk % 16) * (1::BIGINT << (bk // 16 - 1))) // 16 AS sketch_v FROM pick),
        |b AS (SELECT min(CASE WHEN q = 1 THEN sketch_v END) AS p1,
        |    min(CASE WHEN q = 99 THEN sketch_v END) AS p99 FROM skv)
        |SELECT doc_id, v, least(greatest(v, p1), p99) AS w,
        |  v < p1 OR v > p99 AS clamped
        |FROM v, b""".stripMargin,
    // llm_corpus_report oracle: native GROUP BY CUBE + GROUPING bitmask
    // (same first-column-is-MSB convention as Spark's grouping_id).
    "llm_corpus_report" ->
      """WITH d AS (SELECT CAST(length(text) AS BIGINT) // 128 AS len_class,
        |    CAST(doc_id % 4 AS BIGINT) AS shard,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok FROM documents)
        |SELECT len_class, shard, CAST(grouping(len_class, shard) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
        |FROM d GROUP BY CUBE (len_class, shard)""".stripMargin,
    // llm_zorder_layout oracle: bit-for-bit Morton interleave (scalar
    // subquery over 16 bit positions) and the same per-cell rectangle
    // audit — every 10-bit cell spans < 2048 in BOTH dimensions.
    "llm_zorder_layout" ->
      """WITH d AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':dom'), 1, 15)) AS BIGINT) % 65536 AS x,
        |    least(CAST(length(text) AS BIGINT), 1023) * 64 + 32 AS y
        |  FROM documents),
        |z AS (SELECT x, y,
        |    (SELECT CAST(sum((((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))) AS BIGINT)
        |     FROM unnest(generate_series(0, 15)) t(i)) AS zval
        |  FROM d)
        |SELECT zval >> 22 AS cell_id, CAST(count(*) AS BIGINT) AS n_rows,
        |  max(x) - min(x) AS x_span, max(y) - min(y) AS y_span,
        |  max(x) - min(x) < 2048 AND max(y) - min(y) < 2048 AS bounded
        |FROM z GROUP BY 1""".stripMargin,
    // llm_epoch_plan oracle: per-source token sums, the same basis-point
    // weights, and the integer epoch/planned/deficit arithmetic
    "llm_epoch_plan" ->
      """WITH s AS (SELECT source, CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_tokens,
        |    100 + (CAST(substr(source, 4) AS BIGINT) % 5) * 50 AS weight_bp FROM s),
        |p AS (SELECT source, n_tokens, CAST(weight_bp AS BIGINT) AS weight_bp,
        |    (100000 * weight_bp) // 10000 AS target_tokens FROM w)
        |SELECT source, n_tokens, weight_bp, CAST(target_tokens AS BIGINT) AS target_tokens,
        |  CAST(CASE WHEN n_tokens = 0 THEN 0
        |       ELSE least(1000000, (target_tokens * 1000000) // n_tokens) END AS BIGINT) AS epochs_micro,
        |  CAST(least(target_tokens, (n_tokens * 1000000) // 1000000) AS BIGINT) AS planned_tokens,
        |  CAST(target_tokens - least(target_tokens, (n_tokens * 1000000) // 1000000) AS BIGINT) AS deficit
        |FROM p""".stripMargin,
    // llm_pack_efficiency oracle: both batch orders as plain global
    // row_numbers (what the two-level decomposition must equal), then
    // the per-batch padding rollup and the one-row-per-strategy summary
    "llm_pack_efficiency" ->
      """WITH d AS (SELECT doc_id AS id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |rn AS (SELECT id, n_tokens,
        |    row_number() OVER (ORDER BY id) AS rn_naive,
        |    row_number() OVER (ORDER BY n_tokens, id) AS rn_sorted FROM d),
        |bn AS (SELECT (rn_naive - 1) // 16 AS b, count(*) AS rows_, max(n_tokens) AS mx, sum(n_tokens) AS tok FROM rn GROUP BY 1),
        |bs AS (SELECT (rn_sorted - 1) // 16 AS b, count(*) AS rows_, max(n_tokens) AS mx, sum(n_tokens) AS tok FROM rn GROUP BY 1),
        |an AS (SELECT CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(tok) AS BIGINT) AS total_tokens,
        |    CAST(sum(rows_ * mx) AS BIGINT) AS padded_tokens FROM bn),
        |asx AS (SELECT CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(tok) AS BIGINT) AS total_tokens,
        |    CAST(sum(rows_ * mx) AS BIGINT) AS padded_tokens FROM bs)
        |SELECT 'naive' AS strategy, n_batches, total_tokens, padded_tokens,
        |  padded_tokens - total_tokens AS waste,
        |  CASE WHEN padded_tokens = 0 THEN 0.0
        |       ELSE CAST(padded_tokens - total_tokens AS DOUBLE) / padded_tokens END AS waste_frac FROM an
        |UNION ALL
        |SELECT 'sorted' AS strategy, n_batches, total_tokens, padded_tokens,
        |  padded_tokens - total_tokens AS waste,
        |  CASE WHEN padded_tokens = 0 THEN 0.0
        |       ELSE CAST(padded_tokens - total_tokens AS DOUBLE) / padded_tokens END AS waste_frac FROM asx""".stripMargin,
    // llm_compaction_plan oracle: the same listing, the same fill rule,
    // as ONE global window cumsum (DuckDB's single node replays what the
    // two-level bucket decomposition must equal exactly)
    "llm_compaction_plan" ->
      """WITH f AS (SELECT CAST(substr(source, 4) AS BIGINT) * 1000 + doc_id // 100 AS fid,
        |    CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1),
        |c AS (SELECT fid, bytes,
        |    CAST(sum(bytes) OVER (ORDER BY fid ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes
        |  FROM f)
        |SELECT fid, bytes, cum_bytes, (cum_bytes - bytes) // 4096 AS bin FROM c""".stripMargin,
    // llm_scd2_build oracle: identical lag-collapse + lead/row_number
    // windows (event_id tie-break carried through both).
    "llm_scd2_build" ->
      """WITH e AS (SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id FROM events),
        |l AS (SELECT user_id, state, ts_us, event_id,
        |    lag(state) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_state
        |  FROM e),
        |ch AS (SELECT user_id, state, ts_us, event_id FROM l
        |  WHERE state IS DISTINCT FROM prev_state)
        |SELECT user_id, state, ts_us AS valid_from,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS version_n
        |FROM ch""".stripMargin,
    // llm_interval_merge oracle: running-max island detection over the
    // same per-user 30-minute spans.
    "llm_interval_merge" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS lo, epoch_us(ts) + 1800000000 AS hi FROM events),
        |o AS (SELECT user_id, lo, hi,
        |    max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev_hi
        |  FROM iv),
        |f AS (SELECT user_id, lo, hi,
        |    CASE WHEN max_prev_hi IS NULL OR lo > max_prev_hi THEN 1 ELSE 0 END AS new_island
        |  FROM o),
        |g AS (SELECT user_id, lo, hi,
        |    sum(new_island) OVER (PARTITION BY user_id ORDER BY lo, hi
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM f)
        |SELECT user_id, CAST(island AS BIGINT) AS island, min(lo) AS lo, max(hi) AS hi,
        |  CAST(count(*) AS BIGINT) AS n_merged
        |FROM g GROUP BY user_id, island""".stripMargin,
    // llm_token_budget oracle: one GLOBAL running sum in hash order —
    // the engine's bucket decomposition must reproduce it exactly
    // (bucket = hh >> 50 is monotonic in hh, so per-bucket order
    // concatenates to this global order)
    "llm_token_budget" ->
      """WITH h AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY hh, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM h)
        |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens, cum - n_tokens < 10000 AS keep FROM c""".stripMargin,
    // llm_word_dropout oracle: same md5 position gate, string_agg skips
    // the dropped (NULL) words exactly as concat_ws does
    "llm_word_dropout" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |tk AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |    generate_subscripts(ws, 1) - 1 AS wpos, unnest(ws) AS word FROM w),
        |k AS (SELECT doc_id, n_words, wpos, word,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ep1:' || CAST(wpos AS VARCHAR)), 1, 15)) AS BIGINT) % 100 >= 15 AS keep
        |  FROM tk)
        |SELECT doc_id, n_words,
        |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(CASE WHEN keep THEN word END, ' ' ORDER BY wpos), '') AS augmented_text
        |FROM k GROUP BY doc_id, n_words""".stripMargin,
    "llm_text_normalize" ->
      """WITH s AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN '  visit   https://example.com/page' || CAST(doc_id % 50 AS VARCHAR) || '?ref=rss  now' ELSE '' END ||
        |    CASE WHEN doc_id % 9 = 0 THEN chr(9) || 'tabbed' || chr(13) || 'tail' ELSE '' END AS t2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
        |  trim(regexp_replace(regexp_replace(regexp_replace(t2,
        |    'https?://[^ ]+', '<URL>', 'g'), '[\t\r]', ' ', 'g'), ' {2,}', ' ', 'g')) AS normalized_text
        |FROM s""".stripMargin,
    // llm_span_scrub oracle: span_dedup gram chain + first-occurrence
    // canonicalization, coverage expansion, per-doc text rebuild
    "llm_span_scrub" ->
      s"""WITH s AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0 THEN ' the quick brown fox jumps over the lazy dog again' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' all rights reserved this document is provided without any warranty' ELSE '' END AS t2
        |  FROM documents),
        |w AS (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM s),
        |wh AS (SELECT doc_id, list_transform(ws, x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS wh FROM w),
        |pw AS (SELECT [${plans.RollingGrams.powTable(plans.RollingGrams.B1, 8, plans.RollingGrams.P1).mkString(", ")}] AS pw1,
        |    [${plans.RollingGrams.powTable(plans.RollingGrams.B2, 8, plans.RollingGrams.P2).mkString(", ")}] AS pw2),
        |gl AS (SELECT doc_id, CASE WHEN len(wh) < 8 THEN CAST([] AS BIGINT[])
        |  ELSE list_transform(generate_series(1, len(wh)-7), i ->
        |    (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P1}) * pw1[j+1]) % ${plans.RollingGrams.P1})) % ${plans.RollingGrams.P1}) * ${plans.RollingGrams.P2}
        |  + (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P2}) * pw2[j+1]) % ${plans.RollingGrams.P2})) % ${plans.RollingGrams.P2})) END AS gs
        |  FROM wh CROSS JOIN pw),
        |g AS (SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS h FROM gl),
        |dupg AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |occ AS (SELECT doc_id, pos, h FROM g SEMI JOIN dupg USING (h)),
        |rkd AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn FROM occ),
        |removed AS (SELECT doc_id, pos FROM rkd WHERE rn > 1),
        |covered AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS wpos FROM removed),
        |wordpos AS (SELECT doc_id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS word FROM w),
        |kept AS (SELECT wordpos.doc_id, CAST(count(*) AS BIGINT) AS nk,
        |    array_to_string(list(word ORDER BY wpos), ' ') AS cleaned
        |  FROM wordpos ANTI JOIN covered USING (doc_id, wpos) GROUP BY wordpos.doc_id),
        |nw AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words FROM w)
        |SELECT nw.doc_id, nw.n_words,
        |  nw.n_words - coalesce(kept.nk, 0) AS n_removed_words,
        |  coalesce(kept.cleaned, '') AS cleaned_text
        |FROM nw LEFT JOIN kept ON nw.doc_id = kept.doc_id""".stripMargin,
    "llm_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id AS id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |tok2 AS (SELECT id, word FROM tok WHERE len(word) > 0),
        |tf AS (SELECT id, word, CAST(count(*) AS BIGINT) AS tf FROM tok2 GROUP BY id, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT id, word FROM tok2) GROUP BY word),
        |n AS (SELECT count(*) AS nn FROM documents),
        |sc AS (SELECT id, word, tf, df, CAST(tf * nn AS DOUBLE) / df AS score
        |  FROM tf JOIN dfq USING (word) CROSS JOIN n),
        |r AS (SELECT id, word, tf, df, score,
        |    row_number() OVER (PARTITION BY id ORDER BY score DESC, word ASC) AS rank FROM sc)
        |SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank, word, tf, df, score
        |FROM r WHERE rank <= 3""".stripMargin,
    // llm_pq_encode oracle: BOTH subspace codebooks replayed in one CTE
    // chain over a `sub` dimension (training math is independent per
    // subspace, so partitioned training ≡ separate trainings), then the
    // code join and exact reconstruction cosine
    "llm_pq_encode" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1)
        |SELECT p.vec_id, p.code0, p.code1,
        |  CAST(p.dp AS DOUBLE) / (sqrt(CAST(fn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS recon_cos
        |FROM p JOIN fn ON p.vec_id = fn.vec_id""".stripMargin,
    // llm_index_update oracle: the pq_encode chain with training
    // restricted to the BASE corpus (vec_id % 7 <> 0, seeds likewise) and
    // the final encode restricted to the NEW batch (vec_id % 7 = 0) — the
    // out-of-sample encode the standing-index update runs
    // llm_sq_update oracle: bounds trained over the base slice only
    // (vec_id % 7 <> 0), the held-out batch encoded against them with
    // saturation — greatest/least clamp makes the floor-vs-truncate
    // division difference moot on out-of-range values (both land <= 0
    // or >= 255 before the clamp)
    "llm_sq_update" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) - 1 AS j FROM e WHERE vec_id % 7 <> 0),
        |b AS (SELECT j, min(v) AS mn, max(v) AS mx FROM u GROUP BY 1),
        |t AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) - 1 AS j FROM e WHERE vec_id % 7 = 0)
        |SELECT t.vec_id, CAST(t.j AS BIGINT) AS pos,
        |  CAST(CASE WHEN b.mx = b.mn THEN 0
        |       ELSE greatest(0, least(255, ((t.v - b.mn) * 255) // (b.mx - b.mn)))
        |  END AS BIGINT) AS code
        |FROM t JOIN b ON b.j = t.j""".stripMargin,
    // llm_importance_weights oracle: the full DSIR-style pipeline
    // re-derived relationally — md5-bucket census, Laplace-smoothed
    // bit-resolution llr (length(bin(n)) - 1 = floor log2, identical in
    // both engines), per-doc summed weight
    "llm_importance_weights" ->
      (importanceSqlCtes + """
        |SELECT g.doc_id, CAST(sum(g.c) AS BIGINT) AS n_tokens,
        |  CAST(sum(g.c * llr.llr) AS BIGINT) AS imp_bits
        |FROM g JOIN llr ON llr.b = g.b GROUP BY 1""".stripMargin),
    // llm_importance_bigram oracle: the unigram chain PLUS adjacent-pair
    // bigrams over the filtered token sequence (lead() per doc), then the
    // same census → smoothed bit-resolution llr → per-doc fold
    "llm_importance_bigram" ->
      """WITH t0 AS (SELECT doc_id, lang = 'en' AS tgt,
        |    list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS ws FROM documents),
        |tk AS (SELECT doc_id, tgt, unnest(ws) AS w, generate_subscripts(ws, 1) AS p FROM t0),
        |bg AS (SELECT doc_id, tgt,
        |    w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w FROM tk),
        |feat AS (SELECT doc_id, tgt, w FROM tk
        |  UNION ALL SELECT doc_id, tgt, w FROM bg WHERE w IS NOT NULL),
        |g AS (SELECT doc_id, tgt, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 1024 AS b, count(*) AS c
        |      FROM feat GROUP BY 1, 2, 3),
        |cen AS (SELECT b, sum(CASE WHEN tgt THEN c ELSE 0 END) AS tgt_c,
        |               sum(CASE WHEN tgt THEN 0 ELSE c END) AS raw_c
        |        FROM g GROUP BY 1),
        |tot AS (SELECT sum(tgt_c) AS rt, sum(raw_c) AS rr FROM cen),
        |llr AS (SELECT b,
        |    (length(bin(CAST((tgt_c + 1) * (rr + 1024) AS BIGINT))) - 1)
        |  - (length(bin(CAST((raw_c + 1) * (rt + 1024) AS BIGINT))) - 1) AS llr
        |  FROM cen CROSS JOIN tot)
        |SELECT g.doc_id, CAST(sum(g.c) AS BIGINT) AS n_tokens,
        |  CAST(sum(g.c * llr.llr) AS BIGINT) AS imp_bits
        |FROM g JOIN llr ON llr.b = g.b GROUP BY 1""".stripMargin,
    // llm_importance_cut oracle: the importance pipeline + the k-th
    // largest threshold law (cum >= ceil(n*pct/100) over the desc
    // cumulative histogram — same chain as llm_quality_cut)
    "llm_importance_cut" ->
      (importanceSqlCtes + """,
        |s AS (SELECT g.doc_id, CAST(sum(g.c * llr.llr) * 1000000 AS BIGINT) AS score_micro
        |  FROM g JOIN llr ON llr.b = g.b GROUP BY 1),
        |h AS (SELECT score_micro, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY score_micro),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |cum AS (SELECT score_micro, sum(c) OVER (ORDER BY score_micro DESC ROWS UNBOUNDED PRECEDING) AS cum FROM h),
        |th AS (SELECT max(score_micro) AS threshold FROM cum CROSS JOIN n WHERE cum >= (n * 10 + 99) // 100)
        |SELECT doc_id, score_micro, threshold, score_micro >= threshold AS keep
        |FROM s CROSS JOIN th""".stripMargin),
    "llm_index_update" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |base AS (SELECT * FROM en WHERE vec_id % 7 <> 0),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM base WHERE vec_id % 25 = 0),
        |a1 AS (SELECT base.vec_id, base.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM base JOIN cent0 ON base.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM base JOIN asg1 ON base.vec_id = asg1.nid AND base.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT base.vec_id, base.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM base JOIN cent1n ON base.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM base JOIN asg2 ON base.vec_id = asg2.nid AND base.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub WHERE en.vec_id % 7 = 0),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1)
        |SELECT p.vec_id, p.code0, p.code1,
        |  CAST(p.dp AS DOUBLE) / (sqrt(CAST(fn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS recon_cos
        |FROM p JOIN fn ON p.vec_id = fn.vec_id""".stripMargin,
    // llm_hard_negatives oracle: semantic-dedup chain (training + pair
    // closure) + brute top-10 + clustermate exclusion + re-rank
    "llm_hard_negatives" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |mem AS (SELECT en.vec_id AS nid, vq, norm2, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |pr AS (SELECT a.nid AS id_a, b.nid AS id_b
        |  FROM mem a JOIN mem b ON a.cell = b.cell AND a.nid < b.nid
        |  WHERE CAST(CAST(list_sum(list_transform(generate_series(1, len(a.vq)), i -> a.vq[i] * b.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) >= 0.35),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pr UNION SELECT id_b, id_a FROM pr),
        |reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT eg.u, reach.r FROM edges eg JOIN reach ON reach.id = eg.v),
        |comp AS (SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bsc AS (SELECT bq.qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> bq.qid),
        |top10 AS (SELECT qid, nid, cos FROM (SELECT qid, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r FROM bsc) WHERE r <= 10),
        |neg AS (SELECT t.qid, t.nid, t.cos FROM top10 t
        |  JOIN comp cq ON cq.vec_id = t.qid JOIN comp cn ON cn.vec_id = t.nid
        |  WHERE cq.cluster_id <> cn.cluster_id),
        |rk AS (SELECT qid, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS neg_rank FROM neg)
        |SELECT qid, CAST(neg_rank AS BIGINT) AS neg_rank, nid, cos FROM rk WHERE neg_rank <= 3""".stripMargin,
    // llm_ann_index_build oracle: replay BOTH trainings — the
    // full-vector coarse k-means (cent2 = distinct populated cells after
    // iteration 2) and the two subspace codebooks (scent2) — and
    // re-derive the persisted component row counts
    // llm_sq_index oracle: component row counts of the persisted SQ8
    // artifacts — the collapsed bounds frame is one row by construction,
    // the code table is one row per corpus vector (the deep per-code
    // check is llm_sq_encode; the probe checks are llm_sq_search /
    // llm_ivf_sq_search, which read THIS loaded index)
    "llm_sq_index" ->
      """SELECT 'bounds' AS component, CAST(1 AS BIGINT) AS n_rows
        |UNION ALL
        |SELECT 'codes' AS component, CAST(count(*) AS BIGINT) AS n_rows
        |FROM embeddings""".stripMargin,
    "llm_ann_index_build" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |cent2 AS (SELECT cell FROM asg2 GROUP BY cell),
        |hv AS (SELECT vec_id, 0 AS sub, vq[1:len(vq)//2] AS svq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, vq[len(vq)//2+1:len(vq)] AS svq FROM e),
        |sen AS (SELECT vec_id, sub, svq, CAST(list_sum(list_transform(svq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |scent0 AS (SELECT sub, vec_id AS cid, svq AS cv, norm2 AS cn FROM sen WHERE vec_id % 25 = 0),
        |sa1 AS (SELECT sen.vec_id, sen.sub, scent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(svq)), i -> svq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(sen.norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM sen JOIN scent0 ON sen.sub = scent0.sub),
        |sr1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM sa1),
        |sasg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM sr1 WHERE rn = 1),
        |su1 AS (SELECT sasg1.sub, sasg1.cell, unnest(svq) AS v, generate_subscripts(svq, 1) AS d
        |  FROM sen JOIN sasg1 ON sen.vec_id = sasg1.nid AND sen.sub = sasg1.sub),
        |sm1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM su1 GROUP BY sub, cell, d),
        |scent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM sm1 GROUP BY sub, cell),
        |scent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM scent1),
        |sa2 AS (SELECT sen.vec_id, sen.sub, scent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(svq)), i -> svq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(sen.norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM sen JOIN scent1n ON sen.sub = scent1n.sub),
        |sr2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM sa2),
        |sasg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM sr2 WHERE rn = 1),
        |scent2 AS (SELECT sub, cell FROM sasg2 GROUP BY sub, cell)
        |SELECT 'book0' AS component, CAST((SELECT count(*) FROM scent2 WHERE sub = 0) AS BIGINT) AS n_rows
        |UNION ALL SELECT 'book1', CAST((SELECT count(*) FROM scent2 WHERE sub = 1) AS BIGINT)
        |UNION ALL SELECT 'cells', CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |UNION ALL SELECT 'coarse', CAST((SELECT count(*) FROM cent2) AS BIGINT)
        |UNION ALL SELECT 'codes', CAST((SELECT count(*) FROM embeddings) AS BIGINT)""".stripMargin,
    // llm_ivf_stats oracle: the full-vector k-means training replay
    // (same chain as llm_hard_negatives) + a per-cell count
    "llm_ivf_stats" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |cnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors FROM cells GROUP BY cell)
        |SELECT cell, n_vectors FROM cnt""".stripMargin,
    // llm_index_drift oracle: all four frozen-artifact drift metrics in
    // one chain — the llm_ivf_stats k-means replay (cells) + the shifted
    // batch (vq → 3·vq + 41, vec_id % 7 = 0) assigned against the SAME
    // frozen centroids for the occupancy/TV rows; full-corpus SQ bounds
    // + clamped codes for base/batch saturation (the llm_sq_update
    // encode); the llm_pq_encode codebook chain with base AND batch
    // encodes folded to floored micro-cosine integer means (// is floor
    // division — the engine matches with (a − pmod) div b); and the
    // document vocabulary vs reversed-token batch for the OOV rate.
    "llm_index_drift" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |bsh AS (SELECT cell, CAST(count(*) * 10000 // (SELECT count(*) FROM cells) AS BIGINT) AS bp FROM cells GROUP BY cell),
        |batn AS (SELECT vec_id, list_transform(vq, v -> v * 3 + 41) AS vq FROM e WHERE vec_id % 7 = 0),
        |bat AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM batn),
        |bas AS (SELECT bat.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM bat CROSS JOIN cent),
        |brk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM bas),
        |bcell AS (SELECT vec_id AS nid, cid AS cell FROM brk WHERE rn = 1),
        |tsh AS (SELECT cell, CAST(count(*) * 10000 // (SELECT count(*) FROM bcell) AS BIGINT) AS bp FROM bcell GROUP BY cell),
        |occ AS (SELECT coalesce(b.cell, s.cell) AS cell, coalesce(b.bp, 0) AS bp_base, coalesce(s.bp, 0) AS bp_batch
        |  FROM bsh b FULL OUTER JOIN tsh s ON b.cell = s.cell),
        |squ AS (SELECT unnest(vq) AS v, generate_subscripts(vq, 1) - 1 AS j FROM e),
        |sqb AS (SELECT j, min(v) AS mn, max(v) AS mx FROM squ GROUP BY 1),
        |sqbase AS (SELECT CASE WHEN mx = mn THEN 0 ELSE greatest(0, least(255, ((v - mn) * 255) // (mx - mn))) END AS code FROM squ JOIN sqb USING (j)),
        |sqt AS (SELECT unnest(vq) AS v, generate_subscripts(vq, 1) - 1 AS j FROM batn),
        |sqbatc AS (SELECT CASE WHEN mx = mn THEN 0 ELSE greatest(0, least(255, ((v - mn) * 255) // (mx - mn))) END AS code FROM sqt JOIN sqb USING (j)),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, vq[1:len(vq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, vq[len(vq)//2+1:len(vq)] AS vq FROM e),
        |pen AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |pc0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM pen WHERE vec_id % 25 = 0),
        |pa1 AS (SELECT pen.vec_id, pen.sub, pc0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM pen JOIN pc0 ON pen.sub = pc0.sub),
        |pr1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM pa1),
        |pg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM pr1 WHERE rn = 1),
        |pu1 AS (SELECT pg1.sub, pg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM pen JOIN pg1 ON pen.vec_id = pg1.nid AND pen.sub = pg1.sub),
        |pm1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM pu1 GROUP BY sub, cell, d),
        |pc1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM pm1 GROUP BY sub, cell),
        |pc1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM pc1),
        |pa2 AS (SELECT pen.vec_id, pen.sub, pc1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM pen JOIN pc1n ON pen.sub = pc1n.sub),
        |pr2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM pa2),
        |pg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM pr2 WHERE rn = 1),
        |pu2 AS (SELECT pg2.sub, pg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM pen JOIN pg2 ON pen.vec_id = pg2.nid AND pen.sub = pg2.sub),
        |pm2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM pu2 GROUP BY sub, cell, d),
        |pc2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM pm2 GROUP BY sub, cell),
        |pcent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM pc2),
        |paf AS (SELECT pen.vec_id, pen.sub, pcent.cid, pcent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM pen JOIN pcent ON pen.sub = pcent.sub),
        |prf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM paf),
        |psel AS (SELECT vec_id, sub, cid, cn, dpv FROM prf WHERE rn = 1),
        |pp AS (SELECT s0.vec_id, s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM psel s0 JOIN psel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |pqb AS (SELECT CAST(floor((CAST(pp.dp AS DOUBLE) / (sqrt(CAST(fn.fnorm AS DOUBLE)) * sqrt(CAST(pp.cnsum AS DOUBLE)))) * 1000000.0) AS BIGINT) AS m
        |  FROM pp JOIN fn ON pp.vec_id = fn.vec_id),
        |bhv AS (SELECT vec_id, 0 AS sub, vq[1:len(vq)//2] AS vq FROM batn
        |  UNION ALL SELECT vec_id, 1 AS sub, vq[len(vq)//2+1:len(vq)] AS vq FROM batn),
        |bpen AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM bhv),
        |baf AS (SELECT bpen.vec_id, bpen.sub, pcent.cid, pcent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM bpen JOIN pcent ON bpen.sub = pcent.sub),
        |brf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM baf),
        |bsel AS (SELECT vec_id, sub, cid, cn, dpv FROM brf WHERE rn = 1),
        |bpp AS (SELECT s0.vec_id, s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM bsel s0 JOIN bsel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |pqt AS (SELECT CAST(floor((CAST(bpp.dp AS DOUBLE) / (sqrt(CAST(bat.norm2 AS DOUBLE)) * sqrt(CAST(bpp.cnsum AS DOUBLE)))) * 1000000.0) AS BIGINT) AS m
        |  FROM bpp JOIN bat ON bpp.vec_id = bat.vec_id),
        |vocab AS (SELECT DISTINCT w FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), w -> len(w) > 0)) AS w FROM documents)),
        |bt AS (SELECT unnest(list_transform(list_filter(string_split(lower(text), ' '), w -> len(w) > 0), w -> reverse(w))) AS w FROM documents WHERE doc_id % 53 = 0),
        |oov AS (SELECT count(*) AS t, sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS o FROM bt LEFT JOIN vocab v ON bt.w = v.w)
        |SELECT 'ivf_cell_bp_base' AS metric, CAST(cell AS BIGINT) AS key, CAST(bp_base AS BIGINT) AS value FROM occ
        |UNION ALL SELECT 'ivf_cell_bp_batch', CAST(cell AS BIGINT), CAST(bp_batch AS BIGINT) FROM occ
        |UNION ALL SELECT 'ivf_tv_bp', CAST(-1 AS BIGINT), CAST(sum(abs(bp_batch - bp_base)) AS BIGINT) FROM occ
        |UNION ALL SELECT 'sq_sat_bp_base', CAST(-1 AS BIGINT), CAST(sum(CASE WHEN code IN (0, 255) THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) FROM sqbase
        |UNION ALL SELECT 'sq_sat_bp_batch', CAST(-1 AS BIGINT), CAST(sum(CASE WHEN code IN (0, 255) THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) FROM sqbatc
        |UNION ALL SELECT 'pq_recon_micro_base', CAST(-1 AS BIGINT), CAST(sum(m) // count(*) AS BIGINT) FROM pqb
        |UNION ALL SELECT 'pq_recon_micro_batch', CAST(-1 AS BIGINT), CAST(sum(m) // count(*) AS BIGINT) FROM pqt
        |UNION ALL SELECT 'bm25_oov_bp', CAST(-1 AS BIGINT), CAST(CASE WHEN t = 0 THEN 0 ELSE o * 10000 // t END AS BIGINT) FROM oov""".stripMargin,
    // llm_pq_search oracle: the pq_encode chain (codebooks + codes)
    // extended with query-side LUTs and ADC ranking
    "llm_pq_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |qh AS (SELECT vec_id AS qid, sub, vq FROM en WHERE vec_id % 50 = 0),
        |lut AS (SELECT qh.qid, qh.sub, cent.cid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qh.vq)), i -> qh.vq[i] * cent.cv[i])) AS BIGINT) AS ld
        |  FROM qh JOIN cent ON qh.sub = cent.sub),
        |qn AS (SELECT vec_id AS qid, fnorm FROM fn WHERE vec_id % 50 = 0),
        |sc AS (SELECT l0.qid, p.vec_id AS nid,
        |    CAST(l0.ld + l1.ld AS DOUBLE) / (sqrt(CAST(qn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS approx_cos
        |  FROM p JOIN lut l0 ON l0.sub = 0 AND l0.cid = p.code0
        |       JOIN lut l1 ON l1.sub = 1 AND l1.cid = p.code1 AND l1.qid = l0.qid
        |       JOIN qn ON qn.qid = l0.qid
        |  WHERE p.vec_id <> l0.qid),
        |rk AS (SELECT qid, nid, approx_cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY approx_cos DESC, nid ASC) AS rank FROM sc)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, approx_cos FROM rk WHERE rank <= 3""".stripMargin,
    // llm_pq_recall oracle: pq_search chain + brute truth + exact
    // hit-set intersection counting
    "llm_pq_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |qh AS (SELECT vec_id AS qid, sub, vq FROM en WHERE vec_id % 50 = 0),
        |lut AS (SELECT qh.qid, qh.sub, cent.cid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qh.vq)), i -> qh.vq[i] * cent.cv[i])) AS BIGINT) AS ld
        |  FROM qh JOIN cent ON qh.sub = cent.sub),
        |qn AS (SELECT vec_id AS qid, fnorm FROM fn WHERE vec_id % 50 = 0),
        |sc AS (SELECT l0.qid, p.vec_id AS nid,
        |    CAST(l0.ld + l1.ld AS DOUBLE) / (sqrt(CAST(qn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS approx_cos
        |  FROM p JOIN lut l0 ON l0.sub = 0 AND l0.cid = p.code0
        |       JOIN lut l1 ON l1.sub = 1 AND l1.cid = p.code1 AND l1.qid = l0.qid
        |       JOIN qn ON qn.qid = l0.qid
        |  WHERE p.vec_id <> l0.qid),
        |rk AS (SELECT qid, nid, approx_cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY approx_cos DESC, nid ASC) AS rank FROM sc),
        |bq AS (SELECT vec_id AS qid, fq AS qv, fnorm AS qn FROM e JOIN fn USING (vec_id) WHERE vec_id % 50 = 0),
        |bsc AS (SELECT bq.qid, e.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * e.fq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(fn.fnorm AS DOUBLE))) AS cos
        |  FROM e JOIN fn USING (vec_id) CROSS JOIN bq WHERE e.vec_id <> bq.qid),
        |btr AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r FROM bsc) WHERE r <= 3),
        |ph AS (SELECT qid, nid FROM rk WHERE rank <= 3),
        |h AS (SELECT count(*) AS c FROM btr SEMI JOIN ph USING (qid, nid)),
        |tt AS (SELECT count(*) AS c FROM btr)
        |SELECT 'pq_adc' AS path, CAST(h.c AS BIGINT) AS n_hits, CAST(tt.c AS BIGINT) AS n_truth,
        |  CAST(h.c AS DOUBLE) / tt.c AS recall FROM h, tt""".stripMargin,
    // llm_ivfpq_search oracle: ONE training chain over sub∈{0,1,2} —
    // subs 0/1 are the PQ codebooks, sub 2 the full-vector coarse
    // quantizer (partitioned training ≡ separate trainings) — then
    // cell-restricted ADC ranking
    "llm_ivfpq_search" -> ivfPqSearchSql,
    // llm_ann_delete oracle: the SAME training chain (the frozen
    // quantizers were trained on the full corpus, deletes don't retrain)
    // with the scored candidate set filtered to the survivors — the one
    // predicate is spliced into the sc CTE's WHERE
    "llm_ann_delete" -> {
      val spliced = ivfPqSearchSql.replace(
        "WHERE p.vec_id <> probes.qid",
        "WHERE p.vec_id <> probes.qid AND p.vec_id % 9 <> 0")
      // a refactor of the shared chain that renames the anchor would
      // make the replace a silent no-op and the oracle would score
      // deleted vectors — fail loudly instead
      require(spliced != ivfPqSearchSql,
        "llm_ann_delete splice anchor not found in ivfPqSearchSql")
      spliced
    },
    // llm_ivf_pruned_probe oracle: the probe is a partition-pruned READ of
    // the cell-partitioned code layout, and by construction returns exactly
    // the join-based IVF-PQ rows — so the oracle IS ivfPqSearchSql
    "llm_ivf_pruned_probe" -> ivfPqSearchSql,
    // llm_ivfpq_recall oracle: the ivfpq_search chain (training + cell-
    // restricted ADC ranking) extended with the ADC top-20 shortlist →
    // exact full-vector re-rank, brute truth, and hit-set counting for
    // both paths
    "llm_ivfpq_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e
        |  UNION ALL SELECT vec_id, 2 AS sub, fq AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |cellsc AS (SELECT vec_id, cid AS cell FROM sel WHERE sub = 2),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM rf WHERE sub = 2 AND vec_id % 50 = 0 AND rn <= 2),
        |qh AS (SELECT vec_id AS qid, sub, vq FROM en WHERE sub < 2 AND vec_id % 50 = 0),
        |lut AS (SELECT qh.qid, qh.sub, cent.cid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qh.vq)), i -> qh.vq[i] * cent.cv[i])) AS BIGINT) AS ld
        |  FROM qh JOIN cent ON qh.sub = cent.sub),
        |qn AS (SELECT vec_id AS qid, fnorm FROM fn WHERE vec_id % 50 = 0),
        |sc AS (SELECT probes.qid, p.vec_id AS nid,
        |    CAST(l0.ld + l1.ld AS DOUBLE) / (sqrt(CAST(qn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS approx_cos
        |  FROM p JOIN cellsc ON cellsc.vec_id = p.vec_id
        |       JOIN probes ON probes.cell = cellsc.cell
        |       JOIN lut l0 ON l0.sub = 0 AND l0.qid = probes.qid AND l0.cid = p.code0
        |       JOIN lut l1 ON l1.sub = 1 AND l1.qid = probes.qid AND l1.cid = p.code1
        |       JOIN qn ON qn.qid = probes.qid
        |  WHERE p.vec_id <> probes.qid),
        |rk AS (SELECT qid, nid, approx_cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY approx_cos DESC, nid ASC) AS rank FROM sc),
        |shortl AS (SELECT qid, nid FROM rk WHERE rank <= 20),
        |rrsc AS (SELECT s.qid, s.nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(eq.fq)), i -> eq.fq[i] * ec.fq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(fq2.fnorm AS DOUBLE)) * sqrt(CAST(fc2.fnorm AS DOUBLE))) AS cos
        |  FROM shortl s JOIN e eq ON eq.vec_id = s.qid JOIN e ec ON ec.vec_id = s.nid
        |    JOIN fn fq2 ON fq2.vec_id = s.qid JOIN fn fc2 ON fc2.vec_id = s.nid),
        |rr3 AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r FROM rrsc) WHERE r <= 3),
        |adc3 AS (SELECT qid, nid FROM rk WHERE rank <= 3),
        |bq AS (SELECT vec_id AS qid, fq AS qv, fnorm AS qn FROM e JOIN fn USING (vec_id) WHERE vec_id % 50 = 0),
        |bsc AS (SELECT bq.qid, e.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * e.fq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(fn.fnorm AS DOUBLE))) AS cos
        |  FROM e JOIN fn USING (vec_id) CROSS JOIN bq WHERE e.vec_id <> bq.qid),
        |btr AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r FROM bsc) WHERE r <= 3),
        |h1 AS (SELECT count(*) AS c FROM btr SEMI JOIN adc3 USING (qid, nid)),
        |h2 AS (SELECT count(*) AS c FROM btr SEMI JOIN rr3 USING (qid, nid)),
        |tt AS (SELECT count(*) AS c FROM btr)
        |SELECT 'ivfpq_adc' AS path, CAST(h1.c AS BIGINT) AS n_hits, CAST(tt.c AS BIGINT) AS n_truth,
        |  CAST(h1.c AS DOUBLE) / tt.c AS recall FROM h1, tt
        |UNION ALL
        |SELECT 'ivfpq_rerank' AS path, CAST(h2.c AS BIGINT) AS n_hits, CAST(tt.c AS BIGINT) AS n_truth,
        |  CAST(h2.c AS DOUBLE) / tt.c AS recall FROM h2, tt""".stripMargin,
    "llm_bpe_pairs" ->
      """WITH wf AS (SELECT word, count(*) AS wc FROM
        |  (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE len(word) > 1 GROUP BY word),
        |pr AS (SELECT unnest(list_transform(generate_series(1, len(word) - 1),
        |    i -> substr(word, i, 2))) AS pair, wc FROM wf),
        |agg AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences FROM pr GROUP BY pair)
        |SELECT pair, n_occurrences FROM agg
        |ORDER BY n_occurrences DESC, pair ASC LIMIT 32""".stripMargin,
    // llm_source_overlap oracle: independent re-derivation of the banded
    // MinHash pair pipeline (same CTE chain as llm_dedup_clusters), then
    // the doc→source join and canonicalized pair counting
    "llm_source_overlap" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |ps AS (SELECT least(da.source, db.source) AS source_a,
        |    greatest(da.source, db.source) AS source_b
        |  FROM pairs p JOIN documents da ON p.id_a = da.doc_id
        |    JOIN documents db ON p.id_b = db.doc_id)
        |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM ps GROUP BY source_a, source_b""".stripMargin,
    // llm_stream_dedup oracle: the streaming min-fold must equal plain
    // min(id) per content hash over the salted union
    "llm_stream_dedup" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 3),
        |k AS (SELECT CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS content_hash,
        |    doc_id FROM all_docs)
        |SELECT content_hash, CAST(min(doc_id) AS BIGINT) AS first_doc_id
        |FROM k GROUP BY content_hash""".stripMargin,
    "llm_corpus_profile" ->
      """WITH t2 AS (SELECT source, doc_id, string_split(lower(text), ' ') AS ws,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM t2 GROUP BY source),
        |hist AS (SELECT source, n_tokens, count(*) AS c FROM t2 GROUP BY source, n_tokens),
        |cum AS (SELECT source, n_tokens,
        |    sum(c) OVER (PARTITION BY source ORDER BY n_tokens) AS cum FROM hist),
        |j AS (SELECT cum.source, cum.n_tokens, cum.cum, cnt.n_docs FROM cum JOIN cnt USING (source)),
        |p AS (SELECT source,
        |    min(CASE WHEN cum >= (n_docs - 1) * 5000 // 10000 + 1 THEN n_tokens END) AS p50_tokens,
        |    min(CASE WHEN cum >= (n_docs - 1) * 9000 // 10000 + 1 THEN n_tokens END) AS p90_tokens,
        |    min(CASE WHEN cum >= (n_docs - 1) * 9900 // 10000 + 1 THEN n_tokens END) AS p99_tokens
        |  FROM j GROUP BY source),
        |v AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab_size FROM
        |  (SELECT DISTINCT source, unnest(ws) AS w FROM t2) WHERE len(w) > 0 GROUP BY source)
        |SELECT cnt.source, cnt.n_docs, cnt.total_tokens,
        |  CAST(cnt.total_tokens AS DOUBLE) / cnt.n_docs AS mean_tokens,
        |  p.p50_tokens, p.p90_tokens, p.p99_tokens, v.vocab_size
        |FROM cnt JOIN p USING (source) JOIN v USING (source)""".stripMargin,
    "llm_curriculum_plan" ->
      """WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents),
        |q AS (SELECT doc_id,
        |    least(CAST(9 AS BIGINT), CAST(floor(((CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |          WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |     CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |               BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |     CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |    ) / 3.0) * 10) AS BIGINT)) AS q_bin,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(ws) AS BIGINT) AS n_tokens
        |  FROM w)
        |SELECT doc_id, hh % 8 AS shard, q_bin,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY q_bin DESC, hh, doc_id) AS BIGINT) AS seq,
        |  n_tokens
        |FROM q""".stripMargin,
    // llm_full_pipeline oracle: the ENTIRE curation chain recomputed —
    // URL canonicalize + public-suffix domain + per-domain cap (window
    // form) → salt → normalize → line dedup → rolling-gram span scrub →
    // Gopher gate → MinHash/LSH cluster closure (recursive CTE) →
    // eval-gram decontamination → token-share domain mix → curriculum
    // shard plan, each stage consuming the previous stage's text
    "llm_full_pipeline" ->
      s"""WITH RECURSIVE
        |u0 AS (SELECT doc_id,
        |    'HTTPS://' || CASE WHEN doc_id % 11 = 0
        |      THEN 'WWW.Site' || CAST(doc_id % 3 AS VARCHAR) || '.CO.UK'
        |      ELSE 'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM' END
        |    || '/Path' || CAST(doc_id AS VARCHAR) ||
        |    '?utm_source=feed&id=' || CAST(doc_id % 30 AS VARCHAR) || '&fbclid=xyz#frag' AS url
        |  FROM documents),
        |up AS (SELECT doc_id, url, regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0) AS pfx FROM u0),
        |uc1 AS (SELECT doc_id, lower(pfx) || substr(url, length(pfx) + 1) AS c FROM up),
        |uc2 AS (SELECT doc_id, regexp_replace(c, '#.*$$', '') AS c FROM uc1),
        |uc3 AS (SELECT doc_id, regexp_replace(c, '([?&])(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*', '\\1', 'g') AS c FROM uc2),
        |uc4 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(c, '&{2,}', '&', 'g'), '\\?&', '?'), '[?&]+$$', '') AS canon_url FROM uc3),
        |uhx AS (SELECT doc_id,
        |    regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
        |  FROM uc4),
        |ud AS (SELECT doc_id, hh,
        |    CASE WHEN regexp_extract(host, '[^.]+\\.[^.]+$$', 0) IN (${llm.TextOps.MultiLabelSuffixes.map(x => s"'$x'").mkString(", ")})
        |           AND regexp_extract(host, '[^.]+\\.[^.]+\\.[^.]+$$', 0) != ''
        |      THEN regexp_extract(host, '[^.]+\\.[^.]+\\.[^.]+$$', 0)
        |      ELSE regexp_extract(host, '[^.]+\\.[^.]+$$', 0) END AS domain
        |  FROM uhx),
        |ur AS (SELECT doc_id,
        |    row_number() OVER (PARTITION BY domain ORDER BY hh, doc_id) AS rn FROM ud),
        |keep0 AS (SELECT doc_id FROM ur WHERE rn <= 40),
        |s0 AS (SELECT doc_id, source, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN '  visit   https://example.com/page' || CAST(doc_id % 50 AS VARCHAR) || '?ref=rss  now' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' the quick brown fox jumps over the lazy dog again' ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END AS t0
        |  FROM documents SEMI JOIN keep0 USING (doc_id)),
        |n1 AS (SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(t0,
        |    'https?://[^ ]+', '<URL>', 'g'), '[\\t\\r]', ' ', 'g'), ' {2,}', ' ', 'g')) AS t1 FROM s0),
        |l AS (SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
        |  FROM (SELECT doc_id, string_split(t1, chr(10)) AS ls FROM n1)),
        |lb AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS nd FROM l GROUP BY line) WHERE nd >= 10),
        |lt AS (SELECT doc_id, pos, line, line IN (SELECT line FROM lb) AS isb FROM l),
        |t2d AS (SELECT doc_id, coalesce(string_agg(CASE WHEN isb THEN NULL ELSE line END, chr(10) ORDER BY pos), '') AS t2 FROM lt GROUP BY doc_id),
        |w3 AS (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM t2d),
        |wh3 AS (SELECT doc_id, list_transform(ws, x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS wh FROM w3),
        |pw AS (SELECT [${plans.RollingGrams.powTable(plans.RollingGrams.B1, 8, plans.RollingGrams.P1).mkString(", ")}] AS pw1,
        |    [${plans.RollingGrams.powTable(plans.RollingGrams.B2, 8, plans.RollingGrams.P2).mkString(", ")}] AS pw2),
        |gl AS (SELECT doc_id, CASE WHEN len(wh) < 8 THEN CAST([] AS BIGINT[])
        |  ELSE list_transform(generate_series(1, len(wh)-7), i ->
        |    (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P1}) * pw1[j+1]) % ${plans.RollingGrams.P1})) % ${plans.RollingGrams.P1}) * ${plans.RollingGrams.P2}
        |  + (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P2}) * pw2[j+1]) % ${plans.RollingGrams.P2})) % ${plans.RollingGrams.P2})) END AS gs
        |  FROM wh3 CROSS JOIN pw),
        |g3 AS (SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS h FROM gl),
        |dupg AS (SELECT h FROM g3 GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |occ AS (SELECT doc_id, pos, h FROM g3 SEMI JOIN dupg USING (h)),
        |rkd AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn FROM occ),
        |removed AS (SELECT doc_id, pos FROM rkd WHERE rn > 1),
        |covered AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS wpos FROM removed),
        |wordpos AS (SELECT doc_id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS word FROM w3),
        |t3d AS (SELECT w3.doc_id, coalesce(k.t3, '') AS t3 FROM w3 LEFT JOIN
        |  (SELECT wordpos.doc_id, array_to_string(list(word ORDER BY wpos), ' ') AS t3
        |   FROM wordpos ANTI JOIN covered USING (doc_id, wpos) GROUP BY wordpos.doc_id) k
        |  ON w3.doc_id = k.doc_id),
        |w4 AS (SELECT doc_id, t3 AS text, string_split(lower(t3), ' ') AS ws,
        |    string_split(t3, chr(10)) AS lines FROM t3d),
        |sig4 AS (SELECT doc_id, text, ws,
        |  1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) AS dup_line_frac,
        |  CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
        |    / len(ws) AS symbol_word_ratio
        |  FROM w4),
        |q4 AS (SELECT doc_id, text FROM sig4
        |  WHERE (len(ws) BETWEEN 50 AND 100000)
        |    AND (CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws) BETWEEN 3.0 AND 10.0)
        |    AND symbol_word_ratio < 0.1 AND dup_line_frac < 0.3
        |    AND len(list_intersect(ws, ['the','a','of','and','to','in','is','it','for','on'])) >= 2),
        |w5 AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM q4),
        |sh5 AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w5),
        |hs5 AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh5 WHERE len(shingles) > 0),
        |sig5 AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs5),
        |bands5 AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig5, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand5 AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands5 a JOIN bands5 c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs5 AS (SELECT id_a, id_b FROM cand5 WHERE jaccard >= 0.5),
        |edges5 AS (SELECT id_a AS u, id_b AS v FROM pairs5 UNION SELECT id_b, id_a FROM pairs5),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM q4
        |  UNION
        |  SELECT e.u, reach.r FROM edges5 e JOIN reach ON reach.id = e.v),
        |comp5 AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |canon AS (SELECT q4.doc_id, q4.text FROM q4 JOIN comp5 USING (doc_id) WHERE comp5.cluster_id = q4.doc_id),
        |ev AS (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 100 = 0),
        |eg AS (SELECT DISTINCT unnest(g8) AS g FROM (
        |  SELECT CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT string_split(lt, ' ') AS ws FROM ev))),
        |tg AS (SELECT doc_id, unnest(g8) AS g FROM (
        |  SELECT doc_id, CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM canon))),
        |cont AS (SELECT DISTINCT doc_id FROM tg SEMI JOIN eg USING (g)),
        |clean AS (SELECT canon.doc_id, canon.text FROM canon ANTI JOIN cont USING (doc_id)),
        |wm AS (SELECT c.doc_id, d.source, c.text,
        |    CAST(len(string_split(lower(c.text), ' ')) AS BIGINT) AS n_tokens
        |  FROM clean c JOIN documents d USING (doc_id)),
        |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens FROM wm GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM wm),
        |wt AS (SELECT * FROM (VALUES ('src0', CAST(5000 AS BIGINT)), ('src1', CAST(2000 AS BIGINT))) v(source, w_bp)),
        |rr AS (SELECT ps.source,
        |    least(CAST(10000 AS BIGINT), (total_tokens * coalesce(w_bp, 100) // 10000) * 10000 // src_tokens) AS rate_bp
        |  FROM ps CROSS JOIN tot LEFT JOIN wt ON ps.source = wt.source),
        |kept7 AS (SELECT wm.doc_id, wm.text FROM wm JOIN rr ON wm.source = rr.source
        |  WHERE CAST(('0x' || substr(md5(CAST(wm.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < rr.rate_bp),
        |w8 AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM kept7),
        |q8 AS (SELECT doc_id,
        |    least(CAST(9 AS BIGINT), CAST(floor(((CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |          WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |     CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |               BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |     CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |    ) / 3.0) * 10) AS BIGINT)) AS q_bin,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(ws) AS BIGINT) AS n_tokens
        |  FROM w8)
        |SELECT doc_id, hh % 8 AS shard, q_bin,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY q_bin DESC, hh, doc_id) AS BIGINT) AS seq,
        |  n_tokens
        |FROM q8""".stripMargin,
    "llm_shard_plan" ->
      """WITH h AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, hh % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS BIGINT) AS seq,
        |  n_tokens
        |FROM h""".stripMargin,

    // llm_asof_join oracle: DuckDB's NATIVE ASOF LEFT JOIN — an
    // independent implementation of most-recent-at-or-before semantics —
    // after the same per-(user, instant) max-event collapse.
    "llm_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE event_type = 'purchase'),
        |v0 AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'view'),
        |v AS (SELECT user_id, ts_us, CAST(max(event_id) AS BIGINT) AS view_event_id
        |  FROM v0 GROUP BY user_id, ts_us)
        |SELECT p.event_id, p.user_id, p.ts_us, p.value,
        |  v.ts_us AS asof_ts, v.view_event_id, p.ts_us - v.ts_us AS gap_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts_us >= v.ts_us""".stripMargin,

    // llm_range_join oracle: the same recurring windows off min(ts), as
    // the naive inequality join the bucketized form must equal.
    "llm_range_join" ->
      """WITH t0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
        |w AS (SELECT g.i AS window_id, t0.t0 + g.i * 10800000000 AS lo_us,
        |    t0.t0 + g.i * 10800000000 + 2700000000 AS hi_us
        |  FROM t0, generate_series(0, 239) g(i)),
        |e AS (SELECT user_id, value, epoch_us(ts) AS ts_us FROM events)
        |SELECT w.window_id, w.lo_us, w.hi_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM w JOIN e ON e.ts_us >= w.lo_us AND e.ts_us < w.hi_us
        |GROUP BY w.window_id, w.lo_us, w.hi_us""".stripMargin,

    // llm_distinct_sketch oracle: identical 512-register HLL algebra —
    // same h64 split (top 9 bits bucket, low 51 rank field), rank via
    // length(bin()) (never float log2), harmonic sum as the exact scaled
    // BIGINT, one final double division with CAST-pinned DOUBLE literals.
    // llm_cooccur oracle: same apriori-pruned doc-level pair census +
    // HUGEINT lift.
    "llm_cooccur" ->
      """WITH toks AS (SELECT doc_id, unnest(list_distinct(list_filter(string_split(lower(text), ' '), x -> len(x) > 0))) AS w
        |  FROM documents),
        |dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY w),
        |freq AS (SELECT w, df FROM dfreq WHERE df >= 50),
        |ft AS (SELECT t.doc_id, t.w FROM toks t JOIN freq f ON t.w = f.w),
        |pairs AS (SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS n12
        |  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY 1, 2 HAVING count(*) >= 50),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        |SELECT p.w1, p.w2, p.n12, fa.df AS df1, fb.df AS df2,
        |  CAST((CAST(p.n12 AS HUGEINT) * nn.n * 1000000) // (CAST(fa.df AS HUGEINT) * fb.df) AS BIGINT) AS lift_micro
        |FROM pairs p JOIN freq fa ON p.w1 = fa.w JOIN freq fb ON p.w2 = fb.w, nn
        |ORDER BY lift_micro DESC, w1, w2 LIMIT 25""".stripMargin,
    // llm_attribution oracle: DuckDB's native ASOF LEFT JOIN with the
    // strict inequality, same max-event-id per-instant collapse.
    "llm_attribution" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        |p AS (SELECT user_id, ts_us AS p_ts, event_id AS p_id FROM e WHERE event_type = 'purchase'),
        |t0 AS (SELECT user_id, ts_us, max_by(event_type, event_id) AS touch_type
        |  FROM e WHERE event_type != 'purchase' GROUP BY user_id, ts_us),
        |j AS (SELECT p.user_id, p.p_ts, p.p_id, t0.ts_us AS touch_ts, t0.touch_type
        |  FROM p ASOF LEFT JOIN t0 ON p.user_id = t0.user_id AND p.p_ts > t0.ts_us),
        |a AS (SELECT CASE WHEN touch_ts IS NOT NULL AND p_ts - touch_ts <= 604800000000
        |    THEN touch_type ELSE 'none' END AS attributed_type,
        |  CASE WHEN touch_ts IS NOT NULL AND p_ts - touch_ts <= 604800000000
        |    THEN p_ts - touch_ts ELSE 0 END AS delay_us
        |  FROM j)
        |SELECT attributed_type, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(delay_us) AS BIGINT) AS total_delay_us
        |FROM a GROUP BY attributed_type""".stripMargin,
    // llm_triangles oracle: same undirect → degree-orient → wedge →
    // close construction over the enriched doc graph.
    "llm_triangles" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e AS MATERIALIZED (
        |  SELECT doc_id AS src, (doc_id * 7 + 3) % nn.n AS dst FROM documents, nn
        |  UNION ALL SELECT doc_id, doc_id - 1 FROM documents WHERE doc_id >= 1
        |  UNION ALL SELECT doc_id, doc_id - 2 FROM documents WHERE doc_id >= 2),
        |und AS (SELECT DISTINCT u, v FROM (
        |  SELECT src AS u, dst AS v FROM e WHERE src != dst
        |  UNION ALL SELECT dst, src FROM e WHERE src != dst)),
        |deg AS (SELECT u AS n, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
        |o AS MATERIALIZED (SELECT und.u, und.v FROM und
        |  JOIN deg da ON und.u = da.n JOIN deg db ON und.v = db.n
        |  WHERE da.d < db.d OR (da.d = db.d AND und.u < und.v)),
        |w AS (SELECT o1.u AS a, o1.v AS b, o2.v AS c FROM o o1 JOIN o o2 ON o1.v = o2.u),
        |tri AS (SELECT w.a, w.b, w.c FROM w JOIN o ON w.a = o.u AND w.c = o.v),
        |ex AS (SELECT unnest([a, b, c]) AS id FROM tri)
        |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM ex GROUP BY id""".stripMargin,
    // llm_anomaly_days oracle: same cleared-denominator integer sigma
    // test over HUGEINT.
    "llm_anomaly_days" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, d.day, d.x,
        |  CAST(d.x * s.n - s.sx AS BIGINT) AS dev_n,
        |  CAST(d.x * s.n - s.sx AS HUGEINT) * (d.x * s.n - s.sx)
        |    > 4 * (CAST(s.n AS HUGEINT) * s.sxx - CAST(s.sx AS HUGEINT) * s.sx) AS anomalous
        |FROM d JOIN s ON d.event_type = s.event_type""".stripMargin,
    // llm_sketch_registry oracle: registers of ALL data computed
    // directly — register max is associative, so the incrementally
    // layered registry must hash identical.
    "llm_sketch_registry" ->
      """WITH u AS (SELECT event_type AS src, CAST(user_id AS VARCHAR) AS uid FROM events),
        |h AS (SELECT src, uid, CAST(('0x' || substr(md5(uid), 1, 15)) AS BIGINT) AS h FROM u),
        |b AS (SELECT src, h >> 51 AS bucket, h % 2251799813685248 AS rem FROM h),
        |rk AS (SELECT src, bucket,
        |  CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rnk FROM b),
        |regs AS (SELECT src, bucket, CAST(max(rnk) AS BIGINT) AS reg
        |  FROM rk GROUP BY 1, 2),
        |est AS (SELECT src, CAST(count(*) AS BIGINT) AS n_occupied,
        |    sum(CAST(1 AS BIGINT) << CAST(52 - reg AS INT)) AS occ_sum
        |  FROM regs GROUP BY 1),
        |fin AS (SELECT src, n_occupied,
        |  CAST(occ_sum + (512 - n_occupied) * 4503599627370496 AS BIGINT) AS register_sum
        |  FROM est),
        |fin2 AS (SELECT src, n_occupied, register_sum,
        |  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |    * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)
        |    / CAST(register_sum AS DOUBLE) AS hll_estimate
        |  FROM fin),
        |ex AS (SELECT src, CAST(count(DISTINCT uid) AS BIGINT) AS exact_distinct
        |  FROM u GROUP BY src)
        |SELECT fin2.src, fin2.n_occupied, fin2.register_sum, fin2.hll_estimate,
        |  fin2.hll_estimate < CAST(1280.0 AS DOUBLE) AS small_range,
        |  ex.exact_distinct
        |FROM fin2 JOIN ex ON fin2.src = ex.src""".stripMargin,
    // llm_join_estimate oracle: both grids replayed with the standard
    // CM hash family, per-depth inner products, min fold, exact census.
    "llm_join_estimate" ->
      """WITH a AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
        |b AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events WHERE event_type = 'purchase'),
        |ga AS (SELECT j, CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v), 1, 15)) AS BIGINT) % 1024 AS slot,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM a, unnest(generate_series(0, 3)) t(j) GROUP BY 1, 2),
        |gb AS (SELECT j, CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v), 1, 15)) AS BIGINT) % 1024 AS slot,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM b, unnest(generate_series(0, 3)) t(j) GROUP BY 1, 2),
        |ip AS (SELECT ga.j, sum(ga.cnt * gb.cnt) AS prod
        |  FROM ga JOIN gb ON ga.j = gb.j AND ga.slot = gb.slot GROUP BY 1),
        |ipd AS (SELECT d.j, coalesce(ip.prod, 0) AS prod
        |  FROM unnest(generate_series(0, 3)) d(j) LEFT JOIN ip ON d.j = ip.j),
        |est AS (SELECT CAST(min(prod) AS BIGINT) AS cm_join_estimate FROM ipd),
        |na AS (SELECT v, count(*) AS n FROM a GROUP BY v),
        |nb AS (SELECT v, count(*) AS n FROM b GROUP BY v),
        |x AS (SELECT CAST(coalesce(sum(na.n * nb.n), 0) AS BIGINT) AS exact_join_size
        |  FROM na JOIN nb ON na.v = nb.v)
        |SELECT cm_join_estimate, exact_join_size,
        |  cm_join_estimate >= exact_join_size AS one_sided,
        |  CAST((cm_join_estimate * 1000000) // exact_join_size AS BIGINT) AS ratio_micro
        |FROM est, x""".stripMargin,
    // llm_sketch_overlap oracle: full register replay for a, b, and the
    // bucket-max union, then the same inclusion–exclusion and ratio.
    "llm_sketch_overlap" ->
      """WITH ids AS (SELECT doc_id, CAST(doc_id * 20 + k AS VARCHAR) AS id
        |  FROM documents, unnest(generate_series(0, 19)) t(k)),
        |srcs AS (SELECT 'a' AS src, id FROM ids WHERE doc_id % 3 != 0
        |  UNION ALL SELECT 'b', id FROM ids WHERE doc_id % 2 = 0),
        |h AS (SELECT src, CAST(('0x' || substr(md5(id), 1, 15)) AS BIGINT) AS h FROM srcs),
        |b2 AS (SELECT src, h >> 51 AS bucket, h % 2251799813685248 AS rem FROM h),
        |rk AS (SELECT src, bucket,
        |  CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rnk FROM b2),
        |regs0 AS (SELECT src, bucket, CAST(max(rnk) AS BIGINT) AS reg
        |  FROM rk GROUP BY 1, 2),
        |regs AS (SELECT * FROM regs0 UNION ALL
        |  SELECT 'u', bucket, CAST(max(reg) AS BIGINT) FROM regs0 GROUP BY bucket),
        |est AS (SELECT src, CAST(count(*) AS BIGINT) AS n_occupied,
        |    sum(CAST(1 AS BIGINT) << CAST(52 - reg AS INT)) AS occ_sum
        |  FROM regs GROUP BY 1),
        |fin AS (SELECT src,
        |  CAST(occ_sum + (512 - n_occupied) * 4503599627370496 AS BIGINT) AS register_sum
        |  FROM est),
        |e2 AS (SELECT src,
        |  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |    * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)
        |    / CAST(register_sum AS DOUBLE) AS hll_estimate FROM fin),
        |p AS (SELECT min(CASE WHEN src = 'a' THEN hll_estimate END) AS est_a,
        |  min(CASE WHEN src = 'b' THEN hll_estimate END) AS est_b,
        |  min(CASE WHEN src = 'u' THEN hll_estimate END) AS est_union FROM e2),
        |x AS (SELECT CAST(count(*) AS BIGINT) AS exact_overlap FROM ids
        |  WHERE doc_id % 3 != 0 AND doc_id % 2 = 0)
        |SELECT est_a, est_b, est_union, est_a + est_b - est_union AS overlap_est,
        |  exact_overlap,
        |  CAST(floor((est_a + est_b - est_union) * 1000000 / exact_overlap) AS BIGINT) AS ratio_micro
        |FROM p, x""".stripMargin,
    "llm_distinct_sketch" ->
      """WITH ud AS (SELECT event_type,
        |    CAST(user_id AS VARCHAR) || '@' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS uday
        |  FROM events),
        |h AS (SELECT event_type, CAST(('0x' || substr(md5(uday), 1, 15)) AS BIGINT) AS h FROM ud),
        |b AS (SELECT event_type, h >> 51 AS bucket, h % 2251799813685248 AS rem FROM h),
        |rk AS (SELECT event_type, bucket,
        |  CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rnk FROM b),
        |regs0 AS (SELECT event_type, bucket, CAST(max(rnk) AS BIGINT) AS reg
        |  FROM rk GROUP BY event_type, bucket),
        |regs AS (SELECT * FROM regs0 UNION ALL
        |  SELECT '__all__' AS event_type, bucket, CAST(max(reg) AS BIGINT) AS reg
        |  FROM regs0 GROUP BY bucket),
        |est AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_occupied,
        |    sum(CAST(1 AS BIGINT) << CAST(52 - reg AS INT)) AS occ_sum
        |  FROM regs GROUP BY event_type),
        |fin AS (SELECT event_type, n_occupied,
        |  CAST(occ_sum + (512 - n_occupied) * 4503599627370496 AS BIGINT) AS register_sum
        |  FROM est),
        |fin2 AS (SELECT event_type, n_occupied, register_sum,
        |  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |    * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)
        |    / CAST(register_sum AS DOUBLE) AS hll_estimate
        |  FROM fin),
        |ex AS (SELECT event_type, CAST(count(DISTINCT uday) AS BIGINT) AS exact_distinct
        |    FROM ud GROUP BY event_type
        |  UNION ALL SELECT '__all__', CAST(count(DISTINCT uday) AS BIGINT) FROM ud)
        |SELECT fin2.event_type, fin2.n_occupied, fin2.register_sum,
        |  fin2.hll_estimate,
        |  fin2.hll_estimate < CAST(1280.0 AS DOUBLE) AS small_range,
        |  ex.exact_distinct
        |FROM fin2 JOIN ex ON fin2.event_type = ex.event_type""".stripMargin,

    // llm_pagerank oracle: all 8 integer-ppb supersteps replayed as
    // generated MATERIALIZED CTE blocks (see pagerankOracle) — same
    // arithmetic-neighbour edge set, same (85·Σ(rank div deg)) div 100
    // damping, exact BIGINT throughout.
    "llm_pagerank" -> pagerankOracle(8),

    // llm_trustrank oracle: same superstep replay with the seed-scaled
    // per-node teleport instead of the uniform constant.
    "llm_trustrank" -> trustrankOracle(8),

    // llm_seed_distance oracle: 4 BFS supersteps as generated CTEs —
    // frontier join + min fold each.
    "llm_seed_distance" -> seedDistanceOracle(4),

    // llm_communities oracle: 4 synchronous LPA supersteps as generated
    // CTEs — neighbour-label counts, (cnt DESC, label ASC) top-1 via
    // QUALIFY, isolated nodes carried by the left join.
    "llm_communities" -> lpaOracle(4),

    // llm_heavy_hitters oracle: identical 4×1024 count-min grid (same
    // "j:value" md5 hash family), same exact-top-20 probe set, row-wise
    // min with missing slots reading 0.
    "llm_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |t2 AS (SELECT word FROM tok WHERE length(word) > 0),
        |cnt AS (SELECT word, CAST(count(*) AS BIGINT) AS exact_count FROM t2 GROUP BY word),
        |probe AS (SELECT word, exact_count FROM cnt
        |  ORDER BY exact_count DESC, word LIMIT 20),
        |grid AS (SELECT g.j,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || t2.word), 1, 15)) AS BIGINT) % 1024 AS slot
        |  FROM t2, generate_series(0, 3) g(j)),
        |counters AS (SELECT j, slot, CAST(count(*) AS BIGINT) AS cnt
        |  FROM grid GROUP BY j, slot),
        |pl AS (SELECT p.word, p.exact_count, g.j,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || p.word), 1, 15)) AS BIGINT) % 1024 AS slot
        |  FROM probe p, generate_series(0, 3) g(j)),
        |est AS (SELECT pl.word, pl.exact_count,
        |    CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS cm_estimate
        |  FROM pl LEFT JOIN counters c ON pl.j = c.j AND pl.slot = c.slot
        |  GROUP BY pl.word, pl.exact_count)
        |SELECT word, cm_estimate, exact_count,
        |  cm_estimate - exact_count AS overcount FROM est""".stripMargin,

    // llm_bloom_filter oracle: identical 2^16-bit / 4-hash filter
    // (bit_or-folded 32-bit-packed words — bit 63 overflows DuckDB's
    // checked <<), bool_and over the probe bits,
    // exact membership via the eval content-key set.
    "llm_bloom_filter" ->
      """WITH k AS (SELECT doc_id, md5(text) AS ck FROM documents),
        |ev AS (SELECT DISTINCT ck FROM k WHERE doc_id % 100 = 0),
        |pos AS (SELECT CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || ev.ck), 1, 15)) AS BIGINT) % 65536 AS p
        |  FROM ev, generate_series(0, 3) g(j)),
        |bloom AS (SELECT p // 32 AS word_idx,
        |    bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
        |  FROM pos GROUP BY p // 32),
        |pr AS (SELECT DISTINCT ck FROM k),
        |ppos AS (SELECT pr.ck,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || pr.ck), 1, 15)) AS BIGINT) % 65536 AS p
        |  FROM pr, generate_series(0, 3) g(j)),
        |hit AS (SELECT ppos.ck,
        |    bool_and(b.bits IS NOT NULL AND
        |      (b.bits & (CAST(1 AS BIGINT) << CAST(ppos.p % 32 AS INT))) != 0) AS in_bloom
        |  FROM ppos LEFT JOIN bloom b ON ppos.p // 32 = b.word_idx
        |  GROUP BY ppos.ck)
        |SELECT k.doc_id, h.in_bloom AS flagged,
        |  (k.ck IN (SELECT ck FROM ev)) AS in_eval_texts,
        |  h.in_bloom AND NOT (k.ck IN (SELECT ck FROM ev)) AS false_positive
        |FROM k JOIN hit h ON k.ck = h.ck""".stripMargin,

    // llm_pmi_pairs oracle: identical log-free micro-quantized PMI
    // ratio over the same pruned bigram table; exact integer ranking.
    "llm_pmi_pairs" ->
      """WITH d AS (SELECT list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |uni AS (SELECT unnest(ws) AS w FROM d),
        |c1t AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM uni GROUP BY w),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
        |bgidx AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d WHERE len(ws) >= 2),
        |bg AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM bgidx),
        |bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg
        |  GROUP BY w1, w2 HAVING count(*) >= 3)
        |SELECT bgc.w1, bgc.w2, bgc.c12, a.c1 AS c1_left, b.c1 AS c1_right,
        |  CAST((CAST(bgc.c12 AS HUGEINT) * n.n * 1000000) // (CAST(a.c1 AS HUGEINT) * b.c1) AS BIGINT) AS pmi_ratio_micro
        |FROM bgc JOIN c1t a ON bgc.w1 = a.w JOIN c1t b ON bgc.w2 = b.w
        |CROSS JOIN n
        |ORDER BY pmi_ratio_micro DESC, w1, w2 LIMIT 30""".stripMargin,

    // llm_event_transitions oracle: identical lag window + quantized
    // transition rates.
    "llm_event_transitions" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        |l AS (SELECT user_id, event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
        |  FROM e),
        |p AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_transitions
        |  FROM l WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),
        |tot AS (SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
        |  FROM p GROUP BY prev_type)
        |SELECT p.prev_type, p.next_type, p.n_transitions,
        |  CAST((p.n_transitions * 1000000) // t.n_from AS BIGINT) AS p_micro
        |FROM p JOIN tot t ON p.prev_type = t.prev_type""".stripMargin,

    // llm_feature_snapshot oracle: same user×day grid off the event-time
    // bounds, DuckDB's native ASOF LEFT JOIN after the same max-event-id
    // per-instant collapse.
    "llm_feature_snapshot" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events),
        |b AS (SELECT min(ts_us) // 86400000000 AS d0, max(ts_us) // 86400000000 AS d1 FROM e),
        |days AS (SELECT unnest(generate_series(b.d0, b.d1)) AS day FROM b),
        |u AS (SELECT DISTINCT user_id FROM e),
        |grid AS (SELECT u.user_id, days.day,
        |    (days.day + 1) * 86400000000 - 1 AS eod_us FROM u, days),
        |ed AS (SELECT user_id, ts_us, event_id AS last_event_id, value AS last_value FROM e
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts_us ORDER BY event_id DESC) = 1)
        |SELECT g.user_id, g.day, ed.ts_us AS asof_ts, ed.last_event_id, ed.last_value
        |FROM grid g ASOF LEFT JOIN ed
        |  ON g.user_id = ed.user_id AND g.eod_us >= ed.ts_us""".stripMargin,

    // llm_set_join oracle: the FULL brute-force quadratic join over the
    // same distinct-shingle sets — exact integer threshold test, one
    // float division for the reported jaccard. The prefix-filtered
    // engine result must equal it pair for pair.
    "llm_set_join" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hsh AS (SELECT doc_id, list_distinct(list_transform(shingles,
        |    s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS shingles
        |  FROM sh WHERE len(shingles) > 0),
        |d AS (SELECT doc_id, shingles, CAST(len(shingles) AS BIGINT) AS s FROM hsh),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS inter,
        |    a.s AS sa, b.s AS sb
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / CAST(sa + sb - inter AS DOUBLE) AS jaccard
        |FROM p WHERE inter * 2 >= (sa + sb - inter) * 1""".stripMargin,

    // llm_domain_similarity oracle: same quantize → per-label component
    // sums → pairwise integer dot / sqrt·sqrt (IEEE sqrt is correctly
    // rounded, so the one float step is engine-exact).
    "llm_domain_similarity" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq
        |  FROM embeddings),
        |px AS (SELECT label, unnest(generate_series(1, len(vq))) AS pos, vq FROM e),
        |comp AS (SELECT label, pos, CAST(sum(vq[pos]) AS BIGINT) AS sv
        |  FROM px GROUP BY label, pos),
        |sums AS (SELECT label, list(sv ORDER BY pos) AS sv FROM comp GROUP BY label),
        |n2s AS (SELECT label, sv,
        |    CAST(list_sum(list_transform(sv, x -> x * x)) AS BIGINT) AS n2 FROM sums),
        |cnt AS (SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs
        |  FROM embeddings GROUP BY label),
        |lab AS (SELECT n2s.label, sv, n2, n_vecs FROM n2s JOIN cnt ON n2s.label = cnt.label)
        |SELECT a.label AS label_a, b.label AS label_b, a.n_vecs AS n_a, b.n_vecs AS n_b,
        |  CAST(list_sum(list_transform(generate_series(1, len(a.sv)),
        |      i -> a.sv[i] * b.sv[i])) AS DOUBLE)
        |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos
        |FROM lab a JOIN lab b ON a.label < b.label""".stripMargin,

    // llm_pps_sample oracle: the naive global-window replay of the same
    // integer pointer arithmetic (engine side is bucketed — same line).
    "llm_pps_sample" ->
      """WITH d0 AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS weight
        |  FROM documents),
        |d AS (SELECT * FROM d0 WHERE weight > 0),
        |c AS (SELECT doc_id, weight,
        |    sum(weight) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS e FROM d),
        |tw AS (SELECT CAST(sum(weight) AS BIGINT) AS w FROM d),
        |op AS (SELECT CAST(('0x' || substr(md5('pps:r8'), 1, 15)) AS BIGINT)
        |    % greatest(tw.w // 50, 1) AS o, tw.w AS w FROM tw),
        |m AS (SELECT c.doc_id, c.weight, greatest(c.e - c.weight - op.o, 0) AS x,
        |    c.e - op.o AS y, op.w AS w FROM c, op),
        |hh AS (SELECT doc_id, weight,
        |    CASE WHEN y <= 0 THEN 0
        |      ELSE greatest(least((y * 50 + w - 1) // w - 1, 49)
        |        - ((x * 50 + w - 1) // w) + 1, 0) END AS n_hits
        |  FROM m)
        |SELECT doc_id, weight, CAST(n_hits AS BIGINT) AS n_hits,
        |  n_hits > 0 AS selected FROM hh""".stripMargin,

    // llm_pps_estimate oracle: the pps replay + the same micro-quantized
    // Horvitz-Thompson estimator.
    "llm_pps_estimate" ->
      """WITH d0 AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS weight,
        |    CAST(length(text) AS BIGINT) AS chars
        |  FROM documents),
        |d AS (SELECT * FROM d0 WHERE weight > 0),
        |c AS (SELECT doc_id, weight, chars,
        |    sum(weight) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS e FROM d),
        |tw AS (SELECT CAST(sum(weight) AS BIGINT) AS w,
        |    CAST(sum(chars) AS BIGINT) AS exact_total_chars FROM d),
        |op AS (SELECT CAST(('0x' || substr(md5('pps:r8'), 1, 15)) AS BIGINT)
        |    % greatest(tw.w // 50, 1) AS o, tw.w AS w FROM tw),
        |m AS (SELECT c.doc_id, c.weight, c.chars, greatest(c.e - c.weight - op.o, 0) AS x,
        |    c.e - op.o AS y, op.w AS w FROM c, op),
        |hh AS (SELECT doc_id, weight, chars,
        |    CASE WHEN y <= 0 THEN 0
        |      ELSE greatest(least((y * 50 + w - 1) // w - 1, 49)
        |        - ((x * 50 + w - 1) // w) + 1, 0) END AS n_hits
        |  FROM m),
        |agg AS (SELECT CAST(sum(n_hits * ((chars * 1000000) // weight)) AS BIGINT) AS c,
        |    CAST(sum(n_hits) AS BIGINT) AS n_sampled FROM hh)
        |SELECT agg.n_sampled,
        |  CAST((tw.w * agg.c) // (50 * 1000000) AS BIGINT) AS est_total_chars,
        |  tw.exact_total_chars,
        |  CAST(((tw.w * agg.c) // (50 * 1000000)) * 1000000 // tw.exact_total_chars AS BIGINT) AS ratio_micro
        |FROM agg, tw""".stripMargin,

    // llm_decayed_score oracle: identical shifted-integer decay.
    "llm_decayed_score" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |m AS (SELECT max(day) AS maxd FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN maxd - day <= 30
        |    THEN CAST(1 AS BIGINT) << CAST(30 - (maxd - day) AS INT)
        |    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS decay_score
        |FROM e, m GROUP BY user_id""".stripMargin,
  )
}
