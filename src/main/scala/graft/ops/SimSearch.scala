package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - Brute-force cosine top-k: broadcast the (small) query side, rank
  *    within each query by a window — the correctness baseline.
  *  - Hyperplane-LSH bucketing: deterministic seeded planes, candidate
  *    join restricted to the query's bucket — the scale path (at 100 TB,
  *    only the bucket key shuffles; multi-probe = union of neighbor
  *    buckets).
  *
  * All vector math is `zip_with`/`aggregate` Column expressions in
  * double precision, left-to-right — bit-identical to the DuckDB oracle.
  */
object SimSearch {

  /** Dot product, left-to-right fold in double — the native codegen
    * expression (functions.DotProduct), bit-identical to the HOF form
    * `aggregate(zip_with(a, b, _ * _), 0d, _ + _)` it replaced
    * (FunctionsSpec pins the parity bitwise; the 25M-pair q102
    * candidate matrix measured 16.4 s HOF → 2.0 s native, min-of-3).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductCol(a, b)

  /** The interpreted HOF formulation, kept for the parity test. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplanes (seeded). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Deterministic ±1 sign matrix for a Johnson–Lindenstrauss sign
    * projection (Achlioptas 2003: Rademacher entries satisfy the JL
    * lemma like Gaussians, at a fraction of the arithmetic) — signs
    * from the md5-prefix hash so EVERY engine derives the same matrix
    * from (salt, j, i); no RNG state to ship.
    */
  def jlSigns(m: Int, dim: Int, salt: String = "jl"): Seq[Seq[Double]] =
    (0 until m).map(j => (0 until dim).map { i =>
      val h = graft.functions.Md5Prefix32.hash(
        org.apache.spark.unsafe.types.UTF8String
          .fromString(s"$salt:$j:$i"))
      if ((h & 1L) == 0L) 1.0 else -1.0
    })

  /** m-dim sign projection of a double vector: proj_j = Σ_i s_ji·v_i
    * (unscaled — cosine, the similarity every consumer here ranks on,
    * is scale-invariant; multiply by 1/√m for unbiased dot products).
    * The 100 TB move: shrink dim-d embeddings to m ≪ d floats ONCE,
    * then run candidate generation / clustering / near-dup in the
    * m-dim space at d/m the memory and FLOPs, exact re-rank on the
    * originals only for survivors. m native codegen dot products per
    * row against literal sign vectors — per-row, no shuffle.
    */
  def signProject(emb: Column, signs: Seq[Seq[Double]]): Column =
    array(signs.map(row => dot(emb, typedlit(row))): _*)

  /** LSH bucket id = sign bits of the plane projections. */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int,
      seed: Long = 42L): Column =
    planes(nPlanes, dim, seed).zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Brute-force cosine top-k: every query vs the full corpus.
    * The query side is broadcast; ties broken by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN, multi-table + multi-probe (the two standard
    * recall levers): `tables` independent hyperplane tables (distinct
    * seeds), and within each table a query probes its own bucket plus
    * every bucket within `probeHamming` bit flips. Candidate pairs are
    * deduped across tables BEFORE the cosine, so each pair is scored
    * once.
    *
    * Scale shape: the corpus side carries `tables` (table, bucket)
    * entries per vector and shuffles on that key; the query side is
    * multiplied by tables × probes and — when `broadcastQueries` (the
    * default, right while the query set fits an executor) — broadcast.
    * For corpus-sized query sets pass broadcastQueries = false: the
    * candidate join becomes a shuffle join on the (table, bucket) key,
    * which is exactly the co-partitioned join a 100 TB all-pairs ANN
    * needs (both sides shuffle once on the small key; vectors move only
    * within their buckets). Tuned on the near-uniform testdata
    * embeddings — an adversarially unstructured case — to ≥0.9 recall@5
    * while scanning ~1/3 of the corpus per query (OpsSpec asserts the
    * floor through BOTH join paths; Bench reports the measured recall).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5, nPlanes: Int = 4, dim: Int = 64,
      seed: Long = 42L, probeHamming: Int = 1, tables: Int = 4,
      broadcastQueries: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("tb", explode(array((0 until tables).map { l =>
        struct(lit(l).as("t"),
          hyperplaneBucket(col("cv"), nPlanes, dim, seed + l).as("b"))
      }: _*)))
      .select(col("corpus_id"), col("cv"),
        col("tb.t").as("t"), col("tb.b").as("bucket"))
    val masks: Seq[Long] = (0L until (1L << nPlanes))
      .filter(m => java.lang.Long.bitCount(m) <= probeHamming)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("tb", explode(array((for {
        l <- 0 until tables
        m <- masks
      } yield struct(lit(l).as("t"),
        hyperplaneBucket(col("qv"), nPlanes, dim, seed + l)
          .bitwiseXOR(lit(m)).as("b"))): _*)))
      .select(col("query_id"), col("qv"),
        col("tb.t").as("t"), col("tb.b").as("bucket"))
    val qSide = if (broadcastQueries) broadcast(q) else q
    val cand = c.join(qSide, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "qv", "corpus_id", "cv")
      .dropDuplicates("query_id", "corpus_id")
    val scored = cand.withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  // ---- IVF-Flat (inverted-file) index ----

  /** Deterministically sampled IVF centroids: the `nCells` corpus
    * vectors with smallest md5(id:seed) — the standard random-sample
    * initialization, made seeded and engine-reproducible (the same
    * ORDER BY md5 ... LIMIT runs in the DuckDB oracle). The collect is
    * the index-build bootstrap: nCells rows (16-4096), driver-side by
    * design, exactly like loading a trained coarse quantizer.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, seed: Long = 42L): Seq[Seq[Double]] =
    corpus
      .select(col(idCol).cast("string").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("_r", md5(concat(col("id"), lit(":" + seed))))
      .orderBy(col("_r"), col("id"))
      .limit(nCells)
      .collect()
      .map(_.getSeq[Double](1).toIndexedSeq)

  /** Centroid indices ranked by similarity (best first, smallest index
    * on ties — the oracle's `ORDER BY s DESC, ci` / `min(ci) WHERE
    * s = mx` picks the same). One struct-array expression: each
    * centroid similarity is evaluated exactly ONCE per row (a
    * greatest+when-chain form re-evaluates the interpreted HOF
    * aggregates per branch — measured 6.7 s vs 0.9 s at sf0.1).
    * Similarity is dot(v,c)/|c|: the row's own norm is a constant
    * positive factor across centroids, so dropping it cannot change
    * the ranking (the oracle ranks by full cosine — same order).
    */
  def ivfCellRanking(v: Column, cents: Seq[Seq[Double]]): Column =
    array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      struct((-(dot(v, array(c.map(lit): _*)) / lit(cn))).as("d"),
        lit(i).as("i"))
    }: _*))

  /** Cell id for a vector: index of the max-similarity centroid. */
  def ivfCell(v: Column, cents: Seq[Seq[Double]]): Column =
    element_at(ivfCellRanking(v, cents), 1)("i")

  /** IVF-Flat ANN: assign corpus vectors to their nearest sampled
    * centroid, probe each query's `nProbe` closest cells, score only
    * within probed cells.
    *
    * Scale shape: the corpus shuffles once on the cell id (or zero
    * times if the index table is stored bucketed by cell); queries are
    * replicated nProbe times and joined on the cell key — per-query
    * work is the probed cells' population, ~nProbe/nCells of the
    * corpus. IVF pays off when the corpus is clustered (cells capture
    * neighborhoods); on adversarially uniform vectors the same scan
    * fraction is better spent on multi-probe LSH (lshTopK) — both are
    * provided for that reason.
    *
    * Unlike the LSH path this is fully oracle-checkable: centroid
    * sampling, assignment, probing and scoring are all deterministic
    * SQL-expressible relational steps (q42).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5, nCells: Int = 16, nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nCells, seed)
    val c = corpus
      .select(col(idCol).as("corpus_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cell", ivfCell(col("cv"), cents))
    val q0 = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
    // top-nProbe cells per query: first nProbe of the ranked centroids
    val q = q0
      .withColumn("cell",
        explode(slice(transform(ivfCellRanking(col("qv"), cents),
          s => s("i")), 1, nProbe)))
    // corpus vectors live in exactly one cell and probed cells are
    // distinct, so candidates are already unique per (query, corpus)
    val scored = c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** One Lloyd (k-means) refinement pass over the IVF coarse
    * quantizer, as a distributed aggregate: assign every corpus vector
    * to its nearest current centroid, then emit per (cell, component)
    * the assignment count and the mean — i.e. the refined centroid
    * components. This is the quantizer-training step a real IVF index
    * runs between sampling and serving; iterate by feeding
    * [[centroidsFrom]] back in.
    *
    * Determinism at scale: component sums are accumulated in
    * decimal(30,12) — exact and order-independent — because a double
    * sum picks up Spark's nondeterministic aggregation order (and
    * would differ from any oracle engine's order). The mean is the
    * exact decimal sum cast to double, divided by the count, rounded
    * to 6 dp (one ulp-insensitive rounding at the very end, same
    * policy as the cosine queries). Shuffle carries only
    * (cell, pos, decimal, count) — nCells×dim groups; vectors
    * themselves never shuffle (the assignment is a map-side argmax
    * against broadcast-literal centroids).
    *
    * Cells with no assigned vectors are absent from the output (keep
    * their old centroid when iterating — standard empty-cell policy).
    *
    * Returns (cell, pos, n_vecs, c) sorted nowhere — caller orders.
    */
  def ivfRefineSums(corpus: DataFrame, vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame =
    corpus.select(col(vecCol).cast("array<double>").as("v"))
      .withColumn("cell", ivfCell(col("v"), cents))
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("x").cast("decimal(30,12)")).as("_s"))
      .withColumn("c",
        round(col("_s").cast("double") / col("n_vecs"), 6))
      .drop("_s")

  /** Collect a refine pass into centroid vectors; cells that lost all
    * vectors keep their previous centroid.
    */
  def centroidsFrom(sums: DataFrame, prev: Seq[Seq[Double]])
      : Seq[Seq[Double]] = {
    val byCell = sums.select("cell", "pos", "c").collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    prev.indices.map(i => byCell.getOrElse(i, prev(i)))
  }

  // ---- IVF-PQ (product-quantized inverted file) ----

  /** Per-subspace product-quantization codebooks (Jégou, Douze &
    * Schmid 2011, "Product Quantization for Nearest Neighbor Search"):
    * `ksub` corpus vectors sampled by the same deterministic
    * md5(id:seed) order as [[ivfCentroids]] (an independent seed so
    * codebooks don't correlate with the coarse cells), each split into
    * `m` contiguous subvectors. `cb(j)(c)` = centroid c of subspace j;
    * dim must divide evenly by m. Codebook TRAINING beyond sampling is
    * the same per-subspace Lloyd step [[ivfRefineSums]] implements for
    * the coarse quantizer; the sampled form is the oracle-checkable
    * default, exactly as for IVF cells.
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, seed: Long = 43L): Seq[Seq[Seq[Double]]] = {
    val sampled = ivfCentroids(corpus, idCol, vecCol, ksub, seed)
    val dim = sampled.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    (0 until m).map(j => sampled.map(_.slice(j * dsub, (j + 1) * dsub)))
  }

  /** Squared L2 distance to a literal centroid, left-to-right fold —
    * the same canonical summation order the DuckDB twin uses.
    */
  private def sqDist(a: Column, c: Seq[Double]): Column =
    aggregate(zip_with(a, array(c.map(lit): _*),
      (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x)

  /** PQ codes for a vector: per subspace, the index of the
    * squared-L2-nearest codebook centroid (smallest index on ties).
    * One struct-array sort per subspace so each distance is evaluated
    * exactly once — the [[ivfCellRanking]] idiom.
    */
  def pqEncode(v: Column, cb: Seq[Seq[Seq[Double]]]): Column = {
    val dsub = cb.head.head.length
    array(cb.zipWithIndex.map { case (cbj, j) =>
      val sub = slice(v, j * dsub + 1, dsub)
      element_at(array_sort(array(cbj.zipWithIndex.map { case (c, ci) =>
        struct(sqDist(sub, c).as("d"), lit(ci).as("i"))
      }: _*)), 1)("i")
    }: _*)
  }

  /** Squared norm of the PQ-RECONSTRUCTED vector, Σ_j |cb_j(code_j)|²:
    * a pure lookup into literal per-centroid norms (the norms are
    * Scala-side left-fold sums — same order as the oracle's list_sum),
    * added left-to-right across subspaces.
    */
  def pqReconNorm2(codes: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    cb.zipWithIndex.map { case (cbj, j) =>
      element_at(array(cbj.map(c => lit(c.map(x => x * x).sum)): _*),
        element_at(codes, j + 1) + 1)
    }.reduce(_ + _)

  /** ADC (asymmetric distance computation) dot product: the EXACT
    * query subvectors against the code-selected codebook centroids,
    * Σ_j dot(q_j, cb_j(code_j)), subspace terms added left-to-right.
    * Asymmetry is the PQ trade: the corpus side is m small ints, only
    * the query side keeps full precision.
    */
  def pqAdcDot(qv: Column, codes: Column, cb: Seq[Seq[Seq[Double]]]): Column = {
    val dsub = cb.head.head.length
    cb.zipWithIndex.map { case (cbj, j) =>
      val sub = slice(qv, j * dsub + 1, dsub)
      val cents = array(cbj.map(c => array(c.map(lit): _*)): _*)
      dot(sub, element_at(cents, element_at(codes, j + 1) + 1))
    }.reduce(_ + _)
  }

  /** IVF-PQ ANN: coarse cells from [[ivfCentroids]], corpus vectors
    * COMPRESSED to m per-subspace codes + one reconstructed norm,
    * candidates ranked by approximate ADC cosine within the probed
    * cells, then the top `rerank` per query re-ranked by EXACT cosine
    * against the raw vectors. Size `rerank` ~10-20x k: ADC ordering
    * correlates with true cosine (~0.6 on unclustered synthetic
    * vectors) but is noisy at the single-rank level, and the re-rank
    * restores exactness inside whatever the ADC cut keeps — measured
    * here: rerank=10 recall 0.23, rerank=50 recovers the flat IVF
    * index's recall at the same cells/probes.
    *
    * This is the 100 TB serving shape the flat index can't reach: the
    * resident index row is (id, cell, m codes, norm) — m·log2(ksub)
    * bits of vector payload instead of 4·dim bytes (64-dim float ×
    * m=8, ksub=16 ⇒ 256 bytes → 4 bytes of codes, 64×), so a
    * 10^12-vector index fits a cluster's memory; the raw-vector table
    * is touched only by the exact re-rank join, `rerank` rows per
    * query. Approximate cosine = ADC dot / (|q|·|x̂|) with |x̂| from
    * the codes alone. ADC ties break by corpus id; the re-rank stage
    * makes the final top-k exact over the ADC candidate set, so PQ
    * quantization error costs recall only at the rerank boundary,
    * never precision of returned cosines. Fully deterministic and
    * oracle-checked end to end (sampling, encoding, probing, ADC,
    * re-rank — q103).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5, nCells: Int = 16, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 16, rerank: Int = 50,
      seed: Long = 42L, cbSeed: Long = 43L): DataFrame = {
    require(rerank >= k, s"rerank $rerank < k $k")
    val cents = ivfCentroids(corpus, idCol, vecCol, nCells, seed)
    val cb = pqCodebooks(corpus, idCol, vecCol, m, ksub, cbSeed)
    val cv = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    // the resident index: codes + norm only, raw vectors dropped
    val index = cv
      .withColumn("cell", ivfCell(col("cv"), cents))
      .withColumn("codes", pqEncode(col("cv"), cb))
      .withColumn("rn2", pqReconNorm2(col("codes"), cb))
      .select("corpus_id", "cell", "codes", "rn2")
    val q0 = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val q = q0.withColumn("cell",
      explode(slice(transform(ivfCellRanking(col("qv"), cents),
        s => s("i")), 1, nProbe)))
    val cand = index.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("adc",
        pqAdcDot(col("qv"), col("codes"), cb) /
          (norm(col("qv")) * sqrt(col("rn2"))))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("corpus_id"))
    val top = cand.withColumn("prank", row_number().over(w1))
      .filter(col("prank") <= rerank)
      .select("query_id", "qv", "corpus_id")
    // exact re-rank touches only `rerank` raw vectors per query
    val exact = top.join(cv, Seq("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    exact.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Margin-based nearest-neighbor mining across two embedding sides —
    * Artetxe & Schwenk 2019 (the LASER/CCMatrix bitext-mining
    * criterion). An absolute cosine threshold is miscalibrated in
    * high-density "hubness" regions, so a forward-best pair (x, y)
    * scores by how far it stands out of BOTH endpoints' neighborhoods:
    * margin(x, y) = cos(x, y) / ((avgK(x) + avgK(y)) / 2), avgK = mean
    * cosine to the k nearest OTHER-side neighbors.
    *
    * Exactness: each cosine folds left-to-right in double (bit-equal
    * to the SQL twin) and floors to ppm ONCE; the neighborhood means
    * and the margin ratio are pure integer arithmetic (truncating
    * DIV), exact in any execution order. Degenerate neighborhoods
    * (avg_x + avg_y ≤ 0, possible only on adversarially anti-aligned
    * sides) are dropped rather than risking engine-specific
    * divide-by-zero behavior.
    *
    * Scale shape: the all-pairs cosine table is the documented
    * brute-force baseline — ONE crossJoin pass (materialized once)
    * serves both directions' neighborhoods and the forward
    * candidates. At corpus scale swap the pair source for
    * [[ivfTopK]] / [[lshTopK]] candidates: the margin only needs each
    * endpoint's top-k, which the ANN paths already produce per probe
    * bucket, and the per-endpoint windows then rank candidate-sized
    * partitions, not |other side|.
    *
    * Returns (x, y, cos_ppm, avg_x_ppm, avg_y_ppm, margin_ppm) for
    * forward-best pairs with margin_ppm ≥ minMarginPpm.
    */
  def marginMining(left: DataFrame, right: DataFrame, idCol: String,
      vecCol: String, k: Int = 4,
      minMarginPpm: Long = 1000000L): DataFrame = {
    val l = left.select(col(idCol).as("x"),
      col(vecCol).cast("array<double>").as("xv"))
    val r = right.select(col(idCol).as("y"),
      col(vecCol).cast("array<double>").as("yv"))
    val pairs = l.crossJoin(r)
      .withColumn("cos_ppm",
        floor(cosine(col("xv"), col("yv")) * lit(1000000L)).cast("long"))
      .select(col("x"), col("y"), col("cos_ppm"))
      .localCheckpoint() // one cosine pass feeds 3 consumers
    marginFromPairs(pairs, k, minMarginPpm)
  }

  /** [[marginMining]] with CANDIDATE pairs from the IVF coarse
    * quantizer — the scale swap that scaladoc documents: x probes its
    * `nProbe` nearest cells and pairs only with the right-side
    * vectors living there, so nothing quadratic in either side is
    * ever materialized (measured: the brute form's 100M-pair
    * checkpoint saturates a 24 GB single box at 2×10k vectors; this
    * path's pair count is Σ probed-cell sizes). The margin statistics
    * are computed over the candidate graph — exact for every covered
    * pair; recall vs brute follows probe coverage exactly as in
    * [[ivfTopK]]. `cents` is the shared coarse quantizer
    * ([[ivfCentroids]]; train on the union so an oracle re-derives
    * the same cells).
    */
  def marginMiningCandidates(left: DataFrame, right: DataFrame,
      idCol: String, vecCol: String, cents: Seq[Seq[Double]],
      k: Int = 4, minMarginPpm: Long = 1000000L,
      nProbe: Int = 4): DataFrame = {
    val r = right.select(col(idCol).as("y"),
        col(vecCol).cast("array<double>").as("yv"))
      .withColumn("cell", ivfCell(col("yv"), cents))
    val l = left.select(col(idCol).as("x"),
        col(vecCol).cast("array<double>").as("xv"))
      .withColumn("cell",
        explode(slice(transform(ivfCellRanking(col("xv"), cents),
          s => s("i")), 1, nProbe)))
    // y lives in exactly one cell and x's probed cells are distinct,
    // so (x, y) appears at most once — no dedup pass needed
    val pairs = l.join(r, Seq("cell"))
      .withColumn("cos_ppm",
        floor(cosine(col("xv"), col("yv")) * lit(1000000L)).cast("long"))
      .select(col("x"), col("y"), col("cos_ppm"))
      .localCheckpoint()
    marginFromPairs(pairs, k, minMarginPpm)
  }

  /** The margin tail shared by the brute and candidate pair sources:
    * per-endpoint top-k neighborhood means, forward-best, ratio gate.
    */
  private def marginFromPairs(pairs: DataFrame, k: Int,
      minMarginPpm: Long): DataFrame = {
    def avgTopK(key: String, other: String, outCol: String) =
      pairs.withColumn("_rk", row_number().over(
          Window.partitionBy(col(key))
            .orderBy(col("cos_ppm").desc, col(other))))
        .filter(col("_rk") <= k)
        .groupBy(col(key))
        .agg(call_function("div", sum(col("cos_ppm")), count(lit(1)))
          .as(outCol))
    val ax = avgTopK("x", "y", "avg_x_ppm")
    val ay = avgTopK("y", "x", "avg_y_ppm")
    val best = pairs.withColumn("_rk", row_number().over(
        Window.partitionBy(col("x"))
          .orderBy(col("cos_ppm").desc, col("y"))))
      .filter(col("_rk") === 1).drop("_rk")
    best.join(ax, "x").join(ay, "y")
      .filter(col("avg_x_ppm") + col("avg_y_ppm") > 0)
      .withColumn("margin_ppm", call_function("div",
        col("cos_ppm") * lit(2000000L),
        col("avg_x_ppm") + col("avg_y_ppm")))
      .filter(col("margin_ppm") >= minMarginPpm)
      .select("x", "y", "cos_ppm", "avg_x_ppm", "avg_y_ppm",
        "margin_ppm")
  }
}
