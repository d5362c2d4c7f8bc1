package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-size set sketches for corpus-vs-corpus comparison.
  *
  * The cross-corpus overlap question — "how much of snapshot B is
  * already in corpus A?" — is the planning step BEFORE an ingestion
  * dedup: a full answer is a distinct-join over two 10^12-row key
  * sets, but the decision (skip / incremental-ingest / full-dedup)
  * only needs the cardinalities to a few percent. The KMV (k minimum
  * values) bottom-k sketch answers it with k 64-bit values per side:
  * one scan + per-partition top-k per corpus, then sketch-vs-sketch
  * arithmetic on ≤2k rows. Bar-Yossef et al. 2002 (distinct-element
  * counting) and Beyer et al. 2007 (distinct-value synopses for
  * set operations) are the public constructions.
  *
  * Deterministic by design: the element hash is the md5-prefix hash
  * (engine-portable, content-keyed), so the sketch — and every
  * estimate — is a pure function of the key sets. Same discipline as
  * the rest of the repo: no rand(), identical results on any cluster
  * width, and a DuckDB oracle can re-derive the estimates exactly.
  */
object Sketch {

  /** KMV overlap sketch between two corpora's key columns. Returns a
    * ONE-row frame:
    *   - `n_union_sketch` — |k smallest of S_A ∪ S_B| (< k ⇔ the
    *     union is smaller than k: the sketch saw EVERYTHING and the
    *     "estimates" below are exact);
    *   - `vk` — the k-th smallest union hash (the KMV threshold);
    *   - `shared_in_k` — union-sketch values present in both sides;
    *   - `union_est` — distinct |A ∪ B|: (k-1)·2^32 div vk on the
    *     estimator path (hash domain [0, 2^32)), the exact sketch
    *     size on the saw-everything path;
    *   - `jaccard_ppm` — shared_in_k·10^6 div denom (denom = k, or
    *     the sketch size when exact);
    *   - `inter_est` — jaccard × union: shared_in_k·union_est div
    *     denom.
    * All integer arithmetic (div = floor division on non-negative
    * operands) — engine-exact, no float drift.
    *
    * Plan shape at scale: each side is distinct-hash → per-partition
    * top-k → global top-k (Spark's TakeOrderedAndProject — partial
    * top-k map-side, k·partitions rows to the final merge; the corpus
    * is scanned once and never shuffled). Everything after operates
    * on ≤2k rows. k trades accuracy for sketch size: relative error
    * of the distinct estimate ~ 1/sqrt(k).
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, keyCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"kmvOverlap needs k >= 2, got $k")
    def bottomK(df: DataFrame): DataFrame =
      df.select(graft.functions.Md5Prefix32(col(keyCol).cast("string"))
          .as("h"))
        .where(col("h").isNotNull)
        .distinct()
        .orderBy("h")
        .limit(k)
    val sa = bottomK(a)
    val sb = bottomK(b)
    // ≤ 2k rows from here on: the union sketch is the k smallest of
    // the merged sides, and membership flags ride along via outer join
    val merged = sa.select(col("h"), lit(1).as("in_a"))
      .join(sb.select(col("h"), lit(1).as("in_b")), Seq("h"), "full")
      .select(col("h"), coalesce(col("in_a"), lit(0)).as("in_a"),
        coalesce(col("in_b"), lit(0)).as("in_b"))
      .orderBy("h")
      .limit(k)
    // coalesce: on empty/all-null-key inputs max/sum over zero rows
    // are NULL — the empty-corpus row must be all-zero, not mixed
    // NULL/0, in columns documented as longs
    val agg = merged.agg(
      count(lit(1)).as("n_union_sketch"),
      coalesce(max(col("h")), lit(0L)).as("vk"),
      coalesce(sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
        .otherwise(0L)), lit(0L)).as("shared_in_k"))
    val exact = col("n_union_sketch") < k
    val denom = when(exact, col("n_union_sketch")).otherwise(lit(k.toLong))
    agg.select(
        col("n_union_sketch").cast("long").as("n_union_sketch"),
        col("vk").cast("long").as("vk"),
        col("shared_in_k").cast("long").as("shared_in_k"),
        when(exact, col("n_union_sketch"))
          .otherwise(expr(s"(${k - 1} * 4294967296) div vk"))
          .cast("long").as("union_est"),
        denom.cast("long").as("_denom"))
      .select(col("n_union_sketch"), col("vk"), col("shared_in_k"),
        col("union_est"),
        when(col("_denom") > 0,
            expr("(shared_in_k * 1000000) div _denom"))
          .otherwise(lit(0L)).cast("long").as("jaccard_ppm"),
        when(col("_denom") > 0,
            expr("(shared_in_k * union_est) div _denom"))
          .otherwise(lit(0L)).cast("long").as("inter_est"))
  }

  /** HyperLogLog register table (Flajolet, Fuss, Gandouet, Meunier,
    * AofA 2007) over a value column: one row per NONZERO register,
    * `(reg, rho_max)`, at most 2^p rows total — the sketch that
    * answers "how many distinct keys" in ONE scan with 2^p bytes of
    * state where KMV keeps k full hashes. The 100 TB shape: per-row
    * register/rank extraction (pure Columns), one map-side-combinable
    * max-aggregation on a 2^p-key domain — no distinct(), no second
    * pass, and sketches MERGE by register-wise max ([[hllMerge]]), so
    * per-partition / per-day sketches roll up for free.
    *
    * Determinism: the 60-bit hash is the md5 prefix (15 hex chars —
    * positive in signed 64-bit in every engine); register = top p
    * bits, rank rho = leading zeros of the (60-p)-bit suffix + 1,
    * computed as `bits - (length(bin(w)) - 1)` — bit-length, no float
    * log (the q67 trick). Input rows need not be pre-distinct:
    * max-per-register over duplicates equals max over distincts.
    */
  /** The (register, rank) pair of one key — the per-row arithmetic
    * [[hllRegisters]] aggregates and [[graft.ops.WebGraph.hyperAnf]]
    * reuses per graph node.
    */
  private[ops] def hllRegRho(key: Column, p: Int): (Column, Column) = {
    val bits = 60 - p
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = h.bitwiseAND(lit((1L << bits) - 1L))
    (shiftright(h, bits),
      when(w === 0L, lit(bits + 1))
        .otherwise(lit(bits) - (length(bin(w)) - 1)))
  }

  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 8)
      : DataFrame = {
    require(p >= 4 && p <= 14, s"hll precision p in [4,14], got $p")
    val (reg, rho) = hllRegRho(col(keyCol), p)
    df.where(col(keyCol).isNotNull)
      .select(reg.as("reg"), rho.as("_rho"))
      .groupBy(col("reg"))
      .agg(max(col("_rho")).cast("int").as("rho_max"))
  }

  /** [[hllRegisters]] per group: one register table per distinct value
    * of `keys` — the per-tenant / per-source / per-day cardinality
    * rollup (≤ 2^p rows per group), built in the same single scan.
    * Groups merge to coarser sketches by register-wise max exactly.
    */
  def hllRegistersBy(df: DataFrame, keys: Seq[String], keyCol: String,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, s"hll precision p in [4,14], got $p")
    val (reg, rho) = hllRegRho(col(keyCol), p)
    df.where(col(keyCol).isNotNull)
      .select(keys.map(col) :+ reg.as("reg") :+ rho.as("_rho"): _*)
      .groupBy(keys.map(col) :+ col("reg"): _*)
      .agg(max(col("_rho")).cast("int").as("rho_max"))
  }

  /** Merge HLL sketches: register-wise max. The union sketch of the
    * two underlying key sets — exactly (not approximately) the sketch
    * a single pass over the concatenated input would build.
    */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("reg"))
      .agg(max(col("rho_max")).cast("int").as("rho_max"))

  /** Count-min sketch (Cormode & Muthukrishnan 2005): d hash rows ×
    * w counters answering "how often did key X occur" from d·w cells
    * instead of a full frequency table — the frequency complement of
    * the HLL cardinality sketch, and the mergeable summary behind
    * streaming heavy-hitter monitors. Relational build: every
    * occurrence explodes to its d (row, column) cells, cells group to
    * counts map-side — only NONZERO cells materialize, and sketches
    * MERGE by cell-wise sum ([[cmsMerge]]), so per-partition / per-day
    * sketches roll up exactly. h_r(key) = md5-prefix(key:cms:r) mod w;
    * deterministic, engine-portable.
    */
  def cmsTable(df: DataFrame, keyCol: String, d: Int = 4,
      w: Int = 256): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2, s"cms needs d in [1,16], w >= 2")
    val rows = (0 until d).map(r => struct(lit(r).as("r"),
      pmod(graft.functions.Md5Prefix32(
        concat(col(keyCol).cast("string"), lit(s":cms:$r"))),
        lit(w.toLong)).as("c")))
    df.where(col(keyCol).isNotNull)
      .select(explode(array(rows: _*)).as("_rc"))
      .select(col("_rc.r").as("r"), col("_rc.c").as("c"))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Merge CMS sketches: cell-wise sum — exactly the sketch one pass
    * over the concatenated input builds.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Point-frequency estimates from a [[cmsTable]]: est(key) = min
    * over the d rows of the addressed cell (absent cell = 0). NEVER
    * an underestimate; overestimates by at most the collision mass,
    * E[err] <= corpus_size · e / w per the standard bound. d left
    * joins on (r, c) — the sketch is the small side.
    */
  def cmsLookup(cms: DataFrame, probes: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 256): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2, "d/w must match the build")
    val rows = (0 until d).map(r => struct(lit(r).as("r"),
      pmod(graft.functions.Md5Prefix32(
        concat(col("key"), lit(s":cms:$r"))),
        lit(w.toLong)).as("c")))
    probes.select(col(keyCol).cast("string").as("key"))
      .select(col("key"), explode(array(rows: _*)).as("_rc"))
      .select(col("key"), col("_rc.r").as("r"), col("_rc.c").as("c"))
      .join(cms, Seq("r", "c"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("est"))
  }

  /** Cardinality estimate from an HLL register table: one row,
    * `(m, n_nonzero, est)`. The indicator sum Z = Σ 2^-rho (empty
    * registers contribute 1) is computed EXACTLY as the integer
    * Σ 2^(61-rho) in decimal(38) — sums of powers of two in floating
    * point are order-sensitive past 52 bits of spread, and agg order
    * is the one thing a distributed sum won't promise — then cast to
    * double once for the final alpha·m²/Z, with the standard
    * linear-counting fallback (E ≤ 2.5m and empty registers exist →
    * m·ln(m/V)). Rounded to 6 decimals; the oracle replays the exact
    * integer staging and the same one-shot double math.
    */
  def hllEstimate(regs: DataFrame, p: Int = 8): DataFrame =
    hllEstimateBy(regs, Seq.empty, p)
      .select(col("m"), col("n_nonzero"), col("est"))

  /** [[hllEstimate]] per group: one estimate row per distinct value of
    * `keys` (e.g. per graph node in [[graft.ops.WebGraph.hyperAnf]],
    * per day in a rolling-ingest monitor). Identical arithmetic —
    * exact integer indicator sum, one double division, linear-counting
    * fallback — grouped instead of global. A key with zero register
    * rows simply doesn't appear (its estimate would be 0).
    */
  def hllEstimateBy(regs: DataFrame, keys: Seq[String], p: Int = 8)
      : DataFrame = {
    require(p >= 4 && p <= 14, s"hll precision p in [4,14], got $p")
    val m = 1 << p
    val alpha =
      if (p == 4) 0.673 else if (p == 5) 0.697
      else if (p == 6) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    val dec = "decimal(38,0)"
    val two61 = lit(2305843009213693952L) // 2^61
    val kc = keys.map(col)
    regs.groupBy(kc: _*).agg(
        count(lit(1)).cast("long").as("n_nonzero"),
        coalesce(sum(call_function("shiftright", two61,
            col("rho_max")).cast(dec)),
          lit(0).cast(dec)).as("_s_nz"))
      .select(kc ++ Seq(col("n_nonzero"),
        (col("_s_nz") + (lit(m.toLong) - col("n_nonzero")).cast(dec)
          * two61.cast(dec)).cast("double").as("_z61"),
        col("n_nonzero").as("_nn")): _*)
      .select(kc ++ Seq(lit(m.toLong).as("m"), col("n_nonzero"), {
        val raw = lit(alpha * m.toDouble * m.toDouble *
          2305843009213693952.0d) / col("_z61")
        val v = lit(m.toLong) - col("_nn") // empty registers
        round(when(raw <= lit(2.5 * m) && v > 0L,
            lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
          .otherwise(raw), 6).as("est")
      }): _*)
  }
}
