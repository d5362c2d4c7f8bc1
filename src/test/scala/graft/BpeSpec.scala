package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity for the distributed BPE trainer/encoder: a scalar
  * reference implementation (the obviously-correct single-node loop,
  * reference semantics of Sennrich et al. 2016) must produce the SAME
  * merge table and the SAME encodings as the Spark path, and the Spark
  * path must be parallelism-invariant. This is the §5.2-6 golden
  * contract for an operator whose training loop is not
  * SQL-expressible (the merge chosen at step i depends on the merges
  * applied at steps 0..i-1); the first iteration's pair counts ARE
  * SQL-expressible and oracle-checked as q70.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // ---- scalar reference ----

  private def scalarInit(w: String): Vector[String] =
    w.map(_.toString).toVector :+ Bpe.EndOfWord

  private def scalarApply(s: Vector[String], a: String,
      b: String): Vector[String] = {
    val acc = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        acc += (a + b); i += 2
      } else { acc += s(i); i += 1 }
    }
    acc.result()
  }

  private def scalarTrain(words: Map[String, Long], k: Int,
      minPair: Long): Seq[(String, String, String, Long)] = {
    var table = words.toSeq.map { case (w, n) => (scalarInit(w), n) }
    val out = Seq.newBuilder[(String, String, String, Long)]
    var step = 0
    var done = k == 0
    while (!done) {
      val counts = collection.mutable.Map[(String, String), Long]()
      table.foreach { case (s, n) =>
        s.sliding(2).foreach {
          case Seq(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + n
          case _ =>
        }
      }
      val best = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.headOption
        .filter(_._2 >= minPair)
      best match {
        case Some(((a, b), c)) =>
          out += ((a, b, a + b, c))
          table = table.map { case (s, n) => (scalarApply(s, a, b), n) }
          step += 1
          done = step >= k
        case None => done = true
      }
    }
    out.result()
  }

  private def scalarEncode(text: String,
      merges: Seq[(String, String, String, Long)]): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      .flatMap { w =>
        merges.foldLeft(scalarInit(w)) { case (s, (a, b, _, _)) =>
          scalarApply(s, a, b)
        }
      }

  private val corpus = Seq(
    (0L, "low lower lowest low low"),
    (1L, "new newer newest new"),
    (2L, "wider wide wide new low"),
    (3L, "aaa aa aaaa"),            // overlapping-run greedy case
    (4L, "low new wide"))

  test("applyMerge: greedy left-to-right, overlapping runs") {
    import spark.implicits._
    val r = Seq(Tuple1(Seq("a", "a", "a")), Tuple1(Seq("a", "a", "a", "a")),
      Tuple1(Seq("x", "a", "a", "y")), Tuple1(Seq("a")))
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(r(0) === List("aa", "a"))
    assert(r(1) === List("aa", "aa"))
    assert(r(2) === List("x", "aa", "y"))
    assert(r(3) === List("a"))
  }

  test("trainBpe == scalar reference merge table; parallelism-invariant") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val sparkMerges = Bpe.trainBpe(df, "text", numMerges = 8)
      .map(m => (m.left, m.right, m.merged, m.pairCount))
    val words = corpus.flatMap(_._2.split("\\s+"))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val golden = scalarTrain(words, 8, 2L)
    assert(sparkMerges === golden)
    assert(sparkMerges.nonEmpty)
    // same corpus at a different parallelism -> identical merges
    val repart = Bpe.trainBpe(df.repartition(7), "text", numMerges = 8)
      .map(m => (m.left, m.right, m.merged, m.pairCount))
    assert(repart === sparkMerges)
  }

  test("encode == scalar reference encodings") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val merges = Bpe.trainBpe(df, "text", numMerges = 6)
    val goldenMerges = merges.map(m => (m.left, m.right, m.merged,
      m.pairCount))
    val got = Bpe.encode(df, "text", merges)
      .select(col("doc_id"), col("bpe_tokens")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    corpus.foreach { case (id, text) =>
      assert(got(id) === scalarEncode(text, goldenMerges).toList,
        s"doc $id")
    }
    // round-trip property: concatenating a word's symbols minus the
    // end-of-word marker reconstructs the word
    val rebuilt = got(0L).mkString.replace(Bpe.EndOfWord, " ").trim
    assert(rebuilt === "low lower lowest low low")
  }

  test("decode(encode(x)) == whitespace-normalized lowercase token " +
      "stream, for every corpus doc") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val merges = Bpe.trainBpe(df, "text", numMerges = 6)
    val out = Bpe.encode(df, "text", merges)
      .select(col("doc_id"),
        Bpe.decode(col("bpe_tokens")).as("decoded"),
        array_join(graft.ops.Dedup.tokens(col("text")), " ")
          .as("expected"))
      .collect()
    out.foreach(r => assert(r.getString(1) === r.getString(2),
      s"doc ${r.getLong(0)}"))
    assert(out.nonEmpty)
  }

  test("trainBpe stops early when no pair reaches minPairCount") {
    import spark.implicits._
    val df = Seq((0L, "ab cd ef")).toDF("doc_id", "text")
    // every adjacent pair occurs once; minPairCount=2 -> no merges
    assert(Bpe.trainBpe(df, "text", numMerges = 5).isEmpty)
  }

  test("trainBpeLocal == trainBpe merge-for-merge (incl. counts); " +
      "early-stops identically; deterministic under repartition") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    def flat(ms: Seq[Bpe.Merge]) =
      ms.map(m => (m.step, m.left, m.right, m.merged, m.pairCount))
    val dist = flat(Bpe.trainBpe(df, "text", numMerges = 12))
    val local = flat(Bpe.trainBpeLocal(df, "text", numMerges = 12))
    assert(local === dist)
    assert(local.nonEmpty)
    assert(flat(Bpe.trainBpeLocal(df.repartition(5), "text",
      numMerges = 12)) === local)
    // early stop: no pair reaches minPairCount
    assert(Bpe.trainBpeLocal(
      Seq((0L, "ab cd ef")).toDF("doc_id", "text"), "text", 5).isEmpty)
    // fuzz corpora: narrow alphabet so merges chain deep
    val rnd = new scala.util.Random(11)
    (0 until 3).foreach { trial =>
      val docs = (0 until 30).map { i =>
        (i.toLong, (0 until 12).map(_ =>
          (0 until (1 + rnd.nextInt(6)))
            .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
          .mkString(" "))
      }
      val fdf = docs.toDF("doc_id", "text")
      assert(flat(Bpe.trainBpeLocal(fdf, "text", 15)) ===
        flat(Bpe.trainBpe(fdf, "text", 15)), s"trial $trial")
    }
  }

  test("kernel encode == Column-fold encode on fuzz corpora " +
      "(incl. multi-byte chars) and on a deep merge table") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abcéß"  // multi-byte UTF-8 chars in the mix
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 10).map(_ =>
        (0 until (1 + rnd.nextInt(7)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.trainBpeLocal(df, "text", numMerges = 40,
      minPairCount = 1L)
    assert(merges.size >= 20, s"want a deep table, got ${merges.size}")
    val kern = Bpe.encode(df, "text", merges)
      .select("doc_id", "bpe_tokens", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[String](1).toList, r.getLong(2))).toMap
    val fold = Bpe.encodeFold(df, "text", merges)
      .select("doc_id", "bpe_tokens", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[String](1).toList, r.getLong(2))).toMap
    assert(kern === fold)
    // and both equal the scalar sequential reference
    val goldenMerges = merges.map(m =>
      (m.left, m.right, m.merged, m.pairCount))
    docs.foreach { case (id, text) =>
      assert(kern(id)._1 === scalarEncode(text, goldenMerges).toList,
        s"doc $id")
    }
  }

  test("trainBpeLocal maxWords prune is deterministic and exact when " +
      "the vocabulary fits") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val full = Bpe.trainBpeLocal(df, "text", 8)
    // vocabulary is ~14 words; a cap above that changes nothing
    assert(Bpe.trainBpeLocal(df, "text", 8, maxWords = 1000) === full)
    // a tight cap still trains deterministically (on the top words)
    val pruned = Bpe.trainBpeLocal(df, "text", 8, maxWords = 4)
    assert(pruned === Bpe.trainBpeLocal(df.repartition(3), "text", 8,
      maxWords = 4))
  }
}
