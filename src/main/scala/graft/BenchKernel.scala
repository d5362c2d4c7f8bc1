package graft

import graft.extract.ContentExtractor
import graft.gen.PagesGen
import graft.pipeline.ScalarEvaluator
import graft.rules.RuleSets

/** Single-threaded kernel microbenchmark (no Spark): what does one core
  * do per page? Separates generation, extraction, and full scalar
  * pipeline cost.
  */
object BenchKernel {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val boost = if (args.length > 1) args(1).toInt else 1
    def timeIt(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $sec%.2f s  (${n / sec}%.0f pages/s/core)  [$r]")
    }
    // warmup
    (0 until 2000).foreach { i =>
      ScalarEvaluator.process(PagesGen.pageFor(i.toLong, 7, boost), RuleSets.plugin)
    }
    timeIt("gen only") {
      var acc = 0L
      (0 until n).foreach(i => acc += PagesGen.pageFor(i.toLong, 42, boost).html.length)
      acc
    }
    val pages = (0 until n).map(i => PagesGen.pageFor(i.toLong, 42, boost)).toArray
    timeIt("extract only") {
      var acc = 0L
      pages.foreach(p => acc += ContentExtractor.extract(p.html).page_md.length)
      acc
    }
    val mds = pages.map(p => ContentExtractor.extract(p.html).page_md)
    timeIt("classify only") {
      var acc = 0L
      mds.foreach(md => acc +=
        graft.rules.ScalarRules.classifyPage(md, RuleSets.plugin).length)
      acc
    }
    timeIt("enumerateRows only") {
      var acc = 0L
      mds.foreach(md => acc += ScalarEvaluator.enumerateRows("Positions", md).size)
      acc
    }
    timeIt("full scalar pipeline") {
      var acc = 0L
      pages.foreach(p => acc += ScalarEvaluator.process(p, RuleSets.plugin).size)
      acc
    }
    // one-pass SimHash kernel vs the round-1 shape (64 independent
    // tokenize+hash passes, one per bit — what the HOF formulation cost)
    import graft.functions.SimHashKernel
    import org.apache.spark.unsafe.types.UTF8String
    val lowered = mds.map(md => UTF8String.fromString(md.toLowerCase.trim))
    timeIt("simhash64 one-pass") {
      var acc = 0L
      lowered.foreach(s => acc ^= SimHashKernel.xx64Simhash(s))
      acc
    }
    timeIt("simhash64 64-pass (r1 shape)") {
      var acc = 0L
      lowered.foreach { s =>
        val str = s.toString
        var out = 0L
        var b = 0
        while (b < 64) {
          var sum = 0L
          str.split("\\s+").foreach { tok =>
            if (tok.nonEmpty) {
              val u = UTF8String.fromString(tok)
              val h = org.apache.spark.sql.catalyst.expressions.XXH64
                .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
                  u.numBytes(), 42L)
              sum += (((h >>> b) & 1L) << 1) - 1
            }
          }
          if (sum > 0) out |= 1L << b
          b += 1
        }
        acc ^= out
      }
      acc
    }
  }
}
