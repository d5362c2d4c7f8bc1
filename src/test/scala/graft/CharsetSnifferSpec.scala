package graft

import graft.extract.CharsetSniffer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the decode paths the q86 oracle cannot check (DuckDB decodes
  * only utf-8): utf-16 both endiannesses, latin-1/windows-1252 bytes,
  * alias normalization, and the unsupported-charset fallback.
  */
class CharsetSnifferSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def decodeBytes(bytes: Array[Byte])
      : org.apache.spark.sql.Row = {
    import spark.implicits._
    CharsetSniffer.decodePages(
      Seq(("u", bytes)).toDF("url", "bin"), "url", "bin").head()
  }

  test("utf-16 BOMs: detected, BOM stripped, decoded") {
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte,
      'h'.toByte, 0, 'i'.toByte, 0, '!'.toByte, 0)
    val rLe = decodeBytes(le)
    assert(rLe.getAs[String]("charset") === "utf-16le")
    assert(rLe.getAs[Boolean]("charset_supported"))
    assert(rLe.getAs[String]("text") === "hi!")
    assert(rLe.getAs[Long]("n_bytes") === 8L)

    val be = Array[Byte](0xFE.toByte, 0xFF.toByte,
      0, 'h'.toByte, 0, 'i'.toByte)
    val rBe = decodeBytes(be)
    assert(rBe.getAs[String]("charset") === "utf-16be")
    assert(rBe.getAs[String]("text") === "hi")
  }

  test("declared legacy charsets decode their high bytes") {
    val latin = ("<meta charset='ISO-8859-1'>caf".getBytes("ISO-8859-1")
      :+ 0xE9.toByte) ++ "!".getBytes("ISO-8859-1")
    val rL = decodeBytes(latin)
    assert(rL.getAs[String]("charset") === "iso-8859-1")
    assert(rL.getAs[String]("text").endsWith("café!"))

    // windows-1252 0x93/0x94 smart quotes — NOT valid latin-1 mapping
    val w = ("<meta charset=cp1252><body>".getBytes("windows-1252")
      :+ 0x93.toByte) ++ "q".getBytes("windows-1252") :+ 0x94.toByte
    val rW = decodeBytes(w)
    assert(rW.getAs[String]("charset") === "windows-1252")
    assert(rW.getAs[String]("text").endsWith("“q”"))
  }

  test("unsupported declaration falls back to utf-8, flagged") {
    val r = decodeBytes(
      "<meta charset=shift_jis><body>plain</body>".getBytes("UTF-8"))
    assert(r.getAs[String]("charset") === "shift_jis")
    assert(!r.getAs[Boolean]("charset_supported"))
    assert(r.getAs[String]("text").endsWith("plain</body>"))
  }

  test("no declaration defaults to utf-8") {
    val r = decodeBytes("<html>d</html>".getBytes("UTF-8"))
    assert(r.getAs[String]("charset") === "utf-8")
    assert(r.getAs[String]("text") === "<html>d</html>")
  }
}
