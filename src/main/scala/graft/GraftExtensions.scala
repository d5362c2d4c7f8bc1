package graft

import graft.functions.{IdnToUnicode, IsinValid, Md5Prefix32, SimHashMd5, SimHashXx64, UnicodeNormalize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point for deployments that want the native
  * expressions available in SQL from the first query:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *
  * Injects the same functions `GraftFunctions.register` adds to a
  * live session (isin_valid, md5_prefix32, simhash16, simhash64, nfc,
  * nfkc) —
  * this is the config-driven path a platform team ships in its base
  * image, where user code never gets a chance to call register().
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("isin_valid"),
      info("isin_valid", "isin_valid(str) - ISIN shape + checksum"),
      exprs => IsinValid(exprs.head)))
    ext.injectFunction((FunctionIdentifier("md5_prefix32"),
      info("md5_prefix32", "md5_prefix32(str) - first 8 md5 hex chars as bigint"),
      exprs => Md5Prefix32(exprs.head)))
    ext.injectFunction((FunctionIdentifier("simhash16"),
      info("simhash16", "simhash16(str) - portable 16-bit simhash"),
      exprs => SimHashMd5(exprs.head, 16)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(str) - 64-bit xxhash simhash"),
      exprs => SimHashXx64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("nfc"),
      info("nfc", "nfc(str) - Unicode NFC normalization"),
      exprs => UnicodeNormalize(exprs.head, "NFC")))
    ext.injectFunction((FunctionIdentifier("nfkc"),
      info("nfkc", "nfkc(str) - Unicode NFKC compatibility normalization"),
      exprs => UnicodeNormalize(exprs.head, "NFKC")))
    ext.injectFunction((FunctionIdentifier("idn_to_unicode"),
      info("idn_to_unicode",
        "idn_to_unicode(host) - punycode/ACE host to Unicode (RFC 3490)"),
      exprs => IdnToUnicode(exprs.head)))
  }
}
