package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** The r17 digest-direct md5 hashes (Md5First8Long + shifts) must be
  * BIT-IDENTICAL to the conv(substring(md5(c), …), 16, 10) spelling they
  * replaced — the whole dedup/minhash/simhash oracle surface is pinned on
  * those exact values. */
class Md5HashingSpec extends SparkSpecBase {
  import spark.implicits._

  // the legacy spellings, verbatim from pre-r17 TextFunctions
  private def oldHex60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  private def oldHex32(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  private def oldHex32Hi(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  private lazy val inputs = {
    val rnd = new scala.util.Random(42)
    val rand = (0 until 400).map(_ =>
      rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString)
    val edge = Seq("", " ", "a", "0", "the quick brown fox", "naïve café",
      "中文字符串", "emoji 🙂 test", "tab\tand\nnewline", "x" * 5000,
      "0,1,2,3", "b,12,34,56,78")
    (rand ++ edge).toDF("s")
  }

  test("hexLong60/32/32Hi match the conv-of-md5-hex spelling bit-for-bit") {
    val rows = inputs.select(
      TF.hexLong60(col("s")).as("n60"), oldHex60(col("s")).as("o60"),
      TF.hexLong32(col("s")).as("n32"), oldHex32(col("s")).as("o32"),
      TF.hexLong32Hi(col("s")).as("nhi"), oldHex32Hi(col("s")).as("ohi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"hex60 mismatch: $r")
      assert(r.getLong(2) == r.getLong(3), s"hex32 mismatch: $r")
      assert(r.getLong(4) == r.getLong(5), s"hex32hi mismatch: $r")
    }
  }

  test("null input propagates null") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "s")
      .select(TF.hexLong60(col("s")), TF.hexLong32(col("s")), TF.hexLong32Hi(col("s")))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("non-string input casts like the md5 spelling did") {
    val r = Seq(12345L).toDF("v")
      .select(TF.hexLong60(col("v").cast("string")).as("n"),
        oldHex60(col("v").cast("string")).as("o")).head()
    assert(r.getLong(0) == r.getLong(1))
  }
}
