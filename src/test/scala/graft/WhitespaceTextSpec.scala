package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** The r17 single-pass whitespace expressions must reproduce the regex
  * spellings they replaced EXACTLY — tokenization feeds every md5-pinned
  * shingle/simhash oracle value downstream. */
class WhitespaceTextSpec extends SparkSpecBase {
  import spark.implicits._

  private def oldNorm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(c, "\\s+", " "))
  private def oldToks(c: org.apache.spark.sql.Column) =
    split(oldNorm(c), " ")
  private def oldCount(c: org.apache.spark.sql.Column) =
    when(length(oldNorm(c)) === 0, 0).otherwise(size(oldToks(c)))

  private lazy val inputs = {
    val rnd = new scala.util.Random(7)
    val wsChars = " \t\n\f\r"
    val rand = (0 until 300).map { _ =>
      (0 until rnd.nextInt(60)).map { _ =>
        if (rnd.nextInt(3) == 0) wsChars(rnd.nextInt(wsChars.length))
        else ('a' + rnd.nextInt(26)).toChar
      }.mkString
    }
    val edge = Seq(
      "", " ", "  ", "\t", "\n\n", "a", " a", "a ", " a ", "a b", "a  b",
      "a\tb\nc", "\r\na b\f", "naïve café", // U+00A0 is NOT regex \s
      "中文 字符", "emoji 🙂\ttest", "x" * 3000 + " \n " + "y" * 10,
      "line1\nline2\nline1", "after-NEL") // U+0085 is NOT java \s
    (rand ++ edge).toDF("s")
  }

  test("normalizeWs / tokens / tokenCount match the regex spellings exactly") {
    val rows = inputs.select(
      TF.normalizeWs(col("s")).as("nn"), oldNorm(col("s")).as("on"),
      TF.tokens(col("s")).as("nt"), oldToks(col("s")).as("ot"),
      TF.tokenCount(col("s")).as("nc"), oldCount(col("s")).as("oc"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"normalize mismatch: ${r}")
      assert(r.getSeq[String](2) == r.getSeq[String](3), s"tokens mismatch: ${r}")
      assert(r.getInt(4) == r.getInt(5), s"count mismatch: ${r}")
    }
  }

  test("null input propagates null") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "s")
      .select(TF.normalizeWs(col("s")), TF.tokens(col("s")), TF.tokenCount(col("s")))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("already-normalized fast path returns identical value") {
    val r = Seq("abc def", "").toDF("s")
      .select(TF.normalizeWs(col("s")).as("n"), oldNorm(col("s")).as("o"))
      .collect()
    r.foreach(x => assert(x.getString(0) == x.getString(1)))
  }
}
