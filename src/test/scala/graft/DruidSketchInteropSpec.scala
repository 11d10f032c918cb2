package graft

import java.util.Base64
import org.apache.spark.sql.functions._
import graft.plans.DruidHllc

/** Druid HyperLogLogCollector binary-interop spec. The four base64 sketches
  * and the folded-estimate expectation are the reference's OWN test vectors
  * (hll/src/test/java/org/apache/druid/hll/HyperLogLogCollectorTest.java:831
  * testFoldOrder: every fold order must estimate 1.0429189446653817E7), so
  * this verifies byte-level parsing of real collector payloads, not a
  * round-trip through our own encoder. */
class DruidSketchInteropSpec extends SparkSpecBase {
  import spark.implicits._

  private val vectors: Seq[String] = Seq(
    "AQcH/xYEMXOjRTVSQ1NXVENEM1RTUlVTRDI1aEVnhkOjNUaCI2MkU2VVhVNkNyVTa4NEYkS0kjZYU1RDdEYzUjglNTUzVFM0NkU3ZFUjOVJCdlU0N2QjRDRUV1MyZjNmVDOUM2RVVFRzhnUzVXY1R1RHUnNziURUdmREM0VjVEQmU0aEInZYNzNZNVRFgzVFNolSJHNIQ3QklEZlNSNoNTJXpDk1dFWjJGNYNiQzQkZFNEYzc1NVhSczM2NmJDZlc3JJRCpVNiRlNEI3dmU1ZGI0Q1RCMhNFZEJDZDYyNFOCM3U0VmRlVlNIRVQ4VVw1djNDVURHVSaFU0VEY0U1JFNIVCYlVEJWM2NWU0eURDOjQ6YyNTYkZjNUVjR1ZDdnVkMzVHZFpjMzlmNEFHM0dHJlRYTHSEQjVZVVZkVVIzIjg2SUU0NSM0VFNDNCdGVlQkhBNENCVTZGZEVlxFQyQ0NYWkUmVUJUYzRlNqg4NVVTNThEJkRGNDNUNFSEYmgkR0dDR1JldCNhVEZGRENGc1NDRUNER3WJRTRHQ4JlOYZoJDVVVVMzZSREZ1Q1UjSHNkdUMlU0ODIzZThSNmNDNjQ1o2I0YiRGYyZkNUJYVEMyN2QpQyMkc2VTE4U2VCNHZFRDNTh0IzI2VFNTMlUkNGMlKTRCIyR3QiQzFUNkRTdDM6RDRFI3VyVlcyWCUlQ0YjNjU2Q2dEVFNTRyRlI7VElHVTVVNGk0JHJTQzQkQyVlV0NCVlRkhWYkQ0RVaDNYdFZHWEWFJEYpM0QjNjNVUzNCVzVkgzZGFzQkRZUzN2U1dUFGVWZTUzVUREZDciZEVVYVNjeCU0ZDdEhzIpU2RTOFRUQkWlk1OFRUVTN1MkZSM3ZFc1VDNnUmc2NKNUaUIzd3M0RWxEZTsiNENLVHU0NFUmQ2RWRFdCNUVENFkxZCEnRLQkNEU0RVNmVDQjl9ZmNkM1QVM0MzQkUjJlVHRkNEVWlENDVUIlUvRkM0RVY1UzY6OGVHVCRDIzRUUlUjM2RDWSVkVIU1U1ZiVFNlNDhTN1VWNTVEZ2RzNzVDQlY0ZUNENUM5NUdkRDJGYzRCUzIjRGR4UmJFI4GDRTUiQ0ZUhVY1ZEYoZSRoVDYnREYkQ1SUU0RWUycjp2RZIySVZkUmZDREZVJGQyVEc1JElBZENEU2VEQlVUUnNDQziLRTNidmNjVCtjRFU2Q0SGYzVHVpGTNoVDxFVSMlWTJFQyRJdV1EI3RDloYyNFQ0c1NVY0ZHVEY0dkM2QkQyVDVUVTNFUyamMUdSNrNz0mlFlERzZTSGhFRjVGM3NWU2NINDI2U1RERUhjY4FHNWNTVTV1U0U2I0VXNEZERWNDNUSjI1WmMmQ4U=",
    "AQgH+BUFUEUrZVRjM2IjMzJRESMlUnlTJjEjRhRlNBEyMSUpaGJTMjRCIzMTNCRENRdxNiNEZCQzNERYMiAyIiQmUTI+MhEzV1RWJoMjQjIySDN0QiYDUjUzNjRUVEYyQleDEiUmg0ERRjIjIzJUQjMxNlJGUTNDJFNTRzJiE1M0RjQzUzIiFDUmMjIzJWVCNENTIRJVODUzEkIVMhFEIjM0MkMyIRRCNFNxQyNCQ2UzOFQiJSM0EzU1V1M2EjhUVENDclZzImEiMTJBQlQiJCgyIyKkJSUlNBNDE2M3QSIyMicjMlJEUhJDJFQjJ0VSQ0QyYSFhZSNlQ4REUzVFIlOFRHIkYUJEM8RVMkMiMEczQwMlE1EkAlNiQlhCNkISRVI0ITUjRDU1JVNlK1QyGGRHQVM0NUVHQ1MkMyQoIzMzFCFUI0IhU1OIhCIlZUQVIUMyYzMlMUZ0RCKEIigUIlQ0QkQTM0MkM0QyJkUSM2I2tHJDUTQ0RBQ0YyNlUxUzIiIiMUiSMzUlJDNDQjM0ITQyNIM1MyNWM0MDOTZYVDRWIiZhMzc0NCJ0Q0NDZEMUElMyRyMmUhNiMkIZNjMkEyRTIzYkMzNUODUTNDJVM0ZTQjFCJCNWSTUlEiNCM1U2FCZUJzMVMyLjNkMhITVDEjIYMzNiVmIlO1VTMjMiVDQ2NTJFYyE0Q2IjRDN2IjRTRUVTFUVEYVKBVSMVJSFE0zOXNSJIqVElMVM4MiZEFSMhRlJEJUZnMycmQmQyJDl1JzVjMXQ0MzMjE1VUI1JDJUQyYRQ2JVZzQUJDM2IyInEkY1QiZTJEMRMiMxRVNEUjJUNkJHNSQiNCVCIyIjJUQlEhNUdFUhQzgkcSZaJUVUM0YiJEM2SjczUUIUIlQiM0RiQkIzZhRBJSRzQ0ZUI00UUSRSQlQmMkNINzODQhJFRTZ0FRQ3QTRhIzFTJFRBMmMzQzQhZENUMiIlV2VEMiNFRWQ1F1IyFXRSUyRTMqZ3I0YyhUNEJRMjISZRc2NDOEIjIxVGVWIXYyMiNCJBFDQSMhIzMjVFIDElgyJCUyVFgkRSQzIjJFQlNWRTQWMmQzFFOiMzVTZGMxNFZUNmIjRjETNUNURERTQjYVIkEzNEEyNDNTVUJSVzVkMjEyUlMjQ0RGgyFFNUQhRGMmRUQ2ZSOFETUYNlZCUhRiU2QhVUUiIlJDRjMhRVJDZxNSRTNBRCEoI0FGNUVRE0VFOGdCRDM2QkJCFSQhMxITRoE0VFIzVWUiUTNkRhNDMiMmIzRDQSNTFDoldaJDcnNjkSMJg3IkIiRENSQmciUhY2NFQ4RSNoJENkWDMmVCJGMxQjJGJScyNTJDVDNEEiZSMzQyIyVGRTNEIUw=",
    "AQgH+hQAFyMzlFVXNCNlRxRUYlRUUUZCMnRFJiR0WTgyZiRJZzRFQkVTVVVWc2ZFMlY1QkIxYUQTI0JDY1YkNEVENGUuQTRiNkQ0VUEzNkKUKLSIVkUhNiZURnRFMzcjVEBTdjVVVCIzJDM0hjc0RDVlVjRqMjJVZTNSM0QmQyMTRlNzVCNERFQyMxNBZHMiUSdYIUUjNlVjNzRyYWFHRHI3hKMnYnhFNCZOdlNUZBM0Q0clNTVBiEQRMUQzNSNVQ0IkEmZYNzIyNkRSUik2VBOVRCRDg0IilEMlcjRJMkJDSjRCJURTVDJBMmRTVBM1YyRRMSQoRDV2YzRDVCUkQWFFNDYnQ0IkUzRjRkQ1dGI0VUYzRERCQ1I2dFNhREOUUjJDc0NTN0JFNUZJRGFpU1Q0QyJlNiMzNCZSKFQzYnNUWTMiRGMiRWdSQzMiQnQ0QSgjVUMiE0hRM1NVUiZVIlRkRVMzI2VkRjQWQ1YyRiZWNHQXQ0UllUMSVTJDQzMkWCQiRFglMzIzKEYzJSJFMyREVIQlVFFlYzMDQyVWUZNCQlM0NUJFIkWiNnREdEJDImNWJDOIcmKyQzc5VDVRQ3PVNjQzIkJTQ3FzMjMyRFVFVTUlNUZEMzEjI0Q0M0Y2U1JTREQjIhZScUJjQkYhFRJFQyI0pTVmFTVlMkJXNDI1U3dFZkR2U0NCVRQyRih0UkIhckRUY0ZHSG00EiJUdVIxVjVGNnUVZCxEQkNTQjQ0IkZDciIkODYxM1MzRZRHQxVEZHZWJFIzRRZjVDNBMzI1Q1FEhUMiI0NkJWJWJDJzYlQiRSQjRoRiRhJTIjNSRVJEM1MiYmUiNBkjFkczRWU1SURIJUVDRFQ0QyZCUlRENEImE2FDQxRjlEdTI3RSNEU3RGJyWDNVMTVJNDM1QkJFQmNWRXUlcxNEQzNTGCtDUlNDMzMzY2VlcUQlaUIyZVMzA3NFM1NDc0JjZDUkQiFDY3QUczQzUkVDQjMiUWQ0NEQyNRVTMRJFM2RUMZNSQkQ0MkIiUgGCUkRig1UiElQkdDJFJDciVGIxMjQzI1UlNlRTM1JkRDc+RSM0VFUzMjWCU0RDMxJyJVJGI1VTEUQyM1R0I1c0NFNTM3MhIlUkNFIlZGNURkVURyNIVCMyYzQmQjITRkVHQ2NINGQ0Y0UW0icyUzMydEVBJVJIJENkUjRVIjQSNVYnEzVYMzUmYzGVNFRiQk0iVTVCM0RjJSMyRWRSQkURJBR0M0NzhnRlM3IzQxMTRDJjM1UVUkJCNUQTVGQlEzN0VDMyM0MmO2QoQzNSVURhFEAkU2IldINHRUU00zNFJVQxUkZEcVMyJSJkQjKFNCNUOzIYJEHEUyKCQjJESSY=",
    "AQcH/x0BbjQ2JTpUlkdFRERHVDRkWDU0RGR1ejRURHZ6IzUqdJN1M1VFQiNHI1NTI0J1VHOGZYVFVTRIRJVkVmUolWVShERjSDRVMlRlJDU2VFh3UmR1Mjg3K0M2SUY0Q0ZUspNiJEdZMmc3YkxGSERGOGdjgzNRVGM1Q1UnN0RHU1Y0WWUzRWVEJSRSeGQ0RlNFJVVJU3YoQkdEQ2M2MiVFUyJWRUVWNmRkM0NkVER2WXNkR0QlNGNEVlYzZSS4RDMyVEQ1ckRTM0ZoMlQ2tURGQ0OFQ0ZiY1ZFNEajdXEjVSI6ZWSjNHVRRTRVMldzUjm0NGU0dlhESFRDM0IzVCYkdjdlJJRFVDaHEzUkRmNWOEVXZTM0U0VkREdSUjRHVVViVCVFVUN0RDNDkl01VHMoNVQzYlZFZmNVVUNDQ1VjUiQ2NTV0UzZVModSNEY4Zpc2JjhjiFJVUGM0SHI0UzRTU1R2R0d3VENUZSQzRUZlY4d0aGNkhTQzWVZFZTZkJ2NEZaVDU1alJWpFJpRGRnIlZUU1ZUR2M1NzOkVEMzVjZERiVlRYSEkmU4RLM0RTQ2Q2RjM3RTNhdVVEQzRXJUZTRmM1OEZTYyJkRGRjZDVTlDhSMzdXQiU1RFUiIoRpVGlXIjY1UVVjc0RDJDNSM0NVJTNkRUU1U0lDdEVXY2NGVVNJVmJJRTREVVNiMyVIQ3U6O0U0M0MzZFVVIzJmNERWJaJjikIlRXk1hFQ2NEU0RUN4UzdENEsVgzZFVidXUnU2VRZFRUQmZmRERCQ0ZER2Q3YnZFNlVpJUkzZVREKFWEUzVVMzYzQzQhfTYzQ0IlI5UoV0RGJCVXSDkyZCRSU3ITUkNoYzJUMkYzhlVVRTNyaDNmQzRDVVRjNkVUhEJyRBR2JlOEREVUU0RjY4Nkc3ZERGUyVDNFZGNFOTY3U1OKNlkjQy1TVlRTQ0M1REU2QhgzUzUzOWlWQ1Z3RTQzIzc7RXVkI0M4NCNYRVRGNEZbhFEyVJI0R1OUZEQ3VUVEQlU1NkNYJEYzdSQ0ZSNGeEWIVVU3KEVFY1RZQ0JSNEJFNFMyM0UzN0hHNTQjMlRGNkiEMyVjRFNVRXNkZGM2M4hENCMnU1VWQjNFRkO2VmO1RndEVzWTQiiHQ0NzM2clM4NjQxpjQjZEVTNEpEdlREJzc3OjZnRlNFNWJVNFeDokNCRmQ5NURJVUZSJyRDRXikVURVITZDNGW0ITNEOUQ0RUklZDQjYjVENURDRCRmRDU1hCY2VTR0RGIzJSZzlSczdTFJJkRlZyU1M1JTdVhDYhVFczQ0hTRIc0RCNDdUJEQxNlZEQ2ZEUiJJRFU3YzVGRER0R2ZlNFOTU1MyRGI0RzMkQ2Q="
  )

  private def bytes(i: Int): Array[Byte] = Base64.getDecoder.decode(vectors(i))

  test("decoded fold of the reference's testFoldOrder vectors matches its exact estimate") {
    val acc = new Array[Int](DruidHllc.NumBuckets)
    vectors.indices.foreach(i => DruidHllc.mergeInto(acc, bytes(i)))
    assert(math.abs(DruidHllc.estimate(acc) - 1.0429189446653817e7) < 1.0)
    // fold order must not matter (the reference permutes all orders)
    val rev = new Array[Int](DruidHllc.NumBuckets)
    vectors.indices.reverse.foreach(i => DruidHllc.mergeInto(rev, bytes(i)))
    assert(DruidHllc.estimate(rev) == DruidHllc.estimate(acc))
  }

  test("single-collector estimates are plausible HLL readings of the vectors") {
    val singles = vectors.indices.map(i => DruidHllc.estimate(bytes(i)))
    // values derived once from the verified decoder; pinned to catch parsing
    // regressions (the folded value above is the reference-asserted anchor)
    val expected = Seq(2440618.528853266, 2614479.2932464965, 3225905.892456509, 2461385.00191827)
    singles.zip(expected).foreach { case (got, exp) => assert(math.abs(got - exp) < 1e-6) }
  }

  test("an empty V1 collector estimates zero; an all-ones dense register set uses raw correction") {
    val empty = Array[Byte](1, 0, 0, 0, 0, 0, 0)
    assert(DruidHllc.estimate(empty) == 0.0)
    val dense = Array.fill[Byte](7 + 1024)(0x11.toByte)
    dense(0) = 1; dense(1) = 0; dense(2) = 0; dense(3) = 0; dense(4) = 0; dense(5) = 0; dense(6) = 0
    val est = DruidHllc.estimate(dense)
    // all 2048 registers at value 1: e = alpha*m^2/(m/2) = 2*alpha*m
    val alpha = 0.7213 / (1 + 1.079 / 2048)
    assert(math.abs(est - 2 * alpha * 2048) < 1e-9)
  }

  test("classic DoublesSketch bytes feed the existing quantile post-agg expressions " +
      "(the format a Druid cluster's quantilesDoublesSketch columns store)") {
    graft.functions.GraftSqlFunctions.register(spark)
    // Druid serializes through this exact library call
    // (extensions-core/datasketches DoublesSketchAggregatorFactory)
    val classic = org.apache.datasketches.quantiles.DoublesSketch.builder().setK(128).build()
    (1 to 10000).foreach(i => classic.update(i.toDouble))
    val classicBytes = classic.compact().toByteArray
    assert((classicBytes(2) & 0xff) == 8) // Family.QUANTILES
    val kll = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    (1 to 10000).foreach(i => kll.update(i.toDouble))
    val kllBytes = kll.toByteArray
    assert((kllBytes(2) & 0xff) == 15) // Family.KLL

    Seq((classicBytes, "classic"), (kllBytes, "kll")).toDF("sk", "fmt")
      .createOrReplaceTempView("quantile_sketches")
    val rows = spark.sql(
      """SELECT fmt, DS_GET_QUANTILE(sk, 0.5) AS median, DS_RANK(sk, 2500.0) AS r,
        |       DS_QUANTILES_N(sk) AS n
        |FROM quantile_sketches ORDER BY fmt""".stripMargin).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - 5000.0) < 200.0, s"${r.getString(0)} median")
      assert(math.abs(r.getDouble(2) - 0.25) < 0.02, s"${r.getString(0)} rank")
      assert(r.getLong(3) == 10000L)
    }
  }

  test("HLLC_BUILD emits reference V1 bytes: single-value sparse fixture " +
      "(byte-level: header, position-with-header-offset, register nibble)") {
    import graft.plans.DruidHllcBuild
    val st = new DruidHllcBuild.State
    val hashed = DruidHllcBuild.hashValue("foo")
    DruidHllcBuild.addHashed(st, hashed)
    val bytes = DruidHllcBuild.toBytes(st)
    // sparse: 7-byte header + exactly one (short position, byte register)
    assert(bytes.length == 10)
    assert(bytes(0) == 1)                   // version
    assert(bytes(1) == 0)                   // registerOffset
    val bb = java.nio.ByteBuffer.wrap(bytes)
    assert(bb.getShort(2) == 1)             // numNonZeroRegisters
    assert(bytes(4) == 0 && bb.getShort(5) == 0) // no overflow
    // independent recomputation of bucket/position from the hash bytes
    val bucket = (((hashed(14) & 0xff) << 8) | (hashed(15) & 0xff)) & 0x7ff
    var position = 0; var i = 0; var found = false
    while (i < 8 && !found) {
      val b = hashed(i) & 0xff
      if (b == 0) position += 8
      else { position += Integer.numberOfLeadingZeros(b) - 24 + 1; found = true }
      i += 1
    }
    // sparse position = bucket-pair byte index + header size (the writer
    // emits i + startPosition - initPosition; HyperLogLogCollector.java:494)
    assert((bb.getShort(7) & 0xffff) == (bucket >> 1) + 7)
    val nibble = if ((bucket & 1) == 0) (bytes(9) & 0xf0) >>> 4 else bytes(9) & 0x0f
    assert(nibble == position)
    // the read path decodes the build output (sparse +7 regression cover)
    val regs = DruidHllc.registerValues(bytes)
    assert(regs(bucket) == position)
    assert(regs.count(_ != 0) == 1)
    // an empty state serializes to the bare 7-byte header (estimates 0)
    val empty = DruidHllcBuild.toBytes(new DruidHllcBuild.State)
    assert(empty.toSeq == Seq[Byte](1, 0, 0, 0, 0, 0, 0))
    assert(DruidHllc.estimate(empty) == 0.0)
  }

  test("HLLC_BUILD → read-path estimate round trip within HLL tolerance, " +
      "sparse (<128 registers) and dense forms") {
    import graft.plans.{DruidHllc, DruidHllcBuild}
    // sparse: 50 distinct values set <128 registers
    val sparse = new DruidHllcBuild.State
    (1 to 50).foreach(i => DruidHllcBuild.addHashed(sparse, DruidHllcBuild.hashValue(s"v$i")))
    val sparseBytes = DruidHllcBuild.toBytes(sparse)
    assert(sparseBytes.length < 7 + 1024) // sparse encoding chosen
    assert(math.abs(DruidHllc.estimate(sparseBytes) - 50.0) < 5.0)
    // dense: 100k distinct values force the 1024-byte payload
    val dense = new DruidHllcBuild.State
    (1 to 100000).foreach(i => DruidHllcBuild.addHashed(dense, DruidHllcBuild.hashValue(s"w$i")))
    val denseBytes = DruidHllcBuild.toBytes(dense)
    assert(denseBytes.length == 7 + 1024)
    // HLL standard error for 2048 buckets ≈ 2.3%; allow 4 sigma
    assert(math.abs(DruidHllc.estimate(denseBytes) - 100000.0) / 100000.0 < 0.1)
  }

  test("HLLC_BUILD distributes: SQL aggregate with shuffle-merged partials, " +
      "and its output feeds HLLC_UNION_ESTIMATE like a stored Druid column") {
    graft.functions.GraftSqlFunctions.register(spark)
    spark.range(20000).selectExpr("id", "id % 8 AS g", "CONCAT('u', id % 5000) AS u")
      .repartition(8).createOrReplaceTempView("hllc_build_src")
    // per-group collectors (what an ingest-time rollup would store), then
    // union-estimated back — the full write→read interop cycle
    val row = spark.sql(
      """SELECT HLLC_UNION_ESTIMATE(sk) AS est FROM (
        |  SELECT g, HLLC_BUILD(u) AS sk FROM hllc_build_src GROUP BY g
        |)""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 5000.0) / 5000.0 < 0.1)
    // direct build over the whole column agrees with the unioned partials
    val direct = spark.sql(
      "SELECT HLLC_ESTIMATE(HLLC_BUILD(u)) AS est FROM hllc_build_src").head()
    assert(math.abs(direct.getDouble(0) - row.getDouble(0)) / 5000.0 < 0.05)
  }

  test("HLLC_ESTIMATE and HLLC_UNION_ESTIMATE work over a binary sketch column in SQL") {
    graft.functions.GraftSqlFunctions.register(spark)
    vectors.indices.map(bytes).toDF("hllc").createOrReplaceTempView("druid_sketches")
    val row = spark.sql(
      """SELECT HLLC_UNION_ESTIMATE(hllc) AS unioned,
        |       MIN(HLLC_ESTIMATE(hllc)) AS min_single
        |FROM druid_sketches""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0429189446653817e7) < 1.0)
    assert(math.abs(row.getDouble(1) - 2440618.528853266) < 1e-6)
  }

  // ---- WRITE-side interop: bytes a reference deployment can read ----

  test("classic DoublesSketch write side: family-8 compact bytes readable by the " +
      "reference's own wrap call (DoublesSketchOperations.java:56)") {
    import graft.plans.SketchFunctions
    import spark.implicits._
    val values = (1 to 1000).map(_.toDouble)
    val sk = values.toDF("v").repartition(4) // force shuffle-merged partials
      .agg(SketchFunctions.classicQuantilesSketch(col("v"), 128).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    // classic quantiles preamble: family id 8 at byte 2 (DataSketches
    // Family.QUANTILES — the id the reference's module stores and reads)
    assert(sk(2) == 8.toByte)
    // the reference's exact deserialization path
    val ref = org.apache.datasketches.quantiles.DoublesSketch.wrap(
      org.apache.datasketches.memory.Memory.wrap(sk))
    assert(ref.getN == 1000L)
    assert(math.abs(ref.getQuantile(0.5) - 500.0) < 25.0)
    assert(ref.getMinItem == 1.0 && ref.getMaxItem == 1000.0)
    // and the engine's family-dispatching read path consumes its own output
    assert(math.abs(graft.plans.QuantileSketchBytes.wrap(sk).quantile(0.5) - 500.0) < 25.0)
  }

  test("theta write side: compact family-3 bytes readable by the reference's " +
      "SketchHolder deserialize (SketchHolder.java:240-242)") {
    import graft.plans.SketchFunctions
    import spark.implicits._
    val sk = (1 to 500).map(_.toString).toDF("v").repartition(4)
      .agg(SketchFunctions.thetaSketch(col("v"), 12).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    // compact theta preamble: family id 3 at byte 2 (Family.COMPACT)
    assert(sk(2) == 3.toByte)
    val ref = org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(sk))
    assert(math.abs(ref.getEstimate - 500.0) < 15.0)
  }
}
