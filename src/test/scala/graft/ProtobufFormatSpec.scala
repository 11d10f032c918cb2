package graft

import java.nio.file.{Files, Paths}
import graft.sources.{BatchIngest, ProtobufFormat}

/** `protobuf` InputFormat round trip (reference: extensions-core/
  * protobuf-extensions ProtobufInputFormat.java +
  * FileBasedProtobufBytesDecoder.java). The fixture descriptor set and the
  * data messages are hand-encoded with the writer below — real protobuf
  * wire bytes per the public encoding spec, so the reader is exercised
  * against the format itself, not against its own writer. */
class ProtobufFormatSpec extends SparkSpecBase {

  // ---- minimal wire-format writer (test fixture side) ----

  private class Wire {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): this.type = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    def tag(field: Int, wireType: Int): this.type = varint((field.toLong << 3) | wireType)
    def str(field: Int, s: String): this.type = bytes(field, s.getBytes("UTF-8"))
    def bytes(field: Int, b: Array[Byte]): this.type = {
      tag(field, 2); varint(b.length); out.write(b); this
    }
    def int(field: Int, v: Long): this.type = { tag(field, 0); varint(v) }
    def double(field: Int, v: Double): this.type = {
      tag(field, 1)
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xff).toInt)); this
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** descriptor set for:
    *   package graft.test;
    *   message Nested { string note = 1; }
    *   message Event  { string name = 1; int64 count = 2; double score = 3;
    *                    repeated string tags = 4; sint64 delta = 5;
    *                    bool flag = 6; Nested nested = 7; }
    * encoded per descriptor.proto (FileDescriptorSet.file=1;
    * FileDescriptorProto package=2, message_type=4; DescriptorProto name=1,
    * field=2; FieldDescriptorProto name=1, number=3, label=4, type=5,
    * type_name=6). */
  private def field(name: String, number: Int, tpe: Int, repeated: Boolean = false,
      typeName: String = null): Array[Byte] = {
    val w = new Wire().str(1, name).int(3, number).int(4, if (repeated) 3 else 1).int(5, tpe)
    if (typeName != null) w.str(6, typeName)
    w.toBytes
  }
  private lazy val descriptorBytes: Array[Byte] = {
    val nested = new Wire().str(1, "Nested")
      .bytes(2, field("note", 1, ProtobufFormat.T.STRING)).toBytes
    val event = new Wire().str(1, "Event")
      .bytes(2, field("name", 1, ProtobufFormat.T.STRING))
      .bytes(2, field("count", 2, ProtobufFormat.T.INT64))
      .bytes(2, field("score", 3, ProtobufFormat.T.DOUBLE))
      .bytes(2, field("tags", 4, ProtobufFormat.T.STRING, repeated = true))
      .bytes(2, field("delta", 5, ProtobufFormat.T.SINT64))
      .bytes(2, field("flag", 6, ProtobufFormat.T.BOOL))
      .bytes(2, field("nested", 7, ProtobufFormat.T.MESSAGE, typeName = ".graft.test.Nested"))
      .toBytes
    val file = new Wire().str(2, "graft.test").bytes(4, nested).bytes(4, event).toBytes
    new Wire().bytes(1, file).toBytes
  }

  private def eventBytes(name: String, count: Long, score: Double,
      tags: Seq[String], delta: Long, flag: Boolean, note: String): Array[Byte] = {
    val w = new Wire().str(1, name).int(2, count).double(3, score)
    tags.foreach(t => w.str(4, t))
    w.int(5, (delta << 1) ^ (delta >> 63)) // zigzag
    w.int(6, if (flag) 1 else 0)
    w.bytes(7, new Wire().str(1, note).toBytes)
    w.toBytes
  }

  test("descriptor set parses: message registry + Spark schema (descriptor.proto layout)") {
    val msgs = ProtobufFormat.parseDescriptorSet(descriptorBytes)
    assert(msgs.keySet == Set("graft.test.Nested", "graft.test.Event"))
    val event = ProtobufFormat.resolve(msgs, "Event") // short-name resolution
    val schema = ProtobufFormat.structType(event, msgs)
    import org.apache.spark.sql.types._
    assert(schema.map(f => (f.name, f.dataType)) == Seq(
      ("name", StringType), ("count", LongType), ("score", DoubleType),
      ("tags", ArrayType(StringType, containsNull = false)), ("delta", LongType),
      ("flag", BooleanType),
      ("nested", StructType(Seq(StructField("note", StringType))))))
  }

  test("one message per file round trip (ProtobufInputFormat.java)") {
    val dir = Files.createTempDirectory("pbingest")
    Files.write(dir.resolve("a.pb"),
      eventBytes("alpha", 3L, 1.5, Seq("x", "y"), -7L, flag = true, "n1"))
    Files.write(dir.resolve("b.pb"),
      eventBytes("beta", 0L, -2.25, Nil, 42L, flag = false, "n2"))
    val desc = dir.resolve("events.desc")
    Files.write(desc, descriptorBytes)

    val df = BatchIngest.read(spark, BatchIngest.IngestSpec(
      inputPath = dir.toString + "/*.pb",
      inputFormat = "protobuf",
      formatOptions = Map(
        "descriptorFile" -> desc.toString,
        "protoMessageType" -> "graft.test.Event")))
    val rows = df.orderBy("name").collect()
    assert(rows.length == 2)
    val a = rows(0)
    assert((a.getString(0), a.getLong(1), a.getDouble(2), a.getSeq[String](3),
      a.getLong(4), a.getBoolean(5), a.getStruct(6).getString(0)) ==
      (("alpha", 3L, 1.5, Seq("x", "y"), -7L, true, "n1")))
    val b = rows(1)
    assert((b.getString(0), b.getLong(1), b.getDouble(2), b.getSeq[String](3),
      b.getLong(4), b.getBoolean(5), b.getStruct(6).getString(0)) ==
      (("beta", 0L, -2.25, Seq(), 42L, false, "n2")))
  }

  test("delimited stream: many varint-length-prefixed messages per file") {
    val dir = Files.createTempDirectory("pbdelim")
    val out = new java.io.ByteArrayOutputStream()
    (1 to 5).foreach { i =>
      val m = eventBytes(s"e$i", i.toLong, i * 0.5, Seq(s"t$i"), -i.toLong, i % 2 == 0, s"n$i")
      val w = new Wire().varint(m.length)
      out.write(w.toBytes); out.write(m)
    }
    Files.write(dir.resolve("stream.pb"), out.toByteArray)
    val desc = dir.resolve("events.desc")
    Files.write(desc, descriptorBytes)

    val df = BatchIngest.read(spark, BatchIngest.IngestSpec(
      inputPath = dir.toString + "/stream.pb",
      inputFormat = "protobuf",
      formatOptions = Map(
        "descriptorFile" -> desc.toString,
        "protoMessageType" -> "Event",
        "delimited" -> "true")))
    val rows = df.orderBy("count").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).toSeq == (1 to 5).map(i => s"e$i"))
    assert(rows.map(_.getLong(4)).toSeq == (1 to 5).map(i => -i.toLong))
    // and the decoded table drives a normal aggregate
    df.createOrReplaceTempView("pb_events")
    assert(spark.sql("SELECT SUM(count) FROM pb_events").head().getLong(0) == 15L)
  }

  test("unknown fields skip; unknown message type errors with the known list") {
    // a message with an extra field number 99 (string) decodes, ignoring it
    val extra = {
      val base = eventBytes("gamma", 1L, 0.0, Nil, 0L, flag = false, "n")
      val w = new Wire().str(99, "ignored")
      base ++ w.toBytes
    }
    val msgs = ProtobufFormat.parseDescriptorSet(descriptorBytes)
    val event = ProtobufFormat.resolve(msgs, "Event")
    val row = ProtobufFormat.decode(extra, 0, extra.length, event, msgs)
    assert(row.getUTF8String(0).toString == "gamma")
    val err = intercept[IllegalArgumentException] {
      ProtobufFormat.resolve(msgs, "NoSuchMessage")
    }
    assert(err.getMessage.contains("graft.test.Event"))
  }
}
