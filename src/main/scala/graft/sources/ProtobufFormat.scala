package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `protobuf` InputFormat (reference: extensions-core/protobuf-extensions
  * .../ProtobufInputFormat.java + FileBasedProtobufBytesDecoder.java — a
  * binary FileDescriptorSet "descriptor" file plus a `protoMessageType`
  * select the schema; each record's bytes decode into a flat row).
  *
  * No protobuf-java ships in this sandbox, so BOTH the descriptor set and
  * the data messages are decoded by the self-contained wire-format reader
  * below — the encoding (varint / zigzag / length-delimited / fixed) and
  * descriptor.proto's own field numbers are public, stable protocol
  * documentation. Scope: proto2/proto3 scalar fields, repeated fields
  * (expanded and packed), nested messages (→ struct columns), enums (→
  * their numeric value). Groups (deprecated wire types 3/4) are skipped.
  *
  * Spark mapping mirrors the Druid column model: every integer kind →
  * LongType, float → FloatType, double → DoubleType, bool → BooleanType,
  * string → StringType, bytes → BinaryType, repeated T → ArrayType(T),
  * message → StructType. Decoding runs as a Catalyst expression over
  * `binaryFile` rows — the descriptor is parsed ONCE on the driver, the
  * schema is static in the plan, and record decode distributes with the
  * scan (no driver loop; at 100 TB the descriptor is plan metadata, the
  * messages never leave executors).
  */
object ProtobufFormat {

  // ---- wire-format reader (protobuf encoding spec) ----

  final class WireReader(val bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (shift < 64) {
        val b = bytes(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def readTag(): (Int, Int) = {
      val v = readVarint(); ((v >>> 3).toInt, (v & 7).toInt)
    }
    /** Returns (start, length) of a length-delimited payload and skips it. */
    def readDelimited(): (Int, Int) = {
      val len = readVarint().toInt
      val s = pos
      if (len < 0 || s + len > end) throw new IllegalArgumentException("truncated field")
      pos += len
      (s, len)
    }
    def readFixed32(): Int = {
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def readFixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => readDelimited()
      case 3 => // deprecated group: skip nested fields until END_GROUP
        var depth = 1
        while (depth > 0) {
          val (_, wt) = readTag()
          wt match {
            case 3 => depth += 1
            case 4 => depth -= 1
            case other => skip(other)
          }
        }
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unknown wire type $other")
    }
  }

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  // ---- descriptor model (descriptor.proto field numbers) ----

  /** FieldDescriptorProto.Type values (descriptor.proto). */
  object T {
    val DOUBLE = 1; val FLOAT = 2; val INT64 = 3; val UINT64 = 4; val INT32 = 5
    val FIXED64 = 6; val FIXED32 = 7; val BOOL = 8; val STRING = 9; val GROUP = 10
    val MESSAGE = 11; val BYTES = 12; val UINT32 = 13; val ENUM = 14
    val SFIXED32 = 15; val SFIXED64 = 16; val SINT32 = 17; val SINT64 = 18
  }

  final case class FieldDesc(name: String, number: Int, tpe: Int,
      repeated: Boolean, typeName: String)
  final case class MessageDesc(fullName: String, fields: Seq[FieldDesc])

  /** Parse a serialized google.protobuf.FileDescriptorSet into a map of
    * fully-qualified message name → descriptor. Only the pieces the decoder
    * needs are read (FileDescriptorSet.file=1; FileDescriptorProto name=1,
    * package=2, message_type=4; DescriptorProto name=1, field=2,
    * nested_type=3; FieldDescriptorProto name=1, number=3, label=4, type=5,
    * type_name=6). */
  def parseDescriptorSet(bytes: Array[Byte]): Map[String, MessageDesc] = {
    val out = scala.collection.mutable.Map.empty[String, MessageDesc]

    def str(r: WireReader): String = {
      val (s, l) = r.readDelimited(); new String(bytes, s, l, "UTF-8")
    }

    def parseField(start: Int, len: Int): FieldDesc = {
      val r = new WireReader(bytes, start, start + len)
      var name = ""; var number = 0; var label = 1; var tpe = 0; var typeName = ""
      while (r.hasNext) {
        val (f, wt) = r.readTag()
        f match {
          case 1 => name = str(r)
          case 3 => number = r.readVarint().toInt
          case 4 => label = r.readVarint().toInt // 3 = LABEL_REPEATED
          case 5 => tpe = r.readVarint().toInt
          case 6 => typeName = str(r)
          case _ => r.skip(wt)
        }
      }
      FieldDesc(name, number, tpe, repeated = label == 3, typeName.stripPrefix("."))
    }

    def parseMessage(start: Int, len: Int, prefix: String): Unit = {
      val r = new WireReader(bytes, start, start + len)
      var name = ""
      val fields = Seq.newBuilder[FieldDesc]
      val nested = Seq.newBuilder[(Int, Int)]
      while (r.hasNext) {
        val (f, wt) = r.readTag()
        f match {
          case 1 => name = str(r)
          case 2 => fields += { val (s, l) = r.readDelimited(); parseField(s, l) }
          case 3 => nested += r.readDelimited()
          case _ => r.skip(wt)
        }
      }
      val fullName = if (prefix.isEmpty) name else s"$prefix.$name"
      out(fullName) = MessageDesc(fullName, fields.result())
      nested.result().foreach { case (s, l) => parseMessage(s, l, fullName) }
    }

    val top = new WireReader(bytes, 0, bytes.length)
    while (top.hasNext) {
      val (f, wt) = top.readTag()
      if (f == 1 && wt == 2) { // FileDescriptorSet.file
        val (fs, fl) = top.readDelimited()
        val fr = new WireReader(bytes, fs, fs + fl)
        var pkg = ""
        val messages = Seq.newBuilder[(Int, Int)]
        while (fr.hasNext) {
          val (ff, fwt) = fr.readTag()
          ff match {
            case 2 => pkg = str(fr)
            case 4 => messages += fr.readDelimited()
            case _ => fr.skip(fwt)
          }
        }
        messages.result().foreach { case (s, l) => parseMessage(s, l, pkg) }
      } else top.skip(wt)
    }
    out.toMap
  }

  /** Resolve `protoMessageType` like the reference's decoder: exact
    * fully-qualified match first, then unique suffix match
    * (FileBasedProtobufBytesDecoder accepts the short name). */
  def resolve(msgs: Map[String, MessageDesc], messageType: String): MessageDesc =
    msgs.getOrElse(messageType, {
      val suffix = msgs.values.filter(_.fullName.endsWith(s".$messageType")).toSeq
      suffix match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"protoMessageType '$messageType' not found in descriptor (known: ${msgs.keys.toSeq.sorted.mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"protoMessageType '$messageType' is ambiguous: ${many.map(_.fullName).mkString(", ")}")
      }
    })

  def sparkType(f: FieldDesc, msgs: Map[String, MessageDesc]): DataType = {
    val base: DataType = f.tpe match {
      case T.DOUBLE => DoubleType
      case T.FLOAT => FloatType
      case T.BOOL => BooleanType
      case T.STRING => StringType
      case T.BYTES => BinaryType
      case T.MESSAGE => structType(msgs(f.typeName), msgs)
      case T.GROUP => throw new IllegalArgumentException("proto groups are unsupported")
      case _ => LongType // every integer kind + enum → the Druid LONG model
    }
    if (f.repeated) ArrayType(base, containsNull = false) else base
  }

  def structType(m: MessageDesc, msgs: Map[String, MessageDesc]): StructType =
    StructType(m.fields.map(f => StructField(f.name, sparkType(f, msgs), nullable = true)))

  /** Decode one message payload into an InternalRow of `m`'s struct type. */
  def decode(bytes: Array[Byte], start: Int, len: Int, m: MessageDesc,
      msgs: Map[String, MessageDesc]): InternalRow = {
    val byNumber = m.fields.map(f => f.number -> f).toMap
    val values = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Any]]
    def add(n: Int, v: Any): Unit =
      values.getOrElseUpdate(n, scala.collection.mutable.ArrayBuffer.empty) += v

    val r = new WireReader(bytes, start, start + len)
    while (r.hasNext) {
      val (num, wt) = r.readTag()
      byNumber.get(num) match {
        case None => r.skip(wt)
        case Some(f) =>
          def scalarFromVarint(v: Long): Any = f.tpe match {
            case T.BOOL => v != 0L
            case T.SINT32 | T.SINT64 => zigzag(v)
            case T.INT32 => v.toInt.toLong // negative int32 re-sign-extends
            case T.UINT32 => v & 0xffffffffL
            case _ => v
          }
          (wt, f.tpe) match {
            case (2, T.STRING) =>
              val (s, l) = r.readDelimited()
              add(num, UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, s, s + l)))
            case (2, T.BYTES) =>
              val (s, l) = r.readDelimited()
              add(num, java.util.Arrays.copyOfRange(bytes, s, s + l))
            case (2, T.MESSAGE) =>
              val (s, l) = r.readDelimited()
              add(num, decode(bytes, s, l, msgs(f.typeName), msgs))
            case (2, _) if f.repeated => // packed repeated scalars
              val (s, l) = r.readDelimited()
              val pr = new WireReader(bytes, s, s + l)
              while (pr.hasNext) f.tpe match {
                case T.DOUBLE => add(num, java.lang.Double.longBitsToDouble(pr.readFixed64()))
                case T.FLOAT => add(num, java.lang.Float.intBitsToFloat(pr.readFixed32()))
                case T.FIXED64 | T.SFIXED64 => add(num, pr.readFixed64())
                case T.FIXED32 => add(num, pr.readFixed32() & 0xffffffffL)
                case T.SFIXED32 => add(num, pr.readFixed32().toLong)
                case _ => add(num, scalarFromVarint(pr.readVarint()))
              }
            case (0, _) => add(num, scalarFromVarint(r.readVarint()))
            case (1, T.DOUBLE) => add(num, java.lang.Double.longBitsToDouble(r.readFixed64()))
            case (1, _) => add(num, r.readFixed64())
            case (5, T.FLOAT) => add(num, java.lang.Float.intBitsToFloat(r.readFixed32()))
            case (5, T.FIXED32) => add(num, r.readFixed32() & 0xffffffffL)
            case (5, _) => add(num, r.readFixed32().toLong)
            case _ => r.skip(wt)
          }
      }
    }

    InternalRow.fromSeq(m.fields.map { f =>
      values.get(f.number) match {
        case None => if (f.repeated) new GenericArrayData(Array.empty[Any]) else null
        case Some(vs) =>
          if (f.repeated) new GenericArrayData(vs.toArray)
          else vs.last // proto last-one-wins for repeated scalar on a singular field
      }
    })
  }
}

/** PROTOBUF_DECODE(content) → struct (one message per file) or
  * array<struct> (`delimited`: a stream of varint-length-prefixed messages
  * per file — writeDelimitedTo's public convention, the batch-file analog
  * of one-Kafka-record-per-message). */
case class ProtobufDecode(child: Expression, descriptor: Array[Byte],
    messageType: String, delimited: Boolean)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val msgs = ProtobufFormat.parseDescriptorSet(descriptor)
  @transient private lazy val msg = ProtobufFormat.resolve(msgs, messageType)
  @transient private lazy val struct = ProtobufFormat.structType(msg, msgs)

  override def dataType: DataType =
    if (delimited) ArrayType(struct, containsNull = false) else struct

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (!delimited) ProtobufFormat.decode(bytes, 0, bytes.length, msg, msgs)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      val r = new ProtobufFormat.WireReader(bytes, 0, bytes.length)
      while (r.hasNext) {
        val (s, l) = r.readDelimited()
        out += ProtobufFormat.decode(bytes, s, l, msg, msgs)
      }
      new GenericArrayData(out.toArray)
    }
  }
  override protected def withNewChildInternal(c: Expression): ProtobufDecode = copy(child = c)
  override def prettyName: String = "protobuf_decode"
}
