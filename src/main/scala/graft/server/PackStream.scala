package graft.server

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** PackStream codec — the binary value format of the public Bolt protocol
  * (the wire the reference's clients speak to Neo4j on 7687,
  * /root/reference/src/database.py:7-10, /root/reference/start.sh:5).
  *
  * Implements the published marker set: Null `C0`, Boolean `C2/C3`,
  * Float64 `C1`, Integer (tiny/-16..127 inline, `C8/C9/CA/CB`), Bytes
  * (`CC/CD/CE`), String (tiny `8x`, `D0/D1/D2`), List (tiny `9x`,
  * `D4/D5/D6`), Map (tiny `Ax`, `D8/D9/DA`), Struct (tiny `Bx` + tag).
  * Values map to plain Scala: `null`, `Boolean`, `Long`, `Double`,
  * `String`, `Array[Byte]`, `Seq[Any]`, `Map[String, Any]`, [[PackStream.Struct]].
  *
  * PackStreamSpec pins golden byte sequences from the published spec
  * examples (not just encode/decode self-consistency), so a
  * self-consistent-but-wrong marker would fail the suite.
  */
object PackStream {

  /** A PackStream structure: message envelope or typed value (tag + fields). */
  final case class Struct(tag: Byte, fields: Seq[Any])

  def write(out: DataOutputStream, v: Any): Unit = v match {
    case null => out.writeByte(0xC0)
    case b: Boolean => out.writeByte(if (b) 0xC3 else 0xC2)
    case b: Byte => writeLong(out, b.toLong)
    case s: Short => writeLong(out, s.toLong)
    case i: Int => writeLong(out, i.toLong)
    case l: Long => writeLong(out, l)
    case f: Float => write(out, f.toDouble)
    case d: Double => out.writeByte(0xC1); out.writeDouble(d)
    case s: String =>
      val b = s.getBytes(UTF_8)
      if (b.length < 16) out.writeByte(0x80 | b.length)
      else if (b.length < 256) { out.writeByte(0xD0); out.writeByte(b.length) }
      else if (b.length < 65536) { out.writeByte(0xD1); out.writeShort(b.length) }
      else { out.writeByte(0xD2); out.writeInt(b.length) }
      out.write(b)
    case bytes: Array[Byte] =>
      if (bytes.length < 256) { out.writeByte(0xCC); out.writeByte(bytes.length) }
      else if (bytes.length < 65536) { out.writeByte(0xCD); out.writeShort(bytes.length) }
      else { out.writeByte(0xCE); out.writeInt(bytes.length) }
      out.write(bytes)
    case st: Struct =>
      require(st.fields.size < 16, s"struct arity ${st.fields.size} exceeds Bolt's tiny-struct bound")
      out.writeByte(0xB0 | st.fields.size)
      out.writeByte(st.tag.toInt)
      st.fields.foreach(write(out, _))
    case m: scala.collection.Map[_, _] =>
      val n = m.size
      if (n < 16) out.writeByte(0xA0 | n)
      else if (n < 256) { out.writeByte(0xD8); out.writeByte(n) }
      else if (n < 65536) { out.writeByte(0xD9); out.writeShort(n) }
      else { out.writeByte(0xDA); out.writeInt(n) }
      m.foreach { case (k, value) => write(out, String.valueOf(k)); write(out, value) }
    case seq: Iterable[_] =>
      val n = seq.size
      if (n < 16) out.writeByte(0x90 | n)
      else if (n < 256) { out.writeByte(0xD4); out.writeByte(n) }
      else if (n < 65536) { out.writeByte(0xD5); out.writeShort(n) }
      else { out.writeByte(0xD6); out.writeInt(n) }
      seq.foreach(write(out, _))
    case other =>
      throw new IllegalArgumentException(s"not PackStream-encodable: ${other.getClass.getName}")
  }

  private def writeLong(out: DataOutputStream, l: Long): Unit = {
    if (l >= -16 && l <= 127) out.writeByte(l.toInt)
    else if (l >= Byte.MinValue && l <= Byte.MaxValue) { out.writeByte(0xC8); out.writeByte(l.toInt) }
    else if (l >= Short.MinValue && l <= Short.MaxValue) { out.writeByte(0xC9); out.writeShort(l.toInt) }
    else if (l >= Int.MinValue && l <= Int.MaxValue) { out.writeByte(0xCA); out.writeInt(l.toInt) }
    else { out.writeByte(0xCB); out.writeLong(l) }
  }

  def read(in: DataInputStream): Any = {
    val marker = in.readUnsignedByte()
    if (marker <= 0x7F) marker.toLong // tiny positive int
    else if (marker >= 0xF0) (marker - 0x100).toLong // tiny negative int -16..-1
    else if ((marker & 0xF0) == 0x80) readString(in, marker & 0x0F)
    else if ((marker & 0xF0) == 0x90) readList(in, marker & 0x0F)
    else if ((marker & 0xF0) == 0xA0) readMap(in, marker & 0x0F)
    else if ((marker & 0xF0) == 0xB0) {
      val tag = in.readByte()
      Struct(tag, Seq.fill(marker & 0x0F)(read(in)))
    } else marker match {
      case 0xC0 => null
      case 0xC1 => in.readDouble()
      case 0xC2 => false
      case 0xC3 => true
      case 0xC8 => in.readByte().toLong
      case 0xC9 => in.readShort().toLong
      case 0xCA => in.readInt().toLong
      case 0xCB => in.readLong()
      case 0xCC => readBytes(in, in.readUnsignedByte())
      case 0xCD => readBytes(in, in.readUnsignedShort())
      case 0xCE => readBytes(in, in.readInt())
      case 0xD0 => readString(in, in.readUnsignedByte())
      case 0xD1 => readString(in, in.readUnsignedShort())
      case 0xD2 => readString(in, in.readInt())
      case 0xD4 => readList(in, in.readUnsignedByte())
      case 0xD5 => readList(in, in.readUnsignedShort())
      case 0xD6 => readList(in, in.readInt())
      case 0xD8 => readMap(in, in.readUnsignedByte())
      case 0xD9 => readMap(in, in.readUnsignedShort())
      case 0xDA => readMap(in, in.readInt())
      case other => throw new IllegalArgumentException(f"unknown PackStream marker 0x$other%02X")
    }
  }

  private def readBytes(in: DataInputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n); in.readFully(b); b
  }
  private def readString(in: DataInputStream, n: Int): String =
    new String(readBytes(in, n), UTF_8)
  private def readList(in: DataInputStream, n: Int): Seq[Any] =
    Seq.fill(n)(read(in))
  private def readMap(in: DataInputStream, n: Int): Map[String, Any] =
    Seq.fill(n)((read(in).asInstanceOf[String], read(in))).toMap
}
