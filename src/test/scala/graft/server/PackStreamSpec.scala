package graft.server

import graft.server.PackStream.Struct
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Golden byte sequences from the published PackStream specification —
  * NOT just encode/decode self-consistency, so a self-consistent-but-wrong
  * marker table fails here. */
class PackStreamSpec extends AnyFunSuite {

  private def enc(v: Any): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    PackStream.write(new DataOutputStream(b), v)
    b.toByteArray
  }
  private def dec(bytes: Array[Byte]): Any =
    PackStream.read(new DataInputStream(new ByteArrayInputStream(bytes)))
  private def hex(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(Integer.parseInt(_, 16).toByte)

  test("golden: null, booleans") {
    assert(enc(null).sameElements(hex("C0")))
    assert(enc(true).sameElements(hex("C3")))
    assert(enc(false).sameElements(hex("C2")))
  }

  test("golden: integers pick the smallest representation") {
    assert(enc(42L).sameElements(hex("2A")))
    assert(enc(-1L).sameElements(hex("FF")))
    assert(enc(-16L).sameElements(hex("F0")))
    assert(enc(-17L).sameElements(hex("C8 EF")))
    assert(enc(127L).sameElements(hex("7F")))
    assert(enc(128L).sameElements(hex("C9 00 80")))
    assert(enc(-32768L).sameElements(hex("C9 80 00")))
    assert(enc(32768L).sameElements(hex("CA 00 00 80 00")))
    assert(enc(2147483648L).sameElements(hex("CB 00 00 00 00 80 00 00 00")))
    // ints of every JVM width normalize to the same wire form
    assert(enc(42).sameElements(hex("2A")))
    assert(enc(42.toShort).sameElements(hex("2A")))
    assert(enc(42.toByte).sameElements(hex("2A")))
  }

  test("golden: float64") {
    assert(enc(1.1).sameElements(hex("C1 3F F1 99 99 99 99 99 9A")))
    assert(enc(-1.1).sameElements(hex("C1 BF F1 99 99 99 99 99 9A")))
  }

  test("golden: strings") {
    assert(enc("").sameElements(hex("80")))
    assert(enc("a").sameElements(hex("81 61")))
    assert(enc("abcdefghijklmnopqrstuvwxyz").sameElements(
      hex("D0 1A 61 62 63 64 65 66 67 68 69 6A 6B 6C 6D 6E 6F 70 71 72 73 74 75 76 77 78 79 7A")))
    // UTF-8 length, not codepoint count: "Größe" is 7 bytes for 5 chars
    assert(enc("Größe").sameElements(hex("87 47 72 C3 B6 C3 9F 65")))
  }

  test("golden: list, map, struct, bytes") {
    assert(enc(Seq(1L, 2L, 3L)).sameElements(hex("93 01 02 03")))
    assert(enc(Map("one" -> "eins")).sameElements(hex("A1 83 6F 6E 65 84 65 69 6E 73")))
    assert(enc(Struct(0x01, Seq(Map.empty[String, Any]))).sameElements(hex("B1 01 A0")))
    assert(enc(Array[Byte](1, 2, 3)).sameElements(hex("CC 03 01 02 03")))
  }

  test("round trip: nested values and width promotion on decode") {
    val v = Seq(
      null, true, 42L, -1234567890123L, 3.14159, "héllo",
      Seq(1L, Seq("nested"), Map("k" -> false)),
      Map("a" -> 1L, "b" -> Seq(2L, 3L)),
      Struct(0x71, Seq(Seq("row", 9L))))
    assert(dec(enc(v)) == v)
    // a 300-element list exercises the D4 8-bit size header
    val long = (0L until 300L).toSeq
    assert(enc(long).take(3).sameElements(hex("D5 01 2C")))
    assert(dec(enc(long)) == long)
    // a 20-key map exercises the D8 header
    val bigMap = (0 until 20).map(i => s"k$i" -> i.toLong).toMap
    assert(enc(bigMap).take(2).sameElements(hex("D8 14")))
    assert(dec(enc(bigMap)) == bigMap)
  }
}
