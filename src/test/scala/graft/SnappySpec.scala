package graft

import graft.operators.Snappy

/** [[Snappy]] — decode of hand-built spec vectors (all three copy tag
  * widths, overlapping run copies, escape-length literals), round-trip
  * through the greedy compressor, and loud rejection of hostile
  * streams.
  */
class SnappySpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("hand-built vectors: literals, copy-1/2/4, overlapping run copy") {
    // "abcd" as one literal: len 4 → preamble 04, tag (4-1)<<2
    assert(Snappy.decompress(bytes(4, (3 << 2), 'a', 'b', 'c', 'd')).toSeq ==
      "abcd".getBytes.toSeq)
    // "abab abab": literal "ab" + copy-1 offset 2 len 8 → wait len 4..11
    // literal "ab" (2), then copy-1: len=6 (tag bits 6-4=2), offset 2:
    // tag = (2<<2)|1 with offset high bits 0, then offset byte 2
    val runCopy = bytes(8, (1 << 2), 'a', 'b', ((6 - 4) << 2) | 1, 2)
    assert(Snappy.decompress(runCopy).toSeq == "abababab".getBytes.toSeq)
    // copy-2: literal "xyz" then offset 3 len 3 via 2-byte offset
    val c2 = bytes(6, (2 << 2), 'x', 'y', 'z', ((3 - 1) << 2) | 2, 3, 0)
    assert(Snappy.decompress(c2).toSeq == "xyzxyz".getBytes.toSeq)
    // copy-4: same but 4-byte offset
    val c4 = bytes(6, (2 << 2), 'x', 'y', 'z', ((3 - 1) << 2) | 3, 3, 0, 0, 0)
    assert(Snappy.decompress(c4).toSeq == "xyzxyz".getBytes.toSeq)
    // escape-length literal (61 → 1 extra length byte): 100 octets
    val lit100 = Array.fill(100)('q'.toByte)
    val esc = bytes(100, 60 << 2, 99) ++ lit100
    assert(Snappy.decompress(esc).toSeq == lit100.toSeq)
  }

  test("round-trip through the greedy compressor, repeats force real copies") {
    val rnd = new scala.util.Random(21)
    for (trial <- 1 to 20) {
      val base = (1 to 50 + rnd.nextInt(200)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val data = (base * (1 + rnd.nextInt(5))).getBytes("UTF-8")
      val comp = Snappy.compress(data)
      assert(Snappy.decompress(comp).toSeq == data.toSeq, s"trial $trial")
      if (data.length > 200)
        assert(comp.length < data.length, s"repetitive input must compress: $trial")
    }
    // empty and tiny inputs
    assert(Snappy.decompress(Snappy.compress(Array.emptyByteArray)).isEmpty)
    assert(Snappy.decompress(Snappy.compress("ab".getBytes)).toSeq == "ab".getBytes.toSeq)
  }

  test("hostile streams fail loudly: offsets, truncation, length mismatch") {
    def boom(bs: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](Snappy.decompress(bs))
      assert(e.getMessage.contains(what), s"wanted '$what' in: ${e.getMessage}")
    }
    boom(bytes(4, ((6 - 4) << 2) | 1, 2), "before the output start") // copy with empty window
    boom(bytes(4, (1 << 2), 'a', 'b', ((6 - 4) << 2) | 1, 0), "zero copy offset")
    boom(bytes(10, (3 << 2), 'a', 'b', 'c', 'd'), "produced 4 of declared 10")
    boom(bytes(2, (3 << 2), 'a', 'b'), "literal runs past") // declares 2, literal of 4
    boom(Array.emptyByteArray, "truncated length preamble")
    boom(bytes(0x80), "truncated length preamble") // continuation bit, no next byte
  }
}
