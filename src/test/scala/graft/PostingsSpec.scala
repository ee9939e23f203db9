package graft

import graft.operators.Postings

/** [[Postings]] — round-trip over adversarial gap shapes, the closed
  * byte-length form, group-boundary values, and loud refusal of
  * disorder/truncation.
  */
class PostingsSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip: random strictly-increasing lists, including huge gaps") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 30) {
      var cur = rnd.nextInt(10).toLong
      val ps = (1 to 1 + rnd.nextInt(200)).map { _ =>
        cur += 1 + (if (rnd.nextBoolean()) rnd.nextInt(100).toLong
          else rnd.nextLong(1L << 40))
        cur
      }
      assert(Postings.decode(Postings.encode(ps)) == ps, s"trial $trial")
    }
    assert(Postings.decode(Postings.encode(Nil)).isEmpty)
    assert(Postings.decode(Postings.encode(Seq(Long.MaxValue))) == Seq(Long.MaxValue))
  }

  test("byte length is the closed form: sum of vbyteLen over first + gaps") {
    val ps = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, 2097152L, 1L << 35)
    val gaps = ps.head +: ps.sliding(2).map(s => s(1) - s(0)).toSeq
    assert(Postings.encode(ps).length == gaps.map(Postings.vbyteLen).sum)
    // group boundaries: 7-bit group count steps exactly at 2^(7k)
    assert(Postings.vbyteLen(127L) == 1 && Postings.vbyteLen(128L) == 2)
    assert(Postings.vbyteLen(16383L) == 2 && Postings.vbyteLen(16384L) == 3)
    assert(Postings.vbyteLen(0L) == 1 && Postings.vbyteLen(Long.MaxValue) == 9)
  }

  test("disorder, duplicates, negatives, and truncation fail loudly") {
    intercept[IllegalArgumentException](Postings.encode(Seq(5L, 5L)))
    intercept[IllegalArgumentException](Postings.encode(Seq(5L, 3L)))
    intercept[IllegalArgumentException](Postings.encode(Seq(-1L)))
    val good = Postings.encode(Seq(100L, 300L))
    intercept[IllegalArgumentException](Postings.decode(good.take(good.length - 1)))
  }

  test("compress(): df and byte_len over a real index frame") {
    val idx = Seq(("alpha", Seq(1L, 2L, 3L, 500L)), ("beta", Seq(1000L)))
      .toDF("term", "postings")
    val got = Postings.compress(idx, "term", "postings")
      .select("term", "df", "byte_len")
      .as[(String, Long, Long)].collect()
      .map { case (t, d, b) => t -> ((d, b)) }.toMap
    // alpha: 1 + 1 + 1 + vbyteLen(497)=2 → 5; beta: vbyteLen(1000)=2
    assert(got == Map("alpha" -> ((4L, 5L)), "beta" -> ((1L, 2L))))
  }
}
