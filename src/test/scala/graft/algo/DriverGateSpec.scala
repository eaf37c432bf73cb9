package graft.algo

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The byte-bounded driver-gate probes (round-5 advice: a 2²⁰-pair gate
  * that is fine for long vids is hundreds of MB for ~40-char string ids).
  */
class DriverGateSpec extends SparkSpec {
  import spark.implicits._

  test("pairProbe estimates bytes by vid type; checksum is order-insensitive") {
    val longs = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val pl = DriverGate.pairProbe(longs, "a", "b")
    assert(pl.rows == 2 && pl.estBytes == 2 * DriverGate.rowOverheadBytes)
    val strs = Seq(("x" * 40, "y" * 40), ("p" * 40, "q" * 40)).toDF("a", "b")
    val ps = DriverGate.pairProbe(strs, "a", "b")
    assert(ps.rows == 2 &&
      ps.estBytes == 2 * DriverGate.rowOverheadBytes + 2 * (2 * 2 * 40),
      s"string payloads must count at 2x UTF-8 bytes (got ${ps.estBytes})")
    val shuffled = Seq((3L, 4L), (1L, 2L)).toDF("a", "b")
    assert(DriverGate.pairProbe(shuffled, "a", "b").checksum == pl.checksum,
      "content checksum must not depend on row order")
  }

  test("CC: long vids gate at a pair count where string vids fall through to the star loop") {
    // A hub-star graph (center 0 → i): ~1100 pairs of ~30 KB string ids
    // ≈ 132 MB estimated collect — above the 128 MB byte cap while far
    // below the 2^20 row cap, so the STRING graph must run the star loop
    // (1 round on a star topology — cheap) while the LONG twin of the
    // same pair count takes the driver gate (0 rounds).
    val n = 1100
    val longArcs = (1 to n).map(i => (0L, i.toLong, 1.0))
      .toDF("src", "dst", "weight")
    val longVerts = (0L to n.toLong).toDF("vid")
    val (_, roundsLong) = ConnectedComponents.run(longArcs, longVerts,
      preContract = false)
    assert(roundsLong == 0, "long-vid star graph must take the driver gate")
    // 1100 × 2 × ~32 KB ≈ 70 MB of UTF-8 → estBytes ≈ 141 MB > the 128 MB cap
    val pad = "x" * 32000
    def vid(i: Int) = f"$pad$i%09d"
    val strArcs = (1 to n).map(i => (vid(0), vid(i), 1.0))
      .toDF("src", "dst", "weight")
    val strVerts = (0 to n).map(vid).toDF("vid")
    val (labels, roundsStr) = ConnectedComponents.run(strArcs, strVerts,
      preContract = false)
    assert(roundsStr > 0,
      "oversized string vids must fall through to the distributed star loop")
    // ...and the star loop still labels the component correctly.
    assert(labels.select(countDistinct("component")).first().getLong(0) == 1L)
  }
}
