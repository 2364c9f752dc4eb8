package graft

import graft.functions.TopKBuffer

/** Randomized (seeded, deterministic) checks for the custom algorithmic
  * kernels: the bounded-heap top-k buffer against a sort-take reference
  * model, and the distributed prefix sum against the sequential fold
  * across random lengths and layouts.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomScored(rnd: scala.util.Random, n: Int) =
    List.fill(n)((math.rint(rnd.between(-100.0, 100.0) * 1e6) / 1e6,
      rnd.nextLong(50)))

  test("TopKBuffer == sort-take reference across 200 random cases") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { trial =>
      val xs = randomScored(rnd, rnd.nextInt(60))
      val k = 1 + rnd.nextInt(12)
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.add(s, i) }
      val ref = xs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(buf.sortedPairs.toSeq == ref, s"trial=$trial k=$k")
    }
  }

  test("TopKBuffer merge == single buffer over the concatenation") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { trial =>
      val a = randomScored(rnd, rnd.nextInt(40))
      val b = randomScored(rnd, rnd.nextInt(40))
      val k = 1 + rnd.nextInt(8)
      val merged = new TopKBuffer(k)
      a.foreach { case (s, i) => merged.add(s, i) }
      val other = new TopKBuffer(k)
      b.foreach { case (s, i) => other.add(s, i) }
      merged.merge(other)
      val whole = new TopKBuffer(k)
      (a ++ b).foreach { case (s, i) => whole.add(s, i) }
      assert(merged.sortedPairs.toSeq == whole.sortedPairs.toSeq,
        s"trial=$trial k=$k")
    }
  }

  test("packOffsets == sequential fold for random lengths and layouts") {
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { trial =>
      val rows = (0 until 40).map(i => (i.toLong, rnd.nextLong(10)))
      val parts = 1 + rnd.nextInt(9)
      val df = rows.toDF("doc_id", "n").repartition(parts)
      val got = graft.ext.Packing.packOffsets(df, "doc_id", "n", 7)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      var off = 0L
      rows.foreach { case (id, n) =>
        assert(got(id) == off, s"trial=$trial parts=$parts id=$id")
        off += n
      }
    }
  }
}
