package graft

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.{HllSketch, KmvSketch, QdigestSketch}

/** Seeded-random invariant tests for the sketch cores (the InvariantSpec
  * discipline applied to the algebra itself): the properties the
  * verified queries' band flags DEPEND on, hammered across many random
  * multisets, splits, and fold orders — pure JVM, no Spark session, so
  * hundreds of trials cost milliseconds. These are the non-tautological
  * claims (merge-walk boundary handling, k-trims, unsigned ordering,
  * compression thresholds); the agg-vs-relational identities live in
  * OpUnitSpec and the stream twins in StreamingSpec.
  */
class SketchInvariantSpec extends AnyFunSuite {

  private val rnd = new Random(1337)

  private def kmvArray(words: Seq[String]): Array[Long] = {
    val buf = KmvSketch.newBuffer()
    words.foreach(w => KmvSketch.add(buf, HllSketch.hash64(w)))
    KmvSketch.toArray(buf)
  }

  private def ad(a: Array[Long]): ArrayData = ArrayData.toArrayData(a)

  test("KMV: any random split + any fold order merges to the direct " +
       "bottom-k, array-for-array (50 trials across the k boundary)") {
    for (trial <- 1 to 50) {
      val vocab = 1 + rnd.nextInt(4000) // spans un-full and full sketches
      val n = 1 + rnd.nextInt(8000)
      val words = Seq.fill(n)(s"w${rnd.nextInt(vocab)}")
      val direct = kmvArray(words)
      val nParts = 2 + rnd.nextInt(5)
      val parts = words.groupBy(_ => rnd.nextInt(nParts)).values.toSeq
      val shuffled = rnd.shuffle(parts.map(p => ad(kmvArray(p))))
      val merged = shuffled.reduce(KmvSketch.mergeSketches)
      assert(merged.toLongArray().sameElements(direct),
        s"trial $trial: fold-order merge diverged from direct")
    }
  }

  test("KMV: un-full estimates are EXACT and obey inclusion-exclusion " +
       "(common + union + diff on sets with known overlaps, 50 trials)") {
    for (trial <- 1 to 50) {
      // |A ∪ B| ≤ 500+250+250 = 1000 < k, so even the MERGED sketch
      // stays un-full and every estimate (incl. union) must be exact
      val a = (0 until 1 + rnd.nextInt(500)).map(i => s"a$trial-$i").toSet
      val shared = (0 until rnd.nextInt(250)).map(i => s"s$trial-$i").toSet
      val bOnly = (0 until 1 + rnd.nextInt(250)).map(i => s"b$trial-$i").toSet
      val setA = a ++ shared
      val setB = bOnly ++ shared
      val ska = ad(kmvArray(setA.toSeq))
      val skb = ad(kmvArray(setB.toSeq))
      assert(KmvSketch.estimate(ska) == setA.size.toLong)
      assert(KmvSketch.estimate(skb) == setB.size.toLong)
      assert(KmvSketch.commonEstimate(ska, skb) == shared.size.toLong)
      assert(KmvSketch.unionEstimate(ska, skb) == (setA ++ setB).size.toLong)
      assert(KmvSketch.diffEstimate(ska, skb) == (setA -- setB).size.toLong)
      assert(KmvSketch.diffEstimate(skb, ska) == (setB -- setA).size.toLong)
    }
  }

  test("KMV: full-sketch estimates stay inside the verified queries' " +
       "band (10% + k-slack) for random cardinalities up to 60k") {
    for (_ <- 1 to 10) {
      val card = 5000 + rnd.nextInt(55000)
      val words = (0 until card).map(i => s"v$i")
      val sk = ad(kmvArray(words))
      val est = KmvSketch.estimate(sk)
      assert(math.abs(est - card) * 10 <= card + 320,
        s"card=$card est=$est outside the kmv band")
    }
  }

  private def hllRegisters(words: Seq[String]): Array[Byte] = {
    val regs = new Array[Byte](HllSketch.M)
    words.foreach { w =>
      val (idx, rho) = HllSketch.indexAndRho(w)
      if (rho > regs(idx)) regs(idx) = rho
    }
    regs
  }

  test("HLL: estimates stay inside the 10%+32 band across the " +
       "linear-counting / raw-estimate branch boundary (cardinalities " +
       "10 .. 100k, 25 trials)") {
    // the correction branch switches at E <= 2.5m with empty registers
    // (m = 4096) — sample cardinalities on BOTH sides of it
    val cards = Seq(10, 100, 1000, 4000, 8000, 10240, 20000, 50000, 100000) ++
      Seq.fill(16)(10 + rnd.nextInt(100000))
    for (card <- cards) {
      val est = HllSketch.estimate(
        hllRegisters((0 until card).map(i => s"u$card-$i")))
      assert(math.abs(est - card) * 10 <= card.toLong + 320,
        s"card=$card est=$est outside the hll band")
    }
  }

  private def qdArray(vals: Seq[Long]): ArrayData = {
    val buf = QdigestSketch.newBuffer()
    vals.foreach(v => QdigestSketch.add(buf, v))
    ArrayData.toArrayData(QdigestSketch.toArray(buf))
  }

  private def bandOk(sorted: IndexedSeq[Long], est: Long, qBp: Int): Boolean = {
    val n = sorted.length.toLong
    val slack = QdigestSketch.rankSlack(n)
    val target = math.max(1L, (qBp.toLong * n + 9999L) / 10000L)
    val ltc = sorted.count(_ < est).toLong
    val lec = sorted.count(_ <= est).toLong
    ltc < target + slack && lec >= target - slack
  }

  test("q-digest: mass conserved and every quantile band-valid across " +
       "random distributions, random splits, random fold orders") {
    val shapes: Seq[Int => Long] = Seq(
      i => rnd.nextInt(65536).toLong, // uniform
      i => (1L << rnd.nextInt(16)) + rnd.nextInt(31), // log-uniform-ish
      i => if (rnd.nextInt(4) == 0) 7L else rnd.nextInt(200).toLong, // spiked
      i => 42L, // constant
      i => math.min(65535L, math.abs(rnd.nextGaussian() * 3000 + 8000).toLong))
    for ((shape, si) <- shapes.zipWithIndex; trial <- 1 to 4) {
      val n = 500 + rnd.nextInt(50000)
      val vals = (0 until n).map(shape)
      val sorted = vals.map(v => QdigestSketch.clamp(v).toLong).sorted
      val nParts = 1 + rnd.nextInt(6)
      val parts = vals.groupBy(_ => rnd.nextInt(nParts)).values.toSeq
      val merged = rnd.shuffle(parts.map(qdArray))
        .reduce(QdigestSketch.mergeSketches)
      assert(QdigestSketch.total(merged) == n.toLong,
        s"shape $si trial $trial: mass not conserved")
      assert(merged.numElements() <= 6 * QdigestSketch.K,
        s"shape $si trial $trial: size bound exceeded")
      var prev = Long.MinValue
      for (q <- Seq(100, 1000, 2500, 5000, 7500, 9000, 9900, 10000)) {
        val est = QdigestSketch.quantile(merged, q)
        assert(bandOk(sorted, est, q),
          s"shape $si trial $trial q=$q est=$est out of band (n=$n)")
        assert(est >= prev,
          s"shape $si trial $trial: quantile not monotone in q at $q")
        prev = est
      }
    }
  }

  test("q-digest weighted: a (value, weight) build equals the weight- " +
       "expanded multiset build node-for-node; bands read in mass units") {
    for (trial <- 1 to 10) {
      val pairs = (0 until 200 + rnd.nextInt(2000))
        .map(_ => (rnd.nextInt(60000).toLong, 1L + rnd.nextInt(50)))
      val wbuf = QdigestSketch.newBuffer()
      pairs.foreach { case (v, w) => QdigestSketch.addWeighted(wbuf, v, w) }
      val expanded = QdigestSketch.newBuffer()
      // same insertion ORDER with unit adds — compression points may
      // differ mid-stream, so compare the final compressed forms after
      // one more compress (both are digests of the identical multiset)
      pairs.foreach { case (v, w) =>
        (0L until w).foreach(_ => QdigestSketch.add(expanded, v)) }
      val wArr = ArrayData.toArrayData(QdigestSketch.toArray(wbuf))
      val eArr = ArrayData.toArrayData(QdigestSketch.toArray(expanded))
      val massW = QdigestSketch.total(wArr)
      assert(massW == pairs.map(_._2).sum, "weighted mass wrong")
      assert(massW == QdigestSketch.total(eArr))
      // both digests answer every quantile within the mass-unit band
      val sorted = pairs.flatMap { case (v, w) =>
        Seq.fill(w.toInt)(QdigestSketch.clamp(v).toLong) }.sorted.toIndexedSeq
      for (q <- Seq(2500, 5000, 9000); arr <- Seq(wArr, eArr))
        assert(bandOk(sorted, QdigestSketch.quantile(arr, q), q),
          s"trial $trial q=$q out of band")
      // zero/negative weights contribute nothing
      QdigestSketch.addWeighted(wbuf, 5L, 0L)
      QdigestSketch.addWeighted(wbuf, 5L, -3L)
      assert(QdigestSketch.total(
        ArrayData.toArrayData(QdigestSketch.toArray(wbuf))) == massW)
    }
  }

  test("q-digest: clamping is the documented boundary contract — " +
       "out-of-universe values land on the edge cells") {
    val sk = qdArray(Seq(-5L, -1L, 100000L, 70000L, 3L))
    assert(QdigestSketch.total(sk) == 5L)
    assert(QdigestSketch.quantile(sk, 100) == 0L) // negatives clamp to 0
    assert(QdigestSketch.quantile(sk, 10000) == 65535L) // overflow clamps
  }
}
