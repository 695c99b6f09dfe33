package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Transforms}

/** Property-style adversarial checks: operators vs INDEPENDENT naive
  * reference implementations on randomized inputs. ScalaCheck drives the
  * pure-expression properties (fixed initial seed — deterministic);
  * Spark-backed operators get seeded-Random batches folded into ONE
  * operator call so the suite stays fast. */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def checkProp(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(Seed(0xC0FFEE42L)), p)
    assert(res.passed, res.status.toString)
  }

  test("boundedIntersect: full contract vs Set intersection — exact " +
      "count when reachable, -1 exactly when the count misses the bound") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val sortedArr = for {
      n <- Gen.choose(0, 40)
      xs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield xs.distinct.sorted.toArray
    val p = Prop.forAll(sortedArr, sortedArr,
        Gen.choose(-2L, 45L)) { (a, b, m) =>
      val truth = (a.toSet intersect b.toSet).size.toLong
      val got = graft.functions.BoundedIntersect.compute(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b), m)
      // m <= 0 can never abort; otherwise -1 iff the true count is
      // below the bound, and a returned count is always the exact one
      if (m <= 0L || truth >= m) got == truth else got == -1L
    }
    checkProp(p, 2000)
  }

  test("unimaxAllocation invariants on random strata: budget exhausted " +
      "or all caps taken, caps respected, leveled strata within 1") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(12)
    (1 to 12).foreach { case _ =>
      val k = 2 + rnd.nextInt(6)
      val ns = (0 until k).map(i => ('a' + i).toChar.toString ->
        (1 + rnd.nextInt(40)))
      val e = 1 + rnd.nextInt(3)
      val bpm = 100 + rnd.nextInt(2500)
      val df = ns.flatMap { case (l, n) => (1 to n).map(_ => (l, "x")) }
        .toDF("lang", "text")
      val out = TextAnalysis.unimaxAllocation(df, "lang", e, bpm)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      val nTot = ns.map(_._2.toLong).sum
      val b = nTot * bpm / 1000
      val capTot = out.map(_._3).sum
      out.foreach { case (l, n, cap, alloc) =>
        assert(cap === n * e, s"$l cap")
        assert(alloc >= 0 && alloc <= cap, s"$l alloc in [0, cap]")
      }
      // exact budget exhaustion unless every cap fits inside it
      assert(out.map(_._4).sum === math.min(b, capTot),
        s"k=$k e=$e bpm=$bpm")
      // uniformity: strata NOT at their cap (the leveled set) differ
      // by at most the remainder unit
      val leveled = out.filter(o => o._4 < o._3).map(_._4)
      if (leveled.nonEmpty)
        assert(leveled.max - leveled.min <= 1, s"leveled spread: $out")
    }
  }

  test("kn3LogProbPruned == naive single-machine trigram-KN reference " +
      "on random corpora") {
    import graft.operators.TextAnalysis
    def halfUp(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    // independent reference: plain Scala maps, the operator's published
    // formula re-derived from scratch (same d = 3/4 discount algebra)
    def naive(docs: Seq[(Long, String)]): Map[Long, Long] = {
      val occ = docs.flatMap { case (id, t) =>
        t.trim.toLowerCase.split("\\s+").toSeq.sliding(3)
          .filter(_.size == 3).map(g => (id, g.mkString(" ")))
      }
      if (occ.isEmpty) return Map.empty
      val c123 = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      def b12(s: String) = s.split(" ").take(2).mkString(" ")
      def w2(s: String) = s.split(" ")(1)
      def w3(s: String) = s.split(" ")(2)
      val ctx = c123.groupBy(k => b12(k._1)).view.mapValues { xs =>
        (xs.values.sum, xs.count(_._2 >= 2).toLong,
          xs.count(_._2 == 1).toLong)
      }.toMap
      val kept = c123.filter(_._2 >= 2)
      val cont = kept.keys.groupBy(s => (w2(s), w3(s))).view
        .mapValues(_.size.toLong).toMap
      val mid = cont.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val g2m = cont.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
      val rw3 = cont.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
      val b2 = math.max(cont.size.toLong, 1L)
      val lps = occ.map { case (id, s) =>
        val (c12, fw, n1) = ctx(b12(s))
        val ck = kept.getOrElse(s, 0L)
        val r23 = cont.getOrElse((w2(s), w3(s)), 0L)
        val m2 = math.max(mid.getOrElse(w2(s), 0L), 1L)
        val g2 = g2m.getOrElse(w2(s), 0L)
        val rw = rw3.getOrElse(w3(s), 0L)
        val num = math.max(
          math.max(4 * ck - 3, 0L) * (4 * m2 * b2) +
            (3 * fw + 4 * n1) *
              (math.max(4 * r23 - 3, 0L) * b2 + 3 * g2 * rw), 1L)
        val den = 16 * c12 * m2 * b2
        id -> halfUp(math.log(num.toDouble / den.toDouble) * 1e6)
      }
      lps.groupBy(_._1).view.mapValues { xs =>
        halfUp(xs.map(_._2).sum / (xs.size * 1000.0))
      }.toMap
    }
    val rnd = new scala.util.Random(77)
    val vocab = Seq("a", "b", "c", "d", "e")
    // several random corpora, one operator call each (corpora share
    // model tables if folded together, so they must run separately)
    (1 to 6).foreach { case k =>
      val docs = (1L to (2 + rnd.nextInt(4)).toLong).map(i =>
        (k * 100L + i, Seq.fill(2 + rnd.nextInt(25))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val got = TextAnalysis
        .kn3LogProbPruned(docs.toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === naive(docs), s"corpus $k: $docs")
    }
  }

  test("sourceUnigramKl == naive smoothed-KL reference on random " +
      "corpora") {
    import graft.operators.TextAnalysis
    def halfUp(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    def naive(docs: Seq[(String, String)]): Map[String, (Long, Long)] = {
      val cnt = docs.flatMap { case (s, t) =>
        t.trim.toLowerCase.split("\\s+").toSeq.map(w => (s, w))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val byW = cnt.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val byS = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val v = byW.size.toLong; val nn = byW.values.sum
      byS.map { case (s, ns) =>
        val sum = byW.map { case (w, ct) =>
          val cs = cnt.getOrElse((s, w), 0L)
          val q = halfUp(math.log(
            ((cs + 1).toDouble * (nn - ns + v).toDouble) /
            ((ct - cs + 1).toDouble * (ns + v).toDouble)) * 1e6)
          (cs + 1) * q
        }.sum
        s -> (ns, Math.floorDiv(sum, ns + v))
      }
    }
    val rnd = new scala.util.Random(31)
    val vocab = Seq("a", "b", "c", "d", "e", "f", "g")
    (1 to 4).foreach { case k =>
      val docs = (1 to (2 + rnd.nextInt(3))).flatMap(si =>
        (1 to (1 + rnd.nextInt(3))).map(_ => (s"s$si",
          Seq.fill(3 + rnd.nextInt(20))(
            vocab(rnd.nextInt(vocab.size))).mkString(" "))))
      val got = TextAnalysis
        .sourceUnigramKl(docs.toDF("source", "text"), "text", "source")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      assert(got === naive(docs), s"corpus $k: $docs")
    }
  }

  test("knLogProbPruned == naive single-machine bigram-KN reference " +
      "on random corpora (the tier whose plan changed this round)") {
    import graft.operators.TextAnalysis
    def halfUp(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    def naive(docs: Seq[(Long, String)]): Map[Long, Long] = {
      val occ = docs.flatMap { case (id, t) =>
        t.trim.toLowerCase.split("\\s+").toSeq.sliding(2)
          .filter(_.size == 2).map(g => (id, g.mkString(" ")))
      }
      if (occ.isEmpty) return Map.empty
      val c12 = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      def w1(s: String) = s.split(" ")(0)
      def wB(s: String) = s.split(" ")(1)
      val fol = c12.groupBy(k => w1(k._1)).view.mapValues { xs =>
        (xs.values.sum, xs.count(_._2 >= 2).toLong,
          xs.count(_._2 == 1).toLong)
      }.toMap
      val kept = c12.filter(_._2 >= 2)
      val rw = kept.keys.groupBy(wB).view.mapValues(_.size.toLong).toMap
      val b = math.max(kept.size.toLong, 1L)
      val lps = occ.map { case (id, s) =>
        val (c1, fw, n1) = fol(w1(s))
        val ck = kept.getOrElse(s, 0L)
        val r = rw.getOrElse(wB(s), 0L)
        val num = math.max(math.max(4 * ck - 3, 0L) * b +
          (3 * fw + 4 * n1) * r, 1L)
        id -> halfUp(math.log(num.toDouble / (4 * c1 * b).toDouble) * 1e6)
      }
      lps.groupBy(_._1).view.mapValues { xs =>
        halfUp(xs.map(_._2).sum / (xs.size * 1000.0))
      }.toMap
    }
    val rnd = new scala.util.Random(55)
    val vocab = Seq("a", "b", "c", "d")
    (1 to 6).foreach { case k =>
      val docs = (1L to (2 + rnd.nextInt(4)).toLong).map(i =>
        (k * 100L + i, Seq.fill(1 + rnd.nextInt(20))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val got = TextAnalysis
        .knLogProbPruned(docs.toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === naive(docs), s"corpus $k: $docs")
    }
  }

  test("coverageCurve == naive sorted-prefix reference on random " +
      "corpora") {
    import graft.operators.TextAnalysis
    def naive(text: String): Map[Long, (Long, Long)] = {
      val counts = text.trim.toLowerCase.split("\\s+").toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }
      val v = counts.size.toLong; val nn = counts.map(_._2).sum
      (1L to 10L).flatMap { d =>
        val t = (v * d) / 10
        if (t < 1) None
        else {
          val mind = if (t == (v * (d - 1)) / 10) None else Some(d)
          mind.map(_ => d ->
            (t, counts.take(t.toInt).map(_._2).sum * 1000 / nn))
        }
      }.toMap
    }
    val rnd = new scala.util.Random(99)
    val vocab = (1 to 25).map(i => s"w$i")
    (1 to 6).foreach { case k =>
      val text = Seq.fill(40 + rnd.nextInt(300))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val got = TextAnalysis
        .coverageCurve(Seq((1L, text)).toDF("doc_id", "text"), "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got === naive(text), s"corpus $k")
    }
  }

  test("crc32q: table-driven implementation == bit-serial reference") {
    // independent reference: no table, one bit at a time (reflected
    // CRC, poly 0xD5828281, init/xorout 0xFFFFFFFF)
    def bitSerial(bytes: Array[Byte]): Long = {
      var crc = 0xFFFFFFFF
      bytes.foreach { b =>
        crc ^= (b & 0xFF)
        var j = 0
        while (j < 8) {
          crc = if ((crc & 1) != 0) (crc >>> 1) ^ 0xD5828281 else crc >>> 1
          j += 1
        }
      }
      (crc ^ 0xFFFFFFFF).toLong & 0xFFFFFFFFL
    }
    checkProp(Prop.forAll(Gen.listOf(Gen.choose(-128, 127).map(_.toByte))) {
      bs =>
        val arr = bs.toArray
        graft.functions.Crc32Q.compute(arr) == bitSerial(arr)
    }, n = 300)
  }

  test("rankAuc == quadratic pair count with midrank ties, random inputs") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 12).foreach { _ =>
      val n = 4 + rnd.nextInt(20)
      // small score domain → plenty of ties
      val rows = (0 until n).map(_ =>
        (rnd.nextInt(6).toLong, rnd.nextBoolean()))
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        // naive doubled numerator: 2·[s+ > s−] + 1·[s+ = s−]
        val num2 = (for (p <- pos; q <- neg) yield {
          if (p > q) 2L else if (p == q) 1L else 0L
        }).sum
        val expect = num2 * 1000000L / (2L * pos.length * neg.length)
        val got = Transforms.rankAuc(rows.toDF("s", "pos"),
            col("s"), col("pos"))
          .as[(Long, Long, Long)].collect().head
        assert(got === ((pos.length.toLong, neg.length.toLong, expect)),
          s"rows=$rows")
      }
    }
  }

  test("isotonicFit: monotone pool means, mass preserved, pools maximal") {
    val rnd = new scala.util.Random(7L)
    val pts = (0 until 30).flatMap { g =>
      val k = 2 + rnd.nextInt(18)
      (0 until k).map(x =>
        (s"g$g", x.toLong, (rnd.nextInt(2001) - 1000).toLong,
          1L + rnd.nextInt(5)))
    }
    val got = Transforms.isotonicFit(pts.toDF("g", "x", "s", "n"),
        "g", "x", "s", "n")
      .as[(String, Long, Long, Long, Long)].collect()
    val byG = got.groupBy(_._1)
    val inByG = pts.groupBy(_._1)
    byG.foreach { case (g, rows) =>
      val pools = rows.map(r => (r._3, r._4, r._5)).distinct
        .sortBy(_._1) // (pool_x, sum, n)
      // adjacent pool means STRICTLY increasing (else PAV would merge)
      pools.sliding(2).foreach {
        case Array((_, s1, n1), (_, s2, n2)) =>
          assert(s1 * n2 < s2 * n1, s"$g: non-maximal pools $pools")
        case _ =>
      }
      // mass preservation: pool (sum, n) equals its members' totals
      val in = inByG(g)
      assert(pools.map(_._2).sum === in.map(_._3).sum, s"$g sum")
      assert(pools.map(_._3).sum === in.map(_._4).sum, s"$g n")
      // every input x appears exactly once
      assert(rows.map(_._2).sorted.toSeq === in.map(_._2).sorted.toSeq)
    }
  }

  test("contaminationSpans == naive quadratic longest-run, random docs") {
    val rnd = new scala.util.Random(99L)
    val alpha = Vector("a", "b", "c", "d")
    def doc(len: Int): String =
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.size))).mkString(" ")
    val trains = (1L to 8L).map(i => (i, doc(6 + rnd.nextInt(20))))
    val benches = (101L to 106L).map(i => (i, doc(6 + rnd.nextInt(20))))
    val n = 3
    val got = Dedup.contaminationSpans(trains.toDF("doc_id", "text"),
        benches.toDF("doc_id", "text"), "text", "doc_id", n)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // naive: all (i, j) n-gram matches, longest run scanned per diagonal
    def grams(s: String): Vector[String] = {
      val w = s.split("\\s+").toVector
      (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toVector
    }
    for ((tid, ttext) <- trains; (bid, btext) <- benches) {
      val tg = grams(ttext); val bg = grams(btext)
      val matches = for {
        i <- tg.indices; j <- bg.indices if tg(i) == bg(j)
      } yield (i, j)
      if (matches.isEmpty) assert(!got.contains((tid, bid)))
      else {
        val runs = matches.groupBy { case (i, j) => i - j }.values.map {
          ms =>
            val is = ms.map(_._1).sorted
            // longest consecutive i stretch on this diagonal
            is.foldLeft((0, 0, -99)) { case ((best, cur, prev), i) =>
              val c = if (i == prev + 1) cur + 1 else 1
              (math.max(best, c), c, i)
            }._1
        }
        val naive = (runs.max.toLong + (n - 1),
          matches.length.toLong,
          matches.groupBy { case (i, j) => i - j }.values
            .map { ms =>
              val is = ms.map(_._1).sorted
              is.zipWithIndex.map { case (i, k) => i - k }.distinct.length
            }.sum.toLong)
        assert(got((tid, bid)) === naive, s"pair ($tid,$bid)")
      }
    }
  }
}
