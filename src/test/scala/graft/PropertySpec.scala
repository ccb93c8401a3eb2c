package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.{Rounding, Text}
import graft.expressions.RelevantTitleMatcher
import org.apache.spark.unsafe.types.UTF8String

/** Pure (no-Spark) ScalaCheck properties over the driver-side twins of
  * the operators — fast, hundreds of samples each.
  */
object TextProps extends Properties("text") {

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val companyName: Gen[String] = for {
    n <- Gen.chooseNum(1, 4)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  property("stripSuffixLiteral is idempotent") = forAll(companyName) { n =>
    val once = Text.stripSuffixLiteral(n)
    Text.stripSuffixLiteral(once) == once
  }

  property("stripping a just-appended suffix restores the name") =
    forAll(companyName, Gen.oneOf(Text.CorporateSuffixes)) { (n, sfx) =>
      // names that already end in a (different) suffix strip twice by design
      val base = Text.stripSuffixLiteral(n)
      base.isEmpty || Text.stripSuffixLiteral(s"$base $sfx") == base
    }

  property("relevant title implies the title contains some search phrase") =
    forAll(companyName, companyName, word) { (title, longName, ticker) =>
      val hit = RelevantTitleMatcher.matches(
        UTF8String.fromString(title), UTF8String.fromString(longName),
        UTF8String.fromString(ticker))
      !hit || {
        val t = title.toLowerCase
        t.contains(longName.toLowerCase) ||
          t.contains(Text.stripSuffixLiteral(longName.toLowerCase)) ||
          t.contains(ticker.toLowerCase)
      }
    }
}

object WinnowProps extends Properties("winnow") {
  import graft.operators.TextAnalysis.{WinnowBase, WinnowMod}

  /** Driver-side twin of TextAnalysis.winnowFrame's fingerprint layer. */
  def krHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * WinnowBase + c.toLong) % WinnowMod)
  def fingerprints(text: String, k: Int, w: Int): Seq[Long] = {
    val hs =
      if (text.length >= k)
        (0 to text.length - k).map(i => krHash(text.substring(i, i + k)))
      else IndexedSeq(krHash(text))
    val fps =
      if (hs.length >= w) (0 to hs.length - w).map(j => hs.slice(j, j + w).min)
      else IndexedSeq(hs.min)
    fps.distinct
  }

  // small alphabet so random texts actually collide
  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val (k, w) = (5, 4)

  property("fingerprint count within [1, n_kgrams]") = forAll(text) { t =>
    val fps = fingerprints(t, k, w)
    val nk = math.max(1, t.length - k + 1)
    fps.nonEmpty && fps.size <= nk
  }

  property("the winnowing guarantee: docs sharing >= w+k-1 chars share a fingerprint") =
    forAll(text, text, text, text, text) { (shared0, p1, s1, p2, s2) =>
      val shared = (shared0 + "x" * (w + k - 1)).take(w + k - 1 + shared0.length)
      val (d1, d2) = (p1 + shared + s1, p2 + shared + s2)
      fingerprints(d1, k, w).intersect(fingerprints(d2, k, w)).nonEmpty
    }

  property("fingerprints are insensitive to appending after a full window") =
    // every fingerprint of the original text's CLOSED windows survives a
    // suffix append (new windows only ADD prints at the boundary)
    forAll(text, text) { (t0, sfx) =>
      val t = t0 + "x" * (w + k - 1) // ensure at least one closed window
      val before = fingerprints(t, k, w).toSet
      val after = fingerprints(t + sfx, k, w).toSet
      // all but the last w-1 windows are untouched by the append
      val hs = (0 to t.length - k).map(i => krHash(t.substring(i, i + k)))
      val closed = (0 to hs.length - w - (w - 1))
        .map(j => hs.slice(j, j + w).min).toSet
      closed.subsetOf(before) && closed.subsetOf(after)
    }
}

object WinnowKernelProps extends Properties("winnow-kernels") {
  import graft.expressions.WinnowKernels
  import graft.operators.TextAnalysis.{WinnowBase, WinnowMod}

  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar, 1 -> Gen.const(' '), 1 -> Gen.const('é')))
  } yield cs.mkString

  private def directHash(cps: Seq[Int], k: Int): Seq[Long] = {
    // the staged-HOF definition: Σ c·B^(k−1−j) mod P per k-gram, or the
    // whole-text Horner fold for docs shorter than k
    val pow = Array.iterate(1L, k)(x => x * WinnowBase % WinnowMod)
    if (cps.length >= k)
      (0 to cps.length - k).map(i =>
        (0 until k).map(j => cps(i + j) * pow(k - 1 - j) % WinnowMod)
          .foldLeft(0L)((a, b) => (a + b) % WinnowMod))
    else Seq(cps.foldLeft(0L)((a, c) => (a * WinnowBase + c) % WinnowMod))
  }

  property("rolling hashes equal the direct polynomial definition") =
    forAll(doc, Gen.chooseNum(1, 8)) { (s, k) =>
      val cps = WinnowKernels.codePoints(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      WinnowKernels.hashes(cps, k, WinnowBase, WinnowMod).toSeq ==
        directHash(cps.toSeq, k)
    }

  property("window minima equal the sliding-min definition") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000006L)),
      Gen.chooseNum(1, 6)) { (hs, w) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray)
      val got = WinnowKernels.windowMinima(arr, w).toSeq
      val want =
        if (hs.length >= w) hs.sliding(w).map(_.min).toSeq else Seq(hs.min)
      got == want
    }
}

object RoundingProps extends Properties("rounding") {
  private val reasonable = Gen.chooseNum(-1e6, 1e6)

  property("stableVal(x,4) within half-ulp of a true 4dp rounding") =
    forAll(reasonable) { x =>
      math.abs(Rounding.stableVal(x, 4) - x) <= 5.001e-5
    }

  property("stableVal is idempotent") = forAll(reasonable) { x =>
    val r = Rounding.stableVal(x, 4)
    Rounding.stableVal(r, 4) == r
  }
}

/** Spark-side property-style checks: one seeded random dataset, one job
  * per property, row-level assertions (the forAll-per-sample pattern
  * would launch hundreds of Spark jobs).
  */
class SparkAlgebraSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.operators._

  private val rng = new scala.util.Random(42)
  private val series = (1 to 40).flatMap { k =>
    (1 to 25).map(t => (k.toLong, t, rng.nextDouble() * 100 + 1))
  }

  test("property: pct_change matches the direct two-row algebra on random series") {
    val df = series.toDF("k", "t", "v")
    val got = PctChange.withPctChange(df, Seq("k"), Seq(col("t")), "v")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    val byKey = series.groupBy(_._1)
    byKey.foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, prev), (_, t, cur)) =>
          // mirror Spark's round(): shortest-decimal-repr HALF_UP
          val expected = new java.math.BigDecimal(
              java.lang.Double.toString((cur / prev - 1) * 100))
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
          assert(got((k, t)).get == expected)
        case _ =>
      }
      assert(got((k, sorted.head._2)).isEmpty) // first row null
    }
  }

  test("property: winnowStats equals the driver-side twin on random small-alphabet docs") {
    val docs = (0 until 120).map { i =>
      val len = rng.nextInt(60) // includes len < k and < w+k-1 degenerates
      (i.toLong, (0 until len).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
    }
    val got = TextAnalysis.winnowStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    docs.foreach { case (id, t) =>
      val fps = WinnowProps.fingerprints(t, 5, 4)
      val nk = if (t.length >= 5) t.length - 4 else 1
      assert(got(id) == ((nk, fps.size, fps.min, fps.max, fps.sum)),
        s"doc $id '${t.take(20)}…'")
    }
  }

  test("property: bloom literal probe equals a driver-side md5 twin on random corpora") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val nWords = Dedup.BloomWords.toLong
    def positions(t: String): Seq[Long] = (0 until Dedup.BloomHashes).map { i =>
      java.lang.Long.parseLong(md5hex(t).substring(i * 8, i * 8 + 8), 16) %
        (nWords * 32L)
    }
    val base = (0 until 150).map(i =>
      (i.toLong, (0 until 1 + rng.nextInt(6)).map(_ =>
        ('a' + rng.nextInt(4)).toChar.toString * (1 + rng.nextInt(3))).mkString(" ")))
    val probes = base ++ (0 until 60).map(i =>
      (1000L + i, s"probe ${rng.nextInt(100)} ${('a' + rng.nextInt(26)).toChar}"))
    // driver twin: same slices, same word/mask layout
    val twin = scala.collection.mutable.Set.empty[Long]
    base.foreach { case (_, t) => positions(t).foreach(twin += _) }
    def twinVerdict(t: String) = positions(t).forall(twin.contains)
    val words = Dedup.bloomBits(base.toDF("doc_id", "text"), "text", nWords.toInt)
    // the packed bitmap holds exactly the twin's positions
    val packed = words.zipWithIndex.flatMap { case (m, w) =>
      (0 until 32).collect { case b if (m & (1L << b)) != 0L => w * 32L + b } }
    assert(packed.toSet == twin.toSet)
    val got = probes.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.bloomMaybeContains(words, col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach { case (id, t) =>
      assert(got(id) == twinVerdict(t), s"doc $id '$t'") }
  }

  test("property: nearestCentroidId equals a driver-side argmax twin (6-dp, ties to lower cid)") {
    val cents = (0 until 3).map(c =>
      c -> (Seq((c + 1) / 2.0) ++ Seq.fill(3)((rng.nextInt(9) - 4) / 2.0)))
    // +0.5 head component keeps every vector nonzero (cosine defined)
    val vecs = (0 until 120).map(i =>
      (i.toLong, Array(0.5f + rng.nextInt(3)) ++
        Array.fill(3)((rng.nextInt(9) - 4).toFloat / 2f)))
    def dot(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
    def cos6(a: Seq[Double], b: Seq[Double]) = BigDecimal(
        java.lang.Double.toString(
          dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def twin(v: Seq[Double]): Int =
      cents.map { case (cid, cv) => (cid, cos6(v, cv)) }
        .maxBy { case (cid, c) => (c, -cid) }._1
    val got = vecs.toDF("id", "vec")
      .select(col("id"), Similarity.nearestCentroidId(
        Similarity.asDouble(col("vec")), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == twin(v.map(_.toDouble).toSeq), s"vec $id") }
  }

  test("property: per-row pqRv equals the distributed encode∘reconstruct on random vectors") {
    // the r16 zero-shuffle ADC kernel must select the SAME codeword as
    // the join/agg chain for every block of every vector — including
    // exact-tie blocks (first-position argmin vs min_by struct order)
    val dim = 8; val m = 4; val subDim = 2
    val emb = (0 until 60).map { i =>
      // quantized components make exact distance ties actually occur
      (i.toLong, Array.fill(dim)((rng.nextInt(5) - 2).toFloat))
    }.toDF("id", "vec")
    val cw = Similarity.trainPqCodebooks(emb, "id", "vec",
      m = m, subDim = subDim, k = 5, iters = 2)
    val cwBlocks = cw.toDF("m", "cwid", "cwblk")
    val joinForm = Similarity.pqReconstructBlocks(
        Similarity.pqEncodeBlocks(emb, cwBlocks, m, subDim), cwBlocks)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rowForm = emb.select(col("id"),
        Similarity.pqRv(Similarity.asDouble(col("vec")), cw, m, subDim).as("rv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rowForm == joinForm)
  }

  test("property: dsir weights match the driver-side twin on random corpora") {
    val words = Seq("aa", "bb", "cc", "dd")
    val docs = (0 until 80).map { i =>
      val n = 1 + rng.nextInt(8)
      (i.toLong, if (i % 7 == 0) "t" else "r",
        (0 until n).map(_ => words(rng.nextInt(words.size))).mkString(" "))
    }
    val nb = 32
    val got = TextAnalysis.dsirScores(docs.toDF("doc_id", "source", "text"),
        "doc_id", "text", col("source") === "t", nb)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def grams(t: String) = {
      val ts = t.split(" ", -1).toSeq
      ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(g: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(d.take(6), 16) % nb).toInt
    }
    def bits(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val tgt = docs.filter(_._2 == "t").flatMap(d => grams(d._3)).map(bucket)
    val raw = docs.filter(_._2 == "r")
      .flatMap(d => grams(d._3).map(d._1 -> bucket(_)))
    val ct = tgt.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = raw.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val shift = bits(raw.size.toLong + nb) - bits(tgt.size.toLong + nb)
    raw.groupBy(_._1).foreach { case (id, gs) =>
      val gsum = gs.map { case (_, b) =>
        bits(ct.getOrElse(b, 0L) + 1) - bits(cr(b) + 1) }.sum
      assert(got(id) == ((gs.size.toLong, gsum + gs.size * shift)))
    }
  }

  test("property: top1 equals the max over candidates for every key") {
    val df = series.toDF("k", "t", "v")
    val got = Recency.top1(df, Seq("k"), Seq(col("t").desc))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    series.groupBy(_._1).foreach { case (k, rows) =>
      assert(got(k) == rows.map(_._2).max)
    }
  }

  test("property: sentiment score stays in [-1,1] and sign matches label on random text") {
    val words = Seq("fast", "slow", "big", "small", "table", "query", "the", "a")
    val texts = (1 to 300).map(_ =>
      (1 to rng.nextInt(12) + 1).map(_ => words(rng.nextInt(words.length))).mkString(" "))
    val out = texts.toDF("h").select(Sentiment.analyze(col("h")).as("s"))
      .select("s.label", "s.score").collect()
    out.foreach { r =>
      val (label, score) = (r.getString(0), r.getDouble(1))
      assert(score >= -1.0 && score <= 1.0)
      label match {
        case "Positive" => assert(score > 0)
        case "Negative" => assert(score < 0)
        case "Neutral"  => assert(score == 0.0)
      }
    }
  }

  test("property: repetition signals match the direct count algebra on random docs") {
    val vocab = Seq("a", "b", "c", "d", "e")
    val docs = (1 to 60).map(i =>
      (i.toLong, (1 to rng.nextInt(30) + 2).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")))
    val got = TextAnalysis.repetition(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val topTok = Rounding.stableVal(
        toks.groupBy(identity).values.map(_.size).max.toDouble / toks.length, 4)
      val topBg = Rounding.stableVal(
        bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.length, 4)
      val dupBg = Rounding.stableVal(
        1 - bigrams.distinct.length.toDouble / bigrams.length, 4)
      assert(got(id) == ((topTok, topBg, dupBg, topTok >= 0.12 || dupBg >= 0.05)),
        s"doc $id: '$text'")
    }
  }

  test("property: tfidf matches the direct formula and tie-broken ranking") {
    val vocab = Seq("x", "y", "z", "w", "q", "r")
    val docs = (1 to 40).map(i =>
      (i.toLong, (1 to rng.nextInt(15) + 1).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")))
    val got = TextAnalysis.tfidf(docs.toDF("doc_id", "text"), "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getDouble(2), r.getInt(3)))).toMap
    val n = docs.length
    val dfreq = docs.flatMap { case (_, t) => t.split(" ").distinct }
      .groupBy(identity).map { case (w, xs) => w -> xs.length }
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val expected = toks.groupBy(identity).toSeq.map { case (w, xs) =>
        val score = Rounding.stableVal(
          (xs.length.toDouble / toks.length) *
            ((n - dfreq(w) + 0.5) / (dfreq(w) + 0.5)), 4)
        (w, score)
      }.sortBy { case (w, s) => (-s, w) }.take(2)
      expected.zipWithIndex.foreach { case ((w, s), i) =>
        assert(got((id, w)) == ((s, i + 1)), s"doc $id term $w")
      }
    }
  }

  test("property: fixed-point centroids equal the exact integer-sum mean") {
    val emb = (1 to 50).map(i =>
      (i.toLong, i % 4, Array.fill(8)(rng.nextFloat() * 2 - 1)))
    val got = Similarity.labelCentroids(
        emb.toDF("vec_id", "label", "embedding"), "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    emb.groupBy(_._2).foreach { case (label, vs) =>
      val expected = (0 until 8).map { d =>
        val q = vs.map(v => Rounding.stableVal(v._3(d).toDouble * 1e6, 0).toLong).sum
        q.toDouble / (vs.length * 1e6)
      }
      assert(got(label) == expected, s"label $label")
    }
  }

  test("property: duplicateClusters equals union-find components on random graphs") {
    val n = 80
    val nodeIds = (0L until n).toSeq
    val edges = (1 to 60).map(_ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)).filter(e => e._1 != e._2)
    // driver-side union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = nodeIds.map(i => i -> {
      // component min = min over members sharing the root
      val r = find(i.toInt)
      nodeIds.filter(j => find(j.toInt) == r).min
    }).toMap
    val got = Dedup.duplicateClusters(
        nodeIds.toDF("id"), edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("property: segmentAudio equals a driver-side fold on random payloads") {
    val thr = 2048L
    // random lengths incl. 0, sub-window, and non-multiples of 16
    val payloads = (0L until 150L).map { i =>
      val len = rng.nextInt(200)
      val p = new Array[Byte](len)
      rng.nextBytes(p)
      (i, p)
    }
    def energies(p: Array[Byte]): Seq[Long] = {
      val n = math.max(1, p.length / 16)
      (0 until n).map(w =>
        p.slice(w * 16, math.min(w * 16 + 16, p.length))
          .map(b => (b & 0xff).toLong).sum)
    }
    def fold(p: Array[Byte]): Seq[(Int, Boolean, Int, Long, Long)] = {
      val es = energies(p)
      val runs = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Boolean, Int, Long, Long)]
      es.zipWithIndex.foreach { case (e, w) =>
        val f = e >= thr
        if (runs.nonEmpty && runs.last._2 == f) {
          val l = runs.last
          runs(runs.length - 1) = (l._1, f, l._3, l._4 + 1, l._5 + e)
        } else runs += ((runs.length + 1, f, w, 1L, e))
      }
      runs.toSeq
    }
    val got = Multimodal.segmentAudio(payloads.toDF("doc_id", "payload"), thr)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2),
        r.getInt(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(t => (t._2, t._3, t._4, t._5, t._6)).toSeq
      }
    payloads.foreach { case (id, p) =>
      assert(got(id) == fold(p), s"doc $id (len ${p.length})")
    }
  }

  test("property: videoNearDupPairs equals a driver-side set-overlap twin on random corpora") {
    import graft.operators.Multimodal
    val (dfCap, minShared, containMin) = (6, 2L, 0.6)
    // small block alphabet so sig collisions (and hot sigs) are real
    val docs = (0L until 60L).map { i =>
      val nBlocks = 1 + rng.nextInt(5)
      (i, (0 until nBlocks * 2).map(_ => ('a' + rng.nextInt(6)).toChar.toString)
        .mkString(" "))
    }
    def blockSigs(t: String): Set[String] = t.split(" ").grouped(2)
      .map(g => java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8"))
        .take(7).map(b => f"${b & 0xff}%02x").mkString).toSet
    val sigSets = docs.map { case (i, t) => i -> blockSigs(t) }.toMap
    val df = sigSets.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val kept = sigSets.map { case (i, ss) => i -> ss.filter(df(_) <= dfCap) }
    val expected = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      sh = (kept(a) intersect kept(b)).size.toLong if sh >= minShared
    } yield {
      val c = Rounding.stableVal(
        sh.toDouble / math.min(sigSets(a).size, sigSets(b).size), 4)
      (a, b, sh, sigSets(a).size.toLong, sigSets(b).size.toLong, c,
        c >= containMin)
    }).toSet
    val got = Multimodal.videoNearDupPairs(
        Multimodal.frameSignatures(Multimodal.attachVideoPayload(
          docs.toDF("doc_id", "text"), blockTokens = 2)),
        dfCap = dfCap, minShared = minShared, containMin = containMin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture produced no pairs — property vacuous")
  }

  test("property: shuffleLayout equals the driver rank model; invariant to bucket size") {
    // sparse non-contiguous ids exercise uneven h-bucket population
    val ids = (0 until 300).map(_ => rng.nextLong(1L << 40)).distinct
    def model(shard: Long): Set[(Long, Long, Long)] = ids
      .map(i => (i, Packing.shuffleHash(i)))
      .sortBy { case (id, h) => (h, id) }
      .zipWithIndex
      .map { case ((id, _), r) => (id, r.toLong / shard, r.toLong % shard) }
      .toSet
    val df = ids.toDF("doc_id")
    for (bucketSize <- Seq(1L << 16, 1L << 21, 1L << 28)) {
      val got = Packing.shuffleLayout(df, "doc_id", shardSize = 17L,
          hBucketSize = bucketSize)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == model(17L), s"bucketSize=$bucketSize diverged from the rank spec")
    }
  }

  test("property: bpeMerges equals an independent driver BPE trainer on random corpora") {
    // independent reimplementation: word-freq map, symbol lists, greedy
    // left-to-right merge — NO shared code with the operator
    def driverBpe(words: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
      val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var syms: Map[List[String], Long] =
        freq.map { case (w, f) => w.toList.map(_.toString) -> f }
          .groupBy(_._1).view.mapValues(_.values.sum).toMap
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var r = 1
      var go = true
      while (r <= rounds && go) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((s, f) <- syms; i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
        if (counts.isEmpty) go = false
        else {
          val (pa, pb) = counts.keys.toSeq
            .sortBy { case (a, b) => (-counts((a, b)), a, b) }.head
          out += ((r, pa, pb, counts((pa, pb))))
          def mergeOne(s: List[String]): List[String] = s match {
            case a :: b :: rest if a == pa && b == pb => (a + b) :: mergeOne(rest)
            case a :: rest => a :: mergeOne(rest)
            case Nil => Nil
          }
          syms = syms.toSeq.map { case (s, f) => mergeOne(s) -> f }
            .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          r += 1
        }
      }
      out.result()
    }
    for (trial <- 1 to 5) {
      val vocab = Seq("aa", "aab", "abab", "ba", "bb", "aaa", "abc", "cab")
      val words = (1 to 40).map(_ => vocab(rng.nextInt(vocab.length)))
      val docs = words.grouped(5).map(_.mkString(" ")).toSeq.toDF("text")
      val got = TextAnalysis.bpeMerges(docs, "text", rounds = 4)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == driverBpe(words, 4), s"trial $trial: $got vs ${driverBpe(words, 4)}")
    }
  }

  test("property: rrfFuse equals the driver fusion model on random rankings") {
    for (_ <- 1 to 5) {
      val aList = rng.shuffle((1L to 30L).toList).take(8).zipWithIndex
        .map { case (id, i) => (id, i + 1) }
      val bList = rng.shuffle((1L to 30L).toList).take(6).zipWithIndex
        .map { case (id, i) => (id, i + 1) }
      val am = aList.toMap
      val bm = bList.toMap
      val fused = (am.keySet ++ bm.keySet).toSeq
        .map { id =>
          val s = am.get(id).map(r => 1.0 / (r + 60)).getOrElse(0.0) +
            bm.get(id).map(r => 1.0 / (r + 60)).getOrElse(0.0)
          (id, Rounding.stableVal(s, 6))
        }
        .sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, s), i) => (id, s, i + 1) }.toSet
      val got = TextAnalysis.rrfFuse(
          aList.toDF("doc_id", "a_rnk"), "a_rnk",
          bList.toDF("doc_id", "b_rnk"), "b_rnk",
          "doc_id", kConst = 60, topK = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(3), r.getInt(4))).toSet
      assert(got == fused)
    }
  }

  test("property: softWeights equals 1/|component| from union-find on random graphs") {
    val n = 60
    val nodeIds = (0L until n).toSeq
    val edges = (1 to 40).map(_ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)).filter(e => e._1 != e._2)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val compSize = nodeIds.groupBy(i => find(i.toInt)).view.mapValues(_.size.toLong).toMap
    val got = Dedup.softWeights(nodeIds.toDF("id"), edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    nodeIds.foreach { i =>
      val sz = compSize(find(i.toInt))
      assert(got(i) == ((sz, Rounding.stableVal(1.0 / sz, 6))), s"node $i")
    }
    // total mass = number of components, up to rounding
    assert(math.abs(got.values.map(_._2).sum - compSize.size) < 1e-3)
  }

  test("property: mmrRerank equals the driver greedy model on random vectors") {
    def cos6(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      math.round(r * 1e6) / 1e6
    }
    for (trial <- 1 to 3) {
      val vecs = (0L until 12L).map(i =>
        (i, Array.fill(6)((rng.nextInt(9) - 4).toFloat + 0.5f)))
      val emb = vecs.toDF("id", "vec")
      val vd = vecs.map { case (i, v) => i -> v.map(_.toDouble).toSeq }.toMap
      val lam = 0.7
      // driver greedy model over the brute shortlist of ONE query (id 0)
      val rel = vd.keys.filter(_ != 0L).map(c => c -> cos6(vd(0L), vd(c))).toMap
      val short = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(6).map(_._1)
      var selected = List.empty[Long]
      val picks = (1 to 3).map { step =>
        val cands = short.filterNot(selected.contains)
        val scored = cands.map { c =>
          val obj =
            if (selected.isEmpty) Rounding.stableVal(rel(c) * lam, 6)
            else Rounding.stableVal(
              rel(c) * lam - selected.map(s => cos6(vd(c), vd(s))).max * (1 - lam), 6)
          (c, obj)
        }
        val (pick, obj) = scored.minBy { case (c, o) => (-o, c) }
        selected ::= pick
        (pick, obj, step)
      }.toSet
      val got = Similarity.mmrRerank(emb.filter(col("id") === 0L), emb,
          k = 3, shortlist = 6, lam = lam)
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(got == picks, s"trial $trial: $got vs $picks")
    }
  }

  test("property: salted aggregation equals direct aggregation") {
    val df = series.toDF("k", "t", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n_rows"), sum("v").as("total"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val salted = Salting.saltedSumCount(df, Seq("k"), "v", "t", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    direct.foreach { case (k, (n, tot)) =>
      val (sn, stot) = salted(k)
      assert(sn == n && math.abs(stot - tot) < 1e-6)
    }
  }

  test("property: native asOfJoin equals the brute-force pick on random data") {
    val left = (1 to 30).flatMap { k =>
      (1 to 10).map(i => (k.toLong, rng.nextInt(1000).toLong, i.toDouble))
    }
    val right = (1 to 30).flatMap { k =>
      // distinct times per key for a deterministic pick
      rng.shuffle((0 until 1000).toList).take(8).map(t => (k.toLong, t.toLong, k * 1000.0 + t))
    }
    def ts(v: Long) = new java.sql.Timestamp(v * 1000L)
    val lDf = left.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "t", "lv")
    val rDf = right.map { case (k, t, v) => (k, ts(t), v) }.toDF("rk", "rt", "rv")
    val tol = java.time.Duration.ofSeconds(100)
    val rByKey = right.groupBy(_._1)
    // both physical paths must match the brute-force pick
    for (threshold <- Seq("10MB", "-1")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      try {
        val got = AsOf.asOfJoin(lDf, rDf, "k", "rk", "t", "rt", tol)
          .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
            r.getDouble(2)) -> Option(r.get(5)).map(_.asInstanceOf[Double])).toMap
        left.foreach { case (k, t, lv) =>
          val expected = rByKey.getOrElse(k, Nil)
            .filter(r => r._2 <= t && t - r._2 <= 100)
            .sortBy(_._2).lastOption.map(_._3)
          assert(got((k, t, lv)) == expected, s"key $k t $t threshold $threshold")
        }
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("property: sorted_intersect_count equals size(array_intersect) on random sets") {
    val rows = (1 to 200).map { i =>
      val a = (1 to rng.nextInt(30)).map(_ => rng.nextInt(50).toLong).distinct.sorted
      val b = (1 to rng.nextInt(30)).map(_ => rng.nextInt(50).toLong).distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    val out = df.select(col("i"),
        graft.expressions.SortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2), s"row ${r.getInt(0)}"))
  }

  test("property: TopKByCount aggregate equals the window-rank top-k on random counts") {
    val data = (1 to 500).map(i =>
      (s"g${i % 7}", s"tag$i", rng.nextInt(40).toLong + 1))
    val df = data.toDF("g", "tag", "cnt")
    val topk = graft.functions.TopK.topKByCount(5)
    val got = df.groupBy(col("g")).agg(topk(col("cnt"), col("tag")).as("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getString(1)))).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val expected = rows.map(r => (r._3, r._2))
        .sortBy { case (c, t) => (-c, t) }.take(5)
      assert(got(g) == expected, s"group $g")
    }
  }

  test("property: TopKByScore aggregate equals the window-rank top-k on random scores") {
    val data = (1 to 400).map(i =>
      (i.toLong % 9, i.toLong, Rounding.stableVal(rng.nextDouble() * 2 - 1, 6)))
    val df = data.toDF("q_id", "c_id", "cos")
    val topk = graft.functions.TopK.topKByScore(4)
    val got = df.groupBy(col("q_id")).agg(topk(col("cos"), col("c_id")).as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1)))).toMap
    data.groupBy(_._1).foreach { case (q, rows) =>
      val expected = rows.map(r => (r._3, r._2))
        .sortBy { case (s, i) => (-s, i) }.take(4)
      assert(got(q) == expected, s"query $q")
    }
  }

  test("property: bandedKeys equals the fold-form banding on random documents") {
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (1 to 120).map { i =>
      val n = rng.nextInt(10) // includes 0- and <3-token shorts
      (i.toLong, (0 until n).map(_ => words(rng.nextInt(words.length))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val fold = df
      .select(col("doc_id").as("id"), Dedup.tokenValues(col("text")).as("tv"))
      .select(col("id"), Dedup.shingleValuesFromTokens(col("tv")).as("sh"))
      .select(col("id"),
        posexplode(Dedup.bandKeys(col("sh"), 4, 3)).as(Seq("band_id", "band_key")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val agg = Dedup.bandedKeys(df, "doc_id", "text", 4, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(agg == fold)
  }

  test("property: sessionization matches the brute-force gap scan on random series") {
    val events = (1 to 20).flatMap { k =>
      var t = 0L
      (1 to 30).map { i =>
        t += rng.nextInt(4000)  // gaps straddle the 1800s boundary
        (k.toLong, new java.sql.Timestamp(t * 1000L), (k * 1000 + i).toLong)
      }
    }
    val df = events.toDF("k", "ts", "event_id")
    val got = Sessions.aggregate(df, "k", "ts", Seq("event_id"), 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getTimestamp(3).getTime, r.getTimestamp(4).getTime))).toMap
    events.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2.getTime, r._3))
      var sid = 0L
      var prev = Long.MinValue
      val bySession = scala.collection.mutable.Map[Long, List[Long]]()
      sorted.foreach { case (_, ts, _) =>
        val t = ts.getTime
        if (prev != Long.MinValue && t - prev > 1800 * 1000L) sid += 1
        bySession(sid) = t :: bySession.getOrElse(sid, Nil)
        prev = t
      }
      bySession.foreach { case (s, times) =>
        assert(got((k, s)) == ((times.length.toLong, times.min, times.max)),
          s"key $k session $s")
      }
    }
  }

  test("property: funnel stage scan equals the sequential recurrence on random logs") {
    // validates the distributed machinery (keyed shuffle + secondary
    // sort + lazy iterator) against the sequential walk it implements
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.IdEv
    val steps = Seq("view", "click", "purchase")
    val types = Vector("view", "click", "purchase", "signup")
    // µs-precision reference: getTime alone is millisecond-truncated
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val events = (1 to 30).flatMap { u =>
      (1 to 40).map { i =>
        // dense seconds => real ties; µs jitter => same-millisecond
        // collisions that a getTime comparison would mis-order
        val t = new java.sql.Timestamp(rng.nextInt(50) * 1000L)
        t.setNanos(rng.nextInt(1000) * 1000)
        IdEv(u.toLong, (u * 1000 + i).toLong, types(rng.nextInt(4)), t)
      }
    }
    val got = StreamingFunnel.stageAdvancesScan(events.toDS(), steps)
      .collect().map(a => (a.user_id, a.stage, a.event_type, us(a.ts))).toSet
    val expected = events.groupBy(_.user_id).flatMap { case (u, evs) =>
      var stage = 0
      var last = Long.MinValue
      evs.sortBy(e => (us(e.ts), e.event_id)).flatMap { e =>
        if (stage < steps.length && e.event_type == steps(stage) &&
            us(e.ts) > last) {
          stage += 1; last = us(e.ts)
          Some((u, stage, e.event_type, us(e.ts)))
        } else None
      }
    }.toSet
    assert(got == expected)
  }

  test("property: firstSeenScan picks the (ts, id)-min row with exact dup counts") {
    val rows = (1 to 200).map { i =>
      (i.toLong, new java.sql.Timestamp(rng.nextInt(1000) * 1000L),
        s"text ${rng.nextInt(20)}") // 20-text pool => guaranteed collisions
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = graft.streaming.StreamingDedup
      .firstSeenScan(rows.toDF("id", "ts", "text"), "id", "text", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getTimestamp(2).getTime, r.getLong(3)))).toMap
    assert(got.size == rows.map(_._3).distinct.size)
    rows.groupBy(_._3).foreach { case (text, rs) =>
      val first = rs.minBy(r => (r._2.getTime, r._1))
      assert(got(md5hex(text)) ==
        ((first._1, rs.map(_._2.getTime).min, rs.size.toLong)), s"text '$text'")
    }
  }

  test("property: calendar emits only weekdays and respects inclusive bounds") {
    val dates = Calendar.tradingDates(spark, "2023-11-07", "2024-02-19")
      .collect().map(_.getDate(0).toLocalDate)
    assert(dates.head == java.time.LocalDate.parse("2023-11-07"))
    assert(dates.last == java.time.LocalDate.parse("2024-02-19"))
    assert(dates.forall(d => d.getDayOfWeek.getValue <= 5))
    // every weekday in range present exactly once
    val expected = Iterator.iterate(java.time.LocalDate.parse("2023-11-07"))(_.plusDays(1))
      .takeWhile(!_.isAfter(java.time.LocalDate.parse("2024-02-19")))
      .filter(_.getDayOfWeek.getValue <= 5).toSeq
    assert(dates.toSeq == expected)
  }
}
