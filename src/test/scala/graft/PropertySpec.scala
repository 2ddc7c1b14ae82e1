package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Dialect

/** Generator-driven semantic properties. */
class PropertySpec extends SparkSpec {

  private def assertProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val ident = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))

  test("dialect translation: strips backticks/ENGINE, maps types, is idempotent") {
    import spark.implicits._
    val mysqlType = Gen.oneOf("DOUBLE", "DATETIME", "LONGBLOB", "LONGTEXT", "TINYINT(1)", "INT")
    val gen = for {
      t <- ident; c1 <- ident; ty1 <- mysqlType; ty2 <- mysqlType
      eng <- Gen.oneOf("", " ENGINE=InnoDB", " engine = MyISAM")
    } yield s"CREATE TABLE `$t` ($c1 $ty1, x $ty2)$eng"
    assertProp(Prop.forAll(gen) { ddl =>
      val out = Seq(ddl).toDF("sql")
        .select(Dialect.translateSql(col("sql")).as("t"))
        .head.getString(0)
      val twice = Seq(out).toDF("sql")
        .select(Dialect.translateSql(col("sql")).as("t"))
        .head.getString(0)
      !out.contains("`") && !out.contains("ENGINE") &&
        !out.contains("DATETIME") && !out.contains("LONGBLOB") &&
        !out.contains("LONGTEXT") && !out.contains("TINYINT(1)") &&
        twice == out
    }, n = 30)
  }

  test("funnelLevelOrdered equals the array funnelLevel kernel on random histories") {
    // the batch op's spill-safe one-pass kernel vs the buffer kernel the
    // streaming twin uses: both must decide the same EXISTS-chain levels
    val ev = for {
      tpe <- Gen.oneOf("view", "click", "purchase", "scroll")
      us <- Gen.choose(0L, 400L)
      eid <- Gen.choose(0L, 1000000L)
    } yield (tpe, us, eid)
    val gen = Gen.listOf(ev).map(_.distinctBy(_._3))
    assertProp(Prop.forAll(gen) { evs =>
      val w = 100L
      val sorted = evs.sortBy { case (_, us, eid) => (us, eid) }
      val one = graft.operators.AnalyticsExt.funnelLevelOrdered(
        sorted.iterator.map { case (t, us, _) => (t, us) }, w)
      val arr = graft.operators.AnalyticsExt.funnelLevel(evs.toArray, w)
      one == arr
    }, n = 200)
  }

  test("cdc snapshot equals an in-memory replay fold for random event logs") {
    val gen = Gen.nonEmptyListOf(for {
      pk <- Gen.choose(0, 5)
      op <- Gen.oneOf("signup", "click", "purchase", "view", "error")
      v <- Gen.choose(0, 10000).map(_ / 100.0)
    } yield (pk.toLong, op, v))
    assertProp(Prop.forAll(gen) { events =>
      val rows = events.zipWithIndex.map { case ((pk, op, v), i) =>
        Row(i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), pk, op, v, "{}")
      }
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(rows.asJava, schema)
      df.createOrReplaceTempView("events_prop")

      // the operator's plan shape, applied to this random log
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      val got = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // straight-line replay semantics
      val expect = events.zipWithIndex
        .groupBy(_._1._1)
        .flatMap { case (pk, evs) =>
          val (last, idx) = evs.last
          if (last._2 == "error") None else Some(pk -> idx.toLong)
        }
      got == expect
    }, n = 40)
  }

  test("SortedJaccard equals the array_intersect/array_union formulation") {
    import spark.implicits._
    val gen = for {
      a <- Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
      b <- Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
    } yield (a, b)
    assertProp(Prop.forAll(gen) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val fast = df.select(graft.plans.VectorExpressions.sortedJaccard(col("a"), col("b")))
        .head.getDouble(0)
      val ref = df.select(try_divide(
        size(array_intersect(col("a"), col("b"))).cast("double"),
        size(array_union(col("a"), col("b")))).as("j")).head
      val refV = if (ref.isNullAt(0)) 0.0 else ref.getDouble(0) // 0/0 -> null vs 0.0
      fast == refV
    }, n = 50)
  }

  test("ElectLane / ElectLaneMp equal an independent smallest-lane fold") {
    import spark.implicits._
    // small bucket range so lane collisions actually occur
    val lanesGen = Gen.listOfN(16, Gen.choose(0L, 3L))
    val gen = for {
      sl <- lanesGen; sf <- lanesGen; dl <- lanesGen
      m <- Gen.choose(0L, (1L << 16) - 1)
    } yield (sl, sf, dl, m)
    assertProp(Prop.forAll(gen) { case (sl, sf, dl, m) =>
      def ref(useFlips: Boolean): Int =
        (0 until 16).find(i => ((m >>> i) & 1L) == 1L &&
          (sl(i) == dl(i) || (useFlips && sf(i) == dl(i)))).getOrElse(-1)
      val df = Seq((sl, sf, dl, m)).toDF("sl", "sf", "dl", "m")
      val got = df.select(
        graft.plans.VectorExpressions.electLane(col("sl"), col("dl"), col("m")),
        graft.plans.VectorExpressions.electLaneMp(col("sl"), col("sf"), col("dl"), col("m")))
        .head
      got.getInt(0) == ref(useFlips = false) && got.getInt(1) == ref(useFlips = true)
    }, n = 60)
  }

  test("HyperplaneFlips flips exactly the weakest bit of the signature bucket") {
    import spark.implicits._
    val nTables = 3; val nPlanes = 4; val dim = 6
    def wgt(t: Int, p: Int, i: Int): Double = // deterministic small mix
      (((t * 31 + p * 7 + i * 3 + 1) * 2654435761L) % 101).toDouble / 101.0 - 0.5
    val planes = (for { t <- 0 until nTables; p <- 0 until nPlanes } yield
      Array.tabulate(dim)(i => wgt(t, p, i))).toArray
    val vecGen = Gen.listOfN(dim, Gen.choose(-3.0, 3.0).map(_.toFloat))
    assertProp(Prop.forAll(vecGen) { v =>
      val df = Seq(Tuple1(v)).toDF("v")
      val flips = df.select(
        graft.plans.VectorExpressions.hyperplaneFlips(col("v"), planes, nPlanes))
        .head.getSeq[Long](0)
      (0 until nTables).forall { t =>
        val dots = (0 until nPlanes).map { b =>
          planes(t * nPlanes + b).zip(v).map { case (w, x) => w * x.toDouble }.sum
        }
        val bucket = dots.zipWithIndex.filter(_._1 >= 0).map(1L << _._2).sum
        val weak = dots.map(math.abs).zipWithIndex.minBy { case (a, b) => (a, b) }._2
        flips(t) == (bucket ^ (1L << weak)) &&
          java.lang.Long.bitCount(flips(t) ^ bucket) == 1
      }
    }, n = 60)
  }

  test("PqEncode/PqLut/PqAdc agree with an independent recomputation") {
    import spark.implicits._
    // M=4 subspaces x 2 dims, K=3 centroids; vectors include the zero edge
    val vecGen = Gen.frequency(
      9 -> Gen.listOfN(8, Gen.choose(-5.0, 5.0).map(_.toFloat)),
      1 -> Gen.const(List.fill(8)(0.0f)))
    val bookGen = Gen.listOfN(4 * 3 * 2, Gen.choose(-1.0, 1.0))
      .map(_.toArray.grouped(2).toArray.grouped(3).toArray)
    assertProp(Prop.forAll(Gen.zip(vecGen, bookGen)) { case (v, books) =>
      // independent reference: normalize, per-subspace L2 argmin (low tie)
      val ss = v.map(x => x.toDouble * x).sum
      val inv = if (ss > 0) 1.0 / math.sqrt(ss) else 1.0
      val nv = v.map(_ * inv)
      val expected = (0 until 4).map { m =>
        val dists = (0 until 3).map { k =>
          (0 until 2).map { j =>
            val d = nv(m * 2 + j) - books(m)(k)(j); d * d
          }.sum
        }
        val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }
        (best._2, best._1)
      }
      val row = Seq(Tuple1(v)).toDF("v").select(
        graft.plans.VectorExpressions.pqEncode(col("v"), books).as("pq"),
        graft.plans.VectorExpressions.pqLut(col("v"), books).as("lut"))
        .select(col("pq").getField("codes").as("codes"),
          col("pq").getField("err").as("err"), col("lut"))
        .withColumn("adc", graft.plans.VectorExpressions.pqAdc(col("codes"), col("lut")))
        .head
      val codes = row.getSeq[Int](0)
      val err = row.getDouble(1)
      val adc = row.getDouble(3)
      codes == expected.map(_._1) &&
        math.abs(err - expected.map(_._2).sum) < 1e-12 &&
        math.abs(adc - err) < 1e-12
    }, n = 30)
  }

  test("KMV merge is order-insensitive and exact below k") {
    import graft.functions.Sketches
    val agg = new Sketches.KmvDistinct(64)
    val gen = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    assertProp(Prop.forAll(gen) { hashes =>
      val whole = hashes.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = hashes.splitAt(hashes.length / 2)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val mergedRev = agg.merge(r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce))
      val exact = hashes.distinct.size
      merged == whole && mergedRev == whole &&
        (exact >= 64 || agg.finish(whole).toLong == exact)
    })
  }

  test("SpaceSegCount equals the split-array length for arbitrary unicode text") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def count(s: String): Long =
      graft.plans.SpaceSegCount(Literal(s)).eval(null).asInstanceOf[Long]
    val str = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.const(' '),
      2 -> Gen.oneOf('é', '中', "😀".charAt(0), "😀".charAt(1))
    )).map(_.mkString)
    assertProp(Prop.forAll(str) { s =>
      // split(s, ' ', -1) keeps empty segments — the size(split(text,' '))
      // semantics both engines share; "" has one (empty) segment.
      count(s) == s.split(" ", -1).length.toLong
    })
    assert(count("") == 1L)
    assert(count("a b  c") == 4L)
  }

  test("scanCounts: fused scanner equals the regex/split definition on " +
    "adversarial and generated strings") {
    // the regex kernel text_tokens shipped with through r16 — kept here
    // as the definitional oracle for the r17 fused scanner
    val wordPat = java.util.regex.Pattern.compile("[a-z0-9]+")
    val bpePat = java.util.regex.Pattern.compile(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+")
    def viaRegex(text: String): (Int, Int, Int, Int) = {
      def countMatches(m: java.util.regex.Matcher): Int = {
        var n = 0
        while (m.find()) n += 1
        n
      }
      val toks = text.split(" ", -1)
      val seen = new java.util.HashSet[String](toks.length * 2)
      toks.foreach(seen.add)
      (toks.length, seen.size,
        countMatches(wordPat.matcher(text)), countMatches(bpePat.matcher(text)))
    }
    val fixed = Seq("", " ", "  ", "a", "a b", "a  b", " a", "a ", "  a  ",
      "a.b,c", "ab12cd", "12 34", "...", ". . .", "a1.b2", "héllo wörld",
      "a\tb", "\n\n", "mixed 42 bags!! of. tokens tokens 42",
      "😀 emoji 😀😀 runs")
    fixed.foreach { t =>
      val lc = t.toLowerCase(java.util.Locale.ROOT)
      assert(graft.operators.TextAnalysis.scanCounts(lc) == viaRegex(lc), s"on ${lc.take(40)}")
    }
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 2 -> Gen.numChar,
      1 -> Gen.oneOf('.', ',', '!', '-', 'é', '中'),
      1 -> Gen.const(' '))).map(_.mkString)
    assertProp(Prop.forAll(gen) { t =>
      val lc = t.toLowerCase(java.util.Locale.ROOT)
      graft.operators.TextAnalysis.scanCounts(lc) == viaRegex(lc)
    }, n = 200)
  }

  test("PiiScan: hand scanners equal the java.util.regex chain on " +
    "adversarial and generated strings") {
    import graft.operators.PiiScan
    val eP = java.util.regex.Pattern.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
    val ipP = java.util.regex.Pattern.compile("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")
    val phP = java.util.regex.Pattern.compile("\\b\\d{3}-\\d{4}\\b")
    def count(p: java.util.regex.Pattern, s: String): Int = {
      val m = p.matcher(s); var n = 0
      while (m.find()) n += 1
      n
    }
    def viaRegex(seeded: String): (Int, Int, Int, String) = {
      val e1 = eP.matcher(seeded).replaceAll("[EMAIL]")
      val e2 = ipP.matcher(e1).replaceAll("[IP]")
      val e3 = phP.matcher(e2).replaceAll("[PHONE]")
      (count(eP, seeded), count(ipP, seeded), count(phP, seeded), e3)
    }
    val fixed = Seq(
      "", "@", "a@b", "a@b.co", "a@b.c", "a@.com", "a@@b.com", "a@b@c.com",
      "x@y.comab@z.org", "a@b.co-m", "a@b.cd.e-fg", "a@1.2.3.4.com",
      "user10@example.com via 10.5.0.5 tel 555-1234",
      "1234.5.6.7", "1.2.3.4", "1.2.3.4a", "a1.2.3.4", "1.2.3.45678",
      "12.34.56.789", "12.34.56.7890", "1.2.3.4.5", "...", "5555-1234",
      "555-12345", "x555-1234", "555-1234x", "_555-1234", "555_1234",
      " 555-1234 10.0.0.1 a.b@c.de ", "a+b_c%d.e-f@g-h.i.jk",
      "me@sub.do-main.org more", "tel:555-0000.", "ip 010.001.002.003!")
    fixed.foreach { s =>
      assert(PiiScan.scrub(s) == viaRegex(s), s"on <$s>")
    }
    val frag = Gen.oneOf(
      "user@example.com", "10.1.2.3", "555-1234", "1234.5.6.7", "a@b",
      "a@b.cd", "@", ".", "-", "_", "%", "+", " ", "9", "99", "999",
      "ab", "A", "x@y.co-m", "a@1.2.3.4.com", "9999-99999", "..", "@@")
    val gen = Gen.listOf(frag).map(_.mkString)
    assertProp(Prop.forAll(gen) { s =>
      PiiScan.scrub(s) == viaRegex(s)
    }, n = 300)
  }

  test("utf8ByteOrder: lawful total order; agrees with String order on ASCII; " +
    "orders supplementary chars by UTF-8 bytes where UTF-16 disagrees") {
    import java.nio.charset.StandardCharsets.UTF_8
    val cmp = graft.operators.TextAnalysis.utf8ByteOrder
    def c(a: String, b: String): Int =
      Integer.signum(cmp.compare(a.getBytes(UTF_8), b.getBytes(UTF_8)))
    val str = Gen.listOf(Gen.frequency(
      9 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('é', 'ß', '中', ''),
      1 -> Gen.const("😀".charAt(0)) // unpaired surrogate half also must not crash
    )).map(_.mkString)
    assertProp(Prop.forAll(str, str, str) { (a, b, x) =>
      val anti = c(a, b) == -c(b, a)
      val refl = c(a, a) == 0
      val trans = !(c(a, b) <= 0 && c(b, x) <= 0) || c(a, x) <= 0
      val ascii = a.forall(_ < 128) && b.forall(_ < 128)
      val agreesAscii = !ascii || c(a, b) == Integer.signum(a.compareTo(b))
      anti && refl && trans && agreesAscii
    })
    // The divergence the fix targets: U+E000 (private use, 3-byte UTF-8)
    // vs U+1F600 (supplementary, 4-byte UTF-8). UTF-16 code units compare
    // "" > "😀" (0xE000 > 0xD83D), but UTF-8 bytes order the other
    // way — the byte order both engines sort strings by.
    assert("".compareTo("😀") > 0)
    assert(c("", "😀") < 0)
  }

  test("encodePk: injective over arbitrary same-arity tuples (incl. NUL/backslash)") {
    import graft.streaming.MaxwellStream.encodePk
    // values drawn from an alphabet that stresses the escaping: the NUL
    // separator, the backslash escape char, empties, and ordinary text
    val trickyChar = Gen.oneOf('\u0000', '\\', 'a', 'b', '0')
    val value = Gen.listOf(trickyChar).map(_.mkString)
    val pair = for {
      n <- Gen.choose(2, 4)
      t1 <- Gen.listOfN(n, value)
      t2 <- Gen.listOfN(n, value)
    } yield (t1, t2)
    assertProp(Prop.forAll(pair) { case (t1, t2) =>
      (encodePk(t1) == encodePk(t2)) == (t1 == t2)
    }, n = 500)
  }

  test("KmvState carries exactly the KmvDistinct buffer; estimator agrees bit-for-bit") {
    import graft.functions.Sketches
    val st = new Sketches.KmvState(64)
    val kd = new Sketches.KmvDistinct(64)
    val gen = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    assertProp(Prop.forAll(gen) { hashes =>
      val state = hashes.foldLeft(st.zero)(st.reduce)
      val buffer = hashes.foldLeft(kd.zero)(kd.reduce)
      // same shared-base mechanics → identical buffers; the Column-side
      // estimator formula must equal KmvDistinct.finish exactly
      val est =
        if (state.length < 64) state.length.toDouble
        else 63.0 / ((state.last.toDouble - Long.MinValue.toDouble) / 1.8446744073709552e19)
      st.finish(state) == buffer && est == kd.finish(buffer)
    })
  }

  test("emb_cluster_quality: covers the corpus; per-cell mean_intra >= mean_next") {
    import graft.operators.Similarity
    val rows = Similarity.embClusterQuality.fn(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length > 1, "needs at least two cells")
    val corpus = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == corpus,
      "every vector must land in exactly one cell")
    rows.foreach { r =>
      val intra = r.getAs[Double]("mean_intra")
      val next = r.getAs[Double]("mean_next")
      // nearest-cell assignment makes own-cos >= runner-up cos per vector,
      // so the means inherit it (ties allowed at 4-dp rounding)
      assert(intra + 1e-9 >= next,
        s"cell ${r.getAs[Int]("cell")}: intra $intra < next $next")
      assert(intra <= 1.0001 && next >= -1.0001)
    }
  }

  test("sketch_overlap_users: exact below k; theta-intersection within 20% above k") {
    import org.apache.spark.sql.functions._
    import graft.operators.ScalePatterns
    // Exact regime at the gate SF: every state holds all hashes, theta=1,
    // the estimates ARE the exact cardinalities.
    val got = ScalePatterns.sketchOverlapUsers.fn(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val (c, p) = (users("click"), users("purchase"))
    assert(got.getAs[Long]("est_click_users") == c.size)
    assert(got.getAs[Long]("est_purchase_users") == p.size)
    assert(got.getAs[Long]("est_overlap") == (c & p).size)
    // Approximate regime: synthetic 4000/3500-member sets overlapping in
    // 2500, k=64 (sigma ~ 1/sqrt(62) ~ 12.7%); bound at 20% and assert
    // determinism across two independent evaluations.
    import spark.implicits._
    val st = graft.functions.Sketches.kmvState(64)
    def stateOf(ids: Seq[Long], alias: String) =
      ids.toDF("id").select(xxhash64(col("id")).as("h")).agg(st(col("h")).as(alias))
    val aIds = (0L until 4000L)
    val bIds = (1500L until 5000L)
    def estimate() = ScalePatterns.thetaOverlapFold(
      stateOf(aIds, "ca"), stateOf(bIds, "pa"), 64).collect().head
    val e1 = estimate(); val e2 = estimate()
    assert(e1 == e2, "theta-sketch fold must be deterministic")
    val est = e1.getAs[Long]("est_overlap").toDouble
    assert(math.abs(est - 2500.0) / 2500.0 <= 0.20,
      s"overlap estimate $est out of 20% band around 2500")
  }

  test("skylinePass: two-phase (partitioned local + global) equals brute-force dominance") {
    import graft.operators.Planning.skylinePass
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(200)
      // coarse grids force equal-price runs and exact duplicates
      val rows = (0 until n).map { i =>
        (i.toLong, (rnd.nextInt(20) * 25).toDouble, rnd.nextInt(15))
      }
      def dominates(q: (Long, Double, Int), p: (Long, Double, Int)): Boolean =
        q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
      val brute = rows.filter(p => !rows.exists(q => dominates(q, p))).toSet
      val k = 1 + rnd.nextInt(8)
      val local = rows.grouped(math.max(1, (n + k - 1) / k))
        .flatMap(chunk => skylinePass(chunk.iterator)).toSeq
      val twoPhase = skylinePass(local.iterator).toSet
      assert(twoPhase == brute,
        s"trial $trial: missing=${(brute -- twoPhase).take(3)} extra=${(twoPhase -- brute).take(3)}")
    }
  }

  test("MomentMatrix merge of split halves equals the sequential fold (within fp assoc)") {
    import graft.functions.Sketches
    val dim = 4
    val mm = new Sketches.MomentMatrix(dim)
    val vecGen = Gen.listOfN(dim, Gen.choose(-10.0f, 10.0f))
    val gen = Gen.nonEmptyListOf(vecGen)
    assertProp(Prop.forAll(gen) { vecs =>
      val whole = vecs.foldLeft(mm.zero)(mm.reduce)
      val (a, b) = vecs.splitAt(vecs.length / 2)
      val merged = mm.merge(a.foldLeft(mm.zero)(mm.reduce), b.foldLeft(mm.zero)(mm.reduce))
      // double addition is order-sensitive: split-merge associates
      // differently than the sequential fold, so compare to 1e-9 relative
      whole.zip(merged).forall { case (x, y) =>
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
      } && whole(0) == vecs.length.toDouble
    })
  }

  test("bpeMergeOnce: no pair left behind, content preserved, no-op without the pair") {
    import graft.operators.TextAnalysis.bpeMergeOnce
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc")
    val word = Gen.listOf(sym).map(_.toArray)
    val pair = for { l <- sym; r <- sym } yield (l, r)
    assertProp(Prop.forAll(word, pair) { case (syms, (l, r)) =>
      val out = bpeMergeOnce(syms, l, r)
      // concatenated content is invariant under any merge
      val contentKept = out.mkString == syms.mkString
      // greedy left-to-right non-overlap: no adjacent (l, r) SURVIVES
      // unless its left symbol was itself produced by this merge (the
      // overlap case "l l r" → "l (lr)" keeps content but eats the pair)
      val noPairLeft = !out.iterator.zip(out.iterator.drop(1))
        .exists { case (x, y) => x == l && y == r && x != l + r && y != l + r }
      // absent pair => identity
      val hadPair = syms.iterator.zip(syms.iterator.drop(1)).exists { case (x, y) => x == l && y == r }
      val noopOk = hadPair || (out.toSeq == syms.toSeq)
      contentKept && noPairLeft && noopOk
    })
  }

  test("Morton spread: zbucket is the interleaved top-3 bits for every grid cell") {
    import spark.implicits._
    val cells = Gen.choose(0, 255)
    assertProp(Prop.forAll(cells, cells) { (xb, yb) =>
      // drive the shared codegen arithmetic through a 1-row frame with a
      // degenerate grid that maps user_id -> xb, us -> yb directly
      val row = Seq((xb.toLong, yb.toLong)).toDF("user_id", "us")
      val got = graft.operators.ScalePatterns
        .withZBucket(row, 0L, 255L, 0L, 255L)
        .select("xb", "yb", "zbucket").head
      def spread3(v: Int) = { val t = v / 32; (t & 1) | ((t & 2) << 1) | ((t & 4) << 2) }
      got.getInt(0) == xb && got.getInt(1) == yb &&
        got.getInt(2) == (spread3(xb) | (spread3(yb) << 1))
    }, n = 30)
  }
}
