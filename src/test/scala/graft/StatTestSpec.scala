package graft

import org.apache.spark.sql.functions._
import graft.queries.{EventQueries, StatTestQueries}

/** The hypothesis-testing wave: Mann-Whitney detects a planted
  * location shift (and agrees with a hand-computed U on a tie-heavy
  * case), ANOVA is shift-invariant and detects separated groups, χ²
  * is exactly zero on an exactly-independent table, SPRT crosses the
  * Wald bound at the first index the hand simulation crosses it, BH
  * rejections form a rank prefix with a non-razor-thin threshold
  * margin, and the stratified split hits its per-stratum quotas
  * exactly and deterministically.
  */
class StatTestSpec extends SparkSpec {

  private def evFrame(rows: Seq[(String, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "event_id", "ts_ms", "value")
  }

  private def mwOf(rows: Seq[(String, Long, Long, Double)]) = {
    val e = evFrame(rows)
    StatTestQueries.mwFinish(EventQueries.ksGrid(
      EventQueries.psiHalved(e, EventQueries.psiSplit(e))))
  }

  test("Mann-Whitney: planted second-half shift detected, identical halves not") {
    val rows = (0 until 1000).flatMap { i =>
      val ts = 1000000L + i * 1000L
      val base = (i * 7 % 100).toDouble
      Seq(
        ("shift", i.toLong, ts, if (i < 500) base else base + 30.0),
        ("same", 10000L + i, ts, base))
    }
    val out = mwOf(rows).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("shift").getAs[Boolean]("is_sig"),
      s"planted +30 shift not significant: z=${out("shift").getAs[Double]("z_r")}")
    assert(!out("same").getAs[Boolean]("is_sig"),
      s"identical halves flagged: z=${out("same").getAs[Double]("z_r")}")
    // identical halves: U must sit exactly at its mean n1*n2/2 → u2 = n1*n2
    val s = out("same")
    assert(s.getAs[Long]("u2") === s.getAs[Long]("n_ref") * s.getAs[Long]("n_cur"))
  }

  test("Mann-Whitney: hand-computed U on a tie-heavy case") {
    // ref half (ts<=1500): values 1,2,2 ; cur half: values 2,3
    // ranks: 1→1; the three 2s → midrank 3; 3→5
    // R_ref = 1 + 3 + 3 = 7 → U_ref = 7 − 3·4/2 = 1 → u2 = 2
    val rows = Seq(
      ("t", 1L, 1000L, 1.0), ("t", 2L, 1100L, 2.0), ("t", 3L, 1200L, 2.0),
      ("t", 4L, 1900L, 2.0), ("t", 5L, 2000L, 3.0))
    val r = mwOf(rows).collect().head
    assert(r.getAs[Long]("n_ref") === 3L)
    assert(r.getAs[Long]("n_cur") === 2L)
    assert(r.getAs[Long]("u2") === 2L)
  }

  test("ANOVA: shift invariance and separated-group detection") {
    import spark.implicits._
    def anova(shift: Double, sep: Double) =
      StatTestQueries.anovaOf(
        (0 until 300).map { i =>
          val g = i % 3
          (s"g$g", BigDecimal(((i * 13) % 50) + shift + g * sep)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP))
        }.toDF("event_type", "v")
          .select(col("event_type"), col("v").cast("decimal(18,4)").as("v")))
        .collect().head
    val base = anova(0.0, 0.0)
    val shifted = anova(1000.0, 0.0)
    // adding a constant to every value moves neither SSB nor SSW
    assert(math.abs(base.getAs[Double]("f_r") - shifted.getAs[Double]("f_r")) < 1e-3,
      s"shift moved F: ${base.getAs[Double]("f_r")} vs ${shifted.getAs[Double]("f_r")}")
    val sep = anova(0.0, 100.0)
    assert(sep.getAs[Double]("f_r") > 100.0 * base.getAs[Double]("f_r") + 100.0,
      s"100-unit group separation not detected: F=${sep.getAs[Double]("f_r")}")
    assert(base.getAs[Long]("k") === 3L && base.getAs[Long]("n_total") === 300L)
  }

  test("chi-square: exactly-independent table scores 0, dependence scores big") {
    import spark.implicits._
    // independent: o(type, bucket) = rowShare * colShare * N exactly
    val indep = (for (t <- 0 until 3; b <- 0 until 4) yield
      (s"t$t", b.toLong, (10L * (t + 1)) * (b + 1))) // o = 10(t+1)(b+1): rank-1 ⇒ independent
      .flatMap { case (t, b, o) => Seq.fill(o.toInt)((t, b)) }
    val cells = indep.toDF("event_type", "bucket")
      .groupBy(col("event_type"), col("bucket")).agg(count(lit(1)).as("o"))
    val r0 = StatTestQueries.chisqFinish(cells).collect().head
    assert(r0.getAs[Double]("chi2_r") === 0.0,
      s"rank-1 table must score exactly 0: ${r0.getAs[Double]("chi2_r")}")
    // the finish densifies to the frozen 0..4 bucket design, so dof is
    // (3−1)·(5−1) even though only buckets 0..3 are observed — the
    // structural-zero bucket 4 has e = 0 and contributes nothing
    assert(r0.getAs[Long]("dof") === 8L)
    // dependence: diagonal-heavy table
    val dep = (for (t <- 0 until 3; b <- 0 until 3) yield
      (s"t$t", b.toLong, if (t == b) 100 else 5))
      .flatMap { case (t, b, o) => Seq.fill(o)((t, b)) }
    val r1 = StatTestQueries.chisqFinish(
      dep.toDF("event_type", "bucket")
        .groupBy(col("event_type"), col("bucket")).agg(count(lit(1)).as("o")))
      .collect().head
    assert(r1.getAs[Double]("chi2_r") > 100.0)
  }

  test("SPRT: crossing index and decision match a hand simulation") {
    // 30 successes then 30 failures: cum = 182322·k rises, crosses
    // +2944439 at k = ceil(2944439/182322) = 17 → decision h1 at n=17
    val rows = (0 until 60).map { i =>
      ("t", i.toLong, 1000L + i, if (i < 30) 60.0 else 40.0)
    }
    val r = StatTestQueries.sprtFinish(
      StatTestQueries.sprtTrajectory(evFrame(rows))).collect().head
    assert(r.getAs[Long]("cross_n") === 17L)
    assert(r.getAs[String]("decision") === "h1")
    assert(r.getAs[Long]("llr_total_micro") === 30L * 182322L - 30L * 223144L)
    // all-failures series never crosses upward and decides h0 at
    // ceil(2944439/223144) = 14
    val lo = StatTestQueries.sprtFinish(StatTestQueries.sprtTrajectory(
      evFrame((0 until 20).map(i => ("u", i.toLong, 1000L + i, 10.0)))))
      .collect().head
    assert(lo.getAs[Long]("cross_n") === 14L)
    assert(lo.getAs[String]("decision") === "h0")
  }

  test("BH-FDR on the fixture: rejections are a rank prefix with margin") {
    val rows = StatTestQueries.queries("events_bh_fdr")(spark, sf).collect()
    assert(rows.nonEmpty)
    val m = rows.length
    val byRank = rows.sortBy(_.getAs[Long]("bh_rank"))
    // p non-decreasing in rank; rejected set is a prefix
    val ps = byRank.map(_.getAs[Double]("p_r"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    val rej = byRank.map(_.getAs[Boolean]("rejected"))
    assert(!rej.dropWhile(identity).contains(true), "rejections not a prefix")
    // threshold margin audit: no p sits razor-thin on its BH cut
    byRank.foreach { r =>
      val margin = math.abs(
        r.getAs[Double]("p_r") - r.getAs[Long]("bh_rank") * 0.10 / m)
      assert(margin > 1e-6, s"BH threshold margin $margin too thin")
    }
  }

  test("Kaplan-Meier: hand case, censoring semantics, monotonicity, ln margin") {
    import spark.implicits._
    // 4 users die at hours 1,2,3,4; 1 user censored (active in the
    // final 24h). S(1)=4/5, S(2)=3/5, S(3)=2/5, S(4)=1/5 — the
    // censored user stays at risk throughout (dur 100 > all deaths).
    val H = 3600000L
    val spans = Seq(
      ("t", 1L, 0L, 1 * H), ("t", 2L, 0L, 2 * H),
      ("t", 3L, 0L, 3 * H), ("t", 4L, 0L, 4 * H),
      ("t", 5L, 0L, 100 * H)) // censored: last_ts > max−24h
      .toDF("event_type", "user_id", "first_ts", "last_ts")
    val km = StatTestQueries.survivalFinish(
      StatTestQueries.survivalGrid(spans))
      .collect().sortBy(_.getAs[Long]("dur_h"))
    val surv = km.map(r => r.getAs[Long]("dur_h") -> r.getAs[Double]("surv_r")).toMap
    Seq(1L -> 0.8, 2L -> 0.6, 3L -> 0.4, 4L -> 0.2).foreach { case (d, s) =>
      assert(math.abs(surv(d) - s) < 1e-5, s"S($d) = ${surv(d)}, want $s")
    }
    // censored row: no survival drop, zero deaths
    val cRow = km.find(_.getAs[Long]("dur_h") == 100L).get
    assert(cRow.getAs[Long]("deaths") === 0L && cRow.getAs[Long]("censors") === 1L)
    assert(math.abs(cRow.getAs[Double]("surv_r") - 0.2) < 1e-5)

    // fixture: survival non-increasing per type; at-risk ladder decreasing
    val fix = StatTestQueries.queries("events_survival")(spark, sf).collect()
      .groupBy(_.getAs[String]("event_type"))
    fix.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("dur_h"))
      val ss = sorted.map(_.getAs[Double]("surv_r"))
      assert(ss.zip(ss.tail).forall { case (a, b) => b <= a + 1e-9 })
      val nr = sorted.map(_.getAs[Long]("n_risk"))
      assert(nr.zip(nr.tail).forall { case (a, b) => b < a })
    }
    // ln-quantization margin audit: no per-step ln sits within 1e-13
    // of a 9-dp rounding boundary (libm-vs-JDK ulp is orders below)
    fix.values.flatten.foreach { r =>
      val (nRisk, deaths) = (r.getAs[Long]("n_risk"), r.getAs[Long]("deaths"))
      if (deaths > 0 && nRisk > deaths) {
        val lf = math.log((nRisk - deaths).toDouble / nRisk.toDouble)
        val frac = math.abs(lf * 1e9 - math.rint(lf * 1e9))
        assert(math.abs(frac - 0.5) > 1e-4,
          s"ln margin razor-thin at n=$nRisk d=$deaths: frac=$frac")
      }
    }
  }

  test("invariances: U under monotone transforms, F under affine maps") {
    // Mann-Whitney is a RANK test: any strictly monotone value
    // transform leaves every (n_ref, n_cur, u2) untouched
    val rows = (0 until 400).map { i =>
      ("t", i.toLong, 1000000L + i * 1000L, ((i * 13) % 97).toDouble)
    }
    val base = mwOf(rows).collect().head
    val cubed = mwOf(rows.map { case (t, id, ts, v) => (t, id, ts, v * v * v + 5.0) })
      .collect().head
    assert(base.getAs[Long]("u2") === cubed.getAs[Long]("u2"))
    assert(base.getAs[Long]("n_ref") === cubed.getAs[Long]("n_ref"))

    // ANOVA's F is invariant under y → a·y + b (both sums of squares
    // scale by a²); the 4-dp value grid bounds the comparison at 1e-3
    import spark.implicits._
    def anovaF(f: Double => Double) =
      StatTestQueries.anovaOf(
        (0 until 300).map { i =>
          (s"g${i % 3}", BigDecimal(f(((i * 13) % 50).toDouble + (i % 3) * 8.0))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP))
        }.toDF("event_type", "v")
          .select(col("event_type"), col("v").cast("decimal(18,4)").as("v")))
        .collect().head.getAs[Double]("f_r")
    val f0 = anovaF(identity)
    val f1 = anovaF(v => 3.0 * v - 40.0)
    assert(math.abs(f0 - f1) < 1e-3, s"affine map moved F: $f0 vs $f1")
  }

  test("degenerate inputs: ANOVA without df and all-deaths survival stay defined") {
    import spark.implicits._
    def dfOf(rows: Seq[(String, Double)]) =
      rows.toDF("event_type", "raw")
        .select(col("event_type"), col("raw").cast("decimal(18,4)").as("v"))
    // one group: no between-group df → F is NULL, not a 0-division
    val oneGroup = StatTestQueries.anovaOf(
      dfOf((0 until 10).map(i => ("only", i.toDouble)))).collect().head
    assert(oneGroup.isNullAt(oneGroup.fieldIndex("f_r")))
    // all values identical: SSW = 0 → F is NULL
    val allEq = StatTestQueries.anovaOf(
      dfOf((0 until 10).map(i => (s"g${i % 2}", 7.0)))).collect().head
    assert(allEq.isNullAt(allEq.fieldIndex("f_r")))

    // every user dies (no censoring): the terminal KM row would be
    // ln(0) — must come out as surv 0.0 / s_log NULL instead
    val H = 3600000L
    val spans = Seq(
      ("t", 1L, 0L, 1 * H), ("t", 2L, 0L, 2 * H), ("t", 3L, 0L, 2 * H))
      .toDF("event_type", "user_id", "first_ts", "last_ts")
      // push the cutoff below every last_ts by adding a second type
      // whose user survives far past everyone (so t_cut > all of t's)
      .union(Seq(("u", 9L, 0L, 1000 * H))
        .toDF("event_type", "user_id", "first_ts", "last_ts"))
    val km = StatTestQueries.survivalFinish(
      StatTestQueries.survivalGrid(spans)).collect()
      .filter(_.getAs[String]("event_type") == "t")
      .sortBy(_.getAs[Long]("dur_h"))
    assert(km.map(_.getAs[Long]("dur_h")).toSeq === Seq(1L, 2L))
    assert(math.abs(km.head.getAs[Double]("surv_r") - 2.0 / 3.0) < 1e-5)
    val terminal = km.last
    assert(terminal.getAs[Double]("surv_r") === 0.0)
    assert(terminal.isNullAt(terminal.fieldIndex("s_log")))
  }

  test("attribution: window cutoff, tie resolution, organic fallback") {
    import spark.implicits._
    val D = 86400000L
    val rows = Seq(
      // u1: click d1, view d3, purchase d5 → last=view, first=click
      (1L, 10L, 1 * D, null.asInstanceOf[java.lang.Double], "click"),
      (1L, 11L, 3 * D, null.asInstanceOf[java.lang.Double], "view"),
      (1L, 12L, 5 * D, java.lang.Double.valueOf(100.0), "purchase"),
      // u2: click 8 days before purchase → OUTSIDE the 7d window → organic
      (2L, 20L, 1 * D, null.asInstanceOf[java.lang.Double], "click"),
      (2L, 21L, 9 * D + 1, java.lang.Double.valueOf(50.0), "purchase"),
      // u3: two touches at the SAME ms as the purchase → larger
      // event_id wins last-touch deterministically
      (3L, 30L, 2 * D, null.asInstanceOf[java.lang.Double], "click"),
      (3L, 31L, 2 * D, null.asInstanceOf[java.lang.Double], "view"),
      (3L, 32L, 2 * D, java.lang.Double.valueOf(25.0), "purchase"))
      .toDF("user_id", "event_id", "ts_ms", "value", "event_type")
    val out = graft.queries.EventQueries.attributionOf(rows).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
    assert(out("view").getAs[Long]("lt_n") === 2L)   // u1 (view last) + u3 (id 31 wins)
    assert(out("view").getAs[Double]("lt_rev_r") === 125.0)
    assert(out("click").getAs[Long]("ft_n") === 2L)  // u1 + u3 first-touch
    assert(out("organic").getAs[Long]("lt_n") === 1L) // u2 outside window
    assert(out("organic").getAs[Double]("lt_rev_r") === 50.0)
    // every purchase attributed exactly once under each model
    assert(out.values.map(_.getAs[Long]("lt_n")).sum === 3L)
    assert(out.values.map(_.getAs[Long]("ft_n")).sum === 3L)
  }

  test("cohort LTV: cumulative curve is non-decreasing and starts at day-0 revenue") {
    val rows = graft.queries.EventQueries.queries("events_cohort_ltv")(spark, sf)
      .collect().groupBy(_.getAs[Long]("cohort_day_ms"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, cohort) =>
      val sorted = cohort.sortBy(_.getAs[Long]("age_days"))
      assert(sorted.head.getAs[Long]("age_days") === 0L)
      assert(sorted.head.getAs[Double]("ltv_r") === sorted.head.getAs[Double]("rev_r"))
      val ltvs = sorted.map(_.getAs[Double]("ltv_r"))
      assert(ltvs.zip(ltvs.tail).forall { case (a, b) => b >= a - 1e-9 },
        "LTV curve decreased")
      // per-user LTV is total LTV / cohort size
      sorted.foreach { r =>
        val expect = r.getAs[Double]("ltv_r") / r.getAs[Long]("cohort_users")
        assert(math.abs(r.getAs[Double]("ltv_per_user_r") - expect) < 1e-4)
      }
    }
  }

  test("stratified split: exact per-stratum quotas, deterministic") {
    val out = StatTestQueries.queries("pipeline_stratified_split")(spark, sf)
      .collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, docs) =>
      val n = docs.length
      val c = docs.groupBy(_.getAs[String]("split")).view.mapValues(_.length)
      assert(c.getOrElse("train", 0) === n * 8 / 10,
        s"$lang train quota: ${c.getOrElse("train", 0)} of $n")
      assert(c.getOrElse("val", 0) === n * 9 / 10 - n * 8 / 10)
      assert(c.getOrElse("test", 0) === n - n * 9 / 10)
    }
    // every doc exactly once, and a re-run assigns identically
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === out.length)
    val again = StatTestQueries.queries("pipeline_stratified_split")(spark, sf)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
      === again.map(r => (r.getLong(0), r.getString(2))).sortBy(_._1))
  }
}
