package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-4 analyst-depth additions: CUSUM changepoint,
  * interval-union coverage, Kaplan-Meier survival, degree-oriented triangle
  * counting, Spearman rank correlation, the filter funnel. Each distributed
  * reformulation is checked against an independent SEQUENTIAL reference in
  * plain Scala on sf0.001 — the DuckDB oracle is the cross-engine gate;
  * these pin the cross-FORMULATION equivalence the oracle can't see (the
  * oracle runs the same algebra, the reference runs the textbook one).
  */
class AnalystDepthSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (user, ordered values) with the (ts, event_id) sort the keys use. */
  private lazy val seriesByUser: Map[Long, Seq[Double]] =
    Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq
      }

  test("event_cusum equals the textbook max(0, s + (v - mu)) recursion") {
    val got = SparkEntry.queries("event_cusum")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    var checked = 0
    for ((u, vs) <- seriesByUser if vs.length > 1) {
      val n = vs.length
      val mu = vs.sum / n
      val sd = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / (n - 1))
      var s = 0.0
      var maxS = 0.0
      var alarms = 0L
      for (v <- vs) {
        s = math.max(0.0, s + (v - mu))
        maxS = math.max(maxS, s)
        if (r6(s) > r6(3.0 * sd)) alarms += 1
      }
      val (gn, gmax, galarms) = got(u)
      assert(gn == n, s"user $u n_events")
      assert(math.abs(gmax - r6(maxS)) <= 2e-6, s"user $u max_cusum")
      assert(galarms == alarms, s"user $u n_alarms")
      checked += 1
    }
    assert(checked > 0 && checked == got.size)
  }

  test("event_interval_union equals sequential interval merging") {
    val got = SparkEntry.queries("event_interval_union")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val iv = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        (unix_micros(col("ts")) + floor(col("value")).cast("long") * 1000000L)
          .as("te"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    for ((u, rows) <- iv) {
      val sorted = rows.sortBy(r => (r._2, r._4, r._3)).map(r => (r._2, r._4))
      var islands = 0L
      var covered = 0L
      var curS = Long.MinValue
      var curE = Long.MinValue
      for ((s0, e0) <- sorted) {
        if (islands == 0L || s0 > curE) {
          if (islands > 0L) covered += curE - curS
          islands += 1; curS = s0; curE = math.max(s0, e0)
        } else curE = math.max(curE, e0)
      }
      covered += curE - curS
      assert(got(u) == ((islands, covered)), s"user $u interval union")
    }
    assert(iv.nonEmpty && got.size == iv.size)
  }

  test("event_kaplan_meier equals the sequential product-limit estimator") {
    val rows = SparkEntry.queries("event_kaplan_meier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1)
    // independent lifetime/censor table (same date math, textbook KM after)
    val maxDay = Tables.events(spark, sf)
      .agg(max(to_date(col("ts")))).head.getDate(0)
    val life = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
          .cast("long").as("lt"),
        (datediff(lit(maxDay), max(to_date(col("ts")))) >= 7).as("obs"))
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    val byLt = life.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = life.length.toLong
    var surv = 1.0
    val want = byLt.map { case (lt, rs) =>
      val d = rs.count(_._2).toLong
      val c = rs.size - d
      val row = if (d >= atRisk && d > 0) { surv = 0.0; (lt, atRisk, d, c, 0.0) }
      else {
        if (d > 0) surv *= 1.0 - d.toDouble / atRisk
        (lt, atRisk, d, c, r6(surv))
      }
      atRisk -= rs.size
      row
    }
    assert(rows.length == want.length)
    rows.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"KM counts at lifetime ${w._1}")
      assert(math.abs(g._5 - w._5) <= 2e-6, s"KM survival at lifetime ${w._1}")
    }
    // survival is a valid non-increasing curve in [0, 1]
    rows.map(_._5).foldLeft(1.0) { (prev, s) =>
      assert(s >= 0.0 && s <= prev + 1e-9); s
    }
  }

  test("graph_triangles equals brute-force triangle enumeration") {
    val got = SparkEntry.queries("graph_triangles")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tr = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        pmod(col("event_id"), lit(97L)).as("repo"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val edges = tr.values.flatMap { rows =>
      val rs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      rs.zip(rs.tail).filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val adj = edges ++ edges.map(e => (e._2, e._1))
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if adj.contains((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.length
      if adj.contains((nodes(i), nodes(k))) && adj.contains((nodes(j), nodes(k)))
    } Seq(nodes(i), nodes(j), nodes(k)).foreach { n =>
      counts(n) = counts.getOrElse(n, 0L) + 1L
    }
    assert(got == counts.toMap, "per-node triangle counts")
    assert(counts.values.sum % 3 == 0)
  }

  test("stat_spearman equals the sequential average-rank computation") {
    val row = SparkEntry.queries("stat_spearman")(spark, sf).head()
    val u = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).cast("double").as("f"), sum("value").as("m"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    def avgRanks(xs: Seq[Double]): Seq[Double] = {
      val sorted = xs.sorted
      xs.map { x =>
        val lo = sorted.indexWhere(_ == x) + 1
        val hi = sorted.lastIndexWhere(_ == x) + 1
        (lo + hi) / 2.0
      }
    }
    val rx = avgRanks(u.map(_._1).toSeq)
    val ry = avgRanks(u.map(_._2).toSeq)
    val n = rx.length.toDouble
    val (sx, sy) = (rx.sum, ry.sum)
    val sxy = rx.zip(ry).map(p => p._1 * p._2).sum
    val (qx, qy) = (rx.map(x => x * x).sum, ry.map(y => y * y).sum)
    val rho = (n * sxy - sx * sy) /
      math.sqrt((n * qx - sx * sx) * (n * qy - sy * sy))
    assert(row.getLong(0) == rx.length)
    assert(math.abs(row.getDouble(1) - r6(rho)) <= 2e-6)
    assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
  }

  test("pipeline_filter_funnel: kept and reason are consistent with flags") {
    val rows = SparkEntry.queries("pipeline_filter_funnel")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (len, ttr, stop, dup) =
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))
      val reason = r.getString(5)
      val kept = r.getBoolean(6)
      assert(kept == (len && ttr && stop && dup))
      val wantReason =
        if (!len) "len" else if (!ttr) "ttr"
        else if (!stop) "stop" else if (!dup) "dup" else "ok"
      assert(reason == wantReason)
      assert(kept == (reason == "ok"))
    }
  }

  test("sim_binary_hamming: hamming distances match sign-bit recomputation") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    def sig(v: Seq[Double]): Seq[Boolean] = v.map(_ > 0)
    val rows = SparkEntry.queries("sim_binary_hamming")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, v, ham) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val want = sig(vecs(q)).zip(sig(vecs(v))).count(p => p._1 != p._2)
      assert(ham == want, s"hamming($q, $v)")
    }
  }

  /** (user, distinct active days as epoch-day longs), shared by the
    * streak and LTV references.
    */
  private lazy val daysByUser: Map[Long, Seq[Long]] =
    Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("d"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
      .groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(_._2).sorted.toSeq }

  test("event_streaks equals sequential run-length scanning") {
    val got = SparkEntry.queries("event_streaks")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    var checked = 0
    for ((u, ds) <- daysByUser) {
      var runs = List.empty[Long]
      var run = 0L
      var prev = Long.MinValue
      for (d <- ds) {
        if (prev != Long.MinValue && d == prev + 1) run += 1
        else { if (run > 0) runs ::= run; run = 1 }
        prev = d
      }
      runs ::= run
      val (gn, gmax) = got(u)
      assert(gn == runs.length, s"user $u n_streaks")
      assert(gmax == runs.max, s"user $u max_streak")
      checked += 1
    }
    assert(checked > 0 && checked == got.size)
  }

  test("event_cohort_ltv equals a sequential cohort-ledger walk") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(date_trunc("week", col("ts")).cast("date"),
          to_date(lit("1970-01-01"))).as("wk"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2),
        BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val cohort = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val sizes = cohort.groupBy(_._2).map { case (c, us) => c -> us.size }
    val rev = rows.filter(_._3 == "purchase")
      .groupBy(r => (cohort(r._1), r._2))
      .map { case (k, rs) => k -> rs.map(_._4).sum }
    val want = rev.groupBy(_._1._1).flatMap { case (c, cells) =>
      var cum = BigDecimal(0)
      cells.toSeq.sortBy(_._1._2).map { case ((_, wk), v) =>
        cum += v
        (c, (wk - c) / 7) ->
          r6((cum / sizes(c)).toDouble)
      }
    }
    val got = SparkEntry.queries("event_cohort_ltv")(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty && got.size == want.size)
    for (((c, age), v) <- want) {
      val (gn, gv) = got((c, age))
      assert(gn == sizes(c), s"cohort $c n_users")
      assert(math.abs(gv - v) <= 2e-6, s"cohort $c age $age cum_rev_per_user")
    }
  }

  test("event_anomaly_seasonal: z-scores match per-weekday recomputation") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2).toDouble))
    val prof = daily.groupBy(r => (r._1, r._2.getDayOfWeek.getValue))
      .collect { case (k, cells) if cells.length > 1 =>
        val ns = cells.map(_._3)
        val mu = ns.sum / ns.length
        val sd = math.sqrt(ns.map(v => (v - mu) * (v - mu)).sum / (ns.length - 1))
        k -> ((mu, sd))
      }
      .filter(_._2._2 > 0)
    val got = SparkEntry.queries("event_anomaly_seasonal")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    var checked = 0
    for ((typ, day, n) <- daily; (mu, sd) <- prof.get((typ, day.getDayOfWeek.getValue))) {
      val (gn, gmu, gz, gflag) = got((typ, day))
      assert(gn == n.toLong, s"($typ, $day) n")
      assert(math.abs(gmu - r6(mu)) <= 2e-6, s"($typ, $day) expected")
      val z = r6((n - mu) / sd)
      assert(math.abs(gz - z) <= 2e-6, s"($typ, $day) z")
      assert(gflag == (math.abs(gz) > 2.0), s"($typ, $day) flag")
      checked += 1
    }
    assert(checked > 0 && checked == got.size)
  }

  /** (vec_id, doubles) for the sequential retrieval references. */
  private lazy val vecById: Map[Long, Seq[Double]] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .toMap

  test("sim_rrf_fusion equals sequential truncated-list rank fusion") {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      r6(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    def ham(a: Seq[Double], b: Seq[Double]): Long =
      a.zip(b).count(p => (p._1 > 0) != (p._2 > 0)).toLong
    val want = (0L until 5L).flatMap { qid =>
      val qv = vecById(qid)
      val cands = vecById.keys.filter(_ != qid).toSeq
      val rc = cands.sortBy(v => (-cos(vecById(v), qv), v)).zipWithIndex
        .map { case (v, i) => v -> (i + 1) }.toMap
      val rh = cands.sortBy(v => (ham(vecById(v), qv), v)).zipWithIndex
        .map { case (v, i) => v -> (i + 1) }.toMap
      cands.map { v =>
        val s = (if (rc(v) <= 20) 1.0 / (60 + rc(v)) else 0.0) +
          (if (rh(v) <= 20) 1.0 / (60 + rh(v)) else 0.0)
        (v, r6(s))
      }.filter(_._2 > 0)
        .sortBy { case (v, s) => (-s, v) }.take(10).zipWithIndex
        .map { case ((v, s), i) => (qid, i + 1L) -> ((v, s)) }
    }.toMap
    val got = SparkEntry.queries("sim_rrf_fusion")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.nonEmpty && got.size == want.size)
    for (((qid, rk), (v, s)) <- want) {
      val (gv, gs) = got((qid, rk))
      assert(gv == v, s"query $qid rank $rk vec")
      assert(math.abs(gs - s) <= 2e-6, s"query $qid rank $rk rrf")
    }
  }

  test("text_bm25 equals the sequential Robertson/Lucene formula") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val terms = Seq("spark", "join", "window")
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val want = docs.flatMap { case (id, tk) =>
      val cs = terms.flatMap { t =>
        val tf = tk.count(_ == t).toDouble
        if (tf == 0) None
        else Some(r6(math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * tk.length / avgdl))))
      }
      if (cs.isEmpty) None else Some((id, r6(cs.sum), cs.length.toLong))
    }.sortBy { case (id, s, _) => (-s, id) }.take(20)
    val got = SparkEntry.queries("text_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case ((gi, gs, gn), (wi, ws, wn)) =>
      assert(gi == wi && gn == wn, s"doc $wi")
      assert(math.abs(gs - ws) <= 2e-6, s"doc $wi bm25")
    }
  }

  test("ml_naive_bayes predictions equal the sequential NB argmax") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    val classes = docs.map(_._2).distinct.sorted
    val vocab = docs.flatMap(_._3).distinct
    val v = vocab.length.toDouble
    val tokC = classes.map(c => c -> docs.filter(_._2 == c).map(_._3.length).sum.toDouble).toMap
    val cnt = docs.groupBy(_._2).map { case (c, ds) =>
      c -> ds.flatMap(_._3).groupBy(identity).map { case (t, xs) => t -> xs.length }
    }
    val lp = (for (c <- classes; t <- vocab) yield (c, t) ->
      r6(math.log((cnt(c).getOrElse(t, 0) + 1.0) / (tokC(c) + v)))).toMap
    val lprior = classes.map(c =>
      c -> r6(math.log(docs.count(_._2 == c) / docs.length.toDouble))).toMap
    val got = SparkEntry.queries("ml_naive_bayes")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, src, tk) =>
      val scored = classes.map { c =>
        c -> r6(lprior(c) + tk.groupBy(identity).map {
          case (t, xs) => xs.length * lp((c, t))
        }.sum)
      }
      val (bestC, bestS) = scored.minBy { case (c, s) => (-s, c) }
      val (ga, gp, gs, gc) = got(id)
      assert(ga == src, s"doc $id actual")
      assert(gp == bestC, s"doc $id predicted")
      assert(math.abs(gs - bestS) <= 2e-6, s"doc $id score")
      assert(gc == (gp == ga), s"doc $id correct")
    }
  }

  test("stat_fdr_bh equals the textbook step-up on A&S p-values") {
    def pFromZ(z: Double): Double = {
      val x = math.abs(z) / math.sqrt(2.0)
      val t = 1.0 / (1.0 + 0.3275911 * x)
      val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
        - 0.284496736) * t + 0.254829592) * t
      r6(poly * math.exp(-x * x))
    }
    val rows = SparkEntry.queries("stat_fdr_bh")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    val m = rows.length
    rows.foreach { case (_, _, z, p, _, gm, _) =>
      assert(gm == m)
      assert(math.abs(p - pFromZ(z)) <= 2e-6)
    }
    // textbook BH: sort by p, k* = max{k : p_(k) <= k/m * alpha}
    val sorted = rows.sortBy(r => (r._4, r._1, r._2))
    val kStar = sorted.zipWithIndex
      .filter { case (r, i) => r._4 <= (i + 1) * 0.05 / m }
      .map(_._2 + 1).lastOption.getOrElse(0)
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r._5 == i + 1, s"rank of ${r._1} ${r._2}")
      assert(r._7 == (i + 1 <= kStar), s"significance of ${r._1} ${r._2}")
    }
  }

  test("window_bollinger equals the sequential 20-row rolling bands") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val got = SparkEntry.queries("window_bollinger")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getBoolean(6), r.getBoolean(7)))).toMap
    var checked = 0
    for ((u, rows) <- events.groupBy(_._1)) {
      val ordered = rows.sortBy(r => (r._2, r._3))
      for (i <- 19 until ordered.length) {
        val frame = ordered.slice(i - 19, i + 1).map(_._4)
        val s = frame.sum
        val q = frame.map(v => v * v).sum
        val mean = s / 20
        val sd = math.sqrt((q - s * s / 20) / 19)
        val (gm, gu, gl, bu, bd) = got((u, ordered(i)._3))
        assert(math.abs(gm - r6(mean)) <= 2e-6, s"user $u mid")
        assert(math.abs(gu - r6(mean + 2 * sd)) <= 2e-6, s"user $u upper")
        assert(math.abs(gl - r6(mean - 2 * sd)) <= 2e-6, s"user $u lower")
        assert(bu == (ordered(i)._4 > gu) && bd == (ordered(i)._4 < gl))
        checked += 1
      }
    }
    assert(checked > 0 && checked == got.size)
  }

  test("event_inter_arrival equals sequential gap percentiles") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def pct(xs: Seq[Long], f: Double): Double = {
      val pos = f * (xs.length - 1)
      val lo = pos.toInt
      if (lo == xs.length - 1) xs(lo).toDouble
      else xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
    }
    val gaps = events.groupBy(r => (r._1, r._2)).toSeq.flatMap { case (_, rs) =>
      val ts = rs.sortBy(r => (r._3, r._4)).map(_._3)
      ts.zip(ts.tail).map { case (a, b) => (rs.head._2, b - a) }
    }.groupBy(_._1).map { case (typ, g) => typ -> g.map(_._2).sorted }
    val got = SparkEntry.queries("event_inter_arrival")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.size == gaps.size && got.nonEmpty)
    for ((typ, g) <- gaps) {
      val (n, mean, p50, p90, p99) = got(typ)
      assert(n == g.length, s"$typ n_gaps")
      assert(math.abs(mean - r6(g.map(BigDecimal(_)).sum.toDouble / g.length / 1e6)) <= 2e-6,
        s"$typ mean")
      assert(math.abs(p50 - r6(pct(g, 0.5) / 1e6)) <= 2e-6, s"$typ p50")
      assert(math.abs(p90 - r6(pct(g, 0.9) / 1e6)) <= 2e-6, s"$typ p90")
      assert(math.abs(p99 - r6(pct(g, 0.99) / 1e6)) <= 2e-6, s"$typ p99")
    }
  }

  /** (event_type, ordered daily counts) shared by the time-series specs. */
  private lazy val dailyByType: Map[String, Seq[(Long, Long)]] =
    Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        datediff(col("day"), to_date(lit("1970-01-01"))).as("di"), col("n"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.sortBy(_._2).map(r => (r._2, r._3)).toSeq }

  test("agg_sum_map JSON reconstructs the per-day type counts") {
    val want = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (d, rows) =>
        d -> rows.sortBy(_._2).map(r => s""""${r._2}":${r._3}""")
          .mkString("{", ",", "}")
      }
    val got = SparkEntry.queries("agg_sum_map")(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got.size == want.size && got.nonEmpty)
    for ((d, json) <- want) {
      val (gj, gn) = got(d)
      assert(gj == json, s"day $d map")
      val vals = "\\d+".r.findAllIn(gj.replaceAll(""""[^"]*"""", ""))
        .map(_.toLong).toSeq
      assert(vals.sum == gn, s"day $d total")
    }
  }

  test("event_autocorrelation equals the sequential ACF") {
    val got = SparkEntry.queries("event_autocorrelation")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    var checked = 0
    for ((typ, series) <- dailyByType) {
      val ns = series.map(_._2.toDouble)
      val byDi = series.toMap
      val m = ns.sum / ns.length
      val den = ns.map(v => (v - m) * (v - m)).sum
      if (den > 0) for (lag <- 1L to 7L) {
        val pairs = series.flatMap { case (di, n) =>
          byDi.get(di + lag).map(n2 => (n.toDouble - m) * (n2 - m))
        }
        if (pairs.nonEmpty) {
          val (gn, gacf) = got((typ, lag))
          assert(gn == pairs.length, s"$typ lag $lag n_pairs")
          assert(math.abs(gacf - r6(pairs.sum / den)) <= 2e-6, s"$typ lag $lag acf")
          checked += 1
        }
      }
    }
    assert(checked > 0 && checked == got.size)
  }

  test("event_seasonal_decompose: trend is the centered MA and parts re-sum") {
    val got = SparkEntry.queries("event_seasonal_decompose")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.nonEmpty)
    var checked = 0
    for ((typ, series) <- dailyByType) {
      for (i <- 3 until series.length - 3) {
        val (di, n) = series(i)
        // contiguous full frame only (fixture days are contiguous per type)
        if (series(i + 3)._1 - series(i - 3)._1 == 6) {
          val frame = series.slice(i - 3, i + 4).map(_._2)
          val day = java.time.LocalDate.ofEpochDay(di)
          val (gn, gtrend, gseason, gresid) = got((typ, day))
          assert(gn == n, s"$typ $day n")
          assert(math.abs(gtrend - r6(frame.sum / 7.0)) <= 2e-6, s"$typ $day trend")
          assert(math.abs(gn - gtrend - gseason - gresid) <= 2e-6,
            s"$typ $day identity")
          checked += 1
        }
      }
    }
    assert(checked > 0 && checked == got.size)
    // seasonal components re-center to ~zero within each type
    got.toSeq.groupBy(_._1._1).foreach { case (typ, rows) =>
      val perDow = rows.map { case ((_, day), (_, _, s, _)) =>
        (day.getDayOfWeek.getValue, s)
      }.distinct.map(_._2)
      assert(math.abs(perDow.sum) <= 1e-4, s"$typ seasonal centering")
    }
  }

  test("event_lorenz deciles equal the sequential ntile cut") {
    val counts = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = SparkEntry.queries("event_lorenz")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    var checked = 0
    for ((typ, rows) <- counts) {
      // SQL ntile: first (n mod k) buckets take ceil(n/k) rows
      val sorted = rows.sortBy(r => (r._3, r._2))
      val n = sorted.length
      val (base, extra) = (n / 10, n % 10)
      val buckets = (1 to 10).map { d =>
        val start = (d - 1) * base + math.min(d - 1, extra)
        val size = base + (if (d <= extra) 1 else 0)
        d.toLong -> sorted.slice(start, start + size).map(_._3)
      }.filter(_._2.nonEmpty)
      val total = sorted.map(_._3).sum.toDouble
      var cum = 0L
      for ((d, ns) <- buckets) {
        val (gu, ge, gshare, gcum) = got((typ, d))
        cum += ns.sum
        assert(gu == ns.length, s"$typ d$d users")
        assert(ge == ns.sum, s"$typ d$d events")
        assert(math.abs(gshare - r6(ns.sum / total)) <= 1e-9, s"$typ d$d share")
        assert(math.abs(gcum - r6(cum / total)) <= 1e-9, s"$typ d$d cum")
        checked += 1
      }
    }
    assert(checked > 0 && checked == got.size)
    // each type's last decile must close the curve at 1.0
    got.keys.map(_._1).foreach { typ =>
      val last = got.filter(_._1._1 == typ).keys.map(_._2).max
      assert(got((typ, last))._4 == 1.0, s"$typ curve closes")
    }
  }

  test("event_rolling_uniques equals brute-force trailing distinct counts") {
    val ud = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
    val days = ud.map(_._1).distinct.sorted
    val got = SparkEntry.queries("event_rolling_uniques")(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == days.length)
    for (d <- days) {
      def uniq(w: Int) =
        ud.filter(p => p._1 <= d && p._1 > d - w).map(_._2).distinct.length
      val (dau, wau7, mau28) = got(d)
      assert(dau == uniq(1), s"day $d dau")
      assert(wau7 == uniq(7), s"day $d wau7")
      assert(mau28 == uniq(28), s"day $d mau28")
    }
  }

  test("market_basket_lift equals brute-force pair association") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = li.map(_._1).distinct.length
    val partCnt = li.groupBy(_._2).map { case (p, rs) => p -> rs.length }
    val co = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (pr, xs) => pr -> xs.size }
      .filter(_._2 >= 2)
    val got = SparkEntry.queries("market_basket_lift")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(got.size == co.size && co.nonEmpty)
    for ((pr @ (p1, p2), c) <- co) {
      val (gco, gc1, gc2, gsup, gconf, glift) = got(pr)
      assert(gco == c && gc1 == partCnt(p1) && gc2 == partCnt(p2), s"$pr counts")
      assert(math.abs(gsup - r6(c.toDouble / nOrders)) <= 1e-9, s"$pr support")
      assert(math.abs(gconf - r6(c.toDouble / partCnt(p1))) <= 1e-9, s"$pr conf")
      assert(math.abs(glift -
        r6(c.toDouble * nOrders / (partCnt(p1).toLong * partCnt(p2)))) <= 1e-9,
        s"$pr lift")
    }
  }

  /** (user, day, value-at-2dp, type) rows for the experimentation family. */
  private lazy val expRows: Seq[(Long, java.time.LocalDate, BigDecimal, String)] =
    Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("d"),
        col("value"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
        r.getString(3))).toSeq

  test("stat_cuped equals the textbook per-user adjustment y' = y - theta(x - xbar)") {
    val days = expRows.map(_._2)
    val cut = days.min.plusDays(
      java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max) / 2)
    val perUser = expRows.groupBy(_._1).map { case (u, rs) =>
      val x = rs.filter(_._2.isBefore(cut)).map(_._3).sum.toDouble
      val y = rs.filter(!_._2.isBefore(cut)).map(_._3).sum.toDouble
      (u, x, y)
    }.toSeq
    val n = perUser.size.toDouble
    val (tx, ty) = (perUser.map(_._2).sum, perUser.map(_._3).sum)
    val txy = perUser.map(r => r._2 * r._3).sum
    val txx = perUser.map(r => r._2 * r._2).sum
    val theta = r6((n * txy - tx * ty) / (n * txx - tx * tx))
    val xbar = r6(tx / n)
    val got = SparkEntry.queries("stat_cuped")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got.size == 2)
    for (arm <- Seq(0L, 1L)) {
      val us = perUser.filter(r => r._1 % 2 == arm)
      val adj = us.map(r => r._3 - theta * (r._2 - xbar))
      val raw = us.map(_._3)
      def mean(v: Seq[Double]) = v.sum / v.size
      def varS(v: Seq[Double]) = {
        val m = mean(v); v.map(x => (x - m) * (x - m)).sum / (v.size - 1)
      }
      val (gn, gMeanY, gVarY, gMeanC, gVarC) = got(arm)
      assert(gn == us.size, s"arm $arm n_users")
      def close(a: Double, b: Double, what: String): Unit =
        assert(math.abs(a - b) <= math.max(2e-6, 1e-8 * math.abs(b)),
          s"arm $arm $what: got $a want $b")
      close(gMeanY, mean(raw), "mean_y")
      close(gVarY, varS(raw), "var_y")
      close(gMeanC, mean(adj), "mean_y_cuped")
      close(gVarC, varS(adj), "var_y_cuped")
      // NOTE: pooled-theta CUPED guarantees variance reduction only for the
      // pooled population, not per arm — no per-arm inequality asserted.
    }
  }

  test("stat_ab_proportions equals the sequential two-proportion z-test") {
    val conv = expRows.groupBy(_._1).map { case (u, rs) =>
      u -> (if (rs.exists(r => r._4 == "purchase" && r._3 >= 100)) 1L else 0L)
    }
    val (a0, a1) = conv.partition(_._1 % 2 == 0)
    val (n0, n1) = (a0.size.toDouble, a1.size.toDouble)
    val (c0, c1) = (a0.values.sum.toDouble, a1.values.sum.toDouble)
    val (p0, p1) = (c0 / n0, c1 / n1)
    val p = (c0 + c1) / (n0 + n1)
    val z = (p1 - p0) / math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
    val h = (n0 + n1) / 2
    val srm = (n0 - h) * (n0 - h) / h + (n1 - h) * (n1 - h) / h
    val r = SparkEntry.queries("stat_ab_proportions")(spark, sf).collect().head
    assert(r.getLong(0) == n0.toLong && r.getLong(1) == n1.toLong)
    assert(r.getLong(2) == c0.toLong && r.getLong(3) == c1.toLong)
    assert(math.abs(r.getDouble(4) - r6(p0)) <= 1e-9)
    assert(math.abs(r.getDouble(5) - r6(p1)) <= 1e-9)
    assert(math.abs(r.getDouble(6) - r6(z)) <= 2e-6, "z_stat")
    assert(math.abs(r.getDouble(7) - r6(srm)) <= 2e-6, "srm_chi2")
  }

  test("stat_theils_u equals textbook -sum(p log2 p) entropies and U identities") {
    val cells = expRows.groupBy(r =>
      (r._4, r._2.getDayOfWeek.getValue)).map { case (k, rs) => k -> rs.size }
    def ent[K](m: Map[K, Int]): Double = {
      val t = m.values.sum.toDouble
      -m.values.map(n => n / t * (math.log(n / t) / math.log(2))).sum
    }
    val hx = ent(cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum })
    val hy = ent(cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum })
    val hxy = ent(cells)
    val mi = hx + hy - hxy
    val r = SparkEntry.queries("stat_theils_u")(spark, sf).collect().head
    def close(a: Double, b: Double, what: String): Unit =
      assert(math.abs(a - b) <= 2e-6, s"$what: got $a want $b")
    close(r.getDouble(0), r6(hx), "h_type")
    close(r.getDouble(1), r6(hy), "h_dow")
    close(r.getDouble(2), r6(hxy), "h_joint")
    close(r.getDouble(3), r6(mi), "mutual_info")
    close(r.getDouble(4), r6(mi / hx), "u_type_given_dow")
    close(r.getDouble(5), r6(mi / hy), "u_dow_given_type")
    // U is a normalized mutual information: both directions in [0, 1]
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
  }

  test("stat_student_ttest equals the textbook pooled-variance t per day") {
    val byDay = expRows.groupBy(_._2)
    val got = SparkEntry.queries("stat_student_ttest")(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
    var checked = 0
    for ((day, rs) <- byDay) {
      val a = rs.filter(_._4 == "purchase").map(_._3.toDouble)
      val b = rs.filter(_._4 == "click").map(_._3.toDouble)
      if (a.length > 1 && b.length > 1) {
        val (n1, n2) = (a.length, b.length)
        val (m1, m2) = (a.sum / n1, b.sum / n2)
        def ss(xs: Seq[Double], m: Double) = xs.map(x => (x - m) * (x - m)).sum
        val sp2 = (ss(a, m1) + ss(b, m2)) / (n1 + n2 - 2)
        val t = (m1 - m2) / math.sqrt(sp2 * (1.0 / n1 + 1.0 / n2))
        val (gn1, gn2, gdiff, gt, gdf) = got(day)
        assert(gn1 == n1 && gn2 == n2, s"$day counts")
        assert(math.abs(gdiff - r6(m1 - m2)) <= 2e-6, s"$day mean_diff")
        assert(math.abs(gt - r6(t)) <= 2e-6, s"$day t_stat")
        assert(gdf == n1 + n2 - 2, s"$day df")
        checked += 1
      }
    }
    assert(checked > 5, s"only $checked days checked")
    // pooled t and Welch t must agree in sign day-by-day
    val welch = SparkEntry.queries("stat_welch_ttest")(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getDouble(4)).toMap
    for ((day, (_, _, _, t, _)) <- got if welch.contains(day))
      assert(t.sign == welch(day).sign || t == 0.0 || welch(day) == 0.0,
        s"$day pooled vs Welch sign")
  }

  test("stat_cramers_v_corrected matches the Bergsma correction and shrinks V") {
    val cells = expRows.groupBy(r =>
      (r._4, r._2.getDayOfWeek.getValue)).map { case (k, rs) => k -> rs.size }
    val n = cells.values.sum.toDouble
    val rowT = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val colT = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val (rr, cc) = (rowT.size.toDouble, colT.size.toDouble)
    var chi2 = 0.0
    for (((et, dow), o) <- cells) {
      val e = rowT(et) * colT(dow) / n
      chi2 += (o - e) * (o - e) / e
    }
    val phi2 = chi2 / n
    val phi2c = math.max(0.0, phi2 - (rr - 1) * (cc - 1) / (n - 1))
    val rc = rr - (rr - 1) * (rr - 1) / (n - 1)
    val ccd = cc - (cc - 1) * (cc - 1) / (n - 1)
    val vRaw = math.sqrt(phi2 / (math.min(rr, cc) - 1))
    val vCorr = math.sqrt(phi2c / (math.min(rc, ccd) - 1))
    val r = SparkEntry.queries("stat_cramers_v_corrected")(spark, sf).collect().head
    assert(r.getLong(0) == n.toLong)
    assert(math.abs(r.getDouble(1) - r6(chi2)) <= 2e-6, "chi2")
    assert(math.abs(r.getDouble(2) - r6(vRaw)) <= 2e-6, "v_raw")
    assert(math.abs(r.getDouble(3) - r6(vCorr)) <= 2e-6, "v_corrected")
    // the correction can only shrink, and both stay in [0, 1]
    assert(r.getDouble(3) <= r.getDouble(2) + 1e-9)
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
  }

  test("stat_min_sample_size equals the closed-form two-arm calculators") {
    val perUser = expRows.groupBy(_._1).map { case (u, rs) =>
      val conv = if (rs.exists(r => r._4 == "purchase" && r._3 >= 100)) 1 else 0
      (u, conv, rs.map(_._3).sum)
    }.toSeq
    val n = perUser.size.toDouble
    val p1 = perUser.map(_._2).sum / n
    val p2 = p1 + 0.02
    val ys = perUser.map(_._3.toDouble)
    val my = ys.sum / n
    val vy = ys.map(y => (y - my) * (y - my)).sum / (n - 1)
    val zs = 1.9599639845400545 + 0.8416212335729143
    val nConv = math.ceil(zs * zs * (p1 * (1 - p1) + p2 * (1 - p2)) / (0.02 * 0.02)).toLong
    val nCont = math.ceil(2.0 * zs * zs * vy / (0.05 * my * 0.05 * my)).toLong
    val r = SparkEntry.queries("stat_min_sample_size")(spark, sf).collect().head
    assert(r.getLong(0) == n.toLong, "n_users")
    assert(math.abs(r.getDouble(1) - r6(p1)) <= 1e-9, "p_base")
    // variance algebra differs (raw sums vs two-pass): allow the ceil to
    // move by one user at the boundary
    assert(math.abs(r.getLong(2) - nConv) <= 1, "n_per_arm_conversion")
    assert(math.abs(r.getDouble(3) - r6(my)) <= 2e-6, "mean_y")
    assert(math.abs(r.getLong(5) - nCont) <= 1, "n_per_arm_continuous")
    // detecting a smaller lift must need more users than a larger one:
    // the calculator is inversely quadratic in the effect size
    assert(r.getLong(2) > (zs * zs * (p1 * (1 - p1) + p2 * (1 - p2)) / (0.04 * 0.04)).toLong)
  }

  test("ml_woe_iv equals the textbook WoE/IV shares and sign rule") {
    val byType = expRows.groupBy(_._4).map { case (t, rs) =>
      t -> ((rs.count(_._3 >= 100), rs.count(_._3 < 100)))
    }.filter { case (_, (g, b)) => g > 0 && b > 0 }
    val tg = byType.values.map(_._1).sum.toDouble
    val tb = byType.values.map(_._2).sum.toDouble
    val rows = SparkEntry.queries("ml_woe_iv")(spark, sf).collect()
    assert(rows.length == byType.size)
    var ivSum = 0.0
    for (r <- rows) {
      val (g, b) = byType(r.getString(0))
      assert(r.getLong(1) == g && r.getLong(2) == b)
      val (gs, bs) = (g / tg, b / tb)
      val woe = math.log(gs / bs)
      assert(math.abs(r.getDouble(3) - r6(woe)) <= 2e-6, s"${r.getString(0)} woe")
      assert(math.abs(r.getDouble(4) - r6((gs - bs) * woe)) <= 2e-6, "iv_term")
      // sign rule: over-represented goods ⇒ positive WoE
      assert((gs > bs) == (r.getDouble(3) > 0) || r.getDouble(3) == 0.0)
      assert(r.getDouble(4) >= 0.0, "IV contributions are non-negative")
      ivSum += (gs - bs) * woe
    }
    assert(math.abs(rows.head.getDouble(5) - r6(ivSum)) <= 2e-6, "iv_total")
  }

  test("embed_correlation: unit diagonal, [-1,1] range, matches Pearson") {
    val rows = SparkEntry.queries("embed_correlation")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.size == 65 * 64 / 2)
    for (i <- 0 until 64) assert(rows((i.toLong, i.toLong)) == 1.0, s"diag $i")
    assert(rows.values.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
    // independent Pearson recompute for a few pairs from the raw vectors
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length.toDouble
    def corr(i: Int, j: Int): Double = {
      val (xi, xj) = (vecs.map(_(i)), vecs.map(_(j)))
      val (mi, mj) = (xi.sum / n, xj.sum / n)
      val cov = xi.zip(xj).map { case (a, b) => (a - mi) * (b - mj) }.sum / n
      val (vi, vj) = (xi.map(a => (a - mi) * (a - mi)).sum / n,
        xj.map(a => (a - mj) * (a - mj)).sum / n)
      cov / math.sqrt(vi * vj)
    }
    for ((i, j) <- Seq((0, 1), (5, 9), (10, 63), (31, 32)))
      assert(math.abs(rows((i.toLong, j.toLong)) - r6(corr(i, j))) <= 5e-6,
        s"corr($i,$j)")
  }

  test("window_time_decay equals the sequential 8-tap event-time kernel") {
    val perUser = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val got = SparkEntry.queries("window_time_decay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    var checked = 0
    for ((u, rows) <- perUser) {
      val ordered = rows.sortBy(r => (r._3, r._2))
      for (i <- ordered.indices) {
        val taps = (0 until 8).flatMap { j =>
          if (i - j >= 0) {
            val (_, _, tj, vj) = ordered(i - j)
            Some((vj, math.exp((tj - ordered(i)._3).toDouble / 3.6e9)))
          } else None
        }
        val want = taps.map(t => t._1 * t._2).sum / taps.map(_._2).sum
        val g = got((u, ordered(i)._2))
        assert(math.abs(g - r6(want)) <= 2e-6, s"user $u event ${ordered(i)._2}")
        // a weighted average stays inside the window's value range
        val vs = taps.map(_._1)
        assert(g >= vs.min - 1e-6 && g <= vs.max + 1e-6)
        checked += 1
      }
    }
    assert(checked > 500, s"only $checked rows checked")
  }

  test("event_bounding_ratio equals (last-first)/span over the ordered series") {
    val perUser = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val got = SparkEntry.queries("event_bounding_ratio")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got.size == perUser.size)
    for ((u, rows) <- perUser) {
      val o = rows.sortBy(r => (r._3, r._2))
      val span = (o.last._3 - o.head._3).toDouble / 1e6
      val (gn, gspan, grate) = got(u)
      assert(gn == rows.size)
      assert(math.abs(gspan - r6(span)) <= 1e-6)
      if (span == 0.0) assert(grate.isEmpty, s"user $u zero span must be NULL")
      else assert(math.abs(grate.get - r6((o.last._4 - o.head._4) / span)) <= 2e-6)
    }
  }

  test("stat_association_coeffs equals the textbook phi/C/T and orders sanely") {
    val cells = expRows.groupBy(r =>
      (r._4, r._2.getDayOfWeek.getValue)).map { case (k, rs) => k -> rs.size }
    val n = cells.values.sum.toDouble
    val rowT = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val colT = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    var chi2 = 0.0
    for (((et, dow), o) <- cells) {
      val e = rowT(et) * colT(dow) / n
      chi2 += (o - e) * (o - e) / e
    }
    val (rr, cc) = (rowT.size.toDouble, colT.size.toDouble)
    val r = SparkEntry.queries("stat_association_coeffs")(spark, sf).collect().head
    assert(r.getLong(0) == n.toLong)
    assert(math.abs(r.getDouble(1) - r6(math.sqrt(chi2 / n))) <= 2e-6, "phi")
    assert(math.abs(r.getDouble(2) - r6(math.sqrt(chi2 / (chi2 + n)))) <= 2e-6, "C")
    assert(math.abs(r.getDouble(3) -
      r6(math.sqrt(chi2 / n / math.sqrt((rr - 1) * (cc - 1))))) <= 2e-6, "T")
    // C < 1 always; T <= phi for tables larger than 2x2
    assert(r.getDouble(2) < 1.0)
    assert(r.getDouble(3) <= r.getDouble(1) + 1e-9)
  }

  test("event_markov_attribution equals a sequential journey-chain reference") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // journeys truncated after the first purchase, in (ts, id) order
    val trans = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    for ((_, rows) <- events.groupBy(_._1)) {
      val o = rows.sortBy(r => (r._3, r._4)).map(_._2)
      val cut = o.indexOf("purchase") match {
        case -1 => o
        case i  => o.take(i + 1)
      }
      def m(t: String) = if (t == "purchase") "conv" else t
      def bump(k: (String, String)): Unit = trans(k) = trans(k) + 1
      bump(("start", m(cut.head)))
      for (w <- cut.sliding(2) if w.length == 2 && w(0) != "purchase")
        bump((w(0), m(w(1))))
      if (cut.last != "purchase") bump((cut.last, "null"))
    }
    val channels = Seq("click", "error", "signup", "view")
    def pConv(removed: Option[String]): Double = {
      val red = trans.toSeq
        .filter(t => !removed.contains(t._1._1))
        .map { case ((c, nx), n) =>
          ((c, if (removed.contains(nx)) "null" else nx), n) }
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      val byCur = red.groupBy(_._1._1)
      val p = byCur.flatMap { case (c, m2) =>
        val tot = m2.values.sum.toDouble
        m2.map { case ((_, nx), n) => (c, nx) -> n / tot }
      }
      val transient = ("start" +: channels).sorted
      var v = Map("start" -> 1.0).withDefaultValue(0.0)
      var absorbed = 0.0
      for (_ <- 1 to 20) {
        absorbed += transient.map(c => v(c) * p.getOrElse((c, "conv"), 0.0)).sum
        v = channels.map(nx => nx ->
          transient.map(c => v(c) * p.getOrElse((c, nx), 0.0)).sum)
          .toMap.withDefaultValue(0.0)
      }
      absorbed
    }
    val pFull = pConv(None)
    val re = channels.map(c => 1.0 - pConv(Some(c)) / pFull)
    val got = SparkEntry.queries("event_markov_attribution")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == channels)
    for ((r, i) <- got.zipWithIndex) {
      assert(math.abs(r.getDouble(1) - r6(pFull)) <= 2e-6, "p_conv")
      assert(math.abs(r.getDouble(2) - r6(re(i))) <= 2e-6, s"${channels(i)} removal")
      assert(math.abs(r.getDouble(3) - r6(re(i) / re.sum)) <= 2e-6, "attribution")
      assert(r.getDouble(2) >= -1e-9, "removing a channel cannot add conversions")
    }
    // attribution is a credit split: sums to 1
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) <= 5e-6)
  }

  test("agg_retention equals per-user gate-then-flag counting") {
    val perUser = expRows.groupBy(_._1).map { case (_, rs) =>
      (rs.exists(_._4 == "signup"), rs.exists(_._4 == "click"),
        rs.exists(_._4 == "purchase"))
    }
    val n1 = perUser.count(_._1)
    val n12 = perUser.count(u => u._1 && u._2)
    val n13 = perUser.count(u => u._1 && u._3)
    val r = SparkEntry.queries("agg_retention")(spark, sf).collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n12 && r.getLong(2) == n13)
    assert(math.abs(r.getDouble(3) - r6(n12.toDouble / n1)) <= 1e-9)
    assert(math.abs(r.getDouble(4) - r6(n13.toDouble / n1)) <= 1e-9)
  }

  test("pipeline_line_dedup equals sequential keep-first over 12-token lines") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    val want = docs.map { case (id, text) =>
      val toks = text.split(" ")
      val lines = toks.grouped(12).map(_.mkString(" ")).toSeq
      val kept = lines.count(l => seen.add(l))
      (id, lines.size.toLong, kept.toLong)
    }.toSeq
    val got = SparkEntry.queries("pipeline_line_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // keep-first by (doc_id, off): ascending doc scan IS the keeper order
    assert(got.toSeq == want, s"first diff: ${got.toSeq.diff(want).take(3)}")
  }

  test("event_session_stats is consistent with the event_sessionize islands") {
    val sess = SparkEntry.queries("event_sessionize")(spark, sf).collect()
      .map(r => (r.getLong(5), r.getLong(4))) // (n_events, duration_s)
    val r = SparkEntry.queries("event_session_stats")(spark, sf).collect().head
    assert(r.getLong(0) == sess.length, "n_sessions")
    assert(r.getLong(1) == sess.count(_._1 == 1L), "n_bounce")
    assert(math.abs(r.getDouble(3) -
      r6(sess.map(_._1).sum.toDouble / sess.length)) <= 1e-9, "avg_events")
    assert(math.abs(r.getDouble(4) -
      r6(sess.map(_._2).sum.toDouble / sess.length)) <= 2e-6, "avg_duration_s")
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
  }

  test("event_forecast_baseline equals last trend + that weekday's seasonal") {
    val dec = SparkEntry.queries("event_seasonal_decompose")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(3),
        r.getDouble(4)))
    val lastTrend = dec.groupBy(_._1).map { case (t, rs) =>
      val last = rs.maxBy(_._2.toEpochDay)
      t -> ((last._2, last._3))
    }
    val seasonal = dec.map(r => (r._1, r._2.getDayOfWeek.getValue.toLong) -> r._4)
      .toMap // same (type, dow) → same seasonal on every row
    val got = SparkEntry.queries("event_forecast_baseline")(spark, sf).collect()
    assert(got.length == lastTrend.size * 7)
    for (r <- got) {
      val (lastDay, trend) = lastTrend(r.getString(0))
      val day = r.getDate(1).toLocalDate
      assert(day.isAfter(lastDay) && !day.isAfter(lastDay.plusDays(7)))
      val s = seasonal((r.getString(0), day.getDayOfWeek.getValue.toLong))
      assert(math.abs(r.getDouble(2) - r6(trend + s)) <= 2e-6,
        s"${r.getString(0)} $day")
    }
  }

  test("ml_kmeans equals a sequential Lloyd reference with per-round rounding") {
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    var cents = data.take(4).map(_._2.clone)
    def d2(v: Array[Double], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
      s
    }
    def assign(v: Array[Double]): Int =
      cents.zipWithIndex.map { case (c, i) => (d2(v, c), i) }.min._2
    for (_ <- 1 to 3) {
      val byCell = data.groupBy(d => assign(d._2))
      cents = cents.zipWithIndex.map { case (old, i) =>
        byCell.get(i) match {
          case Some(members) =>
            val m = Array.fill(64)(0.0)
            for ((_, v) <- members; j <- 0 until 64) m(j) += v(j)
            m.map(x => r6(x / members.length))
          case None => old
        }
      }
    }
    val got = SparkEntry.queries("ml_kmeans")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.length == data.length)
    var mismatch = 0
    for (((id, v), (gid, gc, gd)) <- data.zip(got)) {
      assert(id == gid)
      val want = assign(v)
      // ulp-level distance ties could flip an assignment between the
      // sequential and distributed sum orders; require near-total agreement
      if (gc != want + 1) mismatch += 1
      else assert(math.abs(gd - r6(d2(v, cents(want)))) <= 2e-6, s"vec $id dist2")
    }
    assert(mismatch == 0, s"$mismatch assignment flips")
    // every cluster non-empty at this scale
    assert(got.map(_._2).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("stat_jarque_bera equals n/6(S^2 + K^2/4) from agg_moments' outputs") {
    val moments = SparkEntry.queries("agg_moments")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(4), r.getDouble(5))))
      .toMap
    val got = SparkEntry.queries("stat_jarque_bera")(spark, sf).collect()
    assert(got.length == moments.size)
    for (r <- got) {
      val (n, s, k) = moments(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - s) <= 2e-6, "skew matches agg_moments")
      assert(math.abs(r.getDouble(3) - k) <= 2e-6, "kurt matches agg_moments")
      // recompute from the 6-dp moments: JB is smooth, tolerance covers it
      val jb = n / 6.0 * (s * s + k * k / 4.0)
      assert(math.abs(r.getDouble(4) - jb) <= math.max(1e-4, jb * 1e-4), "jb")
      assert(r.getBoolean(5) == (r.getDouble(4) > 5.99))
    }
  }

  test("stat_anderson_darling folded formula equals the textbook two-term sum") {
    def phi(z: Double): Double = {
      val x = math.abs(z) / math.sqrt(2.0)
      val t = 1.0 / (1.0 + 0.3275911 * x)
      val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
        - 0.284496736) * t + 0.254829592) * t
      val erfc = poly * math.exp(-x * x)
      if (z >= 0) 1.0 - erfc / 2 else erfc / 2
    }
    val byDay = expRows.groupBy(_._2)
    val got = SparkEntry.queries("stat_anderson_darling")(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    var checked = 0
    for ((day, rs) <- byDay if rs.size > 7) {
      val vs = rs.map(_._3.toDouble).sorted
      val n = vs.length
      val mu = vs.sum / n
      val sd = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / (n - 1))
      if (sd > 0) {
        val z = vs.map(v => (v - mu) / sd)
        // UNFOLDED textbook form: pairs (i, n+1-i) — independent of the
        // single-pass folded rewrite the distributed key uses
        val a2 = -n - (1 to n).map(i =>
          (2.0 * i - 1) * (math.log(phi(z(i - 1)))
            + math.log(1.0 - phi(z(n - i))))).sum / n
        val (gn, ga2, grej) = got(day)
        assert(gn == n, s"$day n")
        assert(math.abs(ga2 - r6(a2)) <= 5e-6, s"$day a2")
        assert(grej == (ga2 > 0.752), s"$day verdict")
        checked += 1
      }
    }
    assert(checked > 5)
  }

  test("stat_levene equals the textbook Brown-Forsythe W from raw deviations") {
    val byType = expRows.groupBy(_._4).map { case (t, rs) =>
      t -> rs.map(_._3.toDouble).sorted
    }
    def median(xs: Seq[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    val zByGroup = byType.map { case (t, xs) =>
      val m = median(xs); t -> xs.map(x => math.abs(x - m))
    }
    val k = zByGroup.size.toDouble
    val nTot = zByGroup.values.map(_.size).sum.toDouble
    val zbar = zByGroup.values.flatten.sum / nTot
    val between = zByGroup.values.map { zs =>
      val zj = zs.sum / zs.size; zs.size * (zj - zbar) * (zj - zbar)
    }.sum
    val within = zByGroup.values.map { zs =>
      val zj = zs.sum / zs.size; zs.map(z => (z - zj) * (z - zj)).sum
    }.sum
    val w = (nTot - k) / (k - 1) * between / within
    val r = SparkEntry.queries("stat_levene")(spark, sf).collect().head
    assert(r.getLong(0) == k.toLong && r.getLong(1) == nTot.toLong)
    // between-SS computed per-observation here vs sums-only in the key
    assert(math.abs(r.getDouble(2) - r6(w)) <= 1e-4, s"W: ${r.getDouble(2)} vs $w")
  }

  test("event_periodogram: weekly period dominates and matches a DFT reference") {
    val got = SparkEntry.queries("event_periodogram")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val daily = expRows.groupBy(r => (r._4, r._2)).map { case ((t, d), rs) =>
      (t, d.toEpochDay, rs.size.toDouble)
    }.groupBy(_._1)
    for ((t, rows) <- daily) {
      val m = rows.map(_._3).sum / rows.size
      for (p <- 2L to 14L) {
        val cs = rows.map(r => (r._3 - m) * math.cos(2 * math.Pi * (r._2 % p) / p)).sum
        val sn = rows.map(r => (r._3 - m) * math.sin(2 * math.Pi * (r._2 % p) / p)).sum
        val power = (cs * cs + sn * sn) / rows.size
        val (gn, gp, _) = got((t, p))
        assert(gn == rows.size)
        assert(math.abs(gp - r6(power)) <= 5e-6, s"$t period $p")
      }
      // exactly one dominant period per type; the fixture's weekly traffic
      // structure makes it 7 (or a 7-harmonic) — assert it beats period 2
      val dom = (2L to 14L).filter(p => got((t, p))._3)
      assert(dom.size == 1, s"$t dominant set $dom")
    }
  }

  test("stat_tukey_hsd equals the textbook Tukey-Kramer q from group stats") {
    val byType = expRows.groupBy(_._4).map { case (t, rs) =>
      t -> rs.map(_._3.toDouble)
    }
    val k = byType.size.toDouble
    val nn = byType.values.map(_.size).sum.toDouble
    val ssw = byType.values.map { xs =>
      val m = xs.sum / xs.size; xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val msw = ssw / (nn - k)
    val got = SparkEntry.queries("stat_tukey_hsd")(spark, sf).collect()
    assert(got.length == (k * (k - 1) / 2).toInt)
    for (r <- got) {
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "canonical pair order")
      val (xa, xb) = (byType(a), byType(b))
      val (ma, mb) = (xa.sum / xa.size, xb.sum / xb.size)
      val q = math.abs(ma - mb) /
        math.sqrt(msw / 2 * (1.0 / xa.size + 1.0 / xb.size))
      assert(math.abs(r.getDouble(2) - r6(ma - mb)) <= 2e-6, s"$a/$b diff")
      assert(math.abs(r.getDouble(3) - r6(q)) <= 1e-4, s"$a/$b q")
      assert(r.getBoolean(4) == (r.getDouble(3) > 3.858))
    }
  }

  test("sink_json_roundtrip preserves every row bit-exactly") {
    val src = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val back = SparkEntry.queries("sink_json_roundtrip")(spark, sf)
    assert(back.count() == src.count())
    assert(back.except(src).count() == 0 && src.except(back).count() == 0,
      "NDJSON round-trip must lose nothing (timestamp µs format pinned)")
  }
}
