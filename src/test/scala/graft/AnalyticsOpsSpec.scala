package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics of the round-3 analytics additions: event funnel/retention/
  * gap-fill, argMax, mergeable HLL roll-up, multiset set-ops, null-safe
  * join. Each is checked against an independent formulation (window
  * functions, exact distinct, hand counts) on sf0.001 — the DuckDB oracle
  * is the cross-engine gate; these pin the cross-FORMULATION semantics.
  */
class AnalyticsOpsSpec extends SparkSpec {

  test("event_funnel levels are monotone and cover every user") {
    val rows = SparkEntry.queries("event_funnel")(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users, "levels must partition users")
    val byLevel = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every level-3 user is by definition also a signup user, so the count
    // of signup users (levels 1+2+3) bounds level 3 from above
    assert(byLevel.getOrElse(3L, 0L) <=
      byLevel.getOrElse(1L, 0L) + byLevel.getOrElse(2L, 0L) + byLevel.getOrElse(3L, 0L))
  }

  test("sample_bottomk: merge of shard samples equals the global sample") {
    // the KMV/bottom-k algebra the key's 100-TB story rests on: take the
    // per-type bottom-8 on two disjoint shards, union, re-take bottom-8 —
    // identical to the bottom-8 of the whole table
    import org.apache.spark.sql.DataFrame
    def bottomK(df: DataFrame): Seq[(String, Long)] = {
      val h = pmod(col("event_id") * 2654435761L, lit(1000000007L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(h, col("event_id"))
      df.select(col("event_type"), col("event_id"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 8).drop("rk")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    }
    val e = Tables.events(spark, sf).select("event_type", "event_id")
    val global = bottomK(e)
    val shardA = e.filter(col("event_id") % 2 === 0)
    val shardB = e.filter(col("event_id") % 2 =!= 0)
    val merged = bottomK(
      spark.createDataFrame(spark.sparkContext.parallelize(
        (bottomK(shardA) ++ bottomK(shardB)).map(p => Row(p._1, p._2))),
        e.schema))
    assert(merged == global, "bottom-k must be mergeable across shards")
    // and the query key returns exactly the global sample
    val viaKey = SparkEntry.queries("sample_bottomk")(spark, sf)
      .select("event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(viaKey == global)
  }

  test("window_rolling_median: interior frames equal the sorted middle element") {
    val rows = SparkEntry.queries("window_rolling_median")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vals = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .groupBy(_._1).map { case (u, rs) =>
        u -> rs.sortBy(r => (r._3.getTime, r._2)).map(r => (r._2, r._4)).toSeq
      }
    var interior = 0
    rows.foreach { case (u, eid, med) =>
      val seq = vals(u)
      val i = seq.indexWhere(_._1 == eid)
      if (i >= 4) {
        val frame = seq.slice(i - 4, i + 1).map(_._2).sorted
        assert(math.abs(frame(2) - med) < 1e-6,
          s"user $u event $eid: expected middle ${frame(2)}, got $med")
        interior += 1
      }
    }
    assert(interior > 100, "expected many full 5-row frames")
  }

  test("text_phrase_search: posting adjacency equals substring occurrence counts") {
    // independent formulation: tokenized (doc,pos+1) adjacency must equal
    // counting ' w1 w2 ' occurrences in the space-padded text
    val hits = SparkEntry.queries("text_phrase_search")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (" " + r.getString(1) + " "))
    val phrases = Seq("table hash", "merge group", "customer join")
    var checked = 0
    for ((docId, padded) <- docs; p <- phrases) {
      val needle = " " + p + " "
      // overlap-free count is fine: a needle can't overlap itself here
      val n = needle.r.findAllMatchIn(padded).length
      // count via sliding to also catch adjacent repeats sharing a space
      val n2 = Iterator.range(0, padded.length - needle.length + 1)
        .count(i => padded.regionMatches(i, needle, 0, needle.length))
      assert(hits.getOrElse((p, docId), 0L) == n2.toLong,
        s"doc $docId phrase '$p': expected $n2, key said ${hits.getOrElse((p, docId), 0L)} (regex $n)")
      if (n2 > 0) checked += 1
    }
    assert(checked > 20, "expected real phrase hits to check")
  }

  test("ml_logreg_train: distributed GD matches a sequential reference and learns") {
    val Row(n: Long, bias: Double, wq: Double, wd: Double, wt: Double, loss: Double) =
      SparkEntry.queries("ml_logreg_train")(spark, sf).collect().head
    assert(n > 0)
    // learned: below the w=0 baseline loss ln(2) (p=0.5 for every row)
    assert(loss < math.log(2.0), s"training must beat the 0.5-prob baseline, got $loss")
    // sequential reference: same standardization + same 8 GD rounds on the
    // collected rows — the distributed map-side-combined gradient means
    // must land on the same weights (order-independence of the algebra)
    val rows = Tables.lineitem(spark, sf)
      .select(when(col("l_returnflag") === "R", 1.0).otherwise(0.0),
        floor(col("l_quantity")).cast("long"),
        round(col("l_discount") * 100, 0).cast("long"),
        round(col("l_tax") * 100, 0).cast("long"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nn = rows.length.toDouble
    def muSd(xs: Array[Long]) = {
      val mu = xs.sum / nn
      (mu, math.sqrt(xs.map(x => x.toDouble * x).sum / nn - mu * mu))
    }
    val (muQ, sdQ) = muSd(rows.map(_._2)); val (muD, sdD) = muSd(rows.map(_._3))
    val (muT, sdT) = muSd(rows.map(_._4))
    val z = rows.map { case (y, q, d, t) =>
      (y, (q - muQ) / sdQ, (d - muD) / sdD, (t - muT) / sdT)
    }
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 8) {
      val g = Array(0.0, 0.0, 0.0, 0.0)
      z.foreach { case (y, z1, z2, z3) =>
        val p = 1.0 / (1.0 + math.exp(-(w(0) + w(1) * z1 + w(2) * z2 + w(3) * z3)))
        val r = p - y
        g(0) += r; g(1) += r * z1; g(2) += r * z2; g(3) += r * z3
      }
      w = Array.tabulate(4)(i => w(i) - 0.5 * g(i) / nn)
    }
    assert(math.abs(bias - w(0)) < 1e-6, s"bias $bias vs sequential ${w(0)}")
    assert(math.abs(wq - w(1)) < 1e-6); assert(math.abs(wd - w(2)) < 1e-6)
    assert(math.abs(wt - w(3)) < 1e-6)
  }

  test("sim_hard_negatives: every mined negative carries a different label") {
    val anchors = Tables.embeddings(spark, sf).filter(col("vec_id") < 5)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("sim_hard_negatives")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qId, label, rk) = (r.getLong(0), r.getInt(2), r.getLong(4))
      assert(label != anchors(qId), s"anchor $qId mined a same-label negative")
      assert(rk >= 1 && rk <= 3)
    }
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 3))
  }

  test("event_retention: retained counts never exceed the cohort") {
    val Row(cohort: Long, w1: Long, w2: Long, w3: Long) =
      SparkEntry.queries("event_retention")(spark, sf).collect().head
    assert(cohort > 0)
    assert(Seq(w1, w2, w3).forall(w => w >= 0 && w <= cohort))
  }

  test("event_gap_fill is dense: hours x types, zero-filled, sums preserved") {
    val out = SparkEntry.queries("event_gap_fill")(spark, sf).cache()
    val types = out.select("event_type").distinct().count()
    val hours = out.select("hr").distinct().count()
    assert(out.count() == types * hours, "grid must be dense")
    val total = out.agg(sum("n")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sf).count(), "fill must not invent rows")
    // the final cumulative value per type equals that type's total count
    val lastCum = out.groupBy("event_type").agg(max("cum_n").as("m"))
      .agg(sum("m")).collect().head.getLong(0)
    assert(lastCum == total)
    out.unpersist()
  }

  test("agg_argmax matches the window-function formulation") {
    val viaAgg = SparkEntry.queries("agg_argmax")(spark, sf)
      .select("event_type", "max_value_event").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").desc)
    val viaWindow = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_type", "event_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaWindow)
  }

  test("agg_hll_merge estimate is within 5% of exact distinct") {
    // hll_sketch_estimate returns a rounded LongType estimate
    val est = SparkEntry.queries("agg_hll_merge")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((t, e) <- exact)
      assert(math.abs(est(t) - e) <= 0.05 * e + 1,
        s"$t: estimate ${est(t)} vs exact $e")
  }

  test("agg_hll_merge: merged day partials equal the single-pass sketch") {
    val merged = SparkEntry.queries("agg_hll_merge")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct, "sketch merge must be lossless vs one pass")
  }

  test("event_rolling_uniques_approx: merged window == single-pass; ±5% vs exact") {
    val approx = SparkEntry.queries("event_rolling_uniques_approx")(spark, sf)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = SparkEntry.queries("event_rolling_uniques")(spark, sf)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet == exact.keySet, "same observed-day spine")
    for ((d, (dau, w7, m28)) <- exact) {
      val (ad, a7, a28) = approx(d)
      for (((a, e), tag) <- Seq((ad, dau), (a7, w7), (a28, m28))
             .zip(Seq("dau", "wau7", "mau28")))
        assert(math.abs(a - e.toDouble) <= 0.05 * e + 1, s"$d $tag: $a vs $e")
    }
    // mergeability is lossless: the 7-day rollup from day partials must
    // equal the single-pass sketch over the same raw 7-day slice (spot-check
    // the last observed day, the one with a full trailing window behind it)
    val lastDay = exact.keys.max
    val mergedLast = approx(lastDay)._2
    val directLast = Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .filter(col("day") > date_sub(lit(lastDay).cast("date"), 7)
        && col("day") <= lit(lastDay).cast("date"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    assert(mergedLast == directLast,
      s"day-partial merge must be lossless: $mergedLast vs $directLast")
  }

  test("agg_count_min_sketch: merged day partials estimate within the eps bound") {
    import org.apache.spark.util.sketch.CountMinSketch
    val rows = SparkEntry.queries("agg_count_min_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    val merged = rows.map { r =>
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(
        // Spark's base64() is MIME-chunked (76-char lines)
        java.util.Base64.getMimeDecoder.decode(r.getString(1))))
    }.reduce { (a, b) => a.mergeInPlace(b); a }
    val exact = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    for ((t, n) <- exact) {
      val est = merged.estimateCount(t)
      // CMS overestimates by at most eps * total stream length (w.h.p.)
      assert(est >= n && est <= n + math.ceil(0.001 * total).toLong + 1,
        s"$t: est $est vs exact $n")
    }
  }

  test("agg_cms_exact_domain: day-sketch collect cap fails loudly, not OOM") {
    // VERDICT r8 ask #8: the per-day sketch collect is bounded by
    // retention, and retention is a deployment knob — so the bound is a
    // named guard (like the range-join band guard), raisable via conf
    spark.conf.set("graft.cms.maxDays", "1")
    try {
      val e = intercept[IllegalArgumentException](
        SparkEntry.queries("agg_cms_exact_domain")(spark, sf).collect())
      assert(e.getMessage.contains("agg_cms_exact_domain"))
      assert(e.getMessage.contains("graft.cms.maxDays"))
    } finally spark.conf.unset("graft.cms.maxDays")
    // and the default cap admits the archive's day range
    assert(SparkEntry.queries("agg_cms_exact_domain")(spark, sf)
      .collect().nonEmpty)
  }

  test("dedup_containment finds asymmetric overlap symmetric Jaccard misses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-contain-").toString
    val long = (1 to 200).map(i => s"w$i").mkString(" ")
    val quote = (50 to 70).map(i => s"w$i").mkString(" ")  // excerpt of doc 0
    val other = (1 to 40).map(i => s"x$i").mkString(" ")
    Seq(
      (0L, long, "en", "srcA", long.length.toLong),
      (1L, quote, "en", "srcB", quote.length.toLong),
      (2L, other, "en", "srcC", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("dedup_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the quote is contained in the long doc (1 -> 0); the long doc is NOT
    // contained in the quote, and the unrelated doc matches nothing
    assert(pairs == Seq((1L, 0L)), pairs.toString)
  }

  test("set_ops_all preserves multiset cardinality") {
    val out = SparkEntry.queries("set_ops_all")(spark, sf)
      .groupBy("kind").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    val done = orders.filter(col("o_orderstatus") === "F").count()
    // |A ∩all B| + |A \all B| = |A| when B ⊆ A as multisets (B is a
    // filtered subset of A, so every element of B is matched in A)
    assert(out.getOrElse("in_both", 0L) == done)
    assert(out.getOrElse("beyond_done", 0L) == total - done)
  }

  test("pipeline_decontaminate removes exactly the train docs sharing an 8-gram") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-decontam-").toString
    val bench = (1 to 20).map(i => s"q$i").mkString(" ")   // the "benchmark" text
    val clean = (1 to 20).map(i => s"c$i").mkString(" ")
    // 8-gram overlap with the holdout doc: copy 8 consecutive tokens
    val leaked = ((1 to 8).map(i => s"q$i") ++ (1 to 12).map(i => s"z$i")).mkString(" ")
    // doc_id 13 hashes into the holdout bucket ((13*2654435761)%100 = 93);
    // 0..5 hash into train (verified in-test below, not assumed)
    Seq(
      (0L, clean, "en", "srcA", clean.length.toLong),
      (1L, leaked, "en", "srcB", leaked.length.toLong),
      (13L, bench, "en", "srcC", bench.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    assert((13L * 2654435761L) % 100 >= 90 && Seq(0L, 1L).forall(i => (i * 2654435761L) % 100 < 90))
    val kept = SparkEntry.queries("pipeline_decontaminate")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(kept == Seq(0L), s"doc 1 leaks an 8-gram of holdout doc 13, got $kept")
  }

  test("dedup_incremental rejects incoming near-dups of the index, keeps novel docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup-").toString
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 59).map(i => s"tok$i").mkString(" ") + " changed"
    val novel = (1 to 60).map(i => s"new$i").mkString(" ")
    // 0 hashes to the index bucket; 13/18/31 to the incoming bucket
    Seq(
      (0L, base, "en", "srcA", base.length.toLong),     // the index
      (13L, nearDup, "en", "srcB", nearDup.length.toLong), // near-dup -> reject
      (18L, novel, "en", "srcC", novel.length.toLong),     // novel -> accept
      (31L, base, "en", "srcD", base.length.toLong))       // exact dup -> reject
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    assert((0L * 2654435761L) % 100 < 90 &&
      Seq(13L, 18L, 31L).forall(i => (i * 2654435761L) % 100 >= 90))
    val kept = SparkEntry.queries("dedup_incremental")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(kept == Seq(18L), s"expected only the novel doc accepted, got $kept")
  }

  test("pipeline_pack_sequences: bins partition each shard, budget respected") {
    val out = SparkEntry.queries("pipeline_pack_sequences")(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(out.agg(sum("n_docs")).collect().head.getLong(0) == docs.count())
    // every bin except possibly a shard's last starts below the budget
    // boundary: bin index must be contiguous from 0 within each source
    val bad = out.groupBy("source")
      .agg(min("bin").as("mn"), max("bin").as("mx"), count(lit(1)).as("k"))
      .filter(col("mn") =!= 0 || col("k") =!= col("mx") + 1)
    assert(bad.isEmpty, "bins must be contiguous 0..max per shard")
    out.unpersist()
  }

  test("embed_quantize: int8 range respected, MSE bounded by (scale/2)^2") {
    val rows = SparkEntry.queries("embed_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val q1 = r.getAs[Int]("q1")
      val mse = r.getAs[Double]("mse")
      assert(q1 >= -127 && q1 <= 127, s"q1 out of int8 range: $q1")
      // symmetric rounding puts every residual within scale/2 (plus the
      // round(6) the query applies to both columns)
      assert(mse <= scale * scale / 4 + 1e-6, s"mse $mse vs scale $scale")
    }
  }

  test("scd2_history: versions partition each user's events, validity chains") {
    val out = SparkEntry.queries("scd2_history")(spark, sf).cache()
    val e = Tables.events(spark, sf)
    assert(out.agg(sum("n_events")).collect().head.getLong(0) == e.count(),
      "version rows must partition all events")
    // exactly one open (is_current) row per user, and valid_to of row k
    // equals valid_from of row k+1 (checked via the lead used to build it:
    // re-derive independently with a self-join on version+1)
    val users = e.select("user_id").distinct().count()
    assert(out.filter(col("is_current")).count() == users)
    val chained = out.as("a").join(out.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.version") + 1 === col("b.version"))
      .filter(col("a.valid_to") =!= col("b.valid_from"))
    assert(chained.isEmpty, "valid_to must chain to the next valid_from")
    out.unpersist()
  }

  test("window_ema stays within the trailing window's min/max envelope") {
    val out = SparkEntry.queries("window_ema")(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, 0)
    val bad = out
      .withColumn("lo", min("n").over(w)).withColumn("hi", max("n").over(w))
      .filter(col("ema") < col("lo") - 1e-6 || col("ema") > col("hi") + 1e-6)
    assert(bad.isEmpty, "a convex combination cannot leave the envelope")
  }

  test("agg_weighted_median: at least half the weight sits on each side") {
    val med = SparkEntry.queries("agg_weighted_median")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("w"))
    med.foreach { case (rf, (tot, m)) =>
      val below = li.filter(col("l_returnflag") === rf &&
        col("l_extendedprice") <= m).agg(sum("w")).collect().head.getLong(0)
      val above = li.filter(col("l_returnflag") === rf &&
        col("l_extendedprice") >= m).agg(sum("w")).collect().head.getLong(0)
      assert(2 * below >= tot && 2 * above >= tot,
        s"$rf: median $m splits $below/$above of $tot")
    }
  }

  test("agg_collect arrays are sorted and agree with the serialized key") {
    // the query key emits only driver-comparable columns (ids_csv, n);
    // the array contract lives here: sorted, complete, and exactly what
    // ids_csv serializes.
    val arr = graft.operators.RelationalOps.aggCollectArrays(spark, sf)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Long](1), r.getLong(2))).sortBy(_._1)
    assert(arr.nonEmpty)
    arr.foreach { case (u, ids, n) =>
      assert(ids == ids.sorted, s"$u: ids must leave the aggregate sorted")
      assert(ids.size.toLong == n, s"$u: n must equal the array length")
    }
    val csv = SparkEntry.queries("agg_collect")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(csv.map(_._1).toSeq == arr.map(_._1).toSeq)
    csv.zip(arr).foreach { case ((_, s), (_, ids, _)) =>
      assert(s == ids.mkString(","), "ids_csv must serialize the same array")
    }
  }

  test("embed_covariance: co-moments equal covar_pop and survive re-layout") {
    val cov = SparkEntry.queries("embed_covariance")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cov.size == 64 * 65 / 2)
    (0 until 64).foreach(i =>
      assert(cov((i.toLong, i.toLong)) >= 0.0, s"var($i) must be >= 0"))
    // independent formulation: Spark's own covar_pop on two dimensions
    val e = Tables.embeddings(spark, sf).select(
      element_at(col("embedding"), 1).cast("double").as("x0"),
      element_at(col("embedding"), 2).cast("double").as("x1"))
    val r = e.agg(covar_pop(col("x0"), col("x0")),
      covar_pop(col("x0"), col("x1"))).head
    assert(math.abs(cov((0L, 0L)) - r.getDouble(0)) < 2e-6)
    assert(math.abs(cov((0L, 1L)) - r.getDouble(1)) < 2e-6)
    // partial-merge layout independence at the rounded contract
    import graft.functions.api.coMoment
    val v = Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    def m(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.agg(coMoment(col("v"), 64)).collect().head.getSeq[Double](0)
        .map(x => math.rint(x * 1e6) / 1e6)
    assert(m(v.coalesce(1)) == m(v.repartition(32)))
  }

  test("event_sequence_match_time equals the brute-force existential check") {
    // independent semantics pin: for every user, literally enumerate
    // (signup, click, purchase) triples and test the chain bounds —
    // including the "later signup rescues the chain" case a greedy
    // first-match would miss. Feasible because sf0.001 is tiny; the query
    // itself is the single-window-pass formulation.
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_type"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = ev.map { case (u, rows) =>
      // "before" is the row order (ts, event_id) — ties break like the
      // window's ROWS frame does
      def evs(tp: String) = rows.filter(_._3 == tp).map(r => (r._2, r._4))
      def before(a: (Long, Long), b: (Long, Long)) =
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      val (ss, cs, ps) = (evs("signup"), evs("click"), evs("purchase"))
      val matched = ps.exists(p => cs.exists(c => before(c, p) &&
        p._1 <= c._1 + 86400L * 1000000 &&
        ss.exists(s => before(s, c) && c._1 <= s._1 + 21600L * 1000000)))
      val any = ps.exists(p => cs.exists(c => before(c, p) &&
        ss.exists(s => before(s, c))))
      u -> (matched, any)
    }
    val got = SparkEntry.queries("event_sequence_match_time")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) =>
      assert(got(u) == e, s"user $u: window NFA disagrees with brute force")
    }
    // the time bound must actually bite on this data
    assert(expected.values.exists { case (m, a) => a && !m },
      "fixture should contain chains that only the unconstrained form matches")
    assert(expected.values.exists(_._1), "some user should match with bounds")
  }

  test("pageRank dangling-mass redistribution conserves total rank") {
    // 3-node graph with a genuine sink: 1→2, 2→1, 1→3; node 3 has no
    // out-edge. The query key's algebra (oracle-matched) drops the mass
    // parked at 3 each iteration; the redistributing variant must keep
    // total rank at exactly 1.0 and dominate the dropping variant
    // pointwise (all update coefficients are non-negative).
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val drop = graft.operators.EventOps.pageRankOnEdges(edges, false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val keep = graft.operators.EventOps.pageRankOnEdges(edges, true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(keep.keySet == Set(1L, 2L, 3L) && drop.keySet == keep.keySet)
    assert(math.abs(keep.values.sum - 1.0) < 1e-4,
      s"redistributed ranks must sum to 1, got ${keep.values.sum}")
    assert(drop.values.sum < 1.0 - 1e-3,
      "the dropping variant must lose the sink mass on this graph")
    keep.foreach { case (n, r) =>
      assert(r >= drop(n) - 1e-9, s"node $n: redistribution can only add mass")
    }
  }

  test("event_max_concurrent equals a brute-force interval overlap count") {
    // independent semantics pin: for each user literally test every event
    // timestamp against every interval [ts, ts+value] (closed ends) — the
    // sweep's max running count must equal the max pointwise overlap,
    // which for closed intervals is always attained at some start point.
    val got = SparkEntry.queries("event_max_concurrent")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iv = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("double").as("a"),
        (col("ts").cast("double") + col("value").cast("int")).as("b"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    iv.foreach { case (u, xs) =>
      val brute = xs.map { case (_, a, _) =>
        xs.count { case (_, a2, b2) => a2 <= a && a <= b2 }
      }.max
      assert(got(u) == brute.toLong, s"user $u: sweep=${got(u)} brute=$brute")
    }
    assert(got.nonEmpty && got.values.max >= 2,
      "fixture must exercise a genuine overlap")
  }

  test("agg_auc: bounded, tie-aware, and 1.0 under perfect separation") {
    val rows = SparkEntry.queries("agg_auc")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val auc = r.getDouble(3)
      assert(auc >= 0.0 && auc <= 1.0, s"AUC out of range: $auc")
    }
    // degenerate pins on a constructed frame via the same rank identity:
    // perfect separation → 1.0; identical scores → 0.5 exactly
    import spark.implicits._
    val perfect = Seq(("p", 2.0), ("p", 3.0), ("n", 0.5), ("n", 1.0))
    val tied = Seq(("p", 1.0), ("p", 1.0), ("n", 1.0), ("n", 1.0))
    def auc(xs: Seq[(String, Double)]): Double = {
      val cells = xs.toDF("cls", "value")
        .groupBy("value")
        .agg(count(when(col("cls") === "p", 1)).as("np"),
          count(when(col("cls") === "n", 1)).as("nn"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("value")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      cells.withColumn("below", sum("nn").over(w) - col("nn"))
        .agg((sum(col("np") * (col("below") + col("nn") / lit(2.0)))
          / (sum("np") * sum("nn"))).as("auc"))
        .head.getDouble(0)
    }
    assert(auc(perfect) == 1.0)
    assert(auc(tied) == 0.5)
  }

  test("stat_welch_ttest matches commons-free reference on collected data") {
    val got = SparkEntry.queries("stat_welch_ttest")(spark, sf).collect()
      .map(r => r.getDate(0).toString -> (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.nonEmpty)
    // recompute one day sequentially from raw rows (Welch textbook form)
    val day = got.keys.min
    val raw = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit(day))
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    def stats(t: String) = {
      val xs = raw.filter(_._1 == t).map(_._2)
      val m = xs.sum / xs.length
      (xs.length, m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (n1, m1, v1) = stats("purchase"); val (n2, m2, v2) = stats("click")
    val se = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se)
    val df = se * se /
      (v1 * v1 / n1.toDouble / n1 / (n1 - 1) + v2 * v2 / n2.toDouble / n2 / (n2 - 1))
    assert(math.abs(got(day)._2 - t) < 1e-4, s"t: ${got(day)._2} vs $t")
    assert(math.abs(got(day)._3 - df) < 1e-3, s"df: ${got(day)._3} vs $df")
  }

  test("ml_linreg_multi matches a sequential normal-equations solve") {
    val got = SparkEntry.queries("ml_linreg_multi")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.nonEmpty)
    val flag = got.keys.min
    val rows = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === flag)
      .select("l_quantity", "l_discount", "l_extendedprice").collect()
      .map(r => (r.getDouble(0), math.rint(r.getDouble(1) * 100),
        r.getDouble(2)))
    // sequential Gaussian elimination on the raw normal equations
    val n = rows.length.toDouble
    val (s1, s2, sy) = (rows.map(_._1).sum, rows.map(_._2).sum,
      rows.map(_._3).sum)
    val s11 = rows.map(r => r._1 * r._1).sum
    val s12 = rows.map(r => r._1 * r._2).sum
    val s22 = rows.map(r => r._2 * r._2).sum
    val s1y = rows.map(r => r._1 * r._3).sum
    val s2y = rows.map(r => r._2 * r._3).sum
    val a = Array(
      Array(n, s1, s2, sy), Array(s1, s11, s12, s1y), Array(s2, s12, s22, s2y))
    for (i <- 0 until 3; j <- i + 1 until 3) {
      val f = a(j)(i) / a(i)(i)
      for (k <- i until 4) a(j)(k) -= f * a(i)(k)
    }
    val b = new Array[Double](3)
    for (i <- 2 to 0 by -1)
      b(i) = (a(i)(3) - (i + 1 until 3).map(k => a(i)(k) * b(k)).sum) / a(i)(i)
    assert(math.abs(got(flag)._1 - b(0)) < 1e-3, s"b0: ${got(flag)._1} vs ${b(0)}")
    assert(math.abs(got(flag)._2 - b(1)) < 1e-4, s"b1: ${got(flag)._2} vs ${b(1)}")
    assert(math.abs(got(flag)._3 - b(2)) < 1e-4, s"b2: ${got(flag)._3} vs ${b(2)}")
  }

  test("event_downsample_lttb: one point per nonempty bucket, area-maximal") {
    val out = SparkEntry.queries("event_downsample_lttb")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exactly one selected point per (user, bucket), ≤ 12 buckets each
    assert(out.length == out.distinct.length)
    val perUser = out.groupBy(_._1).view.mapValues(_.length)
    assert(perUser.values.forall(c => c >= 1 && c <= 12))
    // total row count shrinks to the bucket budget for busy users
    val busy = Tables.events(spark, sf).groupBy("user_id").count()
      .filter(col("count") >= 12).count()
    assert(perUser.count(_._2 == 12) == busy,
      "every user with >= 12 events must fill all 12 buckets")
  }

  test("embed_pca_project: projections are centered and capture the top eigenvalue") {
    val proj = SparkEntry.queries("embed_pca_project")(spark, sf).collect()
      .map(_.getDouble(1))
    assert(proj.nonEmpty)
    val mean = proj.sum / proj.length
    assert(math.abs(mean) < 1e-4, s"projections must be centered, mean=$mean")
    // sequential reference: converge the dominant eigenvalue with 200
    // power iterations on a brute-force covariance of the collected corpus
    val xs = Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val d = xs.head.length; val n = xs.length.toDouble
    val mu = Array.tabulate(d)(i => xs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      xs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / n)
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to 200) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val lambda = (0 until d).map(i =>
      v(i) * (0 until d).map(j => cov(i)(j) * v(j)).sum).sum
    val varProj = proj.map(p => (p - mean) * (p - mean)).sum / proj.length
    assert(varProj <= lambda * 1.0001,
      s"projection variance $varProj cannot exceed top eigenvalue $lambda")
    assert(varProj >= lambda * 0.98,
      s"40-iteration component must capture ~all of lambda: $varProj vs $lambda")
    assert(lambda >= cov.indices.map(i => cov(i)(i)).max - 1e-12,
      "top eigenvalue dominates every axis variance")
  }

  test("join_null_safe: the NULL bucket survives and totals cover all orders") {
    val rows = SparkEntry.queries("join_null_safe")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Tables.orders(spark, sf)
    assert(rows.keySet == Set("finished", "open", "unknown"))
    assert(rows.values.sum == orders.count(), "every order matches exactly one label")
    assert(rows("unknown") == orders.filter(col("o_orderstatus") === "P").count())
  }
}
