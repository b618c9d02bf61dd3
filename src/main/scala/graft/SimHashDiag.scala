package graft

import org.apache.spark.sql.functions._

/** Diagnostic main for the simhash block-index cost curves (VERDICT r9
  * Missing #2: `SCALE_RAMP_r09_sf10_bench.json` cites "the measured
  * candidate-pair counts — see ledger" and the ledger must actually hold
  * them). For a corpus dir and each requested block layout it reports:
  *
  *   - `candidates`: distinct (a,b) pairs proposed by the combo-key
  *     equality join BEFORE the popcount verify — the quantity the
  *     B-selection cost model (~C(B,3)·n²/2^keybits random collisions plus
  *     the true near-dup mass) predicts;
  *   - `verified`: pairs surviving Hamming<=3 — layout-independent by the
  *     pigeonhole completeness proof, so equal counts across layouts
  *     double-check SimHashScaleSpec's equality pin at data scale.
  *
  * Usage: runMain graft.SimHashDiag <sfDir> [4,6,8]
  * Output: one JSON line; SPARK_GRAFT_DIAG_OUT writes it to a file too.
  */
object SimHashDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val layouts =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(4, 6, 8)
    val spark = GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.documents(spark, sfDir)
    val sim = d.select(col("doc_id"),
        graft.functions.api.simHash64(col("text")).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = sim.count()
    val rows = layouts.map { b =>
      val keyed = graft.operators.DedupOps.simhashComboKeys(sim, b)
      val cand = keyed.as("x").join(keyed.as("y"),
          col("x.combo") === col("y.combo") &&
          col("x.ckey") === col("y.ckey") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
      val verified = keyed.as("x").join(keyed.as("y"),
          col("x.combo") === col("y.combo") &&
          col("x.ckey") === col("y.ckey") &&
          col("x.doc_id") < col("y.doc_id") &&
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))) <= 3)
        .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
      s"""{"blocks": $b, "candidates": $cand, "verified": $verified}"""
    }
    val out = s"""{"metric": "simhash_diag", "sf_dir": "$sfDir", """ +
      s""""docs": $n, "layouts": [${rows.mkString(", ")}]}"""
    println(out)
    sys.env.get("SPARK_GRAFT_DIAG_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p), out.getBytes)
    }
    spark.stop()
  }
}
