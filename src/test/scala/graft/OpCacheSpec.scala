package graft

import java.io.File
import java.nio.file.Files
import graft.operators.OpCache

/** OpCache's content-fingerprinted keys (VERDICT r8 watch item #2): the
  * dir+tag memo key was correct only under a fresh-dir-per-scale protocol —
  * an IN-PLACE rewrite of a data dir would serve stale artifacts. The key
  * now folds in a content fingerprint (file count, max mtime, total bytes),
  * so these pin: same content hits, rewritten content re-derives.
  */
class OpCacheSpec extends SparkSpec {

  private def tmpDirWith(files: (String, String)*): File = {
    val d = Files.createTempDirectory("opcache-spec").toFile
    files.foreach { case (n, c) =>
      Files.write(new File(d, n).toPath, c.getBytes)
    }
    d
  }

  test("unchanged dir serves the memo; in-place rewrite re-derives") {
    val dir = tmpDirWith("table.parquet" -> "aaaa")
    var evals = 0
    def thunk = { evals += 1; spark.range(3).toDF("id") }
    val key = dir.getPath + "#spec_frame"
    OpCache.cached(key, thunk)
    OpCache.cached(key, thunk)
    assert(evals == 1, "same content must hit the memo")
    // rewrite the dir in place: extra file + different bytes (count and
    // size both move — robust to coarse mtime resolution)
    Files.write(new File(dir, "table2.parquet").toPath, "bbbbbb".getBytes)
    OpCache.cached(key, thunk)
    assert(evals == 2, "rewritten dir content must invalidate the memo")
    OpCache.cached(key, thunk)
    assert(evals == 2, "the re-derived entry memoizes again")
  }

  test("once() re-runs after an in-place rewrite too") {
    val dir = tmpDirWith("t.parquet" -> "xyz")
    var runs = 0
    val key = dir.getPath + "#spec_sink"
    def make = { runs += 1; s"path-$runs" }
    assert(OpCache.once(key)(make) == "path-1")
    assert(OpCache.once(key)(make) == "path-1")
    val f = new File(dir, "t.parquet")
    Files.write(f.toPath, "xyzw".getBytes) // size changes
    assert(OpCache.once(key)(make) == "path-2",
      "a rewritten source dir must re-run the sink build")
  }

  test("mtime-only change (same count, same bytes) still invalidates") {
    val dir = tmpDirWith("t.parquet" -> "same")
    var evals = 0
    val key = dir.getPath + "#spec_mtime"
    def thunk = { evals += 1; spark.range(1).toDF("id") }
    OpCache.cached(key, thunk)
    val f = new File(dir, "t.parquet")
    assert(f.setLastModified(f.lastModified() + 60000))
    OpCache.cached(key, thunk)
    assert(evals == 2)
  }

  test("non-directory key prefix keeps plain string-key behavior") {
    var evals = 0
    val key = "no-such-dir-xyzzy#spec_nofs"
    def thunk = { evals += 1; spark.range(1).toDF("id") }
    OpCache.cached(key, thunk)
    OpCache.cached(key, thunk)
    assert(evals == 1)
  }
}
