package graft

import org.scalatest.funsuite.AnyFunSuite

/** The measured per-box quiet reference behind the contended predicate
  * ([[Calib.loadMtRef]]/[[Calib.recordMtSamples]]): fresh-box fallback,
  * min-of-window semantics (a contended session can never raise the
  * floor), drift convergence (a permanently slower box ages its old fast
  * sessions out instead of flagging contended forever), and corrupt-
  * record resilience. */
class CalibRefSpec extends AnyFunSuite {

  private def tmpRef(): String =
    java.nio.file.Files.createTempDirectory("calibref").toString +
      "/calib_mt_ref.json"

  test("fresh box: no record serves the conservative fallback, flagged") {
    val (v, src) = Calib.loadMtRef(tmpRef())
    assert(v == Calib.FallbackMtRef && src == "fallback")
  }

  test("recorded sessions: ref is the window min and a contended session " +
       "never raises it") {
    val path = tmpRef()
    Calib.recordMtSamples(Seq(0.31, 0.15, 0.22), path)
    val (v1, src1) = Calib.loadMtRef(path)
    assert(v1 == 0.15 && src1.startsWith("measured"))
    // a fully contended session records its (high) min but the window
    // min — the reference — is unchanged
    Calib.recordMtSamples(Seq(0.55, 0.61), path)
    assert(Calib.loadMtRef(path)._1 == 0.15)
  }

  test("drifted box: a permanently slower floor converges once the fast " +
       "sessions age out of the window") {
    val path = tmpRef()
    Calib.recordMtSamples(Seq(0.12), path)
    for (_ <- 1 to Calib.RefWindowSessions)
      Calib.recordMtSamples(Seq(0.4, 0.45), path)
    val (v, src) = Calib.loadMtRef(path)
    assert(v == 0.4 && src.startsWith("measured"),
      s"old fast session should have aged out: $v $src")
  }

  test("corrupt or out-of-range records fall back conservatively") {
    val path = tmpRef()
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "not json at all".getBytes("UTF-8"))
    assert(Calib.loadMtRef(path) == ((Calib.FallbackMtRef, "fallback")))
    // an absurd sample (mis-recorded units) is ignored by the sanity band
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      """{"mt_ref":99.0,"sessions":[{"t":1,"mt":99.0}]}""".getBytes("UTF-8"))
    assert(Calib.loadMtRef(path) == ((Calib.FallbackMtRef, "fallback")))
  }
}
