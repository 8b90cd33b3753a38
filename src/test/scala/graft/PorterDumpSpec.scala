package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential check of the native Porter stemmer against an independent
  * from-the-paper Python implementation (scripts/porter_check.py).
  *
  * The 6.4k-word adversarial vocabulary (scripts/porter_vocab.py — paper
  * stems × every suffix family the five steps touch, plus corpus words)
  * and the Python stems are committed fixtures, so the differential runs
  * on every `sbt test` instead of depending on a dev-time /tmp file.
  * Regenerate after a rule change:
  *   python3 scripts/porter_vocab.py > src/test/resources/porter_vocab.txt
  *   python3 scripts/porter_check.py src/test/resources/porter_vocab.txt \
  *     > src/test/resources/porter_stems_py.txt
  */
class PorterDumpSpec extends AnyFunSuite {
  private def lines(res: String): Seq[String] = {
    val in = getClass.getResourceAsStream(res)
    assert(in != null, s"missing fixture $res")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toSeq
    finally in.close()
  }

  test("native stemmer matches the independent Python Porter on 6.4k words") {
    val vocab = lines("/porter_vocab.txt")
    val expected = lines("/porter_stems_py.txt").map { l =>
      val Array(w, s) = l.split(" ", 2); w -> s
    }.toMap
    assert(vocab.size > 6000, "vocabulary fixture unexpectedly small")
    val diffs = vocab.flatMap { w =>
      val got = graft.expr.PorterStem.stem(w)
      val want = expected(w)
      if (got != want) Some(s"$w: scala=$got py=$want") else None
    }
    assert(diffs.isEmpty, s"${diffs.size} divergences, first 10:\n" +
      diffs.take(10).mkString("\n"))
  }
}
