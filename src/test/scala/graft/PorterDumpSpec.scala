package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dev-only differential dump: stems /tmp/porter_vocab.txt (if present)
  * through the native stemmer for scripts/porter_check.py to diff. */
class PorterDumpSpec extends AnyFunSuite {
  test("dump stems for differential check") {
    val in = new java.io.File("/tmp/porter_vocab.txt")
    assume(in.exists())
    val words = scala.io.Source.fromFile(in).getLines().filter(_.nonEmpty).toSeq
    val out = new java.io.PrintWriter("/tmp/porter_scala.txt")
    words.foreach(w => out.println(s"$w ${graft.expr.PorterStem.stem(w)}"))
    out.close()
  }
}
