package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Lines

class LinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dropBoilerplateLines: cross-doc repeated sentences drop, in-doc repetition survives") {
    val docs = Seq(
      (1L, "Unique alpha. Accept cookies to continue. More alpha text"),
      (2L, "Beta content here. Accept cookies to continue. Beta closing"),
      (3L, "Gamma only. Accept cookies to continue"),
      // sentence repeated WITHIN one doc only — df counts distinct docs,
      // so it must survive
      (4L, "Echo echo. Echo echo. Final thought"),
      // fully-boilerplate doc: banner appears in 4 distinct docs
      (5L, "Accept cookies to continue")
    ).toDF("doc_id", "text")
    val out = Lines.dropBoilerplateLines(docs, "doc_id", "text", minDocs = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(out(1L) === ((3L, 2L, "unique alpha. more alpha text")))
    assert(out(2L) === ((3L, 2L, "beta content here. beta closing")))
    assert(out(3L) === ((2L, 1L, "gamma only")))
    assert(out(4L) === ((3L, 3L, "echo echo. echo echo. final thought")),
      "in-doc repetition is not boilerplate (df = 1 distinct doc)")
    assert(out(5L) === ((1L, 0L, "")),
      "fully-boilerplate doc survives with empty text for caller policy")
  }
}
