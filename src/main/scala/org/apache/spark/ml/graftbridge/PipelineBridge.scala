package org.apache.spark.ml.graftbridge

import org.apache.spark.ml.{PipelineModel, Transformer}

/** `PipelineModel`'s constructor is `private[ml]`; graft's stage-wise
  * pipeline fit (one shared cache across the CountVectorizer and IDF fit
  * passes — `graft.ml.Models.fitTfidf`) assembles the exact same model the
  * stock `Pipeline.fit` would return, so it needs one public door. */
object PipelineBridge {
  def assemble(uid: String, stages: Array[Transformer]): PipelineModel =
    new PipelineModel(uid, stages)
}
