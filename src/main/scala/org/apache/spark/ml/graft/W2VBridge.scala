package org.apache.spark.ml.graft

import org.apache.spark.ml.feature.Word2VecModel
import org.apache.spark.mllib.feature.{Word2VecModel => OldWord2VecModel}

/** private[ml] shim: assemble an `ml.feature.Word2VecModel` from a raw
  * (word → float vector) table. The mllib map constructor is public;
  * only the ml wrapper's constructor and the vectorSize param setter
  * are ml-private/protected, hence this subclass in the ml package
  * (the [[org.apache.spark.sql.graft]] BloomBridge discipline on the
  * ML axis). Going through the REAL model class means a table-loaded
  * embedder serves through the exact same transform code (sum of
  * in-vocab word vectors ÷ total token count) as a freshly-trained
  * one — identical results by construction, not by reimplementation.
  */
object W2VBridge {

  private final class TableModel(old: OldWord2VecModel, dim: Int)
      extends Word2VecModel("graft_w2v_table", old) {
    set(vectorSize, dim)
    setInputCol("__words")
    setOutputCol("__vec")
  }

  def model(vectors: Map[String, Array[Float]], dim: Int): Word2VecModel =
    new TableModel(new OldWord2VecModel(vectors), dim)
}
