package graft.api

import org.apache.spark.sql.DataFrame

/** Pluggable text→vector model for [[VectorIndex]] — the seam a real
  * encoder drops into. The reference embeds with an e5-large
  * sentence-transformer pooler (/root/reference/QdrantCloud.py:20-22);
  * a Spark-native port of that model would implement this trait with a
  * broadcast weight matrix + `mapInPandas`/ONNX batch inference, and
  * every `VectorIndex` flow (fromTexts / searchText / upsertStream)
  * picks it up unchanged — corpus and query embeddings stay identical
  * by construction, which is the property retrieval quality depends
  * on.
  *
  * Contract: one output row per input doc — (doc_id, embedding
  * ARRAY<DOUBLE>) — deterministic for a fixed input (snapshot rebuilds
  * and streaming restarts re-embed; nondeterminism would fork the
  * collection).
  */
trait Embedder extends Serializable {
  def embed(docs: DataFrame): DataFrame
}

/** Default implementation: the deterministic 64-dim feature-hash
  * bag-of-words embedder (the container has no model weights — this
  * stand-in keeps every pipeline runnable and oracle-checkable).
  */
object FeatureHashEmbedder extends Embedder {
  override def embed(docs: DataFrame): DataFrame =
    graft.operators.VectorStore.embedDocs(docs)
}
