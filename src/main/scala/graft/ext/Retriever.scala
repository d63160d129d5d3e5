package graft.ext

import org.apache.spark.sql.DataFrame

/** Build/apply handle for the build-once operators ([[Similarity.srpRetriever]],
  * [[Ivf.ivfRetriever]], [[Dedup.nearDupFlagger]], ...): `apply` answers any
  * query/batch frame against the prebuilt corpus-side state, and `close`
  * releases whatever that state persisted — the lifecycle a long-lived
  * session (a streaming job that rebuilds its corpus version nightly) needs,
  * which a bare `DataFrame => DataFrame` cannot express. Extends the function
  * type, so existing call sites (`retrieve(batch)`) are unchanged. `close` is
  * idempotent; applying after close still works but recomputes the corpus
  * state per query batch.
  */
final class Retriever private[ext] (
    f: DataFrame => DataFrame,
    release: () => Unit = () => ()) extends (DataFrame => DataFrame) {
  def apply(queries: DataFrame): DataFrame = f(queries)

  /** Unpersist the corpus-side state this retriever built. */
  def close(): Unit = release()
}
