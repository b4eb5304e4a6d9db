package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators: the same
  * logical computations (hourly windowed aggregation, gap-based
  * sessionization) expressed over an unbounded stream.
  *
  * At 100 TB/day these run with `readStream` over a partitioned event
  * log; watermarks bound state, and the stateful sessionizer keys by
  * user so state shards across executors.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
                     n_events: Long, sum_value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)

  /** Event-time hourly windowed aggregation with a 2-hour watermark —
    * the streaming twin of Relational.eventsHourly. Late data beyond the
    * watermark is dropped; state is bounded to ~2h of windows.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  private val GapMs = 30 * 60 * 1000L

  /** Gap-based sessionization via flatMapGroupsWithState: sessions close
    * when a subsequent event arrives more than 30 min later (the batch
    * twin is Relational.eventsSessionize). State per user is one open
    * session — O(users) not O(events).
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          for (e <- sorted) {
            val t = e.ts.getTime
            cur match {
              case Some(st) if t - st.end <= GapMs =>
                cur = Some(SessionState(st.start, t, st.n + 1, st.sum + e.value))
              case Some(st) =>
                closed += Session(user, new java.sql.Timestamp(st.start),
                  new java.sql.Timestamp(st.end), st.n, st.sum)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** Streaming top-k-per-tenant vector search: a stream of query vectors
    * joined against a static corpus — the streaming face of
    * VectorStore.searchBatch (stream-static joins need no state).
    */
  def streamingSearch(queryStream: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import graft.functions.Vectors._
    // stream-static equi-join on tenant, then per-micro-batch rank via
    // groupBy collect of the k smallest (aggregate is allowed on streams)
    queryStream.join(corpus, queryStream("quser") === corpus("user_id"))
      .withColumn("score", l2Distance(col("qvec"), col("vector")))
      .groupBy(col("query_id"))
      .agg(slice(array_sort(collect_list(struct(col("score"), col("id")))), 1, k).as("topk"))
  }
}
