package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for per-corpus-snapshot INDEX/MODEL state
  * (signature tables, centroids, pair lists, trained embedders…): the
  * one materialize-once-consume-many discipline every operator family
  * here relies on, extracted so each family stops hand-rolling it.
  *
  * Keys are `(stable session id, dataset dir, K)`:
  *   - The session id is the engine's own `sessionUUID` (random UUID,
  *     collision-free) — NOT `System.identityHashCode`, whose value can
  *     be reused after a session is GC'd and then serve a DataFrame
  *     bound to a stopped session.
  *   - The dataset dir is split out of K so a rewritten snapshot can be
  *     dropped across every memo with one [[SessionMemo.invalidatePath]]
  *     call (the cache-coherence story a long-lived session needs).
  *
  * `onEvict` releases executor-side storage (unpersist) when an entry
  * is dropped — without it, invalidation would leak the cached blocks
  * the memo pinned.
  */
private[graft] final class SessionMemo[K, V](onEvict: V => Unit = (_: V) => ()) {
  // values sit behind once-only holders: when two threads race a cold
  // key, exactly ONE build thunk runs (the putIfAbsent winner's, under
  // the holder's lazy-val lock) — a naive getOrElseUpdate would run
  // both builds and silently drop the loser's cached blocks WITHOUT
  // unpersist, the leak class this memo exists to prevent
  private final class Holder(f: () => V) {
    @volatile private[SessionMemo] var evaluated = false
    @volatile private[SessionMemo] var dropped = false
    @volatile private[SessionMemo] var evicted = false
    lazy val value: V = { val v = f(); evaluated = true; v }
  }

  // eviction is CONSUMED under the holder lock, so a drop() landing
  // between build completion and getOrElseUpdate's post-check cannot
  // double-fire onEvict (both sides used to run it — harmless for
  // idempotent unpersist/dir-delete callbacks, wrong the day a
  // non-idempotent one is registered). The lazy-val initializer runs
  // under the same monitor, so this also waits out an in-flight build.
  private def evictOnce(h: Holder): Unit = h.synchronized {
    if (h.evaluated && !h.evicted) {
      h.evicted = true
      try onEvict(h.value)
      catch { case _: Exception => () } // a stopped session can't unpersist
    }
  }
  private val m =
    scala.collection.concurrent.TrieMap.empty[(String, String, K), Holder]
  SessionMemo.register(this)

  def getOrElseUpdate(s: SparkSession, dir: String, k: K)(v: => V): V = {
    val key = (SessionMemo.sessionKey(s), dir, k)
    val holder = m.get(key).getOrElse {
      val fresh = new Holder(() => v)
      m.putIfAbsent(key, fresh).getOrElse(fresh)
    }
    val built = holder.value
    // a drop() that raced this build saw evaluated=false and could not
    // evict a value that didn't exist yet — it left dropped=true
    // instead, and the build side releases its own blocks here (the
    // caller's value stays usable: unpersist only uncaches, lineage
    // recomputes on next use). evictOnce makes this a no-op when the
    // drop side already evicted.
    if (holder.dropped) evictOnce(holder)
    built
  }

  private[graft] def invalidateSession(uuid: String): Unit =
    m.keys.iterator.filter(_._1 == uuid).foreach(drop)

  private[graft] def invalidatePath(dir: String): Unit =
    m.keys.iterator.filter(_._2 == dir).foreach(drop)

  private[graft] def clear(): Unit = m.keys.iterator.foreach(drop)

  private[graft] def size: Int = m.size

  private def drop(key: (String, String, K)): Unit =
    m.remove(key).foreach { h =>
      // evictOnce acquires the holder's monitor (the lazy-val
      // initializer's lock), so it WAITS OUT an in-flight build and
      // evicts a completed one exactly once. A build that starts
      // strictly after the lock releases observes dropped=true and
      // self-evicts in getOrElseUpdate (also through evictOnce) —
      // either way, no cached blocks survive the drop unreleased, and
      // onEvict fires at most once per value.
      h.dropped = true
      evictOnce(h) // no-op on an unbuilt (and un-started) holder
    }
}

private[graft] object SessionMemo {
  private val all =
    new java.util.concurrent.CopyOnWriteArrayList[SessionMemo[_, _]]()
  private def register(memo: SessionMemo[_, _]): Unit = all.add(memo)

  // Stable random id per live session, weakly keyed on the session
  // OBJECT: identity semantics while the session lives, and a GC'd
  // session's mapping vanishes so a fresh session can NEVER inherit its
  // entries (the identityHashCode-reuse hazard this replaces). The
  // engine's own sessionUUID is package-private, hence this twin.
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private[graft] def sessionKey(s: SparkSession): String =
    ids.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  /** Drop every memo entry bound to `s` — call when a session stops. */
  def invalidate(s: SparkSession): Unit =
    all.forEach(_.invalidateSession(sessionKey(s)))

  /** Drop every memo entry derived from data under `dir` — call after
    * rewriting a dataset snapshot in place.
    */
  def invalidatePath(dir: String): Unit = all.forEach(_.invalidatePath(dir))

  def clearAll(): Unit = all.forEach(_.clear())
}
