package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Session-keyed memo map that drops entries of STOPPED sessions on every
  * access — the same leak class [[FrameRegistry.sweepStopped]] closes for
  * the persisted-frame registry, generalized to the static
  * `computeIfAbsent` memos (signature frames, trained models, vocab
  * broadcasts, count scalars…) that previously pinned a stopped session
  * and its plans forever (spec suites restart sessions dozens of times
  * per JVM).
  *
  * Drop-in for the `ConcurrentHashMap` call sites: the key is a tuple
  * whose first element is the owning [[SparkSession]]; the sweep is a
  * map-sized scan of `isStopped` flags, no Spark work. Unpersisting the
  * dropped values is not this map's job — a stopped context has already
  * released its RDDs, and live-session persistence lifecycles belong to
  * [[FrameRegistry]].
  */
final class SessionMemo[K <: Product, V] {

  private val m = new ConcurrentHashMap[K, V]()

  private def sessionOf(k: K): SparkSession =
    k.productElement(0).asInstanceOf[SparkSession]

  def computeIfAbsent(k: K, f: K => V): V = {
    import scala.jdk.CollectionConverters._
    m.keySet.asScala.filter(sessionOf(_).sparkContext.isStopped)
      .foreach(m.remove)
    m.computeIfAbsent(k, k2 => f(k2))
  }
}
