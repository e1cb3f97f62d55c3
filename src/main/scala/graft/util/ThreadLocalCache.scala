package graft.util

/**
 * Serializable per-thread cache: the init closure (typically deserializing a
 * broadcast payload into non-thread-safe objects like JTS prepared
 * geometries or STRtrees) runs at most once per executor thread; the
 * ThreadLocal itself is rebuilt after deserialization (@transient lazy).
 */
class ThreadLocalCache[T](init: () => T) extends Serializable {
  @transient private lazy val tl: ThreadLocal[T] =
    ThreadLocal.withInitial(() => init())
  def get: T = tl.get()
}
