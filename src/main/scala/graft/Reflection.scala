package graft

import scala.reflect.ClassTag

/** Shared reflective plug-in resolution for the engine's two client
  * seams — the source-side [[graft.sources.TagReaderProvider]] and the
  * sink-side [[graft.streaming.KeyValueStoreProvider]]. One
  * implementation so classloader or error-reporting fixes apply to both.
  */
private[graft] object Reflection {

  /** Instantiate `className` and cast to T. Used at query/sink
    * construction for fail-fast validation and again per partition on
    * executors. Requires a public no-arg constructor.
    */
  def resolveInstance[T](label: String, className: String)(implicit ct: ClassTag[T]): T =
    try ct.runtimeClass.cast(
      Class.forName(className).getDeclaredConstructor().newInstance()
    ).asInstanceOf[T]
    catch {
      case e: ClassCastException => throw new IllegalArgumentException(
        s"$label '$className' does not implement ${ct.runtimeClass.getSimpleName}", e)
      case e: ReflectiveOperationException => throw new IllegalArgumentException(
        s"$label '$className' cannot be instantiated (need a public " +
          "no-arg constructor on the classpath)", e)
    }
}
