package graft.ext

import org.apache.spark.sql.DataFrame

/** Forwarder exposing `private[ext]` internals to specs in other test
  * packages (PinSpec runs the CC engine under both pin modes).
  */
object ExtTestAccess {
  def connectedComponents(pairs: DataFrame): DataFrame =
    Dedup.connectedComponents(pairs)
}
