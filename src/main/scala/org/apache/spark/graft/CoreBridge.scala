package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Core-side twin of [[org.apache.spark.sql.graft.Bridge]]: the raw
  * checkpoint-dir accessors. `SparkContext.setCheckpointDir` APPENDS a
  * fresh UUID segment on every call, so save/restore through the public
  * API is impossible — "restoring" a previously-resolved path would nest
  * it one level deeper. The `private[spark]` var is the only exact way.
  */
object CoreBridge {
  def getCheckpointDirRaw(sc: SparkContext): Option[String] = sc.checkpointDir
  def setCheckpointDirRaw(sc: SparkContext, dir: Option[String]): Unit =
    sc.checkpointDir = dir
}
