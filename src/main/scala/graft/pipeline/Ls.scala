package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Inventory

/** `ufload ls` (main.py:481-509): the canonical read-only query — newest
  * backup per instance from the cloud inventory, optionally filtered by
  * include/exclude wildcards.
  */
object Ls {
  def run(inventory: DataFrame, include: Seq[String] = Nil,
          exclude: Seq[String] = Nil): DataFrame =
    Inventory.latestPerInstance(
        Inventory.filterInstances(inventory, include, exclude))
      .select(col("instance"), col("file"), col("url"), col("modified"))
      .orderBy("instance")
}
