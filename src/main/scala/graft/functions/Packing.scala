package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Greedy first-fit-sequential sequence packing: assign documents, in
  * id order within each group, to context-window bins of `ctx` tokens —
  * the standard pre-training step that concatenates short documents
  * into fixed-length training sequences without splitting any document
  * (a document longer than `ctx` gets a bin of its own).
  *
  * Packing is inherently sequential per group (bin assignment depends
  * on every previous document's length), so this is one of the rare
  * operators where typed `mapPartitions` beats Column algebra: rows are
  * hash-partitioned by group and sorted `(group, id)` within each
  * partition, then a single forward scan assigns bins with O(1) state
  * (current bin + fill). No driver collect; state never exceeds two
  * longs per task.
  *
  * Scale note (100 TB): one task per group is the correctness-preserving
  * layout; when single groups outgrow a task, shard each group by an
  * id-range salt (bins then don't cross shard boundaries — hierarchical
  * packing) at a cost of at most one underfilled bin per shard.
  */
object Packing {

  private[graft] final case class DocLen(grp: String, id: Long, n: Long)
  final case class Packed(doc_id: Long, lang: String, bin_id: Long,
                          fill_after: Long)

  def packGreedy(docs: DataFrame, groupCol: String, idCol: String,
                 nTokensCol: String, ctx: Long): Dataset[Packed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).as("grp"), col(idCol).cast("long").as("id"),
        col(nTokensCol).cast("long").as("n"))
      .repartition(col("grp"))
      .sortWithinPartitions("grp", "id")
      .as[DocLen]
      .mapPartitions { it =>
        // per-partition scan; groups are contiguous after the sort, so
        // the accumulator resets on every group boundary
        var grp: String = null
        var bin = -1L
        var fill = Long.MaxValue / 2 // forces a fresh bin on first doc
        it.map { r =>
          if (r.grp != grp) { grp = r.grp; bin = -1L; fill = Long.MaxValue / 2 }
          if (fill + r.n > ctx) { bin += 1; fill = 0L }
          fill += r.n
          Packed(r.id, r.grp, bin, fill)
        }
      }
  }
}
