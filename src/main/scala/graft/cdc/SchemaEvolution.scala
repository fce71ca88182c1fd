package graft.cdc

import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Schema-drift handling (SURVEY §1.3): the reference's sink evolves
  * destination tables automatically but only additively, and never
  * creates them (auto.evolve=true / auto.create=false,
  * register-postgres-sink.json:13-14). We mirror that with a per-table
  * registered schema + drift classification: additive fields widen the
  * mirror (backfilled null), conflicting fields are non-additive and the
  * records routing to them belong in the DLQ.
  */
object SchemaEvolution {

  sealed trait Drift
  case object NoDrift extends Drift
  /** New nullable columns to add (ALTER TABLE ADD COLUMN equivalent). */
  final case class Additive(newFields: Seq[StructField]) extends Drift
  /** Type conflicts — not auto-evolvable; poison for the DLQ. */
  final case class Conflict(conflicts: Seq[(String, DataType, DataType)]) extends Drift

  def classify(registered: StructType, incoming: StructType): Drift = {
    val reg = registered.fields.map(f => f.name -> f.dataType).toMap
    val conflicts = incoming.fields.toSeq.flatMap { f =>
      reg.get(f.name) match {
        case Some(t) if t != f.dataType => Some((f.name, t, f.dataType))
        case _ => None
      }
    }
    if (conflicts.nonEmpty) Conflict(conflicts)
    else {
      val newFields = incoming.fields.toSeq.filterNot(f => reg.contains(f.name))
        .map(_.copy(nullable = true))
      if (newFields.isEmpty) NoDrift else Additive(newFields)
    }
  }

  /** Evolve a registered schema by the additive fields of `incoming`. */
  def evolve(registered: StructType, incoming: StructType): StructType =
    classify(registered, incoming) match {
      case Additive(newFields) => StructType(registered.fields ++ newFields)
      case _ => registered
    }
}
