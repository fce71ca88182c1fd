package graft.cdc

import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType,
  IntegerType, LongType, ShortType, StructField, StructType}

/** Schema-drift handling (SURVEY §1.3): the reference's sink evolves
  * destination tables automatically but only additively, and never
  * creates them (auto.evolve=true / auto.create=false,
  * register-postgres-sink.json:13-14). We mirror that with a per-table
  * registered schema + drift classification: additive fields widen the
  * mirror (backfilled null), SAFE type promotions widen the column
  * (the JDBC sink's ALTER COLUMN TYPE for compatible upcasts — an
  * upstream `INT` → `BIGINT` migration must not poison every record),
  * and genuinely conflicting types are non-additive — the records
  * routing to them belong in the DLQ.
  */
object SchemaEvolution {

  sealed trait Drift
  case object NoDrift extends Drift
  /** New nullable columns to add (ALTER TABLE ADD COLUMN equivalent). */
  final case class Additive(newFields: Seq[StructField]) extends Drift
  /** Safe column widenings (registered → wider incoming type), plus any
    * simultaneous additive fields (one upstream ALTER often ships
    * both). Lossless promotions only — the mirror re-reads old data at
    * the wider type, nothing is rewritten. */
  final case class Widening(widened: Seq[(String, DataType, DataType)],
                            newFields: Seq[StructField]) extends Drift
  /** Type conflicts — not auto-evolvable; poison for the DLQ. */
  final case class Conflict(conflicts: Seq[(String, DataType, DataType)]) extends Drift

  private val integralRank: Map[DataType, Int] =
    Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)

  /** Lossless promotion lattice: byte < short < int < long on the
    * integral chain, float < double on the floating chain. Nothing
    * cross-chain (long→double drops precision past 2^53) and nothing
    * narrowing. */
  def widensTo(from: DataType, to: DataType): Boolean =
    (integralRank.get(from), integralRank.get(to)) match {
      case (Some(f), Some(t)) => f < t
      case _ => from == FloatType && to == DoubleType
    }

  def classify(registered: StructType, incoming: StructType): Drift = {
    val reg = registered.fields.map(f => f.name -> f.dataType).toMap
    val differing = incoming.fields.toSeq.flatMap { f =>
      reg.get(f.name) match {
        case Some(t) if t != f.dataType => Some((f.name, t, f.dataType))
        case _ => None
      }
    }
    // incoming NARROWER than registered is not drift at all: the merge
    // upcasts those values into the registered type losslessly
    val (widened, conflicts) = differing
      .filterNot { case (_, t, inc) => widensTo(inc, t) }
      .partition { case (_, t, inc) => widensTo(t, inc) }
    if (conflicts.nonEmpty) Conflict(conflicts)
    else {
      val newFields = incoming.fields.toSeq.filterNot(f => reg.contains(f.name))
        .map(_.copy(nullable = true))
      if (widened.nonEmpty) Widening(widened, newFields)
      else if (newFields.nonEmpty) Additive(newFields)
      else NoDrift
    }
  }

  /** Evolve a registered schema by the additive fields and safe
    * widenings of `incoming`. */
  def evolve(registered: StructType, incoming: StructType): StructType =
    classify(registered, incoming) match {
      case Additive(newFields) => StructType(registered.fields ++ newFields)
      case Widening(widened, newFields) =>
        val wider = widened.map { case (n, _, to) => n -> to }.toMap
        StructType(registered.fields.map(f =>
          wider.get(f.name).fold(f)(t => f.copy(dataType = t))) ++ newFields)
      case _ => registered
    }
}
