package graft.cdc

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaEvolutionSpec extends AnyFunSuite {
  private val base = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("identical schema is NoDrift") {
    assert(SchemaEvolution.classify(base, base) == SchemaEvolution.NoDrift)
  }

  test("new column is Additive and evolves the registry") {
    val incoming = StructType(base.fields :+ StructField("w", DoubleType))
    SchemaEvolution.classify(base, incoming) match {
      case SchemaEvolution.Additive(nf) => assert(nf.map(_.name) == Seq("w"))
      case other => fail(s"expected Additive, got $other")
    }
    assert(SchemaEvolution.evolve(base, incoming).fieldNames.toSeq ==
      Seq("id", "v", "w"))
  }

  test("type change is a Conflict (DLQ-bound)") {
    val incoming = StructType(Seq(
      StructField("id", LongType), StructField("v", IntegerType)))
    SchemaEvolution.classify(base, incoming) match {
      case SchemaEvolution.Conflict(cs) =>
        assert(cs.map(_._1) == Seq("v"))
      case other => fail(s"expected Conflict, got $other")
    }
    // conflicts never silently evolve
    assert(SchemaEvolution.evolve(base, incoming) == base)
  }
}
