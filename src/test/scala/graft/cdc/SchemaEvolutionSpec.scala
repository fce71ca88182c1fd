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

  test("incompatible type change is a Conflict (DLQ-bound)") {
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

  private val numeric = StructType(Seq(
    StructField("id", IntegerType), StructField("x", FloatType)))

  test("lossless upcasts (int→long, float→double) widen the registry") {
    val incoming = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType)))
    SchemaEvolution.classify(numeric, incoming) match {
      case SchemaEvolution.Widening(w, nf) =>
        assert(w.map(c => (c._1, c._3)) ==
          Seq("id" -> LongType, "x" -> DoubleType))
        assert(nf.isEmpty)
      case other => fail(s"expected Widening, got $other")
    }
    val evolved = SchemaEvolution.evolve(numeric, incoming)
    assert(evolved("id").dataType == LongType)
    assert(evolved("x").dataType == DoubleType)
  }

  test("widening and additive fields arriving together evolve together") {
    val incoming = StructType(Seq(
      StructField("id", LongType), StructField("x", FloatType),
      StructField("w", StringType)))
    SchemaEvolution.classify(numeric, incoming) match {
      case SchemaEvolution.Widening(wd, nf) =>
        assert(wd.map(_._1) == Seq("id") && nf.map(_.name) == Seq("w"))
      case other => fail(s"expected Widening, got $other")
    }
    assert(SchemaEvolution.evolve(numeric, incoming).fieldNames.toSeq ==
      Seq("id", "x", "w"))
  }

  test("a NARROWER incoming type is no drift (merge upcasts the data); " +
    "cross-chain promotion (long→double) stays a Conflict") {
    val narrower = StructType(Seq(
      StructField("id", ShortType), StructField("x", FloatType)))
    assert(SchemaEvolution.classify(numeric, narrower) ==
      SchemaEvolution.NoDrift)
    val crossChain = StructType(Seq(
      StructField("id", DoubleType), StructField("x", FloatType)))
    SchemaEvolution.classify(numeric, crossChain) match {
      case SchemaEvolution.Conflict(cs) => assert(cs.map(_._1) == Seq("id"))
      case other => fail(s"expected Conflict, got $other")
    }
  }
}
