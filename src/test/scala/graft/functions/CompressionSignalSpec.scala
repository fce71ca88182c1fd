package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompressionSignalSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: repetitive text compresses far below natural-ish text, " +
    "and the size is a valid DEFLATE stream's") {
    val rep = ("lorem ipsum " * 64).trim
    val nat = (1 to 128).map(i => s"w${i * 2654435761L % 97}").mkString(" ")
    val repSize = CompressionSignal.deflateSize(rep.getBytes("UTF-8"))
    val natSize = CompressionSignal.deflateSize(nat.getBytes("UTF-8"))
    assert(repSize.toDouble / rep.getBytes("UTF-8").length < 0.15)
    assert(natSize.toDouble / nat.getBytes("UTF-8").length >
      repSize.toDouble / rep.getBytes("UTF-8").length)
    // round-trip: the counted bytes ARE a decompressable stream of the
    // original (re-run deflate into a real buffer, inflate, compare)
    val d = new java.util.zip.Deflater(6)
    d.setInput(rep.getBytes("UTF-8")); d.finish()
    val out = new Array[Byte](repSize)
    assert(d.deflate(out) == repSize && d.finished()); d.end()
    val inf = new java.util.zip.Inflater()
    inf.setInput(out)
    val back = new Array[Byte](rep.getBytes("UTF-8").length)
    assert(inf.inflate(back) == back.length)
    assert(new String(back, "UTF-8") == rep)
  }

  test("kernel edge cases: empty and tiny inputs produce the fixed " +
    "zlib overhead, deterministically") {
    val e1 = CompressionSignal.deflateSize(Array.emptyByteArray)
    assert(e1 == CompressionSignal.deflateSize(Array.emptyByteArray))
    assert(e1 > 0 && e1 <= 16)
    assert(CompressionSignal.deflateSize("a".getBytes) > 0)
  }

  test("expression: Column API, SQL surface, codegen and interpreted " +
    "paths all agree; nulls propagate") {
    val df = Seq(
      (1L, ("ab " * 100).trim),
      (2L, (1 to 100).map(i => (i * 37 % 89).toString).mkString(" ")),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val viaColumn = df.select(col("id"),
      CompressionSignal.deflateSize(col("text")).as("sz"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("csig_t")
    val viaSql = spark.sql(
      "SELECT id, deflate_size(text) AS sz FROM csig_t")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(viaColumn == viaSql)
    assert(viaColumn(3L) == -1, "null input must yield null")
    val expected = df.collect().filter(!_.isNullAt(1)).map(r =>
      r.getLong(0) ->
        CompressionSignal.deflateSize(r.getString(1).getBytes("UTF-8")))
    expected.foreach { case (id, sz) => assert(viaColumn(id) == sz) }
  }
}
