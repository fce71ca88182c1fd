package graft.functions

import graft.SparkSpec

/** ANN recall floor (BENCH `ann_recall` companion): the planted-
  * duplicate catalog queries prove the IVF / IVF-PQ pipelines are
  * exact on guaranteed-colliding vectors; this asserts APPROXIMATION
  * quality on the raw corpus, so an index or codebook regression that
  * keeps the planted gates green still fails a test. Measured
  * 0.85–0.98 at both gate SFs (round 11); floor set at 0.70 to absorb
  * k-means seed drift without admitting a real regression.
  */
class AnnRecallSpec extends SparkSpec {
  test("IVF and IVF-PQ recall@10 vs brute force holds the 0.70 floor " +
    "on the raw (unplanted) corpus") {
    val r = graft.operators.SimilarityQueries.annRecallAt10(spark, sf0001)
    assert(r("ivf") >= 0.70, s"ivf recall@10 = ${r("ivf")}")
    assert(r("ivfpq") >= 0.70, s"ivfpq recall@10 = ${r("ivfpq")}")
  }
}
