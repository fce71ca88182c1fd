package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Caching.persistOnce

/** Deduplication primitives for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard. All distributed, no
  * driver-side state:
  *
  *   - exact dedup = hash-groupBy (one shuffle keyed by content hash);
  *   - MinHash signatures are per-row Column algebra; LSH banding turns
  *     near-dup search into an equi-join on band keys — the only way
  *     all-pairs similarity survives 100 TB (candidate pairs ∝ bucket
  *     collisions, not n²);
  *   - SimHash packs a 64-bit signature per row; near-dups differ in
  *     few bits (checked per candidate pair, never all-pairs).
  */
object DedupFunctions {

  /** Deterministic 64-bit hash of a string with a seed — xxhash64 is a
    * Spark built-in Catalyst expression (codegen'd). */
  def h64(c: Column, seed: Int): Column = xxhash64(lit(seed), c)

  /** MinHash signature: for each of k hash families, the minimum hash
    * over the document's shingle set. Pure array algebra per row.
    * Prefer [[minhashSignatures]] for bulk work — this per-row form
    * re-hashes the shingle array once per seed. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shingles, sh => h64(sh, seed)))
    }: _*)

  /** Bulk MinHash: explode shingles once, hash-aggregate k mins per doc.
    * One shuffle keyed by doc id; every hash computed exactly once in
    * whole-stage-codegen'd aggregation — the 100 TB-shaped formulation. */
  def minhashSignatures(docs: DataFrame, idCol: String, shingleCol: String,
                        k: Int): DataFrame = {
    val exploded = docs.select(col(idCol), explode(col(shingleCol)).as("_sh"))
    val aggs = (0 until k).map(seed => min(h64(col("_sh"), seed)).as(s"_mh$seed"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"_mh$i")): _*).as("sig"))
  }

  /** Bulk SimHash: per-row [[simhash]] over the shingle array — ZERO
    * shuffle (narrow map), unlike the earlier explode + 64-vote-sum
    * hash-agg formulation whose shuffle volume was ∝ total shingles.
    * Per-row is the 100 TB shape: signatures pipeline straight into the
    * block/band join with no exchange of their own. Docs with an empty
    * shingle array carry no signal and are dropped (the explode form
    * dropped them implicitly). */
  def simhashSignatures(docs: DataFrame, idCol: String, shingleCol: String): DataFrame =
    docs.filter(size(col(shingleCol)) > 0)
      .select(col(idCol), simhash(col(shingleCol)).as("sig"))

  /** LSH band keys: split the k-length signature into `bands` bands of
    * `rowsPerBand`, hash each band. Two docs sharing ANY band key are
    * candidates. Returns array<struct<band:int, key:long>>. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand)).as("key"))
    }: _*)

  /** SimHash over a shingle array: 64-bit signature whose bit i is set
    * iff more shingle-hashes have bit i set than clear (the sign of the
    * +1/-1 vote sum). Single pass: one xxhash64 per shingle, the 64 vote
    * counters fold through one `aggregate` — hashes are NOT recomputed
    * per bit, and nothing here shuffles (narrow per-row algebra).
    */
  def simhash(shingles: Column): Column = {
    val bitIdx = sequence(lit(0), lit(63))
    val votes = aggregate(
      transform(shingles, sh => xxhash64(sh)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitIdx, (a, i) =>
        a + when(getbit(h, i) === 1, 1L).otherwise(-1L)))
    // majority vote per bit; distinct powers of two sum to the packed
    // signature (bit 63 wraps to Long.MinValue — still the right bit)
    aggregate(
      zip_with(votes, bitIdx, (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Block keys for SimHash candidate generation: the 64-bit signature
    * split into `nBlocks` equal bit-blocks, each a (block, bits) key.
    * By pigeonhole, two signatures within hamming distance `nBlocks - 1`
    * agree on at least one full block — so joining on ANY shared block
    * key GUARANTEES recall for hamming <= nBlocks-1 (and finds most
    * looser pairs too), unlike a single fixed top-k-bit block which can
    * miss a pair whose differing bits happen to fall there. Join cost
    * scales linearly in nBlocks, never quadratically in rows. */
  def simhashBlockKeys(sig: Column, nBlocks: Int = 4): Column = {
    require(64 % nBlocks == 0, s"nBlocks must divide 64, got $nBlocks")
    val width = 64 / nBlocks
    val mask = if (width == 64) -1L else (1L << width) - 1L
    array((0 until nBlocks).map { i =>
      struct(lit(i).as("block"),
        shiftrightunsigned(sig, i * width).bitwiseAND(lit(mask)).as("bits"))
    }: _*)
  }

  /** Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b))

  /** Exact-duplicate groups by content hash: one representative
    * (min doc_id) per group plus the duplicate count. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Connected components over near-dup candidate pairs by hash-to-min
    * label propagation: every node repeatedly adopts the minimum label
    * in its neighborhood (including its own) until fixpoint — the
    * standard distributed CC pattern (one join + one agg per round,
    * rounds ≈ component diameter, which for dedup graphs is tiny).
    * Driver-side work per round is ONE count (the convergence check);
    * labels never leave the cluster.
    *
    * Input: pairs (a, b); output: (node, component) where component is
    * the minimum node id reachable — the canonical document id a dedup
    * pipeline keeps.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a",
                          bCol: String = "b", maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // undirected edge list, both directions
    val edges = persistOnce(pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct())
    var labels = edges.select(col("src").as("node"))
      .distinct().withColumn("component", col("node"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor-min pass: each node's new label = min(own, neighbors')
      val next = persistOnce(edges
        .join(labels.withColumnRenamed("node", "dst2"),
          col("dst") === col("dst2"))
        .groupBy(col("src").as("node"))
        .agg(min(col("component")).as("nbrMin"))
        .join(labels, "node")
        .select(col("node"),
          least(col("component"), col("nbrMin")).as("component")))
      val changed = next.alias("n").join(labels.alias("o"), "node")
        .filter(col("n.component") =!= col("o.component")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // fail loudly rather than return partially-propagated labels — a
    // silent miss here would elect multiple "canonical" docs for one
    // duplicate cluster with no signal; raise maxIter for graphs of
    // larger diameter
    if (!converged) sys.error(
      s"connectedComponents did not converge within $maxIter rounds " +
        "(component diameter exceeds maxIter)")
    labels
  }

  /** MinHash-LSH candidate pairs: explode band keys, self-join on
    * (band, key), emit (a, b) with a < b. The join is the scale path —
    * shuffle is keyed by band hash, so work ∝ collisions. */
  def lshCandidatePairs(docs: DataFrame, idCol: String, shingleCol: String,
                        k: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = k / bands
    // persist: both sides of the self-join read the same signatures —
    // without it the explode+agg subplan runs twice
    val sigs = minhashSignatures(docs, idCol, shingleCol, k)
      .select(col(idCol).as("doc"), col("sig"))
    val keys = persistOnce(sigs.select(col("doc"),
      explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key")))
    keys.as("l").join(keys.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("a"), col("r.doc").as("b"))
      .distinct()
  }

  /** Winnowing fingerprint selection (Schleimer-Wilkerson-Aiken,
    * SIGMOD 2003): hash every k-word-shingle, slide a w-window over
    * the hash sequence, keep each window's RIGHTMOST MINIMUM — one
    * per-document window min over a packed (40-bit hash)·2²³ +
    * (2²³−1−min(pos, 2²³−1)) long (min hash; position ties resolve to
    * the larger pos), so selection is integer arithmetic with no
    * struct ordering. The position term is CLAMPED at 2²³−1 so the
    * packing can never underflow on book-length documents: past 8.4M
    * shingles the rightmost-tie refinement degrades to an arbitrary-
    * but-deterministic tie (equal packed values), while the SELECTED
    * HASH — the only thing extracted and matched on — stays exact at
    * any document length. Density ~2/(w+1) of all shingles; any
    * common token run of length ≥ w+k−1 is GUARANTEED to contribute
    * at least one shared selected hash (`WinnowingSpec` checks the
    * guarantee on randomized planted overlaps). Documents shorter
    * than w shingles yield no fingerprints. Returns distinct
    * (`idCol`, h). */
  def winnowedFingerprints(docs: DataFrame, idCol: String,
                           textCol: String, k: Int = 5,
                           w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs
      .select(col(idCol),
        posexplode(graft.functions.TextFunctions
          .wordShingles(col(textCol), k)))
      .select(col(idCol), (col("pos") + 1).as("pos"),
        (conv(substring(md5(col("col")), 1, 10), 16, 10).cast("long") *
          8388608L +
          (lit(8388607L) - least(col("pos") + 1, lit(8388607L))))
          .as("packed"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    sh.withColumn("sel", min(col("packed")).over(win))
      .filter(col("pos") >= w)
      .select(col(idCol), expr("sel DIV 8388608").as("h"))
      .distinct()
  }
}
