package graft.operators

import org.apache.spark.sql.functions._

import graft.core.Caching.persistOnce
import graft.core.Tables.load
import graft.functions.ZOrder

/** Data-layout operators (100 TB extension surface): Morton/Z-order
  * cluster keys for multi-dimensional file clustering. The catalog
  * query checks the interleave kernel value-for-value against a
  * bit-by-bit DuckDB oracle; `ZOrderSpec` checks the physical payoff
  * (per-file min/max spans shrink on BOTH dimensions vs a hash
  * layout). `Layout.zorderWrite` is the write-side entry point. */
object LayoutQueries {

  /** Z-ordered copy of the (a, b) lineitem projection plus its
    * [[graft.functions.StatsIndex]] sidecar, built once per (session,
    * sfDir) as an offline artifact (the ANN-index pattern — the catalog
    * query times the READ path, not layout construction). */
  private val clustered = new graft.core.SessionMemo[String, String]
  private def clusteredDir(s: org.apache.spark.sql.SparkSession,
                           d: String): String =
    clustered.getOrElseUpdate(s, d) {
      val dir = java.nio.file.Files.createTempDirectory("graft-layout")
        .toString + "/li"
      graft.functions.Layout.zorderWrite(
        load(s, d, "lineitem").select(
          col("l_orderkey").bitwiseAND(65535).as("a"),
          col("l_partkey").bitwiseAND(65535).as("b")),
        "a", "b", dir, nFiles = 16)
      graft.functions.StatsIndex.build(s, dir, Seq("a", "b"))
      dir
    }

  /** Month-partitioned copy of orders (Hive-style directory layout),
    * built once per (session, sfDir) — the partition-pruning sibling of
    * [[clusteredDir]]. */
  private val partitioned = new graft.core.SessionMemo[String, String]
  private def partitionedDir(s: org.apache.spark.sql.SparkSession,
                             d: String): String =
    partitioned.getOrElseUpdate(s, d) {
      val dir = java.nio.file.Files.createTempDirectory("graft-layout")
        .toString + "/orders"
      load(s, d, "orders")
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .write.partitionBy("o_month").parquet(dir)
      dir
    }

  /** Arrival-ordered (UNclustered) lineitem projection plus its
    * [[graft.functions.BloomIndex]] sidecar — the layout where min/max
    * envelopes span the whole key domain and only bloom bits prune. */
  private val scattered = new graft.core.SessionMemo[String, String]
  private def scatteredDir(s: org.apache.spark.sql.SparkSession,
                           d: String): String =
    scattered.getOrElseUpdate(s, d) {
      val dir = java.nio.file.Files.createTempDirectory("graft-layout")
        .toString + "/li_scatter"
      load(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity"))
        .repartition(8).write.parquet(dir)
      graft.functions.BloomIndex.build(s, dir, "l_orderkey",
        expectedPerFile = 500000L)
      dir
    }

  private val minKeys = new graft.core.SessionMemo[String, Long]
  private def minOrderKey(s: org.apache.spark.sql.SparkSession,
                          d: String): Long =
    minKeys.getOrElseUpdate(s, d) {
      load(s, d, "lineitem").agg(min(col("l_orderkey"))).head().getLong(0)
    }

  def queries: Seq[Q] = Seq(
    // File-level BLOOM skipping through the oracle gate: a point
    // lookup on an arrival-ordered layout, where every file's min/max
    // envelope covers the whole key domain (the case StatsIndex can't
    // prune — BloomIndexSpec proves envelope pruning opens ALL files
    // there while bloom opens a strict subset). Probing is a driver
    // loop over O(#files) sidecar rows; survivors re-apply the exact
    // equality, so the rollup must equal DuckDB's flat scan.
    Q("layout_bloom_pruned",
      (s, d) => graft.functions.BloomIndex.prunedEqRead(
          s, scatteredDir(s, d), "l_orderkey", lit(minOrderKey(s, d)))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(round(col("l_quantity") * 100).cast("long")), lit(0L))
            .as("qty_cents")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(coalesce(sum(CAST(round(l_quantity * 100) AS BIGINT)), 0)
             |    AS BIGINT) AS qty_cents
             |FROM lineitem
             |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)"""
        .stripMargin),
      "file-level bloom skipping: point lookup on an unclustered " +
        "layout opens only bloom-admitted files, rollup bit-identical " +
        "to the flat scan"),

    // Hive-style partition pruning exercised through the oracle gate:
    // the month filter must resolve at PLANNING time against the
    // directory structure (PartitionFilters in the scan node — pinned
    // by PlanAuditSpec), so a month query opens one partition's files
    // no matter how many months exist. The exact-cents rollup must
    // equal DuckDB's direct scan of the unpartitioned table.
    Q("layout_partition_pruned",
      (s, d) => s.read.parquet(partitionedDir(s, d))
        .filter(col("o_month") === "1996-03")
        .agg(count(lit(1)).as("n"),
          coalesce(sum(round(col("o_totalprice") * 100).cast("long")), lit(0L))
            .as("total_cents")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
             |    AS BIGINT) AS total_cents
             |FROM orders
             |WHERE strftime(o_orderdate, '%Y-%m') = '1996-03'"""
        .stripMargin),
      "Hive-style month partitioning: the filter prunes at planning " +
        "time (PartitionFilters), rollup bit-identical to the flat scan"),

    // The skipping index exercised END-TO-END through the oracle gate:
    // a z-clustered layout + O(#files) min/max sidecar serve a box
    // query via prunedRead (metadata prune -> open survivors -> exact
    // re-filter). The result must be BIT-IDENTICAL to DuckDB's direct
    // scan of the same projection — pruning may only skip files that
    // provably contain no match. Effectiveness (fewer files opened) is
    // pinned by StatsIndexSpec/ZOrderSpec; this query pins end-to-end
    // correctness of build -> sidecar -> prune -> read on real data.
    Q("layout_stats_pruned",
      (s, d) => graft.functions.StatsIndex.prunedRead(s, clusteredDir(s, d),
          Seq[(String, Any, Any)](("a", 100L, 300L), ("b", 100L, 300L)))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("a")), lit(0L)).as("sum_a"),
          coalesce(sum(col("b")), lit(0L)).as("sum_b")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(coalesce(sum(a), 0) AS BIGINT) AS sum_a,
             |  CAST(coalesce(sum(b), 0) AS BIGINT) AS sum_b
             |FROM (SELECT (l_orderkey & 65535) AS a, (l_partkey & 65535) AS b
             |      FROM lineitem)
             |WHERE a BETWEEN 100 AND 300 AND b BETWEEN 100 AND 300"""
        .stripMargin),
      "file-stats skipping index end-to-end: z-clustered layout + " +
        "min/max sidecar, pruned read bit-identical to the full scan"),
    Q("layout_zorder_key",
      (s, d) => {
        val li = load(s, d, "lineitem")
          .select(
            col("l_orderkey").bitwiseAND(65535).as("a"),
            col("l_partkey").bitwiseAND(65535).as("b"))
          .withColumn("zkey", ZOrder.zkey(col("a"), col("b")))
        li.groupBy(shiftright(col("zkey"), 16).as("zbucket"))
          .agg(count(lit(1)).as("n"),
            min(col("a")).as("a_min"), max(col("a")).as("a_max"),
            min(col("b")).as("b_min"), max(col("b")).as("b_max"))
      },
      Some(s"""WITH k AS (
              |  SELECT (l_orderkey & 65535) AS a, (l_partkey & 65535) AS b
              |  FROM lineitem),
              |z AS (SELECT a, b, ${ZOrder.zkeyOracleSql("a", "b")} AS zkey
              |      FROM k)
              |SELECT CAST(zkey >> 16 AS BIGINT) AS zbucket,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(min(a) AS BIGINT) AS a_min, CAST(max(a) AS BIGINT) AS a_max,
              |  CAST(min(b) AS BIGINT) AS b_min, CAST(max(b) AS BIGINT) AS b_max
              |FROM z GROUP BY 1""".stripMargin),
      "codegen'd Morton interleave vs a bit-by-bit integer-sum oracle; " +
        "per-z-bucket dim ranges show the rectangles parquet stats prune on"),

    // Hilbert cluster key — the locality-STRONGER curve (what modern
    // table services cluster by): no diagonal jumps, so a contiguous
    // key range is always an edge-connected region and per-file
    // min/max envelopes stay tighter than Morton's on both dims.
    // Every key is value-checked: the DuckDB oracle replays the exact
    // xy2d recurrence as a recursive CTE over the ≤1024 distinct grid
    // cells (state ∝ cells × 5 levels — metadata-sized), then joins
    // back to the row set. HilbertSpec proves the curve itself
    // (permutation + consecutive-keys-adjacent, which Morton fails).
    Q("layout_hilbert_key",
      (s, d) => {
        val li = load(s, d, "lineitem")
          .select(
            col("l_orderkey").bitwiseAND(31).as("a"),
            col("l_partkey").bitwiseAND(31).as("b"))
          .withColumn("hkey",
            graft.functions.Hilbert.hkey(5, col("a"), col("b")))
        li.groupBy(expr("hkey div 64").as("hbucket"))
          .agg(count(lit(1)).as("n"),
            min(col("a")).as("a_min"), max(col("a")).as("a_max"),
            min(col("b")).as("b_min"), max(col("b")).as("b_max"))
      },
      Some(s"""WITH RECURSIVE ${graft.functions.Hilbert.hkeyOracleSql(5,
               "SELECT DISTINCT (l_orderkey & 31) AS a, " +
                 "(l_partkey & 31) AS b FROM lineitem")},
              |k AS (
              |  SELECT (l_orderkey & 31) AS a, (l_partkey & 31) AS b
              |  FROM lineitem)
              |SELECT CAST(hkey // 64 AS BIGINT) AS hbucket,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(min(a) AS BIGINT) AS a_min, CAST(max(a) AS BIGINT) AS a_max,
              |  CAST(min(b) AS BIGINT) AS b_min, CAST(max(b) AS BIGINT) AS b_max
              |FROM k JOIN hfin USING (a, b) GROUP BY 1""".stripMargin),
      "codegen'd Hilbert key vs a recursive-CTE replay of the same " +
        "xy2d recurrence; per-bucket dim ranges stay edge-connected " +
        "rectangles — the no-diagonal-jump advantage over Morton"),

    Q("layout_zorder3_key",
      (s, d) => {
        val li = load(s, d, "lineitem")
          .select(
            col("l_orderkey").bitwiseAND(1023).as("a"),
            col("l_partkey").bitwiseAND(1023).as("b"),
            col("l_suppkey").bitwiseAND(1023).as("c"))
          .withColumn("zkey",
            ZOrder.zkeyN(10, col("a"), col("b"), col("c")))
        li.groupBy(shiftright(col("zkey"), 18).as("zbucket"))
          .agg(count(lit(1)).as("n"),
            min(col("a")).as("a_min"), max(col("a")).as("a_max"),
            min(col("b")).as("b_min"), max(col("b")).as("b_max"),
            min(col("c")).as("c_min"), max(col("c")).as("c_max"))
      },
      Some(s"""WITH k AS (
              |  SELECT (l_orderkey & 1023) AS a, (l_partkey & 1023) AS b,
              |         (l_suppkey & 1023) AS c
              |  FROM lineitem),
              |z AS (SELECT a, b, c,
              |        ${ZOrder.zkeyNOracleSql(10, "a", "b", "c")} AS zkey
              |      FROM k)
              |SELECT CAST(zkey >> 18 AS BIGINT) AS zbucket,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(min(a) AS BIGINT) AS a_min, CAST(max(a) AS BIGINT) AS a_max,
              |  CAST(min(b) AS BIGINT) AS b_min, CAST(max(b) AS BIGINT) AS b_max,
              |  CAST(min(c) AS BIGINT) AS c_min, CAST(max(c) AS BIGINT) AS c_max
              |FROM z GROUP BY 1""".stripMargin),
      "true 3-D Morton key (bit i of dim j → position 3i+j): cubes in " +
        "(a,b,c) space — the ZORDER BY (a,b,c) layout primitive"),

    // Rendezvous (highest-random-weight) sharding — the stateless
    // assignment rule shard systems use when modulo hashing is too
    // brittle: key k lives on argmax_s hash(k, s). Its defining
    // property is MINIMAL movement under resharding: growing 8 → 9
    // shards moves exactly the keys whose new shard's score beats all
    // old ones — i.e. every moved key moves INTO the new shard (old
    // shards only ever lose), ~1/9 of keys in expectation, vs modulo
    // resharding which relocates ~8/9 of everything. The query
    // computes both assignments PER ROW from one deterministic md5
    // score vector (map-only — sharding must never need a shuffle;
    // the only exchange is the final O(shards) rollup) and audits the
    // movement: n_moved lands entirely on shard 8. Scores compare as
    // exact integers; argmax ties break by shard id via the
    // (score, shard) struct order, though a 32-bit md5 tie across 9
    // salts is practically absent.
    Q("layout_rendezvous_shards",
      (s, d) => {
        val scored = load(s, d, "customer").select(col("c_custkey").as("id"),
          expr("""transform(sequence(0, 8), i -> struct(
                 |  cast(conv(substring(md5(concat(cast(c_custkey as string),
                 |    ':', cast(i as string))), 1, 8), 16, 10) as bigint)
                 |    as sc, cast(i as bigint) as sh))""".stripMargin)
            .as("arr"))
        val assigned = scored.select(col("id"),
          expr("array_max(slice(arr, 1, 8)).sh").as("old_shard"),
          expr("array_max(arr).sh").as("new_shard"))
        assigned.groupBy(col("new_shard"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("old_shard") =!= col("new_shard"), 1L)
              .otherwise(0L)).as("n_moved"))
      },
      Some("""WITH scored AS (
             |  SELECT c_custkey AS id,
             |    list_transform(range(0, 9), i -> {
             |      'sc': CAST(list_reduce(list_transform(range(1, 9),
             |        p -> CAST(strpos('0123456789abcdef', substr(
             |          md5(CAST(c_custkey AS VARCHAR) || ':' ||
             |            CAST(i AS VARCHAR)), p, 1)) - 1 AS DOUBLE)),
             |        (a, x) -> a * 16 + x) AS BIGINT),
             |      'sh': CAST(i AS BIGINT)}) AS arr
             |  FROM customer),
             |assigned AS (
             |  SELECT id,
             |    (list_sort(arr[1:8])[-1]).sh AS old_shard,
             |    (list_sort(arr)[-1]).sh AS new_shard
             |  FROM scored)
             |SELECT new_shard, count(*) AS n_keys,
             |  CAST(sum(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_moved
             |FROM assigned GROUP BY 1""".stripMargin),
      "rendezvous sharding 8→9 reshard audit: map-only argmax " +
        "assignment, movement lands only on the new shard (~1/9), " +
        "never a reshuffle of survivors"),

    // Compaction planner (the small-files problem): given a file
    // listing at metadata grain, assign files to target-sized output
    // bins the way Delta/Iceberg OPTIMIZE bin-packing does — WITHIN a
    // partition (packing across event_type would destroy partition
    // pruning), in cluster order (day), closing a bin at each multiple
    // of the target so locality survives the rewrite. The whole plan
    // is one window over O(#files) METADATA rows — the data itself is
    // never read; at 100 TB this is the planner a table service runs
    // per partition before scheduling rewrite tasks. The fixture
    // listing derives deterministically from events ((event_type, day)
    // grain, bytes = payload+overhead sums); bin id = the target
    // multiple the file's first byte lands in (running sum EXCLUSIVE
    // of the file), so bins can overshoot by at most one file — the
    // standard sorted-fill contract. Output: per-bin file count,
    // bytes, small-file count and day span — all exact integers.
    Q("layout_compaction_plan",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val target = 4096L
        val files = load(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg((sum(length(col("props"))) + count(lit(1)) * 64L).as("bytes"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        files
          .withColumn("start_byte",
            coalesce(sum(col("bytes")).over(
              w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          // integer div, not double division: a 100 TB partition's
          // running byte total passes 2^53 and double rounding would
          // misassign boundary files (the oracle's // is exact)
          .withColumn("bin", expr(s"start_byte div $target"))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("n_files"),
            sum(col("bytes")).as("bytes"),
            sum(when(col("bytes") < target / 4, 1L).otherwise(0L))
              .as("n_small_files"),
            min(col("day")).as("first_day"),
            max(col("day")).as("last_day"))
      },
      Some("""WITH files AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(sum(length(props)) + count(*) * 64 AS BIGINT) AS bytes
             |  FROM events GROUP BY 1, 2),
             |placed AS (
             |  SELECT event_type, day, bytes,
             |    coalesce(sum(bytes) OVER (PARTITION BY event_type
             |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING), 0) AS start_byte
             |  FROM files)
             |SELECT event_type, CAST(start_byte // 4096 AS BIGINT) AS bin,
             |  CAST(count(*) AS BIGINT) AS n_files,
             |  CAST(sum(bytes) AS BIGINT) AS bytes,
             |  CAST(sum(CASE WHEN bytes < 1024 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_small_files,
             |  min(day) AS first_day, max(day) AS last_day
             |FROM placed GROUP BY 1, 2""".stripMargin),
      "OPTIMIZE-style compaction plan: per-partition sorted fill into " +
        "target-sized bins over O(#files) metadata — cluster order and " +
        "partition pruning survive the rewrite"),

    // Clustering-quality audit (overlap depth) — the number Delta's
    // OPTIMIZE ZORDER exists to drive down: how many file min/max
    // envelopes cover any given key point, i.e. how many files a
    // point lookup must open AFTER stats pruning. Two layouts of the
    // same events table are modeled as deterministic file metadata
    // (the layout-family convention): ingest order (file = type×day —
    // user envelopes span the whole domain, depth ≈ n_files) vs
    // key-clustered (file = type×16-wide user bucket — envelopes
    // disjoint by construction, depth 1). Depth comes from the
    // interval SWEEP over O(#files) metadata (net +1/−1 at envelope
    // edges, one running sum per (layout, type) — the
    // window_sweep_concurrency shape applied to the catalog, never to
    // rows), yielding max depth and the span-weighted average depth
    // exactly: integer Σ depth·segment over an integer span, one
    // final division. The pair of rows per type IS the before/after
    // OPTIMIZE report.
    Q("layout_overlap_depth",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = persistOnce(load(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"),
            col("user_id")))
        val byDay = ev.groupBy(col("event_type"), col("day"))
          .agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"))
          .select(lit("ingest_order").as("layout"), col("event_type"),
            col("lo"), col("hi"))
        val byKey = ev.groupBy(col("event_type"),
            expr("user_id DIV 16").as("ub"))
          .agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"))
          .select(lit("key_clustered").as("layout"), col("event_type"),
            col("lo"), col("hi"))
        val files = persistOnce(byDay.unionByName(byKey))
        val nf = files.groupBy(col("layout"), col("event_type"))
          .agg(count(lit(1)).as("n_files"))
        val pts = files
          .select(col("layout"), col("event_type"),
            explode(array(struct(col("lo").as("p"), lit(1L).as("dl")),
              struct((col("hi") + 1).as("p"), lit(-1L).as("dl"))))
              .as("e"))
          .groupBy(col("layout"), col("event_type"), col("e.p").as("p"))
          .agg(sum(col("e.dl")).as("net"))
        val w = Window.partitionBy(col("layout"), col("event_type"))
          .orderBy(col("p"))
        val seg = pts
          .withColumn("depth", sum(col("net")).over(w))
          .withColumn("len", lead(col("p"), 1).over(w) - col("p"))
          .filter(col("len").isNotNull)
        seg.groupBy(col("layout"), col("event_type"))
          .agg(max(col("depth")).as("max_depth"),
            sum(col("depth") * col("len")).as("wsum"),
            sum(col("len")).as("span"))
          .join(nf, Seq("layout", "event_type"))
          .select(col("layout"), col("event_type"), col("n_files"),
            col("max_depth"),
            (col("wsum").cast("double") / col("span").cast("double"))
              .as("avg_depth"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, user_id
             |  FROM events),
             |files AS (
             |  SELECT 'ingest_order' AS layout, event_type,
             |    min(user_id) AS lo, max(user_id) AS hi
             |  FROM ev GROUP BY event_type, day
             |  UNION ALL
             |  SELECT 'key_clustered' AS layout, event_type,
             |    min(user_id) AS lo, max(user_id) AS hi
             |  FROM ev GROUP BY event_type, user_id // 16),
             |nf AS (
             |  SELECT layout, event_type, CAST(count(*) AS BIGINT)
             |    AS n_files
             |  FROM files GROUP BY 1, 2),
             |pts AS (
             |  SELECT layout, event_type, p, CAST(sum(dl) AS BIGINT)
             |    AS net
             |  FROM (
             |    SELECT layout, event_type, lo AS p, 1 AS dl FROM files
             |    UNION ALL
             |    SELECT layout, event_type, hi + 1 AS p, -1 AS dl
             |    FROM files) e
             |  GROUP BY 1, 2, 3),
             |seg AS (
             |  SELECT layout, event_type,
             |    CAST(sum(net) OVER w AS BIGINT) AS depth,
             |    lead(p, 1) OVER w - p AS len
             |  FROM pts
             |  WINDOW w AS (PARTITION BY layout, event_type ORDER BY p
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |agg AS (
             |  SELECT layout, event_type,
             |    CAST(max(depth) AS BIGINT) AS max_depth,
             |    CAST(sum(depth * len) AS BIGINT) AS wsum,
             |    CAST(sum(len) AS BIGINT) AS span
             |  FROM seg WHERE len IS NOT NULL GROUP BY 1, 2)
             |SELECT layout, event_type, n_files, max_depth,
             |  CAST(wsum AS DOUBLE) / CAST(span AS DOUBLE) AS avg_depth
             |FROM agg JOIN nf USING (layout, event_type)""".stripMargin),
      "file-envelope overlap depth (clustering quality): interval " +
        "sweep over O(#files) metadata per layout — max and " +
        "span-weighted average envelopes covering a key point; the " +
        "before/after-OPTIMIZE report, integer-exact"),

    // Partition-strategy advisor: the decision every 100 TB table gets
    // wrong once — which column(s) to partition by. Four candidate
    // schemes are scored from the SAME cached row-grain projection
    // (type / day / 64 user buckets / type×day): partition count,
    // byte skew (max·n/total — exact integer mult before the single
    // division, no avg-of-doubles), and the small/oversized partition
    // counts against the compaction target. Each candidate is one
    // map-side-combined rollup re-aggregated to ONE row; the advisor's
    // whole output is 4 rows of exact metadata — the skew column is
    // what rules out user-bucket partitioning before a single write.
    Q("layout_partition_advisor",
      (s, d) => {
        val target = 4096L
        val base = persistOnce(load(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"),
            (col("user_id") % 64).as("ub"),
            (coalesce(length(col("props")), lit(0)) + lit(64L)).as("b")))
        def cand(name: String, keys: Seq[String]) = base
          .groupBy(keys.map(col): _*)
          .agg(sum(col("b")).as("bytes"))
          .agg(count(lit(1)).as("n_partitions"),
            sum(col("bytes")).as("total_bytes"),
            max(col("bytes")).as("max_bytes"),
            sum(when(col("bytes") < target / 4, 1L).otherwise(0L))
              .as("n_small"),
            sum(when(col("bytes") > target * 4, 1L).otherwise(0L))
              .as("n_oversized"))
          .select(lit(name).as("candidate"), col("n_partitions"),
            col("total_bytes"), col("max_bytes"),
            ((col("max_bytes") * col("n_partitions")).cast("double") /
              col("total_bytes").cast("double")).as("skew"),
            col("n_small"), col("n_oversized"))
        cand("by_type", Seq("event_type"))
          .unionByName(cand("by_day", Seq("day")))
          .unionByName(cand("by_user_bucket", Seq("ub")))
          .unionByName(cand("by_type_day", Seq("event_type", "day")))
      },
      Some("""WITH base AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    user_id % 64 AS ub,
             |    coalesce(length(props), 0) + 64 AS b
             |  FROM events),
             |c1 AS (SELECT event_type AS k, CAST(sum(b) AS BIGINT) AS bytes
             |       FROM base GROUP BY 1),
             |c2 AS (SELECT CAST(day AS VARCHAR) AS k,
             |         CAST(sum(b) AS BIGINT) AS bytes FROM base GROUP BY 1),
             |c3 AS (SELECT CAST(ub AS VARCHAR) AS k,
             |         CAST(sum(b) AS BIGINT) AS bytes FROM base GROUP BY 1),
             |c4 AS (SELECT concat(event_type, '|', CAST(day AS VARCHAR))
             |         AS k, CAST(sum(b) AS BIGINT) AS bytes
             |       FROM base GROUP BY 1),
             |u AS (
             |  SELECT 'by_type' AS candidate, bytes FROM c1
             |  UNION ALL SELECT 'by_day', bytes FROM c2
             |  UNION ALL SELECT 'by_user_bucket', bytes FROM c3
             |  UNION ALL SELECT 'by_type_day', bytes FROM c4)
             |SELECT candidate, CAST(count(*) AS BIGINT) AS n_partitions,
             |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
             |  CAST(max(bytes) AS BIGINT) AS max_bytes,
             |  CAST(max(bytes) * count(*) AS DOUBLE)
             |    / CAST(sum(bytes) AS DOUBLE) AS skew,
             |  CAST(sum(CASE WHEN bytes < 1024 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_small,
             |  CAST(sum(CASE WHEN bytes > 16384 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_oversized
             |FROM u GROUP BY 1""".stripMargin),
      "partition-strategy advisor: four candidate schemes scored from " +
        "one cached projection — partition count, exact-integer byte " +
        "skew, small/oversized counts vs the compaction target"),

    // VACUUM planner (Delta/Iceberg retention semantics): which file
    // versions are safe to delete given the snapshot-retention window.
    // File versions derive deterministically from the metadata grain
    // (a (type, day) file has 1 + day%3 versions; version k is removed
    // by the k+1 rewrite, the last one is live); with current version
    // 4 and the last 2 snapshots retained, a removed version is
    // DELETABLE only if its removal predates every retained snapshot —
    // removed_at ≤ 2 — else it must stay for time travel. The whole
    // decision is one metadata rollup + an O(versions) explode —
    // bytes_deletable is the number a storage bill actually moves on.
    Q("layout_vacuum_plan",
      (s, d) => {
        val files = load(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg((sum(coalesce(length(col("props")), lit(0))) +
            count(lit(1)) * 64L).as("bytes"))
          .withColumn("nv", lit(1) + dayofmonth(col("day")) % 3)
        files
          .select(col("event_type"), col("bytes"), col("nv"),
            explode(sequence(lit(1), col("nv"))).as("v"))
          .withColumn("status",
            when(col("v") === col("nv"), "live")
              .when(col("v") + 1 <= 2, "deletable")
              .otherwise("time_travel"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_versions"),
            sum(when(col("status") === "live", 1L).otherwise(0L))
              .as("n_live"),
            sum(when(col("status") === "deletable", 1L).otherwise(0L))
              .as("n_deletable"),
            sum(when(col("status") === "time_travel", 1L).otherwise(0L))
              .as("n_time_travel"),
            sum(when(col("status") === "live", col("bytes"))
              .otherwise(0L)).as("bytes_live"),
            sum(when(col("status") === "deletable", col("bytes"))
              .otherwise(0L)).as("bytes_deletable"))
      },
      Some("""WITH files AS (
             |  SELECT event_type, day, bytes, 1 + day(day) % 3 AS nv
             |  FROM (
             |    SELECT event_type, CAST(ts AS DATE) AS day,
             |      CAST(sum(coalesce(length(props), 0)) + count(*) * 64
             |        AS BIGINT) AS bytes
             |    FROM events GROUP BY 1, 2)),
             |vers AS (
             |  SELECT event_type, bytes, nv,
             |    unnest(range(1, nv + 1)) AS v
             |  FROM files),
             |st AS (
             |  SELECT event_type, bytes,
             |    CASE WHEN v = nv THEN 'live'
             |         WHEN v + 1 <= 2 THEN 'deletable'
             |         ELSE 'time_travel' END AS status
             |  FROM vers)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_versions,
             |  CAST(sum(CASE WHEN status = 'live' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_live,
             |  CAST(sum(CASE WHEN status = 'deletable' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_deletable,
             |  CAST(sum(CASE WHEN status = 'time_travel' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_time_travel,
             |  CAST(sum(CASE WHEN status = 'live' THEN bytes ELSE 0 END)
             |    AS BIGINT) AS bytes_live,
             |  CAST(sum(CASE WHEN status = 'deletable' THEN bytes ELSE 0
             |    END) AS BIGINT) AS bytes_deletable
             |FROM st GROUP BY 1""".stripMargin),
      "VACUUM planner: snapshot-retention reachability over O(files) " +
        "metadata — deletable vs time-travel-retained version counts " +
        "and the reclaimable bytes, one rollup + O(versions) explode"),

    // DYNAMIC partition pruning exercised through the oracle gate: the
    // months worth reading are only known after aggregating the dim
    // side (top-2 revenue months), so static planning cannot prune —
    // Spark's DPP rule reuses the broadcast result as a runtime
    // partition filter on the Hive-layout fact scan
    // (dynamicpruningexpression in PartitionFilters — pinned by
    // PlanAuditSpec). At 100 TB this is the difference between
    // scanning 2 months and scanning all of them whenever the
    // partition predicate comes from a JOIN rather than a literal.
    // The exact-cents rollup must equal DuckDB's flat-scan replay of
    // the same top-2 selection (unique (rev desc, month) order).
    Q("layout_dynamic_pruning",
      (s, d) => {
        val fact = s.read.parquet(partitionedDir(s, d))
        val dim = load(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
          .orderBy(col("rev").desc, col("o_month")).limit(2)
          .filter(col("rev") > 0)
        fact.join(broadcast(dim), "o_month")
          .groupBy(col("o_month"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long"))
              .as("total_cents"))
      },
      Some("""WITH m AS (
             |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev
             |  FROM orders GROUP BY 1
             |  ORDER BY rev DESC, o_month LIMIT 2)
             |SELECT o.o_month, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |    AS BIGINT) AS total_cents
             |FROM (SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
             |        o_totalprice FROM orders) o
             |JOIN (SELECT o_month FROM m WHERE rev > 0) mm USING (o_month)
             |GROUP BY 1""".stripMargin),
      "dynamic partition pruning: the partition predicate comes from a " +
        "broadcast join result (top-2 revenue months), so pruning " +
        "happens at RUNTIME — dynamicpruningexpression plan-audited, " +
        "rollup bit-identical to the flat scan"))
}
