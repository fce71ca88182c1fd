package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Caching.persistOnce
import graft.core.Tables.load

/** Anti-entropy digests: find WHERE two 100 TB replicas diverge while
  * moving O(buckets) rows, not O(rows). The reference reconciles tables
  * by comparing full row counts and MAX(id) probes
  * (dags/cdc_data_integrity_dynamic_dag.py:48-60) — count parity can't
  * see content drift (an UPDATE leaves counts identical), and a full
  * row-by-row diff at scale is a 100 TB shuffle. Bucket digests are the
  * middle path every replication system ships (DynamoDB/Cassandra
  * merkle trees): each side folds its rows into per-bucket
  * order-independent digests (one map-side-combined aggregate, O(buckets)
  * output), digests join on bucket id, and only DIVERGENT buckets —
  * typically a handful — pay a row-level re-sync.
  *
  * The digest is a SUM of 32-bit row fingerprints (md5 prefix): addition
  * commutes, so partition order never matters, and both engines compute
  * the identical value (md5 is the one hash family Spark shares with
  * the DuckDB oracle). A 32-bit fingerprint summed over a bucket leaves
  * collision odds at ~n²/2³³ per bucket — size buckets accordingly
  * (or widen to two digest columns) when a miss is unacceptable.
  */
object Reconcile {

  /** Order-independent 32-bit row fingerprint: the first 8 md5 hex
    * chars of the '|'-joined column values, as a long. Numeric columns
    * must be pre-normalized to integer/string form (double formatting
    * is engine-specific). */
  def rowFingerprint(cols: Column*): Column =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 8), 16, 10).cast("long")

  /** Per-bucket (digest, row count) of `df` under the given bucket and
    * fingerprint expressions. One aggregate, O(buckets) output rows. */
  def bucketDigests(df: DataFrame, bucket: Column, fp: Column): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(sum(fp).as("digest"), count(lit(1)).as("n"))

  /** Buckets where two replicas disagree (digest or count), with both
    * sides' values — the re-sync worklist. Full outer on bucket id so
    * a bucket emptied on one side still surfaces. */
  def digestDiff(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.select(col("bucket"), col("digest").as("src_digest"),
      col("n").as("src_n"))
    val t = dst.select(col("bucket"), col("digest").as("dst_digest"),
      col("n").as("dst_n"))
    s.join(t, Seq("bucket"), "full_outer")
      .filter(!(col("src_digest") <=> col("dst_digest")) ||
        !(col("src_n") <=> col("dst_n")))
  }

  def queries: Seq[Q] = Seq(
    // Source = customer; replica = customer with planted drift (an
    // UPDATE stripe and a DELETE stripe). The digest diff must surface
    // exactly the buckets those stripes touch — and count parity alone
    // would MISS the update stripe, which is the point of the digest.
    Q("recon_bucket_digest",
      (s, d) => {
        val base = load(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            round(col("c_acctbal") * 100).cast("long").as("cents"),
            col("c_mktsegment"))
        val fp = rowFingerprint(col("c_custkey"), col("c_name"),
          col("c_nationkey"), col("cents"), col("c_mktsegment"))
        val replica = base
          .filter(col("c_custkey") % 101 =!= 5)
          .withColumn("cents",
            when(col("c_custkey") % 97 === 3, col("cents") + 100)
              .otherwise(col("cents")))
        digestDiff(
          bucketDigests(base, col("c_custkey") % 32, fp),
          bucketDigests(replica, col("c_custkey") % 32, fp))
      },
      Some("""WITH base AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             |    c_mktsegment
             |  FROM customer),
             |fp AS (
             |  SELECT c_custkey % 32 AS bucket,
             |    CAST(CAST(concat('0x', substr(md5(concat_ws('|', c_custkey,
             |      c_name, c_nationkey, cents, c_mktsegment)), 1, 8))
             |      AS UBIGINT) AS BIGINT) AS f
             |  FROM base),
             |rep AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CASE WHEN c_custkey % 97 = 3 THEN cents + 100 ELSE cents END
             |      AS cents,
             |    c_mktsegment
             |  FROM base WHERE c_custkey % 101 <> 5),
             |rfp AS (
             |  SELECT c_custkey % 32 AS bucket,
             |    CAST(CAST(concat('0x', substr(md5(concat_ws('|', c_custkey,
             |      c_name, c_nationkey, cents, c_mktsegment)), 1, 8))
             |      AS UBIGINT) AS BIGINT) AS f
             |  FROM rep),
             |sd AS (SELECT bucket, CAST(sum(f) AS BIGINT) AS src_digest,
             |         CAST(count(*) AS BIGINT) AS src_n FROM fp GROUP BY 1),
             |td AS (SELECT bucket, CAST(sum(f) AS BIGINT) AS dst_digest,
             |         CAST(count(*) AS BIGINT) AS dst_n FROM rfp GROUP BY 1)
             |SELECT coalesce(sd.bucket, td.bucket) AS bucket,
             |  src_digest, dst_digest, src_n, dst_n
             |FROM sd FULL OUTER JOIN td ON sd.bucket = td.bucket
             |WHERE src_digest IS DISTINCT FROM dst_digest
             |   OR src_n IS DISTINCT FROM dst_n""".stripMargin),
      "anti-entropy bucket digests: order-independent md5-prefix sums " +
        "per bucket, O(buckets) rows moved, divergent buckets surfaced " +
        "— update drift that count parity cannot see"),

    // Row-level diff with COLUMN attribution — the re-sync step after
    // recon_bucket_digest localizes divergence (same planted replica
    // drift: every 97≡3 custkey's balance is off by a dollar, every
    // 101≡5 row is missing), and the standalone "data diff" tool in
    // its own right: each divergent key is classified added / removed
    // / changed, and changed rows name exactly WHICH columns moved
    // (concat_ws skips the null markers of equal columns — same
    // semantics both engines). One key-keyed full-outer join; every
    // column compare is map-side null-safe equality; output ∝
    // divergent rows only. In production this runs per divergent
    // BUCKET from the digest query, so the join touches a sliver of
    // the table — here it runs on the whole (small) fixture.
    Q("recon_row_diff",
      (s, d) => {
        val base = load(s, d, "customer").select(col("c_custkey"),
          col("c_name"), col("c_nationkey"),
          round(col("c_acctbal") * 100).cast("long").as("cents"),
          col("c_mktsegment"))
        val rep = base.filter(col("c_custkey") % 101 =!= 5)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            when(col("c_custkey") % 97 === 3, col("cents") + 100)
              .otherwise(col("cents")).as("cents"),
            col("c_mktsegment"))
        val s_ = base.columns.foldLeft(base)((df, c) =>
          df.withColumnRenamed(c, s"s_$c"))
        val r_ = rep.columns.foldLeft(rep)((df, c) =>
          df.withColumnRenamed(c, s"r_$c"))
        def diffCol(c: String): Column =
          when(!(col(s"s_$c") <=> col(s"r_$c")), lit(c))
        s_.join(r_, col("s_c_custkey") === col("r_c_custkey"), "full_outer")
          .select(
            coalesce(col("s_c_custkey"), col("r_c_custkey")).as("key"),
            when(col("r_c_custkey").isNull, "removed")
              .when(col("s_c_custkey").isNull, "added")
              .otherwise("changed").as("status"),
            concat_ws(",", diffCol("c_name"), diffCol("c_nationkey"),
              diffCol("cents"), diffCol("c_mktsegment")).as("changed_cols"))
          .filter(col("status") =!= "changed" || col("changed_cols") =!= "")
      },
      Some("""WITH base AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             |    c_mktsegment
             |  FROM customer),
             |rep AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CASE WHEN c_custkey % 97 = 3 THEN cents + 100
             |         ELSE cents END AS cents,
             |    c_mktsegment
             |  FROM base WHERE c_custkey % 101 <> 5)
             |SELECT coalesce(s.c_custkey, r.c_custkey) AS key,
             |  CASE WHEN r.c_custkey IS NULL THEN 'removed'
             |       WHEN s.c_custkey IS NULL THEN 'added'
             |       ELSE 'changed' END AS status,
             |  concat_ws(',',
             |    CASE WHEN s.c_name IS DISTINCT FROM r.c_name
             |         THEN 'c_name' END,
             |    CASE WHEN s.c_nationkey IS DISTINCT FROM r.c_nationkey
             |         THEN 'c_nationkey' END,
             |    CASE WHEN s.cents IS DISTINCT FROM r.cents
             |         THEN 'cents' END,
             |    CASE WHEN s.c_mktsegment IS DISTINCT FROM r.c_mktsegment
             |         THEN 'c_mktsegment' END) AS changed_cols
             |FROM base s FULL OUTER JOIN rep r
             |  ON s.c_custkey = r.c_custkey
             |WHERE r.c_custkey IS NULL OR s.c_custkey IS NULL
             |   OR s.c_name IS DISTINCT FROM r.c_name
             |   OR s.c_nationkey IS DISTINCT FROM r.c_nationkey
             |   OR s.cents IS DISTINCT FROM r.cents
             |   OR s.c_mktsegment IS DISTINCT FROM r.c_mktsegment""".stripMargin),
      "row-level data diff with changed-column attribution: one " +
        "key-keyed full-outer join, null-safe map-side compares, " +
        "output ∝ divergent rows — the digest query's re-sync step"),

    // Majority-vote read repair across THREE replicas — what a
    // quorum store (Cassandra/Dynamo R+W>N) does on every read, as a
    // batch reconciliation: per key, the version held by ≥2 replicas
    // is authoritative; a 2-of-3 majority repairs the minority copy,
    // no majority (or a single surviving copy) is a quorum loss that
    // needs operator eyes. Replica faults are planted on residue
    // classes of key mod 60 so EVERY verdict is live at every SF
    // (the dense custkey space covers all residues even at sf0.001):
    // r7 → one corrupt copy (repaired), r13 → dropped from two
    // replicas (quorum lost), r21 → corrupted DIFFERENTLY in two
    // replicas (three-way split, quorum lost), r33 → dropped from one
    // (under-replicated but agreeing), r45 → one corrupt segment
    // (repair on a non-numeric column). Shape: one union, votes = one
    // (key, row-fingerprint) hash-agg, winner = max_by over the
    // CONCATENATED (votes, fp) string key — single-digit vote counts
    // make string order = (votes, fp) lexicographic order, and fp is
    // unique within the key group, so both engines' argmax agree
    // without struct-ordered aggregates (which demote to
    // SortAggregate). Cost: two key-grain hash-aggs over 3n rows —
    // never a 3-way join.
    Q("recon_majority_vote",
      (s, d) => {
        val base = load(s, d, "customer").select(col("c_custkey").as("key"),
          col("c_name").as("name"), col("c_nationkey").as("nation"),
          round(col("c_acctbal") * 100).cast("long").as("cents"),
          col("c_mktsegment").as("seg"))
        val r = col("key") % 60
        val r1 = base.filter(r =!= 13)
          .withColumn("cents",
            when(r === 7 || r === 21, col("cents") + 100)
              .otherwise(col("cents")))
        val r2 = base.filter(r =!= 13)
          .withColumn("cents", when(r === 21, col("cents") + 200)
            .otherwise(col("cents")))
        val r3 = base.filter(r =!= 33)
          .withColumn("seg", when(r === 45, lit("CORRUPT"))
            .otherwise(col("seg")))
        val u = r1.unionByName(r2).unionByName(r3)
          .withColumn("fp", md5(concat_ws("|", col("name"),
            col("nation"), col("cents"), col("seg"))))
        val votes = u.groupBy(col("key"), col("fp"))
          .agg(count(lit(1)).as("votes"), max(col("cents")).as("vcents"))
        val pk = concat(col("votes").cast("string"), col("fp"))
        votes.groupBy(col("key"))
          .agg(sum(col("votes")).as("n_present"),
            max_by(col("votes"), pk).as("win_votes"),
            max_by(col("vcents"), pk).as("cents"))
          .select(col("key"), col("n_present"), col("win_votes"),
            when(col("win_votes") >= 3, "healthy")
              .when(col("win_votes") === 2 && col("n_present") === 3,
                "repaired")
              .when(col("win_votes") === 2, "under_replicated")
              .otherwise("quorum_lost").as("status"),
            col("cents"))
          .filter(col("status") =!= "healthy")
      },
      Some("""WITH base AS (
             |  SELECT c_custkey AS key, c_name AS name,
             |    c_nationkey AS nation,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             |    c_mktsegment AS seg
             |  FROM customer),
             |r1 AS (SELECT key, name, nation,
             |    CASE WHEN key % 60 IN (7, 21) THEN cents + 100
             |         ELSE cents END AS cents, seg
             |  FROM base WHERE key % 60 <> 13),
             |r2 AS (SELECT key, name, nation,
             |    CASE WHEN key % 60 = 21 THEN cents + 200 ELSE cents END
             |      AS cents, seg
             |  FROM base WHERE key % 60 <> 13),
             |r3 AS (SELECT key, name, nation, cents,
             |    CASE WHEN key % 60 = 45 THEN 'CORRUPT' ELSE seg END AS seg
             |  FROM base WHERE key % 60 <> 33),
             |u AS (
             |  SELECT *, md5(name || '|' || CAST(nation AS VARCHAR)
             |    || '|' || CAST(cents AS VARCHAR) || '|' || seg) AS fp
             |  FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
             |        UNION ALL SELECT * FROM r3) z),
             |v AS (
             |  SELECT key, fp, CAST(count(*) AS BIGINT) AS votes,
             |    max(cents) AS vcents
             |  FROM u GROUP BY 1, 2),
             |w AS (
             |  SELECT key, CAST(sum(votes) AS BIGINT) AS n_present,
             |    arg_max(votes, CAST(votes AS VARCHAR) || fp) AS win_votes,
             |    arg_max(vcents, CAST(votes AS VARCHAR) || fp) AS cents
             |  FROM v GROUP BY 1)
             |SELECT key, n_present, win_votes,
             |  CASE WHEN win_votes >= 3 THEN 'healthy'
             |       WHEN win_votes = 2 AND n_present = 3 THEN 'repaired'
             |       WHEN win_votes = 2 THEN 'under_replicated'
             |       ELSE 'quorum_lost' END AS status,
             |  cents
             |FROM w
             |WHERE win_votes < 3""".stripMargin),
      "3-replica majority-vote read repair: one union + two key-grain " +
        "hash-aggs (never a 3-way join), concatenated-string argmax " +
        "keeps the winner hash-aggregable — repairs and quorum losses " +
        "flagged with the authoritative value"),

    // Merkle digest TREE over the same fingerprint family: 64 leaf
    // buckets fold into 8 level-1 nodes fold into one root — the
    // Cassandra/DynamoDB anti-entropy structure. Two replicas compare
    // ROOTS first (one row each); only on mismatch do they walk down
    // level by level, so a clean comparison moves O(1) rows and a
    // divergent one O(log · fanout). Every level is an
    // order-independent SUM of md5-prefix fingerprints (leaf: row
    // fingerprints; upper: fingerprints of (child idx, child digest)),
    // so partition order never matters and DuckDB reproduces each
    // node exactly. Output = the full tree (level, idx, digest,
    // n_rows) — 73 rows regardless of table size.
    Q("recon_merkle_root",
      (s, d) => {
        val base = load(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            round(col("c_acctbal") * 100).cast("long").as("cents"),
            col("c_mktsegment"))
        val fp = rowFingerprint(col("c_custkey"), col("c_name"),
          col("c_nationkey"), col("cents"), col("c_mktsegment"))
        // leaf (a full scan + md5 per row) feeds three output branches
        // (itself, l1, root) — persist so customer is scanned once
        val leaf = persistOnce(base
          .groupBy((col("c_custkey") % 64).as("idx"))
          .agg(sum(fp).as("digest"), count(lit(1)).as("n_rows")))
        val l1 = persistOnce(leaf
          .select(floor(col("idx") / 8).cast("long").as("pidx"),
            rowFingerprint(col("idx"), col("digest")).as("f"), col("n_rows"))
          .groupBy(col("pidx").as("idx"))
          .agg(sum(col("f")).as("digest"), sum(col("n_rows")).as("n_rows")))
        val root = l1
          .select(rowFingerprint(col("idx"), col("digest")).as("f"),
            col("n_rows"))
          .agg(sum(col("f")).as("digest"), sum(col("n_rows")).as("n_rows"))
          .select(lit(2).as("level"), lit(0L).as("idx"), col("digest"),
            col("n_rows"))
        leaf
          .select(lit(0).as("level"), col("idx"), col("digest"),
            col("n_rows"))
          .unionByName(l1.select(lit(1).as("level"), col("idx"),
            col("digest"), col("n_rows")))
          .unionByName(root)
      },
      Some("""WITH base AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             |    c_mktsegment
             |  FROM customer),
             |fp AS (
             |  SELECT c_custkey % 64 AS idx,
             |    CAST(CAST(concat('0x', substr(md5(concat_ws('|', c_custkey,
             |      c_name, c_nationkey, cents, c_mktsegment)), 1, 8))
             |      AS UBIGINT) AS BIGINT) AS f
             |  FROM base),
             |leaf AS (SELECT idx, CAST(sum(f) AS BIGINT) AS digest,
             |    CAST(count(*) AS BIGINT) AS n_rows FROM fp GROUP BY 1),
             |m1 AS (SELECT idx // 8 AS pidx,
             |    CAST(CAST(concat('0x', substr(md5(concat_ws('|', idx,
             |      digest)), 1, 8)) AS UBIGINT) AS BIGINT) AS f, n_rows
             |  FROM leaf),
             |l1 AS (SELECT pidx AS idx, CAST(sum(f) AS BIGINT) AS digest,
             |    CAST(sum(n_rows) AS BIGINT) AS n_rows FROM m1 GROUP BY 1),
             |m2 AS (SELECT
             |    CAST(CAST(concat('0x', substr(md5(concat_ws('|', idx,
             |      digest)), 1, 8)) AS UBIGINT) AS BIGINT) AS f, n_rows
             |  FROM l1),
             |rt AS (SELECT 2 AS level, CAST(0 AS BIGINT) AS idx,
             |    CAST(sum(f) AS BIGINT) AS digest,
             |    CAST(sum(n_rows) AS BIGINT) AS n_rows FROM m2)
             |SELECT 0 AS level, idx, digest, n_rows FROM leaf
             |UNION ALL SELECT 1, idx, digest, n_rows FROM l1
             |UNION ALL SELECT level, idx, digest, n_rows FROM rt"""
        .stripMargin),
      "anti-entropy Merkle tree: 64→8→1 order-independent fingerprint " +
        "sums — clean replicas compare O(1) rows, divergence walks down"),

    // IBLT set reconciliation (Eppstein et al., SIGCOMM 2011) — the
    // step BEYOND digests: bucket digests say WHICH BUCKETS diverge,
    // the subtracted invertible-Bloom table decodes WHICH ROWS, while
    // each replica still ships only O(cells) state (three algebraic
    // aggregates, map-side combined — never the key domain). Elements
    // are (key, content-fingerprint) packed longs, so a modified row
    // surfaces as TWO recovered elements (its old version A-side, new
    // version B-side) and a deleted row as one. The planted replica-B
    // drops every 97th customer and retouches every 89th balance — a
    // diff of ≈ 3.3% of rows, so the table is SIZED FROM THE COUNT
    // (next power of two ≥ n/8, ≈ 1.9× the planted diff — the IBLT
    // contract: provision for the expected diff bound d̂, which a
    // production re-sync takes from the strata estimator in this same
    // file; a FIXED 1024 cells silently under-provisions past sf0.2,
    // caught by the sf1 stress gate). Decode failure stays DETECTED —
    // checksum-guarded peeling can return incomplete, never wrong —
    // and falls back to digest+re-sync. The oracle is fully
    // independent: DuckDB derives the true symmetric difference from
    // the plant definitions directly.
    Q("recon_iblt_diff",
      (s, d) => {
        import graft.functions.Iblt
        val n = load(s, d, "customer").count()
        val cells = math.max(1024L,
          java.lang.Long.highestOneBit(n / 8) * 2).toInt
        val src = persistOnce(load(s, d, "customer")
          .select(col("c_custkey").as("ck"),
            round(col("c_acctbal") * 100).cast("long").as("cents")))
        def elem(df: DataFrame): Column =
          col("ck") * 4294967296L +
            rowFingerprint(col("ck"), col("cents"))
        val a = src
        val b = src.filter(col("ck") % 97 =!= 0)
          .withColumn("cents",
            when(col("ck") % 89 === 0, col("cents") + 500L)
              .otherwise(col("cents")))
        val diff = Iblt.subtract(
          Iblt.cellTable(Iblt.cellRows(a, elem(a), cells)),
          Iblt.cellTable(Iblt.cellRows(b, elem(b), cells)))
        val raw = diff.collect().map(r =>
          (r.getLong(0).toInt, r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSeq
        val (recovered, decoded) = Iblt.peel(raw, cells)
        require(decoded, s"IBLT decode failed: diff exceeds the " +
          s"$cells-cell capacity — fall back to bucket-digest re-sync")
        import s.implicits._
        recovered.map { case (v, side) => (v / 4294967296L, side) }
          .toDF("custkey", "side")
      },
      Some("""SELECT c_custkey AS custkey, 1 AS side FROM customer
             |WHERE c_custkey % 97 = 0
             |UNION ALL
             |SELECT c_custkey, 1 FROM customer
             |WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0
             |UNION ALL
             |SELECT c_custkey, -1 FROM customer
             |WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0""".stripMargin),
      "IBLT set reconciliation: O(cells) mergeable sketches per " +
        "replica, cell-wise subtraction, checksum-guarded peeling " +
        "recovers the EXACT row diff — oracle is the true symmetric " +
        "difference, derived independently"),

    // STRATA ESTIMATOR (Eppstein et al., "What's the Difference?"
    // SIGCOMM'11) — the sizing oracle that tells you how many IBLT
    // cells to provision BEFORE shipping one: items land in stratum
    // tz(hash(item)) (trailing zeros, E[|stratum i|] = D/2^(i+1) of
    // the true difference D), so any single decodable stratum yields
    // the estimate d_i·2^(i+1). This batch form computes every
    // stratum's exact per-side-only count (in the protocol each
    // stratum is a tiny fixed-size IBLT — the full join here stands in
    // for its decode) next to its scaled estimate and the true D. One
    // (key,fp)-grain hash agg + one stratum-grain rollup; trailing
    // zeros via the integer-exact log2(h & -h) trick with bit 32 set
    // as the zero-guard cap. Fixture: the bucket-digest replica script
    // (drops %101==5, corrupts %97==3 — a corrupted key contributes 2
    // items to the difference, a dropped key 1).
    Q("recon_strata_estimator",
      (s, d) => {
        val base = load(s, d, "customer")
          .select(col("c_custkey"), col("c_name"),
            round(col("c_acctbal") * 100).cast("long").as("cents"))
        val replica = base
          .filter(col("c_custkey") % 101 =!= 5)
          .withColumn("cents",
            when(col("c_custkey") % 97 === 3, col("cents") + 100)
              .otherwise(col("cents")))
        def items(df: DataFrame, side: Int) = df.select(
          col("c_custkey").as("k"),
          rowFingerprint(col("c_custkey"), col("c_name"), col("cents"))
            .as("fp"),
          lit(side).as("s"))
        val diff = items(base, 0).unionByName(items(replica, 1))
          .groupBy(col("k"), col("fp"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") === 1) // present on exactly one side
        // guard-bit form: h' = h + 2^32 keeps tz(h) for h > 0 and caps
        // the h = 0 corner at 32; log2(h' & -h') is integer-exact
        // (power of two in a double)
        val h = rowFingerprint(col("k"), col("fp")) + lit(4294967296L)
        val byStratum = diff
          .select(log2(h.bitwiseAND(-h)).cast("long").as("stratum"))
          .groupBy(col("stratum")).agg(count(lit(1)).as("d_i"))
        val trueD = diff.agg(count(lit(1)).as("true_d"))
        byStratum.crossJoin(broadcast(trueD))
          .select(col("stratum"), col("d_i"),
            expr("d_i * shiftleft(CAST(1 AS BIGINT), " +
              "CAST(stratum + 1 AS INT))").as("estimate"),
            col("true_d"))
      },
      Some("""WITH base AS (
             |  SELECT c_custkey, c_name,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
             |  FROM customer),
             |a AS (
             |  SELECT c_custkey AS k,
             |    CAST(CAST(concat('0x', substr(md5(concat_ws('|',
             |      c_custkey, c_name, cents)), 1, 8)) AS UBIGINT)
             |      AS BIGINT) AS fp
             |  FROM base),
             |b AS (
             |  SELECT c_custkey AS k,
             |    CAST(CAST(concat('0x', substr(md5(concat_ws('|',
             |      c_custkey, c_name,
             |      CASE WHEN c_custkey % 97 = 3 THEN cents + 100
             |           ELSE cents END)), 1, 8)) AS UBIGINT)
             |      AS BIGINT) AS fp
             |  FROM base WHERE c_custkey % 101 <> 5),
             |diff AS (
             |  SELECT k, fp FROM (
             |    SELECT k, fp, count(*) AS n
             |    FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
             |    GROUP BY 1, 2)
             |  WHERE n = 1),
             |st AS (
             |  SELECT CAST(log2(
             |    (CAST(CAST(concat('0x', substr(md5(concat_ws('|', k, fp)),
             |      1, 8)) AS UBIGINT) AS BIGINT) + 4294967296) &
             |    (-(CAST(CAST(concat('0x', substr(md5(concat_ws('|', k, fp)),
             |      1, 8)) AS UBIGINT) AS BIGINT) + 4294967296))
             |    ) AS BIGINT) AS stratum
             |  FROM diff),
             |g AS (SELECT stratum, CAST(count(*) AS BIGINT) AS d_i
             |      FROM st GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS true_d FROM diff)
             |SELECT stratum, d_i,
             |  CAST(d_i * (1 << CAST(stratum + 1 AS INTEGER)) AS BIGINT)
             |    AS estimate,
             |  true_d
             |FROM g CROSS JOIN t""".stripMargin),
      "strata estimator for difference sizing: trailing-zero strata of " +
        "the (key,fp) hash, per-stratum exact one-side-only counts + " +
        "2^(i+1)-scaled estimates vs the true D — the IBLT " +
        "provisioning step, one item-grain agg + one stratum rollup"))
}
