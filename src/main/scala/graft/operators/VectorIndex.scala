package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{QuantQueries, SimilarityQueries}

/** One façade over the seven persisted vector-index families
  * (SQ8 / PQ / IVF / residual IVF-PQ / binary-sign / LSH / kNN-lists):
  * family selection from the MEASURED compression ladder, and the
  * save / load / append / delete / search lifecycle routed through each
  * family's own fingerprint-stamped, tombstone-masked verbs.
  *
  * What the façade adds over calling the families directly:
  *
  *   - **selection as an API**: [[select]] turns the SCALING.md ladder
  *     (bytes/vec vs measured recall@5) into a routing decision — give it
  *     a storage budget and a recall floor, get the family that meets
  *     both most cheaply;
  *   - **a family marker in the store**: [[build]] stamps `path`/family
  *     with the family name, and every façade verb re-reads it — so an
  *     SQ8 store handed to a caller expecting PQ fails at open with the
  *     stored vs declared names, instead of whichever in-family
  *     fingerprint error the wrong verb happens to hit first (or, for
  *     look-alike layouts, no error at all);
  *   - **uniform search shape**: every query-vector family returns
  *     (query_id, neighbor_id, rank, score) with rank 1..k, whatever its
  *     native metric (ADC L2, Hamming, cosine), so downstream reranks
  *     and evaluations are family-independent.
  *
  * The underlying verbs are unchanged and remain the full-control
  * surface; the façade never reimplements training, encoding, or
  * scoring. Scale shapes are therefore inherited: candidates shuffle,
  * the corpus does not; small sides broadcast; all stores share the
  * [[IndexTombstones]] deletion discipline.
  */
object VectorIndex {

  /** One rung of the measured compression ladder (SCALING.md round-8
    * table + the round-8/round-10 knob sweeps; recall@5 on the 5-query
    * harness, bytes per 64-dim vector). `knob` names the query-time or
    * build-time setting that produces the measured recall at that
    * store size — the SAME store can appear on several rungs (binary at
    * R=25 vs R=100; residual at different codebook widths/probes), so a
    * caller can ask for "16 B/vec at 0.8 recall" without knowing which
    * probe dial delivers it.
    */
  final case class Rung(family: String, knob: String, bytesPerVec: Double,
      recallAt5: Double)

  /** Descending-cost order; within one (family, bytes) the CHEAPER knob
    * first, so a tie on bytes resolves to the shallower probe when both
    * meet the floor. "exact" is the no-index brute path (not a
    * persisted family). LSH and kNN-lists are deliberately absent: LSH
    * stores exact vectors' bucket ids (a candidate generator, not a
    * compression rung) and kNN-lists is a neighbor graph, not a
    * query-vector index. Measurements: SCALING.md — bin R=25/R=100 on
    * the same 16 B store; residual 32 cells at 4×8 (11/125) and the
    * larger 4×64 codebook at probe 2 (16/125) and 4 (18/125).
    */
  val ladder: Seq[Rung] = Seq(
    Rung("exact", "", 512, 1.00),
    Rung("sq8", "adc+rerank25", 64, 1.00),
    Rung("bin", "R=25", 16, 0.56),
    Rung("bin", "R=100", 16, 0.84),
    Rung("residual", "cells=32,pq=4x8,probe=2", 5, 0.088),
    Rung("residual", "cells=32,pq=4x64,probe=2", 5, 0.128),
    Rung("residual", "cells=32,pq=4x64,probe=4", 5, 0.144),
    Rung("pq", "4x8", 4, 0.04))

  /** The cheapest (fewest bytes/vec) rung meeting BOTH the storage
    * budget and the recall floor, ties resolved to the earliest (=
    * cheapest-knob) row. Returns the full rung so the caller learns
    * the knob alongside the family. Throws with the full ladder when
    * the constraints are unsatisfiable.
    */
  def selectRung(maxBytesPerVec: Double, minRecallAt5: Double): Rung = {
    val fits = ladder.filter(r =>
      r.bytesPerVec <= maxBytesPerVec && r.recallAt5 >= minRecallAt5)
    require(fits.nonEmpty,
      s"VectorIndex.select: no family fits <= $maxBytesPerVec bytes/vec " +
        s"at recall@5 >= $minRecallAt5; the measured ladder is " +
        ladder.map(r =>
          s"${r.family}${if (r.knob.isEmpty) "" else s"[${r.knob}]"}" +
            s"(${r.bytesPerVec}B, ${r.recallAt5})")
          .mkString(", "))
    fits.minBy(_.bytesPerVec) // minBy keeps the FIRST minimal row on ties
  }

  /** [[selectRung]] reduced to the family name — the routing surface
    * [[build]] consumes (q157's path).
    */
  def select(maxBytesPerVec: Double, minRecallAt5: Double): String =
    selectRung(maxBytesPerVec, minRecallAt5).family

  val Families: Set[String] =
    Set("sq8", "pq", "ivf", "residual", "bin", "lsh", "knn")

  /** Whether the store at `path` is manifest-committed — the façade's
    * protocol dispatch: every routed verb consults this once and then
    * drives the family's versioned or rename verbs accordingly, so ONE
    * API serves both commit disciplines.
    */
  def isVersioned(spark: SparkSession, path: String): Boolean =
    VersionedStore.currentVersion(spark, path).isDefined

  /** The family a store at `path` was built as (from the façade marker).
    * Stores saved via the raw family verbs carry no marker — build (or
    * re-save) through the façade to join the routed lifecycle. For
    * manifest-committed stores the marker is a 1-row `family` RELATION
    * inside the versioned store (no unversioned sidecar).
    */
  def family(spark: SparkSession, path: String): String = {
    val rows =
      if (isVersioned(spark, path))
        try VersionedStore.read(spark, path, "family")
          .select("family").take(1)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"VectorIndex: versioned store at $path carries no 'family' " +
              "relation — not a façade-built store (build it with " +
              "VectorIndex.build(protocol = \"manifest\"), or use the " +
              "family's own versioned verbs directly)", e)
        }
      else
        try spark.read.parquet(s"$path/family").select("family").take(1)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"VectorIndex: no family marker at $path/family — not a " +
              "façade-built store (build it with VectorIndex.build, or " +
              "use the family's own verbs directly)", e)
        }
    require(rows.nonEmpty,
      s"VectorIndex: family marker at $path is empty — " +
        "interrupted build or wrong path")
    rows(0).getString(0)
  }

  /** Open = verify the caller's declared family against the stored
    * marker. Every façade verb calls this; it exists publicly so code
    * that is ABOUT to hand the path to family-specific logic can fail
    * fast with the stored/declared pair.
    */
  def open(spark: SparkSession, path: String, declared: String): Unit = {
    val stored = family(spark, path)
    require(stored == declared,
      s"VectorIndex: store at $path was built as family '$stored' but " +
        s"the caller declared '$declared' — routing it through the " +
        "wrong family's verbs would fail late (or, for look-alike " +
        "layouts, search wrongly)")
  }

  private def writeMarker(spark: SparkSession, path: String,
      fam: String): Unit =
    spark.range(1).select(lit(fam).as("family"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/family")

  /** The façade's 1-row family marker as a RELATION — for manifest-
    * protocol builds it rides the family save's OWN commit (the `extra`
    * parameter of every versioned save verb), so there is no instant at
    * which the data revision exists but the marker does not.
    */
  private def markerRel(spark: SparkSession,
      fam: String): Map[String, DataFrame] =
    Map("family" -> spark.range(1).select(lit(fam).as("family"))
      .coalesce(1))

  /** Train + encode + persist `e`(vec_id, v) as `fam` at `path`, and
    * stamp the family marker. Training defaults are each family's query
    * defaults (q136/q108/q62/q127/q128/q111/q116 shapes).
    *
    * The DEFAULT protocol is `manifest` (since r14): the deployment
    * target for a persisted index is object storage, where a rename is
    * copy-then-delete and the manifest PUT is the only atomic commit —
    * and with the migration verbs shipped (q212-q215) there is no
    * lock-in argument for starting new builds on rename. Pass
    * `protocol = "rename"` for the filesystem-rename family (still
    * first-class: every verb dispatches on the store's own protocol,
    * and the full rename lifecycle remains spec- and bench-covered via
    * the explicit-protocol sites). The marker rides INSIDE the build's
    * own manifest PUT
    * (a `family` relation passed through the save verb's `extra`
    * relations), so a manifest build is crash-atomic end to end: every
    * crash instant leaves either no store or a fully marked one — the
    * marker-after-build window the rename façade still has (two
    * directory writes, unavoidable under that protocol) is structurally
    * unrepresentable here, and a build bumps the revision by EXACTLY
    * one (spec-pinned).
    */
  def build(e: DataFrame, fam: String, path: String,
      protocol: String = "manifest"): Unit = {
    val spark = e.sparkSession
    checkProtocol(protocol, "build")
    val versioned = protocol == "manifest"
    val marker = markerRel(spark, fam)
    fam match {
      case "sq8" =>
        val params = QuantQueries.sqTrain(e).localCheckpoint(true)
        val codes = QuantQueries.sqCodes(params, e)
        if (versioned) QuantQueries.sqSaveIndexVersioned(params, codes,
          path, extra = marker)
        else QuantQueries.sqSaveIndex(params, codes, path)
      case "pq" =>
        val idx = SimilarityQueries.pqTrain(e)
        val codes = SimilarityQueries.pqCodes(idx, e)
        if (versioned) SimilarityQueries.pqSaveIndexVersioned(idx, codes,
          path, extra = marker)
        else SimilarityQueries.pqSaveIndex(idx, codes, path)
      case "ivf" =>
        val (cents, cells) = SimilarityQueries.ivfTrain(e)
        if (versioned) SimilarityQueries.ivfSaveIndexVersioned(
          cents.localCheckpoint(true), cells, path, extra = marker)
        else SimilarityQueries.ivfSaveIndex(cents.localCheckpoint(true),
          cells, path)
      case "residual" =>
        // q127 composition: coarse cells, PQ trained on RESIDUALS
        val (cents0, cells) = SimilarityQueries.ivfTrain(e, k = 8)
        val cents = cents0.localCheckpoint(true)
        val cls = cells.localCheckpoint(true)
        val rv = SimilarityQueries.ivfResiduals(e, cents, cls)
          .select("vec_id", "v").localCheckpoint(true)
        val idx = SimilarityQueries.pqTrain(rv)
        val codes = SimilarityQueries.pqCodes(idx, rv)
        if (versioned) SimilarityQueries.residualSaveIndexVersioned(
          cents, cls, idx, codes, path, extra = marker)
        else SimilarityQueries.residualSaveIndex(cents, cls, idx, codes,
          path)
      case "bin" =>
        val codes = SimilarityQueries.binCodes(e)
        if (versioned) SimilarityQueries.binSaveIndexVersioned(codes, path,
          extra = marker)
        else SimilarityQueries.binSaveIndex(codes, path)
      case "lsh" =>
        val buckets = SimilarityQueries.lshBuckets(e)
        if (versioned) SimilarityQueries.lshSaveIndexVersioned(buckets,
          4, 6, path, extra = marker)
        else SimilarityQueries.lshSaveIndex(buckets, 4, 6, path)
      case "knn" =>
        val lists = SimilarityQueries.bruteTopLists(e, 3)
        if (versioned) SimilarityQueries.knnSaveListsVersioned(lists, 3,
          "brute-cos", path, extra = marker)
        else SimilarityQueries.knnSaveLists(lists, 3, "brute-cos", path)
      case other => throw new IllegalArgumentException(
        s"VectorIndex.build: unknown family '$other' (one of " +
          s"${Families.toSeq.sorted.mkString(", ")})")
    }
    if (!versioned) writeMarker(spark, path, fam)
  }

  /** MIGRATE a rename-protocol store to the manifest-committed form —
    * the answer to "my store was built on HDFS and is moving to S3"
    * that does NOT re-encode the corpus: every relation is read through
    * the family's VERIFYING loader (fingerprint recompute and all — a
    * torn or spliced source refuses here), pending tombstones are
    * applied (the versioned twin starts masked-clean, no sidecar), and
    * ONE manifest PUT commits the relations PLUS the family marker as
    * revision 1 — the same crash-atomic shape as a fresh manifest
    * [[build]], at O(index) copy cost instead of O(corpus) re-train/
    * re-encode. Searches against the migrated store are bit-equal to
    * the source's (same stored codes, same frozen parameters;
    * spec-pinned). A CDC `_synced_rev` checkpoint carries across, so a
    * synced index keeps syncing from the same corpus store. `declared`
    * names the family for stores built by the raw family verbs (no
    * façade marker); a marked store checks it instead.
    */
  def migrateToVersioned(spark: SparkSession, src: String, dst: String,
      declared: Option[String] = None): Long = {
    require(!isVersioned(spark, src),
      s"VectorIndex.migrateToVersioned: store at $src is already " +
        "manifest-committed")
    require(VersionedStore.currentVersion(spark, dst).isEmpty,
      s"VectorIndex.migrateToVersioned: $dst already holds a versioned " +
        "store — refusing to commit a second lineage over it")
    val fam = declared match {
      case Some(d) =>
        val fp = new org.apache.hadoop.fs.Path(s"$src/family")
        if (fp.getFileSystem(spark.sessionState.newHadoopConf()).exists(fp))
          open(spark, src, d) // marked: the declaration must agree
        d
      case None => family(spark, src)
    }
    val marker = markerRel(spark, fam)
    import graft.queries.{QuantQueries => Q, SimilarityQueries => S}
    val rev = fam match {
      case "sq8" =>
        val (params, codes) = Q.sqLoadIndex(spark, src)
        Q.sqSaveIndexVersioned(params, codes, dst, extra = marker)
      case "pq" =>
        val (idx, codes) = S.pqLoadIndex(spark, src)
        S.pqSaveIndexVersioned(idx, codes, dst, extra = marker)
      case "ivf" =>
        val (cents, cells) = S.ivfLoadIndex(spark, src)
        S.ivfSaveIndexVersioned(cents, cells, dst, extra = marker)
      case "residual" =>
        val (cents, cells, idx, codes) = S.residualLoadIndex(spark, src)
        S.residualSaveIndexVersioned(cents, cells, idx, codes, dst,
          extra = marker)
      case "bin" =>
        S.binSaveIndexVersioned(S.binLoadIndex(spark, src), dst,
          extra = marker)
      case "lsh" =>
        val (buckets, tables, planes) = S.lshLoadIndex(spark, src)
        val vdims = spark.read.parquet(s"$src/meta")
          .select("dims").head.getInt(0)
        S.lshSaveIndexVersioned(buckets, tables, planes, dst, vdims,
          extra = marker)
      case "knn" =>
        val (lists, k) = S.knnLoadLists(spark, src)
        val gen = spark.read.parquet(s"$src/meta")
          .select("generator").head.getString(0)
        S.knnSaveListsVersioned(lists, k, gen, dst, extra = marker)
      case other => throw new IllegalArgumentException(
        s"VectorIndex.migrateToVersioned: unknown family '$other' (one " +
          s"of ${Families.toSeq.sorted.mkString(", ")})")
    }
    RevisionSync.migrateMarker(spark, src, dst,
      "VectorIndex.migrateToVersioned")
    rev
  }

  private def checkProtocol(protocol: String, verb: String): Unit =
    require(protocol == "rename" || protocol == "manifest",
      s"VectorIndex.$verb: unknown protocol '$protocol' (rename or " +
        "manifest)")

  /** Uniform ANN search: top-`k` neighbors of `queries`(qid, qv) from
    * the store at `path`, routed by the stored family marker, as
    * (query_id, neighbor_id, rank, score). `score` is the family's
    * native metric — ADC L2 for sq8/pq/residual (lower = nearer),
    * Hamming for bin (lower = nearer), cosine for lsh/ivf (higher =
    * nearer) — rank 1..k is already ordered nearest-first for all of
    * them. `e`(vec_id, v) supplies exact vectors to the families whose
    * stores hold candidates rather than codes (lsh, ivf); code families
    * ignore it (their searches read ONLY the persisted store).
    */
  def search(e: DataFrame, queries: DataFrame, path: String,
      k: Int = 5): DataFrame = {
    val spark = queries.sparkSession
    val versioned = isVersioned(spark, path)
    searchResolved(e, queries, path, k, versioned, family(spark, path))
  }

  /** [[search]] with the store's (protocol, family) already resolved —
    * the federated probe resolves them ONCE per shard for its marker
    * check and must not pay the manifest probe + 1-row marker collect a
    * second time per shard (round 15; the two reads were ~4 driver-
    * serialized jobs per shard per probe).
    */
  private def searchResolved(e: DataFrame, queries: DataFrame, path: String,
      k: Int, versioned: Boolean, fam: String): DataFrame = {
    val spark = queries.sparkSession
    fam match {
      case "sq8" =>
        val (params, codes) =
          if (versioned) QuantQueries.sqLoadIndexVersioned(spark, path)
          else QuantQueries.sqLoadIndex(spark, path)
        QuantQueries.sqAdcSearch(params, codes, queries, topR = k)
          .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
            col("arank").as("rank"), col("adc_dist").as("score"))
      case "pq" =>
        val (idx, codes) =
          if (versioned) SimilarityQueries.pqLoadIndexVersioned(spark, path)
          else SimilarityQueries.pqLoadIndex(spark, path)
        SimilarityQueries.pqAdcSearch(idx, codes, queries, topK = k)
          .withColumnRenamed("adc_dist", "score")
      case "residual" =>
        val (cents, cells, idx, codes) =
          if (versioned)
            SimilarityQueries.residualLoadIndexVersioned(spark, path)
          else SimilarityQueries.residualLoadIndex(spark, path)
        SimilarityQueries.ivfPqSearchResidual(cells, cents, idx, codes,
            queries, topK = k)
          .withColumnRenamed("adc_dist", "score")
      case "bin" =>
        val codes =
          if (versioned) SimilarityQueries.binLoadIndexVersioned(spark, path)
          else SimilarityQueries.binLoadIndex(spark, path)
        SimilarityQueries.binHammingSearch(codes, queries, topR = k)
          .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
            col("hrank").as("rank"), col("hamming").cast("double").as("score"))
      case "lsh" =>
        val (buckets, tables, planes) =
          if (versioned) SimilarityQueries.lshLoadIndexVersioned(spark, path)
          else SimilarityQueries.lshLoadIndex(spark, path)
        SimilarityQueries.lshSearchIndex(buckets, e, queries,
            tables, planes, topK = k)
          .withColumnRenamed("cos_sim", "score")
      case "ivf" =>
        // IVF-flat: nearest coarse cell per query (broadcast centroid
        // argmax), exact cosine over ONLY that cell's members — the
        // candidate set is cell-sized, the corpus never shuffles.
        // The probe metric MUST be the store's assignment metric
        // (cosine — ivfAssign's byL2=false default): k-means centroids
        // have unequal norms, so an argmax over raw dot products picks
        // a different cell than argmax cosine and systematically
        // misses the cells the query's true neighbors were assigned to
        val (cents, cells) =
          if (versioned) SimilarityQueries.ivfLoadIndexVersioned(spark, path)
          else SimilarityQueries.ivfLoadIndex(spark, path)
        val qCell = queries.crossJoin(broadcast(
            cents.select(col("cid"), col("cv"))))
          .select(col("qid"), col("qv"), col("cid").as("cell"),
            expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D," +
                " (a, x) -> a + x) / (sqrt(aggregate(transform(qv," +
                " x -> x * x), 0D, (a, x) -> a + x)) *" +
                " sqrt(aggregate(transform(cv, x -> x * x), 0D," +
                " (a, x) -> a + x)))").as("aff"))
        val probed = GroupTopK.topK(qCell, Seq(col("qid")),
            Seq(col("aff").desc, col("cell").asc), col("cell"), 1,
            rankName = "crank")
          .select("qid", "qv", "cell")
        val cand = cells.select("vec_id", "cell")
          .join(broadcast(probed), "cell")
        val scored = e.join(cand, "vec_id")
          .select(col("qid"), col("vec_id"),
            expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D," +
                " (a, x) -> a + x) / (sqrt(aggregate(transform(qv," +
                " x -> x * x), 0D, (a, x) -> a + x)) *" +
                " sqrt(aggregate(transform(v, x -> x * x), 0D," +
                " (a, x) -> a + x)))")
              .as("score"))
        GroupTopK.topK(scored, Seq(col("qid")),
            Seq(col("score").desc, col("vec_id").asc), col("vec_id"), k)
          .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
            col("rank"), col("score"))
      case "knn" => throw new IllegalArgumentException(
        "VectorIndex.search: 'knn' is a neighbor-GRAPH store, not a " +
          "query-vector index — expand an ANN candidate set through it " +
          "with SimilarityQueries.graphExpandCandidates")
    }
  }

  /** Append `e`(vec_id, v) to the store, routed by family — each
    * family's own idempotent, fingerprint-guarded append verb.
    */
  def append(e: DataFrame, path: String): Unit = {
    val spark = e.sparkSession
    val versioned = isVersioned(spark, path)
    family(spark, path) match {
      case "sq8" =>
        if (versioned) QuantQueries.sqAppendCodesVersioned(e, path)
        else QuantQueries.sqAppendCodes(e, path)
      case "pq" =>
        if (versioned) {
          val (idx, _) = SimilarityQueries.pqLoadIndexVersioned(spark, path)
          SimilarityQueries.pqAppendCodesVersioned(idx, e, path)
        } else {
          val (idx, _) = SimilarityQueries.pqLoadIndex(spark, path)
          SimilarityQueries.pqAppendCodes(idx, e, path)
        }
      case "ivf" =>
        if (versioned) {
          val (cents, _) = SimilarityQueries.ivfLoadIndexVersioned(spark, path)
          SimilarityQueries.ivfAppendCellsVersioned(cents, e, path)
        } else {
          val (cents, _) = SimilarityQueries.ivfLoadIndex(spark, path)
          SimilarityQueries.ivfAppendCells(cents, e, path)
        }
      case "residual" =>
        if (versioned) {
          val (cents, _, idx, _) =
            SimilarityQueries.residualLoadIndexVersioned(spark, path)
          SimilarityQueries.residualAppendVectorsVersioned(cents, idx, e,
            path)
        } else {
          val (cents, _, idx, _) =
            SimilarityQueries.residualLoadIndex(spark, path)
          SimilarityQueries.residualAppendVectors(cents, idx, e, path)
        }
      case "bin" =>
        if (versioned) SimilarityQueries.binAppendCodesVersioned(e, path)
        else SimilarityQueries.binAppendCodes(e, path)
      case "lsh" =>
        if (versioned) SimilarityQueries.lshAppendBucketsVersioned(e, path)
        else SimilarityQueries.lshAppendBuckets(e, path)
      case "knn" => throw new IllegalArgumentException(
        "VectorIndex.append: kNN-list increments are ranked LISTS, not " +
          "vectors — generate them against the full corpus and append " +
          "with SimilarityQueries.knnAppendLists (generator-declared)")
    }
  }

  // ------------------------------------------------------------------
  // Sharded (federated) code stores — the 100 TB shape of the vector
  // side, the q174 discipline applied to embeddings: one store's
  // append/delete/rebuild touches the whole code relation, so vectors
  // hash-route to n independent family stores and search federates.
  // The exactness argument differs from the text index's (no corpus
  // statistics here): it holds for families whose scoring parameters
  // are GLOBAL (trained once, a copy saved into every shard) and whose
  // per-candidate score is a pure function of (query, stored code,
  // params) — then every monolithic top-k member lives in some shard
  // and is in that shard's top-k, so the union of per-shard top-k
  // re-cut to k is BIT-equal to the monolithic search (spec-pinned).
  // ------------------------------------------------------------------

  private def shardPath(root: String, i: Int) = s"$root/shard-$i"
  private def routerPath(root: String) = s"$root/router"

  /** Families that federate EXACTLY: sq8/pq train their quantization
    * globally here (per-shard training would make ADC distances
    * incomparable across shards — the vector-side twin of the per-shard
    * idf mistake); bin has no training at all. The cell- and
    * bucket-coupled families (ivf, residual, lsh, knn) are refused:
    * they shard along their own structure (cells, buckets, graph
    * partitions), a different trade than doc-hash routing.
    */
  val ShardableFamilies: Set[String] = Set("sq8", "pq", "bin")

  private def shardOf(n: Int) =
    pmod(xxhash64(col("vec_id").cast("long")), lit(n.toLong))

  /** Read the sharded store's router: (shard count, family). Written
    * LAST by [[buildSharded]] — the commit marker; its absence means an
    * interrupted (or never-run) sharded build. A manifest-protocol
    * federation's router is itself a 1-relation VersionedStore (its
    * commit is a manifest PUT, not a rename), auto-detected here so
    * every downstream verb serves both forms.
    */
  def shardInfo(spark: SparkSession, root: String): (Int, String) = {
    val rp = new org.apache.hadoop.fs.Path(routerPath(root))
    require(rp.getFileSystem(spark.sessionState.newHadoopConf()).exists(rp),
      s"VectorIndex.shardInfo: no router at $root — not a sharded store, " +
        "or an interrupted buildSharded (the router is written last); " +
        "re-run the sharded build")
    val r =
      if (isVersioned(spark, routerPath(root)))
        VersionedStore.read(spark, routerPath(root), "router").collect()
      else spark.read.parquet(routerPath(root)).collect()
    require(r.length == 1,
      s"VectorIndex.shardInfo: router at $root has ${r.length} rows — " +
        "corrupt sharded store")
    (r(0).getAs[Int]("n_shards"), r(0).getAs[String]("family"))
  }

  /** Train ONCE on the full relation, encode and persist each hash
    * slice as an independent family store (own fingerprint, tombstones,
    * family marker), write the router last. Refuses an empty shard
    * (the families refuse empty stores) and a family whose federation
    * would be approximate. A crash mid-build leaves no router — every
    * later verb refuses — and re-running completes it.
    */
  def buildSharded(e: DataFrame, fam: String, root: String,
      nShards: Int, protocol: String = "manifest"): Unit = {
    require(ShardableFamilies(fam),
      s"VectorIndex.buildSharded: family '$fam' does not federate " +
        s"exactly — shardable: ${ShardableFamilies.toSeq.sorted.mkString(", ")} " +
        "(cell/bucket-coupled families shard along their own structure)")
    require(nShards >= 1,
      s"VectorIndex.buildSharded: nShards must be >= 1, got $nShards")
    checkProtocol(protocol, "buildSharded")
    val versioned = protocol == "manifest"
    val spark = e.sparkSession
    // un-commit first, then drop every existing shard dir (see
    // textIndexSaveSharded): a crashed rebuild must refuse under a
    // missing router, and a rebuild with fewer shards must not orphan
    // higher-numbered dirs carrying forgotten vectors' codes
    locally {
      val rp = new org.apache.hadoop.fs.Path(routerPath(root))
      val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(rp)) fs.delete(rp, true)
      val rootP = new org.apache.hadoop.fs.Path(root)
      if (fs.exists(rootP))
        fs.listStatus(rootP).map(_.getPath)
          .filter(_.getName.startsWith("shard-"))
          .foreach(p => fs.delete(p, true))
    }
    val withSh = e.withColumn("_sh", shardOf(nShards)).localCheckpoint(true)
    val present = withSh.select("_sh").distinct().collect()
      .map(_.getLong(0)).toSet
    val missing = (0L until nShards.toLong).filterNot(present)
    require(missing.isEmpty,
      s"VectorIndex.buildSharded: shard(s) ${missing.mkString(",")} of " +
        s"$nShards would be EMPTY for this relation — use fewer shards")
    def slice(i: Int) = withSh.filter(col("_sh") === i).drop("_sh")
    // manifest shards: the family marker rides each shard save's OWN
    // commit (no marker-after-build window anywhere in the federation);
    // rename shards keep the two-write shape their protocol forces
    val marker = markerRel(spark, fam)
    def mark(i: Int): Unit =
      if (!versioned) writeMarker(spark, shardPath(root, i), fam)
    // r15 (guide §2.6): per-shard code+save chains write DISJOINT dirs
    // off the shared GLOBAL artifact (params/codebook trained once,
    // before the fan-out) — overlapped like the text federation's save;
    // the router commit below still strictly follows every shard.
    fam match {
      case "sq8" =>
        val params = QuantQueries.sqTrain(e).localCheckpoint(true) // GLOBAL
        Parallel.shards(nShards) { i =>
          val codes = QuantQueries.sqCodes(params, slice(i))
          if (versioned)
            QuantQueries.sqSaveIndexVersioned(params, codes,
              shardPath(root, i), extra = marker)
          else QuantQueries.sqSaveIndex(params, codes, shardPath(root, i))
          mark(i)
        }
      case "pq" =>
        val idx = SimilarityQueries.pqTrain(e) // GLOBAL codebook
        Parallel.shards(nShards) { i =>
          val codes = SimilarityQueries.pqCodes(idx, slice(i))
          if (versioned)
            SimilarityQueries.pqSaveIndexVersioned(idx, codes,
              shardPath(root, i), extra = marker)
          else SimilarityQueries.pqSaveIndex(idx, codes, shardPath(root, i))
          mark(i)
        }
      case "bin" =>
        Parallel.shards(nShards) { i =>
          val codes = SimilarityQueries.binCodes(slice(i))
          if (versioned)
            SimilarityQueries.binSaveIndexVersioned(codes,
              shardPath(root, i), extra = marker)
          else SimilarityQueries.binSaveIndex(codes, shardPath(root, i))
          mark(i)
        }
    }
    import spark.implicits._
    val router = Seq((nShards, fam)).toDF("n_shards", "family").coalesce(1)
    if (versioned)
      VersionedStore.save(Map("router" -> router), routerPath(root))
    else StoreRewrite.atomicOverwrite(router, routerPath(root))
  }

  /** MIGRATE a rename-protocol SHARDED federation to the manifest
    * form: each shard through [[migrateToVersioned]] (verifying loads,
    * tombstones applied, marker + data in one PUT per shard), the
    * router copied verbatim as a versioned store and committed LAST —
    * the same ordering as [[buildSharded]], so a crash mid-migration
    * leaves a router-less root that [[shardInfo]] refuses, and
    * re-running completes it. The root sync checkpoint carries across.
    */
  def migrateShardedToVersioned(spark: SparkSession, srcRoot: String,
      dstRoot: String): Unit = {
    require(VersionedStore
        .currentVersion(spark, routerPath(dstRoot)).isEmpty,
      s"VectorIndex.migrateShardedToVersioned: $dstRoot already holds " +
        "a committed federation — refusing to commit a second lineage " +
        "over it")
    val (n, fam) = shardInfo(spark, srcRoot) // refuses missing routers
    require(!isVersioned(spark, routerPath(srcRoot)),
      s"VectorIndex.migrateShardedToVersioned: federation at $srcRoot " +
        "is already manifest-committed")
    (0 until n).foreach { i =>
      open(spark, shardPath(srcRoot, i), fam)
      val sp = new org.apache.hadoop.fs.Path(shardPath(dstRoot, i))
      val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(sp)) fs.delete(sp, true) // crashed prior attempt
      migrateToVersioned(spark, shardPath(srcRoot, i),
        shardPath(dstRoot, i))
    }
    VersionedStore.save(
      Map("router" -> spark.read.parquet(routerPath(srcRoot))
        .coalesce(1)), routerPath(dstRoot))
    RevisionSync.migrateMarker(spark, srcRoot, dstRoot,
      "VectorIndex.migrateShardedToVersioned")
  }

  /** Federated ANN search: each shard's store-only search runs
    * independently (per-shard code scans with broadcast queries — no
    * cross-shard exchange to assemble inputs), then the union of
    * per-shard top-k is re-cut to the global top-k. All shardable
    * families score nearest-first ASCENDING with the same global
    * parameters, so the merge is a pure (score, neighbor_id) order —
    * bit-equal to the monolithic store's search.
    */
  def searchSharded(queries: DataFrame, root: String,
      k: Int = 5): DataFrame = {
    val spark = queries.sparkSession
    val (n, fam) = shardInfo(spark, root)
    // Per-shard setup overlaps on the shard pool (guide §2.6) and the
    // (protocol, family) pair is resolved ONCE per shard — the marker
    // check IS that resolution, so the old open-then-search shape paid
    // the manifest probe and the 1-row marker collect twice per shard,
    // all driver-serialized.
    val per = Parallel.shards(n) { i =>
      val sp = shardPath(root, i)
      val stored = family(spark, sp) // router and marker must agree
      require(stored == fam,
        s"VectorIndex: store at $sp was built as family '$stored' but " +
          s"the caller declared '$fam' — routing it through the " +
          "wrong family's verbs would fail late (or, for look-alike " +
          "layouts, search wrongly)")
      searchResolved(spark.emptyDataFrame, queries, sp, k,
        isVersioned(spark, sp), stored)
    }
    GroupTopK.topK(per.reduce(_ unionByName _).drop("rank"),
        Seq(col("query_id")),
        Seq(col("score").asc, col("neighbor_id").asc),
        col("neighbor_id"), k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** Route an increment's vectors to their hash shards and run each
    * family's own append there (fingerprint-guarded, idempotent where
    * the family's verb is). Encoding uses each shard's STORED params —
    * copies of the one global training, so appended codes stay
    * comparable across the federation.
    */
  def appendSharded(e: DataFrame, root: String): Unit = {
    val spark = e.sparkSession
    val (n, _) = shardInfo(spark, root)
    val inc = e.withColumn("_sh", shardOf(n)).localCheckpoint(true)
    (0 until n).foreach { i =>
      val slice = inc.filter(col("_sh") === i).drop("_sh")
      if (!slice.isEmpty) append(slice, shardPath(root, i))
    }
  }

  /** Route tombstones to the owning shards only (the q174 rule: each
    * shard's mask stays 1/n-sized).
    */
  def deleteSharded(ids: DataFrame, root: String): Unit = {
    val spark = ids.sparkSession
    val (n, _) = shardInfo(spark, root)
    val del = ids.select(col("vec_id")).withColumn("_sh", shardOf(n))
      .localCheckpoint(true)
    (0 until n).foreach { i =>
      val slice = del.filter(col("_sh") === i).drop("_sh")
      if (!slice.isEmpty) delete(slice, shardPath(root, i))
    }
  }

  /** Tombstone `ids`(vec_id) out of the store, routed by family. Masked
    * at every subsequent load/search; compacted at the next full build.
    */
  def delete(ids: DataFrame, path: String): Unit = {
    val spark = ids.sparkSession
    if (isVersioned(spark, path)) family(spark, path) match {
      case "sq8" => QuantQueries.sqDeleteVectorsVersioned(ids, path)
      case "pq" => SimilarityQueries.pqDeleteVectorsVersioned(ids, path)
      case "ivf" => SimilarityQueries.ivfDeleteVectorsVersioned(ids, path)
      case "residual" =>
        SimilarityQueries.residualDeleteVectorsVersioned(ids, path)
      case "bin" => SimilarityQueries.binDeleteVectorsVersioned(ids, path)
      case "lsh" => SimilarityQueries.lshDeleteVectorsVersioned(ids, path)
      case "knn" => SimilarityQueries.knnDeleteNodesVersioned(ids, path)
    }
    else family(spark, path) match {
      case "sq8" => QuantQueries.sqDeleteVectors(ids, path)
      case "pq" => SimilarityQueries.pqDeleteVectors(ids, path)
      case "ivf" => SimilarityQueries.ivfDeleteVectors(ids, path)
      case "residual" => SimilarityQueries.residualDeleteVectors(ids, path)
      case "bin" => SimilarityQueries.binDeleteVectors(ids, path)
      case "lsh" => SimilarityQueries.lshDeleteVectors(ids, path)
      case "knn" => SimilarityQueries.knnDeleteNodes(ids, path)
    }
  }

  /** Maintain a vector index from a VERSIONED-STORE revision window —
    * the vector twin of the text side's `textIndexMaintainFromStore`
    * (q189): the embedding corpus lives in a
    * [[graft.operators.VersionedStore]] as `rel`(vec_id, v) and evolves
    * only through its manifest-committed verbs, and ONE call propagates
    * any run of append/delete revisions into the index in O(delta) with
    * no caller-side diffing. [[VersionedStore.changes]] reads only the
    * window's added dirs (and nets out rows appended then tombstoned
    * inside the window), the window's deleted keys become index
    * tombstones FIRST ([[delete]] — sticky, so a delete-then-reappend
    * window stays invisible on both sides, matching the store's own
    * sticky-tombstone view), and the net-new rows ride the family's
    * idempotent [[append]].
    *
    * The contract deliberately DIFFERS from the text bridge's
    * incremental-equals-full in one honest respect: quantized families
    * (sq8/pq/residual) train their parameters at [[build]] time and the
    * append encodes under that FROZEN quantizer, so the maintained
    * store equals hand-driving the family's own append/delete verbs
    * with the window's diff (CdcVectorIndexSpec pins bit-equality),
    * NOT a from-scratch rebuild whose retrained parameters would
    * re-code every vector. That is the production trade at 100 TB —
    * re-encoding the corpus per revision is the rebuild path
    * (`knnRefreshAnn` / the ladder's re-select), not maintenance; the
    * oracle (q192) recomputes the frozen-parameter arithmetic exactly.
    * Replay-safe end to end: re-running a window re-appends nothing
    * (every family's append is fingerprint/left-anti guarded) and
    * re-tombstoning is idempotent.
    */
  def maintainFromStore(spark: SparkSession, storePath: String,
      rel: String, fromRev: Long, toRev: Long, indexPath: String): Unit =
    CdcBridge.maintain(spark, storePath, rel, fromRev, toRev, "vec_id",
      Seq("vec_id", "v"), "VectorIndex.maintainFromStore")(
      del => delete(del, indexPath))(
      ins => append(ins, indexPath))

  /** SYNC the index with its versioned embedding store — the
    * bookkeeping-free form of [[maintainFromStore]], same contract as
    * the text side's `textIndexSyncWithStore`: the index checkpoints
    * the last absorbed revision ([[RevisionSync]]), a first call
    * against an empty path bootstraps (trains the quantizer on
    * `read(current)` — the frozen parameters every later synced append
    * encodes under), later calls absorb every pending append/delete
    * revision in one O(delta) window, and the marker's lag-never-lead
    * ordering makes a crash between maintenance and bump a harmless
    * replay. `fam` is consulted only at bootstrap; afterwards the
    * store's own family marker routes. `protocol` (also bootstrap-only)
    * defaults to `manifest` like [[build]] — an EXISTING index syncs
    * under its own protocol regardless.
    */
  def syncWithStore(spark: SparkSession, storePath: String, rel: String,
      idxPath: String, fam: String = "sq8",
      protocol: String = "manifest",
      retain: Option[Int] = None): Option[(Long, Long)] = {
    checkProtocol(protocol, "syncWithStore")
    require(retain.isEmpty || protocol == "manifest",
      "VectorIndex.syncWithStore: retain bounds MANIFEST revision " +
        "history — a rename-protocol index keeps none")
    CdcBridge.sync(spark, storePath, idxPath, "VectorIndex.syncWithStore",
      retain)({
      if (protocol == "manifest") isVersioned(spark, idxPath)
      else {
        val fp = new org.apache.hadoop.fs.Path(s"$idxPath/family")
        fp.getFileSystem(spark.sessionState.newHadoopConf()).exists(fp)
      }
    })(cur =>
      build(VersionedStore.read(spark, storePath, rel, Some(cur))
        .select("vec_id", "v"), fam, idxPath, protocol))((from, to) =>
      maintainFromStore(spark, storePath, rel, from, to, idxPath))
  }
}
