package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Data-governance operators over the corpus/warehouse tables: PII
  * detection + redaction (the scrub pass every training-data pipeline
  * runs before release), snapshot diffing (what changed between two
  * corpus versions), and declarative data-quality auditing. q85 already
  * scrubs the name column with generic shape patterns; q160/q161 are
  * the deeper half of that surface — a per-class AUDIT with a Luhn
  * validity gate (card-shaped vs card-valid, the false-positive
  * separator q85's patterns cannot express) and a typed-placeholder
  * scrub over content where every class genuinely fires. The synthetic
  * testdata carries no organic PII, so the PII queries audit a
  * deterministic "contact line" derived from customer keys — the
  * detectors' cross-engine semantics (regex classes, Luhn arithmetic)
  * are pinned against DuckDB on non-trivial input, and PiiSpec proves
  * the detection/redaction behavior on adversarial fixtures (mixed
  * valid/invalid Luhn, embedded digit runs).
  */
object GovernanceQueries extends QueryModule {

  private val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val cardRe = "[0-9]{16}"

  /** Deterministic contact line per customer. Every customer gets a
    * phone-shaped number; every 7th an email; every 5th a 16-digit
    * card-shaped number (Luhn-valid only by arithmetic accident — that
    * is the point: the audit separates card-SHAPED from card-VALID).
    */
  private def profileCol: Column = concat(
    col("c_name"), lit(" "), col("c_mktsegment"),
    lit(" id "), col("c_custkey").cast("string"),
    lit(" ph "), (col("c_custkey") % 900 + 100).cast("string"),
    lit("-"), ((col("c_custkey") * 7) % 900 + 100).cast("string"),
    lit("-"), lpad(((col("c_custkey") * 13) % 10000).cast("string"), 4, "0"),
    when(col("c_custkey") % 7 === 0,
      concat(lit(" user"), col("c_custkey").cast("string"), lit("@example.com")))
      .otherwise(lit("")),
    when(col("c_custkey") % 5 === 0,
      concat(lit(" card "),
        lpad((col("c_custkey") * 2654435761L).cast("string"), 16, "0")))
      .otherwise(lit("")))

  /** The same line in DuckDB SQL — byte-identical by construction. */
  private val profileSql =
    """c_name || ' ' || c_mktsegment || ' id ' || CAST(c_custkey AS VARCHAR)
      || ' ph ' || CAST(c_custkey % 900 + 100 AS VARCHAR)
      || '-' || CAST((c_custkey * 7) % 900 + 100 AS VARCHAR)
      || '-' || lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0')
      || CASE WHEN c_custkey % 7 = 0
           THEN ' user' || CAST(c_custkey AS VARCHAR) || '@example.com'
           ELSE '' END
      || CASE WHEN c_custkey % 5 = 0
           THEN ' card ' || lpad(CAST(c_custkey * 2654435761 AS VARCHAR), 16, '0')
           ELSE '' END"""

  /** Luhn mod-10 sum of a 16-digit string `x`, unrolled for the oracle
    * (positions 1..16 from the left of an even-length string: odd
    * positions double, subtracting 9 when the doubled digit overflows).
    * The Spark side runs the codegen'd LuhnCheckExpr instead — same
    * arithmetic, one byte loop.
    */
  private def luhnSumSql(x: String): String = (1 to 16).map { i =>
    val d = s"CAST(substr($x, $i, 1) AS INT)"
    if (i % 2 == 1) s"(2 * $d - CASE WHEN $d >= 5 THEN 9 ELSE 0 END)" else d
  }.mkString("(", " + ", ")")

  /** q160: PII audit — per market segment, how many phone-shaped,
    * email-shaped, and card-shaped values appear in the profile text,
    * and how many card-shaped runs actually pass the Luhn checksum.
    * Detection is regex extraction over the text (NOT the generator
    * columns — the detector has to find what the generator planted),
    * and the Luhn gate runs per extracted candidate under a
    * higher-order `filter`, all inside whole-stage codegen. Map-only
    * scan + one tiny aggregate: at 100 TB this is a single pass with
    * map-side combine into #segments rows — the cheapest possible
    * governance report. The oracle avoids list lambdas (portability):
    * card candidates are exactly the planted string, so it gates the
    * same Luhn arithmetic on the derived column.
    */
  private val q160 = QueryDef(
    "q160_pii_audit",
    (s, d) => Tables(s, d, "customer")
      .select(col("c_mktsegment"), profileCol.as("profile"))
      .withColumn("phones", regexp_extract_all(col("profile"), lit(phoneRe), lit(0)))
      .withColumn("emails", regexp_extract_all(col("profile"), lit(emailRe), lit(0)))
      .withColumn("cards", regexp_extract_all(col("profile"), lit(cardRe), lit(0)))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(size(col("phones"))).cast("long").as("n_phone"),
        sum(size(col("emails"))).cast("long").as("n_email"),
        sum(size(col("cards"))).cast("long").as("n_card_shaped"),
        sum(size(filter(col("cards"), x => GraftFunctions.graftLuhnCheck(x))))
          .cast("long").as("n_card_luhn_valid"))
      .orderBy("c_mktsegment"),
    Some(s"""WITH prof AS (
               SELECT c_mktsegment, $profileSql AS profile,
                      CASE WHEN c_custkey % 5 = 0
                        THEN lpad(CAST(c_custkey * 2654435761 AS VARCHAR), 16, '0')
                      END AS card
               FROM customer)
             SELECT c_mktsegment, COUNT(*) AS n_customers,
                    CAST(SUM(len(regexp_extract_all(profile, '$phoneRe'))) AS BIGINT) AS n_phone,
                    CAST(SUM(len(regexp_extract_all(profile, '$emailRe'))) AS BIGINT) AS n_email,
                    CAST(SUM(len(regexp_extract_all(profile, '$cardRe'))) AS BIGINT) AS n_card_shaped,
                    CAST(SUM(CASE WHEN card IS NOT NULL
                                   AND ${luhnSumSql("card")} % 10 = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_card_luhn_valid
             FROM prof GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** q161: PII redaction — the release-side twin of q160: every
    * email/card/phone match replaced by a typed placeholder, row
    * granularity preserved (the redacted corpus ships, the original
    * doesn't). Pure map-only regexp_replace chain — no shuffle at all
    * beyond the harness ORDER BY; the full redacted text hash-compare
    * against DuckDB pins cross-engine regex-replacement semantics
    * (match boundaries, global replace). Replacement order is fixed
    * (email, card, phone) so the engines rewrite identically even
    * where classes could nest.
    */
  private val q161 = QueryDef(
    "q161_pii_redact",
    (s, d) => Tables(s, d, "customer")
      .select(col("c_custkey"), profileCol.as("profile"))
      .select(
        col("c_custkey"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("profile"), emailRe, "[EMAIL]"),
            cardRe, "[CARD]"),
          phoneRe, "[PHONE]").as("redacted"))
      .orderBy("c_custkey"),
    Some(s"""WITH prof AS (
               SELECT c_custkey, $profileSql AS profile FROM customer)
             SELECT c_custkey,
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(profile, '$emailRe', '[EMAIL]', 'g'),
                        '$cardRe', '[CARD]', 'g'),
                      '$phoneRe', '[PHONE]', 'g') AS redacted
             FROM prof ORDER BY c_custkey"""))

  /** q162: corpus snapshot diff — added / removed / changed / unchanged
    * counts per source between two corpus versions. "Yesterday's"
    * snapshot is derived deterministically from today's (every 97th doc
    * is new today; every 31st surviving doc was edited; every 101st doc
    * existed yesterday under a retired id) so the diff exercises all
    * four statuses with nonzero counts. The comparison is ONE full
    * outer hash join on doc_id over md5 DIGESTS, never text — at lake
    * scale the digests are precomputed at write time (a 16-byte column
    * + footer stats), so diffing two 100-TB snapshots shuffles two
    * digest columns, not the corpora.
    */
  private val q162 = QueryDef(
    "q162_snapshot_diff",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val prev = docs.filter(col("doc_id") % 97 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 31 === 0, upper(col("text"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 101 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L))
      val p = prev.select(col("doc_id"), md5(col("text")).as("p_hash"),
        col("source").as("p_source"))
      val c = docs.select(col("doc_id"), md5(col("text")).as("c_hash"),
        col("source").as("c_source"))
      p.join(c, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("p_hash").isNull, "added")
            .when(col("c_hash").isNull, "removed")
            .when(col("p_hash") =!= col("c_hash"), "changed")
            .otherwise("unchanged"))
        .groupBy(coalesce(col("c_source"), col("p_source")).as("source"),
          col("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "status")
    },
    Some("""WITH curr AS (SELECT doc_id, text, source FROM documents),
            prev AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 31 = 0 THEN upper(text) ELSE text END AS text,
                     source
              FROM curr WHERE doc_id % 97 <> 0
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text, source
              FROM curr WHERE doc_id % 101 = 0),
            p AS (SELECT doc_id, md5(text) AS p_hash, source AS p_source FROM prev),
            c AS (SELECT doc_id, md5(text) AS c_hash, source AS c_source FROM curr)
            SELECT COALESCE(c_source, p_source) AS source,
                   CASE WHEN p_hash IS NULL THEN 'added'
                        WHEN c_hash IS NULL THEN 'removed'
                        WHEN p_hash <> c_hash THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   COUNT(*) AS n
            FROM p FULL OUTER JOIN c USING (doc_id)
            GROUP BY 1, 2 ORDER BY source, status"""))

  /** q165: declarative data-quality audit (constraint-suite shape): a
    * fixed battery of expectations over the warehouse tables — null
    * checks, domain ranges, accepted value sets, key uniqueness, and
    * lineitem→orders referential integrity — evaluated into one
    * (table, constraint, n_checked, n_violations, passed) report.
    * The battery mixes constraints that hold on this data with
    * genuinely TIGHTER business rules (quantity ≤ 45, status ∈ {F,O})
    * so both outcomes appear with nonzero counts — an audit that can
    * only say "pass" tests nothing.
    *
    * Scale shape: ONE scan per table — every per-row constraint folds
    * into the same conditional aggregate (map-side combine to one
    * row), then unpivots to report rows; uniqueness rides the same
    * aggregate as count − count(distinct key); the FK check is the
    * only join — a left anti on the key, the standard orphan scan.
    * Nothing corpus-sized shuffles except that one keyed anti join;
    * the report is 8 rows however big the tables are.
    */
  private val q165 = QueryDef(
    "q165_data_quality_audit",
    (s, d) => {
      val li = Tables(s, d, "lineitem")
      val ord = Tables(s, d, "orders")
      def report(rows: DataFrame) = rows.select(
        col("table_name"), col("constraint"), col("n_checked"),
        col("n_violations"), (col("n_violations") === 0L).as("passed"))
      // the 1-row conditional aggregate feeds the 4-row unpivot AND the
      // FK branch's n_checked — materialized so lineitem is scanned
      // once for the per-row rules (the FK anti join is the table's
      // only other pass)
      val liStats = li.agg(
          count(lit(1)).as("n_checked"),
          sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("v_null"),
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)).as("v_range"),
          sum(when(col("l_quantity") > 45, 1L).otherwise(0L)).as("v_bulk"),
          sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
            .otherwise(0L)).as("v_flag"))
        .localCheckpoint(true)
      val liAgg = liStats
        .select(explode(array(
          struct(lit("lineitem").as("table_name"),
            lit("l_orderkey_not_null").as("constraint"),
            col("n_checked"), col("v_null").as("n_violations")),
          struct(lit("lineitem").as("table_name"),
            lit("l_quantity_in_1_50").as("constraint"),
            col("n_checked"), col("v_range").as("n_violations")),
          struct(lit("lineitem").as("table_name"),
            lit("l_quantity_max_45_rule").as("constraint"),
            col("n_checked"), col("v_bulk").as("n_violations")),
          struct(lit("lineitem").as("table_name"),
            lit("l_returnflag_in_A_N_R").as("constraint"),
            col("n_checked"), col("v_flag").as("n_violations")))).as("r"))
        .select("r.*")
      val ordAgg = ord.agg(
          count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup"),
          sum(when(!col("o_orderstatus").isin("F", "O"), 1L).otherwise(0L))
            .as("v_status"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_price"))
        .select(explode(array(
          struct(lit("orders").as("table_name"),
            lit("o_orderkey_unique").as("constraint"),
            col("n_checked"), col("v_dup").as("n_violations")),
          struct(lit("orders").as("table_name"),
            lit("o_orderstatus_in_F_O_rule").as("constraint"),
            col("n_checked"), col("v_status").as("n_violations")),
          struct(lit("orders").as("table_name"),
            lit("o_totalprice_positive").as("constraint"),
            col("n_checked"), col("v_price").as("n_violations")))).as("r"))
        .select("r.*")
      val fk = li.select(col("l_orderkey"))
        .join(ord.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(liStats.select("n_checked"))
        .select(lit("lineitem").as("table_name"),
          lit("l_orderkey_fk_orders").as("constraint"),
          col("n_checked"), col("n_orphans").as("n_violations"))
      report(liAgg.unionByName(ordAgg).unionByName(fk))
        .orderBy("table_name", "constraint")
    },
    Some("""WITH li AS (
              SELECT COUNT(*) AS n,
                     CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
                     CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
                     CAST(SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS v_bulk,
                     CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS v_flag
              FROM lineitem),
            ord AS (
              SELECT COUNT(*) AS n,
                     COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_dup,
                     CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O') THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
                     CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price
              FROM orders),
            fk AS (
              SELECT (SELECT COUNT(*) FROM lineitem) AS n,
                     COUNT(*) AS v FROM lineitem l
              LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderkey IS NULL),
            rows_ AS (
              SELECT 'lineitem' AS table_name, 'l_orderkey_not_null' AS "constraint", n AS n_checked, v_null AS n_violations FROM li
              UNION ALL SELECT 'lineitem', 'l_quantity_in_1_50', n, v_range FROM li
              UNION ALL SELECT 'lineitem', 'l_quantity_max_45_rule', n, v_bulk FROM li
              UNION ALL SELECT 'lineitem', 'l_returnflag_in_A_N_R', n, v_flag FROM li
              UNION ALL SELECT 'orders', 'o_orderkey_unique', n, v_dup FROM ord
              UNION ALL SELECT 'orders', 'o_orderstatus_in_F_O_rule', n, v_status FROM ord
              UNION ALL SELECT 'orders', 'o_totalprice_positive', n, v_price FROM ord
              UNION ALL SELECT 'lineitem', 'l_orderkey_fk_orders', n, v FROM fk)
            SELECT table_name, "constraint", n_checked, n_violations,
                   n_violations = 0 AS passed
            FROM rows_ ORDER BY table_name, "constraint" """))

  /** q166: snapshot diff → CDC apply ROUNDTRIP — the proof that q162's
    * diff is not just a report but a complete, applyable changeset:
    * extract (upsert/delete) operations from diff(prev, curr), apply
    * them to prev (the q97 CDC-merge shape: one broadcast-or-keyed
    * anti join for touched keys, union the upserts), and emit the
    * reconstructed corpus as (doc_id, source, digest). The ORACLE is
    * the current corpus read directly — reconstruction must reproduce
    * it row for row, so any error in the diff extraction OR the apply
    * logic fails the gate; the invariant IS the compare.
    *
    * Scale shape: the extraction is q162's single digest outer join;
    * the apply is one anti join on the batch-bounded touched-key set
    * plus a union — at 100 TB the changeset (not the corpus) is the
    * cost dial, the q139/q155 incremental discipline on the corpus
    * store itself.
    */
  private val q166 = QueryDef(
    "q166_diff_apply_roundtrip",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val prev = docs.filter(col("doc_id") % 97 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 31 === 0, upper(col("text"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 101 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L))
      val p = prev.select(col("doc_id"), md5(col("text")).as("p_hash"))
      val c = docs.select(col("doc_id"), col("text").as("c_text"),
        col("source").as("c_source"), md5(col("text")).as("c_hash"))
      val diff = p.join(c, Seq("doc_id"), "full_outer")
      val upserts = diff
        .filter(col("c_hash").isNotNull &&
          (col("p_hash").isNull || col("p_hash") =!= col("c_hash")))
        .select(col("doc_id"), col("c_text").as("text"),
          col("c_source").as("source"))
      val deletes = diff.filter(col("c_hash").isNull).select("doc_id")
      val touched = upserts.select("doc_id").unionByName(deletes)
      val applied = prev.join(touched, Seq("doc_id"), "left_anti")
        .unionByName(upserts)
      applied.select(col("doc_id"), col("source"), md5(col("text")).as("digest"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, source, md5(text) AS digest
            FROM documents ORDER BY doc_id"""))

  /** q177: VERSIONED corpus store with time travel — the full
    * rename-free commit-protocol lifecycle
    * ([[graft.operators.VersionedStore]]) run in-query: save a base
    * snapshot (v1), append a delta (v2), tombstone-delete every 7th
    * doc (v3), compact (v4 — content-identical fold), then read EVERY
    * retained revision and summarize it, vacuum down to the current
    * revision, and prove the survivor still reads identically (the
    * version-99 row must equal the version-4 row). The oracle
    * reconstructs each revision's set algebraically — any error in the
    * manifest chain, tombstone application, compaction, or vacuum's
    * reference tracking shifts a count or sum and fails the gate.
    *
    * Scale shape: this is the object-store commit discipline at 100 TB
    * — appends write the increment plus ONE small manifest file (the
    * corpus is never rewritten, never renamed, never even listed);
    * reads are a single multi-dir parquet scan (filters and column
    * pruning push into all member dirs) plus one keyed anti join when
    * tombstones exist; compact is the only corpus-sized write and
    * vacuum is pure metadata + deletes. No atomic-rename assumption
    * anywhere — the commit point is one object PUT.
    */
  private val q177 = QueryDef(
    "q177_versioned_time_travel",
    (s, d) => {
      import graft.operators.VersionedStore
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val root = graft.BenchPhases.storeDir("graft-vts")
      val path = root + "/store"
      def snap(asOf: Option[Long], label: Int): DataFrame =
        VersionedStore.read(s, path, "docs", asOf).agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            sum(col("doc_id")).as("sum_ids"),
            sum(length(col("text")).cast("long")).as("sum_len"))
          .select(lit(label).as("version"), col("n_docs"),
            col("n_sources"), col("sum_ids"), col("sum_len"))
      // the VACUUM is part of the build bracket: it mutates the store,
      // so a reused run must not repeat it — and the pre-vacuum snaps
      // must be materialized inside the same bracket (they read dirs
      // vacuum deletes; the memoized checkpoint is what run 2+ unions)
      val preVacuum = graft.BenchPhases.build {
        VersionedStore.save(Map("docs" -> docs.filter(col("doc_id") % 3 === 0)),
          path)
        VersionedStore.append(
          Map("docs" -> docs.filter(col("doc_id") % 3 === 1)), path)
        VersionedStore.delete(
          VersionedStore.read(s, path, "docs")
            .filter(col("doc_id") % 7 === 0).select("doc_id"), "docs", path)
        VersionedStore.compact(s, path)
        val pre = snap(Some(1L), 1).unionByName(snap(Some(2L), 2))
          .unionByName(snap(Some(3L), 3)).unionByName(snap(None, 4))
          .localCheckpoint(true)
        VersionedStore.vacuum(s, path, keep = 1)
        pre
      }
      val res = preVacuum.unionByName(snap(None, 99))
        .orderBy("version").localCheckpoint(true)
      graft.BenchPhases.discard(s, root)
      res
    },
    Some("""WITH v1 AS (SELECT doc_id, text, source FROM documents
                        WHERE doc_id % 3 = 0),
                 v2 AS (SELECT * FROM v1
                        UNION ALL
                        SELECT doc_id, text, source FROM documents
                        WHERE doc_id % 3 = 1),
                 v3 AS (SELECT * FROM v2 WHERE doc_id % 7 <> 0),
                 snap AS (
                   SELECT 1 AS version, COUNT(*) AS n_docs,
                          COUNT(DISTINCT source) AS n_sources,
                          CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                          CAST(SUM(length(text)) AS BIGINT) AS sum_len
                   FROM v1
                   UNION ALL
                   SELECT 2, COUNT(*), COUNT(DISTINCT source),
                          CAST(SUM(doc_id) AS BIGINT),
                          CAST(SUM(length(text)) AS BIGINT) FROM v2
                   UNION ALL
                   SELECT 3, COUNT(*), COUNT(DISTINCT source),
                          CAST(SUM(doc_id) AS BIGINT),
                          CAST(SUM(length(text)) AS BIGINT) FROM v3
                   UNION ALL
                   SELECT 4, COUNT(*), COUNT(DISTINCT source),
                          CAST(SUM(doc_id) AS BIGINT),
                          CAST(SUM(length(text)) AS BIGINT) FROM v3
                   UNION ALL
                   SELECT 99, COUNT(*), COUNT(DISTINCT source),
                          CAST(SUM(doc_id) AS BIGINT),
                          CAST(SUM(length(text)) AS BIGINT) FROM v3)
            SELECT version, n_docs, n_sources, sum_ids, sum_len
            FROM snap ORDER BY version"""))

  /** q179: zone-map-pruned range scan over the versioned store — the
    * Iceberg-style data-skipping read. The store is built as three
    * range-disjoint appends with a doc_id zone map recorded per dir in
    * the manifest; `readRange` then serves a narrow window opening ONLY
    * the dirs whose [min, max] intersect it (VersionedStoreSpec asserts
    * the skipped dirs are absent from the scan's inputFiles — here the
    * oracle gates that skipping never changes the answer). At 100 TB of
    * time-ordered appends this is the difference between opening the
    * last few days' dirs and listing years of them: the manifest IS the
    * listing, so pruning costs zero filesystem operations.
    */
  private val q179 = QueryDef(
    "q179_versioned_pruned_scan",
    (s, d) => {
      import graft.operators.VersionedStore
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val root = graft.BenchPhases.storeDir("graft-vrs")
      val path = root + "/store"
      val sc = Seq("doc_id")
      graft.BenchPhases.build {
        VersionedStore.save(Map("docs" -> docs.filter(col("doc_id") < 200)),
          path, statsCols = sc)
        VersionedStore.append(Map("docs" ->
          docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)),
          path, statsCols = sc)
        VersionedStore.append(Map("docs" -> docs.filter(col("doc_id") >= 400)),
          path, statsCols = sc)
      }
      val res = VersionedStore.readRange(s, path, "docs", "doc_id", 250L, 350L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_ids"),
          sum(length(col("text")).cast("long")).as("sum_len"))
        .orderBy("source").localCheckpoint(true)
      graft.BenchPhases.discard(s, root)
      res
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(length(text)) AS BIGINT) AS sum_len
            FROM documents WHERE doc_id BETWEEN 250 AND 350
            GROUP BY source ORDER BY source"""))

  /** q180: O(delta) CDC off the versioned store's manifest algebra — the
    * q166 roundtrip invariant served WITHOUT the corpus-sized digest
    * join. Between two append/delete revisions the manifest delta IS
    * the change log: inserted rows live in exactly the dirs the window
    * added, deleted keys in exactly the tombstone dirs it added, so the
    * changeset costs the increment while q162/q166's diff costs a full
    * outer join over the corpus. The gate: apply changes(v1 -> v4) to
    * the v1 read and emit the reconstruction — the oracle is the v4
    * content built algebraically, so a wrong dir in either leg of the
    * delta breaks the digest.
    */
  private val q180 = QueryDef(
    "q180_versioned_cdc",
    (s, d) => {
      import graft.operators.VersionedStore
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val root = graft.BenchPhases.storeDir("graft-vcdc")
      val path = root + "/store"
      graft.BenchPhases.build {
        VersionedStore.save(Map("docs" -> docs.filter(col("doc_id") % 3 === 0)),
          path)
        VersionedStore.append(
          Map("docs" -> docs.filter(col("doc_id") % 3 === 1)), path)
        VersionedStore.delete(
          VersionedStore.read(s, path, "docs")
            .filter(col("doc_id") % 7 === 0).select("doc_id"), "docs", path)
        VersionedStore.append(
          Map("docs" -> docs.filter(col("doc_id") % 3 === 2)), path)
      }
      val (ins, delKeys) = VersionedStore.changes(s, path, 1L, 4L, "docs")
      val base = VersionedStore.read(s, path, "docs", Some(1L))
      val applied =
        (if (delKeys.columns.isEmpty) base
         else base.join(delKeys, delKeys.columns.toSeq, "left_anti"))
          .unionByName(ins)
      val res = applied
        .select(col("doc_id"), col("source"), md5(col("text")).as("digest"))
        .orderBy("doc_id").localCheckpoint(true)
      graft.BenchPhases.discard(s, root)
      res
    },
    Some("""SELECT doc_id, source, md5(text) AS digest
            FROM documents
            WHERE (doc_id % 3 IN (0, 1) AND doc_id % 7 <> 0)
               OR doc_id % 3 = 2
            ORDER BY doc_id"""))

  /** One increment's contribution to the corpus card: per-source partial
    * aggregates (all sums of longs — associative, so merging partials is
    * EXACT). `negate = true` emits a RETRACTION — the invertible-
    * aggregate trick: deleting rows appends their negated partials, and
    * the merge nets them out, so maintenance never touches the corpus.
    */
  def corpusCardPartials(docs: DataFrame, negate: Boolean = false): DataFrame = {
    val s = lit(if (negate) -1L else 1L)
    docs.groupBy("source").agg(
      (count(lit(1)) * s).as("n_docs"),
      (sum(length(col("text")).cast("long")) * s).as("sum_len"),
      (sum(col("doc_id")) * s).as("sum_ids"))
  }

  /** Fold a partials relation to the current card. Groups retracted to
    * zero disappear (GROUP BY semantics of the from-scratch report).
    */
  def corpusCardMerge(partials: DataFrame): DataFrame =
    partials.groupBy("source").agg(
        sum("n_docs").as("n_docs"),
        sum("sum_len").as("sum_len"),
        sum("sum_ids").as("sum_ids"))
      .filter(col("n_docs") =!= 0L)

  /** q181: incrementally-maintained corpus card — materialized-view
    * maintenance discipline over the versioned store. The per-source
    * stats report (q100's shape) is never recomputed from the corpus:
    * each ingest appends its increment's PARTIAL aggregates (a
    * sources-sized relation) to a `card` store revision, a deletion
    * appends the deleted rows' NEGATED partials (invertible aggregates
    * — counts and long sums), and the report is a fold over the tiny
    * partials relation. At 100 TB the daily card costs the increment's
    * aggregation plus a |sources|x|batches|-row merge; compact folds
    * the partials chain back to |sources| rows. The oracle is the
    * from-scratch GROUP BY over the surviving corpus — partials
    * accumulation, retraction netting, and zero-group elision all gate.
    */
  private val q181 = QueryDef(
    "q181_incremental_card",
    (s, d) => {
      import graft.operators.VersionedStore
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val root = graft.BenchPhases.storeDir("graft-vcard")
      val path = root + "/store"
      graft.BenchPhases.build {
        VersionedStore.save(
          Map("card" -> corpusCardPartials(docs.filter(col("doc_id") % 3 === 0))),
          path)
        VersionedStore.append(
          Map("card" -> corpusCardPartials(docs.filter(col("doc_id") % 3 === 1))),
          path)
        VersionedStore.append(
          Map("card" -> corpusCardPartials(docs.filter(col("doc_id") % 3 === 2))),
          path)
        // retraction: "delete" every 21st doc by appending negated partials
        VersionedStore.append(
          Map("card" -> corpusCardPartials(
            docs.filter(col("doc_id") % 21 === 0), negate = true)), path)
      }
      val res = corpusCardMerge(VersionedStore.read(s, path, "card"))
        .orderBy("source").localCheckpoint(true)
      graft.BenchPhases.discard(s, root)
      res
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS sum_len,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM documents WHERE doc_id % 21 <> 0
            GROUP BY source ORDER BY source"""))

  /** q216: the LAKE-TRIAGE sweep as a bench-gated query — build a
    * deterministic mixed root (monolithic text, bare signature/winnow
    * parquet indexes, a doc-routed signature federation, versioned
    * text/sq8/corpus stores, plus two injected failure states: a torn
    * meta rewrite and a live federation-root `_forget_intent`) and run
    * [[graft.operators.StoreDoctor.scan]] at `stamps` level. The
    * result set pins identification AND the r14 stamps additions (the
    * root intent probe; torn-rename coverage), and the bench artifact
    * records the sweep's wall time as `query_s` every round — the
    * quantitative ops claim ("a lake sweep costs file reads, not
    * per-store aggregate scans") regression-gated instead of asserted
    * in a doc comment. The oracle is the expected triage table
    * verbatim: every family string and health verdict is structural
    * (data-independent), so a literal relation is the strongest oracle
    * the sweep can have.
    */
  private val q216 = QueryDef(
    "q216_store_triage",
    (s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text", "source")
      val emb = Tables(s, d, "embeddings")
        .select(col("vec_id"),
          graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      if (docs.isEmpty || emb.isEmpty)
        docs.select(col("source").as("store"), col("source").as("family"),
          lit(true).as("healthy")).limit(0)
      else {
        val root = graft.BenchPhases.storeDir("graft-doctor")
        graft.BenchPhases.build {
          val fs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(s.sessionState.newHadoopConf())
          val (p, ds) = SearchQueries.textIndexBuild(docs)
          // r15 (guide §2.6): the nine stores live in DISJOINT dirs and
          // share only the pre-built (p, ds) plans — the sequential
          // build chained ~9 independent job pipelines behind each
          // other's driver gaps (12.4 s of build_s, the largest in the
          // suite). Each store's own ordering constraint (the torn
          // rename strictly after b's save; the forget intent after f's
          // build) stays INSIDE its task.
          graft.operators.Parallel.shards(8) {
            case 0 =>
              SearchQueries.textIndexSave(p, ds, s"$root/a_text")
            case 1 =>
              SearchQueries.textIndexSave(p, ds, s"$root/b_torn_text")
              // the crash window between delete and rename: target gone,
              // complete relation at the tmp sibling
              fs.rename(
                new org.apache.hadoop.fs.Path(s"$root/b_torn_text/meta"),
                new org.apache.hadoop.fs.Path(s"$root/b_torn_text/meta" +
                  graft.operators.StoreRewrite.TmpSuffix))
            case 2 => DedupQueries.buildSignatureIndex(docs, s"$root/c_sig")
            case 3 => DedupQueries.buildWinnowIndex(docs, s"$root/d_winnow")
            case 4 => DedupQueries.buildSignatureIndexSharded(docs,
              s"$root/e_sig_fed", nShards = 2)
            case 5 =>
              DedupQueries.buildSignatureIndexSharded(docs,
                s"$root/f_sig_fed_intent", nShards = 2)
              // a sharded forget that died mid-loop: the root intent is
              // the only stamps-level evidence (every shard reads clean)
              graft.operators.StoreRewrite.atomicOverwrite(
                docs.select("doc_id").limit(3),
                s"$root/f_sig_fed_intent/_forget_intent")
            case 6 => SearchQueries.textIndexSaveVersioned(
              docs.select("doc_id", "text"), s"$root/g_vtext")
            case _ =>
              val params = QuantQueries.sqTrain(emb).localCheckpoint(true)
              QuantQueries.sqSaveIndexVersioned(params,
                QuantQueries.sqCodes(params, emb), s"$root/h_vsq8")
              graft.operators.VersionedStore.save(Map("docs" -> docs),
                s"$root/i_vcorpus")
          }
        }
        val res = graft.operators.StoreDoctor.scan(s, root, level = "stamps")
          .select("store", "family", "healthy")
          .orderBy("store").localCheckpoint(true)
        graft.BenchPhases.discard(s, root)
        res
      }
    },
    Some("""SELECT store, family, healthy FROM (VALUES
              ('a_text', 'text', TRUE),
              ('b_torn_text', 'text', FALSE),
              ('c_sig', 'signature', TRUE),
              ('d_winnow', 'winnow', TRUE),
              ('e_sig_fed', 'signature-sharded', TRUE),
              ('f_sig_fed_intent', 'signature-sharded', FALSE),
              ('g_vtext', 'versioned:text', TRUE),
              ('h_vsq8', 'versioned:sq8', TRUE),
              ('i_vcorpus', 'versioned', TRUE))
              AS t(store, family, healthy)
            WHERE (SELECT COUNT(*) FROM documents) > 0
              AND (SELECT COUNT(*) FROM embeddings) > 0
            ORDER BY store"""))

  override def defs: Seq[QueryDef] =
    Seq(q160, q161, q162, q165, q166, q177, q179, q180, q181, q216)
}
