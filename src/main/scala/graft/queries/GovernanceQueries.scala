package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Data-governance operators over the corpus/warehouse tables: PII
  * detection + redaction (the scrub pass every training-data pipeline
  * runs before release) and snapshot diffing (what changed between two
  * corpus versions). The synthetic testdata carries no organic PII, so
  * the PII queries audit a deterministic "contact line" derived from
  * customer keys — the detectors' cross-engine semantics (regex classes,
  * Luhn arithmetic) are pinned against DuckDB on non-trivial input, and
  * PiiSpec proves the detection/redaction behavior on adversarial
  * fixtures (mixed valid/invalid Luhn, embedded digit runs).
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

  override def defs: Seq[QueryDef] = Seq(q160, q161, q162)
}
