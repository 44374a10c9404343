package graft.operators

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import graft.{DbParams, EtlQueryError, Identifiers}

/** Column metadata — the reference's `Column(name, type, not_null,
  * has_default)` namedtuple (/root/reference/etlhelper/utils.py:11).
  */
final case class ColumnInfo(name: String, dataType: String,
    notNull: Boolean, hasDefault: Boolean)

/** O14 table_info (utils.py:14-40): schema introspection with the
  * reference's error contract — missing table raises, ambiguous table
  * (same name in two schemas) raises.
  */
object TableInfo {

  /** Spark-native: from a DataFrame's resolved schema (nullability maps to
    * not_null; defaults live in field metadata when present).
    */
  def fromDataFrame(df: DataFrame): Seq[ColumnInfo] =
    df.schema.fields.toSeq.map { f =>
      ColumnInfo(f.name, f.dataType.simpleString, notNull = !f.nullable,
        hasDefault = f.metadata.contains("default"))
    }

  /** JDBC catalog introspection via DatabaseMetaData — the dialect-neutral
    * analogue of the per-backend catalog queries
    * (db_helpers/postgres.py:14-33 etc.).
    */
  def fromJdbc(db: DbParams, table: String, schema: Option[String] = None,
      passwordVariable: Option[String] = None): Seq[ColumnInfo] = {
    Identifiers.validate(table)
    db.loadDriver()
    val conn =
      if (db.user.nonEmpty)
        DriverManager.getConnection(db.jdbcUrl, db.user,
          passwordVariable.map(db.password).orNull)
      else DriverManager.getConnection(db.jdbcUrl)
    try {
      val meta = conn.getMetaData
      // Fold unquoted identifiers the way THIS backend's catalog stores them
      // (Derby/Oracle upper-case, PostgreSQL lower-case, mixed-case stores
      // keep them as-is) — DatabaseMetaData knows, so ask it. Locale.ROOT:
      // a Turkish-locale JVM would otherwise fold i/I to dotted variants
      // that never match the catalog.
      def fold(s: String): String =
        if (meta.storesUpperCaseIdentifiers) s.toUpperCase(java.util.Locale.ROOT)
        else if (meta.storesLowerCaseIdentifiers) s.toLowerCase(java.util.Locale.ROOT)
        else s
      // getTables/getColumns treat names as LIKE patterns: '_' is a
      // single-char wildcard, so MY_TABLE would also match MYXTABLE.
      // Escape metacharacters where the backend supports it (Derby returns
      // an EMPTY escape string and honors no escaping at all — measured),
      // and post-filter every result row by EXACT name as the portable
      // guarantee.
      val esc = meta.getSearchStringEscape
      def pat(s: String): String =
        if (esc == null || esc.isEmpty) s
        else s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      val wantedTable = fold(table)
      // Exact-name filter, but honoring the backend's case regime: a
      // case-INSENSITIVE store that preserves mixed case (e.g. MSSQL
      // default collation: neither storesUpper nor storesLower) matches
      // MyTable for 'mytable', so the filter must compare ignoring case
      // there; only genuinely case-sensitive stores compare exactly.
      val caseSensitive = meta.supportsMixedCaseIdentifiers
      def sameName(catalogName: String): Boolean =
        if (caseSensitive) catalogName == wantedTable
        else catalogName.equalsIgnoreCase(wantedTable)
      // Count schemas containing the table to reproduce the ambiguity error.
      val tablesRs = meta.getTables(null, schema.map(s => pat(fold(s))).orNull,
        pat(wantedTable), Array("TABLE"))
      var schemas = List.empty[String]
      var matchedName: String = wantedTable
      while (tablesRs.next())
        if (sameName(tablesRs.getString("TABLE_NAME"))) {
          matchedName = tablesRs.getString("TABLE_NAME")
          schemas ::= tablesRs.getString("TABLE_SCHEM")
        }
      if (schemas.isEmpty)
        throw new EtlQueryError(s"Table name '$table' not found.")
      if (schemas.distinct.length > 1)
        throw new EtlQueryError(
          s"Table name '$table' is not unique in database (schemas: ${schemas.distinct.sorted.mkString(", ")}).")

      val rs = meta.getColumns(null, pat(schemas.head), pat(matchedName), null)
      var cols = Vector.empty[ColumnInfo]
      while (rs.next()) {
        if (!sameName(rs.getString("TABLE_NAME")) ||
          rs.getString("TABLE_SCHEM") != schemas.head) {
          // pattern over-match (e.g. Derby, which cannot escape) — skip
        } else
        cols :+= ColumnInfo(
          rs.getString("COLUMN_NAME").toLowerCase(java.util.Locale.ROOT),
          rs.getString("TYPE_NAME"),
          notNull = rs.getInt("NULLABLE") == java.sql.DatabaseMetaData.columnNoNulls,
          hasDefault = Option(rs.getString("COLUMN_DEF")).exists(_.nonEmpty))
      }
      cols
    } finally conn.close()
  }
}
