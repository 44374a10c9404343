package graft

/** Connection configuration mirroring the reference's `DbParams`
  * (/root/reference/etlhelper/db_params.py:20-108): eager per-dbtype
  * validation at construction, construction from prefixed environment
  * variables, and password resolution from a named env var at connect time
  * only — never stored (/root/reference/etlhelper/db_helpers/db_helper.py:75-92).
  *
  * Emits the option map for `spark.read.format("jdbc")` /
  * `DataFrameWriter.jdbc`; `chunkSize` maps onto JDBC `fetchsize` (read) and
  * `batchsize` (write), the Spark analogues of the reference's CHUNKSIZE.
  */
final case class DbParams(
    dbtype: String,
    host: String = "",
    port: Int = 0,
    dbname: String = "",
    user: String = "",
    filename: String = "",
    odbcDriver: String = "") {

  import DbParams._

  validate()

  private def validate(): Unit = {
    val required = requiredKeys.getOrElse(
      dbtype.toUpperCase,
      throw new EtlDbParamsError(
        s"dbtype '$dbtype' not supported (one of ${requiredKeys.keys.mkString(", ")})"))
    val present = Map(
      "host" -> host.nonEmpty, "port" -> (port > 0), "dbname" -> dbname.nonEmpty,
      "user" -> user.nonEmpty, "filename" -> filename.nonEmpty,
      "odbc_driver" -> odbcDriver.nonEmpty)
    val missing = required.filterNot(present(_))
    if (missing.nonEmpty)
      throw new EtlDbParamsError(
        s"${missing.mkString(", ")} not set for $dbtype db_params")
  }

  /** JDBC URL per backend — the connection-string builders of
    * db_helpers/{oracle,postgres,sqlite,mssql}.py re-expressed for JDBC,
    * plus DERBY for the embeddable test backend.
    */
  def jdbcUrl: String = dbtype.toUpperCase match {
    case "POSTGRES" => s"jdbc:postgresql://$host:$port/$dbname"
    case "ORACLE"   => s"jdbc:oracle:thin:@$host:$port/$dbname"
    case "MSSQL"    => s"jdbc:sqlserver://$host:$port;databaseName=$dbname"
    case "SQLITE"   => s"jdbc:sqlite:$filename"
    case "DERBY"    => s"jdbc:derby:$filename"
  }

  def driverClass: String = dbtype.toUpperCase match {
    case "POSTGRES" => "org.postgresql.Driver"
    case "ORACLE"   => "oracle.jdbc.OracleDriver"
    case "MSSQL"    => "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    case "SQLITE"   => "org.sqlite.JDBC"
    case "DERBY"    => "org.apache.derby.jdbc.EmbeddedDriver"
  }

  /** Load this backend's JDBC driver class with the reference's helpful
    * missing-driver error contract (db_helpers/db_helper.py:122-128).
    */
  def loadDriver(): Unit = DbParams.loadDriver(driverClass, dbtype)

  /** Password from the named environment variable, at call time only —
    * mirrors get_password (db_helper.py:75-92) including the clear error.
    */
  def password(passwordVariable: String): String =
    sys.env.getOrElse(passwordVariable,
      throw new EtlDbParamsError(
        s"Password environment variable ($passwordVariable) is not set"))

  /** TCP reachability probe (db_params.py:110-131): can we open a socket to
    * host:port? No credentials involved; false for socket-less backends.
    */
  def isReachable(timeoutMs: Int = 2000): Boolean = {
    // Note: timeoutMs bounds the TCP connect only; hostname resolution in
    // InetSocketAddress uses the OS resolver's own timeout.
    if (host.isEmpty || port <= 0 || port > 65535) false
    else {
      val s = new java.net.Socket()
      try {
        s.connect(new java.net.InetSocketAddress(host, port), math.max(timeoutMs, 1))
        true
      } catch {
        case scala.util.control.NonFatal(_) => false
      } finally {
        try s.close() catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  /** Backend fast-path options — the JDBC analogues of the reference's
    * driver-specific insert paths (postgres.py:76-96 execute_batch,
    * mssql.py:79-100 fast_executemany, oracle.py:43-48 LOB prefetch).
    */
  def dialectOptions: Map[String, String] = dbtype.toUpperCase match {
    case "POSTGRES" => Map("reWriteBatchedInserts" -> "true")
    case "MSSQL" => Map("useBulkCopyForBatchInsert" -> "true")
    case "ORACLE" => Map("oracle.jdbc.defaultLobPrefetchSize" -> "4000")
    case _ => Map.empty
  }

  /** Option map for spark.read.format("jdbc") / write.jdbc. `extra` wins
    * over defaults for per-call dialect tuning.
    */
  def readOptions(query: String, passwordVariable: Option[String] = None,
      fetchSize: Int = 5000, extra: Map[String, String] = Map.empty): Map[String, String] =
    baseOptions(passwordVariable) ++ dialectOptions ++
      Map("query" -> query, "fetchsize" -> fetchSize.toString) ++ extra

  def writeOptions(table: String, passwordVariable: Option[String] = None,
      batchSize: Int = 5000, extra: Map[String, String] = Map.empty): Map[String, String] =
    baseOptions(passwordVariable) ++ dialectOptions ++
      Map("dbtable" -> Identifiers.validate(table), "batchsize" -> batchSize.toString) ++
      extra

  private def baseOptions(passwordVariable: Option[String]): Map[String, String] =
    Map("url" -> jdbcUrl, "driver" -> driverClass) ++
      (if (user.nonEmpty) Map("user" -> user) else Map.empty) ++
      passwordVariable.map(v => "password" -> password(v)).toMap
}

object DbParams {

  /** Load a JDBC driver class, wrapping ClassNotFoundException in an
    * EtlConnectionError with instructive text — the reference's
    * missing-driver contract (db_helpers/db_helper.py:122-128, message shape
    * per db_helpers/postgres.py:38-40, contract-tested at
    * test/unit/test_db_helpers.py:113-138: "Could not" + driver name).
    * Static so executor-side code can call it without serializing DbParams.
    */
  def loadDriver(driverClass: String, dbtype: String): Unit =
    try Class.forName(driverClass)
    catch {
      case e: ClassNotFoundException =>
        throw new EtlConnectionError(
          s"Could not load JDBC driver class $driverClass required for " +
            s"$dbtype connections.  Add the driver jar to the classpath " +
            "(spark.jars / --jars).  See " +
            "https://github.com/BritishGeologicalSurvey/etlhelper for the " +
            "reference installation instructions",
          e)
    }

  /** Required keys per backend (db_helpers/{oracle,postgres,mssql,sqlite}.py). */
  val requiredKeys: Map[String, Set[String]] = Map(
    "ORACLE" -> Set("host", "port", "dbname", "user"),
    "POSTGRES" -> Set("host", "port", "dbname", "user"),
    "MSSQL" -> Set("host", "port", "dbname", "user", "odbc_driver"),
    "SQLITE" -> Set("filename"),
    "DERBY" -> Set("filename"))

  /** Construction from environment variables with a prefix
    * (db_params.py:85-108): e.g. prefix "TEST_" reads TEST_DBTYPE,
    * TEST_HOST, ... Password variables are intentionally excluded.
    */
  def fromEnvironment(prefix: String, env: Map[String, String] = sys.env): DbParams = {
    def get(k: String) = env.get(prefix + k.toUpperCase)
    val dbtype = get("DBTYPE").getOrElse(
      throw new EtlDbParamsError(s"Environment variable ${prefix}DBTYPE is not set"))
    DbParams(
      dbtype = dbtype,
      host = get("HOST").getOrElse(""),
      port = get("PORT").map(_.toInt).getOrElse(0),
      dbname = get("DBNAME").getOrElse(""),
      user = get("USER").getOrElse(""),
      filename = get("FILENAME").getOrElse(""),
      odbcDriver = get("ODBC_DRIVER").getOrElse(""))
  }
}
