package graft.testutil

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, DriverManager, SQLException, Statement}
import java.util.Properties
import java.util.concurrent.ConcurrentLinkedQueue

/** Backend of the test-scoped `org.postgresql.Driver` double (see its
  * Javadoc): runs Postgres-dialect statements through the real JDBC
  * protocol against an in-JVM Derby database.
  *
  * What is REAL under this fake: driver resolution by URL/class name,
  * connection/transaction lifecycle, DDL execution, Spark's partitioned
  * INSERT stream, per-partition batched prepared UPDATEs with parameter
  * binding, and scan-back through Spark's JDBC relation — i.e. every line
  * of `graft.etl.Jdbc`. What is EMULATED: Postgres's SQL parser, via two
  * textual translations of the constructs this library (or Spark's
  * PostgresDialect) emits that Derby lacks — `IF NOT EXISTS` idempotency
  * (bare CREATE + already-exists SQLState swallowed, the same semantics
  * the Derby dialect implements natively) and a trailing `LIMIT n`
  * (→ `FETCH FIRST n ROWS ONLY`). Derby accepts `DOUBLE PRECISION`
  * directly. The pre-rewrite statements are logged so tests can assert
  * the Postgres-dialect text is what was executed. */
object PgFake {

  /** Every SQL statement executed through the fake, PRE-rewrite (i.e. the
    * exact Postgres-dialect text the library/Spark emitted). */
  val executed = new ConcurrentLinkedQueue[String]()

  def connect(url: String, info: Properties): Connection = {
    // one in-memory Derby db per distinct pg URL: JVM-wide, so executor
    // threads (per-partition UPDATE batches) see the same store
    val db = url.stripPrefix("jdbc:postgresql:").replaceAll("[^A-Za-z0-9]", "_")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val real = DriverManager.getConnection(s"jdbc:derby:memory:pgfake_$db;create=true")
    wrap(real, classOf[Connection]).asInstanceOf[Connection]
  }

  /** pg → Derby translation for the constructs this edge emits. */
  def rewrite(sql: String): String = sql
    .replaceAll("(?i)CREATE\\s+TABLE\\s+IF\\s+NOT\\s+EXISTS", "CREATE TABLE")
    .replaceAll("(?i)\\s+LIMIT\\s+(\\d+)\\s*$", " FETCH FIRST $1 ROWS ONLY")

  private def wrap(target: AnyRef, iface: Class[_]): AnyRef =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(iface), new Handler(target))

  /** Intercepts every method whose first parameter is a SQL string:
    * logs the original, executes the rewrite, and for statements that
    * carried `IF NOT EXISTS` swallows Derby's already-exists SQLState
    * (X0Y32) — exactly Postgres's no-op semantics. Statements created via
    * `createStatement()` are themselves wrapped so their `execute*(sql)`
    * calls route through the same seam. */
  private final class Handler(target: AnyRef) extends InvocationHandler {
    private val sqlMethods = Set(
      "prepareStatement", "prepareCall", "nativeSQL",
      "execute", "executeUpdate", "executeLargeUpdate", "executeQuery", "addBatch")

    override def invoke(proxy: AnyRef, method: Method, argsIn: Array[AnyRef]): AnyRef = {
      val args = if (argsIn == null) Array.empty[AnyRef] else argsIn
      val carriesSql = args.nonEmpty && args(0).isInstanceOf[String] &&
        sqlMethods(method.getName)
      val ifNotExists = carriesSql && args(0).asInstanceOf[String]
        .matches("(?is)\\s*CREATE\\s+TABLE\\s+IF\\s+NOT\\s+EXISTS.*")
      val newArgs =
        if (!carriesSql) args
        else {
          val sql = args(0).asInstanceOf[String]
          executed.add(sql)
          args.updated(0, rewrite(sql): AnyRef)
        }
      try {
        val out = method.invoke(target, newArgs: _*)
        if (method.getName == "createStatement" && out != null)
          wrap(out, classOf[Statement])
        else out
      } catch {
        case e: InvocationTargetException => e.getCause match {
          case s: SQLException if ifNotExists && s.getSQLState == "X0Y32" =>
            zeroOf(method.getReturnType)
          case c => throw c
        }
      }
    }

    private def zeroOf(rt: Class[_]): AnyRef =
      if (rt == java.lang.Integer.TYPE) Integer.valueOf(0)
      else if (rt == java.lang.Long.TYPE) java.lang.Long.valueOf(0L)
      else if (rt == java.lang.Boolean.TYPE) java.lang.Boolean.FALSE
      else null
  }
}
