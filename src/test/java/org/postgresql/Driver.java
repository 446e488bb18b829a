package org.postgresql;

import java.sql.Connection;
import java.sql.DriverManager;
import java.sql.DriverPropertyInfo;
import java.sql.SQLException;
import java.util.Properties;
import java.util.logging.Logger;

/**
 * TEST DOUBLE — test scope only, never shipped. There is no PostgreSQL
 * server or driver jar in this offline sandbox, so this class stands in at
 * the exact seam the library targets ({@code org.postgresql.Driver}, the
 * class name {@code graft.etl.Jdbc.Postgres.driverClass} pins and Spark's
 * JDBC source instantiates): it accepts {@code jdbc:postgresql:} URLs and
 * executes every statement through the real JDBC protocol against embedded
 * Derby, with the two PostgreSQL-only constructs this library emits
 * translated by {@link graft.testutil.PgFake} (which also keeps a
 * statement log so tests can assert the POSTGRES-dialect SQL is what was
 * executed). Static self-registration mirrors the real driver, so both the
 * {@code Class.forName} + {@code DriverManager} path (ensureTables,
 * per-partition UPDATE batches) and Spark's driver-instantiation path are
 * exercised unmodified.
 */
public class Driver implements java.sql.Driver {
  static {
    try {
      DriverManager.registerDriver(new Driver());
    } catch (SQLException e) {
      throw new ExceptionInInitializerError(e);
    }
  }

  @Override
  public boolean acceptsURL(String url) {
    return url != null && url.startsWith("jdbc:postgresql:");
  }

  @Override
  public Connection connect(String url, Properties info) throws SQLException {
    if (!acceptsURL(url)) return null; // JDBC contract: null, not throw
    return graft.testutil.PgFake.connect(url, info);
  }

  @Override
  public int getMajorVersion() { return 42; }

  @Override
  public int getMinorVersion() { return 0; }

  @Override
  public DriverPropertyInfo[] getPropertyInfo(String url, Properties info) {
    return new DriverPropertyInfo[0];
  }

  @Override
  public boolean jdbcCompliant() { return false; }

  @Override
  public Logger getParentLogger() { return Logger.getLogger("org.postgresql.fake"); }
}
