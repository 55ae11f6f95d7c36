package graft.table

import org.apache.spark.sql.DataFrame

/** A pre-commit validation failed: the write is rejected, the table keeps
  * its previous state (ref: hudi HoodieValidationException). */
class ValidationException(msg: String) extends RuntimeException(msg)

/**
 * Pre-commit validators (ref: hudi-client/hudi-spark-client/src/main/java/
 * org/apache/hudi/client/validator/SparkPreCommitValidator.java and its
 * SqlQueryEquality / SqlQueryInequality / SqlQuerySingleResult subclasses,
 * configured via hoodie.precommit.validators): data-quality gates that run
 * a SQL query — `<TABLE_NAME>` substitutes a view of the table — against
 * the state before the commit and the state the inflight commit would
 * produce, and reject the commit on a failed expectation.
 *
 * Install on a table via `t.preCommitValidators = Seq(...)`. Queries should
 * be aggregates (their results are collected to the driver for comparison).
 */
sealed trait PreCommitValidator {
  def validate(before: DataFrame, after: DataFrame): Unit

  /** Run `query` with `<TABLE_NAME>` bound to a temp view of `df`; rows are
    * stringified + sorted so comparison is order-insensitive. */
  protected def run(query: String, df: DataFrame): Seq[String] = {
    val view = s"graft_precommit_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    df.createOrReplaceTempView(view)
    try df.sparkSession.sql(query.replace(PreCommitValidator.TableVar, view))
      .collect().map(_.toString).sorted.toSeq
    finally { df.sparkSession.catalog.dropTempView(view); () }
  }
}

object PreCommitValidator {
  /** Placeholder substituted with the before/after view name (same contract
    * as the reference's HoodiePreCommitValidatorConfig.VALIDATOR_TABLE_VARIABLE). */
  val TableVar = "<TABLE_NAME>"
}

/** The query must return the SAME result before and after the commit —
  * for invariants a write must preserve (ref: SqlQueryEqualityPreCommitValidator;
  * e.g. "SELECT count(distinct currency) FROM <TABLE_NAME>"). */
final case class SqlQueryEquality(query: String) extends PreCommitValidator {
  override def validate(before: DataFrame, after: DataFrame): Unit = {
    val b = run(query, before)
    val a = run(query, after)
    if (b != a) throw new ValidationException(
      s"pre-commit equality failed for [$query]: before=$b after=$a")
  }
}

/** The query must return a DIFFERENT result after the commit — for writes
  * that must visibly change the queried state
  * (ref: SqlQueryInequalityPreCommitValidator). */
final case class SqlQueryInequality(query: String) extends PreCommitValidator {
  override def validate(before: DataFrame, after: DataFrame): Unit = {
    val b = run(query, before)
    val a = run(query, after)
    if (b == a) throw new ValidationException(
      s"pre-commit inequality failed for [$query]: result unchanged ($a)")
  }
}

/** The query over the POST-commit state must return exactly the expected
  * single value (ref: SqlQuerySingleResultPreCommitValidator; e.g.
  * "SELECT count(*) FROM <TABLE_NAME> WHERE key IS NULL" expecting "0"). */
final case class SqlQuerySingleResult(query: String, expected: String)
    extends PreCommitValidator {
  override def validate(before: DataFrame, after: DataFrame): Unit = {
    val a = run(query, after)
    val got = a match {
      case Seq(one) => one.stripPrefix("[").stripSuffix("]")
      case other => throw new ValidationException(
        s"pre-commit single-result query [$query] returned ${other.size} rows, expected 1")
    }
    if (got != expected) throw new ValidationException(
      s"pre-commit single-result failed for [$query]: got '$got', expected '$expected'")
  }
}