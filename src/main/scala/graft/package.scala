import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** The contract shape: (session, scale-factor dir) → result frame. */
  type Q = (SparkSession, String) => DataFrame
}
