package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

/** The native merge operator (AsOfJoinPlan/Exec) must agree exactly with
  * the union+window operator on every case the latter's specs pin:
  * normal matches, ties, tolerance, null keys, null timestamps. */
class AsOfJoinExecSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  GraftExtensions.registerAll(spark)

  private def cmp(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame,
                  keys: Seq[String], lts: String, rts: String,
                  tol: Option[Long] = None): Unit = {
    val a = AsOfJoin.backward(l, r, keys, lts, rts, tol)
    val b = AsOfJoin.backwardMerge(l, r, keys, lts, rts, tol)
    assert(a.columns.toSeq == b.columns.toSeq, "output shape must match")
    // multiplicity-exact comparison: set-based except would miss one
    // operator redistributing duplicates
    val ga = a.groupBy(a.columns.map(col): _*).count()
    val gb = b.groupBy(b.columns.map(col): _*).count()
    assert(ga.except(gb).count() == 0 && gb.except(ga).count() == 0)
    assert(a.count() == b.count())
  }

  test("merge exec equals union+window on random data with ties and repeats") {
    val l = (1 to 500).map(i => ((i % 11).toLong, (i * 37 % 200).toLong, i))
      .toDF("k", "l_ts", "lid")
    val r = (1 to 300).map(i => ((i % 7).toLong, (i * 53 % 200).toLong, i * 1.5))
      .toDF("k", "r_ts", "payload")
      .groupBy("k", "r_ts").agg(max("payload").as("payload"))
    cmp(l, r, Seq("k"), "l_ts", "r_ts")
    cmp(l, r, Seq("k"), "l_ts", "r_ts", tol = Some(10L))
  }

  test("merge exec equals union+window with null keys and null timestamps") {
    val l = Seq((Option(1L), Option(100L), "a"), (Option.empty[Long], Option(100L), "b"),
      (Option(1L), Option.empty[Long], "c"), (Option(2L), Option(5L), "d"))
      .toDF("k", "l_ts", "tag")
    val r = Seq((Option(1L), Option(90L), 1.0), (Option.empty[Long], Option(50L), 9.0),
      (Option(1L), Option.empty[Long], 8.0), (Option(2L), Option(5L), 2.0))
      .toDF("k", "r_ts", "px")
    cmp(l, r, Seq("k"), "l_ts", "r_ts")
  }

  test("merge exec on the events attribution query (multi-partition)") {
    val ev = Tables(spark, sf).events
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("p_us"))
      .repartition(8)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("c_us"))
      .repartition(5)
    cmp(p, c, Seq("user_id"), "p_us", "c_us")
  }

  test("both sides from one CACHED frame with an ALIASED key (exprId-collision case)") {
    // the key is minted by withColumn, so its ExprId is identical on both
    // sides and cannot be refreshed by relation renewal — the rename
    // barrier must isolate it (this exact shape mis-pruned the right
    // child and failed at runtime before the fix)
    val ev = Tables(spark, sf).events
      .withColumn("user_id", col("user_id") * 2)
      .withColumn("us", expr("ts div 1000"))
      .cache()
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("c_us"))
    cmp(p, c, Seq("user_id"), "p_us", "c_us")
    ev.unpersist()
  }

  test("plan shape: AsOfJoinExec with exchanges+sorts, no window, no join") {
    val ev = Tables(spark, sf).events
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("c_us"))
    val plan = AsOfJoin.backwardMerge(p, c, Seq("user_id"), "p_us", "c_us")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan) // AsOfJoinExec renders as "AsOfJoin [keys]..."
    assert(plan.contains("Sort"), "EnsureRequirements must insert the sorts\n" + plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("mergejoin"), plan)
  }
}
