package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.mg_candidates

/** EXACT heavy hitters at sketch cost: the classic two-pass shape for
  * "which tokens exceed a 1/denom share of a 100 TB corpus".
  *
  * [[CorpusStats.vocabTopK]] shuffles the ENTIRE vocabulary — fine
  * when the token table is ~√corpus, wrong when the item domain is
  * itself corpus-scale (urls, hosts, n-grams, user ids). This operator
  * never shuffles the domain:
  *
  *  - pass 1: one Misra–Gries aggregation to a single row — map-side
  *    buffers and the exchange are bounded by `capacity` entries
  *    regardless of domain size, and the summary provably contains
  *    every item with frequency > N/(capacity+1) (see
  *    [[graft.functions.MgCandidates]]);
  *  - pass 2: exact counts of ONLY the ≤ capacity candidates — a
  *    broadcast semi-join then a groupBy whose shuffle carries at most
  *    `capacity` distinct keys.
  *
  * The output is therefore EXACTLY the items with
  * `count · denom > N` (strict), with exact counts — deterministic and
  * independent of partitioning, even though the intermediate candidate
  * set is not. Requires `capacity + 1 ≥ denom` for the superset
  * guarantee; the default capacity 4·denom keeps the candidate row
  * small while leaving margin.
  */
object HeavyHitters {

  /** Exact items with share > 1/denom over a one-column frame. */
  def frequentItems(items: DataFrame, itemCol: String, denom: Int,
                    capacity: Int = 0): DataFrame = {
    val cap = if (capacity > 0) capacity else 4 * denom
    require(cap + 1 >= denom,
      s"capacity $cap cannot guarantee heavy hitters at share 1/$denom " +
        s"(need capacity+1 >= denom)")
    val it = items.select(col(itemCol).as("item"))
    // pass 1: candidates + stream length in ONE aggregation job
    val row = it.agg(mg_candidates(col("item"), cap).as("cand"),
      count(lit(1)).as("n")).head()
    val cand = row.getSeq[String](0)
    val n = row.getLong(1)
    val spark = items.sparkSession
    import spark.implicits._
    // pass 2: exact counts of the ≤ cap candidates only
    it.join(broadcast(cand.toDF("item")), Seq("item"))
      .groupBy("item")
      .agg(count(lit(1)).as("occurrences"))
      .filter(col("occurrences") * lit(denom.toLong) > lit(n))
      .withColumnRenamed("item", itemCol)
  }

  /** Exact tokens with share > 1/denom of all whitespace tokens. */
  def frequentTokens(docs: DataFrame, denom: Int, capacity: Int = 0,
                     textCol: String = "text"): DataFrame =
    frequentItems(
      docs.select(explode(TextOps.tokens(col(textCol))).as("tok")),
      "tok", denom, capacity)
}
