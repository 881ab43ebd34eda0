package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.functions.{DecimalSums, VectorOps}

/** Deterministic k-means domain clustering over the embedding corpus —
  * the curation step that buckets documents into topical domains for
  * mixing/balancing (the SemDeDup/DoReMi-style pipeline stage), built
  * so that EVERY membership decision is cross-engine reproducible and
  * the whole fit is hash-gated, not just row-counted:
  *
  *  - init: the k lowest-vec_id vectors (no RNG, no seed state);
  *  - assignment: argmin over cells of round(−2·v·c + |c|², 9) with
  *    cell id as the tie-break — a TOTAL order. The |v|² term is
  *    constant per vector and dropped. Rounding to 9 decimals absorbs
  *    sub-ulp accumulation differences between engines while sitting
  *    far below any real inter-centroid distance gap (the
  *    rounding-boundary caveat and its pin: RoundingBoundarySpec);
  *  - update: per-dimension means in EXACT decimal(18,12) sums
  *    (order-proof across partitionings — the [[DecimalSums]]
  *    discipline), surfaced through the decimal→string→double hop and
  *    rounded to 9, so both engines iterate from bit-identical
  *    centroids; an emptied cell keeps its previous centroid;
  *  - fixed iteration count: convergence-test loops diverge the moment
  *    the engines disagree on one assignment for one round.
  *
  * Spark execution shape, per iteration: assignment is a PURE
  * PROJECTION — the k centroids ride into the expression as literals
  * (the driver only transports engine-computed values, it never does
  * arithmetic), so there is no join and no shuffle; the update is one
  * partial-aggregated shuffle of (cell, dim, decimal-partial) rows —
  * k·dim·tasks rows, independent of corpus size. That is the textbook
  * 100 TB k-means profile: corpus touched once per iteration,
  * all-reduce-sized exchange. The driver collects k·dim rounded means
  * per round (bounded, like [[Dedup.dupClusters]]' per-round count).
  *
  * DuckDB replays the identical rounds as a generated CTE chain
  * (cent{i} → a{i} → m{i}), so the oracle pins every per-vector
  * membership after every round, not a summary.
  */
object Clustering {

  /** Cells and rounds for the c01 gate — mirrored in [[c01Sql]]'s
    * generated chain; change both by changing THESE. */
  val numCells = 8
  val numRounds = 4

  private def litArr(a: Seq[Double]): Column = array(a.map(lit): _*)

  /** The assignment projection: cell = argmin by (round-9 distance,
    * cell id) over the literal centroid set. `least` over structs
    * compares lexicographically — exactly the (dist, cell) total
    * order. */
  private def assignCell(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    least(cents.map { case (c, arr) =>
      val ca = litArr(arr)
      struct(
        round(lit(-2.0) * VectorOps.dot(v, ca) + VectorOps.norm2(ca), 9)
          .as("d"),
        lit(c).as("c"))
    }: _*).getField("c")

  /** Run the fit and return the final per-vector assignment
    * (vec_id, cell). */
  def kmeansAssign(emb: DataFrame, k: Int = numCells,
                   rounds: Int = numRounds): DataFrame =
    kmeansFit(emb, k, rounds)._2

  /** The fit with its final centroids exposed (assignment is argmin
    * against exactly THESE — the self-consistency the spec pins). */
  def kmeansFit(emb: DataFrame, k: Int = numCells, rounds: Int = numRounds)
      : (Seq[(Int, Seq[Double])], DataFrame) = {
    val D12 = DecimalType(18, 12)
    // consumed rounds+1 times: materialize the cast corpus once
    val e = emb
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    var cents: Seq[(Int, Seq[Double])] = e.orderBy(col("vec_id")).limit(k)
      .select(col("v")).collect().toSeq
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toSeq) }
    for (_ <- 1 to rounds) {
      val means = e
        .withColumn("cell", assignCell(col("v"), cents))
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(round(
          DecimalSums.asDouble(sum(col("x").cast(D12))) /
            count(lit(1)).cast(DoubleType), 9).as("mu"))
        .collect()
      val byCell: Map[Int, Seq[Double]] = means
        .groupBy((r: Row) => r.getInt(0))
        .map { case (c, rs) =>
          c -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cents = cents.map { case (c, old) => (c, byCell.getOrElse(c, old)) }
    }
    (cents,
      e.select(col("vec_id"), assignCell(col("v"), cents).as("cell"))
        .orderBy(col("vec_id")))
  }

  /** c01 — the per-vector domain assignment after [[numRounds]] rounds,
    * hash-gated against the DuckDB replay. */
  def c01KmeansAssign(spark: SparkSession, dir: String): DataFrame =
    kmeansAssign(Tables.embeddings(spark, dir))

  /** Generated DuckDB twin: same init, same round-9 argmin total order
    * (MIN over a (d, c) struct), same decimal(18,12) mean update with
    * the string-hop, same empty-cell carry-forward. */
  val c01Sql: String = {
    val dist =
      "ROUND(-2 * list_inner_product(e.v, ct.clist) + " +
        "list_inner_product(ct.clist, ct.clist), 9)"
    val roundsSql = (1 to numRounds).map { i =>
      s"""a$i AS (
         |  SELECT vec_id, (MIN({'d': $dist, 'c': ct.cell})).c AS cell
         |  FROM emb e CROSS JOIN cent${i - 1} ct
         |  GROUP BY vec_id),
         |m$i AS (
         |  SELECT a.cell, dd.d,
         |    ROUND(CAST(CAST(SUM(CAST(e.v[dd.d] AS DECIMAL(18,12))) AS VARCHAR)
         |               AS DOUBLE) / COUNT(*), 9) AS mu
         |  FROM emb e JOIN a$i a USING (vec_id)
         |  CROSS JOIN LATERAL (SELECT unnest(range(1, len(e.v) + 1)) AS d) dd
         |  GROUP BY a.cell, dd.d),
         |cent$i AS (
         |  SELECT p.cell, COALESCE(m.clist, p.clist) AS clist
         |  FROM cent${i - 1} p
         |  LEFT JOIN (SELECT cell, list(mu ORDER BY d) AS clist
         |             FROM m$i GROUP BY cell) m ON p.cell = m.cell)""".stripMargin
    }
    s"""WITH emb AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
       |         v AS clist
       |  FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT $numCells)),
       |${roundsSql.mkString(",\n")}
       |SELECT e.vec_id, a.cell
       |FROM emb e JOIN (
       |  SELECT vec_id, (MIN({'d': $dist, 'c': ct.cell})).c AS cell
       |  FROM emb e CROSS JOIN cent$numRounds ct GROUP BY vec_id) a
       |  USING (vec_id)
       |ORDER BY e.vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_kmeans_assign" -> c01KmeansAssign _,
  )

  val oracles: Map[String, String] = Map(
    "c01_kmeans_assign" -> c01Sql,
  )
}
